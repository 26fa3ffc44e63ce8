package graft.similarity

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/**
 * Native Catalyst expressions for ANN bucket assignment.
 *
 * These replace the last two ScalaUDFs on any hot path (the LSH/IVF
 * index-build and probe-fanout assignments). A ScalaUDF here pays, per
 * corpus row: a catalyst→Scala converter that materializes a boxed
 * `Seq[Double]`, an opaque call that fences whole-stage codegen, and a
 * Scala→catalyst converter back for the result array. At index-build
 * scale this runs once per corpus row — exactly the place deser/boxing
 * cost matters. Both expressions participate in codegen via [[doGenCode]]
 * (one bulk `toDoubleArray` copy, primitive loops, no boxing) following
 * the [[graft.iforest.IForestScore]] pattern: the planes/centroids travel
 * as a [[Broadcast]] handle, so the expression serialized into the task
 * binary is a few bytes and executors fetch the table blocks once.
 *
 * Assignment math is delegated to the same private kernels the former
 * UDFs used ([[AnnLsh.bucketOf]]/[[AnnLsh.probeSequence]],
 * [[AnnIvf.unitNorm]]/[[AnnIvf.nearestLists]]), so assignments are
 * bit-identical and the ModulesSpec recall gates are unaffected.
 */

/**
 * Bucket ids for a vector across `numTables` LSH tables, as
 * `table * 2^numPlanes + bucket` so tables never collide.
 *
 * `probesPerTable == 1`: index side — the vector's own bucket per table
 * (one entry per table). `probesPerTable > 1`: probe side — the
 * `probesPerTable` most-probable buckets per table in margin order
 * (Lv et al.'s query-directed probing sequence).
 */
case class LshBuckets(
    child: Expression,
    bcPlanes: Broadcast[Array[Array[Double]]],
    numTables: Int,
    numPlanes: Int,
    probesPerTable: Int) extends UnaryExpression {

  @transient private lazy val planes: Array[Array[Double]] = bcPlanes.value

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String =
    if (probesPerTable == 1) "lsh_index_buckets" else "lsh_probe_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<double>, got ${other.simpleString(10)}")
  }

  /** Hot path — called from both interpreted eval and generated code. */
  def bucketsOf(a: ArrayData): ArrayData = {
    val vec = a.toDoubleArray()
    val ps = planes
    val tableSpan = 1 << numPlanes
    if (probesPerTable == 1) {
      val out = new Array[Int](numTables)
      var t = 0
      while (t < numTables) {
        out(t) = t * tableSpan + AnnLsh.bucketOf(vec, ps, t * numPlanes, numPlanes)
        t += 1
      }
      new GenericArrayData(out)
    } else {
      // probeSequence may emit fewer than requested when probesPerTable
      // exceeds the 2^numPlanes lattice — size from what it returns.
      val buf = new Array[Int](numTables * probesPerTable)
      var n = 0
      var t = 0
      while (t < numTables) {
        val dots = AnnLsh.projections(vec, ps, t * numPlanes, numPlanes)
        val seq = AnnLsh.probeSequence(dots, probesPerTable)
        var i = 0
        while (i < seq.length) {
          buf(n) = t * tableSpan + seq(i)
          n += 1
          i += 1
        }
        t += 1
      }
      new GenericArrayData(if (n == buf.length) buf else java.util.Arrays.copyOf(buf, n))
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    bucketsOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, f => {
      val ref = ctx.addReferenceObj("lshBuckets", this, classOf[LshBuckets].getName)
      s"${ev.value} = $ref.bucketsOf($f);"
    })

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

/**
 * Indices of the `nprobe` nearest IVF centroids for a vector (euclidean on
 * the unit sphere — the vector is unit-normalized inside, matching the
 * fit-side normalization bit-for-bit). `nprobe == 1` is the corpus-side
 * list assignment (callers take `element_at(..., 1)`).
 */
case class IvfLists(
    child: Expression,
    bcCentroids: Broadcast[Array[Array[Double]]],
    nprobe: Int) extends UnaryExpression {

  @transient private lazy val centroids: Array[Array[Double]] = bcCentroids.value

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "ivf_lists"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_lists needs array<double>, got ${other.simpleString(10)}")
  }

  /** Hot path — called from both interpreted eval and generated code. */
  def listsOf(a: ArrayData): ArrayData = {
    val en = AnnIvf.unitNorm(a.toDoubleArray())
    new GenericArrayData(AnnIvf.nearestLists(centroids, en, nprobe))
  }

  override protected def nullSafeEval(input: Any): Any =
    listsOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, f => {
      val ref = ctx.addReferenceObj("ivfLists", this, classOf[IvfLists].getName)
      s"${ev.value} = $ref.listsOf($f);"
    })

  override protected def withNewChildInternal(newChild: Expression): IvfLists =
    copy(child = newChild)
}
