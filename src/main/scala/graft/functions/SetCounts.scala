package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Native set-cardinality kernels for the dedup/similarity verify stage:
 *
 *  - `intersect_count(a, b)` ≡ `size(array_intersect(a, b))`
 *  - `union_count(a, b)`     ≡ `size(array_union(a, b))`
 *
 * The builtin forms MATERIALIZE the intersection/union array per
 * candidate pair (array allocation + copy) only for `size` to read its
 * length and throw it away — and the jaccard/containment verifiers run
 * them over the FULL shingle sets of every candidate pair (q25/q27/q84/
 * q91/q102/q135/q143 + the dedup stores' judges, the family's hottest
 * per-pair arithmetic). These kernels compute the COUNT alone: one hash
 * set build over one side, one membership sweep over the other, no
 * output array. Distinctness and null semantics match the builtins
 * exactly (elements dedup; one shared null counts once in the
 * intersection iff both sides carry null, once in the union iff either
 * does), so `intersect_count(a,b) / union_count(a,b)` is bit-identical
 * to the old `size(...)/size(...)` quotient — SetCountsSpec pins both
 * against the builtin forms element-for-element on the real corpus
 * shapes plus null/duplicate edge cases.
 *
 * Element types: array<string> (shingles) and array<bigint> (position
 * lists) — the two shapes the repo's verifiers use. Result is BIGINT
 * (the call sites all cast size()'s INT result before dividing, so the
 * widened type changes no arithmetic).
 */
private[functions] sealed trait SetCountExpr extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two arrays of matching string/bigint element " +
          s"type, got (${l.simpleString}, ${r.simpleString})")
    }

  protected def isString: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == StringType
}

case class IntersectCount(left: Expression, right: Expression)
  extends SetCountExpr {

  override def prettyName: String = "intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetCounts.intersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SetCounts$$.MODULE$$" +
        s".intersectCount($a, $b, $isString);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): IntersectCount = copy(left = l, right = r)
}

case class UnionCount(left: Expression, right: Expression)
  extends SetCountExpr {

  override def prettyName: String = "union_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetCounts.unionCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SetCounts$$.MODULE$$" +
        s".unionCount($a, $b, $isString);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): UnionCount = copy(left = l, right = r)
}

object SetCounts {

  private def elem(a: ArrayData, i: Int, isString: Boolean): AnyRef =
    if (a.isNullAt(i)) null
    else if (isString) a.getUTF8String(i)
    else java.lang.Long.valueOf(a.getLong(i))

  /** |distinct(a) ∩ distinct(b)|, null counted iff present in BOTH —
    * exactly size(array_intersect(a, b)). */
  def intersectCount(a: ArrayData, b: ArrayData, isString: Boolean): Long = {
    val bs = new java.util.HashSet[AnyRef]()
    var bNull = false
    var i = 0
    val nb = b.numElements()
    while (i < nb) {
      val e = elem(b, i, isString)
      if (e == null) bNull = true else bs.add(e)
      i += 1
    }
    var cnt = 0L
    var nullCounted = false
    var j = 0
    val na = a.numElements()
    while (j < na) {
      val e = elem(a, j, isString)
      if (e == null) {
        if (bNull && !nullCounted) { cnt += 1; nullCounted = true }
      } else if (bs.remove(e)) cnt += 1 // remove: count each distinct once
      j += 1
    }
    cnt
  }

  /** |distinct(a) ∪ distinct(b)|, null counted iff present in EITHER —
    * exactly size(array_union(a, b)). */
  def unionCount(a: ArrayData, b: ArrayData, isString: Boolean): Long = {
    val seen = new java.util.HashSet[AnyRef]()
    var sawNull = false
    var i = 0
    val na = a.numElements()
    while (i < na) {
      val e = elem(a, i, isString)
      if (e == null) sawNull = true else seen.add(e)
      i += 1
    }
    var j = 0
    val nb = b.numElements()
    while (j < nb) {
      val e = elem(b, j, isString)
      if (e == null) sawNull = true else seen.add(e)
      j += 1
    }
    seen.size.toLong + (if (sawNull) 1L else 0L)
  }

  /** Register both kernels for SQL/expr use in the given session. */
  def register(spark: SparkSession): Unit = {
    Registration.ensure(spark, "intersect_count")(
      exprs => IntersectCount(exprs(0), exprs(1)))
    Registration.ensure(spark, "union_count")(
      exprs => UnionCount(exprs(0), exprs(1)))
  }
}
