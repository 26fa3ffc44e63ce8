package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native codegen'd symmetric int8 quantization of an embedding vector:
 * `out(i) = floor(e(i) * 127 / max(maxabs(e), 1e-30))`, emitted as
 * integral doubles in [-127, 127] so downstream arithmetic (including
 * [[CosineSimilarity]]) composes without casts.
 *
 * WHY: at 100 TB the embedding column dominates similarity-search IO and
 * shuffle width; int8 storage is 4x narrower than float32 (8x float64)
 * and — because cosine is scale-invariant — the per-vector scale CANCELS
 * in the ratio, so quantized cosine needs no dequantization at all:
 * cos_q(a, b) = dotq(a,b) / (|qa| * |qb|). The ranking degradation is
 * measured, not guessed (ModulesSpec: recall@10 of quantized vs exact
 * ranking on the sandbox corpus).
 *
 * WHY an expression and not a SQL HOF: the max-abs scale inside a
 * `transform(e, ...)` lambda is re-evaluated per ELEMENT (CollapseProject
 * inlines any hoisted scale column back into the lambda — the same dim^2
 * trap AnnIvf.scala documents on its fit path), and HOF lambdas evaluate
 * interpreted. This is one fused two-pass loop (maxabs, then scale) in
 * whole-stage codegen. Same floor/greatest arithmetic as the DuckDB
 * oracle, index order, so q61's hash check covers it end to end.
 */
case class QuantizeVec(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "quantize_vec"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_vec needs array<double>, got ${other.simpleString(10)}")
  }

  /** Hot path — called from both interpreted eval and generated code. */
  def quantize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(a.getDouble(i))
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val scale = 127.0 / math.max(maxAbs, 1e-30)
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      out(i) = math.floor(a.getDouble(i) * scale)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, f => {
      val ref = ctx.addReferenceObj("quantizeVec", this, classOf[QuantizeVec].getName)
      s"${ev.value} = $ref.quantize($f);"
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}

object QuantizeVec {
  /** Register `quantize_vec` for SQL/expr use in the given session. */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "quantize_vec")(exprs => QuantizeVec(exprs(0)))
}
