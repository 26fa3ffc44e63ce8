package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Native Catalyst expression: Hamming distance between two 64-bit
 * fingerprints (`bit_count(a XOR b)`).
 *
 * This is the preferred shape for scalar extensions (SURVEY §4): a real
 * `Expression` with `doGenCode` stays inside whole-stage codegen — no UDF
 * boxing, no codegen fence — compiling to a single `Long.bitCount(a ^ b)`
 * in the generated Java. Used by the SimHash near-dup query; the DuckDB
 * oracle expresses the same thing as `bit_count(xor(a, b))`.
 */
case class HammingDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType && right.dataType == LongType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hamming_distance needs (bigint, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long]).toLong

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = (long) java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {

  /** Register `hamming_distance` for SQL/expr use in the given session. */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "hamming_distance")(
      exprs => HammingDistance(exprs(0), exprs(1)))

  /** Column-API form (via the registered SQL function). */
  def hammingDistance(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.call_function
    call_function("hamming_distance", a, b)
  }
}
