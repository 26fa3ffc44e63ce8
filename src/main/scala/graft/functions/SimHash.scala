package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native codegen'd 32-bit SimHash over an array of 32-bit token hashes
 * (stored as bigint).
 *
 * Semantics are identical to the nested higher-order-function form
 * (`aggregate(sequence(0,31), ...)` with a per-bit inner fold): bit j of
 * the result is set iff strictly more than half of the token hashes have
 * bit j set (the classic sum-of-±1 > 0 vote). The HOF form is interpreted
 * — 32 x |tokens| lambda dispatches per row, measured ~0.9 ms/doc — while
 * this compiles to one tight Java loop inside whole-stage codegen.
 * The DuckDB oracle keeps the explicit per-bit vote; results are identical
 * because the vote is integer math with no ordering sensitivity.
 */
case class SimHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash needs array<bigint>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 32) {
        counts(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var r = 0L
    var j = 0
    while (j < 32) {
      if (2 * counts(j) > n) r |= (1L << j)
      j += 1
    }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val r = ctx.freshName("r")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[32];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < 32; $j++) $counts[$j] += (int) (($h >>> $j) & 1L);
         |}
         |long $r = 0L;
         |for (int $j = 0; $j < 32; $j++) if (2 * $counts[$j] > $n) $r |= (1L << $j);
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {
  /** Register `simhash` for SQL/expr use in the given session. */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "simhash")(exprs => SimHash(exprs.head))
}
