package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native codegen'd Gopher-style repetition character counts:
 * `repetition_chars(text)` returns `array<bigint>` of
 *
 *  - `[0]` top2_chars — the largest (occurrences x character length) of
 *    any word-2-gram of `text` (tokens = split on a single space, gram
 *    length counts the joining space), 0 under 2 tokens;
 *  - `[1]` dup3_chars — the summed (occurrences x character length) over
 *    word-3-grams occurring more than once, 0 under 3 tokens.
 *
 * One fused pass with a per-row hash count replaces the SQL fold over
 * sorted gram arrays (aggregate over array_sort): the fold is an
 * interpreted higher-order function — ~0.7 ms/doc at sf0.1, and worse
 * where predicate pushdown inlines the fold once per column reference
 * (measured 6+ s for 5k docs in the q73 gate filter) — where this
 * expression runs the identical integer math in microseconds and stays
 * inside whole-stage codegen's subexpression elimination. The DuckDB
 * oracle counts the same grams via unnest + GROUP BY; engines agree on
 * VALUES, not plans.
 *
 * Token and gram lengths are CODE POINTS (Spark `length()` semantics,
 * DuckDB `len()` semantics), not UTF-16 units, so supplementary-plane
 * text cannot diverge cross-engine.
 */
case class RepetitionChars(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("repetition_chars needs (string)")

  override protected def nullSafeEval(t: Any): Any =
    new GenericArrayData(
      RepetitionChars.compute(t.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val cls = RepetitionChars.getClass.getName.stripSuffix("$")
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.compute($t.toString()));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): RepetitionChars =
    copy(child = c)
}

object RepetitionChars {

  /** [top2_chars, dup3_chars] — see the expression doc. Must agree with
    * Spark's `split(text, ' ')`: Java's `String.split(" ", -1)` is the
    * same regex split with the same keep-trailing-empties limit. */
  def compute(str: String): Array[Long] = {
    val tk = str.split(" ", -1)
    Array(gramStat(tk, 2, top = true), gramStat(tk, 3, top = false))
  }

  /** top = true: max over distinct n-grams of count x length;
    * top = false: sum over n-grams with count > 1 of count x length. */
  private def gramStat(tk: Array[String], n: Int, top: Boolean): Long = {
    val m = tk.length - n + 1
    if (m <= 0) return 0L
    val counts = new java.util.HashMap[String, Int](m * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tk(i + j))
        j += 1
      }
      val k = sb.toString
      counts.put(k, counts.getOrDefault(k, 0) + 1)
      i += 1
    }
    var out = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.toLong
      if (top) {
        val v = c * gramLenOf(e.getKey)
        if (v > out) out = v
      } else if (c > 1) {
        out += c * gramLenOf(e.getKey)
      }
    }
    out
  }

  private def gramLenOf(g: String): Long = g.codePointCount(0, g.length).toLong

  /** Register `repetition_chars` for SQL/expr use in the given session. */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "repetition_chars")(
      exprs => RepetitionChars(exprs.head))
}
