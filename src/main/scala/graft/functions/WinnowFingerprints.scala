package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native codegen'd winnowing fingerprints: `winnow_fingerprints(t, k, w)`
 * computes the character k-gram Rabin-Karp rolling hashes of `t` (Horner,
 * base 257, mod 1e9+7 — the same integer recurrence the DuckDB oracle
 * evaluates) and returns the min-in-window-of-`w` selection as
 * `array<bigint>`.
 *
 * The SQL-composable form (`transform(sequence(...), i ->
 * aggregate(...substring...))`) is interpreted — one UTF8String substring
 * allocation per character per position, measured 22 s for 5k docs at
 * sf0.1; this single fused loop runs the identical math in ~0.1 s.
 * Input must be ASCII (callers normalize to [a-z0-9] first); k and w must
 * be foldable positive ints with length(t) >= k + w - 1.
 */
case class WinnowFingerprints(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == IntegerType &&
      third.dataType == IntegerType && second.foldable && third.foldable &&
      second.eval(null).asInstanceOf[Int] >= 1 && third.eval(null).asInstanceOf[Int] >= 1) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        "winnow_fingerprints needs (string, foldable int >= 1, foldable int >= 1)")
    }

  override protected def nullSafeEval(t: Any, kAny: Any, wAny: Any): Any = {
    val arr = WinnowFingerprints.compute(
      t.asInstanceOf[UTF8String].toString,
      kAny.asInstanceOf[Int], wAny.asInstanceOf[Int])
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k, w) => {
      val cls = WinnowFingerprints.getClass.getName.stripSuffix("$")
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.compute($t.toString(), $k, $w));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): WinnowFingerprints =
    copy(first = f, second = s, third = t)
}

object WinnowFingerprints {

  private final val Base = 257L
  private final val Mod = 1000000007L

  /** Rolling k-gram hashes then min-in-window-of-w; empty if too short. */
  def compute(str: String, k: Int, w: Int): Array[Long] = {
    val n = str.length
    val m = n - k + 1
    if (m < w) return Array.emptyLongArray
    val rh = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < k) {
        h = (h * Base + str.charAt(i + j)) % Mod
        j += 1
      }
      rh(i) = h
      i += 1
    }
    val wins = new Array[Long](m - w + 1)
    i = 0
    while (i < wins.length) {
      var min = rh(i)
      var j = 1
      while (j < w) {
        if (rh(i + j) < min) min = rh(i + j)
        j += 1
      }
      wins(i) = min
      i += 1
    }
    wins
  }

  /** Register `winnow_fingerprints` for SQL/expr use in the given session. */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "winnow_fingerprints")(
      exprs => WinnowFingerprints(exprs(0), exprs(1), exprs(2)))
}
