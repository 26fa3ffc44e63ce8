package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native distinct word-3-gram shingles over a token array: the codegen'd
 * counterpart of
 *
 * {{{
 * array_distinct(transform(sequence(1, size(tk) - 2),
 *   i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1), ' ',
 *               element_at(tk, i + 2))))
 * }}}
 *
 * which is the shingle projection under the ENTIRE dedup/similarity
 * family (q25/q27/q63/q80/q102/q109 + the incremental dedup stores).
 * Higher-order functions are interpreted (CodegenFallback): the HOF form
 * pays a sequence materialization, |tk|−2 lambda dispatches, 3 element_at
 * evals and a concat tree per shingle, then array_distinct's own pass.
 * This expression is one tight loop building the distinct set directly —
 * same first-occurrence order (LinkedHashSet = array_distinct's keep-
 * first contract), same null story (a null token nulls its shingle;
 * distinct keeps one null), same empty-array result below 3 tokens
 * (callers additionally pre-filter size(tk) >= 3, as they did for the
 * HOF). ShinglesKernelSpec pins element-for-element equality of the two
 * forms, nulls and duplicates included.
 */
case class Shingles3(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingles3 needs array<string>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Shingles3.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // the kernel is a plain static call — the expression stays inside
      // whole-stage codegen (no interpreted-eval fallback for the whole
      // projection) and the loop body is compiled once, not re-dispatched
      // per element like the lambda form
      s"${ev.value} = graft.functions.Shingles3$$.MODULE$$.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}

object Shingles3 {

  private val SPACE = UTF8String.fromString(" ")

  /** The row kernel: distinct 3-grams in first-occurrence order. */
  def compute(tk: ArrayData): ArrayData = {
    val n = tk.numElements()
    if (n < 3) return new GenericArrayData(new Array[Any](0))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var sawNull = false
    val out = new java.util.ArrayList[AnyRef](n - 2)
    var i = 0
    while (i < n - 2) {
      val a = tk.getUTF8String(i)
      val b = tk.getUTF8String(i + 1)
      val c = tk.getUTF8String(i + 2)
      if (a == null || b == null || c == null) {
        // concat(null, ...) is null; array_distinct keeps the first null
        if (!sawNull) { sawNull = true; out.add(null) }
      } else {
        val s = UTF8String.concat(a, SPACE, b, SPACE, c)
        if (seen.add(s)) out.add(s)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Register `shingles3` for SQL/expr use in the given session. */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "shingles3")(exprs => Shingles3(exprs.head))
}
