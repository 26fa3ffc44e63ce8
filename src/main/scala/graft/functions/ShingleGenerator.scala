package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Custom table-generating function (UDTF): `shingle_gen(text, n)` emits
 * one row per word n-gram of the whitespace-tokenized input — the native
 * `Generator` counterpart of `explode(transform(sequence(...), ...))`,
 * built once per row without materializing the intermediate array.
 *
 * Generators run inside `GenerateExec`; `CodegenFallback` is the standard
 * choice here (stock `Explode` itself is evaluated, not codegen'd, in the
 * generate path). `n` must be a foldable positive integer.
 */
case class ShingleGenerator(child: Expression, n: Expression)
  extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType || n.dataType != IntegerType || !n.foldable) {
      TypeCheckResult.TypeCheckFailure(
        "shingle_gen needs (string, foldable int)")
    } else if (n.eval(null).asInstanceOf[Int] < 1) {
      TypeCheckResult.TypeCheckFailure("shingle size must be >= 1")
    } else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val size: Int = n.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input)
    if (text == null) Nil
    else {
      // limit -1 keeps trailing empty tokens — the same semantics as
      // Spark's split(text, ' ') and DuckDB's string_split, so the three
      // tokenizers agree on inputs with trailing spaces.
      val toks = text.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (toks.length < size) Nil
      else (0 to toks.length - size).iterator.map { i =>
        InternalRow(UTF8String.fromString(
          toks.slice(i, i + size).mkString(" ")))
      }
    }
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): ShingleGenerator =
    copy(child = c(0), n = c(1))
}

object ShingleGenerator {
  /** Register `shingle_gen` for SQL/expr use in the given session. */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "shingle_gen")(
      exprs => ShingleGenerator(exprs(0), exprs(1)))
}
