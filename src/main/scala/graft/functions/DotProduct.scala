package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/**
 * Dot product over two integer-grid vectors (`array<bigint>`) — the
 * sibling of [[L2SqLong]], replacing the q208 perceptron margin's
 * `aggregate(zip_with(x, w, (xi, wi) -> xi * wi), 0L, (acc, v) ->
 * acc + v)` HOF chain, which materializes a fresh dim-length array per
 * row per round (zip_with) and walks it with an interpreter frame per
 * element. One codegen loop over primitive array storage instead; the
 * arithmetic is bit-identical (same long multiply/add order, same
 * overflow semantics), so the DuckDB oracle replaying
 * `list_sum(list_transform(...))` still hash-matches.
 *
 * NULL surface matches the chain exactly, like [[L2SqLong]]: zip_with
 * pads a length mismatch with nulls and a null poisons the aggregate,
 * so both a mismatch and a null element read NULL.
 */
case class DotLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_long"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_long needs (array<bigint>, array<bigint>), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}

object DotLong {
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "dot_long")(
      exprs => DotLong(exprs(0), exprs(1)))
}

/**
 * Dot product over two `array<double>` vectors — the double-typed
 * sibling used for the verified-ML family's norm computation:
 * `dot_double(ed, ed)` replaces `aggregate(transform(ed, x -> x * x),
 * 0.0D, (a, b) -> a + b)`.
 *
 * BIT-IDENTITY with the chain (the cross-engine float assumption in
 * [[graft.queries.Clustering.semGrid]] rests on it): the accumulator
 * starts at 0.0 and each element's product adds LEFT-TO-RIGHT — the
 * exact IEEE operation sequence of the aggregate fold, and of DuckDB's
 * `list_sum(list_transform(...))` over an ordered list. Same NULL
 * surface as [[DotLong]].
 */
case class DotDouble(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_double"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_double needs (array<double>, array<double>), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotDouble =
    copy(left = newLeft, right = newRight)
}

object DotDouble {
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "dot_double")(
      exprs => DotDouble(exprs(0), exprs(1)))
}
