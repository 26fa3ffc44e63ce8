package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Squared L2 distance over two integer-grid vectors (`array<bigint>`) —
 * the verified-ML family's distance kernel (q207/q209/q210/q214/q215/
 * q217/q218/q219) as ONE codegen loop over primitive array storage.
 *
 * Replaces the Catalyst HOF chain `aggregate(zip_with(a, b, (x,y) ->
 * (x-y)*(x-y)), 0L, (acc,v) -> acc+v)`, which materializes a fresh
 * 64-element array per evaluation (zip_with) and walks it with a lambda
 * interpreter frame per element — measured ~2x on the q215/q219 exact
 * sweeps, whose n_train x evalN pair volume makes the per-pair constant
 * THE cost. The arithmetic is bit-identical (same long subtract /
 * multiply / add order, same overflow semantics), so every DuckDB
 * oracle that replays `list_sum(list_transform(...))` still hash-
 * matches; on the 1e6-shifted unit grid the max |coord| is 2e6, so the
 * 64-dim sum stays below 2^60 — no overflow.
 */
case class L2SqLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  /** NULL on length mismatch or any null element — zip_with pads the
    * shorter side with nulls and a null poisons the aggregate, so the
    * HOF chain returns NULL in both cases; bit-identity includes the
    * null surface, not just the arithmetic. */
  override def nullable: Boolean = true

  override def prettyName: String = "l2sq_long"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"l2sq_long needs (array<bigint>, array<bigint>), got " +
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
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
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
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqLong =
    copy(left = newLeft, right = newRight)
}

object L2SqLong {
  /** Register `l2sq_long` for SQL/expr use in the given session. */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "l2sq_long")(
      exprs => L2SqLong(exprs(0), exprs(1)))
}
