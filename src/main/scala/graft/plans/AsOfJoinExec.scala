package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, Unevaluable, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{BooleanType, DataType, DateType, IntegerType, LongType, TimestampType}

/**
 * Whole-operator extension tier (SURVEY §4 / prompt tier (c)): the as-of
 * join as a first-class physical operator — a planner `SparkStrategy`
 * producing a custom `SparkPlan`, instead of composing public dataframe
 * operators (`AsOfMergeJoin`) or rewriting to aggregates (q16's
 * `TopOnePerKey`).
 *
 * The operator DECLARES its needs and lets the planner provide them:
 * `requiredChildDistribution` (cluster both sides by key — EnsureRequirements
 * inserts co-partitioned hash exchanges exactly as it does for a
 * sort-merge join) and `requiredChildOrdering` (per-partition sort by
 * (key, time[, tie-break]) — SortExec appears only if the children aren't
 * already sorted). `doExecute` is then a single O(|left| + |right|)
 * forward merge per partition, no per-key candidate product, no
 * whole-dataset window.
 *
 * Semantics: inner as-of — for each left row, the single right row with
 * equal key and the greatest right-time <= left-time, ties broken by the
 * greatest tie-break value; left rows with no match are dropped. Keys,
 * times, and tie-break must be long-backed atomic types (bigint/int/
 * timestamp/date); nulls never match.
 */
case class AsOfJoinCondition(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    tieBreak: Expression) extends Expression with Unevaluable {

  override def children: Seq[Expression] =
    Seq(leftKey, rightKey, leftTime, rightTime, tieBreak)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): AsOfJoinCondition =
    AsOfJoinCondition(c(0), c(1), c(2), c(3), c(4))
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(l, r, Inner, Some(c: AsOfJoinCondition), _) =>
      AsOfMergeJoinExec(c.leftKey, c.rightKey, c.leftTime, c.rightTime,
        c.tieBreak, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfMergeJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    tieBreak: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  private val longBacked = Set[DataType](LongType, IntegerType, TimestampType, DateType)
  require(Seq(leftKey, rightKey, leftTime, rightTime, tieBreak)
    .forall(e => longBacked.contains(e.dataType)),
    "as-of join needs long-backed key/time/tie-break (bigint/int/timestamp/date)")
  // Cross-side types must MATCH, not merely both be long-backed: an int
  // key vs a bigint key hash-partitions differently (Murmur3 hashes Int
  // and Long to different values, so equal keys land on different
  // partitions), and a date vs timestamp pair compares days to
  // microseconds — both silently produce wrong results.
  require(leftKey.dataType == rightKey.dataType,
    s"as-of join key types must match: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of join time types must match: ${leftTime.dataType} vs ${rightTime.dataType}")

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    SortOrder(leftKey, Ascending) :: SortOrder(leftTime, Ascending) :: Nil,
    SortOrder(rightKey, Ascending) :: SortOrder(rightTime, Ascending) ::
      SortOrder(tieBreak, Ascending) :: Nil)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    SortOrder(leftKey, Ascending) :: SortOrder(leftTime, Ascending) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val outAtts = output
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (li, ri) =>
        val proj = UnsafeProjection.create(outAtts, outAtts)
        val joined = new JoinedRow
        val rBuf = ri.buffered
        // the last right row consumed; rows are consumed in (key, time,
        // tie-break) order, so it is always the best candidate seen so far
        var cand: InternalRow = null
        var candKey = 0L
        var candTime = 0L
        def evalLong(e: Expression, row: InternalRow): java.lang.Long =
          e.eval(row) match {
            case null => null
            case n: java.lang.Number => n.longValue()
          }
        li.flatMap { l =>
          val lkv = evalLong(lk, l)
          val ltv = evalLong(lt, l)
          if (lkv == null || ltv == null) Iterator.empty
          else {
            var advancing = true
            while (advancing && rBuf.hasNext) {
              val h = rBuf.head
              val hk = evalLong(rk, h)
              val ht = evalLong(rt, h)
              if (hk == null || ht == null) { rBuf.next() } // unmatched by definition
              else if (hk < lkv || (hk == lkv && ht <= ltv)) {
                cand = rBuf.next().copy()
                candKey = hk
                candTime = ht
              } else advancing = false
            }
            if (cand != null && candKey == lkv && candTime <= ltv) {
              Iterator.single(proj(joined(l, cand)))
            } else Iterator.empty
          }
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing API + session wiring for the native as-of join. */
object AsOfJoinNative {

  /** Idempotently add the planner strategy + marker function. */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    graft.functions.Registration.ensure(spark, "asof_latest")(
      exprs => AsOfJoinCondition(exprs(0), exprs(1), exprs(2), exprs(3), exprs(4)))
  }

  /**
   * Inner as-of join: column names must be unambiguous across the two
   * inputs (rename before joining, as with any self-join).
   */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: String): DataFrame = {
    install(left.sparkSession)
    left.join(right,
      expr(s"asof_latest($leftKey, $rightKey, $leftTime, $rightTime, $rightTieBreak)"))
  }
}
