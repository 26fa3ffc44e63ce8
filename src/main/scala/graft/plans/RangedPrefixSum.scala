package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Caches

/**
 * Scale-safe GLOBAL running sum over a unique sort key — the prefix-sum
 * sibling of [[RangedRank]] (same two-pass zipWithIndex scheme, summing
 * a value instead of counting rows).
 *
 * `sum(v) over (order by k)` with no partitionBy funnels the whole table
 * through ONE window task. Instead: range-partition on the key (every
 * row in partition i sorts before every row of partition i+1), cumsum
 * locally per partition (each task scans only its slice, in codegen),
 * then add per-partition TOTALS' exclusive prefix — a bounded
 * `#partitions`-row collect. `offset(pid) + local_cumsum` IS the global
 * running sum. The driver-side state is one long per partition, so the
 * operator holds at any corpus size.
 *
 * Same eager-job caveat as RangedRank: the totals collect runs at
 * DataFrame-construction time, and the persisted upstream is released by
 * the consumer via [[Caches.releaseAll]] / a [[Caches.scoped]] bracket.
 */
object RangedPrefixSum {

  /** Append `outCol` = inclusive global running sum of `valueCol` (bigint)
    * ordered by `ord`. NULL values count as 0 — coalesced identically on
    * both passes, so a partition of all-null values contributes a zero
    * offset instead of a driver-side NPE (sum() returns null there) and
    * the local window and the totals pass can never disagree. */
  def prefixSumBy(s: SparkSession, df: DataFrame, valueCol: String, outCol: String,
      ord: String*): DataFrame = {
    val parts = math.max(s.sparkContext.defaultParallelism, 2)
    val ordCols = ord.map(col)
    val v = coalesce(col(valueCol).cast("bigint"), lit(0L))
    val local = Caches.persist(df.repartitionByRange(parts, ordCols: _*)
      .withColumn("gp_pid", spark_partition_id())
      .withColumn("gp_lps",
        sum(v)
          .over(Window.partitionBy(col("gp_pid")).orderBy(ordCols: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    val totals = local.groupBy(col("gp_pid"))
      .agg(sum(v).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.map(_._1).zip(totals.map(_._2).scanLeft(0L)(_ + _)).toMap
    // coalesce: on an empty input `offsets` is empty and element_at would
    // yield a null sum; an empty-but-typed result is the right degenerate.
    local
      .withColumn(outCol, col("gp_lps") +
        coalesce(element_at(typedLit(offsets), col("gp_pid")), lit(0L)))
      .drop("gp_pid", "gp_lps")
  }
}
