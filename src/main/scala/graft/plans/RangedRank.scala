package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-safe global row_number over a unique sort key: range-partition
 * on the key, rank locally per partition (hash-shuffle by partition id,
 * each task sorts only its slice), then add per-partition offsets
 * computed from a bounded `#partitions`-row count collect — the same
 * two-pass scheme as RDD.zipWithIndex, kept in the DataFrame layer so
 * the ranking itself stays in whole-stage codegen. Replaces
 * `Window.orderBy(...)` with no partitionBy, which moves the entire
 * table through ONE task. Range partitioning guarantees every row in
 * partition i sorts before every row in partition i+1, so
 * `offset(pid) + local_rank` IS the global row_number.
 *
 * NOTE: runs an eager job at DataFrame-construction time (the bounded
 * #partitions-row count collect — the zipWithIndex trade), so callers
 * execute the upstream once here and once at their terminal action; the
 * persist (released via [[Caches.releaseAll]] or a [[Caches.scoped]]
 * bracket) keeps that to one scan. `rn` is bigint: offsets are longs, and
 * an int rank would overflow past ~2.1B rows — exactly the scale this
 * operator exists for.
 */
object RangedRank {

  /** Append a global `rn` (1-based bigint row_number ordered by `ord`).
    *
    * row_number IS the running count — the inclusive prefix sum of ones
    * under the same total order — so this delegates to
    * [[RangedPrefixSum.prefixSumBy]] over a constant-1 column rather than
    * duplicating the two-pass partition-offset machinery (one copy of the
    * subtle parts: eager totals collect, empty-input coalesce, Caches
    * contract). RangedRankPropertySpec licenses both against the window
    * forms independently. */
  def rankBy(s: SparkSession, df: DataFrame, ord: String*): DataFrame =
    RangedPrefixSum.prefixSumBy(s, df.withColumn("gr_one", lit(1L)), "gr_one", "rn", ord: _*)
      .drop("gr_one")
}
