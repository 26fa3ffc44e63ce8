package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Caches

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

  /** Append a global `rn` (1-based bigint row_number ordered by `ord`). */
  def rankBy(s: SparkSession, df: DataFrame, ord: String*): DataFrame = {
    val parts = math.max(s.sparkContext.defaultParallelism, 2)
    val ordCols = ord.map(col)
    val local = Caches.persist(df.repartitionByRange(parts, ordCols: _*)
      .withColumn("gr_pid", spark_partition_id())
      .withColumn("gr_lrn",
        row_number().over(Window.partitionBy(col("gr_pid")).orderBy(ordCols: _*))))
    val counts = local.groupBy(col("gr_pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    // coalesce: on an empty input `offsets` is empty and element_at would
    // yield a null rn; an empty-but-typed rank is the right degenerate case.
    local
      .withColumn("rn", col("gr_lrn").cast("bigint") +
        coalesce(element_at(typedLit(offsets), col("gr_pid")), lit(0L)))
      .drop("gr_pid", "gr_lrn")
  }
}
