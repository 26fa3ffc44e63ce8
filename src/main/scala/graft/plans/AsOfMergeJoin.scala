package graft.plans

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Distributed sort-merge as-of join: for every left row, the single right
 * row with the same key and the greatest time <= left time.
 *
 * Scale path: both sides hash-repartition on the key (same partition count
 * and hash function, so partitions align), sort within partitions by
 * (key, time, tie-break), and one forward merge pass per partition pairs
 * them in O(|left| + |right|) — no per-key candidate blowup, unlike the
 * range-join + top-1 form (q16), whose intermediate grows with
 * |clicks per user| x |purchases per user|. The equality prefix is what
 * makes the merge possible; this is the same co-partitioned merge shape a
 * custom SparkPlan would produce, built from public APIs
 * (repartition/sortWithinPartitions/zipPartitions).
 *
 * Inner semantics: left rows with no qualifying right row are dropped.
 * Keys must be bigint; times must be timestamps (compared at microsecond
 * precision); output = left columns ++ right columns (names must be
 * disjoint).
 */
object AsOfMergeJoin {

  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: String): DataFrame = {
    val spark = left.sparkSession
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"output columns must be disjoint, both sides have: $overlap")
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt

    // Inner as-of semantics: null keys/times never match — same contract as
    // the equi-join + top-1 form (join condition is null) and the native
    // exec (which skips them). The merge below reads key/time as primitive
    // longs, so strip nulls BEFORE the shuffle rather than NPE on them.
    // epoch-micros shadow columns keep the merge comparison integral
    val ls = left
      .filter(col(leftKey).isNotNull && col(leftTime).isNotNull)
      .withColumn("__t", unix_micros(col(leftTime)))
      .repartition(n, col(leftKey))
      .sortWithinPartitions(col(leftKey), col("__t"))
    val rs = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .withColumn("__t", unix_micros(col(rightTime)))
      .repartition(n, col(rightKey))
      .sortWithinPartitions(col(rightKey), col("__t"), col(rightTieBreak))

    val lSchema = ls.schema
    val rSchema = rs.schema
    val lKeyIdx = lSchema.fieldIndex(leftKey)
    val rKeyIdx = rSchema.fieldIndex(rightKey)
    val lTimeIdx = lSchema.fieldIndex("__t")
    val rTimeIdx = rSchema.fieldIndex("__t")
    val lWidth = lSchema.length

    val merged = ls.rdd.zipPartitions(rs.rdd) { (li, ri) =>
      val rBuf = ri.buffered
      var cand: Row = null
      li.flatMap { l =>
        val lk = l.getLong(lKeyIdx)
        val lt = l.getLong(lTimeIdx)
        // advance the right side through everything usable for this left
        // row; the last consumed row with the same key is the best match
        // (sorted ascending by time then tie-break)
        while (rBuf.hasNext && {
          val h = rBuf.head
          val hk = h.getLong(rKeyIdx)
          hk < lk || (hk == lk && h.getLong(rTimeIdx) <= lt)
        }) {
          cand = rBuf.next()
        }
        if (cand != null && cand.getLong(rKeyIdx) == lk && cand.getLong(rTimeIdx) <= lt) {
          Iterator.single(Row.fromSeq(l.toSeq ++ cand.toSeq))
        } else Iterator.empty
      }
    }

    val outSchema = StructType(lSchema.fields ++ rSchema.fields.map { f =>
      if (f.name == "__t") f.copy(name = "__rt") else f
    })
    spark.createDataFrame(merged, outSchema)
      .select((left.columns ++ right.columns).map(col): _*)
  }
}
