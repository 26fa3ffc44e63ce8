package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigating equi-join: the (large, skewed) left side gets a
 * deterministic salt derived from its whole row, the (smaller) right side
 * is replicated once per salt value, and the join key becomes
 * (key, salt) — splitting each hot key's rows across `numSalts` reducers.
 *
 * AQE's skew-join handles sort-merge skew automatically at runtime; this
 * explicit form covers the cases AQE can't see (skew introduced after the
 * last shuffle, aggregation-free pipelines) and documents the technique
 * for the 100 TB posture. The salt is content-derived (hash of the row),
 * not random, so results are deterministic and re-runs identical.
 */
object SaltedJoin {

  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      numSalts: Int = 16): DataFrame = {
    require(numSalts > 0)
    val leftCols: Array[Column] = left.columns.map(col)
    val salted = left.withColumn("__salt",
      pmod(hash(leftCols: _*), lit(numSalts)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until numSalts).map(lit): _*)))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
