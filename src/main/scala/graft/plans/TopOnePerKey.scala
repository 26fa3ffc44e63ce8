package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Top-1-per-key as an aggregation instead of a ranking window.
 *
 * `row_number() over (partition by k order by o desc) = 1` forces a full
 * shuffle + per-partition SORT of every row. The equivalent
 * `max_by(struct(*), struct(o))` is a hash aggregate with map-side partial
 * combine: each partition keeps one candidate row per key before the
 * shuffle, so at 100 TB the exchange carries |keys| rows instead of |rows|
 * and nothing is ever sorted. Multi-column tie-breaks compose through
 * struct ordering (lexicographic, same as ORDER BY col1, col2).
 */
object TopOnePerKey {

  /** Keep, per distinct `keys` combination, the row maximizing `ordering`
    * (lexicographically — equivalent to ORDER BY ... DESC ... DESC LIMIT 1). */
  def latest(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val valueStruct = struct(df.columns.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(valueStruct, struct(ordering: _*)).as("__top"))
      .select(col("__top.*"))
  }
}
