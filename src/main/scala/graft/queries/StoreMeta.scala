package graft.queries

import org.apache.spark.sql.SparkSession

/** The layered store meta — (kind, fp) rows under `<store>/meta` — in
  * its ONE mechanical home. Four stores (ClusterStore, GraphStore,
  * SearchStore, QualityModel's LM tier) each carried this read/write
  * pair verbatim and had already started to diverge in whitespace;
  * sharing the IO keeps the `meta written LAST` / `torn value first`
  * brackets writing the same shape everywhere. The staleness LADDERS
  * stay per-store on purpose: their kinds and torn-value sets differ
  * (SearchStore adds `deleted`/`purging`), and flattening those into a
  * generic policy object would trade four explicit ladders for one
  * configurable one — harder to audit, same line count. */
private[queries] object StoreMeta {

  def write(s: SparkSession, path: String,
      rows: Seq[(String, String)]): Unit = {
    import s.implicits._
    rows.toDF("kind", "fp").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Missing or unreadable meta reads as EMPTY — the torn/stale default
    * every caller's ladder rebuilds from (a meta that cannot be read is
    * indistinguishable from one a crashed build never wrote). */
  def rows(s: SparkSession, path: String): Map[String, String] =
    try s.read.parquet(s"$path/meta").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    catch { case _: Exception => Map.empty }
}
