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

  /** MISSING meta reads as EMPTY — the torn/stale default every
    * caller's ladder rebuilds from (a meta a crashed build never wrote,
    * or wrote only a sidecar of, is the legitimate "rebuild me" state).
    * Any OTHER failure rethrows: a transient listing/IO error swallowed
    * as "empty" would silently trigger a full store rebuild instead of
    * a retry — the opposite of the refuse-loudly policy the commit log
    * enforces for exactly this class of failure. The benign set is
    * precisely what a missing/never-written meta produces: a
    * FileNotFound from the scan, or Spark's AnalysisException for a
    * nonexistent path / a dir with no readable parquet footers (the
    * crashed-mid-write sidecar-only shape). A PRESENT-but-unreadable
    * meta (corrupt footer, permission failure) throws through. */
  def rows(s: SparkSession, path: String): Map[String, String] =
    try s.read.parquet(s"$path/meta").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    catch {
      case _: java.io.FileNotFoundException => Map.empty
      case _: org.apache.spark.sql.AnalysisException => Map.empty
    }
}
