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

  /** Swap a fully-staged table dir into its live location as a METADATA
    * move (delete + rename) instead of a second read-rewrite Spark job
    * over the same bytes (r22, guide §6 — move bytes once). The staged
    * dir was already written complete; renaming preserves its files
    * (and any range-disjointness their writer arranged) exactly. Crash
    * story is unchanged: callers flip the meta torn BEFORE the swap, so
    * a failure between the delete and the rename reads as torn and the
    * next lifecycle heals by rebuild. On object stores a dir rename
    * degrades to a server-side copy — still strictly cheaper than
    * re-reading and re-writing the bytes through Spark tasks. */
  def swapIn(s: SparkSession, staging: String, live: String): Unit = {
    val src = new org.apache.hadoop.fs.Path(staging)
    val fs = src.getFileSystem(s.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(live)
    fs.delete(dst, true)
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"swap rename $src -> $dst failed")
  }

  def write(s: SparkSession, path: String,
      rows: Seq[(String, String)]): Unit = {
    import s.implicits._
    rows.toDF("kind", "fp").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** The two AnalysisException conditions that genuinely mean "meta was
    * never written": a nonexistent path, and a dir holding no readable
    * parquet footers (the crashed-mid-write sidecar-only shape — Spark
    * cannot infer a schema from _SUCCESS alone). Every OTHER condition
    * an AnalysisException can carry (access/permission surfaced through
    * the analyzer, schema-resolution failures, a null legacy condition)
    * is a present-store problem and must rethrow — the r19 ADVICE
    * narrowing: the broad catch silently demoted those to a full store
    * rebuild. Factored on the condition STRING so the classifier is
    * directly spec-able without constructing private exceptions. */
  private[queries] def benignMetaCondition(condition: String): Boolean =
    condition == "PATH_NOT_FOUND" || condition == "UNABLE_TO_INFER_SCHEMA"

  /** MISSING or WRONG-SHAPED meta reads as EMPTY — the torn/stale
    * default every caller's ladder rebuilds from. Two benign classes:
    *   - missing/never-written: FileNotFound from the scan, or Spark's
    *     AnalysisException carrying one of the two never-written
    *     conditions ([[benignMetaCondition]]);
    *   - legacy/foreign LAYOUT: a readable parquet whose schema is not
    *     two leading string columns — e.g. the pre-r18 single-column
    *     flat stamp, whose documented contract (SearchStore's ladder)
    *     is "fails the (kind, fp) read and self-heals as stale". The
    *     shape is checked BEFORE collecting so the heal stays a schema
    *     decision, never an exception-classification one.
    * Any OTHER failure rethrows: a transient IO error (corrupt footer,
    * permission failure) — or an AnalysisException outside the two
    * benign conditions — swallowed as "empty" would silently trigger a
    * full store rebuild instead of a retry; the opposite of the
    * refuse-loudly policy the commit log enforces for exactly this
    * class of failure. */
  def rows(s: SparkSession, path: String): Map[String, String] = {
    import org.apache.spark.sql.types.StringType
    val df =
      try s.read.parquet(s"$path/meta")
      catch {
        case _: java.io.FileNotFoundException => return Map.empty
        case e: org.apache.spark.sql.AnalysisException
            if benignMetaCondition(e.getCondition) => return Map.empty
      }
    val shapeOk = df.schema.length >= 2 &&
      df.schema.take(2).forall(_.dataType == StringType)
    if (!shapeOk) return Map.empty // legacy/foreign layout ⇒ stale
    df.collect().map(r => (r.getString(0), r.getString(1))).toMap
  }
}
