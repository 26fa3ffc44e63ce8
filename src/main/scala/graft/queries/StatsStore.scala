package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * INCREMENTAL AGGREGATE MAINTENANCE — the stats sibling of
 * [[DedupIndex]]: corpus-level summary statistics kept as a PERSISTED
 * table of mergeable partial aggregates, so a new batch updates the
 * stats by merging its own partials instead of re-scanning everything
 * already ingested. At 100 TB this is the difference between an O(batch)
 * nightly refresh and an O(corpus) one.
 *
 * The partial-aggregate algebra is the classic moment-sum form: per
 * (lang, source) keep (n, Σx, Σx², min, max) over n_chars — every field
 * merges by sum/min/max, so merge is associative and commutative and the
 * merged result is EXACTLY the full recompute (integer sums, no
 * floating-point drift). Finalization derives mean and variance as
 * fixed-point integers (mean ×1e6, variance ×1e3 — the smaller variance
 * scale keeps n·Σx² − (Σx)² × scale inside int64 at the tested SFs; the
 * DuckDB oracle passes through HUGEINT and casts, landing on the same
 * digits).
 *
 * Store lifecycle mirrors DedupIndex: corpus slice = doc_id % 10 < 7,
 * delta = the rest; build is fingerprint-guarded (build-once-merge-many)
 * with meta written LAST so a crashed build rebuilds. The store is
 * #groups-sized — broadcastable by construction; the only corpus-scale
 * work in the steady state is the delta's own partial aggregation.
 */
object StatsStore {

  // md5 fragment, not hashCode — see DedupIndex.root / annIndexPath.
  // `variant` separates independent store instances (the absorbing
  // lifecycles q134/q136 vs q107's pristine-store contract) — see
  // DedupIndex.root's note.
  private[graft] def root(dir: String, variant: String = ""): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val v = if (variant.isEmpty) "" else s"_$variant"
    s"${sys.props("java.io.tmpdir")}/graft_stats_store_$h$v"
  }

  private def corpusDocs(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents").where("doc_id % 10 < 7")

  private def deltaDocs(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents").where("doc_id % 10 >= 7")

  /** Moment-sum partials per (lang, source). Map-side combine collapses
    * each partition to at most #groups rows before the exchange. */
  private def partials(df: DataFrame): DataFrame =
    df.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("s1"),
        sum(col("n_chars") * col("n_chars")).as("s2"),
        min(col("n_chars")).as("mn"),
        max(col("n_chars")).as("mx"))

  /** Content fingerprint of the corpus slice (count + order-independent
    * hash-sum over the stat-relevant columns) — any change to membership,
    * grouping keys, or n_chars moves it. */
  private def fingerprint(s: SparkSession, dir: String): String = {
    val r = corpusDocs(s, dir)
      .selectExpr("cast(conv(substring(md5(concat_ws('|', lang, source, " +
        "cast(n_chars AS string))), 1, 12), 16, 10) AS bigint) AS h")
      .agg(count(lit(1)).as("n"), sum(col("h")).as("hsum"))
      .head()
    s"${r.getLong(0)}:${r.getLong(1)}"
  }

  def build(s: SparkSession, dir: String, variant: String = ""): String = {
    val path = root(dir, variant)
    partials(corpusDocs(s, dir))
      .write.mode("overwrite").parquet(s"$path/partials")
    import s.implicits._
    Seq(fingerprint(s, dir)).toDF("fp")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    path
  }

  def isCurrent(s: SparkSession, dir: String, variant: String = ""): Boolean =
    try s.read.parquet(s"${root(dir, variant)}/meta").head().getString(0) ==
      fingerprint(s, dir)
    catch { case _: Exception => false }

  def buildIfStale(s: SparkSession, dir: String, variant: String = ""): String =
    if (isCurrent(s, dir, variant)) root(dir, variant) else build(s, dir, variant)

  /** ABSORB: append the delta's partials into the store so the stats
    * advance permanently — afterwards the store alone covers corpus ∪
    * delta, and the next batch merges against it without re-reading
    * either. Append-only (no store rewrite); the meta fingerprint is NOT
    * updated to the corpus slice (the store no longer equals it), so
    * `isCurrent` correctly reads false and the oracled q107 path — which
    * needs the pristine corpus-only store — rebuilds via buildIfStale.
    * The partials table stays #batches × #groups rows; a periodic
    * `build` compacts it back to #groups. */
  def absorb(s: SparkSession, dir: String, variant: String = ""): Unit = {
    val path = root(dir, variant)
    partials(deltaDocs(s, dir))
      .write.mode("append").parquet(s"$path/partials")
    import s.implicits._
    Seq("absorbed").toDF("fp")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Finalized stats from the STORE ALONE (no live delta) — the read a
    * dashboard does between batches. After absorb, this equals the full
    * corpus ∪ delta recompute exactly (spec-pinned). */
  def storedStats(s: SparkSession, dir: String, variant: String = ""): DataFrame =
    finalize(s.read.parquet(s"${root(dir, variant)}/partials"))

  /** Persisted corpus partials ∪ live delta partials → merge → finalize.
    * The merge groupBy runs over 2×#groups rows; the only corpus-scale
    * stage is the delta's own aggregation. */
  def mergedStats(s: SparkSession, dir: String): DataFrame =
    finalize(s.read.parquet(s"${root(dir)}/partials")
      .unionByName(partials(deltaDocs(s, dir))))

  /** Merge a partials frame (any number of batch layers per group) and
    * derive the finalized stats. The fixed-point scales (mean ×1e6,
    * variance ×1e3) keep n·Σx² − (Σx)² × scale inside int64 at the
    * tested SFs; beyond them the session's ANSI mode turns overflow into
    * a LOUD error rather than a silent wrap — widen to DECIMAL before
    * raising the scales. */
  private def finalize(p: DataFrame): DataFrame =
    p.groupBy(col("lang"), col("source"))
      .agg(sum(col("n")).as("n"), sum(col("s1")).as("s1"),
        sum(col("s2")).as("s2"), min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))
      .selectExpr("lang", "source", "n AS n_docs", "s1 AS total_chars",
        "(s1 * 1000000L) div n AS mean_e6",
        "((n * s2 - s1 * s1) * 1000L) div (n * n) AS var_e3",
        "mn AS min_chars", "mx AS max_chars")
      .orderBy(col("lang"), col("source"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q107_incremental_stats" -> ((s, dir) => {
      buildIfStale(s, dir); mergedStats(s, dir)
    }),
    // The POST-ABSORB read path, oracled: q107 merges live delta partials
    // against the pristine store; here the delta is ABSORBED first and
    // the dashboard read ([[storedStats]] — store alone, no live input)
    // must land on the full-table recompute's exact integers. This is
    // the multi-batch lifecycle cross-engine: build → absorb → read,
    // where before r15 the absorbed state was spec-only.
    "q136_stats_absorbed" -> ((s, dir) => {
      buildIfStale(s, dir, "abs"); absorb(s, dir, "abs"); storedStats(s, dir, "abs")
    })
  )

  // Both oracles recompute the SAME stats from the full table in one
  // pass — merged partials (q107) and the absorbed store read (q136)
  // must land on identical integers, which is exactly the mergeability
  // claim under test.
  private lazy val fullRecomputeOracle: String =
      """SELECT lang, source, count(*)::BIGINT AS n_docs,
        |  sum(n_chars)::BIGINT AS total_chars,
        |  ((sum(n_chars) * 1000000) // count(*))::BIGINT AS mean_e6,
        |  (((count(*) * sum(n_chars * n_chars) - sum(n_chars) * sum(n_chars))
        |     * 1000) // (count(*) * count(*)))::BIGINT AS var_e3,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin

  val oracles: Map[String, String] = Map(
    "q107_incremental_stats" -> fullRecomputeOracle,
    "q136_stats_absorbed" -> fullRecomputeOracle
  )
}
