package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * PERSISTED BENCHMARK-DECONTAMINATION STORE — the decontamination
 * capability (q63 exact n-grams, q97 MinHash bands, q114 winnow
 * fingerprints) re-expressed as the store lifecycle the rest of the
 * family uses. The operational asymmetry decontamination actually has:
 * benchmark suites change RARELY (a new eval ships → absorb its
 * fingerprints once), while corpus batches arrive continuously — so the
 * right persistent artifact is the benchmark fingerprint set, judged
 * against by every incoming batch without re-fingerprinting a single
 * benchmark document.
 *
 * Store = q114's MOSS winnow fingerprints (Rabin-Karp 8-grams, min per
 * 4-window — position-local, so robust to edits around a contaminated
 * span) of the benchmark slice, keyed (bench_id, fp). Build takes
 * tranche A (bench doc_id % 2 = 0), absorb adds tranche B — the
 * new-benchmark-ships verb. The judge fingerprints ONLY the incoming
 * docs and equi-joins the BROADCAST store: unlike q114's corpus-side
 * inverted index (which needs the df-band cost cap because it joins
 * corpus×corpus), the store join is corpus×bench with the bench side
 * |bench fps|-bounded and shipped to every executor — no shuffle of the
 * corpus fingerprint stream, no global df statistic to maintain
 * incrementally (exactly the term that does NOT decompose under corpus
 * growth). Contamination verdict: ≥ 2 distinct shared fingerprints,
 * q114's threshold.
 *
 * The planted contaminations (doc_id % 97 = 1 carries the text of
 * doc_id − 1, a benchmark doc — TextPipeline's q114 device, identical
 * CTE in the oracle) guarantee hits at every SF; the DuckDB oracle
 * replays fingerprinting, the bench set, and the judge from scratch.
 */
object DecontamIndex {

  private[graft] def root(dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    s"${sys.props("java.io.tmpdir")}/graft_decontam_idx_$h"
  }

  /** q114's planted source: docs with doc_id % 97 = 1 carry the text of
    * doc (doc_id − 1) — a benchmark (% 97 = 0) doc — so contaminated
    * verdicts are exercised deterministically in both engines. */
  private def plantedSrc(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.t(s, dir, "documents").select(col("doc_id"), col("text"))
    base
      .join(base.selectExpr("doc_id + 1 AS p_id", "text AS p_text"),
        col("p_id") === col("doc_id") && col("doc_id") % 97 === 1, "left")
      .selectExpr("doc_id",
        "CASE WHEN doc_id % 97 = 1 AND p_text IS NOT NULL THEN p_text" +
          " ELSE text END AS text")
  }

  /** Per-doc DISTINCT winnow fingerprints over the normalized text —
    * the same codegen'd chain as q114. */
  private def fpsOf(s: SparkSession, df: DataFrame): DataFrame = {
    graft.functions.WinnowFingerprints.register(s)
    df.selectExpr("doc_id", "lower(regexp_replace(text, '[^a-z0-9]', '')) AS tx")
      .where("length(tx) >= 11")
      .selectExpr("doc_id",
        "explode(array_distinct(winnow_fingerprints(tx, 8, 4))) AS fp")
  }

  // benchmark tranches: planting never touches % 97 = 0 docs, so the
  // raw table is the benchmark source
  private def benchTranche(s: SparkSession, dir: String, even: Boolean): DataFrame =
    Tables.t(s, dir, "documents")
      .where(s"doc_id % 97 = 0 AND doc_id % 2 = ${if (even) 0 else 1}")
      .select(col("doc_id"), col("text"))

  private def fingerprint(s: SparkSession, dir: String): String = {
    val r = benchTranche(s, dir, even = true)
      .selectExpr("cast(conv(substring(md5(text), 1, 8), 16, 10) AS bigint) AS h")
      .agg(count(lit(1)).as("n"), sum(col("h")).as("hsum"))
      .head()
    s"${r.getLong(0)}:${r.getLong(1)}"
  }

  private def writeMeta(s: SparkSession, path: String, fp: String): Unit = {
    import s.implicits._
    Seq(fp).toDF("fp")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Build from benchmark tranche A; meta (tranche fingerprint) LAST. */
  def build(s: SparkSession, dir: String): String = {
    val path = root(dir)
    fpsOf(s, benchTranche(s, dir, even = true))
      .selectExpr("doc_id AS bench_id", "fp")
      .write.mode("overwrite").parquet(s"$path/fps")
    writeMeta(s, path, fingerprint(s, dir))
    path
  }

  def isCurrent(s: SparkSession, dir: String): Boolean =
    try s.read.parquet(s"${root(dir)}/meta").head().getString(0) ==
      fingerprint(s, dir)
    catch { case _: Exception => false }

  def buildIfStale(s: SparkSession, dir: String): String =
    if (isCurrent(s, dir)) root(dir) else build(s, dir)

  /** A new benchmark suite ships: absorb its fingerprints as a layer.
    * Meta flips first (invalidate-before-mutate, the family bracket). */
  def absorb(s: SparkSession, dir: String): Unit = {
    val path = root(dir)
    writeMeta(s, path, "absorbed")
    fpsOf(s, benchTranche(s, dir, even = false))
      .selectExpr("doc_id AS bench_id", "fp")
      .write.mode("append").parquet(s"$path/fps")
  }

  /** Judge a batch of documents against the store: fingerprint the
    * BATCH only, broadcast-join the persisted benchmark fingerprints,
    * flag docs sharing ≥ 2 distinct fingerprints. No benchmark doc is
    * ever re-read, let alone re-fingerprinted. */
  def judgeDocs(s: SparkSession, dir: String, batch: DataFrame): DataFrame =
    fpsOf(s, batch)
      .join(broadcast(s.read.parquet(s"${root(dir)}/fps")), Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("fp")).as("n_shared_fp"),
        min(col("bench_id")).as("bench_match"))
      .where(col("n_shared_fp") >= 2)
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // build tranche A, absorb tranche B, judge the (planted) corpus —
    // the full lifecycle; the oracle replays it with one bench set,
    // which is exactly what build ∪ absorb must equal
    "q153_decontam_store" -> ((s, dir) => {
      buildIfStale(s, dir)
      absorb(s, dir)
      judgeDocs(s, dir, plantedSrc(s, dir).where("doc_id % 97 != 0"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q153_decontam_store" ->
      s"""WITH ${TextPipeline.duckWinnowExCtes},
         |bench AS (SELECT doc_id AS bench_id, fp FROM ex WHERE doc_id % 97 = 0),
         |m AS (SELECT c.doc_id, count(DISTINCT c.fp)::BIGINT AS n_shared_fp,
         |    min(b.bench_id) AS bench_match
         |  FROM ex c JOIN bench b ON b.fp = c.fp
         |  WHERE c.doc_id % 97 != 0 GROUP BY c.doc_id)
         |SELECT doc_id, n_shared_fp, bench_match FROM m
         |WHERE n_shared_fp >= 2 ORDER BY doc_id""".stripMargin
  )
}
