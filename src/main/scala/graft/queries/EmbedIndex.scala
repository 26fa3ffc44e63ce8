package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * INCREMENTAL EMBEDDING DEDUP (q141) — [[DedupIndex]]'s story in VECTOR
 * space: judge a delta of new embeddings against a PERSISTED bucket
 * index of everything already ingested, without re-reading the corpus
 * vectors. Semantic duplicates (same content re-encoded, different
 * words) are invisible to every n-gram method — at 100 TB this judge is
 * the arrival-time filter in front of the expensive stages.
 *
 * Store layout under the md5-keyed tmpdir root:
 *   buckets/  (bucket, vec_id) — q29's deterministic sign-bit blocking
 *             (leading-3-dim signs, 8 buckets), so candidate generation
 *             is an EQUI-join: a delta vector is only ever compared
 *             inside its own bucket, never across the corpus;
 *   meta/     corpus fingerprint, written LAST (crashed build rebuilds).
 *
 * Candidates rehydrate their float vectors from the corpus table by
 * vec_id (the index stores ids, not vectors — single source of truth,
 * same economy as [[graft.similarity.AnnIndex]]); the judge computes
 * EXACT cosine on each candidate and classifies:
 *   exact  — best cosine >= 0.9999 (a re-ingested identical vector;
 *            planted: delta vec_id % 10 = 7 carries the embedding of
 *            vec (vec_id − 7), mirroring q84's planting device),
 *   near   — best cosine >= 0.3 (q29's oracled threshold; 84 natural
 *            delta×corpus pairs at sf0.001),
 *   unique — otherwise.
 *
 * Everything is deterministic — the sign buckets are integer predicates,
 * the cosines are bit-identical doubles in both engines (same
 * association order as q29's oracle) — so unlike the gaussian-plane ANN
 * judges this lifecycle is fully DuckDB-oracled. Absorbing survivors is
 * the same append mechanics as [[DedupIndex.absorbDocs]] (append the
 * unique vecs' bucket rows, flip meta non-pristine) and is left to that
 * store's demonstrated pattern.
 */
object EmbedIndex {

  private def root(dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    s"${sys.props("java.io.tmpdir")}/graft_embed_idx_$h"
  }

  private def corpusVecs(s: SparkSession, dir: String): DataFrame =
    TextPipeline.embDoubles(s, dir).where("vec_id % 10 < 7")

  /** The delta slice with vec_id % 10 = 7 vectors PLANTED as copies of
    * vec (vec_id − 7) — embedding AND bucket travel together, exactly as
    * a re-ingested duplicate would arrive. */
  private[queries] def deltaVecs(s: SparkSession, dir: String): DataFrame = {
    val all = TextPipeline.embDoubles(s, dir)
    all.where("vec_id % 10 >= 7").select(col("vec_id"), col("e"), col("bucket"))
      .join(all.select(col("vec_id").as("src_id"), col("e").as("src_e"),
          col("bucket").as("src_bucket")),
        col("src_id") === col("vec_id") - lit(7) && col("vec_id") % 10 === 7,
        "left")
      .selectExpr("vec_id", "coalesce(src_e, e) AS e",
        "coalesce(src_bucket, bucket) AS bucket")
  }

  /** Corpus-slice fingerprint: count + order-independent xor over
    * (vec_id, embedding) — any membership or in-place vector change
    * moves it. Column-pruned id+vector scan, no shuffle. */
  private def fingerprint(s: SparkSession, dir: String): String = {
    val r = Tables.t(s, dir, "embeddings").where("vec_id % 10 < 7")
      .selectExpr("count(*) AS n",
        "coalesce(bit_xor(xxhash64(vec_id, embedding)), 0L) AS chk")
      .head()
    s"${r.getLong(0)}:${r.getLong(1)}"
  }

  def build(s: SparkSession, dir: String): String = {
    val path = root(dir)
    corpusVecs(s, dir).select(col("bucket"), col("vec_id"))
      .write.mode("overwrite").parquet(s"$path/buckets")
    import s.implicits._
    Seq(fingerprint(s, dir)).toDF("fp")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    path
  }

  def isCurrent(s: SparkSession, dir: String): Boolean =
    try s.read.parquet(s"${root(dir)}/meta").head().getString(0) ==
      fingerprint(s, dir)
    catch { case _: Exception => false }

  def buildIfStale(s: SparkSession, dir: String): String =
    if (isCurrent(s, dir)) root(dir) else build(s, dir)

  /** Judge every delta vector against the persisted bucket index: one
    * bucket equi-join for candidates, one vec_id equi-join to rehydrate
    * candidate vectors from the corpus, exact cosine, then the
    * deterministic best-candidate pick (max cosine, min vec_id among
    * ties — doubles are bit-identical cross-engine, so the tie set is
    * too). */
  def deltaVerdicts(s: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(s)
    val path = root(dir)
    val delta = deltaVecs(s, dir)
    val cand = delta.select(col("vec_id").as("d_id"), col("e").as("ae"), col("bucket"))
      .join(s.read.parquet(s"$path/buckets").withColumnRenamed("vec_id", "c_id"),
        Seq("bucket"))
      .join(TextPipeline.embDoubles(s, dir)
          .select(col("vec_id").as("c_id"), col("e").as("be")),
        Seq("c_id"))
      .selectExpr("d_id", "c_id", "cosine_similarity(ae, be) AS cos")
    val agg = cand.groupBy(col("d_id"))
      .agg(max(col("cos")).as("best_cos"),
        sum(when(col("cos") >= 0.3, 1L).otherwise(0L)).as("n_sim"))
    val best = cand.join(agg, Seq("d_id"))
      .where(col("cos") === col("best_cos"))
      .groupBy(col("d_id"), col("best_cos"), col("n_sim"))
      .agg(min(col("c_id")).as("best_match"))
    delta.select(col("vec_id"))
      .join(best, col("vec_id") === col("d_id"), "left")
      .selectExpr("vec_id",
        "coalesce(n_sim, 0L) AS n_sim",
        "coalesce(best_match, -1L) AS best_match",
        "round(coalesce(best_cos, -2.0), 4) AS best_cos_r",
        "CASE WHEN best_cos >= 0.9999 THEN 'exact' " +
          "WHEN best_cos >= 0.3 THEN 'near' " +
          "ELSE 'unique' END AS verdict")
      .orderBy(col("vec_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q141_embed_dedup_store" -> ((s, dir) => {
      buildIfStale(s, dir); deltaVerdicts(s, dir)
    })
  )

  // DuckDB recomputes the whole flow: planted delta, sign buckets, exact
  // cosines (same association order as q29's oracle — bit-identical
  // doubles), the same best pick and thresholds.
  val oracles: Map[String, String] = Map(
    "q141_embed_dedup_store" ->
      s"""WITH emb AS (SELECT vec_id,
         |    list_transform(embedding, x -> x::DOUBLE) AS e,
         |    (embedding[1] > 0)::INT * 4 + (embedding[2] > 0)::INT * 2
         |      + (embedding[3] > 0)::INT AS bucket
         |  FROM embeddings),
         |src AS (SELECT d.vec_id, coalesce(o.e, d.e) AS e,
         |    coalesce(o.bucket, d.bucket) AS bucket
         |  FROM emb d LEFT JOIN emb o
         |    ON o.vec_id = d.vec_id - 7 AND d.vec_id % 10 = 7
         |  WHERE d.vec_id % 10 >= 7),
         |store AS (SELECT vec_id, e, bucket FROM emb WHERE vec_id % 10 < 7),
         |cand AS (SELECT s.vec_id AS d_id, t.vec_id AS c_id,
         |    ${TextPipeline.duckCos("s", "t")} AS cos
         |  FROM src s JOIN store t ON s.bucket = t.bucket),
         |agg AS (SELECT d_id, max(cos) AS best_cos,
         |    sum(CASE WHEN cos >= 0.3 THEN 1 ELSE 0 END)::BIGINT AS n_sim
         |  FROM cand GROUP BY d_id),
         |best AS (SELECT cand.d_id, agg.best_cos, agg.n_sim,
         |    min(c_id) AS best_match
         |  FROM cand JOIN agg ON cand.d_id = agg.d_id
         |    AND cand.cos = agg.best_cos
         |  GROUP BY cand.d_id, agg.best_cos, agg.n_sim)
         |SELECT src.vec_id,
         |  coalesce(n_sim, 0)::BIGINT AS n_sim,
         |  coalesce(best_match, -1) AS best_match,
         |  round(coalesce(best_cos, -2.0), 4) AS best_cos_r,
         |  CASE WHEN best_cos >= 0.9999 THEN 'exact'
         |       WHEN best_cos >= 0.3 THEN 'near'
         |       ELSE 'unique' END AS verdict
         |FROM src LEFT JOIN best ON best.d_id = src.vec_id
         |ORDER BY src.vec_id""".stripMargin
  )
}
