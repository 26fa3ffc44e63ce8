package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * INCREMENTAL VOCABULARY STORE (q140) — the token-frequency sibling of
 * [[StatsStore]]: per-word counts kept as persisted mergeable partials,
 * so each new batch advances the corpus vocabulary statistics by
 * appending its own (word, cnt) layer instead of re-tokenizing
 * everything ingested. The read path (top-25 coverage, q83's shape)
 * merges the bounded vocabulary table, never the corpus. At 100 TB the
 * vocabulary distribution drives tokenizer health checks (OOV drift,
 * coverage curves) nightly — an O(batch) refresh here vs O(corpus).
 *
 * Counts merge by addition, so the absorbed store is EXACTLY the full
 * recompute, and the q140 oracle (q83's SQL over the full table) checks
 * the whole build → absorb → read lifecycle cross-engine. The store is
 * |vocab|-sized (#batches layers before a periodic compacting build).
 */
object VocabStore {

  // md5-fragment path keying — see DedupIndex.root.
  private def root(dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    s"${sys.props("java.io.tmpdir")}/graft_vocab_store_$h"
  }

  private def corpusDocs(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents").where("doc_id % 10 < 7")

  private def deltaDocs(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents").where("doc_id % 10 >= 7")

  /** (word, cnt) partials — map-side combine collapses each partition to
    * its local vocabulary before the exchange. */
  private def partials(df: DataFrame): DataFrame =
    df.selectExpr("explode(split(text, ' ')) AS word")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Corpus-slice content fingerprint (same device as StatsStore). */
  private def fingerprint(s: SparkSession, dir: String): String = {
    val r = corpusDocs(s, dir)
      .selectExpr("cast(conv(substring(md5(text), 1, 12), 16, 10) AS bigint) AS h")
      .agg(count(lit(1)).as("n"), sum(col("h")).as("hsum"))
      .head()
    s"${r.getLong(0)}:${r.getLong(1)}"
  }

  def build(s: SparkSession, dir: String): String = {
    val path = root(dir)
    partials(corpusDocs(s, dir))
      .write.mode("overwrite").parquet(s"$path/partials")
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

  def absorb(s: SparkSession, dir: String): Unit = {
    val path = root(dir)
    partials(deltaDocs(s, dir))
      .write.mode("append").parquet(s"$path/partials")
    import s.implicits._
    Seq("absorbed").toDF("fp")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** q83's coverage read from the STORE ALONE: merge the layered counts
    * (one |vocab|-bounded groupBy), then rank/coverage over the top-25 —
    * the tiny-table window shape q83 established. */
  def coverage(s: SparkSession, dir: String): DataFrame = {
    val freq = Caches.persist(
      s.read.parquet(s"${root(dir)}/partials")
        .groupBy(col("word")).agg(sum(col("cnt")).as("cnt")))
    val total = freq.agg(sum(col("cnt")).as("total"))
    val w = Window.orderBy(col("cnt").desc, col("word"))
    freq.orderBy(col("cnt").desc, col("word")).limit(25)
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_cnt",
        sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .selectExpr("cast(rank AS bigint) AS rank", "word", "cnt",
        "(cum_cnt * 1000000L) div total AS cum_frac_e6")
      .orderBy(col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // build corpus vocab → absorb the delta's counts → read coverage
    // from the store alone; the oracle recomputes q83's coverage from
    // the full table, closing the lifecycle cross-engine
    "q140_vocab_store" -> ((s, dir) => {
      buildIfStale(s, dir); absorb(s, dir); coverage(s, dir)
    })
  )

  // q83's oracle verbatim — the absorbed store must land on the same
  // top-25, counts, and coverage fractions as a from-scratch full-table
  // tokenization.
  val oracles: Map[String, String] = Map(
    "q140_vocab_store" ->
      s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
         |f AS (SELECT word, count(*)::BIGINT AS cnt FROM w GROUP BY word),
         |tt AS (SELECT sum(cnt)::BIGINT AS total FROM f),
         |top AS (SELECT word, cnt,
         |    row_number() OVER (ORDER BY cnt DESC, word) AS rank
         |  FROM f ORDER BY cnt DESC, word LIMIT 25)
         |SELECT rank::BIGINT AS rank, word, cnt,
         |  ((sum(cnt) OVER (ORDER BY rank
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000)
         |    // total)::BIGINT AS cum_frac_e6
         |FROM top, tt ORDER BY rank""".stripMargin
  )
}
