package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavior gates for the mergeable-sketch store (q170/q171) and the
  * text diagnostics (q172/q174) — the oracles prove cross-engine value
  * identity; these pin the CLAIMS behind the constructions: the CMS
  * estimate is one-sided and tight at this geometry, the KMV sample is
  * exactly the global bottom-k, CDC boundaries re-synchronize after an
  * insertion (the property fixed-width chunking lacks), and the
  * curriculum rank is a true permutation ordered easy-to-hard. */
class SketchStoreSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q170: CMS estimates are one-sided (est >= true) and tight") {
    val est = graft.queries.Caches.scoped(
      SparkEntry.queries("q170_cms_store")(spark, sf).collect().toSeq)
    assert(est.size == 20)
    val trueCnt = graft.queries.Tables.t(spark, sf, "documents")
      .selectExpr("explode(split(text, ' ')) AS word")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    var overs = 0L
    est.foreach { r =>
      val (word, e) = (r.getString(1), r.getLong(2))
      val t = trueCnt(word)
      assert(e >= t, s"CMS underestimated '$word': est $e < true $t")
      overs += e - t
    }
    // tightness at 4x1024 on this vocabulary: collisions exist but the
    // min-over-rows keeps the aggregate inflation small (measured 0 on
    // sf0.001's ~1k vocab; allow headroom for corpus evolution)
    val totalTrue = est.map(r => trueCnt(r.getString(1))).sum
    assert(overs * 10 <= totalTrue,
      s"CMS overestimate too loose: +$overs over $totalTrue true mass")
  }

  test("q171: KMV store read equals the full table's exact bottom-64") {
    val got = graft.queries.Caches.scoped(
      SparkEntry.queries("q171_kmv_sample")(spark, sf).collect().toSeq)
      .map(r => (r.getLong(1), r.getLong(3)))
    val want = graft.queries.Tables.t(spark, sf, "documents")
      .selectExpr("doc_id",
        "cast(conv(substring(md5(cast(doc_id AS string)), 1, 15), 16, 10) AS bigint) AS p")
      .orderBy(col("p")).limit(64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want, "merged bottom-k diverged from the global bottom-k")
    // priorities strictly increasing => rank is well-defined, no dup docs
    assert(got.map(_._2) == got.map(_._2).distinct.sorted)
  }

  test("q172: CDC boundaries re-synchronize after a front insertion") {
    import spark.implicits._
    // one long synthetic doc; its CDC chunks past the perturbed prefix
    // must reappear IDENTICALLY when a token is inserted at the front —
    // the content-defined property (fixed-width chunking re-keys every
    // later chunk). Words drawn deterministically so chunking is stable.
    val words = (0 until 400).map(i => s"w${(i * 2654435761L) % 9973}")
    val base = words.mkString(" ")
    val shifted = ("INS " + base)
    val df = Seq((1L, "en", base), (2L, "en", shifted))
      .toDF("doc_id", "lang", "text")
    val dirTmp = java.nio.file.Files.createTempDirectory("cdcspec").toString
    df.write.mode("overwrite").parquet(s"$dirTmp/documents.parquet")
    val chunks = graft.queries.Caches.scoped(
      graft.queries.TextDiag.cdcChunks(spark, dirTmp)
        .select("doc_id", "chunk").collect().toSeq)
    val c1 = chunks.filter(_.getLong(0) == 1L).map(_.getString(1)).toSet
    val c2 = chunks.filter(_.getLong(0) == 2L).map(_.getString(1)).toSet
    val shared = c1.intersect(c2).size
    // all but the first few chunks must survive the shift verbatim
    assert(shared * 10 >= c1.size * 8,
      s"CDC lost re-synchronization: only $shared/${c1.size} chunks survive an insertion")
    // and it IS content-defined, not one-chunk-per-doc degenerate
    assert(c1.size >= 20, s"degenerate chunking: ${c1.size} chunks for 400 tokens")
  }

  test("q174: curriculum rank is a dense easy-to-hard permutation") {
    val rows = graft.queries.Caches.scoped(
      SparkEntry.queries("q174_curriculum")(spark, sf).collect().toSeq)
    val n = rows.size
    assert(n > 0)
    assert(rows.map(_.getLong(2)).sorted == (1L to n).toSeq, "ranks not dense")
    // monotone difficulty: n_chars non-decreasing along the schedule
    val byRank = rows.sortBy(_.getLong(2)).map(_.getLong(1))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b },
      "curriculum not ordered easiest-first")
    // phases are the deciles: 10 groups, sizes within 1 of n/10
    val phases = rows.groupBy(_.getLong(3)).map { case (p, rs) => p -> rs.size }
    assert(phases.keySet == (0L to 9L).toSet)
    assert(phases.values.max - phases.values.min <= 1)
  }
}
