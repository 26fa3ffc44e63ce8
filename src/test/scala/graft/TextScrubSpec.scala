package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * q79 (PII redaction) and q80 (duplicated-shingle span fraction)
 * semantics, beyond the cross-engine hash gate:
 *
 *  - q79 plants exactly one email, one IPv4, and one phone per document
 *    (the synthetic corpus itself contains neither '@' nor digits), so
 *    the per-category counts are exactly 1 and the post-scrub re-scan
 *    must find nothing.
 *  - q80's production form never joins on the shingle key: it uses the
 *    identity n_dup = n_shingles − |{shingles with df = 1}|, where each
 *    df = 1 shingle's single owner rides along as min(doc_id). This spec
 *    pins that form equal to the naive count→join-back→re-group form on
 *    the real corpus.
 */
class TextScrubSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q79 finds exactly the planted PII and leaves no residual") {
    val rows = graft.queries.Caches.scoped(
      SparkEntry.queries("q79_pii_redact")(spark, sf)
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("n_emails") === 1, 0).otherwise(1)).as("bad_email"),
          sum(when(col("n_ips") === 1, 0).otherwise(1)).as("bad_ip"),
          sum(when(col("n_phones") === 1, 0).otherwise(1)).as("bad_phone"),
          sum(col("residual_pii")).as("residual"),
          sum(when(col("clean_text").contains("<EMAIL>")
            && col("clean_text").contains("<IP>")
            && col("clean_text").contains("<PHONE>"), 0).otherwise(1))
            .as("missing_placeholder"))
        .head())
    assert(rows.getLong(0) > 0)
    assert(rows.getLong(1) == 0, s"docs without exactly one email: ${rows.getLong(1)}")
    assert(rows.getLong(2) == 0, s"docs without exactly one ip: ${rows.getLong(2)}")
    assert(rows.getLong(3) == 0, s"docs without exactly one phone: ${rows.getLong(3)}")
    assert(rows.getLong(4) == 0, s"residual PII after scrub: ${rows.getLong(4)}")
    assert(rows.getLong(5) == 0, s"docs missing a placeholder: ${rows.getLong(5)}")
  }

  test("q81 reassembly is lossless for untouched docs and counts match the semi form") {
    val out = graft.queries.Caches.scoped(
      SparkEntry.queries("q81_chunk_dedup")(spark, sf).collect().toSeq)
    assert(out.exists(_.getLong(2) > 0), "corpus has no cross-doc duplicate chunk")

    // Untouched docs (n_removed = 0) must reassemble to EXACTLY the
    // original text — chunk → array_join round-trip loses nothing.
    val orig = graft.queries.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val untouched = out.filter(_.getLong(2) == 0)
    assert(untouched.nonEmpty, "every doc lost a chunk — plant too strong to test reassembly")
    for (r <- untouched)
      assert(r.getString(3) == orig(r.getLong(0)),
        s"doc ${r.getLong(0)} reassembly is lossy")

    // Independent recount: n_removed per doc via the SEMI form (count the
    // doc's positions whose chunk sits in the full-chunk df>=2 set)
    // instead of the production anti-join.
    val chunks = graft.queries.Tables.t(spark, sf, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS tk")
      .selectExpr("doc_id",
        "explode(transform(sequence(0, cast(ceil(size(tk) / 8.0) AS int) - 1), " +
          "i -> struct(array_join(slice(tk, i * 8 + 1, 8), ' ') AS chunk, " +
          "i * 8 + 8 <= size(tk) AS is_full))) AS c")
      .selectExpr("doc_id", "c.chunk AS chunk", "c.is_full AS is_full")
    val dup = chunks.where(col("is_full")).groupBy(col("chunk"))
      .agg(countDistinct(col("doc_id")).as("df")).where(col("df") >= 2)
      .select(col("chunk"))
    val removedBySemi = chunks.join(dup, Seq("chunk"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- out)
      assert(r.getLong(2) == removedBySemi.getOrElse(r.getLong(0), 0L),
        s"doc ${r.getLong(0)}: anti and semi forms disagree")
  }

  test("q83 coverage is monotone, truncated for real, and ends below 100%") {
    val rows = graft.queries.Caches.scoped(
      SparkEntry.queries("q83_vocab_coverage")(spark, sf).collect().toSeq)
    assert(rows.map(_.getLong(0)) == (1L to 25L),
      "ranks are not 1..25 in order")
    assert(rows.map(_.getLong(3)) == rows.map(_.getLong(3)).sorted,
      "cumulative coverage is not monotone")
    assert(rows.sliding(2).forall(p => p.head.getLong(2) >= p.last.getLong(2)),
      "counts are not non-increasing by rank")
    // vocabulary is 31 words — the 25-row table must NOT reach 100%
    assert(rows.last.getLong(3) < 1000000L,
      s"truncated table claims full coverage: ${rows.last.getLong(3)}")
  }

  test("q80's df=1 ownership form equals the naive shingle join-back form") {
    val got = graft.queries.Caches.scoped(
      SparkEntry.queries("q80_dup_shingle_frac")(spark, sf).collect().toSeq)

    // Naive reference: explode, document frequency, join back on the
    // shingle key, re-group per doc. Deliberately the shape the production
    // query avoids.
    val docs = graft.queries.Tables.t(spark, sf, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS tk")
      .where("size(tk) >= 3")
      .selectExpr("doc_id",
        """array_distinct(transform(sequence(1, size(tk) - 2),
          |  i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1), ' ',
          |              element_at(tk, i + 2)))) AS sh""".stripMargin)
    val exploded = docs.selectExpr("doc_id", "explode(sh) AS shingle")
    val freq = exploded.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val want = exploded.join(freq, Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .selectExpr("doc_id", "n_shingles", "n_dup",
        "(n_dup * 1000000L) div n_shingles AS dup_frac_e6")
      .orderBy(col("doc_id"))
      .collect().toSeq

    assert(got == want)
    // the corpus actually exercises both branches
    assert(got.exists(_.getLong(2) > 0), "no doc with any duplicated shingle")
    assert(got.exists(r => r.getLong(2) < r.getLong(1)),
      "no doc with any unique shingle")
  }

  test("q167: sliding-span scrub equals a driver brute-force recompute") {
    val got = graft.queries.Caches.scoped(
      SparkEntry.queries("q167_span_scrub")(spark, sf)
        .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))))

    // independent recompute: plain Scala over the collected corpus.
    // split(" ", -1) matches Spark's split(text, ' ') (limit -1 keeps
    // trailing empty strings).
    val docs = graft.queries.Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
      .sortBy(_._1)
    val grams = docs.flatMap { case (id, tk) =>
      if (tk.size >= 8)
        (1 to tk.size - 7).map(i => (id, i, tk.slice(i - 1, i + 7).mkString(" ")))
      else Seq.empty
    }
    val dup = grams.groupBy(_._3)
      .filter { case (_, occ) => occ.map(_._1).distinct.size >= 2 }.keySet
    val covered: Map[Long, Set[Int]] = grams.filter(g => dup(g._3))
      .flatMap { case (id, p, _) => (p to p + 7).map(id -> _) }
      .groupBy(_._1).map { case (id, ps) => id -> ps.map(_._2).toSet }
    val want = docs.map { case (id, tk) =>
      val cov = covered.getOrElse(id, Set.empty)
      val kept = tk.zipWithIndex.collect { case (t, i) if !cov(i + 1) => t }
      (id, tk.size.toLong, cov.size.toLong, kept.mkString(" "))
    }.toSeq

    assert(got == want)
    // the corpus actually contains cross-document boilerplate spans
    assert(got.exists(_._3 > 0), "no doc with any scrubbed span")
    assert(got.exists(r => r._3 == 0 && r._2 > 0), "no untouched doc")
  }

  test("q167 scrubs offset-shifted boilerplate that q81's aligned chunks keep") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_span_fixture").toString
    val span = (1 to 8).map(i => s"s$i")
    // the same 8-token span at token offset 4 in doc 1 and offset 6 in
    // doc 2 — never aligned to an 8-token chunk boundary in either doc
    val d1 = ((1 to 3).map(i => s"a$i") ++ span ++ (1 to 4).map(i => s"x$i")).mkString(" ")
    val d2 = ((1 to 5).map(i => s"b$i") ++ span ++ (1 to 2).map(i => s"y$i")).mkString(" ")
    Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val scrub = graft.queries.Caches.scoped(
      SparkEntry.queries("q167_span_scrub")(spark, tmp).collect().toSeq)
    assert(scrub.map(_.getLong(2)) == Seq(8L, 8L),
      s"each doc must scrub exactly the shared span: $scrub")
    assert(scrub.map(_.getString(3)) == Seq("a1 a2 a3 x1 x2 x3 x4", "b1 b2 b3 b4 b5 y1 y2"))

    // q81's aligned chunking sees no equal chunk across the two docs
    val chunk = graft.queries.Caches.scoped(
      SparkEntry.queries("q81_chunk_dedup")(spark, tmp).collect().toSeq)
    assert(chunk.map(_.getLong(2)).forall(_ == 0L),
      s"fixed chunks must keep the unaligned boilerplate: $chunk")
    graft.queries.Caches.releaseAll()
  }
}
