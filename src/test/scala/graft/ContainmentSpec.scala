package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/**
 * [[graft.queries.TextPipeline.containmentOf]] — the directional dedup
 * signal: a short document quoted wholesale inside a longer one scores
 * containment 1.0 while its Jaccard similarity stays far below any
 * near-dup threshold, so the symmetric q25 pass structurally cannot flag
 * it. These specs pin that asymmetry and the df-cap blocking contract.
 */
class ContainmentSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import graft.queries.{Caches, TextPipeline}

  private def shDocs(rows: (Long, Seq[String])*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "sh")
  }

  test("full quote: containment 1.0 one way, partial the other, low jaccard") {
    // doc 1 = 4 shingles, all present in doc 2's 20 → containment(1→2)=1.0
    // but jaccard = 4/20 = 0.2: q25's symmetric threshold never fires
    val small = (0 until 4).map(i => s"q$i")
    val big = small ++ (0 until 16).map(i => s"b$i")
    val out = Caches.scoped(
      TextPipeline.containmentOf(shDocs(1L -> small, 2L -> big))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)
    assert(out.contains((1L, 2L, 1.0)), s"quote direction missing: $out")
    // reverse direction: 4/20 = 0.2 < 0.8 — correctly absent
    assert(!out.exists(t => t._1 == 2L && t._2 == 1L), s"reverse leaked: $out")
    val jaccard = 4.0 / 20.0
    assert(jaccard < 0.5, "fixture must stay below the near-dup bar")
  }

  test("df cap: a shingle shared by too many docs generates no candidates") {
    // 25 docs all share shingle 's' (df=25 > dfMax=20) plus a unique one
    // (df=1 < dfMin=2) — no blocking shingle survives, so no pairs at all
    val docs = (1L to 25L).map(i => i -> Seq("s", s"u$i"))
    val out = Caches.scoped(
      TextPipeline.containmentOf(shDocs(docs: _*)).collect())
    assert(out.isEmpty, s"boilerplate shingle fanned out: ${out.length} pairs")
  }

  test("threshold is applied to the rounded value") {
    // |Sa∩Sb|/|Sa| = 7/9 = 0.7778 < 0.8 → dropped; 8/9 = 0.8889 → kept
    val sa9 = (0 until 9).map(i => s"x$i")
    val sb7 = (0 until 7).map(i => s"x$i") // shares 7 of 9
    val sc8 = (0 until 8).map(i => s"x$i") :+ "y" // shares 8 of 9
    val out = Caches.scoped(
      TextPipeline.containmentOf(shDocs(1L -> sa9, 2L -> sb7, 3L -> sc8))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)
    assert(!out.exists(t => t._1 == 1L && t._2 == 2L), s"7/9 kept: $out")
    // b⊂a fully: containment(2→1) = 7/7 = 1.0
    assert(out.contains((2L, 1L, 1.0)), s"2→1 missing: $out")
    // 8/9 rounds (HALF_UP, 4 places) to 0.8889 and passes the 0.8 bar
    assert(out.contains((3L, 1L, 0.8889)), s"3→1 missing: $out")
  }
}
