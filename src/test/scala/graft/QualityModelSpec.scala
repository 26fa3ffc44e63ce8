package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavior gates for the model-based curation operators (q159/q160) —
  * the oracle proves cross-engine value identity; these pin the CLAIMS:
  * the bigram gate actually separates ciphered gibberish from organic
  * text, and the stratified sample actually covers the embedding space. */
class QualityModelSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q159: ciphered docs separate from organic text with margin") {
    val rows = graft.queries.Caches.scoped(
      SparkEntry.queries("q159_bigram_lm_gate")(spark, sf).collect().toSeq)
    assert(rows.nonEmpty)
    val (planted, organic) = rows.partition(_.getInt(3) == 1)
    assert(planted.nonEmpty && organic.nonEmpty)
    // the gate itself: every planted doc flagged, no organic doc flagged
    assert(planted.forall(_.getInt(2) == 1),
      "a ciphered doc passed the bigram gate")
    assert(organic.forall(_.getInt(2) == 0),
      "an organic doc was flagged as gibberish")
    // and not by luck: the score DISTRIBUTIONS are disjoint with margin
    // (measured ~4.6x between planted max and organic min; gate at 2x)
    val pMax = planted.map(_.getLong(1)).max
    val oMin = organic.map(_.getLong(1)).min
    assert(pMax * 2 < oMin,
      s"score margin collapsed: planted max $pMax vs organic min $oMin")
    assert(rows.forall(_.getLong(1) > 0), "a score fell to zero")
  }

  test("q179: the absorbed LM store serves the exact from-scratch gate") {
    // the oracle proves value identity; this pins WHY it holds — the
    // merged 729-cell store model IS the full-corpus model, cell for
    // cell (additive merge over the batch partition), so flags and the
    // planted/organic separation carry over unchanged
    val live = graft.queries.Caches.scoped(
      SparkEntry.queries("q159_bigram_lm_gate")(spark, sf).collect().toSeq)
    val stored = graft.queries.Caches.scoped(
      SparkEntry.queries("q179_lm_store")(spark, sf).collect().toSeq)
    assert(stored.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))) ==
      live.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))),
      "store-served gate diverged from the from-scratch gate")
    val model = graft.queries.QualityModel.storedLmModel(spark, sf)
    assert(model.nonEmpty && model.size <= 729,
      s"model size ${model.size} outside the alphabet bound")
  }

  test("q160: every stratum represented, top-3 per stratum, ranks dense") {
    val rows = graft.queries.Caches.scoped(
      SparkEntry.queries("q160_diversity_sample")(spark, sf).collect().toSeq)
    assert(rows.nonEmpty)
    val byBucket = rows.groupBy(_.getInt(0))
    // diversity: the sample covers every occupied stratum (global top-k
    // would collapse onto the densest corner of the space)
    val occupied = graft.queries.Tables.t(spark, sf, "embeddings")
      .selectExpr((0 to 5).map(i =>
        s"cast(embedding[$i] > 0 AS int) * ${1 << (5 - i)}")
        .mkString(" + ") + " AS bucket")
      .distinct().collect().map(_.getInt(0)).toSet
    assert(byBucket.keySet == occupied,
      s"sample misses strata: ${occupied -- byBucket.keySet}")
    for ((b, rs) <- byBucket) {
      assert(rs.size <= 3, s"stratum $b kept ${rs.size} > 3 rows")
      // ranks dense from 1, ordered by (quality desc, doc_id)
      assert(rs.map(_.getLong(1)).sorted == (1L to rs.size).toSeq,
        s"stratum $b ranks not dense")
      val sorted = rs.sortBy(_.getLong(1))
      val qualities = sorted.map(_.getLong(3))
      assert(qualities == qualities.sortBy(-_),
        s"stratum $b sample not quality-ordered")
    }
  }
}
