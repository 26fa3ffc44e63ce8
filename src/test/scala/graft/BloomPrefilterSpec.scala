package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomMightContainLong
import graft.queries.Tables

/**
 * Semantics and pruning of the Bloom-prefiltered join (q92): the sketch
 * probe may only PRUNE — never change — the exact join's result, it must
 * admit every true match (no false negatives, the Bloom contract), and it
 * must actually cut the fact rows entering the exchange (otherwise the
 * "reduction" is plan theater).
 */
class BloomPrefilterSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("probe admits every inserted key, interpreted and codegen'd alike") {
    val keys = spark.range(0, 1000, 7).toDF("k") // 143 keys
    val bloom = BloomMightContainLong.build(keys, "k", expectedItems = 1000, fpp = 0.01)
    // no false negatives — all inserted keys pass (codegen'd filter path)
    assert(keys.where(BloomMightContainLong.probe(bloom, col("k"))).count() === 143)
    // interpreted eval agrees with codegen on a mixed in/out range
    val probeCol = BloomMightContainLong.probe(bloom, col("k"))
    val wide = spark.range(0, 1000).toDF("k")
    val viaFilter = wide.where(probeCol).collect().map(_.getLong(0)).toSet
    val viaProject = wide.select(col("k"), probeCol.as("hit"))
      .collect().filter(_.getBoolean(1)).map(_.getLong(0)).toSet
    assert(viaFilter === viaProject)
    assert((0L until 1000L by 7).forall(viaFilter.contains), "false negative")
  }

  test("null keys do not pass the probe filter") {
    val bloom = BloomMightContainLong.build(
      spark.range(5).toDF("k"), "k", expectedItems = 100, fpp = 0.01)
    val withNull = spark.sql("SELECT cast(NULL AS bigint) AS k UNION ALL SELECT 3L")
    val kept = withNull.where(BloomMightContainLong.probe(bloom, col("k"))).collect()
    assert(kept.map(_.getLong(0)).toSeq === Seq(3L))
  }

  test("q92 equals the plain (bloom-free) join on sf0.001") {
    val expected = Tables.t(spark, sf, "orders")
      .join(Tables.t(spark, sf, "customer").where(col("c_acctbal") > 9000),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("c_mktsegment"))
      .collect()
    val got = SparkEntry.queries("q92_bloom_prefilter")(spark, sf).collect()
    assert(got.toSeq === expected.toSeq)
  }

  test("the probe prunes the fact side: kept rows land between true matches and total") {
    val dim = Tables.t(spark, sf, "customer").where(col("c_acctbal") > 9000)
      .select(col("c_custkey"))
    val bloom = BloomMightContainLong.build(dim, "c_custkey",
      expectedItems = 1 << 18, fpp = 0.01)
    val orders = Tables.t(spark, sf, "orders")
    val total = orders.count()
    val trueMatches = orders.join(dim, col("o_custkey") === col("c_custkey"),
      "left_semi").count()
    val kept = orders.where(BloomMightContainLong.probe(bloom, col("o_custkey"))).count()
    assert(kept >= trueMatches, "bloom dropped a true match")
    // fpp 1% on a selective dim: the pass-through rate over non-matching
    // rows must stay a small fraction, not approach "keeps everything"
    assert(kept - trueMatches <= math.max(50L, (total - trueMatches) / 10),
      s"bloom barely prunes: kept=$kept true=$trueMatches total=$total")
    assert(kept < total, "bloom filtered nothing")
  }
}
