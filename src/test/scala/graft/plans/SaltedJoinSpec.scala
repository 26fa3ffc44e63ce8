package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SaltedJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted join equals plain join on a skewed key distribution") {
    // 90% of left rows share one hot key
    val left = (0 until 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 1L, i))
      .toDF("k", "payload")
    val right = (0L until 7L).map(k => (k, s"dim_$k")).toDF("rk", "name")
    val plain = left.join(right, $"k" === $"rk")
      .select("k", "payload", "name").collect().map(_.toString).sorted
    val salted = SaltedJoin.join(left, right, "k", "rk", numSalts = 8)
      .select("k", "payload", "name").collect().map(_.toString).sorted
    assert(salted.length == plain.length)
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join is deterministic across runs (content-derived salt)") {
    val left = (0 until 500).map(i => (i.toLong % 3, i)).toDF("k", "v")
    val right = (0L until 3L).map(k => (k, k * 10)).toDF("rk", "w")
    def run() = SaltedJoin.join(left, right, "k", "rk").collect().map(_.toString).sorted.toSeq
    assert(run() == run())
  }

  test("approximate distinct sketch lands within 5% of exact") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val row = li.selectExpr(
      "count(distinct l_partkey) AS exact",
      "approx_count_distinct(l_partkey) AS approx").first()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx $approx vs exact $exact")
  }
}
