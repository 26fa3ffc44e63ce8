package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TopKPerKeySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("aggregation equals the rank-window form on random scored pairs") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    // deliberate duplicate scores so the id tie-break is exercised
    val rows = (0 until 2000).map { i =>
      (i % 7, math.floor(rng.nextDouble() * 50) / 50.0, i.toLong)
    }
    val df = rows.toDF("q_id", "cos", "neighbor_id").repartition(8)

    val viaAgg = TopKPerKey.topK(df, "q_id", "cos", "neighbor_id", 10, "cosine")
      .orderBy(col("q_id"), col("rn")).collect()
    val viaWindow = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rn") <= 10)
      .select(col("q_id"), col("neighbor_id"), round(col("cos"), 4).as("cosine"),
        col("rn"))
      .orderBy(col("q_id"), col("rn")).collect()

    assert(viaAgg.length == viaWindow.length)
    viaAgg.zip(viaWindow).foreach { case (a, w) => assert(a == w, s"$a != $w") }
  }

  test("k larger than the group emits the whole group, ranked") {
    import spark.implicits._
    val df = Seq((1, 0.9, 10L), (1, 0.5, 11L), (2, 0.7, 12L))
      .toDF("q_id", "cos", "neighbor_id")
    val out = TopKPerKey.topK(df, "q_id", "cos", "neighbor_id", 5, "cosine")
      .orderBy("q_id", "rn").collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1), r.getInt(3))).toSeq ==
      Seq((1, 10L, 1), (1, 11L, 2), (2, 12L, 1)))
  }

  test("aggregator merge is order-independent and k-bounded") {
    val agg = new TopKAggregator(3)
    val xs = Seq(ScoredId(0.5, 1), ScoredId(0.9, 2), ScoredId(0.5, 0),
      ScoredId(0.1, 3), ScoredId(0.7, 4), ScoredId(0.9, 5))
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = xs.splitAt(3)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    val expected = List(ScoredId(0.9, 2), ScoredId(0.9, 5), ScoredId(0.7, 4))
    assert(whole == expected)
    assert(merged == expected)
    assert(agg.merge(merged, whole).length == 3)
  }
}
