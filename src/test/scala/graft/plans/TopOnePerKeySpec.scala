package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TopOnePerKeySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sample() = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0),
    ("b", 4L, 5.0), ("b", 5L, 5.0), // tie on v, id breaks it
    ("c", 6L, 1.0),
  ).toDF("k", "id", "v")

  test("TopOnePerKey.latest equals row_number window top-1") {
    val df = sample()
    val viaAgg = TopOnePerKey.latest(df, Seq("k"), Seq(col("v"), col("id")))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"id".desc)
    val viaWindow = df.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .drop("rn").orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(viaAgg.toSeq == viaWindow.toSeq)
    assert(viaAgg.toSeq == Seq(("a", 2L, 30.0), ("b", 5L, 5.0), ("c", 6L, 1.0)))
  }

  test("RewriteTopOnePerKey: window top-1 plan becomes an aggregate, results unchanged") {
    val prior = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prior :+ RewriteTopOnePerKey
      val df = sample()
      val w = Window.partitionBy($"k").orderBy($"v".desc, $"id".desc)
      val top = df.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      val optimized = top.queryExecution.optimizedPlan
      assert(!optimized.toString.contains("Window"),
        s"window survived the rewrite:\n$optimized")
      assert(optimized.toString.toLowerCase.contains("max_by"),
        s"expected max_by aggregate:\n$optimized")
      val rows = top.orderBy("k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      assert(rows.toSeq == Seq(("a", 2L, 30.0, 1), ("b", 5L, 5.0, 1), ("c", 6L, 1.0, 1)))
    } finally {
      spark.experimental.extraOptimizations = prior
    }
  }

  test("RewriteTopOnePerKey does not fire on ascending+descending mixed ordering") {
    val prior = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prior :+ RewriteTopOnePerKey
      val df = sample()
      val w = Window.partitionBy($"k").orderBy($"v".desc, $"id".asc)
      val top = df.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      assert(top.queryExecution.optimizedPlan.toString.contains("Window"))
      // and still correct
      val rows = top.orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
      assert(rows.toSeq == Seq(("a", 2L), ("b", 4L), ("c", 6L)))
    } finally {
      spark.experimental.extraOptimizations = prior
    }
  }
}
