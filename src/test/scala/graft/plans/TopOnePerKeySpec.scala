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

  test("RewriteTopOnePerKey does not fire without PARTITION BY (empty input must yield zero rows)") {
    val prior = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prior :+ RewriteTopOnePerKey
      // row_number() OVER (ORDER BY ...) = 1 with no PARTITION BY: a global
      // aggregate rewrite would always emit one row, so a runtime-empty
      // input would fabricate a phantom row of codegen defaults. The rule
      // must leave the window in place. The input goes through parquet so
      // the emptiness is a RUNTIME fact — on a LocalRelation,
      // ConvertToLocalRelation evaluates the filter at plan time and
      // PropagateEmptyRelation collapses the whole query, masking the bug.
      val dir = java.nio.file.Files.createTempDirectory("top1_empty").toString
      sample().write.mode("overwrite").parquet(dir)
      val empty = spark.read.parquet(dir).filter($"v" > 1e9)
      val w = Window.orderBy($"v".desc, $"id".desc)
      val top = empty.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      assert(top.queryExecution.optimizedPlan.toString.contains("Window"),
        "global row_number()=1 must NOT be rewritten to an aggregate")
      assert(top.count() === 0L, "empty input must produce zero rows, not a phantom row")
      // and the non-empty global case still returns the correct single row
      val one = sample().withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(one.toSeq == Seq(("a", 2L, 30.0)))
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
