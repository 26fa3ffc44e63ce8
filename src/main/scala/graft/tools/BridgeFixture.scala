package graft.tools

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.SparkSession

import graft.iforest.IForest

/**
 * Dumps the Python-bridge golden fixture WITHOUT a ScalaTest harness:
 * the same 300-row deterministic frame and the same Scala-API fit that
 * `graft.iforest.PythonBridgeSpec` performs in-process, written to
 * `<outDir>/fixture` and `<outDir>/expected`. This is what lets
 * `pytest python/tests` run standalone — its fixture (conftest.py)
 * shells out to this main over the compiled classes + Spark jars, then
 * `test_iforest_bridge.py` fits the SAME fixture from Python and
 * asserts score-for-score equality against the dump. Params here and in
 * the Python script must stay mirrored (numTrees=50, maxSamples=64,
 * maxDepth=8, contamination=0.1, exact threshold, seed=42).
 */
object BridgeFixture {

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: BridgeFixture <outDir>")
    val out = args(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bridge-fixture")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 300 deterministic rows: 4-dim inliers plus 6 far outliers — the
    // PythonBridgeSpec fixture, byte-identically (same seed, same RNG
    // call order).
    val rng = new scala.util.Random(11)
    val rows = (0 until 294).map { i =>
      (i.toLong, Vectors.dense(Array.fill(4)(rng.nextDouble() * 2 - 1)))
    } ++ (294 until 300).map { i =>
      (i.toLong, Vectors.dense(Array.fill(4)(25.0 + i)))
    }
    rows.toDF("id", "features").coalesce(1)
      .write.mode("overwrite").parquet(s"$out/fixture")

    val df = spark.read.parquet(s"$out/fixture")
    val model = new IForest()
      .setNumTrees(50).setMaxSamples(64.0).setMaxDepth(8)
      .setContamination(0.1).setBootstrap(false)
      .setApproxQuantileRelativeError(0.0).setSeed(42L)
      .fit(df)
    model.transform(df).select("id", "anomalyScore", "prediction")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/expected")
    println(s"BRIDGE_FIXTURE ok out=$out")
    spark.stop()
  }
}
