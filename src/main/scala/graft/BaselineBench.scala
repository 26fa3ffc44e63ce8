package graft

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Like-for-like rerun of the reference's published benchmark
 * (BASELINE.md / reference README.md:230-251): train and predict timed
 * SEPARATELY, numTrees=100, maxSamples=256, local[4], on an http-shaped
 * dataset — 567,498 rows x 3 continuous features with a 0.4% anomaly tail
 * (the KDD99 `http` shape; the dataset itself isn't redistributable, so
 * the shape is synthesized deterministically: a seeded gaussian bulk plus
 * a far-out 0.4% tail).
 *
 * The input is materialized (cached + counted) before either phase so
 * synthesis cost lands in neither number, mirroring the reference timing
 * a pre-loaded DataFrame. "train" = fit INCLUDING the summary/threshold
 * pass (the reference's fit also transforms for its summary); "predict" =
 * model.transform + noop write of all scored rows, threshold reused.
 *
 * Prints one JSON line next to the reference's 34 s / 86 s so the
 * comparison is two numbers against two numbers — no core-count
 * normalization argument needed.
 */
object BaselineBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warm-up outside both timed phases
    spark.range(1000000).selectExpr("sum(id)").collect()

    val rows = 567498L
    val base = spark.range(0, rows, 1, 4)
      .withColumn("u", rand(11L))
      .withColumn("is_anomaly", (col("u") < 0.004).cast("int"))
      // bulk: tight correlated gaussians; tail: shifted + widened, so the
      // anomalies are isolable the way http's 0.4% attack traffic is
      .withColumn("f0", randn(12L) + col("is_anomaly") * lit(6.0))
      .withColumn("f1", randn(13L) * (lit(1.0) + col("is_anomaly") * lit(3.0)))
      .withColumn("f2", randn(14L) - col("is_anomaly") * lit(5.0))
    val assembled = new VectorAssembler()
      .setInputCols(Array("f0", "f1", "f2")).setOutputCol("features")
      .transform(base)
      .select("id", "features")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assembled.count()

    def secs[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (model, trainSec) = secs {
      new graft.iforest.IForest()
        .setNumTrees(100).setMaxSamples(256).setMaxDepth(10)
        .setContamination(0.004).setSeed(42L)
        .fit(assembled)
    }
    val (_, predictSec) = secs {
      model.transform(assembled)
        .select("id", "anomalyScore", "prediction")
        .write.format("noop").mode("overwrite").save()
    }
    println(f"""{"metric":"baseline_like_for_like","rows":$rows,"features":3,""" +
      f""""cores":4,"numTrees":100,"maxSamples":256,""" +
      f""""train_sec":$trainSec%.2f,"predict_sec":$predictSec%.2f,""" +
      """"reference_train_sec":34,"reference_predict_sec":86}""")
    spark.stop()
  }
}
