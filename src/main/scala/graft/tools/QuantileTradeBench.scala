package graft.tools

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.SparkSession

import graft.iforest.IForest

/**
 * Measures the one fit-path cost that grows with data: the threshold
 * quantile over the training scores. The reference's default is an EXACT
 * quantile (approxQuantileRelativeError=0 — a full GK merge of every
 * score); relaxing to 0.001 bounds the sketch size independently of row
 * count. This tool times the flagship fit (lineitem, numTrees=100,
 * maxSamples=256) at both settings so README's trade note carries
 * measured numbers instead of an assertion — run with
 * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.QuantileTradeBench"`.
 */
object QuantileTradeBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val assembled = new VectorAssembler()
      .setInputCols(Array("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .setOutputCol("features")
      .transform(li)
      .select("l_orderkey", "l_linenumber", "features")

    def fitOnce(relError: Double): (Double, Double) = {
      val t0 = System.nanoTime()
      val model = new IForest()
        .setNumTrees(100).setMaxSamples(256).setMaxDepth(8)
        .setContamination(0.05).setSeed(42L)
        .setApproxQuantileRelativeError(relError)
        .fit(assembled)
      ((System.nanoTime() - t0) / 1e9, model.getThreshold)
    }

    fitOnce(0.0) // warm-up: JVM/codegen/file-listing paid outside the compares
    val repeats = 3
    for (relError <- Seq(0.0, 0.001)) {
      val runs = (1 to repeats).map(_ => fitOnce(relError))
      val secs = runs.map(_._1).sorted
      println(f"relError=$relError fit median=${secs(repeats / 2)}%.3f s " +
        f"min=${secs.head}%.3f s threshold=${runs.head._2}%.6f")
    }
    spark.stop()
  }
}
