package graft.iforest

import java.nio.file.Files

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/**
 * End-to-end reproduction of the reference's example flow (SURVEY §2 rows
 * 1, 4, 34, 35): CSV scan with schema inference and '?' missing markers ->
 * StringIndexer label encode -> VectorAssembler -> IForest -> AUC
 * evaluation. Synthetic stand-in for the breastw.csv shape: 9 integer
 * features, class label 2 (inlier) / 4 (outlier).
 */
class CsvPipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def writeCsv(): String = {
    val rng = new scala.util.Random(31)
    val rows = Seq.newBuilder[String]
    for (i <- 0 until 108) { // inliers: features in 1..5
      val f = Array.fill(9)(1 + rng.nextInt(5))
      val f6 = if (i % 20 == 0) "?" else f(5).toString // sprinkle missing
      rows += s"$i,${f(0)},${f(1)},${f(2)},${f(3)},${f(4)},$f6,${f(6)},${f(7)},${f(8)},2"
    }
    for (i <- 108 until 120) { // outliers: features in 40..50
      val f = Array.fill(9)(40 + rng.nextInt(11))
      rows += s"$i,${f(0)},${f(1)},${f(2)},${f(3)},${f(4)},${f(5)},${f(6)},${f(7)},${f(8)},4"
    }
    val dir = Files.createTempDirectory("iforest-csv")
    val file = dir.resolve("data.csv")
    Files.writeString(file, rows.result().mkString("\n"))
    file.toString
  }

  test("CSV + StringIndexer + VectorAssembler + IForest pipeline reaches AUC > 0.9") {
    val raw = spark.read
      .option("inferSchema", "true")
      .option("nullValue", "?")
      .csv(writeCsv())
    assert(raw.schema("_c6").dataType.typeName == "integer") // '?' -> null, not string
    val filled = raw.na.fill(3, Seq("_c6"))
    val indexer = new StringIndexer().setInputCol("_c10").setOutputCol("label")
    val assembler = new VectorAssembler()
      .setInputCols((1 to 9).map(i => s"_c$i").toArray)
      .setOutputCol("features")
    val iforest = new IForest()
      .setNumTrees(30).setMaxSamples(64).setMaxDepth(8)
      .setContamination(0.1).setSeed(77L)
    val model = new Pipeline().setStages(Array(indexer, assembler, iforest)).fit(filled)
    val scored = model.transform(filled)
    val auc = new BinaryClassificationEvaluator()
      .setRawPredictionCol("anomalyScore")
      .setLabelCol("label")
      .setMetricName("areaUnderROC")
      .evaluate(scored)
    assert(auc > 0.9, s"AUC $auc")
    // label 4 is the minority class -> indexed 1.0; anomalies score highest
    val topScores = scored.orderBy(org.apache.spark.sql.functions.col("anomalyScore").desc)
      .select("label").limit(12).collect().map(_.getDouble(0))
    assert(topScores.count(_ == 1.0) >= 10)
  }

  // BASELINE.md headline accuracy: the reference reports AUC 0.96 on
  // breastw (683 rows, 9 int features, labels 2/4) at numTrees=100,
  // maxSamples=256. Our RNG chain differs, so assert >= 0.93 — the
  // algorithmic ballpark, not RNG equality.
  test("real breastw.csv reaches the reference's published AUC ballpark") {
    val path = "/root/reference/data/anomaly-detection/breastw.csv"
    assume(new java.io.File(path).exists())
    val raw = spark.read
      .option("inferSchema", "true")
      .option("nullValue", "?")
      .csv(path)
      .na.fill(1, Seq("_c6")) // breastw's missing-marker column
    val indexer = new StringIndexer().setInputCol("_c10").setOutputCol("label")
    val assembler = new VectorAssembler()
      .setInputCols((1 to 9).map(i => s"_c$i").toArray)
      .setOutputCol("features")
    val iforest = new IForest()
      .setNumTrees(100).setMaxSamples(256).setMaxDepth(10)
      .setContamination(0.35).setSeed(42L)
    val model = new Pipeline().setStages(Array(indexer, assembler, iforest))
      .fit(raw)
    val auc = new BinaryClassificationEvaluator()
      .setRawPredictionCol("anomalyScore")
      .setLabelCol("label")
      .setMetricName("areaUnderROC")
      .evaluate(model.transform(raw))
    assert(auc >= 0.93, s"breastw AUC $auc vs published 0.96")
  }
}
