package graft.iforest

import org.apache.spark.ml.linalg.SQLDataTypes
import org.apache.spark.ml.param._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/**
 * Hyperparameter surface — same names, defaults, and validators as the
 * reference (reference: IForest.scala:671-894, defaults :340-349), built on
 * the public `org.apache.spark.ml.param.Params` API only (the reference
 * lives inside `org.apache.spark.ml` to reach private helpers; we don't).
 */
trait IForestParams extends Params {

  // Spark's shared-param traits (HasSeed etc.) are private[ml]; declare our own.
  final val seed: LongParam = new LongParam(this, "seed", "random seed")
  def getSeed: Long = $(seed)

  final val numTrees: IntParam = new IntParam(
    this, "numTrees", "number of trees in the forest (> 0)", ParamValidators.gt(0))
  def getNumTrees: Int = $(numTrees)

  /** Fraction of rows if <= 1, absolute count if > 1 (reference: IForest.scala:696-703). */
  final val maxSamples: DoubleParam = new DoubleParam(
    this, "maxSamples", "rows sampled per tree: fraction if <= 1, count if > 1 (> 0)",
    ParamValidators.gt(0))
  def getMaxSamples: Double = $(maxSamples)

  /** Fraction of features if <= 1, absolute count if > 1 (reference: IForest.scala:713-720). */
  final val maxFeatures: DoubleParam = new DoubleParam(
    this, "maxFeatures", "features sampled per tree: fraction if <= 1, count if > 1 (> 0)",
    ParamValidators.gt(0))
  def getMaxFeatures: Double = $(maxFeatures)

  final val maxDepth: IntParam = new IntParam(
    this, "maxDepth", "maximum tree depth (> 0)", ParamValidators.gt(0))
  def getMaxDepth: Int = $(maxDepth)

  final val contamination: DoubleParam = new DoubleParam(
    this, "contamination", "expected anomaly fraction, in (0, 1)",
    ParamValidators.inRange(0, 1, lowerInclusive = false, upperInclusive = false))
  def getContamination: Double = $(contamination)

  /** 0 means exact quantile (reference: IForest.scala:755-762). */
  final val approxQuantileRelativeError: DoubleParam = new DoubleParam(
    this, "approxQuantileRelativeError", "relative error for the threshold quantile, in [0, 1)",
    ParamValidators.inRange(0, 1, lowerInclusive = true, upperInclusive = false))
  def getApproxQuantileRelativeError: Double = $(approxQuantileRelativeError)

  final val bootstrap: BooleanParam = new BooleanParam(
    this, "bootstrap", "sample rows with replacement")
  def getBootstrap: Boolean = $(bootstrap)

  final val featuresCol: Param[String] = new Param[String](
    this, "featuresCol", "input feature vector column")
  def getFeaturesCol: String = $(featuresCol)

  final val anomalyScoreCol: Param[String] = new Param[String](
    this, "anomalyScoreCol", "output anomaly score column")
  def getAnomalyScoreCol: String = $(anomalyScoreCol)

  final val predictionCol: Param[String] = new Param[String](
    this, "predictionCol", "output 0/1 prediction column")
  def getPredictionCol: String = $(predictionCol)

  final val labelCol: Param[String] = new Param[String](
    this, "labelCol", "optional ground-truth label column")
  def getLabelCol: String = $(labelCol)

  setDefault(
    seed -> this.getClass.getName.hashCode.toLong,
    numTrees -> 100,
    maxSamples -> 1.0,
    maxFeatures -> 1.0,
    maxDepth -> 10,
    contamination -> 0.1,
    approxQuantileRelativeError -> 0.0,
    bootstrap -> false,
    featuresCol -> "features",
    anomalyScoreCol -> "anomalyScore",
    predictionCol -> "prediction",
    labelCol -> "label")

  /**
   * Features column must be a `ml.linalg` vector; score and prediction
   * columns are appended as doubles (reference: IForest.scala:845-848,
   * via the public `SQLDataTypes.VectorType` alias instead of the
   * private `VectorUDT`).
   */
  protected def validateAndTransformSchema(schema: StructType): StructType = {
    val field = schema($(featuresCol))
    require(field.dataType == SQLDataTypes.VectorType,
      s"features column '${$(featuresCol)}' must be ${SQLDataTypes.VectorType.simpleString}, " +
        s"got ${field.dataType.simpleString}")
    require(!schema.fieldNames.contains($(anomalyScoreCol)),
      s"output column ${$(anomalyScoreCol)} already exists")
    require(!schema.fieldNames.contains($(predictionCol)),
      s"output column ${$(predictionCol)} already exists")
    StructType(schema.fields :+
      StructField($(anomalyScoreCol), DoubleType) :+
      StructField($(predictionCol), DoubleType))
  }
}
