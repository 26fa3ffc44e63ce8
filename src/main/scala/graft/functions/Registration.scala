package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Idempotent session-registry helper for graft's native functions.
 *
 * Each query builder calls `X.register(spark)` defensively, so a suite or
 * bench run registers the same function dozens of times;
 * `createOrReplaceTempFunction` logs a "replaced a previously registered
 * function" WARN for every call after the first. Registering is skipped
 * when the name is already bound — the builders are stable singletons, so
 * replacement is never needed.
 */
private[graft] object Registration {
  def ensure(spark: SparkSession, name: String)(builder: Seq[Expression] => Expression): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier(name))) {
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  /** Register EVERY stateless native function (GraftExtensions' list).
    *
    * The pre-stream guard for foreachBatch queries: each micro-batch
    * runs on a CLONED session whose function registry is copied at
    * stream START, so the batch closure's own defensive `X.register(s)`
    * call lands on the OUTER session and cannot help a clone whose copy
    * predates it. A run whose stores were already current (no build, so
    * no incidental registration before the stream) would otherwise hit
    * UNRESOLVED_ROUTINE on the first tick — latent in any fresh session
    * that runs a streaming query first. Call this before `.start()`. */
  def ensureAllNative(spark: SparkSession): Unit =
    graft.plans.GraftExtensions.functions.foreach { case (n, b) =>
      ensure(spark, n)(b)
    }
}
