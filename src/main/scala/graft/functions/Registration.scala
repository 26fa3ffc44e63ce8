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
}
