package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shared parquet table loader for the testdata star schema. */
object Tables {

  /**
   * Spark rejects parquet TIMESTAMP(NANOS) columns outright; sessions set
   * `spark.sql.legacy.parquet.nanosAsLong=true` and this loader converts
   * the nano epoch back to a proper timestamp (integer division — a double
   * round-trip would lose precision at 1e18 nanos). The testdata's nanos
   * are exact multiples of 1000, so micros are lossless.
   */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType)) {
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else df
  }
}
