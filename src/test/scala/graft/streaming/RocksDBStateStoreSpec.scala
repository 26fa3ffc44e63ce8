package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/**
 * Streaming state on the RocksDB provider — the backend that keeps huge
 * keyspaces (100 TB-posture session/join state) off the executor heap.
 * Same windowed aggregation as the HDFS-backed default, same results;
 * the provider is a per-session runtime conf.
 */
class RocksDBStateStoreSpec extends AnyFunSuite {

  test("windowed aggregation state lives in RocksDB and results match") {
    val spark = SparkTestSession.spark.newSession()
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val agg = input.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
    val q = agg.writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName("rocksdb_windows")
      .start()
    try {
      def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      input.addData((1L, ts(10, 0), 1.5), (1L, ts(10, 30), 2.5), (2L, ts(11, 15), 4.0))
      q.processAllAvailable()
      input.addData((1L, ts(11, 5), 8.0)) // second batch reads back batch-1 state
      q.processAllAvailable()
      val rows = spark.table("rocksdb_windows")
        .select(col("window.start"), col("user_id"), col("n"), col("v"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows === Set(
        (ts(10, 0), 1L, 2L, 4.0),
        (ts(11, 0), 1L, 1L, 8.0),
        (ts(11, 0), 2L, 1L, 4.0)))
      // the state operator really ran on RocksDB
      val metrics = q.lastProgress.stateOperators.head.customMetrics.keySet()
      assert(metrics.toString.contains("rocksdb"), s"metrics: $metrics")
    } finally q.stop()
  }
}
