package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/**
 * Watermark semantics under append output: windows emit exactly once when
 * the watermark passes their end, and records arriving behind the
 * watermark are dropped — the state-eviction contract that bounds memory
 * on an unbounded stream.
 */
class WatermarkLateDataSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("append mode emits finalized windows once and drops late data") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val agg = input.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("n"))
    val q = agg.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName("wm_windows")
      .start()
    try {
      def ts(h: Int, min: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$min%02d:00")
      // batch 1: one event in [10:00, 10:10)
      input.addData((1L, ts(10, 0)))
      q.processAllAvailable()
      assert(spark.table("wm_windows").count() == 0) // window still open
      // batch 2: 10:30 advances the watermark to 10:20 -> first window emits
      input.addData((1L, ts(10, 30)))
      q.processAllAvailable()
      // emission happens on the batch AFTER the watermark update for
      // memory-sink append; push one more event to flush deterministically
      input.addData((1L, ts(10, 31)))
      q.processAllAvailable()
      val emitted = spark.table("wm_windows").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      assert(emitted.get(ts(10, 0)).contains(1L), s"got $emitted")
      // batch 3: a late record inside the already-finalized window -> dropped
      input.addData((1L, ts(10, 5)))
      q.processAllAvailable()
      // batch 4: advance far enough to finalize [10:30, 10:40)
      input.addData((1L, ts(11, 0)))
      q.processAllAvailable()
      input.addData((1L, ts(11, 1)))
      q.processAllAvailable()
      val finalRows = spark.table("wm_windows").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      // the late 10:05 record neither re-emitted nor changed [10:00, 10:10)
      assert(finalRows.get(ts(10, 0)).contains(1L), s"late data leaked: $finalRows")
      // [10:30, 10:40) holds the 10:30 and 10:31 events only
      assert(finalRows.get(ts(10, 30)).contains(2L), s"got $finalRows")
    } finally q.stop()
  }
}
