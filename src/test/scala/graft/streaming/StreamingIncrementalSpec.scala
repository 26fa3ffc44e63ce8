package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Real incremental streaming (multiple micro-batches via MemoryStream):
  * session_window state merges events arriving across batches. */
class StreamingIncrementalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("session_window merges sessions across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val agg = input.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val q = agg.writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName("inc_sessions")
      .start()
    try {
      def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      // batch 1: one session for user 1 (10:00, 10:10)
      input.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0))
      q.processAllAvailable()
      val afterB1 = spark.table("inc_sessions").collect()
      assert(afterB1.length == 1)
      // batch 2: 10:25 extends the open session (gap 15 min); 11:30 starts
      // a new one for user 2
      input.addData((1L, ts(25), 4.0),
        (2L, Timestamp.valueOf("2024-01-01 11:30:00"), 8.0))
      q.processAllAvailable()
      val rows = spark.table("inc_sessions")
        .select("user_id", "n", "v").orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq == Seq((1L, 3L, 7.0), (2L, 1L, 8.0)),
        s"got ${rows.mkString(", ")}")
    } finally q.stop()
  }
}
