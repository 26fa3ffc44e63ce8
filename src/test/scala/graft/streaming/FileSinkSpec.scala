package graft.streaming

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The q74 mix gate in its DEPLOYMENT shape: an append-mode parquet FILE
  * sink with a checkpoint, instead of the memory sink the oracled entry
  * drains. Pins the two properties the production comment promises:
  * exactly-once across restarts (a re-run over the same checkpoint emits
  * nothing new), and incremental pickup (new source files gate in a later
  * run without reprocessing — or duplicating — the old ones). */
class FileSinkSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("q74 gate to a parquet sink is exactly-once across restarts and growth") {
    import org.apache.spark.sql.functions.col
    val work = java.nio.file.Files.createTempDirectory("graft-filesink").toString
    val sink = s"$work/gated"
    val ckpt = s"$work/ckpt"
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    // source dir in the library's table convention, first half only
    all.where("doc_id % 2 = 0").write.parquet(s"$work/documents.parquet")

    def drainOnce(): Unit = {
      val q = graft.queries.Streaming.mixGateStream(spark, work)
        .writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def sinkRows(): Seq[(Long, String, String, Long)] =
      spark.read.parquet(sink).collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

    drainOnce()
    val firstRun = sinkRows()
    // the file sink holds exactly the memory-sink (oracled) result for
    // the same source dir
    val expectHalf = graft.queries.Caches.scoped {
      graft.SparkEntry.queries("q74_stream_mix_gate")(spark, work).collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    }
    assert(firstRun.nonEmpty && firstRun.sorted == expectHalf.sorted,
      s"file sink rows ${firstRun.size} != memory sink ${expectHalf.size}")

    // restart over the SAME checkpoint with no new data: nothing re-emits
    drainOnce()
    assert(sinkRows().sorted == firstRun.sorted,
      "an idle restart re-emitted rows — not exactly-once")

    // the source grows by new part files only; the next run gates ONLY
    // the new docs into the sink — old rows neither re-emitted nor lost
    all.where("doc_id % 2 = 1").write.mode("append")
      .parquet(s"$work/documents.parquet")
    drainOnce()
    val grown = sinkRows()
    val expectFull = graft.queries.Caches.scoped {
      graft.SparkEntry.queries("q74_stream_mix_gate")(spark, work).collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    }
    assert(grown.sorted == expectFull.sorted,
      s"grown sink ${grown.size} rows != full gate ${expectFull.size}")
    assert(grown.map(_._1).distinct.size == grown.size,
      "a doc_id appears twice in the sink")
    assert(grown.size > firstRun.size, "growth added no gated docs")
  }
}
