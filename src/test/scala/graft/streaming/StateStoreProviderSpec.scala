package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.queries.Streaming

/**
 * The streaming pack defaults to the RocksDB state-store provider (the
 * 100 TB posture: join/dedup state off-heap on local disk instead of the
 * HDFS-backed provider's on-heap maps). Results must be provider-invariant
 * — state backends change WHERE state lives, never WHAT is computed — and
 * the `graft.streaming.stateStoreProvider` toggle must actually reach the
 * query (pinned by the bogus-class test, which would pass vacuously if
 * runToCompletion stopped applying the conf).
 */
class StateStoreProviderSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("provider routing: rocksdb default, hdfs toggle, FQCN passthrough") {
    val s = SparkTestSession.spark.newSession()
    assert(Streaming.providerClass(s) ===
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("graft.streaming.stateStoreProvider", "hdfs")
    assert(Streaming.providerClass(s) ===
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    s.conf.set("graft.streaming.stateStoreProvider", "com.example.MyProvider")
    assert(Streaming.providerClass(s) === "com.example.MyProvider")
  }

  test("toggle reaches the query: a bogus provider class fails the stream") {
    val s = SparkTestSession.spark.newSession()
    s.conf.set("graft.streaming.stateStoreProvider", "com.example.NoSuchProvider")
    val thrown = intercept[Throwable] {
      Streaming.queries("q55_stream_dedup")(s, sf).collect()
    }
    // root cause chain ends in the class-load failure
    val msgs = Iterator.iterate(thrown)(_.getCause).takeWhile(_ != null)
      .map(_.toString).mkString("\n")
    assert(msgs.contains("NoSuchProvider"), msgs)
  }

  test("q52/q55 results are provider-invariant (rocksdb vs hdfs)") {
    for (q <- Seq("q52_stream_stream_join", "q55_stream_dedup")) {
      val rocks = SparkTestSession.spark.newSession() // default = rocksdb
      val viaRocks = Streaming.queries(q)(rocks, sf).collect().toSeq
      val hdfs = SparkTestSession.spark.newSession()
      hdfs.conf.set("graft.streaming.stateStoreProvider", "hdfs")
      val viaHdfs = Streaming.queries(q)(hdfs, sf).collect().toSeq
      assert(viaRocks.nonEmpty, s"$q returned no rows")
      assert(viaRocks === viaHdfs, s"$q differs across state-store providers")
    }
  }
}
