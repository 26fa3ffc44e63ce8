package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.queries.{Streaming, Tables}

/**
 * q131's foreachBatch merge, pinned on the two claims its scaladoc makes:
 * the final state is independent of ARRIVAL ORDER (the merge is an
 * associative+commutative arg-max), and a checkpointed re-run consumes
 * ONLY new feed files (exactly-once incremental growth — the property
 * that makes the pattern deployable against a live directory).
 */
class UpsertSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val tmp = sys.props("java.io.tmpdir")

  private def rm(path: String): Unit = {
    def go(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(go)
      x.delete()
    }
    go(new java.io.File(path))
  }

  /** Stage sf0.001 events as 4 time-ranged files with mtimes in the given
    * order, so maxFilesPerTrigger=1 replays 4 micro-batches that order. */
  private def stage(out: String, reverse: Boolean): Unit = {
    rm(out)
    Tables.t(spark, sf, "events")
      .repartitionByRange(4, col("ts")).write.mode("overwrite").parquet(out)
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val ordered = if (reverse) parts.reverse else parts
    val base = System.currentTimeMillis() - 3600000L
    ordered.zipWithIndex.foreach { case (f, i) => f.setLastModified(base + i * 1000L) }
  }

  private def run(feed: String, stateRoot: String, ckpt: String): Seq[String] = {
    val schema = spark.read.parquet(feed).schema
    val stream = Tables.streamTsFixup(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(feed))
    Streaming.upsertRun(spark, stream, stateRoot, ckpt)
      .collect().map(_.toString).toSeq
  }

  test("final state is identical under forward and reversed arrival order") {
    val results = Seq(false, true).map { reverse =>
      val tag = if (reverse) "rev" else "fwd"
      val feed = s"$tmp/graft_upsert_spec_feed_$tag"
      val stateRoot = s"$tmp/graft_upsert_spec_state_$tag"
      val ckpt = s"$tmp/graft_upsert_spec_ckpt_$tag"
      Seq(stateRoot, ckpt).foreach(rm)
      stage(feed, reverse)
      run(feed, stateRoot, ckpt)
    }
    assert(results(0).nonEmpty, "upsert produced no state")
    assert(results(0) == results(1),
      s"arrival order leaked into the merged state:\n" +
        s"fwd=${results(0).take(3)}\nrev=${results(1).take(3)}")
  }

  test("checkpointed re-run consumes only the new file, exactly once") {
    val feed = s"$tmp/graft_upsert_spec_feed_inc"
    val stateRoot = s"$tmp/graft_upsert_spec_state_inc"
    val ckpt = s"$tmp/graft_upsert_spec_ckpt_inc"
    Seq(stateRoot, ckpt).foreach(rm)
    stage(feed, reverse = false)
    val first = run(feed, stateRoot, ckpt)
    val v1 = Streaming.stateVersion(spark, stateRoot)
    assert(v1 == 3, s"4 feed files must yield versions v0..v3, got v$v1")

    // one NEW far-future event for user 0 arrives; everything else is old
    Tables.t(spark, sf, "events").agg(max(col("ts")).as("mts"))
      .selectExpr("cast(900001 AS bigint) AS event_id",
        "mts + INTERVAL 1 HOUR AS ts", "cast(0 AS bigint) AS user_id",
        "'purchase' AS event_type", "cast(9.99 AS double) AS value",
        "cast(null AS string) AS props")
      .coalesce(1).write.mode("append").parquet(feed)
    new java.io.File(feed).listFiles().filter(_.getName.startsWith("part-"))
      .sortBy(_.lastModified).lastOption
      .foreach(_.setLastModified(System.currentTimeMillis()))

    val second = run(feed, stateRoot, ckpt)
    // exactly ONE new version: the checkpoint replays nothing already seen
    assert(Streaming.stateVersion(spark, stateRoot) == v1 + 1,
      "re-run reprocessed already-consumed feed files")
    val changedUsers = first.zip(second).count { case (a, b) => a != b }
    assert(second.length == first.length, "user set changed without new users")
    assert(changedUsers == 1, s"$changedUsers state rows changed; only user 0's may")
    assert(second.head.contains("900001"),
      s"user 0's state must now be the new event: ${second.head}")
  }

  test("a torn version dir (no _SUCCESS) is invisible to stateVersion") {
    val root = s"$tmp/graft_upsert_spec_torn"
    rm(root)
    // v0 complete, v1 torn: a driver killed mid-write of v1 leaves part
    // files but no _SUCCESS marker — the replay must merge against v0,
    // never the partial v1 (the corruption the versioned scheme exists
    // to prevent).
    Tables.t(spark, sf, "events").limit(1).write.parquet(s"$root/v0")
    new java.io.File(s"$root/v1").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/v1/part-00000.parquet"),
      Array[Byte](1, 2, 3))
    assert(Streaming.stateVersion(spark, root) == 0,
      "torn v1 (no _SUCCESS) must not be the current state version")
  }

  test("state root works through an explicit file:-scheme Hadoop path") {
    // the versioned-state listing goes through the Hadoop FileSystem, so
    // a URI-schemed root (the HDFS/S3A deployment shape) must behave
    // exactly like a bare local path
    val feed = s"$tmp/graft_upsert_spec_feed_uri"
    val stateRoot = s"file:$tmp/graft_upsert_spec_state_uri"
    val ckpt = s"$tmp/graft_upsert_spec_ckpt_uri"
    rm(s"$tmp/graft_upsert_spec_state_uri"); rm(ckpt)
    stage(feed, reverse = false)
    val rows = run(feed, stateRoot, ckpt)
    assert(rows.nonEmpty, "no state produced through the file: root")
    assert(Streaming.stateVersion(spark, stateRoot) == 3,
      "4 micro-batches must commit v0..v3 under the file: root")
  }
}
