package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/**
 * [[graft.sources.GraftBinMicroBatchStream]] — the connector's streaming
 * read path. The q119 oracle covers the bounded-replay aggregate; this
 * spec pins the part the oracle can't see: INCREMENTAL file discovery (a
 * file arriving after the stream starts is picked up by the next
 * micro-batch, exactly once) with set-difference offsets.
 */
class GraftBinStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val fmt = graft.sources.GraftBin.format

  test("streaming SINK: epoch-named part files, idempotent restart, readable back") {
    import spark.implicits._
    val src = s"${sys.props("java.io.tmpdir")}/graftbin_sink_src"
    val dst = s"${sys.props("java.io.tmpdir")}/graftbin_sink_dst"
    val ckpt = s"${sys.props("java.io.tmpdir")}/graftbin_sink_ckpt"
    for (d <- Seq(dst, ckpt)) {
      val f = new java.io.File(d)
      if (f.exists()) { def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm); x.delete() }; rm(f) }
    }
    Seq((1L, "en", "a", 1L), (2L, "de", "bb", 2L), (3L, "fr", "ccc", 3L))
      .toDF("doc_id", "lang", "text", "n_chars")
      .write.format(fmt).mode("overwrite").save(src)

    def runOnce(): Unit = {
      val q = spark.readStream.format(fmt).load(src)
        .writeStream.format(fmt)
        .option("path", dst).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    val files1 = new java.io.File(dst).listFiles()
      .filter(_.getName.endsWith(".graftbin")).map(_.getName).sorted.toSeq
    assert(files1.nonEmpty && files1.forall(_.startsWith("part-e")),
      s"epoch naming missing: $files1")
    val back = spark.read.format(fmt).load(dst)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(back == Seq((1L, "en", "a", 1L), (2L, "de", "bb", 2L), (3L, "fr", "ccc", 3L)),
      s"sink round-trip drifted: $back")

    // restart on the same checkpoint with no new source data: the replay
    // protocol must add NO files (no duplicate epochs)
    runOnce()
    val files2 = new java.io.File(dst).listFiles()
      .filter(_.getName.endsWith(".graftbin")).map(_.getName).sorted.toSeq
    assert(files2 == files1, s"restart duplicated epochs: $files1 -> $files2")
  }

  test("late-arriving part files are consumed exactly once by later micro-batches") {
    import spark.implicits._
    val dir = s"${sys.props("java.io.tmpdir")}/graftbin_stream_spec"
    val side = s"${sys.props("java.io.tmpdir")}/graftbin_stream_side"
    Seq((1L, "en", "a b c", 5L), (2L, "de", "d e", 3L))
      .toDF("doc_id", "lang", "text", "n_chars")
      .coalesce(1).write.format(fmt).mode("overwrite").save(dir)

    val table = "graftbin_stream_counts"
    val q = spark.readStream.format(fmt).load(dir)
      .groupBy(lit(1).as("g"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
      .writeStream.outputMode("complete").format("memory").queryName(table)
      .start()
    try {
      q.processAllAvailable()
      val first = spark.table(table).collect().head
      assert(first.getLong(1) == 2L && first.getLong(2) == 3L,
        s"initial batch wrong: $first")

      // stage a NEW part file (distinct name) into the watched directory
      Seq((9L, "fr", "x y z w", 7L)).toDF("doc_id", "lang", "text", "n_chars")
        .coalesce(1).write.format(fmt).mode("overwrite").save(side)
      val src = new java.io.File(side).listFiles()
        .find(_.getName.endsWith(".graftbin")).get
      val dst = new java.io.File(dir, "part-late-arrival.graftbin")
      java.nio.file.Files.copy(src.toPath, dst.toPath)

      q.processAllAvailable()
      val second = spark.table(table).collect().head
      // 2 + 1 rows, ids 1+2+9 — the late file counted once, not replayed
      assert(second.getLong(1) == 3L && second.getLong(2) == 12L,
        s"late file not consumed exactly once: $second")
    } finally {
      q.stop()
      spark.catalog.dropTempView(table)
    }
  }
}
