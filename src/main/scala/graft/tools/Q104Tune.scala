package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/**
 * Per-batch profile of the stream-stream OUTER join replay (q104) under a
 * state-partition sweep — guide §1 measurement for the r22 target: the
 * grid entry is ~8 s for a 5-micro-batch replay over kilobyte state, so
 * the question is where each batch's ~1.5 s goes (query planning,
 * state-store open/commit, addBatch execution) and how it moves with
 * `graft.streaming.statePartitions`.
 *
 * Prints one line per micro-batch (durationMs breakdown + state-operator
 * totals) and one SUMMARY line per configuration (three timed laps, the
 * first discarded as JIT warm-up).
 *
 * Usage: java -cp "classes:SPARK_JARS" graft.tools.Q104Tune
 * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, GRAFT_Q104_PARTS (csv, default "8,4,2,1")
 */
object Q104Tune {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("GRAFT_Q104_PARTS", "8,4,2,1")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        val state = Option(p.stateOperators).getOrElse(Array.empty)
        val commit = state.map(so =>
          Option(so.customMetrics).map(_.getOrDefault("rocksdbCommitLatencyMs", 0L)
            .longValue()).getOrElse(0L)).sum
        println(f"BATCH id=${p.batchId}%2d rows=${p.numInputRows}%6d " +
          s"trigger=${dur.getOrDefault("triggerExecution", -1L)} " +
          s"addBatch=${dur.getOrDefault("addBatch", -1L)} " +
          s"getBatch=${dur.getOrDefault("getBatch", -1L)} " +
          s"latestOffset=${dur.getOrDefault("latestOffset", -1L)} " +
          s"queryPlanning=${dur.getOrDefault("queryPlanning", -1L)} " +
          s"walCommit=${dur.getOrDefault("walCommit", -1L)} " +
          s"commitOffsets=${dur.getOrDefault("commitOffsets", -1L)} " +
          s"stateCommitMs=$commit " +
          s"stateRows=${state.map(_.numRowsTotal).sum} " +
          s"stateMemUsed=${state.map(_.memoryUsedBytes).sum}")
      }
    })

    for (p <- parts) {
      spark.conf.set("graft.streaming.statePartitions", p)
      val laps = (1 to 3).map { lap =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries("q104_stream_outer_join")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        graft.queries.Caches.releaseAll()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"LAP parts=$p lap=$lap sec=$sec%.3f")
        sec
      }
      println(f"SUMMARY parts=$p warm_min=${laps.drop(1).min}%.3f " +
        f"warm_med=${laps.drop(1).sorted.apply(laps.size / 2 - 1)}%.3f")
    }
    spark.stop()
  }
}
