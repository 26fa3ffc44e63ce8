package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/**
 * Per-stage profile of the flagship `iforest_score` lap — the r19
 * verdict's task 3: the grid entry has been bimodal (~2.7 s vs ~5.4 s)
 * since r7/r8 with a zero-line diff, adjudicated as "host window" by
 * worktree A/Bs but never MECHANISTICALLY pinned. This runs N laps in
 * one JVM (grid conditions: same session, same cache protocol) and
 * prints, per lap: wall time, the driver-side gap (wall − sum of stage
 * times — scheduler + driver work like the forest build and threshold
 * collect), and every stage's (name, wall, task-time, GC, input/shuffle
 * bytes), so a slow lap names its slow stage instead of a vibe.
 *
 * Usage: java -cp "target/scala-2.13/classes:SPARK_JARS" graft.tools.IForestDiag
 * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
 *      GRAFT_DIAG_LAPS (default 12), GRAFT_DIAG_QUERY (default iforest_score)
 */
object IForestDiag {

  private case class StageRec(name: String, wallMs: Long, runMs: Long,
      gcMs: Long, inMb: Double, shReadMb: Double, shWriteMb: Double,
      tasks: Int)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val laps = sys.env.getOrElse("GRAFT_DIAG_LAPS", "12").toInt
    val qname = sys.env.getOrElse("GRAFT_DIAG_QUERY", "iforest_score")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for (c <- si.completionTime; s <- si.submissionTime)
          yield c - s).getOrElse(-1L)
        val tm = si.taskMetrics
        stages.add(StageRec(si.name.linesIterator.next().take(70), wall,
          tm.executorRunTime, tm.jvmGCTime,
          tm.inputMetrics.bytesRead / 1e6,
          tm.shuffleReadMetrics.totalBytesRead / 1e6,
          tm.shuffleWriteMetrics.bytesWritten / 1e6,
          si.numTasks))
      }
    })

    def gc(): (Long, Long) = {
      import scala.jdk.CollectionConverters._
      val bs = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala
      (bs.map(_.getCollectionCount).sum, bs.map(_.getCollectionTime).sum)
    }

    // the grid's warm-up, verbatim
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.SparkEntry.entry(spark).count()
    val fn = graft.SparkEntry.queries(qname)

    for (lap <- 1 to laps) {
      stages.clear()
      val (gcc0, gct0) = gc()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wallSec = (System.nanoTime() - t0) / 1e9
      graft.queries.Caches.releaseAll()
      val (gcc1, gct1) = gc()
      // the listener bus is ASYNC: drain before reading, or a lap's last
      // stage events land in the next lap's buffer (quiesce = the count
      // is stable across two 150 ms polls; the public API has no
      // waitUntilEmpty)
      var last = -1
      while (stages.size != last) { last = stages.size; Thread.sleep(150) }
      import scala.jdk.CollectionConverters._
      val recs = stages.asScala.toSeq
      val stageSumSec = recs.map(_.wallMs).sum / 1e3
      println(f"LAP $lap%2d wall=$wallSec%6.2fs stageSum=$stageSumSec%6.2fs " +
        f"driverGap=${wallSec - stageSumSec}%6.2fs " +
        s"gcCount=${gcc1 - gcc0} gcMs=${gct1 - gct0} stages=${recs.size}")
      for (r <- recs.sortBy(-_.wallMs).take(8))
        println(f"    ${r.wallMs}%6dms run=${r.runMs}%7dms gc=${r.gcMs}%5dms " +
          f"in=${r.inMb}%7.1fMB sr=${r.shReadMb}%6.1fMB sw=${r.shWriteMb}%6.1fMB " +
          f"tasks=${r.tasks}%3d  ${r.name}")
    }
    spark.stop()
  }
}
