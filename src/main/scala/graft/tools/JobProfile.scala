package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/**
 * Per-Spark-job wall-time profile of one query lap (guide §1: find where
 * the seconds go before touching anything). Prints one line per job —
 * start offset, duration, task count, call site — plus the lap total,
 * so a lifecycle entry's dozens of small actions become attributable.
 *
 * Usage: java -cp "classes:SPARK_JARS" graft.tools.JobProfile <query> [laps]
 * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
 */
object JobProfile {

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q206_tx_table_optimize")
    val laps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, String)]()
    @volatile var lapT0 = 0L
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts.put(e.jobId, (System.nanoTime(),
          e.stageInfos.map(_.numTasks).sum,
          Option(e.properties).map(_.getProperty("callSite.short", "?"))
            .getOrElse("?")))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val st = starts.remove(e.jobId)
        if (st != null && record) {
          val (t0, tasks, site) = st
          val durMs = (System.nanoTime() - t0) / 1e6
          val offMs = (t0 - lapT0) / 1e6
          println(f"JOB id=${e.jobId}%4d off=${offMs}%8.0fms dur=${durMs}%7.0fms tasks=$tasks%4d  $site")
        }
      }
    })

    for (lap <- 1 to laps) {
      println(s"===== $name lap $lap =====")
      lapT0 = System.nanoTime()
      record = lap == laps // profile only the LAST (warm) lap
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      graft.queries.Caches.releaseAll()
      println(f"LAP $name lap=$lap sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
