package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * State-store knob measurement at REAL state volume — the r19 residual:
 * both r19 experiments (RocksDB changelog checkpointing, statePartitions
 * 8→4) were no-ops because q104's join state is kilobytes, so the knobs
 * had nothing to move. This stages a feed whose streaming-dedup state
 * grows to ~10⁶ distinct keys across 4 micro-batches (range-disjoint
 * files → each batch adds ~250k NEW keys) and times each batch under:
 *
 *   hdfs                 — on-heap provider (the 100 TB anti-posture)
 *   rocksdb              — the repo default (full snapshot per commit)
 *   rocksdb+changelog    — changelog checkpointing: commits upload the
 *                          delta, snapshots go async/periodic
 *
 * Per batch it prints triggerExecution/addBatch/commit durations and the
 * state operator's rows/memory, so the posture note in TUNE can cite a
 * curve instead of noise.
 *
 * Usage: java -cp "target/scala-2.13/classes:SPARK_JARS" graft.tools.StateTune
 * Env: GRAFT_STATE_KEYS (default 1000000), SPARK_GRAFT_CPUS (default 32)
 */
object StateTune {

  def main(args: Array[String]): Unit = {
    val keys = sys.env.getOrElse("GRAFT_STATE_KEYS", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val batches = 4
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the staged feed: 2x rows over `keys` distinct keys, range-split so
    // each micro-batch introduces a fresh quarter of the key space
    val feed = s"${sys.props("java.io.tmpdir")}/graft_statetune_feed"
    spark.range(keys * 2)
      .selectExpr(s"id % $keys AS key", "id AS payload")
      .repartitionByRange(batches, col("key"))
      .write.mode("overwrite").parquet(feed)
    val fdir = new java.io.File(feed)
    val base = System.currentTimeMillis() - 3600000L
    fdir.listFiles().filter(_.getName.startsWith("part-")).sortBy(_.getName)
      .zipWithIndex.foreach { case (f, i) => f.setLastModified(base + i * 1000L) }
    val schema = spark.read.parquet(feed).schema

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val changelogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val hdfs =
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    val configs = Seq(
      ("hdfs", hdfs, "false"),
      ("rocksdb", rocks, "false"),
      ("rocksdb+changelog", rocks, "true"))

    for ((tag, provider, changelog) <- configs) {
      spark.conf.set(providerKey, provider)
      spark.conf.set(changelogKey, changelog)
      spark.conf.set("spark.sql.shuffle.partitions", "8") // the grid's state-partition default
      val ckpt = s"${sys.props("java.io.tmpdir")}/graft_statetune_ckpt_$tag"
      new org.apache.hadoop.fs.Path(ckpt)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(ckpt), true)
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(feed)
      val sink: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
        (b, _) => { b.count(); () }
      val t0 = System.nanoTime()
      val q = stream.dropDuplicates("key")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"CONFIG $tag%-18s wall=$wall%6.2fs")
      for (p <- q.recentProgress) {
        val d = p.durationMs
        val so = p.stateOperators.headOption
        println(s"  batch=${p.batchId} trigger=${d.get("triggerExecution")}ms " +
          s"addBatch=${d.get("addBatch")}ms commit=${d.get("commitOffsets")}ms " +
          so.map(o => s"stateRows=${o.numRowsTotal} stateMB=" +
            f"${o.memoryUsedBytes / 1e6}%.1f").getOrElse(""))
      }
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
    }
    spark.stop()
  }
}
