package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * DIAG harness for q59_ann_ivf_persisted (r15 VERDICT next-round #2):
 * per-phase timing of the IVF persisted load path next to its q58 LSH
 * twin, so a drifting artifact number can be attributed to a phase
 * (validate / geometry load / probe+join) instead of re-investigated
 * from scratch. Phases are approximated with the public surface:
 *
 *   validate   — AnnIndex.isCurrent: metadata read + corpus listing
 *                digest + corpus fingerprint aggregation (identical
 *                work for both tiers — any divergence here is
 *                memo/session state, not the tier);
 *   geometry   — the driver-side collect of the tier's model artifact
 *                (IVF centroids; LSH has none, its hyperplanes derive
 *                from (seed, dim), so the LSH row reads ~0);
 *   probe+join — the full topK plan to a noop sink, which INCLUDES a
 *                redundant validate+geometry pass (ivfTopK/lshTopK
 *                re-validate internally); the pure join cost is
 *                (probe+join − validate − geometry).
 *
 * Laps are interleaved (q58 then q59 per lap) for the same reason
 * Bench interleaves repeats: a transient contention window corrupts at
 * most one lap of each phase, and the min column recovers the clean
 * number. Emits one stderr line per (lap, phase) plus a median/min
 * summary — paste the summary into TUNE_r<N>.
 */
object IvfLoadDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val laps = sys.env.getOrElse("SPARK_GRAFT_DIAG_LAPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    import graft.similarity.AnnIndex
    // the very indexes q58/q59 serve from, not private copies
    val lshPath = graft.SparkEntry.annIndexPath(sfDir, "lsh_q58")
    val ivfPath = graft.SparkEntry.annIndexPath(sfDir, "ivf_q59")
    // ensure both indexes exist and are current (outside the timed laps)
    if (!AnnIndex.isCurrent(spark, sfDir, lshPath))
      AnnIndex.saveLsh(spark, sfDir, lshPath)
    if (!AnnIndex.isCurrent(spark, sfDir, ivfPath))
      AnnIndex.saveIvf(spark, sfDir, ivfPath)

    val samples = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[Double]]
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      samples.getOrElseUpdate(label,
        scala.collection.mutable.ArrayBuffer.empty[Double]) += sec
      System.err.println(f"DIAG $label%-18s $sec%.3f s")
    }
    for (_ <- 1 to laps) {
      time("q58.validate") { AnnIndex.isCurrent(spark, sfDir, lshPath) }
      time("q58.geometry") { /* hyperplanes derive from (seed, dim) */ }
      time("q58.probe+join") {
        AnnIndex.lshTopK(spark, sfDir, lshPath)
          .write.format("noop").mode("overwrite").save()
      }
      time("q59.validate") { AnnIndex.isCurrent(spark, sfDir, ivfPath) }
      time("q59.geometry") {
        spark.read.parquet(s"$ivfPath/model").orderBy("list_id").collect()
      }
      time("q59.probe+join") {
        AnnIndex.ivfTopK(spark, sfDir, ivfPath)
          .write.format("noop").mode("overwrite").save()
      }
    }
    println(f"${"phase"}%-18s ${"median"}%8s ${"min"}%8s  (laps=$laps, sf=$sfDir)")
    samples.foreach { case (label, runs) =>
      val sorted = runs.toSeq.sorted
      val med =
        if (sorted.length % 2 == 1) sorted(sorted.length / 2)
        else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2.0
      println(f"$label%-18s $med%8.3f ${sorted.head}%8.3f")
    }
    spark.stop()
  }
}
