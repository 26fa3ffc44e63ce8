package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Checkpoint-cost grid for the transactional store protocol (TUNE_r15):
 * every committed transaction adds one layer set, and every reader pays
 * the multi-path listing/open cost — the classic small-file problem the
 * [[graft.queries.StoreTxn.checkpoint]] verb exists to amortize. This
 * harness measures, for N ∈ {8, 32} single-slice transactions:
 *
 *  - total absorb wall time (N judges + N stage/commit rounds);
 *  - the stats + keeper read latency at N committed layers (median of
 *    3) vs the same reads after ONE checkpoint folded them;
 *  - the checkpoint's own cost.
 *
 * Not part of the query surface — run with
 * `sbt "runMain graft.tools.TxTune"` (SPARK_GRAFT_SF_DIR selects the
 * corpus, default sf0.001). Leaves the transaction root reset so the
 * oracled lifecycles replay cleanly afterwards.
 */
object TxTune {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.{Caches, DedupIndex, StoreTxn, Tables}

    def ms[A](f: => A): Long = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1000000
    }
    def readLatency(): Long = {
      val runs = (1 to 3).map { _ =>
        ms {
          StoreTxn.storedStatsTx(spark, dir).collect()
          StoreTxn.keeperIdsTx(spark, dir).count()
        }
      }.sorted
      runs(1)
    }

    for (n <- Seq(8, 32)) {
      StoreTxn.reset(spark, dir)
      StoreTxn.ensureBases(spark, dir)
      val docs = Tables.t(spark, dir, "documents")
      val delta = DedupIndex.deltaDocs(spark, dir)
      val absorbMs = ms {
        for (i <- 0 until n) {
          StoreTxn.absorbBoth(spark, dir,
            delta.where(s"doc_id % $n = $i"),
            docs.where(s"doc_id % 10 >= 7 AND doc_id % $n = $i"))
          Caches.releaseAll()
        }
      }
      val pre = readLatency()
      val ckptMs = ms(StoreTxn.checkpoint(spark, dir))
      val post = readLatency()
      println(s"TXTUNE txns=$n absorb_total_ms=$absorbMs " +
        s"read_pre_ms=$pre ckpt_ms=$ckptMs read_post_ms=$post")
    }
    StoreTxn.reset(spark, dir)
    spark.stop()
  }
}
