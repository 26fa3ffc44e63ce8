package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * TRANSACTIONAL CROSS-STORE ABSORB — the missing atomicity of the q134
 * composed loop. [[StoreMix.storeMix]] mutates the dedup store and the
 * stats store with two INDEPENDENT absorbs: a crash between them leaves
 * keepers covering corpus ∪ delta while the stats still cover the corpus
 * only, and nothing detects the skew — each store individually just reads
 * "absorbed", and the next mix silently gates absorbed-corpus lengths
 * against stale means. At one batch a day for a year that window opens
 * 365 times.
 *
 * The fix is the standard log-structured one (the Delta/Iceberg commit
 * shape, rebuilt here from scratch over plain parquet):
 *
 *   - the BASE stores are immutable — [[DedupIndex]] and [[StatsStore]]
 *     under their own `tx` variant, built once, never appended to;
 *   - every absorb stages BOTH stores' increments as a transaction
 *     LAYER under `t<id>/` (dedup exact/shingles/bands + stats
 *     partials), invisible to every reader;
 *   - the COMMIT POINT is one row (the txn id) appended to ONE table
 *     (`commits`). Readers resolve base ∪ committed layers only, so
 *     both stores advance in the same instant or not at all;
 *   - a crash before the commit row leaves fully-invisible staging; the
 *     retry recomputes the SAME txn id (next id = max committed + 1 —
 *     nothing was committed, so the id is stable) and overwrites the
 *     partial staging. Redo, not undo.
 *
 * Atomicity rests on the commit append being all-or-nothing: the single
 * coalesced commit file lands via Spark's _temporary → rename protocol,
 * so on a rename-atomic filesystem (HDFS, local) a torn commit leaves no
 * visible row. On S3-class stores you'd swap the commits table for a
 * conditional-PUT manifest — the layer/commit split is unchanged.
 *
 * Scale posture matches the stores it coordinates: the judge is q84's
 * delta-driven equi-joins (now against base ∪ layers — same plan, more
 * input paths), layers are O(batch), commits is O(#transactions), and
 * readers never rewrite anything. Compaction (fold committed layers into
 * a new base, truncate commits) is [[DedupIndex.compact]]'s device and
 * composes the same way.
 */
object StoreTxn {

  /** The base stores' variant — see DedupIndex.root's note on variant
    * isolation. The `tx` bases stay PRISTINE forever (all mutation is
    * transaction layers), so buildIfStale skips the rebuild every lap. */
  private val variant = "tx"

  private[graft] def root(dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    s"${sys.props("java.io.tmpdir")}/graft_store_txn_$h"
  }

  /** Drop every transaction (layers + commit log). The lifecycle queries
    * reset first so each lap replays a deterministic history. */
  def reset(s: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root(dir))
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Committed transaction ids, ascending. O(#transactions) driver-side —
    * the same bounded-collect class as AnnIndex's metadata reads. */
  private[queries] def committedTxns(s: SparkSession, dir: String): Seq[Long] =
    try s.read.parquet(s"${root(dir)}/commits")
      .collect().map(_.getLong(0)).toSeq.sorted
    catch { case _: Exception => Seq.empty }

  def nextTxnId(s: SparkSession, dir: String): Long =
    committedTxns(s, dir).lastOption.map(_ + 1).getOrElse(0L)

  /** Base table ∪ the matching layer of every COMMITTED transaction.
    * Uncommitted staging is structurally invisible: the path list is
    * built from the commit log, not from a directory listing. */
  private def layered(s: SparkSession, dir: String, base: String,
      layer: Long => String): DataFrame =
    s.read.parquet((base +: committedTxns(s, dir).map(layer)): _*)

  private def dedupTable(s: SparkSession, dir: String, t: String): DataFrame =
    layered(s, dir, s"${DedupIndex.root(dir, variant)}/$t",
      id => s"${root(dir)}/t$id/dedup/$t")

  private def statsPartials(s: SparkSession, dir: String): DataFrame =
    layered(s, dir, s"${StatsStore.root(dir, variant)}/partials",
      id => s"${root(dir)}/t$id/stats/partials")

  /** Build the immutable base stores if missing/stale. */
  def ensureBases(s: SparkSession, dir: String): Unit = {
    DedupIndex.buildIfStale(s, dir, variant)
    StatsStore.buildIfStale(s, dir, variant)
  }

  // ---- the reader surface (base ∪ committed layers) ----

  def keeperIdsTx(s: SparkSession, dir: String): DataFrame =
    dedupTable(s, dir, "exact").select(col("keeper").as("doc_id"))

  def storedStatsTx(s: SparkSession, dir: String): DataFrame =
    StatsStore.finalize(statsPartials(s, dir))

  /** q84's judge against the transactional state — base ∪ committed
    * layers, so a batch is judged against everything previous
    * transactions absorbed but never against uncommitted staging. */
  def judgeTx(s: SparkSession, dir: String, delta: DataFrame): DataFrame =
    DedupIndex.judgeAgainst(s, delta,
      dedupTable(s, dir, "exact"),
      dedupTable(s, dir, "shingles"),
      dedupTable(s, dir, "bands"))

  // ---- the writer surface ----

  /** Stage transaction `id`: judge the batch, materialize its kept docs
    * (one write; the three derived dedup tables and the stats partials
    * then each read the staged copy instead of re-running the judge —
    * absorbDocs' materialize-before-mutate device), and write every
    * layer table under `t<id>/`. Overwrite mode throughout, so a retry
    * of a crashed stage replaces partial files. NOTHING here is visible
    * to readers until [[commit]]. */
  def stage(s: SparkSession, dir: String, dedupDelta: DataFrame,
      statsDelta: DataFrame, id: Long): Unit = {
    val t = s"${root(dir)}/t$id"
    val keptIds = judgeTx(s, dir, dedupDelta)
      .where("verdict = 'unique'").select(col("doc_id"))
    dedupDelta.join(keptIds, Seq("doc_id"))
      .write.mode("overwrite").parquet(s"$t/kept")
    val kept = s.read.parquet(s"$t/kept")
    kept.selectExpr("md5(text) AS fp", "doc_id")
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_docs"))
      .write.mode("overwrite").parquet(s"$t/dedup/exact")
    val sh = Caches.persist(TextPipeline.shinglesOf(kept))
    sh.write.mode("overwrite").parquet(s"$t/dedup/shingles")
    TextPipeline.minhashBands(sh)
      .write.mode("overwrite").parquet(s"$t/dedup/bands")
    StatsStore.partials(statsDelta)
      .write.mode("overwrite").parquet(s"$t/stats/partials")
  }

  /** THE COMMIT POINT: one row, one table. Before this append neither
    * store shows the batch; after it both do. */
  def commit(s: SparkSession, dir: String, id: Long): Unit = {
    import s.implicits._
    Seq(id).toDF("txn")
      .coalesce(1).write.mode("append").parquet(s"${root(dir)}/commits")
  }

  /** The atomic absorb: stage both stores' increments, then commit. */
  def absorbBoth(s: SparkSession, dir: String, dedupDelta: DataFrame,
      statsDelta: DataFrame): Long = {
    val id = nextTxnId(s, dir)
    stage(s, dir, dedupDelta, statsDelta, id)
    commit(s, dir, id)
    id
  }

  /** q147: the q134 composed mix run through the TRANSACTIONAL lifecycle
    * — reset, build the immutable bases, absorb the delta into both
    * stores as ONE transaction, then build the mix from the
    * base-∪-committed-layer reads. Same downstream pipeline, same
    * oracle, different (crash-consistent) store protocol: a hash-green
    * q147 next to q134 is the cross-engine proof that the commit-log
    * indirection is semantics-free. */
  private def txStoreMix(s: SparkSession, dir: String): DataFrame = {
    reset(s, dir)
    ensureBases(s, dir)
    absorbBoth(s, dir,
      DedupIndex.deltaDocs(s, dir),
      Tables.t(s, dir, "documents").where("doc_id % 10 >= 7"))
    StoreMix.mixFrom(s, dir, keeperIdsTx(s, dir),
      storedStatsTx(s, dir)
        .select(col("lang"), col("source"), col("n_docs"), col("total_chars")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q147_tx_store_mix" -> ((s, dir) => txStoreMix(s, dir))
  )

  // q134's oracle VERBATIM: the transaction protocol must be invisible
  // to the composed result (the q143-shares-q135 device).
  val oracles: Map[String, String] = Map(
    "q147_tx_store_mix" -> StoreMix.oracles("q134_store_mix")
  )
}
