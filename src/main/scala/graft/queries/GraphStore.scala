package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * INCREMENTAL GRAPH-EDGE STORE — the graph sibling of [[StatsStore]].
 * Every graph query in this engine (q106/q128/q132) pays ONE corpus-scale
 * stage: the edge aggregation. At 100 TB that stage dominates — and it is
 * also the only stage that is incrementally maintainable, because
 * co-purchase edge weights are pure ADDITIVE partials: pairs are
 * generated WITHIN an order (q128's bounded fan-out), each order lives in
 * exactly one ingest batch, and pair weights sum across orders. So the
 * edge list persists as a layered (a, b, w) store, a new batch of orders
 * appends only its OWN pair aggregation, and the merged store equals the
 * full-table edge list EXACTLY (integer counts) — the backbone cut and
 * every downstream motif/propagation read run from the store without
 * re-scanning ingested lineitems.
 *
 * Store lifecycle matches the family contract: order-sliced corpus/delta
 * (l_orderkey mod 10: 0-6 corpus, 7-9 delta), fingerprint-guarded build
 * with meta written LAST, append-only absorb that flips meta first
 * (invalidate-before-mutate), and a merged read that is O(|store|) — the
 * store is #distinct-pairs-sized, orders of magnitude below the corpus
 * (and the q143-style compact applies verbatim if layers accumulate).
 *
 * q150 runs the full lifecycle and reads q128's triangle participation
 * from the merged store; because the merged weights equal the full-table
 * weights exactly and the backbone cut is a TOTAL order, q128's oracle
 * applies VERBATIM — the cross-engine proof that incremental edge
 * maintenance is invisible to the analytics on top.
 */
object GraphStore {

  // md5 fragment, not hashCode — the family's path-keying standard.
  // variant: independent store instances (EmbedIndex.root's rationale);
  // StoreTxn's immutable base lives under the "tx" variant.
  private[graft] def root(dir: String, variant: String = ""): String = {
    val h = Tables.dirHash(dir)
    val v = if (variant.isEmpty) "" else s"_$variant"
    s"${sys.props("java.io.tmpdir")}/graft_graph_store_$h$v"
  }

  private def orderParts(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))

  private def corpusOp(s: SparkSession, dir: String): DataFrame =
    orderParts(s, dir).where("o % 10 < 7")

  private def deltaOp(s: SparkSession, dir: String): DataFrame =
    orderParts(s, dir).where("o % 10 >= 7")

  /** The delta batch's own pair aggregation — the additive partial a
    * transaction stages as its graph layer (StoreTxn). */
  private[queries] def deltaPairs(s: SparkSession, dir: String): DataFrame =
    Graph.coPairsOf(deltaOp(s, dir))

  /** Corpus-slice content fingerprint: distinct (o, p) count +
    * order-independent hash-sum — any membership change moves it. */
  private def fingerprint(s: SparkSession, dir: String): String =
    Tables.memoFingerprint(s, dir, "graph.base") {
      val r = corpusOp(s, dir).distinct()
        .selectExpr("cast(conv(substring(md5(concat_ws('|', cast(o AS string), " +
          "cast(p AS string))), 1, 8), 16, 10) AS bigint) AS h")
        .agg(count(lit(1)).as("n"), sum(col("h")).as("hsum"))
        .head()
      s"${r.getLong(0)}:${r.getLong(1)}"
    }

  /** LAYERED meta — (kind, fp) rows, ClusterStore's device: `base`
    * tracks the corpus slice, `batch1` the absorbed delta, `compacted`
    * stamps an already-folded layer set — so "absorbed and current" is
    * distinguishable from "stale" and the steady-state lifecycle
    * (build + absorb + compact on an unchanged corpus) is a NO-OP
    * beyond the two fingerprint aggregations. The old flat meta
    * stamped "absorbed" and forced a full rebuild + re-absorb +
    * re-fold every lap — the exact per-lap probe cost the r17 verdict
    * priced for this family. */
  private def writeMeta(s: SparkSession, path: String,
      rows: Seq[(String, String)]): Unit = StoreMeta.write(s, path, rows)

  private def metaRows(s: SparkSession, path: String): Map[String, String] =
    StoreMeta.rows(s, path)

  private def deltaFingerprint(s: SparkSession, dir: String): String =
    Tables.memoFingerprint(s, dir, "graph.delta") {
      val r = deltaOp(s, dir).distinct()
        .selectExpr("cast(conv(substring(md5(concat_ws('|', cast(o AS string), " +
          "cast(p AS string))), 1, 8), 16, 10) AS bigint) AS h")
        .agg(count(lit(1)).as("n"), sum(col("h")).as("hsum"))
        .head()
      s"${r.getLong(0)}:${r.getLong(1)}"
    }

  def build(s: SparkSession, dir: String, variant: String = ""): String = {
    val path = root(dir, variant)
    Graph.coPairsOf(corpusOp(s, dir))
      .write.mode("overwrite").parquet(s"$path/edges")
    // meta written LAST, base row only: a build clears batch/compacted
    writeMeta(s, path, Seq("base" -> fingerprint(s, dir)))
    path
  }

  /** Current = base geometry matches the corpus slice AND no verb died
    * mid-write ("absorbing"/"compacting" rows). An absorbed batch row
    * does NOT make the store stale — that is the point. */
  def isCurrent(s: SparkSession, dir: String, variant: String = ""): Boolean = {
    val rows = metaRows(s, root(dir, variant))
    rows.get("base").contains(fingerprint(s, dir)) &&
      !rows.values.exists(v => v == "absorbing" || v == "compacting")
  }

  def buildIfStale(s: SparkSession, dir: String, variant: String = ""): String =
    if (isCurrent(s, dir, variant)) root(dir, variant) else build(s, dir, variant)

  /** Delete the meta record so the next buildIfStale rebuilds — the
    * store-owned invalidation verb (see DedupIndex.invalidate). */
  private[graft] def invalidate(s: SparkSession, dir: String,
      variant: String = ""): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"${root(dir, variant)}/meta")
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Absorb the delta orders: ONE pair aggregation over the batch,
    * appended as a layer — IDEMPOTENT under the layered meta: an
    * already-absorbed, unchanged batch is a no-op, a changed batch or
    * a torn previous absorb rebuilds first (append-only layers cannot
    * retract), and the batch row flips to "absorbing" BEFORE the
    * append so a crash between the two reads as stale, never as a
    * double-count. */
  def absorb(s: SparkSession, dir: String): Unit = {
    var path = root(dir)
    val dfp = deltaFingerprint(s, dir)
    val bfp = fingerprint(s, dir)
    val rows = metaRows(s, path)
    if (rows.get("batch1").contains(dfp) && rows.get("base").contains(bfp))
      return // already absorbed, nothing changed — the steady state
    if (rows.contains("batch1") || !rows.get("base").contains(bfp))
      path = build(s, dir)
    writeMeta(s, path, Seq("base" -> bfp, "batch1" -> "absorbing"))
    Graph.coPairsOf(deltaOp(s, dir))
      .write.mode("append").parquet(s"$path/edges")
    writeMeta(s, path, Seq("base" -> bfp, "batch1" -> dfp))
  }

  /** The merged edge list: one groupBy over the #pairs-sized store.
    * Equals the full-table [[Graph.coPairsOf]] exactly — additive
    * weights over an order-partitioned corpus. */
  def mergedEdges(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"${root(dir)}/edges")
      .groupBy(col("a"), col("b")).agg(sum(col("w")).as("w"))

  private def foldStamp(rows: Map[String, String]): String =
    s"${rows.getOrElse("base", "")}|${rows.getOrElse("batch1", "")}"

  /** COMPACT the layered edges to one row per pair — the additive merge
    * IS the compaction (StatsStore.compact's algebra). Same write
    * discipline: the merged copy is STAGED (the rewrite reads the path
    * it overwrites) and meta is invalidated before the rewrite and
    * restored after, so a crash mid-rewrite rebuilds rather than serves
    * torn layers. REFUSES on torn meta (ClusterStore.compact's guard —
    * folding would re-bless a half-written layer) and is a NO-OP when
    * the current layer set is already folded (the `compacted` stamp).
    * O(|store|), never O(corpus). */
  def compact(s: SparkSession, dir: String): Unit = {
    val path = root(dir)
    val staging = s"$path/staging_compact"
    val saved = metaRows(s, path)
    if (saved.isEmpty || saved.values.exists(v =>
        v == "absorbing" || v == "compacting"))
      throw new IllegalStateException(
        s"graph store at $path is torn or unbuilt (meta = $saved) — " +
          "run absorb/buildIfStale to heal before compacting")
    if (saved.get("compacted").contains(foldStamp(saved)))
      return // this exact layer set is already one row per pair
    mergedEdges(s, dir)
      .coalesce(4).write.mode("overwrite").parquet(staging)
    writeMeta(s, path, Seq("base" -> "compacting"))
    StoreMeta.swapIn(s, staging, s"$path/edges")
    writeMeta(s, path, (saved - "compacted").toSeq :+
      ("compacted" -> foldStamp(saved)))
    val fs = new org.apache.hadoop.fs.Path(staging)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // build the corpus edge store, absorb the delta orders' pairs, then
    // answer q128's triangle participation FROM THE STORE: backbone cut
    // + wedge-close joins over the merged (store-only) edges. Under the
    // layered meta an absorbed-and-current lap skips both verbs (two
    // fingerprint aggregations, no rebuild) — the lap then prices the
    // store READ, the daily-ingest steady state.
    "q150_graph_store" -> ((s, dir) => {
      buildIfStale(s, dir)
      absorb(s, dir)
      Graph.triangleCountsOf(Graph.backboneOf(mergedEdges(s, dir)))
    }),
    // the same lifecycle with a COMPACTION between absorb and the read,
    // serving q132's label propagation from the store: compaction is the
    // additive merge, so the backbone cut — and every propagation round
    // on it — must be invisible to the rewrite (q132's oracle verbatim,
    // the q143 device applied to graph maintenance).
    "q152_graph_store_lp" -> ((s, dir) => {
      buildIfStale(s, dir)
      absorb(s, dir)
      compact(s, dir)
      Graph.labelPropOver(s, dir, Graph.backboneOf(mergedEdges(s, dir)))
    })
  )

  // q128's/q132's oracles VERBATIM: full-table backbone + read — the
  // incremental store must be invisible to the read (the q143 device).
  val oracles: Map[String, String] = Map(
    "q150_graph_store" -> Graph.oracles("q128_triangle_backbone"),
    "q152_graph_store_lp" -> Graph.oracles("q132_label_prop")
  )
}
