package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Scale-safe CONNECTED COMPONENTS over an edge DataFrame — the transitive-
 * closure stage that turns near-duplicate PAIRS (q25/q29/q32's outputs)
 * into dedup DECISIONS: every document in a component gets the component's
 * minimum doc_id as its cluster id, and the minimum itself is the canonical
 * representative to keep.
 *
 * Algorithm: the alternating LARGE-STAR / SMALL-STAR iteration of Kiveris
 * et al. ("Connected Components in MapReduce and Beyond", SoCC'14), the
 * standard shared-nothing CC formulation:
 *
 *  - large-star: for each node u (over BIDIRECTED edges), connect every
 *    strictly larger neighbor v > u to m = min(neighbors(u) + u);
 *  - small-star: for each node u (edges directed larger -> smaller), with
 *    m = min of u's smaller neighbors, connect u and every other smaller
 *    neighbor to m.
 *
 * Both steps are a groupBy(node) + min + equi-join — plain key-partitioned
 * shuffles, no driver-side state beyond a 2-long convergence signature per
 * iteration — and the edge set converges in O(log n) iterations to STARS
 * centered at each component's minimum node (the paper's Theorem 3.2).
 * Nothing is ever collected: a driver-side union-find would need every
 * pair in memory, which a 100 TB web-crawl corpus (where dup clusters are
 * huge and pairs outnumber documents) cannot guarantee.
 *
 * Convergence is detected by an order-independent edge-set signature
 * (count + bit_xor of xxhash64(u, v)): both star operations strictly
 * shrink the sum of edge endpoints unless already at their fixpoint, so an
 * unchanged signature means a true fixpoint, and at the joint fixpoint the
 * edges are exactly (node, component-min) stars.
 *
 * Each iteration CHECKPOINTS (not merely persists): every round's plan
 * embeds the previous round's several times (the bidirect union + two
 * star joins), so without lineage truncation the logical plan grows
 * exponentially in the iteration count — ~6 path-graph rounds OOMed the
 * driver on plan bookkeeping alone while the data stayed tiny. Reliable
 * `checkpoint()` when the session has a checkpoint dir (the cluster
 * deployment: survives executor loss), `localCheckpoint()` otherwise.
 * Superseded iterations are reclaimed EXPLICITLY: local-checkpoint blocks
 * by the ContextCleaner once unreferenced, reliable-checkpoint FILES by a
 * delete as soon as the next iteration is materialized — the cleaner only
 * removes checkpoint files when `spark.cleaner.referenceTracking
 * .cleanCheckpoints` is set (default false), and O(log n) full edge-set
 * copies per run would otherwise accrete in the checkpoint dir until the
 * filesystem filled. Only the CONVERGED iteration's checkpoint survives
 * the call (the returned mapping reads it); when
 * [[ensureReliableCheckpointDir]] itself created the checkpoint dir, an
 * application-end listener deletes the whole per-context dir (converged
 * files included) on shutdown — a deployment that set its own dir keeps
 * its own hygiene (the cleaner conf above, or dir rotation).
 */
object ConnectedComponents {

  /** Give the context a RELIABLE checkpoint dir when it has none, so the
    * closure survives executor loss (the `localCheckpoint` fallback below
    * recomputes-from-nothing when a block's executor dies — at 100 TB,
    * hours into an iteration on preemptible nodes, that is a failed query).
    * Called by the query surface (q66/q67/q68/q69) before each closure;
    * deployments override by setting their own checkpoint dir first, or
    * via `spark.graft.checkpoint.dir` (e.g. an HDFS/S3 path).
    * `setCheckpointDir` nests a per-context UUID under the root, so
    * concurrent applications never collide.
    *
    * The java.io.tmpdir default applies ONLY in local mode: on a real
    * cluster a driver-local `file:` path means each executor checkpoints
    * to its OWN disk and any cross-executor read fails — a hard failure
    * where the localCheckpoint fallback (no dir set) merely loses
    * resilience. So without an explicit conf on a cluster, no dir is set
    * and the closure keeps the working fallback. */
  def ensureReliableCheckpointDir(s: org.apache.spark.sql.SparkSession): Unit =
    if (s.sparkContext.getCheckpointDir.isEmpty) {
      val conf = s.conf.getOption("spark.graft.checkpoint.dir")
      val dir =
        if (conf.isDefined) conf
        else if (s.sparkContext.isLocal)
          Some(s"${sys.props("java.io.tmpdir")}/graft_ckpt")
        else None
      dir.foreach { d =>
        s.sparkContext.setCheckpointDir(d)
        // WE created this context's UUID dir under the root, so WE reclaim
        // it: the converged iteration's checkpoint (a full canonical
        // edge-set copy) outlives its query by design — the returned
        // mapping reads it — and the ContextCleaner only deletes
        // checkpoint files under a conf that is off by default, so
        // repeated runs would otherwise accrete one dir of edge data per
        // context in /tmp (or the conf'd root) forever (r12 ADVICE). A
        // deployment that set its OWN checkpoint dir before calling in
        // keeps its own hygiene — this hook only ever fires for dirs this
        // method created.
        s.sparkContext.getCheckpointDir.foreach(ctxDir =>
          s.sparkContext.addSparkListener(cleanupListener(s.sparkContext, ctxDir)))
      }
    }

  /** Listener deleting `ctxDir` (this context's UUID-nested checkpoint
    * dir) when the application ends — registered only for dirs
    * [[ensureReliableCheckpointDir]] itself created. Deletion failures
    * are swallowed: the JVM is exiting, there is nobody left to heal. */
  private[graft] def cleanupListener(sc: org.apache.spark.SparkContext,
      ctxDir: String): org.apache.spark.scheduler.SparkListener =
    new org.apache.spark.scheduler.SparkListener {
      override def onApplicationEnd(
          e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
        try {
          val p = new org.apache.hadoop.fs.Path(ctxDir)
          p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
        } catch { case scala.util.control.NonFatal(_) => () }
    }

  /** (node, cluster) for every node that appears in `edges`, where
    * `cluster` is the smallest node id of the node's connected component.
    * Input columns `u`, `v` (castable to bigint); self-loops and nulls are
    * dropped, direction is ignored. Nodes with no edges don't appear —
    * callers left-join and coalesce to the node's own id (a singleton is
    * its own cluster).
    *
    * Graphs whose CANONICAL edge count (deduped, self-loop-free) is at
    * most `driverThreshold` take a driver-side union-find over ONE bounded
    * collect instead of the star iteration: the iteration pays O(log n)
    * rounds of fixed job-scheduling overhead (checkpoint + shuffles per
    * round — measured 2.7-4.9 s on few-hundred-edge graphs at sf0.1,
    * pure overhead), while 2^20 collected edges are ~16 MB of driver
    * memory and microseconds of union-find. The count is already in hand
    * (the convergence signature's first field), so the decision costs
    * nothing, and the star iteration remains the UNCONDITIONAL path above
    * the threshold — the fast path is a bounded shortcut, never a bet
    * that the pair set fits. `driverThreshold = 0` forces the iteration
    * (used by tests to cover both paths on the same graphs). */
  def components(edges: DataFrame, u: String = "u", v: String = "v",
      maxIter: Int = 50, driverThreshold: Long = 1L << 20): DataFrame = {
    // Order-independent convergence signature. NOTE the accepted trade: a
    // non-fixpoint iteration whose edge multiset changed while preserving
    // BOTH count and xor would terminate the loop early — probability
    // ~2^-64 per iteration (the xor is over xxhash64 of canonical edges),
    // vs. a two-sided subtract check paying an extra join per round on
    // every run. The 2^-64 branch yields a wrong answer only if the
    // premature set also happens to be star-shaped; callers that need
    // certainty re-verify downstream (q66-q69 are oracle-checked).
    def sigOf(e: DataFrame): (Long, Long) = {
      val r = e.selectExpr(
        "count(*) AS n", "coalesce(bit_xor(xxhash64(u, v)), 0L) AS h").first()
      (r.getLong(0), r.getLong(1))
    }
    // Lineage truncation per iteration — see the class doc. The LOCAL
    // variant is lazy: the signature read right after is the materializing
    // action, so each iteration pays ONE job instead of an eager-snap job
    // plus a signature job. The RELIABLE variant stays eager — a lazy
    // reliable checkpoint recomputes its RDD a second time to write the
    // files, which doubles every iteration's work at exactly the scale
    // that mode exists for.
    def snap(df: DataFrame): DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
        df.checkpoint(eager = true)
      else df.localCheckpoint(eager = false)
    // Reliable-checkpoint file of an eagerly checkpointed frame (None in
    // localCheckpoint mode): Dataset.checkpoint returns a LogicalRDD over
    // the checkpointed RDD, whose getCheckpointFile is the directory to
    // reclaim once the frame is superseded.
    def dropCheckpoint(df: DataFrame): Unit =
      (df.queryExecution.analyzed match {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.getCheckpointFile
        case _ => None
      }).foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
          .delete(p, true)
      }
    // Canonical undirected form: u > v, deduped, no self-loops.
    var cur = snap(edges
      .selectExpr(s"cast($u AS bigint) AS a", s"cast($v AS bigint) AS b")
      .where("a IS NOT NULL AND b IS NOT NULL AND a != b")
      .selectExpr("greatest(a, b) AS u", "least(a, b) AS v")
      .distinct())
    var sig = sigOf(cur)
    if (sig._1 <= driverThreshold) {
      val out = driverComponents(cur)
      dropCheckpoint(cur)
      return out
    }
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // large-star over bidirected edges: every v > u re-attaches to
      // m = min(neighbors(u) + u) <= u < v, so output stays canonical.
      val bi = cur.union(cur.select(col("v").as("u"), col("u").as("v")))
      val lsMin = bi.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      // persisted: referenced twice below (the small-star min aggregation
      // AND its join) — without the cache each reference recomputes the
      // whole large-star (two shuffles over the full edge set), doubling
      // every iteration's heavy work. The single materializing job fills
      // the cache; released as soon as the iteration's output is sampled.
      val ls = bi.join(lsMin, Seq("u"))
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
        .persist()
      // small-star on the (u > v) form: u and each smaller neighbor v != m
      // re-attach to m = min of u's smaller neighbors (m < u, m <= v).
      val ssMin = ls.groupBy("u").agg(min(col("v")).as("m"))
      val next = snap(ls.join(ssMin, Seq("u"))
        .where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(ssMin.select(col("u"), col("m").as("v")))
        .distinct())
      val nextSig = sigOf(next) // materializes `next` before cur is reclaimed
      ls.unpersist(blocking = false)
      converged = nextSig == sig
      dropCheckpoint(cur)
      cur = next
      sig = nextSig
      it += 1
    }
    // O(log n) iterations by the paper's bound: running out of maxIter
    // means a bug (or a pathological graph far beyond it), never something
    // to silently return wrong clusters for.
    if (!converged)
      throw new IllegalStateException(
        s"ConnectedComponents did not converge in $maxIter iterations")
    // At the star fixpoint every edge is (node, component-min): the left
    // side maps each non-min node, the right side maps each min to itself.
    cur.select(col("u").as("node"), col("v").as("cluster"))
      .union(cur.select(col("v").as("node"), col("v").as("cluster")))
      .distinct()
  }

  /** Driver union-find over an already-bounded canonical edge frame — the
    * small-graph shortcut of [[components]]. The result is computed ON THE
    * DRIVER and returned as a literal frame, so the caller's downstream
    * plan reads a local relation (broadcastable by size) instead of a
    * checkpoint. Union attaches the larger root under the smaller, so a
    * component's root IS its minimum node; iterative path-halving keeps
    * find stack-free at any chain depth. */
  private def driverComponents(canonical: DataFrame): DataFrame = {
    val spark = canonical.sparkSession
    import spark.implicits._
    val edges = canonical.select(col("u"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = new java.util.HashMap[Long, Long](edges.length * 2)
    def find(x0: Long): Long = {
      var x = x0
      if (!parent.containsKey(x)) parent.put(x, x)
      while (parent.get(x) != x) {
        val gp = parent.get(parent.get(x))
        parent.put(x, gp) // path halving
        x = gp
      }
      x
    }
    edges.foreach { case (a, b) =>
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size)
    parent.keySet().forEach(n => out += ((n, find(n))))
    out.sortBy(_._1).toSeq.toDF("node", "cluster")
  }
}
