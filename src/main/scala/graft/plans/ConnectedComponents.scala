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
 * the call (the returned mapping reads it); that one dir per run is
 * reclaimed by the cleaner conf above or the deployment's checkpoint-dir
 * hygiene.
 */
object ConnectedComponents {

  /** (node, cluster) for every node that appears in `edges`, where
    * `cluster` is the smallest node id of the node's connected component.
    * Input columns `u`, `v` (castable to bigint); self-loops and nulls are
    * dropped, direction is ignored. Nodes with no edges don't appear —
    * callers left-join and coalesce to the node's own id (a singleton is
    * its own cluster). */
  def components(edges: DataFrame, u: String = "u", v: String = "v",
      maxIter: Int = 50): DataFrame = {
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
}
