package graft.similarity

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Approximate nearest neighbors via random-hyperplane (sign) LSH.
 *
 * Scale path for similarity search: instead of scoring every probe against
 * every vector (q28's brute-force baseline), vectors are bucketed by the
 * sign pattern of `numPlanes` random hyperplane projections, and probes
 * only score against their own bucket — an IVF-style candidate prune that
 * cuts the scan by ~2^numPlanes per table.
 *
 * Recall near bucket borders is recovered two standard ways, compounding:
 * `numTables` INDEPENDENT hash tables (per-table miss probabilities
 * multiply), and MARGIN-ORDERED MULTIPROBE on the query side — each probe
 * also searches the `probesPerTable - 1` next-most-likely buckets of each
 * table, enumerated best-first by the summed |projection| margin of the
 * flipped bits (the query-directed probing sequence of Lv et al., VLDB'07,
 * as used in FAISS/E2LSH). Probability-ordered probing dominates blind
 * Hamming-ball probing at equal scan cost: a bit whose projection sits
 * near zero is far likelier to separate a true neighbor than a
 * high-margin bit, so the ball is crossed in likelihood order, not index
 * order. Only probes fan out; corpus rows still index
 * into one bucket per table, so the index stays L rows per vector and the
 * scanned fraction is bounded by L*probesPerTable/2^numPlanes of the
 * corpus before the collision vote below cuts it further.
 *
 * SCAN COST is then decoupled from probe width by COLLISION VOTING
 * (`minCollisions`): candidate pairs are counted per (probe, vector)
 * across all probed buckets first — ids only — and only pairs colliding
 * in at least `minCollisions` buckets are cosine-scored. A true neighbor
 * multi-collides (per-table collision probabilities compound across wide
 * probing); a background vector that stumbled into one probed bucket
 * stops there. The vote moves the whole recall/scan frontier.
 *
 * Once the vote prunes the SCORED pool, the dominant scale term becomes
 * the id-only PRE-VOTE pool the vote aggregates, and that pool shrinks
 * with FINER BUCKETS: more planes per table cut each probed bucket's
 * occupancy, wider probing + the vote recover border recall.
 *
 * The SHIPPED DEFAULT — 14 planes x 16 tables, 768 probes per table,
 * minCollisions=2 — is chosen by 5-SEED MINIMUM recall, not single-seed
 * recall (TUNE_r11.txt "seeds" grids, the committed AnnTune output this
 * file's numbers are required to come from): round 10's point (12
 * tables, 896 probes) measured 0.872 at its shipped seed but spanned
 * 0.784-0.872 across five plane draws on sf0.001 — below the 0.85 floor
 * at three of them; the extra independent tables buy draw-robustness
 * (min 0.864 on sf0.001, 0.936 on sf0.1 across the same five seeds).
 * At the gate seed (7919): recall 0.888 at scan 0.238, pre-vote pool
 * 0.543 on sf0.001; 0.944 at 0.235, pre-vote 0.537 on sf0.1. The costs
 * of the move are measured and gated, not hidden: the index carries 16
 * rows per vector instead of 12, and the multiplicity pool (the rows
 * the bucket join feeds the counting aggregate) rises to 0.929/0.915
 * (~1.71 collisions per distinct pair, vs 1.59 at 12 tables).
 * ModulesSpec gates the default at (recall >= 0.85, scan <= 0.25,
 * prevote <= 0.55, multiplicity <= 0.95) on BOTH corpora and logs all
 * four numbers to RECALL.jsonl — so the cheap-filter work the scan
 * number excludes stays visible and bounded on both axes.
 *
 * `poolFrac > 0` additionally switches the probe side to OCCUPANCY-
 * BUDGETED probing: per-bucket occupancies (one ids-only aggregation,
 * broadcast as a lattice-sized int array) let each probe take margin-
 * ordered buckets only while their summed occupancy fits
 * ceil(poolFrac * corpusN) rows — the pre-vote pool becomes a HARD
 * per-probe bound instead of an emergent number. Measured
 * (TUNE_r10.txt "budget" grids, both corpora, at the 12-table
 * configuration those grids swept): on THESE isotropic embeddings the
 * mode does not dominate the fixed quota at equal distinct pool (e.g.
 * budget=0.85: 0.848 recall at distinct pool 0.515 vs that grid's
 * default 0.872 at 0.502) — with no cluster structure, bucket occupancy
 * is proportional to neighbor probability mass, so skipping crowded
 * buckets forfeits proportional recall. It therefore ships as the
 * worst-case-control knob (bounding per-query cost on real, clustered
 * corpora where a handful of mega-buckets would otherwise eat the
 * pool), NOT as the default; q60 and ModulesSpec pin the bound property
 * and the measured point at numTables=12 explicitly.
 *
 * The hyperplanes are seeded and broadcast; bucketing is a native codegen
 * expression ([[LshBuckets]]) over the embedding array, run once per
 * (row, table), not once per pair.
 * Not SQL-expressible cross-engine (gaussian planes), so the driver records
 * the rows-only check for this query; correctness against brute force is
 * asserted in ModulesSpec instead.
 */
object AnnLsh {

  /** Deterministic gaussian hyperplanes, `numTables * numPlanes` of them
    * (table t owns the contiguous slice [t*numPlanes, (t+1)*numPlanes)). */
  private[similarity] def planes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rng = new Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** NOTE both kernels take Array, not Seq: a Seq-typed wrapper can hand
    * array<double> through as a LIST, making positional access in a
    * dim-length loop O(dim^2) pointer chasing — measured as ~0.9 s of the
    * 2000-row index pass at sf0.1 in the former UDF. [[LshBuckets]] bulk-
    * copies the catalyst array to a primitive Array once per row. */
  private[similarity] def projections(vec: Array[Double], ps: Array[Array[Double]],
      from: Int, len: Int): Array[Double] = {
    val dots = new Array[Double](len)
    var p = 0
    while (p < len) {
      var dot = 0.0
      val plane = ps(from + p)
      var i = 0
      while (i < plane.length && i < vec.length) {
        dot += plane(i) * vec(i)
        i += 1
      }
      dots(p) = dot
      p += 1
    }
    dots
  }

  private[similarity] def bucketOf(vec: Array[Double], ps: Array[Array[Double]],
      from: Int, len: Int): Int = {
    val dots = projections(vec, ps, from, len)
    var b = 0
    var p = 0
    while (p < len) {
      b = (b << 1) | (if (dots(p) >= 0) 1 else 0)
      p += 1
    }
    b
  }

  /**
   * The `t` most-probable buckets for a query with per-plane signed
   * projections `dots`, best-first (Lv et al.'s query-directed probing
   * sequence). Flipping bit p costs |dots(p)|; perturbation sets are
   * enumerated in increasing total cost with the classic heap over
   * (extend-with-next, shift-last) successors, so generating t buckets
   * touches O(t log t) heap entries — never the full 2^planes lattice.
   * The first emitted bucket (empty flip set) is the query's own.
   */
  private[similarity] def probeSequence(dots: Array[Double], t: Int): Array[Int] =
    probeSequenceWithCosts(dots, t).map(_._2)

  /** [[probeSequence]] plus each bucket's total flip cost, so callers can
    * merge sequences from several tables into one global cheapest-first
    * order (see [[LshBuckets]]'s adaptive budget allocation). */
  private[similarity] def probeSequenceWithCosts(dots: Array[Double], t: Int): Array[(Double, Int)] = {
    val planes = dots.length
    var base = 0
    var p = 0
    while (p < planes) {
      base = (base << 1) | (if (dots(p) >= 0) 1 else 0)
      p += 1
    }
    val margins = dots.map(math.abs)
    val order = margins.zipWithIndex.sortBy(_._1).map(_._2)
    // heap entries: (total flip cost, flip set as indices into `order`,
    // ascending). extend/shift generation emits each subset exactly once.
    val heap = scala.collection.mutable.PriorityQueue.empty[(Double, List[Int])](
      Ordering.by[(Double, List[Int]), Double](_._1).reverse)
    heap.enqueue((0.0, Nil))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Int)]
    while (heap.nonEmpty && out.length < t) {
      val (cost, subset) = heap.dequeue()
      var b = base
      subset.foreach(oi => b ^= 1 << (planes - 1 - order(oi)))
      out += ((cost, b))
      val last = if (subset.isEmpty) -1 else subset.head
      if (last + 1 < planes) {
        // subset lists are kept newest-first so head is the max element
        heap.enqueue((cost + margins(order(last + 1)), (last + 1) :: subset))
        if (subset.nonEmpty) {
          heap.enqueue((cost - margins(order(last)) + margins(order(last + 1)),
            (last + 1) :: subset.tail))
        }
      }
    }
    out.toArray
  }

  /**
   * Bucket-pruned, deduped, cosine-scored candidate pairs — the pool
   * [[annTopK]] ranks, as (q_id, neighbor_id, cos). Exposed separately so
   * tests can measure pool sizes / scan fraction by counting directly
   * instead of ranking with a sentinel k (the top-k insert is O(k) per
   * element, so an effectively unbounded k degrades to O(n^2) per group).
   * The join key is `tb = table * 2^numPlanes + bucket`, so buckets from
   * different tables never collide.
   */
  /** The bucket-exploded probe and index frames the candidate join runs
    * over — (probes: q_id, ae, tb), (indexed: vec_id, be, tb), plus the
    * corpus (vec_id, e). Shared by [[candidates]] and [[collisionStats]]
    * so diagnostics measure exactly the shipped frames. */
  private def bucketFrames(
      s: SparkSession,
      dir: String,
      numProbes: Int,
      numPlanes: Int,
      numTables: Int,
      probesPerTable: Int,
      seed: Long,
      adaptive: Boolean,
      poolFrac: Double,
      quantized: Boolean = false): (DataFrame, DataFrame, DataFrame) = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x AS double)) AS e")
    val dim = emb.selectExpr("size(e)").first().getInt(0)
    val bc = s.sparkContext.broadcast(planes(numTables * numPlanes, dim, seed))
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // Corpus side: ONE bucket per table per row — index size L per vector.
    // Both assignments are codegen'd LshBuckets expressions (no ScalaUDF on
    // the index-build or probe-fanout path); probe side emits each table's
    // probesPerTable most-probable buckets in margin order (fixed per-table
    // quota — measured better than the adaptive global-budget merge, see
    // LshBuckets doc) — query-time fan-out only, the index is untouched.
    val indexBuckets = ColumnBridge.column(
      LshBuckets(ColumnBridge.expression(col("e")), bc, numTables, numPlanes, 1))
    // poolFrac > 0 switches the probe side to OCCUPANCY-BUDGETED probing:
    // one ids-only aggregation derives per-bucket occupancies (array sized
    // by the lattice — numTables * 2^numPlanes ints — NOT the corpus, so
    // the broadcast stays sub-MB at 100 TB; the aggregation itself is a
    // map-side-combined count over the same assignments the index pass
    // already computes, and the persisted-index path reads it from the
    // saved assignments instead, see AnnIndex.lshTopK). Each probe then
    // takes margin-ordered buckets merged across tables while their summed
    // occupancy fits ceil(poolFrac * corpusN) rows, making the id-only
    // pre-vote pool a HARD bound instead of an emergent number.
    val probeBuckets =
      if (poolFrac > 0) {
        val countRows = emb.select(explode(indexBuckets).as("tb"))
          .groupBy("tb").count().collect()
        // Long counts + Long budget: a >2^31-row bucket (or budget) would
        // wrap an Int and silently break the hard per-probe bound — the
        // guarantee only matters at exactly that scale.
        val counts = new Array[Long](numTables << numPlanes)
        var totalAssign = 0L
        countRows.foreach { r =>
          counts(r.getInt(0)) = r.getLong(1)
          totalAssign += r.getLong(1)
        }
        val corpusN = totalAssign / numTables
        val budget = math.max(1L, math.ceil(poolFrac * corpusN).toLong)
        val bcCounts = s.sparkContext.broadcast(counts)
        ColumnBridge.column(
          LshBuckets(ColumnBridge.expression(col("e")), bc, numTables, numPlanes,
            probesPerTable, adaptive, bcCounts, budget))
      } else ColumnBridge.column(
        LshBuckets(ColumnBridge.expression(col("e")), bc, numTables, numPlanes, probesPerTable,
          adaptive))
    // `quantized`: the carried vector narrows to int8 BEFORE the bucket
    // explode — Generate replicates the projected columns, so the
    // quantization runs once per vector, not once per (vector, bucket)
    // row — while BUCKETING stays on the raw doubles (the candidate pool,
    // and so every gated pool number, is byte-identical to the exact path;
    // only the scoring representation changes).
    val indexed = emb
      .select(col("vec_id"), vecOf(s, quantized, "e").as("be"), explode(indexBuckets).as("tb"))
    val probes = emb.filter(col("vec_id") < numProbes)
      .select(col("vec_id").as("q_id"), vecOf(s, quantized, "e").as("ae"),
        explode(probeBuckets).as("tb"))
    (probes, indexed, emb)
  }

  /** THE representation switch, in one place: the carried-vector column
    * for scoring — int8 (registering quantize_vec) or the raw doubles.
    * Used by [[bucketFrames]] and the voted branch's rehydration so the
    * two paths can never drift onto different representations. */
  private def vecOf(s: SparkSession, quantized: Boolean, c: String) =
    if (quantized) { graft.functions.QuantizeVec.register(s); expr(s"quantize_vec($c)") }
    else col(c)

  def candidates(
      s: SparkSession,
      dir: String,
      numProbes: Int = 5,
      numPlanes: Int = 14,
      numTables: Int = 16,
      probesPerTable: Int = 768,
      seed: Long = 7919L,
      adaptive: Boolean = false,
      minCollisions: Int = 2,
      poolFrac: Double = 0.0,
      quantized: Boolean = false): DataFrame = {
    val (probes, indexed, emb) = bucketFrames(s, dir, numProbes, numPlanes, numTables,
      probesPerTable, seed, adaptive, poolFrac, quantized)
    // `quantized` scores candidates on TRUE int8 vectors (QuantizeVec →
    // array<tinyint>, CosineSimilarityI8 on the bytes): bucketing and the
    // collision vote are UNCHANGED (same candidate pool, same pool
    // gates), only the carried vectors and the cosine kernel switch to
    // the 8x narrower representation — at 100 TB the candidate
    // rehydration join is the widest data movement in this plan.
    // Ranking degradation is measured in ModulesSpec (quantized-default
    // recall on both gated corpora), not guessed.
    val cosExpr =
      if (quantized) { graft.functions.CosineSimilarityI8.register(s)
        "cosine_similarity_i8(ae, be)" }
      else { graft.functions.CosineSimilarity.register(s)
        "cosine_similarity(ae, be)" }
    if (minCollisions <= 1) {
      // A neighbor sharing buckets in several tables/probes would be ranked
      // (and counted) more than once, so pairs are deduped — AFTER scoring,
      // not before: the cosine is a cheap codegen'd map-side expression, and
      // scoring first means the dedup exchange shuffles (q_id, neighbor_id,
      // cos) rows instead of dragging both full embedding vectors through it
      // (at dim=1024 that's a ~100x lighter shuffle; every duplicate scores
      // the same pair, so the kept row is identical either way).
      broadcast(probes)
        .join(indexed, Seq("tb"))
        .filter(col("vec_id") =!= col("q_id"))
        .selectExpr("q_id", "vec_id AS neighbor_id", s"$cosExpr AS cos")
        .dropDuplicates("q_id", "neighbor_id")
    } else {
      val probeVecs = emb.filter(col("vec_id") < numProbes)
      scoreVoted(probes.select("q_id", "tb"), indexed.select(col("vec_id"), col("tb")),
        probeVecs.select(col("vec_id").as("q_id"), vecOf(s, quantized, "e").as("ae")),
        emb.select(col("vec_id"), vecOf(s, quantized, "e").as("be")),
        minCollisions, cosExpr)
    }
  }

  /**
   * Diagnostic surface for the gates: the vote's INPUT (q_id, vec_id,
   * n_hits) at the given knobs, over exactly the frames [[candidates]]
   * joins. `sum(n_hits)` is the MULTIPLICITY pool — the rows the bucket
   * join emits into the counting aggregate, i.e. the true id-only
   * shuffle/aggregation cost the scan fraction excludes; `count(*)` is
   * the DISTINCT pool RECALL.jsonl has always carried. Both are gated
   * (ModulesSpec) so neither can silently regress.
   */
  def collisionStats(
      s: SparkSession,
      dir: String,
      numProbes: Int = 5,
      numPlanes: Int = 14,
      numTables: Int = 16,
      probesPerTable: Int = 768,
      seed: Long = 7919L,
      adaptive: Boolean = false,
      poolFrac: Double = 0.0): DataFrame = {
    val (probes, indexed, _) = bucketFrames(s, dir, numProbes, numPlanes, numTables,
      probesPerTable, seed, adaptive, poolFrac)
    collisionCounts(probes.select("q_id", "tb"), indexed.select(col("vec_id"), col("tb")))
  }

  /**
   * COLLISION VOTING: count bucket co-occurrences per (probe, vector)
   * pair FIRST — ids only, no vectors through the shuffle — and score
   * only pairs colliding in >= minCollisions probed buckets. A true
   * neighbor multi-collides (its per-table collision probabilities
   * compound); a background vector that stumbled into one probed
   * bucket usually stops there, so the vote filter drops a large slice
   * of the candidate pool while costing only the neighbors that
   * collided exactly once. This trades a second (cheap, id-only)
   * aggregation for fewer distance computations — the right trade
   * whenever the vectors are wide. Vectors are rehydrated afterwards:
   * probes from a broadcast (numProbes rows), candidates from a hash
   * join against the corpus that scales with the filtered pool.
   * Shared by the live path above and [[AnnIndex.lshTopK]]'s loaded
   * (tb, vec_id) assignments, so persisted-index voting is the same plan.
   */
  /** The pre-threshold collision counts (q_id, vec_id, n_hits) — the
    * id-only aggregation [[scoreVoted]] filters. Exposed so the gates can
    * measure BOTH pool numbers the scan fraction excludes: sum(n_hits) is
    * the MULTIPLICITY pool (the rows the bucket join actually emits into
    * the counting aggregate — the true shuffle/aggregation cost at scale),
    * count(*) the DISTINCT pool (unique candidate pairs). */
  private[similarity] def collisionCounts(
      probeIds: DataFrame, indexIds: DataFrame): DataFrame =
    broadcast(probeIds)
      .join(indexIds, Seq("tb"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id").agg(count(lit(1)).as("n_hits"))

  private[similarity] def scoreVoted(
      probeIds: DataFrame,   // (q_id, tb)
      indexIds: DataFrame,   // (vec_id, tb)
      probeVecs: DataFrame,  // (q_id, ae)
      corpusVecs: DataFrame, // (vec_id, be)
      minCollisions: Int,
      cosExpr: String = "cosine_similarity(ae, be)"): DataFrame = {
    val hits = collisionCounts(probeIds, indexIds)
      .filter(col("n_hits") >= minCollisions)
    hits
      .join(broadcast(probeVecs), Seq("q_id"))
      .join(corpusVecs, Seq("vec_id"))
      .selectExpr("q_id", "vec_id AS neighbor_id", s"$cosExpr AS cos")
  }

  /**
   * Multi-table, multiprobe bucket-pruned top-k cosine neighbors for the
   * probe vectors (vec_id < numProbes). Returns (q_id, neighbor_id,
   * cosine, rn).
   */
  def annTopK(
      s: SparkSession,
      dir: String,
      numProbes: Int = 5,
      k: Int = 5,
      numPlanes: Int = 14,
      numTables: Int = 16,
      probesPerTable: Int = 768,
      seed: Long = 7919L,
      adaptive: Boolean = false,
      minCollisions: Int = 2,
      poolFrac: Double = 0.0,
      quantized: Boolean = false): DataFrame = {
    val scored = candidates(s, dir, numProbes, numPlanes, numTables, probesPerTable, seed,
      adaptive, minCollisions, poolFrac, quantized)
    // Bounded top-k aggregation (not a rank window): candidates are already
    // bucket-pruned, but the final rank must not funnel them into #probes
    // sort tasks either — TopKPerKey keeps <= k per (partition, probe).
    graft.plans.TopKPerKey.topK(scored, "q_id", "cos", "neighbor_id", k, "cosine")
      .orderBy(col("q_id"), col("rn"))
  }
}
