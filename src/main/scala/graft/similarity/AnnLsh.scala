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
 * multiply), and MULTIPROBE on the query side — each probe also searches
 * the `numPlanes` buckets at Hamming distance 1 from its own (flip one
 * sign bit), which behaves like (1+numPlanes) extra tables at no extra
 * index cost (the multiprobe idea from Lv et al., VLDB'07, as used in
 * FAISS/E2LSH). Only probes fan out; corpus rows still index into one
 * bucket per table, so the index stays L rows per vector and the scanned
 * fraction is bounded by L*(1+numPlanes)/2^numPlanes of the corpus.
 * The knob trio (numPlanes, numTables, multiprobe) trades scan cost for
 * recall; measured recall@k against the brute-force baseline is gated in
 * ModulesSpec.
 *
 * The hyperplanes are seeded and broadcast; bucketing is a UDF over the
 * embedding array but runs once per (row, table), not once per pair.
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

  private[similarity] def bucketOf(vec: Seq[Double], ps: Array[Array[Double]],
      from: Int, len: Int): Int = {
    var b = 0
    var p = from
    while (p < from + len) {
      var dot = 0.0
      val plane = ps(p)
      var i = 0
      while (i < plane.length && i < vec.length) {
        dot += plane(i) * vec(i)
        i += 1
      }
      b = (b << 1) | (if (dot >= 0) 1 else 0)
      p += 1
    }
    b
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
  def candidates(
      s: SparkSession,
      dir: String,
      numProbes: Int = 5,
      numPlanes: Int = 6,
      numTables: Int = 3,
      multiprobe: Boolean = true,
      seed: Long = 7919L): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x AS double)) AS e")
    val dim = emb.selectExpr("size(e)").first().getInt(0)
    val bc = s.sparkContext.broadcast(planes(numTables * numPlanes, dim, seed))
    val tableSpan = 1 << numPlanes
    // Corpus side: ONE bucket per table per row — index size L per vector.
    val indexBucketsUdf = udf { e: Seq[Double] =>
      Array.tabulate(numTables)(t =>
        t * tableSpan + bucketOf(e, bc.value, t * numPlanes, numPlanes))
    }
    // Probe side: own bucket plus (if multiprobe) the numPlanes buckets at
    // Hamming distance 1 — query-time fan-out only, the index is untouched.
    val probeBucketsUdf = udf { e: Seq[Double] =>
      (0 until numTables).flatMap { t =>
        val b = bucketOf(e, bc.value, t * numPlanes, numPlanes)
        val base = t * tableSpan
        val flips = if (multiprobe) (0 until numPlanes).map(j => base + (b ^ (1 << j)))
          else Seq.empty
        (base + b) +: flips
      }.toArray
    }
    graft.functions.CosineSimilarity.register(s)
    val indexed = emb
      .select(col("vec_id"), col("e").as("be"), explode(indexBucketsUdf(col("e"))).as("tb"))
    val probes = emb.filter(col("vec_id") < numProbes)
      .select(col("vec_id").as("q_id"), col("e").as("ae"),
        explode(probeBucketsUdf(col("e"))).as("tb"))
    val cos = "cosine_similarity(ae, be)"
    // A neighbor sharing buckets in several tables/probes would be ranked
    // (and counted) more than once; candidate pairs are deduped BEFORE
    // scoring so the cosine runs once per surviving pair.
    val cand = broadcast(probes)
      .join(indexed, Seq("tb"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("ae"), col("vec_id"), col("be"))
      .dropDuplicates("q_id", "vec_id")
    cand.selectExpr("q_id", "vec_id AS neighbor_id", s"$cos AS cos")
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
      numPlanes: Int = 6,
      numTables: Int = 3,
      multiprobe: Boolean = true,
      seed: Long = 7919L): DataFrame = {
    val scored = candidates(s, dir, numProbes, numPlanes, numTables, multiprobe, seed)
    // Bounded top-k aggregation (not a rank window): candidates are already
    // bucket-pruned, but the final rank must not funnel them into #probes
    // sort tasks either — TopKPerKey keeps <= k per (partition, probe).
    graft.plans.TopKPerKey.topK(scored, "q_id", "cos", "neighbor_id", k, "cosine")
      .orderBy(col("q_id"), col("rn"))
  }
}
