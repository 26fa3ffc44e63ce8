package graft.similarity

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate nearest neighbors via random-hyperplane (sign) LSH.
 *
 * Scale path for similarity search: instead of scoring every probe against
 * every vector (q28's brute-force baseline), vectors are bucketed by the
 * sign pattern of `numPlanes` random hyperplane projections, and probes
 * only score against their own bucket — an IVF-style candidate prune that
 * cuts the scan by ~2^numPlanes at the cost of recall near bucket borders
 * (mitigated in practice by multiple tables; one table here).
 *
 * The hyperplanes are seeded and broadcast; bucketing is a codegen-free UDF
 * over the embedding array but runs once per row, not once per pair.
 * Not SQL-expressible cross-engine (gaussian planes), so the driver records
 * the rows-only check for this query; correctness against brute force is
 * asserted in AnnLshSpec instead.
 */
object AnnLsh {

  /** Deterministic gaussian hyperplanes. */
  private[similarity] def planes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rng = new Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  private[similarity] def bucketOf(vec: Seq[Double], ps: Array[Array[Double]]): Int = {
    var b = 0
    var p = 0
    while (p < ps.length) {
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
   * Bucket-pruned top-k cosine neighbors for the probe vectors
   * (vec_id < numProbes). Returns (q_id, neighbor_id, cosine, rn).
   */
  def annTopK(
      s: SparkSession,
      dir: String,
      numProbes: Int = 5,
      k: Int = 5,
      numPlanes: Int = 6,
      seed: Long = 7919L): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x AS double)) AS e")
    val dim = emb.selectExpr("size(e)").first().getInt(0)
    val bc = s.sparkContext.broadcast(planes(numPlanes, dim, seed))
    val bucketUdf = udf { e: Seq[Double] => bucketOf(e, bc.value) }
    graft.functions.CosineSimilarity.register(s)
    val bucketed = emb.withColumn("bucket", bucketUdf(col("e")))
    val probes = bucketed.filter(col("vec_id") < numProbes)
      .select(col("vec_id").as("q_id"), col("e").as("ae"), col("bucket"))
    val cos = "cosine_similarity(ae, be)"
    broadcast(probes)
      .join(bucketed.select(col("vec_id"), col("e").as("be"), col("bucket")),
        Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id AS neighbor_id", s"$cos AS cos")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("neighbor_id"), round(col("cos"), 4).as("cosine"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }
}
