package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * IVF-style approximate nearest neighbors: a k-means coarse quantizer
 * (`nlist` centroids) partitions the vectors into inverted lists; each
 * probe scores only the lists of its `nprobe` nearest centroids.
 *
 * This is the second scale path for similarity search next to
 * [[AnnLsh]]'s random-hyperplane buckets: the quantizer adapts to the
 * data distribution (bucket sizes follow density), at the cost of a
 * training pass. Candidate count per probe ~ nprobe/nlist of the corpus.
 *
 * The k-means fit is seeded but engine-specific, so (like AnnLsh) this is
 * a rows-only query for the driver; AnnIvfSpec asserts cosine
 * correctness, rank order, and pruning against brute force.
 */
object AnnIvf {

  def annTopK(
      s: SparkSession,
      dir: String,
      numProbes: Int = 5,
      k: Int = 5,
      nlist: Int = 16,
      nprobe: Int = 2,
      seed: Long = 4099L): DataFrame = {
    graft.functions.CosineSimilarity.register(s)
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x AS double)) AS e")
      .withColumn("fv", array_to_vector(col("e")))
    val km = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("fv").setPredictionCol("list_id")
    val model = km.fit(emb)
    val assigned = model.transform(emb).select(col("vec_id"), col("e"), col("list_id"))

    // nprobe nearest centroids per probe vector, via the broadcast
    // centroid array (nlist x dim doubles - tiny)
    val centroids = model.clusterCenters.map(_.toArray)
    val bc = s.sparkContext.broadcast(centroids)
    val probeLists = udf { e: Seq[Double] =>
      bc.value.zipWithIndex.map { case (c, i) =>
        var d = 0.0
        var j = 0
        while (j < c.length && j < e.length) {
          val diff = c(j) - e(j); d += diff * diff; j += 1
        }
        (d, i)
      }.sortBy(_._1).take(nprobe).map(_._2)
    }
    val probes = assigned.filter(col("vec_id") < numProbes)
      .select(col("vec_id").as("q_id"), col("e").as("ae"),
        explode(probeLists(col("e"))).as("list_id"))

    broadcast(probes)
      .join(assigned.select(col("vec_id"), col("e").as("be"), col("list_id")), Seq("list_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id AS neighbor_id", "cosine_similarity(ae, be) AS cos")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("neighbor_id"), round(col("cos"), 4).as("cosine"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }
}
