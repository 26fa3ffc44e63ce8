package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Backbone-cut sensitivity grid for the graph operators (TUNE_r15):
 * q128/q132 declare `backboneM = 10000` as their contract — the top-M
 * co-purchase edges bound every downstream stage. This harness measures
 * how the cut moves the RESULT and the COST across M ∈ {1k, 10k, 100k}:
 *
 *  - edges actually cut (the corpus may have fewer than M);
 *  - total triangles on the backbone and the q128 top-20 participation
 *    list's overlap with the shipped M=10k list (result stability);
 *  - wall time of the full q128 computation at that M (cost knee).
 *
 * Not part of the query surface — run with
 * `sbt "runMain graft.tools.GraphTune"` (SPARK_GRAFT_SF_DIR selects the
 * corpus, default sf0.001).
 */
object GraphTune {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Graph

    def top20At(m: Int): (Seq[Long], Long, Long, Long) = {
      val t0 = System.nanoTime()
      val edges = graft.queries.Caches.persist(
        Graph.coPurchaseBackbone(spark, dir, m))
      val nEdges = edges.count()
      val tri = graft.queries.Caches.persist(Graph.trianglesOf(edges))
      val nTri = tri.count()
      val top = tri.selectExpr("explode(array(x, y, z)) AS p")
        .groupBy(col("p")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("p")).limit(20)
        .collect().map(_.getLong(0)).toSeq
      val ms = (System.nanoTime() - t0) / 1000000
      graft.queries.Caches.releaseAll()
      (top, nEdges, nTri, ms)
    }

    val (shipTop, _, _, _) = top20At(10000)
    for (m <- Seq(1000, 10000, 100000)) {
      val (top, nEdges, nTri, ms) = top20At(m)
      val overlap = top.toSet.intersect(shipTop.toSet).size
      println(f"backbone M=$m%-7d edges=$nEdges%-7d triangles=$nTri%-8d " +
        f"top20overlapVsShipped=$overlap%2d/20 wall=${ms}ms")
    }
    spark.stop()
  }
}
