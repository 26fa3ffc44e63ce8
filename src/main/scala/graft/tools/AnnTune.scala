package graft.tools

import org.apache.spark.sql.SparkSession

import graft.similarity.{AnnIvf, AnnLsh}

/**
 * Offline knob sweep for the ANN operating point: prints mean recall@5 and
 * scan fraction for a grid of LSH/IVF knobs against driver-side exhaustive
 * top-k. Not part of the query surface — run with
 * `sbt "runMain graft.tools.AnnTune [lsh|ivf]"`.
 */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("both")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val nProbes = 25
    val k = 5
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x AS double)) AS e")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val total = emb.size
    def cosineOf(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val brute = (0 until nProbes).map { q =>
      val qv = emb(q.toLong)
      q.toLong -> emb.view.filter(_._1 != q.toLong)
        .map { case (id, v) => (cosineOf(qv, v), id) }
        .toSeq.sortBy { case (c, id) => (-c, id) }.take(k).map(_._2).toSet
    }.toMap

    def evalOne(label: String, cands: org.apache.spark.sql.DataFrame,
        top: org.apache.spark.sql.DataFrame): Unit = {
      val scanned = cands.groupBy("q_id").count().collect().map(_.getLong(1)).sum
      val frac = scanned.toDouble / (nProbes.toLong * total)
      val ann = top.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
      val recall = (0 until nProbes).map(q =>
        ann.getOrElse(q.toLong, Set.empty[Long]).intersect(brute(q.toLong)).size.toDouble / k
      ).sum / nProbes
      println(f"$label%-46s recall@$k=$recall%.3f scan=$frac%.3f")
    }

    if (which == "lsh" || which == "both") {
      // r7 shipped point for reference, then the grid — each point under
      // BOTH probe-budget allocations (fixed per-table quota vs adaptive
      // global merge), settling the r7 dominance claim by measurement.
      for {
        (planes, tables, probes) <- Seq((8, 5, 28)) ++ (for {
          p <- Seq(10, 12); t <- Seq(4, 6, 8); pr <- Seq(32, 48, 64, 96, 128)
        } yield (p, t, pr))
        adaptive <- Seq(false, true)
      } evalOne(s"lsh planes=$planes tables=$tables probes=$probes adaptive=$adaptive",
        AnnLsh.candidates(spark, dir, nProbes, planes, tables, probes, adaptive = adaptive),
        AnnLsh.annTopK(spark, dir, nProbes, k, planes, tables, probes, adaptive = adaptive))
    }
    if (which == "vote" || which == "both") {
      // Collision-voting variant: high-recall knobs + a >=2-collision
      // filter on the scored pool — recall from wide probing, scan cost
      // from the vote filter.
      for {
        (planes, tables, probes, minC) <- Seq(
          (10, 10, 128, 3), (10, 10, 160, 3), (10, 10, 192, 3),
          (10, 12, 128, 3), (10, 12, 160, 3), (10, 12, 160, 4), (10, 12, 192, 4),
          (10, 8, 112, 2), (10, 9, 112, 2))
      } evalOne(s"lsh planes=$planes tables=$tables probes=$probes minC=$minC",
        AnnLsh.candidates(spark, dir, nProbes, planes, tables, probes, minCollisions = minC),
        AnnLsh.annTopK(spark, dir, nProbes, k, planes, tables, probes, minCollisions = minC))
    }
    if (which == "ivf" || which == "both") {
      for {
        nlist <- Seq(128, 192, 256)
        nprobe <- Seq(26, 28, 32, 40, 48)
      } evalOne(s"ivf nlist=$nlist nprobe=$nprobe",
        AnnIvf.candidates(spark, dir, nProbes, nlist, nprobe),
        AnnIvf.annTopK(spark, dir, nProbes, k, nlist, nprobe))
    }
    spark.stop()
  }
}
