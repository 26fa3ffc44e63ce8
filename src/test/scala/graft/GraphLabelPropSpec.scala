package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r22 driver-side label-propagation loop (q132/q152) against
  * the distributed min_by form it replaced — row-identical output on the
  * real corpus backbone AND on a tie-heavy fixture that exercises the
  * (cnt desc, label asc) argmax and the seed clamp. */
class GraphLabelPropSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark

  /** The r21 distributed form, verbatim — the reference semantics. */
  private def referenceLp(s: SparkSession, dir: String,
      backbone: DataFrame): DataFrame = {
    val edges = Caches.persist(backbone)
    val dirEdges = Caches.persist(
      edges.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(edges.select(col("b").as("src"), col("a").as("dst"))))
    val nodes = dirEdges.select(col("src").as("node")).distinct()
    val brands = Tables.t(s, dir, "part")
      .select(col("p_partkey").as("node"), col("p_brand"))
    var lab = nodes.join(broadcast(brands), Seq("node"))
      .select(col("node"),
        (col("node") % 5 === 0).as("is_seed"),
        when(col("node") % 5 === 0, col("p_brand")).as("label"))
    for (_ <- 1 to 3) {
      val votes = dirEdges
        .join(broadcast(lab.where(col("label").isNotNull)
          .select(col("node").as("voter"), col("label"))),
          col("src") === col("voter"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("cnt"))
      val best = votes.groupBy(col("dst"))
        .agg(min_by(col("label"),
          struct((col("cnt") * -1).as("nc"), col("label"))).as("new_label"))
        .select(col("dst").as("node"), col("new_label"))
      lab = Caches.persist(lab.join(best, Seq("node"), "left")
        .select(col("node"), col("is_seed"),
          when(col("is_seed"), col("label"))
            .otherwise(coalesce(col("new_label"), col("label"))).as("label")))
    }
    lab.groupBy(coalesce(col("label"), lit("unlabeled")).as("label"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(when(col("is_seed"), 1L).otherwise(0L)).as("n_seeds"))
      .orderBy(col("label"))
  }

  private def compare(backbone: DataFrame, dir: String): Unit = {
    val got = Graph.labelPropOver(spark, dir, backbone).collect().toSeq
    val want = referenceLp(spark, dir, backbone).collect().toSeq
    Caches.releaseAll()
    assert(got == want)
  }

  test("driver loop equals the distributed form on the real backbone") {
    val dir = "/root/testdata/sf0.001"
    compare(Graph.coPurchaseBackbone(spark, dir), dir)
  }

  test("driver loop equals the distributed form on a tie-heavy fixture") {
    val dir = "/root/testdata/sf0.001"
    import spark.implicits._
    // real part keys so the brand join behaves identically in both forms
    val keys = Tables.t(spark, dir, "part")
      .select(col("p_partkey")).orderBy(col("p_partkey"))
      .limit(40).collect().map(_.getLong(0))
    assert(keys.length >= 40, "fixture needs 40 part keys")
    val seeds = keys.filter(_ % 5 == 0)
    val others = keys.filterNot(_ % 5 == 0)
    // every non-seed touches TWO seeds (vote ties — label asc decides)
    // and a chain through other non-seeds (multi-round propagation)
    val ties = others.flatMap(o =>
      Seq((o, seeds(0)), (o, seeds(1 % seeds.length))))
    val chain = others.sliding(2).collect { case Array(x, y) => (x, y) }.toSeq
    val edges = (ties ++ chain).map { case (a, b) =>
      if (a < b) (a, b) else (b, a)
    }.distinct.toSeq.toDF("a", "b")
    compare(edges, dir)
  }
}
