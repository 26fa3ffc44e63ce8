package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.{Caches, Clustering, Tables}

/**
 * The verified-ML family (q207-q210): the oracles pin cross-engine
 * equality; these cases pin the structural invariants and plan shapes
 * a refactor could silently lose.
 */
class ClusteringSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("k-means: cluster sizes partition the corpus; k clusters survive") {
    val out = Caches.scoped(Clustering.kmeans(spark, sf).collect().toSeq)
    val n = Tables.t(spark, sf, "embeddings").count()
    assert(out.map(_.getLong(1)).sum == n, "members do not partition the corpus")
    assert(out.size == 4, s"expected 4 clusters, got ${out.size}")
    assert(out.forall(_.getLong(1) > 0), "an empty cluster survived")
  }

  test("perceptron: training reduces error from the all-wrong start") {
    val ledger = Caches.scoped(Clustering.perceptron(spark, sf).collect().toSeq)
    val n = Tables.t(spark, sf, "embeddings").count()
    assert(ledger.head.getLong(1) == n,
      "round 1 under w=0 must misclassify everything (margin 0)")
    assert(ledger.last.getLong(1) < n / 2,
      s"no learning signal: ${ledger.map(_.getLong(1)).mkString(",")}")
  }

  test("knn: confusion matrix covers the held-out slice exactly") {
    val cm = Caches.scoped(Clustering.knnClassify(spark, sf).collect().toSeq)
    val nTest = Tables.t(spark, sf, "embeddings").where("vec_id % 10 >= 8").count()
    assert(cm.map(_.getLong(2)).sum == nTest,
      "confusion matrix does not partition the eval set")
    // NO accuracy floor: the generator's labels are INDEPENDENT of the
    // embeddings (measured: top-3 cosine neighbors share the label 8.8%
    // of the time ≈ the 10-class chance rate), so chance-level accuracy
    // is the data's ceiling, not a pipeline bug. The oracle pins that
    // every cell — whatever the data offers — is computed identically
    // cross-engine.
    assert(cm.forall(_.getLong(2) > 0))
  }

  test("dbscan: roles partition the slice; noise row present") {
    val out = Caches.scoped(Clustering.dbscan(spark, sf).collect().toSeq)
    val slice = Tables.t(spark, sf, "embeddings").where("vec_id % 5 = 0").count()
    assert(out.map(r => r.getLong(1) + r.getLong(2)).sum == slice,
      "core+border+noise do not partition the slice")
    assert(out.exists(_.getLong(0) == -1L), "noise row missing")
    assert(out.count(_.getLong(0) >= 0) > 1, "density structure collapsed to one cluster")
  }

  test("knn/kmeans plan shapes: broadcast small sides, no nested-loop join") {
    for (df <- Seq(Clustering.kmeans(spark, sf), Clustering.knnClassify(spark, sf))) {
      val p = Caches.scoped(df.queryExecution.executedPlan.toString)
      assert(!p.contains("BroadcastNestedLoopJoin") || !p.contains("SortMergeJoin"),
        s"clustering read grew an unbounded join:\n$p")
      assert(!p.contains("ScalaUDF"), s"clustering regressed to a ScalaUDF:\n$p")
    }
    Caches.releaseAll()
  }
}
