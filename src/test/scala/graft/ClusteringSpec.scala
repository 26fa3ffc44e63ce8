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

  test("knn: confusion matrix covers the bounded eval set exactly") {
    val cm = Caches.scoped(Clustering.knnClassify(spark, sf).collect().toSeq)
    // the eval side is the evalN md5-smallest held-out rows — a
    // CONSTANT bound, never a corpus fraction
    val heldOut = Tables.t(spark, sf, "embeddings").where("vec_id % 10 >= 8").count()
    val nTest = math.min(Clustering.evalN.toLong, heldOut)
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

  test("knn-ann: bucket-pruned candidates plan as an equi-join; matrix stays inside the eval set") {
    val df = Clustering.knnAnnClassify(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // candidate generation is a hash EQUI-join on the fixed-hyperplane
    // bucket — never the brute nested-loop sweep
    assert(p.contains("BroadcastHashJoin") && !p.contains("BroadcastNestedLoopJoin"),
      s"ann-knn candidates regressed to a nested-loop sweep:\n$p")
    val cm = Caches.scoped(df.collect().toSeq)
    val heldOut = Tables.t(spark, sf, "embeddings").where("vec_id % 10 >= 8").count()
    val covered = cm.map(_.getLong(2)).sum
    // ≤: a query whose bucket holds no training row drops from the
    // matrix (the oracle computes the same approximation)
    assert(covered > 0 && covered <= math.min(Clustering.evalN.toLong, heldOut),
      s"ann-knn matrix covers $covered of $heldOut")
    Caches.releaseAll()
  }

  test("knn eval side is constant-bounded: a TakeOrdered limit feeds the broadcast") {
    val p = Caches.scoped(
      Clustering.knnClassify(spark, sf).queryExecution.executedPlan.toString)
    // the md5-rank limit plans as TakeOrderedAndProject — the marker
    // that the broadcast side is evalN-bounded, not a corpus fraction
    assert(p.contains("TakeOrderedAndProject"),
      s"knn eval side lost its constant bound:\n$p")
    Caches.releaseAll()
  }

  test("dbscan neighbor pass: grid candidates ⊇ true eps-neighborhood (planted clusters)") {
    import spark.implicits._
    val eps = 100L // cell side = 10
    // two tight planted clusters + a cell-boundary straddler (negative
    // cell coordinate, adjacent-cell match) + an isolated point
    val pts: Seq[(Long, Seq[Long])] = Seq(
      (0L, Seq(0L, 0L, 0L, 0L)),
      (1L, Seq(3L, 4L, 0L, 0L)),
      (2L, Seq(-3L, 2L, 1L, 0L)),
      (3L, Seq(6L, -8L, 0L, 0L)), // home cell (0,-1): only ±1 adjacency finds its edge to 0
      (4L, Seq(100L, 100L, 0L, 0L)),
      (5L, Seq(103L, 98L, 2L, 1L)),
      (6L, Seq(50L, -50L, 30L, 0L))
    )
    val se = pts.toDF("vec_id", "e")
    val got = Clustering.epsNeighbors(se, eps).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      (i, a) <- pts; (j, b) <- pts if i != j
      if a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum <= eps
    } yield (i, j)).toSet
    assert(brute.nonEmpty && brute.contains((0L, 3L)),
      "planted data lost its boundary-straddling edge — test is vacuous")
    assert(got == brute,
      s"grid-blocked edges diverge from brute force: missing ${brute -- got}, extra ${got -- brute}")
    // ... AND the grid genuinely PRUNES on clustered data (the 100 TB
    // claim): cross-cluster pairs never become candidates, so the
    // candidate count is well below all n·(n−1) ordered pairs
    val nCand = Clustering.gridCandidates(se, eps).count()
    val allPairs = pts.size.toLong * (pts.size - 1)
    assert(nCand < allPairs / 2,
      s"grid pruned nothing on planted clusters: $nCand of $allPairs pairs")
    assert(nCand >= brute.size, "candidate set smaller than the edge set")
  }

  test("dbscan hot-cell salting: planted hot cell splits into capped shards; candidate set identical") {
    import spark.implicits._
    val eps = 100L // cell side = 10
    val cap = 50L
    // 400 rows piled into ONE cell (the isotropic worst case) + a cold
    // cluster that must stay un-salted
    val hotPts = (0L until 400L).map(i =>
      (i, Seq(i % 7, (i * 3) % 7, 0L, 0L)))
    val coldPts = (400L until 420L).map(i =>
      (i, Seq(1000L + i % 5, 1000L, 0L, 0L)))
    val se = (hotPts ++ coldPts).toDF("vec_id", "e")
    val salted = Clustering.gridCandidates(se, eps, maxCellRows = cap)
    val unsalted = Clustering.gridCandidates(se, eps,
      maxCellRows = Long.MaxValue)
    // salting must be INVISIBLE to the candidate set: same pairs, each
    // meeting exactly once (at v's home cell and v's single shard)
    val sp = salted.select("u", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(sp.length == sp.toSet.size, "salting duplicated a candidate pair")
    val up = unsalted.select("u", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sp.toSet == up, "salting changed the candidate set")
    // the un-salted worst join key is genuinely hot (non-vacuous)...
    val unsaltedMax = unsalted.groupBy("k0", "k1", "salt")
      .agg(countDistinct(col("v")).as("nb"))
      .collect().map(_.getLong(3)).max
    assert(unsaltedMax > cap,
      s"planted hot cell wasn't hot ($unsaltedMax home rows) — vacuous")
    // ...and after salting NO shuffle key holds more home-side rows
    // than the cap allows (hash shards balance statistically; 2× slack)
    val saltedMax = salted.groupBy("k0", "k1", "salt")
      .agg(countDistinct(col("v")).as("nb"))
      .collect().map(_.getLong(3)).max
    assert(saltedMax <= 2 * cap,
      s"a salted shard still holds $saltedMax home rows (cap $cap)")
  }

  test("ann recall audit: histogram covers the whole eval set; overlap bounded by k") {
    val rows = Caches.scoped(
      Clustering.annRecallAudit(spark, sf).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1))))
    assert(rows.nonEmpty, "empty recall histogram")
    assert(rows.forall { case (o, _) => o >= 0 && o <= 5 },
      s"overlap outside 0..5: $rows")
    // every eval query lands in exactly one bucket — bucket-starved
    // queries included (the left join's zero row), so the histogram
    // total equals the eval slice size, never less
    val evalSize = Caches.scoped(
      graft.queries.Tables.t(spark, sf, "embeddings")
        .where("vec_id % 10 >= 8").limit(Clustering.evalN).count())
    assert(rows.map(_._2).sum == math.min(evalSize, Clustering.evalN),
      s"histogram dropped queries: ${rows.map(_._2).sum} of $evalSize")
    Caches.releaseAll()
  }

  test("ivf recall audit: histogram covers the whole eval set; probing half the lists finds neighbors") {
    val rows = Caches.scoped(
      Clustering.ivfRecallAudit(spark, sf).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1))))
    assert(rows.nonEmpty, "empty ivf recall histogram")
    assert(rows.forall { case (o, _) => o >= 0 && o <= 5 },
      s"overlap outside 0..5: $rows")
    val evalSize = Caches.scoped(
      graft.queries.Tables.t(spark, sf, "embeddings")
        .where("vec_id % 10 >= 8").limit(Clustering.evalN).count())
    assert(rows.map(_._2).sum == math.min(evalSize, Clustering.evalN),
      s"histogram dropped queries: ${rows.map(_._2).sum} of $evalSize")
    // nprobe = 2 of 4 lists walks ~half the corpus — the audit is
    // meaningless if the probed lists never contain a true neighbor
    val hits = rows.collect { case (o, n) if o > 0 => o * n }.sum
    assert(hits > 0, s"ivf probes found zero true neighbors: $rows")
    Caches.releaseAll()
  }

  test("pq + ivfpq recall audits: full eval coverage, quantization finds true neighbors") {
    val evalSize = Caches.scoped(
      graft.queries.Tables.t(spark, sf, "embeddings")
        .where("vec_id % 10 >= 8").limit(Clustering.evalN).count())
    for ((name, df) <- Seq(
        "pq" -> Clustering.pqRecallAudit(spark, sf),
        "ivfpq" -> Clustering.ivfPqRecallAudit(spark, sf))) {
      val rows = Caches.scoped(df.collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1))))
      assert(rows.nonEmpty, s"empty $name recall histogram")
      assert(rows.forall { case (o, _) => o >= 0 && o <= 5 },
        s"$name overlap outside 0..5: $rows")
      assert(rows.map(_._2).sum == math.min(evalSize, Clustering.evalN),
        s"$name histogram dropped queries: ${rows.map(_._2).sum} of $evalSize")
      // 4 subspaces × 4 codes is a coarse quantizer by design (the
      // oracle trade) — but the audit is meaningless if reconstruction
      // ranking never surfaces a single true neighbor
      val hits = rows.collect { case (o, n) if o > 0 => o * n }.sum
      assert(hits > 0, s"$name quantized ranking found zero true neighbors: $rows")
      Caches.releaseAll()
    }
  }

  test("dbscan neighbor pass plans as an equi-join: no cartesian, no corpus broadcast-NL") {
    val nb = Clustering.epsNeighbors(
      Clustering.dbscanSlice(spark, sf), Clustering.dbscanEps)
    val p = Caches.scoped(nb.queryExecution.executedPlan.toString)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"neighbor pass regressed to an all-pairs product:\n$p")
    Caches.releaseAll()
  }

  test("sem-dedup: drop set == the planted near-dups, and == the unblocked brute-force verdicts") {
    val m = Caches.persist(Clustering.semClustered(spark, sf))
    val dropped = Clustering.semDupDropped(m)
      .collect().map(_.getLong(0)).toSet
    // the planted rows (orig % 53 == 0, re-entered at id+1e9) are the
    // ONLY sub-τ pairs on this isotropic corpus — each has its original
    // at a smaller id in the same cluster (identical-to-±1000 vectors
    // share an argmin), so the drop set is exactly the planted ids
    val planted = Tables.t(spark, sf, "embeddings")
      .where("vec_id % 53 = 0").collect()
      .map(_.getAs[Long]("vec_id") + 1000000000L).toSet
    assert(dropped == planted,
      s"drop set diverged: extra=${dropped -- planted}, missed=${planted -- dropped}")
    // blocking honesty: on THIS corpus the cluster blocking loses no
    // pair the unblocked all-pairs rule would catch (cross-cluster
    // near-dups are the method's priced miss; here there are none)
    val bf = m.select(col("vec_id").as("v"), col("e").as("eb"))
      .crossJoin(m.select(col("vec_id").as("u"), col("e").as("ea")))
      .where(col("u") < col("v"))
      .where(expr("aggregate(zip_with(ea, eb, (x, y) -> (x - y) * (x - y)), 0L, (acc, z) -> acc + z)")
        <= Clustering.semDupTau)
      .select(col("v")).distinct().collect().map(_.getLong(0)).toSet
    assert(dropped == bf, "cluster blocking dropped a pair brute force finds on this corpus")
    Caches.releaseAll()
  }

  test("sem-dedup pair pass plans as a cid equi-join: no cartesian, no broadcast-NL") {
    val m = Caches.persist(Clustering.semClustered(spark, sf))
    val p = Clustering.semDupDropped(m).queryExecution.executedPlan.toString
    // scope the audit to the pair pass itself: everything above the
    // first InMemoryRelation boundary (the cached clustering's OWN
    // lineage legitimately holds the k=4 broadcast cross join)
    val pairPass = p.split("InMemoryRelation").head
    assert(pairPass.contains("Join [cid"),
      s"pair pass lost its cid equi-join:\n$p")
    assert(!pairPass.contains("CartesianProduct") && !pairPass.contains("BroadcastNestedLoopJoin"),
      s"sem-dedup pair pass regressed to an all-pairs product:\n$p")
    Caches.releaseAll()
  }

  test("prototype pruning: per-cluster quarter cut, members partition the corpus") {
    val out = Caches.scoped(Clustering.prototypePrune(spark, sf).collect().toSeq)
    val n = Tables.t(spark, sf, "embeddings").count()
    assert(out.map(_.getLong(1)).sum == n, "members do not partition the corpus")
    out.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) / 4,
        s"cluster ${r.getLong(0)}: dropped ${r.getLong(2)} != ⌊${r.getLong(1)}/4⌋")
      assert(r.getLong(3) > 0, "kept checksum empty — the cut inverted")
    }
    Caches.releaseAll()
  }
}
