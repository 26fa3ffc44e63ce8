package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ConnectedComponents

/** [[ConnectedComponents]] (large-star/small-star) against handcrafted
  * graphs and a driver-side union-find oracle on random graphs — the
  * clustering stage q66 builds dedup decisions on. */
class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    graft.queries.Caches.scoped {
      ConnectedComponents.components(edges.toDF("u", "v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
  }

  /** Driver-side union-find — the independent oracle. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // normalize: every node maps to its component MIN
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    nodes.map(n => n -> byRoot(find(n)).min).toMap
  }

  test("transitive chain: a~b, b~c, a!~c still one cluster, min is canonical") {
    // the exact shape near-dup pairs produce: a-b and b-c similar, a-c not
    val got = cc(Seq((10L, 7L), (10L, 42L)))
    assert(got == Map(7L -> 7L, 10L -> 7L, 42L -> 7L))
  }

  test("two components, self-loops and duplicate/reversed edges ignored") {
    val got = cc(Seq((1L, 2L), (2L, 1L), (3L, 3L), (5L, 9L), (9L, 5L), (5L, 9L)))
    // 3's only edge is a self-loop -> no edges survive canonicalization, so
    // it does not appear (callers coalesce singletons to themselves)
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 9L -> 5L))
  }

  test("empty edge set yields an empty, correctly-typed mapping") {
    import spark.implicits._
    val out = ConnectedComponents.components(
      Seq.empty[(Long, Long)].toDF("u", "v"))
    assert(out.columns.toSeq == Seq("node", "cluster"))
    assert(out.count() == 0)
  }

  test("long path and star collapse to the component minimum") {
    // path 100-99-98-...-90 (diameter >> 1 forces multiple LS/SS rounds)
    val path = (90L until 100L).map(i => (i, i + 1))
    val got = cc(path)
    assert((90L to 100L).forall(got(_) == 90L))
  }

  test("random graphs match a driver-side union-find oracle") {
    val rng = new scala.util.Random(4242L)
    for (trial <- 0 until 5) {
      val n = 40 + trial * 20
      val m = n * 2 / 3 // sparse: many components, some chains
      val edges = Seq.fill(m)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val got = cc(edges)
      val want = unionFind(edges)
      assert(got == want, s"trial $trial: $got vs $want")
    }
  }

  // LAST in the suite: setCheckpointDir is session-global and cannot be
  // unset, so every earlier test runs the localCheckpoint path first.
  test("reliable-checkpoint mode reclaims superseded iterations' files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toFile
    spark.sparkContext.setCheckpointDir(dir.getAbsolutePath)
    // the 11-node path needs several star rounds -> several checkpoints
    val got = cc((90L until 100L).map(i => (i, i + 1)))
    assert((90L to 100L).forall(got(_) == 90L))
    // only the CONVERGED iteration's checkpoint may survive — the cleaner
    // conf that would reclaim intermediates is off by default, so the
    // operator must delete them itself (O(log n) full edge-set copies per
    // run would otherwise accrete until the checkpoint volume filled)
    def rddDirs(f: java.io.File): Seq[java.io.File] =
      Option(f.listFiles()).getOrElse(Array.empty).toSeq
        .flatMap(c => if (c.getName.startsWith("rdd-")) Seq(c) else rddDirs(c))
    val left = rddDirs(dir)
    assert(left.length <= 1, s"superseded checkpoints not reclaimed: $left")
  }
}
