package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ConnectedComponents

/** [[ConnectedComponents]] (driver fast path + large-star/small-star)
  * against handcrafted graphs and a driver-side union-find oracle on
  * random graphs — the clustering stage q66/q67/q68/q69 build dedup
  * decisions on. Every graph runs BOTH paths: the default (driver
  * union-find under the edge threshold) and `driverThreshold = 0` (the
  * star iteration, the unconditional big-graph path). */
class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** Both execution paths over the same edges; asserts they agree and
    * returns the mapping. */
  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    graft.queries.Caches.scoped {
      val df = edges.toDF("u", "v")
      val fast = ConnectedComponents.components(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = ConnectedComponents.components(df, driverThreshold = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == star, "driver fast path and star iteration disagree")
      fast
    }
  }

  /** Driver-side union-find — the independent oracle (recursive find,
    * written independently of the operator's path-halving variant). */
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

  test("empty edge set yields an empty, correctly-typed mapping on both paths") {
    import spark.implicits._
    for (thr <- Seq(1L << 20, 0L)) {
      val out = ConnectedComponents.components(
        Seq.empty[(Long, Long)].toDF("u", "v"), driverThreshold = thr)
      assert(out.columns.toSeq == Seq("node", "cluster"))
      assert(out.count() == 0)
    }
  }

  test("long path and star collapse to the component minimum") {
    // path 100-99-98-...-90 (diameter >> 1 forces multiple LS/SS rounds)
    val path = (90L until 100L).map(i => (i, i + 1))
    val got = cc(path)
    assert((90L to 100L).forall(got(_) == 90L))
  }

  test("random graphs match a driver-side union-find oracle on both paths") {
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

  test("ensureReliableCheckpointDir sets a dir when absent, respects one when present") {
    val sc = spark.sparkContext
    val prior = sc.getCheckpointDir
    try {
      // start from the dir-less state regardless of suite order (a query
      // surface run in an earlier suite may have ensured a dir already;
      // local mode skips the non-local path check, so null resets to None)
      sc.setCheckpointDir(null)
      ConnectedComponents.ensureReliableCheckpointDir(spark)
      val set = sc.getCheckpointDir
      assert(set.isDefined && set.get.contains("graft_ckpt"),
        s"expected a tmpdir-rooted default, got $set")
      // idempotent, and never overrides a deployment's own dir
      ConnectedComponents.ensureReliableCheckpointDir(spark)
      assert(sc.getCheckpointDir == set)
    } finally {
      // session-global state: restore what the suite found (r11 ADVICE —
      // leaving it mutated silently switches later suites' CC mode)
      sc.setCheckpointDir(prior.orNull)
    }
  }

  test("the self-created checkpoint dir is deleted at application end") {
    // r12 ADVICE: the converged iteration's checkpoint and the per-context
    // UUID dir accreted in /tmp across runs — when ensureReliable...
    // itself created the dir, an application-end listener reclaims it.
    // The listener is exercised directly (ending the shared test context
    // would kill every later suite).
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-cleanup")
    java.nio.file.Files.writeString(dir.resolve("rdd-1"), "edges")
    val l = ConnectedComponents.cleanupListener(spark.sparkContext, dir.toString)
    l.onApplicationEnd(org.apache.spark.scheduler.SparkListenerApplicationEnd(0L))
    assert(!java.nio.file.Files.exists(dir), "checkpoint dir must be deleted")
    // deletion failures are swallowed (the JVM is exiting) — a second
    // fire on the now-missing dir must not throw
    l.onApplicationEnd(org.apache.spark.scheduler.SparkListenerApplicationEnd(0L))
  }

  test("reliable-checkpoint mode is taken when a dir is set, and reclaims superseded files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toFile
    val sc = spark.sparkContext
    val prior = sc.getCheckpointDir
    try {
      sc.setCheckpointDir(dir.getAbsolutePath)
      // the 11-node path needs several star rounds -> several checkpoints;
      // driverThreshold = 0 forces the star path (the fast path would
      // otherwise collect this tiny graph and checkpoint only once)
      val got = graft.queries.Caches.scoped {
        ConnectedComponents.components(
          (90L until 100L).map(i => (i, i + 1)).toDF("u", "v"),
          driverThreshold = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      assert((90L to 100L).forall(got(_) == 90L))
      // only the CONVERGED iteration's checkpoint may survive — the cleaner
      // conf that would reclaim intermediates is off by default, so the
      // operator must delete them itself (O(log n) full edge-set copies per
      // run would otherwise accrete until the checkpoint volume filled).
      // The surviving count > 0 also proves the RELIABLE branch ran (the
      // localCheckpoint fallback writes no rdd-* dirs at all).
      def rddDirs(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles()).getOrElse(Array.empty).toSeq
          .flatMap(c => if (c.getName.startsWith("rdd-")) Seq(c) else rddDirs(c))
      val left = rddDirs(dir)
      assert(left.length == 1, s"expected exactly the converged checkpoint: $left")
      // the FAST path under a reliable dir cleans up even its one snapshot
      val fastGot = graft.queries.Caches.scoped {
        ConnectedComponents.components(
          (90L until 100L).map(i => (i, i + 1)).toDF("u", "v"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      assert(fastGot == got)
      assert(rddDirs(dir).length == 1,
        "fast path must reclaim its input snapshot's checkpoint")
    } finally {
      // restore what the suite found — setCheckpointDir is session-global,
      // and leaving this test's temp dir set silently switches every later
      // suite's CC mode and leaks checkpoints into it (r11 ADVICE)
      sc.setCheckpointDir(prior.orNull)
    }
  }
}
