package graft.similarity

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Round-trip proof for the persisted ANN indexes: an index written to
  * parquet and loaded back must reproduce the live [[AnnLsh]]/[[AnnIvf]]
  * results bit-for-bit — the same guarantee the iforest model round-trip
  * gives (same scores from a loaded model as from the fitted one). */
class AnnIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val root =
    s"${sys.props("java.io.tmpdir")}/graft_ann_index_${Integer.toHexString(sf.hashCode)}"

  /** Collected (q_id, neighbor_id, cosine-bits, rn) rows — cosine compared
    * via raw long bits so "bit-for-bit" means exactly that. */
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Int)] =
    df.collect().toSeq.map(r => (r.getLong(0), r.getLong(1),
      java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getInt(3)))

  test("LSH: persisted index reproduces the live annTopK bit-for-bit") {
    val path = s"$root/lsh"
    AnnIndex.saveLsh(spark, sf, path)
    val live = rows(AnnLsh.annTopK(spark, sf, numProbes = 5, k = 5))
    val loaded = rows(AnnIndex.lshTopK(spark, sf, path, numProbes = 5, k = 5))
    assert(loaded == live)
  }

  test("LSH: persisted metadata drives the loaded probe knobs") {
    // An index saved with non-default knobs must be queried with those
    // knobs, not the library defaults — the loader reads them from
    // metadata, so a knob mismatch between writer and reader is impossible.
    val path = s"$root/lsh_alt"
    AnnIndex.saveLsh(spark, sf, path, numPlanes = 8, numTables = 5, probesPerTable = 28)
    val live = rows(AnnLsh.annTopK(spark, sf, numProbes = 5, k = 5,
      numPlanes = 8, numTables = 5, probesPerTable = 28))
    val loaded = rows(AnnIndex.lshTopK(spark, sf, path, numProbes = 5, k = 5))
    assert(loaded == live)
  }

  test("LSH: persisted no-vote index (minCollisions=1) reproduces that live path") {
    // minCollisions is a QUERY-side knob that changes results, so it must
    // round-trip through metadata like the geometry knobs: an index saved
    // for the no-vote configuration must be queried without the vote even
    // though the library default is now the voting point.
    val path = s"$root/lsh_novote"
    AnnIndex.saveLsh(spark, sf, path, numTables = 6, probesPerTable = 64, minCollisions = 1)
    val live = rows(AnnLsh.annTopK(spark, sf, numProbes = 5, k = 5,
      numTables = 6, probesPerTable = 64, minCollisions = 1))
    val loaded = rows(AnnIndex.lshTopK(spark, sf, path, numProbes = 5, k = 5))
    assert(loaded == live)
  }

  test("LSH: persisted occupancy-budgeted index reproduces that live path") {
    // poolFrac round-trips through metadata too, and the loader derives
    // the per-bucket occupancies from the SAVED assignments (an ids-only
    // aggregation over the index — never a corpus re-scan) plus the budget
    // from the fingerprint's corpusRows, so budgeted probing from a loaded
    // index is bit-identical to the live q60 path.
    val path = s"$root/lsh_budget"
    AnnIndex.saveLsh(spark, sf, path, probesPerTable = 1024, poolFrac = 0.85)
    val live = rows(AnnLsh.annTopK(spark, sf, numProbes = 5, k = 5,
      probesPerTable = 1024, poolFrac = 0.85))
    val loaded = rows(AnnIndex.lshTopK(spark, sf, path, numProbes = 5, k = 5))
    assert(loaded == live)
  }

  test("IVF: persisted index reproduces the live annTopK bit-for-bit") {
    val path = s"$root/ivf"
    AnnIndex.saveIvf(spark, sf, path)
    val live = rows(AnnIvf.annTopK(spark, sf, numProbes = 5, k = 5))
    val loaded = rows(AnnIndex.ivfTopK(spark, sf, path, numProbes = 5, k = 5))
    assert(loaded == live)
  }

  test("staleness guard: an index built before the corpus changed refuses to serve") {
    import org.apache.spark.sql.functions.col
    val corpus = s"${sys.props("java.io.tmpdir")}/graft_ann_stale_corpus"
    val orig = spark.read.parquet(s"$sf/embeddings.parquet")
    orig.write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
    val lshPath = s"$root/lsh_stale"
    val ivfPath = s"$root/ivf_stale"
    AnnIndex.saveLsh(spark, corpus, lshPath)
    AnnIndex.saveIvf(spark, corpus, ivfPath)
    assert(AnnIndex.isCurrent(spark, corpus, lshPath))
    assert(AnnIndex.isCurrent(spark, corpus, ivfPath))
    assert(AnnIndex.lshTopK(spark, corpus, lshPath).collect().nonEmpty)
    // row-count mutation: drop one vector — both loaders must refuse
    orig.filter(col("vec_id") =!= 399L)
      .write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
    assert(!AnnIndex.isCurrent(spark, corpus, lshPath))
    assert(!AnnIndex.isCurrent(spark, corpus, ivfPath))
    val e = intercept[IllegalStateException] {
      AnnIndex.lshTopK(spark, corpus, lshPath).collect()
    }
    assert(e.getMessage.contains("stale"))
    intercept[IllegalStateException] {
      AnnIndex.ivfTopK(spark, corpus, ivfPath).collect()
    }
    // content mutation at SAME row count: rewrite a sampled row's vector
    // in place (vec_id 0 satisfies the clustered content sample rule
    // pmod(vec_id, 9973) < 103 — see AnnIndex.corpusFingerprint) — the
    // row count matches, only the checksum catches it
    orig.selectExpr("vec_id",
        "CASE WHEN vec_id = 0 THEN transform(embedding, x -> x + 1.0f)" +
          " ELSE embedding END AS embedding", "label")
      .write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
    assert(!AnnIndex.isCurrent(spark, corpus, lshPath))
    // rebuild heals — the q58/q59 build-if-absent-or-stale contract
    AnnIndex.saveLsh(spark, corpus, lshPath)
    assert(AnnIndex.isCurrent(spark, corpus, lshPath))
    assert(AnnIndex.lshTopK(spark, corpus, lshPath).collect().nonEmpty)
  }

  test("staleness guard: in-place rewrite of an UNSAMPLED vector is refused") {
    // The content sample reads ~1% of rows (pmod(vec_id, 9973) < 103), so
    // rewriting a vector OUTSIDE it leaves (rows, id-xor, sampled-content)
    // all intact — round 10's one silent-staleness path. The FILE-LISTING
    // digest (name, length, mtime of every data file — zero data read)
    // closes it: no store rewrites a parquet file without changing one of
    // those. vec_id 200 has pmod(200, 9973) = 200 >= 103 — unsampled.
    import org.apache.spark.sql.functions.col
    val corpus = s"${sys.props("java.io.tmpdir")}/graft_ann_unsampled_corpus"
    val orig = spark.read.parquet(s"$sf/embeddings.parquet")
    orig.write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
    val path = s"$root/lsh_unsampled"
    AnnIndex.saveLsh(spark, corpus, path, numTables = 6, probesPerTable = 64)
    assert(AnnIndex.isCurrent(spark, corpus, path))
    orig.selectExpr("vec_id",
        "CASE WHEN vec_id = 200 THEN transform(embedding, x -> x + 1.0f)" +
          " ELSE embedding END AS embedding", "label")
      .write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
    // same row count, same ids, rewrite invisible to the content sample —
    // only the listing catches it
    assert(!AnnIndex.isCurrent(spark, corpus, path))
    val e = intercept[IllegalStateException] {
      AnnIndex.lshTopK(spark, corpus, path).collect()
    }
    assert(e.getMessage.contains("listing"))
    AnnIndex.saveLsh(spark, corpus, path, numTables = 6, probesPerTable = 64)
    assert(AnnIndex.isCurrent(spark, corpus, path))
  }

  test("LSH append: appended index is bit-for-bit a full rebuild of the grown corpus") {
    import org.apache.spark.sql.functions.col
    // build over the first 400 vectors, then the corpus GROWS by 100 (a
    // parquet append — new part files only, old files untouched)
    val corpus = s"${sys.props("java.io.tmpdir")}/graft_ann_grow_corpus"
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
    val fs = new java.io.File(corpus)
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete()
    }
    deleteRec(fs)
    all.filter(col("vec_id") < 400).write.parquet(s"$corpus/embeddings.parquet")
    val path = s"$root/lsh_append"
    AnnIndex.saveLsh(spark, corpus, path, numTables = 6, probesPerTable = 64)
    all.filter(col("vec_id") >= 400)
      .write.mode("append").parquet(s"$corpus/embeddings.parquet")
    // grown corpus: the old index must refuse, the append must heal
    assert(!AnnIndex.isCurrent(spark, corpus, path))
    AnnIndex.appendLsh(spark, corpus, path)
    assert(AnnIndex.isCurrent(spark, corpus, path))
    // equivalence: the hyperplanes depend only on (seed, dim), so a FULL
    // rebuild over the grown corpus produces the same geometry — appended
    // assignments and query answers must match it bit-for-bit
    val rebuilt = s"$root/lsh_append_rebuilt"
    AnnIndex.saveLsh(spark, corpus, rebuilt, numTables = 6, probesPerTable = 64)
    def assignSet(p: String) = spark.read.parquet(s"$p/assignments")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(assignSet(path) == assignSet(rebuilt))
    assert(rows(AnnIndex.lshTopK(spark, corpus, path, numProbes = 5, k = 5)) ==
      rows(AnnIndex.lshTopK(spark, corpus, rebuilt, numProbes = 5, k = 5)))
    // a SECOND append with nothing new is a no-op that still validates
    AnnIndex.appendLsh(spark, corpus, path)
    assert(assignSet(path) == assignSet(rebuilt))
    // COMPACTION: the append layers collapse to <= 4 files, and the index
    // still validates and answers bit-for-bit what the layered one did
    val topkBefore = rows(AnnIndex.lshTopK(spark, corpus, path, numProbes = 5, k = 5))
    AnnIndex.compactLsh(spark, corpus, path)
    assert(AnnIndex.isCurrent(spark, corpus, path),
      "compaction must not invalidate the index")
    assert(assignSet(path) == assignSet(rebuilt),
      "compaction changed the assignment rows")
    val files = new java.io.File(s"$path/assignments").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files <= 4, s"assignments not compacted: $files files")
    assert(rows(AnnIndex.lshTopK(spark, corpus, path, numProbes = 5, k = 5)) ==
      topkBefore, "compaction changed a topk answer")
  }

  test("upgrade path: a pre-checksum index validates as current but refuses appends") {
    // Simulate an index persisted BEFORE the listing gained its checksum
    // field: metadata carries the legacy 3-field digest, the listing
    // parquet has no chk column. Validation must ACCEPT it (a fleet
    // upgrade must not flip every current index stale at once — the
    // simultaneous re-index storm), while the append tier still refuses
    // (its per-file adds-only proof needs the checksummed listing) and a
    // REAL corpus change still reads stale through the legacy digest.
    import org.apache.spark.sql.functions.col
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val corpus = s"${sys.props("java.io.tmpdir")}/graft_ann_legacy_corpus"
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
    all.filter(col("vec_id") < 400)
      .write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
    val path = s"$root/lsh_legacy"
    AnnIndex.saveLsh(spark, corpus, path, numTables = 6, probesPerTable = 64)
    // downgrade the persisted shape to the pre-upgrade format
    val legacy = AnnIndex.legacyListingDigest(AnnIndex.corpusListing(spark, corpus))
    val js = JsonMethods.parse(
      spark.read.text(s"$path/metadata").collect().map(_.getString(0)).mkString("\n"))
    val downgraded = js.transformField {
      case JField("corpusListing", _) => JField("corpusListing", JString(legacy))
    }
    import spark.implicits._
    spark.createDataset(Seq(JsonMethods.compact(JsonMethods.render(downgraded))))
      .repartition(1).write.mode("overwrite").text(s"$path/metadata")
    val listing3 = spark.read.parquet(s"$path/listing")
      .select("name", "len", "mtime").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    spark.createDataset(listing3).toDF("name", "len", "mtime")
      .repartition(1).write.mode("overwrite").parquet(s"$path/listing")
    // the pre-upgrade index VALIDATES and serves
    assert(AnnIndex.isCurrent(spark, corpus, path))
    assert(AnnIndex.lshTopK(spark, corpus, path, numProbes = 5, k = 5)
      .collect().nonEmpty)
    // pure growth: stale as usual — but the append tier refuses LOUDLY on
    // the unverifiable listing instead of guessing adds-only
    all.filter(col("vec_id") >= 400)
      .write.mode("append").parquet(s"$corpus/embeddings.parquet")
    assert(!AnnIndex.isCurrent(spark, corpus, path))
    val e = intercept[IllegalStateException] { AnnIndex.appendLsh(spark, corpus, path) }
    assert(e.getMessage.contains("pre-checksum"), e.getMessage)
    // the rebuild fallback heals and re-persists the checksummed shape
    AnnIndex.saveLsh(spark, corpus, path, numTables = 6, probesPerTable = 64)
    assert(AnnIndex.isCurrent(spark, corpus, path))
    assert(spark.read.parquet(s"$path/listing").columns.contains("chk"))
  }

  test("LSH append refuses when the change was not a pure add") {
    import org.apache.spark.sql.functions.col
    val corpus = s"${sys.props("java.io.tmpdir")}/graft_ann_notadd_corpus"
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
    all.filter(col("vec_id") < 400)
      .write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
    val path = s"$root/lsh_notadd"
    AnnIndex.saveLsh(spark, corpus, path, numTables = 6, probesPerTable = 64)
    // an overwrite (even to a superset of the rows) rewrites every file —
    // the per-file listing check must refuse the shortcut
    all.write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
    val e = intercept[IllegalStateException] { AnnIndex.appendLsh(spark, corpus, path) }
    assert(e.getMessage.contains("rebuild"))
    // the full rebuild (the q58 fallback tier) heals
    AnnIndex.saveLsh(spark, corpus, path, numTables = 6, probesPerTable = 64)
    assert(AnnIndex.isCurrent(spark, corpus, path))
  }

  test("IVF append: new vectors join the frozen geometry's lists; old rows untouched") {
    import org.apache.spark.sql.functions.col
    val corpus = s"${sys.props("java.io.tmpdir")}/graft_ann_ivfgrow_corpus"
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
    val fs = new java.io.File(corpus)
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete()
    }
    deleteRec(fs)
    all.write.parquet(s"$corpus/embeddings.parquet")
    val path = s"$root/ivf_append"
    AnnIndex.saveIvf(spark, corpus, path)
    def assigns(p: String) = spark.read.parquet(s"$p/assignments")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap // vec_id -> list
    val before = assigns(path)
    // grow with DUPLICATES of vectors 0..49 at new ids 10000+i: under the
    // FROZEN centroids an identical vector must land in the same list as
    // its source — an expectation independent of the append code itself
    all.filter(col("vec_id") < 50)
      .selectExpr("vec_id + 10000 AS vec_id", "embedding", "label")
      .write.mode("append").parquet(s"$corpus/embeddings.parquet")
    AnnIndex.appendIvf(spark, corpus, path)
    assert(AnnIndex.isCurrent(spark, corpus, path))
    val after = assigns(path)
    assert(before.forall { case (id, l) => after(id) == l }, "old assignments changed")
    (0L until 50L).foreach { i =>
      assert(after(i + 10000) == after(i), s"duplicate of $i landed in a different list")
    }
    // COMPACTION: the append layers collapse to <= 4 files; the index
    // still validates and answers bit-for-bit (the q143 invisibility
    // contract applied to the IVF tier)
    val topkBefore = rows(AnnIndex.ivfTopK(spark, corpus, path))
    AnnIndex.compactIvf(spark, corpus, path)
    assert(AnnIndex.isCurrent(spark, corpus, path),
      "compaction must not invalidate the index")
    assert(assigns(path) == after, "compaction changed the assignment rows")
    val files = new java.io.File(s"$path/assignments").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files <= 4, s"assignments not compacted: $files files")
    assert(rows(AnnIndex.ivfTopK(spark, corpus, path)) == topkBefore,
      "compaction changed a topk answer")
  }

  test("interrupted rebuild fails loud: a metadata-less index never serves") {
    // The save bracket is (delete metadata, write model + assignments,
    // write metadata LAST), so every kill point during a rebuild leaves
    // either no metadata or an old fingerprint — this pins the worst
    // interrupted state (artifacts present, metadata gone): the loader
    // must throw, and the q58-style build-if-stale retry must heal it.
    val path = s"$root/lsh_interrupted"
    AnnIndex.saveLsh(spark, sf, path, numTables = 6, probesPerTable = 64)
    val before = rows(AnnIndex.lshTopK(spark, sf, path, numProbes = 5, k = 5))
    // simulate the mid-rebuild kill window: metadata deleted, old
    // model/assignments still on disk
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete()
    }
    deleteRec(new java.io.File(s"$path/metadata"))
    assert(!AnnIndex.isCurrent(spark, sf, path))
    intercept[Exception] { AnnIndex.lshTopK(spark, sf, path, numProbes = 5, k = 5).collect() }
    // rebuild heals and reproduces the original answers
    AnnIndex.saveLsh(spark, sf, path, numTables = 6, probesPerTable = 64)
    assert(rows(AnnIndex.lshTopK(spark, sf, path, numProbes = 5, k = 5)) == before)
  }

  test("IVF: corpus-adaptive memos drop when the corpus files change") {
    // The row-count and quantizer memos key on a file-level corpus
    // signature: a corpus REPLACED mid-session must not serve the old
    // corpus's knobs (the rebuilt index would bake stale nlist/centroids
    // under a fresh fingerprint). 500 rows -> nlist 256; grow the same
    // dir to 2000 rows -> the adaptive default must move to 512.
    import org.apache.spark.sql.functions.col
    val corpus = s"${sys.props("java.io.tmpdir")}/graft_ann_memo_corpus"
    val small = spark.read.parquet(s"$sf/embeddings.parquet")
    small.write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
    assert(AnnIvf.resolveKnobs(spark, corpus, 0, 0) == ((256, 36)))
    val big = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    big.write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
    assert(AnnIvf.resolveKnobs(spark, corpus, 0, 0) == ((512, 73)),
      "memoized row count survived a corpus replacement")
  }

  test("IVF append: refuses past the measured drift bound; rebuild heals") {
    // The geometry (nlist + centroids) freezes at build time; TUNE_r12.txt
    // "ivfdrift" measured the (recall >= 0.85, scan <= 0.25) box holding
    // at +25% appended rows and breaking beyond — appendIvf must refuse
    // (BEFORE mutating anything) once live rows exceed 1.25x trainedRows.
    import org.apache.spark.sql.functions.col
    val corpus = s"${sys.props("java.io.tmpdir")}/graft_ann_drift_corpus"
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete()
    }
    deleteRec(new java.io.File(corpus))
    all.filter(col("vec_id") < 200).write.parquet(s"$corpus/embeddings.parquet")
    val path = s"$root/ivf_drift"
    AnnIndex.saveIvf(spark, corpus, path) // trainedRows = 200
    // +20% growth (240 <= 1.25 * 200): the append tier serves it
    all.filter(col("vec_id") >= 200 && col("vec_id") < 240)
      .write.mode("append").parquet(s"$corpus/embeddings.parquet")
    AnnIndex.appendIvf(spark, corpus, path)
    assert(AnnIndex.isCurrent(spark, corpus, path))
    // grow to 500 total (2.5x the trained 200): refuse, index left intact
    all.filter(col("vec_id") >= 240)
      .write.mode("append").parquet(s"$corpus/embeddings.parquet")
    val e = intercept[IllegalStateException] { AnnIndex.appendIvf(spark, corpus, path) }
    assert(e.getMessage.contains("trained at 200"), e.getMessage)
    // the refusal mutated NOTHING: the index still answers for the corpus
    // it last committed (240 rows) — stale for the live one, not broken
    assert(!AnnIndex.isCurrent(spark, corpus, path))
    assert(spark.read.text(s"$path/metadata").count() == 1,
      "refusal must not clear the metadata commit record")
    // the rebuild tier heals with refit geometry and a fresh trainedRows
    AnnIndex.saveIvf(spark, corpus, path)
    assert(AnnIndex.isCurrent(spark, corpus, path))
    AnnIndex.appendIvf(spark, corpus, path) // no-op growth: serves again
    assert(AnnIndex.isCurrent(spark, corpus, path))
  }

  test("buildIfStale: a current index's transient load failure re-raises, never heals") {
    // The heal tiers clear + rewrite the metadata commit record; firing
    // them on a transient infra error over a CURRENT index would hand a
    // concurrent reader a metadata-less index mid-window (r11 ADVICE).
    var appends = 0
    var rebuilds = 0
    val boom = new RuntimeException("transient I/O")
    val e = intercept[RuntimeException] {
      graft.SparkEntry.buildIfStale(
        definitelyStale = false, append = { appends += 1 },
        rebuild = { rebuilds += 1 })(
        throw boom)
    }
    assert(e eq boom, "must surface the ORIGINAL failure")
    assert(appends == 0 && rebuilds == 0, "heal tiers must not run")
    // and the stale path still heals: append first, rebuild on its failure
    var loads = 0
    val out = graft.SparkEntry.buildIfStale(
      definitelyStale = true,
      append = { appends += 1; throw new IllegalStateException("not a pure add") },
      rebuild = { rebuilds += 1 })({
      loads += 1
      if (loads == 1) throw new IllegalStateException("stale")
      spark.range(1).toDF()
    })
    assert(appends == 1 && rebuilds == 1 && out.count() == 1)
  }

  test("buildIfStale: a probe that cannot run re-raises the LOAD failure, never heals") {
    // r12 ADVICE: the prior probe (isCurrent) swallowed its own failures
    // into "not current", so the exact scenario the guard exists for — an
    // FS outage failing load AND probe — healed anyway. A probe failure
    // is not a staleness verdict: the original load error must surface,
    // with the probe's error attached as suppressed for diagnosis.
    var appends = 0
    var rebuilds = 0
    val loadBoom = new RuntimeException("load: transient I/O")
    val probeBoom = new RuntimeException("probe: transient I/O")
    val e = intercept[RuntimeException] {
      graft.SparkEntry.buildIfStale(
        definitelyStale = throw probeBoom,
        append = { appends += 1 }, rebuild = { rebuilds += 1 })(
        throw loadBoom)
    }
    assert(e eq loadBoom, "must surface the ORIGINAL load failure")
    assert(e.getSuppressed.exists(_ eq probeBoom), "probe failure attached")
    assert(appends == 0 && rebuilds == 0, "heal tiers must not run")
  }

  test("definitelyStale: verdicts on absence/staleness, propagation on probe failure") {
    val path = s"$root/stale_probe"
    // $root is a FIXED tmpdir, so a prior run of this suite in the same
    // boot leaves the index behind — clear it so the absence verdict
    // below is actually about absence, not about last run's artifact
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(path))
    // absent index: definitively stale (commit record missing)
    assert(AnnIndex.definitelyStale(spark, sf, path))
    AnnIndex.saveLsh(spark, sf, path)
    assert(!AnnIndex.definitelyStale(spark, sf, path))
    // corpus changed out from under the index: a definitive verdict
    val corpus2 = java.nio.file.Files.createTempDirectory("graft-stale-corpus").toString
    spark.read.parquet(s"$sf/embeddings.parquet").limit(100)
      .write.parquet(s"$corpus2/embeddings.parquet")
    assert(AnnIndex.definitelyStale(spark, corpus2, path))
    // a probe that cannot RUN (corpus dir vanished -> the fingerprint
    // scan fails) propagates instead of voting stale
    intercept[Exception] {
      AnnIndex.definitelyStale(spark, "/nonexistent/corpus/dir", path)
    }
  }

  test("IVF: loaded index needs no k-means fit (quantizer cache cold)") {
    val path = s"$root/ivf"
    // depends on the '$root/ivf' index written by "IVF: persisted index
    // reproduces..." above (suite runs in declaration order); clearing
    // the memo proves ivfTopK reads centroids from parquet, not a refit
    AnnIvf.clearQuantizerCache()
    val loaded = AnnIndex.ivfTopK(spark, sf, path, numProbes = 5, k = 5).collect()
    assert(loaded.nonEmpty)
  }

  test("PQ: persisted index reproduces the live annTopK bit-for-bit") {
    val path = s"$root/pq"
    AnnIndex.savePq(spark, sf, path)
    val live = rows(AnnPq.annTopK(spark, sf, numProbes = 5, k = 5))
    val loaded = rows(AnnIndex.pqTopK(spark, sf, path, numProbes = 5, k = 5))
    assert(loaded == live)
  }

  test("PQ: loaded index needs no codebook fit (memo cold)") {
    val path = s"$root/pq"
    // depends on '$root/pq' from the test above; clearing the memo
    // proves pqTopK reads codebooks from parquet, not a refit
    AnnPq.clearCodebookCache()
    val loaded = AnnIndex.pqTopK(spark, sf, path, numProbes = 5, k = 5).collect()
    assert(loaded.nonEmpty)
  }

  test("IVF-PQ: persisted index reproduces the live annTopK bit-for-bit") {
    val path = s"$root/ivfpq"
    AnnIndex.saveIvfPq(spark, sf, path)
    val live = rows(AnnIvfPq.annTopK(spark, sf, numProbes = 5, k = 5))
    val loaded = rows(AnnIndex.ivfPqTopK(spark, sf, path, numProbes = 5, k = 5))
    assert(loaded == live)
  }

  test("IVF-PQ: loaded index needs neither k-means fit (both memos cold)") {
    val path = s"$root/ivfpq"
    // depends on '$root/ivfpq' above; clearing BOTH memos proves
    // ivfPqTopK reads coarse centroids and residual codebooks from
    // parquet, never a refit
    AnnIvf.clearQuantizerCache()
    AnnIvfPq.clearResidualCache()
    val loaded = AnnIndex.ivfPqTopK(spark, sf, path, numProbes = 5, k = 5).collect()
    assert(loaded.nonEmpty)
  }

  test("IVF-PQ append: frozen geometries encode adds; refuses past 1.25x; rebuild heals") {
    import org.apache.spark.sql.functions.col
    val corpus = s"${sys.props("java.io.tmpdir")}/graft_ann_ivfpqdrift_corpus"
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete()
    }
    deleteRec(new java.io.File(corpus))
    all.filter(col("vec_id") < 200).write.parquet(s"$corpus/embeddings.parquet")
    val path = s"$root/ivfpq_drift"
    AnnIndex.saveIvfPq(spark, corpus, path) // trainedRows = 200
    val beforeCodes = spark.read.parquet(s"$path/assignments").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Byte](2))).toMap
    assert(beforeCodes.size == 200)
    // +20% growth (240 <= 1.25 * 200): the append tier serves it
    all.filter(col("vec_id") >= 200 && col("vec_id") < 240)
      .write.mode("append").parquet(s"$corpus/embeddings.parquet")
    AnnIndex.appendIvfPq(spark, corpus, path)
    assert(AnnIndex.isCurrent(spark, corpus, path))
    val after = spark.read.parquet(s"$path/assignments")
    assert(after.count() == 240L)
    val oldCodes = after.where("vec_id < 200").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Byte](2))).toMap
    assert(oldCodes == beforeCodes,
      "append rewrote pre-existing list assignments or code words")
    // COMPACTION between appends: rows identical, index current, and the
    // drift-bound refusal below still fires off the preserved metadata
    val topkBeforeCompact = rows(AnnIndex.ivfPqTopK(spark, corpus, path))
    AnnIndex.compactIvfPq(spark, corpus, path)
    assert(AnnIndex.isCurrent(spark, corpus, path),
      "compaction must not invalidate the index")
    assert(spark.read.parquet(s"$path/assignments").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Byte](2))).toMap
      .view.filterKeys(_ < 200).toMap == beforeCodes,
      "compaction changed code rows")
    assert(rows(AnnIndex.ivfPqTopK(spark, corpus, path)) == topkBeforeCompact,
      "compaction changed a topk answer")
    // grow to 500 (2.5x trained): the COARSE 1.25x bound refuses
    all.filter(col("vec_id") >= 240)
      .write.mode("append").parquet(s"$corpus/embeddings.parquet")
    val e = intercept[IllegalStateException] { AnnIndex.appendIvfPq(spark, corpus, path) }
    assert(e.getMessage.contains("trained at 200"), e.getMessage)
    assert(!AnnIndex.isCurrent(spark, corpus, path))
    assert(spark.read.text(s"$path/metadata").count() == 1,
      "refusal must not clear the metadata commit record")
    // rebuild heals with refit coarse + residual geometry
    AnnIvf.clearQuantizerCache()
    AnnIvfPq.clearResidualCache()
    AnnIndex.saveIvfPq(spark, corpus, path)
    assert(AnnIndex.isCurrent(spark, corpus, path))
    assert(AnnIndex.ivfPqTopK(spark, corpus, path).collect().nonEmpty)
  }

  test("PQ append: frozen-codebook encoding; refuses past 1.5x; rebuild heals") {
    import org.apache.spark.sql.functions.col
    val corpus = s"${sys.props("java.io.tmpdir")}/graft_ann_pqdrift_corpus"
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete()
    }
    deleteRec(new java.io.File(corpus))
    all.filter(col("vec_id") < 200).write.parquet(s"$corpus/embeddings.parquet")
    val path = s"$root/pq_drift"
    AnnIndex.savePq(spark, corpus, path) // trainedRows = 200
    val beforeCodes = spark.read.parquet(s"$path/assignments").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(beforeCodes.size == 200)
    // +45% growth (290 <= 1.5 * 200): the append tier serves it, and the
    // appended code words must be the ones the frozen codebooks produce —
    // bit-compare against a rebuild-free re-encode of the new rows
    all.filter(col("vec_id") >= 200 && col("vec_id") < 290)
      .write.mode("append").parquet(s"$corpus/embeddings.parquet")
    AnnIndex.appendPq(spark, corpus, path)
    assert(AnnIndex.isCurrent(spark, corpus, path))
    val after = spark.read.parquet(s"$path/assignments")
    assert(after.count() == 290L)
    // old rows' codes untouched by the append — bit-for-bit
    val oldCodes = after.where("vec_id < 200").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(oldCodes == beforeCodes, "append rewrote pre-existing code words")
    // COMPACTION between appends: rows identical, index current, and the
    // drift-bound refusal below still fires off the preserved metadata
    val topkBeforeCompact = rows(AnnIndex.pqTopK(spark, corpus, path))
    AnnIndex.compactPq(spark, corpus, path)
    assert(AnnIndex.isCurrent(spark, corpus, path),
      "compaction must not invalidate the index")
    assert(spark.read.parquet(s"$path/assignments").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
      .view.filterKeys(_ < 200).toMap == beforeCodes,
      "compaction changed code rows")
    assert(rows(AnnIndex.pqTopK(spark, corpus, path)) == topkBeforeCompact,
      "compaction changed a topk answer")
    // grow to 500 total (2.5x the trained 200): refuse, index left intact
    all.filter(col("vec_id") >= 290)
      .write.mode("append").parquet(s"$corpus/embeddings.parquet")
    val e = intercept[IllegalStateException] { AnnIndex.appendPq(spark, corpus, path) }
    assert(e.getMessage.contains("trained at 200"), e.getMessage)
    assert(!AnnIndex.isCurrent(spark, corpus, path))
    assert(spark.read.text(s"$path/metadata").count() == 1,
      "refusal must not clear the metadata commit record")
    // the rebuild tier heals with refit codebooks and fresh trainedRows
    AnnPq.clearCodebookCache() // corpus files changed; drop the fit memo
    AnnIndex.savePq(spark, corpus, path)
    assert(AnnIndex.isCurrent(spark, corpus, path))
    assert(AnnIndex.pqTopK(spark, corpus, path).collect().nonEmpty)
  }
}
