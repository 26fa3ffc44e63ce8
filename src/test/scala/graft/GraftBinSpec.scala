package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/**
 * [[graft.sources.GraftBin]] — the custom DataSource V2 connector. These
 * specs pin the three contracts that make it a real source rather than an
 * RDD wrapper: lossless round-trip (nulls included), frame-level filter
 * pushdown, and genuine column pruning (the plan's scan node reads only
 * the requested fields).
 */
class GraftBinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val fmt = graft.sources.GraftBin.format

  private def tmp(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graftbin_spec_$name"

  private def fixture() = {
    import spark.implicits._
    Seq(
      (1L, "en", "hello world", 11L),
      (2L, "de", "hallo welt", 10L),
      (3L, null.asInstanceOf[String], null.asInstanceOf[String], 0L),
      (4L, "fr", "salut", 5L)
    ).toDF("doc_id", "lang", "text", "n_chars")
  }

  test("round-trip preserves every value, including nulls") {
    val out = tmp("roundtrip")
    fixture().write.format(fmt).mode("overwrite").save(out)
    val back = spark.read.format(fmt).load(out)
      .orderBy(col("doc_id")).collect()
    val src = fixture().orderBy(col("doc_id")).collect()
    assert(back.toSeq == src.toSeq, s"round-trip drifted:\n${back.mkString("\n")}")
  }

  test("overwrite truncates the previous files") {
    val out = tmp("truncate")
    fixture().write.format(fmt).mode("overwrite").save(out)
    fixture().write.format(fmt).mode("overwrite").save(out)
    assert(spark.read.format(fmt).load(out).count() == 4L,
      "overwrite appended instead of truncating")
  }

  test("batch append stacks jobs without name collisions, and both prune") {
    import spark.implicits._
    val out = tmp("append")
    // fresh dir (earlier runs of this spec may have left files)
    val p = new org.apache.hadoop.fs.Path(out)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    fixture().write.format(fmt).mode("append").save(out)
    Seq((10L, "en", "second job", 10L), (11L, "it", "ciao", 4L))
      .toDF("doc_id", "lang", "text", "n_chars")
      .write.format(fmt).mode("append").save(out)
    // union of both jobs' rows, nothing overwritten
    val back = spark.read.format(fmt).load(out)
    assert(back.count() == 6L, "append lost or duplicated a job's rows")
    assert(back.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 10L, 11L))
    // two jobs → two disjoint job-tagged file sets and two manifest shards
    val parts = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.endsWith(".graftbin"))
    assert(parts.forall(_.startsWith("part-b")), s"untagged batch names: ${parts.mkString(",")}")
    assert(parts.map(_.split("-")(1)).distinct.length == 2,
      s"expected two job tags in ${parts.mkString(",")}")
    val shards = fs.listStatus(new org.apache.hadoop.fs.Path(out, "_manifest"))
      .map(_.getPath.getName).filter(_.endsWith(".json"))
    assert(shards.length == 2, s"expected 2 manifest shards, got ${shards.mkString(",")}")
    // manifest-driven planning-time skipping still works across shards:
    // a doc_id >= 10 scan must plan only the second job's files
    val pruned = graft.sources.GraftBin.pruneFiles(
      spark.sessionState.newHadoopConf(), out,
      Array(org.apache.spark.sql.sources.GreaterThanOrEqual("doc_id", 10L)))
    val prunedNames = pruned.map(f => new org.apache.hadoop.fs.Path(f).getName)
    assert(prunedNames.nonEmpty &&
      prunedNames.map(_.split("-")(1)).distinct.length == 1,
      s"doc_id>=10 should prune down to the second job's files: $prunedNames")
    assert(spark.read.format(fmt).load(out).where(col("doc_id") >= 10L).count() == 2L)
  }

  test("doc_id filters are pushed into the scan and applied correctly") {
    val out = tmp("pushdown")
    fixture().write.format(fmt).mode("overwrite").save(out)
    val df = spark.read.format(fmt).load(out).where(col("doc_id") > 2L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThan(doc_id,2)"),
      s"filter not pushed:\n$plan")
    assert(df.select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(3L, 4L))
  }

  test("pruned projection drops text from the scan's read schema") {
    val out = tmp("prune")
    fixture().write.format(fmt).mode("overwrite").save(out)
    val df = spark.read.format(fmt).load(out)
      .select(col("doc_id"), col("n_chars"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: doc_id,n_chars"),
      s"text/lang still in the scan schema:\n$plan")
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((1L, 11L), (2L, 10L), (3L, 0L), (4L, 5L)))
  }

  test("write parallelism maps to one part file per partition") {
    val out = tmp("parts")
    fixture().repartition(3).write.format(fmt).mode("overwrite").save(out)
    val files = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".graftbin"))
    assert(files == 3, s"expected 3 part files, found $files")
    assert(spark.read.format(fmt).load(out).count() == 4L)
  }

  test("manifest data skipping: planning prunes files whose id range cannot match") {
    import org.apache.spark.sql.sources.{GreaterThan, Filter}
    val out = tmp("skipping")
    import spark.implicits._
    // range-partitioned on doc_id → files carry disjoint id ranges in
    // the commit-time manifest
    (1L to 100L).map(i => (i, "en", s"t$i", i)).toDF("doc_id", "lang", "text", "n_chars")
      .repartitionByRange(4, col("doc_id")).sortWithinPartitions(col("doc_id"))
      .write.format(fmt).mode("overwrite").save(out)
    val conf = spark.sessionState.newHadoopConf()
    val all = graft.sources.GraftBin.pruneFiles(conf, out, Array.empty)
    assert(all.size == 4, s"expected 4 part files, got ${all.size}")
    val pruned = graft.sources.GraftBin.pruneFiles(conf, out,
      Array[Filter](GreaterThan("doc_id", java.lang.Long.valueOf(90L))))
    assert(pruned.size < all.size,
      s"manifest did not prune: ${pruned.size} of ${all.size} files planned")
    // pruning is an optimization, never a correctness bet: the filtered
    // read over the pruned plan returns exactly the matching rows
    val got = spark.read.format(fmt).load(out).where(col("doc_id") > 90L)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (91L to 100L).toSeq, s"pruned scan lost rows: $got")
    // a file with no manifest entry is always kept
    val stray = new java.io.File(out, "part-stray.graftbin")
    val donor = new java.io.File(out).listFiles()
      .find(_.getName.endsWith(".graftbin")).get
    java.nio.file.Files.copy(donor.toPath, stray.toPath)
    val withStray = graft.sources.GraftBin.pruneFiles(conf, out,
      Array[Filter](GreaterThan("doc_id", java.lang.Long.valueOf(1000L))))
    assert(withStray.exists(_.endsWith("part-stray.graftbin")),
      "unknown file was skipped — skipping became a correctness bet")
  }

  test("reordered input columns resolve by name against the table schema") {
    // Spark's DSv2 write path resolves the incoming projection by NAME to
    // the table schema before it reaches the writer (the WriteBuilder's
    // order check is the backstop for byPosition paths) — a caller-side
    // column shuffle must still round-trip correctly
    val out = tmp("order")
    fixture().select(col("lang"), col("doc_id"), col("text"), col("n_chars"))
      .write.format(fmt).mode("overwrite").save(out)
    val back = spark.read.format(fmt).load(out)
      .orderBy(col("doc_id")).collect()
    assert(back.toSeq == fixture().orderBy(col("doc_id")).collect().toSeq,
      s"name resolution failed:\n${back.mkString("\n")}")
  }
}
