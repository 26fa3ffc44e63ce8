package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{Caches, SearchStore}

/**
 * Inverted-index search store (q181/q182): the absorbed index answers
 * exactly what the from-scratch computation answers, the read plans
 * never touch the corpus and physically prune the term-bucket
 * partitions, and compaction is reader-invisible.
 */
class SearchStoreSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def freshLifecycle(): Unit = {
    SearchStore.invalidate(spark, sf)
    SearchStore.buildIfStale(spark, sf)
    SearchStore.absorb(spark, sf)
  }

  test("bm25 from the absorbed store == the live q99 scan computation") {
    freshLifecycle()
    val live = Caches.scoped(
      rows(SparkEntry.queries("q99_bm25_search")(spark, sf)))
    val stored = Caches.scoped(rows(SearchStore.bm25(spark, sf)))
    assert(stored == live)
  }

  test("phrase counts match a brute-force token-adjacency scan") {
    freshLifecycle()
    val brute = queries.Tables.t(spark, sf, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS ts")
      .selectExpr("doc_id",
        """cast(size(filter(sequence(0, size(ts) - 2),
          |  i -> ts[i] = 'merge' AND ts[i + 1] = 'window')) AS bigint)
          |  AS phrase_tf""".stripMargin)
      .where(col("phrase_tf") > 0)
      .orderBy(col("phrase_tf").desc, col("doc_id")).limit(10)
    val stored = Caches.scoped(rows(SearchStore.phrase(spark, sf)))
    assert(stored == rows(brute))
    assert(stored.nonEmpty, "phrase never occurs — the test is vacuous")
  }

  test("read plans prune term buckets and never scan the corpus") {
    freshLifecycle()
    for (df <- Seq(SearchStore.bm25(spark, sf), SearchStore.phrase(spark, sf))) {
      val p = Caches.scoped(df.queryExecution.executedPlan.toString)
      assert("""PartitionFilters: \[[^\]]*tb""".r.findFirstIn(p).isDefined,
        s"postings scan lost its tb partition pruning:\n$p")
      assert(!p.contains("documents.parquet"),
        s"store read touched the corpus:\n$p")
    }
  }

  test("compact folds the absorb layers and is reader-invisible") {
    freshLifecycle()
    val before = Caches.scoped(rows(SearchStore.bm25(spark, sf)))
    val postingsDir = new java.io.File(SearchStore.postingsPath(sf))
    def parquetFiles: Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(postingsDir).count(_.getName.endsWith(".parquet"))
    }
    val layered = parquetFiles
    SearchStore.compact(spark, sf)
    assert(parquetFiles < layered,
      s"compact did not shrink the postings file count ($layered)")
    assert(Caches.scoped(rows(SearchStore.bm25(spark, sf))) == before)
  }

  test("delete hides victims from the live read; purge folds them out for real") {
    // q187's oracle cross-checks the ranking; this pins the mechanics
    SearchStore.invalidate(spark, sf, "spec_del")
    SearchStore.buildIfStale(spark, sf, "spec_del")
    SearchStore.absorbFrame(spark,
      queries.Tables.t(spark, sf, "documents").where("doc_id % 10 >= 7"),
      sf, "spec_del")
    val before = Caches.scoped(rows(SearchStore.bm25(spark, sf, "spec_del")))
    SearchStore.delete(spark, sf, "doc_id % 7 = 3", "spec_del")
    val live = Caches.scoped(rows(SearchStore.bm25Live(spark, sf, "spec_del")))
    assert(live != before, "delete was invisible to the live read")
    val liveIds = live.map(_.head.asInstanceOf[Long])
    assert(liveIds.forall(_ % 7 != 3), "a tombstoned doc survived in the ranking")
    // purge: read unchanged, tombstone dir gone, plain read now agrees
    SearchStore.purge(spark, sf, "spec_del")
    assert(Caches.scoped(rows(SearchStore.bm25Live(spark, sf, "spec_del"))) == live)
    val ts = new java.io.File(
      new java.io.File(SearchStore.postingsPath(sf, "spec_del")).getParent,
      "tombstones")
    assert(!ts.exists(), "purge left the tombstone set behind")
    assert(Caches.scoped(rows(SearchStore.bm25(spark, sf, "spec_del"))) == live,
      "post-purge plain read still sees dead postings or stats")
  }

  test("snippet hydration touches only the hit set (broadcast join, no corpus shuffle)") {
    freshLifecycle()
    val df = SearchStore.snippet(spark, sf)
    val p = Caches.scoped(df.queryExecution.executedPlan.toString)
    assert(p.contains("BroadcastHashJoin"), s"hit hydration not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-scale join in snippet path:\n$p")
    val out = Caches.scoped(rows(df))
    assert(out.nonEmpty && out.size <= 10)
    // every snippet contains the phrase itself
    val snips = Caches.scoped(
      SearchStore.snippet(spark, sf).collect().toSeq.map(_.getAs[String]("snippet")))
    assert(snips.forall(_.contains("merge window")), snips.mkString("; "))
  }

  test("stats table stays additive: build writes one partial, absorb one more") {
    SearchStore.invalidate(spark, sf)
    SearchStore.buildIfStale(spark, sf)
    assert(spark.read.parquet(SearchStore.statsPath(sf)).count() == 1)
    SearchStore.absorb(spark, sf)
    assert(spark.read.parquet(SearchStore.statsPath(sf)).count() == 2)
  }
}
