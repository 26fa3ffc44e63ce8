package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.ZoneMapStore

/**
 * Zone-map store (q183): pruning must SKIP files (the point of the
 * store), never change results (the safety contract), and the zone
 * table must stay in lockstep with the layout across absorbs.
 */
class ZoneMapSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def lifecycle(): Unit = {
    ZoneMapStore.invalidate(spark, sf)
    ZoneMapStore.buildIfStale(spark, sf)
    ZoneMapStore.absorb(spark, sf)
  }

  test("pruned range aggregate equals the unpruned full-layout scan") {
    lifecycle()
    val pruned = ZoneMapStore.rangeAggregate(spark, sf).collect().toSeq.map(_.toSeq)
    val zones = spark.read.parquet(ZoneMapStore.zonesPath(sf))
    val maxKey = zones.agg(max(col("max_key"))).head().getLong(0)
    val (lo, hi) = (maxKey * 3 / 10, maxKey * 5 / 10)
    val all = zones.select("file").collect().map(_.getString(0)).toIndexedSeq
    val full = spark.read.parquet(all: _*)
      .where(col("o_orderkey").between(lo, hi))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(col("o_orderstatus")).collect().toSeq.map(_.toSeq)
    assert(pruned == full)
  }

  test("pruning skips files: the selected set is a strict non-empty subset") {
    lifecycle()
    val (picked, _, _) = ZoneMapStore.prunedFiles(spark, sf)
    val total = spark.read.parquet(ZoneMapStore.zonesPath(sf)).count()
    assert(picked.nonEmpty)
    assert(picked.size < total,
      s"zone pruning selected all $total files — clustering or zones are broken")
  }

  test("every layout file has exactly one zone row after build + absorb") {
    lifecycle()
    val zones = spark.read.parquet(ZoneMapStore.zonesPath(sf))
      .select("file").collect().map(_.getString(0)).toSeq
    assert(zones.distinct.size == zones.size, "duplicate zone rows")
    val layoutDir = new java.io.File(
      new java.io.File(ZoneMapStore.zonesPath(sf)).getParent, "layout")
    val files = layoutDir.listFiles().map(_.getAbsolutePath)
      .filter(_.endsWith(".parquet")).toSet
    assert(zones.toSet == files,
      s"zone table out of sync: ${zones.size} zones vs ${files.size} files")
  }

  test("recluster restores disjoint zones and shrinks the pruned file set") {
    lifecycle()
    val (pickedBefore, lo, hi) = ZoneMapStore.prunedFiles(spark, sf)
    ZoneMapStore.recluster(spark, sf)
    val (pickedAfter, lo2, hi2) = ZoneMapStore.prunedFiles(spark, sf)
    assert((lo2, hi2) == (lo, hi), "recluster moved the key-space bounds")
    assert(pickedAfter.size <= pickedBefore.size,
      s"recluster widened the pruned set: ${pickedBefore.size} -> ${pickedAfter.size}")
    // zones are pairwise disjoint after the rewrite
    val zones = spark.read.parquet(ZoneMapStore.zonesPath(sf))
      .select("min_key", "max_key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    zones.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"overlapping zones after recluster: $aMax > $bMin")
      case _ =>
    }
    // and the read is unchanged
    val agg = ZoneMapStore.rangeAggregate(spark, sf).collect().toSeq.map(_.toSeq)
    ZoneMapStore.invalidate(spark, sf)
    ZoneMapStore.buildIfStale(spark, sf)
    ZoneMapStore.absorb(spark, sf)
    val plain = ZoneMapStore.rangeAggregate(spark, sf).collect().toSeq.map(_.toSeq)
    assert(agg == plain, "recluster changed the range aggregate")
  }

  test("zone rows carry exact per-file min/max under overlapping absorb") {
    lifecycle()
    val zones = spark.read.parquet(ZoneMapStore.zonesPath(sf)).collect()
    for (z <- zones.take(5)) {
      val f = z.getString(z.fieldIndex("file"))
      val r = spark.read.parquet(f)
        .agg(min(col("o_orderkey")), max(col("o_orderkey")), count(lit(1))).head()
      assert(r.getLong(0) == z.getLong(z.fieldIndex("min_key")), f)
      assert(r.getLong(1) == z.getLong(z.fieldIndex("max_key")), f)
      assert(r.getLong(2) == z.getLong(z.fieldIndex("n_rows")), f)
    }
  }
}
