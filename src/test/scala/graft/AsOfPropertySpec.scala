package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AsOfJoinNative, AsOfMergeJoin, TopOnePerKey}

/**
 * Property tests for the as-of join trio: the range-join + top-1 form
 * (q16's shape), the DataFrame sort-merge operator (q33's AsOfMergeJoin),
 * and the native physical operator (q47's AsOfJoinNative) must agree
 * row-for-row with a driver-side brute force on ARBITRARY inputs — the
 * covering queries share one oracle on one dataset, which never exercises
 * null keys, empty sides, tie storms, or all-late rows.
 *
 * Semantics under test: inner as-of — per left row the single right row
 * with equal key and greatest time <= left time, ties broken by greatest
 * tie-break; null keys/times never match.
 *
 * Raw scalacheck generators from a fixed seed chain (the
 * scalatest-scalacheck bridge isn't among the allowed deps), so failures
 * reproduce deterministically.
 */
class AsOfPropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark


  /** Sample count: CI default, multiplied by GRAFT_PROP_MULT for deeper
    * local bug-hunt runs (e.g. GRAFT_PROP_MULT=10 sbt test). */
  private def propN(base: Int): Int =
    base * sys.env.getOrElse("GRAFT_PROP_MULT", "1").toInt

  private def samples[A](g: Gen[A], n: Int, seed: Long = 42L): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(seed))(_.next)
      .map(s => g.apply(params, s))
      .collect { case Some(a) => a }
      .take(n).toSeq
  }

  private case class Evt(id: Long, user: Option[Long], ts: Option[Long])

  // Few users + a tiny time range make equal (user, ts) pairs — tie
  // storms — and per-user candidate pileups the common case, not the
  // exception; ~10% null keys and times exercise the never-match rule.
  private val genUser: Gen[Option[Long]] =
    Gen.frequency(9 -> Gen.chooseNum(0L, 4L).map(Some(_)), 1 -> Gen.const(None))
  private val genTs: Gen[Option[Long]] =
    Gen.frequency(9 -> Gen.chooseNum(0L, 6L).map(Some(_)), 1 -> Gen.const(None))

  private val genDataset: Gen[(List[Evt], List[Evt])] = for {
    nc <- Gen.chooseNum(0, 25)
    np <- Gen.chooseNum(0, 25)
    cs <- Gen.listOfN(nc, Gen.zip(genUser, genTs))
    ps <- Gen.listOfN(np, Gen.zip(genUser, genTs))
  } yield (
    cs.zipWithIndex.map { case ((u, t), i) => Evt(i.toLong, u, t) },
    // purchase ids offset so click/purchase id collisions can't mask bugs
    ps.zipWithIndex.map { case ((u, t), i) => Evt(1000L + i, u, t) })

  private def clicksDf(cs: Seq[Evt]): DataFrame = {
    val schema = StructType(Seq(
      StructField("click_id", LongType, nullable = false),
      StructField("user_id", LongType, nullable = true),
      StructField("click_ts", TimestampType, nullable = true)))
    val rows = cs.map(c => Row(c.id, c.user.map(Long.box).orNull,
      c.ts.map(s => new Timestamp(s * 1000L)).orNull))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  private def purchasesDf(ps: Seq[Evt]): DataFrame = {
    val schema = StructType(Seq(
      StructField("purchase_id", LongType, nullable = false),
      StructField("p_user_id", LongType, nullable = true),
      StructField("p_ts", TimestampType, nullable = true)))
    val rows = ps.map(p => Row(p.id, p.user.map(Long.box).orNull,
      p.ts.map(s => new Timestamp(s * 1000L)).orNull))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  /** q16's shape: bounded range join + max_by top-1 aggregation. */
  private def viaTopOne(clicks: DataFrame, purchases: DataFrame): DataFrame =
    TopOnePerKey.latest(
        clicks.join(purchases, col("user_id") === col("p_user_id"))
          .filter(col("p_ts") <= col("click_ts")),
        Seq("click_id"), Seq(col("p_ts"), col("purchase_id")))
      .select(col("click_id"), col("purchase_id"))

  /** q33's shape: co-partitioned DataFrame sort-merge. */
  private def viaMerge(clicks: DataFrame, purchases: DataFrame): DataFrame =
    AsOfMergeJoin.joinAsOf(clicks, purchases,
        leftKey = "user_id", rightKey = "p_user_id",
        leftTime = "click_ts", rightTime = "p_ts", rightTieBreak = "purchase_id")
      .select(col("click_id"), col("purchase_id"))

  /** q47's shape: native SparkPlan via the planner strategy. */
  private def viaExec(clicks: DataFrame, purchases: DataFrame): DataFrame =
    AsOfJoinNative.joinAsOf(clicks, purchases,
        leftKey = "user_id", rightKey = "p_user_id",
        leftTime = "click_ts", rightTime = "p_ts", rightTieBreak = "purchase_id")
      .select(col("click_id"), col("purchase_id"))

  /** Driver-side brute force: the executable spec of the semantics. */
  private def brute(cs: Seq[Evt], ps: Seq[Evt]): Set[(Long, Long)] =
    cs.flatMap { c =>
      for {
        u <- c.user
        t <- c.ts
        best <- {
          val cands = ps.collect {
            case p if p.user.contains(u) && p.ts.exists(_ <= t) => (p.ts.get, p.id)
          }
          if (cands.isEmpty) None else Some(cands.max)
        }
      } yield (c.id, best._2)
    }.toSet

  private def resultSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def checkAll(cs: Seq[Evt], ps: Seq[Evt], label: String): Unit = {
    val (cdf, pdf) = (clicksDf(cs), purchasesDf(ps))
    val want = brute(cs, ps)
    // Also catch duplicate output rows (a Set comparison alone would not):
    // each implementation must emit exactly one row per matched click.
    Seq("topOne" -> viaTopOne(cdf, pdf), "merge" -> viaMerge(cdf, pdf),
        "exec" -> viaExec(cdf, pdf)).foreach { case (impl, df) =>
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows.size == rows.distinct.size,
        s"[$label/$impl] emitted duplicate rows: $rows")
      assert(rows.toSet == want,
        s"[$label/$impl] got ${rows.toSet.toSeq.sorted} want ${want.toSeq.sorted} " +
          s"on clicks=$cs purchases=$ps")
    }
  }

  test("all three as-of implementations match brute force on random datasets") {
    samples(genDataset, propN(12), seed = 20260812L).zipWithIndex.foreach {
      case ((cs, ps), i) => checkAll(cs, ps, s"random#$i")
    }
  }

  test("empty sides: no matches, no failures") {
    checkAll(Nil, Nil, "both-empty")
    checkAll(Seq(Evt(0, Some(1), Some(3))), Nil, "right-empty")
    checkAll(Nil, Seq(Evt(1000, Some(1), Some(3))), "left-empty")
  }

  test("all-late purchases: every purchase after every click matches nothing") {
    val cs = (0 until 6).map(i => Evt(i.toLong, Some(i % 2L), Some(i % 3L)))
    val ps = (0 until 6).map(i => Evt(1000L + i, Some(i % 2L), Some(10L + i)))
    assert(brute(cs, ps).isEmpty) // meta-check: the case is what it claims
    checkAll(cs, ps, "all-late")
  }

  test("tie storm: many purchases at the same (user, ts) pick the max purchase_id") {
    val cs = Seq(Evt(0, Some(1), Some(5)), Evt(1, Some(1), Some(4)))
    val ps = (0 until 8).map(i => Evt(1000L + i, Some(1), Some(4)))
    val want = Set((0L, 1007L), (1L, 1007L))
    assert(brute(cs, ps) == want) // meta-check
    checkAll(cs, ps, "tie-storm")
  }

  test("null keys and times never match and never crash") {
    val cs = Seq(
      Evt(0, None, Some(5)), Evt(1, Some(1), None), Evt(2, None, None),
      Evt(3, Some(1), Some(5)))
    val ps = Seq(
      Evt(1000, None, Some(1)), Evt(1001, Some(1), None), Evt(1002, None, None),
      Evt(1003, Some(1), Some(2)))
    assert(brute(cs, ps) == Set((3L, 1003L))) // meta-check
    checkAll(cs, ps, "nulls")
  }
}
