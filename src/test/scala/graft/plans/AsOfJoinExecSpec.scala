package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Native as-of physical operator: planning, semantics, edge cases. */
class AsOfJoinExecSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def leftDf = {
    import spark.implicits._
    Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")), // before any right row for key 20
      (4L, 30L, ts("2024-01-01 11:00:00")), // key with no right rows at all
      (5L, 10L, ts("2024-01-01 10:30:00"))
    ).toDF("l_id", "k", "lt")
  }

  private def rightDf = {
    import spark.implicits._
    Seq(
      (100L, 10L, ts("2024-01-01 09:30:00")),
      (101L, 10L, ts("2024-01-01 10:30:00")), // tie on time with 102
      (102L, 10L, ts("2024-01-01 10:30:00")), // higher tie-break wins
      (103L, 20L, ts("2024-01-01 10:00:00"))
    ).toDF("r_id", "rk", "rt")
  }

  test("plan uses AsOfMergeJoinExec and results match the window oracle") {
    val joined = AsOfJoinNative.joinAsOf(leftDf, rightDf,
      "k", "rk", "lt", "rt", "r_id")
    assert(joined.queryExecution.executedPlan.toString.contains("AsOfMergeJoin"),
      joined.queryExecution.executedPlan.toString)
    val got = joined.select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // expected: per left row, latest right at-or-before, max r_id on ties;
    // l3 (too early) and l4 (no key) drop out
    assert(got === Set((1L, 100L), (2L, 102L), (5L, 102L)))
  }

  test("agrees with the dataframe-composed AsOfMergeJoin on events data") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.t(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val native = AsOfJoinNative.joinAsOf(clicks, purchases,
        "user_id", "p_user_id", "click_ts", "p_ts", "purchase_id")
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val composed = AsOfMergeJoin.joinAsOf(clicks, purchases,
        "user_id", "p_user_id", "click_ts", "p_ts", "purchase_id")
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native === composed)
    assert(native.nonEmpty)
  }

  test("null keys and times never match") {
    import spark.implicits._
    val l = Seq((1L, Some(10L), Some(ts("2024-01-01 10:00:00"))),
      (2L, None, Some(ts("2024-01-01 10:00:00"))),
      (3L, Some(10L), None))
      .toDF("l_id", "k", "lt")
    val r = Seq((100L, Some(10L), Some(ts("2024-01-01 09:00:00")))    ,
      (101L, None, Some(ts("2024-01-01 09:00:00"))))
      .toDF("r_id", "rk", "rt")
    val got = AsOfJoinNative.joinAsOf(l, r, "k", "rk", "lt", "rt", "r_id")
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set((1L, 100L)))
  }
}
