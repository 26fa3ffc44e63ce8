package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Physical-layout features that matter at 100 TB: hive-style partitioned
 * writes with partition pruning at the scan, and bucketed tables whose
 * co-located join needs no shuffle exchange.
 */
class PartitioningSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("partitionBy write + partition-pruned scan") {
    val dir = Files.createTempDirectory("graft_part").toString + "/events"
    spark.read.parquet(s"$sf/events.parquet")
      .write.partitionBy("event_type").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"), scan)
    // only the purchase directory is read
    val expected = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "purchase").count()
    assert(pruned.count() === expected)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft_bucket").toString
    // explicit path => external tables; warehouse dir (a static conf) is
    // never touched. newSession isolates the broadcast-threshold override.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    s2.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    s2.read.parquet(s"$sf/customer.parquet")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/customer_b").saveAsTable("customer_b")
    val joined = s2.table("orders_b")
      .join(s2.table("customer_b"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val p = joined.queryExecution.executedPlan.toString
    // the join itself consumes bucketed scans directly — the only
    // exchange allowed is the one feeding the final aggregation
    val joinPart = p.substring(p.indexOf("Join"))
    assert(!joinPart.contains("Exchange hashpartitioning(o_custkey"),
      s"bucketed join still shuffles:\n$p")
    assert(!joinPart.contains("Exchange hashpartitioning(c_custkey"),
      s"bucketed join still shuffles:\n$p")
    // result parity with the unbucketed join
    val expected = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === expected)
  }
}
