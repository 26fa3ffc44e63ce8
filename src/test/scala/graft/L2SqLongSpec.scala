package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * [[graft.functions.L2SqLong]] — the verified-ML family's native
 * distance kernel. It replaced the `aggregate(zip_with(...))` HOF chain
 * in every L2 site (q207/q209/q210/q214/q215/q217/q218/q219), so the
 * contract is BIT-EQUALITY with that chain, compiled codegen (no silent
 * interpreter fallback), and null propagation.
 */
class L2SqLongSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("matches the HOF chain bit-for-bit on random integer-grid vectors") {
    graft.functions.L2SqLong.register(spark)
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (i.toLong,
        Seq.fill(64)(rng.nextInt(4000001).toLong - 2000000L),
        Seq.fill(64)(rng.nextInt(4000001).toLong - 2000000L))
    }
    val out = rows.toDF("id", "a", "b").selectExpr("id",
      "l2sq_long(a, b) AS native",
      "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v) AS hof")
      .collect()
    assert(out.length == 200)
    for (r <- out)
      assert(r.getLong(1) == r.getLong(2),
        s"row ${r.getLong(0)}: native ${r.getLong(1)} != hof ${r.getLong(2)}")
  }

  test("generated code actually compiles (no silent interpreter fallback)") {
    graft.functions.L2SqLong.register(spark)
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val out = spark.sql(
        "SELECT l2sq_long(array(1L, 2L, 3L), array(4L, 6L, 9L)) AS d").collect()
      assert(out.head.getLong(0) == 9L + 16L + 36L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("null surface matches the HOF chain: length mismatch and null elements read NULL") {
    graft.functions.L2SqLong.register(spark)
    // zip_with pads the shorter side with nulls and a null poisons the
    // aggregate — so the chain returns NULL for both shapes, and the
    // kernel must too (a silent 0 or truncated sum would be a wrong
    // distance for any SQL caller)
    val rows = spark.sql(
      """SELECT
        |  l2sq_long(array(1L, 2L, 3L), array(1L)) AS mismatch_native,
        |  aggregate(zip_with(array(1L, 2L, 3L), array(1L),
        |    (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v) AS mismatch_hof,
        |  l2sq_long(array(1L, cast(null AS bigint)), array(1L, 2L)) AS nullelem_native,
        |  aggregate(zip_with(array(1L, cast(null AS bigint)), array(1L, 2L),
        |    (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v) AS nullelem_hof
        |""".stripMargin).collect().head
    assert(rows.isNullAt(0) && rows.isNullAt(1),
      "length mismatch must read NULL on both paths")
    assert(rows.isNullAt(2) && rows.isNullAt(3),
      "a null element must read NULL on both paths")
  }

  test("null propagation and type checking") {
    graft.functions.L2SqLong.register(spark)
    val nullOut = spark.sql(
      "SELECT l2sq_long(cast(null AS array<bigint>), array(1L)) AS d").collect()
    assert(nullOut.head.isNullAt(0))
    val err = intercept[Exception](spark.sql(
      "SELECT l2sq_long(array('x'), array(1L))").collect())
    assert(err.getMessage.contains("l2sq_long") ||
      err.getMessage.toLowerCase.contains("type"),
      s"wrong-type error not surfaced: ${err.getMessage}")
  }
}
