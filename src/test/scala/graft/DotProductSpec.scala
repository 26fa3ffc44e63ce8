package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * [[graft.functions.DotLong]] / [[graft.functions.DotDouble]] — the
 * dot-product siblings of the L2 kernel. DotLong replaced the q208
 * perceptron margin's `aggregate(zip_with(...))` chain; DotDouble
 * replaced the verified-ML family's norm fold `aggregate(transform(ed,
 * x -> x * x), 0.0D, (a, b) -> a + b)` (q209/q214/q215/q217/q218/q219
 * grids). The contract is L2SqLongSpec's: BIT-EQUALITY with the chain,
 * compiled codegen, and the chain's exact null surface.
 */
class DotProductSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("dot_long matches the HOF chain bit-for-bit on random integer-grid vectors") {
    graft.functions.DotLong.register(spark)
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = (1 to 200).map { i =>
      (i.toLong,
        Seq.fill(64)(rng.nextInt(4000001).toLong - 2000000L),
        Seq.fill(64)(rng.nextInt(4000001).toLong - 2000000L))
    }
    val out = rows.toDF("id", "a", "b").selectExpr("id",
      "dot_long(a, b) AS native",
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS hof")
      .collect()
    assert(out.length == 200)
    for (r <- out)
      assert(r.getLong(1) == r.getLong(2),
        s"row ${r.getLong(0)}: native ${r.getLong(1)} != hof ${r.getLong(2)}")
  }

  test("dot_double matches the norm fold bit-for-bit (same IEEE accumulation order)") {
    graft.functions.DotDouble.register(spark)
    import spark.implicits._
    val rng = new scala.util.Random(13)
    // float32-born values like the embeddings column, including
    // negatives and magnitudes spanning several exponents — bit-equality
    // here is what the semGrid cross-engine assumption rests on
    val rows = (1 to 200).map { i =>
      (i.toLong, Seq.fill(64)((rng.nextFloat() * 4f - 2f).toDouble))
    }
    val out = rows.toDF("id", "ed").selectExpr("id",
      "dot_double(ed, ed) AS native",
      "aggregate(transform(ed, x -> x * x), cast(0.0 AS double), (a, b) -> a + b) AS hof")
      .collect()
    assert(out.length == 200)
    for (r <- out) {
      val n = java.lang.Double.doubleToRawLongBits(r.getDouble(1))
      val h = java.lang.Double.doubleToRawLongBits(r.getDouble(2))
      assert(n == h,
        s"row ${r.getLong(0)}: native bits $n != hof bits $h")
    }
  }

  test("generated code actually compiles (no silent interpreter fallback)") {
    graft.functions.DotLong.register(spark)
    graft.functions.DotDouble.register(spark)
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val out = spark.sql(
        "SELECT dot_long(array(1L, 2L, 3L), array(4L, 6L, 9L)) AS d, " +
          "dot_double(array(0.5D, 2.0D), array(4.0D, 0.25D)) AS dd").collect()
      assert(out.head.getLong(0) == 4L + 12L + 27L)
      assert(out.head.getDouble(1) == 2.5)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("null surface matches the HOF chain: length mismatch and null elements read NULL") {
    graft.functions.DotLong.register(spark)
    graft.functions.DotDouble.register(spark)
    val rows = spark.sql(
      """SELECT
        |  dot_long(array(1L, 2L, 3L), array(1L)) AS mismatch_native,
        |  aggregate(zip_with(array(1L, 2L, 3L), array(1L),
        |    (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS mismatch_hof,
        |  dot_long(array(1L, cast(null AS bigint)), array(1L, 2L)) AS nullelem_native,
        |  aggregate(zip_with(array(1L, cast(null AS bigint)), array(1L, 2L),
        |    (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS nullelem_hof,
        |  dot_double(array(1.0D, cast(null AS double)), array(1.0D, 2.0D)) AS d_nullelem,
        |  dot_double(array(1.0D, 2.0D), array(1.0D)) AS d_mismatch
        |""".stripMargin).collect().head
    assert(rows.isNullAt(0) && rows.isNullAt(1),
      "length mismatch must read NULL on both paths")
    assert(rows.isNullAt(2) && rows.isNullAt(3),
      "a null element must read NULL on both paths")
    assert(rows.isNullAt(4) && rows.isNullAt(5),
      "dot_double must carry the same null surface")
  }

  test("null propagation and type checking") {
    graft.functions.DotLong.register(spark)
    val nullOut = spark.sql(
      "SELECT dot_long(cast(null AS array<bigint>), array(1L)) AS d").collect()
    assert(nullOut.head.isNullAt(0))
    val err = intercept[Exception](spark.sql(
      "SELECT dot_long(array('x'), array(1L))").collect())
    assert(err.getMessage.contains("dot_long") ||
      err.getMessage.toLowerCase.contains("type"),
      s"wrong-type error not surfaced: ${err.getMessage}")
  }
}
