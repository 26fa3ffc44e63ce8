package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * The native [[graft.functions.MinhashSignature]] must be bit-equal to
 * the interpreted HOF chain it replaced (transform to (h1, h2) structs,
 * then 12 array_min ∘ transform folds) on the real corpus — both are
 * the conv(substring(md5(t), ...), 16, 10) integers the DuckDB oracle
 * computes.
 */
class MinhashSigSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("native signature equals the HOF form on every corpus doc") {
    graft.functions.MinhashSignature.register(spark)
    val docs = graft.queries.Tables.t(spark, sf, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS tk")
      .where("size(tk) >= 3")
      .selectExpr("doc_id",
        """array_distinct(transform(sequence(1, size(tk) - 2),
          |  i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1), ' ',
          |              element_at(tk, i + 2)))) AS sh""".stripMargin)
    val hs = "transform(sh, t -> struct(" +
      "cast(conv(substring(md5(t), 1, 8), 16, 10) AS bigint) AS h1, " +
      "cast(conv(substring(md5(t), 9, 8), 16, 10) AS bigint) AS h2))"
    val hofSig = s"array(${(0 until 12).map(j =>
      s"array_min(transform($hs, h -> pmod(h.h1 + $j * h.h2, 4294967296)))").mkString(", ")})"
    val rows = docs
      .selectExpr("doc_id", "minhash_sig(sh) AS native", s"$hofSig AS hof")
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"doc ${r.getLong(0)}: native ${r.getSeq[Long](1)} != hof ${r.getSeq[Long](2)}")
  }

  test("generated code actually compiles (no silent interpreter fallback)") {
    // UnsafeProjection codegen failures normally downgrade to interpreted
    // mode with only a WARN — an earlier doGenCode emitted
    // `(d[1] & 0xffL) << 16` chains that Janino rejects, so every
    // "native codegen" run was interpreted. CODEGEN_ONLY turns that
    // silent perf cliff into a test failure.
    graft.functions.MinhashSignature.register(spark)
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val out = spark.sql(
        "SELECT minhash_sig(array('a b c', 'd e f', 'g h i')) AS ms").collect()
      assert(out.head.getSeq[Long](0).size == 12)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("null and empty inputs behave") {
    graft.functions.MinhashSignature.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a b c", "d e f")),
      (2L, Seq.empty[String])
    ).toDF("id", "sh")
    val out = df.selectExpr("id", "minhash_sig(sh) AS ms").collect()
    assert(out.find(_.getLong(0) == 1L).get.getSeq[Long](1).size == 12)
    // empty shingle set: all minima stay at the 2^32-1 sentinel
    assert(out.find(_.getLong(0) == 2L).get.getSeq[Long](1)
      .forall(_ == 4294967295L))
    val nullOut = spark.sql("SELECT minhash_sig(cast(null AS array<string>)) AS ms")
      .collect()
    assert(nullOut.head.isNullAt(0))
  }
}
