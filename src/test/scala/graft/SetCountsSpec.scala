package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins graft.functions.SetCounts (`intersect_count` / `union_count`)
  * against the builtin `size(array_intersect)` / `size(array_union)`
  * forms they replace in the jaccard/containment verifiers — dedup,
  * null, and empty edge cases included, plus the real corpus shapes
  * (the q27 shingle pairs at sf0.001). */
class SetCountsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  private def check(df: org.apache.spark.sql.DataFrame,
      a: String, b: String): Unit = {
    graft.functions.SetCounts.register(spark)
    val bad = df.selectExpr(
      s"size(array_intersect($a, $b)) AS i0",
      s"intersect_count($a, $b) AS i1",
      s"size(array_union($a, $b)) AS u0",
      s"union_count($a, $b) AS u1")
      .where("i0 != i1 OR u0 != u1")
    assert(bad.count() == 0, bad.collect().take(5).mkString("; "))
  }

  test("string arrays: dedup, shared null, empties match the builtins") {
    import spark.implicits._
    val rows = Seq(
      (Seq[String]("a", "b", "c"), Seq[String]("b", "c", "d")),
      (Seq[String]("a", "a", "b"), Seq[String]("a", "b", "b")), // dupes
      (Seq[String](null, "a"), Seq[String]("a", null)),         // shared null
      (Seq[String](null, "a"), Seq[String]("b")),               // one-side null
      (Seq[String](), Seq[String]("x")),                        // empty side
      (Seq[String](), Seq[String]()),
      (Seq[String]("x", null, "x", null), Seq[String](null)))
      .toDF("sa", "sb")
    check(rows, "sa", "sb")
  }

  test("bigint arrays match the builtins") {
    import spark.implicits._
    val rows = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
      (Seq(1L, 1L, 2L), Seq(1L)),
      (Seq.empty[Long], Seq(7L)))
      .toDF("sa", "sb")
    check(rows, "sa", "sb")
  }

  test("real corpus shingle pairs match the builtins") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.queries.TextPipeline.shinglesOf(
      graft.queries.Tables.t(spark, dir, "documents"))
    val pairs = docs.selectExpr("doc_id AS a_id", "sh AS sa")
      .crossJoin(docs.selectExpr("doc_id AS b_id", "sh AS sb"))
      .where("a_id < b_id AND a_id % 7 = 0 AND b_id % 11 = 0")
    check(pairs, "sa", "sb")
  }
}
