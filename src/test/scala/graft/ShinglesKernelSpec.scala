package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r21 optimization of the shingle projection: the native
  * shingles3 kernel must reproduce the defining HOF form
  * (array_distinct ∘ transform ∘ sequence, [[graft.queries.TextPipeline
  * .shinglesHof]]) element for element — order, duplicates, nulls, and
  * sub-3-token arrays included. */
class ShinglesKernelSpec extends AnyFunSuite {

  test("shingles3 equals the HOF form element-for-element") {
    val s = SparkTestSession.spark
    graft.functions.Shingles3.register(s)
    import s.implicits._
    val rnd = new scala.util.Random(102L)
    val words = Vector("a", "b", "merge", "window", "x", "", "tok")
    val rows: Seq[Seq[String]] =
      (0 until 300).map { _ =>
        Seq.fill(rnd.nextInt(40))(words(rnd.nextInt(words.length)))
      } ++ Seq(
        Seq(),                       // empty
        Seq("a"), Seq("a", "b"),     // below 3 tokens
        Seq("a", "b", "c"),          // exactly one shingle
        Seq("a", "a", "a", "a", "a") // all-duplicate shingles
      )
    val df = rows.toDF("tk")
      .selectExpr(s"${graft.queries.TextPipeline.shinglesHof} AS hof",
        "shingles3(tk) AS fast")
    assert(df.where("NOT (hof <=> fast)").count() === 0L)
  }

  test("shingles3 matches HOF null-token handling") {
    val s = SparkTestSession.spark
    graft.functions.Shingles3.register(s)
    import s.implicits._
    val df = Seq(
      (Seq[Option[String]](Some("a"), None, Some("c"), Some("d"), None)),
      (Seq[Option[String]](None, None, None))
    ).toDF("tk")
      .selectExpr(s"${graft.queries.TextPipeline.shinglesHof} AS hof",
        "shingles3(tk) AS fast")
      .collect()
    df.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
  }
}
