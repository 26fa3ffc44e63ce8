package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the r21 optimization of the q159/q179 bigram kernels: the native
  * char_bigrams generator and bigram_score expression must reproduce the
  * interpreted HOF forms they replaced — same rows, same sums, same
  * loud-on-missing behavior. The HOF forms are the defining semantics
  * (they are what the DuckDB oracle replays). */
class BigramKernelSpec extends AnyFunSuite {

  private def texts(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(159L)
    val alpha = "abcdefghijklmnopqrstuvwxyz "
    (0 until n).map { _ =>
      val len = 2 + rnd.nextInt(200)
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    } :+ "ab" :+ "  " :+ "zz" :+ "a a a"
  }

  test("char_bigrams emits exactly the HOF bigram rows") {
    val s = SparkTestSession.spark
    graft.functions.CharBigrams.register(s)
    import s.implicits._
    val df = texts(200).toDF("nt").where("length(nt) >= 2")
    val hof = df.selectExpr(
        "explode(transform(sequence(1, length(nt) - 1), i -> substring(nt, i, 2))) AS bg")
      .groupBy("bg").count()
    val gen = df.selectExpr("char_bigrams(nt)").groupBy("bg").count()
    assert(hof.exceptAll(gen).count() === 0L)
    assert(gen.exceptAll(hof).count() === 0L)
  }

  test("bigram_score equals the element_at fold, and is loud on a missing key") {
    val s = SparkTestSession.spark
    graft.functions.BigramScore.register(s)
    graft.functions.CharBigrams.register(s)
    import s.implicits._
    val df = texts(200).toDF("nt").where("length(nt) >= 2")
    val model = df.selectExpr("char_bigrams(nt)")
      .groupBy("bg").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = typedlit(model)
    val arr = typedlit(graft.functions.BigramScore.countsArray(model))
    val both = df
      .withColumn("m", m).withColumn("a", arr)
      .selectExpr("nt",
        "aggregate(sequence(1, length(nt) - 1), 0L," +
          " (acc, i) -> acc + element_at(m, substring(nt, i, 2))) AS raw_hof",
        "bigram_score(nt, a) AS raw_fast")
    assert(both.where("raw_hof != raw_fast").count() === 0L)
    // a bigram absent from the model must throw, not silently score 0
    val tiny = Seq("ab").toDF("nt")
      .withColumn("a", typedlit(graft.functions.BigramScore.countsArray(
        Map("zz" -> 1L))))
    val e = intercept[Exception] {
      tiny.selectExpr("bigram_score(nt, a) AS r").collect()
    }
    assert(e.getMessage != null)
  }

  test("countsArray round-trips the model and flags non-bigram keys") {
    val arr = graft.functions.BigramScore.countsArray(
      Map("ab" -> 7L, "z " -> 3L, "  " -> 1L))
    assert(arr(0 * 27 + 1) === 7L)   // 'a','b'
    assert(arr(25 * 27 + 26) === 3L) // 'z',' '
    assert(arr(26 * 27 + 26) === 1L) // ' ',' '
    assert(arr.count(_ >= 0) === 3)
    intercept[IllegalArgumentException] {
      graft.functions.BigramScore.countsArray(Map("abc" -> 1L))
    }
  }
}
