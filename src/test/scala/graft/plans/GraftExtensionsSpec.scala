package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/**
 * The one-config install path: a session built with ONLY
 * `.withExtensions(new GraftExtensions)` (the code equivalent of
 * `--conf spark.sql.extensions=graft.plans.GraftExtensions`) must have
 * every stateless native function SQL-resolvable with no driver-side
 * `register()` call, plus the rewrite rule and as-of strategy — the
 * deployment story for a pure-SQL user on a cluster.
 */
class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions session: SQL functions resolve, rewrite rule fires — no register() calls") {
    val orig = SparkTestSession.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]").appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      assert(s2 ne orig, "builder returned the extension-less session")
      // every injected name resolves in the fresh session's registry
      GraftExtensions.functions.map(_._1).foreach { n =>
        assert(s2.sessionState.functionRegistry.functionExists(FunctionIdentifier(n)),
          s"$n not installed by the extension")
      }
      // functions evaluate through pure SQL (simhash votes over token
      // hashes; minhash_sig over a shingle array; repetition over text)
      val r = s2.sql(
        "SELECT hamming_distance(simhash(array(1L, 2L, 3L)), " +
          "simhash(array(1L, 2L, 7L))) AS d, " +
          "size(minhash_sig(array('w x', 'x y', 'y z'))) AS m, " +
          "repetition_chars('ab ab ab ab') AS rep").head()
      val d = r.getAs[Any]("d").toString.toLong
      assert(d >= 0L && d <= 64L, s"hamming_distance out of range: $d")
      assert(r.getAs[Int]("m") == 12, "minhash_sig must emit the 12-band signature")
      // the type-check failure path reads as a message, not a crash
      // (the simpleString(10)-as-charAt bug this spec caught)
      val err = intercept[Exception](s2.sql("SELECT simhash('not an array')").head())
      assert(err.getMessage.contains("array<bigint>") ||
        err.getMessage.toLowerCase.contains("type"), err.getMessage)

      // the injected optimizer rule rewrites row_number()=1 to max_by
      import s2.implicits._
      Seq(("a", 1L, 10.0), ("a", 2L, 30.0), ("b", 3L, 5.0))
        .toDF("k", "id", "v").createOrReplaceTempView("ext_t")
      val top = s2.sql(
        """SELECT k, id, v FROM (
          |  SELECT k, id, v, row_number() OVER (
          |    PARTITION BY k ORDER BY v DESC, id DESC) AS rn FROM ext_t) x
          |WHERE rn = 1""".stripMargin)
      assert(top.queryExecution.optimizedPlan.toString.toLowerCase.contains("max_by"),
        s"injected rewrite rule did not fire:\n${top.queryExecution.optimizedPlan}")
      assert(top.orderBy("k").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        == Seq(("a", 2L), ("b", 3L)))
    } finally {
      // s2 shares the JVM's one SparkContext — never stop() it; just
      // restore the shared session as default/active for later suites
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
