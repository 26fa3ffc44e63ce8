package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.SaltedJoin

/**
 * Property test for the skew-salted join: SaltedJoin documents itself as a
 * purely PHYSICAL rewrite — identical results to the plain inner equi-join
 * it replaces. q34's oracle proves that on one dataset; this asserts it on
 * arbitrary data (heavy key skew, duplicate rows, null keys, empty sides,
 * salts coarser and finer than the key count), compared as multisets since
 * joins can legitimately emit duplicate rows.
 */
class SaltedJoinPropertySpec extends AnyFunSuite {

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

  // ~60% of left rows land on key 1 — the hot-key shape salting exists for.
  private val genLeftKey: Gen[Option[Long]] = Gen.frequency(
    6 -> Gen.const(Some(1L)), 3 -> Gen.chooseNum(0L, 5L).map(Some(_)),
    1 -> Gen.const(None))
  private val genDataset: Gen[(List[(Option[Long], Long)], List[(Option[Long], Long)])] =
    for {
      nl <- Gen.chooseNum(0, 40)
      nr <- Gen.chooseNum(0, 10)
      ls <- Gen.listOfN(nl, Gen.zip(genLeftKey, Gen.chooseNum(0L, 3L)))
      rs <- Gen.listOfN(nr, Gen.zip(genLeftKey, Gen.chooseNum(100L, 103L)))
    } yield (ls, rs)

  private def df(rows: Seq[(Option[Long], Long)], key: String, value: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(key, LongType, nullable = true),
      StructField(value, LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1.map(Long.box).orNull, r._2)), 3), schema)
  }

  private def multiset(d: DataFrame): Map[Seq[Any], Int] =
    d.collect().map(_.toSeq).toSeq.groupBy(identity).map { case (k, v) => (k, v.size) }

  test("salted join equals the plain inner equi-join on skewed random data") {
    samples(genDataset, propN(8), seed = 5501L).zipWithIndex.foreach { case ((ls, rs), i) =>
      val l = df(ls, "lk", "lv")
      val r = df(rs, "rk", "rv")
      val plain = multiset(l.join(r, l("lk") === r("rk")))
      for (numSalts <- Seq(1, 3, 8)) {
        val salted = multiset(SaltedJoin.join(l, r, "lk", "rk", numSalts))
        assert(salted == plain,
          s"[case#$i salts=$numSalts] salted join diverged: $salted vs $plain " +
            s"on left=$ls right=$rs")
      }
    }
  }
}
