package graft.similarity

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the margin-ordered multiprobe enumeration (AnnLsh
  * .probeSequence): the driver-side combinatorial core of the LSH recall
  * upgrade, checked against brute-force subset enumeration. Raw scalacheck
  * generators from a fixed seed chain, matching the repo's PropertySpec
  * pattern (the scalatest-scalacheck bridge isn't among the allowed deps).
  */
class ProbeSequenceSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int, seed: Long = 42L): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(seed))(_.next)
      .map(s => g.apply(params, s))
      .collect { case Some(a) => a }
      .take(n).toSeq
  }

  private val caseGen: Gen[(Array[Double], Int)] = for {
    planes <- Gen.choose(2, 8)
    dots <- Gen.listOfN(planes, Gen.choose(-5.0, 5.0).suchThat(d => math.abs(d) > 1e-9))
    t <- Gen.choose(1, 40)
  } yield (dots.toArray, t)

  private def baseBucket(dots: Array[Double]): Int =
    dots.foldLeft(0)((b, d) => (b << 1) | (if (d >= 0) 1 else 0))

  /** Cost of reaching `bucket` from the base bucket = sum of |dots| over
    * flipped bit positions. */
  private def flipCost(dots: Array[Double], bucket: Int): Double = {
    val planes = dots.length
    val diff = bucket ^ baseBucket(dots)
    (0 until planes).collect {
      case p if (diff & (1 << (planes - 1 - p))) != 0 => math.abs(dots(p))
    }.sum
  }

  test("first bucket is the query's own; buckets unique; count = min(t, 2^planes)") {
    samples(caseGen, 300).foreach { case (dots, t) =>
      val seq = AnnLsh.probeSequence(dots, t)
      assert(seq.head == baseBucket(dots))
      assert(seq.distinct.length == seq.length)
      assert(seq.length == math.min(t, 1 << dots.length))
    }
  }

  test("buckets come out in non-decreasing flip-cost order") {
    samples(caseGen, 300).foreach { case (dots, t) =>
      val costs = AnnLsh.probeSequence(dots, t).map(flipCost(dots, _))
      assert(costs.zip(costs.tail).forall { case (a, b) => a <= b + 1e-9 },
        s"costs not sorted for dots=${dots.mkString(",")}: ${costs.mkString(",")}")
    }
  }

  test("t = 2^planes enumerates the full bucket lattice") {
    samples(caseGen, 150).foreach { case (dots, _) =>
      val n = 1 << dots.length
      val all = AnnLsh.probeSequence(dots, n)
      assert(all.sorted.toSeq == (0 until n))
    }
  }

  test("the emitted prefix is exactly a cheapest-t family (vs brute force)") {
    samples(caseGen, 300).foreach { case (dots, t) =>
      val n = 1 << dots.length
      val tt = math.min(t, n)
      val emitted = AnnLsh.probeSequence(dots, tt).map(flipCost(dots, _))
      val bruteSorted = (0 until n).map(flipCost(dots, _)).sorted.take(tt)
      emitted.sorted.zip(bruteSorted).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9,
          s"emitted ${emitted.sorted.mkString(",")} vs cheapest ${bruteSorted.mkString(",")}")
      }
    }
  }
}
