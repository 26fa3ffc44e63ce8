package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r21 optimization of q108's z-value: the branchless magic-
  * number Morton spread ([[graft.queries.Physical.mortonZ]]) must equal
  * the aggregate(sequence(0,15), ...) HOF fold it replaced, bit for bit,
  * over the 16-bit corner set and random pairs — the HOF is the
  * *defining* form (it IS what the oracle replays), the spread is the
  * whole-stage-codegen rewrite. */
class ZOrderSpec extends AnyFunSuite {

  private val hofZ = "aggregate(sequence(0, 15), 0L, (acc, i) -> acc" +
    " + shiftleft(shiftright(px, i) & 1, 2*i)" +
    " + shiftleft(shiftright(sy, i) & 1, 2*i+1))"

  test("mortonZ equals the HOF interleave over corners and random pairs") {
    val s = SparkTestSession.spark
    val corners = Seq(0L, 1L, 2L, 3L, 255L, 256L, 21845L, 43690L,
      32767L, 32768L, 65534L, 65535L)
    val rnd = new scala.util.Random(108L)
    val pairs = (for (a <- corners; b <- corners) yield (a, b)) ++
      Seq.fill(2000)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    import s.implicits._
    val df = pairs.toDF("px", "sy")
      .selectExpr("px", "sy", s"$hofZ AS z_hof",
        s"${graft.queries.Physical.mortonZ("px", "sy")} AS z_fast")
    assert(df.where("z_hof != z_fast").count() === 0L)
    // spot-check the mathematical definition on a known point:
    // px=1 (bit 0 → pos 0), sy=1 (bit 0 → pos 1) ⇒ z=3
    val one = df.where("px = 1 AND sy = 1").select("z_fast").head().getLong(0)
    assert(one === 3L)
  }
}
