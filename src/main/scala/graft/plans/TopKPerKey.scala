package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One scored candidate flowing into the top-k aggregation. */
case class ScoredId(score: Double, id: Long)

/**
 * Bounded top-k-per-key as an aggregation — the k>1 generalization of
 * [[TopOnePerKey]].
 *
 * `row_number() over (partition by key order by score desc)` shuffles EVERY
 * scored row into |keys| partitions and sorts each key's full candidate set
 * in one task — with 5 probe keys that is five giant sort tasks at 100 TB.
 * This aggregator instead keeps at most k candidates per (partition, key)
 * on the map side (ObjectHashAggregate partial), so the exchange carries
 * |partitions| * |keys| * k rows instead of all scored pairs, and no task
 * ever sorts more than the merged k-lists. The k-bounded insert keeps the
 * buffer sorted by (score desc, id asc) — the same total order as the
 * window form, so results are identical row-for-row.
 */
class TopKAggregator(k: Int)
  extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {

  require(k > 0, s"k must be positive, got $k")

  // Matches Spark SQL's `ORDER BY score DESC, id` exactly — including the
  // float edge cases where a naive Ordering.by(-score, id) diverges:
  // Spark compares -0.0 == 0.0 (so ties fall through to the id) and sorts
  // NaN as the LARGEST double (first under DESC), whereas negating the
  // score puts NaN last and splits the zero tie. Found by TopKPropertySpec.
  @transient private lazy val ord: Ordering[ScoredId] = new Ordering[ScoredId] {
    private def norm(d: Double): Double = if (d == 0.0) 0.0 else d // -0.0 -> 0.0
    override def compare(a: ScoredId, b: ScoredId): Int = {
      val c = java.lang.Double.compare(norm(b.score), norm(a.score))
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    }
  }

  override def zero: List[ScoredId] = Nil

  /** Sorted bounded insert: O(k) per element, early-outs when x cannot
    * make the cut (the common case once the buffer is warm). */
  private def insert(buf: List[ScoredId], x: ScoredId): List[ScoredId] = {
    if (buf.lengthCompare(k) >= 0 && ord.gteq(x, buf.last)) buf
    else {
      val (before, after) = buf.span(b => ord.lt(b, x))
      (before ::: x :: after).take(k)
    }
  }

  override def reduce(buf: List[ScoredId], in: ScoredId): List[ScoredId] =
    insert(buf, in)

  override def merge(a: List[ScoredId], b: List[ScoredId]): List[ScoredId] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[ScoredId]): Seq[ScoredId] = buf

  override def bufferEncoder: Encoder[List[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}

object TopKPerKey {

  /**
   * Per-`key` top-k of `(score, id)` with the window-rank contract:
   * output columns (key, idCol, scoreCol rounded to 4, rn in 1..k),
   * ordered by score desc with id as the tie-break.
   */
  def topK(
      df: DataFrame,
      key: String,
      scoreCol: String,
      idCol: String,
      k: Int,
      outScore: String,
      roundTo: Int = 4): DataFrame =
    topK(df, Seq(key), scoreCol, idCol, k, outScore, roundTo)

  /** Multi-column-key form — same bounded aggregation, grouped on a
    * composite key (e.g. q71's (lang, source) domain cap). */
  def topK(
      df: DataFrame,
      keys: Seq[String],
      scoreCol: String,
      idCol: String,
      k: Int,
      outScore: String,
      roundTo: Int): DataFrame = {
    val agg = udaf(new TopKAggregator(k), ExpressionEncoder[ScoredId]())
    val kc = keys.map(col)
    df.groupBy(kc: _*)
      .agg(agg(col(scoreCol), col(idCol)).as("__topk"))
      .select(kc :+ posexplode(col("__topk")): _*)
      .select(kc ++ Seq(col("col.id").as(idCol),
        round(col("col.score"), roundTo).as(outScore),
        (col("pos") + 1).cast("int").as("rn")): _*)
  }
}
