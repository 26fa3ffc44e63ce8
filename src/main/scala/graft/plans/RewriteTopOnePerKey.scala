package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/**
 * Optimizer rule: rewrite `row_number() over (partition by k order by o) = 1`
 * filters into a `min_by`/`max_by` aggregation.
 *
 * The window form shuffles every row and sorts each partition; the
 * aggregate form is a hash aggregate with map-side partial combine — one
 * candidate row per key per partition crosses the wire and nothing is
 * sorted. Semantics are identical when the ordering is a total order (the
 * ranking window's tie-break is arbitrary otherwise, so any tie behavior
 * is already unspecified).
 *
 * Fires only on the safe shape: a single row_number window expression,
 * a NON-EMPTY partition spec, uniform sort direction, non-nullable sort
 * keys (min/max skip nulls, ranking windows don't). The partition spec
 * must be non-empty because a global (no-grouping-keys) aggregate always
 * emits exactly one row — on a runtime-empty input the window form yields
 * zero rows but the rewritten form would fabricate a phantom row of
 * default values.
 */
object RewriteTopOnePerKey extends Rule[LogicalPlan] {

  private object RowNumberEqualsOne {
    def unapply(plan: LogicalPlan): Option[(Attribute, Window)] = plan match {
      case Filter(EqualTo(a: Attribute, Literal(1, IntegerType)), w: Window) => Some((a, w))
      case Filter(EqualTo(Literal(1, IntegerType), a: Attribute), w: Window) => Some((a, w))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case RowNumberEqualsOne(rnAttr, w) if rewritable(rnAttr, w) =>
      val Seq(Alias(WindowExpression(_, spec), _)) = w.windowExpressions: @unchecked
      val descending = spec.orderSpec.head.direction == Descending
      // InferWindowGroupLimit may already have inserted a per-partition
      // top-k pre-filter below the window; the hash aggregate's map-side
      // partial combine subsumes it (and avoids its local sort), so unwrap.
      val aggChild = w.child match {
        case WindowGroupLimit(p, o, _, 1, inner)
          if p == spec.partitionSpec && o == spec.orderSpec => inner
        case other => other
      }
      val childOut = aggChild.output
      val value = CreateStruct(childOut)
      val ordKey = CreateStruct(spec.orderSpec.map(_.child))
      val picker = if (descending) MaxBy(value, ordKey) else MinBy(value, ordKey)
      val topAlias = Alias(picker.toAggregateExpression(), "__top")()
      val agg = Aggregate(spec.partitionSpec, Seq(topAlias), aggChild)
      // restore the original output attributes (same exprIds) from the
      // struct; row_number is the constant 1 after the filter
      val restored = childOut.zipWithIndex.map { case (a, i) =>
        Alias(GetStructField(topAlias.toAttribute, i, Some(a.name)), a.name)(exprId = a.exprId)
      } :+ Alias(Literal(1), rnAttr.name)(exprId = rnAttr.exprId)
      Project(restored, agg)
  }

  private def rewritable(rnAttr: Attribute, w: Window): Boolean = w.windowExpressions match {
    case Seq(a @ Alias(WindowExpression(_: RowNumber, spec), _)) =>
      a.exprId == rnAttr.exprId &&
        spec.partitionSpec.nonEmpty &&
        spec.orderSpec.nonEmpty &&
        spec.orderSpec.map(_.direction).distinct.size == 1 &&
        spec.orderSpec.forall(!_.child.nullable)
    case _ => false
  }
}

/**
 * Session extension wiring (`spark.sql.extensions=graft.plans.GraftExtensions`
 * or `.withExtensions(new GraftExtensions)`); also usable ad hoc through
 * `spark.experimental.extraOptimizations`.
 *
 * Besides the optimizer rule and the as-of strategy, the extension
 * installs every STATELESS native function into the session's registry —
 * the one-config deployment path for a pure-SQL user (`--conf
 * spark.sql.extensions=graft.plans.GraftExtensions` on a cluster they
 * don't run Scala on): `SELECT simhash(text), minhash_sig(text) …` works
 * with no driver-side `register()` call. The two BPE functions are the
 * deliberate exception — their builders close over a broadcast
 * merges/vocab table that must be loaded through a live session, so they
 * keep the explicit `BpeEncode.register(spark, mergesPath)` surface.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteTopOnePerKey)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    GraftExtensions.functions.foreach { case (name, builder) =>
      e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
  }
}

object GraftExtensions {
  import graft.functions._

  /** Name → builder for every session-independent native function; the
    * same builders `X.register` installs one at a time. */
  private[graft] val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash" -> ((exprs: Seq[Expression]) => SimHash(exprs.head)),
    "hamming_distance" -> ((exprs: Seq[Expression]) =>
      HammingDistance(exprs(0), exprs(1))),
    "cosine_similarity" -> ((exprs: Seq[Expression]) =>
      CosineSimilarity(exprs(0), exprs(1))),
    "minhash_sig" -> ((exprs: Seq[Expression]) => MinhashSignature(exprs.head)),
    "winnow_fingerprints" -> ((exprs: Seq[Expression]) =>
      WinnowFingerprints(exprs(0), exprs(1), exprs(2))),
    "quantize_vec" -> ((exprs: Seq[Expression]) => QuantizeVec(exprs(0))),
    "cosine_similarity_i8" -> ((exprs: Seq[Expression]) =>
      CosineSimilarityI8(exprs(0), exprs(1))),
    "repetition_chars" -> ((exprs: Seq[Expression]) =>
      RepetitionChars(exprs.head)),
    "shingle_gen" -> ((exprs: Seq[Expression]) =>
      ShingleGenerator(exprs(0), exprs(1))),
    "l2sq_long" -> ((exprs: Seq[Expression]) =>
      L2SqLong(exprs(0), exprs(1))),
    "dot_long" -> ((exprs: Seq[Expression]) =>
      DotLong(exprs(0), exprs(1))),
    "dot_double" -> ((exprs: Seq[Expression]) =>
      DotDouble(exprs(0), exprs(1))),
    "char_bigrams" -> ((exprs: Seq[Expression]) =>
      CharBigrams(exprs.head)),
    "shingles3" -> ((exprs: Seq[Expression]) =>
      Shingles3(exprs.head)),
    "bigram_score" -> ((exprs: Seq[Expression]) =>
      BigramScore(exprs(0), exprs(1))),
    "intersect_count" -> ((exprs: Seq[Expression]) =>
      IntersectCount(exprs(0), exprs(1))),
    "union_count" -> ((exprs: Seq[Expression]) =>
      UnionCount(exprs(0), exprs(1))),
  )
}
