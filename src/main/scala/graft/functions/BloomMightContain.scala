package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * Semi-join reduction: a broadcast Bloom-filter membership probe over a
 * long key, as a native codegen'd predicate.
 *
 * The 100 TB pattern this serves: a fact table joins a dimension whose
 * FILTERED key set is too large to broadcast as a hash relation but whose
 * Bloom sketch (a few MB at fpp 1%) is not. Probing the sketch in the fact
 * scan prunes non-matching rows BEFORE the join's exchange, so the shuffle
 * moves only maybe-matching rows; the exact join that follows removes the
 * (bounded-rate) false positives, leaving semantics identical to the plain
 * join — which is what keeps the query DuckDB-oracle-able. This is the
 * same reduction Spark's AQE runtime bloom filter injects when its size
 * thresholds fire; building it explicitly makes the plan deterministic and
 * lets the filter come from any keyed DataFrame.
 *
 * The filter is carried as its serialized bytes inside a [[BloomHandle]]
 * (registered via `addReferenceObj`, deserialized lazily once per
 * executor); the probe itself is one `mightContainLong` call inside
 * whole-stage codegen — no UDF, no boxing.
 */
final class BloomHandle(val bytes: Array[Byte]) extends Serializable {
  @transient private lazy val bf: BloomFilter = BloomFilter.readFrom(bytes)
  def mightContainLong(v: Long): Boolean = bf.mightContainLong(v)
}

case class BloomMightContainLong(handle: BloomHandle, child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a bigint key, got ${t.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    handle.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", handle, classOf[BloomHandle].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomMightContainLong {

  /** Build a Bloom filter over `keys.col(keyCol)` with the public
    * distributed `stat.bloomFilter` aggregation (one pass over the keyed
    * side, driver receives only the sketch — never the keys). */
  def build(keys: DataFrame, keyCol: String, expectedItems: Long, fpp: Double): BloomHandle = {
    val bf = keys.stat.bloomFilter(keyCol, expectedItems, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    new BloomHandle(out.toByteArray)
  }

  /** The membership predicate as a Column, for use in `where()`. */
  def probe(handle: BloomHandle, key: Column): Column =
    ColumnBridge.column(BloomMightContainLong(handle, ColumnBridge.expression(key)))
}
