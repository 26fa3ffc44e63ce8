package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Native codegen'd MinHash signature: 12 minima over a document's shingle
 * set, m_j = min over shingles of (h1 + j·h2) mod 2³², where h1/h2 are
 * the first/second 4 bytes of the shingle's md5 (== parsing hex chars
 * 1-8 / 9-16 base-16, the exact `conv(substring(md5(t), ...), 16, 10)`
 * chain the SQL form and the DuckDB oracle run — byte-for-byte the same
 * integers).
 *
 * The HOF form (`transform` to (h1, h2) structs, then 12 `array_min` ∘
 * `transform` folds) is interpreted — 13 lambda-dispatching passes over
 * the shingle array per row, each struct boxed. This compiles to ONE
 * loop per row inside whole-stage codegen: one md5 per shingle, 12
 * running minima updated in registers. Returns array<bigint> of length
 * 12 (null input → null; null/absent shingles are skipped; an empty
 * shingle array yields the 2³²−1 sentinel minima, though callers filter
 * empty-shingle docs upstream).
 */
case class MinhashSignature(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<string>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(12)(4294967295L)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val d = org.apache.commons.codec.digest.DigestUtils.md5(
          arr.getUTF8String(i).getBytes)
        val h1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val h2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        var j = 0
        while (j < 12) {
          val h = (h1 + j * h2) % 4294967296L
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  // h1/h2 are assembled with multiply-accumulate, not `(x & 0xffL) << s`
  // chains: Janino misparses a parenthesized mask followed by a shift
  // ("(d[1] & 0xffL) << 16 is not a type") and the whole projection
  // silently falls back to interpreted mode — the exact regression this
  // expression exists to avoid. MinhashSigSpec pins CODEGEN_ONLY.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val b = ctx.freshName("b")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[12];
         |java.util.Arrays.fill($mins, 4294967295L);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  byte[] $d = org.apache.commons.codec.digest.DigestUtils.md5(
         |    $a.getUTF8String($i).getBytes());
         |  long $h1 = 0L; long $h2 = 0L;
         |  for (int $b = 0; $b < 4; $b++) {
         |    $h1 = $h1 * 256L + ($d[$b] & 0xffL);
         |    $h2 = $h2 * 256L + ($d[$b + 4] & 0xffL);
         |  }
         |  for (int $j = 0; $j < 12; $j++) {
         |    long $h = ($h1 + $j * $h2) % 4294967296L;
         |    if ($h < $mins[$j]) $mins[$j] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSignature {
  /** Register `minhash_sig` for SQL/expr use in the given session. */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "minhash_sig")(exprs => MinhashSignature(exprs.head))
}
