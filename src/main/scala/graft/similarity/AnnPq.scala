package graft.similarity

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType}

/**
 * Product-quantization ANN (Jégou, Douze & Schmid, "Product Quantization
 * for Nearest Neighbor Search", TPAMI 2011) — the MEMORY-bound scale path
 * next to [[AnnLsh]] (hash pruning) and [[AnnIvf]] (partition pruning):
 * the embedding space splits into `m` orthogonal subspaces, each with its
 * own `k`-centroid codebook, and every corpus vector compresses to `m`
 * sub-centroid ids — at the shipped 16 subspaces × 16 codes, 16 BYTES
 * per vector against 256 bytes of raw floats (16×; 192× at dim 768). At
 * 100 TB of raw embeddings the codes table is the thing that still fits
 * in cluster memory, so the scan never touches the float column at all:
 *
 *  1. probe side precomputes one LOOKUP TABLE per query — the dot product
 *     of each query subvector with each sub-centroid (m × k doubles,
 *     [[PqLut]]) — so scoring a corpus row is m TABLE LOOKUPS
 *     ([[PqAdc]], asymmetric distance computation), not a dim-wide
 *     multiply: per-row cost drops dim/m-fold alongside the memory cut;
 *  2. the compressed exhaustive scan ranks every row by approximate dot
 *     and keeps the top `rerank` per probe through the same bounded
 *     [[graft.plans.TopKPerKey]] aggregation every ANN variant uses;
 *  3. only those `rerank` survivors (per probe — a broadcast-sized set)
 *     rehydrate their float vectors for EXACT cosine, which fixes the
 *     final order: ADC distortion decides who makes the pool, never the
 *     reported ranking.
 *
 * Like [[AnnIvf]], the codebooks are SPHERICAL (vectors unit-normalized
 * before both fit and encode), so subspace dots sum to the cosine the
 * final ranking maximizes: Σ_m <q_m, x_m> = <q, x> = cos(q, x) on unit
 * vectors, and the ADC estimate substitutes x_m's sub-centroid — the
 * standard inner-product PQ estimator.
 *
 * The k-means fits are seeded but engine-specific, so (like the other
 * ANN variants) q130 is rows-only for the driver; ModulesSpec gates
 * recall@5 against exhaustive brute force on BOTH gated corpora, plus
 * ADC-estimator sanity on the compressed scan itself.
 *
 * The PERSISTED tier lives in [[AnnIndex]] (savePq/appendPq/pqTopK, the
 * q133 surface): codes are the assignments, codebooks the geometry, with
 * the same fingerprint staleness guard and meta-LAST crash bracket as
 * LSH/IVF; appends encode new vectors against the frozen codebooks and
 * REFUSE past [[AnnIndex.pqDriftBound]] (1.5×) — the bound is MEASURED
 * (TUNE_r14.txt pqdrift, the ivfdrift protocol): the 0.85 recall floor
 * holds through +50% appended rows on both gated corpora (0.888/0.880),
 * thins at +100% (0.920/0.864) and breaks at +200% (0.800); 1.5× is one
 * notch conservative of the observed knee, the same discipline as
 * [[AnnIndex.appendIvf]]'s 1.25×.
 */
object AnnPq {

  /** 16 subspaces × 16 codes: 16 bytes per vector at any dim (16× at the
    * sandbox dim 64; 192× at dim 768), one-byte ids, a 256-double LUT per
    * probe. Chosen by sweep (TUNE_r14.txt pq grids): m=8 (8 bytes, 32×)
    * needs a 2× deeper re-rank pool for ~5 recall points less on both
    * gated corpora — the halved codes don't pay for the doubled exact
    * scans on isotropic data. */
  val defaultM = 16
  val defaultK = 16

  /** Corpus-adaptive re-rank depth: n/16 (6.25% exact-scored), floor 64.
    * ADC distortion is CORPUS-SIZE-INDEPENDENT (fixed codebook geometry),
    * but the number of vectors whose true cosine lands inside the
    * distortion band around the top-k boundary grows linearly with n —
    * so a fixed pool decays with corpus growth (measured: rerank=64 is
    * 0.984 recall@5 on 500 vectors but 0.856 on 2000; n/16 holds
    * 0.984/0.960 — TUNE_r14.txt pq grids) and the honest default is a
    * constant FRACTION, mirroring AnnIvf's sqrt-occupancy rule. */
  private[similarity] def autoRerank(n: Long): Int =
    math.max(64L, n / 16L).toInt

  /** Per-subspace codebooks as books(m)(code) = centroid (subDim doubles).
    * Fit is INDEX-BUILD work, memoized like [[AnnIvf.fitQuantizer]] and
    * stamped with the corpus file signature so a replaced corpus refits
    * in place. The m small fits each scan only a subDim-wide slice. */
  private val codebooks = new java.util.concurrent.ConcurrentHashMap[
    (String, Int, Int, Long), (String, Array[Array[Array[Double]]])]()

  private[similarity] def clearCodebookCache(): Unit = codebooks.clear()

  private[similarity] def fitCodebooks(
      s: SparkSession, dir: String, m: Int, k: Int, seed: Long): Array[Array[Array[Double]]] = {
    val sig = AnnIvf.corpusSignature(s, dir)
    codebooks.compute((dir, m, k, seed), (_, prev) =>
      if (prev != null && prev._1 == sig) prev
      else (sig, {
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
          .selectExpr("transform(embedding, x -> cast(x AS double)) AS e")
          // interpreted HOF acceptable here: one-time memoized fit (the
          // per-query path normalizes inside compiled code — see AnnIvf)
          .withColumn("en", expr(
            "transform(e, x -> x / greatest(sqrt(aggregate(e, 0D, (a, v) -> a + v * v)), 1e-30D))"))
        val dim = emb.selectExpr("size(en)").first().getInt(0)
        val base = dim / m
        val rem = dim % m
        var off = 0
        (0 until m).toArray.map { sub =>
          val w = base + (if (sub < rem) 1 else 0)
          val slice = emb.selectExpr(s"slice(en, ${off + 1}, $w) AS sv")
          off += w
          val km = new KMeans()
            .setK(k).setSeed(seed + sub).setMaxIter(10)
            .setFeaturesCol("fv").setPredictionCol("c")
          km.fit(slice.withColumn("fv", array_to_vector(col("sv"))))
            .clusterCenters.map(_.toArray)
        }
      }))._2
  }

  /** Encode a unit-normalized vector: per subspace, the first-min nearest
    * sub-centroid (same tie-break as [[AnnIvf.nearestLists]]). */
  private[similarity] def encodeOf(
      books: Array[Array[Array[Double]]], en: Array[Double]): Array[Byte] = {
    val out = new Array[Byte](books.length)
    var off = 0
    var m = 0
    while (m < books.length) {
      val cents = books(m)
      val w = cents(0).length
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var j = 0
        while (j < w) {
          val diff = cent(j) - en(off + j); d += diff * diff; j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(m) = best.toByte
      off += w
      m += 1
    }
    out
  }

  /** Per-query ADC table: lut(m * k + c) = <q_m, books(m)(c)>. */
  private[similarity] def lutOf(
      books: Array[Array[Array[Double]]], en: Array[Double]): Array[Double] = {
    val k = books(0).length
    val out = new Array[Double](books.length * k)
    var off = 0
    var m = 0
    while (m < books.length) {
      val cents = books(m)
      val w = cents(0).length
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var j = 0
        while (j < w) { d += cent(j) * en(off + j); j += 1 }
        out(m * k + c) = d
        c += 1
      }
      off += w
      m += 1
    }
    out
  }

  /** Exhaustive compressed scan: every corpus row scored by ADC lookups
    * against each probe's broadcast LUT, as (q_id, neighbor_id, adc).
    * This is the one ANN variant whose candidate set is ALL rows — the
    * scale claim is bytes-per-row and ops-per-row, not pruning — so the
    * pool is bounded by the TopKPerKey cut the caller applies, and no
    * float column is read on this path (codes only). */
  def compressedScan(
      s: SparkSession,
      dir: String,
      numProbes: Int = 5,
      m: Int = defaultM,
      k: Int = defaultK,
      seed: Long = 4099L,
      trainDir: String = null): DataFrame = {
    // trainDir != null: codebooks fit on a DIFFERENT (smaller) corpus —
    // AnnTune's pqdrift harness pricing the frozen-codebook decay a
    // persisted-then-appended PQ index would carry
    val books = fitCodebooks(s, Option(trainDir).getOrElse(dir), m, k, seed)
    val bc = s.sparkContext.broadcast(books)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x AS double)) AS e")
    val codes = emb.select(col("vec_id"),
      ColumnBridge.column(PqCodes(ColumnBridge.expression(col("e")), bc)).as("codes"))
    val probes = emb.filter(col("vec_id") < numProbes)
      .select(col("vec_id").as("q_id"),
        ColumnBridge.column(PqLut(ColumnBridge.expression(col("e")), bc)).as("lut"))
    broadcast(probes).crossJoin(codes)
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        ColumnBridge.column(PqAdc(
          ColumnBridge.expression(col("codes")),
          ColumnBridge.expression(col("lut")), k)).as("adc"))
  }

  /** ADC scan → top-`rerank` per probe → exact-cosine re-rank → top-k.
    * Output matches the other ANN variants: (q_id, neighbor_id, cos, rn)
    * ordered by (q_id, rn). */
  def annTopK(
      s: SparkSession,
      dir: String,
      numProbes: Int = 5,
      k: Int = 5,
      rerank: Int = 0,
      m: Int = defaultM,
      kCodes: Int = defaultK,
      seed: Long = 4099L,
      trainDir: String = null): DataFrame = {
    graft.functions.CosineSimilarity.register(s)
    // with frozen codebooks the re-rank depth ALSO resolves from the
    // training corpus — an index built at size N and appended to N(1+f)
    // keeps the pool it was built with, exactly the decay under test
    val rr = if (rerank > 0) rerank
      else autoRerank(AnnIvf.corpusCount(s, Option(trainDir).getOrElse(dir)))
    val scanned = compressedScan(s, dir, numProbes, m, kCodes, seed, trainDir)
    // ADC scores are quantized estimates shared by construction across
    // engines-with-the-same-fit but NOT meaningful beyond pool selection;
    // keep full precision (roundTo below only affects the reported cos).
    val pool = graft.plans.TopKPerKey.topK(
      scanned, "q_id", "adc", "neighbor_id", rr, "adc", roundTo = 9)
    // Rehydrate ONLY the pool (numProbes × rerank rows — broadcast-sized)
    // for exact scoring: one more corpus scan, joined on the broadcast
    // candidate set, never a corpus-wide shuffle.
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x AS double)) AS e")
    val probeVecs = emb.filter(col("vec_id") < numProbes)
      .select(col("vec_id").as("q_id"), col("e").as("ae"))
    val exact = emb.join(broadcast(pool.select(col("q_id"), col("neighbor_id"))),
        col("vec_id") === col("neighbor_id"))
      .join(broadcast(probeVecs), Seq("q_id"))
      .selectExpr("q_id", "neighbor_id", "cosine_similarity(ae, e) AS cos")
    graft.plans.TopKPerKey.topK(exact, "q_id", "cos", "neighbor_id", k, "cosine")
      .orderBy(col("q_id"), col("rn"))
  }
}

/** PQ codes for a vector (unit-normalized inside, like [[IvfLists]]):
  * array<tinyint> of length m — the m-byte compressed representation
  * (16 bytes at the shipped defaultM). */
case class PqCodes(
    child: Expression,
    bcBooks: Broadcast[Array[Array[Array[Double]]]]) extends UnaryExpression {

  @transient private lazy val books = bcBooks.value

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes needs array<double>, got ${other.simpleString}")
  }

  def codesOf(a: ArrayData): ArrayData =
    new GenericArrayData(AnnPq.encodeOf(books, AnnIvf.unitNorm(a.toDoubleArray())))

  override protected def nullSafeEval(input: Any): Any =
    codesOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, f => {
      val ref = ctx.addReferenceObj("pqCodes", this, classOf[PqCodes].getName)
      s"${ev.value} = $ref.codesOf($f);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

/** Per-query ADC lookup table (m × k sub-centroid dots, flattened;
  * query unit-normalized inside). */
case class PqLut(
    child: Expression,
    bcBooks: Broadcast[Array[Array[Array[Double]]]]) extends UnaryExpression {

  @transient private lazy val books = bcBooks.value

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_lut needs array<double>, got ${other.simpleString}")
  }

  def lutOf(a: ArrayData): ArrayData =
    new GenericArrayData(AnnPq.lutOf(books, AnnIvf.unitNorm(a.toDoubleArray())))

  override protected def nullSafeEval(input: Any): Any =
    lutOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, f => {
      val ref = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
      s"${ev.value} = $ref.lutOf($f);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** The ADC estimate: Σ_m lut(m * k + codes(m)) — m primitive lookups per
  * corpus row, generated INLINE (no kernel call: the loop body is two
  * array reads and an add, exactly what whole-stage codegen should see). */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc needs (array<tinyint> codes, array<double> lut), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  def adcOf(codes: ArrayData, lut: ArrayData): Double = {
    var sum = 0.0
    var m = 0
    val n = codes.numElements()
    while (m < n) {
      // & 0xFF: codes are UNSIGNED one-byte ids — the signed getByte
      // would index negatively for any codebook with k > 128
      sum += lut.getDouble(m * k + (codes.getByte(m) & 0xFF))
      m += 1
    }
    sum
  }

  override protected def nullSafeEval(c: Any, l: Any): Any =
    adcOf(c.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val i = ctx.freshName("m")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |double $sum = 0.0;
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $l.getDouble($i * $k + ($c.getByte($i) & 0xFF));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
