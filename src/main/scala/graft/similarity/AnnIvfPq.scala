package graft.similarity

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * IVF-PQ — the COMPOSED scale path (Jégou, Douze & Schmid, TPAMI 2011,
 * §IV "IVFADC"): the coarse quantizer prunes WHICH vectors are scored
 * (AnnIvf's inverted lists — the partition-pruning half) and product-
 * quantization codes decide HOW CHEAPLY each survivor is scored (AnnPq's
 * m-byte ADC — the memory half). This is the architecture every large
 * production ANN system ships (FAISS `IVFx,PQy`), and the two halves
 * compose non-trivially: codes quantize the RESIDUAL en − c(list), not
 * the vector itself — residuals concentrate near the origin once the
 * coarse centroid absorbs the vector's position, so the same 16 bytes
 * buy materially less distortion than whole-vector codes.
 *
 * Score decomposition (unit vectors, spherical coarse quantizer):
 *   <q, x> = <q, c_l> + <q, r>  ≈  <q, c_l> + Σ_m <q_m, r̂_m>
 * where r̂ is r's sub-centroid. The first term is one lookup in a
 * broadcast nlist-sized table per probed list; the second is [[PqAdc]]
 * over the SAME per-probe LUT machinery as q130 — the LUT is built from
 * the residual codebooks, which are shared across lists (the standard
 * memory/accuracy trade; per-list codebooks would be nlist× the
 * geometry).
 *
 * Scale shape: the scan touches ONLY the probed lists' (list_id, codes)
 * rows — nprobe/nlist of the corpus at 16 bytes/vector (vs AnnPq's
 * all-rows compressed scan and AnnIvf's float-width candidate reads);
 * the float column is read exclusively for the broadcast-sized re-rank
 * pool, exactly like the other variants. Both fits are one-time
 * memoized index-build work; everything per-query is codegen'd
 * ([[IvfLists]] assignment, [[IvfPqCodes]] encode, [[PqLut]]/[[PqAdc]]
 * scoring).
 *
 * Like q31/q49/q130, the k-means fits make this rows-only for the
 * driver; ModulesSpec gates recall@5 on both corpora (5-seed minima,
 * AnnTune `ivfpq` grid).
 */
object AnnIvfPq {

  /** Residual codebooks: m × k sub-centroids fit on en − c(list) over the
    * corpus. Memoized like [[AnnPq.fitCodebooks]], keyed on the corpus
    * signature so a replaced corpus refits in place. */
  private val residualBooks = new java.util.concurrent.ConcurrentHashMap[
    (String, Int, Int, Int, Long), (String, Array[Array[Array[Double]]])]()

  private[similarity] def clearResidualCache(): Unit = residualBooks.clear()

  private[similarity] def fitResidualBooks(
      s: SparkSession, dir: String, nlist: Int, m: Int, k: Int,
      seed: Long): Array[Array[Array[Double]]] = {
    val sig = AnnIvf.corpusSignature(s, dir)
    residualBooks.compute((dir, nlist, m, k, seed), (_, prev) =>
      if (prev != null && prev._1 == sig) prev
      else (sig, {
        import org.apache.spark.sql.graftbridge.ColumnBridge
        val centroids = AnnIvf.fitQuantizer(s, dir, nlist, seed)
        val bc = s.sparkContext.broadcast(centroids)
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
          .selectExpr("vec_id", "transform(embedding, x -> cast(x AS double)) AS e")
          // interpreted HOF acceptable: one-time memoized fit (see AnnIvf)
          .withColumn("en", expr(
            "transform(e, x -> x / greatest(sqrt(aggregate(e, 0D, (a, v) -> a + v * v)), 1e-30D))"))
        val assign = element_at(ColumnBridge.column(
          IvfLists(ColumnBridge.expression(col("e")), bc, 1)), 1)
        val cdf = s.createDataFrame(
          s.sparkContext.parallelize(centroids.toIndexedSeq.zipWithIndex
            .map { case (c, i) => org.apache.spark.sql.Row(i, c.toSeq) }),
          StructType(Seq(StructField("list_id", IntegerType),
            StructField("center", ArrayType(DoubleType)))))
        val resid = emb.select(col("en"), assign.as("list_id"))
          .join(broadcast(cdf), Seq("list_id"))
          .selectExpr("zip_with(en, center, (x, y) -> x - y) AS r")
        val dim = resid.selectExpr("size(r)").first().getInt(0)
        val base = dim / m
        val rem = dim % m
        var off = 0
        (0 until m).toArray.map { sub =>
          val w = base + (if (sub < rem) 1 else 0)
          val slice = resid.selectExpr(s"slice(r, ${off + 1}, $w) AS sv")
          off += w
          val km = new KMeans()
            .setK(k).setSeed(seed + 100 + sub).setMaxIter(10)
            .setFeaturesCol("fv").setPredictionCol("c")
          km.fit(slice.withColumn("fv", array_to_vector(col("sv"))))
            .clusterCenters.map(_.toArray)
        }
      }))._2
  }

  /** IVF-pruned, residual-ADC-scored candidates as
    * (q_id, neighbor_id, adc) — only the probed lists' code rows are
    * touched. nlist/nprobe = 0 resolve corpus-adaptively like q49. */
  def prunedScan(
      s: SparkSession,
      dir: String,
      numProbes: Int = 5,
      nlist: Int = 0,
      nprobe: Int = 0,
      m: Int = AnnPq.defaultM,
      k: Int = AnnPq.defaultK,
      seed: Long = 4099L,
      trainDir: String = null): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // trainDir != null: BOTH geometries (coarse quantizer + residual
    // codebooks) and the knobs resolve from a smaller training corpus —
    // AnnTune's ivfpqdrift harness pricing the frozen-geometry decay a
    // persisted-then-appended q138 index would serve
    val train = Option(trainDir).getOrElse(dir)
    val (rNlist, rNprobe) = AnnIvf.resolveKnobs(s, train, nlist, nprobe)
    val centroids = AnnIvf.fitQuantizer(s, train, rNlist, seed)
    val books = fitResidualBooks(s, train, rNlist, m, k, seed)
    val bcC = s.sparkContext.broadcast(centroids)
    val bcB = s.sparkContext.broadcast(books)
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x AS double)) AS e")
    // corpus side: one struct(list_id, codes) per vector — assignment,
    // residual, and encode fused into one codegen'd pass over the scan
    val enc = ColumnBridge.column(IvfPqCodes(ColumnBridge.expression(col("e")), bcC, bcB))
    val codes = emb.select(col("vec_id"), enc.as("enc"))
      .select(col("vec_id"), col("enc.list_id").as("list_id"), col("enc.codes").as("codes"))
    // probe side: nprobe lists, the <q, c_l> term per probed list, and
    // the residual-codebook LUT (PqLut unit-normalizes the query inside)
    val probeLists = ColumnBridge.column(
      IvfLists(ColumnBridge.expression(col("e")), bcC, rNprobe))
    val qdotc = ColumnBridge.column(
      IvfCentroidDots(ColumnBridge.expression(col("e")), bcC))
    val probes = emb.filter(col("vec_id") < numProbes)
      .select(col("vec_id").as("q_id"),
        ColumnBridge.column(PqLut(ColumnBridge.expression(col("e")), bcB)).as("lut"),
        qdotc.as("cdots"),
        explode(probeLists).as("list_id"))
      .selectExpr("q_id", "lut", "list_id", "element_at(cdots, list_id + 1) AS qdotc")
    broadcast(probes).join(codes, Seq("list_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        (col("qdotc") + ColumnBridge.column(PqAdc(
          ColumnBridge.expression(col("codes")),
          ColumnBridge.expression(col("lut")), k))).as("adc"))
  }

  /** Pruned residual-ADC scan → top-`rerank` pool → exact-cosine re-rank
    * → top-k; output matches every other ANN variant. */
  def annTopK(
      s: SparkSession,
      dir: String,
      numProbes: Int = 5,
      k: Int = 5,
      rerank: Int = 0,
      nlist: Int = 0,
      nprobe: Int = 0,
      m: Int = AnnPq.defaultM,
      kCodes: Int = AnnPq.defaultK,
      seed: Long = 4099L,
      trainDir: String = null): DataFrame = {
    graft.functions.CosineSimilarity.register(s)
    // frozen geometries keep the TRAINING corpus's re-rank depth too —
    // exactly the decay channel under test (see AnnPq.annTopK)
    val rr = if (rerank > 0) rerank
      else AnnPq.autoRerank(AnnIvf.corpusCount(s, Option(trainDir).getOrElse(dir)))
    val scanned = prunedScan(s, dir, numProbes, nlist, nprobe, m, kCodes, seed, trainDir)
    val pool = graft.plans.TopKPerKey.topK(
      scanned, "q_id", "adc", "neighbor_id", rr, "adc", roundTo = 9)
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

/** Fused corpus-side IVF-PQ encode: unit-normalize, assign the nearest
  * coarse centroid, quantize the RESIDUAL against the shared residual
  * codebooks — struct(list_id int, codes array<tinyint>) in one pass.
  * Same first-min tie-breaks as [[IvfLists]] / [[AnnPq.encodeOf]]. */
case class IvfPqCodes(
    child: Expression,
    bcCentroids: Broadcast[Array[Array[Double]]],
    bcBooks: Broadcast[Array[Array[Array[Double]]]]) extends UnaryExpression {

  @transient private lazy val centroids = bcCentroids.value
  @transient private lazy val books = bcBooks.value

  override def dataType: DataType = StructType(Seq(
    StructField("list_id", IntegerType, nullable = false),
    StructField("codes", ArrayType(ByteType, containsNull = false), nullable = false)))
  override def prettyName: String = "ivf_pq_codes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_pq_codes needs array<double>, got ${other.simpleString}")
  }

  def encOf(a: ArrayData): InternalRow = {
    val en = AnnIvf.unitNorm(a.toDoubleArray())
    val list = AnnIvf.nearestLists(centroids, en, 1)(0)
    val cent = centroids(list)
    val r = new Array[Double](en.length)
    var i = 0
    while (i < en.length) { r(i) = en(i) - cent(i); i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](list, new GenericArrayData(AnnPq.encodeOf(books, r))))
  }

  override protected def nullSafeEval(input: Any): Any =
    encOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, f => {
      val ref = ctx.addReferenceObj("ivfPqCodes", this, classOf[IvfPqCodes].getName)
      s"${ev.value} = $ref.encOf($f);"
    })

  override protected def withNewChildInternal(newChild: Expression): IvfPqCodes =
    copy(child = newChild)
}

/** The probe-side <q, c_l> table: dot of the unit-normalized query with
  * EVERY coarse centroid, as array<double> indexed by list_id — one
  * nlist-sized array per probe row (probes are numProbes rows; the
  * corpus never evaluates this). */
case class IvfCentroidDots(
    child: Expression,
    bcCentroids: Broadcast[Array[Array[Double]]]) extends UnaryExpression {

  @transient private lazy val centroids = bcCentroids.value

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "ivf_centroid_dots"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_centroid_dots needs array<double>, got ${other.simpleString}")
  }

  def dotsOf(a: ArrayData): ArrayData = {
    val en = AnnIvf.unitNorm(a.toDoubleArray())
    val out = new Array[Double](centroids.length)
    var l = 0
    while (l < centroids.length) {
      val c = centroids(l)
      var d = 0.0
      var i = 0
      while (i < en.length) { d += en(i) * c(i); i += 1 }
      out(l) = d
      l += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    dotsOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, f => {
      val ref = ctx.addReferenceObj("ivfCentroidDots", this, classOf[IvfCentroidDots].getName)
      s"${ev.value} = $ref.dotsOf($f);"
    })

  override protected def withNewChildInternal(newChild: Expression): IvfCentroidDots =
    copy(child = newChild)
}
