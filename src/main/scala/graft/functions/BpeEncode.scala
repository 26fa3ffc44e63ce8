package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Byte-pair-encoding tokenizer as a native codegen'd expression: text is
 * pre-tokenized with the same regex the q48 heuristic used (letter runs,
 * digit runs, single marks — the pre-tokenization real BPE tokenizers
 * apply before merges), then each pre-token is merged bottom-up from
 * characters by a RANKED MERGES TABLE, the way a trained tokenizer's
 * merges.txt drives encoding. Returns the full subword token array
 * (`array<string>`); `size()` of it is the true token count that packing
 * (q64) and token statistics (q48) need — whitespace/regex counts are
 * approximations the moment subword tokenization enters the picture.
 *
 * MERGE SEMANTICS (pinned, and mirrored operation-for-operation by the
 * DuckDB oracle so q48/q64 stay hash-checked): each pre-token is the
 * space-joined sequence of its codepoints, bracketed by spaces; one CHAIN
 * PASS applies every merge in rank order as a leftmost, non-overlapping,
 * all-occurrences string replacement (`" l l "` -> `" ll "` — exactly
 * `String.replace`/DuckDB `replace` semantics); chain passes repeat until
 * a pass changes nothing. A merge's operands may only be single
 * codepoints or outputs of LOWER-ranked merges (the validity invariant of
 * any real merges table), which is what makes rank-order exhaustive
 * application equivalent to the classic best-pair-first loop: a later
 * merge can never create an occurrence of an earlier one.
 *
 * SCALE SHAPE: the merges travel as a [[Broadcast]] handle (a trained
 * table is ~50k rows — per-task serialization would ship it with every
 * task binary), the expression runs inside whole-stage codegen via
 * [[doGenCode]], and encoding memoizes per-WORD results in a bounded
 * per-executor cache — natural-language corpora reuse a vocabulary-sized
 * set of pre-tokens, so the per-document cost collapses to hash lookups
 * after warm-up.
 */
case class BpeEncode(
    child: Expression,
    bcMerges: Broadcast[Array[(String, String)]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode needs string, got ${other.simpleString}")
  }

  @transient private lazy val patterns: Array[(String, String)] =
    bcMerges.value.map { case (a, b) => (s" $a $b ", s" $a$b ") }

  @transient private lazy val preTok =
    java.util.regex.Pattern.compile(BpeTokenizer.preTokenRegex)

  /** word -> merged subword tokens, memoized PER EXECUTOR: the expression
    * instance itself is deserialized once per task (it rides in the
    * serialized plan via addReferenceObj), so an instance field would
    * re-warm from empty every task — the cache lives in the companion,
    * keyed by the merges broadcast id, and is shared by every task of
    * every stage using that merges table in the executor JVM. Bounded:
    * natural-language vocabularies are finite, but nothing guarantees the
    * input is natural language — at the cap the cache clears rather than
    * growing without bound (correctness never depends on a hit). */
  @transient private lazy val memo = BpeEncode.memoFor(bcMerges.id)

  private def mergeWord(word: String): Array[String] = {
    val cached = memo.get(word)
    if (cached != null) return cached
    val toks = BpeEncode.mergeWordRaw(word, patterns)
    if (memo.size >= BpeEncode.memoCap) memo.clear()
    memo.put(word, toks)
    toks
  }

  /** Hot path — called from both interpreted eval and generated code. */
  def encode(text: UTF8String): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val m = preTok.matcher(text.toString)
    while (m.find()) {
      val toks = mergeWord(m.group())
      var i = 0
      while (i < toks.length) {
        out += UTF8String.fromString(toks(i))
        i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, f => {
      val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
      s"${ev.value} = $ref.encode($f);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  private[graft] val memoCap = 1 << 16

  /** The uncached merge loop shared by [[BpeEncode]] and [[BpeEncodeIds]]:
    * space-joined codepoints (codepoints, not UTF-16 units, so BMP and
    * supplementary characters alike are one symbol — matching the
    * oracle's per-codepoint split), then chain passes of every merge in
    * rank order until a pass changes nothing. */
  private[functions] def mergeWordRaw(
      word: String, patterns: Array[(String, String)]): Array[String] = {
    val sb = new java.lang.StringBuilder(word.length * 2 + 2)
    sb.append(' ')
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      sb.appendCodePoint(cp).append(' ')
      i += Character.charCount(cp)
    }
    var s = sb.toString
    var changed = true
    while (changed) {
      val before = s
      var m = 0
      while (m < patterns.length) {
        s = s.replace(patterns(m)._1, patterns(m)._2)
        m += 1
      }
      changed = s != before
    }
    s.trim.split(" ")
  }

  /** At most this many per-broadcast word caches live in the JVM: a
    * long-lived executor serving many sessions (each registering its own
    * merges broadcast) would otherwise accrete one memoCap-sized cache per
    * DESTROYED broadcast forever — the id is a plain Long, so nothing ties
    * the entry's lifetime to the broadcast's. Access-order LRU: the tables
    * in active use stay, a table idle across [[maxMemoTables]] other
    * broadcasts' warm-ups is evicted (correctness never depends on a hit —
    * a re-used old broadcast just re-warms). */
  private[graft] val maxMemoTables = 4

  /** Executor-wide word caches, one per merges broadcast (a session makes
    * one broadcast, so steady state is one live entry per JVM). */
  private val memos = new java.util.LinkedHashMap[
      Long, java.util.concurrent.ConcurrentHashMap[String, Array[String]]](
      16, 0.75f, /* accessOrder = */ true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[Long, java.util.concurrent.ConcurrentHashMap[String, Array[String]]])
        : Boolean = size > maxMemoTables
  }

  /** Looked up once per task deserialization (the expression's lazy val),
    * so the coarse lock is off the per-row path. */
  private[graft] def memoFor(
      broadcastId: Long): java.util.concurrent.ConcurrentHashMap[String, Array[String]] =
    memos.synchronized {
      memos.computeIfAbsent(broadcastId,
        _ => new java.util.concurrent.ConcurrentHashMap[String, Array[String]]())
    }

  private[graft] def liveMemoTables: Int = memos.synchronized { memos.size }

  /** Per-session record of which merges table `bpe_encode` was registered
    * over, so a CONFLICTING re-register fails loud instead of silently
    * keeping the first table (first-registration-wins used to be a quiet
    * API trap: a caller who ran any default-merges query and then
    * registered a trained table kept the default without noticing — and
    * the DuckDB oracles always encode the DEFAULT chain, so the oracled
    * paths q48/q64/q73 now throw in a session that registered a custom
    * table rather than compare mismatched engines). Weak keys: the record
    * dies with the session. */
  private val sessionMerges =
    new java.util.WeakHashMap[SparkSession, Array[(String, String)]]()

  private[functions] def describe(merges: Array[(String, String)]): String = {
    val label = if (merges eq BpeTokenizer.defaultMerges) "built-in default"
      else "custom"
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(merges.map { case (a, b) => s"$a $b" }.mkString("\n").getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
    s"$label table (${merges.length} merges, md5 $digest)"
  }

  /** Throws unless `merges` matches what this session already registered
    * under `what` (no-op for the first registration). */
  private def requireSameTable(spark: SparkSession, what: String,
      merges: Array[(String, String)]): Unit = sessionMerges.synchronized {
    val prev = sessionMerges.get(spark)
    if (prev == null) sessionMerges.put(spark, merges)
    else if (!(prev.sameElements(merges)))
      throw new IllegalStateException(
        s"$what: this session already registered the ${describe(prev)} and the " +
          s"registry is first-registration-wins — refusing to silently keep it " +
          s"while you asked for the ${describe(merges)}. Use a fresh session " +
          "(SparkSession.newSession) for a different merges table.")
  }

  /** Register `bpe_encode(text)` over `merges` — the default table unless
    * a deployment loads its trained tokenizer's via
    * [[BpeTokenizer.fromMergesFile]]. The broadcast is created once per
    * session (Registration.ensure runs the builder once) so every query
    * over the session shares one handle; the FIRST registration of the
    * name in a session wins (the oracle-generated SQL and the expression
    * must see the same table), and a re-register with a DIFFERENT table
    * fails loud with both provenances instead of silently keeping the
    * first — which also makes the oracled query paths (they register the
    * default) throw in a custom-table session rather than hash-compare
    * against a default-chain oracle. */
  def register(spark: SparkSession,
      merges: Array[(String, String)] = BpeTokenizer.defaultMerges): Unit = {
    requireSameTable(spark, "bpe_encode.register", merges)
    lazy val bc = spark.sparkContext.broadcast(merges)
    Registration.ensure(spark, "bpe_encode")(exprs => BpeEncode(exprs(0), bc))
  }

  /** Register `bpe_encode_ids(text)` — the token-ID form over a (merges,
    * vocab) pair; see [[BpeEncodeIds]]. Defaults pair
    * [[BpeTokenizer.defaultMerges]] with the stand-in
    * [[BpeTokenizer.defaultVocab]] (codepoint fallback ON, the byte-
    * fallback convention); a deployment loads both artifacts via
    * [[BpeTokenizer.fromMergesFile]] + [[BpeTokenizer.fromVocabFile]] and
    * typically sets `codepointFallback = false` so ANY token absent from
    * its vocab — not just a merged one — fails loud. Shares the session's
    * merges-conflict guard with [[register]]: ids and strings must encode
    * with the SAME merges table. */
  def registerIds(spark: SparkSession,
      merges: Array[(String, String)] = BpeTokenizer.defaultMerges,
      vocab: Map[String, Int] = BpeTokenizer.defaultVocab,
      codepointFallback: Boolean = true): Unit = {
    requireSameTable(spark, "bpe_encode_ids.register", merges)
    lazy val bcM = spark.sparkContext.broadcast(merges)
    lazy val bcV = spark.sparkContext.broadcast(vocab)
    Registration.ensure(spark, "bpe_encode_ids")(exprs =>
      BpeEncodeIds(exprs(0), bcM, bcV, codepointFallback))
  }
}

/**
 * Token IDS from the same merge engine: [[BpeEncode]]'s subword strings
 * mapped through a vocab (token -> id), returning `array<int>` — the form
 * a training pipeline actually feeds a model. A token the vocab doesn't
 * know fails LOUD (it means the merges and vocab artifacts don't belong
 * together — every merge output is in the matching vocab by
 * construction), except single-codepoint tokens when `codepointFallback`
 * is on, which map to their codepoint — the byte-fallback convention, and
 * what makes the stand-in default vocab total over arbitrary text.
 *
 * Same scale shape as [[BpeEncode]]: broadcast tables, whole-stage
 * codegen via [[doGenCode]], bounded per-executor word->ids memo keyed by
 * BOTH broadcast ids (the ids depend on the merges AND the vocab).
 */
case class BpeEncodeIds(
    child: Expression,
    bcMerges: Broadcast[Array[(String, String)]],
    bcVocab: Broadcast[Map[String, Int]],
    codepointFallback: Boolean) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def prettyName: String = "bpe_encode_ids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_ids needs string, got ${other.simpleString}")
  }

  @transient private lazy val patterns: Array[(String, String)] =
    bcMerges.value.map { case (a, b) => (s" $a $b ", s" $a$b ") }

  @transient private lazy val preTok =
    java.util.regex.Pattern.compile(BpeTokenizer.preTokenRegex)

  @transient private lazy val vocab = bcVocab.value

  @transient private lazy val memo = BpeEncodeIds.memoFor(bcMerges.id, bcVocab.id)

  private def idsOf(word: String): Array[Int] = {
    val cached = memo.get(word)
    if (cached != null) return cached
    val toks = BpeEncode.mergeWordRaw(word, patterns)
    val ids = new Array[Int](toks.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      ids(i) = vocab.getOrElse(t, {
        val cp = t.codePointAt(0)
        if (codepointFallback && t.length == Character.charCount(cp)) cp
        else throw new IllegalStateException(
          s"bpe_encode_ids: token '$t' (merged from word '$word') is not in the " +
            s"vocab (${vocab.size} entries) — merges/vocab mismatch; load the " +
            "vocab.json that belongs to the merges.txt")
      })
      i += 1
    }
    if (memo.size >= BpeEncode.memoCap) memo.clear()
    memo.put(word, ids)
    ids
  }

  /** Hot path — called from both interpreted eval and generated code. */
  def encodeIds(text: UTF8String): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val m = preTok.matcher(text.toString)
    while (m.find()) {
      val ids = idsOf(m.group())
      var i = 0
      while (i < ids.length) {
        out += ids(i)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    encodeIds(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, f => {
      val ref = ctx.addReferenceObj("bpeEncodeIds", this, classOf[BpeEncodeIds].getName)
      s"${ev.value} = $ref.encodeIds($f);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIds =
    copy(child = newChild)
}

object BpeEncodeIds {
  /** Executor-wide word->ids caches, one per (merges, vocab) broadcast
    * pair, same bounded access-order LRU policy as [[BpeEncode]]'s. */
  private val memos = new java.util.LinkedHashMap[
      String, java.util.concurrent.ConcurrentHashMap[String, Array[Int]]](
      16, 0.75f, /* accessOrder = */ true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String, java.util.concurrent.ConcurrentHashMap[String, Array[Int]]])
        : Boolean = size > BpeEncode.maxMemoTables
  }

  private[graft] def memoFor(mergesId: Long,
      vocabId: Long): java.util.concurrent.ConcurrentHashMap[String, Array[Int]] =
    memos.synchronized {
      memos.computeIfAbsent(s"$mergesId:$vocabId",
        _ => new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]())
    }

  private[graft] def liveMemoTables: Int = memos.synchronized { memos.size }
}

/**
 * The merges table and its cross-engine rendering. ONE source of truth:
 * the Scala expression broadcasts [[defaultMerges]] and the DuckDB oracle
 * SQL is GENERATED from the same list ([[duckChainSql]]), so the two
 * engines cannot drift.
 *
 * The default table is a small hand-built English/digit set (32 merges)
 * standing in for a trained tokenizer's merges.txt — the ENGINE mechanics
 * (ranked pair merging from characters) are the real thing; a deployment
 * swaps the table for its tokenizer's via [[fromMergesFile]] +
 * [[BpeEncode.register]]. Every merge's operands are single characters or
 * outputs of earlier merges (the validity invariant the class doc relies
 * on — fromMergesFile enforces it on load).
 */
object BpeTokenizer {

  /** Pre-tokenization: letter runs, digit runs, single other marks — the
    * same pattern q48 counted with, now feeding the merge stage. Matches
    * identically under Java regex and RE2 (the alternatives' character
    * classes are disjoint, so there is no ambiguity to resolve). */
  val preTokenRegex = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** (left, right) merge pairs in rank order; the output token is always
    * the concatenation. */
  val defaultMerges: Array[(String, String)] = Array(
    ("t", "h"), ("th", "e"),               // th, the
    ("i", "n"), ("a", "n"), ("an", "d"),   // in, an, and
    ("e", "r"), ("o", "n"), ("r", "e"),    // er, on, re
    ("e", "d"), ("in", "g"),               // ed, ing
    ("o", "u"), ("s", "t"), ("a", "t"),    // ou, st, at
    ("o", "r"), ("e", "n"), ("t", "o"),    // or, en, to
    ("i", "s"), ("i", "t"), ("a", "l"),    // is, it, al
    ("l", "l"), ("o", "o"), ("e", "e"),    // ll, oo, ee
    ("s", "s"), ("o", "f"), ("h", "e"),    // ss, of, he
    ("a", "r"), ("w", "h"), ("l", "e"),    // ar, wh, le
    ("c", "h"), ("s", "h"),                // ch, sh
    ("0", "0"), ("1", "9"))                // 00, 19

  /** One chain pass as nested DuckDB `replace` calls over column `col` —
    * the oracle's equivalent of the expression's inner merge loop. */
  def duckChainSql(col: String): String =
    defaultMerges.foldLeft(col) { case (acc, (a, b)) =>
      s"replace($acc, ' $a $b ', ' $a$b ')"
    }

  /** Stand-in vocab paired with [[defaultMerges]]: every merge OUTPUT maps
    * to an id above the Unicode codepoint space (0x110000 + rank) so the
    * codepoint fallback (single-codepoint token -> its codepoint) can
    * never collide with a merge id — together they make the default
    * `bpe_encode_ids` total over arbitrary text, the way a real vocab's
    * byte fallback is. A LOADED vocab.json replaces this wholesale via
    * [[fromVocabFile]]. ONE source of truth: the DuckDB oracle's mapping
    * ([[duckVocabSql]]) is generated from this same map. */
  val defaultVocab: Map[String, Int] =
    defaultMerges.zipWithIndex.map { case ((a, b), i) => (a + b, 0x110000 + i) }.toMap

  /** [[defaultVocab]] as a DuckDB VALUES CTE (`vocab(token, id)`) —
    * consumers coalesce to `unicode(token)` for the codepoint fallback. */
  def duckVocabSql: String =
    "vocab AS (SELECT * FROM (VALUES " +
      defaultVocab.toSeq.sortBy(_._2)
        .map { case (t, i) => s"('$t', $i)" }.mkString(", ") +
      ") v(token, id))"

  /** Load a tokenizer's `vocab.json` (one JSON object, token -> integer
    * id) through the Hadoop FileSystem, same deployment path as
    * [[fromMergesFile]]. Fails loud on anything that would otherwise
    * corrupt ids silently: non-JSON, a non-object root, a non-integer id,
    * two tokens sharing one id (an undecodable vocab), or an empty
    * table. */
  def fromVocabFile(path: String,
      hadoopConf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Map[String, Int] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val in = fs.open(p)
    val content =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val root =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(content)
      catch {
        case scala.util.control.NonFatal(e) =>
          throw new IllegalArgumentException(s"$path: not valid JSON: ${e.getMessage}")
      }
    if (root == null || !root.isObject)
      throw new IllegalArgumentException(
        s"$path: vocab.json must be a single {\"token\": id} object")
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val byId = scala.collection.mutable.HashMap.empty[Int, String]
    val it = root.fields()
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue
      if (!v.isIntegralNumber || !v.canConvertToInt)
        throw new IllegalArgumentException(
          s"$path: id for token '${e.getKey}' is not a 32-bit integer ($v)")
      val id = v.asInt()
      byId.get(id).foreach { other =>
        throw new IllegalArgumentException(
          s"$path: tokens '$other' and '${e.getKey}' share id $id — undecodable vocab")
      }
      byId(id) = e.getKey
      out(e.getKey) = id
    }
    if (out.isEmpty)
      throw new IllegalArgumentException(s"$path: no vocab entries found")
    out.toMap
  }

  /** Load a TRAINED tokenizer's merges table from a `merges.txt` — the
    * deployment path that swaps [[defaultMerges]] for the real thing
    * (feed the result to [[BpeEncode.register]]). Format: one
    * space-separated pair per line, rank = line order; blank lines and
    * `#...` header/comment lines (the conventional `#version:` stamp)
    * are skipped. Resolved through the Hadoop FileSystem of the path's
    * own scheme, so `file:`, `hdfs:` and `s3a:` tokenizer artifacts all
    * load — a merges table is kilobytes, one driver-side read.
    *
    * VALIDATES the lower-rank-operands invariant the merge engine's
    * rank-order-exhaustive equivalence rests on (see [[BpeEncode]]'s
    * class doc) and fails loud with the offending line: a corrupted or
    * hand-edited table that references a pair never produced by an
    * earlier rank would otherwise silently never fire that merge and
    * miscount every token budget downstream. */
  def fromMergesFile(path: String,
      hadoopConf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Array[(String, String)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val in = fs.open(p)
    val raw =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
      finally in.close()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val outputs = scala.collection.mutable.Set.empty[String]
    def singleCodepoint(sym: String): Boolean =
      sym.length == Character.charCount(sym.codePointAt(0))
    raw.zipWithIndex.foreach { case (line, i) =>
      val t = line.trim
      if (t.nonEmpty && !t.startsWith("#")) {
        val parts = t.split(" ")
        if (parts.length != 2)
          throw new IllegalArgumentException(
            s"$path:${i + 1}: expected 'left right', got '$line'")
        val Array(a, b) = parts
        for (sym <- Seq(a, b))
          if (!singleCodepoint(sym) && !outputs.contains(sym))
            throw new IllegalArgumentException(
              s"$path:${i + 1}: operand '$sym' is neither a single codepoint nor " +
                s"the output of a lower-ranked merge — invalid merges table")
        merges += ((a, b))
        outputs += (a + b)
      }
    }
    if (merges.isEmpty)
      throw new IllegalArgumentException(s"$path: no merges found")
    merges.toArray
  }
}
