package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BpeEncode, BpeTokenizer}

/** [[BpeEncode]] against handcrafted merge cascades — the subword
  * tokenizer behind q48's counts and q64's packing offsets. The e2e
  * cross-engine equality is the DuckDB oracle's job (CORRECTNESS gate);
  * this pins the merge semantics on inputs small enough to verify by
  * hand. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def enc(text: String): Seq[String] = {
    BpeEncode.register(spark)
    import spark.implicits._
    Seq(text).toDF("text").selectExpr("bpe_encode(text) AS t")
      .collect().head.getSeq[String](0)
  }

  test("merges table is valid: operands are chars or outputs of earlier merges") {
    // the invariant that makes rank-order exhaustive application
    // equivalent to best-pair-first BPE — see BpeEncode's class doc
    val outputs = scala.collection.mutable.Set.empty[String]
    BpeTokenizer.defaultMerges.foreach { case (a, b) =>
      assert(a.length == 1 || outputs.contains(a), s"operand '$a' unavailable at its rank")
      assert(b.length == 1 || outputs.contains(b), s"operand '$b' unavailable at its rank")
      outputs += (a + b)
    }
  }

  test("cascading merges build multi-level tokens") {
    // and: (a,n) then (an,d); standing: (i,n), (a,n), (an,d), (in,g), (s,t)
    assert(enc("and") == Seq("and"))
    assert(enc("standing") == Seq("st", "and", "ing"))
    // the: (t,h) then (th,e) — and the leftover e stays a character
    assert(enc("thee") == Seq("the", "e"))
  }

  test("rank order decides when merges compete for a character") {
    // hello: (l,l) at rank 20 beats (h,e) at rank 25? No — they do not
    // compete; both apply: h e l l o -> he ll o
    assert(enc("hello") == Seq("he", "ll", "o"))
    // cat: only (a,t) applies — c stays single
    assert(enc("cat") == Seq("c", "at"))
  }

  test("pre-tokenization: letter runs, digit runs, single marks; spaces vanish") {
    assert(enc("the cat!") == Seq("the", "c", "at", "!"))
    assert(enc("2019") == Seq("2", "0", "19"))
    assert(enc("") == Seq.empty)
    assert(enc("   ") == Seq.empty)
  }

  test("fromMergesFile: loads merges.txt (rank = line order), skips header/blank lines") {
    val f = java.nio.file.Files.createTempFile("graft-merges", ".txt")
    java.nio.file.Files.writeString(f,
      """#version: 0.2
        |t h
        |
        |th e
        |i n
        |in g
        |""".stripMargin)
    val merges = BpeTokenizer.fromMergesFile(f.toString)
    assert(merges.toSeq == Seq(("t", "h"), ("th", "e"), ("i", "n"), ("in", "g")))
    // the loaded table drives the engine exactly like the built-in one: a
    // fresh session registers bpe_encode over it (the shared session keeps
    // the default-table registration — first registration wins per session)
    val s2 = spark.newSession()
    graft.functions.BpeEncode.register(s2, merges)
    import s2.implicits._
    val got = Seq("thinking the").toDF("text").selectExpr("bpe_encode(text) AS t")
      .collect().head.getSeq[String](0)
    assert(got == Seq("th", "in", "k", "ing", "the"))
  }

  test("fromMergesFile: writing the default table round-trips to identical encoding") {
    val f = java.nio.file.Files.createTempFile("graft-merges-default", ".txt")
    java.nio.file.Files.writeString(f,
      BpeTokenizer.defaultMerges.map { case (a, b) => s"$a $b" }.mkString("\n"))
    assert(BpeTokenizer.fromMergesFile(f.toString).toSeq ==
      BpeTokenizer.defaultMerges.toSeq)
  }

  test("fromMergesFile: fails loud on invalid tables, with the offending line") {
    def bad(content: String): String = {
      val f = java.nio.file.Files.createTempFile("graft-merges-bad", ".txt")
      java.nio.file.Files.writeString(f, content)
      intercept[IllegalArgumentException] {
        BpeTokenizer.fromMergesFile(f.toString)
      }.getMessage
    }
    // operand 'th' referenced before any merge produces it
    assert(bad("th e\nt h").contains(":1"))
    // malformed line (three fields)
    assert(bad("t h e").contains(":1"))
    // empty table
    assert(bad("#version: 0.2\n").contains("no merges"))
  }

  // --- token ids (bpe_encode_ids) ---

  private def encIds(text: String): Seq[Int] = {
    BpeEncode.registerIds(spark)
    import spark.implicits._
    Seq(text).toDF("text").selectExpr("bpe_encode_ids(text) AS t")
      .collect().head.getSeq[Int](0)
  }

  test("bpe_encode_ids: merge outputs map to vocab ids, singles to codepoints") {
    // "the cat!" -> tokens [the, c, at, !]; defaultVocab ids are
    // 0x110000 + rank ((th,e) is rank 1, (a,t) rank 12), singles fall
    // back to their codepoint ('c' 99, '!' 33)
    assert(encIds("the cat!") ==
      Seq(0x110000 + 1, 99, 0x110000 + 12, 33))
    // ids and strings tokenize identically: same count, aligned tokens
    assert(encIds("standing") == Seq(0x110000 + 11, 0x110000 + 4, 0x110000 + 9))
    assert(encIds("") == Seq.empty)
  }

  test("bpe_encode_ids: supplementary-plane fallback is the codepoint, not a unit") {
    // one emoji = one pre-token (single mark), not in the vocab -> its
    // CODEPOINT (0x1F600), never a surrogate half
    assert(encIds("😀") == Seq(0x1F600))
  }

  test("fromVocabFile: loads vocab.json and drives bpe_encode_ids on a fresh session") {
    val mf = java.nio.file.Files.createTempFile("graft-merges", ".txt")
    java.nio.file.Files.writeString(mf, "t h\nth e\ni n\nin g")
    val vf = java.nio.file.Files.createTempFile("graft-vocab", ".json")
    java.nio.file.Files.writeString(vf,
      """{"th": 500, "the": 501, "in": 502, "ing": 503,
        |"t": 1, "h": 2, "e": 3, "i": 4, "n": 5, "g": 6, "k": 10}""".stripMargin)
    val merges = BpeTokenizer.fromMergesFile(mf.toString)
    val vocab = BpeTokenizer.fromVocabFile(vf.toString)
    assert(vocab("the") == 501 && vocab("k") == 10 && vocab.size == 11)
    val s2 = spark.newSession()
    // fallback OFF: the loaded vocab is total over this text, and any
    // miss would be a real merges/vocab mismatch
    BpeEncode.registerIds(s2, merges, vocab, codepointFallback = false)
    import s2.implicits._
    val got = Seq("thinking the").toDF("text").selectExpr("bpe_encode_ids(text) AS t")
      .collect().head.getSeq[Int](0)
    // th in k ing | the
    assert(got == Seq(500, 502, 10, 503, 501))
  }

  test("bpe_encode_ids fails loud on a merges/vocab mismatch") {
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
    val mf = java.nio.file.Files.createTempFile("graft-merges", ".txt")
    java.nio.file.Files.writeString(mf, "t h\nth e")
    val merges = BpeTokenizer.fromMergesFile(mf.toString)
    // vocab is missing the merged token 'the' -> loud error even with the
    // codepoint fallback on (a MERGED token can never fall back)
    val s2 = spark.newSession()
    BpeEncode.registerIds(s2, merges, Map("th" -> 1, "t" -> 2, "h" -> 3, "e" -> 4))
    import s2.implicits._
    val e = intercept[Exception] {
      Seq("the").toDF("text").selectExpr("bpe_encode_ids(text)").collect()
    }
    assert(chain(e).contains("merges/vocab mismatch"), chain(e))
    assert(chain(e).contains("'the'"), chain(e))
    // fallback OFF: even a missing SINGLE codepoint fails loud
    val s3 = spark.newSession()
    BpeEncode.registerIds(s3, merges, Map("th" -> 1, "the" -> 2),
      codepointFallback = false)
    val e3 = intercept[Exception] {
      val d = s3.implicits.localSeqToDatasetHolder(Seq("tax")).toDF("text")
      d.selectExpr("bpe_encode_ids(text)").collect()
    }
    assert(chain(e3).contains("merges/vocab mismatch"), chain(e3))
  }

  test("fromVocabFile fails loud on corrupt vocabs, with the reason") {
    def bad(content: String): String = {
      val f = java.nio.file.Files.createTempFile("graft-vocab-bad", ".json")
      java.nio.file.Files.writeString(f, content)
      intercept[IllegalArgumentException] {
        BpeTokenizer.fromVocabFile(f.toString)
      }.getMessage
    }
    assert(bad("not json").contains("not valid JSON"))
    assert(bad("[1, 2]").contains("must be a single"))
    assert(bad("""{"a": "one"}""").contains("not a 32-bit integer"))
    assert(bad("""{"a": 1, "b": 1}""").contains("share id 1"))
    assert(bad("{}").contains("no vocab entries"))
  }

  test("a conflicting re-register fails loud with both provenances") {
    // first-registration-wins used to silently keep the first table; now
    // a DIFFERENT table throws (same table stays idempotent) — which also
    // makes the default-merges oracle paths (q48/q64/q73) fail loud in a
    // session that registered a trained table, instead of hash-comparing
    // against a default-chain DuckDB oracle
    val s2 = spark.newSession()
    val custom = Array(("x", "y"))
    BpeEncode.register(s2, custom)
    BpeEncode.register(s2, Array(("x", "y"))) // same content: fine
    val e = intercept[IllegalStateException] {
      BpeEncode.register(s2) // the default table — different
    }
    assert(e.getMessage.contains("custom table (1 merges"), e.getMessage)
    assert(e.getMessage.contains("built-in default table (32 merges"), e.getMessage)
    // the ids form shares the guard: same session, different merges -> loud
    val e2 = intercept[IllegalStateException] { BpeEncode.registerIds(s2) }
    assert(e2.getMessage.contains("bpe_encode_ids"), e2.getMessage)
  }

  test("executor-wide word caches stay bounded across many merges broadcasts") {
    // each registered merges table caches under its broadcast id; a
    // long-lived executor must not accrete one cache per dead broadcast
    // (r11 ADVICE) — the LRU keeps at most maxMemoTables live
    (0 until 20).foreach(i => graft.functions.BpeEncode.memoFor(1000000L + i))
    assert(graft.functions.BpeEncode.liveMemoTables <=
      graft.functions.BpeEncode.maxMemoTables)
  }

  test("q64 packing offsets stay consistent with q48's counts") {
    // both queries must see the SAME token counts (one expression, one
    // merges broadcast) — sum of q64's per-doc n_tokens == q48's total
    val dir = "/root/testdata/sf0.001"
    val total48 = graft.queries.TextPipeline.queries("q48_bpe_tokens")(spark, dir)
      .selectExpr("sum(total_bpe_tokens)").collect().head.getLong(0)
    val total64 = graft.queries.TextPipeline.queries("q64_concat_chunks")(spark, dir)
      .selectExpr("sum(n_tokens)").collect().head.getLong(0)
    graft.queries.Caches.releaseAll()
    assert(total48 == total64, s"q48 $total48 vs q64 $total64")
    assert(total48 > 0)
  }
}
