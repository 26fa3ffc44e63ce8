package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Behavior specs for the training-mix shaping queries (q70-q72) over
 * handcrafted corpora whose expected outputs are computed BY HAND in the
 * comments — the sf0.01 DuckDB oracle proves cross-engine agreement, these
 * prove the semantics are the intended ones on shapes the synthetic corpus
 * doesn't contain (a pathologically repetitive doc, a one-token doc, a
 * domain over the cap, a 9:1 language imbalance).
 */
class MixShapingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-mix-corpus").toString
    rows.map { case (id, tx, lang, src) => (id, tx, lang, src, tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$d/documents.parquet")
    d
  }

  private def run(name: String, dir: String): Array[org.apache.spark.sql.Row] =
    graft.queries.Caches.scoped {
      SparkEntry.queries(name)(spark, dir).collect()
    }

  // --- q70 repetition flags ---

  test("q70 flags the alternating-2-gram doc and passes the all-distinct doc") {
    // doc 0: "spam ham" x 10 (20 tokens, n_chars 89).
    //   "spam ham" occurs 10x (len 8) -> top2_chars 80, frac 80/89 = 0.8989;
    //   3-grams "spam ham spam" 9x (len 13) + "ham spam ham" 9x (len 12)
    //   -> dup3_chars 225, frac 225/89 = 2.5281 (occurrence x length
    //   coverage deliberately counts overlaps, so > 1 is possible).
    // doc 1: 20 distinct 5-letter words (n_chars 119): every 2-gram count
    //   1 -> top2_chars = 11, frac 11/119 = 0.0924 < 0.10; no duplicate
    //   3-gram -> dup3 0. Not flagged.
    // doc 2: one token — no 2-grams at all; both fracs coalesce to 0.
    val spam = Seq.fill(10)("spam ham").mkString(" ")
    val clean = Seq("abcde", "bcdef", "cdefg", "defgh", "efghi", "fghij",
      "ghijk", "hijkl", "ijklm", "jklmn", "klmno", "lmnop", "mnopq", "nopqr",
      "opqrs", "pqrst", "qrstu", "rstuv", "stuvw", "tuvwx").mkString(" ")
    val dir = writeDocs(Seq(
      (0L, spam, "en", "s0"), (1L, clean, "en", "s0"), (2L, "solo", "en", "s0")))
    val rows = run("q70_repetition_flags", dir)
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getInt(3))))
      .toMap
    assert(rows(0L) == ((0.8989, 2.5281, 1)), s"spam doc: ${rows(0L)}")
    assert(rows(1L) == ((0.0924, 0.0, 0)), s"clean doc: ${rows(1L)}")
    assert(rows(2L) == ((0.0, 0.0, 0)), s"one-token doc: ${rows(2L)}")
  }

  // --- q71 domain cap ---

  test("q71 caps the big domain at 5 by md5 order and keeps the small one whole") {
    // (en, big): 8 docs — exactly 5 survive; (en, small): 3 docs — all 3
    // survive. The 5 kept from `big` must be the 5 with the SMALLEST
    // md5-prefix values (hash order, not id order) with rn dense in 1..5.
    val dir = writeDocs(
      (0L to 7L).map(i => (i, s"doc $i text", "en", "big")) ++
        (8L to 10L).map(i => (i, s"doc $i text", "en", "small")))
    val rows = run("q71_domain_cap", dir)
      .map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
    val big = rows.filter(_._1 == "big").sortBy(_._3)
    val small = rows.filter(_._1 == "small").sortBy(_._3)
    assert(big.length == 5 && big.map(_._3).toSeq == (1 to 5), s"big: $big")
    assert(small.length == 3 && small.map(_._3).toSeq == (1 to 3), s"small: $small")
    // independent expectation: order (0..7) by the same engine-neutral
    // hash the query uses and take the first 5
    import spark.implicits._
    val expect = (0L to 7L).toDF("doc_id").selectExpr("doc_id",
        "cast(conv(substring(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint) AS h")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, h) => (h, id) }.take(5).map(_._1)
    assert(big.map(_._2).toSeq == expect.toSeq,
      s"kept ids ${big.map(_._2).toSeq} != hash-order expectation ${expect.toSeq}")
  }

  test("repetition_chars matches an explode+groupBy recount on random texts") {
    // independent formulation of the same counts — explode the grams and
    // re-aggregate — over seeded-random texts plus the edge shapes the
    // fused loop must get right: empty text, one token, consecutive
    // spaces (empty tokens), and supplementary-plane code points (length
    // must count CODE POINTS, not UTF-16 units)
    import spark.implicits._
    graft.functions.RepetitionChars.register(spark)
    val rnd = new scala.util.Random(4099)
    val vocab = Vector("a", "bb", "ccc", "😀", "the", "zz")
    val texts = Seq("", "solo", "a  b", "😀 x 😀 x y") ++
      (0 until 60).map(_ =>
        (0 until (1 + rnd.nextInt(30))).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.selectExpr("id", "repetition_chars(text) AS rc")
      .selectExpr("id", "rc[0] AS top2", "rc[1] AS dup3")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def gramCounts(n: Int) = df
      .selectExpr("id", "split(text, ' ') AS tk")
      .where(s"size(tk) >= $n")
      .selectExpr("id",
        s"explode(transform(sequence(1, size(tk) - ${n - 1}), i -> " +
          (1 to n).map(j => s"element_at(tk, i + ${j - 1})")
            .mkString("concat(", ", ' ', ", ")") + ")) AS g")
      .groupBy("id", "g").count()
    val top2 = gramCounts(2).groupBy("id")
      .agg(org.apache.spark.sql.functions.expr("max(count * length(g))").as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dup3 = gramCounts(3).groupBy("id")
      .agg(org.apache.spark.sql.functions
        .expr("sum(CASE WHEN count > 1 THEN count * length(g) ELSE 0 END)").as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, (t2, d3)) <- got) {
      assert(t2 == top2.getOrElse(id, 0L), s"id $id top2 $t2 != recount")
      assert(d3 == dup3.getOrElse(id, 0L), s"id $id dup3 $d3 != recount")
    }
  }

  // --- q73 end-to-end mix pipeline ---

  test("q73 drops the dupe, the repetitive doc, and the low-quality doc, then caps") {
    // Each drop reason is ISOLATED so a pass can't be explained by the
    // wrong gate:
    //  - docs 0/1: identical clean text (20 distinct 6-char words) ->
    //    exact dedup keeps 0, drops 1; nothing else touches them;
    //  - doc 2: "t00000 t00001" twice then 28 distinct words — top2 =
    //    2*13/223 = 0.117 > 0.10 (repetitive) but d=30/n=32 keeps
    //    quality at 7710 >= 6100: dropped by REPETITION alone;
    //  - doc 3: one hub word alternating with 10 distinct others —
    //    no repeated 2-gram (top2 = 13/139 = 0.094) but d=11/n=20 puts
    //    quality at 5800 < 6100: dropped by QUALITY alone;
    //  - docs 4..15: twelve distinct clean docs in ONE (en, big) domain
    //    -> the cap keeps the 5 smallest by md5-prefix hash order.
    val dup = (0 until 20).map(j => f"dupw$j%02d").mkString(" ")
    val rep = "t00000 t00001 t00000 t00001 " +
      (0 until 28).map(j => f"rep$j%03d").mkString(" ")
    val lowq = (0 until 10).map(j => f"hub000 fil$j%03d").mkString(" ")
    val dir = writeDocs(Seq(
      (0L, dup, "en", "dup"), (1L, dup, "en", "dup"),
      (2L, rep, "en", "bad"), (3L, lowq, "en", "bad")) ++
      (4L to 15L).map(i =>
        (i, (0 until 20).map(j => f"d$i%02dw$j%02d").mkString(" "), "en", "big")))
    val rows = run("q73_mix_pipeline", dir)
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getInt(4)))
    val ids = rows.map(_._1).toSet
    assert(ids.contains(0L) && !ids.contains(1L), s"dedup keeper: $ids")
    assert(!ids.contains(2L), "repetitive doc survived")
    assert(!ids.contains(3L), "low-quality doc survived")
    // cap: exactly the 5 hash-smallest of the big domain
    import spark.implicits._
    val hashed = (4L to 15L).toDF("doc_id").selectExpr("doc_id",
        "cast(conv(substring(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint) AS h")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expectBig = hashed.sortBy { case (id, h) => (h, id) }.take(5).map(_._1).toSet
    assert(ids == expectBig + 0L, s"kept $ids != ${expectBig + 0L}")
    // split matches the doc's md5 bucket; token count matches the encoder
    val buckets = hashed.toMap
    for ((id, _, _, split, _) <- rows if id >= 4L) {
      val b = buckets(id) % 100
      val want = if (b < 90) "train" else if (b < 95) "val" else "test"
      assert(split == want, s"doc $id split $split != $want (bucket $b)")
    }
    graft.functions.BpeEncode.register(spark)
    val nTok = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "size(bpe_encode(coalesce(text, ''))) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for ((id, _, _, _, n) <- rows)
      assert(n == nTok(id) && n > 0, s"doc $id n_tokens $n != ${nTok(id)}")
  }

  test("q74 streaming gate keeps exactly the batch gate's survivors") {
    // same corpus as the q73 test; the STREAMING gate has no dedup stage,
    // so BOTH copies of the dupe text pass (they're clean), while the
    // repetitive doc 2 and low-quality doc 3 are dropped in-flight
    val dup = (0 until 20).map(j => f"dupw$j%02d").mkString(" ")
    val rep = "t00000 t00001 t00000 t00001 " +
      (0 until 28).map(j => f"rep$j%03d").mkString(" ")
    val lowq = (0 until 10).map(j => f"hub000 fil$j%03d").mkString(" ")
    val dir = writeDocs(Seq(
      (0L, dup, "en", "dup"), (1L, dup, "en", "dup"),
      (2L, rep, "en", "bad"), (3L, lowq, "en", "bad")) ++
      (4L to 15L).map(i =>
        (i, (0 until 20).map(j => f"d$i%02dw$j%02d").mkString(" "), "en", "big")))
    val ids = run("q74_stream_mix_gate", dir).map(_.getLong(0)).toSet
    assert(ids == (Set(0L, 1L) ++ (4L to 15L)), s"streamed survivors: $ids")
  }

  test("q75 stops at the 3000-token budget per language, in hash order") {
    // lang "big": three 2000-token docs — only the hash-first one fits
    // (inclusive cum 2000; the next would reach 4000 > 3000);
    // lang "sm": two 100-token docs — both fit (cum 100, 200)
    val big = Seq.fill(2000)("w").mkString(" ")
    val sm = Seq.fill(100)("v").mkString(" ")
    val dir = writeDocs(Seq(
      (0L, big, "big", "s"), (1L, big, "big", "s"), (2L, big, "big", "s"),
      (3L, sm, "sm", "s"), (4L, sm, "sm", "s")))
    val rows = run("q75_token_budget", dir)
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2).toLong, r.getLong(3)))
    val bigKept = rows.filter(_._2 == "big")
    val smKept = rows.filter(_._2 == "sm").sortBy(_._4)
    assert(smKept.map(x => (x._3, x._4)).toSeq == Seq((100L, 100L), (100L, 200L)),
      s"sm: $smKept")
    assert(bigKept.length == 1 && bigKept.head._4 == 2000L, s"big: $bigKept")
    // the kept big doc is the hash-order first, not the min id
    import spark.implicits._
    val first = Seq(0L, 1L, 2L).toDF("doc_id").selectExpr("doc_id",
        "cast(conv(substring(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint) AS h")
      .collect().map(r => (r.getLong(1), r.getLong(0))).min._2
    assert(bigKept.head._1 == first, s"kept ${bigKept.head._1}, hash-first $first")
  }

  test("q76 weighted take: the sqrt boost visibly shifts the low-resource share") {
    // 900 docs x 100 tokens in lang "hi", 100 docs x 100 tokens in "lo".
    // s6(hi) = floor(sqrt(900) * 1e6) = 30e6, s6(lo) = 10e6, total 40e6:
    //   budget(hi) = round(0.75 * 15000) = 11250 -> 112 docs (11200 tok),
    //   budget(lo) = round(0.25 * 15000) = 3750  -> 37 docs (3700 tok).
    // A PROPORTIONAL split (budget_l ~ n_l) would give lo only 1500
    // tokens (10%); the sqrt weighting lifts its kept-token share to
    // 3700 / 14900 = 24.8% — the low-resource boost made material.
    val mk = (lang: String, ids: Range) =>
      ids.map(i => (i.toLong, Seq.fill(100)(s"w$i").mkString(" "), lang, "s"))
    val dir = writeDocs(mk("hi", 0 until 900) ++ mk("lo", 900 until 1000))
    val rows = run("q76_weighted_take", dir)
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2).toLong, r.getLong(3),
        r.getLong(4)))
    val byLang = rows.groupBy(_._2)
    assert(byLang("hi").forall(_._5 == 11250L) && byLang("lo").forall(_._5 == 3750L),
      s"budgets: ${rows.map(_._5).distinct.toSeq}")
    assert(byLang("hi").length == 112 && byLang("lo").length == 37,
      s"kept: hi ${byLang("hi").length}, lo ${byLang("lo").length}")
    // every kept doc's inclusive running total respects its language budget
    assert(rows.forall(r => r._4 <= r._5), "a kept doc exceeds its budget")
    val loShare = byLang("lo").map(_._3).sum.toDouble / rows.map(_._3).sum
    assert(loShare > 0.2, f"lo kept-token share $loShare%.3f not boosted past " +
      "its proportional 10%")
    // the flat-budget q75 take on the same corpus keeps 3000 tokens per
    // language — the weighted take is a genuinely different allocation
    val flat = run("q75_token_budget", dir).map(r => (r.getString(1), r.getInt(2)))
    val flatLo = flat.filter(_._1 == "lo").map(_._2).sum
    assert(flatLo == 3000 && byLang("lo").map(_._3).sum == 3700L,
      s"flat lo $flatLo vs weighted lo ${byLang("lo").map(_._3).sum}")
  }

  test("mixPipeline knobs: gates off re-admit exactly the gated docs, capK binds") {
    // the q73 corpus again — every drop there was attributed to one gate,
    // so each knob's effect is predictable doc-by-doc
    val dup = (0 until 20).map(j => f"dupw$j%02d").mkString(" ")
    val rep = "t00000 t00001 t00000 t00001 " +
      (0 until 28).map(j => f"rep$j%03d").mkString(" ")
    val lowq = (0 until 10).map(j => f"hub000 fil$j%03d").mkString(" ")
    val dir = writeDocs(Seq(
      (0L, dup, "en", "dup"), (1L, dup, "en", "dup"),
      (2L, rep, "en", "bad"), (3L, lowq, "en", "bad")) ++
      (4L to 15L).map(i =>
        (i, (0 until 20).map(j => f"d$i%02dw$j%02d").mkString(" "), "en", "big")))
    // gates disabled + cap above every domain: ONLY dedup drops anything —
    // doc 1 (the dupe copy) is the sole casualty
    val open = graft.queries.Caches.scoped {
      graft.queries.TextPipeline.mixPipeline(spark, dir,
        minQualityE4 = 0L, repThreshold = 1e9, capK = 100).collect()
    }.map(_.getLong(0)).toSet
    assert(open == (Set(0L, 2L, 3L) ++ (4L to 15L)), s"gates-off kept: $open")
    // tighter cap at the oracled gates: the big domain keeps exactly its
    // 2 hash-smallest (same deterministic rank the cap-5 run orders by)
    val capped = graft.queries.Caches.scoped {
      graft.queries.TextPipeline.mixPipeline(spark, dir, capK = 2).collect()
    }.map(_.getLong(0)).toSet
    import spark.implicits._
    val expectBig = (4L to 15L).toDF("doc_id").selectExpr("doc_id",
        "cast(conv(substring(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint) AS h")
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .sortBy(identity).take(2).map(_._2).toSet
    assert(capped == expectBig + 0L, s"capK=2 kept $capped != ${expectBig + 0L}")
    // the default call IS the oracled q73 result
    val viaBuilder = graft.queries.Caches.scoped {
      graft.queries.TextPipeline.mixPipeline(spark, dir).collect()
    }.map(_.toSeq).toSet
    val viaEntry = run("q73_mix_pipeline", dir).map(_.toSeq).toSet
    assert(viaBuilder == viaEntry, "builder defaults diverged from the q73 entry")
  }

  test("weightedTake scales each language's budget with the total") {
    // the q76 corpus at double the budget: same 0.75/0.25 weights, so
    // budgets become 22500/7500 -> 225 and 75 kept docs of 100 tokens
    val mk = (lang: String, ids: Range) =>
      ids.map(i => (i.toLong, Seq.fill(100)(s"w$i").mkString(" "), lang, "s"))
    val dir = writeDocs(mk("hi", 0 until 900) ++ mk("lo", 900 until 1000))
    val rows = graft.queries.Caches.scoped {
      graft.queries.TextPipeline.weightedTake(spark, dir,
        totalBudget = 30000L).collect()
    }.map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4)))
    val byLang = rows.groupBy(_._2)
    assert(byLang("hi").forall(_._4 == 22500L) && byLang("lo").forall(_._4 == 7500L),
      s"budgets: ${rows.map(_._4).distinct.toSeq}")
    assert(byLang("hi").length == 225 && byLang("lo").length == 75,
      s"kept: hi ${byLang("hi").length}, lo ${byLang("lo").length}")
    // the default-budget take is a strict prefix of the doubled one per
    // language (deterministic hash order, monotone budgets)
    val small = graft.queries.Caches.scoped {
      graft.queries.TextPipeline.weightedTake(spark, dir).collect()
    }.map(r => (r.getLong(0), r.getLong(3))).toSet
    val bigSet = rows.map(r => (r._1, r._3)).toSet
    assert(small.subsetOf(bigSet), "default take is not a prefix of the 2x take")
  }

  test("q78 mix take: weights see the CLEANED mix, take is the maximal hash prefix") {
    // lang "hi": 12 clean docs; lang "lo": 3 clean + 9 low-quality docs
    // (the q73 quality-gate casualty shape: "hub000 filler" alternation
    // scores 5800 < 6100). RAW language counts are 12 vs 12 — equal s6,
    // budgets 7500/7500 — but SURVIVOR counts are 12 vs 3:
    //   s6(hi) = floor(sqrt(12)*1e6) = 3464101, s6(lo) = 1732050,
    //   total 5196151 -> budget(hi) = 10000, budget(lo) = 5000 (half-up).
    // The emitted budgets are direct evidence the alpha weights are
    // computed AFTER the gates, over the mixture actually being sampled.
    // fixed-width words: with every token the same length L the largest
    // 2-gram coverage is (2L+1)/(20L+19) < 0.10 structurally — mixed
    // widths can tip the repetition gate (e.g. 13/129 = 0.1008)
    val clean = (lang: String, i: Long) =>
      (i, (0 until 20).map(j => f"$lang%s$i%02dw$j%02d").mkString(" "), lang, s"s$i")
    val lowq = (i: Long) =>
      (i, (0 until 10).map(j => f"hub0000 q$i%02df$j%03d").mkString(" "), "lo", s"s$i")
    val dir = writeDocs((0L until 12L).map(clean("hi", _)) ++
      (12L until 15L).map(clean("lo", _)) ++ (15L until 24L).map(lowq))
    val surv = run("q73_mix_pipeline", dir)
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getInt(4)))
    assert(surv.map(_._2).groupBy(identity).view.mapValues(_.length).toMap ==
      Map("hi" -> 12, "lo" -> 3), s"survivors: ${surv.toSeq}")
    val take = run("q78_mix_take", dir)
    assert(take.map(r => (r.getString(1), r.getLong(6))).toMap ==
      Map("hi" -> 10000L, "lo" -> 5000L),
      "budgets don't reflect the survivor language counts")
    // every taken row is a q73 survivor row, column for column, and at
    // the default budget every survivor fits (total BPE tokens << 10000)
    val survSet = surv.toSet
    assert(take.forall(r => survSet.contains((r.getLong(0), r.getString(1),
      r.getString(2), r.getString(3), r.getInt(4)))),
      "q78 emitted a row q73 does not contain")
    assert(take.length == surv.length, "a survivor fell out of the slack take")
    // a TIGHT budget (300 -> budgets 200/100) forces the cutoff: the take
    // must be exactly the maximal prefix of each language's survivors in
    // deterministic (md5-hash, doc_id) order whose inclusive cum fits.
    // The bounds are token-count-agnostic: a 20-word doc of 7-char words
    // holds between 20 (one token per word) and 160 (8 spaced symbols per
    // word, no merge fires) BPE tokens — so hi's first doc always FITS its
    // 200 budget, and hi's 12 survivors (>= 240 tokens) always EXCEED it.
    import spark.implicits._
    val hOf = surv.map(_._1).toSeq.toDF("doc_id").selectExpr("doc_id",
        "cast(conv(substring(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint) AS h")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tightBudget = Map("hi" -> 200L, "lo" -> 100L)
    val expected = surv.groupBy(_._2).toSeq.flatMap { case (lang, docs) =>
      var cum = 0L
      docs.sortBy(d => (hOf(d._1), d._1)).toSeq.flatMap { d =>
        cum += d._5
        if (cum <= tightBudget(lang)) Some((d._1, cum)) else None
      }
    }.toSet
    val tight = graft.queries.Caches.scoped {
      graft.queries.TextPipeline.mixTake(spark, dir, totalBudget = 300L).collect()
    }
    assert(tight.map(r => (r.getString(1), r.getLong(6))).toSet
      .subsetOf(Set("hi" -> 200L, "lo" -> 100L)), "tight budgets off")
    assert(tight.map(r => (r.getLong(0), r.getLong(5))).toSet == expected,
      s"tight take is not the maximal hash-order prefix: " +
        s"got ${tight.map(r => (r.getLong(0), r.getLong(5))).toSet}, want $expected")
    assert(tight.exists(_.getString(1) == "hi"), "hi's first doc fell out")
    assert(tight.length < take.length, "the tight budget dropped nothing")
  }

  // --- q72 temperature weights ---

  test("q72 alpha=1/2 weights: 9:1 corpus gives 0.75/0.25 and boosts 0.8333/2.5") {
    // s6(hi) = floor(sqrt(9) * 1e6) = 3e6, s6(lo) = 1e6, total 4e6
    // (weights and boosts are emitted x1e6 as exact bigints — see the
    // query doc on the cross-engine double-rounding hazard):
    //   weight_e6(hi) = round(0.75e6 + eps) = 750000, weight_e6(lo) = 250000;
    //   boost_e6(hi) = round(750000 * 10 / 9) = 833333 (downsampled),
    //   boost_e6(lo) = round(250000 * 10 / 1) = 2500000 (upsampled).
    val dir = writeDocs(
      (0L to 8L).map(i => (i, s"doc $i", "hi", "s0")) :+
        ((9L, "doc 9", "lo", "s0")))
    val rows = run("q72_temperature_weights", dir)
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.size == 10)
    assert(rows(0L) == (("hi", 9L, 750000L, 833333L)), s"hi doc: ${rows(0L)}")
    assert(rows(9L) == (("lo", 1L, 250000L, 2500000L)), s"lo doc: ${rows(9L)}")
  }
}
