package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).head().getAs[T]("v")

  test("tokenCount counts whitespace-separated tokens") {
    assert(one[Int](TextOps.tokenCount(lit("the quick  brown\tfox"))) === 4)
  }

  test("subwordCount splits letter/digit/punct boundaries") {
    // "ab12,cd" -> ab | 12 | , | cd
    assert(one[Int](TextOps.subwordCount(lit("ab12,cd"))) === 4)
  }

  test("avgWordLen") {
    assert(one[Double](TextOps.avgWordLen(lit("ab abcd"))) === 3.0)
  }

  test("punct and upper ratios") {
    assert(one[Double](TextOps.punctRatio(lit("a,b!"))) === 0.5)
    assert(one[Double](TextOps.upperRatio(lit("aAbB"))) === 0.5)
  }

  test("stopwordRatio uses the whole-token match") {
    val r = one[Double](TextOps.stopwordRatio(lit("the cat and theme"), TextOps.defaultStopwords))
    assert(r === 0.5) // "the", "and" of 4; "theme" must not match
  }

  test("wordOccurrences counts whole tokens, including repeats") {
    assert(one[Double](TextOps.wordOccurrences(lit("the the the"), "the")) === 3.0)
    assert(one[Double](TextOps.wordOccurrences(lit("theme thesis"), "the")) === 0.0)
  }

  test("langId picks the marker-heavy language") {
    assert(one[String](TextOps.langId(lit("der hund und die katze nicht"))) === "de")
    assert(one[String](TextOps.langId(lit("the cat is of the house"))) === "en")
    assert(one[String](TextOps.langId(lit("el perro y la casa que"))) === "es")
  }

  test("fingerprint is order- and duplication-insensitive") {
    val a = one[String](TextOps.fingerprint(lit("The cat; sat! cat")))
    val b = one[String](TextOps.fingerprint(lit("sat CAT the")))
    assert(a === b && a === "cat sat the")
  }

  test("rollingHash is order-sensitive") {
    val a = one[Long](TextOps.rollingHash(lit("a b c")))
    val b = one[Long](TextOps.rollingHash(lit("c b a")))
    assert(a !== b)
    assert(one[Long](TextOps.rollingHash(lit("a b c"))) === a)
  }

  test("qualityScore is in [0,1] over the real corpus and favors clean text") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val stats = docs.select(TextOps.qualityScore($"text").as("q"))
      .agg(min($"q"), max($"q")).head()
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(1) <= 1.0)
    val clean = one[Double](TextOps.qualityScore(lit(
      "the house is large and the garden is green with many trees of note " +
        "and it is a fine day in the village for a walk to the market")))
    val junk = one[Double](TextOps.qualityScore(lit("@@@!!! ### $$$ %%%")))
    assert(clean > junk)
  }

  test("language distribution on the corpus is plausible") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val byLang = docs.select(TextOps.langId($"text").as("l"))
      .groupBy("l").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.nonEmpty)
  }

  test("repetitionStats: dup-token and top-bigram fractions on known text") {
    val docs = Seq(
      (1L, "a a a a"),            // 4 tokens, 1 distinct; bigram "a a" x3 / 3 slots
      (2L, "w x y z"),            // all distinct, every bigram unique
      (3L, "solo"),               // < 2 tokens: no bigrams
      (4L, "p q p q p")           // 5 tokens, 2 distinct; "p q" x2 / 4 slots
    ).toDF("doc_id", "text")
    val m = TextOps.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(m(1L) === ((4L, 0.75, 1.0)))
    assert(m(2L) === ((4L, 0.0, 1.0 / 3)))
    assert(m(3L) === ((1L, 0.0, 0.0)))
    assert(m(4L)._1 === 5L)
    assert(math.abs(m(4L)._2 - 0.6) < 1e-12)
    assert(math.abs(m(4L)._3 - 0.5) < 1e-12)
  }

  test("repetitionStats covers every document of the corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = TextOps.repetitionStats(docs, "doc_id", "text")
    assert(out.count() === docs.count())
    val fr = out.agg(min("dup_token_frac"), max("dup_token_frac"),
      min("top_2gram_frac"), max("top_2gram_frac")).head()
    assert(fr.getDouble(0) >= 0.0 && fr.getDouble(1) <= 1.0)
    assert(fr.getDouble(2) >= 0.0 && fr.getDouble(3) <= 1.0)
  }

  test("slidingChunks: stride overlap, tail shortening, min-token drop") {
    val df = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (2L, ""))
      .toDF("doc_id", "text")
    val got = TextOps.slidingChunks(df, "doc_id", "text",
        windowSize = 4, stride = 3, minTokens = 2)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // starts 0,3,6,9 → the last window has 1 token and is dropped
    assert(got === Array(
      (1L, 0, 4, "t1 t2 t3 t4"),
      (1L, 1, 4, "t4 t5 t6 t7"),
      (1L, 2, 4, "t7 t8 t9 t10")))
  }

  test("chunkBySentence packs greedily and never splits a sentence") {
    val df = Seq((1L,
      "One two three. Four five. Six seven eight nine ten eleven. Twelve."
    )).toDF("doc_id", "text")
    val got = TextOps.chunkBySentence(df, "doc_id", "text", maxTokens = 6)
      .orderBy("chunk_id")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    // s1(3) + s2(2) = 5 fits; s3(6) opens chunk 2 exactly at budget;
    // s4(1) joins? 6+1 > 6 -> new chunk
    assert(got.length === 3)
    assert(got(0) === ((0, "One two three. Four five.", 5)))
    assert(got(1)._3 === 6)
    assert(got(2) === ((2, "Twelve.", 1)))
  }

  test("chunkBySentence: oversized sentences form their own chunk; tokens conserve") {
    val df = Seq((1L, "A b c d e f g h. Short one.")).toDF("doc_id", "text")
    val got = TextOps.chunkBySentence(df, "doc_id", "text", maxTokens = 3)
      .orderBy("chunk_id").collect().map(r => r.getInt(3))
    assert(got.toSeq === Seq(8, 2))
    assert(got.sum === 10)
  }

  test("chunkBySentence is partition-invariant") {
    val docs = (1L to 20L).map(i =>
      (i, s"Alpha beta $i. Gamma delta epsilon. Zeta. Eta theta iota kappa."))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextOps.chunkBySentence(d, "doc_id", "text", 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(run(docs) === run(docs.repartition(7)))
  }

  test("redactPII replaces emails and phones and counts them") {
    val df = Seq(
      (1L, "mail me at a.b-c+1@ex-ample.co.uk or 415-555-0133 now"),
      (2L, "no pii here"),
      (3L, "two mails x@y.io z@w.org one phone 212-555-9999")
    ).toDF("id", "text")
    val got = TextOps.redactPII(df, "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(got(1L) === ((1, 1, "mail me at [EMAIL] or [PHONE] now")))
    assert(got(2L) === ((0, 0, "no pii here")))
    assert(got(3L)._1 === 2)
    assert(got(3L)._3 === "two mails [EMAIL] [EMAIL] one phone [PHONE]")
    intercept[IllegalArgumentException] {
      TextOps.redactPII(df.withColumnRenamed("text", "redacted"), "redacted")
    }
  }

  test("readability: closed counts and both Flesch formulas") {
    val df = Seq((1L, "The cat sat. It ran!")).toDF("id", "text")
    val r = TextOps.readability(df, "text").head()
    assert(r.getAs[Int]("n_words") === 5)
    assert(r.getAs[Int]("n_sentences") === 2)
    assert(r.getAs[Int]("n_syllables") === 5)
    // W/S = 2.5, Syl/W = 1
    assert(math.abs(r.getAs[Double]("flesch") -
      (206.835 - 1.015 * 2.5 - 84.6)) < 1e-9)
    assert(math.abs(r.getAs[Double]("fk_grade") -
      (0.39 * 2.5 + 11.8 - 15.59)) < 1e-9)
  }

  test("readability: no sentence punctuation floors sentences at 1") {
    val df = Seq((1L, "just some words no stops")).toDF("id", "text")
    val r = TextOps.readability(df, "text").head()
    assert(r.getAs[Int]("n_sentences") === 1)
    assert(r.getAs[Int]("n_words") === 5)
  }

  test("readability: wordless text scores null, counts stay defined") {
    val df = Seq((1L, "123 456 !!!"), (2L, "")).toDF("id", "text")
    val out = TextOps.readability(df, "text").collect()
    assert(out.forall(_.getAs[Int]("n_words") === 0))
    assert(out.forall(r => r.isNullAt(r.fieldIndex("flesch"))))
    assert(out.forall(r => r.isNullAt(r.fieldIndex("fk_grade"))))
  }

  test("hashingTf: deterministic dims, counts sum to token count") {
    val df = Seq((1L, "a b a c"), (2L, "a a")).toDF("id", "text")
    val out = TextOps.hashingTf(df, "id", "text", dim = 16).collect()
    // per-doc counts sum to the doc's token count
    val byId = out.groupBy(_.getLong(0))
    assert(byId(1L).map(_.getLong(2)).sum === 4L)
    assert(byId(2L).map(_.getLong(2)).sum === 2L)
    // same token → same dim across docs
    val dimsA = out.filter(r => r.getLong(0) == 2L).map(_.getInt(1)).toSet
    assert(dimsA.size === 1)
    assert(out.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 16))
    // repartition invariance
    val b = TextOps.hashingTf(df.repartition(5), "id", "text", 16)
      .orderBy("id", "dim").collect().toSeq
    assert(out.sortBy(r => (r.getLong(0), r.getInt(1))).toSeq === b)
  }

  test("skipGrams: closed window-2 pairs with 1/distance weights") {
    val df = Seq("a b c").toDF("text")
    val out = TextOps.skipGrams(df, "text", window = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // a: contexts b (d=1), c (d=2); b: a, c (d=1 each); c: a (2), b (1)
    assert(out(("a", "b")) === ((1L, 1.0)))
    assert(out(("a", "c")) === ((1L, 0.5)))
    assert(out(("b", "a")) === ((1L, 1.0)))
    assert(out(("b", "c")) === ((1L, 1.0)))
    assert(out(("c", "a")) === ((1L, 0.5)))
    assert(out(("c", "b")) === ((1L, 1.0)))
    assert(out.size === 6)
  }

  test("skipGrams: repeated co-occurrence accumulates counts and weights") {
    val df = Seq("x y", "x y", "y x").toDF("text")
    val out = TextOps.skipGrams(df, "text", 1).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("x", "y")) === ((3L, 3.0)))
    assert(out(("y", "x")) === ((3L, 3.0)))
  }

  test("skipGrams: edges never wrap around the array") {
    // with window 3 > text length, no pair may appear more than once and
    // the total pair count is exactly n*(n-1) for n distinct tokens
    val df = Seq("p q r").toDF("text")
    val out = TextOps.skipGrams(df, "text", 3).collect()
    assert(out.map(_.getLong(2)).sum === 6L)
    assert(out.forall(_.getLong(2) === 1L))
  }

  test("rougeN: clipped unigram overlap, closed precision/recall/F1") {
    val df = Seq((1L, "the cat sat on the mat", "the cat on the mat"))
      .toDF("id", "ref", "cand")
    val r = TextOps.rougeN(df, "id", "ref", "cand", n = 1).head()
    assert(r.getAs[Long]("n_ref") === 6L)
    assert(r.getAs[Long]("n_cand") === 5L)
    assert(r.getAs[Long]("overlap") === 5L)
    assert(r.getAs[Double]("precision") === 1.0)
    assert(math.abs(r.getAs[Double]("recall") - 5.0 / 6) < 1e-6)
    assert(math.abs(r.getAs[Double]("f1") - 10.0 / 11) < 1e-6)
  }

  test("rougeN: bigram overlap counts contiguous pairs only") {
    val df = Seq((1L, "the cat sat on the mat", "the cat on the mat"))
      .toDF("id", "ref", "cand")
    val r = TextOps.rougeN(df, "id", "ref", "cand", n = 2).head()
    assert(r.getAs[Long]("n_ref") === 5L)
    assert(r.getAs[Long]("n_cand") === 4L)
    assert(r.getAs[Long]("overlap") === 3L) // the cat / on the / the mat
    assert(r.getAs[Double]("precision") === 0.75)
    assert(r.getAs[Double]("recall") === 0.6)
  }

  test("rougeN: identical texts score 1; disjoint texts score 0") {
    val df = Seq((1L, "alpha beta gamma", "alpha beta gamma"),
      (2L, "alpha beta", "delta epsilon")).toDF("id", "ref", "cand")
    val got = TextOps.rougeN(df, "id", "ref", "cand", 1).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Double]("f1") === 1.0)
    assert(got(2L).getAs[Long]("overlap") === 0L)
    assert(got(2L).getAs[Double]("f1") === 0.0)
  }

  test("zipfFit: a near-1/r frequency profile slopes about -1") {
    // token i repeated round(600/i) times, i = 1..30
    val text = (1 to 30).flatMap(i =>
      Seq.fill(math.round(600.0 / i).toInt)(s"w$i")).mkString(" ")
    val r = TextOps.zipfFit(Seq(text).toDF("text"), "text").head()
    assert(r.getAs[Long]("vocab") === 30L)
    assert(math.abs(r.getAs[Double]("slope") - -1.0) < 0.05)
    assert(r.getAs[Double]("r2") > 0.99)
  }

  test("zipfFit: a flat distribution slopes 0") {
    val text = (1 to 20).flatMap(i => Seq.fill(7)(s"t$i")).mkString(" ")
    val r = TextOps.zipfFit(Seq(text).toDF("text"), "text").head()
    assert(r.getAs[Double]("slope") === 0.0)
    assert(r.getAs[Long]("n_tokens") === 140L)
  }

  test("readability: polysyllabic words score harder than monosyllabic") {
    val df = Seq(
      (1L, "incomprehensibility characterization examination."),
      (2L, "the cat sat on mats.")).toDF("id", "text")
    val got = TextOps.readability(df, "text").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("flesch")).toMap
    assert(got(1L) < got(2L))
  }

  test("redact replaces matches with tags and counts original hits") {
    val df = Seq(
      (1L, "call 555 1234 about data now"),
      (2L, "nothing here")).toDF("id", "text")
    val got = TextOps.redact(df, "text", Seq(
        "term" -> "\\bdata\\b", "num" -> "[0-9]+"))
      .select("id", "redacted", "n_redacted").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(got(1L) === (("call <NUM> <NUM> about <TERM> now", 3)))
    assert(got(2L) === (("nothing here", 0)))
  }

  test("normalizeText: lowercase, symbols to space, collapsed, trimmed") {
    val df = Seq(
      (1L, "  Hello,   WORLD!! (x=1) "),
      (2L, "---"),
      (3L, "already clean")).toDF("id", "text")
    val got = TextOps.normalizeText(df, "text")
      .select("id", "norm_text", "norm_len").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(got(1L) === (("hello world x 1", 15)))
    assert(got(2L) === (("", 0)))
    assert(got(3L) === (("already clean", 13)))
  }

  test("patternCounts: known counts, non-overlapping matches, empty text") {
    val df = Seq(
      (1L, "mail me at a@b.com or c@d.org thanks"),
      (2L, "no contacts here aaaa"),
      (3L, "")).toDF("id", "text")
    val got = TextOps.patternCounts(df, "id", "text", Seq(
        "n_email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
        "n_aa" -> "aa")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got(1L) === ((2, 0)))
    // "aaaa" = two NON-overlapping "aa" matches
    assert(got(2L) === ((0, 2)))
    assert(got(3L) === ((0, 0)))
  }

  test("ngramLmScore: hand-computed add-1 bigram probabilities") {
    // corpus: doc1 "a b a b", doc2 "a b", doc3 "x";
    // bigrams: (a,b)x3, (b,a)x1; ctx(a) = 3, ctx(b) = 1;
    // V = 3 (vocabulary counts ALL tokens incl. doc3's lone "x")
    // P(b|a) = (3+1)/(3+3) = 2/3; P(a|b) = (1+1)/(1+3) = 1/2
    val df = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x")).toDF("id", "text")
    val got = TextOps.ngramLmScore(df, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    val lp1 = (math.log(2.0 / 3) + math.log(0.5) + math.log(2.0 / 3)) / 3
    assert(got(1L)._1 === 4L && got(1L)._2 === 3L)
    assert(math.abs(got(1L)._3.get - lp1) < 1e-12)
    assert(math.abs(got(2L)._3.get - math.log(2.0 / 3)) < 1e-12)
    assert(got(3L) === ((1L, 0L, None))) // single token: no bigram
  }

  test("ngramLmScore ranks common-sequence docs above rare ones") {
    val df = ((1 to 20).map(i => (i.toLong, "the cat sat on the mat")) :+
      (99L, "zq qz zq qz colorless green")).toDF("id", "text")
    val got = TextOps.ngramLmScore(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) > got(99L),
      s"common doc should score higher: ${got(1L)} vs ${got(99L)}")
  }

  test("ngramLmScore is partition-invariant") {
    val df = (1 to 40).map(i =>
      (i.toLong, s"tok${i % 5} tok${(i + 1) % 5} tok${(i + 2) % 7}"))
      .toDF("id", "text")
    val a = TextOps.ngramLmScore(df, "id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2),
        math.rint(r.getDouble(3) * 1e9))).toSeq
    val b = TextOps.ngramLmScore(df.repartition(7), "id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2),
        math.rint(r.getDouble(3) * 1e9))).toSeq
    assert(a === b)
  }

  test("compressionSignals: repetitive text compresses far below prose") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near a riverbank"),
      (2L, Seq.fill(12)("spam spam spam spam spam").mkString(" ")),
      (3L, "")).toDF("id", "text")
    val got = TextOps.compressionSignals(df, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got(2L)._3.get < got(1L)._3.get,
      "template spam must compress deeper than prose")
    assert(got(2L)._3.get < 0.25)
    assert(got(3L) === ((0L, got(3L)._2, None)), "empty text: null ratio")
    got.filterKeys(_ != 3L).values.foreach { case (nb, nd, _) =>
      assert(nb > 0 && nd > 0)
    }
  }

  test("compressionSignals is deterministic and partition-invariant") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val run = (p: Int) => TextOps.compressionSignals(
        docs.repartition(p), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(run(1) === run(5))
  }

  test("scriptProfile: closed mixed-script counts and first-max tie") {
    // latin 3, cyrillic 3 (tie -> latin), han 2, digits 3, spaces 3
    val df = Seq((1L, "abc \u0433\u0434\u0435 123 \u4e2d\u6587"))
      .toDF("doc_id", "text")
    val r = TextOps.scriptProfile(df, "doc_id", "text").head()
    assert(r.getLong(1) === 14L)
    def rd6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("latin_frac") === rd6(3.0 / 14))
    assert(r.getAs[Double]("cyrillic_frac") === rd6(3.0 / 14))
    assert(r.getAs[Double]("han_frac") === rd6(2.0 / 14))
    assert(r.getAs[Double]("arabic_frac") === 0.0)
    assert(r.getAs[Double]("digit_frac") === rd6(3.0 / 14))
    assert(r.getAs[Double]("space_frac") === rd6(3.0 / 14))
    assert(r.getAs[String]("dominant_script") === "latin",
      "3-3 latin/cyrillic tie must break to the earlier class")
  }

  test("scriptProfile: arabic dominance, empty and null go 'none'") {
    val df = Seq((1L, Some("\u0645\u0631\u062d\u0628\u0627 ok")),
      (2L, Some("12345")), (3L, Some("")), (4L, None))
      .toDF("doc_id", "text")
    val got = TextOps.scriptProfile(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getAs[String]("dominant_script")))).toMap
    assert(got(1L)._2 === "arabic") // 5 arabic > 2 latin
    assert(got(2L)._2 === "none")   // digits only — no script chars
    assert(got(3L) === ((0L, "none")))
    assert(got(4L) === ((0L, "none")))
    val r4 = TextOps.scriptProfile(df, "doc_id", "text")
      .filter(col("doc_id") === 4L).head()
    assert(r4.isNullAt(r4.fieldIndex("latin_frac")))
  }

  test("scriptProfile is partition-invariant on documents") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val run = (p: Int) => TextOps.scriptProfile(docs.repartition(p),
      "doc_id", "text").orderBy("doc_id").collect().toSeq
    assert(run(1) === run(7))
  }
}
