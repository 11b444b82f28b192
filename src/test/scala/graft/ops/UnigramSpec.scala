package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("one EM round matches the hand-computed forward-backward counts") {
    // corpus: "ab ab b" → distinct words ab(n=2), b(n=1)
    // seed counts: a=2, b=3, ab=2; tot=7 → p0 = (2/7, 3/7, 2/7)
    // word ab: Z = p(ab) + p(a)p(b) = 20/49
    //   E[a] = p(a)p(b)/Z = 0.3, E[ab] = p(ab)/Z = 0.7, E[b] = 0.3
    // word b: E[b] = 1
    // micro (×n×1e6): a = 600000, ab = 1400000, b = 600000·2 + ... wait:
    //   a: 0.3·2e6 = 600000; ab: 0.7·2e6 = 1400000; b: 0.3·2e6 + 1e6 = 1600000
    val out = Unigram.train(Seq("ab ab b").toDF("text"), "text",
        vocabSize = 10, maxPieceLen = 2, maxWordLen = 8, minCount = 1,
        emIters = 1)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out.keySet === Set("a", "ab", "b"))
    assert(out("a")._1 === 600000L)
    assert(out("ab")._1 === 1400000L)
    assert(out("b")._1 === 1600000L)
    assert(math.abs(out("a")._2 - 1.0 / 6.0) < 1e-12)
    assert(math.abs(out("ab")._2 - 7.0 / 18.0) < 1e-12)
    assert(math.abs(out("b")._2 - 4.0 / 9.0) < 1e-12)
  }

  test("EM keeps total probability 1 and rewards reused substrings") {
    val out = Unigram.train(
        Seq("banana bandana banana", "ban ban banana").toDF("text"), "text",
        vocabSize = 50, maxPieceLen = 3, maxWordLen = 8, minCount = 1,
        emIters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
    // "ban" appears in every word — it must out-weigh any piece that
    // only occurs inside "bandana"
    assert(out("ban") > out.getOrElse("dan", 0.0))
    assert(out("ban") > out.getOrElse("and", 0.0))
  }

  test("words are truncated to maxWordLen before the lattice") {
    val out = Unigram.train(Seq("abcdefghij abcd").toDF("text"), "text",
        vocabSize = 50, maxPieceLen = 2, maxWordLen = 4, minCount = 1,
        emIters = 1)
      .collect().map(_.getString(0)).toSet
    // nothing beyond position 4 may appear as a piece
    assert(out.forall(p => "abcd".contains(p)),
      s"pieces leaked past the truncation: $out")
  }

  test("rare single chars survive the vocabSize cut (coverage)") {
    // 'z' occurs once; frequent pieces crowd the top-3 cut
    val out = Unigram.train(
        Seq(("aa aa aa aa z")).toDF("text"), "text",
        vocabSize = 2, maxPieceLen = 2, maxWordLen = 8, minCount = 2,
        emIters = 1)
      .collect().map(_.getString(0)).toSet
    assert(out.contains("z"), s"single-char coverage lost: $out")
  }

  test("prune keeps all singles plus exactly the top-k multi-char pieces") {
    val out = Unigram.train(
        Seq("banana bandana banana", "ban ban banana").toDF("text"), "text",
        vocabSize = 50, maxPieceLen = 3, maxWordLen = 8, minCount = 1,
        emIters = 2, pruneTo = Some(1), postPruneIters = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val multi = out.keySet.filter(_.length > 1)
    assert(multi.size === 1, s"expected one surviving multi-char: $multi")
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
    // singles coverage intact after pruning
    assert(Set("b", "a", "n").subsetOf(out.keySet))
  }

  private val segScores = Map(
    "the" -> -3000000L, "th" -> -4600000L, "he" -> -4800000L,
    "t" -> -5400000L, "h" -> -6100000L, "e" -> -5200000L,
    "c" -> -6400000L, "a" -> -5500000L)

  test("segmentWordsViterbi picks the best-scoring path") {
    // "the" as one piece (-3.0M) beats th+e (-9.8M) and t+h+e (-16.7M)
    val out = Unigram.segmentWordsViterbi(Seq("the").toDF("w"), "w",
        segScores)
      .select($"tokens").collect().head.getSeq[String](0)
    assert(out === Seq("the"))
  }

  test("segmentWordsViterbi: OOV single chars fall back to unk") {
    val out = Unigram.segmentWordsViterbi(Seq("xq").toDF("w"), "w",
        segScores)
      .select($"tokens").collect().head.getSeq[String](0)
    assert(out === Seq("x", "q"))
  }

  test("segmentWordsViterbi ties break to the smallest split point") {
    // "ab" (-2) exactly ties a+b (-1 + -1): first-max-wins over j
    // ascending keeps j = 0 — the single piece
    val scores = Map("ab" -> -2L, "a" -> -1L, "b" -> -1L)
    val out = Unigram.segmentWordsViterbi(Seq("ab").toDF("w"), "w", scores)
      .select($"tokens").collect().head.getSeq[String](0)
    assert(out === Seq("ab"))
  }

  test("lattice width tracks the true max word length, not the bound") {
    // longest word = 3 chars with maxWordLen = 8: the unrolled DP must
    // stop at v_3 — no v_4..v_8 columns ride the plan
    val plan = Unigram.segmentWordsViterbi(
        Seq("ab", "abc").toDF("w"), "w", segScores, maxWordLen = 8)
      .queryExecution.analyzed.toString
    assert(plan.contains("v_3") && !plan.contains("v_4"), plan.take(800))
  }

  test("tokenize flattens per-word segmentations in text order") {
    val out = Unigram.tokenize(Seq("the cat", "", "he he").toDF("text"),
        "text", segScores)
      .select($"text", $"tokens").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("the cat") === Seq("the", "c", "a", "t"))
    assert(out("") === Seq.empty)
    assert(out("he he") === Seq("he", "he"))
  }

  test("scoreDocs: exact micro-nat totals, counts, and empty-doc nulls") {
    // "the" = one piece at -3.0M; "xq" = two unk singles at -20M each
    val out = Unigram.scoreDocs(
        Seq((1L, "the xq"), (2L, "")).toDF("doc_id", "text"),
        "doc_id", "text", segScores)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out(1L) === ((2L, 3L, -43000000L,
      Some(-43000000.0 / 3.0 / 1e6))))
    assert(out(2L) === ((0L, 0L, 0L, None)))
  }

  test("segmentation is partition-invariant on documents") {
    val words = docs
      .select(explode(split($"text", "\\s+")).as("w0"))
      .filter(length($"w0") > 0)
      .select(substring($"w0", 1, 8).as("w")).distinct()
    def run(df: org.apache.spark.sql.DataFrame) =
      Unigram.segmentWordsViterbi(df, "w", segScores)
        .select($"w", array_join($"tokens", "|"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(run(words) === run(words.repartition(17)))
  }

  test("train is deterministic and partition-invariant on documents") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Unigram.train(df, "text", vocabSize = 60, maxPieceLen = 3,
          maxWordLen = 6, minCount = 2, emIters = 2)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val a = run(docs)
    assert(a === run(docs.repartition(13)))
    assert(a.nonEmpty)
  }
}
