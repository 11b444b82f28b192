package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq("un", "##aff", "##able", "a", "##b", "hug",
    "##s", "##ab")

  test("training merges the likelihood-max pair, not the count-max pair") {
    // symbols: xy→[x,##y]×4, x→[x]×4, y→[y]×4, qz→[q,##z]×3
    // counts: x=8, ##y=4, q=3, ##z=3
    // pair (x,##y): cnt 4, score 4/(8·4) = 0.125
    // pair (q,##z): cnt 3, score 3/(3·3) = 0.333  ← WordPiece picks this
    // (BPE would pick (x,##y) on raw count)
    val corpus = Seq(("xy xy xy xy x x x x y y y y qz qz qz")).toDF("text")
    val out = WordPiece.learnMerges(corpus, "text", numMerges = 2)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out(0) === ((1, "q", "##z", 3L)))
    assert(out(1) === ((2, "x", "##y", 4L)))
  }

  test("merged token strips the continuation prefix of the right side") {
    // "ab ab abc": a=3, ##b=3, ##c=1; only (a,##b) repeats → merge "ab";
    // round 2's best pair (ab,##c) has count 1 → exhausted
    val out = WordPiece.learnMerges(Seq("ab ab abc").toDF("text"), "text",
        numMerges = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(out.toSeq === Seq((1, "a", "##b")))
    // and a chained merge keeps the ## of a non-initial LEFT side:
    // "xabc xabc": x=2, ##a=2, ##b=2, ##c=2; pairs all cnt 2, scores all
    // 2/(2·2) — tie broken (a asc, b asc): (##a,##b) < (##b,##c) < (x,##a)
    val out2 = WordPiece.learnMerges(Seq("xabc xabc").toDF("text"), "text",
        numMerges = 2)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(out2(0) === (("##a", "##b")))
    // merged symbol is "##ab"; next best pair by (score desc, a, b)
    assert(out2(1) === (("##ab", "##c")))
  }

  test("greedy segmentation is longest-match-first with ## continuations") {
    val out = WordPiece.segmentWordsGreedy(
        Seq("unaffable", "hugs").toDF("word"), "word", vocab)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("unaffable") === Seq("un", "##aff", "##able"))
    assert(out("hugs") === Seq("hug", "##s"))
  }

  test("cursor-walk width tracks the true max word length, not the bound") {
    // longest word = 4 chars with maxWordLen = 12: the greedy unroll
    // must stop at s_4 — no s_5..s_12 columns ride the plan
    val plan = WordPiece.segmentWordsGreedy(
        Seq("hugs").toDF("word"), "word", vocab, maxWordLen = 12)
      .queryExecution.analyzed.toString
    assert(plan.contains("s_4") && !plan.contains("s_5"), plan.take(800))
  }

  test("longest match wins over a shorter prefix piece") {
    // "aab": 'a' matches at 0 (no 'aa' in vocab); at pos 1 both ##a-less
    // options: vocab has ##ab (len 2) and ##b — ##ab wins
    val out = WordPiece.segmentWordsGreedy(Seq("aab").toDF("word"), "word",
        vocab)
      .collect().head.getSeq[String](1)
    assert(out === Seq("a", "##ab"))
  }

  test("any unmatched position collapses the whole word to [UNK]") {
    val out = WordPiece.segmentWordsGreedy(
        Seq("unz", "zun").toDF("word"), "word", vocab)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // "unz": 'un' matches, then ##z is OOV → whole word UNK
    assert(out("unz") === Seq("[UNK]"))
    // "zun": initial 'z' OOV → UNK immediately
    assert(out("zun") === Seq("[UNK]"))
  }

  test("words are truncated to maxWordLen before the walk") {
    val out = WordPiece.segmentWordsGreedy(
        Seq("hugsssssss").toDF("word"), "word",
        vocab, maxPieceLen = 6, maxWordLen = 6)
      .collect().head.getSeq[String](1)
    // truncated to "hugsss" = hug + ##s + ##s + ##s
    assert(out === Seq("hug", "##s", "##s", "##s"))
  }

  test("corpus tokenize flattens in text order and is partition-invariant") {
    val df = Seq((1, "hugs unz a"), (2, ""), (3, "unaffable")).toDF("id", "text")
    val got = WordPiece.tokenize(df, "text", vocab)
      .orderBy("id")
      .collect().map(r => r.getInt(0) -> r.getSeq[String](2)).toMap
    assert(got(1) === Seq("hug", "##s", "[UNK]", "a"))
    assert(got(2) === Seq.empty)
    assert(got(3) === Seq("un", "##aff", "##able"))
    val re = WordPiece.tokenize(df.repartition(7), "text", vocab)
      .orderBy("id")
      .collect().map(r => r.getInt(0) -> r.getSeq[String](2)).toMap
    assert(re === got)
  }

  test("training matches across partitionings (determinism)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text")
    val a = WordPiece.learnMerges(docs, "text", numMerges = 4)
      .collect().map(_.toSeq)
    val b = WordPiece.learnMerges(docs.repartition(13), "text",
        numMerges = 4)
      .collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
