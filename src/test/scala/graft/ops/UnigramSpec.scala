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
