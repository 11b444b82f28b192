package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeqMineSpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    // k1: a b c | k2: a c b | k3: b a c
    ("k1", 1, "a"), ("k1", 2, "b"), ("k1", 3, "c"),
    ("k2", 1, "a"), ("k2", 2, "c"), ("k2", 3, "b"),
    ("k3", 1, "b"), ("k3", 2, "a"), ("k3", 3, "c")
  ).toDF("k", "t", "i")

  test("prefixSpan: closed three-sequence case with pruning") {
    val got = SeqMine.prefixSpan(rows, "k", Seq("t"), "i",
        minSupport = 2, maxLen = 3)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val want = Map(
      ("a", 1) -> 3L, ("b", 1) -> 3L, ("c", 1) -> 3L,
      ("a→b", 2) -> 2L, ("a→c", 2) -> 3L, ("b→c", 2) -> 2L)
    // no length-3 pattern reaches support 2: a→b→c matches only k1
    // (k2's earliest b sits after its only c), a→c→b only k2
    assert(got === want)
  }

  test("prefixSpan: earliest-occurrence frontier is complete") {
    // a b a c: the SECOND a would also start a→b? no — b precedes it;
    // extending from the EARLIEST a→b end (pos 2) still reaches c
    val df = Seq(("k", 1, "a"), ("k", 2, "b"), ("k", 3, "a"), ("k", 4, "c"))
      .toDF("k", "t", "i")
    val got = SeqMine.prefixSpan(df, "k", Seq("t"), "i", 1, 3)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(got.contains(("a→b→c", 3)))
    assert(got.contains(("a→a→c", 3)))
    assert(!got.contains(("b→a→b", 3)))
  }

  test("prefixSpan: support counts keys once, not matches") {
    // one key with many repeats must still yield support 1
    val df = Seq(("k", 1, "x"), ("k", 2, "x"), ("k", 3, "x"),
      ("j", 1, "x")).toDF("k", "t", "i")
    val got = SeqMine.prefixSpan(df, "k", Seq("t"), "i", 1, 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(got(("x", 1)) === 2L)
    assert(got(("x→x", 2)) === 1L)
  }

  test("prefixSpan guards: maxPatterns and minSupport") {
    intercept[IllegalArgumentException] {
      SeqMine.prefixSpan(rows, "k", Seq("t"), "i", minSupport = 1,
        maxLen = 2, maxPatterns = 2L)
    }
    // minSupport above every key count → empty
    assert(SeqMine.prefixSpan(rows, "k", Seq("t"), "i", 4, 3).count() === 0L)
  }

  test("prefixSpan is partition-invariant on real events") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_id") % 13 === 0)
    val run = (p: Int) => SeqMine.prefixSpan(ev.repartition(p), "user_id",
        Seq("ts", "event_id"), "event_type", minSupport = 5, maxLen = 3)
      .orderBy("len", "pattern").collect().toSeq
    val a = run(1)
    assert(a === run(7))
    assert(a.nonEmpty)
  }
}
