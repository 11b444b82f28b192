package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HmmSpec extends SparkSpec {
  import spark.implicits._

  private val states = Seq("A", "B")
  private val init = Map("A" -> -1L, "B" -> -2L)
  private val trans = Map(
    ("A", "A") -> -1L, ("A", "B") -> -5L,
    ("B", "A") -> -5L, ("B", "B") -> -1L)
  private val emit = Map(
    ("A", "x") -> -1L, ("A", "y") -> -10L,
    ("B", "y") -> -1L, ("B", "x") -> -10L)

  private def decode(df: org.apache.spark.sql.DataFrame, maxSteps: Int) =
    Hmm.viterbiDecode(df, "k", Seq("t"), "o", states, init, trans, emit,
      unkEmitMicro = -20L, maxSteps = maxSteps)

  test("viterbiDecode: hand-computed best path with a mid-path switch") {
    // x y y: step scores A=-2/B=-12 → A=-13/B=-8 ("A>B") →
    // A=-23 (backpointer jumps to B) / B=-10 ("A>B>B")
    val df = Seq(("k", 1, "x"), ("k", 2, "y"), ("k", 3, "y"))
      .toDF("k", "t", "o")
    val row = decode(df, 3).head()
    assert(row.getString(0) === "k")
    assert(row.getInt(1) === 3)
    assert(row.getString(2) === "A>B>B")
    assert(row.getLong(3) === -10L)
  }

  test("viterbiDecode: short streams pass through unchanged") {
    val df = Seq(("short", 1, "x"), ("long", 1, "x"), ("long", 2, "y"),
      ("long", 3, "y")).toDF("k", "t", "o")
    val got = decode(df, 3).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(got("short") === ((1, "A")))
    assert(got("long") === ((3, "A>B>B")))
  }

  test("viterbiDecode: unknown observations take the unk penalty; ties " +
      "break to the first state") {
    // symmetric everything except init: A wins the tie at init level
    val df = Seq(("k", 1, "zzz")).toDF("k", "t", "o")
    val row = decode(df, 2).head()
    assert(row.getString(2) === "A")
    assert(row.getLong(3) === -21L) // init(A) + unk
  }

  test("viterbiDecode: maxSteps truncates the decode window") {
    val df = Seq(("k", 1, "x"), ("k", 2, "y"), ("k", 3, "y"),
      ("k", 4, "y")).toDF("k", "t", "o")
    val row = decode(df, 2).head()
    assert(row.getInt(1) === 2)
    assert(row.getString(2) === "A>B")
  }

  test("viterbiDecode early-exits on the true max stream length") {
    // longest stream = 2 events but maxSteps = 16: the step loop must
    // build exactly ONE join (t = 2), not 15 — the plan's join count
    // tracks the data, not the bound
    val df = Seq(("k1", 1, "x"), ("k1", 2, "y"), ("k2", 1, "x"))
      .toDF("k", "t", "o")
    val plan = decode(df, 16).queryExecution.executedPlan.toString
    val joins = plan.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
        l.contains("ShuffledHashJoin"))
    assert(joins === 1, s"expected 1 join round, got $joins:\n" +
      plan.take(1500))
    // and the decode itself is unchanged
    val row = decode(df, 16).orderBy("k").collect()
    assert(row(0).getString(2) === "A>B" && row(1).getString(2) === "A")
  }

  test("viterbiDecode is partition-invariant on real events") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_id") % 7 === 0)
    val model = Map(("A", "click") -> -1L, ("A", "view") -> -3L,
      ("B", "view") -> -1L, ("B", "click") -> -3L)
    val run = (p: Int) => Hmm.viterbiDecode(ev.repartition(p), "user_id",
        Seq("ts", "event_id"), "event_type", states, init, trans, model,
        -5L, maxSteps = 4)
      .orderBy("user_id").collect().toSeq
    val a = run(1)
    assert(a === run(7))
    assert(a.nonEmpty)
  }
}
