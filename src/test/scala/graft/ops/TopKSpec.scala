package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tokens = spark.read.parquet(s"$sfDir/documents.parquet")
    .select(explode(split(col("text"), "\\s+")).as("token"))
    .filter(length(col("token")) > 0)

  test("heavyHitters equals the exact groupBy top-k on real token data") {
    val got = TopK.heavyHitters(tokens, "token", 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = tokens.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === want)
  }

  test("exact even when capacity is below the distinct-key count") {
    // the sf0.001 vocabulary is only 31 tokens with a shallow skew, so the
    // largest capacity that still truncates (30) is also the only one whose
    // exactness precondition holds — both asserted below
    val nDistinct = tokens.select("token").distinct().count()
    val cap = 30
    assert(nDistinct > cap) // the summary genuinely truncates
    val want = tokens.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // the exactness precondition: the k-th frequency exceeds n/(cap+1)
    assert(want.last._2 > tokens.count() / (cap + 1))
    val got = TopK.heavyHitters(tokens, "token", 5, capacity = cap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === want)
  }

  test("mgSummary keeps every key heavier than n/(capacity+1)") {
    // 1000 'hot' + 900 distinct cold keys through a 100-counter summary
    val stream = Seq.fill(1000)("hot") ++ (1 to 900).map(i => s"cold$i")
    val out = TopK.mgSummary(scala.util.Random.shuffle(stream).iterator, 100).toMap
    assert(out.contains("hot"))
    // MG counts are lower bounds within n/(capacity+1)
    assert(out("hot") <= 1000 && out("hot") >= 1000 - (1900 / 101) - 1)
  }

  test("result is invariant to input partitioning") {
    // per-partition MG summaries differ with the partitioning, but the
    // exact recount over the candidate union makes the output identical
    def run(df: org.apache.spark.sql.DataFrame) =
      TopK.heavyHitters(df, "token", 10, capacity = 30)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(run(tokens) === run(tokens.repartition(13)))
  }

  test("broadcast hint is dropped when the candidate bound exceeds the cap") {
    // candidate bound = capacity × nPartitions; force it over a tiny cap
    // and assert the recount semi-join plans WITHOUT a broadcast exchange
    // (the 100 TB guard: 4096 counters × 100k partitions would be ~400M
    // candidate keys — past any driver broadcast)
    def plan(bcastCap: Long): String =
      TopK.heavyHitters(tokens, "token", 5, capacity = 30,
          broadcastMaxCandidates = bcastCap)
        .queryExecution.executedPlan.toString
    // disable size-based auto-broadcast so the plan shows the HINT's
    // effect alone (at gate scale the tiny candidate side always qualifies
    // for auto-broadcast; at 100 TB its statistics would not)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val guarded = plan(bcastCap = 10)
      assert(!guarded.contains("BroadcastHashJoin"),
        s"semi-join should shuffle when candidates may exceed the cap:\n$guarded")
      val hinted = plan(bcastCap = Long.MaxValue)
      assert(hinted.contains("BroadcastHashJoin"), s"expected broadcast:\n$hinted")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // and the guarded plan still returns the exact top-k
    val got = TopK.heavyHitters(tokens, "token", 5, capacity = 30,
        broadcastMaxCandidates = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = tokens.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === want)
  }

  test("capacity below k is rejected") {
    intercept[IllegalArgumentException] {
      TopK.heavyHitters(tokens, "token", k = 10, capacity = 5)
    }
  }

  test("null keys are dropped, not counted") {
    val df = Seq(Some("a"), Some("a"), None, Some("b")).toDF("k")
    val got = TopK.heavyHitters(df, "k", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("a", 2L), ("b", 1L)))
  }
}
