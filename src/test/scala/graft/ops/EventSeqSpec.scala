package graft.ops

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class EventSeqSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("attribution: first/last/linear credits on a closed journey") {
    val ev = Seq(
      // u1: ad → email → buy. ad is first touch, email last; linear ½ each
      (1L, 10L, ts("2024-01-01 00:00:00"), "ad"),
      (1L, 11L, ts("2024-01-01 01:00:00"), "email"),
      (1L, 12L, ts("2024-01-01 02:00:00"), "buy"),
      // u2: email only → buy
      (2L, 20L, ts("2024-01-01 00:00:00"), "email"),
      (2L, 21L, ts("2024-01-01 01:00:00"), "buy"),
      // u3: touch AFTER the conversion gets no credit
      (3L, 30L, ts("2024-01-01 05:00:00"), "buy"),
      (3L, 31L, ts("2024-01-01 06:00:00"), "ad")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = EventSeq.attribution(ev, "user_id", "event_type", "ts",
        "event_id", "buy", lookbackUs = 24L * 3600 * 1000000)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("ad") === ((1L, 0L, 0.5)))
    assert(out("email") === ((1L, 2L, 1.5)))
  }

  test("attribution: lookback excludes stale touches") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "ad"),     // 49h before: stale
      (1L, 2L, ts("2024-01-02 12:00:00"), "email"),  // 13h before: in
      (1L, 3L, ts("2024-01-03 01:00:00"), "buy")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = EventSeq.attribution(ev, "user_id", "event_type", "ts",
        "event_id", "buy", lookbackUs = 24L * 3600 * 1000000)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(!out.contains("ad"))
    assert(out("email") === ((1L, 1L, 1.0)))
  }

  test("attribution: a touch is credited only to its earliest conversion") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "ad"),
      (1L, 2L, ts("2024-01-01 01:00:00"), "buy"),
      (1L, 3L, ts("2024-01-01 02:00:00"), "buy") // second conv: no touches
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = EventSeq.attribution(ev, "user_id", "event_type", "ts",
        "event_id", "buy", lookbackUs = 24L * 3600 * 1000000)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // one credited conversion in total, not two
    assert(out("ad") === ((1L, 1L, 1.0)))
  }

  test("attribution: simultaneous touches break ties on the id order") {
    val ev = Seq(
      (1L, 5L, ts("2024-01-01 00:00:00"), "ad"),
      (1L, 6L, ts("2024-01-01 00:00:00"), "email"), // same ts, higher id
      (1L, 7L, ts("2024-01-01 01:00:00"), "buy")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = EventSeq.attribution(ev, "user_id", "event_type", "ts",
        "event_id", "buy", lookbackUs = 24L * 3600 * 1000000)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("ad") === ((1L, 0L, 0.5)))    // lower id → first
    assert(out("email") === ((0L, 1L, 0.5))) // higher id → last
  }

  test("funnel: greedy in-order matching on closed cases") {
    val ev = Seq(
      // u1 full funnel in order
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 00:01:00"), "click"),
      (1L, ts("2024-01-01 00:02:00"), "buy"),
      // u2: click BEFORE the first view must not count; no click after
      (2L, ts("2024-01-01 00:00:00"), "click"),
      (2L, ts("2024-01-01 00:01:00"), "view"),
      // u3: view+click only, buy precedes the click
      (3L, ts("2024-01-01 00:00:00"), "view"),
      (3L, ts("2024-01-01 00:00:30"), "buy"),
      (3L, ts("2024-01-01 00:01:00"), "click"),
      // u4: never enters (no view)
      (4L, ts("2024-01-01 00:00:00"), "buy")
    ).toDF("user_id", "ts", "event_type")
    val out = EventSeq.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "buy"))
      .orderBy("step_no").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(3L, 2L, 1L))
    assert(out.map(_.getDouble(3)).toSeq === Seq(1.0, 0.666667, 0.333333))
    assert(out.map(_.getDouble(4)).toSeq === Seq(1.0, 0.666667, 0.5))
  }

  test("funnel: strict ordering — same-timestamp step does not advance") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 00:00:00"), "click") // tie with t1: not after it
    ).toDF("user_id", "ts", "event_type")
    val out = EventSeq.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click")).orderBy("step_no").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 0L))
    assert(out(1).getDouble(3) === 0.0 && out(1).getDouble(4) === 0.0)
  }

  test("funnel equals the min-chain SQL semantics on the events table") {
    val ev = graft.Events.read(spark, sfDir)
    val got = EventSeq.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("step_no").collect().map(_.getLong(2))
    // independent chain: t1 = min view; t2 = min click > t1; t3 = min buy > t2
    val s1 = ev.filter($"event_type" === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = ev.filter($"event_type" === "click").join(s1, "user_id")
      .filter($"ts" > $"t1").groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = ev.filter($"event_type" === "purchase").join(s2, "user_id")
      .filter($"ts" > $"t2").groupBy("user_id").agg(min("ts").as("t3"))
    assert(got.toSeq === Seq(s1.count(), s2.count(), s3.count()))
  }

  test("funnelLatency: per-transition counts and average gaps") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 00:01:00"), "click"),   // 60s
      (1L, ts("2024-01-01 00:03:00"), "buy"),     // 120s
      (2L, ts("2024-01-01 00:00:00"), "view"),
      (2L, ts("2024-01-01 00:02:00"), "click"),   // 120s, no buy
      (3L, ts("2024-01-01 00:00:00"), "view")     // view only: no transition
    ).toDF("user_id", "ts", "event_type")
    val out = EventSeq.funnelLatency(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "buy"))
      .orderBy("step_no").collect()
    assert(out.length === 2)
    assert((out(0).getString(0), out(0).getString(1)) === (("view", "click")))
    assert(out(0).getLong(3) === 2L && out(0).getDouble(4) === 90.0)
    assert((out(1).getString(0), out(1).getString(1)) === (("click", "buy")))
    assert(out(1).getLong(3) === 1L && out(1).getDouble(4) === 120.0)
  }

  test("funnelLatency: single-step users produce no rows (no sequence(1,0) trap)") {
    val ev = Seq((1L, ts("2024-01-01 00:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    assert(EventSeq.funnelLatency(ev, "user_id", "event_type", "ts",
      Seq("view", "click")).count() === 0L)
  }

  test("retention: cohort sizes, offsets, and rates on a closed case") {
    val ev = Seq(
      // cohort week of 2024-01-01 (Mon): u1 active weeks 0,1,3; u2 week 0
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-10 10:00:00")),
      (1L, ts("2024-01-24 10:00:00")),
      (2L, ts("2024-01-03 10:00:00")),
      // cohort week of 2024-01-08: u3 active weeks 0,1
      (3L, ts("2024-01-09 10:00:00")), (3L, ts("2024-01-16 10:00:00"))
    ).toDF("user_id", "ts")
    val out = EventSeq.retention(ev, "user_id", "ts", "week")
      .orderBy("cohort", "offset")
      .select(date_format($"cohort", "yyyy-MM-dd").as("c"),
        $"offset", $"active_users", $"retention")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0, 2L, 1.0), ("2024-01-01", 1, 1L, 0.5),
      ("2024-01-01", 3, 1L, 0.5),
      ("2024-01-08", 0, 1L, 1.0), ("2024-01-08", 1, 1L, 1.0)))
  }

  test("retention: a user active twice in one bucket counts once") {
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-03 11:00:00"))
    ).toDF("user_id", "ts")
    val out = EventSeq.retention(ev, "user_id", "ts", "week").collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("active_users") === 1L)
  }

  test("transitions: counts, row-normalized probabilities, deterministic ties") {
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), "a"),
      (1L, 11L, ts("2024-01-01 00:01:00"), "b"),
      (1L, 12L, ts("2024-01-01 00:02:00"), "a"),
      (1L, 13L, ts("2024-01-01 00:03:00"), "c"),
      (2L, 20L, ts("2024-01-01 00:00:00"), "a"),
      (2L, 21L, ts("2024-01-01 00:01:00"), "b"),
      (3L, 30L, ts("2024-01-01 00:00:00"), "z") // single event: no pair
    ).toDF("user_id", "event_id", "ts", "event_type")
    val m = EventSeq.transitions(ev, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(m(("a", "b")) === ((2L, 0.666667)))
    assert(m(("a", "c")) === ((1L, 0.333333)))
    assert(m(("b", "a")) === ((1L, 1.0)))
    assert(m.size === 3)
    // tie-break determinism: two events at the same ts order by event_id
    val tie = Seq(
      (1L, 2L, ts("2024-01-01 00:00:00"), "y"),
      (1L, 1L, ts("2024-01-01 00:00:00"), "x")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val tm = EventSeq.transitions(tie, "user_id", "event_type", "ts", "event_id")
      .collect()
    assert(tm.length === 1)
    assert((tm.head.getString(0), tm.head.getString(1)) === (("x", "y")))
  }

  test("transitions probabilities sum to 1 per previous type on the corpus") {
    val ev = graft.Events.read(spark, sfDir)
    val sums = EventSeq.transitions(ev, "user_id", "event_type", "ts", "event_id")
      .groupBy("prev").agg(sum("prob").as("s")).collect()
    assert(sums.nonEmpty)
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-3))
  }

  test("rollingActive counts distinct users over the trailing window") {
    // u1 active days 1, 2; u2 active day 1; u3 active day 4
    val ev = Seq(
      ("u1", ts("2024-01-01 03:00:00")), ("u1", ts("2024-01-01 09:00:00")),
      ("u1", ts("2024-01-02 05:00:00")), ("u2", ts("2024-01-01 12:00:00")),
      ("u3", ts("2024-01-04 00:00:00"))
    ).toDF("user", "t")
    val got = EventSeq.rollingActive(ev, "user", "t", windowDays = 2)
      .orderBy("day").collect()
      .map(r => r.getTimestamp(0).toString.take(10) -> r.getLong(1)).toMap
    // day1: {u1,u2}; day2: {u1,u2 (from day1), u1} = 2; day3: {u1 (day2)};
    // day4: {u3}
    assert(got === Map("2024-01-01" -> 2L, "2024-01-02" -> 2L,
      "2024-01-03" -> 1L, "2024-01-04" -> 1L))
  }

  test("rollingActive: windowDays=1 is plain daily actives; repeats count once") {
    val ev = Seq(
      ("a", ts("2024-01-01 01:00:00")), ("a", ts("2024-01-01 02:00:00")),
      ("b", ts("2024-01-01 03:00:00")), ("a", ts("2024-01-03 01:00:00"))
    ).toDF("user", "t")
    val got = EventSeq.rollingActive(ev, "user", "t", windowDays = 1)
      .orderBy("day").collect()
      .map(r => r.getTimestamp(0).toString.take(10) -> r.getLong(1)).toMap
    assert(got === Map("2024-01-01" -> 2L, "2024-01-03" -> 1L))
  }

  test("funnelWindowed: conversions outside the gap budget do not count") {
    // u1 converts within 1h; u2's click comes 3h after view
    val ev = Seq(
      ("u1", "view", ts("2024-01-01 10:00:00")),
      ("u1", "click", ts("2024-01-01 10:30:00")),
      ("u2", "view", ts("2024-01-01 10:00:00")),
      ("u2", "click", ts("2024-01-01 13:00:00"))
    ).toDF("user", "etype", "t")
    val tight = EventSeq.funnelWindowed(ev, "user", "etype", "t",
        Seq("view", "click"), maxGapUs = 3600L * 1000000)
      .orderBy("step_no").collect().map(_.getAs[Long]("users"))
    assert(tight.toSeq === Seq(2L, 1L))
    // the vacuous budget matches the plain funnel
    val loose = EventSeq.funnel(ev, "user", "etype", "t",
        Seq("view", "click"))
      .orderBy("step_no").collect().map(_.getAs[Long]("users"))
    assert(loose.toSeq === Seq(2L, 2L))
  }

  test("funnelWindowed: a gap of exactly the budget still converts") {
    val ev = Seq(
      ("u", "view", ts("2024-01-01 10:00:00")),
      ("u", "click", ts("2024-01-01 11:00:00"))
    ).toDF("user", "etype", "t")
    val got = EventSeq.funnelWindowed(ev, "user", "etype", "t",
        Seq("view", "click"), maxGapUs = 3600L * 1000000)
      .orderBy("step_no").collect().map(_.getAs[Long]("users"))
    assert(got.toSeq === Seq(1L, 1L))
  }

  test("interEventStats: exact spans and gaps; singletons carry nulls") {
    val ev = Seq(
      ("a", 1L, ts("2024-01-01 00:00:00")),
      ("a", 2L, ts("2024-01-01 00:00:10")),
      ("a", 3L, ts("2024-01-01 00:01:10")),
      ("b", 4L, ts("2024-01-01 05:00:00"))
    ).toDF("user", "event_id", "t")
    val got = EventSeq.interEventStats(ev, "user", "t", "event_id")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) === 3L)
    assert(a.getDouble(2) === 70.0) // span
    assert(a.getDouble(3) === 35.0) // mean of gaps 10, 60
    assert(a.getDouble(4) === 60.0)
    val b = got("b")
    assert(b.getLong(1) === 1L)
    assert(b.getDouble(2) === 0.0)
    assert(b.isNullAt(3) && b.isNullAt(4))
  }

  test("topPaths: ordered heads, frequency ranking, deterministic ties") {
    val ev = Seq(
      ("u1", 1L, ts("2024-01-01 10:00:00"), "view"),
      ("u1", 2L, ts("2024-01-01 10:01:00"), "click"),
      ("u1", 3L, ts("2024-01-01 10:02:00"), "buy"),
      ("u2", 4L, ts("2024-01-01 11:00:00"), "view"),
      ("u2", 5L, ts("2024-01-01 11:01:00"), "click"),
      ("u3", 6L, ts("2024-01-01 12:00:00"), "view"),
      ("u3", 7L, ts("2024-01-01 12:01:00"), "click"),
      ("u4", 8L, ts("2024-01-01 13:00:00"), "search")
    ).toDF("user", "event_id", "t", "etype")
    val got = EventSeq.topPaths(ev, "user", "etype", "t", "event_id",
        maxLen = 2, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.head === ("view>click", 3L)) // u1 truncated to 2 steps
    assert(got.toMap.apply("search") === 1L)
    // frequency tie between single-user paths breaks on the path string
    val tied = got.filter(_._2 == 1L).map(_._1)
    assert(tied.toSeq === tied.toSeq.sorted)
  }

  test("topPaths: colliding timestamps order by the tiebreak column") {
    val t0 = ts("2024-01-01 10:00:00")
    val ev = Seq(("u", 2L, t0, "b"), ("u", 1L, t0, "a"))
      .toDF("user", "event_id", "t", "etype")
    val got = EventSeq.topPaths(ev, "user", "etype", "t", "event_id",
      maxLen = 2, topK = 1).head()
    assert(got.getString(0) === "a>b")
  }

  test("rollingActiveApprox tracks the exact rolling actives within 5%") {
    val rng = new scala.util.Random(7)
    val ev = (1 to 4000).map { i =>
      val day = 1 + rng.nextInt(12)
      (s"u${rng.nextInt(700)}", ts(f"2024-01-$day%02d 12:00:00"))
    }.toDF("user", "t")
    val exact = EventSeq.rollingActive(ev, "user", "t", windowDays = 7)
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val approx = EventSeq.rollingActiveApprox(ev, "user", "t", windowDays = 7)
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (d, n) =>
      assert(math.abs(approx(d).toDouble - n) / n < 0.05, s"$d: $n vs ${approx(d)}")
    }
  }

  test("markovAttribution: closed two-channel removal effects") {
    // journeys: A→conv, A→null, B→conv, B→conv
    //   p_conv = 0.5·0.5 + 0.5·1 = 0.75
    //   remove A: 0.5·0 + 0.5·1 = 0.5  → re_A = 1 − 0.5/0.75 = 1/3
    //   remove B: 0.5·0.5 + 0   = 0.25 → re_B = 1 − 0.25/0.75 = 2/3
    val ev = Seq(
      (1L, "A", ts("2024-01-01 10:00:00"), 1L),
      (1L, "buy", ts("2024-01-01 11:00:00"), 2L),
      (2L, "A", ts("2024-01-01 10:00:00"), 3L),
      (3L, "B", ts("2024-01-01 10:00:00"), 4L),
      (3L, "buy", ts("2024-01-01 11:00:00"), 5L),
      (4L, "B", ts("2024-01-01 10:00:00"), 6L),
      (4L, "buy", ts("2024-01-01 11:00:00"), 7L)
    ).toDF("user", "etype", "t", "eid")
    val out = EventSeq.markovAttribution(ev, "user", "etype", "t", "eid",
        Seq("A", "B"), "buy", rounds = 6)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out("A")._1 == 0.75 && out("B")._1 == 0.75)
    assert(math.abs(out("A")._2 - 1.0 / 3) < 1e-6)
    assert(math.abs(out("B")._2 - 2.0 / 3) < 1e-6)
    assert(math.abs(out("A")._3 - 1.0 / 3) < 1e-6)
    assert(math.abs(out("B")._3 - 2.0 / 3) < 1e-6)
  }

  test("markovAttribution: touchless users feed start mass; post-conv " +
      "touches ignored") {
    val ev = Seq(
      (1L, "A", ts("2024-01-01 10:00:00"), 1L),
      (1L, "buy", ts("2024-01-01 11:00:00"), 2L),
      (1L, "A", ts("2024-01-01 12:00:00"), 3L), // after conversion: ignored
      (2L, "buy", ts("2024-01-01 10:00:00"), 4L), // converts with no touch
      (3L, "A", ts("2024-01-01 10:00:00"), 5L)  // touch, no conversion
    ).toDF("user", "etype", "t", "eid")
    val out = EventSeq.markovAttribution(ev, "user", "etype", "t", "eid",
        Seq("A", "B"), "buy", rounds = 6)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    // chain: start→A 2/3, start→conv 1/3; A→conv 1/2, A→null 1/2
    //   p = 1/3 + 2/3·1/2 = 2/3; remove A: p = 1/3 → re_A = 1/2
    assert(math.abs(out("A")._1 - 2.0 / 3) < 1e-6)
    assert(math.abs(out("A")._2 - 0.5) < 1e-6)
  }

  test("markovAttribution is partition-invariant") {
    val ev = (1 to 120).map { i =>
      val t = if (i % 3 == 0) "buy" else if (i % 2 == 0) "A" else "B"
      ((i % 10).toLong, t, ts(f"2024-01-01 ${8 + i % 12}%02d:00:00"), i.toLong)
    }.toDF("user", "etype", "t", "eid")
    val a = EventSeq.markovAttribution(ev.repartition(1), "user", "etype",
      "t", "eid", Seq("A", "B"), "buy").orderBy("channel").collect().toSeq
    val b = EventSeq.markovAttribution(ev.repartition(7), "user", "etype",
      "t", "eid", Seq("A", "B"), "buy").orderBy("channel").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("rayleighTest: phase-locked events score r_bar 1, uniform 0") {
    val locked = Seq("2024-01-01 09:30:00", "2024-02-05 09:30:00",
      "2024-03-09 09:30:00").map(x => Tuple1(ts(x))).toDF("t")
    val r = EventSeq.rayleighTest(locked, "t").head()
    assert(r.getLong(0) === 3L)
    // micro quantization of cos/sin costs the last grid step
    assert(r.getAs[Double]("r_bar") >= 0.999998)
    assert(r.getAs[Double]("rayleigh_z") >= 2.999988)
    // four points at 0/6/12/18h cancel exactly
    val uniform = Seq("2024-01-01 00:00:00", "2024-01-01 06:00:00",
      "2024-01-01 12:00:00", "2024-01-01 18:00:00")
      .map(x => Tuple1(ts(x))).toDF("t")
    val u = EventSeq.rayleighTest(uniform, "t").head()
    assert(u.getAs[Double]("r_bar") === 0.0)
    assert(u.getAs[Double]("p_approx") === 1.0)
  }

  test("rayleighTest: day boundary wraps (23:59 and 00:01 concentrate)") {
    val wrap = Seq("2024-01-01 23:59:00", "2024-01-02 00:01:00")
      .map(x => Tuple1(ts(x))).toDF("t")
    val r = EventSeq.rayleighTest(wrap, "t").head()
    assert(r.getAs[Double]("r_bar") > 0.999,
      "2 minutes apart across midnight is nearly phase-locked")
  }

  test("rayleighTest is partition-invariant on events") {
    val ev = graft.Events.read(spark, sfDir)
    val run = (p: Int) => EventSeq.rayleighTest(ev.repartition(p), "ts")
      .collect().toSeq
    assert(run(1) === run(7))
  }
}
