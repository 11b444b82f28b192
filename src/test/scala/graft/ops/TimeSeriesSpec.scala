package graft.ops

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resampleFfill fills interior gaps with the last seen value") {
    // key "a": hours 00, 01, 04 → grid 00..04 with 02/03 as gaps
    val df = Seq(
      ("a", ts("2024-01-01 00:10:00"), 1.0),
      ("a", ts("2024-01-01 00:50:00"), 3.0),
      ("a", ts("2024-01-01 01:20:00"), 5.0),
      ("a", ts("2024-01-01 04:00:00"), 7.0),
      ("b", ts("2024-01-01 02:00:00"), 9.0)
    ).toDF("k", "t", "v")
    val out = TimeSeries.resampleFfill(df, "k", "t", "v", "hour")
      .orderBy("k", "bucket")
      .select("k", "n_events", "value_avg", "value_fill", "is_gap")
      .collect()
    val a = out.filter(_.getString(0) == "a")
    assert(a.length === 5)
    // bucket 00: avg(1,3)=2; bucket 01: 5; gaps 02,03 carry 5; bucket 04: 7
    assert(a.map(_.getDouble(3)).toSeq === Seq(2.0, 5.0, 5.0, 5.0, 7.0))
    assert(a.map(_.getBoolean(4)).toSeq === Seq(false, false, true, true, false))
    assert(a.map(_.getLong(1)).toSeq === Seq(2L, 1L, 0L, 0L, 1L))
    // gap rows have null value_avg
    assert(a.filter(_.getBoolean(4)).forall(_.isNullAt(2)))
    // key "b" spans a single bucket — no gaps
    val b = out.filter(_.getString(0) == "b")
    assert(b.length === 1 && b.head.getDouble(3) === 9.0)
  }

  test("resampleInterp blends gaps linearly and extends flat at the edges") {
    // key "a": known values at hours 01 (4.0) and 04 (10.0); hour 00 has
    // no earlier anchor (NOCB), 02/03 interpolate at 1/3 and 2/3
    val df = Seq(
      ("a", ts("2024-01-01 01:30:00"), 4.0),
      ("a", ts("2024-01-01 04:10:00"), 10.0)
    ).toDF("k", "t", "v")
    val out = TimeSeries.resampleInterp(df, "k", "t", "v", "hour")
      .orderBy("bucket").select("value_interp", "is_gap").collect()
    assert(out.map(_.getDouble(0)).toSeq === Seq(4.0, 6.0, 8.0, 10.0))
    assert(out.map(_.getBoolean(1)).toSeq === Seq(false, true, true, false))
    // leading gap: NOCB takes the next known value
    val df2 = Seq(
      ("a", ts("2024-01-01 00:00:00"), 2.0),
      ("a", ts("2024-01-01 00:30:00"), 4.0), // same bucket, avg 3.0
      ("a", ts("2024-01-01 02:00:00"), 9.0)
    ).toDF("k", "t", "v")
    val out2 = TimeSeries.resampleInterp(df2, "k", "t", "v", "hour")
      .orderBy("bucket").select("value_interp").collect().map(_.getDouble(0))
    assert(out2.toSeq === Seq(3.0, 6.0, 9.0))
  }

  test("resampleInterp equals resampleFfill on gap-free series") {
    val df = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1.0),
      ("a", ts("2024-01-01 01:00:00"), 2.0),
      ("a", ts("2024-01-01 02:00:00"), 4.0)
    ).toDF("k", "t", "v")
    val fill = TimeSeries.resampleFfill(df, "k", "t", "v", "hour")
      .orderBy("bucket").select("value_fill").collect().map(_.getDouble(0))
    val interp = TimeSeries.resampleInterp(df, "k", "t", "v", "hour")
      .orderBy("bucket").select("value_interp").collect().map(_.getDouble(0))
    assert(fill.toSeq === interp.toSeq)
  }

  test("resampleFfill produces a dense per-key grid (span/step + 1 rows)") {
    val df = Seq(
      ("k", ts("2024-03-01 00:00:00"), 1.0),
      ("k", ts("2024-03-03 00:00:00"), 2.0)
    ).toDF("k", "t", "v")
    assert(TimeSeries.resampleFfill(df, "k", "t", "v", "day").count() === 3L)
    assert(TimeSeries.resampleFfill(df, "k", "t", "v", "hour").count() === 49L)
  }

  test("movingAvg: trailing inclusive window per key on a closed case") {
    val df = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1.0),
      ("a", ts("2024-01-01 00:30:00"), 3.0),
      ("a", ts("2024-01-01 01:00:00"), 5.0),  // 1h window: includes ALL three
      ("a", ts("2024-01-01 02:30:00"), 7.0),  // none of the above in range
      ("b", ts("2024-01-01 00:45:00"), 9.0)   // other key: isolated
    ).toDF("k", "t", "v")
    val out = TimeSeries.movingAvg(df, "k", "t", "v", windowUs = 3600000000L)
      .orderBy("k", "t").select("k", "win_n", "win_avg").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L, 1L, 1L))
    assert(out.map(_.getDouble(2)).toSeq === Seq(1.0, 2.0, 3.0, 7.0, 9.0))
  }

  test("movingAvg: boundary row exactly windowUs earlier is included") {
    val df = Seq(
      ("k", ts("2024-01-01 00:00:00"), 2.0),
      ("k", ts("2024-01-01 00:00:01"), 4.0)
    ).toDF("k", "t", "v")
    val out = TimeSeries.movingAvg(df, "k", "t", "v", windowUs = 1000000L)
      .orderBy("t").select("win_n", "win_avg").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(out(1).getDouble(1) === 3.0)
  }

  test("resampleFfill rejects unknown units") {
    val df = Seq(("k", ts("2024-03-01 00:00:00"), 1.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      TimeSeries.resampleFfill(df, "k", "t", "v", "fortnight")
    }
  }

  test("acf matches the textbook estimator on a closed series") {
    val xs = Seq(1.0, 3.0, 2.0, 5.0, 4.0, 6.0, 2.0, 7.0)
    val df = xs.zipWithIndex.map { case (v, i) => ("k", i, v) }.toDF("k", "i", "v")
    val got = TimeSeries.acf(df, "k", "i", "v", maxLag = 3).collect()
      .map(r => r.getAs[Int]("lag") -> r.getAs[Double]("r")).toMap
    val mean = xs.sum / xs.size
    val ss = xs.map(x => (x - mean) * (x - mean)).sum
    for (k <- 1 to 3) {
      val ref = xs.drop(k).zip(xs.dropRight(k))
        .map { case (a, b) => (a - mean) * (b - mean) }.sum / ss
      assert(math.abs(got(k) - ref) < 1e-12, s"lag $k")
    }
  }

  test("acf of a constant-increment alternating series: lag-2 positive, lag-1 negative") {
    val xs = Seq(1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0)
    val df = xs.zipWithIndex.map { case (v, i) => ("k", i, v) }.toDF("k", "i", "v")
    val got = TimeSeries.acf(df, "k", "i", "v", maxLag = 2).collect()
      .map(r => r.getAs[Int]("lag") -> r.getAs[Double]("r")).toMap
    assert(got(1) < -0.8 && got(2) > 0.7)
  }

  test("acf keys are independent and n is the per-key count") {
    val a = Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex.map { case (v, i) => ("a", i, v) }
    val b = Seq(9.0, 1.0, 9.0, 1.0, 9.0).zipWithIndex.map { case (v, i) => ("b", i, v) }
    val out = TimeSeries.acf((a ++ b).toDF("k", "i", "v"), "k", "i", "v", 1)
      .collect().map(r => r.getAs[String]("key") ->
        (r.getAs[Double]("r"), r.getAs[Long]("n"))).toMap
    assert(out("a")._2 === 4L && out("b")._2 === 5L)
    // closed forms: a = 1,2,3,4 → r1 = 1.25/5 = 0.25; b = 9,1,9,1,9 → −0.8
    assert(math.abs(out("a")._1 - 0.25) < 1e-12)
    assert(math.abs(out("b")._1 + 0.8) < 1e-12)
  }

  test("ewmaKernel: normalized finite-kernel weights, closed case") {
    val df = Seq(("k", 1L, 1.0), ("k", 2L, 2.0), ("k", 3L, 3.0))
      .toDF("key", "t", "x")
    val out = TimeSeries.ewmaKernel(df, "key", "t", "x", alpha = 0.5,
      lookback = 2).orderBy("t").collect().map(_.getAs[Double]("ewma"))
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(math.abs(out(1) - 2.5 / 1.5) < 1e-12)
    assert(math.abs(out(2) - 4.25 / 1.75) < 1e-12)
  }

  test("ewmaKernel: keys are independent; truncation matches full kernel") {
    val df = Seq(("a", 1L, 100.0), ("b", 1L, 1.0), ("b", 2L, 2.0))
      .toDF("key", "t", "x")
    val out = TimeSeries.ewmaKernel(df, "key", "t", "x", 0.3, 5)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        r.getAs[Double]("ewma")).toMap
    assert(out(("a", 1L)) === 100.0, "key a must not see key b")
    assert(math.abs(out(("b", 2L)) - (2.0 + 0.7 * 1.0) / 1.7) < 1e-12)
    // lookback beyond the series length changes nothing
    val long = TimeSeries.ewmaKernel(df, "key", "t", "x", 0.3, 50)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        r.getAs[Double]("ewma")).toMap
    out.foreach { case (k, v) => assert(math.abs(long(k) - v) < 1e-12) }
  }

  test("changeScore: full two-sided windows only; step detected exactly") {
    val df = (1 to 6).map(i => ("k", i.toLong, if (i <= 3) 0.0 else 10.0))
      .toDF("key", "t", "x")
    val out = TimeSeries.changeScore(df, "key", "t", "x", window = 3)
      .orderBy("t").collect().map(r =>
        if (r.isNullAt(r.fieldIndex("score"))) None
        else Some(r.getAs[Double]("score")))
    assert(out.take(3).forall(_.isEmpty), "left edge lacks a full window")
    assert(out(3) === Some(10.0), "the step scores |10 − 0|")
    assert(out.drop(4).forall(_.isEmpty), "right edge lacks a full window")
  }

  test("decompose: constant series gives flat trend, zero seasonal and resid") {
    val df = (0 until 49).map(h =>
      ("k", ts(f"2024-01-0${1 + h / 24}%d ${h % 24}%02d:30:00"), 7.25))
      .toDF("k", "t", "v")
    val out = TimeSeries.decompose(df, "k", "t", "v",
        period = 24, halfWindow = 12)
      .orderBy("bucket").collect()
    assert(out.length === 49)
    val mid = out.filter(!_.isNullAt(4)) // rows with a trend
    assert(mid.length === 49 - 24, "both 12-bucket edges lack a full window")
    mid.foreach { r =>
      assert(r.getDouble(3) === 7.25) // value
      assert(r.getDouble(4) === 7.25) // trend
      assert(r.getDouble(5) === 0.0) // seasonal
      assert(r.getDouble(6) === 0.0) // resid
    }
  }

  test("decompose: value = trend + seasonal + resid and seasonal depends only on phase") {
    // deterministic pseudo-random hourly values over 4 days
    val df = (0 until 96).map { h =>
      val v = 50.0 + 10 * math.sin(h * 2 * math.Pi / 24) + (h * 37 % 11)
      ("k", ts(f"2024-01-0${1 + h / 24}%d ${h % 24}%02d:00:00"),
        math.round(v * 100) / 100.0)
    }.toDF("k", "t", "v")
    val out = TimeSeries.decompose(df, "k", "t", "v")
      .collect().filter(!_.isNullAt(4))
    assert(out.nonEmpty)
    out.foreach { r =>
      val (v, tr, se, re) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(math.abs(v - (tr + se + re)) < 3e-6, "additive identity")
    }
    // same phase ⇒ same seasonal
    val byPhase = out.groupBy(r =>
      r.getTimestamp(1).toInstant.atZone(java.time.ZoneOffset.UTC).getHour)
    byPhase.foreach { case (_, rows) =>
      assert(rows.map(_.getDouble(5)).distinct.length === 1)
    }
  }

  test("decompose keys are independent and gaps void overlapping trends") {
    val df = ((0 until 40).filter(_ != 20).map { h =>
      ("a", ts(f"2024-01-0${1 + h / 24}%d ${h % 24}%02d:00:00"), 3.0)
    } ++ (0 until 40).map { h =>
      ("b", ts(f"2024-01-0${1 + h / 24}%d ${h % 24}%02d:00:00"), 5.0)
    }).toDF("k", "t", "v")
    val out = TimeSeries.decompose(df, "k", "t", "v")
      .collect().groupBy(_.getString(0))
    // key a: every interior window (h ∈ 12..27) overlaps the missing
    // bucket 20, so no row of a has a trend at all
    assert(out("a").forall(_.isNullAt(4)))
    // key b is dense: interior trends exist and equal the constant
    val bTrends = out("b").filter(!_.isNullAt(4))
    assert(bTrends.length === 40 - 24)
    bTrends.foreach(r => assert(r.getDouble(4) === 5.0))
  }

  private val origin2024Us = 1704067200000000L // 2024-01-01 00:00:00 UTC

  test("rollingSlope recovers an exact line and nulls single-point windows") {
    val df = Seq(0, 60, 120, 180).map(sec =>
      ("u", ts(f"2024-01-01 00:${sec / 60}%02d:00"), 5.0 + 2.0 * sec))
      .toDF("k", "t", "v")
    val out = TimeSeries.rollingSlope(df, "k", "t", "v",
        windowUs = 3600L * 1000000, originUs = origin2024Us)
      .orderBy("t").select("slope_n", "slope").collect()
    assert(out(0).isNullAt(1), "first row: one point, no spread")
    assert(out(0).getLong(0) === 1L)
    (1 until 4).foreach { i =>
      assert(out(i).getLong(0) === i + 1L)
      assert(out(i).getDouble(1) === 2.0, "exact integer moments: slope is exact")
    }
  }

  test("rollingSlope: flat series slopes 0, trailing window drops old rows") {
    val df = Seq(0, 60, 7200).map(sec =>
      ("u", ts(f"2024-01-01 0${sec / 3600}%d:${sec / 60 % 60}%02d:00"), 9.0))
      .toDF("k", "t", "v")
    val out = TimeSeries.rollingSlope(df, "k", "t", "v",
        windowUs = 3600L * 1000000, originUs = origin2024Us)
      .orderBy("t").select("slope_n", "slope").collect()
    assert(out(1).getLong(0) === 2L)
    assert(out(1).getDouble(1) === 0.0)
    // row at 7200 s: the first two rows fell out of the 1 h window
    assert(out(2).getLong(0) === 1L)
    assert(out(2).isNullAt(1))
  }

  private val origin2024UsFc = 1704067200000000L

  test("forecastLinear extrapolates an exact daily line per key") {
    // key a: y = 10 + 2*day (days 0..4); key b flat 7
    val df = ((0 to 4).map(d =>
      ("a", ts(f"2024-01-0${d + 1}%d 10:00:00"), 10.0 + 2.0 * d)) ++
      (0 to 2).map(d => ("b", ts(f"2024-01-0${d + 1}%d 09:00:00"), 7.0)))
      .toDF("k", "t", "v")
    val got = TimeSeries.forecastLinear(df, "k", "t", "v", horizon = 2,
        originUs = origin2024UsFc)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getTimestamp(2).toString.take(10), r.getDouble(3))).toMap
    assert(got(("a", 1)) === (("2024-01-06", 20.0)))
    assert(got(("a", 2)) === (("2024-01-07", 22.0)))
    assert(got(("b", 1))._2 === 7.0)
    assert(got(("b", 2))._2 === 7.0)
  }

  test("forecastLinear: single-day keys forecast their mean flat") {
    val df = Seq(("s", ts("2024-01-01 01:00:00"), 4.0),
      ("s", ts("2024-01-01 23:00:00"), 6.0)).toDF("k", "t", "v")
    val got = TimeSeries.forecastLinear(df, "k", "t", "v", horizon = 3,
        originUs = origin2024UsFc)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(got === Map(1 -> 5.0, 2 -> 5.0, 3 -> 5.0))
  }

  test("cusum: mean-shift series peaks |S| at the change point") {
    // 4 points at 10 then 4 at 20: x̄ = 15, S dips to its extreme at t=4
    val df = (1 to 8).map(t => (t.toLong, if (t <= 4) 10L else 20L))
      .toDF("t", "x")
    val out = TimeSeries.cusum(df, "t", "x").orderBy("t")
      .select("t", "x", "s_scaled", "cusum").collect()
    // s_scaled = n·cum − t·G with n=8, G=120
    val expected = Seq(
      1L -> (8 * 10 - 1 * 120), 2L -> (8 * 20 - 2 * 120),
      3L -> (8 * 30 - 3 * 120), 4L -> (8 * 40 - 4 * 120),
      5L -> (8 * 60 - 5 * 120), 6L -> (8 * 80 - 6 * 120),
      7L -> (8 * 100 - 7 * 120), 8L -> (8 * 120 - 8 * 120))
    assert(out.map(r => r.getLong(0) -> r.getLong(2).toInt).toSeq ===
      expected.map { case (t, s) => t -> s })
    // unscaled: s/n; extreme at t=4 = -20
    assert(out(3).getDouble(3) === -20.0)
    assert(out(7).getLong(2) === 0L) // S_n = 0 always
  }

  test("cusum: duplicate order values collapse by summing") {
    val df = Seq((1L, 3L), (1L, 7L), (2L, 10L)).toDF("t", "x")
    val out = TimeSeries.cusum(df, "t", "x").orderBy("t").collect()
    assert(out.length === 2)
    assert(out(0).getLong(1) === 10L)
    // n=2, G=20: s(1) = 2·10 − 1·20 = 0
    assert(out(0).getLong(2) === 0L)
  }

  test("cusum: a constant series is identically zero") {
    val df = (1 to 5).map(t => (t.toLong, 4L)).toDF("t", "x")
    val out = TimeSeries.cusum(df, "t", "x").collect()
    assert(out.forall(_.getLong(2) === 0L))
  }

  test("cusum is invariant to input partitioning") {
    val df = (1 to 40).map(t => (t.toLong, (t * 13 % 7).toLong))
      .toDF("t", "x")
    val a = TimeSeries.cusum(df, "t", "x").orderBy("t").collect().toSeq
    val b = TimeSeries.cusum(df.repartition(9), "t", "x")
      .orderBy("t").collect().toSeq
    assert(a === b)
  }

  test("brokenStick recovers a planted break exactly") {
    // y = 2x + 1 for x <= 12, y = 86 - 3x after: SSE = 0 at the truth
    val df = (1L to 20L)
      .map(x => (x, if (x <= 12) 2 * x + 1 else 86 - 3 * x))
      .toDF("x", "y")
    val r = TimeSeries.brokenStick(df, "x", "y", Seq(8, 12, 16)).head()
    assert(r.getDouble(0) === 12.0)
    assert(r.getLong(1) === 12L && r.getLong(2) === 8L)
    assert(r.getDouble(3) === 2.0 && r.getDouble(4) === 1.0)
    assert(r.getDouble(5) === -3.0 && r.getDouble(6) === 86.0)
    assert(r.getDouble(7) === 0.0)
  }

  test("brokenStick: degenerate sides are skipped; ties go low") {
    // candidate 19 leaves one right point -> skipped; 1 leaves one left
    val df = (1L to 20L).map(x => (x, x)).toDF("x", "y")
    val r = TimeSeries.brokenStick(df, "x", "y", Seq(1, 10, 19)).head()
    assert(r.getDouble(0) === 10.0)
    // pure line: both slopes 1, SSE 0
    assert(r.getDouble(3) === 1.0 && r.getDouble(5) === 1.0)
    intercept[IllegalArgumentException] {
      // every candidate leaves a degenerate side
      TimeSeries.brokenStick(Seq((1L, 1L), (2L, 2L), (3L, 3L))
        .toDF("x", "y"), "x", "y", Seq(0, 5))
    }
  }

  test("brokenStick is partition-invariant on real data") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_quantity").as("x"),
        round(col("l_extendedprice") / 1000).cast("long").as("y"))
    val run = (p: Int) => TimeSeries.brokenStick(li.repartition(p),
      "x", "y", Seq(10.0, 25.0, 40.0)).collect().toSeq
    assert(run(1) === run(7))
  }

  test("pageHinkley: flat-then-jump series alarms at the jump, flat never") {
    // key a: 1, 1, 1, 10 — running-mean shortfalls 0, 0, 0, and at t=4
    // (1000c − 1300c/4) = 675c → PH = 6.75 units; key b decreases, so m
    // tracks its own min and PH stays 0
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 1.0), ("a", 3L, 1.0), ("a", 4L, 10.0),
      ("b", 1L, 10.0), ("b", 2L, 0.0)
    ).toDF("k", "t", "v")
    val out = TimeSeries.pageHinkley(df, "k", "t", "v",
        delta = 0.0, lambda = 5.0)
      .orderBy("k").collect()
    val a = out(0)
    assert(a.getLong(1) === 4L)
    assert(a.getDouble(2) === 6.75 && a.getDouble(3) === 6.75)
    assert(a.getLong(4) === 4L, "alarm at the jump point")
    val b = out(1)
    assert(b.getDouble(3) === 0.0 && b.isNullAt(4))
  }

  test("pageHinkley sums order-tied rows and is partition-invariant") {
    val df = Seq(("a", 1L, 0.4), ("a", 1L, 0.6), ("a", 2L, 1.0))
      .toDF("k", "t", "v")
    val r = TimeSeries.pageHinkley(df, "k", "t", "v", 0.0, 1.0).head()
    assert(r.getLong(1) === 2L, "tied timestamps collapse to one point")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_suppkey").as("k"), col("l_orderkey").as("t"),
        col("l_extendedprice").as("v"))
    val run = (p: Int) => TimeSeries.pageHinkley(li.repartition(p),
      "k", "t", "v", 0.0, 1000.0).orderBy("k").collect().toSeq
    assert(run(1) === run(7))
  }

  test("brownForecast: constant series has zero trend, forecast = level") {
    val df = (1L to 12L).map(i => ("a", i, 5.0)).toDF("k", "t", "v")
    val out = TimeSeries.brownForecast(df, "k", "t", "v", alpha = 0.5)
      .orderBy("t").collect()
    out.foreach { r =>
      assert(r.getDouble(3) === 5.0 && r.getDouble(4) === 5.0)
      assert(r.getDouble(5) === 5.0, "level")
      assert(r.getDouble(6) === 0.0, "trend")
      assert(r.getDouble(7) === 5.0, "forecast")
    }
  }

  test("brownForecast tracks a linear trend and obeys the h-step identity") {
    val df = (1L to 20L).map(i => ("a", i, i.toDouble)).toDF("k", "t", "v")
    val out = TimeSeries.brownForecast(df, "k", "t", "v", alpha = 0.5,
      lookback = 8, horizon = 3).orderBy("t").collect()
    val last = out.last
    assert(last.getDouble(6) > 0.5, s"trend should be near 1, got $last")
    // forecast = level + 3·trend on the PRE-rounding values: allow the
    // 6-digit grid one ulp of slack
    out.foreach { r =>
      assert(math.abs(r.getDouble(7) - (r.getDouble(5) + 3 * r.getDouble(6)))
        <= 3e-6)
    }
    // s1 lags the series less than s2 (double smoothing): level 2s1−s2
    // overshoots s1 upward on an increasing series
    assert(last.getDouble(5) > last.getDouble(3))
  }
}
