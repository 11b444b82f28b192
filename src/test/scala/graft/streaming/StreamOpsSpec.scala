package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  test("windowedCounts over a memory stream: incremental hourly counts") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamOps.Event]
    val agg = StreamOps.windowedCounts(in.toDF(), "1 hour", "2 hours")
    val q = agg.writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    try {
      in.addData(
        StreamOps.Event(1, ts(5), 1, "click", 1.0),
        StreamOps.Event(2, ts(10), 1, "click", 2.0),
        StreamOps.Event(3, ts(20), 2, "view", 3.0))
      q.processAllAvailable()
      val out = spark.table("wc").collect()
      assert(out.map(_.getAs[Long]("n_events")).sum === 3)
      val click = out.find(_.getAs[String]("event_type") == "click").get
      assert(click.getAs[Long]("n_events") === 2)
      assert(click.getAs[Double]("sum_value") === 3.0)
      assert(click.getAs[Timestamp]("window_start") === Timestamp.valueOf("2024-01-01 10:00:00"))
    } finally q.stop()
  }

  test("windowedCounts works identically on a batch frame") {
    val batch = Seq(
      StreamOps.Event(1, ts(5), 1, "click", 1.0),
      StreamOps.Event(2, ts(10), 1, "click", 2.0)).toDF()
    val out = StreamOps.windowedCounts(batch).collect()
    assert(out.length === 1 && out.head.getAs[Long]("n_events") === 2)
  }

  test("sessionize emits a session after the inactivity gap passes the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamOps.Event]
    val sessions = StreamOps.sessionize(in.toDS(), gapMs = 5 * 60 * 1000)
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // burst at 10:00-10:02, then silence; advancing the watermark far past
      // the gap forces the session closed via timeout
      in.addData(
        StreamOps.Event(1, ts(0), 7, "click", 1.0),
        StreamOps.Event(2, ts(1), 7, "click", 2.0),
        StreamOps.Event(3, ts(2), 7, "click", 3.0))
      q.processAllAvailable()
      in.addData(StreamOps.Event(99, ts(59), 8, "tick", 0.0))
      q.processAllAvailable()
      in.addData(StreamOps.Event(100, Timestamp.valueOf("2024-01-01 11:30:00"), 8, "tick", 0.0))
      q.processAllAvailable()
      val out = spark.table("sess").filter($"user_id" === 7).collect()
      assert(out.length === 1)
      assert(out.head.getAs[Long]("n_events") === 3)
      assert(out.head.getAs[Double]("total_value") === 6.0)
      assert(out.head.getAs[Timestamp]("session_start") === ts(0))
      assert(out.head.getAs[Timestamp]("session_end") === ts(2))
    } finally q.stop()
  }

  test("a fitted LM scores a live stream (prediction is a pure projection)") {
    implicit val sqlCtx = spark.sqlContext
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val lm = graft.glm.LM.fit(li, Seq("l_quantity", "l_discount"), "l_extendedprice")
    case class Item(l_quantity: Double, l_discount: Double)
    val in = MemoryStream[(Double, Double)]
    val scored = in.toDF().toDF("l_quantity", "l_discount")
      .withColumn("prediction", lm.predictionExpr)
    val q = scored.writeStream.format("memory").queryName("scored")
      .outputMode("append").start()
    try {
      in.addData((10.0, 0.05), (20.0, 0.0))
      q.processAllAvailable()
      val out = spark.table("scored").collect()
      assert(out.length === 2)
      val expect = lm.coefs(0) + 10.0 * lm.coefs(1) + 0.05 * lm.coefs(2)
      val got = out.find(_.getDouble(0) == 10.0).get.getAs[Double]("prediction")
      assert(math.abs(got - expect) < 1e-9)
    } finally q.stop()
  }

  test("sessionizeReplay reproduces sessionizeBatch exactly (streaming/batch parity)") {
    val ev = Seq(
      // user 1: two sessions (40-minute silence splits at gap=30min)
      StreamOps.Event(1, ts(0), 1, "a", 1.5),
      StreamOps.Event(2, ts(10), 1, "a", 2.5),
      StreamOps.Event(3, ts(55), 1, "b", 4.0),
      // user 2: one session, events out of order in the input
      StreamOps.Event(5, ts(20), 2, "a", 3.0),
      StreamOps.Event(4, ts(15), 2, "a", 1.0)).toDF()
    val gap = 30 * 60 * 1000L
    val got = StreamOps.sessionizeReplay(ev, gap)
      .orderBy("user_id", "session_idx").collect()
    val want = StreamOps.sessionizeBatch(ev, gap)
      .select($"user_id", $"session_idx", $"session_start", $"session_end",
        $"n_events", $"total_value")
      .orderBy("user_id", "session_idx").collect()
    assert(got.toSeq === want.toSeq)
    assert(got.length === 3)
  }

  test("windowedCountsReplay reproduces the batch windowed aggregation") {
    val ev = Seq(
      StreamOps.Event(1, ts(5), 1, "click", 1.0),
      StreamOps.Event(2, ts(10), 1, "click", 2.5),
      StreamOps.Event(3, ts(20), 2, "view", 3.0),
      StreamOps.Event(4, Timestamp.valueOf("2024-01-01 11:15:00"), 2, "view", 4.0)).toDF()
    val got = StreamOps.windowedCountsReplay(ev)
      .orderBy("window_start", "event_type").collect()
    val want = StreamOps.windowedCounts(ev)
      .orderBy("window_start", "event_type").collect()
    assert(got.toSeq === want.toSeq)
    assert(got.length === 3)
  }

  test("enrichedCountsReplay reproduces the batch join+window aggregation") {
    val ev = Seq(
      StreamOps.Event(1, ts(5), 1, "click", 1.0),
      StreamOps.Event(2, ts(10), 2, "click", 2.5),
      StreamOps.Event(3, ts(20), 1, "view", 3.0),
      StreamOps.Event(4, Timestamp.valueOf("2024-01-01 11:15:00"), 3, "view", 4.0),
      StreamOps.Event(5, ts(25), 9, "view", 5.0) // no dim match: dropped
    ).toDF()
    val dim = Seq((1L, "gold"), (2L, "silver"), (3L, "gold"))
      .toDF("cust", "segment")
    val got = StreamOps.enrichedCountsReplay(ev, dim, "user_id", "cust",
        "segment")
      .orderBy("window_start", "segment").collect()
    val want = StreamOps.enrichedCounts(ev, dim, "user_id", "cust", "segment")
      .orderBy("window_start", "segment").collect()
    assert(got.toSeq === want.toSeq)
    // 10:00 window: gold 2 (u1 click+view), silver 1; 11:00: gold 1
    assert(got.map(r => r.getString(1) -> r.getLong(2)).toSeq ===
      Seq("gold" -> 2L, "silver" -> 1L, "gold" -> 1L))
  }

  test("windowedCountsFileStream (file source, no collect) reproduces the batch aggregation") {
    val ev = Seq(
      StreamOps.Event(1, ts(5), 1, "click", 1.0),
      StreamOps.Event(2, ts(10), 1, "click", 2.5),
      StreamOps.Event(3, ts(20), 2, "view", 3.0),
      StreamOps.Event(4, Timestamp.valueOf("2024-01-01 11:15:00"), 2, "view", 4.0)).toDF()
    val stage = java.nio.file.Files.createTempDirectory("graft_fstream").toString
    try {
      val got = StreamOps.windowedCountsFileStream(ev, stage, numFiles = 3)
        .orderBy("window_start", "event_type").collect()
      val want = StreamOps.windowedCounts(ev)
        .orderBy("window_start", "event_type").collect()
      assert(got.toSeq === want.toSeq)
      assert(got.length === 3)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage))
    }
  }

  test("intervalJoin runs as a stream-stream join and matches the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      StreamOps.Event(1, ts(0), 1, "a", 1.0),
      StreamOps.Event(2, ts(3), 1, "b", 2.0),   // within 5 min of 1
      StreamOps.Event(3, ts(7), 1, "c", 3.0),   // within 5 min of 2 only
      StreamOps.Event(4, ts(2), 2, "d", 4.0))
    def prep(df: org.apache.spark.sql.DataFrame, side: String) =
      df.select(col("event_id").as(s"${side}_id"), col("user_id"),
        col("ts").as(s"${side}_ts"))
    val batch = StreamOps.intervalJoin(
        prep(evs.toDF(), "l"), prep(evs.toDF(), "r"),
        "user_id", "l_ts", "r_ts", windowMs = 5 * 60 * 1000L)
      .select("l.l_id", "r.r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch === Set((1L, 2L), (2L, 3L)))

    val inL = MemoryStream[StreamOps.Event]
    val inR = MemoryStream[StreamOps.Event]
    val joined = StreamOps.intervalJoin(
      prep(inL.toDF(), "l").withWatermark("l_ts", "10 minutes"),
      prep(inR.toDF(), "r").withWatermark("r_ts", "10 minutes"),
      "user_id", "l_ts", "r_ts", windowMs = 5 * 60 * 1000L)
    val q = joined.select("l.l_id", "r.r_id")
      .writeStream.format("memory").queryName("ivj").outputMode("append").start()
    try {
      inL.addData(evs); inR.addData(evs)
      q.processAllAvailable()
      val got = spark.table("ivj").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === batch)
    } finally q.stop()
  }

  test("intervalJoin stream-stream LEFT OUTER join is accepted and emits unmatched rows") {
    // Spark rejects a stream-stream outer join at analysis unless it can
    // extract a state watermark from the join condition — so this test
    // passing proves the range phrasing is one StreamingJoinHelper
    // recognizes (i.e. inner-join state is purged too, same machinery).
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      StreamOps.Event(1, ts(0), 1, "a", 1.0),
      StreamOps.Event(2, ts(3), 1, "b", 2.0),   // within 5 min of 1
      StreamOps.Event(3, ts(20), 2, "c", 3.0))  // no follower -> null-padded
    def prep(df: org.apache.spark.sql.DataFrame, side: String) =
      df.select(col("event_id").as(s"${side}_id"), col("user_id"),
        col("ts").as(s"${side}_ts"))
    val inL = MemoryStream[StreamOps.Event]
    val inR = MemoryStream[StreamOps.Event]
    val joined = StreamOps.intervalJoin(
      prep(inL.toDF(), "l").withWatermark("l_ts", "10 minutes"),
      prep(inR.toDF(), "r").withWatermark("r_ts", "10 minutes"),
      "user_id", "l_ts", "r_ts", windowMs = 5 * 60 * 1000L, joinType = "left")
    val q = joined.select(col("l.l_id"), col("r.r_id"))
      .writeStream.format("memory").queryName("ivj_left").outputMode("append").start()
    try {
      inL.addData(evs); inR.addData(evs)
      q.processAllAvailable()
      // null-padded results only emit after the watermark passes the join
      // window — advance it on both sides
      val late = StreamOps.Event(99, Timestamp.valueOf("2024-01-01 12:00:00"), 9, "wm", 0.0)
      inL.addData(late); inR.addData(late)
      q.processAllAvailable()
      val got = spark.table("ivj_left").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(got.contains((1L, 2L)))      // matched pair
      assert(got.contains((3L, -1L)))    // unmatched left row, null-padded
      assert(!got.exists(p => p._1 == 1L && p._2 == -1L)) // 1 matched: no null row
    } finally q.stop()
  }

  test("intervalJoinReplay reproduces the batch left interval join exactly") {
    val ev = Seq(
      StreamOps.Event(1, ts(0), 1, "a", 1.0),
      StreamOps.Event(2, ts(3), 1, "b", 2.0),
      StreamOps.Event(3, ts(7), 1, "c", 3.0),
      StreamOps.Event(4, ts(2), 2, "d", 4.0),   // user 2: no follower
      StreamOps.Event(5, ts(40), 1, "e", 5.0))  // isolated: no follower
      .toDF()
    val win = 5 * 60 * 1000L
    val got = StreamOps.intervalJoinReplay(ev, win)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val batch = StreamOps.intervalJoin(
        ev.select(col("event_id").as("l_id"), col("user_id"), col("ts").as("l_ts")),
        ev.select(col("event_id").as("r_id"), col("user_id"), col("ts").as("r_ts")),
        "user_id", "l_ts", "r_ts", win, joinType = "left")
      .select(col("l.l_id"), col("r.r_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got === batch)
    assert(got.contains((4L, -1L)) && got.contains((5L, -1L)))
  }

  test("dedupStreamReplay yields exactly the batch-distinct key set") {
    val ev = Seq(
      StreamOps.Event(1, ts(0), 1, "a", 1.0),
      StreamOps.Event(2, ts(1), 1, "a", 2.0),  // dup key (1, a)
      StreamOps.Event(3, ts(2), 1, "b", 3.0),
      StreamOps.Event(4, ts(3), 2, "a", 4.0),
      StreamOps.Event(5, ts(4), 2, "a", 5.0)). // dup key (2, a)
      toDF()
    val got = StreamOps.dedupStreamReplay(ev, Seq("user_id", "event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "a"), (1L, "b"), (2L, "a")))
  }

  test("streaming writes to a parquet file sink with checkpointing (production sink path)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    try {
      val in = MemoryStream[StreamOps.Event]
      val q = StreamOps.windowedCounts(in.toDF(), "1 hour", "2 hours")
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("append").start()
      try {
        in.addData(
          StreamOps.Event(1, ts(5), 1, "click", 1.0),
          StreamOps.Event(2, ts(10), 1, "click", 2.0))
        q.processAllAvailable()
        // advance the watermark far enough to close and emit the window
        in.addData(StreamOps.Event(3, Timestamp.valueOf("2024-01-02 10:00:00"), 2, "tick", 0.0))
        q.processAllAvailable()
        in.addData(StreamOps.Event(4, Timestamp.valueOf("2024-01-03 10:00:00"), 2, "tick", 0.0))
        q.processAllAvailable()
      } finally q.stop()
      val out = spark.read.parquet(s"$dir/out")
        .filter($"event_type" === "click").collect()
      assert(out.length === 1)
      assert(out.head.getAs[Long]("n_events") === 2)
      assert(out.head.getAs[Double]("sum_value") === 3.0)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("parquetSink: checkpointed restart resumes without loss or duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val out = s"$dir/out"; val cp = s"$dir/cp"
    try {
      val in = MemoryStream[Int]
      def start() = StreamOps.parquetSink(in.toDF(), out, cp)
      val q1 = start()
      try { in.addData(1 to 10: _*); q1.processAllAvailable() } finally q1.stop()
      // a NEW query object over the same checkpoint — the restart path;
      // only the unread offsets are processed
      val q2 = start()
      try { in.addData(11 to 20: _*); q2.processAllAvailable() } finally q2.stop()
      def readAll() = spark.read.parquet(out)
        .select("value").as[Int].collect().sorted.toSeq
      assert(readAll() === (1 to 20))
      // crash-replay simulation: re-run an ALREADY-COMMITTED batch id with
      // the same content (exactly what a restart does when the crash hit
      // between the write and the offset commit) — overwrite semantics
      // must leave the output unchanged, not doubled
      val batchIds = new java.io.File(out).listFiles()
        .map(_.getName).filter(_.startsWith("batch_id="))
        .map(_.stripPrefix("batch_id=").toLong).sorted
      assert(batchIds.length >= 2, s"expected >=2 batch dirs, got ${batchIds.toSeq}")
      StreamOps.writeBatch(out)((11 to 20).toDF("value"), batchIds.last)
      assert(readAll() === (1 to 20))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("sessionizeBatch matches the streaming semantics on real events") {
    val ev = graft.Events.read(spark, sfDir)
    val gap = 30 * 60 * 1000L
    val sess = StreamOps.sessionizeBatch(ev, gap)
    // invariants: per-user event counts are preserved; sessions don't overlap
    val perUser = sess.groupBy("user_id").agg(sum("n_events").as("n"))
      .join(ev.groupBy("user_id").count(), "user_id")
    assert(perUser.filter($"n" =!= $"count").count() === 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("session_start")
    val overlaps = sess
      .withColumn("prev_end", lag($"session_end", 1).over(w))
      .filter($"prev_end".isNotNull &&
        unix_millis($"session_start") - unix_millis($"prev_end") <= gap)
    assert(overlaps.count() === 0)
  }

  test("streaming count-min sketch equals the batch sketch cell-for-cell") {
    val rows = (1 to 60).map(i =>
      StreamOps.Event(i.toLong, ts(i % 50), (i % 7).toLong, "e", 1.0))
    val batch = rows.toDF()
    val expected = graft.ops.Sketch.countMin(batch, "user_id", 64, 3)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = StreamOps.countMinStreamReplay(batch, width = 64, depth = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expected)
    // bounded state: cells never exceed depth * width
    assert(got.size <= 3 * 64)
  }

  test("streaming PSI drift monitor equals the batch PSI bit for bit") {
    val ev = graft.Events.read(spark, sfDir)
    val split = lit("2024-01-16 00:00:00").cast("timestamp")
    val ref = ev.filter($"ts" < split)
    val cur = ev.filter($"ts" >= split)
    val cuts = Seq(15.0, 35.0, 70.0)
    val batch = graft.ops.Drift.psi(ref, cur, "value", cuts)
      .collect().head
    val stream = StreamOps.psiStreamReplay(ref, cur, "value", cuts)
      .collect().head
    assert(stream.getDouble(0) === batch.getDouble(0))
    assert(stream.getLong(1) === batch.getLong(1))
  }

  test("streaming HLL registers equal the batch sketch cell for cell") {
    val ev = graft.Events.read(spark, sfDir)
    val batch = graft.ops.Sketch.hllRegisters(ev, "user_id", 9)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val stream = StreamOps.hllStreamReplay(ev, 9)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(stream === batch)
    // bounded state: registers never exceed 2^p
    assert(stream.size <= 512)
  }

  test("streaming funnel equals the batch funnel (parity on real events)") {
    val ev = graft.Events.read(spark, sfDir)
    val steps = Seq("view", "click", "purchase")
    val batch = graft.ops.EventSeq.funnel(ev, "user_id", "event_type",
      "ts", steps).orderBy("step_no").collect().toSeq
    val stream = StreamOps.funnelStepsReplay(ev, steps)
      .orderBy("step_no").collect().toSeq
    assert(stream === batch)
  }

  test("streaming funnel: a user emits at most once (post-emission tombstone)") {
    // u1 reaches step 1, times out and emits; a STRAGGLER event arrives
    // after emission — without the tombstone it would restart the funnel
    // at step 0 and double-count u1 in the step table.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamOps.Event]
    val q = StreamOps.funnelSteps(in.toDS(), Seq("view", "click"),
        quietMs = 30000L, tombstoneMs = 30000L)
      .writeStream.format("memory").queryName("graft_funnel_tomb")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      in.addData(StreamOps.Event(1L, ts(5), 1L, "view", 0.0))
      q.processAllAvailable()
      // watermark sentinel → u1 passes its quiet horizon, emits n_steps=1
      in.addData(StreamOps.Event(2L, ts(20), -1L, "view", 0.0))
      q.processAllAvailable()
      // straggler for u1 — must be swallowed by the tombstone
      in.addData(StreamOps.Event(3L, ts(30), 1L, "click", 0.0))
      q.processAllAvailable()
      // advance far enough that the tombstone itself expires silently
      in.addData(StreamOps.Event(4L, ts(50), -1L, "view", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val hits = spark.table("graft_funnel_tomb")
      .filter($"user_id" === 1L).collect()
    assert(hits.length === 1, s"expected one FunnelHit for u1, got ${hits.toSeq}")
    assert(hits.head.getAs[Int]("n_steps") === 1)
  }

  test("streaming funnel: strictly-after matching and same-ts tie order") {
    // user 1: click at t5 then view at t5 (tie): sorted (ts, type) puts
    // click first → no match; view matches step 1; a click STRICTLY
    // after (t6) matches step 2. user 2: view and click both at t5 —
    // click processed before view, so it cannot match after the view.
    val rows = Seq(
      StreamOps.Event(1L, ts(5), 1L, "click", 0.0),
      StreamOps.Event(2L, ts(5), 1L, "view", 0.0),
      StreamOps.Event(3L, ts(6), 1L, "click", 0.0),
      StreamOps.Event(4L, ts(5), 2L, "view", 0.0),
      StreamOps.Event(5L, ts(5), 2L, "click", 0.0))
    val steps = Seq("view", "click")
    val out = StreamOps.funnelStepsReplay(rows.toDF(), steps)
      .orderBy("step_no").collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out === Map(1 -> 2L, 2 -> 1L)) // both reach view; only u1 clicks
    val batch = graft.ops.EventSeq.funnel(rows.toDF(), "user_id",
        "event_type", "ts", steps)
      .orderBy("step_no").collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(batch === out)
  }
}
