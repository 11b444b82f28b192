package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured-Streaming operators over the `events` shape
  * (event_id, ts, user_id, event_type, value).
  *
  * Every transform here takes a DataFrame and works identically on a batch
  * frame or a `readStream` frame — the streaming-vs-batch decision stays
  * with the caller (run the same pipeline code in both modes).
  */
object StreamOps {

  /** Tumbling event-time window counts with a watermark: the canonical
    * streaming aggregation (late data beyond `watermark` is dropped;
    * state for closed windows is evicted — bounded state at any scale).
    */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)
  // public: Spark's state-store codegen instantiates it reflectively
  case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /** Session window per user with an inactivity `gapMs`: custom state via
    * flatMapGroupsWithState — emits a session when the user goes quiet for
    * longer than the gap (state is per-user and O(1), evicted on timeout).
    */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"${gapMs / 1000} seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total))
          } else {
            // event_id tie-break keeps per-session double summation order
            // deterministic when two events share a timestamp
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  private val replaySeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Run [[sessionize]] — the real Structured-Streaming operator — over a
    * MemoryStream replay of a batch events frame and return the closed
    * sessions with a per-user `session_idx`, i.e. the exact output shape of
    * [[sessionizeBatch]]. This is the streaming/batch parity gate: declared
    * as a query whose oracle is the batch SQL.
    *
    * The replay collects the frame to the driver (MemoryStream is
    * driver-fed) — fine at gate scale; at real scale the same `sessionize`
    * call reads from Kafka/files and nothing else changes. Batch 1 carries
    * the real events PLUS a far-future sentinel for a reserved negative
    * user, so its end-of-batch watermark already clears every real
    * session's timeout; batch 2 (a second sentinel) fires those timeouts —
    * event-time timeouts trigger one batch AFTER the watermark passes them.
    */
  def sessionizeReplay(events: DataFrame, gapMs: Long): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val evs = events
      .select(col("event_id").cast("long"), col("ts"), col("user_id").cast("long"),
        col("event_type"), col("value").cast("double"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    require(evs.nonEmpty, "sessionizeReplay needs at least one event")
    val maxTs = evs.iterator.map(_.ts.getTime).max
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val name = s"graft_sessions_replay_${replaySeq.incrementAndGet()}"
    // the replayed state is tiny — fewer state-store partitions cut the
    // per-microbatch checkpoint/commit overhead; the conf is restored after
    // start() (the running query keeps the partitioning it started with)
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try sessionize(in.toDS(), gapMs)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    try {
      in.addData(evs.toIndexedSeq :+
        Event(-1L, new Timestamp(maxTs + 100 * gapMs), -1L, "__wm", 0.0))
      q.processAllAvailable()
      in.addData(Event(-2L, new Timestamp(maxTs + 200 * gapMs), -1L, "__wm", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_start")
    s.table(name).filter(col("user_id") >= 0)
      .withColumn("session_idx", row_number().over(byUser).cast("long"))
      .select("user_id", "session_idx", "session_start", "session_end",
        "n_events", "total_value")
  }

  /** Run [[windowedCounts]] — the watermarked streaming aggregation — over
    * a MemoryStream replay of a batch events frame and return the closed
    * windows. Same parity-gate mechanics as [[sessionizeReplay]]: in
    * append mode a window only emits once the watermark passes its end, so
    * batch 1 carries the data plus a far-future sentinel (filtered back
    * out by its event_type) and batch 2 triggers the emission.
    */
  def windowedCountsReplay(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val evs = events
      .select(col("event_id").cast("long"), col("ts"), col("user_id").cast("long"),
        col("event_type"), col("value").cast("double"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    require(evs.nonEmpty, "windowedCountsReplay needs at least one event")
    val maxTs = evs.iterator.map(_.ts.getTime).max
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val name = s"graft_windows_replay_${replaySeq.incrementAndGet()}"
    val farFuture = maxTs + 30L * 24 * 3600 * 1000
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try windowedCounts(in.toDF(), window_, watermark)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    try {
      in.addData(evs.toIndexedSeq :+
        Event(-1L, new Timestamp(farFuture), -1L, "__wm", 0.0))
      q.processAllAvailable()
      in.addData(Event(-2L, new Timestamp(farFuture + 3600 * 1000), -1L, "__wm", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    s.table(name).filter(col("event_type") =!= "__wm")
  }

  /** Stream-static enrichment aggregation — the canonical streaming
    * dimension join: each micro-batch inner-joins a STATIC dimension
    * frame (stateless — Structured Streaming re-plans the join per batch,
    * the broadcast hint keeps it a map-side hash join, no state store),
    * then the enriched rows feed a watermarked tumbling-window count per
    * dimension attribute. Bounded state at any scale: only open windows
    * × attribute cardinality live in the store.
    *
    * The watermark is applied to the stream BEFORE the join, so stream
    * rows with no dimension match still advance event time.
    */
  def enrichedCounts(events: DataFrame, dim: DataFrame, streamKey: String,
      dimKey: String, attr: String, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(dim.select(col(dimKey), col(attr))),
        col(streamKey) === col(dimKey))
      .groupBy(window(col("ts"), window_).as("w"), col(attr))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col(attr), col("n_events"))

  /** Run [[enrichedCounts]] over a MemoryStream replay of a batch events
    * frame against a real static dimension — the stream-static-join
    * parity gate (oracle = the same join + hourly count in batch SQL).
    * Far-future sentinel events flush the watermark; they carry a key
    * that joins nothing, so they influence event time only.
    */
  def enrichedCountsReplay(events: DataFrame, dim: DataFrame,
      streamKey: String, dimKey: String, attr: String): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val evs = events
      .select(col("event_id").cast("long"), col("ts"), col("user_id").cast("long"),
        col("event_type"), col("value").cast("double"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    require(evs.nonEmpty, "enrichedCountsReplay needs at least one event")
    val maxTs = evs.iterator.map(_.ts.getTime).max
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val name = s"graft_enrich_replay_${replaySeq.incrementAndGet()}"
    val farFuture = maxTs + 30L * 24 * 3600 * 1000
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try enrichedCounts(in.toDF(), dim, streamKey, dimKey, attr)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    try {
      in.addData(evs.toIndexedSeq :+
        Event(-1L, new Timestamp(farFuture), -1L, "__wm", 0.0))
      q.processAllAvailable()
      in.addData(Event(-2L, new Timestamp(farFuture + 3600 * 1000), -1L, "__wm", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    s.table(name)
  }

  /** Run [[windowedCounts]] over a FILE-SOURCE stream — the non-driver-fed
    * parity gate. Unlike the MemoryStream replays (driver-collected by
    * definition), nothing here touches the driver except the final result:
    *
    *  1. the events frame is STAGED as `numFiles` time-ordered parquet
    *     files (repartitionByRange on ts — a fully distributed write);
    *  2. the staged part files get strictly increasing modification times
    *     in part-file-name order (= ts-range order, since range partition
    *     0 holds the earliest range). The file source replays files in
    *     MTIME order, and the parallel write leaves them all with the same
    *     mtime — without the restamp, replay order is arbitrary and the
    *     watermark drops whole out-of-order files as late data. The
    *     restamp is a driver-side metadata touch on `numFiles` entries,
    *     not a data movement — in production the arrival order IS the
    *     mtime order, so this only recreates the unbounded shape;
    *  3. one far-future sentinel row is written as an extra file with the
    *     LARGEST mtime, so the watermark only passes the real data once
    *     all of it is in — the same end-of-stream flush the MemoryStream
    *     replays get from their sentinel events;
    *  4. `readStream.parquet` with `maxFilesPerTrigger = 1` replays the
    *     directory one file per micro-batch through the SAME
    *     [[windowedCounts]] operator.
    *
    * This is exactly the unbounded production shape (new files keep
    * arriving, each becomes a micro-batch); the gate differs only in the
    * directory being finite.
    */
  def windowedCountsFileStream(events: DataFrame, stageDir: String,
      window_ : String = "1 hour", watermark: String = "2 hours",
      numFiles: Int = 8): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val evs = events.select(col("event_id").cast("long"), col("ts"),
      col("user_id").cast("long"), col("event_type"), col("value").cast("double"))
    evs.repartitionByRange(numFiles, col("ts")).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(stageDir)
    val dir = new java.io.File(stageDir)
    def partFiles() = dir.listFiles().filter(_.getName.startsWith("part-"))
    val mainParts = partFiles().map(_.getName).toSet
    // driver sees ONE scalar (max ts) — needed to place the sentinel
    val maxTs = evs.agg(max(unix_millis(col("ts")))).head().getLong(0)
    val farFuture = new Timestamp(maxTs + 30L * 24 * 3600 * 1000)
    Seq(Event(-1L, farFuture, -1L, "__wm", 0.0)).toDS().toDF()
      .coalesce(1).write.mode("append").parquet(stageDir)
    // restamp mtimes: ascending in part-name order over the main files
    // (part-00000 = earliest ts range), sentinel strictly last
    val all = partFiles()
    val ordered = all.filter(f => mainParts(f.getName)).sortBy(_.getName) ++
      all.filterNot(f => mainParts(f.getName))
    val base = System.currentTimeMillis() - ordered.length * 2000L
    ordered.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(base + i * 2000L) }
    val name = s"graft_windows_file_${replaySeq.incrementAndGet()}"
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    // 4 state partitions: the q70 A/B's knee of the per-micro-batch
    // state-store open/commit vs parallelism curve (measured again here:
    // 12.5 s at 8 partitions, see MICROBENCH.md round-7 table)
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try {
        val src = s.readStream.schema(s.read.parquet(stageDir).schema)
          .option("maxFilesPerTrigger", "1").parquet(stageDir)
        windowedCounts(src, window_, watermark)
          .writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Append).start()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    try q.processAllAvailable() finally q.stop()
    s.table(name).filter(col("event_type") =!= "__wm")
  }

  /** Keyed interval join: pair each left row with the right rows of the
    * same key whose timestamp falls in (left.ts, left.ts + windowMs].
    * Works identically on batch frames and on two streams — for streams,
    * set watermarks on BOTH inputs first.
    *
    * The range is phrased DIRECTLY on the event-time columns
    * (`r.ts <= l.ts + INTERVAL ...`), not via unix_millis() arithmetic:
    * Spark's StreamingJoinHelper only extracts state watermarks from
    * interval comparisons it can recognize on the watermarked attributes.
    * With this phrasing stream-stream inner joins purge buffered state as
    * the watermark advances and stream-stream OUTER joins are accepted at
    * analysis (both asserted in StreamOpsSpec); with epoch-millis
    * arithmetic, inner-join state grows unboundedly and outer joins are
    * rejected.
    *
    * Execution is an equi-join on the key with the range as a residual
    * condition — shuffles on the key, never a cross product.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, windowMs: Long,
      joinType: String = "inner"): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rightTs") > col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $windowMs MILLISECONDS"),
      joinType)
  }

  /** Run [[intervalJoin]] as a REAL stream-stream join (two MemoryStreams,
    * watermarks on both sides) over a replay of a batch events frame and
    * return the joined (l_id, r_id) pairs — the streaming/batch parity gate
    * for the interval join, declared as a query whose oracle is the batch
    * SQL. `joinType = "left"` exercises the outer path: unmatched left rows
    * only emit once the watermark clears their join window, so batch 2
    * ships a far-future sentinel on BOTH sides (filtered back out by its
    * reserved negative user id).
    */
  def intervalJoinReplay(events: DataFrame, windowMs: Long,
      joinType: String = "left"): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val evs = events
      .select(col("event_id").cast("long"), col("ts"), col("user_id").cast("long"),
        col("event_type"), col("value").cast("double"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    require(evs.nonEmpty, "intervalJoinReplay needs at least one event")
    val maxTs = evs.iterator.map(_.ts.getTime).max
    val inL = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val inR = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val name = s"graft_ivj_replay_${replaySeq.incrementAndGet()}"
    def prep(df: DataFrame, side: String) = df
      .select(col("event_id").as(s"${side}_id"), col("user_id"),
        col("ts").as(s"${side}_ts"))
      .withWatermark(s"${side}_ts", "10 minutes")
    // few state partitions, like the other replays: per-microbatch state
    // store open/commit overhead beats join parallelism at replay scale
    // (sf0.1 events, calm-host min-of-3: 2 parts 6.3s, 4 parts 5.9s,
    // 8 parts 7.0s, 32 parts ≈ 18s — 4 is the knee)
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try intervalJoin(prep(inL.toDF(), "l"), prep(inR.toDF(), "r"),
          "user_id", "l_ts", "r_ts", windowMs, joinType)
        .select(col("l.l_id"), col("l.user_id"), col("r.r_id"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    try {
      inL.addData(evs.toIndexedSeq); inR.addData(evs.toIndexedSeq)
      q.processAllAvailable()
      val sentinel = Event(-1L, new Timestamp(maxTs + 100 * windowMs + 3600_000L),
        -1L, "__wm", 0.0)
      inL.addData(sentinel); inR.addData(sentinel)
      q.processAllAvailable()
    } finally q.stop()
    s.table(name).filter(col("user_id") >= 0).select("l_id", "r_id")
  }

  /** Streaming exact deduplication: keep the first event per key within the
    * watermark horizon. `dropDuplicatesWithinWatermark` keeps per-key state
    * only until the watermark passes it — bounded state at any scale, the
    * streaming twin of the batch digest dedup (ops/Dedup.exact).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Run [[dedupStream]] over a MemoryStream replay of a batch events frame
    * and return the surviving DISTINCT KEY set (key columns only: which
    * representative row survives is arrival-order-dependent in a stream, the
    * key set is not). Parity gate: oracle = batch SELECT DISTINCT.
    */
  def dedupStreamReplay(events: DataFrame, keyCols: Seq[String]): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val evs = events
      .select(col("event_id").cast("long"), col("ts"), col("user_id").cast("long"),
        col("event_type"), col("value").cast("double"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    require(evs.nonEmpty, "dedupStreamReplay needs at least one event")
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val name = s"graft_dedup_replay_${replaySeq.incrementAndGet()}"
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try dedupStream(in.toDF(), keyCols)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    try {
      in.addData(evs.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    s.table(name).select(keyCols.map(col): _*).distinct()
  }

  /** Streaming Count-Min sketch build — [[graft.ops.Sketch.countMin]]
    * over an unbounded stream: the same explode + (row, col) aggregation
    * in COMPLETE output mode. The aggregation state is the sketch itself
    * — at most d·w integer counters regardless of stream length or key
    * cardinality — so the sketch's fixed-memory guarantee carries
    * directly into the state store (the SIXTH streaming/batch parity
    * family, and the only one whose state is bounded by construction
    * rather than by a watermark).
    */
  def countMinStream(events: DataFrame, keyCol: String, width: Int,
      depth: Int): DataFrame =
    graft.ops.Sketch.countMin(events, keyCol, width, depth)

  /** Run [[countMinStream]] over a MemoryStream replay of a batch events
    * frame (keyed on user_id) — parity gate: the final complete-mode
    * emission must equal the batch sketch cell-for-cell (exact integer
    * counters, hash equality).
    */
  def countMinStreamReplay(events: DataFrame, width: Int,
      depth: Int): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val evs = events
      .select(col("event_id").cast("long"), col("ts"), col("user_id").cast("long"),
        col("event_type"), col("value").cast("double"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    require(evs.nonEmpty, "countMinStreamReplay needs at least one event")
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val name = s"graft_cms_replay_${replaySeq.incrementAndGet()}"
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try countMinStream(in.toDF(), "user_id", width, depth)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete).start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    try {
      // two chunks: the second trigger must UPDATE the same bounded cell
      // state, not append — complete mode re-emits the whole sketch
      val (a, b) = evs.splitAt(evs.length / 2)
      in.addData(a.toIndexedSeq)
      q.processAllAvailable()
      in.addData(b.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    s.table(name)
  }

  /** STREAMING HyperLogLog — the NINTH streaming/batch parity family:
    * live distinct-count tracking in ≤ 2^p rows of state regardless of
    * stream length (register state only ever takes cell-wise max — the
    * mergeable-sketch property IS the streaming-update rule). Exact
    * integer registers make the streamed table, and therefore the
    * estimate, equal the batch [[graft.ops.Sketch.hllRegisters]] bit
    * for bit.
    */
  def hllStream(events: DataFrame, keyCol: String, p: Int): DataFrame =
    graft.ops.Sketch.hllRegisters(events, keyCol, p)

  /** Run [[hllStream]] over a MemoryStream replay of a batch events
    * frame (keyed on user_id) — parity gate: the final complete-mode
    * register emission must equal the batch table cell-for-cell.
    */
  def hllStreamReplay(events: DataFrame, p: Int): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val evs = events
      .select(col("event_id").cast("long"), col("ts"),
        col("user_id").cast("long"), col("event_type"),
        col("value").cast("double"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    require(evs.nonEmpty, "hllStreamReplay needs at least one event")
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val name = s"graft_hll_replay_${replaySeq.incrementAndGet()}"
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try hllStream(in.toDF(), "user_id", p)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete).start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    try {
      // two chunks: the second trigger must take cell-wise max against
      // the bounded register state — complete mode re-emits the table
      val (a, b) = evs.splitAt(evs.length / 2)
      in.addData(a.toIndexedSeq)
      q.processAllAvailable()
      in.addData(b.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    s.table(name)
  }

  /** STREAMING PSI drift monitor — the EIGHTH streaming/batch parity
    * family: live population-stability tracking of a value column
    * against a frozen reference. The streaming half is ONE complete-mode
    * aggregation whose state is the bin-count table (≤ cuts+2 rows
    * regardless of stream length — bounded by construction, like the
    * Count-Min family); each trigger re-emits the counts and the PSI
    * readout is a constant-size batch computation over them
    * ([[graft.ops.Drift.psiOfCounts]] against the broadcast reference).
    */
  def psiStream(cur: DataFrame, valueCol: String,
      cuts: Seq[Double]): DataFrame =
    graft.ops.Drift.binCounts(cur, valueCol, cuts)

  /** Run [[psiStream]] over a MemoryStream replay of the CURRENT side
    * and compute PSI against the batch reference — parity gate: exact
    * integer bin counts make the streamed PSI equal the batch
    * [[graft.ops.Drift.psi]] bit for bit.
    */
  def psiStreamReplay(ref: DataFrame, curEvents: DataFrame,
      valueCol: String, cuts: Seq[Double]): DataFrame = {
    val s = curEvents.sparkSession
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val evs = curEvents
      .select(col("event_id").cast("long"), col("ts"),
        col("user_id").cast("long"), col("event_type"),
        col(valueCol).cast("double").as("value"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    require(evs.nonEmpty, "psiStreamReplay needs at least one event")
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val name = s"graft_psi_replay_${replaySeq.incrementAndGet()}"
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try psiStream(in.toDF(), "value", cuts)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete).start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    try {
      // two chunks: the second trigger must UPDATE the bounded bin
      // state in place — complete mode re-emits the whole count table
      val (a, b) = evs.splitAt(evs.length / 2)
      in.addData(a.toIndexedSeq)
      q.processAllAvailable()
      in.addData(b.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    graft.ops.Drift.psiOfCounts(
      graft.ops.Drift.binCounts(ref, valueCol, cuts), s.table(name))
  }

  /** Per-user funnel progress emitted at stream end. */
  case class FunnelHit(user_id: Long, n_steps: Int)
  // public: Spark's state-store encoder instantiates it reflectively.
  // nextIdx == -1 is the post-emission TOMBSTONE: the user has already
  // produced their FunnelHit; later stragglers must not restart the
  // funnel and double-count them. The tombstone expires tombstoneMs
  // after the last straggler (state stays bounded); a user silent past
  // that window counts as a NEW journey by design.
  case class FunnelProgress(nextIdx: Int, lastTsUs: Long)

  /** STREAMING conversion funnel — the seventh streaming/batch parity
    * family: per-user greedy first-touch step matching as
    * flatMapGroupsWithState custom state (O(1) per user: the next
    * expected step index + the last matched timestamp), emitting each
    * user's reached-step count when the watermark passes their horizon.
    * Semantics mirror [[graft.ops.EventSeq.funnel]] exactly: events
    * processed in (ts, event_type) order, a step matches only STRICTLY
    * after the previously matched one.
    */
  def funnelSteps(events: Dataset[Event], steps: Seq[String],
      quietMs: Long = 60000L,
      tombstoneMs: Long = 86400000L): Dataset[FunnelHit] = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(tombstoneMs >= quietMs,
      s"tombstoneMs ($tombstoneMs) must cover at least one quiet period " +
        s"($quietMs) or post-emission stragglers restart the funnel")
    import events.sparkSession.implicits._
    val stepSet = steps.toSet
    def micros(t: Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    events
      .withWatermark("ts", "1 second")
      .filter(e => stepSet.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, FunnelHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[FunnelProgress]) =>
          if (state.hasTimedOut) {
            val s = state.get
            if (s.nextIdx >= 0) {
              // live → emit once, then tombstone for tombstoneMs (a day
              // by default) so stragglers can't restart the funnel; a
              // user silent past that window is BY DESIGN a new journey
              // — the bounded alternative to an everlasting state leak
              state.update(FunnelProgress(-1, s.lastTsUs))
              state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + tombstoneMs)
              Iterator.single(FunnelHit(uid, s.nextIdx))
            } else {
              state.remove() // tombstone expired quietly
              Iterator.empty
            }
          } else {
            // (ts, event_type) order — array_sort's struct order in the
            // batch walk; strictly-after matching via the micros compare
            val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_type))
            var s = state.getOption.getOrElse(FunnelProgress(0, Long.MinValue))
            if (s.nextIdx >= 0) {
              sorted.foreach { e =>
                val t = micros(e.ts)
                if (s.nextIdx < steps.length &&
                    e.event_type == steps(s.nextIdx) &&
                    (s.nextIdx == 0 || t > s.lastTsUs))
                  s = FunnelProgress(s.nextIdx + 1, t)
              }
              state.update(s)
            } // tombstoned: swallow stragglers, just refresh the horizon
            state.setTimeoutTimestamp(sorted.last.ts.getTime +
              (if (s.nextIdx < 0) tombstoneMs else quietMs))
            Iterator.empty
          }
      }
  }

  /** Run [[funnelSteps]] over a MemoryStream replay of a batch events
    * frame and roll the per-user hits up to the SAME step table as the
    * batch [[graft.ops.EventSeq.funnel]] — parity gate with q113's
    * oracle. Same two-batch sentinel mechanics as [[sessionizeReplay]].
    */
  def funnelStepsReplay(events: DataFrame,
      steps: Seq[String]): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val evs = events
      .select(col("event_id").cast("long"), col("ts"), col("user_id").cast("long"),
        col("event_type"), col("value").cast("double"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    require(evs.nonEmpty, "funnelStepsReplay needs at least one event")
    val maxTs = evs.iterator.map(_.ts.getTime).max
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val name = s"graft_funnel_replay_${replaySeq.incrementAndGet()}"
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try funnelSteps(in.toDS(), steps)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    try {
      // the sentinel carries the FIRST step type so it passes the filter
      // and advances the watermark; its reserved negative user is dropped
      in.addData(evs.toIndexedSeq :+
        Event(-1L, new Timestamp(maxTs + 86400000L), -1L, steps.head, 0.0))
      q.processAllAvailable()
      in.addData(Event(-2L, new Timestamp(maxTs + 2 * 86400000L), -1L,
        steps.head, 0.0))
      q.processAllAvailable()
    } finally q.stop()
    graft.ops.EventSeq.stepTable(
      s.table(name).filter(col("user_id") >= 0).select("n_steps"), steps)
  }

  /** The [[parquetSink]] foreachBatch body, factored out so the spec can
    * invoke it directly with an already-seen batch id — the crash-replay
    * path — and assert idempotence without having to kill a JVM mid-commit.
    */
  private[streaming] def writeBatch(path: String)(batch: Dataset[Row],
      batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$path/batch_id=$batchId")

  /** Parquet file sink via `foreachBatch` with RESTART-IDEMPOTENT writes —
    * the production sink shape for any pipeline in this package:
    *
    * {{{
    * val q = StreamOps.parquetSink(windowedCounts(readStreamDf), out, cp)
    * }}}
    *
    * Each micro-batch lands in its own `batch_id=<id>` directory with
    * overwrite mode. Progress is tracked in `checkpointLocation`; if the
    * query dies BETWEEN writing a batch and committing its offsets, the
    * restarted query re-executes the SAME batch id and the overwrite
    * replaces the partial output instead of appending a duplicate —
    * exactly-once output under at-least-once replay, the standard
    * foreachBatch idempotence contract. Downstream just reads
    * `spark.read.parquet(path)` (batch_id surfaces as a partition column).
    *
    * Scale notes: one directory per micro-batch keeps the commit a cheap
    * directory swap (no global file-list rewrite); compaction of many
    * small batch directories is an offline concern, not the sink's.
    */
  def parquetSink(stream: DataFrame, path: String,
      checkpointLocation: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointLocation)
      .outputMode(OutputMode.Append)
      .foreachBatch(writeBatch(path) _)
      .start()

  /** Batch analog of [[sessionize]] (for oracle checks): session boundaries
    * via a lag-window gap flag + running session index — same semantics,
    * expressible in ANSI SQL.
    */
  def sessionizeBatch(events: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val flagged = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_millis(col("ts")) - unix_millis(col("prev_ts"))) > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy("user_id", "session_idx")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"), sum("value").as("total_value"))
  }
}
