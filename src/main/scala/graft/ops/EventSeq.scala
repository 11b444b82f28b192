package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-event analytics: the funnel / retention / transition triad every
  * event-stream warehouse ships. All three shuffle only small keyed rows —
  * (user, ts, type) tuples or (cohort, bucket) pairs — never payloads, and
  * the per-user sequence logic runs as higher-order array expressions
  * inside whole-stage codegen, not as driver loops or UDFs.
  */
object EventSeq {

  /** Ordered conversion funnel. A user "reaches" step i when the steps
    * occur in order: the walk takes the user's funnel-relevant events in
    * timestamp order and greedily fills step i with the first event of
    * `steps(i)` strictly after the step-(i−1) timestamp. This greedy
    * semantics equals the classic SQL chain
    * `tᵢ = min(ts) where type = stepᵢ and ts > tᵢ₋₁` — the first match is
    * the earliest possible one — which is exactly what the oracle computes.
    *
    * Execution: one filter to the step types (scan prunes to three
    * columns), ONE shuffle grouping those events per user into a
    * time-sorted array, then a codegen'd `aggregate` HOF walks each array.
    * The array holds only this user's FUNNEL events (not all activity) —
    * bounded in any real funnel; for a pathological user the row grows, so
    * cap upstream if a single user can emit millions of step events.
    * The per-step rollup then reduces to k rows on a frame of |users|.
    *
    * @return one row per step: (step_no, step, users, frac_first,
    *         frac_prev), fractions rounded to 6 digits; step 1 has both
    *         fractions 1.0 (or 0 users ⇒ null fractions downstream are
    *         avoided by emitting 1.0 only when users > 0 is irrelevant —
    *         fractions are computed from counts, 0/0 guarded to 0.0).
    */
  /** The greedy walk shared by [[funnel]] and [[funnelLatency]]: one row
    * per user with `steps` = the timestamps of the funnel steps reached,
    * in order (size < k when the user fell out early).
    */
  private def walkSteps(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      maxGapUs: Long = Long.MaxValue): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(maxGapUs > 0, "maxGapUs must be positive")
    val k = steps.length
    val stepsArr = array(steps.map(lit): _*)
    df.filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).as("user"),
        struct(col(tsCol).as("ts"), col(typeCol).as("etype")).as("ev"))
      .groupBy("user")
      .agg(array_sort(collect_list("ev")).as("evs"))
      // greedy walk: acc = timestamps of the steps filled so far
      .withColumn("steps", aggregate(
        col("evs"),
        expr("CAST(array() AS ARRAY<TIMESTAMP>)"),
        (acc, e) => {
          val nf = size(acc)
          // try_element_at: null (not an ANSI error) when nf is out of
          // range; the null comparison then resolves the guard correctly
          // (null-equality is false; `nf === 0 || ts > null` is true at 0)
          // the gap guard subtracts micros (no ts+gap overflow) and is
          // vacuous at the Long.MaxValue default
          val prev = try_element_at(acc, lit(-1))
          val ok = (nf < k) &&
            (e.getField("etype") === try_element_at(stepsArr, nf + 1)) &&
            (nf === 0 || (e.getField("ts") > prev &&
              unix_micros(e.getField("ts")) - unix_micros(prev) <= maxGapUs))
          when(ok, concat(acc, array(e.getField("ts")))).otherwise(acc)
        }))
      .drop("evs")
  }

  def funnel(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]): DataFrame =
    funnelWindowed(df, userCol, typeCol, tsCol, steps, Long.MaxValue)

  /** [[funnel]] with a per-transition time budget: a step only matches
    * within `maxGapUs` microseconds of the previously matched step (the
    * "converted within 24 h of landing" semantics). The anchor is the
    * greedy one — the user's FIRST step-1 event — the first-touch
    * attribution convention; a later anchor that would have converted is
    * not searched.
    */
  def funnelWindowed(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], maxGapUs: Long): DataFrame =
    stepTable(
      walkSteps(df, userCol, typeCol, tsCol, steps, maxGapUs)
        .withColumn("n_steps", size(col("steps"))),
      steps)

  /** Funnel step table from a per-user reached-step-count frame (one row
    * per user carrying `n_steps`) — shared by the batch walk above and
    * the streaming per-user state fold (StreamOps.funnelStepsReplay).
    */
  private[graft] def stepTable(perUser: DataFrame,
      steps: Seq[String]): DataFrame = {
    // |users| rows → k+1 count rows → k step rows (all tiny frames)
    val byN = perUser.groupBy("n_steps").agg(count(lit(1)).as("cnt"))
    val stepFrame = perUser.sparkSession.createDataFrame(
      steps.zipWithIndex.map { case (s, i) => (i + 1, s) }
    ).toDF("step_no", "step")
    val reached = stepFrame
      .join(byN, byN("n_steps") >= stepFrame("step_no"), "left")
      .groupBy("step_no", "step")
      .agg(coalesce(sum("cnt"), lit(0L)).as("users"))
    val w = Window.orderBy("step_no")
    reached
      .withColumn("frac_first", round(
        when(first("users").over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)) === 0, 0.0)
          .otherwise(col("users").cast("double") /
            first("users").over(w.rowsBetween(Window.unboundedPreceding,
              Window.currentRow))), 6))
      .withColumn("frac_prev", round(
        when(coalesce(lag("users", 1).over(w), col("users")) === 0, 0.0)
          .otherwise(col("users").cast("double") /
            coalesce(lag("users", 1).over(w), col("users"))), 6))
  }

  /** Per-transition funnel latency: for each consecutive step pair
    * (i → i+1), over the users who reached step i+1, the count and the
    * average seconds between the two step timestamps the greedy walk
    * matched. Same single-shuffle walk as [[funnel]]; the latency rollup
    * aggregates exact microsecond differences (integral sums — no
    * floating-point accumulation-order drift) and divides once at the end.
    *
    * @return (from_step, to_step, n_users, avg_secs) with avg_secs
    *         rounded to 6 digits; transitions nobody completed are
    *         omitted (no 0/0 rows)
    */
  def funnelLatency(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    val walked = walkSteps(df, userCol, typeCol, tsCol, steps)
    // guard: Spark's sequence(1, 0) counts DOWN ([1, 0]) — a one-step user
    // must not reach the transform at all
    val spans = walked.filter(size(col("steps")) >= 2).select(explode(expr(
      // (i, µs gap) pairs for each completed transition of this user
      """transform(sequence(1, size(steps) - 1),
        |  i -> struct(i AS i,
        |    unix_micros(steps[i]) - unix_micros(steps[i - 1]) AS gap_us))
        |""".stripMargin)).as("t"))
      .select(col("t.i").as("i"), col("t.gap_us").as("gap_us"))
    spans.groupBy("i")
      .agg(count(lit(1)).as("n_users"),
        round(sum("gap_us").cast("double") / count(lit(1)) / 1e6, 6)
          .as("avg_secs"))
      .select(
        element_at(array(steps.map(lit): _*), col("i")).as("from_step"),
        element_at(array(steps.map(lit): _*), col("i") + 1).as("to_step"),
        col("i").cast("int").as("step_no"), col("n_users"), col("avg_secs"))
  }

  /** Cohort retention: cohort = the calendar bucket of each user's first
    * event; for every (cohort, bucket-offset) pair count the users active
    * in that bucket and divide by the cohort's size (its offset-0 count —
    * every user is active in their first bucket by construction).
    *
    * Execution: distinct (user, bucket) — one shuffle carrying 16-byte
    * pairs; first-bucket per user reuses the same hash partitioning (the
    * exchange is reusable since user is a prefix of the distinct key);
    * the activity join is keyed on user; the final rollup and the
    * cohort-size join run on |cohorts × offsets| rows.
    *
    * @param unit calendar unit for `date_trunc` ("week", "month", "day")
    * @return (cohort, offset, active_users, retention) where offset counts
    *         whole units from the cohort bucket and retention is rounded
    *         to 6 digits
    */
  def retention(df: DataFrame, userCol: String, tsCol: String,
      unit: String = "week"): DataFrame = {
    val allowed = Set("day", "week", "month")
    require(allowed(unit.toLowerCase), s"unit must be one of $allowed")
    val uw = df.select(col(userCol).as("user"),
      date_trunc(unit, col(tsCol)).as("bucket")).distinct()
    val firsts = uw.groupBy("user").agg(min("bucket").as("cohort"))
    val offset = unit.toLowerCase match {
      case "day"   => datediff(col("bucket"), col("cohort"))
      case "week"  => (datediff(col("bucket"), col("cohort")) / 7).cast("int")
      case "month" => months_between(col("bucket"), col("cohort")).cast("int")
    }
    val active = uw.join(firsts, "user")
      .groupBy(col("cohort"), offset.as("offset"))
      .agg(count(lit(1)).as("active_users"))
    val sizes = active.filter(col("offset") === 0)
      .select(col("cohort"), col("active_users").as("__size"))
    active.join(sizes, "cohort")
      .withColumn("retention",
        round(col("active_users").cast("double") / col("__size"), 6))
      .drop("__size")
  }

  /** First-order transition matrix between event types: per user, order
    * events by (ts, tie-breaker) and count (previous type → type) steps;
    * `prob` normalizes each previous-type row to 1.
    *
    * Execution: one per-user window sort (the only payload shuffled is
    * (user, ts, tiebreak, type)), one (prev, next) aggregation, and the
    * normalization window runs over the |types|² frame. The tie-breaker
    * column makes the ordering — and therefore the result — deterministic
    * when timestamps collide; pass the event id.
    */
  def transitions(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieBreakCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieBreakCol))
    val pairs = df
      .select(col(userCol), col(tsCol), col(tieBreakCol),
        col(typeCol).as("next"))
      .withColumn("prev", lag("next", 1).over(w))
      .filter(col("prev").isNotNull)
    val counts = pairs.groupBy("prev", "next").agg(count(lit(1)).as("n"))
    counts.withColumn("prob",
      round(col("n").cast("double") /
        sum("n").over(Window.partitionBy("prev")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)), 6))
  }

  /** Most common event paths: each user's first `maxLen` event types in
    * time order, joined with "&gt;", counted across users, top-k by
    * frequency — "how do sessions actually start", the product-analytics
    * path view.
    *
    * One (user) aggregation collects each user's ordered head (the
    * struct sort key is (ts, tiebreak), so colliding timestamps order
    * deterministically); the path frame is user-count-sized and the
    * top-k plans as TakeOrdered. Ties in frequency break on the path
    * string, so the cut is engine-stable.
    *
    * @return (path, n_users) ordered by (n_users desc, path), top `topK`
    */
  def topPaths(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieBreakCol: String, maxLen: Int,
      topK: Int): DataFrame = {
    require(maxLen >= 1 && topK >= 1, "maxLen and topK must be >= 1")
    val paths = df
      .select(col(userCol).as("user"),
        struct(col(tsCol).as("ts"), col(tieBreakCol).as("tb"),
          col(typeCol).as("etype")).as("ev"))
      .groupBy("user")
      .agg(array_join(
        transform(slice(array_sort(collect_list("ev")), 1, maxLen),
          e => e.getField("etype")), ">").as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(topK)
  }

  /** Per-entity inter-arrival statistics: event count, activity span,
    * and the mean/max gap between consecutive events — the engagement-
    * cadence profile (bot detection: sub-second mean gaps; churn risk:
    * a max gap dwarfing the mean).
    *
    * ONE keyed window shuffle ordered by (ts, tiebreak); every duration
    * sums exact epoch microseconds (integral — no float accumulation
    * order), divided once at the end.
    *
    * @param tieBreakCol unique-per-key column (event id) so colliding
    *                    timestamps order deterministically
    * @return (user, n_events, span_secs, avg_gap_secs, max_gap_secs) —
    *         gap columns null for single-event users, seconds on a
    *         6-digit grid
    */
  def interEventStats(df: DataFrame, userCol: String, tsCol: String,
      tieBreakCol: String): DataFrame = {
    val w = Window.partitionBy(userCol)
      .orderBy(unix_micros(col(tsCol)), col(tieBreakCol))
    val gapped = df
      .withColumn("__gap",
        unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w))
    gapped.groupBy(col(userCol).as("user"))
      .agg(count(lit(1)).as("n_events"),
        round((max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol))))
          .cast("double") / 1e6, 6).as("span_secs"),
        round(sum("__gap").cast("double") / count("__gap") / 1e6, 6)
          .as("avg_gap_secs"),
        round(max("__gap").cast("double") / 1e6, 6).as("max_gap_secs"))
  }

  /** [[rollingActive]]'s sketch twin — the 100 TB path: one PORTABLE
    * HLL register table per day ([[Sketch.hllCoords]], ≤ 2^p cells
    * regardless of user cardinality), trailing windows as register
    * UNIONS (cell-wise max) over the day × register frame. The data is
    * scanned once and reduced to |days| × ≤ 2^p rows immediately; the
    * contribution explosion that makes the exact op shuffle (user, day)
    * × windowDays pairs here explodes only the bounded register frame.
    * Estimate error ~1.6% at the default p = 12. The md5-derived
    * registers and exact-integer-scaled readout replay bit-for-bit in
    * ANSI SQL (unlike the opaque `hll_sketch_agg` this replaced), so
    * the op carries a full hash-equality oracle (q197).
    *
    * @return (day, active_users_approx) — the rounded readout as a long
    */
  def rollingActiveApprox(df: DataFrame, userCol: String, tsCol: String,
      windowDays: Int, p: Int = 12): DataFrame = {
    require(windowDays >= 1, s"need windowDays >= 1, got $windowDays")
    require(p >= 4 && p <= 14, s"need 4 <= p <= 14, got $p")
    val scale = 61 - p
    val (bucket, rho) = Sketch.hllCoords(col(userCol), p)
    val daily = df.filter(col(userCol).isNotNull)
      .select(date_trunc("day", col(tsCol)).as("day"),
        bucket.as("__bucket"), rho.as("__rho"))
      .groupBy("day", "__bucket").agg(max("__rho").as("__r"))
    val bounds = daily.agg(max("day").as("__mx"))
    val rolled = daily.crossJoin(broadcast(bounds))
      .select(col("__bucket"), col("__r"),
        explode(sequence(col("day"),
          least(col("__mx"),
            col("day") + expr(s"INTERVAL ${windowDays - 1} DAY")),
          expr("INTERVAL 1 DAY"))).as("day"))
      .groupBy("day", "__bucket").agg(max("__r").as("__r"))
    rolled.groupBy("day")
      .agg(count(lit(1)).as("__occ"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $scale - __r)"))
          .as("__s_occ"))
      .select(col("day"),
        floor(Sketch.hllReadout(col("__occ"), col("__s_occ"), p) +
          lit(0.5)).cast("long").as("active_users_approx"))
  }

  /** Rolling active users (DAU/WAU/MAU family): for every calendar day in
    * the data's span, how many distinct users acted in the trailing
    * `windowDays` window ending that day.
    *
    * Sliding COUNT(DISTINCT) has no window-function form; the scalable
    * shape is contribution explosion on the REDUCED frame: distinct
    * (user, day) pairs (the only data-sized shuffle), each exploded to
    * the ≤`windowDays` report days it funds, deduplicated per (user,
    * report day) — a user active on several days of one window still
    * counts once — and counted per day. Every stage shuffles (user, day)
    * pairs; nothing is user-count × day-count sized. Report days past
    * the data's max day are cut by a broadcast one-row bound.
    *
    * @return (day, active_users) for every day in min..max whose trailing
    *         window saw any activity (a quiet day still reports if its
    *         window reaches back to an active one; a day whose whole
    *         window is empty is absent)
    */
  def rollingActive(df: DataFrame, userCol: String, tsCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"need windowDays >= 1, got $windowDays")
    val userDays = df.select(col(userCol).as("user"),
      date_trunc("day", col(tsCol)).as("day")).distinct()
    val bounds = userDays.agg(min("day").as("__mn"), max("day").as("__mx"))
    userDays
      .crossJoin(broadcast(bounds))
      .select(col("user"),
        explode(sequence(col("day"),
          least(col("__mx"),
            col("day") + expr(s"INTERVAL ${windowDays - 1} DAY")),
          expr("INTERVAL 1 DAY"))).as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("active_users"))
  }

  /** Rayleigh test of diurnal concentration — circular statistics over
    * the time-of-day circle (Mardia & Jupp 2000): is event timing
    * CONCENTRATED around some hour, or uniform through the day? The
    * event-cadence profile's missing direction: [[interArrival]] sees
    * gaps, this sees phase.
    *
    *   θ_i = 2π·(seconds of day)/86400,
    *   R̄ = |Σ e^{iθ}|/n,  z = n·R̄²,  p ≈ e^{−z} (first-order)
    *
    * Per-row cos/sin MICRO-quantize before the sums (the exact-long
    * discipline: the sums are order-free on any partitioning; a last-ulp
    * libm difference only matters within 10⁻¹⁰ of a grid boundary), so
    * the one aggregation is exact and R̄/z/p are pinned float
    * expressions.
    *
    * @return one row: (n, r_bar, rayleigh_z, p_approx) — 6-digit grid;
    *         r_bar 1 = perfectly phase-locked, 0 = uniform
    */
  def rayleighTest(df: DataFrame, tsCol: String): DataFrame = {
    val sod = (unix_micros(col(tsCol)) % 86400000000L).cast("double")
    val theta = sod / lit(86400000000.0) * lit(6.283185307179586)
    val agg = df.filter(col(tsCol).isNotNull)
      .select(round(cos(theta) * 1e6).cast("long").as("__c"),
        round(sin(theta) * 1e6).cast("long").as("__s"))
      .agg(count(lit(1)).as("n"), sum("__c").as("__sc"),
        sum("__s").as("__ss"))
    val nD = col("n").cast("double")
    val rBar = sqrt(col("__sc").cast("double") * col("__sc").cast("double")
      + col("__ss").cast("double") * col("__ss").cast("double")) /
      (nD * 1e6)
    val z = nD * rBar * rBar
    agg.select(col("n"),
      round(when(col("n") > 0, rBar), 6).as("r_bar"),
      round(when(col("n") > 0, z), 6).as("rayleigh_z"),
      round(when(col("n") > 0, exp(-z)), 6).as("p_approx"))
  }

  /** Multi-touch marketing attribution: credit each conversion's
    * preceding touches under the three standard models at once —
    * first-touch (1 to the earliest touch), last-touch (1 to the latest),
    * and linear (1/k to each of the k touches).
    *
    * A touch qualifies for a conversion when it STRICTLY precedes it and
    * falls within `lookbackUs` microseconds; a touch that qualifies for
    * several conversions is credited only to its EARLIEST one (the
    * standard no-double-counting rule). Conversion events themselves are
    * never touches.
    *
    * Execution: one user-keyed equi-join between the touch and conversion
    * frames with the time-range predicate (pair volume is bounded by the
    * lookback window, the interval-join discipline), one (touch)-keyed
    * min to resolve multi-qualification, one per-conversion window for
    * rank/size (conversion-sized partitions), and ONE final (type)
    * aggregation carrying all three models. First/last ties break on the
    * (ts, id) total order — deterministic and engine-reproducible.
    *
    * @param idCol      unique event id (the tiebreak that totalizes the
    *                   within-conversion order)
    * @param convType   the `typeCol` value that marks a conversion
    * @param lookbackUs attribution window in microseconds
    * @return per touch type: (event_type, first_touch, last_touch,
    *         linear) — counts are exact longs; linear is a 6-digit-grid
    *         double (a sum of 1/k terms)
    */
  def attribution(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, convType: String,
      lookbackUs: Long): DataFrame = {
    require(lookbackUs > 0, "lookbackUs must be positive")
    val touches = df.filter(col(typeCol) =!= convType)
      .select(col(userCol).as("u"), col(typeCol).as("etype"),
        unix_micros(col(tsCol)).as("t_us"), col(idCol).as("id"))
    val convs = df.filter(col(typeCol) === convType)
      .select(col(userCol).as("u"), unix_micros(col(tsCol)).as("c_us"))
      .distinct()
    val pairs = touches.join(convs, Seq("u"))
      .filter(col("c_us") > col("t_us") &&
        col("c_us") - col("t_us") <= lookbackUs)
    // each touch → its earliest qualifying conversion
    val owned = pairs.groupBy("u", "etype", "t_us", "id")
      .agg(min("c_us").as("c_us"))
    val wConv = Window.partitionBy("u", "c_us")
      .orderBy(col("t_us"), col("id"))
    val ranked = owned
      .withColumn("__rn", row_number().over(wConv))
      .withColumn("__k", count(lit(1)).over(
        Window.partitionBy("u", "c_us")))
    ranked.groupBy(col("etype").as("event_type"))
      .agg(sum(when(col("__rn") === 1, 1L).otherwise(0L)).as("first_touch"),
        sum(when(col("__rn") === col("__k"), 1L).otherwise(0L))
          .as("last_touch"),
        round(sum(lit(1.0) / col("__k")), 6).as("linear"))
  }

  /** Markov-chain multi-touch attribution with removal effects (the
    * data-driven alternative to [[attribution]]'s positional rules):
    * journeys become a first-order chain over channel states plus
    * `__start` / absorbing `__conv` / `__null`; a channel's credit is its
    * REMOVAL EFFECT — how much the chain's conversion probability drops
    * when the channel is knocked out (its inbound edges redirected to
    * `__null`, outbound dropped) — normalized over channels.
    *
    * Journey semantics (mirrored exactly by the oracle): per user, touch
    * events strictly before the first `convType` event under the
    * (ts, id) total order, in that order; consecutive repeats kept;
    * users with no touches still contribute `__start` → end mass.
    *
    * Execution: ONE keyed collapse builds the transition counts; exact
    * count ratios give the probabilities. The chain itself is
    * MODEL-SIZED by construction — at most (|touchTypes| + 3)² states ×
    * (|touchTypes| + 1) removal variants, bounded by the caller's
    * explicit channel list no matter the corpus size — so the `rounds`
    * absorbing-chain steps replay on the DRIVER over the collected
    * matrix (r14; guide §1.2: the data-sized collapse stays distributed,
    * the ≤ a-few-hundred-doubles iteration stops paying a join + shuffle
    * + checkpoint per round). Masses are quantized to the 1e-12 grid per
    * round (floor(x·1e12 + 0.5)), summation in sorted-source order, so
    * the fixed-round chain replays across engines exactly as the
    * distributed form did.
    *
    * @return one row per channel: (channel, p_conv — the base chain's
    *         conversion probability, removal_effect, attribution), both
    *         rounded to 6 digits, attribution normalized over channels
    */
  def markovAttribution(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, touchTypes: Seq[String],
      convType: String, rounds: Int = 12): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(convType),
      "convType must not be a touch type")
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    val spark = df.sparkSession
    val ev = df
      .filter(col(typeCol).isin((touchTypes :+ convType): _*))
      .select(col(userCol).as("u"), col(typeCol).as("et"),
        struct(col(tsCol), col(idCol)).as("ord"))
    val conv = ev.filter(col("et") === convType)
      .groupBy("u").agg(min("ord").as("cord"))
    val touches = ev.filter(col("et") =!= convType)
      .join(conv, Seq("u"), "left")
      .filter(col("cord").isNull || col("ord") < col("cord"))
    val wSeq = Window.partitionBy("u").orderBy("ord")
    val seq0 = touches
      .withColumn("pos", row_number().over(wSeq))
      .withColumn("nxt", lead(col("et"), 1).over(wSeq))
    val endOf = when(col("cord").isNotNull, lit("__conv"))
      .otherwise(lit("__null"))
    val users = ev.select("u").distinct().join(conv, Seq("u"), "left")
    val touchless = users.join(touches.select("u").distinct(),
      Seq("u"), "left_anti")
    val edges = seq0.filter(col("pos") === 1)
        .select(lit("__start").as("src"), col("et").as("dst"))
      .unionByName(seq0.filter(col("nxt").isNotNull)
        .select(col("et").as("src"), col("nxt").as("dst")))
      .unionByName(seq0.filter(col("nxt").isNull)
        .select(col("et").as("src"), endOf.as("dst")))
      .unionByName(touchless
        .select(lit("__start").as("src"), endOf.as("dst")))
    val counts = edges.groupBy("src", "dst").agg(count(lit(1)).as("n"))
    val outTot = counts.groupBy("src").agg(sum("n").as("nt"))
    val trans = counts.join(outTot, "src")
      .select(col("src"), col("dst"),
        (col("n").cast("double") / col("nt")).as("p"))
    val q12d = (x: Double) => math.floor(x * 1e12 + 0.5) / 1e12
    // the transition matrix is channel-bounded: collect it and replay the
    // absorbing-chain rounds on the driver (sorted-key iteration order,
    // per-round 1e-12 quantization — matches the oracle's sorted-order
    // replay, the order the oracle actually defines; the old distributed
    // groupBy summed in nondeterministic partition order before the same
    // quantization, so bit-identity with IT was never guaranteed either
    // way — the 6-decimal output rounding is what absorbs ulp landings)
    val transArr = trans.collect().map(r =>
      (r.getString(0), r.getString(1), r.getDouble(2)))
    val specials = Set("__start", "__conv", "__null")
    val channelsArr = transArr.flatMap(t => Seq(t._1, t._2)).distinct
      .filterNot(specials).sorted
    val variantsArr = channelsArr :+ "__none"
    val pConv: Map[String, Option[Double]] = variantsArr.map { variant =>
      // knocked-out chain: drop rows FROM the removed channel, re-route
      // rows INTO it to __null; absorbing self-loops on __conv/__null
      val vt = transArr.iterator
        .filter(_._1 != variant)
        .map { case (src, dst, p) =>
          (src, if (dst == variant) "__null" else dst, p) }
        .toSeq ++ Seq(("__conv", "__conv", 1.0), ("__null", "__null", 1.0))
      // (src -> (dst, p)) adjacency, sources and terms in sorted order
      val bySrc = vt.groupBy(_._1)
      var mass = Map("__start" -> 1.0)
      for (_ <- 1 to rounds) {
        val contrib = scala.collection.mutable.Map.empty[String,
          List[(String, Double)]]
        mass.foreach { case (state, m) =>
          bySrc.getOrElse(state, Nil).foreach { case (_, dst, p) =>
            contrib(dst) = (state, m * p) :: contrib.getOrElse(dst, Nil)
          }
        }
        mass = contrib.iterator.map { case (dst, terms) =>
          dst -> q12d(terms.sortBy(_._1).map(_._2).sum)
        }.toMap
      }
      // a __conv entry exists iff mass flowed there — mirrors the old
      // distributed vec's row existence (an absent row is NOT a 0.0 row:
      // with no base-chain conversion the whole output is empty, exactly
      // as the old pConv-filter × crossJoin(base) produced zero rows)
      variant -> mass.get("__conv")
    }.toMap
    import spark.implicits._
    val rd6 = (v: Double) =>
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    pConv.getOrElse("__none", None) match {
      case None =>
        Seq.empty[(String, Double, Double, Double)]
          .toDF("channel", "p_conv", "removal_effect", "attribution")
      case Some(p0) =>
        val removal = channelsArr.map { c =>
          val re = if (p0 > 0)
            1.0 - pConv.getOrElse(c, None).getOrElse(0.0) / p0 else 0.0
          (c, re)
        }
        val reTot = removal.map(_._2).sum
        removal.map { case (c, re) =>
          (c, rd6(p0), rd6(re), rd6(if (reTot > 0) re / reTot else 0.0))
        }.toSeq.toDF("channel", "p_conv", "removal_effect", "attribution")
    }
  }
}
