package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series alignment: resample an event stream onto a fixed grid per
  * key and fill the gaps — the feature-engineering step that turns raw
  * events into a dense per-entity time series (model inputs, monitoring
  * panels, drift baselines).
  *
  * Everything is distributed per key: the grid is generated with
  * `sequence`/`explode` inside each key's own span (no driver loop, no
  * global calendar table), the resample is one grouped aggregation, and
  * the forward fill is a running `last(ignoreNulls)` window per key. The
  * only shuffles are the (key, bucket) aggregation and the per-key window
  * sort. One caveat at scale: the per-key grid materializes one array of
  * span/step entries per key — bounded and fine for hour/day grids over
  * months; for second-grids over years, resample at a coarser unit first.
  */
object TimeSeries {

  /** Resample `valueCol` to one row per (`keyCol`, truncated `tsCol`
    * bucket) over each key's own [min, max] bucket span, then forward-fill
    * empty buckets with the last seen value (LOCF).
    *
    * @param unit  calendar unit for `date_trunc` AND the grid step —
    *              "minute", "hour", "day", "week", "month"
    * @return (key, bucket, n_events, value_avg, value_fill, is_gap):
    *         `value_avg` is the in-bucket mean (null on gap buckets),
    *         `value_fill` carries the LOCF series, `is_gap` marks
    *         generated rows. The mean is rounded to 6 digits BEFORE the
    *         fill so the filled series is engine-reproducible.
    */
  /** Trailing event-time moving aggregate: per key, the count and average
    * of `valueCol` over the window `[ts − windowUs, ts]` (microseconds,
    * inclusive both ends) at every event row. ONE keyed window shuffle;
    * the range frame is phrased on integral epoch-microseconds so window
    * membership is exact (a seconds-truncated ORDER BY would shift
    * boundary rows), and the windowed sum runs over CENTS (integral) so
    * the average is immune to float accumulation order — sliding-window
    * add/subtract rewrites and segment trees agree bit-for-bit on longs.
    *
    * @param windowUs trailing window span in microseconds
    * @return input rows plus (win_n, win_avg), win_avg rounded to 6
    */
  def movingAvg(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, windowUs: Long): DataFrame = {
    require(windowUs > 0, "windowUs must be positive")
    val w = Window.partitionBy(keyCol).orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowUs, 0)
    val cents = round(col(valueCol) * 100, 0).cast("long")
    df.withColumn("__cents", cents)
      .withColumn("win_n", count(lit(1)).over(w))
      .withColumn("win_avg",
        round(sum("__cents").over(w).cast("double") / 100.0 / col("win_n"), 6))
      .drop("__cents")
  }

  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, unit: String = "hour"): DataFrame = {
    val allowed = Set("minute", "hour", "day", "week", "month")
    require(allowed(unit.toLowerCase), s"unit must be one of $allowed")
    val agg = df
      .groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        round(avg(valueCol), 6).as("value_avg"))
    // per-key span → dense grid: sequence() is evaluated per key row, so
    // grid generation scales with the number of keys, not with one task
    val grid = agg.groupBy(col(keyCol))
      .agg(min("bucket").as("__mn"), max("bucket").as("__mx"))
      .select(col(keyCol),
        explode(sequence(col("__mn"), col("__mx"),
          expr(s"INTERVAL 1 $unit"))).as("bucket"))
    val w = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq(keyCol, "bucket"), "left")
      .withColumn("is_gap", col("n_events").isNull)
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("value_fill", last("value_avg", ignoreNulls = true).over(w))
  }

  /** [[resampleFfill]]'s linear-interpolation twin: gap buckets take the
    * time-weighted blend of the straddling known values,
    *
    *   v(t) = v_prev + (v_next − v_prev) · (t − t_prev)/(t_next − t_prev),
    *
    * with LOCF/NOCB at the edges (before the first / after the last known
    * value). Same grid/join machinery; the prev/next anchors are per-key
    * `last`/`first` (ignoreNulls) windows over the SAME keyed sort — one
    * extra window pass, no extra shuffle. The time ratio divides exact
    * epoch-microsecond integers and the in-bucket mean is pre-rounded, so
    * the series is engine-reproducible (round 6 on the output).
    *
    * @return (key, bucket, n_events, value_avg, value_interp, is_gap)
    */
  def resampleInterp(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, unit: String = "hour"): DataFrame = {
    val allowed = Set("minute", "hour", "day", "week", "month")
    require(allowed(unit.toLowerCase), s"unit must be one of $allowed")
    val agg = df
      .groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        round(avg(valueCol), 6).as("value_avg"))
    val grid = agg.groupBy(col(keyCol))
      .agg(min("bucket").as("__mn"), max("bucket").as("__mx"))
      .select(col(keyCol),
        explode(sequence(col("__mn"), col("__mx"),
          expr(s"INTERVAL 1 $unit"))).as("bucket"))
    val sorted = Window.partitionBy(keyCol).orderBy("bucket")
    val wPrev = sorted.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward carry over the REVERSED sort: a (currentRow,
    // unboundedFollowing) aggregate frame re-scans to the partition end
    // for every row — O(n²) per key on long calendar grids
    val wNext = Window.partitionBy(keyCol).orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val knownT = when(col("value_avg").isNotNull, col("bucket"))
    val joined = grid.join(agg, Seq(keyCol, "bucket"), "left")
      .withColumn("is_gap", col("n_events").isNull)
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("__pv", last("value_avg", ignoreNulls = true).over(wPrev))
      .withColumn("__pt", last(knownT, ignoreNulls = true).over(wPrev))
      .withColumn("__nv", last("value_avg", ignoreNulls = true).over(wNext))
      .withColumn("__nt", last(knownT, ignoreNulls = true).over(wNext))
    val frac = (unix_micros(col("bucket")) - unix_micros(col("__pt")))
      .cast("double") /
      (unix_micros(col("__nt")) - unix_micros(col("__pt"))).cast("double")
    joined
      .withColumn("value_interp", round(
        when(col("__pt").isNotNull && col("__nt").isNotNull &&
            col("__nt") =!= col("__pt"),
          col("__pv") + (col("__nv") - col("__pv")) * frac)
          .otherwise(coalesce(col("__pv"), col("__nv"))), 6))
      .drop("__pv", "__pt", "__nv", "__nt")
  }

  /** Autocorrelation function of an ordered series at lags 1..maxLag, the
    * standard (biased, n-denominator) estimator:
    *
    *   r_k = Σ_{t>k} (x_t − x̄)(x_{t−k} − x̄) / Σ_t (x_t − x̄)²
    *
    * Two jobs: ONE aggregation for (n, x̄, Σ(x−x̄)² via the sums identity),
    * then ONE keyed-window pass that emits all maxLag lag products per row
    * (an array, unpivoted with `inline` — one shuffle for every lag, not
    * one per lag) and aggregates per lag. The window is partitioned by
    * `keyCol`; pass a constant column for a single global series — the
    * series a window sort can hold is exactly the series ACF is for
    * (aggregate to a coarser grid first otherwise).
    *
    * @param orderCol ordering column (timestamp or sequence number);
    *                 (orderCol) must be unique per key for determinism
    * @return (key, lag, r, n) for lags 1..maxLag
    */
  def acf(df: DataFrame, keyCol: String, orderCol: String, valueCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"need maxLag >= 1, got $maxLag")
    val x = col(valueCol).cast("double")
    // internal columns carry an acf_ prefix so user key/value names (k, n,
    // mean, …) can never collide
    val stats = df.groupBy(col(keyCol).as("acf_key"))
      .agg(count(lit(1)).as("acf_n"), sum(x).as("acf_s"), sum(x * x).as("acf_q"))
      .select(col("acf_key"), col("acf_n"),
        (col("acf_s") / col("acf_n")).as("acf_mean"),
        (col("acf_q") - col("acf_s") * col("acf_s") / col("acf_n")).as("acf_ss"))
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    // window lags first (one shuffle computes every lag column), THEN the
    // generator — Spark disallows window expressions inside a generator arg.
    // Null-safe key equality so a null-keyed series is a series, not a
    // silent drop; no broadcast hint — the stats frame is key-cardinality-
    // sized, so the join strategy is AQE's measured-size call (r7 advice)
    val withLags = (1 to maxLag).foldLeft(
      df.join(stats, col(keyCol) <=> col("acf_key")).drop("acf_key")
        .withColumn("acf_dx", x - col("acf_mean"))) { (d, k) =>
      d.withColumn(s"acf_dx_lag$k", lag("acf_dx", k).over(w))
    }
    val lagProducts = withLags.select(col(keyCol), col("acf_n"), col("acf_ss"),
      inline(array((1 to maxLag).map { k =>
        struct(lit(k).as("lag"),
          (col("acf_dx") * col(s"acf_dx_lag$k")).as("prod"))
      }: _*)))
    lagProducts.groupBy(col(keyCol).as("key"), col("lag"))
      .agg((sum("prod") / first("acf_ss")).as("r"), first("acf_n").as("n"))
  }

  /** Exponentially weighted moving average with a FINITE kernel: per key,
    * ewma_t = Σ_{j=0..L} (1−α)^j · x_{t−j} / Σ_{j∈present} (1−α)^j —
    * normalized over the lags that exist, so the series start is the
    * partial-kernel average (pandas `ewm(adjust=True)` semantics
    * truncated at L). The infinite recursion E_t = αx_t + (1−α)E_{t−1}
    * is inherently sequential per key; the truncated kernel is the
    * distributed form — (1−α)^j < 1e−16 terms are below double
    * resolution anyway, so choose L ≥ ln(1e−16)/ln(1−α) for
    * full-precision agreement. The fixed lag ladder stays inside
    * whole-stage codegen: ONE keyed window shuffle, L+1 lag columns,
    * fixed-order arithmetic identical on any engine.
    *
    * @param lookback L, the kernel cut (compile-time column count — keep
    *                 it tens, not thousands)
    * @return input plus `<out>` (the EWMA) per row
    */
  def ewmaKernel(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, alpha: Double, lookback: Int = 20,
      outputCol: String = "ewma"): DataFrame = {
    require(alpha > 0 && alpha < 1, s"need 0 < alpha < 1, got $alpha")
    require(lookback >= 0, s"need lookback >= 0, got $lookback")
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    val x = col(valueCol).cast("double")
    // fixed-order pairwise chain: num and den fold j = 0..L left-to-right,
    // so both engines evaluate the identical expression tree
    val terms = (0 to lookback).map { j =>
      val wj = math.pow(1.0 - alpha, j)
      val xj = if (j == 0) x else lag(x, j).over(w)
      (when(xj.isNotNull, xj * wj), when(xj.isNotNull, lit(wj)))
    }
    val num = terms.map(t => coalesce(t._1, lit(0.0))).reduce(_ + _)
    val den = terms.map(t => coalesce(t._2, lit(0.0))).reduce(_ + _)
    df.withColumn(outputCol, when(den > 0, num / den))
  }

  /** Classical additive seasonal decomposition (STL-lite): per key,
    * value = trend + seasonal + residual on a fixed calendar grid.
    *
    *  - series: per-(key, hour-bucket) event-value SUM, carried as
    *    integral cents so every window sum below is exact long
    *    arithmetic;
    *  - trend: centered moving average over ±`halfWindow` buckets on an
    *    exact hour-index RANGE frame (gap-robust: missing buckets are
    *    simply absent), null unless the frame is FULL — edge trends are
    *    not comparable;
    *  - seasonal: the phase mean of the detrended series (phase = bucket
    *    mod `period`), computed only over rows with a trend;
    *  - residual = value − trend − seasonal.
    *
    * Two keyed shuffles total: the (key, bucket) aggregation (the window
    * rides the same partitioning) and the (key, phase) seasonal
    * aggregation joined back on the bucket frame — everything downstream
    * of the raw scan is bucket-cardinality-sized.
    *
    * @param period    season length in buckets (24 = daily shape on an
    *                  hourly grid)
    * @param halfWindow trend window half-width in buckets (period/2 for
    *                  the classic full-season average)
    * @return (key, bucket, n_events, value, trend, seasonal, resid) —
    *         doubles on a 6-digit grid
    */
  def decompose(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, period: Int = 24, halfWindow: Int = 12): DataFrame = {
    require(period >= 2, s"need period >= 2, got $period")
    require(halfWindow >= 1, s"need halfWindow >= 1, got $halfWindow")
    val cents = round(col(valueCol) * 100, 0).cast("long")
    val hourly = df
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n_events"), sum(cents).as("__cents"))
      .withColumn("__h", (unix_micros(col("bucket")) / 3600000000L))
    val w = Window.partitionBy(keyCol).orderBy("__h")
      .rangeBetween(-halfWindow, halfWindow)
    val full = 2 * halfWindow + 1
    // detrended value scaled by 100·full stays a LONG (cents·full − Σcents)
    // — the seasonal phase mean then sums exact integers, so no summation
    // order can move it
    val trended = hourly
      .withColumn("__wn", count(lit(1)).over(w))
      .withColumn("__dt_l",
        when(col("__wn") === full,
          col("__cents") * full - sum("__cents").over(w)))
      .withColumn("__phase", pmod(col("__h"), lit(period.toLong)))
    val seasonal = trended.filter(col("__dt_l").isNotNull)
      .groupBy(col(keyCol).as("__sk"), col("__phase").as("__sp"))
      .agg(sum("__dt_l").as("__dt_sum"), count(lit(1)).as("__dt_n"))
      .select(col("__sk"), col("__sp"),
        (col("__dt_sum").cast("double") / col("__dt_n") / (100.0 * full))
          .as("__seasonal"))
    // trend·(100·full) = cents·full − dt_l = Σ_window cents, recovered
    // from the carried long without a second window pass
    trended
      .join(seasonal, col(keyCol) === col("__sk") &&
        col("__phase") === col("__sp"), "left")
      .select(col(keyCol), col("bucket"), col("n_events"),
        (col("__cents") / 100.0).as("value"),
        round((col("__cents") * full - col("__dt_l")).cast("double") /
          (100.0 * full), 6).as("trend"),
        round(col("__seasonal"), 6).as("seasonal"),
        round(col("__dt_l").cast("double") / (100.0 * full) -
          col("__seasonal"), 6).as("resid"))
  }

  /** Trailing-window linear trend: per key and event row, the OLS slope
    * of value-vs-time over `[ts − windowUs, ts]`. The five window moments
    * (n, Σx, Σy, Σxy, Σx²) accumulate EXACT integers — x in whole seconds
    * since `originUs` (micros), y in cents — so
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *
    * divides two exactly-computed longs and is bit-identical on any
    * engine and any summation order. ONE keyed window shuffle, codegen'd.
    *
    * Caller contract (documented, not checked): pick `originUs` at or
    * below the data's min timestamp and keep the span·density product
    * inside long range — n·Σx² ≲ n²·span_s² and n·Σxy ≲ n²·span_s·maxCents
    * must stay < 2⁶³ (e.g. 10⁴ rows/window over a 10-year span: 10⁸·1e17
    * overflows — shrink x by choosing a window-era origin; the gate's
    * month-span user windows are ~10⁶ below the line).
    *
    * @param originUs epoch-microsecond origin for the x axis
    * @return input rows plus (slope_n, slope) — slope in value units per
    *         second, null when the window has no time spread
    */
  def rollingSlope(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, windowUs: Long, originUs: Long): DataFrame = {
    require(windowUs > 0, "windowUs must be positive")
    val w = Window.partitionBy(keyCol).orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowUs, 0)
    val x = ((unix_micros(col(tsCol)) - lit(originUs)) / 1000000L).cast("long")
    val y = round(col(valueCol) * 100, 0).cast("long")
    val out = df
      .withColumn("__x", x).withColumn("__y", y)
      .withColumn("slope_n", count(lit(1)).over(w))
      .withColumn("__sx", sum("__x").over(w))
      .withColumn("__sy", sum("__y").over(w))
      .withColumn("__sxy", sum(col("__x") * col("__y")).over(w))
      .withColumn("__sxx", sum(col("__x") * col("__x")).over(w))
    val den = col("slope_n") * col("__sxx") - col("__sx") * col("__sx")
    out
      .withColumn("slope",
        when(den =!= 0,
          (col("slope_n") * col("__sxy") - col("__sx") * col("__sy"))
            .cast("double") / den.cast("double") / 100.0))
      .drop("__x", "__y", "__sx", "__sy", "__sxy", "__sxx")
  }

  /** Per-key linear trend forecast: fit y = a + b·t by OLS over each
    * key's events (t in whole days since `originUs`, y in cents — the
    * five moments are EXACT integer sums, so a and b divide
    * exactly-computed longs and are bit-identical on any engine), then
    * extrapolate `horizon` daily steps past the key's last observed day.
    *
    * ONE keyed aggregation carries everything; the forecast rows are a
    * per-key `sequence` explode of the (key, a, b, last-day) frame —
    * key-cardinality-sized, never data-sized.
    *
    * @return (key, h, day, yhat) for h = 1..horizon; keys with no time
    *         spread (single day) forecast their flat mean
    */
  def forecastLinear(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, horizon: Int, originUs: Long): DataFrame = {
    require(horizon >= 1, s"need horizon >= 1, got $horizon")
    val x = ((unix_micros(date_trunc("day", col(tsCol))) - lit(originUs)) /
      86400000000L).cast("long")
    val y = round(col(valueCol) * 100, 0).cast("long")
    val m = df
      .select(col(keyCol).as("key"), x.as("__x"), y.as("__y"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"), sum("__x").as("sx"), sum("__y").as("sy"),
        sum(col("__x") * col("__y")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"),
        max("__x").as("mx"))
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val fitted = m
      .withColumn("b", when(den =!= 0,
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          den.cast("double")).otherwise(lit(0.0)))
      .withColumn("a",
        (col("sy").cast("double") - col("b") * col("sx")) / col("n"))
    fitted
      .select(col("key"), col("a"), col("b"), col("mx"),
        explode(sequence(lit(1), lit(horizon))).as("h"))
      .select(col("key"), col("h"),
        timestamp_micros(((col("mx") + col("h")) * 86400000000L +
          lit(originUs)).cast("long")).as("day"),
        round((col("a") + col("b") * (col("mx") + col("h"))) / 100.0, 6)
          .as("yhat"))
  }

  /** Two-window mean-shift change score: per key and row t,
    * score_t = |mean(x_{t−w..t−1}) − mean(x_{t..t+w−1})| — the classic
    * sliding split statistic; local maxima above a threshold are change
    * points. Rows without a FULL window on both sides score NULL (edges
    * are not comparable). ONE keyed window shuffle, two frame sums,
    * codegen'd.
    *
    * @return input plus `score` = |right mean − left mean|
    */
  def changeScore(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, window: Int,
      outputCol: String = "score"): DataFrame = {
    require(window >= 1, s"need window >= 1, got $window")
    val x = col(valueCol).cast("double")
    val base = Window.partitionBy(keyCol).orderBy(orderCol)
    val left = base.rowsBetween(-window, -1)
    val right = base.rowsBetween(0, window - 1)
    df.withColumn("__ln", count(x).over(left))
      .withColumn("__rn", count(x).over(right))
      .withColumn(outputCol,
        when(col("__ln") === window && col("__rn") === window,
          abs(sum(x).over(right) / window - sum(x).over(left) / window)))
      .drop("__ln", "__rn")
  }

  /** CUSUM drift statistic over an INTEGRAL-valued series (cents,
    * counts): S_t = Σ_{i≤t} (x_i − x̄). The running extreme of |S| marks
    * the most likely mean-shift point; a monotone drift shows as a
    * V/Λ-shaped S curve. Complements [[changeScore]] (local split means)
    * with the global-mean cumulative form.
    *
    * Exactness: S_t is carried SCALED BY n — s_scaled = n·Σx_{≤t} − t·G
    * with G the grand total and t the point's 1-based index — pure Long
    * arithmetic, no float summation channel, bit-identical on any
    * engine (headroom: n·G must stay inside 2⁶³ — fine for cents totals
    * below ~10¹⁴ at a million points). The unscaled double `cusum` =
    * s_scaled/n is one division per row off the exact Long.
    *
    * Execution: duplicate order values collapse through ONE groupBy (their
    * values sum); the cumulative runs through the two-level
    * [[Cumulative.runningSums]] pass (no single-task data window); the
    * grand totals ride a one-row broadcast.
    *
    * @param orderCol numeric series order (day index, epoch seconds …)
    * @param valueCol integral measure; duplicates per order value sum
    * @return (orderCol, x, s_scaled, cusum) one row per distinct order
    *         value, `cusum` on a 4-digit grid
    */
  /** Broken-stick (two-piece segmented) regression with a literal
    * breakpoint grid — the structural-break QUANTIFIER next to
    * [[changeScore]]/[[cusum]]'s detectors: fit y ~ x separately left
    * and right of each candidate break, pick the SSE-minimizing break
    * (ties to the smaller candidate). Every candidate's ten conditional
    * moments ride in ONE aggregation (the fused-Gram discipline), so
    * the whole grid costs one scan; closed-form OLS identities per side
    *
    *   b₁ = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²),  b₀ = (Σy − b₁Σx)/n,
    *   SSE = Σyy − b₀Σy − b₁Σxy
    *
    * run on the collected ONE-ROW moment frame. With integral x/y
    * (cents discipline) every moment is exact, so the argmin replays
    * bit-for-bit. Candidates leaving either side with < 2 points are
    * skipped (no slope).
    *
    * @return one row: (breakpoint, n_l, n_r, slope_l, intercept_l,
    *         slope_r, intercept_r, sse) — coefficients 6-digit grid,
    *         sse 2-digit
    */
  def brokenStick(df: DataFrame, xCol: String, yCol: String,
      candidates: Seq[Double]): DataFrame = {
    require(candidates.nonEmpty && candidates.size <= 32,
      s"need 1..32 candidates, got ${candidates.size}")
    val spark = df.sparkSession
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val aggs = candidates.distinct.sorted.zipWithIndex.flatMap {
      case (c, i) =>
        def side(left: Boolean, e: Column, nm: String) = {
          val cond = if (left) x <= c else x > c
          sum(when(cond, e).otherwise(lit(0.0))).as(s"__${nm}_$i")
        }
        Seq(
          sum(when(x <= c, 1L).otherwise(0L)).as(s"__nl_$i"),
          side(left = true, x, "sxl"), side(left = true, y, "syl"),
          side(left = true, x * x, "sxxl"),
          side(left = true, x * y, "sxyl"),
          side(left = true, y * y, "syyl"),
          sum(when(x > c, 1L).otherwise(0L)).as(s"__nr_$i"),
          side(left = false, x, "sxr"), side(left = false, y, "syr"),
          side(left = false, x * x, "sxxr"),
          side(left = false, x * y, "sxyr"),
          side(left = false, y * y, "syyr"))
    }
    val row = df.filter(x.isNotNull && y.isNotNull)
      .agg(aggs.head, aggs.tail: _*).head()
    require(!row.isNullAt(0),
      "brokenStick: no non-null (x, y) rows to fit")
    val sorted = candidates.distinct.sorted
    def fitAt(i: Int): Option[(Double, Long, Long, Double, Double,
        Double, Double, Double)] = {
      val nl = row.getAs[Long](s"__nl_$i")
      val nr = row.getAs[Long](s"__nr_$i")
      if (nl < 2 || nr < 2) None
      else {
        def ols(n: Long, sx: Double, sy: Double, sxx: Double,
            sxy: Double, syy: Double): Option[(Double, Double, Double)] = {
          val den = n * sxx - sx * sx
          if (den == 0.0) None
          else {
            val b1 = (n * sxy - sx * sy) / den
            val b0 = (sy - b1 * sx) / n
            Some((b1, b0, syy - b0 * sy - b1 * sxy))
          }
        }
        def g(nm: String) = row.getAs[Double](s"__${nm}_$i")
        for {
          (b1l, b0l, sseL) <- ols(nl, g("sxl"), g("syl"), g("sxxl"),
            g("sxyl"), g("syyl"))
          (b1r, b0r, sseR) <- ols(nr, g("sxr"), g("syr"), g("sxxr"),
            g("sxyr"), g("syyr"))
        } yield (sorted(i), nl, nr, b1l, b0l, b1r, b0r, sseL + sseR)
      }
    }
    val fits = sorted.indices.flatMap(fitAt)
    require(fits.nonEmpty,
      "no candidate leaves >= 2 identifiable points on both sides")
    val best = fits.minBy { case (c, _, _, _, _, _, _, sse) => (sse, c) }
    def rd(v: Double, d: Int) =
      BigDecimal(v).setScale(d, BigDecimal.RoundingMode.HALF_UP).toDouble
    import spark.implicits._
    Seq((best._1, best._2, best._3, rd(best._4, 6), rd(best._5, 6),
      rd(best._6, 6), rd(best._7, 6), rd(best._8, 2)))
      .toDF("breakpoint", "n_l", "n_r", "slope_l", "intercept_l",
        "slope_r", "intercept_r", "sse")
  }

  /** Page–Hinkley sequential drift test, per series (Page 1954; the
    * streaming-drift monitor in MOA/river) — detects a sustained
    * INCREASE of the mean: with running mean x̄_i over the first i
    * points,
    *
    *   m_t = Σ_{i≤t} (x_i − x̄_i − δ),   PH_t = m_t − min_{i≤t} m_i,
    *
    * and the series alarms at the first t where PH_t > λ.
    *
    * Exact-replay discipline: values are carried as integral cents; each
    * per-row term (x_i − S_i/i − δ) — whose only float op is the ONE
    * pinned division S_i/i — is quantized to a 1e-6-cent grid BEFORE the
    * running summation, so the cumulative m is exact long arithmetic and
    * no engine's window-sum association (DuckDB's segment trees, Spark's
    * streaming fold) can perturb it.
    *
    * Scale shape: one (key, order) collapse (ties summed), then three
    * key-partitioned window passes on that partitioning, then the final
    * per-key fold — ONE corpus shuffle on key+order, one key-sized
    * output.
    *
    * @param delta  per-step tolerance, in value units
    * @param lambda alarm threshold, in value units
    * @return per key: (key, n_points, ph_end, ph_max, first_alarm) — PH
    *         values in original units on a 6-digit grid; first_alarm =
    *         1-based index of the first alarming point, null if never
    */
  def pageHinkley(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, delta: Double, lambda: Double): DataFrame = {
    require(lambda > 0, s"need lambda > 0, got $lambda")
    val cents = round(col(valueCol).cast("double") * 100, 0).cast("long")
    val series = df
      .filter(col(orderCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(orderCol))
      .agg(sum(cents).as("__x"))
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    val rn = row_number().over(w)
    val run = series
      .withColumn("__i", rn.cast("long"))
      .withColumn("__s", sum("__x").over(w))
      // the ONE float op, pinned: running-mean shortfall on the 1e-6-cent
      // grid, per row — integer thereafter
      .withColumn("__q", round((col("__x").cast("double") -
        col("__s").cast("double") / col("__i").cast("double") -
        lit(delta * 100.0)) * 1e6, 0).cast("long"))
      .withColumn("__m", sum("__q").over(w))
      .withColumn("__ph", col("__m") - min("__m").over(w))
    val lambdaMicroCents = math.round(lambda * 100.0 * 1e6)
    run.groupBy(keyCol).agg(
      max("__i").as("n_points"),
      round(max_by(col("__ph"), col("__i")).cast("double") / 1e8, 6)
        .as("ph_end"),
      round(max("__ph").cast("double") / 1e8, 6).as("ph_max"),
      min(when(col("__ph") > lambdaMicroCents, col("__i")))
        .as("first_alarm"))
  }

  /** Brown's double exponential smoothing forecast (linear-trend
    * exponential smoothing via two stacked EWMAs — Brown 1959; the
    * "double" member of the Holt family with a single α): with
    * s1 = EWMA_α(x) and s2 = EWMA_α(s1),
    *
    *   level = 2·s1 − s2,  trend = α/(1−α) · (s1 − s2),
    *   forecast(+h) = level + h · trend.
    *
    * Both smoothing passes use the [[ewmaKernel]] discipline: a
    * lookback-truncated, weight-renormalized, FIXED-ORDER lag chain —
    * the identical expression tree in any ANSI engine — so the float
    * result replays exactly; only the FINAL forecast is rounded. Two
    * window passes on the same (key, order) partitioning: no shuffle
    * beyond the first.
    *
    * @return input key/order rows plus (s1, s2, level, trend, forecast),
    *         all 6-digit-rounded; rows whose full second-pass lookback
    *         reaches before the series start still smooth (weights
    *         renormalize over what exists, exactly like [[ewmaKernel]])
    */
  def brownForecast(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, alpha: Double, lookback: Int = 8,
      horizon: Int = 1): DataFrame = {
    require(alpha > 0 && alpha < 1, s"need 0 < alpha < 1, got $alpha")
    require(lookback >= 1 && lookback <= 12,
      s"need 1 <= lookback <= 12 (the lag chain is O(lookback²) wide), " +
        s"got $lookback")
    require(horizon >= 1, s"need horizon >= 1, got $horizon")
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    def smooth(x: Column): Column = {
      val terms = (0 to lookback).map { j =>
        val wj = math.pow(1.0 - alpha, j)
        val xj = if (j == 0) x else lag(x, j).over(w)
        (when(xj.isNotNull, xj * wj), when(xj.isNotNull, lit(wj)))
      }
      val num = terms.map(t => coalesce(t._1, lit(0.0))).reduce(_ + _)
      val den = terms.map(t => coalesce(t._2, lit(0.0))).reduce(_ + _)
      when(den > 0, num / den)
    }
    // s1 lands as a real column first: the second pass lags it, and a
    // lag whose argument itself contained window functions would be
    // rejected by the analyzer (nested window expressions)
    val withS1 = df.withColumn("__s1", smooth(col(valueCol).cast("double")))
    val s1 = col("__s1")
    val s2 = smooth(s1)
    val level = s1 * 2.0 - s2
    val trend = (s1 - s2) * (alpha / (1.0 - alpha))
    withS1.select(col(keyCol), col(orderCol), col(valueCol),
      round(s1, 6).as("s1"), round(s2, 6).as("s2"),
      round(level, 6).as("level"), round(trend, 6).as("trend"),
      round(level + trend * horizon, 6).as("forecast"))
  }

  def cusum(df: DataFrame, orderCol: String, valueCol: String): DataFrame = {
    val dist = df
      .filter(col(orderCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(orderCol))
      .agg(sum(col(valueCol).cast("long")).as("x"), lit(1L).as("__one"))
    val cum = Cumulative.runningSums(dist, orderCol, Seq("x", "__one"))
    // grand totals from the collapsed frame (not max of the cumulative —
    // negative values make the running sum non-monotone)
    val tot = dist.agg(count(lit(1)).as("__n"), sum("x").as("__g"))
    cum.crossJoin(broadcast(tot))
      .select(col(orderCol), col("x"),
        (col("__n") * col("x_cum") - col("__one_cum") * col("__g"))
          .as("s_scaled"),
        round((col("__n") * col("x_cum") - col("__one_cum") * col("__g"))
          .cast("double") / col("__n").cast("double"), 4).as("cusum"))
  }
}
