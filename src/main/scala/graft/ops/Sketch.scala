package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005): approximate
  * per-key counts in FIXED memory — d·w integer counters regardless of
  * key cardinality. The bounded-memory companion to
  * [[TopK.heavyHitters]] (which keeps candidate keys) and the counting
  * sibling of `approx_count_distinct`'s HLL (which only sizes the key
  * set): estimate(k) = min over d rows of counter[r][h_r(k)], always an
  * OVER-estimate (collisions only add), within εN with probability
  * 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * Like [[hllRegisters]], the sketch is exactly replayable: hashes are
  * md5-derived (the engine-reproducible q236 mapping) and counters are
  * exact integer sums, so estimates are bit-identical on any engine and
  * any partitioning — both sketches get full hash-equality oracles, not
  * tolerance bands.
  *
  * Scale shape: the build explodes each row into its d (row, col) cells,
  * but hash partial aggregation collapses every partition to ≤ d·w cells
  * before the shuffle — the exchange carries O(partitions · d · w)
  * counter rows, never data. Estimation joins the ≤ d·w-row sketch
  * (broadcast) against the probe keys: one narrow broadcast join + one
  * min-agg per key.
  */
object Sketch {

  /** Row-r column index of `key`: md5("r#key") mod width. */
  private def cell(r: Column, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat_ws("#", r, key)), 1, 15), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Build the d×w counter table from one pass over `df`.
    *
    * @param weightCol optional non-negative integral weight (count each
    *                  row `weight` times); default 1 per row
    * @return occupied cells only: (row, col, counter) — absent cells
    *         are zero
    */
  def countMin(df: DataFrame, keyCol: String, width: Int, depth: Int,
      weightCol: Option[String] = None): DataFrame = {
    require(width >= 2, s"need width >= 2, got $width")
    require(depth >= 1, s"need depth >= 1, got $depth")
    val w = weightCol.map(col(_).cast("long")).getOrElse(lit(1L))
    // ONE scan: explode each row into its d cells; hash partial
    // aggregation collapses a partition to ≤ d·w cells pre-shuffle
    df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("__k"), w.as("__w"))
      .withColumn("row", explode(array((0 until depth).map(lit): _*)))
      .select(col("row"), cell(col("row"), col("__k"), width).as("col"),
        col("__w"))
      .groupBy("row", "col").agg(sum("__w").as("counter"))
  }

  /** Point-estimate the count of every key in `keys` from a built
    * sketch: min over the d rows of the key's counter (0 when the cell
    * is unoccupied — the key was never seen). The sketch (≤ d·w rows,
    * bounded by construction) broadcasts.
    */
  def countMinEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      width: Int, depth: Int): DataFrame = {
    require(width >= 2 && depth >= 1)
    val probes = keys.select(col(keyCol))
      .withColumn("row", explode(array((0 until depth).map(lit): _*)))
      .withColumn("col", cell(col("row"), col(keyCol), width))
    probes.join(broadcast(sketch), Seq("row", "col"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("counter"), lit(0L))).as("estimate"))
  }

  /** Portable HyperLogLog registers (Flajolet et al. 2007) — the
    * engine-replayable twin of `approx_count_distinct`'s opaque HLL++
    * (the q60/q61 pair is rows-only for exactly that opacity): the
    * 60-bit md5 hash splits into a p-bit bucket (low bits) and a
    * (60−p)-bit tail whose leading-zero count feeds the register, all
    * by exact integer bit arithmetic (`&`, `>>`, and the engines'
    * shared no-leading-zeros `bin()` string length), so the register
    * table — and therefore the estimate — is bit-identical in ANSI SQL.
    *
    * Scale shape: ONE scan; partial aggregation collapses every
    * partition to ≤ 2^p register cells before the shuffle, the classic
    * mergeable-sketch profile (union of sketches = cell-wise max).
    *
    * @return occupied registers only: (bucket, r) with r = max over the
    *         bucket's keys of (leading zeros of the tail + 1), 1..61−p
    */
  def hllRegisters(df: DataFrame, keyCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 14, s"need 4 <= p <= 14, got $p")
    val m = 1 << p
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val rest = shiftright(h, p)
    val rho = when(rest === 0L, lit(61 - p))
      .otherwise(lit(60 - p) + 1 - length(bin(rest)))
    df.filter(col(keyCol).isNotNull)
      .select(h.bitwiseAND(lit(m.toLong - 1)).as("bucket"), rho.as("__rho"))
      .groupBy("bucket").agg(max("__rho").as("r"))
  }

  /** The HLL readout: raw harmonic-mean estimate with the small-range
    * linear-counting correction, from a [[hllRegisters]] table. The
    * 2^(−M_j) sum is EXACT — terms are scaled to integers 2^(61−p−M_j)
    * (empty registers contribute 2^(61−p)), whose long sum is ≤ 2^61 —
    * so the one raw-estimate division and the ln(m/V) branch are the
    * only float ops, each a single pinned expression.
    *
    * @return one row: (m, n_occupied, v_zero, s_scaled, estimate) —
    *         estimate on the 6-digit grid; linear counting applies when
    *         raw ≤ 2.5m and zero registers exist (the Flajolet rule)
    */
  /** Per-group portable HLL distinct estimates — the grouped shape the
    * opaque `approx_count_distinct` twins (q60/q61) actually run, made
    * hash-gateable: ONE scan → (group, bucket) register collapse (the
    * partial agg bounds every partition's contribution at groups·2^p
    * cells) → per-group exact-integer-scaled readout with the same
    * raw-vs-linear-counting branch as [[hllEstimate]].
    *
    * @return per group: (groupCol, n_occupied, v_zero, s_scaled,
    *         estimate) — estimate on the 6-digit grid
    */
  /** Bias-correction constant alpha_m from Flajolet et al. 2007: the
    * paper pins alpha_16 = 0.673, alpha_32 = 0.697, alpha_64 = 0.709
    * for the small register counts where the asymptotic formula
    * 0.7213/(1 + 1.079/m) carries a few-percent systematic bias; the
    * asymptotic form applies from m = 128 (p >= 7). Any engine
    * replaying the readout must use the same m-dispatched constant.
    */
  private[graft] def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m.toDouble)
  }

  /** Register coordinates of one key under precision `p`: (bucket, rho)
    * — the [[hllRegisters]] hash split exposed as reusable expressions
    * so OTHER operators (rolling actives, per-column profiling) can
    * build portable, DuckDB-replayable HLL sketches with the identical
    * bit arithmetic.
    */
  private[graft] def hllCoords(key: Column, p: Int): (Column, Column) = {
    val m = 1 << p
    val h = conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("long")
    val rest = shiftright(h, p)
    val rho = when(rest === 0L, lit(61 - p))
      .otherwise(lit(60 - p) + 1 - length(bin(rest)))
    (h.bitwiseAND(lit(m.toLong - 1)), rho)
  }

  /** The readout estimate (double, 6-digit grid) from a group's occupied
    * register count and occupied exact-integer-scaled harmonic sum —
    * the [[hllEstimate]] arithmetic factored out so grouped callers
    * replay the same raw-vs-linear-counting branch expression-for-
    * expression (and therefore bit-for-bit in ANSI SQL).
    */
  private[graft] def hllReadout(nOccupied: Column, sOcc: Column,
      p: Int): Column = {
    val m = 1 << p
    val scale = 61 - p
    val md = m.toDouble
    val vZero = lit(m.toLong) - nOccupied
    val sScaled = sOcc + vZero * lit(1L << scale)
    val raw = lit(hllAlpha(m)) * lit(md) * lit(md) *
      lit(math.pow(2.0, scale)) / sScaled.cast("double")
    val lc = lit(md) * log(lit(md) / vZero.cast("double"))
    round(when(raw <= lit(2.5) * lit(md) && vZero > 0, lc).otherwise(raw),
      6)
  }

  def hllEstimateByGroup(df: DataFrame, groupCol: String, keyCol: String,
      p: Int): DataFrame = {
    require(p >= 4 && p <= 14, s"need 4 <= p <= 14, got $p")
    val m = 1 << p
    val scale = 61 - p
    val md = m.toDouble
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val rest = shiftright(h, p)
    val rho = when(rest === 0L, lit(61 - p))
      .otherwise(lit(60 - p) + 1 - length(bin(rest)))
    val regs = df.filter(col(keyCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol),
        h.bitwiseAND(lit(m.toLong - 1)).as("__bucket"), rho.as("__rho"))
      .groupBy(col(groupCol), col("__bucket"))
      .agg(max("__rho").as("__r"))
    val agg = regs.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_occupied"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), $scale - __r)"))
        .as("__s_occ"))
    val vZero = lit(m.toLong) - col("n_occupied")
    val s = col("__s_occ") + vZero * lit(1L << scale)
    val alpha = lit(hllAlpha(m))
    val raw = alpha * lit(md) * lit(md) * lit(math.pow(2.0, scale)) /
      col("s_scaled").cast("double")
    val lc = lit(md) * log(lit(md) / col("v_zero").cast("double"))
    agg
      .select(col(groupCol), col("n_occupied"), vZero.as("v_zero"),
        s.as("s_scaled"))
      .select(col(groupCol), col("n_occupied"), col("v_zero"),
        col("s_scaled"),
        round(when(raw <= lit(2.5) * lit(md) && col("v_zero") > 0, lc)
          .otherwise(raw), 6).as("estimate"))
  }

  def hllEstimate(registers: DataFrame, p: Int): DataFrame = {
    require(p >= 4 && p <= 14, s"need 4 <= p <= 14, got $p")
    val m = 1 << p
    val scale = 61 - p
    val md = m.toDouble
    val agg = registers.agg(
      count(lit(1)).as("n_occupied"),
      coalesce(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $scale - r)")),
        lit(0L)).as("__s_occ"))
    val vZero = lit(m.toLong) - col("n_occupied")
    val s = col("__s_occ") + vZero * lit(1L << scale)
    val alpha = lit(hllAlpha(m))
    val raw = alpha * lit(md) * lit(md) * lit(math.pow(2.0, scale)) /
      col("s_scaled").cast("double")
    val lc = lit(md) * log(lit(md) / col("v_zero").cast("double"))
    agg
      .select(lit(m.toLong).as("m"), col("n_occupied"),
        vZero.as("v_zero"), s.as("s_scaled"))
      .select(col("m"), col("n_occupied"), col("v_zero"), col("s_scaled"),
        round(when(raw <= lit(2.5) * lit(md) && col("v_zero") > 0, lc)
          .otherwise(raw), 6).as("estimate"))
  }
}
