package graft

import org.apache.spark.sql.DataFrame

package object ops {

  /** Spread a narrow input across the cluster before per-row-expensive
    * stages. A single-file (single-row-group) parquet source arrives as ONE
    * partition no matter how many cores exist, serializing every signature/
    * scoring kernel downstream; at real scale inputs have many splits and
    * this is a no-op. The class, when to apply it and when not to, and the
    * plan-level regression net that pins it (PlanSpec check 6) are
    * documented in COVERAGE.md §"The fanOut class".
    *
    * The fan target is BYTES-AWARE (r15): `min(defaultParallelism,
    * max(2, estimatedBytes / splitBytes))`. r14's unconditional
    * `repartition(defaultParallelism)` made a sub-MB input pay a
    * full-width shuffle — ~29 queries carried a 1–2.5 s floor each at
    * sf0.1 while the kernels themselves took milliseconds. The split
    * size reflects KERNEL cost, not scan cost: the fronts this guards
    * (regex/split/sentences, shingle hashing, per-row DP) process
    * ~1–2 MB/s/core (r13 measured 7–64× blowups on a ~58 MB single-
    * partition corpus), so ~1 MB per task is already ~a second of kernel
    * work — far past the point where the fan-out shuffle amortizes —
    * while 64 MB-style scan splits would under-parallelize them by 50×.
    * Tunable via `spark.graft.fanout.splitBytes` (default 1 MB) for
    * clusters whose kernel-throughput/shuffle-cost ratio differs.
    * Unknown sizes (non-scan frames report `defaultSizeInBytes`) keep
    * the full-parallelism target, same as r14.
    */
  private[graft] def fanOut(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftSqlShim
    val sc = df.sparkSession.sparkContext
    val parallelism = sc.defaultParallelism
    val splitBytes = df.sparkSession.conf
      .getOption("spark.graft.fanout.splitBytes")
      .map(_.toLong).getOrElse(1L << 20)
    val bytes = GraftSqlShim.estimatedSizeInBytes(df)
    val byBytes =
      if (bytes > BigInt(splitBytes) * parallelism) parallelism
      else math.max(2, ((bytes + splitBytes - 1) / splitBytes).toInt)
    val target = math.min(parallelism, byBytes)
    if (GraftSqlShim.numOutputPartitions(df) >= math.max(2, target / 2)) df
    else df.repartition(target)
  }
}
