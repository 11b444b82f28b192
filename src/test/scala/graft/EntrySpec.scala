package graft

/** Driver-contract invariants for SparkEntry. */
class EntrySpec extends SparkSpec {

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle SQL without a query: $missing")
  }

  test("rows-only queries are the documented set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // each of these is rows-only for a structural reason (xxhash64 /
    // recall<1 / byte-level decode / sketch-determined bins have no
    // DuckDB analog); the iterative fits graduated to unrolled
    // fixed-point oracles over rounds 8–10 (q20/q64/q163/q181/q194/
    // q210/q226/q229); the HLL estimators q137/q197 graduated to
    // portable-register hash oracles in r12 (the q333/q334 machinery)
    assert(rowsOnly === Set("q26_minhash_pairs",
      "q27_simhash_pairs", "q29_ann_lsh", "q30_multimodal_features",
      "q39_cosine_pairs_lsh", "q48_dedup_corpus", "q58_percentiles_approx",
      "q61_distinct_approx", "q68_ann_ivf",
      "q138_calibration_quantile",
      // PERMANENTLY pinned: the zlib deflate ratio is a property of the
      // compressor build (stream header/window/heuristics), not a
      // replayable arithmetic chain — no engine-portable twin exists
      // even in principle (unlike q30, whose byte kernels ARE hash-gated
      // through the q371 twin; q30 itself stays rows-only for its
      // float-normalized histogram/entropy outputs)
      "q348_compression_quality"))
  }

  test("approx distinct counts (q61) track the exact counts (q60) within 5%") {
    val exact = SparkEntry.queries("q60_distinct_exact")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = SparkEntry.queries("q61_distinct_approx")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (k, (o, s)) =>
      val (ao, as) = approx(k)
      assert(math.abs(ao - o).toDouble / o < 0.05, s"$k orders: $ao vs $o")
      assert(math.abs(as - s).toDouble / s < 0.05, s"$k supps: $as vs $s")
    }
  }

  test("approx percentiles (q58) track the exact percentiles (q33) within 1%") {
    val exact = SparkEntry.queries("q33_percentiles")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = SparkEntry.queries("q58_percentiles_approx")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (k, (p50, p90)) =>
      val (a50, a90) = approx(k)
      assert(math.abs(a50 - p50) / p50 < 0.01, s"$k p50: $a50 vs $p50")
      assert(math.abs(a90 - p90) / p90 < 0.01, s"$k p90: $a90 vs $p90")
    }
  }

  test("entry flagship returns rows with a prediction column") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.contains("prediction"))
    assert(df.limit(5).count() > 0)
  }

  test("every query runs at sf0.001 and returns a deterministic row count") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n1 = fn(spark, sfDir).count()
      val n2 = fn(spark, sfDir).count()
      assert(n1 === n2, s"$name row count not stable")
    }
  }
}
