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
    // IRLS loop / recall<1 / byte-level decode have no DuckDB analog)
    assert(rowsOnly === Set("q20_glm_coefs", "q26_minhash_pairs",
      "q27_simhash_pairs", "q29_ann_lsh", "q30_multimodal_features",
      "q39_cosine_pairs_lsh", "q48_dedup_corpus"))
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
