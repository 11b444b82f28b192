package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-shaping operators for the skewed / selective regimes a 100 TB fact
  * table lives in. Both are semantically transparent — each result equals
  * the plain inner equi-join — so the correctness oracle for a shaped join
  * is simply the unshaped query.
  */
object JoinOps {

  /** Salted shuffle join: spread a hot join key over `salt` reducers.
    *
    * AQE's skew-join split only fires on sort-merge joins whose partition
    * sizes trip its thresholds at runtime; salting is the explicit,
    * planner-independent form. The big side gets a deterministic salt from
    * `discriminator` — a column that VARIES WITHIN a join key (a line
    * number, an event id, a digest of the payload); salting by the join key
    * itself would map every row of the hot key to one reducer and change
    * nothing. The small side is replicated `salt` times (rows × salt — keep
    * the small side genuinely small), and the join runs on (keys, salt), so
    * each big-side row still meets exactly one copy of its matching
    * small-side row: the result is the plain inner join, row for row.
    *
    * Deterministic (`xxhash64`, no `rand()`): re-runs and retried tasks
    * salt identically, so speculative execution cannot duplicate rows.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      discriminator: Column, salt: Int = 16): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    require(keys.nonEmpty, "need at least one join key")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(discriminator), lit(salt.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Bloom-filter semi-join reduction: build a Bloom filter over the dim
    * side's join keys (one aggregation job, fixed `numBits` of driver
    * traffic regardless of dim cardinality), broadcast it, and prefilter
    * the fact side BEFORE the shuffle join. The classic 100 TB move when
    * the dim side is selective but too large to broadcast outright: fact
    * rows whose key cannot match never enter the exchange, so the shuffle
    * carries ~selectivity × |fact| rows instead of all of them.
    *
    * False positives only let a few extra rows through to the real join,
    * which drops them — the result is EXACTLY the plain inner join, so the
    * oracle for a Bloom-pruned pipeline is the unpruned query. Keys must be
    * integral (long-compatible); `expectedItems`/`fpp` size the filter
    * (defaults: 1M keys at 3% fpp ≈ 0.9 MB broadcast).
    */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long = 1000000L,
      fpp: Double = 0.03): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    val might = udf { (k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k)
    }
    fact.filter(might(col(factKey).cast("long")))
      .join(dim, col(factKey) === col(dimKey))
  }
}
