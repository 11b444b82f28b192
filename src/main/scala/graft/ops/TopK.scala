package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-memory top-k / heavy hitters over a (possibly enormous) key
  * space — the "most frequent tokens / domains / fingerprints" primitive a
  * training-data pipeline runs over 100 TB of text.
  *
  * A plain `groupBy(key).count().orderBy(...).limit(k)` shuffles EVERY
  * distinct key; at billions of distinct tokens that shuffle dominates the
  * job. [[heavyHitters]] instead runs:
  *
  *  1. one scan building a per-partition Misra-Gries summary of `capacity`
  *     counters (O(capacity) memory per task, amortized O(1) per row).
  *     MG guarantees every key with partition frequency > n_p/(capacity+1)
  *     survives its partition summary; a globally heavy key (frequency >
  *     n/(capacity+1)) is necessarily that heavy in at least one partition,
  *     so the UNION of partition summaries contains all true heavy hitters;
  *  2. one exact recount restricted (broadcast semi join) to those
  *     ≤ capacity × nPartitions candidate keys, then top-k with a
  *     deterministic (count desc, key asc) tiebreak.
  *
  * The result is EXACT for any k whose true k-th frequency exceeds
  * n/(capacity+1) — pick capacity ≥ a few × n/expected-kth-count. Shuffle
  * traffic is candidate (key, count) pairs only, never the full key space.
  * Null keys carry no signal for this primitive and are dropped (q63-style
  * explicit routing, documented rather than silent).
  */
object TopK {

  /** Per-partition Misra-Gries: `capacity` counters; on overflow every
    * counter decrements by one (zeros evicted) — the classic frequent-items
    * summary (Misra & Gries 1982; merge/guarantee per Agarwal et al.,
    * "Mergeable Summaries", PODS'12).
    */
  private[ops] def mgSummary(it: Iterator[String], capacity: Int): Iterator[(String, Long)] = {
    val counts = new java.util.HashMap[String, java.lang.Long](capacity * 2)
    while (it.hasNext) {
      val key = it.next()
      val cur = counts.get(key)
      if (cur != null) counts.put(key, cur + 1L)
      else if (counts.size < capacity) counts.put(key, java.lang.Long.valueOf(1L))
      else {
        // overflow: decrement every counter (the incoming key included,
        // implicitly, by not being added) and evict zeros
        val entries = counts.entrySet().iterator()
        while (entries.hasNext) {
          val e = entries.next()
          if (e.getValue == 1L) entries.remove()
          else e.setValue(e.getValue - 1L)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counts.entrySet().iterator().asScala.map(e => (e.getKey, e.getValue.longValue()))
  }

  /** Exact top-`k` (key, cnt) rows of `keyCol` by frequency, computed with
    * bounded memory as described in the object doc. Output ordered by
    * (cnt desc, key asc).
    *
    * The candidate set is bounded by capacity × nPartitions, which at
    * cluster scale can exceed what a driver can broadcast (4096 × 100k
    * partitions ≈ 400M keys). The broadcast hint on the recount semi-join
    * is therefore applied only while that bound stays under
    * `broadcastMaxCandidates`; above it the semi-join shuffles instead —
    * same result, no driver blow-up (the shuffle still carries only
    * candidate keys on the build side).
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int,
      capacity: Int = 4096,
      broadcastMaxCandidates: Long = 4L << 20): DataFrame = {
    require(k >= 1 && capacity >= k,
      s"capacity ($capacity) must be >= k ($k)")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = fanOut(df.select(col(keyCol).cast("string").as("key"))
      .filter(col("key").isNotNull))
    val candidates = keys.as[String]
      .mapPartitions(it => mgSummary(it, capacity))
      .toDF("key", "cnt_lb")
      .select("key").distinct()
    val candidateBound = capacity.toLong * keys.rdd.getNumPartitions
    val build =
      if (candidateBound <= broadcastMaxCandidates) broadcast(candidates)
      else candidates
    keys.join(build, Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key")).limit(k)
  }
}
