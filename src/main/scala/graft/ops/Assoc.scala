package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules — pairwise support / confidence /
  * lift, the classic co-occurrence mining operator (the 2-itemset core
  * of Apriori; higher orders are built by re-joining the survivors).
  *
  * Scale shape: baskets above `maxBasketSize` are EXCLUDED before the
  * pair self-join (the bucket-cap discipline — one degenerate
  * everything-basket otherwise makes the join quadratic in the catalog;
  * in basket practice such rows are bots/bulk orders and dropping them
  * is standard). The remaining shuffles carry (basket, item) incidences
  * and (item, item) pairs only. `minCount` prunes the pair frame before
  * the metric arithmetic; metrics are exact-integer ratios on a 6-digit
  * grid.
  */
object Assoc {

  /** @param minCount      minimum co-occurrence count for a rule
    * @param maxBasketSize baskets with more distinct items are dropped
    * @param materialize   true (default): persist the pruned incidence
    *                      frame, compute the rules eagerly, release the
    *                      cache before returning (no leaked blocks).
    *                      false: fully lazy — the returned plan re-runs
    *                      the distinct + semi-join chain per consumer
    *                      (for plan inspection / one-shot pipelines)
    * @return one row per ORDERED rule (antecedent → consequent), both
    *         directions of every qualifying pair: (antecedent,
    *         consequent, n_both, n_ante, n_cons, support, confidence,
    *         lift)
    */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
      minCount: Long = 2, maxBasketSize: Int = 200,
      materialize: Boolean = true): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(maxBasketSize >= 2, "maxBasketSize must be >= 2")
    val inc = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
    val keep = inc.groupBy("b").agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") <= maxBasketSize)
      .select("b")
    // four consumers (basket count, item margins, both join sides) —
    // materialize once or each re-runs the distinct + semi-join chain
    val pruned0 = inc.join(keep, Seq("b"), "left_semi")
    val pruned = if (materialize) pruned0.persist() else pruned0
    try {
      val nBaskets = pruned.select("b").distinct().count()
      val itemN = pruned.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
      val pairs = pruned
        .join(pruned.select(col("b"), col("i").as("i2")), "b")
        .filter(col("i") < col("i2"))
        .groupBy(col("i"), col("i2"))
        .agg(count(lit(1)).as("n_both"))
        .filter(col("n_both") >= minCount)
      val both = pairs.select(col("i").as("antecedent"),
          col("i2").as("consequent"), col("n_both"))
        .unionByName(pairs.select(col("i2").as("antecedent"),
          col("i").as("consequent"), col("n_both")))
      val rules = both
        .join(itemN.select(col("i").as("antecedent"),
          col("n_i").as("n_ante")), "antecedent")
        .join(itemN.select(col("i").as("consequent"),
          col("n_i").as("n_cons")), "consequent")
        .select(col("antecedent"), col("consequent"), col("n_both"),
          col("n_ante"), col("n_cons"),
          round(col("n_both").cast("double") / nBaskets, 6).as("support"),
          round(col("n_both").cast("double") / col("n_ante"), 6)
            .as("confidence"),
          round(lit(nBaskets).cast("double") * col("n_both") /
            (col("n_ante").cast("double") * col("n_cons")), 6).as("lift"))
      // eager rule-frame materialization (rule frame is surviving-pair-
      // sized, far smaller than the incidence frame) so `pruned` can be
      // released before returning; localCheckpoint blocks are reclaimed
      // by the ContextCleaner once the caller drops the frame.
      if (materialize) rules.localCheckpoint(true) else rules
    } finally if (materialize) pruned.unpersist(blocking = false)
  }

  /** Apriori frequent itemsets through size 3 — [[associationRules]]'
    * lattice extension (rules stop at pairs; basket analyses routinely
    * want the triple tier: bundle design, co-failure diagnosis).
    * Anti-monotone pruning level by level: items below `minCount` leave
    * the incidence frame before the pair join, pair matches below it
    * leave before the triple join — the same frontier discipline as
    * [[SeqMine.prefixSpan]], unordered. The per-basket fan-out is
    * bounded by the same `maxBasketSize` cap as the rules path (one
    * degenerate mega-basket would otherwise go quadratic/cubic).
    *
    * Support = number of DISTINCT baskets containing the set; itemsets
    * render canonically ascending, so every level's frame has exact
    * integer counts and a total output order.
    *
    * @return (itemset, size, support) — itemset = ","-joined ascending
    *         items, size 1..3
    */
  def frequentItemsets(df: DataFrame, basketCol: String, itemCol: String,
      minCount: Long, maxBasketSize: Int = 200): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(maxBasketSize >= 3, "maxBasketSize must be >= 3")
    val inc = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
    val keep = inc.groupBy("b").agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") <= maxBasketSize)
      .select("b")
    val pruned = inc.join(keep, Seq("b"), "left_semi").persist()
    try {
      val l1 = pruned.groupBy("i").agg(count(lit(1)).as("support"))
        .filter(col("support") >= minCount)
        .localCheckpoint(true)
      val pf = pruned.join(l1.select("i"), Seq("i"), "left_semi")
        .persist()
      try {
        val p2 = pf
          .join(pf.select(col("b"), col("i").as("i2")), "b")
          .filter(col("i") < col("i2"))
        val l2 = p2.groupBy("i", "i2").agg(count(lit(1)).as("support"))
          .filter(col("support") >= minCount)
          .localCheckpoint(true)
        val p2f = p2.join(l2.select("i", "i2"), Seq("i", "i2"),
          "left_semi")
        val l3 = p2f
          .join(pf.select(col("b"), col("i").as("i3")), "b")
          .filter(col("i3") > col("i2"))
          .groupBy("i", "i2", "i3").agg(count(lit(1)).as("support"))
          .filter(col("support") >= minCount)
          .localCheckpoint(true)
        l1.select(col("i").cast("string").as("itemset"),
            lit(1).as("size"), col("support"))
          .unionByName(l2.select(
            concat_ws(",", col("i"), col("i2")).as("itemset"),
            lit(2).as("size"), col("support")))
          .unionByName(l3.select(
            concat_ws(",", col("i"), col("i2"), col("i3")).as("itemset"),
            lit(3).as("size"), col("support")))
      } finally pf.unpersist(blocking = false)
    } finally pruned.unpersist(blocking = false)
  }
}
