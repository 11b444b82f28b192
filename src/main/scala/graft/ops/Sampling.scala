package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-keyed dataset splitting and sampling.
  *
  * Training pipelines must NOT split with `rand()`: random splits change
  * under re-runs, re-partitioning, and engine upgrades, and duplicate
  * content lands in different splits (train/test contamination). Keying
  * the split on a content digest fixes all three — the same document
  * always lands in the same split, on any engine that computes the same
  * digest — and executes as a pure projection: no shuffle, no state,
  * trivially parallel at any scale.
  *
  * Mechanism: the last hex digit of md5(content) gives 16 uniform buckets;
  * cut points on the digit assign split names by 16ths.
  */
object Sampling {

  /** Split-label column from `content`: `cuts` are (name, weight) pairs
    * with weights in 16ths summing to 16 — e.g.
    * `Seq("train" -> 12, "val" -> 2, "test" -> 2)` for 75/12.5/12.5.
    *
    * NULL content is routed explicitly: it behaves as the LOWEST bucket, so
    * it lands in the FIRST split here and is KEPT by
    * [[deterministicSample]] — consistent across both (previously null fell
    * through every `when` into the LAST split while the sample dropped it,
    * silently contaminating the test split with null docs).
    */
  def splitColumn(content: Column, cuts: Seq[(String, Int)]): Column = {
    require(cuts.size >= 2, "need at least two splits")
    require(cuts.forall(_._2 > 0) && cuts.map(_._2).sum == 16,
      "split weights are 16ths and must sum to 16")
    val hex = "0123456789abcdef"
    val digit = coalesce(substring(md5(content), 32, 1), lit("0"))
    val bounds = cuts.init.scanLeft(0)(_ + _._2).tail.map(i => hex(i).toString)
    val first = when(digit < lit(bounds.head), lit(cuts.head._1))
    cuts.init.tail.zip(bounds.tail).foldLeft(first) {
      case (acc, ((name, _), bound)) => acc.when(digit < lit(bound), lit(name))
    }.otherwise(lit(cuts.last._1))
  }

  /** Attach a deterministic split label keyed on `contentCol`. */
  def withSplit(df: DataFrame, contentCol: String, outCol: String,
      cuts: Seq[(String, Int)] =
        Seq("train" -> 12, "val" -> 2, "test" -> 2)): DataFrame =
    df.withColumn(outCol, splitColumn(col(contentCol), cuts))

  /** Deterministic fractional sample: keep rows whose content digest falls
    * in the first `sixteenths`/16 of the bucket space. Content-keyed like
    * [[withSplit]] — duplicates are kept or dropped together, and NULL
    * content behaves as the lowest bucket (kept), matching [[splitColumn]].
    */
  def deterministicSample(df: DataFrame, contentCol: String,
      sixteenths: Int): DataFrame = {
    require(sixteenths >= 1 && sixteenths <= 16)
    if (sixteenths == 16) df
    else df.filter(
      coalesce(substring(md5(col(contentCol)), 32, 1), lit("0")) <
        lit("0123456789abcdef"(sixteenths).toString))
  }

  /** Stratified deterministic sample: each stratum keeps its OWN
    * `sixteenths`/16 fraction (the per-class rebalancing move a training
    * pipeline makes — e.g. downsample the dominant language), keyed on the
    * content digest exactly like [[deterministicSample]]: duplicates stay
    * together, re-runs and re-partitionings are stable, and the whole thing
    * is a pure projection + filter — no shuffle, no `sampleBy` RNG state.
    * Strata absent from `fractions` keep `defaultSixteenths` (0 = dropped;
    * 16 = kept whole).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, contentCol: String,
      fractions: Map[String, Int], defaultSixteenths: Int = 0): DataFrame = {
    require((fractions.values ++ Seq(defaultSixteenths)).forall(v => v >= 0 && v <= 16),
      "per-stratum fractions are sixteenths in [0, 16]")
    // 17-char grid: 'g' > 'f' keeps the whole stratum at 16/16
    val hex = "0123456789abcdefg"
    val digit = coalesce(substring(md5(col(contentCol)), 32, 1), lit("0"))
    val bound = fractions.toSeq.sortBy(_._1).foldLeft(
      lit(hex(defaultSixteenths).toString)) { case (acc, (stratum, v)) =>
      when(col(strataCol) === lit(stratum), lit(hex(v).toString)).otherwise(acc)
    }
    df.filter(digit < bound)
  }

  /** EXACT-count stratified holdout split — [[stratifiedSample]]'s
    * sixteenths are a per-row Bernoulli (stratum counts only
    * approximate the fraction); evaluation protocols routinely need the
    * test count exact per stratum. Rows rank within their stratum by
    * md5(id) — content-keyed, so the split is reproducible on any
    * engine/partitioning — and the first round(n_s·frac) ranks land in
    * the test split. ONE stratum-partitioned rank window over the data
    * plus a window count: no collect, no second scan.
    *
    * @param idCol unique id (md5 rank ties broken by id — total order)
    * @return input columns + (split) with split ∈ {test, train};
    *         per stratum exactly round(n_s·testFrac) test rows
    */
  def stratifiedExactSplit(df: DataFrame, strataCols: Seq[String],
      idCol: String, testFrac: Double): DataFrame = {
    require(strataCols.nonEmpty, "need at least one stratum column")
    require(testFrac > 0 && testFrac < 1,
      s"need 0 < testFrac < 1, got $testFrac")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
    df.withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wc))
      .withColumn("split",
        when(col("__rk") <= round(col("__n") * testFrac).cast("long"),
          lit("test")).otherwise(lit("train")))
      .drop("__rk", "__n")
  }

  /** Deterministic negative sampling for retrieval/recommendation
    * training pairs: for every user with at least one positive, draw k
    * pseudo-random candidate items by hashing (user, slot), keep those
    * that exist in the catalog, and drop accidental positives — the
    * (user, item⁻) complement set skip-gram-style training consumes.
    *
    * The draw is md5(user || '#' || slot) mod `maxItemId` — content-keyed
    * like every split in this engine, so the sample is reproducible
    * row-by-row on any engine and any partitioning. Slots that hash to a
    * nonexistent id or to a true positive are DROPPED, not redrawn
    * (expected yield is k·|catalog|/maxItemId minus the positive-hit
    * rate; pass a dense id space for ≈k per user). No window, no
    * driver state: one explode, one semi-join against the catalog, one
    * anti-join against the positives.
    *
    * @param items     catalog frame carrying `itemCol` (ids in
    *                  [1, maxItemId])
    * @param maxItemId modulus for the hash draw
    * @return (userCol, slot, itemCol) — the sampled negatives
    */
  def negativeSample(positives: DataFrame, items: DataFrame,
      userCol: String, itemCol: String, k: Int,
      maxItemId: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxItemId >= 1, s"maxItemId must be >= 1, got $maxItemId")
    val users = positives.select(col(userCol)).distinct()
    val cand = users
      .withColumn("slot", explode(sequence(lit(1), lit(k))))
      .withColumn(itemCol,
        pmod(conv(substring(md5(concat(col(userCol).cast("string"),
          lit("#"), col("slot").cast("string"))), 1, 15), 16, 10)
          .cast("long"), lit(maxItemId)) + 1L)
    cand
      .join(items.select(col(itemCol)).distinct(), Seq(itemCol), "left_semi")
      .join(positives.select(col(userCol), col(itemCol)).distinct(),
        Seq(userCol, itemCol), "left_anti")
      .select(col(userCol), col("slot"), col(itemCol))
  }

  /** Class-balancing oversampler: replicate each minority-class row so
    * every class's expected total matches the majority class — the
    * standard imbalanced-training rebalance, deterministic instead of
    * random.
    *
    * Each row gets `floor(target/n_c)` copies plus one more when its
    * md5-uniform falls below the fractional remainder `(target mod
    * n_c)/n_c` — content-keyed Bernoulli rounding, so the per-class
    * expected total is exactly `target` (= the max class size) and the
    * result is reproducible row-by-row on any engine. This is a PURE
    * per-row decision off one broadcast class-count frame + an `explode`
    * — no per-class window, no data-sized single task, repartition-proof
    * (the scale trade: totals are exact-in-expectation, ±O(√n_c) in
    * realization; an exact-total variant needs a per-class rank).
    *
    * @return input rows replicated, with `copy` (1-based replica index)
    */
  def oversample(df: DataFrame, classCol: String, idCol: String): DataFrame = {
    val counts = df.groupBy(col(classCol)).agg(count(lit(1)).as("__n"))
    val target = counts.agg(max("__n").as("__target"))
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("double") + 0.5) / math.pow(16.0, 15)
    df.join(broadcast(counts), Seq(classCol))
      .crossJoin(broadcast(target))
      .withColumn("__copies",
        (col("__target").cast("long") / col("__n")).cast("long") +
          when(u < (col("__target") % col("__n")).cast("double") /
            col("__n").cast("double"), 1L).otherwise(0L))
      .withColumn("copy", explode(sequence(lit(1L), col("__copies"))))
      .drop("__n", "__target", "__copies")
  }

  /** Per-key quota cap: keep at most `maxPerKey` rows per `keyCol`,
    * selected deterministically by digest order of `idCol` (so the kept
    * subset is a stable uniform-ish sample of each key, not "whatever rows
    * the scan met first"). The domain-balancing move a corpus pipeline
    * makes when one source would otherwise swamp the mix — the hard-count
    * twin of [[stratifiedSample]]'s fractional form.
    *
    * ONE keyed window shuffle; the sort key is (md5(id), id), so the
    * selection is total-ordered and engine-reproducible. Keys with fewer
    * than `maxPerKey` rows pass through whole.
    */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String,
      maxPerKey: Int): DataFrame = {
    require(maxPerKey >= 1, "maxPerKey must be >= 1")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerKey)
      .drop("__rn")
  }

  /** Temperature-based mixture weights over a domain column — the standard
    * corpus-mixing recipe (sampling probability ∝ massᵅ, α in (0, 1]
    * flattening the natural distribution so huge domains stop dominating;
    * α = 1 reproduces natural sampling, α → 0 approaches uniform).
    *
    * One grouped aggregation computes each domain's document count and
    * unit mass (tokens, chars — whatever `sizeCol` measures); the α-power
    * normalization runs as window sums over the tiny per-domain frame
    * (|domains| rows — the empty-frame window is a single-partition pass
    * over that frame, not over the corpus).
    *
    * @param budget total units to draw for one training mix; per-domain
    *               `epochs` = budget × weight / mass says how many times
    *               that domain is traversed (> 1 ⇒ upsampled repeats).
    * @return (domain, n_docs, n_units, natural_frac, weight, epochs)
    */
  def mixtureWeights(df: DataFrame, domainCol: String, sizeCol: String,
      alpha: Double, budget: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val byDomain = df.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(sizeCol).cast("double")).as("n_units"))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    byDomain
      .withColumn("natural_frac", col("n_units") / sum("n_units").over(all))
      .withColumn("weight",
        pow(col("n_units"), alpha) / sum(pow(col("n_units"), alpha)).over(all))
      .withColumn("epochs", lit(budget) * col("weight") / col("n_units"))
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006: draw u_i uniform, keep the k largest u_i^(1/w_i) —
    * every subset lands with its exact WSWOR probability). The uniform is
    * content-keyed instead of random — u = (md5-derived 60-bit int + ½)/2⁶⁰
    * — so the sample is reproducible on any engine computing the same
    * digest (the [[splitColumn]] philosophy applied to weighted draws).
    *
    * Ordering key: −ln(u)/w ascending (monotone transform of the ES key,
    * float-safe — no pow underflow for tiny weights), tie-broken on
    * `idCol`. One global top-k = `orderBy.limit` (Spark plans TakeOrdered:
    * per-partition heaps, never a full sort-shuffle).
    *
    * @param weightCol strictly positive weights (rows with NULL/≤0 weight
    *                  are dropped — they have no draw probability)
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = col(weightCol).cast("double")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("double") + 0.5) / math.pow(16.0, 15)
    df.filter(w.isNotNull && w > 0)
      .withColumn("__es_key", -log(u) / w)
      .orderBy(col("__es_key"), col(idCol))
      .limit(k)
      .drop("__es_key")
  }

  /** Per-key top-p ("nucleus") selection: within each key, keep the
    * heaviest rows until they jointly cover fraction `p` of the key's
    * total mass — the quality-weighted quota a mixing pipeline uses when
    * "top N documents per source" should flex with how concentrated each
    * source is. A row is kept while the mass STRICTLY BEFORE it (weight
    * desc, then `idCol` for a total order) is < p·total, so the row that
    * crosses the threshold is included and every key keeps ≥ 1 row.
    *
    * ONE keyed window shuffle (partitioned by key — parallel across keys);
    * deterministic for any (weight, id) data.
    */
  def topPMass(df: DataFrame, keyCol: String, weightCol: String,
      idCol: String, p: Double): DataFrame = {
    require(p > 0.0 && p <= 1.0, s"p must be in (0, 1], got $p")
    val w = col(weightCol).cast("double")
    val win = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
      .orderBy(w.desc, col(idCol))
    val winAll = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    df.withColumn("__before", coalesce(sum(w).over(
        win.rowsBetween(Long.MinValue, -1)), lit(0.0)))
      .withColumn("__total", sum(w).over(winAll))
      .filter(col("__before") < lit(p) * col("__total"))
      .drop("__before", "__total")
  }

  /** Token-budget selection: within each key (source/domain), keep rows in
    * md5(id) order until the running token total reaches that key's
    * budget — the "draw B tokens from this source" primitive a data mix
    * executes after [[mixtureWeights]] has decided the budgets. A row is
    * kept while the tokens STRICTLY BEFORE it are < budget, so the row
    * crossing the budget line is the last one in (and a key always
    * contributes ≥ 1 row) — the same boundary rule as [[topPMass]].
    *
    * ONE keyed window shuffle; md5-order selection makes the subset a
    * stable uniform-ish draw, not scan order, and identical on any
    * engine/partitioning.
    *
    * @param budgets (key → token budget); keys absent from the map are
    *                dropped (a mix only reads the sources it budgets)
    */
  def tokenBudget(df: DataFrame, keyCol: String, idCol: String,
      tokensCol: String, budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty, "empty budget map")
    val s = df.sparkSession
    import s.implicits._
    val b = budgets.toSeq.toDF(keyCol + "_b", "__budget")
    val win = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    df.join(broadcast(b), col(keyCol) === col(keyCol + "_b"))
      .drop(keyCol + "_b")
      .withColumn("__before", coalesce(sum(col(tokensCol)).over(
        win.rowsBetween(Long.MinValue, -1)), lit(0L)))
      .filter(col("__before") < col("__budget"))
      .drop("__before", "__budget")
  }

  /** Temporal train/val/test split: rows are labeled by WHERE their
    * timestamp falls in the time distribution — train = earliest
    * `cuts(0)._2` fraction, and so on — the leakage-safe split for
    * forecasting/ranking data where a random split would let the future
    * into training. The boundary is the timestamp's ECDF (P(X ≤ x), ties
    * share one value — SQL `cume_dist`), computed scale-safely: epoch
    * MICROSECONDS (exact longs, no double-seconds precision cliff),
    * distinct-collapse + the two-level [[Cumulative]] pass, value join
    * left to AQE. A row goes to the FIRST split whose cumulative fraction
    * covers its ECDF, so fractions that don't sum to 1 leave a tail in
    * the last split.
    *
    * @param cuts (label, fraction) in time order, fractions summing to 1
    */
  def temporalSplit(df: DataFrame, tsCol: String,
      cuts: Seq[(String, Double)], outputCol: String = "split"): DataFrame = {
    require(cuts.nonEmpty, "empty cuts")
    require(math.abs(cuts.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val e = unix_micros(col(tsCol))
    val byV = df.select(e.as("__v")).groupBy("__v")
      .agg(count(lit(1)).as("__cnt"))
    val withCum = Cumulative.runningSums(byV, "__v", Seq("__cnt"))
    val total = byV.agg(sum("__cnt").as("__n"))
    val mapped = withCum.crossJoin(broadcast(total))
      .select(col("__v"),
        (col("__cnt_cum").cast("double") / col("__n")).as("__ecdf"))
    // cumulative thresholds on a 12-decimal grid: 0.7 + 0.2 in binary is
    // 0.8999…, but an engine-side literal (and the oracle) writes 0.9 —
    // snap so both sides compare ecdf against the identical double
    val cum = cuts.scanLeft(0.0)(_ + _._2).tail
      .map(c => BigDecimal(c).setScale(12,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    val label = cuts.init.zip(cum.init).foldRight(
      lit(cuts.last._1): org.apache.spark.sql.Column) {
      case (((name, _), c), rest) => when(col("__ecdf") <= c, name).otherwise(rest)
    }
    df.join(mapped, e <=> col("__v"))
      .withColumn(outputCol, label)
      .drop("__v", "__ecdf")
  }

  /** Disjoint-block subsample confidence interval ("bag of little means"):
    * every row lands in exactly one of `blocks` md5-assigned blocks, the
    * per-block means are computed in ONE grouped aggregation, and the
    * spread of block means estimates the standard error of the overall
    * mean — se = sd(block means)/√B for equal-sized random blocks. The
    * one-pass, resample-free alternative to bootstrap at 100 TB: no data
    * is read twice, no replicate weighting, and the block assignment is
    * content-keyed so the interval is reproducible.
    *
    * @return one row (mean, se, ci_lo, ci_hi, n_rows, n_blocks) with a
    *         normal-approximation `z`·se interval around the overall mean
    */
  def blockMeansCI(df: DataFrame, idCol: String, valueCol: String,
      blocks: Int = 32, z: Double = 1.96): DataFrame = {
    require(blocks >= 2, s"need blocks >= 2, got $blocks")
    val x = col(valueCol).cast("double")
    val blk = pmod(conv(substring(md5(col(idCol).cast("string")
      .cast("binary")), 1, 15), 16, 10).cast("long"), lit(blocks))
    val per = df.filter(x.isNotNull)
      .select(blk.as("__b"), x.as("__x"))
      .groupBy("__b").agg(count(lit(1)).as("__n"), avg("__x").as("__m"))
    // B-row frame: overall mean weighted by block sizes (= exact overall
    // mean), block-mean variance for the se
    per.agg(
      (sum(col("__m") * col("__n")) / sum("__n")).as("mean"),
      (stddev_samp("__m") / sqrt(count(lit(1)))).as("se"),
      sum("__n").as("n_rows"), count(lit(1)).as("n_blocks"))
      .select(col("mean"), col("se"),
        (col("mean") - lit(z) * col("se")).as("ci_lo"),
        (col("mean") + lit(z) * col("se")).as("ci_hi"),
        col("n_rows"), col("n_blocks"))
  }

  /** Greedy k-center (farthest-point) selection over an embedding
    * column — the coreset / diversity-sampling pass (pick k rows that
    * spread over the embedding space; the classic 2-approximation to
    * the k-center objective). Start from the deterministic (md5(id), id)
    * minimum (the repo's content-keyed seed convention), then k−1 times
    * take the row farthest from everything selected so far.
    *
    * Distributed shape: the candidate frame persists with a running
    * min-distance column; each round adds ONE literal-centroid
    * `array_dot` distance (codegen'd projection) and takes the argmax
    * with a (dist desc, id) TakeOrdered — k scans, never a pairwise
    * matrix. Selected vectors are driver state (k × dim doubles).
    *
    * @return (idCol, pick_order, min_dist) for the k selected rows —
    *         min_dist is the squared distance to the nearest EARLIER
    *         pick (0 for the seed)
    */
  def kCenter(df: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    val spark = df.sparkSession
    import org.apache.spark.storage.StorageLevel
    val base = df
      .select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__x"))
      .filter(col("__x").isNotNull)
      .withColumn("__xx", call_function("array_dot", col("__x"), col("__x")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val seed = base
        .orderBy(md5(col("__id").cast("string").cast("binary")), col("__id"))
        .select("__id", "__x").head()
      var picks = Vector((seed.get(0), 0.0))
      var centers = Vector(seed.getSeq[Double](1).toArray)
      var cur = base.withColumn("__d", distTo(centers.last))
      for (_ <- 1 until k) {
        val far = cur.orderBy(col("__d").desc, col("__id"))
          .select("__id", "__x", "__d").head()
        picks :+= ((far.get(0), far.getDouble(2)))
        centers :+= far.getSeq[Double](1).toArray
        cur = cur.withColumn("__d",
          least(col("__d"), distTo(centers.last)))
      }
      val out = picks.zipWithIndex.map { case ((id, d), i) => (i, d, id) }
      spark.createDataFrame(spark.sparkContext.parallelize(out.map {
          case (i, d, id) => org.apache.spark.sql.Row(id, i, d) }),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(idCol,
            df.schema(idCol).dataType),
          org.apache.spark.sql.types.StructField("pick_order",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("min_dist",
            org.apache.spark.sql.types.DoubleType, nullable = false))))
    } finally base.unpersist()
  }

  /** ||x - c||^2 = x.x - 2 x.c + c.c against a literal center. */
  private def distTo(c: Array[Double]): org.apache.spark.sql.Column = {
    val cLit = array(c.map(lit): _*)
    val cc = c.map(v => v * v).sum
    greatest(lit(0.0), col("__xx") -
      lit(2.0) * call_function("array_dot", col("__x"), cLit) + lit(cc))
  }

  /** Mixture-budget solver: given a token budget (a fraction of the
    * corpus) and per-source target shares, compute each source's
    * sampling rate — the curriculum/mixture step of training-data
    * assembly ("web 60%, code 30%, papers 10%, N tokens total").
    *
    * rate_s = min(1, share_s · budget / tokens_s): a source without
    * enough tokens to fill its share caps at 1 (take everything); the
    * realized mixture then undershoots that share — reported via
    * `expected_tokens` so the caller can re-normalize or re-weigh.
    *
    * ONE aggregation collapses the corpus to the per-source count frame
    * (source-cardinality-sized); the budget arithmetic joins via a
    * broadcast one-row total. Apply the rates with
    * [[stratifiedSample]] (content-keyed, reproducible).
    *
    * @param budgetFrac   target total = budgetFrac · total corpus tokens
    * @param targetShares per-source share of the budget (need not cover
    *                     every source — absent sources get share 0);
    *                     None = equal shares across observed sources
    * @return per source: (sourceCol, n_docs, n_tokens, target_share,
    *         rate, expected_tokens) — rate/share on the 6-digit grid,
    *         expected_tokens = round(rate · n_tokens)
    */
  def mixtureRates(df: DataFrame, sourceCol: String, textCol: String,
      budgetFrac: Double,
      targetShares: Option[Map[String, Double]] = None): DataFrame = {
    require(budgetFrac > 0, "budgetFrac must be positive")
    targetShares.foreach { m =>
      require(m.values.forall(_ >= 0), "shares must be non-negative")
      require(math.abs(m.values.sum - 1.0) < 1e-9, "shares must sum to 1")
    }
    val nTok = size(filter(split(col(textCol), "\\s+"), t => t =!= ""))
    // fan out before the per-row token count (r13 class)
    val bySrc = fanOut(df).groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum(nTok).as("n_tokens"))
    val tot = bySrc.agg(sum("n_tokens").as("__tot"),
      count(lit(1)).as("__nsrc"))
    val share = targetShares match {
      case Some(m) =>
        m.foldLeft(lit(0.0)) { case (acc, (s, w)) =>
          when(col(sourceCol) === lit(s), lit(w)).otherwise(acc) }
      case None => lit(1.0) / col("__nsrc").cast("double")
    }
    val budget = lit(budgetFrac) * col("__tot").cast("double")
    val rate = least(lit(1.0),
      share * budget / col("n_tokens").cast("double"))
    bySrc.crossJoin(broadcast(tot))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        round(share, 6).as("target_share"),
        round(rate, 6).as("rate"),
        round(rate * col("n_tokens").cast("double")).cast("long")
          .as("expected_tokens"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how much more likely its hashed-unigram bag is under
    * the TARGET corpus' distribution than under the raw corpus' own —
    * the principled "pick web documents that look like the high-quality
    * target" selector, next to [[mixtureRates]]' coarse per-source knob.
    *
    * Tokens map to `buckets` hashed features (md5-mod-D, the
    * [[graft.ops.TextOps.hashingTf]] mapping — engine-reproducible, no
    * vocabulary state); each bucket's add-1-smoothed log-likelihood
    * ratio λ_b = ln p̂_target(b) − ln p̂_raw(b) is quantized to an
    * integer micro-nat grid, so per-document weights are EXACT integer
    * sums — order-independent on any partitioning (the float-sum
    * nondeterminism that plagues naive implementations never arises).
    *
    * Scale shape: TWO bucket-collapse aggregations (≤ `buckets` rows
    * each) build the λ table, which broadcast-joins (bounded size) into
    * ONE explode + per-doc sum over the raw corpus — token-keyed
    * shuffles only, no driver state, no vocabulary discovery job.
    *
    * @param buckets hashed feature dimension (DSIR uses 10k at web
    *                scale; collisions bias both corpora identically)
    * @return one row per raw doc: (idCol, n_tokens, logw_micro) —
    *         logw_micro = Σ_tokens round(λ_bucket(token)·1e6); docs with
    *         no tokens keep weight 0
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 512): DataFrame = {
    require(buckets >= 2, s"need buckets >= 2, got $buckets")
    val toks = (c: Column) => filter(split(c, "\\s+"), t => t =!= "")
    val bucket = (c: Column) =>
      pmod(conv(substring(md5(c), 1, 15), 16, 10).cast("long"),
        lit(buckets.toLong))
    def bucketCounts(df: DataFrame, cnt: String): DataFrame = fanOut(df)
      .select(explode(toks(col(textCol))).as("__t"))
      .select(bucket(col("__t")).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as(cnt))
    val tc = bucketCounts(target, "__ct")
    val rc = bucketCounts(raw, "__cr")
    // totals as one-row frames; the bucket domain is materialized in
    // full so absent buckets still carry their add-1 smoothing mass
    val tot = tc.agg(sum("__ct").as("__nt"))
      .crossJoin(rc.agg(sum("__cr").as("__nr")))
    val dom = raw.sparkSession.range(buckets).selectExpr("id AS __b")
    // λ_b in micro-nats; expression shape mirrored verbatim in oracles
    val lam = dom
      .join(tc, Seq("__b"), "left").join(rc, Seq("__b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("__b"),
        round((log(coalesce(col("__ct"), lit(0L)) + lit(1.0)) -
               log(col("__nt") + lit(buckets.toDouble)) -
               log(coalesce(col("__cr"), lit(0L)) + lit(1.0)) +
               log(col("__nr") + lit(buckets.toDouble))) * lit(1e6))
          .cast("long").as("__lw"))
    val perTok = fanOut(raw)
      .select(col(idCol), explode(toks(col(textCol))).as("__t"))
      .select(col(idCol), bucket(col("__t")).as("__b"))
      .join(broadcast(lam), Seq("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum("__lw").as("logw_micro"))
    raw.select(col(idCol)).join(perTok, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("logw_micro"), lit(0L)).as("logw_micro"))
  }

  /** 2-D raking / iterative proportional fitting (Deming & Stephan
    * 1940): per-(a, b) cell weights scaled in alternating passes until
    * the WEIGHTED marginals match the target shares on both dimensions —
    * the corpus-mixture balancer when two attributes (language × source,
    * domain × time-bucket) must hit target shares SIMULTANEOUSLY and the
    * 1-D [[mixtureRates]] knob can't (scaling one margin un-scales the
    * other; IPF alternates until both hold).
    *
    * Scale shape: ONE cell aggregation collapses the corpus to the
    * (a, b) cell-count frame — bounded by the level-product, enforced by
    * `maxCells` — and the IPF rounds run on those driver rows (the
    * ≤nBins-frame discipline of isotonic/PAV). Apply the returned
    * per-cell weights with [[stratifiedSample]] keyed on (a, b), or as a
    * training-loss weight column via a broadcast join.
    *
    * Levels absent from a target map get share 0 (their cells rake to
    * weight 0). Every POSITIVE-share level must have data rows —
    * raking cannot conjure mass into an empty margin (require'd).
    *
    * @param targetA/targetB shares per level, each summing to 1
    * @param iters fixed IPF round count (deterministic; IPF converges
    *              geometrically when all positive-share margins overlap)
    * @return one row per observed cell: (aCol, bCol, n, weight) — a
    *         row-level multiplier; Σ_cells n·weight = Σ n, with weighted
    *         marginals at the targets on both dimensions
    */
  def rake2d(df: DataFrame, aCol: String, bCol: String,
      targetA: Map[String, Double], targetB: Map[String, Double],
      iters: Int = 10, maxCells: Int = 100000): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    Seq(("targetA", targetA), ("targetB", targetB)).foreach { case (n, m) =>
      require(m.nonEmpty && m.values.forall(_ >= 0) &&
        math.abs(m.values.sum - 1.0) < 1e-9, s"$n shares must sum to 1")
    }
    val spark = df.sparkSession
    val cells = df.groupBy(col(aCol).cast("string").as("__a"),
        col(bCol).cast("string").as("__b"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(cells.length <= maxCells,
      s"${cells.length} cells exceed maxCells=$maxCells — coarsen the levels")
    val total = cells.map(_._3).sum.toDouble
    val obsA = cells.map(_._1).toSet
    val obsB = cells.map(_._2).toSet
    require(targetA.forall { case (k, v) => v == 0.0 || obsA(k) },
      s"positive-share targetA levels missing from data: ${
        targetA.keys.filter(k => targetA(k) > 0 && !obsA(k)).mkString(",")}")
    require(targetB.forall { case (k, v) => v == 0.0 || obsB(k) },
      s"positive-share targetB levels missing from data: ${
        targetB.keys.filter(k => targetB(k) > 0 && !obsB(k)).mkString(",")}")
    var w = cells.map(_ => 1.0)
    for (_ <- 1 to iters) {
      val rowMass = cells.indices.groupBy(i => cells(i)._1)
        .map { case (a, is) => a -> is.map(i => w(i) * cells(i)._3).sum }
      w = cells.indices.toArray.map { i =>
        val m = rowMass(cells(i)._1)
        if (m > 0) w(i) * targetA.getOrElse(cells(i)._1, 0.0) * total / m
        else 0.0
      }
      val colMass = cells.indices.groupBy(i => cells(i)._2)
        .map { case (b, is) => b -> is.map(i => w(i) * cells(i)._3).sum }
      w = cells.indices.toArray.map { i =>
        val m = colMass(cells(i)._2)
        if (m > 0) w(i) * targetB.getOrElse(cells(i)._2, 0.0) * total / m
        else 0.0
      }
    }
    import spark.implicits._
    cells.zip(w).map { case ((a, b, n), wt) => (a, b, n, wt) }
      .toSeq.toDF(aCol, bCol, "n", "weight")
  }

  /** Top-k selection under [[importanceWeights]] (deterministic greedy
    * variant of DSIR's Gumbel resampling: rank by the exact integer
    * weight, id-tiebroken). Executes as TakeOrderedAndProject — a
    * per-partition top-k + driver merge of k·partitions rows, never a
    * global sort or single-task window.
    */
  def importanceSelect(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = 512): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    importanceWeights(raw, target, idCol, textCol, buckets)
      .orderBy(col("logw_micro").desc, col(idCol))
      .limit(k)
  }
}
