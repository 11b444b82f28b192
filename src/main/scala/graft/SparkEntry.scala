package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.glm.{Conformal, CrossVal, ElasticNet, Eval, Explain, GLM, Gram, GroupedGLM, GroupedLM, LM, ModelMatrix, Multinomial, NegBin, PCA, QuantReg, Robust, Survival, ZeroInfl}
import graft.ops.{AsofJoin, Assoc, Bpe, Causal, Cluster, Colloc, Consolidate, Contingency, Dedup, Diff, Drift, Encode, EventSeq, Factorize, FuzzyJoin, Graph, Hmm, Hypothesis, JoinOps, Matching, Merge, Mixture, Multimodal, NBayes, Ngram, Normalize, Outliers, Pack, Pareto, Preference, Profile, Quality, Quantize, Retrieval, Sampling, Segment, SeqMine, Shrink, Similarity, Sketch, SkipGram, Linkage, Skew, TextOps, TimeSeries, Topics, TopK, Tree, Unigram, Weighted, WordPiece}
import graft.streaming.StreamOps

/** Driver contract — the declared query surface checked against the DuckDB
  * oracle (SURVEY.md §2, §7 step 6).
  *
  * Conventions that make the hash-compare deterministic:
  *  - every aggregate / computed column is aliased identically in the Spark
  *    code and the oracle SQL (the driver sorts columns by name);
  *  - floating-point aggregates are rounded (aggregation order differs
  *    between engines; per-row arithmetic is bit-identical IEEE754 so
  *    unrounded per-row values are fine);
  *  - queries with a LIMIT order by a unique key so the selected row set is
  *    identical in both engines.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Events.readTable(s, s"$dir/$name.parquet")

  /** Events table: nanos→micros via the locked shared reader ([[Events]] —
    * the nanosAsLong conf is session-global, so the set → infer → restore
    * sequence must be a critical section under concurrent suites).
    */
  private def events(s: SparkSession, dir: String): DataFrame = Events.read(s, dir)

  private def r(c: Column, d: Int): Column = round(c, d)

  /** Fixed unigram segmentation vocab for q305 (integer micro-nat
    * scores — shared verbatim by the query and its oracle's VALUES
    * list; training itself is gated separately by q304).
    */
  private val unigramScores: Seq[(String, Long)] = Seq(
    "the" -> -3000000L, "ing" -> -3500000L, "ion" -> -4000000L,
    "ent" -> -4200000L, "er" -> -4300000L, "in" -> -4400000L,
    "an" -> -4500000L, "th" -> -4600000L, "re" -> -4700000L,
    "he" -> -4800000L, "on" -> -4900000L, "at" -> -5000000L,
    "e" -> -5200000L, "t" -> -5400000L, "a" -> -5500000L,
    "o" -> -5600000L, "i" -> -5700000L, "n" -> -5800000L,
    "s" -> -5900000L, "r" -> -6000000L, "h" -> -6100000L,
    "l" -> -6200000L, "d" -> -6300000L, "c" -> -6400000L,
    "u" -> -6500000L, "m" -> -6600000L)

  /** Fixed WordPiece segmentation vocab for q315 (shared verbatim by the
    * query and its oracle's VALUES list; training itself is gated
    * separately by q314). Deliberately covers: full-word pieces beating
    * char walks ("scan" > "s"+"##can"), 2-char starts beating 1-char
    * ("sp"/"st"/"so"/"sm" > "s"), a mid-word longest-match ("tab"+"##le"),
    * and an uncovered letter ("j") so "join" exercises the whole-word
    * [UNK] rule.
    */
  private val wordpieceVocab: Seq[String] = Seq(
    "a", "b", "c", "d", "f", "g", "h", "k", "l", "m", "o", "p", "q",
    "r", "s", "t", "v", "w", "sp", "st", "so", "sm", "tab", "scan",
    "##le", "##can", "##low", "##ast", "##ilter", "##gg", "##atch",
    "##ig", "##olumn", "##ustomer", "##ata", "##roup", "##ash", "##ey",
    "##ine", "##erge", "##rder", "##art", "##uery", "##ow", "##he",
    "##alue", "##ector", "##indow", "##ark", "##rt", "##all", "##ream")

  /** Round driver-side doubles the way SQL round does (half away from zero). */
  private def rd(v: Double, d: Int): Double =
    BigDecimal(v).setScale(d, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Flagship: LM fit + score pipeline on sf0.001 (driver smoke-checks rows>0). */
  def entry(spark: SparkSession): DataFrame = {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val m = LM.fit(li, Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice")
    m.predict(li).select(col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice"), col("prediction"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---------- classic relational operators over the TPC-H-ish tables ----------

    // TPC-H Q1 shape: scan → filter → hash agg. Filter + needed-columns-only
    // should both reach the parquet scan.
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-01-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          r(sum("l_quantity"), 2).as("sum_qty"),
          r(sum("l_extendedprice"), 2).as("sum_base_price"),
          // 4 decimals: the terms have exactly 4 decimal digits (2-decimal
          // price × 2-decimal discount), so the exact sum sits ON the
          // 4-decimal grid — rounding at 2 would cut into real digits and
          // flake on half-boundaries between engines.
          r(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
          // no avg outputs: sum/count of decimal-grid data can land exactly
          // ON a rounding half-boundary (e.g. 2-decimal sums over 2^k-sized
          // groups), where engine-dependent summation order flips the result
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // selective filter + projection + per-row computed column (no agg — rows
    // compare bit-identically)
    "q02_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_discount") >= 0.08)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"),
          // no rounding: per-row IEEE754 arithmetic is bit-identical across
          // engines; rounding would ADD half-boundary flake risk
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // TPC-H Q3 shape: 3-way join, agg, top-10 by revenue (unique-key tiebreak)
    "q03_join_topk" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1999-01-01"))
      // customer scales with SF and the segment filter only trims 5x —
      // no broadcast hint; planner stats pick broadcast at small SF and a
      // keyed shuffle join at scale
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1999-01-01"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey")
        .agg(r(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: snowflake join down to region, broadcast small dims
    "q04_nation_revenue" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val rg = t(s, dir, "region")
      // customer grows with SF (15B rows at 100 TB) — no broadcast hint;
      // only fixed-cardinality nation/region are hinted
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(rg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(r(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }),

    // window: per-customer top-3 orders by totalprice (unique tiebreak)
    "q05_window_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    // window: running sum over event time per user (deterministic FP order)
    "q06_window_running" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        .withColumn("running_value", r(sum("value").over(w), 4))
        .select("event_id", "user_id", "running_value")
        .orderBy("user_id", "event_id")
    }),

    // set operations: symmetric difference of two customer-key sets
    "q07_setops" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val big = o.groupBy("o_custkey").agg(sum("o_totalprice").as("tp"))
        .filter(col("tp") > 3000000.0).select(col("o_custkey").as("custkey"))
      val building = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      big.except(building).unionAll(building.except(big))
        .distinct().orderBy("custkey")
    }),

    // grouping sets: rollup with grand total
    "q08_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(r(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // scalar-function projection (string/math built-ins)
    "q09_scalar_fns" -> ((s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        length(col("p_name")).cast("long").as("name_len"),
        r(col("p_retailprice") * 1.1, 2).as("inflated"),
        substring(col("p_type"), 1, 5).as("type5"),
        (col("p_size") % 7).as("size_mod"),
        abs(col("p_size") - 25).as("size_dev"),
        concat(col("p_brand"), lit("-"), col("p_type")).as("brand_type"))
        .orderBy("p_partkey")
    }),

    // count distinct + having
    "q10_distinct_having" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
        .filter(col("n_rows") > 100)
        .orderBy("l_returnflag")
    }),

    // event-time tumbling window (batch): hourly per-type counts
    "q11_events_hourly" -> ((s, dir) => {
      events(s, dir)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          r(sum("value"), 4).as("sum_value"))
        .orderBy("hour", "event_type")
    }),

    // anti join: customers with no orders
    "q12_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    // semi join: suppliers that shipped at least one high-quantity item
    "q13_semi_join" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val l = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
      sup.join(l, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name").orderBy("s_suppkey")
    }),

    // ---------- GLM surface (SURVEY.md §2a) ----------

    // O1-O3 modelMatrix: lexicographic k-1 dummy encoding, all-double cast
    "q14_model_matrix" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .select("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
      ModelMatrix.encode(c).orderBy("c_custkey")
    }),

    // O4 matchCols: align scoring frame to training columns (missing → 0.0)
    "q15_match_cols" -> ((s, dir) => {
      val c = t(s, dir, "customer").select("c_custkey", "c_acctbal")
      ModelMatrix.matchCols(Seq("c_acctbal", "extra_feat"), c)
        .select("c_custkey", "c_acctbal", "extra_feat").orderBy("c_custkey")
    }),

    // O5 naDrop (tables are null-free, so this must be the identity row set)
    "q16_na_drop" -> ((s, dir) => {
      ModelMatrix.naDrop(t(s, dir, "supplier")).orderBy("s_suppkey")
    }),

    // O7 Gram/normal-equation aggregation: moment matrix of
    // (1, l_quantity, l_discount) vs y = l_extendedprice/1000, as averages
    "q17_gram_moments" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val g = Gram.normal(li,
        Seq(lit(1.0), col("l_quantity"), col("l_discount")),
        col("l_extendedprice") / 1000.0)
      val n = g.n.toDouble
      import s.implicits._
      Seq((rd(g.xtx(0, 1) / n, 6), rd(g.xtx(0, 2) / n, 6), rd(g.xtx(1, 1) / n, 6),
        rd(g.xtx(1, 2) / n, 6), rd(g.xtx(2, 2) / n, 6),
        rd(g.xty(0) / n, 6), rd(g.xty(1) / n, 6), rd(g.xty(2) / n, 6),
        rd(g.yty / n, 6), g.n))
        .toDF("m_x1", "m_x2", "m_x1x1", "m_x1x2", "m_x2x2",
          "v_0", "v_1", "v_2", "m_yy", "n_rows")
    }),

    // O8-O12 LM fit: coefficients + R² (oracle: closed-form 2-regressor
    // normal equations over the same moments)
    "q18_lm_coefs" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val m = LM.fit(li, Seq("l_quantity", "l_discount"), "l_extendedprice")
      import s.implicits._
      Seq((rd(m.coefs(0), 3), rd(m.coefs(1), 3), rd(m.coefs(2), 3),
        rd(m.r2, 6), m.n))
        .toDF("b_intercept", "b_quantity", "b_discount", "r2", "n_rows")
    }),

    // O17/O20/O21/O23 link + deviance/Pearson expressions at a FIXED beta
    // (exercises logit inverse, variance, deviance columns end-to-end)
    "q19_glm_dev_fixed" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("y", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
      val eta = lit(-0.4) + col("l_quantity") * lit(0.01) + col("l_discount") * lit(-2.0)
      val mu = lit(1.0) / (lit(1.0) + exp(-eta))
      li.agg(
        r(avg(GLM.devExpr(col("y"), mu, lit(1.0))), 6).as("avg_dev"),
        r(avg((col("y") - mu) * (col("y") - mu) / GLM.varExpr(mu, lit(1.0))), 6).as("avg_pearson"),
        count(lit(1)).as("n_rows"))
    }),

    // O24-O28 full IRLS logit fit, hash-gated via the saturated-design
    // closed form (the q81 trick, r7 verdict #3): with ONE binary
    // regressor the logistic MLE is the cell-proportion logits —
    // b0 = logit(p̂_low), b1 = logit(p̂_high) − logit(p̂_low) — and the
    // deviance is −2Σ[k ln p̂ + (n−k) ln(1−p̂)], all exact SQL. The
    // continuous-covariate IRLS path keeps its R-golden unit tests.
    "q20_glm_coefs" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("is_r", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
        .withColumn("x_high", when(col("l_quantity") > 25, 1.0).otherwise(0.0))
      val m = GLM.fit(li, Seq("x_high"), "is_r")
      import s.implicits._
      Seq((rd(m.coefs(0), 6), rd(m.coefs(1), 6), rd(m.deviance, 4), m.n))
        .toDF("b_intercept", "b_x_high", "deviance", "n_rows")
    }),

    // ---------- training-data pipeline operators ----------

    // exact dedup by content digest
    "q21_dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text").orderBy("digest")
    }),

    // text quality statistics (pure column expressions)
    "q22_text_stats" -> ((s, dir) => {
      // fan out before the per-row stat kernels (r14: measured 37.4x at
      // 100x on the one-row-group source before this, SCALE.md)
      val d = graft.ops.fanOut(t(s, dir, "documents"))
      d.select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
        r(TextOps.punctRatio(col("text")), 6).as("punct_ratio"),
        r(TextOps.upperRatio(col("text")), 6).as("upper_ratio"),
        r(TextOps.avgWordLen(col("text")), 6).as("avg_word_len"),
        r(TextOps.qualityScore(col("text")), 6).as("quality"))
        .orderBy("doc_id")
    }),

    // language identification histogram
    "q23_lang_hist" -> ((s, dir) => {
      TextOps.withLangId(t(s, dir, "documents"), "text", "lang_pred")
        .groupBy("lang_pred").agg(count(lit(1)).as("n_docs"))
        .orderBy("lang_pred")
    }),

    // key-collision fingerprint (order/duplication-insensitive signature)
    "q24_fingerprint" -> ((s, dir) => {
      // fan out before the per-row normalize+sort kernel (r14: 53.7x at
      // 100x before, SCALE.md)
      graft.ops.fanOut(t(s, dir, "documents"))
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // n-gram Jaccard near-dup pairs. 5-gram shingles: the co-shingle
    // self-join is Σ df(sh)², and 5-grams are ~an order of magnitude rarer
    // than 3-grams — near-dup detection quality is equivalent at threshold
    // 0.5 (standard suffix-array dedup settings) with a far smaller join.
    "q25_jaccard_pairs" -> ((s, dir) => {
      // maxBucketSize raised far above the corpus sizes under test so the
      // result is exactly the full Jaccard relation the oracle computes
      // (the default cap is the at-scale skew guard)
      Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
          n = 5, threshold = 0.5, maxBucketSize = 100000)
        .select(col("id_a"), col("id_b"), r(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // MinHash-LSH near-dup candidates (xxhash64-based → rows-only check)
    "q26_minhash_pairs" -> ((s, dir) => {
      Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("id_a", "id_b")
    }),

    // SimHash near-dup pairs (xxhash64-based → rows-only check)
    "q27_simhash_pairs" -> ((s, dir) => {
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text", maxHamming = 8)
        .orderBy("id_a", "id_b")
    }),

    // brute-force cosine top-k over the embedding column (exact ANN baseline)
    "q28_ann_brute" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.bruteTopK(e, e.filter(col("vec_id") < 3), "vec_id", "embedding", 10)
        .orderBy("query_id", "rn")
    }),

    // LSH-bucketed approximate top-k (recall < 1 by design → rows-only)
    "q29_ann_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.lshTopK(e, e.filter(col("vec_id") < 3), "vec_id", "embedding", 10,
          nBits = 32, bands = 8)
        .orderBy("query_id", "rn")
    }),

    // IVF approximate top-k: k-means inverted lists, nProbe-list probing
    // (recall < 1 by design → rows-only; exactness at nProbe == nCentroids
    // asserted in SimilaritySpec)
    "q68_ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 3), "vec_id", "embedding", 10,
          nCentroids = 32, nProbe = 8)
        .orderBy("query_id", "rn")
    }),

    // multimodal plumbing: binary payload → header decode (magic-byte
    // sniff + PNG/JPEG/GIF/WAV container parse) + byte-distribution
    // features (byte-level decode has no DuckDB analog → rows-only)
    "q30_multimodal_features" -> ((s, dir) => {
      val media = Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text")
      Multimodal.extractFeatures(media, bins = 16)
        .select(col("media_id"), col("n_bytes"), col("format_detected"),
          round(col("entropy"), 6).as("entropy"),
          round(element_at(col("features"), 1).cast("double"), 6).as("feat_0"),
          round(element_at(col("features"), 2).cast("double"), 6).as("feat_1"))
        .orderBy("media_id")
    }),

    // cube grouping sets + sample stddev/variance
    "q32_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
          r(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          r(var_samp(col("l_discount")), 8).as("var_disc"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // exact percentiles (linear interpolation) per group
    "q33_percentiles" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          r(percentile(col("l_extendedprice"), lit(0.5)), 4).as("p50_price"),
          r(percentile(col("l_extendedprice"), lit(0.9)), 4).as("p90_price"),
          min("l_extendedprice").as("min_price"),
          max("l_extendedprice").as("max_price"))
        .orderBy("l_returnflag")
    }),

    // date-part extraction + grouped aggregation
    "q34_date_parts" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"),
          month(col("o_orderdate")).cast("long").as("o_month"))
        .agg(count(lit(1)).as("n_orders"),
          r(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("o_year", "o_month")
    }),

    // union all + deterministic pagination (order / limit / offset)
    "q35_union_page" -> ((s, dir) => {
      val a = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), lit("cust").as("src"))
      val b = t(s, dir, "supplier")
        .select(col("s_suppkey").as("k"), lit("supp").as("src"))
      a.unionAll(b).orderBy("k", "src").offset(100).limit(50)
    }),

    // correlation / covariance aggregates per group
    "q36_corr" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(r(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          r(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qty_price"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_linestatus")
    }),

    // TF-IDF over the corpus (explode → two shuffled aggregations on term keys)
    "q41_tfidf" -> ((s, dir) => {
      TextOps.tfIdf(t(s, dir, "documents"), "doc_id", "text")
        .select(col("id"), col("term"), col("tf"), col("df"),
          r(col("tfidf"), 6).as("tfidf"))
        .orderBy("id", "term")
    }),

    // salted two-stage aggregation — must equal the plain GROUP BY (the
    // oracle IS the unsalted query: salting is semantically transparent)
    "q42_salted_agg" -> ((s, dir) => {
      Skew.saltedSumCount(t(s, dir, "lineitem"), Seq("l_returnflag"), "l_quantity")
        .select(col("l_returnflag"), r(col("sum_value"), 2).as("sum_qty"), col("n_rows"))
        .orderBy("l_returnflag")
    }),

    // cloglog link at a fixed beta (O19 oracle coverage; probit's Φ has no
    // SQL analog, logit is covered by q19)
    "q43_cloglog_dev" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("y", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
      val eta = lit(-0.4) + col("l_quantity") * lit(0.01) + col("l_discount") * lit(-2.0)
      val mu = graft.glm.LinkFn.Cloglog.inverse(eta, lit(1.0))
      li.agg(
        r(avg(GLM.devExpr(col("y"), mu, lit(1.0))), 6).as("avg_dev"),
        count(lit(1)).as("n_rows"))
    }),

    // TPC-H Q17 shape: correlated scalar subquery (per-part average),
    // decorrelated into an aggregate + join
    "q49_correlated_avg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val partAvg = li.groupBy(col("l_partkey").as("pk"))
        .agg(avg("l_quantity").as("avg_qty"))
      li.join(partAvg, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < col("avg_qty") * 0.5)
        // part scales with SF — keyed join, planner/stats decide strategy
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(r(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    }),

    // correlated comparison against the group's own aggregate: orders
    // priced above 3x their customer's average order value
    "q50_above_own_avg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val custAvg = o.groupBy(col("o_custkey").as("ck"))
        .agg(avg("o_totalprice").as("cust_avg"), count(lit(1)).as("n_ord"))
        .filter(col("n_ord") >= 2)
      o.join(custAvg, col("o_custkey") === col("ck"))
        .filter(col("o_totalprice") > col("cust_avg") * 3.0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // end-to-end near-dup removal: MinHash-LSH pairs → connected
    // components → one representative per cluster (xxhash-based pairs →
    // rows-only check; semantics covered by DedupSpec)
    "q48_dedup_corpus" -> ((s, dir) => {
      Dedup.removeNearDuplicates(t(s, dir, "documents"), "doc_id", "text")
        .select("doc_id", "lang", "source").orderBy("doc_id")
    }),

    // connected-component labels, HASH-GATED: large-star/small-star CC over
    // the exact n-gram-Jaccard pair relation (the same deterministic
    // relation q25 proves), oracle = a recursive-CTE transitive closure in
    // DuckDB. This gates the component labels themselves — q48 can only be
    // rows-only because its minhash candidate basis has no SQL analog
    "q73_cc_labels" -> ((s, dir) => {
      val pairs = Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
          n = 5, threshold = 0.5, maxBucketSize = 100000)
        .select("id_a", "id_b")
      Dedup.connectedComponentsLSS(pairs).orderBy("id")
    }),

    // as-of join (custom operator — Spark has no native one): each event
    // joined to the latest qualifying per-user hourly anchor at or before it
    "q47_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val anchors = ev
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("ats"))
        .agg(r(sum("value"), 4).as("hourly_sum"), count(lit(1)).as("n"))
        .filter(col("n") >= 2)
      AsofJoin.asofJoin(ev.select("event_id", "user_id", "ts"), anchors,
          Seq("user_id"), "ts", "ats", Seq("hourly_sum"))
        .select("event_id", "user_id", "hourly_sum")
        .orderBy("event_id")
    }),

    // semi-structured: JSON field extraction from the events props column
    "q45_json_extract" -> ((s, dir) => {
      events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum("k").as("sum_k"), min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")
    }),

    // nested arrays: per-label aggregate over the embedding vectors (norm
    // via the native array_dot expression)
    "q46_embedding_stats" -> ((s, dir) => {
      graft.plans.GraftExtensions.ensureRegistered(s)
      val e = t(s, dir, "embeddings")
      e.withColumn("nrm", sqrt(call_function("array_dot",
          col("embedding").cast("array<double>"), col("embedding").cast("array<double>"))))
        .groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("n_vecs"), r(sum("nrm"), 4).as("sum_norm"))
        .orderBy("label")
    }),

    // Poisson deviance at a fixed beta over the log link (extension family;
    // same IRLS machinery as binomial — SQL-expressible, so oracle-checked)
    "q44_poisson_dev" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").withColumn("y", col("l_linenumber").cast("double"))
      val eta = lit(0.2) + col("l_quantity") * lit(0.01)
      val mu = exp(eta)
      li.agg(
        r(avg(graft.glm.Family.PoissonFamily.deviance(col("y"), mu, lit(1.0))), 6).as("avg_dev"),
        count(lit(1)).as("n_rows"))
    }),

    // per-group OLS via the custom Gram Aggregator: one independent fit per
    // supplier, solved inside the aggregation (no driver involvement)
    "q40_grouped_lm" -> ((s, dir) => {
      GroupedLM.fit(t(s, dir, "lineitem"), Seq("l_suppkey"),
          Seq("l_quantity"), "l_extendedprice")
        .select(col("l_suppkey"),
          r(col("b_intercept"), 4).as("b_intercept"),
          r(col("b_l_quantity"), 4).as("b_quantity"),
          r(col("r2"), 6).as("r2"),
          col("n_rows"))
        .orderBy("l_suppkey")
    }),

    // embedding-cosine near-dup pairs, exact O(n²) baseline (intentional
    // broadcast nested-loop; the LSH variant below is the scale path)
    "q38_cosine_pairs" -> ((s, dir) => {
      Similarity.cosinePairs(t(s, dir, "embeddings"), "vec_id", "embedding", 0.3)
        .orderBy("id_a", "id_b")
    }),

    // LSH-bucketed embedding near-dup (recall < 1 → rows-only)
    "q39_cosine_pairs_lsh" -> ((s, dir) => {
      Similarity.cosinePairsLSH(t(s, dir, "embeddings"), "vec_id", "embedding", 0.3,
          nBits = 64, bands = 8)
        .orderBy("id_a", "id_b")
    }),

    // pivot (explicit value list so the output schema is static)
    "q37_pivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(r(sum("l_quantity"), 2))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
        .orderBy("l_returnflag")
    }),

    // O15/O16 WLS: weighted 1-feature least squares; oracle is the
    // closed-form weighted-moments solution (q18 pattern, with weights)
    "q53_wls_coefs" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").withColumn("w", col("l_tax") + lit(0.01))
      val m = LM.fit(li, Seq("l_quantity"), "l_extendedprice", weightCol = Some("w"))
      import s.implicits._
      Seq((rd(m.coefs(0), 3), rd(m.coefs(1), 3), rd(m.sigma, 3), m.n))
        .toDF("b_intercept", "b_quantity", "sigma_w", "n_rows")
    }),

    // per-group weighted least squares through GroupedGLM's gaussian path
    // (prior weights scale the per-group Gram) — the grouped twin of q53,
    // hash-gated against the closed-form weighted moments per group; the
    // whole fit is one grouped aggregation, betas never touch the driver
    "q71_grouped_wls" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").withColumn("w", col("l_tax") + lit(0.01))
      GroupedGLM.fit(li, Seq("l_returnflag"), Seq("l_quantity"), "l_extendedprice",
          family = "gaussian", weightCol = Some("w"))
        .select(col("l_returnflag"),
          r(col("b_intercept"), 3).as("b_intercept"),
          r(col("b_l_quantity"), 3).as("b_quantity"),
          col("n_rows"))
        .orderBy("l_returnflag")
    }),

    // O28 grouped binomial (m > 1): deviance at a fixed beta over per-supplier
    // (successes, trials) — y/m/x are exact integers/decimals, so per-group
    // arithmetic is bit-identical across engines
    "q51_glm_m_dev" -> ((s, dir) => {
      val g = t(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(sum(when(col("l_returnflag") === "R", 1.0).otherwise(0.0)).as("y"),
          count(lit(1)).cast("double").as("m"),
          max("l_quantity").as("xq"))
      val eta = lit(-0.5) + col("xq") * lit(0.01)
      val mu = graft.glm.LinkFn.Logit.inverse(eta, col("m"))
      g.agg(
        r(avg(graft.glm.Family.BinomialFamily.deviance(col("y"), mu, col("m"))), 6).as("avg_dev"),
        sum(col("y")).cast("long").as("sum_y"),
        count(lit(1)).as("n_groups"))
    }),

    // O28 offset: binomial deviance at a fixed beta with a nonzero offset
    // term in the linear predictor (q19 pattern + offset)
    "q52_glm_offset_dev" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("y", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
      val off = log(col("l_quantity") + lit(1.0))
      val eta = lit(-1.2) + col("l_discount") * lit(-2.0) + off
      val mu = graft.glm.LinkFn.Logit.inverse(eta, lit(1.0))
      li.agg(
        r(avg(GLM.devExpr(col("y"), mu, lit(1.0))), 6).as("avg_dev"),
        count(lit(1)).as("n_rows"))
    }),

    // gaussian family: fixed-beta deviance (= RSS) — the identity-link
    // extension family's unit deviance, pure SQL
    "q54_gaussian_dev" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").withColumn("y", col("l_extendedprice") / 1000.0)
      val mu = lit(3.0) + col("l_quantity") * lit(0.1)
      li.agg(
        r(avg(graft.glm.Family.GaussianFamily.deviance(col("y"), mu, lit(1.0))), 6).as("avg_dev"),
        count(lit(1)).as("n_rows"))
    }),

    // gamma family: fixed-beta deviance 2·[−ln(y/μ) + (y−μ)/μ] over the log
    // link (y = price > 0 everywhere)
    "q55_gamma_dev" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").withColumn("y", col("l_extendedprice"))
      val mu = exp(lit(6.0) + col("l_quantity") * lit(0.02))
      li.agg(
        r(avg(graft.glm.Family.GammaFamily.deviance(col("y"), mu, lit(1.0))), 6).as("avg_dev"),
        count(lit(1)).as("n_rows"))
    }),

    // full IRLS fit, ORACLE-HASHED: gaussian + identity IRLS is exactly OLS,
    // so the converged GLM coefficients and 1 − D/D₀ (= R²) must match the
    // closed-form normal-equations SQL — this gates the whole IRLS loop
    // (working response, weights, Gram solve, deviance, null deviance),
    // which q20 can only rows-check
    "q56_glm_gaussian_coefs" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val m = GLM.fit(li, Seq("l_quantity", "l_discount"), "l_extendedprice",
        family = "gaussian")
      import s.implicits._
      Seq((rd(m.coefs(0), 3), rd(m.coefs(1), 3), rd(m.coefs(2), 3),
        rd(1.0 - m.deviance / m.nullDeviance, 6), m.n))
        .toDF("b_intercept", "b_quantity", "b_discount", "r2", "n_rows")
    }),

    // prior case weights through the FULL single-model IRLS (R's
    // glm(weights=)): gaussian + identity with weights is exactly the
    // closed-form WLS solution, so β AND the weighted deviance ratio
    // 1 − D/D₀ hash-gate the weighted IRLS path end-to-end (q56's trick
    // plus the weight column; the weighted LM twin is q53)
    "q85_glm_weighted" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").withColumn("w", col("l_tax") + lit(0.01))
      val m = GLM.fit(li, Seq("l_quantity"), "l_extendedprice",
        family = "gaussian", weightCol = Some("w"))
      import s.implicits._
      Seq((rd(m.coefs(0), 3), rd(m.coefs(1), 3),
        rd(1.0 - m.deviance / m.nullDeviance, 6), m.n))
        .toDF("b_intercept", "b_quantity", "r2_w", "n_rows")
    }),

    // O18 probit: deviance at a fixed beta with μ = Φ(η) via the
    // Zelen–Severo approximation — the SAME literal arithmetic on both
    // engines (no SQL Φ exists; two independent erf libraries would not be
    // bit-identical). The exact-Φ fit path is covered by GLMSpec.
    "q57_probit_dev" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("y", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
      val eta = lit(-0.4) + col("l_quantity") * lit(0.01) + col("l_discount") * lit(-2.0)
      val mu = graft.glm.LinkFn.pnormApprox(eta)
      li.agg(
        r(avg(GLM.devExpr(col("y"), mu, lit(1.0))), 6).as("avg_dev"),
        count(lit(1)).as("n_rows"))
    }),

    // bounded-memory percentile twin of q33: approx_percentile holds a
    // fixed-size sketch per group instead of buffering every value — the
    // 100 TB-safe quantile path (sketch merge order is partition-dependent,
    // so rows-only; PlanSpec/EntrySpec assert tolerance vs exact q33)
    "q58_percentiles_approx" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          approx_percentile(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50_approx"),
          approx_percentile(col("l_extendedprice"), lit(0.9), lit(10000)).as("p90_approx"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // end-to-end corpus curation: quality filter → exact dedup (keep the
    // min doc_id per content digest) → per-language doc counts + token
    // sums. The composition every training-data pipeline runs, as ONE
    // declarative plan — filter and projection push to the scan, the dedup
    // shuffle carries digests (16 bytes), languages aggregate map-side.
    // The 0.471 threshold is deliberately off any decimal grid: the filter
    // compares UNROUNDED doubles, identical IEEE754 arithmetic on both
    // engines, and an off-grid constant dodges representation boundaries.
    "q62_corpus_curation" -> ((s, dir) => {
      val scored = graft.ops.fanOut(t(s, dir, "documents"))
        .select(col("doc_id"), col("text"),
          TextOps.qualityScore(col("text")).as("q"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        .filter(col("q") >= 0.471)
      val keep = Dedup.exact(scored, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      val curated = scored.join(keep, "doc_id")
      TextOps.withLangId(curated, "text", "lang_pred")
        .groupBy("lang_pred")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
        .orderBy("lang_pred")
    }),

    // per-group GLM: one independent logistic IRLS fit per return flag,
    // entirely inside grouped aggregation (betas broadcast-joined per
    // iteration, solved per group in the aggregate's finish — no driver
    // state). Hash-gated via the per-group saturated closed form (the
    // q20/q81 pattern): binary regressor → cell-proportion logits and
    // closed-form deviance per group. Continuous-covariate parity stays
    // in GroupedGLMSpec.
    "q64_grouped_glm" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("x_high", when(col("l_quantity") > 25, 1.0).otherwise(0.0))
        .withColumn("y", when(col("l_discount") >= 0.05, 1.0).otherwise(0.0))
      GroupedGLM.fit(li, Seq("l_returnflag"), Seq("x_high"), "y")
        .select(col("l_returnflag"),
          round(col("b_intercept"), 6).as("b_intercept"),
          round(col("b_x_high"), 6).as("b_x_high"),
          round(col("deviance"), 4).as("deviance"), col("n_rows"))
        .orderBy("l_returnflag")
    }),

    // deterministic content-keyed train/val/test split (the reproducible
    // alternative to rand() splits: stable under re-runs/re-partitioning,
    // duplicate content stays in one split; pure projection, no shuffle)
    "q63_train_split" -> ((s, dir) => {
      Sampling.withSplit(t(s, dir, "documents"), "text", "split")
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text")).cast("long")).as("sum_tokens"))
        .orderBy("split")
    }),

    // exact grouped distinct counts (the expand-based multi-distinct plan)
    "q60_distinct_exact" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("nd_orders"),
          countDistinct(col("l_suppkey")).as("nd_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // bounded-memory twin of q60: HLL++ sketch per group instead of the
    // exact distinct expansion — the 100 TB-safe cardinality path (register
    // merge is order-insensitive so the estimate is deterministic, but not
    // bit-identical to DuckDB's estimator → rows-only; EntrySpec asserts
    // relative error vs exact)
    "q61_distinct_approx" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("nd_orders_approx"),
          approx_count_distinct(col("l_suppkey"), 0.01).as("nd_supps_approx"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // session windows over event time (batch analog of the streaming op)
    "q31_sessionize" -> ((s, dir) => {
      StreamOps.sessionizeBatch(events(s, dir), gapMs = 30 * 60 * 1000L)
        .select(col("user_id"), col("session_idx"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"), r(col("total_value"), 4).as("total_value"))
        .orderBy("user_id", "session_idx")
    }),

    // RANGE-framed window (value-based frame, not row-based) + ntile +
    // percent_rank: 30-day trailing revenue per customer. The frame key is
    // epoch days so both engines bound the frame identically; percent_rank
    // is an exact rational — bit-identical unrounded.
    "q66_window_range" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val day = datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
      val o = t(s, dir, "orders").withColumn("day", day)
      val range = Window.partitionBy("o_custkey").orderBy("day")
        .rangeBetween(-30, Window.currentRow)
      val rank = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
      o.select(col("o_custkey"), col("o_orderkey"), col("day"),
          r(sum(col("o_totalprice")).over(range), 4).as("sum_30d"),
          ntile(4).over(rank).cast("long").as("quartile"),
          percent_rank().over(rank).as("pr"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Spark's BUILT-IN session operator: session_window gap-merges event
    // time per key natively (and is state-store-backed under readStream —
    // same code streams). Boundary semantics differ from q31 by one
    // instant: windows merge iff gap STRICTLY exceeds the inter-event
    // delta, so this query carries its own oracle with `>=` in the
    // session-break flag.
    "q65_session_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val sess = events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(min("ts").as("start0"), max("ts").as("end0"),
          count(lit(1)).as("n_events"), sum("value").as("total_value"))
      val byUser = Window.partitionBy("user_id").orderBy("start0")
      sess.withColumn("session_idx", row_number().over(byUser).cast("long"))
        .select(col("user_id"), col("session_idx"),
          date_format(col("start0"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("end0"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"), r(col("total_value"), 4).as("total_value"))
        .orderBy("user_id", "session_idx")
    }),

    // keyed interval join (non-equi time-range join): for every event, how
    // many same-user events follow within 5 minutes. Executes as an
    // equi-join on user_id with the range as residual condition — the same
    // operator streams as a stream-stream interval join (StreamOpsSpec).
    "q69_interval_join" -> ((s, dir) => {
      val ev = events(s, dir).select("event_id", "user_id", "ts")
      StreamOps.intervalJoin(
          ev.withColumnRenamed("event_id", "l_id").withColumnRenamed("ts", "l_ts"),
          ev.withColumnRenamed("event_id", "r_id").withColumnRenamed("ts", "r_ts"),
          "user_id", "l_ts", "r_ts", windowMs = 5 * 60 * 1000L, joinType = "left")
        .groupBy(col("l.l_id").as("event_id"))
        .agg(count(col("r.r_id")).as("n_follow"))
        .orderBy("event_id")
    }),

    // stratified deterministic sampling: per-language sixteenths quotas,
    // content-digest-keyed (pure projection+filter, no shuffle, no RNG) —
    // the per-class rebalancing move of a training pipeline
    "q76_stratified_sample" -> ((s, dir) => {
      Sampling.stratifiedSample(t(s, dir, "documents"), "lang", "text",
          Map("en" -> 4), defaultSixteenths = 1)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("sum_chars"))
        .orderBy("lang")
    }),

    // streaming exact dedup: dropDuplicatesWithinWatermark keeps per-key
    // state only inside the watermark horizon (bounded state — the
    // streaming twin of q21's digest dedup), replayed over the events
    // table and gated against the batch DISTINCT oracle
    "q75_dedup_stream" -> ((s, dir) => {
      StreamOps.dedupStreamReplay(events(s, dir), Seq("user_id", "event_type"))
        .orderBy("user_id", "event_type")
    }),

    // bounded-memory heavy hitters: per-partition Misra-Gries candidate
    // summaries + one exact recount over the candidates — exact top-k
    // without ever shuffling the full token key space (the at-scale
    // "most frequent tokens" primitive); oracle = the plain exact top-k
    "q74_heavy_hitters" -> ((s, dir) => {
      // fan out before the split+explode (one-row-group source = one core)
      val toks = graft.ops.fanOut(t(s, dir, "documents"))
        .select(explode(split(col("text"), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
      TopK.heavyHitters(toks, "token", 20)
        .select(col("key").as("token"), col("cnt").as("n"))
        .orderBy(col("n").desc, col("token"))
    }),

    // per-group model SCORING: fit per-flag WLS betas (q71's fit), then
    // GroupedGLM.predict broadcast-joins them back and scores every row as
    // a pure column expression; gated on a threshold COUNT (predictions sit
    // on the integer quantity grid, >=0.87 away from the threshold, so the
    // ~1e-7 fit-vs-closed-form coefficient difference can never flip a row)
    "q72_grouped_predict" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").withColumn("w", col("l_tax") + lit(0.01))
      val betas = GroupedGLM.fit(li, Seq("l_returnflag"), Seq("l_quantity"),
        "l_extendedprice", family = "gaussian", weightCol = Some("w"))
      GroupedGLM.predict(betas, li, Seq("l_returnflag"), Seq("l_quantity"),
          family = "gaussian")
        .filter(col("prediction") > 53000.0)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_high"),
          sum(col("l_quantity").cast("long")).as("qty_sum"))
        .orderBy("l_returnflag")
    }),

    // the REAL stream-stream interval join (two MemoryStreams, watermarks
    // on both sides, LEFT OUTER — unmatched rows emit via watermark-driven
    // state eviction) replayed over the events table, then aggregated
    // batch-side — hash-gated against the SAME oracle as batch q69, so
    // streaming/batch interval-join parity is proven like q59/q67
    "q70_interval_stream" -> ((s, dir) => {
      StreamOps.intervalJoinReplay(events(s, dir), windowMs = 5 * 60 * 1000L)
        .groupBy(col("l_id").as("event_id"))
        .agg(count(col("r_id")).as("n_follow"))
        .orderBy("event_id")
    }),

    // the REAL watermarked streaming window aggregation replayed over the
    // events table — hash-gated against the SAME oracle as batch q11, so
    // streaming/batch hourly aggregation parity is proven like q59 proves
    // sessionize parity
    "q67_hourly_stream" -> ((s, dir) => {
      StreamOps.windowedCountsReplay(events(s, dir))
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("n_events"), r(col("sum_value"), 4).as("sum_value"))
        .orderBy("hour", "event_type")
    }),

    // q67's windowed aggregation driven from a FILE SOURCE instead of a
    // MemoryStream: the events table is staged as time-ordered parquet
    // files (distributed write, no collect anywhere in the path) and
    // streamed back one file per micro-batch — the non-driver-fed
    // streaming gate, hash-checked against the SAME SQL oracle as q67
    "q86_hourly_file_stream" -> ((s, dir) => {
      val stage = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_q86_stage").toString
      StreamOps.windowedCountsFileStream(events(s, dir), stage)
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("n_events"), r(col("sum_value"), 4).as("sum_value"))
        .orderBy("hour", "event_type")
    }),

    // the REAL streaming sessionize (flatMapGroupsWithState + watermark)
    // replayed over the events table via MemoryStream — hash-gated against
    // the SAME SQL oracle as q31, so streaming/batch session semantics are
    // proven equivalent, not just both "plausible"
    "q59_sessionize_stream" -> ((s, dir) => {
      StreamOps.sessionizeReplay(events(s, dir), gapMs = 30 * 60 * 1000L)
        .select(col("user_id"), col("session_idx"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"), r(col("total_value"), 4).as("total_value"))
        .orderBy("user_id", "session_idx")
    }),

    // formula INTERACTION term end-to-end: fitFormula expands
    // l_quantity:l_discount into a product regressor (R's ':' semantics);
    // oracle = the same closed-form 2-regressor normal equations as q18
    // with x2 := l_quantity·l_discount
    "q77_lm_interaction" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val m = LM.fitFormula(li,
        "l_extendedprice ~ l_quantity + l_quantity:l_discount")
      import s.implicits._
      Seq((rd(m.coefs(0), 3), rd(m.coefs(1), 3), rd(m.coefs(2), 3),
        rd(m.r2, 6), m.n))
        .toDF("b_intercept", "b_quantity", "b_inter", "r2", "n_rows")
    }),

    // per-group BINOMIAL scoring gate (the logistic twin of q72): a
    // saturated design — one BINARY regressor — makes each group's
    // logistic MLE closed-form (the cell success proportions), so the
    // full per-group IRLS fit + logit predict path is hash-gated against
    // DuckDB cell averages; the threshold count is margin-safe (cell
    // proportions sit ≈0.45 and ≈0.18, both ≥0.12 from the 0.3 cut, so
    // the ~1e-10 IRLS-vs-closed-form drift can never flip a row)
    "q78_grouped_logit_predict" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("x_high", when(col("l_quantity") > 25, 1.0).otherwise(0.0))
        .withColumn("y", when(col("l_discount") >
          when(col("l_quantity") > 25, 0.05).otherwise(0.08), 1.0)
          .otherwise(0.0))
      val betas = GroupedGLM.fit(li, Seq("l_returnflag"), Seq("x_high"), "y")
      GroupedGLM.predict(betas, li, Seq("l_returnflag"), Seq("x_high"))
        .filter(col("prediction") > 0.3)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_high"),
          sum(col("l_quantity").cast("long")).as("qty_sum"))
        .orderBy("l_returnflag")
    }),

    // embedding-cosine near-dup removal END-TO-END, hash-gated: exact
    // cosine pairs → large-star/small-star components → keep-min
    // representative; oracle = DuckDB list_cosine_similarity pairs + the
    // same recursive-CTE closure as q73. Completes the dedup-family gates:
    // the candidate basis here is deterministic (unlike minhash q48), so
    // the whole removal pipeline is oracle-checkable
    "q79_embed_dedup" -> ((s, dir) => {
      Similarity.removeNearDuplicates(t(s, dir, "embeddings"),
          "vec_id", "embedding", threshold = 0.4)
        .select(col("vec_id"), col("label").cast("long").as("cls"))
        .orderBy("vec_id")
    }),

    // SLIDING event-time windows (2h window, 1h slide): each event lands in
    // exactly windowDuration/slideDuration windows — the overlapping-window
    // shape q11/q67's tumbling windows don't cover. Spark expands the
    // window set inside the native `window()` generator; the oracle
    // reconstructs it with an explicit 2-row offset cross join
    "q80_sliding_window" -> ((s, dir) => {
      events(s, dir)
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), r(sum("value"), 4).as("sum_value"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("window_start", "event_type")
    }),

    // per-row scoring standard errors (R predict.lm se.fit), hash-gated:
    // for one regressor the variance quadratic form collapses to the
    // closed form 1/n + (x−x̄)²/Sxx, so the whole predictWithSe path —
    // Gram → Cholesky → kernel inverse → codegen'd scoring expression —
    // is checkable against DuckDB arithmetic
    "q83_lm_sefit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val m = LM.fit(li, Seq("l_quantity"), "l_extendedprice")
      m.predictWithSe(li)
        .groupBy("l_returnflag")
        .agg(r(avg("se_fit"), 6).as("avg_se"),
          r(avg("prediction"), 3).as("avg_pred"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // q83's twin through the GLM path: delta-method scoring standard
    // errors (R predict.glm(se.fit=TRUE)). For gaussian + identity the
    // link-scale se is EXACTLY predict.lm's σ̂·sqrt(x₀ᵀ(XᵀX)⁻¹x₀), so the
    // full GLM se.fit machinery (IRLS kernel + Pearson dispersion) is
    // hash-gated against the same closed-form SQL oracle as q83
    "q87_glm_sefit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val m = GLM.fit(li, Seq("l_quantity"), "l_extendedprice",
        family = "gaussian")
      m.predictWithSe(li, scale = "link")
        .groupBy("l_returnflag")
        .agg(r(avg("se_fit"), 6).as("avg_se"),
          r(avg("prediction"), 3).as("avg_pred"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // data-layout round trip, hash-gated: range-clustered write (disjoint
    // per-file key ranges for footer-stats skipping) then a range-predicate
    // scan over the clustered copy; oracle = the same predicate over the
    // original table — gates that clustering preserves the data exactly
    "q82_clustered_scan" -> ((s, dir) => {
      // fixed path + overwrite mode: repeated Verify/Bench runs reuse one
      // directory instead of leaking a clustered table copy per invocation
      val out = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_q82_cluster").toString
      graft.ops.Layout.writeRangeClustered(
        t(s, dir, "lineitem"), out, Seq("l_shipdate"), numFiles = 4)
      s.read.parquet(out)
        .filter(col("l_shipdate") >= lit("1998-06-01"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"), r(sum("l_quantity"), 2).as("sum_qty"),
          min(col("l_shipdate")).cast("string").as("min_ship"))
        .orderBy("l_returnflag")
    }),

    // z-order layout round trip, hash-gated like q82 but with the
    // predicate on the SECOND cluster column — the case 1-D range
    // clustering cannot skip for; oracle = the same predicate over the
    // original table, gating that bit-interleaved rewrite preserves the
    // data exactly
    "q84_zorder_scan" -> ((s, dir) => {
      val out = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_q84_zorder").toString
      graft.ops.Layout.writeZOrdered(
        t(s, dir, "lineitem"), out, Seq("l_quantity", "l_extendedprice"),
        numFiles = 8)
      s.read.parquet(out)
        .filter(col("l_extendedprice") >= lit(50000.0))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"), r(sum("l_quantity"), 2).as("sum_qty"),
          r(min("l_extendedprice"), 2).as("min_price"))
        .orderBy("l_returnflag")
    }),

    // per-group POISSON gate (q78's trick for the count family): with one
    // binary regressor the grouped poisson/log IRLS is saturated, so the
    // fitted cell means are closed-form cell averages — exp(b0) and
    // exp(b0+b1) hash-gate the whole grouped-poisson fit against DuckDB
    "q81_grouped_poisson" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("x_high", when(col("l_quantity") > 25, 1.0).otherwise(0.0))
        .withColumn("y", col("l_linenumber").cast("double"))
      GroupedGLM.fit(li, Seq("l_returnflag"), Seq("x_high"), "y",
          family = "poisson")
        .select(col("l_returnflag"),
          r(exp(col("b_intercept")), 6).as("mu_low"),
          r(exp(col("b_intercept") + col("b_x_high")), 6).as("mu_high"),
          col("n_rows"))
        .orderBy("l_returnflag")
    }),

    // inverse-gaussian GLM, canonical 1/μ² link: for an intercept-only fit
    // the MLE mean is ȳ (any-family property of the intercept-only score),
    // so β0 = 1/ȳ² and the deviance Σ(y−ȳ)²/(ȳ²y), Pearson Σ(y−ȳ)²/ȳ³ and
    // dispersion Pearson/(n−1) are all closed-form SQL — the full IRLS
    // machinery for the third variance family hash-gated end-to-end
    "q88_invgauss_fit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").withColumn("one", lit(1.0))
      val m = GLM.fit(li, Seq("one"), "l_quantity",
        family = "inverse-gaussian", intercept = false)
      import s.implicits._
      Seq((rd(m.coefs(0), 8), rd(m.deviance, 4), rd(m.pearson, 4),
        rd(m.dispersion, 8), m.n))
        .toDF("b_one", "deviance", "pearson", "dispersion", "n_rows")
    }),

    // quasipoisson with one binary regressor: the log-link fit is
    // saturated (q81's trick), so the cell means are closed-form cell
    // averages AND the estimated dispersion is the closed-form Pearson/df
    // — gating that the quasi family refits its parent exactly while
    // estimating the dispersion R-style (loglik/AIC are NA by design,
    // checked in the spec suite)
    "q89_quasipoisson" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("x_high", when(col("l_quantity") > 25, 1.0).otherwise(0.0))
        .withColumn("y", col("l_linenumber").cast("double"))
      val m = GLM.fit(li, Seq("x_high"), "y", family = "quasipoisson")
      import s.implicits._
      Seq((rd(math.exp(m.coefs(0)), 6),
        rd(math.exp(m.coefs(0) + m.coefs(1)), 6),
        rd(m.dispersion, 8), m.n))
        .toDF("mu_low", "mu_high", "dispersion", "n_rows")
    }),

    // q83's twin for GROUPED fits: per-row scoring standard errors from
    // per-group kernels — the betas frame carries each group's packed
    // (XᵀX)⁻¹, scoring is a broadcast join + codegen'd quad form, and for
    // one regressor the closed form σ_g·sqrt(1/n_g + (x−x̄_g)²/Sxx_g) is
    // plain SQL per group — millions-of-groups se.fit, hash-gated
    "q90_grouped_sefit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val betas = GroupedLM.fit(li, Seq("l_returnflag"), Seq("l_quantity"),
        "l_extendedprice", kernel = true)
      GroupedLM.predictWithSe(betas, li, Seq("l_returnflag"), Seq("l_quantity"))
        .groupBy("l_returnflag")
        .agg(r(avg("se_fit"), 6).as("avg_se"),
          r(avg("prediction"), 3).as("avg_pred"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // q90 through the GROUPED-GLM path: for gaussian + identity the
    // per-group IRLS kernel is (XᵀX)⁻¹ and the dispersion dev/(n−p) = σ̂²,
    // so the delta-method grouped se.fit must hit the same per-group
    // closed form — gating the grouped IRLS kernel end-to-end
    "q91_grouped_glm_sefit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val betas = GroupedGLM.fit(li, Seq("l_returnflag"), Seq("l_quantity"),
        "l_extendedprice", family = "gaussian", kernel = true)
      GroupedGLM.predictWithSe(betas, li, Seq("l_returnflag"),
          Seq("l_quantity"), family = "gaussian")
        .groupBy("l_returnflag")
        .agg(r(avg("se_fit"), 6).as("avg_se"),
          r(avg("prediction"), 3).as("avg_pred"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // tweedie(1.5) compound Poisson-gamma: intercept-only MLE mean is ȳ
    // (any-family property), so the converged β0 = ln(ȳ) and the power-1.5
    // unit deviance 2[y^0.5/0.75·(−1)... all pow() arithmetic both engines
    // share — the fourth variance family's full IRLS hash-gated
    "q92_tweedie_fit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").withColumn("one", lit(1.0))
      val m = GLM.fit(li, Seq("one"), "l_quantity",
        family = "tweedie(1.5)", intercept = false)
      import s.implicits._
      Seq((rd(m.coefs(0), 8), rd(m.deviance, 4), rd(m.pearson, 4),
        rd(m.dispersion, 8), m.n))
        .toDF("b_one", "deviance", "pearson", "dispersion", "n_rows")
    }),

    // negative binomial with fixed θ = 2 (MASS::negative.binomial): the
    // saturated binary design gives closed-form cell means, and the
    // negbin deviance at those means is plain ln arithmetic — the
    // overdispersed-count family hash-gated end-to-end
    "q93_negbin_fit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("x_high", when(col("l_quantity") > 25, 1.0).otherwise(0.0))
        .withColumn("y", col("l_linenumber").cast("double"))
      val m = GLM.fit(li, Seq("x_high"), "y", family = "negbin(2.0)")
      import s.implicits._
      Seq((rd(math.exp(m.coefs(0)), 6),
        rd(math.exp(m.coefs(0) + m.coefs(1)), 6),
        rd(m.deviance, 4), m.n))
        .toDF("mu_low", "mu_high", "deviance", "n_rows")
    }),

    // LM influence diagnostics (hatvalues / rstandard / rstudent /
    // cooks.distance) as one literal-kernel projection; oracle = the simple-
    // regression closed forms h = 1/n + (x−x̄)²/Sxx etc. over the same data
    "q94_lm_diagnostics" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val m = LM.fit(li, Seq("l_quantity"), "l_extendedprice")
      m.diagnostics(li)
        .groupBy("l_returnflag")
        .agg(r(sum("hat"), 6).as("sum_hat"),
          r(avg(abs(col("std_resid"))), 6).as("avg_abs_std"),
          r(avg("cooks_d"), 8).as("avg_cooks"),
          r(avg("student_resid"), 8).as("avg_student"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // ridge regression: penalized normal equations off the same single Gram
    // pass as q18; oracle = the 2×2 Cramer solve with the (Sxx+λ) penalized
    // diagonal, intercept unpenalized
    "q95_ridge_fit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val m = LM.fitRidge(li, Seq("l_quantity"), "l_extendedprice",
        lambda = 5e6)
      import s.implicits._
      Seq((rd(m.coefs(0), 6), rd(m.coefs(1), 8), rd(m.sigma, 4),
        rd(m.r2, 8), m.n))
        .toDF("b0", "b1", "sigma", "r2", "n_rows")
    }),

    // GLM residuals (R residuals.glm): intercept-only poisson has the
    // closed-form MLE μ̂ = ȳ, so per-group sums of pearson²/deviance² and
    // means of working/response residuals are plain SQL arithmetic.
    // `+ 0.0` guards the near-zero averages against the ±0.0 hash split
    // (see q103's note).
    "q96_glm_residuals" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("one", lit(1.0))
        .withColumn("y", col("l_linenumber").cast("double"))
      val m = GLM.fit(li, Seq("one"), "y", family = "poisson",
        intercept = false)
      val withAll = Seq("pearson" -> "r_p", "deviance" -> "r_d",
        "working" -> "r_w", "response" -> "r_r")
        .foldLeft(li) { case (d, (ty, c)) => m.residuals(d, ty, outputCol = c) }
      withAll.groupBy("l_returnflag")
        .agg(r(sum(col("r_p") * col("r_p")), 6).as("chi2"),
          r(sum(col("r_d") * col("r_d")), 6).as("dev2"),
          (r(avg("r_w"), 8) + lit(0.0)).as("avg_working"),
          (r(avg("r_r"), 8) + lit(0.0)).as("avg_response"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // k-fold CV in two passes: per-fold Gram blocks, out-of-fold betas by
    // complement subtraction, one scoring scan. Folds are content-keyed
    // (md5 of the line PK — the q63 mechanism), so DuckDB assigns
    // identically; oracle = per-fold complement 2×2 solves + test MSE
    "q97_lm_cv" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val digit = substring(md5(concat_ws("-",
        col("l_orderkey"), col("l_linenumber"))), 32, 1)
      val fold = when(digit < "4", 0).when(digit < "8", 1)
        .when(digit < "c", 2).otherwise(3)
      CrossVal.lmCV(li, Seq("l_quantity"), "l_extendedprice", fold)
        .select(col("fold"), col("n_train"), col("n_test"),
          r(col("mse"), 3).as("mse"), r(col("rmse"), 4).as("rmse"))
        .orderBy("fold")
    }),

    // lasso by driver-side coordinate descent over the single Gram pass;
    // for one predictor the CD fixed point IS the soft-threshold closed
    // form S(Cxy/n, λ)/(Cxx/n) — plain SQL arithmetic
    "q98_lasso_fit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val m = ElasticNet.fit(li, Seq("l_quantity"), "l_extendedprice",
        lambda = 50000.0, alpha = 1.0)
      import s.implicits._
      Seq((rd(m.coefs(0), 6), rd(m.coefs(1), 8), rd(m.r2, 8), m.n))
        .toDF("b0", "b1", "r2", "n_rows")
    }),

    // regularization path: three lambdas, ONE Gram pass, warm-started
    // driver re-solves; oracle = the soft-threshold closed form evaluated
    // per lambda over a VALUES list
    "q99_lasso_path" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ms = ElasticNet.path(li, Seq("l_quantity"), "l_extendedprice",
        lambdas = Seq(25000.0, 50000.0, 100000.0))
      import s.implicits._
      ms.map(m => (m.lambda, rd(m.coefs(0), 6), rd(m.coefs(1), 8)))
        .toDF("lambda", "b0", "b1")
        .orderBy("lambda")
    }),

    // benchmark decontamination: 5-gram containment of every train-split
    // doc against the test split's gram set (broadcast probe, corpus
    // shuffled once at doc granularity); the split is the q63 md5
    // mechanism so DuckDB partitions identically
    "q100_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents").withColumn("split",
        Sampling.splitColumn(col("text"),
          Seq("train" -> 12, "val" -> 2, "test" -> 2)))
      Dedup.containment(docs.filter(col("split") === "train"),
          docs.filter(col("split") === "test"), "doc_id", "text", n = 5)
        .agg(count(lit(1)).as("n_train_docs"),
          sum(when(col("containment") >= 0.5, 1L).otherwise(0L)).as("n_contam_50"),
          sum(when(col("containment") >= 0.9, 1L).otherwise(0L)).as("n_contam_90"),
          sum("n_hit").as("total_hits"),
          r(avg("containment"), 6).as("avg_containment"))
    }),

    // PCA: one Gram pass + driver-side eigen; for the 2-variable case the
    // covariance eigenvalues have the quadratic closed form
    // ((a+c) ± sqrt((a−c)² + 4b²))/2 — plain SQL arithmetic
    "q101_pca_2d" -> ((s, dir) => {
      val m = PCA.fit(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice"))
      import s.implicits._
      Seq((rd(m.eigenvalues(0), 2), rd(m.eigenvalues(1), 3),
        rd(m.varianceExplained(1), 8), m.n))
        .toDF("ev1", "ev2", "var_explained", "n_rows")
    }),

    // categorical association in one contingency shuffle: chi2 via the
    // zero-cell-free identity sum[(o-e)^2/e - e] + n, Cramér's V, MI
    "q102_contingency" -> ((s, dir) => {
      Contingency.analyze(t(s, dir, "lineitem"), "l_returnflag", "l_linestatus")
        .select(r(col("chi2"), 4).as("chi2"), col("df"),
          r(col("cramers_v"), 8).as("cramers_v"),
          r(col("mutual_info"), 8).as("mutual_info"), col("n_rows"))
    }),

    // grouped-GLM residuals against each row's OWN group model: the q81
    // saturated grouped poisson has closed-form cell means, so per-group
    // pearson²/deviance² sums and working-residual means are plain SQL.
    // avg_working is a ±1e-13 quantity that rounds to ZERO — and IEEE has
    // two zeros: Spark's round (BigDecimal) always yields +0.0 while
    // DuckDB's yields -0.0 for tiny negatives, which hash differently
    // (r7's red row). `+ 0.0` on BOTH sides normalizes -0.0 → +0.0.
    "q103_grouped_residuals" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("x_high", when(col("l_quantity") > 25, 1.0).otherwise(0.0))
        .withColumn("y", col("l_linenumber").cast("double"))
      val betas = GroupedGLM.fit(li, Seq("l_returnflag"), Seq("x_high"), "y",
        family = "poisson")
      val withAll = Seq("pearson" -> "r_p", "deviance" -> "r_d",
        "working" -> "r_w").foldLeft(li) { case (d, (ty, c)) =>
        GroupedGLM.residuals(betas, d, Seq("l_returnflag"), Seq("x_high"),
          "y", ty, family = "poisson", outputCol = c)
      }
      withAll.groupBy("l_returnflag")
        .agg(r(sum(col("r_p") * col("r_p")), 6).as("chi2"),
          r(sum(col("r_d") * col("r_d")), 6).as("dev2"),
          (r(avg("r_w"), 8) + lit(0.0)).as("avg_working"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // one-way ANOVA from one grouped pass of (n, Σx, Σx²) triples —
    // numeric×categorical association; between/within decomposition is
    // plain arithmetic on the group frame
    "q104_anova" -> ((s, dir) => {
      Contingency.anova(t(s, dir, "lineitem"), "l_extendedprice", "l_returnflag")
        .select(r(col("f_stat"), 6).as("f_stat"), col("df_between"),
          col("df_within"), r(col("eta_sq"), 10).as("eta_sq"), col("n_rows"))
    }),

    // numeric distribution drift (PSI) between the F and O linestatus
    // populations over explicit price cut points — per-side proportions
    // from one aggregation each, PSI arithmetic on the tiny bin frames
    "q105_psi_numeric" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Drift.psi(li.filter(col("l_linestatus") === "F"),
          li.filter(col("l_linestatus") === "O"),
          "l_extendedprice", cuts = Seq(10000.0, 25000.0, 50000.0))
        .select(r(col("psi"), 8).as("psi"), col("n_bins"))
    }),

    // categorical drift: returnflag mix between the same two populations
    // (strongly shifted by construction — R/A occur only on old orders)
    "q106_psi_categorical" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Drift.categoricalPsi(li.filter(col("l_linestatus") === "F"),
          li.filter(col("l_linestatus") === "O"), "l_returnflag")
        .select(r(col("psi"), 8).as("psi"), col("n_bins"))
    }),

    // unpivot/melt — pivot's inverse: wide per-flag aggregates to long
    // (flag, measure, value) rows via Dataset.unpivot (no UNION-of-scans:
    // one pass, the values columns are sliced per row)
    "q107_unpivot" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(r(sum("l_quantity"), 2).as("sum_qty"),
          r(sum("l_extendedprice"), 2).as("sum_price"),
          count(lit(1)).cast("double").as("n_items"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("n_items")),
          "measure", "value")
        .orderBy("l_returnflag", "measure")
    }),

    // per-key hourly grid + LOCF forward fill — grid generated distributed
    // (sequence/explode inside each key's span), fill is a running
    // last(ignoreNulls) window per key
    "q108_gapfill" -> ((s, dir) => {
      TimeSeries.resampleFfill(
          events(s, dir).filter(col("event_type").isin("purchase", "signup")),
          "event_type", "ts", "value", "hour")
        .select(col("event_type"),
          date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("n_events"), col("is_gap").cast("int").as("is_gap"),
          r(col("value_fill"), 6).as("value_fill"))
        .orderBy("event_type", "hour")
    }),

    // Gopher-style repetition signals: dup-token fraction is a per-row HOF,
    // top-bigram fraction shuffles (id, gram) pairs only
    "q109_repetition" -> ((s, dir) => {
      TextOps.repetitionStats(t(s, dir, "documents"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tokens"),
          r(col("dup_token_frac"), 6).as("dup_token_frac"),
          r(col("top_2gram_frac"), 6).as("top_2gram_frac"))
        .orderBy("doc_id")
    }),

    // temperature-based corpus mixture: weight ∝ (char mass)^0.5, epochs at
    // a 1M-char budget — one grouped agg + window math over |domains| rows
    "q110_mixture_weights" -> ((s, dir) => {
      Sampling.mixtureWeights(t(s, dir, "documents"), "source", "n_chars",
          alpha = 0.5, budget = 1000000.0)
        .select(col("domain").as("source"), col("n_docs"),
          r(col("n_units"), 1).as("n_units"),
          r(col("natural_frac"), 8).as("natural_frac"),
          r(col("weight"), 8).as("weight"),
          r(col("epochs"), 6).as("epochs"))
        .orderBy("source")
    }),

    // salted shuffle join (hot orderkeys spread over 8 reducers via the
    // line number) — semantically transparent, oracle is the plain join
    "q111_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      JoinOps.saltedJoin(li, o, Seq("l_orderkey"), col("l_linenumber"), salt = 8)
        .groupBy("o_orderpriority")
        .agg(r(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    }),

    // Bloom-filter semi-join reduction: selective part dim (p_size ≥ 48
    // keeps ~6%) prunes the lineitem scan before the shuffle join; false
    // positives are dropped by the real join so the result is exact
    "q112_bloom_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part").filter(col("p_size") >= 48)
      JoinOps.bloomPrunedJoin(li, p, "l_partkey", "p_partkey",
          expectedItems = 10000L)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"), r(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("p_brand")
    }),

    // ordered conversion funnel view→click→purchase: the greedy sorted-walk
    // equals the min-chain semantics (tᵢ = min ts of stepᵢ strictly after
    // tᵢ₋₁), which is what the oracle computes CTE by CTE
    "q113_funnel" -> ((s, dir) => {
      EventSeq.funnel(events(s, dir), "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"))
        .orderBy("step_no")
    }),

    // weekly cohort retention off first-activity week; Spark and DuckDB
    // both truncate to ISO Monday weeks, so offsets are exact multiples
    "q114_retention" -> ((s, dir) => {
      EventSeq.retention(events(s, dir), "user_id", "ts", "week")
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
          col("offset"), col("active_users"), col("retention"))
        .orderBy("cohort_week", "offset")
    }),

    // event-type transition matrix; (ts, event_id) ordering makes the lag
    // deterministic under timestamp ties
    "q115_transitions" -> ((s, dir) => {
      EventSeq.transitions(events(s, dir), "user_id", "event_type", "ts",
          "event_id")
        .orderBy("prev", "next")
    }),

    // CDC latest-wins upsert with tombstones: deterministic synthetic
    // changeset (every %10 key updated +100, every %17-not-%10 key
    // deleted); the oracle applies the same changes as CASE/anti-join
    // arithmetic — merge semantics proven equal to direct computation
    "q116_cdc_upsert" -> ((s, dir) => {
      val snap = t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .withColumn("version", lit(1L))
      val upd = snap.filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 100.0)
        .withColumn("version", lit(2L))
        .withColumn("is_deleted", lit(false))
      val dels = snap
        .filter(pmod(col("o_orderkey"), lit(17)) === 0 &&
          pmod(col("o_orderkey"), lit(10)) =!= 0)
        .withColumn("version", lit(2L))
        .withColumn("is_deleted", lit(true))
      Merge.upsertLatest(snap, upd.unionByName(dels), Seq("o_orderkey"),
          "version", deleteCol = Some("is_deleted"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          r(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderstatus")
    }),

    // SCD2 validity intervals over each user's event log; (ts, event_id)
    // tie-break keeps the chain deterministic
    "q117_scd2" -> ((s, dir) => {
      Merge.scd2(events(s, dir).select("user_id", "event_id", "ts"),
          Seq("user_id"), "ts", "event_id")
        .select(col("user_id"), col("event_id"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
          col("is_current").cast("int").as("is_current"))
        .orderBy("user_id", "event_id")
    }),

    // hard per-source quota (md5-ordered deterministic selection) — the
    // count-cap twin of the stratified fractional sample
    "q118_cap_per_key" -> ((s, dir) => {
      Sampling.capPerKey(t(s, dir, "documents"), "source", "doc_id", 50)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
        .orderBy("source")
    }),

    // raw SQL front-end: the same ANSI text runs through spark.sql and
    // DuckDB — gates view registration + SQL-surface semantics
    "q119_sql_frontend" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql("""SELECT o_orderpriority, count(*) AS n_orders,
              |  round(sum(o_totalprice), 2) AS total
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |WHERE c_mktsegment = 'BUILDING'
              |GROUP BY o_orderpriority
              |ORDER BY o_orderpriority""".stripMargin)
    }),

    // blocked fuzzy self-match on part names (first-token blocks,
    // levenshtein <= 3): the pair set aggregated to a per-distance
    // histogram; both engines compute the same textbook edit distance
    "q120_fuzzy_pairs" -> ((s, dir) => {
      // deterministic quarter of the table: the full sf0.1 block join is
      // ~25M levenshtein evals (~33s) — real work the operator handles,
      // but too heavy for a per-round gate; the cap stays above the
      // largest surviving block so the oracle models no dropped blocks
      FuzzyJoin.selfPairs(
          t(s, dir, "part").filter(pmod(col("p_partkey"), lit(4)) === 0),
          "p_partkey", "p_name",
          element_at(split(col("p_name"), " "), 1), maxDist = 3,
          maxBlockSize = 4000)
        .groupBy("dist")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct("id_a").as("n_left"))
        .orderBy("dist")
    }),

    // per-transition funnel latency: the walk's step timestamps equal the
    // min-chain t1/t2/t3, so the oracle averages the same exact-microsecond
    // gaps; integral sums — no float accumulation-order drift
    "q121_funnel_latency" -> ((s, dir) => {
      EventSeq.funnelLatency(events(s, dir), "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"))
        .orderBy("step_no")
    }),

    // PageRank over the symmetrized part–supplier bipartite graph, 3
    // iterations; the oracle unrolls the same three join+agg rounds as
    // CTEs. All scalar arithmetic is phrased identically on both engines
    // (double subtraction/division in the same order), so the only
    // divergence channel is float summation order — ~1e-15 relative,
    // far inside the 6-digit rounding grid of the ×1000-scaled ranks.
    "q122_pagerank" -> ((s, dir) => {
      val pe = t(s, dir, "lineitem")
        .select(concat(lit("p"), col("l_partkey")).as("u"),
          concat(lit("s"), col("l_suppkey")).as("v")).distinct()
      val edges = pe.unionByName(pe.select(col("v").as("u"), col("u").as("v")))
      Graph.pageRank(edges, iters = 3)
        .filter(col("u").startsWith("s"))
        .select(col("u").as("node"), r(col("r") * 1000, 6).as("rank_k"))
        .orderBy("node")
    }),

    // trailing 1-hour per-user moving average on exact microsecond range
    // bounds; the windowed sum runs over integral cents so sliding-window
    // rewrites and segment trees cannot drift
    "q123_moving_avg" -> ((s, dir) => {
      TimeSeries.movingAvg(events(s, dir), "user_id", "ts", "value",
          windowUs = 3600000000L)
        .select(col("event_id"), col("win_n"), col("win_avg"))
        .orderBy("event_id")
    }),

    // robust per-group outliers: median/MAD with the 1.4826 normal-
    // consistency factor; medians interpolate identically on both engines
    // (the q33-proven percentile convention); rounding at 3 keeps the
    // 0.005 interpolation grid intact
    "q124_mad_outliers" -> ((s, dir) => {
      Outliers.madOutliers(t(s, dir, "lineitem"), "l_returnflag",
          "l_extendedprice")
        .select(col("l_returnflag"), col("n"),
          r(col("median"), 3).as("median"), r(col("mad"), 3).as("mad"),
          col("n_outliers"))
        .orderBy("l_returnflag")
    }),

    // one-pass multi-column profile (single Expand, not k scans), long form
    "q125_profile" -> ((s, dir) => {
      Profile.summarize(t(s, dir, "documents"), Seq("lang", "source", "n_chars"))
        .orderBy("column")
    }),

    // Kaplan–Meier time-to-conversion: duration = hours from each user's
    // first event to first purchase (right-censored at the last event).
    // Durations are exact-microsecond quotients (identical doubles on both
    // engines, so the groupBy keys agree); the running product is
    // exp(ordered cumulative ln-sum) — sequential in the same order on
    // both engines, hence hash-stable
    "q126_kaplan_meier" -> ((s, dir) => {
      val per = events(s, dir).groupBy("user_id")
        .agg(min("ts").as("t0"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp"),
          max("ts").as("tl"))
      val dur = per.select(
        ((unix_micros(coalesce(col("tp"), col("tl"))) - unix_micros(col("t0")))
          .cast("double") / 3600000000.0).as("dur"),
        col("tp").isNotNull.cast("int").as("ev"))
      Survival.kaplanMeier(dur, "dur", "ev")
        .select(r(col("t"), 6).as("t"), col("n_risk"), col("d"), col("c"),
          r(col("survival"), 6).as("survival"))
        .orderBy("t")
    }),

    // tie-aware Mann–Whitney AUC: integral doubled numerator off one
    // score-grouped pass, one terminal division
    "q127_auc" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(col("l_discount").as("s"),
        (col("l_quantity") > 25).cast("int").as("y"))
      Eval.auc(d, "s", "y")
        .select(r(col("auc"), 6).as("auc"), col("n_pos"), col("n_neg"))
    }),

    // reliability curve over 5 fixed-width bins of the 10×-scaled discount
    "q128_calibration" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        (col("l_discount") * 10.0).as("s"),
        (col("l_quantity") > 25).cast("int").as("y"))
      Eval.calibration(d, "s", "y", nBins = 5, lo = 0.0, hi = 1.0)
        .select(col("bin"), col("n"), r(col("mean_score"), 6).as("mean_score"),
          r(col("frac_pos"), 6).as("frac_pos"))
        .orderBy("bin")
    }),

    // log-rank test between even and odd user cohorts on the q126
    // durations; identically-ordered double arithmetic term by term
    "q129_logrank" -> ((s, dir) => {
      val per = events(s, dir).groupBy("user_id")
        .agg(min("ts").as("t0"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp"),
          max("ts").as("tl"))
      val dur = per.select(
        ((unix_micros(coalesce(col("tp"), col("tl"))) - unix_micros(col("t0")))
          .cast("double") / 3600000000.0).as("dur"),
        col("tp").isNotNull.cast("int").as("ev"),
        when(pmod(col("user_id"), lit(2)) === 0, "even").otherwise("odd")
          .as("grp"))
      Survival.logRank(dur, "dur", "ev", "grp", "even")
        .select(r(col("chi2"), 6).as("chi2"), col("obs1"),
          r(col("exp1"), 6).as("exp1"))
    }),

    // Welch's t between returned and accepted line items: one conditional-
    // sum aggregation, Welch–Satterthwaite df
    "q130_welch_t" -> ((s, dir) => {
      Hypothesis.welchT(t(s, dir, "lineitem"), "l_extendedprice",
          "l_returnflag", "R", "A")
        .select(r(col("mean_a"), 4).as("mean_a"), r(col("mean_b"), 4).as("mean_b"),
          r(col("t_stat"), 6).as("t_stat"), r(col("df_welch"), 4).as("df_welch"),
          col("n_a"), col("n_b"))
    }),

    // pooled two-proportion z on the high-quantity rate between statuses
    "q131_two_prop_z" -> ((s, dir) => {
      val d = t(s, dir, "lineitem")
        .withColumn("hi", (col("l_quantity") > 25).cast("int"))
      Hypothesis.twoProportionZ(d, "hi", "l_linestatus", "O", "F")
        .select(r(col("p_a"), 6).as("p_a"), r(col("p_b"), 6).as("p_b"),
          r(col("z_stat"), 6).as("z_stat"), col("n_a"), col("n_b"))
    }),

    // two-sample KS on the price distribution: integral ECDF numerators off
    // one distinct-value pass, one terminal division
    "q132_ks_test" -> ((s, dir) => {
      Hypothesis.ksTest(t(s, dir, "lineitem"), "l_extendedprice",
          "l_returnflag", "R", "A")
        .select(r(col("d_stat"), 6).as("d_stat"), col("n_a"), col("n_b"))
    }),

    // Spearman rho between quantity and price: average ranks from the
    // distinct-value frames, Pearson sums identity over the ranks
    "q133_spearman" -> ((s, dir) => {
      Hypothesis.spearman(t(s, dir, "lineitem"), "l_quantity", "l_extendedprice")
        .select(r(col("rho"), 6).as("rho"), col("n"))
    }),

    // pairwise correlation matrix: ONE moments aggregation for all 6 pairs
    "q134_corr_matrix" -> ((s, dir) => {
      Contingency.corrMatrix(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .select(col("col_a"), col("col_b"), r(col("corr"), 6).as("corr"))
        .orderBy("col_a", "col_b")
    }),

    // ACF of the daily-revenue series at lags 1..3: one moments pass +
    // one keyed-window lag pass emitting all lags
    "q135_acf" -> ((s, dir) => {
      val daily = t(s, dir, "orders").groupBy("o_orderdate")
        .agg(sum("o_totalprice").as("v"))
        .withColumn("g", lit("all"))
      TimeSeries.acf(daily, "g", "o_orderdate", "v", maxLag = 3)
        .select(col("lag"), r(col("r"), 6).as("r"), col("n"))
        .orderBy("lag")
    }),

    // out-of-fold target encoding of the return flag (q97's hex-digit
    // folds): leak-free per-(category, fold) means, fact table aggregated
    // once; gate = the distinct encoding table
    "q136_target_encode" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val digit = substring(md5(concat_ws("-",
        col("l_orderkey"), col("l_linenumber"))), 32, 1)
      val fold = when(digit < "4", 0).when(digit < "8", 1)
        .when(digit < "c", 2).otherwise(3)
      Encode.targetEncode(li, "l_returnflag", "l_extendedprice",
          idCol = "l_orderkey", k = 4, foldCol = Some(fold))
        .groupBy(col("l_returnflag"), col("fold"))
        .agg(count(lit(1)).as("n"), r(min("te"), 4).as("te"))
        .orderBy("l_returnflag", "fold")
    }),

    // q125's bounded-memory twin: PORTABLE per-column HLL register
    // tables instead of the exact multi-distinct Expand — the 100 TB
    // default, where per-column exact distincts are the expensive half
    // of the pass. The md5 registers + exact-integer-scaled readout
    // replay bit-for-bit in DuckDB (the q333/q334 machinery), so the
    // estimator is hash-gated, not rows-only; ProfileSpec still asserts
    // tolerance vs the exact pass and that the plan carries no Expand
    "q137_profile_approx" -> ((s, dir) => {
      Profile.summarize(t(s, dir, "documents"), Seq("lang", "source", "n_chars"),
          approxDistinct = true)
        .orderBy("column")
    }),

    // q128's unbounded-score twin: approx-quantile bin edges (equi-mass
    // bins) instead of fixed-width [lo, hi) — calibration for scores with
    // unknown range. GK sketch edges aren't bit-compatible with DuckDB →
    // rows-only; EvalSpec asserts parity vs fixed-width on uniform scores
    "q138_calibration_quantile" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("score", col("l_quantity") / lit(50.0))
        .withColumn("label", when(col("l_returnflag") === "R", 1).otherwise(0))
      Eval.calibrationQuantile(li, "score", "label", nBins = 5)
        .select(col("bin"), col("n"), r(col("mean_score"), 6).as("mean_score"),
          r(col("frac_pos"), 6).as("frac_pos"))
        .orderBy("bin")
    }),

    // LLM sequence packing: concat-then-chunk layout over the documents
    // table (char-budget windows; the measure column is whatever counts
    // tokens). Pure running-sum arithmetic via the two-level Cumulative
    // pass — exact SQL on both engines, integral columns, no rounding
    "q139_seq_packing" -> ((s, dir) => {
      Pack.chunkAssign(t(s, dir, "documents").select("doc_id", "n_chars"),
          "n_chars", "doc_id", budget = 4096)
        .select("doc_id", "start_offset", "chunk", "pos", "n_chunks")
        .orderBy("doc_id")
    }),

    // Cohen's kappa: agreement between the return flag and a rule-based
    // "classifier" — one contingency shuffle, chance-corrected arithmetic
    "q140_kappa" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("rater_b",
          when(col("l_linestatus") === "O", "N")
            .when(col("l_quantity") > 25, "A").otherwise("R"))
      Contingency.kappa(li, "l_returnflag", "rater_b")
        .select(r(col("kappa"), 8).as("kappa"),
          r(col("p_observed"), 8).as("p_observed"),
          r(col("p_expected"), 8).as("p_expected"), col("n_rows"))
    }),

    // quantile (ECDF) normalization of a continuous feature, checked via
    // per-flag means — the rank map rides the two-level Cumulative pass;
    // SQL cume_dist is the exact oracle
    "q141_ecdf_normalize" -> ((s, dir) => {
      Normalize.ecdf(t(s, dir, "lineitem"), "l_extendedprice")
        .groupBy("l_returnflag")
        .agg(r(avg("ecdf"), 8).as("avg_ecdf"), count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // Shannon entropy of the (returnflag, linestatus) pair — one groupBy
    // shuffle, −Σ p ln p on the level frame
    "q142_entropy" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("pair", concat_ws("|", col("l_returnflag"), col("l_linestatus")))
      Contingency.entropy(li, "pair")
        .select(r(col("entropy"), 8).as("entropy"), col("n_levels"),
          col("n_rows"))
    }),

    // Jensen–Shannon divergence between the F and O populations' flag
    // mixes — PSI's bounded symmetric sibling (q106's design, no eps)
    "q143_jsd" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Drift.jsd(li.filter(col("l_linestatus") === "F"),
          li.filter(col("l_linestatus") === "O"), "l_returnflag")
        .select(r(col("jsd"), 8).as("jsd"), col("n_bins"))
    }),

    // Gini concentration of document lengths — Lorenz arithmetic over the
    // distinct-value frame, prefix sums via the two-level Cumulative pass
    "q144_gini" -> ((s, dir) => {
      Profile.gini(t(s, dir, "documents"), "n_chars")
        .select(r(col("gini"), 8).as("gini"), col("n_rows"))
    }),

    // per-language nucleus (top-p) selection by document mass: keep the
    // heaviest docs covering half of each language's characters — one
    // keyed window shuffle; integral char sums keep the threshold
    // comparison exact on both engines
    "q145_top_p_mass" -> ((s, dir) => {
      Sampling.topPMass(t(s, dir, "documents"), "lang", "n_chars", "doc_id",
          p = 0.5)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars").cast("long")).as("chars_kept"))
        .orderBy("lang")
    }),

    // feature scaling end-to-end: z-score and min-max of quantity, checked
    // through per-flag means — two one-row stats frames, pure projections
    "q146_feature_scale" -> ((s, dir) => {
      val z = Normalize.zscore(t(s, dir, "lineitem"), "l_quantity")
      Normalize.minmax(z, "l_quantity")
        .groupBy("l_returnflag")
        .agg(r(avg("z"), 8).as("avg_z"), r(avg("scaled"), 8).as("avg_scaled"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // deterministic weighted sampling without replacement (Efraimidis–
    // Spirakis with md5-derived uniforms): 25 docs ∝ length — the
    // content-keyed split philosophy applied to weighted draws; the ES key
    // is identical arithmetic on both engines
    "q147_weighted_sample" -> ((s, dir) => {
      Sampling.weightedSample(t(s, dir, "documents"), "doc_id", "n_chars", 25)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    }),

    // corpus vocabulary head: exact top-20 tokens via the Misra-Gries
    // bounded-memory path (never a full-vocab shuffle); exactness holds
    // because the 20th token frequency far exceeds n/(capacity+1)
    "q148_vocab_topk" -> ((s, dir) => {
      val toks = graft.ops.fanOut(t(s, dir, "documents"))
        .select(explode(filter(split(col("text"), "\\s+"), x => x =!= ""))
          .as("token"))
      TopK.heavyHitters(toks, "token", k = 20)
        .select(col("key").as("token"), col("cnt"))
    }),

    // Huber robust regression, gated through its OLS fixed point: with
    // delta large enough that no residual is downweighted the IRLS
    // converges to exactly the q18 normal equations — the full
    // scale/weight/refit plumbing runs, the oracle is closed-form SQL.
    // The downweighting path is RobustSpec's outlier property.
    "q149_huber_ols" -> ((s, dir) => {
      val m = Robust.huber(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_discount"), "l_extendedprice", delta = 1e9)
      import s.implicits._
      Seq((rd(m.coef(0), 3), rd(m.coef(1), 3), rd(m.coef(2), 3), m.n))
        .toDF("b_intercept", "b_quantity", "b_discount", "n_rows")
    }),

    // Benford first-digit audit of order keys — digits from the decimal
    // string (identical integer rendering on both engines), one shuffle
    "q150_benford" -> ((s, dir) => {
      Profile.benford(t(s, dir, "orders"), "o_orderkey")
        .select(col("digit"), col("n"), r(col("frac"), 8).as("frac"),
          r(col("benford_p"), 8).as("benford_p"))
        .orderBy("digit")
    }),

    // q108's linear-interpolation twin: gap buckets blend the straddling
    // known values by exact epoch-microsecond ratios
    "q151_resample_interp" -> ((s, dir) => {
      TimeSeries.resampleInterp(
          events(s, dir).filter(col("event_type").isin("purchase", "signup")),
          "event_type", "ts", "value", "hour")
        .select(col("event_type"),
          date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("n_events"), col("is_gap").cast("int").as("is_gap"),
          r(col("value_interp"), 6).as("value_interp"))
        .orderBy("event_type", "hour")
    }),

    // PMI collocations: top bigrams by pointwise mutual information, the
    // margins off the bigram table itself — ONE pair shuffle; PMI rounded
    // to a 6-digit grid BEFORE ranking so the order is engine-stable
    "q152_pmi_bigrams" -> ((s, dir) => {
      Colloc.pmiBigrams(t(s, dir, "documents"), "text", minCount = 5,
        topK = 20)
    }),

    // declarative data-quality contract: five scalar rules fused into ONE
    // scan + one referential anti-join — the generator's repeated
    // (orderkey, linenumber) pairs make the uniqueness violation real
    "q153_quality_report" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Quality.report(li, Seq(
        Quality.NotNull("l_orderkey"),
        Quality.Unique(Seq("l_orderkey", "l_linenumber")),
        Quality.InRange("l_discount", 0.0, 0.1),
        Quality.InRange("l_quantity", 1.0, 45.0),
        Quality.Matches("l_returnflag", "^[ANR]$"),
        Quality.ForeignKey(t(s, dir, "orders"), "l_orderkey", "o_orderkey",
          "orders")))
        .orderBy("rule")
    }),

    // BM25 keyword search over the corpus: query-term filter BEFORE any
    // shuffle, |query|-row df frame broadcast; 6-digit score grid before
    // the top-20 so both engines pick the identical row set
    "q154_bm25" -> ((s, dir) => {
      Retrieval.bm25(t(s, dir, "documents"), "doc_id", "text",
          Seq("spark", "table", "query"))
        .select(col("id").as("doc_id"), col("n_terms_hit"),
          r(col("score"), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }),

    // multinomial Naive Bayes language ID, resubstitution-scored; the
    // class log-score is rounded to a 6-digit grid BEFORE the argmax so
    // the predicted label is stable under summation-order differences
    "q155_nbayes" -> ((s, dir) => {
      NBayes.fitPredict(t(s, dir, "documents"), "doc_id", "text", "lang")
        .select(col("id").as("doc_id"), col("label").as("lang"),
          col("predicted"), col("score"))
        .orderBy("doc_id")
    }),

    // corpus-relative quality signal: mean unigram surprisal per document
    "q156_surprisal" -> ((s, dir) => {
      Retrieval.surprisal(t(s, dir, "documents"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tokens"),
          r(col("surprisal"), 6).as("surprisal"))
        .orderBy("doc_id")
    }),

    // fixed-width histogram of extended price: integer counts, exact
    // bin-edge arithmetic — no rounding anywhere (identical IEEE both
    // engines; [0, 120000)/24 edges are exactly representable)
    "q157_histogram" -> ((s, dir) => {
      Profile.histogram(t(s, dir, "lineitem"), "l_extendedprice",
          lo = 0.0, hi = 120000.0, bins = 24)
        .orderBy("bin")
    }),

    // finite-kernel EWMA over the hourly purchase/signup series: inputs
    // rounded onto a 6-digit grid FIRST (identical on both engines), then
    // the α=1/2 kernel — every weight a power of two, the num/den folds
    // left-to-right — is bit-reproducible; output re-rounded for safety
    "q158_ewma" -> ((s, dir) => {
      val hourly = events(s, dir)
        .filter(col("event_type").isin("purchase", "signup"))
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("bucket"))
        .agg(r(avg("value"), 6).as("v"))
      TimeSeries.ewmaKernel(hourly, "event_type", "bucket", "v",
          alpha = 0.5, lookback = 8)
        .select(col("event_type"),
          date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("v"), r(col("ewma"), 6).as("ewma"))
        .orderBy("event_type", "hour")
    }),

    // two-window mean-shift change score on the same hourly series —
    // integral micro-units inside the frames (any summation order is
    // exact), one division per side at the end
    "q159_change_score" -> ((s, dir) => {
      val hourly = events(s, dir)
        .filter(col("event_type").isin("purchase", "signup"))
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("bucket"))
        .agg(round(avg("value") * 1e6).cast("long").as("v_micro"))
      TimeSeries.changeScore(hourly, "event_type", "bucket", "v_micro",
          window = 24)
        .filter(col("score").isNotNull)
        .select(col("event_type"),
          date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          r(col("score") / 1e6, 6).as("score"))
        .orderBy("event_type", "hour")
    }),

    // reciprocal-rank fusion of two document orderings (length in chars /
    // length in tokens): competition ranks from the two-level Cumulative
    // pass — no unpartitioned data-sized window anywhere
    "q160_rrf" -> ((s, dir) => {
      val docs = graft.ops.fanOut(t(s, dir, "documents"))
        .withColumn("n_tokens",
          size(filter(split(col("text"), "\\s+"), x => x =!= ""))
            .cast("long"))
      Retrieval.rrf(docs, Seq("n_chars", "n_tokens"))
        .select(col("doc_id"), col("rank_n_chars"), col("rank_n_tokens"),
          r(col("rrf"), 8).as("rrf"))
        .orderBy("doc_id")
    }),

    // token-budget draw per source (the post-mixture materialization
    // step): md5-ordered keep-while-under-budget, crossing row included
    "q161_token_budget" -> ((s, dir) => {
      val docs = graft.ops.fanOut(t(s, dir, "documents"))
        .withColumn("n_tokens",
          size(filter(split(col("text"), "\\s+"), x => x =!= ""))
            .cast("long"))
      Sampling.tokenBudget(docs, "source", "doc_id", "n_tokens",
          Map("src0" -> 600L, "src1" -> 700L, "src2" -> 800L))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs_kept"),
          sum("n_tokens").as("tokens_kept"))
        .orderBy("source")
    }),

    // one-pass disjoint-block CI for the mean price: 16 md5-assigned
    // blocks (mod-16 of the 15-hex-digit prefix = that prefix's LAST hex
    // character, which is how the oracle states it)
    "q162_block_ci" -> ((s, dir) => {
      Sampling.blockMeansCI(t(s, dir, "lineitem"), "l_orderkey",
          "l_extendedprice", blocks = 16)
        .select(r(col("mean"), 4).as("mean"), r(col("se"), 4).as("se"),
          r(col("ci_lo"), 4).as("ci_lo"), r(col("ci_hi"), 4).as("ci_hi"),
          col("n_rows"), col("n_blocks"))
    }),

    // k-means over the embedding column; k rows out, content-keyed
    // deterministic init. HASH-GATED: the oracle replays the 10 Lloyd
    // rounds as unrolled CTEs — assignments are float-robust (smallest
    // best-vs-second-centroid gap 4.6e-4 on this data)
    "q163_kmeans" -> ((s, dir) => {
      val res = Cluster.kmeans(t(s, dir, "embeddings"), "vec_id",
        "embedding", k = 8, maxIter = 10)
      res.assignments.groupBy("cluster")
        .agg(count(lit(1)).as("n"))
        .orderBy("cluster")
    }),

    // average precision (step-wise PR-curve area, sklearn convention):
    // same reduction shape as q127 — one score-grouped pass + the
    // two-level cumulative; the only float sum is over the 11-row
    // distinct-score frame, rounded at 6
    "q164_pr_auc" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(col("l_discount").as("s"),
        (col("l_quantity") > 25).cast("int").as("y"))
      Eval.averagePrecision(d, "s", "y")
        .select(r(col("ap"), 6).as("ap"), col("n_pos"), col("n"))
    }),

    // confusion-matrix metrics at three thresholds in ONE scan; every
    // metric is a single division of integral counts (mirrored formula
    // text in the oracle so the IEEE path is identical — no rounding)
    "q165_threshold_metrics" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        (col("l_discount") * 10.0).as("s"),
        (col("l_quantity") > 25).cast("int").as("y"))
      Eval.thresholdMetrics(d, "s", "y", Seq(0.25, 0.5, 0.75))
        .orderBy("threshold")
    }),

    // Mann–Whitney U between returned and accepted prices: integral
    // doubled numerator + tie-corrected z off one distinct-value pass
    "q166_mann_whitney" -> ((s, dir) => {
      Hypothesis.mannWhitney(t(s, dir, "lineitem"), "l_extendedprice",
          "l_returnflag", "R", "A")
        .select(col("u_stat"), r(col("z_stat"), 6).as("z_stat"),
          col("n_a"), col("n_b"))
    }),

    // Benjamini–Hochberg q-values over the 11-level pseudo-p column
    // (10× discount): per-row rational arithmetic on integral ranks —
    // bit-identical across engines, no rounding; suffix min runs as the
    // descending two-level cumulative pass
    "q167_bh_fdr" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select((col("l_discount") * 10.0).as("pv"))
      Hypothesis.bhAdjust(d, "pv")
        .orderBy("p_value")
    }),

    // exact triangle count on the co-order part graph (every-3rd parts):
    // the degree-ordered orientation bounds each out-neighborhood by
    // O(√m), so wedge generation is O(m^1.5) not Σdeg² — all counts are
    // exact integers, the one float (gcc) divides them once
    "q168_triangles" -> ((s, dir) => {
      val lp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 3 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val edges = lp.join(lp.select(col("o"), col("p").as("p2")), "o")
        .filter(col("p") < col("p2"))
        .select(col("p").as("u"), col("p2").as("v"))
      Graph.triangleStats(edges)
    }),

    // interpolated Kneser–Ney bigram LM head: every count is an integer
    // aggregate of ONE bigram-pair shuffle; p_kn is one fixed-order
    // double expression, rounded to the 6-digit grid BEFORE the top-k
    // cut so the selected set is engine-stable
    "q169_kneser_ney" -> ((s, dir) => {
      Ngram.kneserNeyBigrams(t(s, dir, "documents"), "text")
        .filter(col("n_ab") >= 5)
        .select(col("w1"), col("w2"), col("n_ab"),
          r(col("p_kn"), 6).as("p_kn"))
        .orderBy(col("p_kn").desc, col("w1"), col("w2"))
        .limit(50)
    }),

    // per-document bigram perplexity under the corpus's own KN model —
    // the LM-based quality score; the scoring join strategy is AQE's
    // call (the model frame is |observed bigrams|-sized)
    "q170_perplexity" -> ((s, dir) => {
      Ngram.perplexity(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // additive seasonal decomposition of the per-type hourly event
    // series: integral-cents window sums (trend) and an exact-long
    // detrended numerator (seasonal), so no summation order can move
    // either — the only rounded floats divide exact integers
    "q171_decompose" -> ((s, dir) => {
      TimeSeries.decompose(events(s, dir), "event_type", "ts", "value",
          period = 24, halfWindow = 12)
        .orderBy("event_type", "bucket")
    }),

    // trailing 7-day per-user OLS slope on exact integer moments
    // (x whole seconds from a fixed origin, y cents): the slope divides
    // two exactly-computed longs, so NO rounding is needed — both
    // engines produce the identical double
    "q172_rolling_slope" -> ((s, dir) => {
      TimeSeries.rollingSlope(events(s, dir), "user_id", "ts", "value",
          windowUs = 7L * 86400 * 1000000, originUs = 1704067200000000L)
        .select(col("event_id"), col("slope_n"), col("slope"))
        .orderBy("event_id")
    }),

    // snapshot diff: old = orders, new = orders with keys ≡0 (mod 7)
    // dropped, prices bumped on keys ≡0 (mod 5), and shifted copies of
    // keys ≡0 (mod 11) added — ONE keyed full-outer shuffle classifies
    // every key; the gate keeps the non-unchanged rows
    "q173_table_diff" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"))
      val n = o.filter(col("o_orderkey") % 7 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + lit(1.0))
            .otherwise(col("o_totalprice")))
        .unionByName(o.filter(col("o_orderkey") % 11 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L)))
      Diff.tableDiff(o, n, Seq("o_orderkey"))
        .filter(col("diff_status") =!= "unchanged")
        .orderBy("o_orderkey")
    }),

    // supervised vocabulary ranking: per-(term, language) 2×2 χ² over
    // per-document DISTINCT term presence; the only data-sized shuffle
    // is (term, class) doc counts, and χ² lands on the 6-digit grid
    // with a term tiebreak BEFORE the per-class rank cut
    "q174_term_class_chi2" -> ((s, dir) => {
      Contingency.termClassChi2(t(s, dir, "documents"), "doc_id", "text",
          "lang", minDocFreq = 20, topK = 10)
        .orderBy("class", "rank")
    }),

    // McNemar on two paired rules over the same rows (discount>0.04 vs
    // quantity>25): only the discordant counts carry information — one
    // conditional-sum aggregation, χ² divides exact integers
    "q175_mcnemar" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        (col("l_discount") > 0.04).as("a"), (col("l_quantity") > 25).as("b"))
      Hypothesis.mcnemar(d, "a", "b")
    }),

    // synchronous label-propagation communities, 3 rounds on the
    // symmetrized part–supplier graph (q122's relation): the (count desc,
    // label asc) adoption rule is a total order, so the oracle can unroll
    // the same three join+count+rank rounds as CTEs
    "q176_label_prop" -> ((s, dir) => {
      val pe = t(s, dir, "lineitem")
        .select(concat(lit("p"), col("l_partkey")).as("u"),
          concat(lit("s"), col("l_suppkey")).as("v")).distinct()
      val edges = pe.unionByName(pe.select(col("v").as("u"), col("u").as("v")))
      Graph.labelPropagation(edges, rounds = 3)
        .orderBy("u")
    }),

    // degree assortativity of the co-order part graph: one join pass
    // carries all moments (the two stub orientations are symmetric, so
    // sx = sy and the sqrt cancels); exact integer sums, one division
    "q177_assortativity" -> ((s, dir) => {
      val lp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 3 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val edges = lp.join(lp.select(col("o"), col("p").as("p2")), "o")
        .filter(col("p") < col("p2"))
        .select(col("p").as("u"), col("p2").as("v"))
      Graph.degreeAssortativity(edges)
    }),

    // trailing-7-day rolling active users: sliding COUNT(DISTINCT) via
    // contribution explosion on the reduced (user, day) frame — the
    // oracle phrases the same semantics as a range join
    "q178_rolling_active" -> ((s, dir) => {
      EventSeq.rollingActive(events(s, dir), "user_id", "ts", windowDays = 7)
        .orderBy("day")
    }),

    // golden-record survivorship per customer over their orders: majority
    // vote per attribute on ONE melted (cluster, attr, value) pass, ties
    // to the smallest value — deterministic on any engine
    "q179_golden_record" -> ((s, dir) => {
      Consolidate.goldenRecord(t(s, dir, "orders"), "o_custkey",
          Seq("o_orderstatus", "o_orderpriority"))
        .orderBy("o_custkey")
    }),

    // weight-of-evidence table of return flag against the high-quantity
    // target: one category aggregation, 0.5-adjusted shares, IV terms
    "q180_woe" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(col("l_returnflag"),
        (col("l_quantity") > 25).cast("int").as("hi"))
      Encode.woe(d, "l_returnflag", "hi")
        .orderBy("category")
    }),

    // SemDeDup-style embedding dedup: the corpus plus exact copies of
    // every 10th vector — the copies must collapse onto their
    // originals, nothing else pairs at the 0.999 threshold unless truly
    // colinear. HASH-GATED: the oracle replays the whole composition
    // (q163's unrolled Lloyd rounds, 6-digit cosine pairs, q73's
    // recursive-CTE components, min-label filter)
    "q181_semantic_dedup" -> ((s, dir) => {
      val base = t(s, dir, "embeddings")
      val copies = base.filter(col("vec_id") % 10 === 0)
        .withColumn("vec_id", col("vec_id") + lit(1000000L))
      Cluster.semanticDedup(base.unionByName(copies), "vec_id", "embedding",
          k = 8, threshold = 0.999, maxIter = 3)
        .select("vec_id", "label")
        .orderBy("vec_id")
    }),

    // inverted index head: per-term df + sorted posting list serialized
    // as a string (round-trips identically everywhere); presence is
    // per-doc DISTINCT, the (term, doc) agg is the only data-sized shuffle
    "q182_inverted_index" -> ((s, dir) => {
      Retrieval.buildIndex(t(s, dir, "documents"), "doc_id", "text",
          minDf = 50)
        .orderBy("term")
    }),

    // ABC/Pareto classification of parts by revenue: cumulative on the
    // DISTINCT-total frame via the two-level pass; class boundaries
    // compare exact integers (cents·100 vs grand·pct)
    "q183_abc_classify" -> ((s, dir) => {
      Pareto.abcClassify(t(s, dir, "lineitem"), "l_partkey",
          "l_extendedprice")
        .orderBy("key")
    }),

    // FK-candidate probe with a fabricated half-parent (even part keys):
    // containment must land at the exact matched/distinct ratio
    "q184_fk_probe" -> ((s, dir) => {
      Profile.fkCandidates(
        t(s, dir, "lineitem"), "l_partkey",
        t(s, dir, "part").filter(col("p_partkey") % 2 === 0), "p_partkey")
    }),

    // conversion funnel with a 6-hour per-transition budget: same greedy
    // walk as q113, each step must land within the gap of the previous
    "q185_funnel_windowed" -> ((s, dir) => {
      EventSeq.funnelWindowed(events(s, dir), "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"), maxGapUs = 21600000000L)
        .orderBy("step_no")
    }),

    // per-user engagement cadence: exact epoch-microsecond spans/gaps,
    // one keyed window shuffle, divisions at the end
    "q186_inter_event" -> ((s, dir) => {
      EventSeq.interEventStats(events(s, dir), "user_id", "ts", "event_id")
        .orderBy("user")
    }),

    // cross-corpus exact Jaccard join (dedup a new slice against the
    // existing corpus): PPJoin prefix/length/positional filters, bucket
    // cap raised above the corpus so the result IS the full relation
    "q187_cross_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.jaccardJoinPairs(
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
          n = 5, threshold = 0.4, maxBucketPairs = 10000000L)
        .select(col("id_a"), col("id_b"), r(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // squared Mahalanobis distance on (quantity, price): one fused
    // moment aggregation, driver 2×2 inverse, literal-kernel quadratic
    // form in codegen; the oracle rebuilds the inverse in closed form —
    // ~1 ulp from the driver's LU, far inside the 6-digit grid
    "q188_mahalanobis" -> ((s, dir) => {
      Outliers.mahalanobis(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice"))
        .select(col("l_orderkey"), col("l_linenumber"),
          r(col("md2"), 6).as("md2"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // per-type linear forecast 3 days past each type's last observed
    // day: five exact integer moments per key, closed-form (a, b),
    // key-cardinality explode for the horizon rows
    "q189_forecast" -> ((s, dir) => {
      TimeSeries.forecastLinear(events(s, dir), "event_type", "ts",
          "value", horizon = 3, originUs = 1704067200000000L)
        .orderBy("key", "h")
    }),

    // top event paths: each user's first 3 event types in time order,
    // ranked by frequency with a path tiebreak
    "q190_top_paths" -> ((s, dir) => {
      EventSeq.topPaths(events(s, dir), "user_id", "event_type", "ts",
          "event_id", maxLen = 3, topK = 15)
    }),

    // split-conformal 90% intervals for the price model: md5-sixteenth
    // calibration split, engine-percentile residual quantile, ±q bands
    "q191_conformal" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").withColumn("rid",
        concat_ws("-", col("l_orderkey"), col("l_linenumber")))
      Conformal.lmIntervals(li, Seq("l_quantity"), "l_extendedprice",
          "rid", alpha = 0.1)
        .select(col("l_orderkey"), col("l_linenumber"),
          r(col("prediction"), 4).as("prediction"),
          r(col("conf_lo"), 4).as("conf_lo"),
          r(col("conf_hi"), 4).as("conf_hi"),
          col("is_calib"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // one-vs-rest multinomial on a saturated design: each per-class
    // binomial fit converges to the exact cell proportions, and over a
    // cell the class proportions already sum to 1, so the normalized
    // scores ARE the cell mixtures — closed-form in DuckDB
    "q192_multinomial" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        (col("l_quantity") > 25).cast("double").as("hi"),
        col("l_returnflag").as("cls"))
      val m = Multinomial.fitOneVsRest(d, Seq("hi"), "cls")
      m.predict(d.select("hi").distinct())
        .select(col("hi"), r(col("p_A"), 6).as("p_a"),
          r(col("p_N"), 6).as("p_n"), r(col("p_R"), 6).as("p_r"),
          col("predicted"))
        .orderBy("hi")
    }),

    // sentence chunking for training data: documents carry no
    // punctuation, so both engines first rebuild 8-word sentences with
    // identical list arithmetic; the greedy pack (20-token budget) then
    // has an exact recursive-CTE oracle
    "q193_chunks" -> ((s, dir) => {
      val toks = filter(split(col("text"), "\\s+"), t => t =!= "")
      val ng = ceil(size(toks) / lit(8.0)).cast("int")
      val text2 = array_join(transform(sequence(lit(1), ng), g =>
        concat(array_join(slice(toks, (g - 1) * 8 + 1, lit(8)), " "),
          lit("."))), " ")
      val sentenced = graft.ops.fanOut(t(s, dir, "documents"))
        .filter(size(toks) > 0)
        .select(col("doc_id"), text2.as("text2"))
      TextOps.chunkBySentence(sentenced, "doc_id", "text2", maxTokens = 20)
        .orderBy("doc_id", "chunk_id")
    }),

    // greedy farthest-point diversity sample over the embeddings.
    // HASH-GATED: the oracle unrolls the 12 farthest-first rounds;
    // every round's argmax gap is O(1e-2), far above float noise
    "q194_kcenter" -> ((s, dir) => {
      Sampling.kCenter(t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 12)
        .select(col("vec_id"), col("pick_order"), r(col("min_dist"), 4)
          .as("min_dist"))
        .orderBy("pick_order")
    }),

    // which columns changed between the q173 snapshots, over matched keys
    "q195_column_changes" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"))
      val n = o.filter(col("o_orderkey") % 7 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + lit(1.0))
            .otherwise(col("o_totalprice")))
        .unionByName(o.filter(col("o_orderkey") % 11 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L)))
      Diff.columnChanges(o, n, Seq("o_orderkey"))
        .orderBy("column")
    }),

    // joint quantity × discount density grid; identical right-open
    // binning with clamp and under/overflow cells
    "q196_histogram2d" -> ((s, dir) => {
      Profile.histogram2d(t(s, dir, "lineitem"), "l_quantity",
          "l_discount", 0.0, 50.0, 10, 0.0, 0.1, 5)
        .orderBy("xbin", "ybin")
    }),

    // q178's sketch twin: PORTABLE daily HLL register tables, trailing
    // windows as register unions (cell-wise max) over the day × 2^p
    // frame — the 100 TB rolling-actives path. The portable registers
    // replay bit-for-bit in DuckDB → full hash oracle; EventSeqSpec
    // additionally holds it within 5% of the exact op
    "q197_rolling_active_hll" -> ((s, dir) => {
      EventSeq.rollingActiveApprox(events(s, dir), "user_id", "ts",
          windowDays = 7)
        .orderBy("day")
    }),

    // weighted quantiles (price weighted by quantity): distinct-value
    // collapse + two-level cumulative mass + conditional-min selection;
    // integral weights make every comparison exact
    "q198_weighted_quantiles" -> ((s, dir) => {
      Weighted.weightedQuantiles(t(s, dir, "lineitem"), "l_extendedprice",
          "l_quantity", Seq(0.25, 0.5, 0.75, 0.9, 0.99))
        .orderBy("q")
    }),

    // PII scrub over documents with deterministic synthesized contacts
    // (the corpus carries none): RE2-compatible patterns, byte-identical
    // replacements on both engines
    "q199_redact" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or 415-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("t"))
      TextOps.redactPII(d, "t")
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          col("redacted"))
        .orderBy("doc_id")
    }),

    // 27-core of the co-order part graph: iterative peel to the unique
    // fixed point (7 rounds at sf0.01); the oracle unrolls 10 peel
    // rounds — idempotent past the fixed point, so the margin is safe
    "q200_kcore" -> ((s, dir) => {
      val lp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 3 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val edges = lp.join(lp.select(col("o"), col("p").as("p2")), "o")
        .filter(col("p") < col("p2"))
        .select(col("p").as("u"), col("p2").as("v"))
      Graph.kCore(edges, k = 27)
        .orderBy("node")
    }),

    // BFS hop distances from part p1 over the symmetrized part–supplier
    // bipartite graph; the oracle is a bounded recursive CTE + min(d)
    "q201_bfs" -> ((s, dir) => {
      val pe = t(s, dir, "lineitem")
        .select(concat(lit("p"), col("l_partkey")).as("u"),
          concat(lit("s"), col("l_suppkey")).as("v")).distinct()
      val edges = pe.unionByName(pe.select(col("v").as("u"), col("u").as("v")))
      Graph.bfsLevels(edges, "p1", maxDepth = 4)
        .orderBy("node")
    }),

    // RFM segmentation over orders: integral cents, rank-based quartile
    // shares (ceil(4·cum/n) — a total function of the value, unlike
    // ntile's physical-order tie split)
    "q202_rfm" -> ((s, dir) => {
      Segment.rfm(t(s, dir, "orders"), "o_custkey", "o_orderdate",
          "o_totalprice")
        .orderBy("o_custkey")
    }),

    // first/last/linear attribution of purchases to preceding touches
    // within a 2-day lookback; (ts, event_id) totalizes the touch order
    "q203_attribution" -> ((s, dir) => {
      EventSeq.attribution(events(s, dir), "user_id", "event_type", "ts",
          "event_id", "purchase", lookbackUs = 2L * 86400 * 1000000)
        .orderBy("event_type")
    }),

    // CUSUM over daily order revenue: s_scaled = n·cum − t·G is pure
    // Long arithmetic (no float summation channel), cusum = s/n
    "q204_cusum" -> ((s, dir) => {
      val daily = t(s, dir, "orders").select(
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
          .as("day"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      TimeSeries.cusum(daily, "day", "cents")
        .orderBy("day")
    }),

    // Nelson–Aalen cumulative hazard on q126's time-to-conversion frame:
    // ordered cumulative of identical per-row doubles — hash-stable
    "q205_nelson_aalen" -> ((s, dir) => {
      val per = events(s, dir).groupBy("user_id")
        .agg(min("ts").as("t0"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp"),
          max("ts").as("tl"))
      val dur = per.select(
        ((unix_micros(coalesce(col("tp"), col("tl"))) - unix_micros(col("t0")))
          .cast("double") / 3600000000.0).as("dur"),
        col("tp").isNotNull.cast("int").as("ev"))
      Survival.nelsonAalen(dur, "dur", "ev")
        .select(r(col("t"), 6).as("t"), col("n_risk"), col("d"), col("c"),
          r(col("cum_hazard"), 6).as("cum_hazard"),
          r(col("var_hazard"), 6).as("var_hazard"))
        .orderBy("t")
    }),

    // Flesch readability over q193's rebuilt 8-word sentences (the corpus
    // carries no punctuation); RE2 counts, fixed-order formula arithmetic
    "q206_readability" -> ((s, dir) => {
      val toks = filter(split(col("text"), "\\s+"), t => t =!= "")
      val ng = ceil(size(toks) / lit(8.0)).cast("int")
      val text2 = array_join(transform(sequence(lit(1), ng), g =>
        concat(array_join(slice(toks, (g - 1) * 8 + 1, lit(8)), " "),
          lit("."))), " ")
      val sentenced = graft.ops.fanOut(t(s, dir, "documents"))
        .filter(size(toks) > 0)
        .select(col("doc_id"), text2.as("text2"))
      TextOps.readability(sentenced, "text2")
        .select(col("doc_id"), col("n_words"), col("n_sentences"),
          col("n_syllables"), col("flesch"), col("fk_grade"))
        .orderBy("doc_id")
    }),

    // HITS on the DIRECTED part→supplier graph (hubs = parts,
    // authorities = suppliers); 3 L1-normalized power iterations, the
    // oracle unrolls them with materialized CTEs (the q176 discipline)
    "q207_hits" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem")
        .select(concat(lit("p"), col("l_partkey")).as("u"),
          concat(lit("s"), col("l_suppkey")).as("v")).distinct()
      Graph.hits(edges, iters = 3)
        .select(col("node"), r(col("hub"), 8).as("hub"),
          r(col("authority"), 8).as("authority"))
        .orderBy("node")
    }),

    // class-balancing oversample of documents by language: per-row copy
    // counts are a pure function of (class count, md5(doc_id)) —
    // engine-identical, no window
    "q208_oversample" -> ((s, dir) => {
      Sampling.oversample(t(s, dir, "documents")
          .select(col("doc_id"), col("lang")), "lang", "doc_id")
        .orderBy("lang", "doc_id", "copy")
    }),

    // Fellegi–Sunter match scores over nation-blocked customer pairs:
    // u estimated from the pairs (0.5-adjusted), ln-ratio weights in
    // identical fixed order; the 4-digit grid lands BEFORE the top-k cut
    "q209_linkage" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey"),
        col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
      val pairs = c.join(c.select(col("c_custkey").as("b_key"),
          col("c_nationkey").as("b_nat"),
          col("c_mktsegment").as("b_seg"), col("c_acctbal").as("b_bal")),
          col("c_nationkey") === col("b_nat") &&
            col("c_custkey") < col("b_key"))
        .select(col("c_custkey").as("a"), col("b_key").as("b"),
          (col("c_mktsegment") === col("b_seg")).as("f_seg"),
          (abs(col("c_acctbal") - col("b_bal")) < 500.0).as("f_bal"))
      Linkage.fellegiSunter(pairs, Seq("f_seg", "f_bal"), Seq(0.9, 0.85))
        .select(col("a"), col("b"), col("fs_score"))
        .orderBy(col("fs_score").desc, col("a"), col("b"))
        .limit(100)
    }),

    // isotonic calibration by PAV over 5 score bins — completes the
    // q128/q138 calibration family. HASH-GATED: PAVA's pooled rates
    // equal the minimax identity max_{j<=i} min_{k>=i} avg(j..k), which
    // the oracle evaluates directly from integer range sums
    "q210_isotonic" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        (col("l_discount") * 10.0).as("s"),
        (col("l_quantity") > 25).cast("int").as("y"))
      Eval.isotonicCalibration(d, "s", "y", nBins = 5, lo = 0.0, hi = 1.0)
        .select(col("bin"), col("n"), r(col("frac_pos"), 6).as("frac_pos"),
          r(col("iso_rate"), 6).as("iso_rate"))
        .orderBy("bin")
    }),

    // STL-residual anomaly detection: q171's decomposition feeds q124's
    // per-group MAD — the composed anomaly pipeline (the resid grid is
    // 6-digit-exact on both engines, so the medians see identical
    // multisets)
    "q211_stl_anomaly" -> ((s, dir) => {
      val dec = TimeSeries.decompose(events(s, dir), "event_type", "ts",
          "value", period = 24, halfWindow = 12)
        .filter(col("resid").isNotNull)
        .select(col("event_type"), col("resid"))
      Outliers.madOutliers(dec, "event_type", "resid", k = 3.0)
        .select(col("event_type"), col("n"), r(col("median"), 6).as("median"),
          r(col("mad"), 6).as("mad"), col("n_outliers"))
        .orderBy("event_type")
    }),

    // winsorization at the exact p01/p99 (interpolated percentile parity,
    // the q124 median precedent) on a deterministic seventh of lineitem
    "q212_winsorize" -> ((s, dir) => {
      val f = t(s, dir, "lineitem").filter(col("l_partkey") % 7 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
      Normalize.winsorize(f, "l_extendedprice", pLo = 0.01, pHi = 0.99)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), r(col("w"), 4).as("w"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // deterministic negative sampling for (supplier, part) training
    // pairs: md5(user#slot) mod max-id draws, catalog semi-join,
    // positive anti-join — identical arithmetic in both engines
    "q213_negative_sampling" -> ((s, dir) => {
      val pos = t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_partkey")).distinct()
      val items = t(s, dir, "part")
        .select(col("p_partkey").as("l_partkey"))
      val maxId = items.agg(max("l_partkey")).head().getLong(0)
      Sampling.negativeSample(pos, items, "l_suppkey", "l_partkey",
          k = 3, maxItemId = maxId)
        .orderBy("l_suppkey", "slot")
    }),

    // weighted one-mode projection: suppliers connected by co-supplied
    // parts (per-part supplier degree is SF-stable ~30, under the cap)
    "q214_bipartite_project" -> ((s, dir) => {
      val e = t(s, dir, "lineitem").filter(col("l_partkey") % 5 === 0)
        .select(concat(lit("s"), col("l_suppkey")).as("u"),
          concat(lit("p"), col("l_partkey")).as("v"))
      Graph.bipartiteProject(e, maxRightDegree = 80)
        .orderBy("a", "b")
    }),

    // bounded-memory grouped quantiles off a shared 100-bin grid — the
    // grouped twin of q58's sketch trade, exactly reproducible
    "q215_grouped_quantiles" -> ((s, dir) => {
      Profile.groupedBinQuantiles(t(s, dir, "lineitem"), "l_returnflag",
          "l_extendedprice", lo = 0.0, hi = 110000.0, nBins = 100,
          qs = Seq(0.25, 0.5, 0.75, 0.95))
        .orderBy("l_returnflag", "q")
    }),

    // the REAL stream-static dimension join replayed over events: each
    // micro-batch broadcast-joins the static customer frame, then a
    // watermarked hourly count per market segment — the fifth streaming
    // parity family (stream-static join), hash-checked against the same
    // batch SQL
    "q216_enriched_stream" -> ((s, dir) => {
      StreamOps.enrichedCountsReplay(events(s, dir),
          t(s, dir, "customer"), "user_id", "c_custkey", "c_mktsegment")
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("c_mktsegment"), col("n_events"))
        .orderBy("hour", "c_mktsegment")
    }),

    // END-TO-END entity resolution: q209's blocked pairs + FS scores →
    // threshold on the 4-digit grid → LSS connected components →
    // cluster sizes — the composed record-linkage pipeline (blocking,
    // scoring, clustering) with a full recursive-CTE oracle
    "q217_entity_resolution" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey"),
        col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
      val pairs = c.join(c.select(col("c_custkey").as("b_key"),
          col("c_nationkey").as("b_nat"),
          col("c_mktsegment").as("b_seg"), col("c_acctbal").as("b_bal")),
          col("c_nationkey") === col("b_nat") &&
            col("c_custkey") < col("b_key"))
        .select(col("c_custkey").as("a"), col("b_key").as("b"),
          (col("c_mktsegment") === col("b_seg")).as("f_seg"),
          (abs(col("c_acctbal") - col("b_bal")) < 500.0).as("f_bal"))
      val edges = Linkage
        .fellegiSunter(pairs, Seq("f_seg", "f_bal"), Seq(0.9, 0.85))
        .filter(col("fs_score") >= 4.0)
        .select(col("a").as("id_a"), col("b").as("id_b"))
      val cc = Dedup.connectedComponentsLSS(edges)
      val sizes = cc.groupBy("label").agg(count(lit(1)).as("n_members"))
      cc.join(sizes, "label")
        .select(col("id").as("c_custkey"), col("label").as("cluster"),
          col("n_members"))
        .orderBy("cluster", "c_custkey")
    }),

    // temporal dedup: at most one event per user per absolute day window
    // ((ts, event_id)-minimal survivor — the batch twin of q75's
    // dropDuplicatesWithinWatermark)
    "q218_once_per_window" -> ((s, dir) => {
      Dedup.oncePerWindow(events(s, dir), "user_id", "ts",
          windowUs = 86400L * 1000000, idCol = "event_id")
        .orderBy("user_id", "window_start")
    }),

    // Wald SPRT on the daily purchase rate (p0=0.10 vs p1=0.20; the
    // observed ~0.2 rate crosses the H1 bound decisively on day one, so
    // the decision column sits far from the thresholds on every row)
    "q219_sprt" -> ((s, dir) => {
      val e = events(s, dir).select(
        datediff(col("ts"), lit("1970-01-01")).cast("long").as("day"),
        (col("event_type") === "purchase").cast("int").as("s"))
      Hypothesis.sprt(e, "day", "s", p0 = 0.10, p1 = 0.20)
        .orderBy("day")
    }),

    // difference-in-differences on orders: urgent-priority orders
    // (treated) pre/post 1996 vs the rest — integral-cents cell sums,
    // exact-ratio means, fixed-order estimator
    "q220_diff_in_diff" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        (col("o_orderpriority") < "3").as("tr"),
        (col("o_orderdate") >= lit("1996-01-01")).as("po"),
        col("o_totalprice"))
      Hypothesis.diffInDiff(o, "tr", "po", "o_totalprice")
    }),

    // hard-negative mining over the embeddings: closest OTHER-label
    // vectors per query (contrastive-training pair source); exact twin —
    // the LSH candidate path is the at-scale route, the q38/q39 pattern
    "q221_hard_negatives" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.hardNegatives(e, e.filter(col("vec_id") < 3), "vec_id",
          "embedding", "label", k = 5)
        .orderBy("query_id", "rn")
    }),

    // per-group mode with the (count desc, value asc) total order
    "q222_grouped_mode" -> ((s, dir) => {
      Profile.groupedMode(t(s, dir, "lineitem"), "l_returnflag",
          "l_quantity")
        .orderBy("l_returnflag")
    }),

    // BPE merge learning over the corpus (rows-only: the iterative
    // merge-apply fold has no closed SQL form; BpeSpec carries the
    // reference-semantics cases incl. the Sennrich toy corpus) — counts
    // and tiebreaks are exact integers/strings, fully deterministic
    "q223_bpe_merges" -> ((s, dir) => {
      Bpe.learnMerges(t(s, dir, "documents"), "text", numMerges = 8)
        .orderBy("rank")
    }),

    // cohort LTV: customers by first-order month, integral-cents revenue
    // accumulated by months-since — exact month indices, cohort-keyed
    // cumulative over calendar-bounded partitions
    "q224_cohort_ltv" -> ((s, dir) => {
      Segment.cohortLtv(t(s, dir, "orders"), "o_custkey", "o_orderdate",
          "o_totalprice")
        .orderBy("cohort", "age_months")
    }),

    // per-document keyword extraction: q41's TF-IDF ranked per doc on
    // the 6-digit grid BEFORE the top-3 cut (term tiebreak)
    "q225_keywords" -> ((s, dir) => {
      val scored = TextOps.tfIdf(t(s, dir, "documents"), "doc_id", "text")
        .select(col("id"), col("term"), r(col("tfidf"), 6).as("tfidf"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("id")
        .orderBy(col("tfidf").desc, col("term"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .orderBy("id", "rk")
    }),

    // Cox proportional hazards (Efron ties — the default, as in R) on
    // q126's time-to-conversion frame with per-user activity covariates.
    // HASH-GATED: Newton from beta=0 converges to the unique partial-MLE
    // (concave likelihood) — the oracle unrolls 6 Newton iterations as
    // CTEs (the q200/q223/q255 pattern) and lands on the same fixed
    // point; both engines agree to ~1e-12, far inside the 6-digit grid
    // (checked margins >= 0.13 of the grid step on this data)
    "q226_cox" -> ((s, dir) => {
      val per = events(s, dir).groupBy("user_id")
        .agg(min("ts").as("t0"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp"),
          max("ts").as("tl"),
          avg("value").as("avg_value"),
          (count(lit(1)) / 100.0).as("n_events_h"))
      val dur = per.select(
        ((unix_micros(coalesce(col("tp"), col("tl"))) - unix_micros(col("t0")))
          .cast("double") / 3600000000.0).as("dur"),
        col("tp").isNotNull.cast("int").as("ev"),
        col("avg_value"), col("n_events_h"))
      val m = glm.Cox.fit(dur, "dur", "ev", Seq("avg_value", "n_events_h"))
      import s.implicits._
      m.features.zipWithIndex.map { case (f, i) =>
        (f, rd(m.beta(i), 6), rd(m.se(i), 6))
      }.toDF("feature", "beta", "se").orderBy("feature")
    }),

    // market-basket association rules over order×part-category baskets:
    // basket-size cap before the pair join, exact-integer metric ratios
    // on the 6-digit grid
    "q227_assoc_rules" -> ((s, dir) => {
      val inc = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("basket"),
          (col("l_partkey") % 50).as("item"))
      Assoc.associationRules(inc, "basket", "item", minCount = 80,
          maxBasketSize = 50)
        .orderBy("antecedent", "consequent")
    }),

    // Aalen–Johansen competing risks: first purchase (cause 1) vs first
    // error (cause 2) per user, censored at the last event — the correct
    // cumulative incidence under competing events (1−KM per cause
    // overestimates); ordered ln-cumsum arithmetic, hash-stable like q126
    "q228_competing_risks" -> ((s, dir) => {
      val per = events(s, dir).groupBy("user_id")
        .agg(min("ts").as("t0"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp"),
          min(when(col("event_type") === "error", col("ts"))).as("te"),
          max("ts").as("tl"))
      val first = per.select(
        coalesce(least(col("tp"), col("te")), col("tp"), col("te"),
          col("tl")).as("tev"),
        col("t0"),
        when(col("tp").isNotNull &&
            (col("te").isNull || col("tp") <= col("te")), 1)
          .when(col("te").isNotNull, 2).otherwise(0).as("cause"))
      val dur = first.select(
        ((unix_micros(col("tev")) - unix_micros(col("t0")))
          .cast("double") / 3600000000.0).as("dur"),
        col("cause"))
      Survival.competingRisks(dur, "dur", "cause")
        .select(r(col("t"), 6).as("t"), col("cause"), col("n_risk"),
          col("d"), r(col("cif"), 6).as("cif"))
        .orderBy("t", "cause")
    }),

    // proportional-odds ordinal regression on quantity bands.
    // HASH-GATED: the cumulative-logit likelihood is concave, so BHHH
    // (here) and the oracle's unrolled observed-Hessian Newton meet at
    // the same MLE; both start from the empirical cumulative logits.
    // tol tightened to 1e-12 so the BHHH tail contraction leaves the
    // params well inside the 6-digit grid
    "q229_ordinal" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        when(col("l_quantity") < 18, 1)
          .when(col("l_quantity") <= 35, 2).otherwise(3).as("band"),
        col("l_discount"), col("l_tax"))
      val m = glm.Ordinal.fit(d, "band", Seq("l_discount", "l_tax"),
        tol = 1e-12, maxIter = 120)
      import s.implicits._
      ((m.thresholds.zipWithIndex.map { case (v, i) =>
        (s"theta_${i + 1}", rd(v, 6)) } ++
        m.features.zip(m.beta).map { case (f, b) => (s"beta_$f", rd(b, 6)) })
        .toSeq).toDF("param", "value").orderBy("param")
    }),

    // Murphy decomposition of the Brier score on q128's forecast frame:
    // ONE bin pass carries all five per-bin sums; the identity terms are
    // arithmetic on the 5-row frame
    "q230_brier" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        (col("l_discount") * 10.0).as("s"),
        (col("l_quantity") > 25).cast("int").as("y"))
      Eval.brierDecomposition(d, "s", "y", nBins = 5)
    }),

    // gains/lift deciles by price against the return flag: rank-share
    // tiles on the descending two-level cumulative, exact integers to
    // the final ratio grid
    "q231_gains" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(col("l_extendedprice").as("s"),
        (col("l_returnflag") === "R").cast("int").as("y"))
      Eval.gainsTable(d, "s", "y", nTiles = 10)
        .orderBy("tile")
    }),

    // ROUGE-2 of each document against its successor (deterministic
    // pairing): clipped bigram counts meet in one (id, gram) full-outer
    // join; exact integers to the ratio grid
    "q232_rouge" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val paired = d.join(
        d.select((col("doc_id") - 1).as("doc_id"), col("text").as("cand")),
        "doc_id")
      TextOps.rougeN(paired, "doc_id", "text", "cand", n = 2)
        .orderBy("doc_id")
    }),

    // Zipf-law fit of the corpus token frequencies: closed-form OLS on
    // (ln rank, ln count) over the vocabulary frame
    "q233_zipf" -> ((s, dir) => {
      TextOps.zipfFit(t(s, dir, "documents"), "text")
    }),

    // learning curve: the same OLS refit on md5-sixteenth nested subsets
    // (4/16, 8/16, full) — the data-scaling readout; each point is ONE
    // Gram pass, the oracle recomputes each fit with DuckDB's regr_*
    // aggregates over the identical content-keyed subsets (q40's parity)
    "q234_learning_curve" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val digit = substring(md5(concat_ws("#",
        col("l_orderkey").cast("string"),
        col("l_linenumber").cast("string"))), 32, 1)
      import s.implicits._
      Seq(4, 8, 16).map { sixteenths =>
        val sub =
          if (sixteenths == 16) li
          else li.filter(digit < lit("0123456789abcdefg"(sixteenths).toString))
        val m = glm.LM.fit(sub, Seq("l_quantity"), "l_extendedprice")
        (sixteenths, m.n, rd(m.r2, 6))
      }.toDF("sixteenths", "n", "r2").orderBy("sixteenths")
    }),

    // grouped CUSUM peak: per event type, the day where |S| peaks (the
    // per-key change-point readout; per-key windows over day-bounded
    // series frames)
    "q235_cusum_grouped" -> ((s, dir) => {
      val daily = events(s, dir).groupBy(col("event_type"),
          datediff(col("ts"), lit("1970-01-01")).cast("long").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("x"))
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type")
      val wCum = wAll.orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      val scaled = daily
        .withColumn("__n", count(lit(1)).over(wAll))
        .withColumn("__g", sum("x").over(wAll))
        .withColumn("__t", row_number().over(wAll.orderBy("day")).cast("long"))
        .withColumn("__cx", sum("x").over(wCum))
        .withColumn("s_scaled",
          col("__n") * col("__cx") - col("__t") * col("__g"))
      val wPk = wAll.orderBy(abs(col("s_scaled")).desc, col("day"))
      scaled.withColumn("__rk", row_number().over(wPk))
        .filter(col("__rk") === 1)
        .select(col("event_type"), col("day").as("peak_day"),
          col("s_scaled"))
        .orderBy("event_type")
    }),

    // hashing-trick vectorizer: vocabulary-free md5-mod-64 dims, sparse
    // (doc, dim, cnt) triplets — engine-identical mapping
    "q236_hashing_tf" -> ((s, dir) => {
      TextOps.hashingTf(t(s, dir, "documents"), "doc_id", "text", dim = 64)
        .orderBy("doc_id", "dim")
    }),

    // word2vec-style skip-gram pairs, window 2: with distances in {1, 2}
    // every 1/d weight is dyadic, so even the float sums are exact
    "q237_skipgrams" -> ((s, dir) => {
      TextOps.skipGrams(t(s, dir, "documents"), "text", window = 2)
        .orderBy("center", "context")
    }),

    // item-item collaborative filtering: cosine-normalized co-purchase
    // counts (w/√(n_a·n_b)) over q214's capped bipartite projection —
    // the Amazon-style "customers also bought" score
    "q238_item_cf" -> ((s, dir) => {
      val inc0 = t(s, dir, "lineitem")
        .select((col("l_partkey") % 50).as("u"),
          col("l_orderkey").as("v")).distinct()
      // item margins over the SAME capped incidence the projection sees,
      // so the score is a true cosine on the pruned bipartite graph
      val keep = inc0.groupBy("v").agg(count(lit(1)).as("__d"))
        .filter(col("__d") <= 50).select("v")
      val inc = inc0.join(keep, Seq("v"), "left_semi")
      val proj = Graph.bipartiteProject(inc, maxRightDegree = 50)
      val deg = inc.groupBy("u").agg(count(lit(1)).as("n_i"))
      proj
        .join(deg.select(col("u").as("a"), col("n_i").as("n_a")), "a")
        .join(deg.select(col("u").as("b"), col("n_i").as("n_b")), "b")
        .select(col("a"), col("b"), col("weight"), col("n_a"), col("n_b"),
          r(col("weight").cast("double") /
            sqrt((col("n_a") * col("n_b")).cast("double")), 6).as("score"))
        .orderBy("a", "b")
    }),

    // restricted mean survival time to 400 h on q126's conversion curve:
    // step integral under the unrounded KM, identical lag windows
    "q239_rmst" -> ((s, dir) => {
      val per = events(s, dir).groupBy("user_id")
        .agg(min("ts").as("t0"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp"),
          max("ts").as("tl"))
      val dur = per.select(
        ((unix_micros(coalesce(col("tp"), col("tl"))) - unix_micros(col("t0")))
          .cast("double") / 3600000000.0).as("dur"),
        col("tp").isNotNull.cast("int").as("ev"))
      Survival.rmst(dur, "dur", "ev", tau = 400.0)
        .select(col("tau"), r(col("rmst"), 6).as("rmst"), col("n"),
          col("n_events"))
    }),

    // group-fairness audit of a rule classifier across market segments:
    // conditional counts per segment + max-reference ratios on the
    // segment frame
    "q240_fairness" -> ((s, dir) => {
      val d = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"),
          (col("o_totalprice") > 150000.0).cast("int").as("y"),
          (col("o_orderpriority") < "3").cast("int").as("p"))
      Eval.groupFairness(d, "c_mktsegment", "y", "p")
        .orderBy("c_mktsegment")
    }),

    // covariate balance (standardized mean differences) between urgent
    // and other orders — ONE conditional-moment agg, inline-unpivoted
    "q241_smd" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        (col("o_orderpriority") < "3").as("tr"),
        col("o_totalprice"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("double")
          .as("order_day"))
      Hypothesis.standardizedMeanDiff(o, "tr",
          Seq("o_totalprice", "order_day"))
        .orderBy("covariate")
    }),

    // per-returnflag AUC via the same doubled-numerator identity with
    // group-partitioned cumulative windows (bounded per-group score
    // support — the discount grid)
    "q242_grouped_auc" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_discount").as("s"),
        (col("l_quantity") > 25).cast("int").as("y"))
      Eval.aucByGroup(d, "l_returnflag", "s", "y")
        .orderBy("l_returnflag")
    }),

    // named-regex scan (the PII/leak-screen primitive) — patterns chosen
    // to actually hit the synthetic corpus
    "q243_pattern_counts" -> ((s, dir) => {
      TextOps.patternCounts(t(s, dir, "documents"), "doc_id", "text", Seq(
          "n_data" -> "\\bdata\\b",
          "n_double_vowel" -> "[aeiou][aeiou]",
          "n_s_words" -> "[a-z]+s\\b"))
        .orderBy("doc_id")
    }),

    // corpus-shift probe between the doc_id-parity halves
    "q245_unigram_divergence" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Ngram.unigramDivergence(d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1), "text")
    }),

    // mixture-budget solver: equal shares, half the corpus tokens
    "q246_mixture_rates" -> ((s, dir) => {
      Sampling.mixtureRates(t(s, dir, "documents"), "source", "text",
          budgetFrac = 0.5)
        .orderBy("source")
    }),

    // K-class precision/recall/F1 vs a rule-based "classifier"
    "q247_multiclass" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        col("l_returnflag").as("label"),
        when(col("l_quantity") > 30, "R")
          .when(col("l_discount") > 0.05, "A")
          .otherwise("N").as("pred"))
      Eval.multiclassMetrics(d, "label", "pred").orderBy("class")
    }),

    // graded-relevance ranking quality per source (score = n_chars,
    // relevance from the language)
    "q248_ndcg" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("source"), col("doc_id"),
        col("n_chars").as("score"),
        when(col("lang") === "en", 3).when(col("lang") === "fr", 2)
          .when(col("lang") === "de", 1).otherwise(0).as("rel"))
      Retrieval.ndcgAtK(d, "source", "doc_id", "score", "rel", 10)
        .orderBy("source")
    }),

    // cross-document duplicated 8-gram spans (substring-level dedup
    // signal document-level MinHash misses)
    "q249_duplicate_spans" -> ((s, dir) => {
      Dedup.duplicateSpans(t(s, dir, "documents"), "doc_id", "text", n = 8)
        .orderBy("doc_id")
    }),

    // nearest purchase (either direction in time) for every click
    "q250_nearest_join" -> ((s, dir) => {
      val e = events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("t_us"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("p_us"),
          col("event_id").as("nearest_purchase_id"))
      AsofJoin.nearestJoin(clicks, purchases, Seq("user_id"),
          "t_us", "p_us", Seq("nearest_purchase_id"))
        .orderBy("event_id")
    }),

    // k-anonymity release gate over a deliberately fine quasi-identifier
    "q251_k_anonymity" -> ((s, dir) => {
      val d = t(s, dir, "orders").select(
        (col("o_custkey") % 997).as("qid_bucket"),
        year(col("o_orderdate")).as("qid_year"))
      Profile.kAnonymityViolations(d, Seq("qid_bucket", "qid_year"), 3)
        .orderBy("qid_bucket", "qid_year")
    }),

    // canonical normalization (dedup-key preprocessing)
    "q252_normalize_text" -> ((s, dir) => {
      TextOps.normalizeText(t(s, dir, "documents"), "text")
        .select("doc_id", "norm_text", "norm_len")
        .orderBy("doc_id")
    }),

    // stratified nearest-control propensity matching (ATT frame)
    "q253_ps_match" -> ((s, dir) => {
      val d = t(s, dir, "orders").select(
        year(col("o_orderdate")).as("stratum_year"),
        (col("o_orderpriority") < "3").cast("int").as("treat"),
        col("o_totalprice"), col("o_orderkey"))
      Matching.psMatch(d, Seq("stratum_year"), "treat", "o_totalprice",
          "o_orderkey")
        .orderBy("o_orderkey")
    }),

    // redaction: patternCounts' remediation twin
    "q254_redact" -> ((s, dir) => {
      TextOps.redact(t(s, dir, "documents"), "text", Seq(
          "term" -> "\\bdata\\b", "num" -> "[0-9]+"))
        .select("doc_id", "redacted", "n_redacted")
        .orderBy("doc_id")
    }),

    // weighted single-source shortest paths (4 Bellman-Ford rounds) on
    // the part-supplier graph, w = min quantity (integral doubles —
    // exact min-plus arithmetic)
    "q255_sssp" -> ((s, dir) => {
      val pe = t(s, dir, "lineitem")
        .select(concat(lit("p"), col("l_partkey")).as("u"),
          concat(lit("s"), col("l_suppkey")).as("v"),
          col("l_quantity").cast("double").as("w"))
      val edges = pe.unionByName(
        pe.select(col("v").as("u"), col("u").as("v"), col("w")))
      Graph.sssp(edges, "p1", rounds = 4)
        .select(col("node"), r(col("dist"), 6).as("dist"))
        .orderBy("node")
    }),

    // deterministic permutation test on integral cents (exact sums);
    // customer-sized input — B·n md5 draws are the cost driver, and the
    // statistic needs rows, not the biggest table
    "q256_permutation_test" -> ((s, dir) => {
      val d = t(s, dir, "customer").select(
        col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("cents"),
        when(col("c_mktsegment") === "BUILDING", "b").otherwise("o")
          .as("grp"))
      Hypothesis.permutationTestMeanDiff(d, "cents", "grp", "b", "o",
        "c_custkey", nPerm = 200)
    }),

    // one-row corpus card: the dataset-release summary a pipeline
    // publishes next to the data
    "q257_corpus_card" -> ((s, dir) => {
      val d = graft.ops.fanOut(t(s, dir, "documents"))
      val nTok = size(filter(split(col("text"), "\\s+"), x => x =!= ""))
      val basic = d.agg(count(lit(1)).as("n_docs"),
        sum(nTok.cast("long")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"))
      val vocab = d.select(explode(filter(split(col("text"), "\\s+"),
          x => x =!= "")).as("w"))
        .agg(countDistinct(col("w")).as("vocab"))
      val dups = d.groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("c"))
        .agg((sum("c") - count(lit(1))).as("n_dup_docs"))
      basic.crossJoin(broadcast(vocab)).crossJoin(broadcast(dups))
        .select(col("n_docs"), col("n_tokens"), col("n_chars"),
          col("n_langs"), col("n_sources"), col("vocab"),
          col("n_dup_docs"),
          round(col("n_tokens").cast("double") / col("n_docs"), 6)
            .as("mean_tokens"))
    }),

    // reciprocal rank of the first relevant doc (binary relevance =
    // English), q248's MRR sibling
    "q259_mrr" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("source"), col("doc_id"),
        col("n_chars").as("score"),
        (col("lang") === "en").cast("int").as("rel"))
      Retrieval.reciprocalRankAtK(d, "source", "doc_id", "score", "rel", 10)
        .orderBy("source")
    }),

    // Bradley-Terry preference strengths (3 MM updates) over
    // within-order quantity preferences on 100 part buckets
    "q258_bradley_terry" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey").as("o"),
        (col("l_partkey") % 100).as("item"), col("l_quantity").as("q"))
      val prefs = li
        .join(li.select(col("o"), col("item").as("item2"),
          col("q").as("q2")), "o")
        .filter(col("item") =!= col("item2") && col("q") > col("q2"))
        .select(col("item").as("winner"), col("item2").as("loser"))
      Preference.bradleyTerry(prefs, "winner", "loser", iters = 3)
        .orderBy("item")
    }),

    // joint softmax (nnet::multinom layout, baseline = first sorted
    // class) on q192's saturated design: one binary regressor +
    // intercept gives exactly as many parameters as free cell
    // probabilities, so the MLE coefficients are the closed-form cell
    // log-odds vs the baseline — b0 = ln(n_cls,lo/n_A,lo),
    // b1 = ln(n_cls,hi/n_A,hi) - b0. Gates fitSoftmax's BHHH loop
    // (q192 gates only the one-vs-rest path)
    "q260_softmax" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        (col("l_quantity") > 25).cast("double").as("hi"),
        col("l_returnflag").as("cls"))
      val m = Multinomial.fitSoftmax(d, Seq("hi"), "cls")
      import s.implicits._
      m.classes.drop(1).zip(m.beta).map { case (c, b) =>
        (c, rd(b(0), 6), rd(b(1), 6))
      }.toDF("cls", "b0", "b1").orderBy("cls")
    }),

    // duplicated-span REMOVAL (the action q249 profiles): every token
    // covered by a 5-gram occurring in >= 2 documents is dropped and
    // the doc rebuilt — Lee-et-al-style exact-substring dedup
    "q261_span_removal" -> ((s, dir) => {
      Dedup.removeDuplicateSpans(t(s, dir, "documents"), "doc_id", "text",
          n = 5)
        .orderBy("doc_id")
    }),

    // EXACT all-pairs Jaccard >= 0.5 on 4-gram shingles via prefix
    // filtering (PPJoin family) — the no-recall-loss sibling of the
    // MinHash-LSH pipelines, hash-gated against the brute-force pair
    // join because the operator is exact by construction
    "q262_jaccard_join" -> ((s, dir) => {
      FuzzyJoin.jaccardSelfJoin(t(s, dir, "documents"), "doc_id", "text",
          n = 4, threshold = 0.5)
        .orderBy("id_a", "id_b")
    }),

    // per-segment two-proportion z-tests (A&S-polynomial Φ, the q57
    // trick — identical literal arithmetic on both engines) corrected
    // with Benjamini–Hochberg step-up FDR; the step-up runs through the
    // two-level running-count/running-min passes, no global window
    "q263_bh_fdr" -> ((s, dir) => {
      val g = t(s, dir, "lineitem")
        .groupBy((col("l_partkey") % 40).as("tid"))
        .agg(count(lit(1)).as("n"),
          sum((col("l_returnflag") === "R").cast("long")).as("x"))
      val tot = g.agg(sum("n").as("nn"), sum("x").as("xx"))
      val d = g.crossJoin(broadcast(tot))
        .withColumn("p0", col("xx").cast("double") / col("nn"))
        .withColumn("z", (col("x").cast("double") / col("n") - col("p0")) /
          sqrt(col("p0") * (lit(1.0) - col("p0")) / col("n")))
        .withColumn("p",
          lit(2.0) * (lit(1.0) - glm.LinkFn.pnormApprox(abs(col("z")))))
      Hypothesis.benjaminiHochberg(d.select("tid", "p"), "tid", "p",
          alpha = 0.05)
        .select(col("tid"), r(col("p"), 6).as("p"),
          r(col("p_adj"), 6).as("p_adj"), col("reject"))
        .orderBy("tid")
    }),

    // corpus-trained bigram LM quality score (perplexity-proxy filter):
    // exact integer counts everywhere, ln of count rationals on the
    // 6-digit grid
    "q264_lm_score" -> ((s, dir) => {
      TextOps.ngramLmScore(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"), col("n_bigrams"),
          r(col("avg_logprob"), 6).as("avg_logprob"),
          r(col("ppl"), 4).as("ppl"))
        .orderBy("doc_id")
    }),

    // inter-annotator agreement: two deterministic synthetic "raters"
    // over lineitem (quantity band vs price band) — exact-integer
    // confusion marginals to one-row kappa
    "q265_cohens_kappa" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        when(col("l_quantity") < 18, "lo").when(col("l_quantity") <= 35,
          "mid").otherwise("hi").as("r1"),
        when(col("l_extendedprice") < 20000, "lo")
          .when(col("l_extendedprice") <= 50000, "mid").otherwise("hi")
          .as("r2"))
      Eval.cohensKappa(d, "r1", "r2")
        .select(col("n"), r(col("po"), 6).as("po"), r(col("pe"), 6).as("pe"),
          r(col("kappa"), 6).as("kappa"))
    }),

    // DSIR importance weights: target = English docs, raw = whole corpus;
    // per-bucket log-ratios quantized to integer micro-nats so per-doc
    // weights are EXACT integer sums — partition-order-free
    "q266_dsir_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Sampling.importanceWeights(docs, docs.filter(col("lang") === "en"),
          "doc_id", "text", buckets = 512)
        .orderBy("doc_id")
    }),

    // DSIR top-k selection: greedy rank on the exact integer weight,
    // id-tiebroken — runs as TakeOrderedAndProject, never a global sort
    "q267_dsir_select" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Sampling.importanceSelect(docs, docs.filter(col("lang") === "en"),
          "doc_id", "text", k = 50, buckets = 512)
        .orderBy(col("logw_micro").desc, col("doc_id"))
    }),

    // ALS matrix factorization, rank 1 / "ones" init: each half-sweep is
    // a per-group 1-D ridge solve with the closed form
    // u = Σ r·v / (λ + Σ v²), so two unrolled sweeps replay exactly in
    // SQL; the 6-digit grid absorbs Gram-merge-order ulps
    "q268_als_factors" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_suppkey").as("u"),
        col("l_partkey").as("i"), col("l_quantity").as("r"))
      val m = Factorize.als(li, "u", "i", "r", rank = 1, iters = 2,
        lambda = 0.1, init = "ones")
      m.userFactors.select(col("u").as("supp"), r(col("f_0"), 6).as("f_0"))
        .orderBy("supp")
    }),

    // ALS scoring join: prediction = u·v as a pure column expression over
    // the two broadcast-able factor frames; top-40 supplier-part pairs by
    // observed quantity, scored
    "q269_als_predict" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_suppkey").as("u"),
        col("l_partkey").as("i"), col("l_quantity").as("r"))
      val m = Factorize.als(li, "u", "i", "r", rank = 1, iters = 2,
        lambda = 0.1, init = "ones")
      val probe = li.groupBy("u", "i").agg(sum("r").as("qty"))
        .orderBy(col("qty").desc, col("u"), col("i")).limit(40)
      m.predict(probe)
        .select(col("u").as("supp"), col("i").as("part"), col("qty"),
          r(col("prediction"), 6).as("prediction"))
        .orderBy("supp", "part")
    }),

    // Count-Min sketch build: d×w integer counters, md5-derived cells —
    // a deterministic bounded-memory sketch, hash-equality-gated (unlike
    // HLL/approx_percentile, which get tolerance twins)
    "q270_countmin_cells" -> ((s, dir) => {
      Sketch.countMin(t(s, dir, "lineitem"), "l_partkey",
          width = 256, depth = 3)
        .orderBy("row", "col")
    }),

    // Count-Min point estimates vs exact counts for the top-20 parts:
    // estimate >= exact always (collisions only add)
    "q271_countmin_estimate" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val sk = Sketch.countMin(li, "l_partkey", width = 256, depth = 3)
      val top = li.groupBy("l_partkey").agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("l_partkey")).limit(20)
      Sketch.countMinEstimate(sk, top, "l_partkey", 256, 3)
        .join(top, "l_partkey")
        .select(col("l_partkey"), col("exact"), col("estimate"))
        .orderBy("l_partkey")
    }),

    // Johnson–Lindenstrauss random projection 64 → 8: the md5-derived
    // ±1/√d matrix lands as plan literals — a codegen'd pure projection,
    // no runtime hashing; 6-digit grid absorbs sum-order ulps
    "q272_random_projection" -> ((s, dir) => {
      Similarity.randomProject(t(s, dir, "embeddings"), "embedding",
          inDim = 64, outDim = 8)
        .select(col("vec_id"), posexplode(col("projection")).as(Seq("j", "val")))
        .select(col("vec_id"), col("j"), r(col("val"), 6).as("val"))
        .orderBy("vec_id", "j")
    }),

    // product quantization encode, seeded codebook (closed-form — the
    // Lloyd-trained path shares the same encode/search code, spec-gated):
    // per-subspace argmin by partial distance over literal centroids
    "q273_pq_encode" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cb = Quantize.trainSeeded(e, "vec_id", "embedding", 64,
        m = 8, k = 16)
      Quantize.encode(e, "embedding", cb)
        .select(col("vec_id"), posexplode(col("codes")).as(Seq("s", "code")))
        .orderBy("vec_id", "s")
    }),

    // PQ asymmetric-distance top-5: exploded codes × broadcast per-query
    // LUT, ONE (query, id) sum, rank on the 6-digit distance grid with an
    // id tiebreak — the codes-only search path (never touches vectors)
    "q274_pq_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cb = Quantize.trainSeeded(e, "vec_id", "embedding", 64,
        m = 8, k = 16)
      val codes = Quantize.encode(e, "embedding", cb)
      val queries = e.orderBy("vec_id").limit(3)
      Quantize.topK(codes, queries, "vec_id", "embedding", "codes", cb,
          k = 5)
        .orderBy("query_id", "vec_id")
    }),

    // zero-inflated Poisson on a saturated binary design: 6 fixed EM
    // rounds whose M-steps have closed per-cell forms (weighted means) —
    // the oracle unrolls the same rounds; both engines land on the EM
    // fixed point, compared on the 6-digit grid
    "q275_zip" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        (col("l_discount") > 0.05).cast("double").as("x"),
        greatest(col("l_linenumber") - 3, lit(0)).cast("double").as("y"))
      val m = ZeroInfl.fitZip(d, Seq("x"), "y", emIters = 6)
      m.predict(d.select("x").distinct())
        .select(col("x"), r(lit(m.pi), 6).as("pi"),
          r(col("prediction"), 6).as("ey"), r(col("p_zero"), 6).as("p_zero"))
        .orderBy("x")
    }),

    // inverse-propensity-weighted ATE: saturated per-stratum propensities
    // (cell shares), Hájek-normalized 1/e weights — closed-form causal
    // estimate, exact arithmetic replay
    "q276_ipw" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        col("l_returnflag").as("strat"),
        (col("l_discount") > 0.05).cast("int").as("treat"),
        col("l_extendedprice").as("y"))
      Matching.ipwAte(d, Seq("strat"), "treat", "y")
        .select(col("n_used"), col("n_treated"), col("n_control"),
          r(col("ate_ipw"), 6).as("ate_ipw"),
          r(col("mean_treated"), 6).as("mean_treated"),
          r(col("mean_control"), 6).as("mean_control"),
          col("n_excluded"))
    }),

    // 2-D raking / IPF: per-(lang, source) weights hitting equal target
    // shares on BOTH margins after 10 fixed rounds — the oracle unrolls
    // the same alternating scalings over the identical cell frame
    "q277_rake" -> ((s, dir) => {
      val langs = Seq("en", "zh", "es", "de", "fr").map(_ -> 0.2).toMap
      val srcs = (0 until 20).map(i => s"src$i" -> 0.05).toMap
      Sampling.rake2d(t(s, dir, "documents"), "lang", "source",
          langs, srcs, iters = 10)
        .select(col("lang"), col("source"), col("n"),
          r(col("weight"), 6).as("weight"))
        .orderBy("lang", "source")
    }),

    // ENGINE-PORTABLE MinHash signatures (md5-mod-Mersenne shingle hash +
    // universal hashing, exact integer arithmetic end-to-end) — the
    // hash-equality gate the xxhash64 path (q26) structurally can't have
    "q278_minhash_portable" -> ((s, dir) => {
      val sig = Dedup.minhashSignaturesPortable(t(s, dir, "documents"),
        "doc_id", "text", shingleN = 3, numHashes = 16)
      sig.select(col("id"), posexplode(array(
          (0 until 16).map(i => col(s"sig_$i")): _*)).as(Seq("i", "sig")))
        .orderBy("id", "i")
    }),

    // banded LSH candidate pairs from the portable signatures — the full
    // near-dup candidate pipeline (shingle → minhash → band → bucket
    // join → cap) under hash equality
    "q279_minhash_pairs_portable" -> ((s, dir) => {
      Dedup.minhashPairsPortable(t(s, dir, "documents"), "doc_id", "text",
          shingleN = 3, numHashes = 16, bands = 4)
        .orderBy("id_a", "id_b")
    }),

    // engine-portable SimHash: per-bit votes over md5 shingle hashes —
    // shift/mask arithmetic, exact integer fingerprints (q27's
    // hash-equality twin)
    "q280_simhash_portable" -> ((s, dir) => {
      Dedup.simhashPortable(t(s, dir, "documents"), "doc_id", "text",
          shingleN = 3, bits = 24)
        .orderBy("id")
    }),

    // STREAMING Count-Min build: the q270 sketch as a complete-mode
    // streaming aggregation whose state IS the bounded d×w counter table
    // — sixth streaming/batch parity family, hash-equal to the batch
    // sketch cell-for-cell
    "q281_countmin_stream" -> ((s, dir) => {
      StreamOps.countMinStreamReplay(events(s, dir), width = 256,
          depth = 3)
        .orderBy("row", "col")
    }),

    // glm.nb-style negative binomial with ESTIMATED dispersion: on the
    // saturated design the per-round IRLS μ̂ is the cell mean for ANY θ,
    // so the 4×3 alternation degenerates to 12 pure Newton steps on the
    // Pearson moment equation — each exactly replayed, θ on the 1e-8
    // grid at every step
    "q282_negbin_theta" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        (col("l_discount") > 0.05).cast("double").as("x"),
        greatest(col("l_linenumber") - 2, lit(0)).cast("double").as("y"))
      val m = NegBin.fit(d, Seq("x"), "y", outerIters = 4,
        newtonSteps = 3)
      m.predict(d.select("x").distinct())
        .select(col("x"), r(lit(m.theta), 6).as("theta"),
          r(col("prediction"), 6).as("mu"))
        .orderBy("x")
    }),

    // uplift / Qini deciles: score-collapse + two-level cumulative tiling
    // + per-tile windows over the ≤10-row frame — exact integer counts to
    // the 6-digit ratio grid (the treatment-model evaluation next to the
    // IPW/psMatch estimators)
    "q283_uplift_qini" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        col("l_extendedprice").as("score"),
        (col("l_discount") > 0.05).cast("int").as("treat"),
        (col("l_quantity") > 30).cast("int").as("label"))
      Eval.upliftByTile(d, "score", "treat", "label", nTiles = 10)
        .orderBy("tile")
    }),

    // CART decision stump (Gini): one melt-explode + ONE (feature, value)
    // collapse + cumulative windows partitioned by feature — the split
    // search is pure counting, so the statistic replays exactly; majority
    // leaves, strict-improvement gate, (score desc, feature, value) ties
    "q284_stump" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        col("l_quantity"), col("l_discount"), col("l_tax"),
        (col("l_returnflag") === "R").cast("int").as("y"))
      Tree.fit(d, Seq("l_discount", "l_quantity", "l_tax"), "y",
          maxDepth = 1).toDF(s)
        .orderBy("path")
    }),

    // depth-2 CART tree: per level ONE (node, feature, value) collapse;
    // node assignment is a literal nested-CASE projection (no join);
    // driver state = the ≤7-row node table
    "q285_tree" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        col("l_quantity"), col("l_discount"), col("l_tax"),
        (col("l_returnflag") === "R").cast("int").as("y"))
      Tree.fit(d, Seq("l_discount", "l_quantity", "l_tax"), "y",
          maxDepth = 2).toDF(s)
        .orderBy("path")
    }),

    // binned-candidate stump on a high-cardinality continuous feature:
    // fixed-width edges off one (min, max) pass bound the candidate frame
    // at `bins` rows per (node, feature) — the 100 TB mode where the
    // distinct-value collapse would otherwise be data-sized
    "q286_stump_binned" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        col("l_extendedprice"),
        (col("l_returnflag") === "R").cast("int").as("y"))
      Tree.fit(d, Seq("l_extendedprice"), "y", maxDepth = 1,
          bins = Some(16)).toDF(s)
        .orderBy("path")
    }),

    // instrumental-variables Wald / just-identified 2SLS per group: ONE
    // conditional-moment aggregation; integral-cents inputs make every
    // sum exact, so the cross-moment ratios replay bit-for-bit
    "q287_iv_wald" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        col("l_returnflag").as("flag"),
        (col("l_tax") < 0.04).cast("int").as("z"),
        round(col("l_discount") * 100).cast("long").as("x"),
        round(col("l_extendedprice") * 100).cast("long").as("y"))
      Causal.ivWald(d, "y", "x", "z", groupCols = Seq("flag"))
        .select(col("flag"), col("n"), r(col("itt"), 6).as("itt"),
          r(col("first_stage"), 6).as("first_stage"),
          r(col("beta_iv"), 6).as("beta_iv"))
        .orderBy("flag")
    }),

    // CUPED variance reduction: per-user pre/post integral-cents collapse,
    // pooled theta off ONE global aggregate broadcast onto the per-arm
    // aggregate — the experiment-readout companion to q220's DiD
    "q288_cuped" -> ((s, dir) => {
      val cut = lit(java.sql.Timestamp.valueOf("2024-01-16 00:00:00"))
      val perUser = events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("ts") < cut,
            round(col("value") * 100).cast("long")).otherwise(0L)).as("x"),
          sum(when(col("ts") >= cut,
            round(col("value") * 100).cast("long")).otherwise(0L)).as("y"))
        .withColumn("arm", (col("user_id") % 2).cast("int"))
      Causal.cuped(perUser, "y", "x", "arm")
        .select(col("arm"), col("n"), r(col("mean_y"), 6).as("mean_y"),
          r(col("mean_x"), 6).as("mean_x"),
          r(col("mean_y_adj"), 6).as("mean_y_adj"))
        .orderBy("arm")
    }),

    // sharp regression discontinuity (rectangular kernel, local linear on
    // both sides of the cutoff): ONE side-conditional aggregation, whole-
    // dollar running variable keeps Σx² inside the exact-double range
    "q289_rdd" -> ((s, dir) => {
      val d = t(s, dir, "orders").select(
        round(col("o_totalprice")).cast("long").as("run"),
        (col("o_orderstatus") === "F").cast("int").as("y"))
      Causal.regressionDiscontinuity(d, "run", "y",
          cutoff = 250000.0, bandwidth = 100000.0)
        .select(col("n_l"), col("n_r"), r(col("slope_l") * 1e6, 6)
            .as("slope_l_ppm"), r(col("slope_r") * 1e6, 6).as("slope_r_ppm"),
          r(col("lim_l"), 6).as("lim_l"), r(col("lim_r"), 6).as("lim_r"),
          r(col("tau"), 6).as("tau"))
    }),

    // DBSCAN density clustering (grid-blocked 9-cell candidate join, core
    // threshold, LSS components over core-core edges, min-label border
    // attachment) — arbitrary-shape clustering with a noise class next to
    // q163's k-means; oracle = brute-force ε-graph + recursive-CTE closure
    "q290_dbscan" -> ((s, dir) => {
      val d = t(s, dir, "embeddings").select(col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("x"),
        element_at(col("embedding"), 2).cast("double").as("y"))
      Cluster.dbscan(d, "vec_id", "x", "y", eps = 0.02, minPts = 5)
        .orderBy("vec_id")
    }),

    // EXACT edit-distance self-join via PassJoin segment filtering —
    // recall-complete typo/near-identity matching next to the blocked
    // (recall-by-blocking-key) selfPairs and the Jaccard prefix filter
    "q291_edit_join" -> ((s, dir) => {
      FuzzyJoin.editDistanceSelfJoin(t(s, dir, "supplier"),
          "s_suppkey", "s_name", maxDist = 1)
        .orderBy("id_a", "id_b")
    }),

    // average precision @ 10 per source (MAP's per-query term): binary
    // relevance over the same (score desc, doc) total order as q248/q259
    "q292_map" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("source"), col("doc_id"),
        col("n_chars").as("score"),
        (col("lang") === "en").cast("int").as("rel"))
      Retrieval.averagePrecisionAtK(d, "source", "doc_id", "score",
          "rel", 10)
        .orderBy("source")
    }),

    // gradient-boosted stumps (squared loss): per round ONE (feature,
    // value) collapse over a literal-CASE residual — no materialized
    // state; integer micro-unit leaf updates keep residual sums exact,
    // so three unrolled rounds replay as CTEs
    "q293_gbm_stumps" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        col("l_quantity"), col("l_discount"), col("l_tax"),
        (col("l_returnflag") === "R").cast("int").as("y"))
      Tree.fitBoostedStumps(d, Seq("l_discount", "l_quantity", "l_tax"),
          "y", rounds = 3, learningRate = 0.5).toDF(s)
        .orderBy("round")
    }),

    // median (quantile) regression by IRLS on the pinball loss: per
    // iteration ONE weighted Gram pass with literal-beta weights; betas
    // quantized to the 1e-8 grid each solve so the fixed point replays;
    // tau = 0.5 makes the weight sign-free (no residual-sign knife edge)
    "q294_quantreg" -> ((s, dir) => {
      val d = t(s, dir, "lineitem")
      val m = QuantReg.fit(d, Seq("l_quantity"), "l_extendedprice",
        tau = 0.5, iters = 3)
      import s.implicits._
      Seq((m.tau, rd(m.coefs(0), 6), rd(m.coefs(1), 6),
          rd(m.pinball, 4)))
        .toDF("tau", "intercept", "slope", "pinball")
    }),

    // exact Shapley attribution for the linear model (phi_j = beta_j·(x_j
    // − mean x_j) exactly, by linearity): global importance table off two
    // fused aggregation passes — the explanation companion to q18
    "q295_lm_attribution" -> ((s, dir) => {
      val d = t(s, dir, "lineitem")
      val m = LM.fit(d, Seq("l_quantity", "l_discount"), "l_extendedprice")
      Explain.linearAttribution(d, Seq("l_quantity", "l_discount"),
          m.coefs.toArray)
        .select(col("feature"), r(col("beta"), 3).as("beta"),
          r(col("mean_abs_phi"), 3).as("mean_abs_phi"),
          r(col("share"), 6).as("share"))
        .orderBy("feature")
    }),

    // partial dependence of the boosted-stump model on l_quantity: the
    // whole grid in ONE aggregation (each grid point = one avg column of
    // the intervened literal-CASE scorer); exact long sums to the divide
    "q296_pd_gbm" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        col("l_quantity"), col("l_discount"), col("l_tax"),
        (col("l_returnflag") === "R").cast("int").as("y"))
      val m = Tree.fitBoostedStumps(d,
        Seq("l_discount", "l_quantity", "l_tax"), "y",
        rounds = 3, learningRate = 0.5)
      Explain.partialDependence(d, (5 to 50 by 5).map(_.toDouble),
          g => m.predictMicroExprWith(f =>
            if (f == "l_quantity") g else col(f)))
        .select(col("value"), r(col("pd") / 1e6, 6).as("pd"))
        .orderBy("value")
    }),

    // deterministic Poisson(1) percentile bootstrap for a mean: md5(id#b)
    // 60-bit draws against exact-long cumulative thresholds (no float in
    // the randomness path), integral cents keep replicate sums exact,
    // order statistics over the 200-row replicate frame
    "q297_bootstrap_ci" -> ((s, dir) => {
      val d = t(s, dir, "customer").select(col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
      Hypothesis.bootstrapMeanCI(d, "bal_cents", "c_custkey",
        nBoot = 200, level = 0.95)
    }),

    // count-based word embeddings: PPMI rows over window-1 contexts +
    // cosine of the sparse rows (Levy-Goldberg — what word2vec implicitly
    // factorizes); vocab-bounded frames, context-keyed dot self-join
    "q298_ppmi_similarity" -> ((s, dir) => {
      Colloc.ppmiSimilarity(t(s, dir, "documents"), "text",
        topV = 50, topK = 20)
    }),

    // STREAMING conversion funnel (the seventh streaming/batch parity
    // family): per-user greedy step matching as flatMapGroupsWithState
    // O(1) state, reached counts emitted on event-time timeout, rolled up
    // to the exact batch step table — oracle = q113's batch funnel SQL
    "q299_funnel_stream" -> ((s, dir) => {
      StreamOps.funnelStepsReplay(events(s, dir),
          Seq("view", "click", "purchase"))
        .orderBy("step_no")
    }),

    // Markov-chain multi-touch attribution: first-order chain over the
    // pre-conversion journeys, per-channel removal effects via ALL
    // knockout variants iterated together (one join + one (variant,
    // state) agg per round over ≤ variants·(channels+3)-row vectors,
    // masses on the 1e-12 grid) — the data-driven companion to q203's
    // positional rules
    "q300_markov_attribution" -> ((s, dir) => {
      EventSeq.markovAttribution(events(s, dir), "user_id", "event_type",
          "ts", "event_id", Seq("view", "click", "signup", "error"),
          "purchase", rounds = 8)
        .orderBy("channel")
    }),

    // exponential AFT survival regression (survreg dist="exponential"
    // parity) via the Poisson-offset identity: training IS the fused-Gram
    // IRLS with offset log(duration); saturated binary covariate gives
    // the closed-form cell-rate oracle with analytic information SEs
    "q301_aft_exponential" -> ((s, dir) => {
      val per = events(s, dir).groupBy("user_id")
        .agg(min("ts").as("t0"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp"),
          max("ts").as("tl"), avg("value").as("av"))
      val d = per
        .filter(col("av").isNotNull)
        .select(
          ((unix_micros(coalesce(col("tp"), col("tl"))) -
            unix_micros(col("t0"))).cast("double") / 3600000000.0)
            .as("dur"),
          col("tp").isNotNull.cast("int").as("ev"),
          (col("av") > 49).cast("int").as("x_high"))
        .filter(col("dur") > 0)
      val m = Survival.aftExponential(d, "dur", "ev", Seq("x_high"))
      import s.implicits._
      m.features.zipWithIndex.map { case (f, i) =>
        (f, rd(m.coefs(i), 6), rd(m.se(i), 6))
      }.toDF("feature", "beta", "se").orderBy("feature")
    }),

    // personalized PageRank / random walk with restart over the q122
    // part-supplier graph, seeded at every 100th part: teleport AND
    // dangling mass return to the seeds, per-round masses on the 1e-12
    // grid — the related-item / seed-expansion proximity readout
    "q302_ppr" -> ((s, dir) => {
      val pe = t(s, dir, "lineitem")
        .select(concat(lit("p"), col("l_partkey")).as("u"),
          concat(lit("s"), col("l_suppkey")).as("v")).distinct()
      val edges = pe.unionByName(pe.select(col("v").as("u"), col("u").as("v")))
      val seeds = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 100 === 0)
        .select(concat(lit("p"), col("l_partkey")).as("u")).distinct()
      Graph.personalizedPageRank(edges, seeds, iters = 3)
        .filter(col("u").startsWith("s"))
        .select(col("u").as("node"), r(col("r") * 1000, 6).as("ppr_k"))
        .orderBy("node")
    }),

    // per-segment exponential AFT (grouped parametric survival): one
    // independent Poisson-offset IRLS per stratum via the GroupedGLM
    // aggregator; saturated binary design gives per-stratum closed-form
    // cell rates and information SEs
    "q303_grouped_aft" -> ((s, dir) => {
      val per = events(s, dir).groupBy("user_id")
        .agg(min("ts").as("t0"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp"),
          max("ts").as("tl"), avg("value").as("av"))
      val d = per
        .filter(col("av").isNotNull)
        .select((col("user_id") % 3).as("stratum"),
          ((unix_micros(coalesce(col("tp"), col("tl"))) -
            unix_micros(col("t0"))).cast("double") / 3600000000.0)
            .as("dur"),
          col("tp").isNotNull.cast("int").as("ev"),
          (col("av") > 49).cast("int").as("x_high"))
        .filter(col("dur") > 0)
      Survival.aftExponentialByGroup(d, Seq("stratum"), "dur", "ev",
          Seq("x_high"))
        .select(col("stratum"), r(col("beta_intercept"), 6).as("beta_intercept"),
          r(col("beta_x_high"), 6).as("beta_x_high"),
          r(col("se_intercept"), 6).as("se_intercept"),
          r(col("se_x_high"), 6).as("se_x_high"), col("n_rows"))
        .orderBy("stratum")
    }),

    // Viterbi unigram segmentation (SentencePiece encode) under a FIXED
    // integer micro-nat vocab — exact integer DP, first-max-wins
    // tie-break, OOV single chars at the unk penalty; runs once per
    // DISTINCT word (the dictionary-join tokenization shape)
    "q305_unigram_segment" -> ((s, dir) => {
      val words = graft.ops.fanOut(t(s, dir, "documents"))
        .select(explode(split(col("text"), "\\s+")).as("w0"))
        .filter(length(col("w0")) > 0)
        .select(substring(col("w0"), 1, 8).as("w")).distinct()
      Unigram.segmentWordsViterbi(words, "w", unigramScores.toMap,
          maxPieceLen = 3, maxWordLen = 8)
        .select(col("w"), array_join(col("tokens"), "|").as("toks"))
        .orderBy("w")
    }),

    // per-document unigram-LM fit score: per-word Viterbi best-path
    // micro-nat totals dictionary-joined back onto the corpus — exact
    // integer sums, the model-based quality-filter signal
    "q306_unigram_score" -> ((s, dir) => {
      Unigram.scoreDocs(t(s, dir, "documents"), "doc_id", "text",
          unigramScores.toMap, maxPieceLen = 3, maxWordLen = 8)
        .select(col("doc_id"), col("n_words"), col("n_pieces"),
          col("score_micro"), r(col("avg_nats"), 6).as("avg_nats"))
        .orderBy("doc_id")
    }),

    // unigram-LM tokenizer training (Kudo 2018 / SentencePiece lineage —
    // BPE's q223 sibling): candidate-substring seed vocab + 2 soft-EM
    // rounds of forward-backward expected counts over the distinct-word
    // frame. Exact replay: every float chain is order-pinned, per-position
    // posteriors quantize to integer micro-units BEFORE any shuffle, and
    // M-step probs are exact integer ratios — so the oracle's unrolled
    // lattice recurrences land on identical bits
    "q304_unigram_lm" -> ((s, dir) => {
      Unigram.train(t(s, dir, "documents"), "text", vocabSize = 150,
          maxPieceLen = 3, maxWordLen = 8, minCount = 2, emIters = 2)
        .select(col("piece"), col("weight_micro"), r(col("p"), 6).as("p"))
        .orderBy(col("weight_micro").desc, col("piece")).limit(40)
    }),

    // engine-portable LSH near-dup PAIRS: q39's hash-equality twin —
    // md5-parity hyperplanes, band-bucket self-join with the size cap,
    // cosine grid, id_a < id_b
    "q313_cosine_pairs_lsh_portable" -> ((s, dir) => {
      Similarity.cosinePairsLSHPortable(t(s, dir, "embeddings"), "vec_id",
          "embedding", threshold = 0.3, inDim = 64, nBits = 16, bands = 4)
        .orderBy("id_a", "id_b")
    }),

    // engine-portable hyperplane-LSH ANN: md5-parity ±1 hyperplanes so
    // the whole pipeline — sign bits, band buckets, candidate set,
    // cosine rescoring — replays exactly; q29's hash-equality twin (the
    // q278/q279 portable-MinHash discipline)
    "q312_ann_lsh_portable" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.lshTopKPortable(e, e.filter(col("vec_id") < 3), "vec_id",
          "embedding", k = 10, inDim = 64, nBits = 16, bands = 4)
        .orderBy("query_id", "rn")
    }),

    // corpus tokenization through the trained-vocab dictionary join —
    // the production fan-out path: the Viterbi DP runs once per DISTINCT
    // word, tokens rejoin the corpus in text order, one row per token
    "q311_unigram_tokenize" -> ((s, dir) => {
      Unigram.tokenize(t(s, dir, "documents").select("doc_id", "text"),
          "text", unigramScores.toMap, maxPieceLen = 3, maxWordLen = 8)
        .select(col("doc_id"), posexplode(col("tokens")).as(Seq("pos", "token")))
        .orderBy("doc_id", "pos")
    }),

    // STREAMING PSI drift monitor — the EIGHTH streaming/batch parity
    // family: complete-mode bin-count aggregation (state ≤ cuts+2 rows
    // by construction) replayed over the post-split events, PSI readout
    // against the frozen pre-split reference — equals batch Drift.psi
    // bit for bit (exact integer counts)
    "q310_psi_stream" -> ((s, dir) => {
      val ev = events(s, dir)
      val split = lit("2024-01-16 00:00:00").cast("timestamp")
      StreamOps.psiStreamReplay(ev.filter(col("ts") < split),
          ev.filter(col("ts") >= split), "value",
          cuts = Seq(15.0, 35.0, 70.0))
        .select(r(col("psi"), 8).as("psi"), col("n_bins"))
    }),

    // sliding-stride token windows: the standard pretraining chunk
    // layout (fixed windowSize, stride < windowSize overlap, short-tail
    // drop) — pure projection + one generator, exact strings
    "q309_sliding_chunks" -> ((s, dir) => {
      TextOps.slidingChunks(t(s, dir, "documents"), "doc_id", "text",
          windowSize = 32, stride = 24, minTokens = 4)
        .orderBy("doc_id", "chunk_id")
    }),

    // IVF-PQ search (the faiss-standard scale path): m=1 coarse
    // quantizer buckets the corpus, each query probes its 2 nearest
    // cells, PQ asymmetric rescoring runs on the candidate slice only —
    // the composition capstone over q163/q273/q274
    "q308_ivfpq_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val coarse = Quantize.trainSeeded(e, "vec_id", "embedding", 64,
        m = 1, k = 8)
      val cb = Quantize.trainSeeded(e, "vec_id", "embedding", 64,
        m = 8, k = 16)
      val queries = e.orderBy("vec_id").limit(3)
      Quantize.topKIvf(e, queries, "vec_id", "embedding", coarse, cb,
          nProbe = 2, k = 5)
        .orderBy("query_id", "vec_id")
    }),

    // the full Kudo train loop: EM ×2 → prune (all singles + top-40
    // multi-char by exact count) → EM ×2 — SentencePiece-lite end to end
    "q307_unigram_pruned" -> ((s, dir) => {
      Unigram.train(t(s, dir, "documents"), "text", vocabSize = 150,
          maxPieceLen = 3, maxWordLen = 8, minCount = 2, emIters = 2,
          pruneTo = Some(40), postPruneIters = 2)
        .select(col("piece"), col("weight_micro"), r(col("p"), 6).as("p"))
        .orderBy(col("weight_micro").desc, col("piece")).limit(40)
    }),

    // WordPiece tokenizer training (BERT lineage — the tokenizer triad's
    // third member next to q223 BPE and q304 unigram-LM): BPE's merge
    // loop scored by LIKELIHOOD, count(ab)/(count(a)·count(b)), with ##
    // continuation prefixes. Exact replay: the score is ONE pinned float
    // expression over exact integer counts — identical IEEE754 bits in
    // both engines — so the per-round argmax replays verbatim
    "q314_wordpiece_merges" -> ((s, dir) => {
      WordPiece.learnMerges(t(s, dir, "documents"), "text", numMerges = 8)
        .orderBy("rank")
    }),

    // WordPiece greedy encoding (HuggingFace longest-match-first walk):
    // per-position longest vocab piece, ## when non-initial, whole word
    // → [UNK] on any unmatched position — a pure projection over named
    // cursor columns, DP once per DISTINCT word (the q305 discipline)
    "q315_wordpiece_segment" -> ((s, dir) => {
      // fan out before the split+explode (one-row-group source = one core)
      val words = graft.ops.fanOut(t(s, dir, "documents"))
        .select(explode(split(col("text"), "\\s+")).as("w0"))
        .filter(length(col("w0")) > 0)
        .select(substring(col("w0"), 1, 12).as("w")).distinct()
      WordPiece.segmentWordsGreedy(words, "w", wordpieceVocab,
          maxPieceLen = 7, maxWordLen = 12)
        .select(col("w"), array_join(col("tokens"), "|").as("toks"))
        .orderBy("w")
    }),

    // EXACT quantiles by iterative histogram refinement — the k-th order
    // statistic WITHOUT sorting: each round ONE aggregation whose
    // shuffle carries ≤ buckets·|probs| cells (q58's approx-percentile
    // twin, made hash-gateable by exact integer bucket arithmetic); the
    // oracle is the sort-based selection it replaces at scale
    "q316_exact_quantiles" -> ((s, dir) => {
      val cents = t(s, dir, "lineitem")
        .select(round(col("l_extendedprice") * 100).cast("long").as("v"))
      Profile.exactQuantiles(cents, "v",
          Seq(0.01, 0.25, 0.5, 0.75, 0.99))
        .select(col("p"), col("rank").as("rnk"), col("value"))
        .orderBy("p")
    }),

    // EXACT Jaccard CONTAINMENT self-join (asymmetric near-subset
    // detection — quotes/excerpts/boilerplate wrappers that symmetric
    // Jaccard misses when the superset is much larger): q262's ordered
    // sibling, prefix filter on the subset side only, full postings on
    // the superset side, exact verification — hash-gated against the
    // brute-force ordered-pair join
    "q317_containment_join" -> ((s, dir) => {
      FuzzyJoin.containmentSelfJoin(t(s, dir, "documents"), "doc_id",
          "text", n = 4, threshold = 0.4)
        .orderBy("id_sub", "id_sup")
    }),

    // bagged CART forest (Breiman bagging, distributed-bootstrap
    // Poisson(1) weights from md5(rowid#tree) — the q297 ladder): each
    // tree is a WEIGHTED q284 stump, every bag statistic an exact long
    // sum; the oracle replays all three bags' melt/collapse/window/
    // argmax pipelines with the identical integer weights
    "q318_forest" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("rid"),
        col("l_discount"), col("l_quantity"),
        (col("l_returnflag") === "R").cast("int").as("y"))
      Tree.fitForest(d, Seq("l_discount", "l_quantity"), "y", "rid",
          nTrees = 3, maxDepth = 1).toDF(s)
        .orderBy("tree", "path")
    }),

    // PLSA topic modeling (Hofmann 1999 — the deterministic count-based
    // core of the LDA lineage): 2 soft-EM rounds over the (doc, word, n)
    // frame restricted to the top-50 vocab; per-cell posteriors quantize
    // to integer micro-units BEFORE any shuffle (the q304 discipline),
    // θ/φ are exact integer ratios with a 1-micro-unit floor. q319 gates
    // the topic-word table, q320 the doc-topic mixtures
    "q319_plsa_topics" -> ((s, dir) => {
      Topics.fitPlsa(t(s, dir, "documents"), "doc_id", "text", k = 4,
          topV = 50, iters = 2)
        .topicWordDF(s)
        .select(col("topic"), col("word"), col("weight_micro"),
          r(col("p"), 6).as("p"))
        .orderBy("topic", "word")
    }),

    "q320_plsa_docs" -> ((s, dir) => {
      Topics.fitPlsa(t(s, dir, "documents"), "doc_id", "text", k = 4,
          topV = 50, iters = 2)
        .docTopicsDF
        .select(col("doc_id"), col("topic"), col("weight_micro"),
          r(col("p"), 6).as("p"))
        .orderBy("doc_id", "topic")
    }),

    // Weibull AFT (survreg's DEFAULT distribution — generalizes q301
    // with an estimated shape): alternating warm-started Poisson-offset
    // IRLS at the current shape k with 1e-8-grid-quantized k Newton
    // steps (the q282 θ discipline). Saturated binary design → the
    // oracle's per-round η is the closed cell MLE e_c/Σ t^k; both
    // engines land on the identical quantized k sequence and agree on
    // the 6-digit output grid
    "q321_aft_weibull" -> ((s, dir) => {
      val per = events(s, dir).groupBy("user_id")
        .agg(min("ts").as("t0"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp"),
          max("ts").as("tl"), avg("value").as("av"))
      val d = per
        .filter(col("av").isNotNull)
        .select(
          ((unix_micros(coalesce(col("tp"), col("tl"))) -
            unix_micros(col("t0"))).cast("double") / 3600000000.0)
            .as("dur"),
          col("tp").isNotNull.cast("int").as("ev"),
          (col("av") > 49).cast("int").as("x_high"))
        .filter(col("dur") > 0)
      val m = Survival.aftWeibull(d, "dur", "ev", Seq("x_high"))
      import s.implicits._
      (m.features.zipWithIndex.map { case (f, i) =>
        (f, rd(m.coefs(i), 6))
      } :+ (("scale", rd(m.scale, 6))))
        .toDF("term", "estimate").orderBy("term")
    }),

    // l-diversity audit (k-anonymity's disclosure sibling): quasi
    // classes whose sensitive attribute carries fewer than l distinct
    // values — ONE groupBy with an exact distinct count
    "q322_l_diversity" -> ((s, dir) => {
      Profile.lDiversityViolations(t(s, dir, "customer"),
          Seq("c_mktsegment", "c_nationkey"), "c_acctbal", l = 12)
        .orderBy("c_mktsegment", "c_nationkey")
    }),

    // diagonal GMM by EM (k-means' probabilistic sibling): components
    // milli-quantized ONCE, responsibilities micro-quantized BEFORE the
    // moment sums, means/vars/weights exact integer ratios — the q319
    // float-input extension of the PLSA discipline. q323 gates the
    // model table, q324 the hard assignment projection
    "q323_gmm_model" -> ((s, dir) => {
      Mixture.fitGmmDiag(t(s, dir, "embeddings"), "vec_id", "embedding",
          dims = 4, k = 3, iters = 2)
        .toDF(s)
        .select(col("cluster"), col("weight_micro"), r(col("pi"), 6).as("pi"),
          col("dim"), r(col("mean"), 6).as("mean"),
          r(col("variance"), 6).as("variance"))
        .orderBy("cluster", "dim")
    }),

    "q324_gmm_assign" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Mixture.fitGmmDiag(e, "vec_id", "embedding", dims = 4, k = 3,
          iters = 2)
        .assign(e)
        .select(col("vec_id"), col("cluster"))
        .orderBy("vec_id")
    }),

    // deterministic isolation forest (Liu et al. 2008 — multivariate
    // anomaly detection WITHOUT distributional assumptions, next to
    // MAD/Mahalanobis): md5-drawn features/split fractions, per level
    // ONE (tree, node) min/max aggregation. Exact replay is stronger
    // than the EM class: min/max carry exact input doubles, splits are
    // one pinned product, depths are integers. q325 gates the node
    // table, q326 the top-50 anomaly scores
    "q325_isoforest_model" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select("l_orderkey", "l_linenumber",
        "l_quantity", "l_discount", "l_tax", "l_extendedprice")
      val (_, nodes) = Outliers.isolationForest(d,
        Seq("l_quantity", "l_discount", "l_tax", "l_extendedprice"),
        nTrees = 2, maxDepth = 3)
      import s.implicits._
      nodes.map(nd => (nd.tree, nd.path, nd.feature.orNull,
          nd.split.map(v => rd(v, 6)).map(Double.box).orNull, nd.size))
        .toDF("tree", "path", "feature", "split", "size")
        .withColumn("split", col("split").cast("double"))
        .orderBy("tree", "path")
    }),

    "q326_isoforest_scores" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select("l_orderkey", "l_linenumber",
        "l_quantity", "l_discount", "l_tax", "l_extendedprice")
      val (scored, _) = Outliers.isolationForest(d,
        Seq("l_quantity", "l_discount", "l_tax", "l_extendedprice"),
        nTrees = 2, maxDepth = 3)
      scored.select(col("l_orderkey"), col("l_linenumber"),
          r(col("iso_score"), 6).as("score"))
        .orderBy(col("score").desc, col("l_orderkey"),
          col("l_linenumber"))
        .limit(50)
    }),

    // doubly-robust AIPW ATE (Robins et al. 1994 — the modern default
    // estimator, consistent if EITHER the propensity strata or the
    // outcome strata capture the confounding): two cell collapses +
    // ONE scoring scan + ONE mean; q276 ipwAte's augmented sibling
    "q327_aipw_ate" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(
        col("l_linestatus").as("ps"), (col("l_partkey") % 7).as("om"),
        (col("l_returnflag") === "R").cast("int").as("treat"),
        round(col("l_extendedprice") * 100).cast("long")
          .cast("double").as("y"))
      Matching.aipwAte(d, Seq("ps"), Seq("om"), "treat", "y")
        .select(col("n_used"), col("n_excluded"),
          r(col("ate_aipw"), 4).as("ate_aipw"))
    }),

    // trimmed + winsorized means off the q316 exact-quantile bounds —
    // the robust-location readout; integral cents keep every sum exact
    "q328_trimmed_mean" -> ((s, dir) => {
      val cents = t(s, dir, "lineitem")
        .select(round(col("l_extendedprice") * 100).cast("long").as("v"))
      Profile.trimmedMean(cents, "v", 0.05, 0.95)
        .select(col("n"), col("n_kept"), col("q_lo"), col("q_hi"),
          r(col("trimmed_mean"), 6).as("trimmed_mean"),
          r(col("winsorized_mean"), 6).as("winsorized_mean"))
    }),

    // t-closeness release audit (the privacy triad's distributional
    // member next to q_kanon/q322): ordered EMD of each quasi class's
    // binned-balance distribution vs the table's — exact integer mass
    // arithmetic on the common denominator N·n_c, ONE division per class
    "q329_t_closeness" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .withColumn("bal_bin", floor(col("c_acctbal") / 1000).cast("long"))
      Profile.tClosenessViolations(c, Seq("c_mktsegment", "c_nationkey"),
          "bal_bin", t = 0.15)
        .orderBy("c_mktsegment", "c_nationkey")
    }),

    // Newman modularity of the connected-component partition over the
    // q73 jaccard-pair graph: TWO label equi-joins + ONE per-community
    // aggregation, exact stub counts, one pinned division per community
    "q330_modularity" -> ((s, dir) => {
      val pairs = Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id",
          "text", n = 5, threshold = 0.5, maxBucketSize = 100000)
        .select("id_a", "id_b")
      val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
        .unionByName(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      Graph.modularity(edges, Dedup.connectedComponentsLSS(pairs))
        .orderBy("label")
    }),

    // Good–Turing frequency spectrum: corpus → token counts → N_r, the
    // r+1 lookup a self-join of the O(√corpus) spectrum frame; exact
    // integers up to the final r* division
    "q331_good_turing" -> ((s, dir) => {
      Ngram.goodTuring(t(s, dir, "documents"), "text").orderBy("r")
    }),

    // mutual-information feature ranking: FOUR features × one label from
    // ONE scan (stack melt) — which lineitem columns predict returnflag
    "q332_mi_ranking" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_returnflag"),
        col("l_linestatus").as("line_status"),
        floor(col("l_quantity") / 10).cast("long").as("qty_bin"),
        floor(col("l_tax") * 100).cast("long").as("tax_bin"),
        floor(col("l_discount") * 100 / 2).cast("long").as("disc_bin"))
      Contingency.mutualInfoRanking(li,
          Seq("line_status", "qty_bin", "tax_bin", "disc_bin"),
          "l_returnflag")
        .orderBy("feature")
    }),

    // portable HyperLogLog register table (q60/q61's opaque HLL++ made
    // hash-gateable): 60-bit md5 hash → p-bit bucket + leading-zero rank
    // by exact integer bit arithmetic; partial agg collapses each
    // partition to ≤ 2^p cells pre-shuffle
    "q333_hll_registers" -> ((s, dir) => {
      Sketch.hllRegisters(t(s, dir, "lineitem"), "l_orderkey", p = 9)
        .orderBy("bucket")
    }),

    // HLL readout for BOTH regimes: ~15k distinct orderkeys (raw
    // harmonic branch) and 150 distinct users (linear-counting branch);
    // the 2^-M sum is exact-integer scaled, so the whole estimate
    // replays bit-for-bit
    "q334_hll_estimate" -> ((s, dir) => {
      val big = Sketch.hllEstimate(
        Sketch.hllRegisters(t(s, dir, "lineitem"), "l_orderkey", 9), 9)
        .withColumn("key", lit("orderkeys"))
      val small = Sketch.hllEstimate(
        Sketch.hllRegisters(events(s, dir), "user_id", 9), 9)
        .withColumn("key", lit("users"))
      big.unionByName(small)
        .select("key", "m", "n_occupied", "v_zero", "s_scaled", "estimate")
        .orderBy("key")
    }),

    // PrefixSpan sequential patterns over thinned per-user event streams
    // (the %13 thinning keeps sequences short enough that support
    // actually discriminates): earliest-occurrence frontier, per level
    // ONE keyed join + min-agg, anti-monotone support pruning
    "q335_prefixspan" -> ((s, dir) => {
      val ev = events(s, dir).filter(col("event_id") % 13 === 0)
      SeqMine.prefixSpan(ev, "user_id", Seq("ts", "event_id"),
          "event_type", minSupport = 25, maxLen = 3)
        .orderBy("len", "pattern")
    }),

    // STREAMING HLL — the NINTH streaming/batch parity family: the
    // register table from a two-chunk MemoryStream replay of events
    // equals the batch sketch cell-for-cell (state ≤ 2^p rows by
    // construction; the mergeable max IS the streaming update)
    "q336_hll_stream" -> ((s, dir) => {
      StreamOps.hllStreamReplay(events(s, dir), p = 9).orderBy("bucket")
    }),

    // deterministic DeepWalk walks over the part–supplier graph:
    // md5("u#w#t") neighbor draws against the id-ranked adjacency —
    // content-keyed, engine-replayable, two node-keyed joins per step
    "q337_deepwalk_walks" -> ((s, dir) => {
      Graph.randomWalks(deepwalkEdges(s, dir), walksPerNode = 2,
          walkLen = 5)
        .orderBy("walk_id", "step")
    }),

    // DeepWalk-as-counts node similarity: window-1 PMI of consecutive
    // walk pairs (skip-gram factorizes shifted PMI — this is the
    // exact-arithmetic member of that family), top-50 by (pmi, a, b)
    "q338_deepwalk_pmi" -> ((s, dir) => {
      // pairs emitted inside the walk loop (r15): identical counts to the
      // walkPmi(randomWalks(...)) window form — same draws, same joins —
      // without the corpus-wide per-walk lead-window sort
      Graph.walkPmiFromSteps(
          Graph.randomWalkPairs(deepwalkEdges(s, dir), 2, 5), topK = 50)
        .orderBy(col("pmi").desc, col("a"), col("b"))
    }),

    // Cochran–Mantel–Haenszel: does the price–status association
    // survive stratification by order priority? ONE stratum collapse to
    // exact 2×2 cells + a one-row reduce of the K-row frame
    "q339_cmh" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("exposed", col("o_totalprice") > 150000)
        .withColumn("outcome", col("o_orderstatus") === "F")
      Contingency.mantelHaenszel(o, "o_orderpriority", "exposed",
        "outcome")
    }),

    // MMR diversified top-5 against vec 7's embedding: distributed
    // scoring + TakeOrdered candidate cut, model-sized greedy slate
    // (40 rows), every cosine an ascending-dim fold — engine-replayable
    "q340_mmr_select" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 7).head()
        .getSeq[Float](1).map(_.toDouble).toSeq
      Retrieval.mmrSelect(emb, "vec_id", "embedding", q, k = 5,
          lambda = 0.7, candidateN = 40)
        .orderBy("rank")
    }),

    // offline policy evaluation: value of a "click when hot else view"
    // target policy from logged (action, propensity, reward) events —
    // micro-quantized HT weights, ONE aggregation, exact long sums
    "q341_policy_value" -> ((s, dir) => {
      val ev = events(s, dir)
        .withColumn("prop", when(col("event_type") === "click", 0.4)
          .when(col("event_type") === "view", 0.3).otherwise(0.1))
        .withColumn("target",
          when(col("value") > 10, lit("click")).otherwise(lit("view")))
      Causal.policyValue(ev, "event_type", "prop", "value", "target")
    }),

    // HMM Viterbi decode: most likely engagement-state path per user
    // under the fixed literal model — integer micro-nat DP, one keyed
    // join + k²-candidate projection per step, frontier = one row/key
    "q342_hmm_decode" -> ((s, dir) => {
      val ev = events(s, dir).filter(col("event_id") % 7 === 0)
      Hmm.viterbiDecode(ev, "user_id", Seq("ts", "event_id"),
          "event_type", hmmStates, hmmInit, hmmTrans, hmmEmit,
          unkEmitMicro = hmmUnk, maxSteps = 6)
        .orderBy("user_id")
    }),

    // per-group portable HLL — the grouped shape q61's opaque
    // approx_count_distinct actually runs, hash-gateable: (group,
    // bucket) register collapse + per-group exact-integer readout
    "q343_hll_by_group" -> ((s, dir) => {
      Sketch.hllEstimateByGroup(t(s, dir, "lineitem"), "l_returnflag",
          "l_orderkey", p = 9)
        .orderBy("l_returnflag")
    }),

    // Apriori frequent itemsets through triples over the q227 baskets:
    // anti-monotone level pruning, capped per-basket fan-out, exact
    // distinct-basket supports
    "q344_freq_itemsets" -> ((s, dir) => {
      val inc = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("basket"),
          (col("l_partkey") % 50).as("item"))
      Assoc.frequentItemsets(inc, "basket", "item", minCount = 40,
          maxBasketSize = 50)
        .orderBy("size", "itemset")
    }),

    // Mondrian k-anonymization of (balance cents, nation): 6 median-
    // split rounds, widest-range attribute, cut allowable iff the right
    // side keeps >= k — exact integer recursion, released as ranges
    "q345_mondrian" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .select(round(col("c_acctbal") * 100).cast("long").as("bal_cents"),
          col("c_nationkey"))
      Profile.mondrianAnonymize(c, Seq("bal_cents", "c_nationkey"),
          k = 25, rounds = 6)
        .orderBy("leaf")
    }),

    // 1-Wasserstein drift between the event-value halves of the month:
    // binning-free |F_ref − F_cur| integral on exact integer CDF
    // numerators, Decimal(38,0) term sums, one pinned division
    "q346_wasserstein" -> ((s, dir) => {
      val ev = events(s, dir)
        .withColumn("cents", round(col("value") * 100).cast("long"))
      val split = lit("2024-01-16 00:00:00").cast("timestamp")
      Drift.wasserstein1(ev.filter(col("ts") < split),
        ev.filter(col("ts") >= split), "cents")
    }),

    // Dirichlet query-likelihood retrieval: common + rare query terms
    // (collection-absent terms are rejected loudly — zero collection
    // mass has no finite log-likelihood); docs × |q| bounded grid
    "q347_query_likelihood" -> ((s, dir) => {
      Retrieval.queryLikelihood(t(s, dir, "documents"), "doc_id", "text",
          Seq("query", "join", "dup", "vector"), mu = 2000.0,
          topK = 20)
        .orderBy(col("score").desc, col("doc_id"))
    }),

    // DEFLATE compression-ratio quality signal — rows-only: no DuckDB
    // analog of the JVM zlib stream (the q30 byte-codec class; the
    // EntrySpec pin documents it)
    "q348_compression_quality" -> ((s, dir) => {
      TextOps.compressionSignals(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // broken-stick segmented regression: price-per-thousand vs quantity
    // with an 8-candidate breakpoint grid — the whole grid's moments in
    // ONE fused aggregation, exact integer sums, closed-form argmin
    "q349_broken_stick" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_quantity").as("x"),
        round(col("l_extendedprice") / 1000).cast("long").as("y"))
      TimeSeries.brokenStick(li, "x", "y",
        Seq(10, 15, 20, 25, 30, 35, 40, 45))
    }),

    // exact-count stratified holdout: per segment exactly
    // round(n_s·0.2) test rows under the content-keyed md5 rank
    "q350_exact_split" -> ((s, dir) => {
      Sampling.stratifiedExactSplit(t(s, dir, "customer"),
          Seq("c_mktsegment"), "c_custkey", testFrac = 0.2)
        .select("c_custkey", "c_mktsegment", "split")
        .orderBy("c_custkey")
    }),

    // paired t + Wilcoxon signed-rank on per-user pre/post value sums:
    // the within-subject design, exact integer moments + doubled
    // midranks off the cumulative pass
    "q351_paired_tests" -> ((s, dir) => {
      val split = lit("2024-01-16 00:00:00").cast("timestamp")
      val ev = events(s, dir)
        .withColumn("period",
          when(col("ts") < split, "pre").otherwise("post"))
        .withColumn("cents", round(col("value") * 100).cast("long"))
      Hypothesis.pairedTests(ev, "user_id", "cents", "period", "pre",
        "post")
    }),

    // key-skew concentration report over orderkeys: the audit a big
    // join runs before deciding to salt — exact-integer HHI + top-share
    // masses, count-ordered TakeOrdered, never a global sort
    "q352_key_skew" -> ((s, dir) => {
      Profile.keySkew(t(s, dir, "lineitem"), "l_orderkey", topK = 10)
    }),

    // Theil's U: how much of returnflag's entropy does the quantity
    // bin explain, and vice versa — the asymmetric association readout
    "q353_theils_u" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("a"),
          floor(col("l_quantity") / 10).cast("long").as("b"))
      Contingency.theilsU(li, "a", "b")
    }),

    // vocabulary richness: bias-corrected Chao1 + Good's coverage off
    // the frequency spectrum — the crawl-saturation readout
    "q354_vocab_richness" -> ((s, dir) => {
      Ngram.vocabRichness(t(s, dir, "documents"), "text")
    }),

    // token dispersion (burstiness): df/cf per token — template-shaped
    // tokens concentrate in few docs
    "q355_token_dispersion" -> ((s, dir) => {
      Ngram.tokenDispersion(t(s, dir, "documents"), "doc_id", "text",
          minCf = 2)
        .orderBy("token")
    }),

    // engine-portable header-codec gate (the q312 discipline applied to
    // bytes): SYNTHETIC PNG/GIF/WAV payloads assembled from doc_id by
    // hex arithmetic, decoded by the REAL byte-level decodeHeader; the
    // oracle re-parses the identical hex layout with substr/endian
    // folds, so container offsets and endianness are hash-gated even
    // though q30's entropy floats stay rows-only
    "q356_header_decode" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id").isNotNull)
      val w = lit(100) + col("doc_id") % 900
      val hh = lit(50) + col("doc_id") % 500
      val ch = lit(1) + col("doc_id") % 2
      val rate = lit(8000) + lit(1000) * (col("doc_id") % 5)
      def b1(c: Column): Column =
        lpad(hex(c.cast("long") % 256), 2, "0")
      def be32(c: Column): Column = lpad(hex(c.cast("long")), 8, "0")
      def le16(c: Column): Column =
        concat(b1(c), b1(shiftright(c.cast("long"), 8)))
      def le32(c: Column): Column =
        concat(b1(c), b1(shiftright(c.cast("long"), 8)),
          b1(shiftright(c.cast("long"), 16)),
          b1(shiftright(c.cast("long"), 24)))
      val png = concat(lit("89504E470D0A1A0A0000000D49484452"),
        be32(w), be32(hh), lit("0802000000"))
      val gif = concat(lit("474946383761"), le16(w), le16(hh))
      // RIFF + size + WAVE + "fmt " + subchunk size 16 + PCM tag 1
      val wav = concat(lit("52494646" + "24000000" + "57415645" +
        "666D7420" + "10000000" + "0100"), le16(ch), le32(rate),
        le32(rate * 2), lit("02001000"))
      val hexp = when(col("doc_id") % 3 === 0, png)
        .when(col("doc_id") % 3 === 1, gif)
        .otherwise(wav)
      val media = d.select(col("doc_id").as("media_id"),
        unhex(hexp).as("payload"))
      Multimodal.extractFeatures(media, bins = 16)
        .select(col("media_id"), col("n_bytes"), col("format_detected"),
          col("width"), col("height"), col("sample_rate"))
        .orderBy("media_id")
    }),

    // Kendall tau-b: does discount trend with quantity in rank terms —
    // one (x, y) cell collapse (550 cells), the C^2 pair join on the
    // bounded cell frame, Decimal(38,0) concordance sums
    "q357_kendall_tau" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_quantity"),
        floor(col("l_discount") * 100).cast("long").as("disc_pct"))
      Hypothesis.kendallTau(li, "l_quantity", "disc_pct")
    }),

    // Cochran-Armitage trend: does the return rate move monotonically
    // with quantity — five global sums in ONE aggregation, exact
    // Decimal(38,0) integers up to the two pinned z/chi2 expressions
    "q358_trend_test" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select((col("l_returnflag") === "R").as("ret"), col("l_quantity"))
      Hypothesis.cochranArmitage(li, "ret", "l_quantity")
    }),

    // skip-gram positives: ±3 token neighborhood from ONE
    // doc-partitioned window pass (bounded lead unroll, no self-join) —
    // the embedding-training pair generator
    "q359_skipgram_pairs" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") % 10 === 0)
      SkipGram.pairs(d, "doc_id", "text", window = 3)
        .orderBy("doc", "pos", "dist", "center", "context")
    }),

    // deterministic word2vec negative sampling: content-keyed md5 draws
    // into the unigram^(3/4) inverse-CDF cell table (IEEE-exact sqrt
    // composition — pow's libm differs across engines); audited as the
    // per-token draw distribution under the (n desc, token) total order
    "q360_negative_audit" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") % 10 === 0)
      val p = SkipGram.pairs(d, "doc_id", "text", window = 2)
      val tab = SkipGram.unigramTable(d, "text", tableSize = 4096)
      SkipGram.negativeSamples(p, tab, 4096, negK = 2)
        .groupBy("negative").agg(count(lit(1)).as("n_draws"))
        .orderBy(col("n_draws").desc, col("negative"))
        .limit(100)
    }),

    // per-query reciprocal-rank fusion of two supplier rankings (balance
    // + shipment volume) — integer-quantized 10^12 div (k + rank) terms
    // so the fused sum is an exact long in any aggregation order
    "q361_rrf_fusion" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val a = sup.select(lit("bal").as("ranker"),
        col("s_nationkey").as("nation"), col("s_suppkey").as("id"),
        col("s_acctbal").cast("double").as("score"))
      val b = t(s, dir, "lineitem")
        .groupBy(col("l_suppkey").as("id"))
        .agg(count(lit(1)).cast("double").as("score"))
        .join(sup.select(col("s_suppkey").as("id"),
          col("s_nationkey").as("nation")), "id")
        .select(lit("vol").as("ranker"), col("nation"), col("id"),
          col("score"))
      Retrieval.rrfFuse(a.unionByName(b), "ranker", "nation", "id",
          "score", kConst = 60, topK = 5)
        .orderBy("nation", "rank")
    }),

    // expected calibration error over micro-quantized scores (the
    // q138 fixture's scalar readout): exact long bin sums, pinned
    // per-bin gaps, one <= nBins-term float sum
    "q362_ece" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("score", col("l_quantity") / lit(50.0))
        .withColumn("label", when(col("l_returnflag") === "R", 1)
          .otherwise(0))
      Eval.expectedCalibrationError(li, "score", "label", nBins = 10)
    }),

    // empirical-Bayes beta-binomial rate shrinkage: per-customer
    // order-completion rates pulled toward the method-of-moments prior —
    // micro-quantized rates make the moment sums exact integers
    "q363_eb_shrinkage" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_custkey"),
        (col("o_orderstatus") === "F").as("done"))
      Shrink.betaBinomial(o, "o_custkey", "done").orderBy("o_custkey")
    }),

    // simplified silhouette of the q163 kmeans fit (centroid-based
    // O(n·k), the scale form of the O(n²) pairwise score): per-point
    // scores micro-quantized before the per-cluster mean
    "q364_silhouette" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val res = Cluster.kmeans(emb, "vec_id", "embedding", k = 8,
        maxIter = 10)
      Cluster.simplifiedSilhouette(emb, "embedding", res.centroids)
        .orderBy("cluster")
    }),

    // unicode-script character profile: the robust wrong-script filter
    // next to the stopword langid — pure codegen'd regexp arithmetic,
    // one scan, no explode; both engines count Unicode script classes
    "q365_script_profile" -> ((s, dir) => {
      TextOps.scriptProfile(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // clustering agreement: chance-corrected ARI + NMI between two
    // labelings — one contingency collapse, exact Decimal pair counts,
    // three pinned ARI float ops
    "q366_cluster_agreement" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_returnflag").as("a"),
        col("l_linestatus").as("b"))
      Contingency.adjustedRandIndex(li, "a", "b")
    }),

    // Hill tail-index of the token-frequency distribution — the
    // principled power-law exponent next to q233's Zipf OLS: TakeOrdered
    // top-(k+1) order statistics, micro-quantized log excesses (exact
    // long sum in any order), one pinned division
    "q367_hill_tail" -> ((s, dir) => {
      val counts = graft.ops.fanOut(t(s, dir, "documents"))
        .select(explode(filter(split(col("text"), "\\s+"),
          t => length(t) > 0)).as("tok"))
        .groupBy("tok").agg(count(lit(1)).cast("double").as("c"))
      Pareto.hillEstimator(counts, "c", k = 100)
    }),

    // two-sample Cramér–von Mises: the whole-distribution ECDF test
    // next to q102's single-gap KS — integer ECDF gaps floor-divided
    // onto the micro grid so the squared sum is exact in any order
    "q368_cvm_test" -> ((s, dir) => {
      Hypothesis.cramerVonMises(t(s, dir, "lineitem"), "l_extendedprice",
        "l_returnflag", "R", "A")
    }),

    // Rayleigh test of diurnal concentration: circular statistics over
    // the time-of-day circle — micro-quantized cos/sin make the one
    // aggregation exact; R-bar/z/p are pinned float expressions
    "q369_rayleigh" -> ((s, dir) => {
      EventSeq.rayleighTest(events(s, dir), "ts")
    }),

    // Qini coefficient: the scalar uplift-model readout over q131's
    // per-tile curve — lag-free trapezoids off ONE descending cumulative
    // pass, micro-quantized curve values, pinned area/diagonal chain
    "q370_qini" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_extendedprice").as("score"),
        (col("l_partkey") % 2 === 0).cast("int").as("treat"),
        (col("l_returnflag") === "R").cast("int").as("label"))
      Eval.qiniCoefficient(li, "score", "treat", "label")
    }),

    // engine-portable byte-FEATURE gate (the q356 discipline applied to
    // q30's histogram/entropy path): payloads = one 0x00 guard byte (so
    // the md5 prefix can never collide into a JPEG/PNG magic) + 16
    // md5-derived bytes (uniform over 0..255 — every histogram bin
    // populated) + the doc's real UTF-8 text bytes, features extracted
    // by the REAL Multimodal.extractFeatures. Bin COUNTS are recovered
    // exactly from the float-normalized histogram (round(feat·n) is
    // exact while counts < 2^23 — float division is correctly rounded),
    // so the hash gate pins the binning arithmetic integer-exactly;
    // entropy rides a 4-digit grid (the oracle micro-quantizes its
    // per-byte-value terms at 1e12, bounding the cross-engine gap at
    // ~1e-10 ≪ the grid). q30's own float outputs stay rows-only; THIS
    // twin is the hash evidence its byte kernels replay.
    "q371_byte_features" -> ((s, dir) => {
      val media = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id").as("media_id"),
          concat(unhex(concat(lit("00"), md5(col("doc_id").cast("string")))),
            encode(coalesce(col("text"), lit("")), "UTF-8")).as("payload"))
      val f = Multimodal.extractFeatures(media, bins = 16)
      val cnts = (0 until 16).map(k =>
        round(element_at(col("features"), k + 1).cast("double") *
          col("n_bytes")).cast("long").as(f"c$k%02d"))
      f.select(Seq(col("media_id"), col("n_bytes"),
          col("format_detected")) ++ cnts :+
          round(col("entropy"), 4).as("entropy_r4"): _*)
        .orderBy("media_id")
    }),

    // Qini sliced by segment (does the uplift ranking hold in EVERY
    // ship month, or does one segment carry the global number): q370's
    // exact arithmetic with the cumulative pass as a segment-PARTITIONED
    // window — keyed, never a global funnel
    "q372_qini_by_segment" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        month(col("l_shipdate")).as("segment"),
        col("l_extendedprice").as("score"),
        (col("l_partkey") % 2 === 0).cast("int").as("treat"),
        (col("l_returnflag") === "R").cast("int").as("label"))
      Eval.qiniBySegment(li, "segment", "score", "treat", "label")
        .orderBy("segment")
    }),

    // RESIDUAL IVF-PQ (Jégou et al. 2011 — the production FAISS layout
    // q308 approximates): PQ codes quantize x − c_cell, the per-query
    // LUT is built per probed cell from q − c_cell; same seeded-codebook
    // replay discipline as q273/q274/q308, with the codebook trained on
    // the RESIDUAL frame
    "q373_ivfpq_residual" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val coarse = Quantize.trainSeeded(e, "vec_id", "embedding", 64,
        m = 1, k = 8)
      val res = Quantize.residualize(e, "embedding", coarse)
      val cb = Quantize.trainSeeded(res, "vec_id", "__res", 64,
        m = 8, k = 16)
      val queries = e.orderBy("vec_id").limit(3)
      Quantize.topKIvfResidual(e, queries, "vec_id", "embedding", coarse,
          cb, nProbe = 2, k = 5)
        .orderBy("query_id", "vec_id")
    }),

    // Jaro–Winkler near-duplicate part names through the NATIVE
    // codegen'd jaro_winkler expression (DuckDB/rapidfuzz semantics —
    // integer-halved transpositions, 0.7 boost threshold, both-empty=0 —
    // pinned by fuzzing 3000 pairs against the oracle engine, see
    // functions/JaroWinklerExpr.scala): blocked on the first name token
    // like every banded self-join, thresholded on the ROUNDED grid so
    // membership can't flip per engine
    "q374_jaro_winkler" -> ((s, dir) => {
      FuzzyJoin.jaroWinklerPairs(t(s, dir, "part"), "p_partkey", "p_name",
          substring_index(col("p_name"), " ", 1), minSim = 0.9)
        .orderBy("id_a", "id_b")
    }),

    // Page–Hinkley sequential mean-increase monitor per user on the
    // purchase-value series: per row ONE pinned float op (the
    // running-mean shortfall) quantized to a 1e-6-cent grid BEFORE the
    // cumulative sums, so the statistic is exact long arithmetic under
    // any window-sum association (DuckDB segment trees vs Spark folds)
    "q375_page_hinkley" -> ((s, dir) => {
      TimeSeries.pageHinkley(
          events(s, dir).filter(col("event_type") === "purchase"),
          "user_id", "ts", "value", delta = 0.0, lambda = 100.0)
        .orderBy("user_id")
    }),

    // k-truss of q168's co-order part graph: per round one
    // degree-oriented wedge join (out-neighborhoods O(√m)) + one
    // edge-keyed support aggregation + a semi-join peel; early-stops at
    // the fixpoint, and extra rounds are no-ops, so the oracle's
    // fixed-round unroll replays the result exactly
    "q376_ktruss" -> ((s, dir) => {
      val lp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 3 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val edges = lp.join(lp.select(col("o"), col("p").as("p2")), "o")
        .filter(col("p") < col("p2"))
        .select(col("p").as("u"), col("p2").as("v"))
      Graph.kTruss(edges, k = 4, maxRounds = 3)
        .orderBy("a", "b")
    }),

    // Brown double-exponential smoothing forecast on q158's hourly
    // series: two stacked fixed-order EWMA folds (α = 1/2 — every
    // weight an exact power of two), level/trend/forecast as single
    // pinned expressions, rounded only at the end
    "q377_brown_forecast" -> ((s, dir) => {
      val hourly = events(s, dir)
        .filter(col("event_type").isin("purchase", "signup"))
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("bucket"))
        .agg(r(avg("value"), 6).as("v"))
      TimeSeries.brownForecast(hourly, "event_type", "bucket", "v",
          alpha = 0.5, lookback = 8, horizon = 3)
        .select(col("event_type"),
          date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("v"), col("s1"), col("s2"), col("level"), col("trend"),
          col("forecast"))
        .orderBy("event_type", "hour")
    })
  )

  /** q163/q364's shared k-means oracle: deterministic seeding (ORDER BY
    * md5(id), id LIMIT k), `kmeansRounds` unrolled Lloyd rounds with the
    * (distance, cluster) argmin tiebreak and empty-cluster carry — the
    * final centroid table is `ct<kmeansRounds>`, the final assignment
    * `asg<kmeansRounds>`. Factored so every kmeans-derived oracle
    * replays the identical fit.
    */
  private val kmeansRounds = 10
  private lazy val kmeansOracleCtes: String = {
    def rnd(r: Int): String =
      s"""asg$r AS MATERIALIZED (
         |  SELECT id, c FROM (
         |    SELECT dd.id, dd.c,
         |      row_number() OVER (PARTITION BY dd.id ORDER BY dd.d, dd.c)
         |        AS rk
         |    FROM (
         |      SELECT e.id, ct.c, -2 * sum(e.v * ct.w) + any_value(cn.n2)
         |        AS d
         |      FROM e JOIN ct$r ct ON e.p = ct.p
         |      JOIN (SELECT c, sum(w * w) AS n2 FROM ct$r GROUP BY 1) cn
         |        ON ct.c = cn.c
         |      GROUP BY e.id, ct.c) dd)
         |  WHERE rk = 1),
         |ct${r + 1} AS MATERIALIZED (
         |  SELECT ct.c, ct.p, coalesce(nw.w, ct.w) AS w
         |  FROM ct$r ct LEFT JOIN (
         |    SELECT a.c, e.p, sum(e.v) / count(*) AS w
         |    FROM asg$r a JOIN e ON e.id = a.id GROUP BY a.c, e.p) nw
         |  ON ct.c = nw.c AND ct.p = nw.p)""".stripMargin
    """WITH e AS MATERIALIZED (
      |  SELECT vec_id AS id, CAST(u.ix AS INT) AS p,
      |    CAST(embedding[u.ix + 1] AS DOUBLE) AS v
      |  FROM embeddings,
      |    unnest(generate_series(0, len(embedding) - 1)) AS u(ix)
      |  WHERE embedding IS NOT NULL),
      |picks AS MATERIALIZED (
      |  SELECT id, rn - 1 AS c FROM (
      |    SELECT vec_id AS id, row_number() OVER (
      |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
      |    FROM embeddings WHERE embedding IS NOT NULL)
      |  WHERE rn <= 8),
      |ct0 AS MATERIALIZED (
      |  SELECT picks.c, e.p, e.v AS w FROM picks JOIN e ON e.id = picks.id),
      |""".stripMargin +
      (0 to kmeansRounds).map(rnd).mkString(",\n")
  }

  /** q342's shared HMM model (micro-nat log-probs; the oracle builder
    * reads the SAME maps, so query and SQL can never drift). */
  private val hmmStates = Seq("calm", "active", "hot")
  private val hmmInit = Map(
    "calm" -> -500000L, "active" -> -1200000L, "hot" -> -2000000L)
  private val hmmTrans: Map[(String, String), Long] = Map(
    ("calm", "calm") -> -300000L, ("calm", "active") -> -1500000L,
    ("calm", "hot") -> -3000000L,
    ("active", "calm") -> -1200000L, ("active", "active") -> -700000L,
    ("active", "hot") -> -1600000L,
    ("hot", "calm") -> -2500000L, ("hot", "active") -> -1000000L,
    ("hot", "hot") -> -900000L)
  private val hmmEmit: Map[(String, String), Long] = Map(
    ("calm", "view") -> -400000L, ("calm", "click") -> -1800000L,
    ("calm", "error") -> -2500000L,
    ("active", "view") -> -1000000L, ("active", "click") -> -800000L,
    ("active", "purchase") -> -2200000L,
    ("hot", "click") -> -1200000L, ("hot", "purchase") -> -600000L,
    ("hot", "error") -> -2000000L)
  private val hmmUnk = -3000000L

  /** q342's oracle: the same integer micro-nat Viterbi DP unrolled as
    * chained pivoted CTEs (candidate layer + frontier layer per step),
    * generated from the SAME model maps as the query. */
  private val hmmOracle: String = {
    val k = hmmStates.size
    def emitSql(j: Int, o: String): String = {
      val pairs = hmmEmit.collect {
        case ((s, ob), v) if s == hmmStates(j) => (ob, v)
      }.toSeq.sortBy(_._1)
      pairs.reverse.foldLeft(hmmUnk.toString) { case (acc, (ob, v)) =>
        s"CASE WHEN $o = '$ob' THEN $v ELSE $acc END"
      }
    }
    def trans(i: Int, j: Int): Long =
      hmmTrans.getOrElse((hmmStates(i), hmmStates(j)), -1000000000000L)
    val f1 = s"""f1 AS (SELECT k,
      ${(0 until k).map(j =>
        s"${hmmInit(hmmStates(j))} + (${emitSql(j, "o")}) AS s_$j, " +
          s"'${hmmStates(j)}' AS p_$j").mkString(",\n      ")}
      FROM ev WHERE pos = 1)"""
    val steps = (2 to 6).map { t =>
      val cands = (for (j <- 0 until k; i <- 0 until k)
        yield s"f.s_$i + ${trans(i, j)} AS c_${i}_$j").mkString(",\n      ")
      val olds = (0 until k).map(j =>
        s"f.s_$j AS os_$j, f.p_$j AS op_$j").mkString(", ")
      val fCols = (0 until k).map { j =>
        val best = (0 until k).map(i => s"c_${i}_$j")
          .reduceLeft((a, b) => s"greatest($a, $b)")
        val argPath = s"""CASE WHEN c_0_$j >= $best THEN op_0
          WHEN c_1_$j >= $best THEN op_1 ELSE op_2 END"""
        s"""CASE WHEN o IS NULL THEN os_$j
          ELSE $best + (${emitSql(j, "o")}) END AS s_$j,
        CASE WHEN o IS NULL THEN op_$j
          ELSE ($argPath) || '>' || '${hmmStates(j)}' END AS p_$j"""
      }.mkString(",\n      ")
      s"""c$t AS (SELECT f.k, e.o, $olds,
      $cands
      FROM f${t - 1} f LEFT JOIN (SELECT k, o FROM ev WHERE pos = $t) e
        ON f.k = e.k),
    f$t AS (SELECT k, $fCols FROM c$t)"""
    }.mkString(",\n    ")
    val bestS = (0 until k).map(j => s"s_$j")
      .reduceLeft((a, b) => s"greatest($a, $b)")
    s"""WITH ev AS (
      SELECT user_id AS k, event_type AS o,
        row_number() OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS pos
      FROM events WHERE event_id % 7 = 0 AND event_type IS NOT NULL),
    $f1,
    $steps,
    fin AS (SELECT k,
      CASE WHEN s_0 >= $bestS THEN p_0
           WHEN s_1 >= $bestS THEN p_1 ELSE p_2 END AS path,
      $bestS AS score_micro
      FROM f6)
    SELECT k AS user_id, len(string_split(path, '>')) AS n_steps,
      path, CAST(score_micro AS BIGINT) AS score_micro
    FROM fin ORDER BY user_id"""
  }

  /** q337/q338's graph: the q122/q176 symmetrized part–supplier
    * relation. */
  private def deepwalkEdges(s: SparkSession, dir: String): DataFrame = {
    val pe = t(s, dir, "lineitem")
      .select(concat(lit("p"), col("l_partkey")).as("u"),
        concat(lit("s"), col("l_suppkey")).as("v")).distinct()
    pe.unionByName(pe.select(col("v").as("u"), col("u").as("v")))
  }

  /** q349's oracle: per-candidate conditional moments + closed-form
    * two-piece OLS + the (sse, c) argmin — identical arithmetic order
    * to the operator's driver combine. */
  private val brokenStickOracle: String = {
    val cands = Seq(10, 15, 20, 25, 30, 35, 40, 45)
    val moments = cands.map { c =>
      s"""SELECT CAST($c AS DOUBLE) AS c,
         |  sum(CASE WHEN x <= $c THEN 1 ELSE 0 END) AS nl,
         |  sum(CASE WHEN x <= $c THEN x ELSE 0 END) AS sxl,
         |  sum(CASE WHEN x <= $c THEN y ELSE 0 END) AS syl,
         |  sum(CASE WHEN x <= $c THEN x * x ELSE 0 END) AS sxxl,
         |  sum(CASE WHEN x <= $c THEN x * y ELSE 0 END) AS sxyl,
         |  sum(CASE WHEN x <= $c THEN y * y ELSE 0 END) AS syyl,
         |  sum(CASE WHEN x > $c THEN 1 ELSE 0 END) AS nr,
         |  sum(CASE WHEN x > $c THEN x ELSE 0 END) AS sxr,
         |  sum(CASE WHEN x > $c THEN y ELSE 0 END) AS syr,
         |  sum(CASE WHEN x > $c THEN x * x ELSE 0 END) AS sxxr,
         |  sum(CASE WHEN x > $c THEN x * y ELSE 0 END) AS sxyr,
         |  sum(CASE WHEN x > $c THEN y * y ELSE 0 END) AS syyr
         |FROM base""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH base AS (
       |  SELECT l_quantity AS x,
       |    CAST(CAST(round(l_extendedprice / 1000) AS BIGINT) AS DOUBLE)
       |      AS y
       |  FROM lineitem
       |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
       |m AS (
       |$moments
       |),
       |f AS (
       |  SELECT c, CAST(nl AS BIGINT) AS n_l, CAST(nr AS BIGINT) AS n_r,
       |    (nl * sxyl - sxl * syl) / (nl * sxxl - sxl * sxl) AS b1l,
       |    (nr * sxyr - sxr * syr) / (nr * sxxr - sxr * sxr) AS b1r,
       |    syl, syr, sxl, sxr, sxyl, sxyr, syyl, syyr, nl, nr
       |  FROM m
       |  WHERE nl >= 2 AND nr >= 2
       |    AND (nl * sxxl - sxl * sxl) <> 0
       |    AND (nr * sxxr - sxr * sxr) <> 0),
       |g AS (
       |  SELECT c, n_l, n_r, b1l, b1r,
       |    (syl - b1l * sxl) / nl AS b0l,
       |    (syr - b1r * sxr) / nr AS b0r,
       |    (syyl - (syl - b1l * sxl) / nl * syl - b1l * sxyl)
       |      + (syyr - (syr - b1r * sxr) / nr * syr - b1r * sxyr) AS sse
       |  FROM f)
       |SELECT c AS breakpoint, n_l, n_r,
       |  round(b1l, 6) AS slope_l, round(b0l, 6) AS intercept_l,
       |  round(b1r, 6) AS slope_r, round(b0r, 6) AS intercept_r,
       |  round(sse, 2) AS sse
       |FROM g ORDER BY sse, c LIMIT 1""".stripMargin
  }

  /** q345's oracle: 6 unrolled Mondrian rounds — per round the leaf
    * stats, widest-range attribute choice, ceil(n/2) rank median,
    * left-count, and allowable-cut relabel, all exact integers. */
  private val mondrianOracle: String = {
    val rounds = (1 to 6).map { t =>
      s"""s$t AS MATERIALIZED (SELECT leaf, count(*) AS n, min(a) AS mina,
         |  max(a) AS maxa, min(b) AS minb, max(b) AS maxb
         |  FROM r${t - 1} GROUP BY 1),
         |t$t AS (SELECT leaf, n,
         |  CASE WHEN maxa - mina >= greatest(maxa - mina, maxb - minb)
         |    THEN 'a' ELSE 'b' END AS attr FROM s$t),
         |v$t AS MATERIALIZED (SELECT r.a, r.b, r.leaf, t.n, t.attr,
         |  CASE WHEN t.attr = 'a' THEN r.a ELSE r.b END AS sv
         |  FROM r${t - 1} r JOIN t$t t USING (leaf)),
         |rk$t AS (SELECT leaf, sv, n,
         |  row_number() OVER (PARTITION BY leaf ORDER BY sv) AS rn
         |  FROM v$t),
         |m$t AS MATERIALIZED (SELECT leaf, sv AS med FROM rk$t
         |  WHERE rn = (n + 1) // 2),
         |n$t AS (SELECT v.leaf,
         |  sum(CASE WHEN v.sv <= m.med THEN 1 ELSE 0 END) AS nl
         |  FROM v$t v JOIN m$t m USING (leaf) GROUP BY 1),
         |r$t AS MATERIALIZED (SELECT v.a, v.b,
         |  CASE WHEN v.n >= 50 AND v.n - n.nl >= 25
         |    THEN v.leaf || (CASE WHEN v.sv <= m.med THEN 'L' ELSE 'R' END)
         |    ELSE v.leaf END AS leaf
         |  FROM v$t v JOIN m$t m USING (leaf) JOIN n$t n USING (leaf))"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH r0 AS MATERIALIZED (
       |  SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS a,
       |    CAST(c_nationkey AS BIGINT) AS b, 'r' AS leaf
       |  FROM customer
       |  WHERE c_acctbal IS NOT NULL AND c_nationkey IS NOT NULL),
       |$rounds
       |SELECT leaf, CAST(count(*) AS BIGINT) AS n,
       |  min(a) AS bal_cents_min, max(a) AS bal_cents_max,
       |  min(b) AS c_nationkey_min, max(b) AS c_nationkey_max
       |FROM r6 GROUP BY 1 ORDER BY leaf""".stripMargin
  }

  /** q340's oracle: distributed relevance + candidate cut, then the
    * 5-round greedy MMR unrolled as chained CTEs — the sim frame and all
    * score arithmetic mirror the driver loop exactly ((1.0 − 0.7) as
    * written, raw-double ordering with the id tiebreak). */
  private val mmrOracle: String = {
    val rounds = (2 to 5).map { i =>
      s"""s$i AS (
         |  SELECT c.id, c.rel,
         |    0.7 * c.rel - (1.0 - 0.7) * max(sim.cos) AS score
         |  FROM cand c JOIN sim ON sim.ia = c.id
         |    AND sim.ib IN (SELECT id FROM sel${i - 1})
         |  WHERE c.id NOT IN (SELECT id FROM sel${i - 1})
         |  GROUP BY c.id, c.rel ORDER BY score DESC, c.id LIMIT 1),
         |sel$i AS (SELECT id FROM sel${i - 1}
         |          UNION ALL SELECT id FROM s$i)""".stripMargin
    }.mkString(",\n")
    val out = (2 to 5).map(i =>
      s"UNION ALL SELECT $i, id, round(rel, 6), round(score, 6) FROM s$i")
      .mkString("\n")
    s"""WITH g AS MATERIALIZED (SELECT vec_id AS id, embedding FROM embeddings),
       |qv AS MATERIALIZED (SELECT embedding AS qe FROM g WHERE id = 7),
       |nrm AS MATERIALIZED (
       |  SELECT id, sqrt(sum(CAST(embedding[k.k + 1] AS DOUBLE)
       |    * CAST(embedding[k.k + 1] AS DOUBLE))) AS nn
       |  FROM g, UNNEST(generate_series(0, 63)) k(k) GROUP BY 1),
       |qn AS (SELECT sqrt(sum(CAST(qe[k.k + 1] AS DOUBLE)
       |    * CAST(qe[k.k + 1] AS DOUBLE))) AS qn
       |  FROM qv, UNNEST(generate_series(0, 63)) k(k)),
       |rel AS MATERIALIZED (
       |  SELECT g.id, sum(CAST(g.embedding[k.k + 1] AS DOUBLE)
       |      * CAST(qv.qe[k.k + 1] AS DOUBLE))
       |    / (any_value(nrm.nn) * any_value(qn.qn)) AS rel
       |  FROM g CROSS JOIN qv CROSS JOIN qn
       |  JOIN nrm ON nrm.id = g.id,
       |  UNNEST(generate_series(0, 63)) k(k)
       |  GROUP BY g.id),
       |cand AS MATERIALIZED (
       |  SELECT id, rel FROM rel ORDER BY rel DESC, id LIMIT 40),
       |sim AS MATERIALIZED (
       |  SELECT a.id AS ia, b.id AS ib,
       |    sum(CAST(ga.embedding[k.k + 1] AS DOUBLE)
       |        * CAST(gb.embedding[k.k + 1] AS DOUBLE))
       |      / (any_value(na.nn) * any_value(nb.nn)) AS cos
       |  FROM cand a JOIN cand b ON a.id <> b.id
       |  JOIN g ga ON ga.id = a.id JOIN g gb ON gb.id = b.id
       |  JOIN nrm na ON na.id = a.id JOIN nrm nb ON nb.id = b.id,
       |  UNNEST(generate_series(0, 63)) k(k)
       |  GROUP BY a.id, b.id),
       |s1 AS (SELECT id, rel, 0.7 * rel AS score FROM cand
       |       ORDER BY rel DESC, id LIMIT 1),
       |sel1 AS (SELECT id FROM s1),
       |$rounds
       |SELECT 1 AS rank, id AS vec_id, round(rel, 6) AS relevance,
       |  round(score, 6) AS mmr_score FROM s1
       |$out
       |ORDER BY rank""".stripMargin
  }

  /** Shared q337/q338 oracle prefix: the id-ranked adjacency, 2 walks
    * per node, and 4 unrolled md5-draw steps — verbatim engine
    * arithmetic. */
  private val deepwalkOracleCtes: String = {
    val steps = (1 to 4).map { t =>
      s"""w$t AS (
         |  SELECT p.walk_id, nb.v AS node
         |  FROM w${t - 1} p
         |  JOIN dg ON p.node = dg.u
         |  JOIN nb ON p.node = nb.u AND nb.rnk =
         |    ('0x' || substr(md5(p.walk_id || '#$t'), 1, 15))::BIGINT
         |      % dg.deg)""".stripMargin
    }.mkString(",\n")
    s"""WITH pe AS (
       |  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS u,
       |    's' || CAST(l_suppkey AS VARCHAR) AS v FROM lineitem),
       |e AS (SELECT u, v FROM pe UNION SELECT v AS u, u AS v FROM pe),
       |nb AS (SELECT u, v,
       |    row_number() OVER (PARTITION BY u ORDER BY v) - 1 AS rnk
       |  FROM e),
       |dg AS (SELECT u, count(*) AS deg FROM nb GROUP BY 1),
       |w0 AS (SELECT u || '#' || CAST(ws.w AS VARCHAR) AS walk_id,
       |         u AS node
       |       FROM dg CROSS JOIN (SELECT unnest([0, 1]) AS w) ws),
       |$steps,
       |allsteps AS (
       |  SELECT walk_id, 0 AS step, node FROM w0
       |  UNION ALL SELECT walk_id, 1, node FROM w1
       |  UNION ALL SELECT walk_id, 2, node FROM w2
       |  UNION ALL SELECT walk_id, 3, node FROM w3
       |  UNION ALL SELECT walk_id, 4, node FROM w4)""".stripMargin
  }

  /** q376 oracle: canonical co-order part edges, 3 unrolled
    * support-peel rounds (triangles enumerated at their id-minimum
    * vertex — the same SET the engine's degree-ordered wedges produce),
    * then the final support readout. Extra rounds past the fixpoint are
    * no-ops, so the fixed unroll replays the engine's early-stopping
    * loop exactly. */
  private lazy val ktrussOracleSql: String = {
    def rnd(r: Int): String =
      s"""tri$r AS MATERIALIZED (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM e${r - 1} e1
         |  JOIN e${r - 1} e2 ON e2.a = e1.a AND e2.b > e1.b
         |  JOIN e${r - 1} e3 ON e3.a = e1.b AND e3.b = e2.b),
         |sup$r AS MATERIALIZED (
         |  SELECT a, b, count(*) AS sup FROM (
         |    SELECT x AS a, y AS b FROM tri$r
         |    UNION ALL SELECT x, z FROM tri$r
         |    UNION ALL SELECT y, z FROM tri$r)
         |  GROUP BY 1, 2),
         |e$r AS MATERIALIZED (
         |  SELECT e.a, e.b FROM e${r - 1} e
         |  JOIN sup$r s ON s.a = e.a AND s.b = e.b AND s.sup >= 2)"""
        .stripMargin
    s"""WITH lp AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
       |  FROM lineitem WHERE l_partkey % 3 = 0),
       |e0 AS MATERIALIZED (
       |  SELECT DISTINCT x.p AS a, y.p AS b
       |  FROM lp x JOIN lp y ON x.o = y.o AND x.p < y.p),
       |${(1 to 3).map(rnd).mkString(",\n")},
       |trif AS MATERIALIZED (
       |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |  FROM e3 e1
       |  JOIN e3 e2 ON e2.a = e1.a AND e2.b > e1.b
       |  JOIN e3 e3x ON e3x.a = e1.b AND e3x.b = e2.b),
       |supf AS MATERIALIZED (
       |  SELECT a, b, count(*) AS support FROM (
       |    SELECT x AS a, y AS b FROM trif
       |    UNION ALL SELECT x, z FROM trif
       |    UNION ALL SELECT y, z FROM trif)
       |  GROUP BY 1, 2)
       |SELECT e.a, e.b, supf.support
       |FROM e3 e JOIN supf ON supf.a = e.a AND supf.b = e.b
       |ORDER BY e.a, e.b""".stripMargin
  }

  /** q377 oracle helper: the α=1/2, lookback-8 renormalized EWMA fold
    * over named lag columns — the identical left-associated chain
    * [[graft.ops.TimeSeries.brownForecast]] builds (powers of two, so
    * every literal is float-exact in both engines). */
  private def brownFoldSql(cols: Seq[String]): String = {
    val ws = Seq("1.0", "0.5", "0.25", "0.125", "0.0625", "0.03125",
      "0.015625", "0.0078125", "0.00390625")
    val num = cols.zip(ws).map { case (c, w) =>
      s"coalesce(CASE WHEN $c IS NOT NULL THEN $c * $w END, 0.0)"
    }.mkString("\n    + ")
    val den = cols.zip(ws).map { case (c, w) =>
      s"coalesce(CASE WHEN $c IS NOT NULL THEN $w END, 0.0)"
    }.mkString("\n    + ")
    s"($num)\n   / ($den)"
  }

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
        |  l_extendedprice * (1.0 - l_discount) AS revenue
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_discount >= 0.08
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_join_topk" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q04_nation_revenue" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q05_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q06_window_running" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                         ROWS UNBOUNDED PRECEDING), 4) AS running_value
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin,

    "q07_setops" ->
      """WITH big AS (
        |  SELECT o_custkey AS custkey FROM orders
        |  GROUP BY o_custkey HAVING sum(o_totalprice) > 3000000.0),
        |building AS (
        |  SELECT c_custkey AS custkey FROM customer
        |  WHERE c_mktsegment = 'BUILDING')
        |SELECT custkey FROM (
        |  (SELECT custkey FROM big EXCEPT SELECT custkey FROM building)
        |  UNION
        |  (SELECT custkey FROM building EXCEPT SELECT custkey FROM big)) u
        |ORDER BY custkey""".stripMargin,

    "q08_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q09_scalar_fns" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  length(p_name) AS name_len,
        |  round(p_retailprice * 1.1, 2) AS inflated,
        |  substring(p_type, 1, 5) AS type5,
        |  p_size % 7 AS size_mod,
        |  abs(p_size - 25) AS size_dev,
        |  p_brand || '-' || p_type AS brand_type
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "q10_distinct_having" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |HAVING count(*) > 100
        |ORDER BY l_returnflag""".stripMargin,

    "q11_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type,
        |  count(*) AS n_events,
        |  round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour, event_type""".stripMargin,

    "q12_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q13_semi_join" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
        |ORDER BY s_suppkey""".stripMargin,

    "q14_model_matrix" ->
      """SELECT CAST(c_custkey AS DOUBLE) AS c_custkey,
        |  CAST(c_nationkey AS DOUBLE) AS c_nationkey,
        |  c_acctbal,
        |  CASE WHEN c_mktsegment = 'BUILDING' THEN 1.0 ELSE 0.0 END AS c_mktsegment_BUILDING,
        |  CASE WHEN c_mktsegment = 'FURNITURE' THEN 1.0 ELSE 0.0 END AS c_mktsegment_FURNITURE,
        |  CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1.0 ELSE 0.0 END AS c_mktsegment_HOUSEHOLD,
        |  CASE WHEN c_mktsegment = 'MACHINERY' THEN 1.0 ELSE 0.0 END AS c_mktsegment_MACHINERY
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "q15_match_cols" ->
      """SELECT c_custkey, c_acctbal, 0.0 AS extra_feat
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q16_na_drop" ->
      """SELECT * FROM supplier
        |WHERE s_suppkey IS NOT NULL AND s_name IS NOT NULL
        |  AND s_nationkey IS NOT NULL AND s_acctbal IS NOT NULL
        |ORDER BY s_suppkey""".stripMargin,

    "q17_gram_moments" ->
      """SELECT
        |  round(avg(l_quantity), 6) AS m_x1,
        |  round(avg(l_discount), 6) AS m_x2,
        |  round(avg(l_quantity * l_quantity), 6) AS m_x1x1,
        |  round(avg(l_quantity * l_discount), 6) AS m_x1x2,
        |  round(avg(l_discount * l_discount), 6) AS m_x2x2,
        |  round(avg(l_extendedprice / 1000.0), 6) AS v_0,
        |  round(avg(l_quantity * (l_extendedprice / 1000.0)), 6) AS v_1,
        |  round(avg(l_discount * (l_extendedprice / 1000.0)), 6) AS v_2,
        |  round(avg((l_extendedprice / 1000.0) * (l_extendedprice / 1000.0)), 6) AS m_yy,
        |  count(*) AS n_rows
        |FROM lineitem""".stripMargin,

    "q18_lm_coefs" ->
      """WITH m AS (
        |  SELECT avg(l_quantity) AS mx1, avg(l_discount) AS mx2,
        |    avg(l_extendedprice) AS my,
        |    avg(l_quantity * l_quantity) AS x11,
        |    avg(l_quantity * l_discount) AS x12,
        |    avg(l_discount * l_discount) AS x22,
        |    avg(l_quantity * l_extendedprice) AS x1y,
        |    avg(l_discount * l_extendedprice) AS x2y,
        |    avg(l_extendedprice * l_extendedprice) AS yy,
        |    count(*) AS n
        |  FROM lineitem),
        |c AS (
        |  SELECT n,
        |    x11 - mx1 * mx1 AS s11, x12 - mx1 * mx2 AS s12,
        |    x22 - mx2 * mx2 AS s22, x1y - mx1 * my AS s1y,
        |    x2y - mx2 * my AS s2y, yy - my * my AS syy,
        |    mx1, mx2, my
        |  FROM m),
        |b AS (
        |  SELECT n, mx1, mx2, my, s1y, s2y, syy,
        |    (s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) AS b1,
        |    (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) AS b2
        |  FROM c)
        |SELECT round(my - b1 * mx1 - b2 * mx2, 3) AS b_intercept,
        |  round(b1, 3) AS b_quantity,
        |  round(b2, 3) AS b_discount,
        |  round((b1 * s1y + b2 * s2y) / syy, 6) AS r2,
        |  n AS n_rows
        |FROM b""".stripMargin,

    "q19_glm_dev_fixed" ->
      """WITH t AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y,
        |    1.0 / (1.0 + exp(-(-0.4 + l_quantity * 0.01 + l_discount * -2.0))) AS mu
        |  FROM lineitem)
        |SELECT
        |  round(avg((y * ln(greatest(y, 1.0) / mu)
        |    + (1.0 - y) * ln(greatest(1.0 - y, 1.0) / (1.0 - mu))) * 2.0), 6) AS avg_dev,
        |  round(avg((y - mu) * (y - mu) / (mu * (1.0 - mu))), 6) AS avg_pearson,
        |  count(*) AS n_rows
        |FROM t""".stripMargin,

    // saturated logit (one binary regressor): coefficients are the
    // cell-proportion logits, deviance is −2Σ[k ln p̂ + (n−k) ln(1−p̂)]
    "q20_glm_coefs" ->
      """WITH t AS (
        |  SELECT CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS xh,
        |    CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
        |  FROM lineitem),
        |c AS (
        |  SELECT xh, avg(y) AS p, count(*) AS n, sum(y) AS k
        |  FROM t GROUP BY xh),
        |b AS (
        |  SELECT
        |    max(CASE WHEN xh = 0 THEN ln(p / (1 - p)) END) AS b0,
        |    max(CASE WHEN xh = 1 THEN ln(p / (1 - p)) END) AS b1,
        |    -2.0 * sum(k * ln(p) + (n - k) * ln(1 - p)) AS dev,
        |    CAST(sum(n) AS BIGINT) AS nr
        |  FROM c)
        |SELECT round(b0, 6) AS b_intercept, round(b1 - b0, 6) AS b_x_high,
        |  round(dev, 4) AS deviance, nr AS n_rows
        |FROM b""".stripMargin,

    "q21_dedup_exact" ->
      """SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY md5(text) ORDER BY digest""".stripMargin,

    "q22_text_stats" ->
      """SELECT doc_id,
        |  len(regexp_split_to_array(text, '\s+')) AS n_tokens,
        |  round((length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
        |    / greatest(length(text), 1), 6) AS punct_ratio,
        |  round((length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))
        |    / greatest(length(text), 1), 6) AS upper_ratio,
        |  round(length(array_to_string(regexp_split_to_array(text, '\s+'), ''))
        |    / greatest(len(regexp_split_to_array(text, '\s+')), 1), 6) AS avg_word_len,
        |  round(
        |    least(len(regexp_split_to_array(text, '\s+')) / 50.0, 1.0) * 0.4
        |    + least((len(list_filter(regexp_split_to_array(text, '\s+'),
        |        t -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for'], t)))
        |       / greatest(len(regexp_split_to_array(text, '\s+')), 1)) * 5.0, 1.0) * 0.4
        |    + greatest(1.0 - ((length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
        |       / greatest(length(text), 1)) * 4.0, 0.0) * 0.2, 6) AS quality
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q23_lang_hist" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents),
        |sc AS (
        |  SELECT doc_id,
        |    greatest(len(t), 1) AS nt,
        |    len(list_filter(t, x -> list_contains(['der','die','das','und','nicht'], x))) AS c_de,
        |    len(list_filter(t, x -> list_contains(['the','and','of','is','not'], x))) AS c_en,
        |    len(list_filter(t, x -> list_contains(['el','la','los','que','y'], x))) AS c_es,
        |    len(list_filter(t, x -> list_contains(['le','la','les','et','ne'], x))) AS c_fr,
        |    len(list_filter(t, x -> list_contains(['de5','shi4','le5','bu4','wo3'], x))) AS c_zh
        |  FROM toks),
        |s AS (
        |  SELECT doc_id,
        |    CAST(c_de AS DOUBLE) / nt AS s_de, CAST(c_en AS DOUBLE) / nt AS s_en,
        |    CAST(c_es AS DOUBLE) / nt AS s_es, CAST(c_fr AS DOUBLE) / nt AS s_fr,
        |    CAST(c_zh AS DOUBLE) / nt AS s_zh
        |  FROM sc),
        |p AS (
        |  SELECT doc_id,
        |    CASE WHEN s_zh > greatest(s_de, s_en, s_es, s_fr) THEN 'zh'
        |         WHEN s_fr > greatest(s_de, s_en, s_es) THEN 'fr'
        |         WHEN s_es > greatest(s_de, s_en) THEN 'es'
        |         WHEN s_en > s_de THEN 'en'
        |         ELSE 'de' END AS lang_pred
        |  FROM s)
        |SELECT lang_pred, count(*) AS n_docs FROM p
        |GROUP BY lang_pred ORDER BY lang_pred""".stripMargin,

    "q24_fingerprint" ->
      """SELECT doc_id,
        |  array_to_string(list_sort(list_distinct(list_filter(
        |    regexp_split_to_array(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +'),
        |    t -> len(t) > 0))), ' ') AS fp
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q25_jaccard_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, len(t) - 3), i -> array_to_string(list_slice(t, i, i + 4), ' '))) AS shingles
        |  FROM toks),
        |sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
        |pairs AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |  FROM pairs a JOIN pairs b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT id_a, id_b,
        |  round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    "q28_ann_brute" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
        |s AS (
        |  SELECT q.query_id, e.vec_id,
        |    round(list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cos
        |  FROM q, embeddings e WHERE e.vec_id <> q.query_id),
        |r AS (
        |  SELECT query_id, vec_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
        |  FROM s)
        |SELECT query_id, vec_id, cos, CAST(rn AS BIGINT) AS rn FROM r
        |WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin,

    "q32_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  round(stddev_samp(l_quantity), 6) AS sd_qty,
        |  round(var_samp(l_discount), 8) AS var_disc
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q33_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
        |  min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q34_date_parts" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(month(o_orderdate) AS BIGINT) AS o_month,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY 1, 2 ORDER BY o_year, o_month""".stripMargin,

    "q35_union_page" ->
      """SELECT k, src FROM (
        |  SELECT c_custkey AS k, 'cust' AS src FROM customer
        |  UNION ALL
        |  SELECT s_suppkey AS k, 'supp' AS src FROM supplier) u
        |ORDER BY k, src LIMIT 50 OFFSET 100""".stripMargin,

    "q36_corr" ->
      """SELECT l_linestatus,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q41_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id AS id, unnest(regexp_split_to_array(text, '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT id, term, count(*) AS tf FROM terms GROUP BY id, term),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT tf.id, tf.term, tf.tf, dfq.df,
        |  round(tf.tf * (ln((n.n_docs + 1.0) / (dfq.df + 1.0)) + 1.0), 6) AS tfidf
        |FROM tf JOIN dfq USING (term), n
        |ORDER BY id, term""".stripMargin,

    "q42_salted_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q43_cloglog_dev" ->
      """WITH t AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y,
        |    1.0 - exp(-exp(-0.4 + l_quantity * 0.01 + l_discount * -2.0)) AS mu
        |  FROM lineitem)
        |SELECT
        |  round(avg((y * ln(greatest(y, 1.0) / mu)
        |    + (1.0 - y) * ln(greatest(1.0 - y, 1.0) / (1.0 - mu))) * 2.0), 6) AS avg_dev,
        |  count(*) AS n_rows
        |FROM t""".stripMargin,

    "q40_grouped_lm" ->
      """SELECT l_suppkey,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS b_intercept,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS b_quantity,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,

    "q49_correlated_avg" ->
      """SELECT p_brand,
        |  round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_quantity < 0.5 * (
        |  SELECT avg(l2.l_quantity) FROM lineitem l2
        |  WHERE l2.l_partkey = lineitem.l_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    "q50_above_own_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 3.0 * (
        |    SELECT avg(o2.o_totalprice) FROM orders o2
        |    WHERE o2.o_custkey = o.o_custkey)
        |  AND (SELECT count(*) FROM orders o3
        |       WHERE o3.o_custkey = o.o_custkey) >= 2
        |ORDER BY o_orderkey""".stripMargin,

    "q47_asof_join" ->
      """WITH anchors AS (
        |  SELECT user_id, date_trunc('hour', ts) AS ats,
        |    round(sum(value), 4) AS hourly_sum
        |  FROM events GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT e.event_id, e.user_id, a.hourly_sum
        |FROM events e ASOF LEFT JOIN anchors a
        |  ON e.user_id = a.user_id AND e.ts >= a.ats
        |ORDER BY e.event_id""".stripMargin,

    "q45_json_extract" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q46_embedding_stats" ->
      """SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vecs,
        |  round(sum(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4) AS sum_norm
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,

    "q44_poisson_dev" ->
      """WITH t AS (
        |  SELECT CAST(l_linenumber AS DOUBLE) AS y,
        |    exp(0.2 + l_quantity * 0.01) AS mu
        |  FROM lineitem)
        |SELECT
        |  round(avg((CASE WHEN y > 0 THEN y * ln(y / mu) ELSE 0.0 END
        |    - (y - mu)) * 2.0), 6) AS avg_dev,
        |  count(*) AS n_rows
        |FROM t""".stripMargin,

    "q38_cosine_pairs" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,

    "q37_pivot" ->
      """SELECT l_returnflag, round(pv."F", 2) AS qty_f, round(pv."O", 2) AS qty_o
        |FROM (PIVOT lineitem ON l_linestatus IN ('F', 'O')
        |      USING sum(l_quantity) GROUP BY l_returnflag) pv
        |ORDER BY l_returnflag""".stripMargin,

    "q53_wls_coefs" ->
      """WITH m AS (
        |  SELECT sum(l_tax + 0.01) AS sw,
        |    sum((l_tax + 0.01) * l_quantity) AS swx,
        |    sum((l_tax + 0.01) * l_extendedprice) AS swy,
        |    sum((l_tax + 0.01) * l_quantity * l_quantity) AS swxx,
        |    sum((l_tax + 0.01) * l_quantity * l_extendedprice) AS swxy,
        |    sum((l_tax + 0.01) * l_extendedprice * l_extendedprice) AS swyy,
        |    count(*) AS n
        |  FROM lineitem),
        |b AS (
        |  SELECT n, sw, swx, swy, swxy, swyy,
        |    (sw * swxy - swx * swy) / (sw * swxx - swx * swx) AS b1
        |  FROM m),
        |f AS (
        |  SELECT n, b1, (swy - b1 * swx) / sw AS b0, swy, swxy, swyy FROM b)
        |SELECT round(b0, 3) AS b_intercept,
        |  round(b1, 3) AS b_quantity,
        |  round(sqrt((swyy - b0 * swy - b1 * swxy) / (n - 2)), 3) AS sigma_w,
        |  n AS n_rows
        |FROM f""".stripMargin,

    "q85_glm_weighted" ->
      """WITH m AS (
        |  SELECT sum(l_tax + 0.01) AS sw,
        |    sum((l_tax + 0.01) * l_quantity) AS swx,
        |    sum((l_tax + 0.01) * l_extendedprice) AS swy,
        |    sum((l_tax + 0.01) * l_quantity * l_quantity) AS swxx,
        |    sum((l_tax + 0.01) * l_quantity * l_extendedprice) AS swxy,
        |    sum((l_tax + 0.01) * l_extendedprice * l_extendedprice) AS swyy,
        |    count(*) AS n
        |  FROM lineitem),
        |b AS (
        |  SELECT n, sw, swx, swy, swxy, swyy,
        |    (sw * swxy - swx * swy) / (sw * swxx - swx * swx) AS b1
        |  FROM m),
        |f AS (
        |  SELECT n, b1, (swy - b1 * swx) / sw AS b0, sw, swy, swxy, swyy FROM b)
        |SELECT round(b0, 3) AS b_intercept,
        |  round(b1, 3) AS b_quantity,
        |  round(1.0 - (swyy - b0 * swy - b1 * swxy) / (swyy - swy * swy / sw), 6) AS r2_w,
        |  n AS n_rows
        |FROM f""".stripMargin,

    "q51_glm_m_dev" ->
      """WITH g AS (
        |  SELECT l_suppkey,
        |    sum(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END) AS y,
        |    CAST(count(*) AS DOUBLE) AS m,
        |    max(l_quantity) AS xq
        |  FROM lineitem GROUP BY l_suppkey),
        |d AS (
        |  SELECT y, m, m / (exp(-(-0.5 + xq * 0.01)) + 1.0) AS mu FROM g)
        |SELECT round(avg((y * ln(greatest(y, 1.0) / mu)
        |    + (m - y) * ln(greatest(m - y, 1.0) / (m - mu))) * 2.0), 6) AS avg_dev,
        |  CAST(sum(y) AS BIGINT) AS sum_y,
        |  count(*) AS n_groups
        |FROM d""".stripMargin,

    "q52_glm_offset_dev" ->
      """WITH t AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y,
        |    1.0 / (exp(-(-1.2 + l_discount * -2.0 + ln(l_quantity + 1.0))) + 1.0) AS mu
        |  FROM lineitem)
        |SELECT
        |  round(avg((y * ln(greatest(y, 1.0) / mu)
        |    + (1.0 - y) * ln(greatest(1.0 - y, 1.0) / (1.0 - mu))) * 2.0), 6) AS avg_dev,
        |  count(*) AS n_rows
        |FROM t""".stripMargin,

    "q54_gaussian_dev" ->
      """WITH t AS (
        |  SELECT l_extendedprice / 1000.0 AS y, 3.0 + l_quantity * 0.1 AS mu
        |  FROM lineitem)
        |SELECT round(avg((y - mu) * (y - mu)), 6) AS avg_dev,
        |  count(*) AS n_rows
        |FROM t""".stripMargin,

    "q55_gamma_dev" ->
      """WITH t AS (
        |  SELECT l_extendedprice AS y, exp(6.0 + l_quantity * 0.02) AS mu
        |  FROM lineitem)
        |SELECT round(avg((0.0 - ln(y / mu) + (y - mu) / mu) * 2.0), 6) AS avg_dev,
        |  count(*) AS n_rows
        |FROM t""".stripMargin,

    "q56_glm_gaussian_coefs" ->
      """WITH m AS (
        |  SELECT avg(l_quantity) AS mx1, avg(l_discount) AS mx2,
        |    avg(l_extendedprice) AS my,
        |    avg(l_quantity * l_quantity) AS x11,
        |    avg(l_quantity * l_discount) AS x12,
        |    avg(l_discount * l_discount) AS x22,
        |    avg(l_quantity * l_extendedprice) AS x1y,
        |    avg(l_discount * l_extendedprice) AS x2y,
        |    avg(l_extendedprice * l_extendedprice) AS yy,
        |    count(*) AS n
        |  FROM lineitem),
        |c AS (
        |  SELECT n,
        |    x11 - mx1 * mx1 AS s11, x12 - mx1 * mx2 AS s12,
        |    x22 - mx2 * mx2 AS s22, x1y - mx1 * my AS s1y,
        |    x2y - mx2 * my AS s2y, yy - my * my AS syy,
        |    mx1, mx2, my
        |  FROM m),
        |b AS (
        |  SELECT n, mx1, mx2, my, s1y, s2y, syy,
        |    (s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) AS b1,
        |    (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) AS b2
        |  FROM c)
        |SELECT round(my - b1 * mx1 - b2 * mx2, 3) AS b_intercept,
        |  round(b1, 3) AS b_quantity,
        |  round(b2, 3) AS b_discount,
        |  round((b1 * s1y + b2 * s2y) / syy, 6) AS r2,
        |  n AS n_rows
        |FROM b""".stripMargin,

    "q57_probit_dev" ->
      """WITH e AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y,
        |    (-0.4 + l_quantity * 0.01 + l_discount * -2.0) AS eta
        |  FROM lineitem),
        |p AS (
        |  SELECT y, eta,
        |    1.0 / (1.0 + 0.2316419 * abs(eta)) AS t,
        |    exp(abs(eta) * abs(eta) * -0.5) * 0.3989422804014327 AS phi
        |  FROM e),
        |u AS (
        |  SELECT y, eta,
        |    1.0 - phi * (t * (0.319381530 + t * (-0.356563782 + t * (1.781477937
        |      + t * (-1.821255978 + t * 1.330274429))))) AS up
        |  FROM p),
        |t2 AS (
        |  SELECT y, CASE WHEN eta >= 0 THEN up ELSE 1.0 - up END AS mu FROM u)
        |SELECT
        |  round(avg((y * ln(greatest(y, 1.0) / mu)
        |    + (1.0 - y) * ln(greatest(1.0 - y, 1.0) / (1.0 - mu))) * 2.0), 6) AS avg_dev,
        |  count(*) AS n_rows
        |FROM t2""".stripMargin,

    "q31_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
        |         THEN 1 ELSE 0 END AS flag
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, value, ts,
        |    CAST(sum(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM flagged)
        |SELECT user_id, session_idx,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS n_events,
        |  round(sum(value), 4) AS total_value
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    "q62_corpus_curation" ->
      """WITH scored AS (
        |  SELECT doc_id, text,
        |    len(regexp_split_to_array(text, '\s+')) AS n_tokens,
        |    least(len(regexp_split_to_array(text, '\s+')) / 50.0, 1.0) * 0.4
        |    + least((len(list_filter(regexp_split_to_array(text, '\s+'),
        |        t -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for'], t)))
        |       / greatest(len(regexp_split_to_array(text, '\s+')), 1)) * 5.0, 1.0) * 0.4
        |    + greatest(1.0 - ((length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
        |       / greatest(length(text), 1)) * 4.0, 0.0) * 0.2 AS q
        |  FROM documents),
        |filt AS (SELECT * FROM scored WHERE q >= 0.471),
        |keep AS (SELECT min(doc_id) AS doc_id FROM filt GROUP BY md5(text)),
        |curated AS (SELECT f.* FROM filt f JOIN keep k ON f.doc_id = k.doc_id),
        |toks AS (
        |  SELECT doc_id, n_tokens, regexp_split_to_array(text, '\s+') AS t FROM curated),
        |sc AS (
        |  SELECT doc_id, n_tokens,
        |    greatest(len(t), 1) AS nt,
        |    len(list_filter(t, x -> list_contains(['der','die','das','und','nicht'], x))) AS c_de,
        |    len(list_filter(t, x -> list_contains(['the','and','of','is','not'], x))) AS c_en,
        |    len(list_filter(t, x -> list_contains(['el','la','los','que','y'], x))) AS c_es,
        |    len(list_filter(t, x -> list_contains(['le','la','les','et','ne'], x))) AS c_fr,
        |    len(list_filter(t, x -> list_contains(['de5','shi4','le5','bu4','wo3'], x))) AS c_zh
        |  FROM toks),
        |s AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(c_de AS DOUBLE) / nt AS s_de, CAST(c_en AS DOUBLE) / nt AS s_en,
        |    CAST(c_es AS DOUBLE) / nt AS s_es, CAST(c_fr AS DOUBLE) / nt AS s_fr,
        |    CAST(c_zh AS DOUBLE) / nt AS s_zh
        |  FROM sc),
        |p AS (
        |  SELECT doc_id, n_tokens,
        |    CASE WHEN s_zh > greatest(s_de, s_en, s_es, s_fr) THEN 'zh'
        |         WHEN s_fr > greatest(s_de, s_en, s_es) THEN 'fr'
        |         WHEN s_es > greatest(s_de, s_en) THEN 'es'
        |         WHEN s_en > s_de THEN 'en'
        |         ELSE 'de' END AS lang_pred
        |  FROM s)
        |SELECT lang_pred, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        |FROM p GROUP BY lang_pred ORDER BY lang_pred""".stripMargin,

    "q63_train_split" ->
      """WITH sp AS (
        |  SELECT text,
        |    len(regexp_split_to_array(text, '\s+')) AS n_tokens,
        |    CASE WHEN substr(md5(text), 32, 1) < 'c' THEN 'train'
        |         WHEN substr(md5(text), 32, 1) < 'e' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        |FROM sp GROUP BY split ORDER BY split""".stripMargin,

    "q60_distinct_exact" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS nd_orders,
        |  count(DISTINCT l_suppkey) AS nd_supps,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q69_interval_join" ->
      """SELECT a.event_id, count(b.event_id) AS n_follow
        |FROM events a LEFT JOIN events b
        |  ON a.user_id = b.user_id AND b.ts > a.ts
        |  AND epoch_ms(b.ts) - epoch_ms(a.ts) <= 300000
        |GROUP BY a.event_id
        |ORDER BY a.event_id""".stripMargin,

    "q75_dedup_stream" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "q76_stratified_sample" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(text)) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE substr(md5(text), 32, 1) <
        |  CASE WHEN lang = 'en' THEN '4' ELSE '1' END
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q74_heavy_hitters" ->
      """SELECT t AS token, count(*) AS n
        |FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS t FROM documents)
        |WHERE len(t) > 0
        |GROUP BY t
        |ORDER BY n DESC, t
        |LIMIT 20""".stripMargin,

    "q73_cc_labels" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, len(t) - 3), i -> array_to_string(list_slice(t, i, i + 4), ' '))) AS shingles
        |  FROM toks),
        |sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
        |pairs AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |  FROM pairs a JOIN pairs b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |e0 AS (
        |  SELECT id_a, id_b FROM inter
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM e0
        |  UNION ALL SELECT id_b, id_a FROM e0),
        |cc(id, label) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, c.label FROM cc c JOIN edges e ON c.id = e.src)
        |SELECT id, min(label) AS label FROM cc GROUP BY id ORDER BY id""".stripMargin,

    "q71_grouped_wls" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    sum(l_tax + 0.01) AS sw,
        |    sum((l_tax + 0.01) * l_quantity) AS swx,
        |    sum((l_tax + 0.01) * l_extendedprice) AS swy,
        |    sum((l_tax + 0.01) * l_quantity * l_quantity) AS swxx,
        |    sum((l_tax + 0.01) * l_quantity * l_extendedprice) AS swxy,
        |    count(*) AS n
        |  FROM lineitem GROUP BY l_returnflag),
        |b AS (
        |  SELECT l_returnflag, n, sw, swx, swy,
        |    (sw * swxy - swx * swy) / (sw * swxx - swx * swx) AS b1
        |  FROM m)
        |SELECT l_returnflag,
        |  round((swy - b1 * swx) / sw, 3) AS b_intercept,
        |  round(b1, 3) AS b_quantity,
        |  n AS n_rows
        |FROM b ORDER BY l_returnflag""".stripMargin,

    "q72_grouped_predict" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    sum(l_tax + 0.01) AS sw,
        |    sum((l_tax + 0.01) * l_quantity) AS swx,
        |    sum((l_tax + 0.01) * l_extendedprice) AS swy,
        |    sum((l_tax + 0.01) * l_quantity * l_quantity) AS swxx,
        |    sum((l_tax + 0.01) * l_quantity * l_extendedprice) AS swxy
        |  FROM lineitem GROUP BY l_returnflag),
        |b AS (
        |  SELECT l_returnflag, sw, swx, swy,
        |    (sw * swxy - swx * swy) / (sw * swxx - swx * swx) AS b1
        |  FROM m),
        |f AS (SELECT l_returnflag, b1, (swy - b1 * swx) / sw AS b0 FROM b)
        |SELECT l.l_returnflag, count(*) AS n_high,
        |  CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
        |FROM lineitem l JOIN f ON l.l_returnflag = f.l_returnflag
        |WHERE f.b0 + f.b1 * l.l_quantity > 53000
        |GROUP BY l.l_returnflag
        |ORDER BY l.l_returnflag""".stripMargin,

    // streaming replay of the same interval join: identical oracle to q69
    "q70_interval_stream" ->
      """SELECT a.event_id, count(b.event_id) AS n_follow
        |FROM events a LEFT JOIN events b
        |  ON a.user_id = b.user_id AND b.ts > a.ts
        |  AND epoch_ms(b.ts) - epoch_ms(a.ts) <= 300000
        |GROUP BY a.event_id
        |ORDER BY a.event_id""".stripMargin,

    // identical oracle to q11: the streaming windowed aggregation must
    // reproduce the batch hourly relation exactly
    "q67_hourly_stream" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type,
        |  count(*) AS n_events,
        |  round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour, event_type""".stripMargin,

    "q86_hourly_file_stream" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type,
        |  count(*) AS n_events,
        |  round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour, event_type""".stripMargin,

    "q66_window_range" ->
      """SELECT o_custkey, o_orderkey,
        |  date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS day,
        |  round(sum(o_totalprice) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 4) AS sum_30d,
        |  CAST(ntile(4) OVER w2 AS BIGINT) AS quartile,
        |  percent_rank() OVER w2 AS pr
        |FROM orders
        |WINDOW w2 AS (PARTITION BY o_custkey
        |              ORDER BY date_diff('day', TIMESTAMP '1970-01-01', o_orderdate), o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    // per-group saturated logit (q20's closed form, grouped): each return
    // flag's coefficients are its own cell-proportion logits
    "q64_grouped_glm" ->
      """WITH t AS (
        |  SELECT l_returnflag,
        |    CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS xh,
        |    CASE WHEN l_discount >= 0.05 THEN 1.0 ELSE 0.0 END AS y
        |  FROM lineitem),
        |c AS (
        |  SELECT l_returnflag, xh, avg(y) AS p, count(*) AS n, sum(y) AS k
        |  FROM t GROUP BY 1, 2),
        |b AS (
        |  SELECT l_returnflag,
        |    max(CASE WHEN xh = 0 THEN ln(p / (1 - p)) END) AS b0,
        |    max(CASE WHEN xh = 1 THEN ln(p / (1 - p)) END) AS b1,
        |    -2.0 * sum(k * ln(p) + (n - k) * ln(1 - p)) AS dev,
        |    CAST(sum(n) AS BIGINT) AS nr
        |  FROM c GROUP BY l_returnflag)
        |SELECT l_returnflag, round(b0, 6) AS b_intercept,
        |  round(b1 - b0, 6) AS b_x_high, round(dev, 4) AS deviance,
        |  nr AS n_rows
        |FROM b ORDER BY l_returnflag""".stripMargin,

    // q31's oracle with one boundary change: session_window starts a new
    // session when the inter-event delta REACHES the gap (>=), where the
    // custom sessionize requires it to exceed it (>)
    "q65_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= 1800000
        |         THEN 1 ELSE 0 END AS flag
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, value, ts,
        |    CAST(sum(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM flagged)
        |SELECT user_id, session_idx,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS n_events,
        |  round(sum(value), 4) AS total_value
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    // identical oracle to q31: the streaming operator must reproduce the
    // batch session relation exactly
    "q59_sessionize_stream" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
        |         THEN 1 ELSE 0 END AS flag
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, value, ts,
        |    CAST(sum(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM flagged)
        |SELECT user_id, session_idx,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS n_events,
        |  round(sum(value), 4) AS total_value
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    // q18's closed-form 2-regressor normal equations with the second
    // regressor replaced by the interaction product l_quantity·l_discount
    "q77_lm_interaction" ->
      """WITH m AS (
        |  SELECT avg(l_quantity) AS mx1,
        |    avg(l_quantity * l_discount) AS mx2,
        |    avg(l_extendedprice) AS my,
        |    avg(l_quantity * l_quantity) AS x11,
        |    avg(l_quantity * l_quantity * l_discount) AS x12,
        |    avg(l_quantity * l_discount * l_quantity * l_discount) AS x22,
        |    avg(l_quantity * l_extendedprice) AS x1y,
        |    avg(l_quantity * l_discount * l_extendedprice) AS x2y,
        |    avg(l_extendedprice * l_extendedprice) AS yy,
        |    count(*) AS n
        |  FROM lineitem),
        |c AS (
        |  SELECT n,
        |    x11 - mx1 * mx1 AS s11, x12 - mx1 * mx2 AS s12,
        |    x22 - mx2 * mx2 AS s22, x1y - mx1 * my AS s1y,
        |    x2y - mx2 * my AS s2y, yy - my * my AS syy,
        |    mx1, mx2, my
        |  FROM m),
        |b AS (
        |  SELECT n, mx1, mx2, my, s1y, s2y, syy,
        |    (s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) AS b1,
        |    (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) AS b2
        |  FROM c)
        |SELECT round(my - b1 * mx1 - b2 * mx2, 3) AS b_intercept,
        |  round(b1, 3) AS b_quantity,
        |  round(b2, 3) AS b_inter,
        |  round((b1 * s1y + b2 * s2y) / syy, 6) AS r2,
        |  n AS n_rows
        |FROM b""".stripMargin,

    // saturated per-group logistic: the MLE is the cell success
    // proportion, so predict ≡ the cell average — closed-form in SQL
    "q78_grouped_logit_predict" ->
      """WITH t AS (
        |  SELECT l_returnflag, l_quantity,
        |    CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS x_high,
        |    CASE WHEN l_discount >
        |           (CASE WHEN l_quantity > 25 THEN 0.05 ELSE 0.08 END)
        |         THEN 1.0 ELSE 0.0 END AS y
        |  FROM lineitem),
        |p AS (
        |  SELECT l_returnflag, x_high, avg(y) AS mu
        |  FROM t GROUP BY l_returnflag, x_high)
        |SELECT t.l_returnflag, count(*) AS n_high,
        |  CAST(sum(CAST(t.l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
        |FROM t JOIN p ON t.l_returnflag = p.l_returnflag
        |  AND t.x_high = p.x_high
        |WHERE p.mu > 0.3
        |GROUP BY t.l_returnflag
        |ORDER BY t.l_returnflag""".stripMargin,

    // q38's exact cosine-pair relation + q73's recursive-CTE closure:
    // survivors are rows that are their own component min (or unpaired)
    "q79_embed_dedup" ->
      """WITH RECURSIVE e0 AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM e0
        |  UNION ALL SELECT id_b, id_a FROM e0),
        |cc(id, label) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, c.label FROM cc c JOIN edges e ON c.id = e.src),
        |lab AS (SELECT id, min(label) AS label FROM cc GROUP BY id)
        |SELECT v.vec_id, CAST(v.label AS BIGINT) AS cls
        |FROM embeddings v LEFT JOIN lab ON lab.id = v.vec_id
        |WHERE lab.label IS NULL OR lab.label = v.vec_id
        |ORDER BY v.vec_id""".stripMargin,

    // every event contributes to the two 2h windows whose starts are its
    // truncated hour and the hour before
    "q80_sliding_window" ->
      """WITH offs AS (SELECT 0 AS o UNION ALL SELECT 1),
        |w AS (
        |  SELECT date_trunc('hour', ts) - o * INTERVAL 1 HOUR AS ws,
        |    event_type, value
        |  FROM events CROSS JOIN offs)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(*) AS n_events,
        |  round(sum(value), 4) AS sum_value
        |FROM w GROUP BY ws, event_type
        |ORDER BY window_start, event_type""".stripMargin,

    // simple-regression se.fit in closed form: sigma·sqrt(1/n + (x−x̄)²/Sxx)
    "q83_lm_sefit" ->
      """WITH m AS (
        |  SELECT count(*) AS n, avg(l_quantity) AS mx, avg(l_extendedprice) AS my,
        |    sum(l_quantity * l_quantity) AS xx,
        |    sum(l_quantity * l_extendedprice) AS xy,
        |    sum(l_extendedprice * l_extendedprice) AS yy
        |  FROM lineitem),
        |c AS (
        |  SELECT n, mx, my, xx - n * mx * mx AS sxx,
        |    xy - n * mx * my AS sxy, yy - n * my * my AS syy
        |  FROM m),
        |s AS (
        |  SELECT n, mx, sxx, sxy / sxx AS b1, my - (sxy / sxx) * mx AS b0,
        |    sqrt((syy - sxy * sxy / sxx) / (n - 2)) AS sigma
        |  FROM c)
        |SELECT l.l_returnflag,
        |  round(avg(s.sigma * sqrt(1.0 / s.n +
        |    (l.l_quantity - s.mx) * (l.l_quantity - s.mx) / s.sxx)), 6) AS avg_se,
        |  round(avg(s.b0 + s.b1 * l.l_quantity), 3) AS avg_pred,
        |  count(*) AS n_rows
        |FROM lineitem l CROSS JOIN s
        |GROUP BY l.l_returnflag
        |ORDER BY l.l_returnflag""".stripMargin,

    // gaussian + identity GLM: Pearson dispersion = RSS/(n−p) = σ̂², the
    // IRLS kernel (XᵀWX)⁻¹ = (XᵀX)⁻¹, so the delta-method link-scale
    // se.fit is EXACTLY predict.lm's — the same closed form as q83
    "q87_glm_sefit" ->
      """WITH m AS (
        |  SELECT count(*) AS n, avg(l_quantity) AS mx, avg(l_extendedprice) AS my,
        |    sum(l_quantity * l_quantity) AS xx,
        |    sum(l_quantity * l_extendedprice) AS xy,
        |    sum(l_extendedprice * l_extendedprice) AS yy
        |  FROM lineitem),
        |c AS (
        |  SELECT n, mx, my, xx - n * mx * mx AS sxx,
        |    xy - n * mx * my AS sxy, yy - n * my * my AS syy
        |  FROM m),
        |s AS (
        |  SELECT n, mx, sxx, sxy / sxx AS b1, my - (sxy / sxx) * mx AS b0,
        |    sqrt((syy - sxy * sxy / sxx) / (n - 2)) AS sigma
        |  FROM c)
        |SELECT l.l_returnflag,
        |  round(avg(s.sigma * sqrt(1.0 / s.n +
        |    (l.l_quantity - s.mx) * (l.l_quantity - s.mx) / s.sxx)), 6) AS avg_se,
        |  round(avg(s.b0 + s.b1 * l.l_quantity), 3) AS avg_pred,
        |  count(*) AS n_rows
        |FROM lineitem l CROSS JOIN s
        |GROUP BY l.l_returnflag
        |ORDER BY l.l_returnflag""".stripMargin,

    // the clustered copy must answer range queries identically to the
    // original table
    "q82_clustered_scan" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS min_ship
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q84_zorder_scan" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(min(l_extendedprice), 2) AS min_price
        |FROM lineitem
        |WHERE l_extendedprice >= 50000.0
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // saturated grouped poisson: the log-link MLE fitted means are the
    // per-(group, cell) averages of y
    "q81_grouped_poisson" ->
      """WITH t AS (
        |  SELECT l_returnflag,
        |    CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS xh,
        |    CAST(l_linenumber AS DOUBLE) AS y
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  round(avg(CASE WHEN xh = 0 THEN y END), 6) AS mu_low,
        |  round(avg(CASE WHEN xh = 1 THEN y END), 6) AS mu_high,
        |  count(*) AS n_rows
        |FROM t GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // intercept-only inverse-gaussian: μ̂ = ȳ, β0 = 1/ȳ², deviance/Pearson/
    // dispersion closed-form
    "q88_invgauss_fit" ->
      """WITH m AS (SELECT avg(l_quantity) AS yb, count(*) AS n FROM lineitem),
        |s AS (
        |  SELECT m.n AS n, m.yb AS yb,
        |    sum((l.l_quantity - m.yb) * (l.l_quantity - m.yb)
        |        / (m.yb * m.yb * l.l_quantity)) AS dev,
        |    sum((l.l_quantity - m.yb) * (l.l_quantity - m.yb)
        |        / (m.yb * m.yb * m.yb)) AS pea
        |  FROM lineitem l CROSS JOIN m
        |  GROUP BY m.n, m.yb)
        |SELECT round(1.0 / (yb * yb), 8) AS b_one,
        |  round(dev, 4) AS deviance,
        |  round(pea, 4) AS pearson,
        |  round(pea / (n - 1), 8) AS dispersion,
        |  n AS n_rows
        |FROM s""".stripMargin,

    // saturated quasipoisson: cell means are cell averages; the estimated
    // dispersion is the closed-form Pearson/(n−2)
    "q89_quasipoisson" ->
      """WITH c AS (
        |  SELECT CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS xh,
        |    CAST(l_linenumber AS DOUBLE) AS y
        |  FROM lineitem),
        |a AS (SELECT xh, avg(y) AS mu FROM c GROUP BY xh),
        |p AS (
        |  SELECT sum((c.y - a.mu) * (c.y - a.mu) / a.mu) AS pea,
        |    count(*) AS n
        |  FROM c JOIN a USING (xh))
        |SELECT round((SELECT mu FROM a WHERE xh = 0), 6) AS mu_low,
        |  round((SELECT mu FROM a WHERE xh = 1), 6) AS mu_high,
        |  round(p.pea / (p.n - 2), 8) AS dispersion,
        |  p.n AS n_rows
        |FROM p""".stripMargin,

    // intercept-only tweedie(1.5): μ̂ = ȳ, β0 = ln(ȳ); deviance/Pearson/
    // dispersion are pow() arithmetic both engines share
    "q92_tweedie_fit" ->
      """WITH m AS (SELECT avg(l_quantity) AS yb, count(*) AS n FROM lineitem),
        |s AS (
        |  SELECT m.n AS n, m.yb AS yb,
        |    sum((pow(l.l_quantity, 0.5) / ((1.0 - 1.5) * (2.0 - 1.5))
        |      - l.l_quantity * pow(m.yb, 1.0 - 1.5) / (1.0 - 1.5)
        |      + pow(m.yb, 2.0 - 1.5) / (2.0 - 1.5)) * 2.0) AS dev,
        |    sum((l.l_quantity - m.yb) * (l.l_quantity - m.yb)
        |        / pow(m.yb, 1.5)) AS pea
        |  FROM lineitem l CROSS JOIN m
        |  GROUP BY m.n, m.yb)
        |SELECT round(ln(yb), 8) AS b_one,
        |  round(dev, 4) AS deviance,
        |  round(pea, 4) AS pearson,
        |  round(pea / (n - 1), 8) AS dispersion,
        |  n AS n_rows
        |FROM s""".stripMargin,

    // saturated negbin(2): cell means are cell averages; the deviance at
    // those means is plain ln arithmetic
    "q93_negbin_fit" ->
      """WITH c AS (
        |  SELECT CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS xh,
        |    CAST(l_linenumber AS DOUBLE) AS y
        |  FROM lineitem),
        |a AS (SELECT xh, avg(y) AS mu FROM c GROUP BY xh),
        |d AS (
        |  SELECT sum(2.0 * (CASE WHEN c.y > 0 THEN c.y * ln(c.y / a.mu) ELSE 0.0 END
        |      - (c.y + 2.0) * ln((c.y + 2.0) / (a.mu + 2.0)))) AS dev,
        |    count(*) AS n
        |  FROM c JOIN a USING (xh))
        |SELECT round((SELECT mu FROM a WHERE xh = 0), 6) AS mu_low,
        |  round((SELECT mu FROM a WHERE xh = 1), 6) AS mu_high,
        |  round(d.dev, 4) AS deviance,
        |  d.n AS n_rows
        |FROM d""".stripMargin,

    // simple-regression influence closed forms: h = 1/n + (x−x̄)²/Sxx,
    // rstandard = e/(σ√(1−h)), rstudent uses the leave-one-out
    // σ²₍ᵢ₎ = ((n−2)σ² − e²/(1−h))/(n−3), Cook's D = rstandard²·h/(2(1−h))
    "q94_lm_diagnostics" ->
      """WITH m AS (
        |  SELECT count(*) AS n, avg(l_quantity) AS mx, avg(l_extendedprice) AS my,
        |    sum(l_quantity * l_quantity) AS xx,
        |    sum(l_quantity * l_extendedprice) AS xy,
        |    sum(l_extendedprice * l_extendedprice) AS yy
        |  FROM lineitem),
        |c AS (
        |  SELECT n, mx, my, xx - n * mx * mx AS sxx,
        |    xy - n * mx * my AS sxy, yy - n * my * my AS syy
        |  FROM m),
        |s AS (
        |  SELECT n, mx, sxx, sxy / sxx AS b1, my - (sxy / sxx) * mx AS b0,
        |    sqrt((syy - sxy * sxy / sxx) / (n - 2)) AS sigma
        |  FROM c),
        |r AS (
        |  SELECT l.l_returnflag, s.n AS n, s.sigma AS sigma,
        |    l.l_extendedprice - (s.b0 + s.b1 * l.l_quantity) AS e,
        |    1.0 / s.n + (l.l_quantity - s.mx) * (l.l_quantity - s.mx) / s.sxx AS h
        |  FROM lineitem l CROSS JOIN s)
        |SELECT l_returnflag,
        |  round(sum(h), 6) AS sum_hat,
        |  round(avg(abs(e / (sigma * sqrt(1.0 - h)))), 6) AS avg_abs_std,
        |  round(avg((e * e / (sigma * sigma * (1.0 - h))) / 2.0
        |    * h / (1.0 - h)), 8) AS avg_cooks,
        |  round(avg(e / sqrt(((n - 2) * sigma * sigma - e * e / (1.0 - h))
        |    / (n - 3) * (1.0 - h))), 8) AS avg_student,
        |  count(*) AS n_rows
        |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // penalized 2×2 normal equations by Cramer's rule: only the slope's
    // diagonal entry carries +λ (the intercept is unpenalized); SSE must use
    // the full quadratic (the OLS shortcut is invalid for a penalized β)
    "q95_ridge_fit" ->
      """WITH m AS (
        |  SELECT count(*) AS n, sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
        |    sum(l_quantity * l_quantity) AS xx,
        |    sum(l_quantity * l_extendedprice) AS xy,
        |    sum(l_extendedprice * l_extendedprice) AS yy
        |  FROM lineitem),
        |b AS (
        |  SELECT n, sx, sy, xx, xy, yy,
        |    ((xx + 5000000.0) * sy - sx * xy) / (n * (xx + 5000000.0) - sx * sx) AS b0,
        |    (n * xy - sx * sy) / (n * (xx + 5000000.0) - sx * sx) AS b1
        |  FROM m),
        |e AS (
        |  SELECT n, b0, b1,
        |    yy - 2.0 * (b0 * sy + b1 * xy)
        |      + (b0 * b0 * n + 2.0 * b0 * b1 * sx + b1 * b1 * xx) AS sse,
        |    yy - sy * sy / n AS tss
        |  FROM b)
        |SELECT round(b0, 6) AS b0, round(b1, 8) AS b1,
        |  round(sqrt(sse / (n - 2)), 4) AS sigma,
        |  round(1.0 - sse / tss, 8) AS r2,
        |  n AS n_rows
        |FROM e""".stripMargin,

    // intercept-only poisson: μ̂ = ȳ exactly, so pearson²/deviance²/working/
    // response residual aggregates are closed-form; the y = 0 unit deviance
    // is 2μ (same CASE convention as q44)
    "q96_glm_residuals" ->
      """WITH m AS (SELECT avg(CAST(l_linenumber AS DOUBLE)) AS mu FROM lineitem),
        |r AS (
        |  SELECT l.l_returnflag, CAST(l.l_linenumber AS DOUBLE) AS y, m.mu AS mu
        |  FROM lineitem l CROSS JOIN m)
        |SELECT l_returnflag,
        |  round(sum((y - mu) * (y - mu) / mu), 6) AS chi2,
        |  round(sum(CASE WHEN y > 0 THEN 2.0 * (y * ln(y / mu) - (y - mu))
        |    ELSE 2.0 * mu END), 6) AS dev2,
        |  round(avg((y - mu) / mu), 8) + 0.0 AS avg_working,
        |  round(avg(y - mu), 8) + 0.0 AS avg_response,
        |  count(*) AS n_rows
        |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // out-of-fold betas from COMPLEMENT Gram sums (total − fold), then the
    // held-out MSE — the same two-pass algebra the Spark side runs
    "q97_lm_cv" ->
      """WITH f AS (
        |  SELECT CASE WHEN d < '4' THEN 0 WHEN d < '8' THEN 1
        |              WHEN d < 'c' THEN 2 ELSE 3 END AS fold,
        |    l_quantity AS x, l_extendedprice AS y
        |  FROM (SELECT substr(md5(concat_ws('-', l_orderkey, l_linenumber)), 32, 1) AS d,
        |          l_quantity, l_extendedprice FROM lineitem)),
        |g AS (
        |  SELECT fold, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * x) AS xx, sum(x * y) AS xy
        |  FROM f GROUP BY fold),
        |tot AS (
        |  SELECT sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy,
        |    sum(xx) AS xx, sum(xy) AS xy
        |  FROM g),
        |b AS (
        |  SELECT g.fold, CAST(tot.n - g.n AS BIGINT) AS n_train,
        |    CAST(g.n AS BIGINT) AS n_test,
        |    ((tot.n - g.n) * (tot.xy - g.xy) - (tot.sx - g.sx) * (tot.sy - g.sy))
        |      / ((tot.n - g.n) * (tot.xx - g.xx) - (tot.sx - g.sx) * (tot.sx - g.sx)) AS b1,
        |    ((tot.sy - g.sy) - ((tot.n - g.n) * (tot.xy - g.xy) - (tot.sx - g.sx) * (tot.sy - g.sy))
        |      / ((tot.n - g.n) * (tot.xx - g.xx) - (tot.sx - g.sx) * (tot.sx - g.sx)) * (tot.sx - g.sx))
        |      / (tot.n - g.n) AS b0
        |  FROM g CROSS JOIN tot)
        |SELECT f.fold, b.n_train, b.n_test,
        |  round(avg((f.y - b.b0 - b.b1 * f.x) * (f.y - b.b0 - b.b1 * f.x)), 3) AS mse,
        |  round(sqrt(avg((f.y - b.b0 - b.b1 * f.x) * (f.y - b.b0 - b.b1 * f.x))), 4) AS rmse
        |FROM f JOIN b USING (fold)
        |GROUP BY f.fold, b.n_train, b.n_test
        |ORDER BY f.fold""".stripMargin,

    // single-predictor lasso closed form: centered moments, soft-threshold
    // at λ, intercept from the weighted means
    "q98_lasso_fit" ->
      """WITH m AS (
        |  SELECT count(*) AS n, sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
        |    sum(l_quantity * l_quantity) AS xx,
        |    sum(l_quantity * l_extendedprice) AS xy,
        |    sum(l_extendedprice * l_extendedprice) AS yy
        |  FROM lineitem),
        |c AS (
        |  SELECT n, sx / n AS mx, sy / n AS my,
        |    xx - sx * sx / n AS cxx, xy - sx * sy / n AS cxy,
        |    yy - sy * sy / n AS cyy
        |  FROM m),
        |b AS (
        |  SELECT n, mx, my, cxx, cxy, cyy,
        |    sign(cxy) * greatest(abs(cxy) / n - 50000.0, 0.0) / (cxx / n) AS b1
        |  FROM c)
        |SELECT round(my - b1 * mx, 6) AS b0, round(b1, 8) AS b1,
        |  round(1.0 - (cyy - 2.0 * b1 * cxy + b1 * b1 * cxx) / cyy, 8) AS r2,
        |  n AS n_rows
        |FROM b""".stripMargin,

    "q99_lasso_path" ->
      """WITH m AS (
        |  SELECT count(*) AS n, sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
        |    sum(l_quantity * l_quantity) AS xx,
        |    sum(l_quantity * l_extendedprice) AS xy
        |  FROM lineitem),
        |c AS (
        |  SELECT n, sx / n AS mx, sy / n AS my,
        |    xx - sx * sx / n AS cxx, xy - sx * sy / n AS cxy
        |  FROM m),
        |b AS (
        |  SELECT l.lambda, c.mx, c.my,
        |    sign(c.cxy) * greatest(abs(c.cxy) / c.n - l.lambda, 0.0)
        |      / (c.cxx / c.n) AS b1
        |  FROM c CROSS JOIN
        |    (VALUES (25000.0), (50000.0), (100000.0)) AS l(lambda))
        |SELECT lambda, round(my - b1 * mx, 6) AS b0, round(b1, 8) AS b1
        |FROM b ORDER BY lambda""".stripMargin,

    // q63's split CASE + q25's shingle list comprehension; containment =
    // per-train-doc fraction of distinct 5-grams present in the test set
    "q100_decontaminate" ->
      """WITH lab AS (
        |  SELECT doc_id,
        |    CASE WHEN substr(md5(text), 32, 1) < 'c' THEN 'train'
        |         WHEN substr(md5(text), 32, 1) < 'e' THEN 'val'
        |         ELSE 'test' END AS split,
        |    regexp_split_to_array(text, '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, split, list_distinct(list_transform(
        |    range(1, len(t) - 3), i -> array_to_string(list_slice(t, i, i + 4), ' '))) AS g
        |  FROM lab),
        |probe AS (SELECT DISTINCT unnest(g) AS s FROM sh WHERE split = 'test'),
        |corp AS (SELECT doc_id, len(g) AS n_g FROM sh WHERE split = 'train'),
        |cg AS (SELECT doc_id, unnest(g) AS s FROM sh WHERE split = 'train'),
        |hits AS (
        |  SELECT cg.doc_id, count(*) AS n_hit
        |  FROM cg JOIN probe ON cg.s = probe.s GROUP BY cg.doc_id),
        |per AS (
        |  SELECT corp.doc_id, corp.n_g, coalesce(hits.n_hit, 0) AS n_hit,
        |    CASE WHEN corp.n_g > 0
        |      THEN CAST(coalesce(hits.n_hit, 0) AS DOUBLE) / corp.n_g
        |      ELSE 0.0 END AS c
        |  FROM corp LEFT JOIN hits USING (doc_id))
        |SELECT count(*) AS n_train_docs,
        |  CAST(sum(CASE WHEN c >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_contam_50,
        |  CAST(sum(CASE WHEN c >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_contam_90,
        |  CAST(sum(n_hit) AS BIGINT) AS total_hits,
        |  round(avg(c), 6) AS avg_containment
        |FROM per""".stripMargin,

    // 2×2 covariance eigenvalues by the quadratic formula (sample
    // covariance, n−1 denominator)
    "q101_pca_2d" ->
      """WITH m AS (
        |  SELECT count(*) AS n, sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
        |    sum(l_quantity * l_quantity) AS xx,
        |    sum(l_quantity * l_extendedprice) AS xy,
        |    sum(l_extendedprice * l_extendedprice) AS yy
        |  FROM lineitem),
        |c AS (
        |  SELECT n, (xx - sx * sx / n) / (n - 1.0) AS a,
        |    (xy - sx * sy / n) / (n - 1.0) AS b,
        |    (yy - sy * sy / n) / (n - 1.0) AS d
        |  FROM m),
        |e AS (
        |  SELECT n,
        |    (a + d + sqrt((a - d) * (a - d) + 4.0 * b * b)) / 2.0 AS l1,
        |    (a + d - sqrt((a - d) * (a - d) + 4.0 * b * b)) / 2.0 AS l2
        |  FROM c)
        |SELECT round(l1, 2) AS ev1, round(l2, 3) AS ev2,
        |  round(l1 / (l1 + l2), 8) AS var_explained,
        |  n AS n_rows
        |FROM e""".stripMargin,

    // same zero-cell-free chi2 identity; e = ra*cb/n in doubles throughout
    "q102_contingency" ->
      """WITH obs AS (
        |  SELECT l_returnflag AS a, l_linestatus AS b, count(*) AS o
        |  FROM lineitem GROUP BY 1, 2),
        |ra AS (SELECT a, sum(o) AS ra FROM obs GROUP BY a),
        |cb AS (SELECT b, sum(o) AS cb FROM obs GROUP BY b),
        |tot AS (
        |  SELECT CAST(sum(o) AS DOUBLE) AS n, count(DISTINCT a) AS nr,
        |    count(DISTINCT b) AS nc
        |  FROM obs),
        |cells AS (
        |  SELECT CAST(o.o AS DOUBLE) AS o,
        |    CAST(ra.ra AS DOUBLE) * cb.cb / tot.n AS e,
        |    CAST(ra.ra AS DOUBLE) AS ra, CAST(cb.cb AS DOUBLE) AS cb,
        |    tot.n AS n, tot.nr AS nr, tot.nc AS nc
        |  FROM obs o JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot)
        |SELECT
        |  round(sum((o - e) * (o - e) / e - e) + min(n), 4) AS chi2,
        |  CAST((min(nr) - 1) * (min(nc) - 1) AS BIGINT) AS df,
        |  round(sqrt((sum((o - e) * (o - e) / e - e) + min(n))
        |    / (min(n) * least(min(nr) - 1, min(nc) - 1))), 8) AS cramers_v,
        |  round(sum((o / n) * ln(o * n / (ra * cb))), 8) AS mutual_info,
        |  CAST(min(n) AS BIGINT) AS n_rows
        |FROM cells""".stripMargin,

    // saturated grouped poisson: μ per (group, x_high) cell = cell mean;
    // residual aggregates are closed-form per group (q44's y = 0 CASE kept
    // for form though l_linenumber >= 1). `+ 0.0` normalizes DuckDB's
    // -0.0 (round of a tiny negative) to +0.0 — see the Spark-side note.
    "q103_grouped_residuals" ->
      """WITH c AS (
        |  SELECT l_returnflag,
        |    CASE WHEN l_quantity > 25 THEN 1.0 ELSE 0.0 END AS xh,
        |    CAST(l_linenumber AS DOUBLE) AS y
        |  FROM lineitem),
        |a AS (SELECT l_returnflag, xh, avg(y) AS mu FROM c GROUP BY 1, 2),
        |r AS (
        |  SELECT c.l_returnflag, c.y, a.mu
        |  FROM c JOIN a USING (l_returnflag, xh))
        |SELECT l_returnflag,
        |  round(sum((y - mu) * (y - mu) / mu), 6) AS chi2,
        |  round(sum(CASE WHEN y > 0 THEN 2.0 * (y * ln(y / mu) - (y - mu))
        |    ELSE 2.0 * mu END), 6) AS dev2,
        |  round(avg((y - mu) / mu), 8) + 0.0 AS avg_working,
        |  count(*) AS n_rows
        |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // between/within sum-of-squares decomposition from per-group
    // (n, Σx, Σx²) triples — identical arithmetic to the Spark op
    "q104_anova" ->
      """WITH g AS (
        |  SELECT l_returnflag, count(*) AS ng, sum(l_extendedprice) AS sg,
        |    sum(l_extendedprice * l_extendedprice) AS qg
        |  FROM lineitem GROUP BY l_returnflag),
        |t AS (
        |  SELECT CAST(sum(ng) AS BIGINT) AS nb, CAST(sum(ng) AS DOUBLE) AS n,
        |    count(*) AS k, sum(sg) AS s, sum(qg) AS q,
        |    sum(sg * sg / ng) AS sb
        |  FROM g),
        |d AS (
        |  SELECT q - s * s / n AS sst, sb - s * s / n AS ssb, n, nb, k
        |  FROM t)
        |SELECT round((ssb / (k - 1)) / ((sst - ssb) / (n - k)), 6) AS f_stat,
        |  CAST(k - 1 AS BIGINT) AS df_between,
        |  CAST(nb - k AS BIGINT) AS df_within,
        |  round(ssb / sst, 10) AS eta_sq,
        |  nb AS n_rows
        |FROM d""".stripMargin,

    // identical bin CASE, per-side proportions, eps floor, PSI sum
    "q105_psi_numeric" ->
      """WITH b AS (
        |  SELECT l_linestatus,
        |    CASE WHEN l_extendedprice IS NULL THEN -1
        |         WHEN l_extendedprice <= 10000.0 THEN 0
        |         WHEN l_extendedprice <= 25000.0 THEN 1
        |         WHEN l_extendedprice <= 50000.0 THEN 2
        |         ELSE 3 END AS bin
        |  FROM lineitem WHERE l_linestatus IN ('F', 'O')),
        |pr AS (
        |  SELECT bin, CAST(count(*) AS DOUBLE)
        |      / sum(count(*)) OVER () AS p
        |  FROM b WHERE l_linestatus = 'F' GROUP BY bin),
        |pc AS (
        |  SELECT bin, CAST(count(*) AS DOUBLE)
        |      / sum(count(*)) OVER () AS p
        |  FROM b WHERE l_linestatus = 'O' GROUP BY bin),
        |j AS (
        |  SELECT greatest(coalesce(pr.p, 0.0), 0.000001) AS a,
        |    greatest(coalesce(pc.p, 0.0), 0.000001) AS c
        |  FROM pr FULL OUTER JOIN pc USING (bin))
        |SELECT round(sum((a - c) * ln(a / c)), 8) AS psi,
        |  count(*) AS n_bins
        |FROM j""".stripMargin,

    "q106_psi_categorical" ->
      """WITH b AS (
        |  SELECT l_linestatus, coalesce(l_returnflag, '__null__') AS bin
        |  FROM lineitem WHERE l_linestatus IN ('F', 'O')),
        |pr AS (
        |  SELECT bin, CAST(count(*) AS DOUBLE)
        |      / sum(count(*)) OVER () AS p
        |  FROM b WHERE l_linestatus = 'F' GROUP BY bin),
        |pc AS (
        |  SELECT bin, CAST(count(*) AS DOUBLE)
        |      / sum(count(*)) OVER () AS p
        |  FROM b WHERE l_linestatus = 'O' GROUP BY bin),
        |j AS (
        |  SELECT greatest(coalesce(pr.p, 0.0), 0.000001) AS a,
        |    greatest(coalesce(pc.p, 0.0), 0.000001) AS c
        |  FROM pr FULL OUTER JOIN pc USING (bin))
        |SELECT round(sum((a - c) * ln(a / c)), 8) AS psi,
        |  count(*) AS n_bins
        |FROM j""".stripMargin,

    // per-group closed form: se_fit = σ_g·sqrt(1/n_g + (x−x̄_g)²/Sxx_g)
    "q91_grouped_glm_sefit" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    avg(l_quantity) AS mx, avg(l_extendedprice) AS my,
        |    sum(l_quantity * l_quantity) AS xx,
        |    sum(l_quantity * l_extendedprice) AS xy,
        |    sum(l_extendedprice * l_extendedprice) AS yy
        |  FROM lineitem GROUP BY l_returnflag),
        |c AS (
        |  SELECT l_returnflag, n, mx, my, xx - n * mx * mx AS sxx,
        |    xy - n * mx * my AS sxy, yy - n * my * my AS syy
        |  FROM m),
        |s AS (
        |  SELECT l_returnflag, n, mx, sxx, sxy / sxx AS b1,
        |    my - (sxy / sxx) * mx AS b0,
        |    sqrt((syy - sxy * sxy / sxx) / (n - 2)) AS sigma
        |  FROM c)
        |SELECT l.l_returnflag,
        |  round(avg(s.sigma * sqrt(1.0 / s.n +
        |    (l.l_quantity - s.mx) * (l.l_quantity - s.mx) / s.sxx)), 6) AS avg_se,
        |  round(avg(s.b0 + s.b1 * l.l_quantity), 3) AS avg_pred,
        |  count(*) AS n_rows
        |FROM lineitem l JOIN s USING (l_returnflag)
        |GROUP BY l.l_returnflag
        |ORDER BY l.l_returnflag""".stripMargin,

    "q90_grouped_sefit" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    avg(l_quantity) AS mx, avg(l_extendedprice) AS my,
        |    sum(l_quantity * l_quantity) AS xx,
        |    sum(l_quantity * l_extendedprice) AS xy,
        |    sum(l_extendedprice * l_extendedprice) AS yy
        |  FROM lineitem GROUP BY l_returnflag),
        |c AS (
        |  SELECT l_returnflag, n, mx, my, xx - n * mx * mx AS sxx,
        |    xy - n * mx * my AS sxy, yy - n * my * my AS syy
        |  FROM m),
        |s AS (
        |  SELECT l_returnflag, n, mx, sxx, sxy / sxx AS b1,
        |    my - (sxy / sxx) * mx AS b0,
        |    sqrt((syy - sxy * sxy / sxx) / (n - 2)) AS sigma
        |  FROM c)
        |SELECT l.l_returnflag,
        |  round(avg(s.sigma * sqrt(1.0 / s.n +
        |    (l.l_quantity - s.mx) * (l.l_quantity - s.mx) / s.sxx)), 6) AS avg_se,
        |  round(avg(s.b0 + s.b1 * l.l_quantity), 3) AS avg_pred,
        |  count(*) AS n_rows
        |FROM lineitem l JOIN s USING (l_returnflag)
        |GROUP BY l.l_returnflag
        |ORDER BY l.l_returnflag""".stripMargin,

    "q107_unpivot" ->
      """WITH w AS (
        |  SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
        |    round(sum(l_extendedprice), 2) AS sum_price,
        |    CAST(count(*) AS DOUBLE) AS n_items
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM w
        |UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM w
        |UNION ALL SELECT l_returnflag, 'n_items', n_items FROM w
        |ORDER BY l_returnflag, measure""".stripMargin,

    // identical bucket trunc, per-key dense grid via generate_series, LOCF
    // via last_value IGNORE NULLS over the same frame
    "q108_gapfill" ->
      """WITH a AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    count(*) AS n_events, round(avg(value), 6) AS value_avg
        |  FROM events WHERE event_type IN ('purchase', 'signup')
        |  GROUP BY 1, 2),
        |s AS (SELECT event_type, min(bucket) AS mn, max(bucket) AS mx
        |      FROM a GROUP BY 1),
        |g AS (SELECT event_type,
        |        unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
        |      FROM s),
        |j AS (SELECT g.event_type, g.bucket, a.n_events, a.value_avg
        |      FROM g LEFT JOIN a USING (event_type, bucket))
        |SELECT event_type, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS hour,
        |  coalesce(n_events, 0) AS n_events,
        |  CAST(n_events IS NULL AS INT) AS is_gap,
        |  round(last_value(value_avg IGNORE NULLS) OVER (
        |    PARTITION BY event_type ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value_fill
        |FROM j ORDER BY event_type, hour""".stripMargin,

    // same tokenization (split on \s+, drop empties), distinct via
    // list_distinct, bigrams via an indexed list comprehension
    "q109_repetition" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |b AS (SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS nd, t
        |      FROM d),
        |g AS (SELECT doc_id,
        |        unnest([t[i] || ' ' || t[i+1]
        |                for i in generate_series(1, len(t) - 1)]) AS gram
        |      FROM b WHERE len(t) >= 2),
        |c AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
        |tp AS (SELECT doc_id, max(c) AS topc FROM c GROUP BY 1)
        |SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
        |  round(1.0 - CAST(nd AS DOUBLE) / greatest(n_tokens, 1), 6) AS dup_token_frac,
        |  round(coalesce(CAST(tp.topc AS DOUBLE) / (b.n_tokens - 1), 0.0), 6) AS top_2gram_frac
        |FROM b LEFT JOIN tp USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q110_mixture_weights" ->
      """WITH a AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS DOUBLE) AS n_units
        |  FROM documents GROUP BY 1)
        |SELECT source, n_docs, round(n_units, 1) AS n_units,
        |  round(n_units / sum(n_units) OVER (), 8) AS natural_frac,
        |  round(pow(n_units, 0.5) / sum(pow(n_units, 0.5)) OVER (), 8) AS weight,
        |  round(1000000.0 * (pow(n_units, 0.5) / sum(pow(n_units, 0.5)) OVER ())
        |    / n_units, 6) AS epochs
        |FROM a ORDER BY source""".stripMargin,

    // salting is semantically transparent: the oracle is the plain join
    "q111_salted_join" ->
      """SELECT o_orderpriority,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // Bloom prefilter only removes non-matching rows: oracle is the plain join
    "q112_bloom_join" ->
      """SELECT p_brand, count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size >= 48
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    // min-chain funnel: t1 = min view, t2 = min click > t1, t3 = min
    // purchase > t2 — the greedy sorted-walk computes the same set of users
    // per step (first-match-in-order IS the earliest admissible match)
    "q113_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1),
        |c AS (SELECT (SELECT count(*) FROM s1) AS u1,
        |             (SELECT count(*) FROM s2) AS u2,
        |             (SELECT count(*) FROM s3) AS u3)
        |SELECT CAST(1 AS INT) AS step_no, 'view' AS step, u1 AS users,
        |  round(CAST(1.0 AS DOUBLE), 6) AS frac_first,
        |  round(CAST(1.0 AS DOUBLE), 6) AS frac_prev FROM c
        |UNION ALL
        |SELECT CAST(2 AS INT), 'click', u2,
        |  round(CAST(u2 AS DOUBLE) / u1, 6), round(CAST(u2 AS DOUBLE) / u1, 6)
        |FROM c
        |UNION ALL
        |SELECT CAST(3 AS INT), 'purchase', u3,
        |  round(CAST(u3 AS DOUBLE) / u1, 6), round(CAST(u3 AS DOUBLE) / u2, 6)
        |FROM c
        |ORDER BY step_no""".stripMargin,

    // same ISO-Monday week truncation; offsets are exact multiples of 7
    // days so the INT cast is lossless
    "q114_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events),
        |f AS (SELECT user_id, min(w) AS cohort FROM uw GROUP BY 1),
        |a AS (
        |  SELECT cohort, CAST(date_diff('day', cohort, w) / 7 AS INT) AS "offset",
        |    count(*) AS active_users
        |  FROM uw JOIN f USING (user_id) GROUP BY 1, 2),
        |c0 AS (SELECT cohort, active_users AS sz FROM a WHERE "offset" = 0)
        |SELECT strftime(a.cohort, '%Y-%m-%d') AS cohort_week, "offset",
        |  active_users, round(CAST(active_users AS DOUBLE) / sz, 6) AS retention
        |FROM a JOIN c0 USING (cohort)
        |ORDER BY cohort_week, "offset"""".stripMargin,

    // identical (ts, event_id) ordering for the lag; per-prev row
    // normalization over the tiny (prev, next) frame
    "q115_transitions" ->
      """WITH p AS (
        |  SELECT user_id, event_type AS next,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |t AS (SELECT prev, next, count(*) AS n FROM p
        |      WHERE prev IS NOT NULL GROUP BY 1, 2)
        |SELECT prev, next, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev), 6) AS prob
        |FROM t ORDER BY prev, next""".stripMargin,

    // the merge result computed directly: updates as CASE arithmetic,
    // deletes as an anti-join — latest-wins semantics without the union
    "q116_cdc_upsert" ->
      """WITH merged AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100
        |         ELSE o_totalprice END AS p
        |  FROM orders
        |  WHERE NOT (o_orderkey % 17 = 0 AND o_orderkey % 10 != 0))
        |SELECT o_orderstatus, count(*) AS n_orders,
        |  round(sum(p), 2) AS total
        |FROM merged GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q117_scd2" ->
      """SELECT user_id, event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
        |    '%Y-%m-%d %H:%M:%S') AS valid_to,
        |  CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    AS INT) AS is_current
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    // identical md5-of-decimal-string rank ordering on both engines
    "q118_cap_per_key" ->
      """WITH ranked AS (
        |  SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM ranked WHERE rn <= 50 GROUP BY source
        |ORDER BY source""".stripMargin,

    // byte-identical SQL text on both engines
    "q119_sql_frontend" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // same first-token blocking, same edit-distance definition, same
    // deterministic quarter subset
    "q120_fuzzy_pairs" ->
      """WITH b AS (
        |  SELECT p_partkey, p_name, split_part(p_name, ' ', 1) AS blk
        |  FROM part WHERE p_partkey % 4 = 0),
        |pr AS (
        |  SELECT a.p_partkey AS ka, levenshtein(a.p_name, c.p_name) AS dist
        |  FROM b a JOIN b c ON a.blk = c.blk AND a.p_partkey < c.p_partkey
        |  WHERE levenshtein(a.p_name, c.p_name) <= 3)
        |SELECT CAST(dist AS INT) AS dist, count(*) AS n_pairs,
        |  count(DISTINCT ka) AS n_left
        |FROM pr GROUP BY dist ORDER BY dist""".stripMargin,

    // the min-chain timestamps ARE the walk's step timestamps; average the
    // exact microsecond gaps and divide once
    "q121_funnel_latency" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
        |SELECT 'view' AS from_step, 'click' AS to_step, CAST(1 AS INT) AS step_no,
        |  count(*) AS n_users,
        |  round(CAST(sum(epoch_us(t2) - epoch_us(t1)) AS DOUBLE)
        |    / count(*) / 1e6, 6) AS avg_secs
        |FROM s2 JOIN s1 USING (user_id)
        |UNION ALL
        |SELECT 'click', 'purchase', CAST(2 AS INT), count(*),
        |  round(CAST(sum(epoch_us(t3) - epoch_us(t2)) AS DOUBLE)
        |    / count(*) / 1e6, 6)
        |FROM s3 JOIN s2 USING (user_id)
        |ORDER BY step_no""".stripMargin,

    // three unrolled PageRank rounds; every scalar op is double-typed in
    // the same order as the Spark expressions
    "q122_pagerank" ->
      """WITH pe AS (
        |  SELECT DISTINCT 'p' || l_partkey AS u, 's' || l_suppkey AS v
        |  FROM lineitem),
        |e AS (SELECT u, v FROM pe UNION ALL SELECT v AS u, u AS v FROM pe),
        |deg AS (SELECT u, count(*) AS d FROM e GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
        |r0 AS (SELECT u, CAST(1.0 AS DOUBLE) / n AS r FROM deg, nn),
        |r1 AS (
        |  SELECT e.v AS u,
        |    (CAST(1.0 AS DOUBLE) - 0.85) / any_value(nn.n)
        |      + 0.85 * sum(r0.r / deg.d) AS r
        |  FROM e JOIN r0 USING (u) JOIN deg USING (u), nn GROUP BY e.v),
        |r2 AS (
        |  SELECT e.v AS u,
        |    (CAST(1.0 AS DOUBLE) - 0.85) / any_value(nn.n)
        |      + 0.85 * sum(r1.r / deg.d) AS r
        |  FROM e JOIN r1 USING (u) JOIN deg USING (u), nn GROUP BY e.v),
        |r3 AS (
        |  SELECT e.v AS u,
        |    (CAST(1.0 AS DOUBLE) - 0.85) / any_value(nn.n)
        |      + 0.85 * sum(r2.r / deg.d) AS r
        |  FROM e JOIN r2 USING (u) JOIN deg USING (u), nn GROUP BY e.v)
        |SELECT u AS node, round(r * 1000, 6) AS rank_k
        |FROM r3 WHERE u LIKE 's%'
        |ORDER BY node""".stripMargin,

    // identical integral-cents window sum on epoch-microsecond range bounds
    "q123_moving_avg" ->
      """SELECT event_id,
        |  count(*) OVER w AS win_n,
        |  round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w AS DOUBLE)
        |    / 100.0 / count(*) OVER w, 6) AS win_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    // same interpolated medians, same double-typed threshold arithmetic in
    // the same order
    "q124_mad_outliers" ->
      """WITH med AS (
        |  SELECT l_returnflag, median(l_extendedprice) AS m
        |  FROM lineitem GROUP BY 1),
        |d AS (
        |  SELECT l.l_returnflag, abs(l.l_extendedprice - med.m) AS adev
        |  FROM lineitem l JOIN med USING (l_returnflag)),
        |md AS (
        |  SELECT l_returnflag, median(adev) AS mad FROM d GROUP BY 1)
        |SELECT d.l_returnflag, count(*) AS n,
        |  round(any_value(med.m), 3) AS median,
        |  round(any_value(md.mad), 3) AS mad,
        |  CAST(sum(CASE
        |    WHEN (md.mad > 0 AND d.adev > CAST(3.0 AS DOUBLE) * 1.4826 * md.mad)
        |      OR (md.mad = 0 AND d.adev > 0) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM d JOIN md USING (l_returnflag) JOIN med USING (l_returnflag)
        |GROUP BY d.l_returnflag
        |ORDER BY d.l_returnflag""".stripMargin,

    "q125_profile" ->
      """SELECT 'lang' AS "column", count(*) AS n_rows,
        |  count(*) - count(lang) AS n_nulls, count(DISTINCT lang) AS n_distinct
        |FROM documents
        |UNION ALL
        |SELECT 'n_chars', count(*), count(*) - count(n_chars),
        |  count(DISTINCT n_chars) FROM documents
        |UNION ALL
        |SELECT 'source', count(*), count(*) - count(source),
        |  count(DISTINCT source) FROM documents
        |ORDER BY "column"""".stripMargin,

    // identical duration arithmetic (exact-microsecond quotient) and the
    // same ordered ln-cumsum product
    "q126_kaplan_meier" ->
      """WITH per AS (
        |  SELECT user_id, min(ts) AS t0,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
        |    max(ts) AS tl
        |  FROM events GROUP BY 1),
        |dur AS (
        |  SELECT CAST(epoch_us(coalesce(tp, tl)) - epoch_us(t0) AS DOUBLE)
        |      / 3600000000.0 AS dur,
        |    CAST(tp IS NOT NULL AS INT) AS ev
        |  FROM per),
        |agg AS (
        |  SELECT dur AS t, CAST(sum(ev) AS BIGINT) AS d,
        |    CAST(sum(1 - ev) AS BIGINT) AS c
        |  FROM dur GROUP BY 1),
        |km AS (
        |  SELECT t, d, c,
        |    sum(d + c) OVER ()
        |      - coalesce(sum(d + c) OVER (ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
        |  FROM agg)
        |SELECT round(t, 6) AS t, CAST(n_risk AS BIGINT) AS n_risk, d, c,
        |  round(CASE WHEN max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
        |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) = 1 THEN 0.0
        |    ELSE exp(sum(CASE WHEN d < n_risk
        |      THEN ln(1 - CAST(d AS DOUBLE) / n_risk) ELSE 0.0 END)
        |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)) END, 6) AS survival
        |FROM km ORDER BY t""".stripMargin,

    // same doubled-numerator rank identity over per-score counts
    "q127_auc" ->
      """WITH d AS (
        |  SELECT l_discount AS s, CAST(l_quantity > 25 AS INT) AS y
        |  FROM lineitem),
        |bs AS (
        |  SELECT s, CAST(sum(y) AS BIGINT) AS p,
        |    CAST(sum(1 - y) AS BIGINT) AS n
        |  FROM d GROUP BY 1),
        |c AS (
        |  SELECT p, n, coalesce(sum(n) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
        |  FROM bs)
        |SELECT round(CAST(sum(p * (2 * nb + n)) AS DOUBLE)
        |    / (2.0 * sum(p) * sum(n)), 6) AS auc,
        |  CAST(sum(p) AS BIGINT) AS n_pos, CAST(sum(n) AS BIGINT) AS n_neg
        |FROM c""".stripMargin,

    // same fixed-width binning arithmetic with the same clamps
    "q128_calibration" ->
      """WITH d AS (
        |  SELECT l_discount * 10.0 AS s, CAST(l_quantity > 25 AS INT) AS y
        |  FROM lineitem)
        |SELECT least(greatest(CAST(floor((s - 0.0) / 0.2) AS INT), 0), 4) AS bin,
        |  count(*) AS n,
        |  round(sum(s) / count(*), 6) AS mean_score,
        |  round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS frac_pos
        |FROM d GROUP BY 1 ORDER BY bin""".stripMargin,

    // identical risk-set windows and term-by-term double arithmetic
    "q129_logrank" ->
      """WITH per AS (
        |  SELECT user_id, min(ts) AS t0,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
        |    max(ts) AS tl
        |  FROM events GROUP BY 1),
        |g AS (
        |  SELECT CAST(epoch_us(coalesce(tp, tl)) - epoch_us(t0) AS DOUBLE)
        |      / 3600000000.0 AS t,
        |    CAST(tp IS NOT NULL AS INT) AS ev,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS g1
        |  FROM per),
        |agg AS (
        |  SELECT t, CAST(sum(ev) AS BIGINT) AS d,
        |    CAST(sum(ev * g1) AS BIGINT) AS d1,
        |    count(*) AS tot, CAST(sum(g1) AS BIGINT) AS tot1
        |  FROM g GROUP BY 1),
        |risk AS (
        |  SELECT t, d, d1,
        |    sum(tot) OVER () - coalesce(sum(tot) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n,
        |    sum(tot1) OVER () - coalesce(sum(tot1) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1
        |  FROM agg),
        |terms AS (
        |  SELECT d1, d * (CAST(n1 AS DOUBLE) / n) AS e1,
        |    CASE WHEN n > 1 THEN
        |      d * (CAST(n1 AS DOUBLE) / n) * (1.0 - CAST(n1 AS DOUBLE) / n)
        |        * CAST(n - d AS DOUBLE) / (n - 1)
        |    ELSE 0.0 END AS v
        |  FROM risk)
        |SELECT round(sum(d1 - e1) * sum(d1 - e1) / sum(v), 6) AS chi2,
        |  CAST(sum(d1) AS BIGINT) AS obs1, round(sum(e1), 6) AS exp1
        |FROM terms""".stripMargin,

    // identical conditional-sum moments and Welch–Satterthwaite arithmetic
    "q130_welch_t" ->
      """WITH m AS (
        |  SELECT
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END) AS sa,
        |    sum(CASE WHEN l_returnflag = 'R'
        |      THEN l_extendedprice * l_extendedprice ELSE 0.0 END) AS qa,
        |    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        |    sum(CASE WHEN l_returnflag = 'A' THEN l_extendedprice ELSE 0.0 END) AS sb,
        |    sum(CASE WHEN l_returnflag = 'A'
        |      THEN l_extendedprice * l_extendedprice ELSE 0.0 END) AS qb
        |  FROM lineitem WHERE l_returnflag IN ('R', 'A')),
        |v AS (
        |  SELECT sa / na AS ma, sb / nb AS mb,
        |    (qa - sa * sa / na) / (na - 1) / na AS va,
        |    (qb - sb * sb / nb) / (nb - 1) / nb AS vb,
        |    na, nb
        |  FROM m)
        |SELECT round(ma, 4) AS mean_a, round(mb, 4) AS mean_b,
        |  round((ma - mb) / sqrt(va + vb), 6) AS t_stat,
        |  round(pow(va + vb, 2) /
        |    (pow(va, 2) / (na - 1) + pow(vb, 2) / (nb - 1)), 4) AS df_welch,
        |  na AS n_a, nb AS n_b
        |FROM v""".stripMargin,

    // identical pooled-proportion arithmetic
    "q131_two_prop_z" ->
      """WITH m AS (
        |  SELECT
        |    CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    sum(CASE WHEN l_linestatus = 'O'
        |      THEN CAST(l_quantity > 25 AS DOUBLE) ELSE 0.0 END) AS xa,
        |    CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        |    sum(CASE WHEN l_linestatus = 'F'
        |      THEN CAST(l_quantity > 25 AS DOUBLE) ELSE 0.0 END) AS xb
        |  FROM lineitem WHERE l_linestatus IN ('O', 'F')),
        |v AS (
        |  SELECT xa / na AS pa, xb / nb AS pb,
        |    (xa + xb) / (na + nb) AS p, na, nb FROM m)
        |SELECT round(pa, 6) AS p_a, round(pb, 6) AS p_b,
        |  round((pa - pb) / sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb)), 6)
        |    AS z_stat,
        |  na AS n_a, nb AS n_b
        |FROM v""".stripMargin,

    // same integral ECDF-difference maximum over the distinct-value frame
    "q132_ks_test" ->
      """WITH d AS (
        |  SELECT l_extendedprice AS v,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM lineitem WHERE l_returnflag IN ('R', 'A') GROUP BY 1),
        |c AS (
        |  SELECT sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fa,
        |    sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fb,
        |    sum(ca) OVER () AS na, sum(cb) OVER () AS nb
        |  FROM d)
        |SELECT round(CAST(max(abs(fa * nb - fb * na)) AS DOUBLE)
        |    / (max(na) * max(nb)), 6) AS d_stat,
        |  CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b
        |FROM c""".stripMargin,

    // identical distinct-value average ranks + Pearson sums identity
    "q133_spearman" ->
      """WITH d AS (
        |  SELECT CAST(l_quantity AS DOUBLE) AS xv,
        |    CAST(l_extendedprice AS DOUBLE) AS yv
        |  FROM lineitem),
        |bx AS (SELECT xv AS v, count(*) AS cnt FROM d GROUP BY 1),
        |rxm AS (
        |  SELECT v, coalesce(sum(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + (cnt + 1) / 2.0 AS rx
        |  FROM bx),
        |by_ AS (SELECT yv AS v, count(*) AS cnt FROM d GROUP BY 1),
        |rym AS (
        |  SELECT v, coalesce(sum(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + (cnt + 1) / 2.0 AS ry
        |  FROM by_),
        |rr AS (
        |  SELECT rx, ry FROM d
        |  JOIN rxm ON d.xv = rxm.v
        |  JOIN rym ON d.yv = rym.v),
        |s AS (
        |  SELECT count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
        |    sum(rx * rx) AS qx, sum(ry * ry) AS qy, sum(rx * ry) AS sxy
        |  FROM rr)
        |SELECT round((n * sxy - sx * sy) /
        |    sqrt((n * qx - sx * sx) * (n * qy - sy * sy)), 6) AS rho,
        |  CAST(n AS BIGINT) AS n
        |FROM s""".stripMargin,

    // identical sums-identity arithmetic off one moments row per pair
    "q134_corr_matrix" ->
      """WITH m AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    sum(l_quantity) AS s1, sum(l_quantity * l_quantity) AS q1,
        |    sum(l_extendedprice) AS s2,
        |    sum(l_extendedprice * l_extendedprice) AS q2,
        |    sum(l_discount) AS s3, sum(l_discount * l_discount) AS q3,
        |    sum(l_tax) AS s4, sum(l_tax * l_tax) AS q4,
        |    sum(l_quantity * l_extendedprice) AS p12,
        |    sum(l_quantity * l_discount) AS p13,
        |    sum(l_quantity * l_tax) AS p14,
        |    sum(l_extendedprice * l_discount) AS p23,
        |    sum(l_extendedprice * l_tax) AS p24,
        |    sum(l_discount * l_tax) AS p34
        |  FROM lineitem)
        |SELECT col_a, col_b, round(c, 6) AS corr FROM (
        |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
        |    (n * p12 - s1 * s2) / sqrt((n * q1 - s1 * s1) * (n * q2 - s2 * s2)) AS c FROM m
        |  UNION ALL SELECT 'l_quantity', 'l_discount',
        |    (n * p13 - s1 * s3) / sqrt((n * q1 - s1 * s1) * (n * q3 - s3 * s3)) FROM m
        |  UNION ALL SELECT 'l_quantity', 'l_tax',
        |    (n * p14 - s1 * s4) / sqrt((n * q1 - s1 * s1) * (n * q4 - s4 * s4)) FROM m
        |  UNION ALL SELECT 'l_extendedprice', 'l_discount',
        |    (n * p23 - s2 * s3) / sqrt((n * q2 - s2 * s2) * (n * q3 - s3 * s3)) FROM m
        |  UNION ALL SELECT 'l_extendedprice', 'l_tax',
        |    (n * p24 - s2 * s4) / sqrt((n * q2 - s2 * s2) * (n * q4 - s4 * s4)) FROM m
        |  UNION ALL SELECT 'l_discount', 'l_tax',
        |    (n * p34 - s3 * s4) / sqrt((n * q3 - s3 * s3) * (n * q4 - s4 * s4)) FROM m)
        |ORDER BY col_a, col_b""".stripMargin,

    // identical moments + lag-product arithmetic over the daily series
    "q135_acf" ->
      """WITH s AS (
        |  SELECT o_orderdate AS d, sum(o_totalprice) AS v
        |  FROM orders GROUP BY 1),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, sum(v) / count(*) AS mean,
        |    sum(v * v) - sum(v) * sum(v) / count(*) AS ss
        |  FROM s),
        |l AS (
        |  SELECT v - m.mean AS dx,
        |    lag(v - m.mean, 1) OVER (ORDER BY d) AS dx1,
        |    lag(v - m.mean, 2) OVER (ORDER BY d) AS dx2,
        |    lag(v - m.mean, 3) OVER (ORDER BY d) AS dx3
        |  FROM s CROSS JOIN m)
        |SELECT lag, round(num / max(ss), 6) AS r, max(n) AS n FROM (
        |  SELECT 1 AS lag, sum(dx * dx1) AS num FROM l
        |  UNION ALL SELECT 2, sum(dx * dx2) FROM l
        |  UNION ALL SELECT 3, sum(dx * dx3) FROM l)
        |CROSS JOIN m
        |GROUP BY lag, num ORDER BY lag""".stripMargin,

    // identical out-of-fold complement arithmetic over (flag, fold) sums
    "q136_target_encode" ->
      """WITH f AS (
        |  SELECT l_returnflag AS cat, l_extendedprice AS y,
        |    CASE WHEN d < '4' THEN 0 WHEN d < '8' THEN 1
        |         WHEN d < 'c' THEN 2 ELSE 3 END AS fold
        |  FROM (SELECT l_returnflag, l_extendedprice,
        |          substr(md5(concat_ws('-', l_orderkey, l_linenumber)), 32, 1) AS d
        |        FROM lineitem)),
        |cf AS (
        |  SELECT cat, fold, CAST(count(*) AS BIGINT) AS n_cf, sum(y) AS s_cf
        |  FROM f GROUP BY 1, 2),
        |e AS (
        |  SELECT cat, fold, n_cf,
        |    sum(n_cf) OVER (PARTITION BY cat) AS n_cat,
        |    sum(s_cf) OVER (PARTITION BY cat) AS s_cat,
        |    s_cf
        |  FROM cf)
        |SELECT cat AS l_returnflag, fold, n_cf AS n,
        |  round((s_cat - s_cf) / (n_cat - n_cf), 4) AS te
        |FROM e ORDER BY l_returnflag, fold""".stripMargin,

    // identical typed melt + md5 register table (p=9: the q333/q334
    // constants — mask 511, shift 9, scale 52) + per-column readout;
    // n_distinct = floor(6-digit estimate + 0.5) on both engines
    "q137_profile_approx" ->
      """WITH m AS (
        |  SELECT 'lang' AS c, CAST(lang AS VARCHAR) AS v FROM documents
        |  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR)
        |    FROM documents
        |  UNION ALL SELECT 'source', CAST(source AS VARCHAR)
        |    FROM documents),
        |h AS (SELECT c, v,
        |    CASE WHEN v IS NULL THEN NULL
        |      ELSE ('0x' || substr(md5(v), 1, 15))::BIGINT END AS h
        |  FROM m),
        |l1 AS (SELECT c,
        |    CASE WHEN v IS NULL THEN -1 ELSE h & 511 END AS bucket,
        |    count(*) AS cnt,
        |    max(CASE WHEN v IS NULL THEN NULL
        |      WHEN (h >> 9) = 0 THEN 52
        |      ELSE 52 - length(bin(h >> 9)) END) AS r
        |  FROM h GROUP BY 1, 2),
        |a AS (SELECT c, sum(cnt) AS n_rows,
        |    sum(CASE WHEN bucket = -1 THEN cnt ELSE 0 END) AS n_nulls,
        |    sum(CASE WHEN bucket >= 0 THEN 1 ELSE 0 END) AS occ,
        |    coalesce(sum(CASE WHEN bucket >= 0
        |      THEN (1::BIGINT << CAST(52 - r AS INT)) END), 0) AS s_occ
        |  FROM l1 GROUP BY 1),
        |sc AS (SELECT c, n_rows, n_nulls,
        |    CAST(512 - occ AS BIGINT) AS v_zero,
        |    CAST(s_occ + (512 - occ) * (1::BIGINT << 52) AS BIGINT)
        |      AS s_scaled
        |  FROM a)
        |SELECT c AS "column", CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_nulls AS BIGINT) AS n_nulls,
        |  CAST(floor(round(CASE WHEN 0.7213 / (1.0 + 1.079 / 512.0)
        |        * 512.0 * 512.0 * 4503599627370496.0
        |        / CAST(s_scaled AS DOUBLE) <= 2.5 * 512.0 AND v_zero > 0
        |      THEN 512.0 * ln(512.0 / CAST(v_zero AS DOUBLE))
        |      ELSE 0.7213 / (1.0 + 1.079 / 512.0) * 512.0 * 512.0
        |        * 4503599627370496.0 / CAST(s_scaled AS DOUBLE) END, 6)
        |    + 0.5) AS BIGINT) AS n_distinct
        |FROM sc ORDER BY "column"""".stripMargin,

    // concat-then-chunk packing: exclusive running char sum in doc_id
    // order; chunk/pos/n_chunks are integer arithmetic on it
    "q139_seq_packing" ->
      """WITH c AS (
        |  SELECT doc_id, n_chars,
        |    CAST(sum(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |      - n_chars AS BIGINT) AS so
        |  FROM documents)
        |SELECT doc_id, so AS start_offset,
        |  CAST(floor(so / 4096.0) AS BIGINT) AS chunk,
        |  CAST(so % 4096 AS BIGINT) AS pos,
        |  CAST(ceil((so % 4096 + n_chars) / 4096.0) AS BIGINT) AS n_chunks
        |FROM c ORDER BY doc_id""".stripMargin,

    // κ = (po − pe)/(1 − pe) from the contingency margins
    "q140_kappa" ->
      """WITH t AS (
        |  SELECT l_returnflag AS a,
        |    CASE WHEN l_linestatus = 'O' THEN 'N'
        |         WHEN l_quantity > 25 THEN 'A' ELSE 'R' END AS b
        |  FROM lineitem),
        |o AS (SELECT a, b, count(*) AS c FROM t GROUP BY 1, 2),
        |ra AS (SELECT a, sum(c) AS r FROM o GROUP BY a),
        |cb AS (SELECT b, sum(c) AS s FROM o GROUP BY b),
        |m AS (
        |  SELECT
        |    (SELECT CAST(sum(c) AS DOUBLE) FROM o) AS n,
        |    (SELECT CAST(sum(c) AS DOUBLE) FROM o WHERE a = b) AS oa,
        |    (SELECT CAST(sum(ra.r * cb.s) AS DOUBLE)
        |     FROM ra JOIN cb ON ra.a = cb.b) AS rc)
        |SELECT round(((oa / n) - rc / (n * n)) / (1 - rc / (n * n)), 8) AS kappa,
        |  round(oa / n, 8) AS p_observed,
        |  round(rc / (n * n), 8) AS p_expected,
        |  CAST(n AS BIGINT) AS n_rows
        |FROM m""".stripMargin,

    // cume_dist IS the ECDF (count of rows ≤ v over n, ties share a value)
    "q141_ecdf_normalize" ->
      """WITH e AS (
        |  SELECT l_returnflag,
        |    cume_dist() OVER (ORDER BY l_extendedprice) AS ec
        |  FROM lineitem)
        |SELECT l_returnflag, round(avg(ec), 8) AS avg_ecdf,
        |  count(*) AS n_rows
        |FROM e GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // H = ln n − (Σ c ln c)/n over the level frame
    "q142_entropy" ->
      """WITH l AS (
        |  SELECT concat_ws('|', l_returnflag, l_linestatus) AS p,
        |    count(*) AS c
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(sum(c) AS DOUBLE) AS n, count(*) AS k,
        |        sum(c * ln(c)) AS clnc FROM l)
        |SELECT round(ln(n) - clnc / n, 8) AS entropy,
        |  CAST(k AS BIGINT) AS n_levels, CAST(n AS BIGINT) AS n_rows
        |FROM t""".stripMargin,

    // JSD = ½ Σ p ln(p/m) + ½ Σ q ln(q/m), m = (p+q)/2, 0·ln0 = 0
    "q143_jsd" ->
      """WITH pr AS (
        |  SELECT l_returnflag AS b, CAST(count(*) AS DOUBLE)
        |    / (SELECT count(*) FROM lineitem WHERE l_linestatus = 'F') AS p
        |  FROM lineitem WHERE l_linestatus = 'F' GROUP BY 1),
        |qr AS (
        |  SELECT l_returnflag AS b, CAST(count(*) AS DOUBLE)
        |    / (SELECT count(*) FROM lineitem WHERE l_linestatus = 'O') AS q
        |  FROM lineitem WHERE l_linestatus = 'O' GROUP BY 1),
        |j AS (
        |  SELECT coalesce(pr.p, 0.0) AS p, coalesce(qr.q, 0.0) AS q
        |  FROM pr FULL OUTER JOIN qr ON pr.b = qr.b)
        |SELECT round((sum(CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2))
        |                       ELSE 0.0 END)
        |            + sum(CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2))
        |                       ELSE 0.0 END)) / 2, 8) AS jsd,
        |  count(*) AS n_bins
        |FROM j""".stripMargin,

    // Lorenz trapezoid on the distinct-value frame:
    // G = 1 − Σ c·(2·S≤ − s) / (n·S)
    "q144_gini" ->
      """WITH b AS (
        |  SELECT CAST(n_chars AS DOUBLE) AS v, count(*) AS c,
        |    sum(CAST(n_chars AS DOUBLE)) AS s
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |w AS (
        |  SELECT v, c, s,
        |    sum(s) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS sc
        |  FROM b),
        |t AS (SELECT CAST(sum(c) AS DOUBLE) AS n, sum(s) AS st FROM b)
        |SELECT round(1.0 - sum(c * (2 * sc - s)) / (min(t.n) * min(t.st)), 8)
        |    AS gini,
        |  CAST(min(t.n) AS BIGINT) AS n_rows
        |FROM w CROSS JOIN t""".stripMargin,

    // keep while mass strictly before (desc by chars, doc_id tiebreak) is
    // under half the language's total — integral sums, exact comparison
    "q145_top_p_mass" ->
      """WITH w AS (
        |  SELECT lang, doc_id, n_chars,
        |    coalesce(sum(CAST(n_chars AS DOUBLE)) OVER (
        |      PARTITION BY lang ORDER BY n_chars DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS bef,
        |    sum(CAST(n_chars AS DOUBLE)) OVER (PARTITION BY lang) AS tot
        |  FROM documents)
        |SELECT lang, count(*) AS n_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_kept
        |FROM w WHERE bef < 0.5 * tot
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // population moments once, per-row scaling, per-flag means
    "q146_feature_scale" ->
      """WITH m AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n, sum(l_quantity) AS s,
        |    sum(l_quantity * l_quantity) AS q,
        |    min(l_quantity) AS lo, max(l_quantity) AS hi
        |  FROM lineitem),
        |st AS (
        |  SELECT s / n AS mean,
        |    sqrt(greatest(q / n - (s / n) * (s / n), 0.0)) AS sd, lo, hi
        |  FROM m),
        |z AS (
        |  SELECT l.l_returnflag,
        |    CASE WHEN st.sd > 0 THEN (l.l_quantity - st.mean) / st.sd
        |         ELSE 0.0 END AS z,
        |    CASE WHEN st.hi > st.lo
        |         THEN (l.l_quantity - st.lo) / (st.hi - st.lo)
        |         ELSE 0.0 END AS scaled
        |  FROM lineitem l CROSS JOIN st)
        |SELECT l_returnflag, round(avg(z), 8) AS avg_z,
        |  round(avg(scaled), 8) AS avg_scaled, count(*) AS n_rows
        |FROM z GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // identical ES-key arithmetic: u = (md5-60-bit + ½)/16¹⁵, key −ln(u)/w
    "q147_weighted_sample" ->
      """WITH k AS (
        |  SELECT doc_id, n_chars,
        |    -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |          ::BIGINT::DOUBLE + 0.5) / power(16, 15))
        |      / CAST(n_chars AS DOUBLE) AS es
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        |s AS (SELECT doc_id, n_chars FROM k ORDER BY es, doc_id LIMIT 25)
        |SELECT doc_id, n_chars FROM s ORDER BY doc_id""".stripMargin,

    // same tokenization as q109 (split on \s+, drop empties); top-20 with
    // the (cnt desc, token asc) total order
    "q148_vocab_topk" ->
      """WITH d AS (
        |  SELECT list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '') AS t
        |  FROM documents),
        |tok AS (SELECT unnest(t) AS token FROM d)
        |SELECT token, count(*) AS cnt FROM tok
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin,

    // q18's centered normal equations (the huge-delta Huber fixed point
    // IS the OLS solution)
    "q149_huber_ols" ->
      """WITH m AS (
        |  SELECT avg(l_quantity) AS mx1, avg(l_discount) AS mx2,
        |    avg(l_extendedprice) AS my,
        |    avg(l_quantity * l_quantity) AS x11,
        |    avg(l_quantity * l_discount) AS x12,
        |    avg(l_discount * l_discount) AS x22,
        |    avg(l_quantity * l_extendedprice) AS x1y,
        |    avg(l_discount * l_extendedprice) AS x2y,
        |    count(*) AS n
        |  FROM lineitem),
        |c AS (
        |  SELECT n, mx1, mx2, my,
        |    x11 - mx1 * mx1 AS s11, x12 - mx1 * mx2 AS s12,
        |    x22 - mx2 * mx2 AS s22, x1y - mx1 * my AS s1y,
        |    x2y - mx2 * my AS s2y
        |  FROM m),
        |b AS (
        |  SELECT n, mx1, mx2, my,
        |    (s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) AS b1,
        |    (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) AS b2
        |  FROM c)
        |SELECT round(my - b1 * mx1 - b2 * mx2, 3) AS b_intercept,
        |  round(b1, 3) AS b_quantity,
        |  round(b2, 3) AS b_discount,
        |  n AS n_rows
        |FROM b""".stripMargin,

    // first digit of the decimal string; Benford expectation ln(1+1/d)/ln 10
    "q150_benford" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(o_orderkey AS BIGINT) AS VARCHAR),
        |    1, 1) AS INT) AS digit
        |  FROM orders WHERE o_orderkey IS NOT NULL AND o_orderkey > 0),
        |g AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
        |t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM g)
        |SELECT digit, n, round(n / tot, 8) AS frac,
        |  round(ln(1.0 + 1.0 / digit) / ln(10.0), 8) AS benford_p
        |FROM g CROSS JOIN t ORDER BY digit""".stripMargin,

    // q108's grid + prev/next anchors; the blend ratio divides exact
    // epoch-microsecond integers
    "q151_resample_interp" ->
      """WITH a AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    count(*) AS n_events, round(avg(value), 6) AS value_avg
        |  FROM events WHERE event_type IN ('purchase', 'signup')
        |  GROUP BY 1, 2),
        |s AS (SELECT event_type, min(bucket) AS mn, max(bucket) AS mx
        |      FROM a GROUP BY 1),
        |g AS (SELECT event_type,
        |        unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
        |      FROM s),
        |j AS (SELECT g.event_type, g.bucket, a.n_events, a.value_avg
        |      FROM g LEFT JOIN a USING (event_type, bucket)),
        |w AS (
        |  SELECT event_type, bucket, n_events, value_avg,
        |    last_value(value_avg IGNORE NULLS) OVER wp AS pv,
        |    last_value(CASE WHEN value_avg IS NOT NULL THEN bucket END
        |      IGNORE NULLS) OVER wp AS pt,
        |    first_value(value_avg IGNORE NULLS) OVER wn AS nv,
        |    first_value(CASE WHEN value_avg IS NOT NULL THEN bucket END
        |      IGNORE NULLS) OVER wn AS nt
        |  FROM j
        |  WINDOW wp AS (PARTITION BY event_type ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wn AS (PARTITION BY event_type ORDER BY bucket
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS hour,
        |  coalesce(n_events, 0) AS n_events,
        |  CAST(n_events IS NULL AS INT) AS is_gap,
        |  round(CASE WHEN pt IS NOT NULL AND nt IS NOT NULL AND nt <> pt
        |    THEN pv + (nv - pv) *
        |      ((epoch_us(bucket) - epoch_us(pt)) /
        |       CAST(epoch_us(nt) - epoch_us(pt) AS DOUBLE))
        |    ELSE coalesce(pv, nv) END, 6) AS value_interp
        |FROM w ORDER BY event_type, hour""".stripMargin,

    // identical bigram relation + margins-from-the-pair-table PMI
    "q152_pmi_bigrams" ->
      """WITH d AS (
        |  SELECT list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '') AS t
        |  FROM documents),
        |b AS (
        |  SELECT t[g] AS w1, t[g + 1] AS w2
        |  FROM d, UNNEST(generate_series(1, len(t) - 1)) AS s(g)),
        |c AS (SELECT w1, w2, count(*) AS n_ab FROM b GROUP BY 1, 2),
        |ra AS (SELECT w1, sum(n_ab) AS r_a FROM c GROUP BY 1),
        |cb AS (SELECT w2, sum(n_ab) AS c_b FROM c GROUP BY 1),
        |tot AS (SELECT sum(n_ab) AS n_tot FROM c)
        |SELECT c.w1, c.w2, c.n_ab,
        |  round(ln(CAST(c.n_ab AS DOUBLE) * n_tot /
        |    (CAST(r_a AS DOUBLE) * c_b)), 6) AS pmi
        |FROM c JOIN ra USING (w1) JOIN cb USING (w2) CROSS JOIN tot
        |WHERE c.n_ab >= 5
        |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin,

    // identical conditional counts + the FK anti-join; rule strings match
    // the Scala Rule.name renderings exactly
    "q153_quality_report" ->
      """WITH s AS (
        |  SELECT
        |    sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS v_nn,
        |    count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS v_uq,
        |    sum(CASE WHEN l_discount IS NOT NULL
        |          AND NOT (l_discount >= 0.0 AND l_discount <= 0.1)
        |        THEN 1 ELSE 0 END) AS v_disc,
        |    sum(CASE WHEN l_quantity IS NOT NULL
        |          AND NOT (l_quantity >= 1.0 AND l_quantity <= 45.0)
        |        THEN 1 ELSE 0 END) AS v_qty,
        |    sum(CASE WHEN l_returnflag IS NOT NULL
        |          AND NOT regexp_matches(l_returnflag, '^[ANR]$')
        |        THEN 1 ELSE 0 END) AS v_re
        |  FROM lineitem),
        |fk AS (
        |  SELECT count(*) AS v
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL)
        |SELECT rule, violations FROM (
        |  SELECT 'not_null(l_orderkey)' AS rule,
        |    CAST(v_nn AS BIGINT) AS violations FROM s
        |  UNION ALL SELECT 'unique(l_orderkey,l_linenumber)',
        |    CAST(v_uq AS BIGINT) FROM s
        |  UNION ALL SELECT 'in_range(l_discount,0.0,0.1)',
        |    CAST(v_disc AS BIGINT) FROM s
        |  UNION ALL SELECT 'in_range(l_quantity,1.0,45.0)',
        |    CAST(v_qty AS BIGINT) FROM s
        |  UNION ALL SELECT 'matches(l_returnflag)',
        |    CAST(v_re AS BIGINT) FROM s
        |  UNION ALL SELECT
        |    'foreign_key(l_orderkey->orders.o_orderkey)',
        |    CAST(v AS BIGINT) FROM fk)
        |ORDER BY rule""".stripMargin,

    // identical Lucene-variant BM25 arithmetic; 6-digit grid before the
    // top-20 cut (doc_id tiebreak)
    "q154_bm25" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '') AS t
        |  FROM documents),
        |base AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dlen, t FROM d),
        |st AS (SELECT count(*) AS n, avg(dlen) AS avgdl FROM base),
        |tok AS (SELECT doc_id, dlen, unnest(t) AS term FROM base),
        |tf AS (
        |  SELECT doc_id, dlen, term, count(*) AS tf FROM tok
        |  WHERE term IN ('spark', 'table', 'query') GROUP BY 1, 2, 3),
        |dfr AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY 1),
        |sc AS (
        |  SELECT tf.doc_id,
        |    ln(1.0 + (st.n - dfr.dfreq + 0.5) / (dfr.dfreq + 0.5))
        |      * tf.tf * 2.2 /
        |      (tf.tf + 1.2 * (0.25 + 0.75 * tf.dlen / st.avgdl)) AS s
        |  FROM tf JOIN dfr USING (term) CROSS JOIN st)
        |SELECT doc_id, count(*) AS n_terms_hit, round(sum(s), 6) AS score
        |FROM sc GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // full multinomial NB replica: identical Laplace arithmetic, 6-digit
    // score grid before the per-document argmax (label-asc tiebreak)
    "q155_nbayes" ->
      """WITH d AS (
        |  SELECT doc_id, lang, list_filter(regexp_split_to_array(text,
        |    '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, lang, term, count(*) AS tf
        |  FROM (SELECT doc_id, lang, unnest(t) AS term FROM d)
        |  GROUP BY 1, 2, 3),
        |ct AS (SELECT lang AS c_lang, term, sum(tf) AS nlt
        |       FROM tf GROUP BY 1, 2),
        |tot AS (SELECT c_lang, sum(nlt) AS nl FROM ct GROUP BY 1),
        |nd AS (SELECT count(*) AS ndocs FROM d),
        |pri AS (SELECT lang AS c_lang, count(*) AS ndoc FROM d GROUP BY 1),
        |voc AS (SELECT count(DISTINCT term) AS v FROM ct),
        |sc AS (
        |  SELECT tf.doc_id, tf.lang, p.c_lang,
        |    round(ln(CAST(p.ndoc AS DOUBLE) / nd.ndocs) +
        |      sum(tf.tf * ln((coalesce(ct.nlt, 0) + 1.0) /
        |        (t2.nl + 1.0 * voc.v))), 6) AS score
        |  FROM tf
        |  CROSS JOIN pri p CROSS JOIN nd CROSS JOIN voc
        |  JOIN tot t2 ON t2.c_lang = p.c_lang
        |  LEFT JOIN ct ON ct.term = tf.term AND ct.c_lang = p.c_lang
        |  GROUP BY tf.doc_id, tf.lang, p.c_lang, p.ndoc, nd.ndocs,
        |    t2.nl, voc.v)
        |SELECT doc_id, lang, predicted, score FROM (
        |  SELECT doc_id, lang, c_lang AS predicted, score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, c_lang) AS rn
        |  FROM sc)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // identical corpus-unigram log-probability arithmetic
    "q156_surprisal" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '') AS t
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(t) AS term FROM d) GROUP BY 1, 2),
        |ct AS (SELECT term, sum(tf) AS ctf FROM tf GROUP BY 1),
        |tot AS (SELECT sum(ctf) AS tt FROM ct)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  round(-sum(tf * ln(CAST(ctf AS DOUBLE) / tt)) / sum(tf), 6)
        |    AS surprisal
        |FROM tf JOIN ct USING (term) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // identical right-open binning CASE; [0, 120000)/24 → width 5000
    // exactly representable, so no rounding anywhere
    "q157_histogram" ->
      """WITH b AS (
        |  SELECT CASE WHEN x < 0.0 THEN -1
        |    WHEN x >= 120000.0 THEN 24
        |    ELSE least(CAST(floor((x - 0.0) / 5000.0) AS INT), 23) END AS bin
        |  FROM (SELECT l_extendedprice AS x FROM lineitem
        |        WHERE l_extendedprice IS NOT NULL))
        |SELECT bin,
        |  CASE WHEN bin = -1 THEN CAST('-infinity' AS DOUBLE)
        |    ELSE 0.0 + bin * 5000.0 END AS bin_lo,
        |  CASE WHEN bin = 24 THEN CAST('infinity' AS DOUBLE)
        |    ELSE 0.0 + (bin + 1) * 5000.0 END AS bin_hi,
        |  count(*) AS n
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    // the identical α=1/2 lag ladder: inputs on a 6-digit grid first, all
    // kernel weights exact powers of two, num/den folded left-to-right
    "q158_ewma" ->
      """WITH a AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    round(avg(value), 6) AS v
        |  FROM events WHERE event_type IN ('purchase', 'signup')
        |  GROUP BY 1, 2),
        |l AS (
        |  SELECT event_type, bucket, v,
        |    lag(v, 1) OVER w AS v1, lag(v, 2) OVER w AS v2,
        |    lag(v, 3) OVER w AS v3, lag(v, 4) OVER w AS v4,
        |    lag(v, 5) OVER w AS v5, lag(v, 6) OVER w AS v6,
        |    lag(v, 7) OVER w AS v7, lag(v, 8) OVER w AS v8
        |  FROM a WINDOW w AS (PARTITION BY event_type ORDER BY bucket))
        |SELECT event_type, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS hour, v,
        |  round((coalesce(CASE WHEN v IS NOT NULL THEN v * 1.0 END, 0.0)
        |    + coalesce(CASE WHEN v1 IS NOT NULL THEN v1 * 0.5 END, 0.0)
        |    + coalesce(CASE WHEN v2 IS NOT NULL THEN v2 * 0.25 END, 0.0)
        |    + coalesce(CASE WHEN v3 IS NOT NULL THEN v3 * 0.125 END, 0.0)
        |    + coalesce(CASE WHEN v4 IS NOT NULL THEN v4 * 0.0625 END, 0.0)
        |    + coalesce(CASE WHEN v5 IS NOT NULL THEN v5 * 0.03125 END, 0.0)
        |    + coalesce(CASE WHEN v6 IS NOT NULL THEN v6 * 0.015625 END, 0.0)
        |    + coalesce(CASE WHEN v7 IS NOT NULL THEN v7 * 0.0078125 END, 0.0)
        |    + coalesce(CASE WHEN v8 IS NOT NULL THEN v8 * 0.00390625 END, 0.0))
        |   / (coalesce(CASE WHEN v IS NOT NULL THEN 1.0 END, 0.0)
        |    + coalesce(CASE WHEN v1 IS NOT NULL THEN 0.5 END, 0.0)
        |    + coalesce(CASE WHEN v2 IS NOT NULL THEN 0.25 END, 0.0)
        |    + coalesce(CASE WHEN v3 IS NOT NULL THEN 0.125 END, 0.0)
        |    + coalesce(CASE WHEN v4 IS NOT NULL THEN 0.0625 END, 0.0)
        |    + coalesce(CASE WHEN v5 IS NOT NULL THEN 0.03125 END, 0.0)
        |    + coalesce(CASE WHEN v6 IS NOT NULL THEN 0.015625 END, 0.0)
        |    + coalesce(CASE WHEN v7 IS NOT NULL THEN 0.0078125 END, 0.0)
        |    + coalesce(CASE WHEN v8 IS NOT NULL THEN 0.00390625 END, 0.0)),
        |   6) AS ewma
        |FROM l ORDER BY event_type, hour""".stripMargin,

    // identical integral-micro-unit frames: 24-row sums are exact in any
    // order, one division per side, full windows only
    "q159_change_score" ->
      """WITH a AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    CAST(round(avg(value) * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type IN ('purchase', 'signup')
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, bucket,
        |    count(vm) OVER wl AS ln_, count(vm) OVER wr AS rn_,
        |    sum(CAST(vm AS DOUBLE)) OVER wl AS ls,
        |    sum(CAST(vm AS DOUBLE)) OVER wr AS rs
        |  FROM a
        |  WINDOW wl AS (PARTITION BY event_type ORDER BY bucket
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING),
        |  wr AS (PARTITION BY event_type ORDER BY bucket
        |    ROWS BETWEEN CURRENT ROW AND 23 FOLLOWING))
        |SELECT event_type, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS hour,
        |  round(abs(rs / 24 - ls / 24) / 1e6, 6) AS score
        |FROM w WHERE ln_ = 24 AND rn_ = 24
        |ORDER BY event_type, hour""".stripMargin,

    // SQL rank() desc ≡ the Cumulative competition rank; fixed-order
    // 1/(60+r) arithmetic
    "q160_rrf" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    len(list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> '')) AS ntok
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    rank() OVER (ORDER BY CAST(n_chars AS DOUBLE) DESC) AS ra,
        |    rank() OVER (ORDER BY CAST(ntok AS DOUBLE) DESC) AS rb
        |  FROM d)
        |SELECT doc_id, ra AS rank_n_chars, rb AS rank_n_tokens,
        |  round(1.0 / (60.0 + ra) + 1.0 / (60.0 + rb), 8) AS rrf
        |FROM r ORDER BY doc_id""".stripMargin,

    // identical md5-ordered before-budget window; crossing row included
    "q161_token_budget" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    len(list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> '')) AS n_tokens
        |  FROM documents WHERE source IN ('src0', 'src1', 'src2')),
        |b AS (
        |  SELECT source, doc_id, n_tokens,
        |    CASE source WHEN 'src0' THEN 600 WHEN 'src1' THEN 700
        |      ELSE 800 END AS budget,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS bef
        |  FROM d)
        |SELECT source, count(*) AS n_docs_kept,
        |  CAST(sum(n_tokens) AS BIGINT) AS tokens_kept
        |FROM b WHERE bef < budget GROUP BY source
        |ORDER BY source""".stripMargin,

    // block id: mod-16 of the 15-hex-digit md5 prefix ≡ that prefix's
    // 15th character; identical weighted combine + block-mean stddev
    "q162_block_ci" ->
      """WITH blk AS (
        |  SELECT strpos('0123456789abcdef',
        |      substr(md5(CAST(l_orderkey AS VARCHAR)), 15, 1)) - 1 AS b,
        |    l_extendedprice AS x
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |per AS (SELECT b, count(*) AS n, avg(x) AS m FROM blk GROUP BY b),
        |s AS (
        |  SELECT sum(m * n) / sum(n) AS mean,
        |    stddev_samp(m) / sqrt(count(*)) AS se,
        |    CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_blocks
        |  FROM per)
        |SELECT round(mean, 4) AS mean, round(se, 4) AS se,
        |  round(mean - 1.96 * se, 4) AS ci_lo,
        |  round(mean + 1.96 * se, 4) AS ci_hi,
        |  n_rows, n_blocks
        |FROM s""".stripMargin,

    // 10 unrolled Lloyd rounds + final assignment, replaying kmeans'
    // deterministic seeding (ORDER BY md5(id), id LIMIT k), partial
    // distance -2x.c + |c|^2, (distance, cluster) argmin tiebreak, and
    // empty-cluster carry. Assignments are float-robust here: the
    // smallest best-vs-second-centroid gap on this data is 4.6e-4,
    // eleven orders above cross-engine sum-order noise
    "q163_kmeans" ->
      (kmeansOracleCtes +
        s"""
           |SELECT CAST(c AS INT) AS cluster, CAST(count(*) AS BIGINT) AS n
           |FROM asg$kmeansRounds
           |GROUP BY 1 ORDER BY 1""".stripMargin),

    // step-wise AP: at-or-above cumulatives from the ascending prefix and
    // the grand totals, identical rational term per distinct score
    "q164_pr_auc" ->
      """WITH d AS (
        |  SELECT l_discount AS s, CAST(l_quantity > 25 AS INT) AS y
        |  FROM lineitem),
        |bs AS (
        |  SELECT s, CAST(sum(y) AS BIGINT) AS p, count(*) AS c
        |  FROM d GROUP BY 1),
        |c AS (
        |  SELECT p, c,
        |    sum(p) OVER () - (sum(p) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) - p) AS tp,
        |    sum(c) OVER () - (sum(c) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) - c) AS tot,
        |    sum(p) OVER () AS pt, sum(c) OVER () AS ct
        |  FROM bs)
        |SELECT round(sum(p * tp / (tot * CAST(pt AS DOUBLE))), 6) AS ap,
        |  CAST(max(pt) AS BIGINT) AS n_pos, CAST(max(ct) AS BIGINT) AS n
        |FROM c""".stripMargin,

    // one conditional-count row per threshold; every metric mirrors the
    // Spark formula text exactly (tp/pp, tp/p, 2·tp/(pp+p), (tp+tn)/n) so
    // the single-division IEEE path is identical — no rounding
    "q165_threshold_metrics" ->
      """WITH d AS (
        |  SELECT l_discount * 10.0 AS s, CAST(l_quantity > 25 AS INT) AS y
        |  FROM lineitem),
        |m AS (
        |  SELECT t.threshold,
        |    CAST(sum(CASE WHEN s >= t.threshold AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN s >= t.threshold THEN 1 ELSE 0 END) AS BIGINT) AS pp,
        |    CAST(sum(y) AS BIGINT) AS p_tot, count(*) AS n_tot
        |  FROM d CROSS JOIN (VALUES (0.25), (0.5), (0.75)) AS t(threshold)
        |  GROUP BY 1)
        |SELECT threshold, tp, pp - tp AS fp, p_tot - tp AS fn,
        |  n_tot - pp - (p_tot - tp) AS tn,
        |  tp / CAST(pp AS DOUBLE) AS precision,
        |  tp / CAST(p_tot AS DOUBLE) AS recall,
        |  2.0 * tp / (pp + p_tot) AS f1,
        |  (tp + (n_tot - pp - (p_tot - tp))) / CAST(n_tot AS DOUBLE) AS accuracy
        |FROM m ORDER BY threshold""".stripMargin,

    // identical doubled-U numerator + tie-corrected variance arithmetic
    "q166_mann_whitney" ->
      """WITH d AS (
        |  SELECT l_extendedprice AS v,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM lineitem WHERE l_returnflag IN ('R', 'A') GROUP BY 1),
        |c AS (
        |  SELECT ca, cb, ca + cb AS t,
        |    sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - cb AS nb_below
        |  FROM d),
        |s AS (
        |  SELECT CAST(sum(ca * (2 * nb_below + cb)) AS BIGINT) AS u2,
        |    CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
        |    CAST(sum(t * t * t - t) AS BIGINT) AS tie3
        |  FROM c)
        |SELECT u2 / 2.0 AS u_stat,
        |  round((u2 / 2.0 - na * nb / 2.0) /
        |    sqrt(na * nb / 12.0 * ((na + nb + 1) - tie3 /
        |      ((na + nb) * (na + nb - 1.0)))), 6) AS z_stat,
        |  na AS n_a, nb AS n_b
        |FROM s""".stripMargin,

    // identical p·m/rank terms (largest rank per tie group = inclusive
    // cumulative count), suffix min over descending p, cap at 1
    "q167_bh_fdr" ->
      """WITH d AS (SELECT l_discount * 10.0 AS pv FROM lineitem),
        |bp AS (
        |  SELECT CAST(pv AS DOUBLE) AS p_value, count(*) AS n_tests_at_p
        |  FROM d GROUP BY 1),
        |rk AS (
        |  SELECT p_value, n_tests_at_p,
        |    sum(n_tests_at_p) OVER () AS m,
        |    sum(n_tests_at_p) OVER (ORDER BY p_value
        |      ROWS UNBOUNDED PRECEDING) AS rnk
        |  FROM bp),
        |c AS (
        |  SELECT p_value, n_tests_at_p, p_value * m / rnk AS c
        |  FROM rk)
        |SELECT p_value, CAST(n_tests_at_p AS BIGINT) AS n_tests_at_p,
        |  least(1.0, min(c) OVER (ORDER BY p_value DESC
        |    ROWS UNBOUNDED PRECEDING)) AS q_value
        |FROM c ORDER BY p_value""".stripMargin,

    // same canonical-edge relation; the oracle counts triangles at the
    // lowest-ID vertex (a < b < c three-way join) — orientation-free but
    // provably the same count the degree-ordered Spark plan produces
    "q168_triangles" ->
      """WITH lp AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem WHERE l_partkey % 3 = 0),
        |e AS (
        |  SELECT DISTINCT a.p AS a, b.p AS b
        |  FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p),
        |deg AS (
        |  SELECT node, count(*) AS deg FROM (
        |    SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        |  GROUP BY 1),
        |tri AS (
        |  SELECT count(*) AS n_triangles
        |  FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |    JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        |base AS (
        |  SELECT count(*) AS n_nodes,
        |    CAST(sum(deg) / 2 AS BIGINT) AS n_edges,
        |    CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges
        |  FROM deg)
        |SELECT n_nodes, n_edges, n_wedges, n_triangles,
        |  round(3.0 * n_triangles / n_wedges, 6) AS clustering_coeff
        |FROM base CROSS JOIN tri""".stripMargin,

    // identical bigram relation and margin CTEs; p_kn phrased in the same
    // operation order so the double is bit-identical before the round
    "q169_kneser_ney" ->
      """WITH d AS (
        |  SELECT list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '') AS t
        |  FROM documents),
        |b AS (
        |  SELECT t[g] AS w1, t[g + 1] AS w2
        |  FROM d, UNNEST(generate_series(1, len(t) - 1)) AS s(g)),
        |c AS (SELECT w1, w2, count(*) AS n_ab FROM b GROUP BY 1, 2),
        |lm AS (SELECT w1, sum(n_ab) AS c_w1, count(*) AS n1_w1
        |       FROM c GROUP BY 1),
        |rm AS (SELECT w2, count(*) AS n1_w2 FROM c GROUP BY 1),
        |tot AS (SELECT count(*) AS n1_tot FROM c)
        |SELECT c.w1, c.w2, c.n_ab,
        |  round((c.n_ab - 0.75) / c_w1 + 0.75 * n1_w1 / c_w1 *
        |    (CAST(n1_w2 AS DOUBLE) / n1_tot), 6) AS p_kn
        |FROM c JOIN lm USING (w1) JOIN rm USING (w2) CROSS JOIN tot
        |WHERE c.n_ab >= 5
        |ORDER BY p_kn DESC, w1, w2 LIMIT 50""".stripMargin,

    // the same KN model scored back over each document's bigrams; the
    // per-doc mean is the only cross-engine-ordered float (round 6)
    "q170_perplexity" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '') AS t
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, t[g] AS w1, t[g + 1] AS w2
        |  FROM d, UNNEST(generate_series(1, len(t) - 1)) AS s(g)),
        |c AS (SELECT w1, w2, count(*) AS n_ab FROM b GROUP BY 1, 2),
        |lm AS (SELECT w1, sum(n_ab) AS c_w1, count(*) AS n1_w1
        |       FROM c GROUP BY 1),
        |rm AS (SELECT w2, count(*) AS n1_w2 FROM c GROUP BY 1),
        |tot AS (SELECT count(*) AS n1_tot FROM c),
        |p AS (
        |  SELECT c.w1, c.w2,
        |    (c.n_ab - 0.75) / c_w1 + 0.75 * n1_w1 / c_w1 *
        |      (CAST(n1_w2 AS DOUBLE) / n1_tot) AS p_kn
        |  FROM c JOIN lm USING (w1) JOIN rm USING (w2) CROSS JOIN tot)
        |SELECT b.doc_id, count(*) AS n_bigrams,
        |  round(exp(-avg(ln(p_kn))), 6) AS ppl
        |FROM b JOIN p ON b.w1 = p.w1 AND b.w2 = p.w2
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // identical integral-cents machinery: trend = full-window cent sums,
    // seasonal = phase mean of the exact long detrended numerator, every
    // float divides exact integers in the same order
    "q171_decompose" ->
      """WITH h AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    count(*) AS n_events,
        |    sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents,
        |    CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT) AS hh
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT *,
        |    count(*) OVER win AS wn,
        |    sum(cents) OVER win AS wsum
        |  FROM h
        |  WINDOW win AS (PARTITION BY event_type ORDER BY hh
        |                 RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |t AS (
        |  SELECT *,
        |    CASE WHEN wn = 25 THEN cents * 25 - wsum END AS dt_l,
        |    hh % 24 AS phase
        |  FROM w),
        |s AS (
        |  SELECT event_type AS sk, phase AS sp,
        |    CAST(sum(dt_l) AS DOUBLE) / count(*) / 2500.0 AS seasonal
        |  FROM t WHERE dt_l IS NOT NULL GROUP BY 1, 2)
        |SELECT t.event_type, t.bucket, t.n_events,
        |  t.cents / 100.0 AS value,
        |  round(CAST(t.cents * 25 - t.dt_l AS DOUBLE) / 2500.0, 6) AS trend,
        |  round(s.seasonal, 6) AS seasonal,
        |  round(CAST(t.dt_l AS DOUBLE) / 2500.0 - s.seasonal, 6) AS resid
        |FROM t LEFT JOIN s ON t.event_type = s.sk AND t.phase = s.sp
        |ORDER BY t.event_type, t.bucket""".stripMargin,

    // five exact-integer window moments, one double division at the end —
    // no rounding anywhere: the slope doubles are bit-identical
    "q172_rolling_slope" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us,
        |    (epoch_us(ts) - 1704067200000000) // 1000000 AS x,
        |    CAST(round(value * 100, 0) AS BIGINT) AS y
        |  FROM events),
        |m AS (
        |  SELECT event_id,
        |    count(*) OVER w AS slope_n,
        |    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
        |    sum(x * y) OVER w AS sxy, sum(x * x) OVER w AS sxx
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us
        |               RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW))
        |SELECT event_id, slope_n,
        |  CASE WHEN slope_n * sxx - sx * sx <> 0 THEN
        |    CAST(slope_n * sxy - sx * sy AS DOUBLE) /
        |      CAST(slope_n * sxx - sx * sx AS DOUBLE) / 100.0
        |  END AS slope
        |FROM m ORDER BY event_id""".stripMargin,

    // the same snapshot construction + full-outer classification with
    // null-safe value comparison
    "q173_table_diff" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |  FROM orders),
        |n AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderstatus
        |  FROM o WHERE o_orderkey % 7 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, o_totalprice,
        |    o_orderstatus
        |  FROM o WHERE o_orderkey % 11 = 0),
        |j AS (
        |  SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
        |    CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |         WHEN n.o_orderkey IS NULL THEN 'removed'
        |         WHEN o.o_custkey IS NOT DISTINCT FROM n.o_custkey
        |          AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
        |          AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
        |           THEN 'unchanged'
        |         ELSE 'changed' END AS diff_status
        |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
        |SELECT o_orderkey, diff_status FROM j
        |WHERE diff_status <> 'unchanged' ORDER BY o_orderkey""".stripMargin,

    // identical presence counts, margins, and χ² operation order; ranking
    // happens on the already-rounded grid with the term tiebreak
    "q174_term_class_chi2" ->
      """WITH dt AS (
        |  SELECT doc_id, lang AS class,
        |    unnest(list_distinct(list_filter(
        |      regexp_split_to_array(text, '\s+'), x -> x <> ''))) AS term
        |  FROM documents),
        |a AS (SELECT term, class, count(*) AS n_tc FROM dt GROUP BY 1, 2),
        |tt AS (SELECT term, sum(n_tc) AS n_t FROM a GROUP BY 1
        |       HAVING sum(n_tc) >= 20),
        |ct AS (SELECT lang AS class, count(*) AS n_c
        |       FROM documents GROUP BY 1),
        |nt AS (SELECT count(*) AS n_all FROM documents),
        |cells AS (
        |  SELECT a.class, a.term, a.n_tc,
        |    a.n_tc AS ca, n_t - a.n_tc AS cb, n_c - a.n_tc AS cc,
        |    n_all - n_t - n_c + a.n_tc AS cd, n_all
        |  FROM a JOIN tt USING (term) JOIN ct USING (class) CROSS JOIN nt),
        |scored AS (
        |  SELECT class, term, n_tc,
        |    round(CAST(n_all AS DOUBLE) *
        |      ((CAST(ca AS DOUBLE) * cd - CAST(cb AS DOUBLE) * cc) *
        |       (CAST(ca AS DOUBLE) * cd - CAST(cb AS DOUBLE) * cc)) /
        |      (CAST(ca + cb AS DOUBLE) * CAST(cc + cd AS DOUBLE) *
        |       CAST(ca + cc AS DOUBLE) * CAST(cb + cd AS DOUBLE)), 6)
        |      AS chi2
        |  FROM cells)
        |SELECT class, term, n_tc AS n_docs_term_class, chi2,
        |  CAST(row_number() OVER (PARTITION BY class
        |    ORDER BY chi2 DESC, term) AS INT) AS rank
        |FROM scored
        |QUALIFY rank <= 10
        |ORDER BY class, rank""".stripMargin,

    // the same discordant-pair conditional sums; χ² squares an exact
    // integer by multiplication (no pow) and divides once
    "q175_mcnemar" ->
      """WITH d AS (
        |  SELECT l_discount > 0.04 AS a, l_quantity > 25 AS b
        |  FROM lineitem),
        |c AS (
        |  SELECT
        |    sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS n01,
        |    sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS n10,
        |    sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS n_agree
        |  FROM d WHERE a IS NOT NULL AND b IS NOT NULL)
        |SELECT CAST(n01 AS BIGINT) AS n01, CAST(n10 AS BIGINT) AS n10,
        |  CAST(n_agree AS BIGINT) AS n_agree,
        |  CASE WHEN n01 + n10 > 0 THEN
        |    CAST((abs(n01 - n10) - 1) * (abs(n01 - n10) - 1) AS DOUBLE) /
        |      (n01 + n10)
        |  END AS chi2
        |FROM c""".stripMargin,

    // the same three synchronous adoption rounds unrolled as CTEs; the
    // graph is closed (every node a source), so no sink carry-over
    "q176_label_prop" ->
      """WITH pe AS (
        |  SELECT DISTINCT 'p' || l_partkey AS u, 's' || l_suppkey AS v
        |  FROM lineitem),
        |e AS (SELECT u, v FROM pe UNION SELECT v, u FROM pe),
        |n AS (SELECT DISTINCT u FROM (
        |  SELECT u FROM e UNION ALL SELECT v FROM e) t),
        |l0 AS (SELECT u, u AS label FROM n),
        |a1 AS (
        |  SELECT e.u, l.label, count(*) AS c
        |  FROM e JOIN l0 l ON e.v = l.u GROUP BY 1, 2
        |  QUALIFY row_number() OVER (PARTITION BY e.u
        |    ORDER BY count(*) DESC, l.label) = 1),
        |a2 AS (
        |  SELECT e.u, l.label, count(*) AS c
        |  FROM e JOIN a1 l ON e.v = l.u GROUP BY 1, 2
        |  QUALIFY row_number() OVER (PARTITION BY e.u
        |    ORDER BY count(*) DESC, l.label) = 1),
        |a3 AS (
        |  SELECT e.u, l.label, count(*) AS c
        |  FROM e JOIN a2 l ON e.v = l.u GROUP BY 1, 2
        |  QUALIFY row_number() OVER (PARTITION BY e.u
        |    ORDER BY count(*) DESC, l.label) = 1)
        |SELECT u, label FROM a3 ORDER BY u""".stripMargin,

    // identical one-pass symmetric-moment identity over the same edges
    "q177_assortativity" ->
      """WITH lp AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem WHERE l_partkey % 3 = 0),
        |e AS (
        |  SELECT DISTINCT a.p AS a, b.p AS b
        |  FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p),
        |deg AS (
        |  SELECT node, count(*) AS deg FROM (
        |    SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        |  GROUP BY 1),
        |m AS (
        |  SELECT count(*) AS ne, sum(da + db) AS sx,
        |    sum(da * db) AS sxy2, sum(da * da + db * db) AS sxx
        |  FROM e
        |  JOIN (SELECT node AS a, deg AS da FROM deg) USING (a)
        |  JOIN (SELECT node AS b, deg AS db FROM deg) USING (b))
        |SELECT ne AS n_edges,
        |  round(CASE WHEN 2 * ne * sxx - sx * sx <> 0 THEN
        |    CAST(2 * ne * (2 * sxy2) - sx * sx AS DOUBLE) /
        |      CAST(2 * ne * sxx - sx * sx AS DOUBLE) END, 6)
        |    AS assortativity
        |FROM m""".stripMargin,

    // sliding distinct-user count phrased as the equivalent range join
    // over the reduced (user, day) frame
    "q178_rolling_active" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id AS u, date_trunc('day', ts) AS day
        |  FROM events),
        |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ud),
        |days AS (
        |  SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
        |  FROM b)
        |SELECT d.day, count(DISTINCT u.u) AS active_users
        |FROM days d JOIN ud u
        |  ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // identical melt + vote + rank + pivot-back survivorship
    "q179_golden_record" ->
      """WITH v AS (
        |  SELECT o_custkey AS cl, attr, value FROM (
        |    SELECT o_custkey, 'o_orderstatus' AS attr,
        |      CAST(o_orderstatus AS VARCHAR) AS value FROM orders
        |    UNION ALL
        |    SELECT o_custkey, 'o_orderpriority',
        |      CAST(o_orderpriority AS VARCHAR) FROM orders) t
        |  WHERE value IS NOT NULL),
        |c AS (SELECT cl, attr, value, count(*) AS n FROM v GROUP BY 1, 2, 3),
        |wn AS (
        |  SELECT cl, attr, value FROM c
        |  QUALIFY row_number() OVER (PARTITION BY cl, attr
        |    ORDER BY n DESC, value) = 1),
        |sz AS (SELECT o_custkey AS cl, count(*) AS n_records
        |       FROM orders GROUP BY 1)
        |SELECT sz.cl AS o_custkey, sz.n_records,
        |  max(CASE WHEN attr = 'o_orderstatus' THEN value END)
        |    AS o_orderstatus,
        |  max(CASE WHEN attr = 'o_orderpriority' THEN value END)
        |    AS o_orderpriority
        |FROM sz LEFT JOIN wn ON sz.cl = wn.cl
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // identical 0.5-adjusted share arithmetic in the same order
    "q180_woe" ->
      """WITH c AS (
        |  SELECT l_returnflag AS category, count(*) AS n,
        |    CAST(sum(CAST(CAST(l_quantity > 25 AS INT) AS DOUBLE))
        |      AS BIGINT) AS n_pos
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(n_pos) AS pos, sum(n) - sum(n_pos) AS neg FROM c)
        |SELECT category, n, n_pos,
        |  round(CASE WHEN pos > 0 AND neg > 0 THEN
        |    ln(((n_pos + 0.5) / pos) / ((n - n_pos + 0.5) / neg)) END, 6)
        |    AS woe,
        |  round(CASE WHEN pos > 0 AND neg > 0 THEN
        |    ((n_pos + 0.5) / pos - (n - n_pos + 0.5) / neg) *
        |      ln(((n_pos + 0.5) / pos) / ((n - n_pos + 0.5) / neg)) END, 6)
        |    AS iv_term
        |FROM c CROSS JOIN t ORDER BY category""".stripMargin,

    // the full composition, replayed: q163's unrolled Lloyd rounds
    // (maxIter = 3 here) on the copies-union, within-cluster cosine
    // pairs on the 6-digit grid, q73's recursive-CTE connected
    // components, min-label representative filter. Identical vectors
    // always share a cluster (identical distances, same tiebreak), so
    // the planted copies are guaranteed pair candidates. The 10000
    // cluster-size cap never binds at this scale and is omitted
    "q181_semantic_dedup" -> {
      def rnd(r: Int): String =
        s"""asg$r AS MATERIALIZED (
           |  SELECT id, c FROM (
           |    SELECT dd.id, dd.c,
           |      row_number() OVER (PARTITION BY dd.id ORDER BY dd.d, dd.c)
           |        AS rk
           |    FROM (
           |      SELECT e.id, ct.c, -2 * sum(e.v * ct.w) + any_value(cn.n2)
           |        AS d
           |      FROM e JOIN ct$r ct ON e.p = ct.p
           |      JOIN (SELECT c, sum(w * w) AS n2 FROM ct$r GROUP BY 1) cn
           |        ON ct.c = cn.c
           |      GROUP BY e.id, ct.c) dd)
           |  WHERE rk = 1),
           |ct${r + 1} AS MATERIALIZED (
           |  SELECT ct.c, ct.p, coalesce(nw.w, ct.w) AS w
           |  FROM ct$r ct LEFT JOIN (
           |    SELECT a.c, e.p, sum(e.v) / count(*) AS w
           |    FROM asg$r a JOIN e ON e.id = a.id GROUP BY a.c, e.p) nw
           |  ON ct.c = nw.c AND ct.p = nw.p)""".stripMargin
      val n = 3
      """WITH RECURSIVE emb AS MATERIALIZED (
        |  SELECT vec_id, embedding, label FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000, embedding, label FROM embeddings
        |  WHERE vec_id % 10 = 0),
        |e AS MATERIALIZED (
        |  SELECT vec_id AS id, CAST(u.ix AS INT) AS p,
        |    CAST(embedding[u.ix + 1] AS DOUBLE) AS v
        |  FROM emb, unnest(generate_series(0, len(embedding) - 1)) AS u(ix)
        |  WHERE embedding IS NOT NULL),
        |picks AS MATERIALIZED (
        |  SELECT id, rn - 1 AS c FROM (
        |    SELECT vec_id AS id, row_number() OVER (
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        |    FROM emb WHERE embedding IS NOT NULL)
        |  WHERE rn <= 8),
        |ct0 AS MATERIALIZED (
        |  SELECT picks.c, e.p, e.v AS w FROM picks JOIN e ON e.id = picks.id),
        |""".stripMargin +
        (0 to n).map(rnd).mkString(",\n") +
        s""",
           |nrm AS MATERIALIZED (
           |  SELECT id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY 1),
           |p0 AS (
           |  SELECT a.id AS id_a, b.id AS id_b
           |  FROM asg$n a JOIN asg$n b ON a.c = b.c AND a.id < b.id),
           |cos AS (
           |  SELECT p0.id_a, p0.id_b,
           |    round(sum(ea.v * eb.v)
           |      / (any_value(na.nrm) * any_value(nb.nrm)), 6) AS cs
           |  FROM p0
           |  JOIN e ea ON ea.id = p0.id_a
           |  JOIN e eb ON eb.id = p0.id_b AND ea.p = eb.p
           |  JOIN nrm na ON na.id = p0.id_a
           |  JOIN nrm nb ON nb.id = p0.id_b
           |  GROUP BY 1, 2),
           |e0 AS (SELECT id_a, id_b FROM cos WHERE cs >= 0.999),
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM e0
           |  UNION ALL SELECT id_b, id_a FROM e0),
           |cc(id, label) AS (
           |  SELECT DISTINCT src, src FROM edges
           |  UNION
           |  SELECT e2.dst, c.label FROM cc c JOIN edges e2 ON c.id = e2.src),
           |lab AS (SELECT id, min(label) AS clabel FROM cc GROUP BY id)
           |SELECT emb.vec_id, emb.label
           |FROM emb LEFT JOIN lab ON emb.vec_id = lab.id
           |WHERE lab.clabel IS NULL OR lab.clabel = emb.vec_id
           |ORDER BY emb.vec_id""".stripMargin
    },

    // same per-doc-distinct presence; postings string-aggregated in
    // numeric id order
    "q182_inverted_index" ->
      """WITH dt AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_distinct(list_filter(
        |      regexp_split_to_array(text, '\s+'), x -> x <> ''))) AS term
        |  FROM documents)
        |SELECT term, count(*) AS df,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
        |    AS postings
        |FROM dt GROUP BY term HAVING count(*) >= 50
        |ORDER BY term""".stripMargin,

    // identical distinct-total cumulative + integer class boundaries
    "q183_abc_classify" ->
      """WITH totals AS (
        |  SELECT l_partkey AS key,
        |    sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS v
        |  FROM lineitem GROUP BY 1),
        |d AS (SELECT v, count(*) AS nk FROM totals GROUP BY 1),
        |c AS (
        |  SELECT v, sum(v * nk) OVER (ORDER BY v DESC
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d),
        |g AS (SELECT sum(v) AS grand FROM totals)
        |SELECT t.key, t.v / 100.0 AS total,
        |  round(CAST(t.v AS DOUBLE) / grand, 6) AS share,
        |  round(CAST(c.cum AS DOUBLE) / grand, 6) AS cum_share,
        |  CASE WHEN c.cum * 100 <= grand * 80 THEN 'A'
        |       WHEN c.cum * 100 <= grand * 95 THEN 'B'
        |       ELSE 'C' END AS abc_class
        |FROM totals t JOIN c ON t.v = c.v CROSS JOIN g
        |ORDER BY t.key""".stripMargin,

    // identical distinct frames + containment division
    "q184_fk_probe" ->
      """WITH c AS (
        |  SELECT DISTINCT l_partkey AS v FROM lineitem
        |  WHERE l_partkey IS NOT NULL),
        |p AS (
        |  SELECT DISTINCT p_partkey AS v FROM part
        |  WHERE p_partkey % 2 = 0 AND p_partkey IS NOT NULL),
        |m AS (SELECT count(*) AS n_matched FROM c SEMI JOIN p USING (v)),
        |cs AS (SELECT count(*) AS n_child_distinct FROM c),
        |ps AS (SELECT count(*) AS n_parent_distinct FROM p),
        |nn AS (SELECT count(*) AS n_child_null_rows FROM lineitem
        |       WHERE l_partkey IS NULL)
        |SELECT n_child_distinct, n_parent_distinct, n_matched,
        |  round(CASE WHEN n_child_distinct > 0 THEN
        |    CAST(n_matched AS DOUBLE) / n_child_distinct END, 6)
        |    AS containment,
        |  n_child_null_rows
        |FROM cs CROSS JOIN ps CROSS JOIN m CROSS JOIN nn""".stripMargin,

    // q113's min-chain with a per-transition 6 h budget: the greedy
    // first-match within the gap IS the min event after the anchor, or
    // nothing qualifies
    "q185_funnel_windowed" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |    AND epoch_us(e.ts) - epoch_us(s1.t1) <= 21600000000 GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |    AND epoch_us(e.ts) - epoch_us(s2.t2) <= 21600000000 GROUP BY 1),
        |c AS (SELECT (SELECT count(*) FROM s1) AS u1,
        |             (SELECT count(*) FROM s2) AS u2,
        |             (SELECT count(*) FROM s3) AS u3)
        |SELECT CAST(1 AS INT) AS step_no, 'view' AS step, u1 AS users,
        |  round(CAST(1.0 AS DOUBLE), 6) AS frac_first,
        |  round(CAST(1.0 AS DOUBLE), 6) AS frac_prev FROM c
        |UNION ALL
        |SELECT CAST(2 AS INT), 'click', u2,
        |  round(CAST(u2 AS DOUBLE) / u1, 6), round(CAST(u2 AS DOUBLE) / u1, 6)
        |FROM c
        |UNION ALL
        |SELECT CAST(3 AS INT), 'purchase', u3,
        |  round(CAST(u3 AS DOUBLE) / u1, 6), round(CAST(u3 AS DOUBLE) / u2, 6)
        |FROM c
        |ORDER BY step_no""".stripMargin,

    // identical exact-microsecond span/gap arithmetic
    "q186_inter_event" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS gap
        |  FROM events)
        |SELECT user_id AS "user", count(*) AS n_events,
        |  round(CAST(max(us) - min(us) AS DOUBLE) / 1e6, 6) AS span_secs,
        |  round(CAST(sum(gap) AS DOUBLE) / count(gap) / 1e6, 6)
        |    AS avg_gap_secs,
        |  round(CAST(max(gap) AS DOUBLE) / 1e6, 6) AS max_gap_secs
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    // q25's exact shingle relation phrased across the two corpus halves
    "q187_cross_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, len(t) - 3),
        |    i -> array_to_string(list_slice(t, i, i + 4), ' '))) AS shingles
        |  FROM toks),
        |sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
        |pairs AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |  FROM pairs a JOIN pairs b ON a.s = b.s
        |  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6)
        |    AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,

    // same moment pass; the 2x2 inverse in closed form and the quadratic
    // form in quadFormExpr's exact accumulation order
    "q188_mahalanobis" ->
      """WITH m AS (
        |  SELECT count(*) AS n,
        |    sum(CAST(l_quantity AS DOUBLE)) AS s0,
        |    sum(CAST(l_extendedprice AS DOUBLE)) AS s1,
        |    sum(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE)) AS q00,
        |    sum(CAST(l_quantity AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)) AS q01,
        |    sum(CAST(l_extendedprice AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)) AS q11
        |  FROM lineitem),
        |c AS (
        |  SELECT n, s0, s1,
        |    (q00 - s0 * s0 / n) / (n - 1) AS c00,
        |    (q01 - s0 * s1 / n) / (n - 1) AS c01,
        |    (q11 - s1 * s1 / n) / (n - 1) AS c11
        |  FROM m),
        |k AS (
        |  SELECT n, s0, s1,
        |    c11 / (c00 * c11 - c01 * c01) AS k00,
        |    -c01 / (c00 * c11 - c01 * c01) AS k01,
        |    c00 / (c00 * c11 - c01 * c01) AS k11
        |  FROM c)
        |SELECT l_orderkey, l_linenumber,
        |  round(((0.0 + k00 * (CAST(l_quantity AS DOUBLE) - s0 / n) *
        |    (CAST(l_quantity AS DOUBLE) - s0 / n)) +
        |    (2 * k01) * (CAST(l_quantity AS DOUBLE) - s0 / n) *
        |    (CAST(l_extendedprice AS DOUBLE) - s1 / n)) +
        |    k11 * (CAST(l_extendedprice AS DOUBLE) - s1 / n) *
        |    (CAST(l_extendedprice AS DOUBLE) - s1 / n), 6) AS md2
        |FROM lineitem CROSS JOIN k
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // identical exact integer moments and closed-form (a, b) per key
    "q189_forecast" ->
      """WITH e AS (
        |  SELECT event_type AS key,
        |    (epoch_us(date_trunc('day', ts)) - 1704067200000000)
        |      // 86400000000 AS x,
        |    CAST(round(value * 100, 0) AS BIGINT) AS y
        |  FROM events),
        |m AS (
        |  SELECT key, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx, max(x) AS mx
        |  FROM e GROUP BY 1),
        |f AS (
        |  SELECT key, mx,
        |    CASE WHEN n * sxx - sx * sx <> 0 THEN
        |      CAST(n * sxy - sx * sy AS DOUBLE) /
        |        CAST(n * sxx - sx * sx AS DOUBLE)
        |    ELSE 0.0 END AS b, n, sx, sy
        |  FROM m),
        |ab AS (
        |  SELECT key, mx, b, (CAST(sy AS DOUBLE) - b * sx) / n AS a
        |  FROM f)
        |SELECT key, CAST(h AS INT) AS h,
        |  make_timestamp((mx + h) * 86400000000 + 1704067200000000) AS day,
        |  round((a + b * (mx + h)) / 100.0, 6) AS yhat
        |FROM ab, UNNEST(generate_series(1, 3)) AS s(h)
        |ORDER BY key, h""".stripMargin,

    // per-user ordered type heads; identical slice + join + top-k cut
    "q190_top_paths" ->
      """WITH p AS (
        |  SELECT user_id,
        |    array_to_string(list_slice(
        |      list(event_type ORDER BY ts, event_id), 1, 3), '>') AS path
        |  FROM events GROUP BY user_id)
        |SELECT path, count(*) AS n_users
        |FROM p GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 15""".stripMargin,

    // train-split Cramer solve + engine-percentile calibration quantile;
    // the 4-decimal grid absorbs the Cholesky-vs-Cramer beta ulps
    "q191_conformal" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y,
        |    substr(md5(l_orderkey || '-' || l_linenumber), 32, 1) < '4'
        |      AS is_calib
        |  FROM lineitem),
        |tr AS (
        |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM li WHERE NOT is_calib),
        |beta AS (
        |  SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b1,
        |    (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS b0
        |  FROM tr),
        |scored AS (
        |  SELECT li.*, b0 + b1 * x AS pred FROM li CROSS JOIN beta),
        |qq AS (
        |  SELECT quantile_cont(abs(y - pred), 0.9) AS q
        |  FROM scored WHERE is_calib)
        |SELECT l_orderkey, l_linenumber,
        |  round(pred, 4) AS prediction,
        |  round(pred - q, 4) AS conf_lo,
        |  round(pred + q, 4) AS conf_hi,
        |  is_calib
        |FROM scored CROSS JOIN qq
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // saturated OvR closed form: normalized per-class scores over a cell
    // are the cell's class mixture; argmax ties break to the first class
    "q192_multinomial" ->
      """WITH d AS (
        |  SELECT CAST(l_quantity > 25 AS DOUBLE) AS hi,
        |    l_returnflag AS cls
        |  FROM lineitem),
        |cell AS (
        |  SELECT hi, cls, count(*) AS n FROM d GROUP BY 1, 2),
        |tot AS (SELECT hi, sum(n) AS nt FROM cell GROUP BY 1),
        |p AS (
        |  SELECT c.hi,
        |    max(CASE WHEN cls = 'A' THEN CAST(n AS DOUBLE) / nt END) AS ra,
        |    max(CASE WHEN cls = 'N' THEN CAST(n AS DOUBLE) / nt END) AS rn,
        |    max(CASE WHEN cls = 'R' THEN CAST(n AS DOUBLE) / nt END) AS rr
        |  FROM cell c JOIN tot USING (hi) GROUP BY c.hi)
        |SELECT hi, round(ra, 6) AS p_a, round(rn, 6) AS p_n,
        |  round(rr, 6) AS p_r,
        |  CASE WHEN ra >= rn AND ra >= rr THEN 'A'
        |       WHEN rn >= rr THEN 'N' ELSE 'R' END AS predicted
        |FROM p ORDER BY hi""".stripMargin,

    // identical 8-word sentence rebuild, then the greedy pack as a
    // per-doc recursive walk over numbered sentences
    "q193_chunks" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '') AS t
        |  FROM documents WHERE len(list_filter(
        |    regexp_split_to_array(text, '\s+'), x -> x <> '')) > 0),
        |s AS (
        |  SELECT doc_id, g AS i,
        |    array_to_string(list_slice(t, (g - 1) * 8 + 1, (g - 1) * 8 + 8),
        |      ' ') || '.' AS sent,
        |    len(list_slice(t, (g - 1) * 8 + 1, (g - 1) * 8 + 8)) AS tok
        |  FROM toks, UNNEST(generate_series(1,
        |    CAST(ceil(len(t) / 8.0) AS BIGINT))) AS q(g)),
        |walk AS (
        |  SELECT doc_id, i, sent, tok, 0 AS chunk_id, tok AS acc
        |  FROM s WHERE i = 1
        |  UNION ALL
        |  SELECT s.doc_id, s.i, s.sent, s.tok,
        |    CASE WHEN w.acc + s.tok <= 20 THEN w.chunk_id
        |         ELSE w.chunk_id + 1 END,
        |    CASE WHEN w.acc + s.tok <= 20 THEN w.acc + s.tok
        |         ELSE s.tok END
        |  FROM walk w JOIN s ON s.doc_id = w.doc_id AND s.i = w.i + 1)
        |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
        |  string_agg(sent, ' ' ORDER BY i) AS chunk,
        |  CAST(sum(tok) AS INT) AS n_tokens
        |FROM walk GROUP BY doc_id, chunk_id
        |ORDER BY doc_id, chunk_id""".stripMargin,

    // 11 unrolled farthest-first rounds replaying kCenter exactly: the
    // md5-seeded first pick, squared-distance floor at 0, and the
    // (distance DESC, id) argmax tiebreak. Round-by-round argmax gaps
    // are O(1e-2) on this data — float-robust across engines
    "q194_kcenter" -> {
      def rnd(r: Int): String =
        s"""p$r AS MATERIALIZED (
           |  SELECT id, $r AS ord, d AS md FROM d${r - 1}
           |  ORDER BY d DESC, id LIMIT 1),
           |c$r AS MATERIALIZED (
           |  SELECT e.p, e.v FROM e JOIN p$r ON e.id = p$r.id),
           |d$r AS MATERIALIZED (
           |  SELECT d.id, LEAST(d.d, GREATEST(0.0,
           |    nrm.nrm - 2 * dot.dot + (SELECT sum(v * v) FROM c$r))) AS d
           |  FROM d${r - 1} d
           |  JOIN (SELECT e.id, sum(e.v * c.v) AS dot
           |        FROM e JOIN c$r c ON e.p = c.p GROUP BY e.id) dot
           |    ON d.id = dot.id
           |  JOIN nrm ON d.id = nrm.id)""".stripMargin
      val k = 12
      """WITH e AS MATERIALIZED (
        |  SELECT vec_id AS id, CAST(u.ix AS INT) AS p,
        |    CAST(embedding[u.ix + 1] AS DOUBLE) AS v
        |  FROM embeddings,
        |    unnest(generate_series(0, len(embedding) - 1)) AS u(ix)
        |  WHERE embedding IS NOT NULL),
        |nrm AS MATERIALIZED (SELECT id, sum(v * v) AS nrm FROM e GROUP BY 1),
        |p0 AS MATERIALIZED (
        |  SELECT vec_id AS id, 0 AS ord, 0.0 AS md FROM embeddings
        |  WHERE embedding IS NOT NULL
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1),
        |c0 AS MATERIALIZED (SELECT e.p, e.v FROM e JOIN p0 ON e.id = p0.id),
        |d0 AS MATERIALIZED (
        |  SELECT nrm.id, GREATEST(0.0,
        |    nrm.nrm - 2 * dot.dot + (SELECT sum(v * v) FROM c0)) AS d
        |  FROM nrm JOIN (SELECT e.id, sum(e.v * c.v) AS dot
        |    FROM e JOIN c0 c ON e.p = c.p GROUP BY e.id) dot
        |    ON nrm.id = dot.id),
        |""".stripMargin +
        (1 until k).map(rnd).mkString(",\n") +
        s"""
           |SELECT id AS vec_id, CAST(ord AS INT) AS pick_order,
           |  round(md, 4) AS min_dist
           |FROM (${(0 until k).map(r => s"SELECT * FROM p$r")
                     .mkString(" UNION ALL ")})
           |ORDER BY pick_order""".stripMargin
    },

    // same conditional change sums over the inner-joined snapshots
    "q195_column_changes" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |  FROM orders),
        |n AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderstatus
        |  FROM o WHERE o_orderkey % 7 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, o_totalprice,
        |    o_orderstatus
        |  FROM o WHERE o_orderkey % 11 = 0),
        |j AS (
        |  SELECT o.o_custkey AS oc, n.o_custkey AS nc,
        |    o.o_totalprice AS op, n.o_totalprice AS np,
        |    o.o_orderstatus AS os, n.o_orderstatus AS ns
        |  FROM o JOIN n USING (o_orderkey)),
        |c AS (
        |  SELECT count(*) AS n_matched,
        |    sum(CASE WHEN oc IS DISTINCT FROM nc THEN 1 ELSE 0 END) AS c_ck,
        |    sum(CASE WHEN op IS DISTINCT FROM np THEN 1 ELSE 0 END) AS c_tp,
        |    sum(CASE WHEN os IS DISTINCT FROM ns THEN 1 ELSE 0 END) AS c_os
        |  FROM j)
        |SELECT 'o_custkey' AS "column", CAST(c_ck AS BIGINT) AS n_changed,
        |  n_matched FROM c
        |UNION ALL
        |SELECT 'o_orderstatus', CAST(c_os AS BIGINT), n_matched FROM c
        |UNION ALL
        |SELECT 'o_totalprice', CAST(c_tp AS BIGINT), n_matched FROM c
        |ORDER BY "column"""".stripMargin,

    // identical two-axis binning CASE
    "q196_histogram2d" ->
      """WITH b AS (
        |  SELECT
        |    CASE WHEN l_quantity < 0.0 THEN -1
        |         WHEN l_quantity >= 50.0 THEN 10
        |         ELSE least(CAST(floor((l_quantity - 0.0) / 5.0) AS INT), 9)
        |    END AS xbin,
        |    CASE WHEN l_discount < 0.0 THEN -1
        |         WHEN l_discount >= 0.1 THEN 5
        |         ELSE least(CAST(floor((l_discount - 0.0) /
        |           ((CAST(0.1 AS DOUBLE) - 0.0) / 5)) AS INT), 4)
        |    END AS ybin
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL)
        |SELECT xbin, ybin, count(*) AS n FROM b GROUP BY 1, 2
        |ORDER BY xbin, ybin""".stripMargin,

    // identical daily register table (p=12: mask 4095, shift 12,
    // scale 49), trailing-window register union as cell-wise max over
    // the exploded report days, per-day readout; the rounded estimate
    // lands as floor(x + 0.5) on both engines
    "q197_rolling_active_hll" ->
      """WITH dr AS (
        |  SELECT date_trunc('day', ts) AS day,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
        |      ::BIGINT AS h
        |  FROM events WHERE user_id IS NOT NULL),
        |regs AS (SELECT day, h & 4095 AS bucket,
        |    max(CASE WHEN (h >> 12) = 0 THEN 49
        |      ELSE 49 - length(bin(h >> 12)) END) AS r
        |  FROM dr GROUP BY 1, 2),
        |b AS (SELECT max(day) AS mx FROM regs),
        |ex AS (
        |  SELECT unnest(generate_series(day,
        |      least(mx, day + INTERVAL 6 DAY), INTERVAL 1 DAY)) AS rday,
        |    bucket, r
        |  FROM regs, b),
        |rolled AS (SELECT rday AS day, bucket, max(r) AS r
        |  FROM ex GROUP BY 1, 2),
        |a AS (SELECT day, count(*) AS occ,
        |    sum(1::BIGINT << CAST(49 - r AS INT)) AS s_occ
        |  FROM rolled GROUP BY 1),
        |sc AS (SELECT day, CAST(4096 - occ AS BIGINT) AS v_zero,
        |    CAST(s_occ + (4096 - occ) * (1::BIGINT << 49) AS BIGINT)
        |      AS s_scaled
        |  FROM a)
        |SELECT day,
        |  CAST(floor(round(CASE WHEN 0.7213 / (1.0 + 1.079 / 4096.0)
        |        * 4096.0 * 4096.0 * 562949953421312.0
        |        / CAST(s_scaled AS DOUBLE) <= 2.5 * 4096.0 AND v_zero > 0
        |      THEN 4096.0 * ln(4096.0 / CAST(v_zero AS DOUBLE))
        |      ELSE 0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0
        |        * 562949953421312.0 / CAST(s_scaled AS DOUBLE) END, 6)
        |    + 0.5) AS BIGINT) AS active_users_approx
        |FROM sc ORDER BY day""".stripMargin,

    // identical distinct-value mass cumulative + lower-quantile selection
    "q198_weighted_quantiles" ->
      """WITH b AS (
        |  SELECT CAST(l_extendedprice AS DOUBLE) AS v, sum(l_quantity) AS w
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        |  GROUP BY 1),
        |c AS (
        |  SELECT v, sum(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cw
        |  FROM b),
        |g AS (SELECT max(cw) AS grand FROM c),
        |qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES (0.25), (0.5),
        |  (0.75), (0.9), (0.99)) t(q))
        |SELECT q, min(CASE WHEN CAST(cw AS DOUBLE) >=
        |  q * CAST(grand AS DOUBLE) THEN v END) AS value
        |FROM c CROSS JOIN g CROSS JOIN qs
        |GROUP BY q ORDER BY q""".stripMargin,

    // identical contact synthesis, RE2 regexes, and replacement order
    "q199_redact" ->
      """WITH d AS (
        |  SELECT doc_id, text || ' contact user' || doc_id ||
        |    '@example.com or 415-555-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\d{3}-\d{3}-\d{4}')) AS INT)
        |    AS n_phones,
        |  regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]',
        |    'g'), '\d{3}-\d{3}-\d{4}', '[PHONE]', 'g') AS redacted
        |FROM d ORDER BY doc_id""".stripMargin,

    // 10 unrolled peel rounds — the fixed point lands in 7 at sf0.01 and
    // peeling is idempotent past it, so rounds 8-10 are no-ops
    "q200_kcore" ->
      """WITH lp AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem WHERE l_partkey % 3 = 0),
        |e0 AS MATERIALIZED (
        |  SELECT DISTINCT a.p AS a, b.p AS b
        |  FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p),
        |d0 AS MATERIALIZED (SELECT x AS node, count(*) AS d FROM (
        |  SELECT a AS x FROM e0 UNION ALL SELECT b FROM e0) t GROUP BY 1),
        |e1 AS MATERIALIZED (SELECT a, b FROM e0
        |  WHERE a IN (SELECT node FROM d0 WHERE d >= 27)
        |    AND b IN (SELECT node FROM d0 WHERE d >= 27)),
        |d1 AS MATERIALIZED (SELECT x AS node, count(*) AS d FROM (
        |  SELECT a AS x FROM e1 UNION ALL SELECT b FROM e1) t GROUP BY 1),
        |e2 AS MATERIALIZED (SELECT a, b FROM e1
        |  WHERE a IN (SELECT node FROM d1 WHERE d >= 27)
        |    AND b IN (SELECT node FROM d1 WHERE d >= 27)),
        |d2 AS MATERIALIZED (SELECT x AS node, count(*) AS d FROM (
        |  SELECT a AS x FROM e2 UNION ALL SELECT b FROM e2) t GROUP BY 1),
        |e3 AS MATERIALIZED (SELECT a, b FROM e2
        |  WHERE a IN (SELECT node FROM d2 WHERE d >= 27)
        |    AND b IN (SELECT node FROM d2 WHERE d >= 27)),
        |d3 AS MATERIALIZED (SELECT x AS node, count(*) AS d FROM (
        |  SELECT a AS x FROM e3 UNION ALL SELECT b FROM e3) t GROUP BY 1),
        |e4 AS MATERIALIZED (SELECT a, b FROM e3
        |  WHERE a IN (SELECT node FROM d3 WHERE d >= 27)
        |    AND b IN (SELECT node FROM d3 WHERE d >= 27)),
        |d4 AS MATERIALIZED (SELECT x AS node, count(*) AS d FROM (
        |  SELECT a AS x FROM e4 UNION ALL SELECT b FROM e4) t GROUP BY 1),
        |e5 AS MATERIALIZED (SELECT a, b FROM e4
        |  WHERE a IN (SELECT node FROM d4 WHERE d >= 27)
        |    AND b IN (SELECT node FROM d4 WHERE d >= 27)),
        |d5 AS MATERIALIZED (SELECT x AS node, count(*) AS d FROM (
        |  SELECT a AS x FROM e5 UNION ALL SELECT b FROM e5) t GROUP BY 1),
        |e6 AS MATERIALIZED (SELECT a, b FROM e5
        |  WHERE a IN (SELECT node FROM d5 WHERE d >= 27)
        |    AND b IN (SELECT node FROM d5 WHERE d >= 27)),
        |d6 AS MATERIALIZED (SELECT x AS node, count(*) AS d FROM (
        |  SELECT a AS x FROM e6 UNION ALL SELECT b FROM e6) t GROUP BY 1),
        |e7 AS MATERIALIZED (SELECT a, b FROM e6
        |  WHERE a IN (SELECT node FROM d6 WHERE d >= 27)
        |    AND b IN (SELECT node FROM d6 WHERE d >= 27)),
        |d7 AS MATERIALIZED (SELECT x AS node, count(*) AS d FROM (
        |  SELECT a AS x FROM e7 UNION ALL SELECT b FROM e7) t GROUP BY 1),
        |e8 AS MATERIALIZED (SELECT a, b FROM e7
        |  WHERE a IN (SELECT node FROM d7 WHERE d >= 27)
        |    AND b IN (SELECT node FROM d7 WHERE d >= 27)),
        |d8 AS MATERIALIZED (SELECT x AS node, count(*) AS d FROM (
        |  SELECT a AS x FROM e8 UNION ALL SELECT b FROM e8) t GROUP BY 1),
        |e9 AS MATERIALIZED (SELECT a, b FROM e8
        |  WHERE a IN (SELECT node FROM d8 WHERE d >= 27)
        |    AND b IN (SELECT node FROM d8 WHERE d >= 27)),
        |d9 AS MATERIALIZED (SELECT x AS node, count(*) AS d FROM (
        |  SELECT a AS x FROM e9 UNION ALL SELECT b FROM e9) t GROUP BY 1),
        |e10 AS MATERIALIZED (SELECT a, b FROM e9
        |  WHERE a IN (SELECT node FROM d9 WHERE d >= 27)
        |    AND b IN (SELECT node FROM d9 WHERE d >= 27)),
        |d10 AS MATERIALIZED (SELECT x AS node, count(*) AS d FROM (
        |  SELECT a AS x FROM e10 UNION ALL SELECT b FROM e10) t GROUP BY 1)
        |SELECT node, d AS deg FROM d10 WHERE d >= 27
        |ORDER BY node""".stripMargin,

    // depth-bounded recursive frontier (UNION dedups (node, d) states),
    // settled at the minimal depth by the min(d) reduction
    "q201_bfs" ->
      """WITH RECURSIVE pe AS (
        |  SELECT DISTINCT 'p' || l_partkey AS u, 's' || l_suppkey AS v
        |  FROM lineitem),
        |e AS (SELECT u, v FROM pe UNION SELECT v, u FROM pe),
        |r(node, d) AS (
        |  SELECT 'p1', 0
        |  UNION
        |  SELECT e.v, r.d + 1 FROM r JOIN e ON e.u = r.node WHERE r.d < 4)
        |SELECT node, CAST(min(d) AS INT) AS dist FROM r
        |GROUP BY node ORDER BY node""".stripMargin,

    // identical integral cents + ceil(4·cum/n) rank-share quartiles
    "q202_rfm" ->
      """WITH base AS (
        |  SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_d,
        |    count(*) AS frequency,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS monetary_cents
        |  FROM orders GROUP BY 1),
        |ref AS (SELECT max(last_d) AS r FROM base),
        |b2 AS (
        |  SELECT o_custkey, date_diff('day', last_d, r) AS recency_days,
        |    frequency, monetary_cents
        |  FROM base CROSS JOIN ref),
        |rmap AS (
        |  SELECT v, CAST(5 - ceil(4.0 * cum / n) AS INT) AS s FROM (
        |    SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |        AS cum, sum(c) OVER () AS n
        |    FROM (SELECT recency_days AS v, count(*) AS c FROM b2
        |          GROUP BY 1))),
        |fmap AS (
        |  SELECT v, CAST(ceil(4.0 * cum / n) AS INT) AS s FROM (
        |    SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |        AS cum, sum(c) OVER () AS n
        |    FROM (SELECT frequency AS v, count(*) AS c FROM b2
        |          GROUP BY 1))),
        |mmap AS (
        |  SELECT v, CAST(ceil(4.0 * cum / n) AS INT) AS s FROM (
        |    SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |        AS cum, sum(c) OVER () AS n
        |    FROM (SELECT monetary_cents AS v, count(*) AS c FROM b2
        |          GROUP BY 1)))
        |SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
        |  frequency, CAST(monetary_cents AS BIGINT) AS monetary_cents,
        |  rmap.s AS r_score, fmap.s AS f_score, mmap.s AS m_score,
        |  rmap.s || fmap.s || mmap.s AS rfm
        |FROM b2
        |JOIN rmap ON b2.recency_days = rmap.v
        |JOIN fmap ON b2.frequency = fmap.v
        |JOIN mmap ON b2.monetary_cents = mmap.v
        |ORDER BY o_custkey""".stripMargin,

    // identical pair window, earliest-conversion ownership, and
    // (ts, id) rank tiebreak
    "q203_attribution" ->
      """WITH touches AS (
        |  SELECT user_id AS u, event_type AS etype, epoch_us(ts) AS t_us,
        |    event_id AS id
        |  FROM events WHERE event_type <> 'purchase'),
        |convs AS (
        |  SELECT DISTINCT user_id AS u, epoch_us(ts) AS c_us
        |  FROM events WHERE event_type = 'purchase'),
        |pairs AS (
        |  SELECT t.u, t.etype, t.t_us, t.id, c.c_us
        |  FROM touches t JOIN convs c ON t.u = c.u
        |    AND c.c_us > t.t_us AND c.c_us - t.t_us <= 172800000000),
        |owned AS (
        |  SELECT u, etype, t_us, id, min(c_us) AS c_us
        |  FROM pairs GROUP BY 1, 2, 3, 4),
        |rk AS (
        |  SELECT etype,
        |    row_number() OVER (PARTITION BY u, c_us ORDER BY t_us, id)
        |      AS rn,
        |    count(*) OVER (PARTITION BY u, c_us) AS k
        |  FROM owned)
        |SELECT etype AS event_type,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS first_touch,
        |  CAST(sum(CASE WHEN rn = k THEN 1 ELSE 0 END) AS BIGINT)
        |    AS last_touch,
        |  round(sum(1.0 / k), 6) AS linear
        |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin,

    // identical scaled-Long CUSUM identity: s = n·cum − t·G
    "q204_cusum" ->
      """WITH d AS (
        |  SELECT date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)
        |      AS day,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT count(*) AS n, sum(x) AS g FROM d),
        |c AS (
        |  SELECT day, x,
        |    sum(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cx,
        |    row_number() OVER (ORDER BY day) AS tt
        |  FROM d)
        |SELECT day, CAST(x AS BIGINT) AS x,
        |  CAST(n * cx - tt * g AS BIGINT) AS s_scaled,
        |  round(CAST(n * cx - tt * g AS DOUBLE) / n, 4) AS cusum
        |FROM c CROSS JOIN tot ORDER BY day""".stripMargin,

    // q126's duration frame; ordered cumulative of identical per-row
    // hazard increments
    "q205_nelson_aalen" ->
      """WITH per AS (
        |  SELECT user_id, min(ts) AS t0,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
        |    max(ts) AS tl
        |  FROM events GROUP BY 1),
        |dur AS (
        |  SELECT CAST(epoch_us(coalesce(tp, tl)) - epoch_us(t0) AS DOUBLE)
        |      / 3600000000.0 AS dur,
        |    CAST(tp IS NOT NULL AS INT) AS ev
        |  FROM per),
        |agg AS (
        |  SELECT dur AS t, CAST(sum(ev) AS BIGINT) AS d,
        |    CAST(sum(1 - ev) AS BIGINT) AS c
        |  FROM dur GROUP BY 1),
        |km AS (
        |  SELECT t, d, c,
        |    sum(d + c) OVER ()
        |      - coalesce(sum(d + c) OVER (ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n_risk
        |  FROM agg)
        |SELECT round(t, 6) AS t, CAST(n_risk AS BIGINT) AS n_risk, d, c,
        |  round(sum(CAST(d AS DOUBLE) / n_risk)
        |    OVER (ORDER BY t ROWS UNBOUNDED PRECEDING), 6) AS cum_hazard,
        |  round(sum(CAST(d AS DOUBLE) /
        |      (CAST(n_risk AS DOUBLE) * n_risk))
        |    OVER (ORDER BY t ROWS UNBOUNDED PRECEDING), 6) AS var_hazard
        |FROM km ORDER BY t""".stripMargin,

    // q193's sentence rebuild + identical RE2 counts and formula order
    "q206_readability" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '') AS t
        |  FROM documents WHERE len(list_filter(
        |    regexp_split_to_array(text, '\s+'), x -> x <> '')) > 0),
        |t2 AS (
        |  SELECT doc_id, array_to_string(list_transform(
        |    generate_series(1, CAST(ceil(len(t) / 8.0) AS BIGINT)),
        |    g -> array_to_string(list_slice(t, (g - 1) * 8 + 1,
        |      (g - 1) * 8 + 8), ' ') || '.'), ' ') AS s
        |  FROM toks),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(s, '[A-Za-z]+')) AS INT) AS w,
        |    greatest(CAST(len(regexp_extract_all(s, '[.!?]+')) AS INT), 1)
        |      AS sn,
        |    CAST(len(regexp_extract_all(s, '[aeiouyAEIOUY]+')) AS INT)
        |      AS syl
        |  FROM t2)
        |SELECT doc_id, w AS n_words, sn AS n_sentences, syl AS n_syllables,
        |  CASE WHEN w > 0 THEN round(206.835
        |    - 1.015 * (CAST(w AS DOUBLE) / CAST(sn AS DOUBLE))
        |    - 84.6 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)), 4) END
        |    AS flesch,
        |  CASE WHEN w > 0 THEN round(
        |    0.39 * (CAST(w AS DOUBLE) / CAST(sn AS DOUBLE))
        |    + 11.8 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE))
        |    - 15.59, 4) END AS fk_grade
        |FROM m ORDER BY doc_id""".stripMargin,

    // three unrolled L1-normalized HITS iterations (materialized CTEs —
    // inlining would replay the scan exponentially, the q200 lesson)
    "q207_hits" ->
      """WITH pe AS MATERIALIZED (
        |  SELECT DISTINCT 'p' || l_partkey AS u, 's' || l_suppkey AS v
        |  FROM lineitem),
        |nd AS MATERIALIZED (SELECT DISTINCT node FROM (
        |  SELECT u AS node FROM pe UNION ALL SELECT v FROM pe) t),
        |s0 AS MATERIALIZED (
        |  SELECT node, 1.0 / (SELECT count(*) FROM nd) AS h FROM nd),
        |a1r AS MATERIALIZED (
        |  SELECT nd.node, coalesce(x.s, 0.0) AS ar FROM nd LEFT JOIN (
        |    SELECT pe.v AS node, sum(s0.h) AS s FROM pe
        |    JOIN s0 ON pe.u = s0.node GROUP BY 1) x USING (node)),
        |a1 AS MATERIALIZED (
        |  SELECT node, ar / (SELECT sum(ar) FROM a1r) AS a FROM a1r),
        |h1r AS MATERIALIZED (
        |  SELECT nd.node, coalesce(x.s, 0.0) AS hr FROM nd LEFT JOIN (
        |    SELECT pe.u AS node, sum(a1.a) AS s FROM pe
        |    JOIN a1 ON pe.v = a1.node GROUP BY 1) x USING (node)),
        |h1 AS MATERIALIZED (
        |  SELECT node, hr / (SELECT sum(hr) FROM h1r) AS h FROM h1r),
        |a2r AS MATERIALIZED (
        |  SELECT nd.node, coalesce(x.s, 0.0) AS ar FROM nd LEFT JOIN (
        |    SELECT pe.v AS node, sum(h1.h) AS s FROM pe
        |    JOIN h1 ON pe.u = h1.node GROUP BY 1) x USING (node)),
        |a2 AS MATERIALIZED (
        |  SELECT node, ar / (SELECT sum(ar) FROM a2r) AS a FROM a2r),
        |h2r AS MATERIALIZED (
        |  SELECT nd.node, coalesce(x.s, 0.0) AS hr FROM nd LEFT JOIN (
        |    SELECT pe.u AS node, sum(a2.a) AS s FROM pe
        |    JOIN a2 ON pe.v = a2.node GROUP BY 1) x USING (node)),
        |h2 AS MATERIALIZED (
        |  SELECT node, hr / (SELECT sum(hr) FROM h2r) AS h FROM h2r),
        |a3r AS MATERIALIZED (
        |  SELECT nd.node, coalesce(x.s, 0.0) AS ar FROM nd LEFT JOIN (
        |    SELECT pe.v AS node, sum(h2.h) AS s FROM pe
        |    JOIN h2 ON pe.u = h2.node GROUP BY 1) x USING (node)),
        |a3 AS MATERIALIZED (
        |  SELECT node, ar / (SELECT sum(ar) FROM a3r) AS a FROM a3r),
        |h3r AS MATERIALIZED (
        |  SELECT nd.node, coalesce(x.s, 0.0) AS hr FROM nd LEFT JOIN (
        |    SELECT pe.u AS node, sum(a3.a) AS s FROM pe
        |    JOIN a3 ON pe.v = a3.node GROUP BY 1) x USING (node)),
        |h3 AS MATERIALIZED (
        |  SELECT node, hr / (SELECT sum(hr) FROM h3r) AS h FROM h3r)
        |SELECT nd.node, round(h3.h, 8) AS hub, round(a3.a, 8) AS authority
        |FROM nd JOIN h3 USING (node) JOIN a3 USING (node)
        |ORDER BY node""".stripMargin,

    // identical base+Bernoulli copy arithmetic off the same md5 uniform
    "q208_oversample" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |tg AS (SELECT max(n) AS target FROM c),
        |d AS (
        |  SELECT doc_id, documents.lang,
        |    CAST(floor(CAST(target AS DOUBLE) / n) AS BIGINT)
        |    + CASE WHEN (('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
        |          1, 15))::BIGINT::DOUBLE + 0.5) / power(16, 15)
        |        < CAST(target % n AS DOUBLE) / CAST(n AS DOUBLE)
        |      THEN 1 ELSE 0 END AS copies
        |  FROM documents JOIN c USING (lang) CROSS JOIN tg)
        |SELECT lang, doc_id, g AS copy
        |FROM d, UNNEST(generate_series(1, copies)) AS q(g)
        |ORDER BY lang, doc_id, copy""".stripMargin,

    // identical 0.5-adjusted u, per-term ln-ratio / ln(2) order, grid
    // before the top-k cut
    "q209_linkage" ->
      """WITH p AS MATERIALIZED (
        |  SELECT a.c_custkey AS a, b.c_custkey AS b,
        |    a.c_mktsegment = b.c_mktsegment AS f_seg,
        |    abs(a.c_acctbal - b.c_acctbal) < 500.0 AS f_bal
        |  FROM customer a JOIN customer b
        |    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey),
        |u AS (
        |  SELECT count(*) AS n,
        |    sum(CAST(f_seg AS INT)) AS s_seg,
        |    sum(CAST(f_bal AS INT)) AS s_bal
        |  FROM p)
        |SELECT a, b,
        |  round(
        |    (CASE WHEN f_seg THEN
        |        ln(0.9 / ((CAST(s_seg AS DOUBLE) + 0.5)
        |          / (CAST(n AS DOUBLE) + 1.0)))
        |      ELSE ln((1.0 - 0.9) / (1.0 - (CAST(s_seg AS DOUBLE) + 0.5)
        |          / (CAST(n AS DOUBLE) + 1.0))) END / ln(2.0))
        |    + (CASE WHEN f_bal THEN
        |        ln(0.85 / ((CAST(s_bal AS DOUBLE) + 0.5)
        |          / (CAST(n AS DOUBLE) + 1.0)))
        |      ELSE ln((1.0 - 0.85) / (1.0 - (CAST(s_bal AS DOUBLE) + 0.5)
        |          / (CAST(n AS DOUBLE) + 1.0))) END / ln(2.0)), 4)
        |    AS fs_score
        |FROM p CROSS JOIN u
        |ORDER BY fs_score DESC, a, b LIMIT 100""".stripMargin,

    // PAVA's pooled rates via the exact minimax identity
    // iso_i = max_{j<=i} min_{k>=i} (pos[j..k] / n[j..k]) — pure integer
    // range sums over the 5-bin grid, so the oracle needs no sequential
    // pooling loop at all
    "q210_isotonic" ->
      """WITH binned AS (
        |  SELECT LEAST(GREATEST(
        |      CAST(floor(l_discount * 10.0 / 0.2) AS INT), 0), 4) AS bin,
        |    count(*) AS n,
        |    sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS pos
        |  FROM lineitem GROUP BY 1),
        |ranges AS (
        |  SELECT j.bin AS jb, k.bin AS kb, sum(m.pos) AS p, sum(m.n) AS nn
        |  FROM binned j, binned k, binned m
        |  WHERE j.bin <= k.bin AND m.bin BETWEEN j.bin AND k.bin
        |  GROUP BY 1, 2),
        |inner_min AS (
        |  SELECT r.jb, i.bin AS ib, min(CAST(r.p AS DOUBLE) / r.nn) AS mn
        |  FROM ranges r JOIN binned i ON r.jb <= i.bin AND r.kb >= i.bin
        |  GROUP BY 1, 2),
        |iso AS (SELECT ib AS bin, max(mn) AS iso_rate FROM inner_min
        |        GROUP BY 1)
        |SELECT CAST(b.bin AS INT) AS bin, CAST(b.n AS BIGINT) AS n,
        |  round(CAST(b.pos AS DOUBLE) / b.n, 6) AS frac_pos,
        |  round(i.iso_rate, 6) AS iso_rate
        |FROM binned b JOIN iso i USING (bin) ORDER BY bin""".stripMargin,

    // q171's decomposition CTEs + q124's MAD arithmetic over the
    // 6-digit resid grid
    "q211_stl_anomaly" ->
      """WITH h AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents,
        |    CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT)
        |      AS hh
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT *, count(*) OVER win AS wn, sum(cents) OVER win AS wsum
        |  FROM h
        |  WINDOW win AS (PARTITION BY event_type ORDER BY hh
        |                 RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |t AS (
        |  SELECT *, CASE WHEN wn = 25 THEN cents * 25 - wsum END AS dt_l,
        |    hh % 24 AS phase
        |  FROM w),
        |s AS (
        |  SELECT event_type AS sk, phase AS sp,
        |    CAST(sum(dt_l) AS DOUBLE) / count(*) / 2500.0 AS seasonal
        |  FROM t WHERE dt_l IS NOT NULL GROUP BY 1, 2),
        |r AS (
        |  SELECT t.event_type,
        |    round(CAST(t.dt_l AS DOUBLE) / 2500.0 - s.seasonal, 6) AS resid
        |  FROM t JOIN s ON t.event_type = s.sk AND t.phase = s.sp
        |  WHERE t.dt_l IS NOT NULL),
        |med AS (SELECT event_type, median(resid) AS m FROM r GROUP BY 1),
        |d AS (
        |  SELECT r.event_type, abs(r.resid - med.m) AS adev
        |  FROM r JOIN med USING (event_type)),
        |md AS (SELECT event_type, median(adev) AS mad FROM d GROUP BY 1)
        |SELECT d.event_type, count(*) AS n,
        |  round(any_value(med.m), 6) AS median,
        |  round(any_value(md.mad), 6) AS mad,
        |  CAST(sum(CASE
        |    WHEN (md.mad > 0 AND
        |          d.adev > CAST(3.0 AS DOUBLE) * 1.4826 * md.mad)
        |      OR (md.mad = 0 AND d.adev > 0) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM d JOIN md USING (event_type) JOIN med USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,

    // interpolated-percentile bounds (quantile_cont ≡ Spark percentile)
    // + identical clamp, 4-digit output grid
    "q212_winsorize" ->
      """WITH f AS (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice
        |  FROM lineitem WHERE l_partkey % 7 = 0),
        |b AS (
        |  SELECT quantile_cont(l_extendedprice, 0.01) AS lo,
        |    quantile_cont(l_extendedprice, 0.99) AS hi
        |  FROM f)
        |SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  round(least(greatest(l_extendedprice, lo), hi), 4) AS w
        |FROM f CROSS JOIN b
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // identical md5(user#slot) mod max-id draw, catalog semi-join,
    // positive anti-join
    "q213_negative_sampling" ->
      """WITH pos AS (
        |  SELECT DISTINCT l_suppkey AS u, l_partkey AS item
        |  FROM lineitem),
        |users AS (SELECT DISTINCT u FROM pos),
        |mx AS (SELECT max(p_partkey) AS m FROM part),
        |cand AS (
        |  SELECT u, g AS slot,
        |    (('0x' || substr(md5(CAST(u AS VARCHAR) || '#' ||
        |        CAST(g AS VARCHAR)), 1, 15))::BIGINT
        |      % (SELECT m FROM mx)) + 1 AS item
        |  FROM users, UNNEST(generate_series(1, 3)) AS q(g)),
        |f AS (
        |  SELECT c.u, c.slot, c.item FROM cand c
        |  WHERE c.item IN (SELECT p_partkey FROM part)
        |    AND NOT EXISTS (SELECT 1 FROM pos p
        |                    WHERE p.u = c.u AND p.item = c.item))
        |SELECT u AS l_suppkey, CAST(slot AS INT) AS slot,
        |  item AS l_partkey
        |FROM f ORDER BY 1, 2""".stripMargin,

    // identical degree cap + co-occurrence count over the pruned
    // incidence
    "q214_bipartite_project" ->
      """WITH e AS (
        |  SELECT DISTINCT 's' || l_suppkey AS u, 'p' || l_partkey AS v
        |  FROM lineitem WHERE l_partkey % 5 = 0),
        |keep AS (
        |  SELECT v FROM (SELECT v, count(*) AS d FROM e GROUP BY 1)
        |  WHERE d <= 80),
        |pr AS (SELECT u, v FROM e WHERE v IN (SELECT v FROM keep))
        |SELECT a.u AS a, b.u AS b, count(*) AS weight
        |FROM pr a JOIN pr b ON a.v = b.v AND a.u < b.u
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // identical shared-grid bin cumulative + lower-edge selection
    "q215_grouped_quantiles" ->
      """WITH c AS (
        |  SELECT l_returnflag AS k,
        |    least(greatest(CAST(floor((l_extendedprice - 0.0) / 1100.0)
        |      AS INT), 0), 99) AS b,
        |    count(*) AS c
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2),
        |cum AS (
        |  SELECT k, b,
        |    sum(c) OVER (PARTITION BY k ORDER BY b
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(c) OVER (PARTITION BY k) AS n
        |  FROM c),
        |qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES (0.25), (0.5),
        |  (0.75), (0.95)) t(q)),
        |sel AS (
        |  SELECT k, q,
        |    min(CASE WHEN CAST(cum AS DOUBLE) >= q * CAST(n AS DOUBLE)
        |      THEN b END) AS bin
        |  FROM cum CROSS JOIN qs GROUP BY 1, 2)
        |SELECT k AS l_returnflag, q, CAST(bin AS INT) AS bin,
        |  0.0 + bin * 1100.0 AS value
        |FROM sel ORDER BY l_returnflag, q""".stripMargin,

    // batch phrasing of the same static join + hourly segment counts
    "q216_enriched_stream" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |    AS hour,
        |  c_mktsegment, count(*) AS n_events
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2
        |ORDER BY hour, c_mktsegment""".stripMargin,

    // q209's scoring CTEs + threshold + recursive-CTE closure (q73's
    // pattern) + cluster sizes
    "q217_entity_resolution" ->
      """WITH RECURSIVE p AS MATERIALIZED (
        |  SELECT a.c_custkey AS a, b.c_custkey AS b,
        |    a.c_mktsegment = b.c_mktsegment AS f_seg,
        |    abs(a.c_acctbal - b.c_acctbal) < 500.0 AS f_bal
        |  FROM customer a JOIN customer b
        |    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey),
        |u AS (
        |  SELECT count(*) AS n,
        |    sum(CAST(f_seg AS INT)) AS s_seg,
        |    sum(CAST(f_bal AS INT)) AS s_bal
        |  FROM p),
        |sc AS (
        |  SELECT a, b, round(
        |    (CASE WHEN f_seg THEN
        |        ln(0.9 / ((CAST(s_seg AS DOUBLE) + 0.5)
        |          / (CAST(n AS DOUBLE) + 1.0)))
        |      ELSE ln((1.0 - 0.9) / (1.0 - (CAST(s_seg AS DOUBLE) + 0.5)
        |          / (CAST(n AS DOUBLE) + 1.0))) END / ln(2.0))
        |    + (CASE WHEN f_bal THEN
        |        ln(0.85 / ((CAST(s_bal AS DOUBLE) + 0.5)
        |          / (CAST(n AS DOUBLE) + 1.0)))
        |      ELSE ln((1.0 - 0.85) / (1.0 - (CAST(s_bal AS DOUBLE) + 0.5)
        |          / (CAST(n AS DOUBLE) + 1.0))) END / ln(2.0)), 4)
        |    AS fs_score
        |  FROM p CROSS JOIN u),
        |e0 AS MATERIALIZED (SELECT a, b FROM sc WHERE fs_score >= 4.0),
        |edges AS MATERIALIZED (
        |  SELECT a AS src, b AS dst FROM e0
        |  UNION ALL SELECT b, a FROM e0),
        |cc(id, label) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, c.label FROM cc c JOIN edges e ON c.id = e.src),
        |lab AS (SELECT id, min(label) AS label FROM cc GROUP BY id),
        |sz AS (SELECT label, count(*) AS n_members FROM lab GROUP BY 1)
        |SELECT lab.id AS c_custkey, lab.label AS cluster, sz.n_members
        |FROM lab JOIN sz USING (label)
        |ORDER BY cluster, c_custkey""".stripMargin,

    // identical absolute-bucket + (ts, id) rank survivor
    "q218_once_per_window" ->
      """WITH b AS (
        |  SELECT *, epoch_us(ts) // 86400000000 AS bk FROM events),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, bk
        |    ORDER BY ts, event_id) AS rn
        |  FROM b)
        |SELECT event_id, ts, user_id, event_type, value, props,
        |  make_timestamp(bk * 86400000000) AS window_start
        |FROM r WHERE rn = 1
        |ORDER BY user_id, window_start""".stripMargin,

    // identical closed-form LLR off the cumulative integers
    "q219_sprt" ->
      """WITH e AS (
        |  SELECT date_diff('day', TIMESTAMP '1970-01-01', ts) AS day,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s
        |  FROM events),
        |p AS (
        |  SELECT day, CAST(sum(s) AS BIGINT) AS x, count(*) AS n
        |  FROM e GROUP BY 1),
        |c AS (
        |  SELECT day, x, n,
        |    sum(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS xc,
        |    sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS nc
        |  FROM p)
        |SELECT day, x, n, CAST(xc AS BIGINT) AS x_cum,
        |  CAST(nc AS BIGINT) AS n_cum,
        |  round(CAST(xc AS DOUBLE) * ln(0.2 / 0.1)
        |    + CAST(nc - xc AS DOUBLE) * ln((1.0 - 0.2) / (1.0 - 0.1)), 6)
        |    AS llr,
        |  CASE WHEN CAST(xc AS DOUBLE) * ln(0.2 / 0.1)
        |      + CAST(nc - xc AS DOUBLE) * ln((1.0 - 0.2) / (1.0 - 0.1))
        |      >= ln((1.0 - 0.2) / 0.05) THEN 'accept_h1'
        |    WHEN CAST(xc AS DOUBLE) * ln(0.2 / 0.1)
        |      + CAST(nc - xc AS DOUBLE) * ln((1.0 - 0.2) / (1.0 - 0.1))
        |      <= ln(0.2 / (1.0 - 0.05)) THEN 'accept_h0'
        |    ELSE 'continue' END AS decision
        |FROM c ORDER BY day""".stripMargin,

    // identical conditional cents sums, exact-ratio means, estimator order
    "q220_diff_in_diff" ->
      """WITH d AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    (o_orderpriority < '3') AS tr,
        |    (o_orderdate >= TIMESTAMP '1996-01-01 00:00:00') AS po
        |  FROM orders),
        |a AS (
        |  SELECT
        |    sum(CASE WHEN tr AND NOT po THEN cents END) AS s_tp,
        |    CAST(sum(CASE WHEN tr AND NOT po THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_tp,
        |    sum(CASE WHEN tr AND po THEN cents END) AS s_tq,
        |    CAST(sum(CASE WHEN tr AND po THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_tq,
        |    sum(CASE WHEN NOT tr AND NOT po THEN cents END) AS s_cp,
        |    CAST(sum(CASE WHEN NOT tr AND NOT po THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_cp,
        |    sum(CASE WHEN NOT tr AND po THEN cents END) AS s_cq,
        |    CAST(sum(CASE WHEN NOT tr AND po THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_cq
        |  FROM d),
        |m AS (
        |  SELECT n_tp, CAST(s_tp AS DOUBLE) / 100.0 / n_tp AS m_tp,
        |    n_tq, CAST(s_tq AS DOUBLE) / 100.0 / n_tq AS m_tq,
        |    n_cp, CAST(s_cp AS DOUBLE) / 100.0 / n_cp AS m_cp,
        |    n_cq, CAST(s_cq AS DOUBLE) / 100.0 / n_cq AS m_cq
        |  FROM a)
        |SELECT n_tp AS n_treat_pre, round(m_tp, 6) AS mean_treat_pre,
        |  n_tq AS n_treat_post, round(m_tq, 6) AS mean_treat_post,
        |  n_cp AS n_ctrl_pre, round(m_cp, 6) AS mean_ctrl_pre,
        |  n_cq AS n_ctrl_post, round(m_cq, 6) AS mean_ctrl_post,
        |  round((m_tq - m_tp) - (m_cq - m_cp), 6) AS did
        |FROM m""".stripMargin,

    // q28's cosine parity with the other-label filter
    "q221_hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qv, label AS q_label
        |  FROM embeddings WHERE vec_id < 3),
        |s AS (
        |  SELECT q.query_id, q.q_label, e.vec_id, e.label AS neg_label,
        |    round(list_cosine_similarity(q.qv::DOUBLE[],
        |      e.embedding::DOUBLE[]), 6) AS cos
        |  FROM q, embeddings e
        |  WHERE e.vec_id <> q.query_id AND e.label <> q.q_label),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos DESC, vec_id) AS rn
        |  FROM s)
        |SELECT query_id, q_label, vec_id, neg_label, cos,
        |  CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin,

    // identical (count desc, value asc) modal rank
    "q222_grouped_mode" ->
      """SELECT l_returnflag, l_quantity AS mode, count(*) AS mode_n
        |FROM lineitem WHERE l_quantity IS NOT NULL
        |GROUP BY 1, 2
        |QUALIFY row_number() OVER (PARTITION BY l_returnflag
        |  ORDER BY count(*) DESC, l_quantity) = 1
        |ORDER BY l_returnflag""".stripMargin,

    // 8 unrolled merge rounds (the q200 unrolled-peel pattern). Symbol
    // arrays ride as DOUBLE-space-joined strings wrapped in double
    // spaces: the pattern ' a  b ' consumes ONE delimiter space per
    // side, so a single replace() pass IS the leftmost-first
    // non-overlapping merge fold (adjacent pairs share a double space;
    // neither match starves the other).
    "q223_bpe_merges" -> {
      def rnd(r: Int): String =
        s"""m$r AS (
           |  SELECT a, b, cnt FROM (
           |    SELECT l[i] AS a, l[i+1] AS b, sum(n) AS cnt
           |    FROM (SELECT string_split(trim(s), '  ') AS l, n FROM v$r),
           |      UNNEST(generate_series(1, len(l) - 1)) t(i)
           |    GROUP BY 1, 2)
           |  WHERE cnt >= 2 ORDER BY cnt DESC, a, b LIMIT 1),
           |v${r + 1} AS MATERIALIZED (
           |  SELECT replace(s, ' ' || a || '  ' || b || ' ',
           |    ' ' || a || b || ' ') AS s, n
           |  FROM v$r CROSS JOIN m$r)""".stripMargin
      """WITH toks AS (
        |  SELECT t AS w FROM (
        |    SELECT unnest(regexp_split_to_array(text, '\s+')) AS t
        |    FROM documents)
        |  WHERE t <> ''),
        |v1 AS (
        |  SELECT '  ' || array_to_string(
        |      regexp_split_to_array(w || '_', ''), '  ') || '  ' AS s,
        |    count(*) AS n
        |  FROM toks GROUP BY 1),
        |""".stripMargin +
        (1 to 8).map(rnd).mkString(",\n") +
        "\nSELECT * FROM (\n" +
        (1 to 8).map(r =>
          s"""SELECT $r AS rank, a AS "left", b AS "right",
             |  CAST(cnt AS BIGINT) AS pair_count FROM m$r""".stripMargin)
          .mkString("\nUNION ALL ") +
        "\n) ORDER BY rank"
    },

    // identical exact month-index arithmetic + cohort-keyed cumulative
    "q224_cohort_ltv" ->
      """WITH r AS (
        |  SELECT o_custkey AS key,
        |    year(o_orderdate) * 12 + month(o_orderdate) AS m,
        |    date_trunc('month', o_orderdate) AS mo,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |c AS (SELECT key, min(m) AS cm, min(mo) AS cohort FROM r
        |      GROUP BY 1),
        |a AS (
        |  SELECT c.cohort, CAST(r.m - c.cm AS BIGINT) AS age_months,
        |    count(*) AS n_orders, sum(r.cents) AS revenue_cents
        |  FROM r JOIN c USING (key) GROUP BY 1, 2)
        |SELECT cohort, age_months, n_orders,
        |  CAST(revenue_cents AS BIGINT) AS revenue_cents,
        |  CAST(sum(revenue_cents) OVER (PARTITION BY cohort
        |    ORDER BY age_months ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS cum_revenue_cents
        |FROM a ORDER BY cohort, age_months""".stripMargin,

    // q41's TF-IDF, 6-digit grid, per-doc (tfidf desc, term) top-3
    "q225_keywords" ->
      """WITH terms AS (
        |  SELECT doc_id AS id,
        |    unnest(regexp_split_to_array(text, '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT id, term, count(*) AS tf FROM terms
        |       GROUP BY id, term),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (
        |  SELECT tf.id, tf.term,
        |    round(tf.tf * (ln((n.n_docs + 1.0) / (dfq.df + 1.0)) + 1.0), 6)
        |      AS tfidf
        |  FROM tf JOIN dfq USING (term), n),
        |rk AS (
        |  SELECT id, term, tfidf, row_number() OVER (PARTITION BY id
        |    ORDER BY tfidf DESC, term) AS rk
        |  FROM sc)
        |SELECT id, term, tfidf, CAST(rk AS INT) AS rk FROM rk
        |WHERE rk <= 3 ORDER BY id, rk""".stripMargin,

    // 6 unrolled Efron-ties Newton iterations (the q200/q223/q255
    // unrolled-CTE pattern): per iteration one duration collapse, one
    // suffix-sum window, an unnest(range(d)) tied-group discount, a
    // 5-scalar reduction, and a closed-form 2x2 solve; MATERIALIZED
    // stops DuckDB from re-inlining the chain exponentially. Both
    // engines converge to the unique partial-likelihood MLE, so the
    // 6-digit grid compares fixed points, not iteration paths.
    "q226_cox" -> {
      def rnd(r: Int): String =
        s"""byt$r AS MATERIALIZED (
           |  SELECT dur,
           |    sum(w) AS w0, sum(x1 * w) AS w1a, sum(x2 * w) AS w1b,
           |    sum(x1 * x1 * w) AS w2aa, sum(x1 * x2 * w) AS w2ab,
           |    sum(x2 * x2 * w) AS w2bb,
           |    CAST(sum(ev) AS BIGINT) AS d,
           |    sum(CASE WHEN ev = 1 THEN x1 ELSE 0 END) AS sxa,
           |    sum(CASE WHEN ev = 1 THEN x2 ELSE 0 END) AS sxb,
           |    sum(CASE WHEN ev = 1 THEN w ELSE 0 END) AS e0,
           |    sum(CASE WHEN ev = 1 THEN x1 * w ELSE 0 END) AS e1a,
           |    sum(CASE WHEN ev = 1 THEN x2 * w ELSE 0 END) AS e1b,
           |    sum(CASE WHEN ev = 1 THEN x1 * x1 * w ELSE 0 END) AS e2aa,
           |    sum(CASE WHEN ev = 1 THEN x1 * x2 * w ELSE 0 END) AS e2ab,
           |    sum(CASE WHEN ev = 1 THEN x2 * x2 * w ELSE 0 END) AS e2bb
           |  FROM (SELECT dur, ev, x1, x2, exp(b1 * x1 + b2 * x2) AS w
           |        FROM d0 CROSS JOIN b$r)
           |  GROUP BY dur),
           |sc$r AS MATERIALIZED (
           |  SELECT
           |    sum(sxa / d - ta / tz) AS u1,
           |    sum(sxb / d - tb / tz) AS u2,
           |    sum((s2aa - f * e2aa) / tz - (ta / tz) * (ta / tz)) AS h11,
           |    sum((s2ab - f * e2ab) / tz - (ta / tz) * (tb / tz)) AS h12,
           |    sum((s2bb - f * e2bb) / tz - (tb / tz) * (tb / tz)) AS h22
           |  FROM (
           |    SELECT *, s0 - f * e0 AS tz, s1a - f * e1a AS ta,
           |      s1b - f * e1b AS tb
           |    FROM (
           |      SELECT *, CAST(unnest(range(d)) AS DOUBLE) / d AS f FROM (
           |        SELECT *,
           |          sum(w0) OVER win AS s0, sum(w1a) OVER win AS s1a,
           |          sum(w1b) OVER win AS s1b, sum(w2aa) OVER win AS s2aa,
           |          sum(w2ab) OVER win AS s2ab, sum(w2bb) OVER win AS s2bb
           |        FROM byt$r
           |        WINDOW win AS (ORDER BY dur DESC ROWS UNBOUNDED PRECEDING))
           |      WHERE d > 0))),
           |b${r + 1} AS MATERIALIZED (
           |  SELECT b1 + (h22 * u1 - h12 * u2) / (h11 * h22 - h12 * h12) AS b1,
           |    b2 + (h11 * u2 - h12 * u1) / (h11 * h22 - h12 * h12) AS b2
           |  FROM b$r CROSS JOIN sc$r)""".stripMargin
      val n = 6
      """WITH per AS (
        |  SELECT user_id, min(ts) AS t0,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
        |    max(ts) AS tl, avg(value) AS av, count(*) / 100.0 AS ne
        |  FROM events GROUP BY 1),
        |d0 AS MATERIALIZED (
        |  SELECT CAST(epoch_us(coalesce(tp, tl)) - epoch_us(t0) AS DOUBLE)
        |      / 3600000000.0 AS dur,
        |    CAST(tp IS NOT NULL AS INT) AS ev, av AS x1, ne AS x2
        |  FROM per WHERE av IS NOT NULL),
        |b0 AS (SELECT 0.0 AS b1, 0.0 AS b2),
        |""".stripMargin +
        (0 to n).map(rnd).mkString(",\n") +
        s"""
           |SELECT * FROM (
           |  SELECT 'avg_value' AS feature, round(b1, 6) AS beta,
           |    round(sqrt(h22 / (h11 * h22 - h12 * h12)), 6) AS se
           |  FROM b$n CROSS JOIN sc$n
           |  UNION ALL
           |  SELECT 'n_events_h', round(b2, 6),
           |    round(sqrt(h11 / (h11 * h22 - h12 * h12)), 6)
           |  FROM b$n CROSS JOIN sc$n)
           |ORDER BY feature""".stripMargin
    },

    // identical cap + pair counts + exact-ratio metric order
    "q227_assoc_rules" ->
      """WITH inc AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey % 50 AS i
        |  FROM lineitem),
        |keep AS (SELECT b FROM (
        |  SELECT b, count(*) AS n FROM inc GROUP BY 1) WHERE n <= 50),
        |pr AS (SELECT b, i FROM inc WHERE b IN (SELECT b FROM keep)),
        |nb AS (SELECT count(DISTINCT b) AS n FROM pr),
        |itemn AS (SELECT i, count(*) AS n_i FROM pr GROUP BY 1),
        |pairs AS (
        |  SELECT a.i AS i, b.i AS i2, count(*) AS n_both
        |  FROM pr a JOIN pr b ON a.b = b.b AND a.i < b.i
        |  GROUP BY 1, 2 HAVING count(*) >= 80),
        |bi AS (
        |  SELECT i AS antecedent, i2 AS consequent, n_both FROM pairs
        |  UNION ALL SELECT i2, i, n_both FROM pairs)
        |SELECT antecedent, consequent, n_both,
        |  na.n_i AS n_ante, nc.n_i AS n_cons,
        |  round(CAST(n_both AS DOUBLE) / (SELECT n FROM nb), 6)
        |    AS support,
        |  round(CAST(n_both AS DOUBLE) / na.n_i, 6) AS confidence,
        |  round(CAST((SELECT n FROM nb) AS DOUBLE) * n_both /
        |    (CAST(na.n_i AS DOUBLE) * nc.n_i), 6) AS lift
        |FROM bi
        |JOIN itemn na ON bi.antecedent = na.i
        |JOIN itemn nc ON bi.consequent = nc.i
        |ORDER BY antecedent, consequent""".stripMargin,

    // identical first-cause frame + layered KM⁻/CIF window cumsum
    "q228_competing_risks" ->
      """WITH per AS (
        |  SELECT user_id, min(ts) AS t0,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
        |    min(CASE WHEN event_type = 'error' THEN ts END) AS te,
        |    max(ts) AS tl
        |  FROM events GROUP BY 1),
        |f AS (
        |  SELECT coalesce(least(tp, te), tp, te, tl) AS tev, t0,
        |    CASE WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te) THEN 1
        |         WHEN te IS NOT NULL THEN 2 ELSE 0 END AS cause
        |  FROM per),
        |dur AS (
        |  SELECT CAST(epoch_us(tev) - epoch_us(t0) AS DOUBLE)
        |      / 3600000000.0 AS dur, cause
        |  FROM f),
        |agg AS (SELECT dur AS t, cause, count(*) AS cnt FROM dur
        |        GROUP BY 1, 2),
        |byt AS (
        |  SELECT t, sum(cnt) AS tot,
        |    sum(CASE WHEN cause <> 0 THEN cnt ELSE 0 END) AS d_all
        |  FROM agg GROUP BY 1),
        |r1 AS (
        |  SELECT t, d_all,
        |    sum(tot) OVER () - coalesce(sum(tot) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n_risk
        |  FROM byt),
        |r2 AS (
        |  SELECT t, n_risk,
        |    exp(coalesce(sum(CASE WHEN d_all < n_risk
        |      THEN ln(1 - CAST(d_all AS DOUBLE) / n_risk) ELSE 0.0 END)
        |      OVER (ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0))
        |      AS s_minus
        |  FROM r1),
        |ev AS (
        |  SELECT agg.t, agg.cause, agg.cnt, r2.n_risk, r2.s_minus
        |  FROM agg JOIN r2 USING (t) WHERE cause <> 0),
        |c AS (
        |  SELECT t, cause, n_risk, cnt AS d,
        |    sum(s_minus * CAST(cnt AS DOUBLE) / n_risk)
        |      OVER (PARTITION BY cause ORDER BY t ROWS UNBOUNDED PRECEDING)
        |      AS cif
        |  FROM ev)
        |SELECT round(t, 6) AS t, cause, CAST(n_risk AS BIGINT) AS n_risk,
        |  d, round(cif, 6) AS cif
        |FROM c ORDER BY t, cause""".stripMargin,

    // 8 unrolled Newton iterations on the observed Hessian of the
    // cumulative-logit likelihood, 4x4 solve via generated Cramer
    // determinants. The data collapses to (band, discount, tax) cells
    // (~300), so each iteration is one cell pass; the oracle starts at
    // the same empirical-cumulative-logit init as Ordinal.fit and both
    // engines land on the unique MLE of the concave likelihood — the
    // 6-digit grid compares fixed points, not BHHH-vs-Newton paths.
    "q229_ordinal" -> {
      def det(m: Vector[Vector[String]]): String =
        if (m.size == 1) m(0)(0)
        else m(0).indices.map { j =>
          val minor = m.tail.map(row => row.patch(j, Nil, 1))
          val sign = if (j % 2 == 0) "" else "-"
          s"$sign${m(0)(j)} * (${det(minor)})"
        }.mkString(" + ").replace("+ -", "- ")
      val mM = Vector.tabulate(4, 4)((i, j) =>
        s"m${math.min(i, j) + 1}${math.max(i, j) + 1}")
      val gv = Vector("g1", "g2", "g3", "g4")
      val detM = det(mM)
      val deltas = (0 until 4).map(i => det(Vector.tabulate(4, 4)((r, c) =>
        if (c == i) gv(r) else mM(r)(c))))
      def rnd(r: Int): String =
        s"""sc$r AS MATERIALIZED (
           |  SELECT
           |    sum(n * pu1 / pp) AS g1, sum(n * pu2 / pp) AS g2,
           |    sum(n * pu3 / pp) AS g3, sum(n * pu4 / pp) AS g4,
           |    sum(n * (pu1 * pu1 / (pp * pp) - a * spp1 / pp)) AS m11,
           |    sum(n * (pu1 * pu2 / (pp * pp))) AS m12,
           |    sum(n * (pu1 * pu3 / (pp * pp) + x1 * a * spp1 / pp)) AS m13,
           |    sum(n * (pu1 * pu4 / (pp * pp) + x2 * a * spp1 / pp)) AS m14,
           |    sum(n * (pu2 * pu2 / (pp * pp) - b * spp2 / pp)) AS m22,
           |    sum(n * (pu2 * pu3 / (pp * pp) + x1 * b * spp2 / pp)) AS m23,
           |    sum(n * (pu2 * pu4 / (pp * pp) + x2 * b * spp2 / pp)) AS m24,
           |    sum(n * (pu3 * pu3 / (pp * pp)
           |      - x1 * x1 * (a * spp1 + b * spp2) / pp)) AS m33,
           |    sum(n * (pu3 * pu4 / (pp * pp)
           |      - x1 * x2 * (a * spp1 + b * spp2) / pp)) AS m34,
           |    sum(n * (pu4 * pu4 / (pp * pp)
           |      - x2 * x2 * (a * spp1 + b * spp2) / pp)) AS m44
           |  FROM (
           |    SELECT *, a * s1 + b * s2 + c3 AS pp,
           |      a * sp1 AS pu1, b * sp2 AS pu2,
           |      -x1 * (a * sp1 + b * sp2) AS pu3,
           |      -x2 * (a * sp1 + b * sp2) AS pu4,
           |      sp1 * (1 - 2 * s1) AS spp1, sp2 * (1 - 2 * s2) AS spp2
           |    FROM (
           |      SELECT *, s1 * (1 - s1) AS sp1, s2 * (1 - s2) AS sp2 FROM (
           |        SELECT cells.*, it$r.*,
           |          1 / (1 + exp(-(th1 - (bb1 * x1 + bb2 * x2)))) AS s1,
           |          1 / (1 + exp(-(th2 - (bb1 * x1 + bb2 * x2)))) AS s2
           |        FROM cells CROSS JOIN it$r)))),
           |it${r + 1} AS MATERIALIZED (
           |  SELECT th1 + (${deltas(0)}) / dd AS th1,
           |    th2 + (${deltas(1)}) / dd AS th2,
           |    bb1 + (${deltas(2)}) / dd AS bb1,
           |    bb2 + (${deltas(3)}) / dd AS bb2
           |  FROM it$r CROSS JOIN (SELECT *, $detM AS dd FROM sc$r))"""
          .stripMargin
      val n = 8
      """WITH cells AS MATERIALIZED (
        |  SELECT y, x1, x2, n,
        |    CASE WHEN y = 1 THEN 1.0 WHEN y = 2 THEN -1.0 ELSE 0.0 END AS a,
        |    CASE WHEN y = 2 THEN 1.0 WHEN y = 3 THEN -1.0 ELSE 0.0 END AS b,
        |    CASE WHEN y = 3 THEN 1.0 ELSE 0.0 END AS c3
        |  FROM (
        |    SELECT CASE WHEN l_quantity < 18 THEN 1
        |      WHEN l_quantity <= 35 THEN 2 ELSE 3 END AS y,
        |      l_discount AS x1, l_tax AS x2, CAST(count(*) AS DOUBLE) AS n
        |    FROM lineitem GROUP BY 1, 2, 3)),
        |it0 AS (
        |  SELECT ln(c1 / (nn - c1)) AS th1,
        |    ln((c1 + c2) / (nn - c1 - c2)) AS th2, 0.0 AS bb1, 0.0 AS bb2
        |  FROM (SELECT sum(CASE WHEN y = 1 THEN n ELSE 0 END) AS c1,
        |          sum(CASE WHEN y = 2 THEN n ELSE 0 END) AS c2, sum(n) AS nn
        |        FROM cells)),
        |""".stripMargin +
        (0 until n).map(rnd).mkString(",\n") +
        s"""
           |SELECT * FROM (
           |  SELECT 'beta_l_discount' AS param, round(bb1, 6) AS value
           |  FROM it$n
           |  UNION ALL SELECT 'beta_l_tax', round(bb2, 6) FROM it$n
           |  UNION ALL SELECT 'theta_1', round(th1, 6) FROM it$n
           |  UNION ALL SELECT 'theta_2', round(th2, 6) FROM it$n)
           |ORDER BY param""".stripMargin
    },

    // identical one-pass bin sums + Murphy-term arithmetic order
    "q230_brier" ->
      """WITH d AS (
        |  SELECT l_discount * 10.0 AS s, CAST(l_quantity > 25 AS INT) AS y
        |  FROM lineitem),
        |b AS (
        |  SELECT least(greatest(CAST(floor((s - 0.0) / 0.2) AS INT), 0), 4)
        |      AS bin,
        |    count(*) AS n, CAST(sum(y) AS BIGINT) AS pos,
        |    sum(s) AS ss, sum(s * s) AS ss2,
        |    sum(CASE WHEN y = 1 THEN s ELSE 0.0 END) AS ssy
        |  FROM d GROUP BY 1),
        |t AS (SELECT sum(n) AS nn, sum(pos) AS pp FROM b)
        |SELECT CAST(any_value(nn) AS BIGINT) AS n,
        |  round(sum(ss2 - 2.0 * ssy + CAST(pos AS DOUBLE)) / any_value(nn),
        |    6) AS brier,
        |  round(sum(n * (ss / n - CAST(pos AS DOUBLE) / n) *
        |    (ss / n - CAST(pos AS DOUBLE) / n)) / any_value(nn), 6)
        |    AS reliability,
        |  round(sum(n * (CAST(pos AS DOUBLE) / n -
        |      CAST(pp AS DOUBLE) / nn) *
        |    (CAST(pos AS DOUBLE) / n - CAST(pp AS DOUBLE) / nn))
        |    / any_value(nn), 6) AS resolution,
        |  round(any_value(CAST(pp AS DOUBLE) / nn *
        |    (1.0 - CAST(pp AS DOUBLE) / nn)), 6) AS uncertainty,
        |  round(sum(ss2 - n * (ss / n) * (ss / n)) / any_value(nn), 6)
        |    AS within_bin_var
        |FROM b CROSS JOIN t""".stripMargin,

    // identical descending cumulative, ceil rank-share tiles, ratio order
    "q231_gains" ->
      """WITH bys AS (
        |  SELECT CAST(l_extendedprice AS DOUBLE) AS s, count(*) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS pos
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
        |t AS (SELECT sum(n) AS nn, sum(pos) AS pp FROM bys),
        |c AS (
        |  SELECT n, pos,
        |    sum(n) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING) AS cn
        |  FROM bys),
        |ti AS (
        |  SELECT CAST(ceil(10.0 * CAST(cn AS DOUBLE) /
        |      CAST(nn AS DOUBLE)) AS INT) AS tile,
        |    n, pos, nn, pp
        |  FROM c CROSS JOIN t),
        |bt AS (
        |  SELECT tile, sum(n) AS n, sum(pos) AS n_pos,
        |    any_value(nn) AS nn, any_value(pp) AS pp
        |  FROM ti GROUP BY 1),
        |f AS (
        |  SELECT tile, n, n_pos,
        |    sum(n) OVER (ORDER BY tile ROWS UNBOUNDED PRECEDING) AS cum_n,
        |    sum(n_pos) OVER (ORDER BY tile ROWS UNBOUNDED PRECEDING)
        |      AS cum_pos,
        |    nn, pp
        |  FROM bt)
        |SELECT tile, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
        |  CAST(cum_n AS BIGINT) AS cum_n, CAST(cum_pos AS BIGINT) AS cum_pos,
        |  round(CASE WHEN pp > 0 THEN CAST(cum_pos AS DOUBLE) / pp END, 6)
        |    AS capture,
        |  round(CASE WHEN pp > 0 THEN (CAST(cum_pos AS DOUBLE) / cum_n) /
        |    (CAST(pp AS DOUBLE) / nn) END, 6) AS lift
        |FROM f ORDER BY tile""".stripMargin,

    // identical successor pairing, bigram slices, clipped-count join and
    // ratio order
    "q232_rouge" ->
      """WITH t1 AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '') AS t
        |  FROM documents),
        |p AS (
        |  SELECT a.doc_id AS id, a.t AS rt, b.t AS ct
        |  FROM t1 a JOIN t1 b ON b.doc_id = a.doc_id + 1),
        |rg AS (
        |  SELECT id, array_to_string(list_slice(rt, i, i + 1), ' ') AS g
        |  FROM p, UNNEST(generate_series(1, greatest(len(rt) - 1, 0)))
        |    q(i)),
        |cg AS (
        |  SELECT id, array_to_string(list_slice(ct, i, i + 1), ' ') AS g
        |  FROM p, UNNEST(generate_series(1, greatest(len(ct) - 1, 0)))
        |    q(i)),
        |rc AS (SELECT id, g, count(*) AS rcn FROM rg GROUP BY 1, 2),
        |cc AS (SELECT id, g, count(*) AS ccn FROM cg GROUP BY 1, 2),
        |j AS (
        |  SELECT coalesce(rc.id, cc.id) AS id,
        |    coalesce(rc.rcn, 0) AS rcn, coalesce(cc.ccn, 0) AS ccn
        |  FROM rc FULL OUTER JOIN cc ON rc.id = cc.id AND rc.g = cc.g),
        |a AS (
        |  SELECT id, CAST(sum(rcn) AS BIGINT) AS n_ref,
        |    CAST(sum(ccn) AS BIGINT) AS n_cand,
        |    CAST(sum(least(rcn, ccn)) AS BIGINT) AS overlap
        |  FROM j GROUP BY 1)
        |SELECT id AS doc_id, n_ref, n_cand, overlap,
        |  round(CASE WHEN n_cand > 0
        |    THEN CAST(overlap AS DOUBLE) / n_cand END, 6) AS "precision",
        |  round(CASE WHEN n_ref > 0
        |    THEN CAST(overlap AS DOUBLE) / n_ref END, 6) AS recall,
        |  round(CASE WHEN n_ref > 0 AND n_cand > 0 AND overlap > 0 THEN
        |      2.0 * (CAST(overlap AS DOUBLE) / n_cand) *
        |        (CAST(overlap AS DOUBLE) / n_ref) /
        |        (CAST(overlap AS DOUBLE) / n_cand +
        |          CAST(overlap AS DOUBLE) / n_ref)
        |    WHEN n_ref > 0 AND n_cand > 0 THEN 0.0 END, 6) AS f1
        |FROM a ORDER BY doc_id""".stripMargin,

    // identical tokenization, (cnt desc, token) ranks, closed-form OLS
    "q233_zipf" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '')) AS token
        |  FROM documents),
        |v AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
        |r AS (
        |  SELECT ln(CAST(row_number() OVER (ORDER BY cnt DESC, token)
        |      AS DOUBLE)) AS x,
        |    ln(CAST(cnt AS DOUBLE)) AS y, cnt
        |  FROM v),
        |s AS (
        |  SELECT count(*) AS v, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
        |    sum(x * y) AS sxy, sum(y * y) AS syy
        |  FROM r)
        |SELECT n_tokens, v AS vocab,
        |  round((v * sxy - sx * sy) / (v * sxx - sx * sx), 6) AS slope,
        |  round((sy - (v * sxy - sx * sy) / (v * sxx - sx * sx) * sx) / v,
        |    6) AS intercept,
        |  round(pow(v * sxy - sx * sy, 2) /
        |    ((v * sxx - sx * sx) * (v * syy - sy * sy)), 6) AS r2
        |FROM s""".stripMargin,

    // identical md5-sixteenth nesting; regr_r2 ≡ OLS R² with intercept
    "q234_learning_curve" ->
      """WITH base AS (
        |  SELECT l_quantity AS x, l_extendedprice AS y,
        |    substr(md5(CAST(l_orderkey AS VARCHAR) || '#' ||
        |      CAST(l_linenumber AS VARCHAR)), 32, 1) AS d
        |  FROM lineitem)
        |SELECT 4 AS sixteenths, CAST(count(*) AS BIGINT) AS n,
        |  round(regr_r2(y, x), 6) AS r2 FROM base WHERE d < '4'
        |UNION ALL
        |SELECT 8, CAST(count(*) AS BIGINT), round(regr_r2(y, x), 6)
        |FROM base WHERE d < '8'
        |UNION ALL
        |SELECT 16, CAST(count(*) AS BIGINT), round(regr_r2(y, x), 6)
        |FROM base
        |ORDER BY sixteenths""".stripMargin,

    // identical per-type scaled-Long CUSUM + (|s| desc, day) peak rank
    "q235_cusum_grouped" ->
      """WITH d AS (
        |  SELECT event_type,
        |    date_diff('day', TIMESTAMP '1970-01-01', ts) AS day,
        |    sum(CAST(round(value * 100, 0) AS BIGINT)) AS x
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, day, x,
        |    count(*) OVER (PARTITION BY event_type) AS n,
        |    sum(x) OVER (PARTITION BY event_type) AS g,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
        |    sum(x) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS cx
        |  FROM d),
        |s AS (SELECT event_type, day, n * cx - t * g AS sc FROM w)
        |SELECT event_type, day AS peak_day, CAST(sc AS BIGINT) AS s_scaled
        |FROM s
        |QUALIFY row_number() OVER (PARTITION BY event_type
        |  ORDER BY abs(sc) DESC, day) = 1
        |ORDER BY event_type""".stripMargin,

    // identical md5-mod-64 dimension mapping
    "q236_hashing_tf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(
        |    regexp_split_to_array(text, '\s+'), x -> x <> '')) AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST((('0x' || substr(md5(t), 1, 15))::BIGINT % 64) AS INT)
        |    AS dim,
        |  count(*) AS cnt
        |FROM tok GROUP BY 1, 2
        |ORDER BY doc_id, dim""".stripMargin,

    // identical position×offset generation with the edge guards
    "q237_skipgrams" ->
      """WITH toks AS (
        |  SELECT list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '') AS t
        |  FROM documents),
        |pos AS (
        |  SELECT t, i, t[i] AS center
        |  FROM toks, UNNEST(generate_series(1, len(t))) q(i)),
        |pr AS (
        |  SELECT center, t[i + o] AS context, abs(o) AS d
        |  FROM pos, UNNEST([-2, -1, 1, 2]) r(o)
        |  WHERE i + o >= 1 AND i + o <= len(t))
        |SELECT center, context, count(*) AS n_pairs,
        |  round(sum(1.0 / d), 6) AS sum_weight
        |FROM pr GROUP BY 1, 2
        |ORDER BY center, context""".stripMargin,

    // identical cap, co-occurrence counts, margins, and cosine order
    "q238_item_cf" ->
      """WITH inc0 AS (
        |  SELECT DISTINCT l_partkey % 50 AS u, l_orderkey AS v
        |  FROM lineitem),
        |keep AS (SELECT v FROM (
        |  SELECT v, count(*) AS d FROM inc0 GROUP BY 1) WHERE d <= 50),
        |inc AS (SELECT u, v FROM inc0 WHERE v IN (SELECT v FROM keep)),
        |proj AS (
        |  SELECT a.u AS a, b.u AS b, count(*) AS weight
        |  FROM inc a JOIN inc b ON a.v = b.v AND a.u < b.u
        |  GROUP BY 1, 2),
        |deg AS (SELECT u, count(*) AS n_i FROM inc GROUP BY 1)
        |SELECT p.a, p.b, p.weight, da.n_i AS n_a, db.n_i AS n_b,
        |  round(CAST(p.weight AS DOUBLE) /
        |    sqrt(CAST(da.n_i * db.n_i AS DOUBLE)), 6) AS score
        |FROM proj p
        |JOIN deg da ON p.a = da.u
        |JOIN deg db ON p.b = db.u
        |ORDER BY p.a, p.b""".stripMargin,

    // q126's unrounded KM + identical lag-window step integral and tail
    "q239_rmst" ->
      """WITH per AS (
        |  SELECT user_id, min(ts) AS t0,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
        |    max(ts) AS tl
        |  FROM events GROUP BY 1),
        |dur AS (
        |  SELECT CAST(epoch_us(coalesce(tp, tl)) - epoch_us(t0) AS DOUBLE)
        |      / 3600000000.0 AS dur,
        |    CAST(tp IS NOT NULL AS INT) AS ev
        |  FROM per),
        |agg AS (
        |  SELECT dur AS t, CAST(sum(ev) AS BIGINT) AS d,
        |    CAST(sum(1 - ev) AS BIGINT) AS c
        |  FROM dur GROUP BY 1),
        |km AS (
        |  SELECT t, d, c,
        |    sum(d + c) OVER ()
        |      - coalesce(sum(d + c) OVER (ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n_risk
        |  FROM agg),
        |sv AS (
        |  SELECT t, d, c,
        |    CASE WHEN max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
        |        OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) = 1 THEN 0.0
        |      ELSE exp(sum(CASE WHEN d < n_risk
        |        THEN ln(1 - CAST(d AS DOUBLE) / n_risk) ELSE 0.0 END)
        |        OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)) END AS s
        |  FROM km),
        |st AS (
        |  SELECT t, d, c, s,
        |    coalesce(lag(t) OVER (ORDER BY t), 0.0) AS tp,
        |    coalesce(lag(s) OVER (ORDER BY t), 1.0) AS sp
        |  FROM sv),
        |a AS (
        |  SELECT
        |    sum(CASE WHEN tp < 400.0
        |      THEN sp * (least(t, 400.0) - tp) ELSE 0.0 END) AS seg,
        |    max(t) AS mt, arg_max(s, t) AS ls,
        |    CAST(sum(d + c) AS BIGINT) AS n, CAST(sum(d) AS BIGINT)
        |      AS n_events
        |  FROM st)
        |SELECT 400.0 AS tau,
        |  round(seg + CASE WHEN mt < 400.0
        |    THEN ls * (400.0 - mt) ELSE 0.0 END, 6) AS rmst,
        |  n, n_events
        |FROM a""".stripMargin,

    // identical conditional counts + unrounded max-reference ratios
    "q240_fairness" ->
      """WITH d AS (
        |  SELECT c_mktsegment,
        |    CAST(o_totalprice > 150000.0 AS INT) AS y,
        |    CAST(o_orderpriority < '3' AS INT) AS p
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |g AS (
        |  SELECT c_mktsegment, count(*) AS n,
        |    CAST(sum(y) AS BIGINT) AS n_pos_label,
        |    CAST(sum(p) AS BIGINT) AS sel,
        |    CAST(sum(CASE WHEN y = 1 AND p = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN y = 0 AND p = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fp
        |  FROM d GROUP BY 1)
        |SELECT c_mktsegment, n, n_pos_label,
        |  round(CAST(sel AS DOUBLE) / n, 6) AS selection_rate,
        |  round(CASE WHEN n_pos_label > 0
        |    THEN CAST(tp AS DOUBLE) / n_pos_label END, 6) AS tpr,
        |  round(CASE WHEN n > n_pos_label
        |    THEN CAST(fp AS DOUBLE) / (n - n_pos_label) END, 6) AS fpr,
        |  round((CAST(sel AS DOUBLE) / n) /
        |    max(CAST(sel AS DOUBLE) / n) OVER (), 6) AS rate_ratio,
        |  round((CASE WHEN n_pos_label > 0
        |      THEN CAST(tp AS DOUBLE) / n_pos_label END) /
        |    max(CASE WHEN n_pos_label > 0
        |      THEN CAST(tp AS DOUBLE) / n_pos_label END) OVER (), 6)
        |    AS tpr_ratio
        |FROM g ORDER BY c_mktsegment""".stripMargin,

    // identical conditional moments + sample-variance pooled SMD order
    "q241_smd" ->
      """WITH d AS (
        |  SELECT (o_orderpriority < '3') AS tr,
        |    o_totalprice AS x1,
        |    CAST(date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)
        |      AS DOUBLE) AS x2
        |  FROM orders),
        |a AS (
        |  SELECT
        |    CAST(sum(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN NOT tr THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |    sum(CASE WHEN tr THEN x1 END) AS st1,
        |    sum(CASE WHEN tr THEN x1 * x1 END) AS qt1,
        |    sum(CASE WHEN NOT tr THEN x1 END) AS sc1,
        |    sum(CASE WHEN NOT tr THEN x1 * x1 END) AS qc1,
        |    sum(CASE WHEN tr THEN x2 END) AS st2,
        |    sum(CASE WHEN tr THEN x2 * x2 END) AS qt2,
        |    sum(CASE WHEN NOT tr THEN x2 END) AS sc2,
        |    sum(CASE WHEN NOT tr THEN x2 * x2 END) AS qc2
        |  FROM d)
        |SELECT 'o_totalprice' AS covariate,
        |  round(st1 / nt, 6) AS mean_treat, round(sc1 / nc, 6)
        |    AS mean_ctrl,
        |  round(CASE WHEN sqrt(((qt1 - st1 * st1 / nt) / (nt - 1)
        |      + (qc1 - sc1 * sc1 / nc) / (nc - 1)) / 2.0) > 0
        |    THEN (st1 / nt - sc1 / nc) /
        |      sqrt(((qt1 - st1 * st1 / nt) / (nt - 1)
        |        + (qc1 - sc1 * sc1 / nc) / (nc - 1)) / 2.0) END, 6) AS smd
        |FROM a
        |UNION ALL
        |SELECT 'order_day',
        |  round(st2 / nt, 6), round(sc2 / nc, 6),
        |  round(CASE WHEN sqrt(((qt2 - st2 * st2 / nt) / (nt - 1)
        |      + (qc2 - sc2 * sc2 / nc) / (nc - 1)) / 2.0) > 0
        |    THEN (st2 / nt - sc2 / nc) /
        |      sqrt(((qt2 - st2 * st2 / nt) / (nt - 1)
        |        + (qc2 - sc2 * sc2 / nc) / (nc - 1)) / 2.0) END, 6)
        |FROM a
        |ORDER BY covariate""".stripMargin,

    // q127's rank identity with PARTITION BY group
    "q242_grouped_auc" ->
      """WITH d AS (
        |  SELECT l_returnflag AS g, l_discount AS s,
        |    CAST(l_quantity > 25 AS INT) AS y
        |  FROM lineitem),
        |bs AS (
        |  SELECT g, s, CAST(sum(y) AS BIGINT) AS p,
        |    CAST(sum(1 - y) AS BIGINT) AS n
        |  FROM d GROUP BY 1, 2),
        |c AS (
        |  SELECT g, p, n,
        |    sum(n) OVER (PARTITION BY g ORDER BY s
        |      ROWS UNBOUNDED PRECEDING) - n AS nb
        |  FROM bs)
        |SELECT g AS l_returnflag,
        |  round(CASE WHEN sum(p) > 0 AND sum(n) > 0 THEN
        |    CAST(sum(p * (2 * nb + n)) AS DOUBLE) /
        |      (2.0 * sum(p) * sum(n)) END, 6) AS auc,
        |  CAST(sum(p) AS BIGINT) AS n_pos, CAST(sum(n) AS BIGINT) AS n_neg
        |FROM c GROUP BY g ORDER BY l_returnflag""".stripMargin,

    // identical RE2-safe patterns; INT cast matches Spark regexp_count
    "q243_pattern_counts" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\bdata\b')) AS INT)
        |    AS n_data,
        |  CAST(len(regexp_extract_all(text, '[aeiou][aeiou]')) AS INT)
        |    AS n_double_vowel,
        |  CAST(len(regexp_extract_all(text, '[a-z]+s\b')) AS INT)
        |    AS n_s_words
        |FROM documents ORDER BY doc_id""".stripMargin,

    // identical joint-vocab add-one smoothing; single integer-ratio
    // divisions then 6-digit sums
    "q245_unigram_divergence" ->
      """WITH ca AS (
        |  SELECT x AS w, count(*) AS c FROM (
        |    SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> '')) AS x
        |    FROM documents WHERE doc_id % 2 = 0)
        |  GROUP BY 1),
        |cb AS (
        |  SELECT x AS w, count(*) AS c FROM (
        |    SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> '')) AS x
        |    FROM documents WHERE doc_id % 2 = 1)
        |  GROUP BY 1),
        |j AS (
        |  SELECT coalesce(ca.c, 0) AS cca, coalesce(cb.c, 0) AS ccb
        |  FROM ca FULL OUTER JOIN cb ON ca.w = cb.w),
        |t AS (
        |  SELECT count(*) AS vocab, CAST(sum(cca) AS BIGINT) AS n_a,
        |    CAST(sum(ccb) AS BIGINT) AS n_b
        |  FROM j),
        |pq AS (
        |  SELECT CAST(cca + 1 AS DOUBLE) / (n_a + vocab) AS p,
        |    CAST(ccb + 1 AS DOUBLE) / (n_b + vocab) AS q,
        |    vocab, n_a, n_b
        |  FROM j CROSS JOIN t)
        |SELECT vocab, n_a, n_b,
        |  round(-sum(p * ln(q)), 6) AS cross_entropy,
        |  round(-sum(p * ln(p)), 6) AS entropy_a,
        |  round(sum(p * ln(p / q)), 6) AS kl_ab
        |FROM pq GROUP BY vocab, n_a, n_b""".stripMargin,

    // identical share/budget arithmetic order for bit-equal rates
    "q246_mixture_rates" ->
      """WITH s AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> ''))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot,
        |      count(*) AS nsrc FROM s)
        |SELECT source, n_docs, n_tokens,
        |  round(1.0 / nsrc, 6) AS target_share,
        |  round(least(1.0, 1.0 / nsrc * (0.5 * tot) / n_tokens), 6)
        |    AS rate,
        |  CAST(round(least(1.0, 1.0 / nsrc * (0.5 * tot) / n_tokens)
        |    * n_tokens) AS BIGINT) AS expected_tokens
        |FROM s CROSS JOIN t ORDER BY source""".stripMargin,

    // identical cell collapse, one-vs-rest margins, avg-skips-null macro
    "q247_multiclass" ->
      """WITH d AS (
        |  SELECT l_returnflag AS l,
        |    CASE WHEN l_quantity > 30 THEN 'R'
        |      WHEN l_discount > 0.05 THEN 'A' ELSE 'N' END AS p
        |  FROM lineitem),
        |cells AS (SELECT l, p, count(*) AS n FROM d GROUP BY 1, 2),
        |bt AS (
        |  SELECT l AS class, CAST(sum(n) AS BIGINT) AS n_true,
        |    CAST(sum(CASE WHEN p = l THEN n ELSE 0 END) AS BIGINT) AS tp
        |  FROM cells GROUP BY 1),
        |bp AS (SELECT p AS class, CAST(sum(n) AS BIGINT) AS n_pred
        |       FROM cells GROUP BY 1),
        |pc AS (
        |  SELECT class, coalesce(n_true, 0) AS n_true,
        |    coalesce(n_pred, 0) AS n_pred, coalesce(tp, 0) AS tp
        |  FROM bt FULL OUTER JOIN bp USING (class)),
        |m AS (
        |  SELECT class, n_true, n_pred, tp,
        |    CASE WHEN n_pred > 0 THEN CAST(tp AS DOUBLE) / n_pred END
        |      AS precision,
        |    CASE WHEN n_true > 0 THEN CAST(tp AS DOUBLE) / n_true END
        |      AS recall,
        |    CASE WHEN n_pred > 0 AND n_true > 0 THEN
        |      CASE WHEN tp > 0 THEN 2.0 * tp / (n_pred + n_true)
        |        ELSE 0.0 END END AS f1
        |  FROM pc)
        |SELECT class, n_true, n_pred, tp,
        |  round(precision, 6) AS precision, round(recall, 6) AS recall,
        |  round(f1, 6) AS f1
        |FROM m
        |UNION ALL
        |SELECT '__macro__', CAST(sum(n_true) AS BIGINT),
        |  CAST(sum(n_pred) AS BIGINT), CAST(sum(tp) AS BIGINT),
        |  round(avg(precision), 6), round(avg(recall), 6),
        |  round(avg(f1), 6)
        |FROM m
        |ORDER BY class""".stripMargin,

    // identical (score desc, doc) / (rel desc, doc) total orders and
    // exponential-gain arithmetic
    "q248_ndcg" ->
      """WITH d AS (
        |  SELECT source, doc_id, n_chars AS score,
        |    CASE lang WHEN 'en' THEN 3 WHEN 'fr' THEN 2
        |      WHEN 'de' THEN 1 ELSE 0 END AS rel
        |  FROM documents),
        |r AS (
        |  SELECT source, rel,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY score DESC, doc_id) AS rk,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY rel DESC, doc_id) AS rki
        |  FROM d),
        |a AS (
        |  SELECT source, count(*) AS n_candidates,
        |    sum(CASE WHEN rk <= 10 THEN (pow(2.0, rel) - 1.0)
        |      / log2(rk + 1.0) ELSE 0.0 END) AS dcg,
        |    sum(CASE WHEN rki <= 10 THEN (pow(2.0, rel) - 1.0)
        |      / log2(rki + 1.0) ELSE 0.0 END) AS idcg
        |  FROM r GROUP BY 1)
        |SELECT source, n_candidates, round(dcg, 6) AS dcg,
        |  round(idcg, 6) AS idcg,
        |  round(CASE WHEN idcg > 0 THEN dcg / idcg END, 6) AS ndcg
        |FROM a ORDER BY source""".stripMargin,

    // identical all-position 8-gram explode + doc-frequency join (the
    // engine counts by 64-bit gram hash; counts agree absent collisions)
    "q249_duplicate_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '') AS t
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, array_to_string(list_slice(t, i, i + 7), ' ') AS g
        |  FROM toks, UNNEST(generate_series(1, len(t) - 7)) q(i)),
        |dfq AS (SELECT g, count(DISTINCT doc_id) AS docs FROM pos
        |        GROUP BY 1),
        |prof AS (
        |  SELECT doc_id, count(*) AS n_spans,
        |    CAST(sum(CASE WHEN docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_dup_spans
        |  FROM pos JOIN dfq USING (g) GROUP BY 1)
        |SELECT d.doc_id, coalesce(n_spans, 0) AS n_spans,
        |  coalesce(n_dup_spans, 0) AS n_dup_spans,
        |  round(CASE WHEN n_spans > 0 THEN
        |    CAST(n_dup_spans AS DOUBLE) / n_spans END, 6) AS dup_frac
        |FROM (SELECT DISTINCT doc_id FROM documents) d
        |LEFT JOIN prof USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // independent formulation: rank ALL same-user pairs by
    // (|Δt|, earlier-first) — the engine's merge-window pick must agree
    "q250_nearest_join" ->
      """WITH l AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS t_us
        |  FROM events WHERE event_type = 'click'),
        |r AS (
        |  SELECT user_id, epoch_us(ts) AS p_us, event_id AS pid
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT l.event_id, l.user_id, l.t_us, r.pid, r.p_us,
        |    row_number() OVER (PARTITION BY l.event_id
        |      ORDER BY abs(r.p_us - l.t_us), r.p_us) AS rn
        |  FROM l JOIN r ON l.user_id = r.user_id)
        |SELECT l.event_id, l.user_id, l.t_us,
        |  j.pid AS nearest_purchase_id,
        |  CAST(j.p_us - j.t_us AS DOUBLE) AS nearest_dist
        |FROM l
        |LEFT JOIN (SELECT * FROM j WHERE rn = 1) j
        |  USING (event_id, user_id, t_us)
        |ORDER BY event_id""".stripMargin,

    // identical quasi-identifier collapse and violation filter
    "q251_k_anonymity" ->
      """SELECT o_custkey % 997 AS qid_bucket,
        |  CAST(year(o_orderdate) AS INT) AS qid_year, count(*) AS n
        |FROM orders
        |GROUP BY 1, 2 HAVING count(*) < 3
        |ORDER BY qid_bucket, qid_year""".stripMargin,

    // identical lowercase → symbol-to-space → collapse → trim chain
    "q252_normalize_text" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm_text,
        |  CAST(length(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS INT)
        |    AS norm_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    // independent formulation: rank deduped controls per treated unit by
    // (|Δscore|, score) — the engine's strata-keyed merge pick must agree
    "q253_ps_match" ->
      """WITH d AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS stratum_year,
        |    CAST(o_orderpriority < '3' AS INT) AS treat,
        |    o_totalprice, o_orderkey
        |  FROM orders),
        |tr AS (SELECT stratum_year, o_orderkey, o_totalprice AS score
        |       FROM d WHERE treat = 1),
        |ct AS (
        |  SELECT stratum_year, o_totalprice AS control_score,
        |    min(o_orderkey) AS control_o_orderkey
        |  FROM d WHERE treat = 0 GROUP BY 1, 2),
        |j AS (
        |  SELECT tr.o_orderkey, tr.stratum_year, tr.score,
        |    ct.control_o_orderkey, ct.control_score,
        |    row_number() OVER (PARTITION BY tr.o_orderkey
        |      ORDER BY abs(ct.control_score - tr.score),
        |        ct.control_score) AS rn
        |  FROM tr JOIN ct ON tr.stratum_year = ct.stratum_year)
        |SELECT tr.stratum_year, tr.o_orderkey, tr.score,
        |  j.control_o_orderkey, j.control_score,
        |  j.control_score - tr.score AS score_diff
        |FROM tr
        |LEFT JOIN (SELECT * FROM j WHERE rn = 1) j
        |  USING (o_orderkey, stratum_year, score)
        |ORDER BY tr.o_orderkey""".stripMargin,

    // identical sequential replace chain + original-text match counts
    "q254_redact" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(text, '\bdata\b', '<TERM>', 'g'),
        |    '[0-9]+', '<NUM>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(text, '\bdata\b'))
        |    + len(regexp_extract_all(text, '[0-9]+')) AS INT)
        |    AS n_redacted
        |FROM documents ORDER BY doc_id""".stripMargin,

    // 4 unrolled min-plus relaxation rounds (the q200/q223 unrolled
    // pattern); integral weights keep the arithmetic exact
    "q255_sssp" -> {
      def rnd(r: Int): String =
        s"""d${r + 1} AS (
           |  SELECT node, min(dist) AS dist FROM (
           |    SELECT node, dist FROM d$r
           |    UNION ALL
           |    SELECT e.v, d$r.dist + e.w FROM d$r
           |    JOIN e ON e.u = d$r.node)
           |  GROUP BY 1)""".stripMargin
      """WITH pe AS (
        |  SELECT 'p' || l_partkey AS u, 's' || l_suppkey AS v,
        |    min(CAST(l_quantity AS DOUBLE)) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |e AS (SELECT u, v, w FROM pe UNION ALL SELECT v, u, w FROM pe),
        |d0 AS (SELECT 'p1' AS node, 0.0 AS dist),
        |""".stripMargin +
        (0 until 4).map(rnd).mkString(",\n") +
        "\nSELECT node, round(dist, 6) AS dist FROM d4 ORDER BY node"
    },

    // identical md5 draw, exact integer sums, double division of the
    // same integers — the comparison is bit-deterministic
    "q256_permutation_test" ->
      """WITH d AS (
        |  SELECT CAST(c_custkey AS VARCHAR) AS id,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS v,
        |    (c_mktsegment = 'BUILDING') AS ia
        |  FROM customer),
        |o AS (
        |  SELECT CAST(sum(CASE WHEN ia THEN 1 ELSE 0 END) AS BIGINT)
        |      AS na,
        |    CAST(sum(CASE WHEN ia THEN v END) AS BIGINT) AS sa,
        |    CAST(sum(CASE WHEN NOT ia THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nb,
        |    CAST(sum(CASE WHEN NOT ia THEN v END) AS BIGINT) AS sb
        |  FROM d),
        |p AS (
        |  SELECT g, v,
        |    (('0x' || substr(md5(id || '#' || CAST(g AS VARCHAR)),
        |        1, 15))::BIGINT
        |      % (SELECT na + nb FROM o)) < (SELECT na FROM o) AS sa_side
        |  FROM d, UNNEST(generate_series(1, 200)) q(g)),
        |ag AS (
        |  SELECT g,
        |    CAST(sum(CASE WHEN sa_side THEN 1 ELSE 0 END) AS BIGINT)
        |      AS pna,
        |    CAST(sum(CASE WHEN sa_side THEN v END) AS BIGINT) AS psa,
        |    CAST(sum(CASE WHEN NOT sa_side THEN 1 ELSE 0 END) AS BIGINT)
        |      AS pnb,
        |    CAST(sum(CASE WHEN NOT sa_side THEN v END) AS BIGINT) AS psb
        |  FROM p GROUP BY 1),
        |x AS (
        |  SELECT CAST(sum(CASE WHEN pna > 0 AND pnb > 0 AND
        |      abs(CAST(psa AS DOUBLE) / pna - CAST(psb AS DOUBLE) / pnb)
        |        >= abs((SELECT CAST(sa AS DOUBLE) / na FROM o)
        |          - (SELECT CAST(sb AS DOUBLE) / nb FROM o))
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
        |  FROM ag)
        |SELECT o.na AS n_a, o.nb AS n_b,
        |  round(CAST(o.sa AS DOUBLE) / o.na
        |    - CAST(o.sb AS DOUBLE) / o.nb, 6) AS diff_obs,
        |  CAST(200 AS INT) AS n_perm, x.n_extreme,
        |  round(CAST(x.n_extreme + 1 AS DOUBLE) / 201, 6) AS p_value
        |FROM o CROSS JOIN x""".stripMargin,

    // identical aggregates; exact-integer everything but the mean
    "q257_corpus_card" ->
      """WITH toks AS (
        |  SELECT doc_id, text, n_chars, lang, source,
        |    len(list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> '')) AS nt
        |  FROM documents),
        |basic AS (
        |  SELECT count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
        |    CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |    count(DISTINCT lang) AS n_langs,
        |    count(DISTINCT source) AS n_sources
        |  FROM toks),
        |v AS (
        |  SELECT count(DISTINCT x) AS vocab FROM (
        |    SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> '')) AS x FROM documents)),
        |du AS (
        |  SELECT CAST(sum(c) - count(*) AS BIGINT) AS n_dup_docs FROM (
        |    SELECT md5(text) AS h, count(*) AS c FROM documents
        |    GROUP BY 1))
        |SELECT n_docs, n_tokens, n_chars, n_langs, n_sources, vocab,
        |  n_dup_docs,
        |  round(CAST(n_tokens AS DOUBLE) / n_docs, 6) AS mean_tokens
        |FROM basic CROSS JOIN v CROSS JOIN du""".stripMargin,

    // identical (score desc, doc) rank + min-relevant-rank selection
    "q259_mrr" ->
      """WITH d AS (
        |  SELECT source, doc_id, n_chars AS score,
        |    CAST(lang = 'en' AS INT) AS rel
        |  FROM documents),
        |r AS (
        |  SELECT source, rel,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY score DESC, doc_id) AS rk
        |  FROM d)
        |SELECT source, count(*) AS n_candidates,
        |  CAST(min(CASE WHEN rel > 0 AND rk <= 10 THEN rk END) AS INT)
        |    AS first_rel_rank,
        |  round(1.0 / min(CASE WHEN rel > 0 AND rk <= 10 THEN rk END), 6)
        |    AS rr
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    // 3 unrolled MM updates (the q122 unrolled-iteration pattern);
    // integer win/game counts, one float division chain per item
    "q258_bradley_terry" -> {
      def rnd(r: Int): String =
        s"""p${r + 1} AS (
           |  SELECT wm.i, CAST(wm.wi AS DOUBLE) / d.d AS pi
           |  FROM wm JOIN (
           |    SELECT pairs.i,
           |      sum(CAST(n AS DOUBLE) / (pa.pi + pb.pi)) AS d
           |    FROM pairs
           |    JOIN p$r pa ON pairs.i = pa.i
           |    JOIN p$r pb ON pairs.j = pb.i
           |    GROUP BY 1) d ON wm.i = d.i)""".stripMargin
      """WITH li AS (
        |  SELECT l_orderkey AS o, l_partkey % 100 AS item, l_quantity AS q
        |  FROM lineitem),
        |g AS (
        |  SELECT a.item AS w, b.item AS l
        |  FROM li a JOIN li b ON a.o = b.o AND a.item <> b.item
        |    AND a.q > b.q),
        |wins AS (SELECT w AS i, count(*) AS wi FROM g GROUP BY 1),
        |od AS (SELECT w AS i, l AS j, count(*) AS nij FROM g GROUP BY 1, 2),
        |pairs AS (
        |  SELECT i, j, CAST(sum(nij) AS BIGINT) AS n FROM (
        |    SELECT i, j, nij FROM od
        |    UNION ALL SELECT j, i, nij FROM od)
        |  GROUP BY 1, 2),
        |items AS (SELECT DISTINCT i FROM pairs),
        |wm AS (SELECT items.i, CAST(coalesce(wi, 0) AS BIGINT) AS wi
        |       FROM items LEFT JOIN wins USING (i)),
        |p0 AS (SELECT i, 1.0 AS pi FROM items),
        |""".stripMargin +
        (0 until 3).map(rnd).mkString(",\n") +
        """
          |SELECT p3.i AS item, wm.wi AS wins, ng.n_games,
          |  round(p3.pi / t.t, 6) AS score
          |FROM p3
          |JOIN wm USING (i)
          |JOIN (SELECT i, CAST(sum(n) AS BIGINT) AS n_games FROM pairs
          |      GROUP BY 1) ng USING (i)
          |CROSS JOIN (SELECT sum(pi) AS t FROM p3) t
          |ORDER BY item""".stripMargin
    },

    // closed-form saturated-softmax coefficients: per non-baseline class
    // the intercept is the lo-cell log-odds vs class A, the slope the
    // hi-vs-lo log-odds difference — pure count arithmetic
    "q260_softmax" ->
      """WITH d AS (
        |  SELECT CAST(l_quantity > 25 AS INT) AS hi, l_returnflag AS cls
        |  FROM lineitem),
        |cell AS (
        |  SELECT cls,
        |    sum(CASE WHEN hi = 0 THEN 1 ELSE 0 END) AS n0,
        |    sum(CASE WHEN hi = 1 THEN 1 ELSE 0 END) AS n1
        |  FROM d GROUP BY 1),
        |base AS (SELECT n0 AS a0, n1 AS a1 FROM cell WHERE cls = 'A')
        |SELECT cls,
        |  round(ln(CAST(n0 AS DOUBLE) / a0), 6) AS b0,
        |  round(ln(CAST(n1 AS DOUBLE) / a1)
        |    - ln(CAST(n0 AS DOUBLE) / a0), 6) AS b1
        |FROM cell CROSS JOIN base
        |WHERE cls <> 'A' ORDER BY cls""".stripMargin,

    // same gram positions (string grams vs 64-bit hashed grams — equal
    // modulo negligible xxhash64 collisions), same covered-index
    // expansion, same index-ordered rebuild
    "q261_span_removal" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, g AS i, array_to_string(t[g + 1 : g + 5], ' ')
        |    AS gram
        |  FROM d, unnest(generate_series(0, len(t) - 5)) AS s(g)
        |  WHERE len(t) >= 5),
        |dup AS (
        |  SELECT gram FROM (
        |    SELECT gram, count(DISTINCT doc_id) AS c FROM grams GROUP BY 1)
        |  WHERE c >= 2),
        |cov AS (
        |  SELECT DISTINCT doc_id, cv
        |  FROM grams JOIN dup USING (gram),
        |    unnest(generate_series(i, i + 4)) AS u(cv)),
        |tok AS (
        |  SELECT doc_id, t[ix + 1] AS tok, CAST(ix AS BIGINT) AS idx
        |  FROM d, unnest(generate_series(0, len(t) - 1)) AS u(ix)
        |  WHERE len(t) > 0),
        |kept AS (
        |  SELECT tok.doc_id, tok.tok, tok.idx FROM tok
        |  WHERE NOT EXISTS (SELECT 1 FROM cov
        |    WHERE cov.doc_id = tok.doc_id AND cov.cv = tok.idx)),
        |r AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS text_clean,
        |    count(*) AS n_kept
        |  FROM kept GROUP BY 1)
        |SELECT d.doc_id, coalesce(text_clean, '') AS text_clean,
        |  CAST(len(t) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept
        |FROM d LEFT JOIN r USING (doc_id) ORDER BY doc_id""".stripMargin,

    // brute-force exact pair join (the q73 shingle-intersection shape):
    // prefix filtering is exact, so the full quadratic oracle and the
    // prefix-filtered engine must produce identical pairs and values
    "q262_jaccard_join" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, len(t) - 2),
        |    i -> array_to_string(list_slice(t, i, i + 3), ' '))) AS shingles
        |  FROM toks WHERE len(t) >= 4),
        |sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
        |p AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
        |  FROM p a JOIN p b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(CAST(ni AS DOUBLE) / (sa.n_sh + sb.n_sh - ni), 6)
        |    AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(ni AS DOUBLE) / (sa.n_sh + sb.n_sh - ni) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // identical z arithmetic + the q57 A&S Φ polynomial (same literal
    // sequence, including the 2·(1 − (1 − φ·poly)) float path); BH via
    // rank + suffix-min window — tie groups get identical adjusted
    // values under any within-tie order, matching the engine's
    // two-level formulation
    "q263_bh_fdr" ->
      """WITH g AS (
        |  SELECT l_partkey % 40 AS tid, count(*) AS n,
        |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS x
        |  FROM lineitem GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n) AS DOUBLE) AS nn, CAST(sum(x) AS DOUBLE) AS xx
        |  FROM g),
        |zc AS (
        |  SELECT tid,
        |    abs((CAST(x AS DOUBLE) / n - xx / nn)
        |      / sqrt((xx / nn) * (1.0 - xx / nn) / n)) AS az
        |  FROM g CROSS JOIN tot),
        |pv AS (
        |  SELECT tid, 2.0 * (1.0 - (1.0
        |    - exp(az * az * -0.5) * 0.3989422804014327
        |      * (tt * (0.319381530 + tt * (-0.356563782 + tt * (1.781477937
        |        + tt * (-1.821255978 + tt * 1.330274429))))))) AS p
        |  FROM (SELECT tid, az, 1.0 / (1.0 + 0.2316419 * az) AS tt FROM zc)),
        |m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM pv),
        |bh AS (
        |  SELECT tid, p, row_number() OVER (ORDER BY p, tid) AS rk
        |  FROM pv),
        |adj AS (
        |  SELECT tid, p, least(1.0, min(m.m * p / rk) OVER (
        |    ORDER BY rk ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |    AS p_adj
        |  FROM bh CROSS JOIN m)
        |SELECT tid, round(p, 6) AS p, round(p_adj, 6) AS p_adj,
        |  p_adj <= 0.05 AS reject
        |FROM adj ORDER BY tid""".stripMargin,

    // same string bigrams (vs hashed — equal modulo xxhash64
    // collisions), same add-1 smoothing rationals, same V
    "q264_lm_score" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '') AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, t[i] AS wp, t[i + 1] AS wc
        |  FROM d, unnest(generate_series(1, len(t) - 1)) AS u(i)
        |  WHERE len(t) >= 2),
        |bgc AS (SELECT wp, wc, count(*) AS cbg FROM bg GROUP BY 1, 2),
        |ctx AS (SELECT wp, count(*) AS cctx FROM bg GROUP BY 1),
        |v AS (SELECT count(DISTINCT w) AS v
        |      FROM (SELECT unnest(t) AS w FROM d)),
        |sc AS (
        |  SELECT bg.doc_id, count(*) AS n_bigrams,
        |    avg(ln((cbg + 1.0) / (cctx + 1.0 * v.v))) AS alp
        |  FROM bg JOIN bgc USING (wp, wc) JOIN ctx USING (wp)
        |  CROSS JOIN v
        |  GROUP BY 1)
        |SELECT d.doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  round(alp, 6) AS avg_logprob, round(exp(-alp), 4) AS ppl
        |FROM d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    // identical integer confusion marginals; pe's cross products in
    // DOUBLE to mirror the engine's overflow-safe formulation
    "q265_cohens_kappa" ->
      """WITH d AS (
        |  SELECT CASE WHEN l_quantity < 18 THEN 'lo'
        |      WHEN l_quantity <= 35 THEN 'mid' ELSE 'hi' END AS r1,
        |    CASE WHEN l_extendedprice < 20000 THEN 'lo'
        |      WHEN l_extendedprice <= 50000 THEN 'mid' ELSE 'hi' END AS r2
        |  FROM lineitem),
        |cells AS (SELECT r1, r2, count(*) AS n FROM d GROUP BY 1, 2),
        |ra AS (SELECT r1 AS c, sum(n) AS ra FROM cells GROUP BY 1),
        |rb AS (SELECT r2 AS c, sum(n) AS rb FROM cells GROUP BY 1),
        |agree AS (SELECT coalesce(sum(n), 0) AS ag FROM cells
        |          WHERE r1 = r2),
        |tot AS (SELECT sum(n) AS tt FROM cells),
        |cross_ AS (
        |  SELECT coalesce(sum(CAST(ra AS DOUBLE) * rb), 0.0) AS cx
        |  FROM ra JOIN rb USING (c))
        |SELECT CAST(tt AS BIGINT) AS n,
        |  round(CAST(ag AS DOUBLE) / tt, 6) AS po,
        |  round(cx / (CAST(tt AS DOUBLE) * tt), 6) AS pe,
        |  round((CAST(ag AS DOUBLE) / tt - cx / (CAST(tt AS DOUBLE) * tt))
        |    / (1.0 - cx / (CAST(tt AS DOUBLE) * tt)), 6) AS kappa
        |FROM agree CROSS JOIN tot CROSS JOIN cross_""".stripMargin,

    // identical md5-mod-512 bucketing, identical λ expression shape
    // (ln/add order mirrored), identical micro-nat quantization — the
    // per-doc weight is an exact BIGINT sum on both engines
    "q266_dsir_weights" ->
      """WITH tok_t AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '')) AS t
        |  FROM documents WHERE lang = 'en'),
        |tok_r AS (
        |  SELECT doc_id, unnest(list_filter(
        |    regexp_split_to_array(text, '\s+'), x -> x <> '')) AS t
        |  FROM documents),
        |ct AS (SELECT ('0x' || substr(md5(t), 1, 15))::BIGINT % 512 AS b,
        |  count(*) AS ct FROM tok_t GROUP BY 1),
        |cr AS (SELECT ('0x' || substr(md5(t), 1, 15))::BIGINT % 512 AS b,
        |  count(*) AS cr FROM tok_r GROUP BY 1),
        |tot AS (SELECT (SELECT sum(ct) FROM ct) AS nt,
        |               (SELECT sum(cr) FROM cr) AS nr),
        |dom AS (SELECT unnest(generate_series(0, 511)) AS b),
        |lam AS (
        |  SELECT dom.b, CAST(round((ln(coalesce(ct, 0) + 1.0)
        |      - ln(nt + 512.0) - ln(coalesce(cr, 0) + 1.0)
        |      + ln(nr + 512.0)) * 1e6) AS BIGINT) AS lw
        |  FROM dom LEFT JOIN ct ON dom.b = ct.b
        |    LEFT JOIN cr ON dom.b = cr.b CROSS JOIN tot),
        |doc AS (
        |  SELECT doc_id, count(*) AS n_tokens, sum(lw) AS logw_micro
        |  FROM (SELECT doc_id,
        |      ('0x' || substr(md5(t), 1, 15))::BIGINT % 512 AS b
        |    FROM tok_r) x JOIN lam USING (b) GROUP BY 1)
        |SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens,
        |  CAST(coalesce(logw_micro, 0) AS BIGINT) AS logw_micro
        |FROM documents d LEFT JOIN doc USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // same pipeline, greedy top-50 on (logw_micro DESC, doc_id)
    "q267_dsir_select" ->
      """WITH tok_t AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '')) AS t
        |  FROM documents WHERE lang = 'en'),
        |tok_r AS (
        |  SELECT doc_id, unnest(list_filter(
        |    regexp_split_to_array(text, '\s+'), x -> x <> '')) AS t
        |  FROM documents),
        |ct AS (SELECT ('0x' || substr(md5(t), 1, 15))::BIGINT % 512 AS b,
        |  count(*) AS ct FROM tok_t GROUP BY 1),
        |cr AS (SELECT ('0x' || substr(md5(t), 1, 15))::BIGINT % 512 AS b,
        |  count(*) AS cr FROM tok_r GROUP BY 1),
        |tot AS (SELECT (SELECT sum(ct) FROM ct) AS nt,
        |               (SELECT sum(cr) FROM cr) AS nr),
        |dom AS (SELECT unnest(generate_series(0, 511)) AS b),
        |lam AS (
        |  SELECT dom.b, CAST(round((ln(coalesce(ct, 0) + 1.0)
        |      - ln(nt + 512.0) - ln(coalesce(cr, 0) + 1.0)
        |      + ln(nr + 512.0)) * 1e6) AS BIGINT) AS lw
        |  FROM dom LEFT JOIN ct ON dom.b = ct.b
        |    LEFT JOIN cr ON dom.b = cr.b CROSS JOIN tot),
        |doc AS (
        |  SELECT doc_id, count(*) AS n_tokens, sum(lw) AS logw_micro
        |  FROM (SELECT doc_id,
        |      ('0x' || substr(md5(t), 1, 15))::BIGINT % 512 AS b
        |    FROM tok_r) x JOIN lam USING (b) GROUP BY 1)
        |SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens,
        |  CAST(coalesce(logw_micro, 0) AS BIGINT) AS logw_micro
        |FROM documents d LEFT JOIN doc USING (doc_id)
        |ORDER BY logw_micro DESC, doc_id LIMIT 50""".stripMargin,

    // rank-1 ALS with v₀ = 1: each half-sweep is the closed per-group
    // ridge form u = Σ r·v / (0.1 + Σ v²) — two sweeps unrolled
    "q268_als_factors" ->
      """WITH r AS (SELECT l_suppkey AS u, l_partkey AS i,
        |    CAST(l_quantity AS DOUBLE) AS r FROM lineitem),
        |v0 AS (SELECT DISTINCT i, 1.0 AS v FROM r),
        |u1 AS (SELECT u, sum(r * v) / (0.1 + sum(v * v)) AS uf
        |  FROM r JOIN v0 USING (i) GROUP BY u),
        |v1 AS (SELECT i, sum(r * uf) / (0.1 + sum(uf * uf)) AS v
        |  FROM r JOIN u1 USING (u) GROUP BY i),
        |u2 AS (SELECT u, sum(r * v) / (0.1 + sum(v * v)) AS uf
        |  FROM r JOIN v1 USING (i) GROUP BY u)
        |SELECT u AS supp, round(uf, 6) AS f_0 FROM u2
        |ORDER BY supp""".stripMargin,

    // same unrolled fit, finished by the second item half-step and the
    // u·v scoring join over the top-40 observed pairs
    "q269_als_predict" ->
      """WITH r AS (SELECT l_suppkey AS u, l_partkey AS i,
        |    CAST(l_quantity AS DOUBLE) AS r FROM lineitem),
        |v0 AS (SELECT DISTINCT i, 1.0 AS v FROM r),
        |u1 AS (SELECT u, sum(r * v) / (0.1 + sum(v * v)) AS uf
        |  FROM r JOIN v0 USING (i) GROUP BY u),
        |v1 AS (SELECT i, sum(r * uf) / (0.1 + sum(uf * uf)) AS v
        |  FROM r JOIN u1 USING (u) GROUP BY i),
        |u2 AS (SELECT u, sum(r * v) / (0.1 + sum(v * v)) AS uf
        |  FROM r JOIN v1 USING (i) GROUP BY u),
        |v2 AS (SELECT i, sum(r * uf) / (0.1 + sum(uf * uf)) AS v
        |  FROM r JOIN u2 USING (u) GROUP BY i),
        |probe AS (
        |  SELECT u, i, sum(r) AS qty FROM r GROUP BY u, i
        |  ORDER BY qty DESC, u, i LIMIT 40)
        |SELECT probe.u AS supp, probe.i AS part, qty,
        |  round(uf * v, 6) AS prediction
        |FROM probe JOIN u2 USING (u) JOIN v2 USING (i)
        |ORDER BY supp, part""".stripMargin,

    // identical md5("row#key") mod 256 cell mapping, exact BIGINT sums
    "q270_countmin_cells" ->
      """WITH cells AS (
        |  SELECT r.rw AS row,
        |    ('0x' || substr(md5(r.rw || '#' || l_partkey), 1, 15))::BIGINT
        |      % 256 AS col
        |  FROM lineitem, UNNEST([0, 1, 2]) r(rw)
        |  WHERE l_partkey IS NOT NULL)
        |SELECT row, col, count(*) AS counter
        |FROM cells GROUP BY row, col
        |ORDER BY row, col""".stripMargin,

    // same cells, estimate = min over the 3 rows, joined to exact
    "q271_countmin_estimate" ->
      """WITH cells AS (
        |  SELECT r.rw AS row,
        |    ('0x' || substr(md5(r.rw || '#' || l_partkey), 1, 15))::BIGINT
        |      % 256 AS col
        |  FROM lineitem, UNNEST([0, 1, 2]) r(rw)),
        |sk AS (SELECT row, col, count(*) AS counter
        |  FROM cells GROUP BY row, col),
        |top AS (SELECT l_partkey, count(*) AS exact FROM lineitem
        |  GROUP BY 1 ORDER BY exact DESC, l_partkey LIMIT 20),
        |probe AS (
        |  SELECT l_partkey, r.rw AS row,
        |    ('0x' || substr(md5(r.rw || '#' || l_partkey), 1, 15))::BIGINT
        |      % 256 AS col
        |  FROM top, UNNEST([0, 1, 2]) r(rw))
        |SELECT p.l_partkey, t.exact,
        |  min(coalesce(sk.counter, 0)) AS estimate
        |FROM probe p LEFT JOIN sk USING (row, col)
        |  JOIN top t ON p.l_partkey = t.l_partkey
        |GROUP BY 1, 2 ORDER BY p.l_partkey""".stripMargin,

    // identical md5("j#k")-parity ±1 signs, double-cast elements,
    // /√8 scale, 6-digit grid
    "q272_random_projection" ->
      """WITH g AS (
        |  SELECT vec_id, j.j AS j,
        |    CASE WHEN ('0x' || substr(md5(j.j || '#' || k.k), 1, 15))
        |        ::BIGINT % 2 = 0 THEN 1.0 ELSE -1.0 END
        |      * CAST(embedding[k.k + 1] AS DOUBLE) AS term
        |  FROM embeddings,
        |    UNNEST(generate_series(0, 7)) j(j),
        |    UNNEST(generate_series(0, 63)) k(k))
        |SELECT vec_id, j, round(sum(term) / sqrt(8.0), 6) AS val
        |FROM g GROUP BY vec_id, j
        |ORDER BY vec_id, j""".stripMargin,

    // seeds = 16 lowest vec_ids; per-subspace partial-distance argmin
    // (−2·x·c + ‖c‖², the q163 discipline) with (d, c) tiebreak
    "q273_pq_encode" ->
      """WITH seeds AS MATERIALIZED (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, embedding
        |  FROM (SELECT vec_id, embedding FROM embeddings
        |        WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 16)),
        |cells AS MATERIALIZED (
        |  SELECT s.s, c, j.j AS j,
        |    CAST(embedding[s.s * 8 + j.j + 1] AS DOUBLE) AS w
        |  FROM seeds, UNNEST(generate_series(0, 7)) s(s),
        |    UNNEST(generate_series(0, 7)) j(j)),
        |x AS MATERIALIZED (
        |  SELECT vec_id, s.s, j.j AS j,
        |    CAST(embedding[s.s * 8 + j.j + 1] AS DOUBLE) AS v
        |  FROM embeddings, UNNEST(generate_series(0, 7)) s(s),
        |    UNNEST(generate_series(0, 7)) j(j)),
        |pd AS (
        |  SELECT x.vec_id, x.s, cells.c,
        |    -2 * sum(x.v * cells.w) + any_value(cn.n2) AS d
        |  FROM x JOIN cells ON x.s = cells.s AND x.j = cells.j
        |  JOIN (SELECT s, c, sum(w * w) AS n2 FROM cells GROUP BY 1, 2) cn
        |    ON cells.s = cn.s AND cells.c = cn.c
        |  GROUP BY x.vec_id, x.s, cells.c)
        |SELECT vec_id, s, CAST(c AS INT) AS code FROM (
        |  SELECT vec_id, s, c, row_number() OVER (
        |    PARTITION BY vec_id, s ORDER BY d, c) AS rk
        |  FROM pd)
        |WHERE rk = 1 ORDER BY vec_id, s""".stripMargin,

    // same codes; per-query LUT = partial distances of the query
    // subvectors to every centroid; rank on round(Σ pd + ‖q‖², 6) with
    // the id tiebreak, exactly the engine's grid
    "q274_pq_topk" ->
      """WITH seeds AS MATERIALIZED (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, embedding
        |  FROM (SELECT vec_id, embedding FROM embeddings
        |        WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 16)),
        |cells AS MATERIALIZED (
        |  SELECT s.s, c, j.j AS j,
        |    CAST(embedding[s.s * 8 + j.j + 1] AS DOUBLE) AS w
        |  FROM seeds, UNNEST(generate_series(0, 7)) s(s),
        |    UNNEST(generate_series(0, 7)) j(j)),
        |cn AS MATERIALIZED (
        |  SELECT s, c, sum(w * w) AS n2 FROM cells GROUP BY 1, 2),
        |x AS MATERIALIZED (
        |  SELECT vec_id, s.s, j.j AS j,
        |    CAST(embedding[s.s * 8 + j.j + 1] AS DOUBLE) AS v
        |  FROM embeddings, UNNEST(generate_series(0, 7)) s(s),
        |    UNNEST(generate_series(0, 7)) j(j)),
        |codes AS MATERIALIZED (
        |  SELECT vec_id, s, c FROM (
        |    SELECT x.vec_id, x.s, cells.c, row_number() OVER (
        |      PARTITION BY x.vec_id, x.s ORDER BY
        |        -2 * sum(x.v * cells.w) + any_value(cn.n2), cells.c) AS rk
        |    FROM x JOIN cells ON x.s = cells.s AND x.j = cells.j
        |    JOIN cn ON cells.s = cn.s AND cells.c = cn.c
        |    GROUP BY x.vec_id, x.s, cells.c)
        |  WHERE rk = 1),
        |q AS MATERIALIZED (
        |  SELECT vec_id AS query_id, embedding FROM embeddings
        |  ORDER BY vec_id LIMIT 3),
        |qq AS (
        |  SELECT query_id,
        |    sum(CAST(embedding[u.ix + 1] AS DOUBLE)
        |      * CAST(embedding[u.ix + 1] AS DOUBLE)) AS qq
        |  FROM q, UNNEST(generate_series(0, 63)) u(ix) GROUP BY 1),
        |qx AS (
        |  SELECT query_id, s.s, j.j AS j,
        |    CAST(embedding[s.s * 8 + j.j + 1] AS DOUBLE) AS v
        |  FROM q, UNNEST(generate_series(0, 7)) s(s),
        |    UNNEST(generate_series(0, 7)) j(j)),
        |lut AS (
        |  SELECT qx.query_id, qx.s, cells.c,
        |    -2 * sum(qx.v * cells.w) + any_value(cn.n2) AS pd
        |  FROM qx JOIN cells ON qx.s = cells.s AND qx.j = cells.j
        |  JOIN cn ON cells.s = cn.s AND cells.c = cn.c
        |  GROUP BY qx.query_id, qx.s, cells.c),
        |sc AS (
        |  SELECT l.query_id, codes.vec_id,
        |    round(sum(l.pd) + any_value(qq.qq), 6) + 0.0 AS adist2
        |  FROM codes JOIN lut l ON codes.s = l.s AND codes.c = l.c
        |  JOIN qq ON qq.query_id = l.query_id
        |  GROUP BY 1, 2)
        |SELECT query_id, vec_id, adist2, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY adist2, vec_id) AS rn
        |  FROM sc)
        |WHERE rn <= 5 ORDER BY query_id, vec_id""".stripMargin,

    // 6 unrolled EM rounds; saturated M-steps are per-cell weighted
    // means, so each round is closed-form (init: plain Poisson MLE =
    // cell means, π₀ = 0.25 — mirrors the engine exactly)
    "q275_zip" -> {
      def rnd(i: Int): String =
        s"""z$i AS MATERIALIZED (
           |  SELECT b.x, b.y,
           |    CASE WHEN b.y > 0 THEN 0.0
           |      ELSE p${i - 1}.pi /
           |        (p${i - 1}.pi + (1 - p${i - 1}.pi) * exp(-m.mu))
           |    END AS z
           |  FROM base b JOIN m${i - 1} m USING (x) CROSS JOIN p${i - 1}),
           |p$i AS MATERIALIZED (SELECT avg(z) AS pi FROM z$i),
           |m$i AS MATERIALIZED (SELECT x, sum((1 - z) * y) / sum(1 - z) AS mu
           |  FROM z$i GROUP BY x)""".stripMargin
      """WITH base AS MATERIALIZED (
        |  SELECT CASE WHEN l_discount > 0.05 THEN 1.0 ELSE 0.0 END AS x,
        |    CAST(greatest(l_linenumber - 3, 0) AS DOUBLE) AS y
        |  FROM lineitem),
        |m0 AS MATERIALIZED (SELECT x, avg(y) AS mu FROM base GROUP BY x),
        |p0 AS MATERIALIZED (SELECT 0.25 AS pi),
        |""".stripMargin + (1 to 6).map(rnd).mkString(",\n") +
        """
          |SELECT x, round(pi, 6) AS pi,
          |  round((1 - pi) * mu, 6) AS ey,
          |  round(pi + (1 - pi) * exp(-mu), 6) AS p_zero
          |FROM m6 CROSS JOIN p6
          |ORDER BY x""".stripMargin
    },

    // identical cell propensities (exact integer share), identical
    // weight CASE and Hájek divisions
    "q276_ipw" ->
      """WITH base AS (
        |  SELECT l_returnflag AS s,
        |    CAST(l_discount > 0.05 AS INT) AS t, l_extendedprice AS y
        |  FROM lineitem),
        |cells AS (
        |  SELECT s, CAST(sum(t) AS DOUBLE) / count(*) AS e
        |  FROM base GROUP BY s),
        |w AS (
        |  SELECT t, y,
        |    CASE WHEN t = 1 THEN 1.0 / e ELSE 1.0 / (1 - e) END AS w
        |  FROM base JOIN cells USING (s) WHERE e > 0 AND e < 1),
        |ex AS (
        |  SELECT count(*) AS n_excluded
        |  FROM base JOIN cells USING (s) WHERE e = 0 OR e = 1),
        |agg AS (
        |  SELECT count(*) AS n_used,
        |    CAST(sum(t) AS BIGINT) AS n_treated,
        |    CAST(sum(1 - t) AS BIGINT) AS n_control,
        |    sum(CASE WHEN t = 1 THEN w * y ELSE 0.0 END)
        |      / sum(CASE WHEN t = 1 THEN w ELSE 0.0 END) AS mt,
        |    sum(CASE WHEN t = 0 THEN w * y ELSE 0.0 END)
        |      / sum(CASE WHEN t = 0 THEN w ELSE 0.0 END) AS mc
        |  FROM w)
        |SELECT n_used, n_treated, n_control,
        |  round(mt - mc, 6) AS ate_ipw, round(mt, 6) AS mean_treated,
        |  round(mc, 6) AS mean_control, n_excluded
        |FROM agg CROSS JOIN ex""".stripMargin,

    // 10 unrolled IPF rounds over the identical observed-cell frame,
    // equal target shares as literals, same multiply/divide order
    "q277_rake" -> {
      def rnd(i: Int): String =
        s"""ra$i AS MATERIALIZED (
           |  SELECT lang, sum(w * n) AS m FROM w${i - 1} GROUP BY lang),
           |xa$i AS MATERIALIZED (SELECT w.lang, w.source, w.n,
           |    w.w * 0.2 * tot.t / ra$i.m AS w
           |  FROM w${i - 1} w JOIN ra$i USING (lang) CROSS JOIN tot),
           |rb$i AS MATERIALIZED (
           |  SELECT source, sum(w * n) AS m FROM xa$i GROUP BY source),
           |w$i AS MATERIALIZED (SELECT x.lang, x.source, x.n,
           |    x.w * 0.05 * tot.t / rb$i.m AS w
           |  FROM xa$i x JOIN rb$i USING (source) CROSS JOIN tot)""".stripMargin
      """WITH cells AS MATERIALIZED (
        |  SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
        |tot AS MATERIALIZED (SELECT CAST(sum(n) AS DOUBLE) AS t FROM cells),
        |w0 AS MATERIALIZED (SELECT lang, source, n, 1.0 AS w FROM cells),
        |""".stripMargin + (1 to 10).map(rnd).mkString(",\n") +
        """
          |SELECT lang, source, n, round(w, 6) AS weight FROM w10
          |ORDER BY lang, source""".stripMargin
    },

    // identical distinct shingle strings, md5-mod-(2^31−1) base hash,
    // identical (aᵢ·h + bᵢ) mod p universal hashes — exact integers
    "q278_minhash_portable" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t
        |  FROM documents),
        |grams AS MATERIALIZED (
        |  SELECT DISTINCT doc_id,
        |    array_to_string(t[i.i + 1 : i.i + 3], ' ') AS g
        |  FROM toks, UNNEST(generate_series(0, len(t) - 3)) i(i)
        |  WHERE len(t) >= 3),
        |h AS MATERIALIZED (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(g), 1, 15))::BIGINT % 2147483647 AS h
        |  FROM grams),
        |params AS MATERIALIZED (
        |  SELECT i.i AS i,
        |    CASE WHEN (2654435761 * (i.i + 1)) % 2147483647 = 0 THEN 1
        |      ELSE (2654435761 * (i.i + 1)) % 2147483647 END AS a,
        |    (97531 * (i.i + 1)) % 2147483647 AS b
        |  FROM UNNEST(generate_series(0, 15)) i(i))
        |SELECT h.doc_id AS id, p.i,
        |  min((h.h * p.a + p.b) % 2147483647) AS sig
        |FROM h CROSS JOIN params p
        |GROUP BY 1, 2 ORDER BY id, i""".stripMargin,

    // same signatures → 4-row string band keys → capped bucket self-join
    "q279_minhash_pairs_portable" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t
        |  FROM documents),
        |grams AS MATERIALIZED (
        |  SELECT DISTINCT doc_id,
        |    array_to_string(t[i.i + 1 : i.i + 3], ' ') AS g
        |  FROM toks, UNNEST(generate_series(0, len(t) - 3)) i(i)
        |  WHERE len(t) >= 3),
        |h AS MATERIALIZED (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(g), 1, 15))::BIGINT % 2147483647 AS h
        |  FROM grams),
        |params AS MATERIALIZED (
        |  SELECT i.i AS i,
        |    CASE WHEN (2654435761 * (i.i + 1)) % 2147483647 = 0 THEN 1
        |      ELSE (2654435761 * (i.i + 1)) % 2147483647 END AS a,
        |    (97531 * (i.i + 1)) % 2147483647 AS b
        |  FROM UNNEST(generate_series(0, 15)) i(i)),
        |sigl AS MATERIALIZED (
        |  SELECT h.doc_id AS id, p.i,
        |    min((h.h * p.a + p.b) % 2147483647) AS sig
        |  FROM h CROSS JOIN params p GROUP BY 1, 2),
        |bk AS MATERIALIZED (
        |  SELECT id, i // 4 AS band,
        |    string_agg(CAST(sig AS VARCHAR), '#' ORDER BY i) AS bkey
        |  FROM sigl GROUP BY id, i // 4),
        |small AS (
        |  SELECT band, bkey FROM bk GROUP BY band, bkey
        |  HAVING count(*) <= 200),
        |pr AS MATERIALIZED (
        |  SELECT b.band, b.bkey, b.id FROM bk b JOIN small USING (band, bkey))
        |SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_bands_shared
        |FROM pr a JOIN pr b ON a.band = b.band AND a.bkey = b.bkey
        |  AND a.id < b.id
        |GROUP BY 1, 2 ORDER BY id_a, id_b""".stripMargin,

    // identical md5-mod-2^24 shingle hashes, identical per-bit ±1 votes
    // and sign-bit assembly — exact integer fingerprints
    "q280_simhash_portable" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t
        |  FROM documents),
        |grams AS MATERIALIZED (
        |  SELECT DISTINCT doc_id,
        |    array_to_string(t[i.i + 1 : i.i + 3], ' ') AS g
        |  FROM toks, UNNEST(generate_series(0, len(t) - 3)) i(i)
        |  WHERE len(t) >= 3),
        |h AS MATERIALIZED (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(g), 1, 15))::BIGINT % 16777216 AS h
        |  FROM grams),
        |bits AS (
        |  SELECT doc_id, b.b AS b,
        |    sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM h, UNNEST(generate_series(0, 23)) b(b)
        |  GROUP BY 1, 2)
        |SELECT doc_id AS id,
        |  CAST(sum(CASE WHEN v > 0 THEN 1::BIGINT << b ELSE 0 END)
        |    AS BIGINT) AS simhash
        |FROM bits GROUP BY 1 ORDER BY id""".stripMargin,

    // batch replay of the identical md5 cell mapping over events.user_id
    // — the streaming complete-mode emission must match cell-for-cell
    "q281_countmin_stream" ->
      """WITH cells AS (
        |  SELECT r.rw AS row,
        |    ('0x' || substr(md5(r.rw || '#' || user_id), 1, 15))::BIGINT
        |      % 256 AS col
        |  FROM events, UNNEST([0, 1, 2]) r(rw)
        |  WHERE user_id IS NOT NULL)
        |SELECT row, col, count(*) AS counter
        |FROM cells GROUP BY row, col
        |ORDER BY row, col""".stripMargin,

    // 12 unrolled Pearson-moment Newton steps (μ = cell means on the
    // saturated design for any θ); θ clamped at 1e-4 and rounded to the
    // 1e-8 grid after every step, mirroring the engine exactly
    "q282_negbin_theta" -> {
      def stp(i: Int): String =
        s"""f$i AS MATERIALIZED (
           |  SELECT
           |    sum((b.y - m.mu) * (b.y - m.mu)
           |      / (m.mu + m.mu * m.mu / t${i - 1}.th)) AS s,
           |    sum((b.y - m.mu) * (b.y - m.mu) * m.mu * m.mu
           |      / (t${i - 1}.th * t${i - 1}.th
           |         * (m.mu + m.mu * m.mu / t${i - 1}.th)
           |         * (m.mu + m.mu * m.mu / t${i - 1}.th))) AS sp,
           |    count(*) AS n
           |  FROM base b JOIN m USING (x) CROSS JOIN t${i - 1}),
           |t$i AS MATERIALIZED (
           |  SELECT round(greatest(1e-4,
           |    t${i - 1}.th - (f$i.s - (f$i.n - 2)) / f$i.sp), 8) AS th
           |  FROM t${i - 1} CROSS JOIN f$i)""".stripMargin
      """WITH base AS MATERIALIZED (
        |  SELECT CASE WHEN l_discount > 0.05 THEN 1.0 ELSE 0.0 END AS x,
        |    CAST(greatest(l_linenumber - 2, 0) AS DOUBLE) AS y
        |  FROM lineitem),
        |m AS MATERIALIZED (SELECT x, avg(y) AS mu FROM base GROUP BY x),
        |t0 AS MATERIALIZED (SELECT 1.0 AS th),
        |""".stripMargin + (1 to 12).map(stp).mkString(",\n") +
        """
          |SELECT x, round(th, 6) AS theta, round(mu, 6) AS mu
          |FROM m CROSS JOIN t12
          |ORDER BY x""".stripMargin
    },

    // identical score collapse, descending cumulative tiling, per-tile
    // running sums and division shapes
    "q283_uplift_qini" ->
      """WITH bys AS (
        |  SELECT CAST(l_extendedprice AS DOUBLE) AS s, count(*) AS n,
        |    sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS nt,
        |    sum(CASE WHEN l_discount > 0.05 AND l_quantity > 30
        |      THEN 1 ELSE 0 END) AS post,
        |    sum(CASE WHEN l_discount > 0.05 THEN 0 ELSE 1 END) AS nc,
        |    sum(CASE WHEN NOT l_discount > 0.05 AND l_quantity > 30
        |      THEN 1 ELSE 0 END) AS posc
        |  FROM lineitem GROUP BY 1),
        |cum AS (
        |  SELECT *, sum(n) OVER (ORDER BY s DESC
        |      ROWS UNBOUNDED PRECEDING) AS n_cum,
        |    sum(n) OVER () AS nn
        |  FROM bys),
        |tiled AS (
        |  SELECT *, CAST(ceil(10.0 * n_cum / nn) AS INT) AS tile FROM cum),
        |bt AS (
        |  SELECT tile, CAST(sum(n) AS BIGINT) AS n, sum(nt) AS nt,
        |    sum(post) AS post, sum(nc) AS nc, sum(posc) AS posc
        |  FROM tiled GROUP BY 1),
        |c AS (
        |  SELECT tile, n,
        |    sum(nt) OVER w AS cnt, sum(post) OVER w AS cpt,
        |    sum(nc) OVER w AS cnc, sum(posc) OVER w AS cpc
        |  FROM bt WINDOW w AS (ORDER BY tile ROWS UNBOUNDED PRECEDING))
        |SELECT tile, n,
        |  CAST(cnt AS BIGINT) AS cum_n_treat,
        |  CAST(cpt AS BIGINT) AS cum_pos_treat,
        |  CAST(cnc AS BIGINT) AS cum_n_ctrl,
        |  CAST(cpc AS BIGINT) AS cum_pos_ctrl,
        |  round(CASE WHEN cnt > 0 AND cnc > 0 THEN
        |    CAST(cpt AS DOUBLE) / cnt - CAST(cpc AS DOUBLE) / cnc END, 6)
        |    AS uplift,
        |  round(CASE WHEN cnc > 0 THEN
        |    CAST(cpt AS DOUBLE) - CAST(cpc AS DOUBLE) * cnt / cnc END, 6)
        |    AS qini
        |FROM c ORDER BY tile""".stripMargin,

    // identical melt + (feature, value) collapse + cumulative windows;
    // score = (posL²+negL²)/nL + (posR²+negR²)/nR in the same division
    // order; strict > parent; (score desc, feature, value) tie order
    "q284_stump" ->
      """WITH base AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
        |    l_quantity AS f1, l_discount AS f2, l_tax AS f3
        |  FROM lineitem),
        |melt AS (
        |  SELECT 'l_quantity' AS feature, f1 AS v, y FROM base
        |  UNION ALL SELECT 'l_discount', f2, y FROM base
        |  UNION ALL SELECT 'l_tax', f3, y FROM base),
        |agg AS (
        |  SELECT feature, v, count(*) AS n, sum(y) AS pos
        |  FROM melt GROUP BY 1, 2),
        |cum AS (
        |  SELECT feature, v,
        |    sum(n) OVER (PARTITION BY feature ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS nl,
        |    sum(pos) OVER (PARTITION BY feature ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS posl,
        |    sum(n) OVER (PARTITION BY feature) AS nt,
        |    sum(pos) OVER (PARTITION BY feature) AS post
        |  FROM agg),
        |sc AS (
        |  SELECT feature, v, nl, posl, nt - nl AS nr, post - posl AS posr,
        |    (CAST(posl AS DOUBLE) * CAST(posl AS DOUBLE)
        |      + CAST(nl - posl AS DOUBLE) * CAST(nl - posl AS DOUBLE))
        |      / CAST(nl AS DOUBLE)
        |    + (CAST(post - posl AS DOUBLE) * CAST(post - posl AS DOUBLE)
        |      + CAST((nt - nl) - (post - posl) AS DOUBLE)
        |        * CAST((nt - nl) - (post - posl) AS DOUBLE))
        |      / CAST(nt - nl AS DOUBLE) AS score
        |  FROM cum WHERE nl >= 1 AND nt - nl >= 1),
        |par AS (
        |  SELECT count(*) AS n, sum(y) AS pos,
        |    (CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)
        |      + CAST(count(*) - sum(y) AS DOUBLE)
        |        * CAST(count(*) - sum(y) AS DOUBLE))
        |      / CAST(count(*) AS DOUBLE) AS pscore
        |  FROM base),
        |best AS (
        |  SELECT feature, v, nl, posl, nr, posr
        |  FROM sc CROSS JOIN par WHERE score > pscore
        |  ORDER BY score DESC, feature, v LIMIT 1)
        |SELECT '' AS path, 0 AS depth, CAST(par.n AS BIGINT) AS n,
        |    CAST(par.pos AS BIGINT) AS pos, best.feature,
        |    CAST(best.v AS DOUBLE) AS threshold,
        |    CASE WHEN 2 * par.pos > par.n THEN 1 ELSE 0 END AS pred
        |  FROM par CROSS JOIN best
        |UNION ALL
        |SELECT 'L', 1, CAST(nl AS BIGINT), CAST(posl AS BIGINT), NULL, NULL,
        |    CASE WHEN 2 * posl > nl THEN 1 ELSE 0 END FROM best
        |UNION ALL
        |SELECT 'R', 1, CAST(nr AS BIGINT), CAST(posr AS BIGINT), NULL, NULL,
        |    CASE WHEN 2 * posr > nr THEN 1 ELSE 0 END FROM best
        |ORDER BY path""".stripMargin,

    // level 2 replays level 1's winner as the node-assignment CASE, then
    // reruns the identical pipeline PARTITIONED BY (node, feature); LEFT
    // JOINs keep unsplit children as leaves
    "q285_tree" ->
      """WITH base AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
        |    l_quantity AS f1, l_discount AS f2, l_tax AS f3
        |  FROM lineitem),
        |melt AS (
        |  SELECT 'l_quantity' AS feature, f1 AS v, y FROM base
        |  UNION ALL SELECT 'l_discount', f2, y FROM base
        |  UNION ALL SELECT 'l_tax', f3, y FROM base),
        |agg AS (
        |  SELECT feature, v, count(*) AS n, sum(y) AS pos
        |  FROM melt GROUP BY 1, 2),
        |cum AS (
        |  SELECT feature, v,
        |    sum(n) OVER (PARTITION BY feature ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS nl,
        |    sum(pos) OVER (PARTITION BY feature ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS posl,
        |    sum(n) OVER (PARTITION BY feature) AS nt,
        |    sum(pos) OVER (PARTITION BY feature) AS post
        |  FROM agg),
        |sc AS (
        |  SELECT feature, v, nl, posl, nt - nl AS nr, post - posl AS posr,
        |    (CAST(posl AS DOUBLE) * CAST(posl AS DOUBLE)
        |      + CAST(nl - posl AS DOUBLE) * CAST(nl - posl AS DOUBLE))
        |      / CAST(nl AS DOUBLE)
        |    + (CAST(post - posl AS DOUBLE) * CAST(post - posl AS DOUBLE)
        |      + CAST((nt - nl) - (post - posl) AS DOUBLE)
        |        * CAST((nt - nl) - (post - posl) AS DOUBLE))
        |      / CAST(nt - nl AS DOUBLE) AS score
        |  FROM cum WHERE nl >= 1 AND nt - nl >= 1),
        |par AS (
        |  SELECT count(*) AS n, sum(y) AS pos,
        |    (CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)
        |      + CAST(count(*) - sum(y) AS DOUBLE)
        |        * CAST(count(*) - sum(y) AS DOUBLE))
        |      / CAST(count(*) AS DOUBLE) AS pscore
        |  FROM base),
        |best AS (
        |  SELECT feature, v, nl, posl, nr, posr
        |  FROM sc CROSS JOIN par WHERE score > pscore
        |  ORDER BY score DESC, feature, v LIMIT 1),
        |lvl1 AS (
        |  SELECT CASE WHEN (CASE best.feature WHEN 'l_quantity' THEN f1
        |      WHEN 'l_discount' THEN f2 ELSE f3 END) <= best.v
        |    THEN 'L' ELSE 'R' END AS node, y, f1, f2, f3
        |  FROM base CROSS JOIN best),
        |melt2 AS (
        |  SELECT node, 'l_quantity' AS feature, f1 AS v, y FROM lvl1
        |  UNION ALL SELECT node, 'l_discount', f2, y FROM lvl1
        |  UNION ALL SELECT node, 'l_tax', f3, y FROM lvl1),
        |agg2 AS (
        |  SELECT node, feature, v, count(*) AS n, sum(y) AS pos
        |  FROM melt2 GROUP BY 1, 2, 3),
        |cum2 AS (
        |  SELECT node, feature, v,
        |    sum(n) OVER (PARTITION BY node, feature ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS nl,
        |    sum(pos) OVER (PARTITION BY node, feature ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS posl,
        |    sum(n) OVER (PARTITION BY node, feature) AS nt,
        |    sum(pos) OVER (PARTITION BY node, feature) AS post
        |  FROM agg2),
        |par2 AS (
        |  SELECT node, count(*) AS n, sum(y) AS pos,
        |    (CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)
        |      + CAST(count(*) - sum(y) AS DOUBLE)
        |        * CAST(count(*) - sum(y) AS DOUBLE))
        |      / CAST(count(*) AS DOUBLE) AS pscore
        |  FROM lvl1 GROUP BY 1),
        |sc2 AS (
        |  SELECT node, feature, v, nl, posl, nt - nl AS nr,
        |    post - posl AS posr,
        |    (CAST(posl AS DOUBLE) * CAST(posl AS DOUBLE)
        |      + CAST(nl - posl AS DOUBLE) * CAST(nl - posl AS DOUBLE))
        |      / CAST(nl AS DOUBLE)
        |    + (CAST(post - posl AS DOUBLE) * CAST(post - posl AS DOUBLE)
        |      + CAST((nt - nl) - (post - posl) AS DOUBLE)
        |        * CAST((nt - nl) - (post - posl) AS DOUBLE))
        |      / CAST(nt - nl AS DOUBLE) AS score
        |  FROM cum2 WHERE nl >= 1 AND nt - nl >= 1),
        |best2 AS (
        |  SELECT node, feature, v, nl, posl, nr, posr FROM (
        |    SELECT sc2.*, row_number() OVER (PARTITION BY sc2.node
        |        ORDER BY score DESC, feature, v) AS rk
        |    FROM sc2 JOIN par2 USING (node) WHERE score > pscore)
        |  WHERE rk = 1)
        |SELECT '' AS path, 0 AS depth, CAST(par.n AS BIGINT) AS n,
        |    CAST(par.pos AS BIGINT) AS pos, best.feature,
        |    CAST(best.v AS DOUBLE) AS threshold,
        |    CASE WHEN 2 * par.pos > par.n THEN 1 ELSE 0 END AS pred
        |  FROM par CROSS JOIN best
        |UNION ALL
        |SELECT p2.node, 1, CAST(p2.n AS BIGINT), CAST(p2.pos AS BIGINT),
        |    b2.feature, CAST(b2.v AS DOUBLE),
        |    CASE WHEN 2 * p2.pos > p2.n THEN 1 ELSE 0 END
        |  FROM par2 p2 LEFT JOIN best2 b2 ON b2.node = p2.node
        |UNION ALL
        |SELECT b2.node || 'L', 2, CAST(b2.nl AS BIGINT),
        |    CAST(b2.posl AS BIGINT), NULL, NULL,
        |    CASE WHEN 2 * b2.posl > b2.nl THEN 1 ELSE 0 END FROM best2 b2
        |UNION ALL
        |SELECT b2.node || 'R', 2, CAST(b2.nr AS BIGINT),
        |    CAST(b2.posr AS BIGINT), NULL, NULL,
        |    CASE WHEN 2 * b2.posr > b2.nr THEN 1 ELSE 0 END FROM best2 b2
        |ORDER BY path""".stripMargin,

    // identical (min, max) pass, fixed-width upper-edge mapping
    // lo + (least(floor((x−lo)/w), b−1) + 1)·w with w = (hi−lo)/b, then
    // the q284 stump pipeline on the ≤16-value collapse
    "q286_stump_binned" ->
      """WITH base AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
        |    CAST(l_extendedprice AS DOUBLE) AS x
        |  FROM lineitem),
        |mm AS (SELECT min(x) AS lo, max(x) AS hi FROM base),
        |binned AS (
        |  SELECT y, lo + (least(floor((x - lo) / ((hi - lo) / 16)), 15.0)
        |    + 1.0) * ((hi - lo) / 16) AS v
        |  FROM base CROSS JOIN mm),
        |agg AS (SELECT v, count(*) AS n, sum(y) AS pos
        |  FROM binned GROUP BY 1),
        |cum AS (
        |  SELECT v,
        |    sum(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS nl,
        |    sum(pos) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS posl,
        |    sum(n) OVER () AS nt, sum(pos) OVER () AS post
        |  FROM agg),
        |sc AS (
        |  SELECT v, nl, posl, nt - nl AS nr, post - posl AS posr,
        |    (CAST(posl AS DOUBLE) * CAST(posl AS DOUBLE)
        |      + CAST(nl - posl AS DOUBLE) * CAST(nl - posl AS DOUBLE))
        |      / CAST(nl AS DOUBLE)
        |    + (CAST(post - posl AS DOUBLE) * CAST(post - posl AS DOUBLE)
        |      + CAST((nt - nl) - (post - posl) AS DOUBLE)
        |        * CAST((nt - nl) - (post - posl) AS DOUBLE))
        |      / CAST(nt - nl AS DOUBLE) AS score
        |  FROM cum WHERE nl >= 1 AND nt - nl >= 1),
        |par AS (
        |  SELECT count(*) AS n, sum(y) AS pos,
        |    (CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)
        |      + CAST(count(*) - sum(y) AS DOUBLE)
        |        * CAST(count(*) - sum(y) AS DOUBLE))
        |      / CAST(count(*) AS DOUBLE) AS pscore
        |  FROM base),
        |best AS (
        |  SELECT v, nl, posl, nr, posr
        |  FROM sc CROSS JOIN par WHERE score > pscore
        |  ORDER BY score DESC, v LIMIT 1)
        |SELECT '' AS path, 0 AS depth, CAST(par.n AS BIGINT) AS n,
        |    CAST(par.pos AS BIGINT) AS pos,
        |    'l_extendedprice' AS feature, CAST(best.v AS DOUBLE) AS threshold,
        |    CASE WHEN 2 * par.pos > par.n THEN 1 ELSE 0 END AS pred
        |  FROM par CROSS JOIN best
        |UNION ALL
        |SELECT 'L', 1, CAST(nl AS BIGINT), CAST(posl AS BIGINT), NULL, NULL,
        |    CASE WHEN 2 * posl > nl THEN 1 ELSE 0 END FROM best
        |UNION ALL
        |SELECT 'R', 1, CAST(nr AS BIGINT), CAST(posr AS BIGINT), NULL, NULL,
        |    CASE WHEN 2 * posr > nr THEN 1 ELSE 0 END FROM best
        |ORDER BY path""".stripMargin,

    // identical integral-cents inputs (exact sums), identical cross-moment
    // order nn·Σzy − Σz·Σy etc., ratios rounded on the 6-digit grid
    "q287_iv_wald" ->
      """WITH base AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(CASE WHEN l_tax < 0.04 THEN 1 ELSE 0 END AS DOUBLE) AS z,
        |    CAST(CAST(round(l_discount * 100) AS BIGINT) AS DOUBLE) AS x,
        |    CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DOUBLE)
        |      AS y
        |  FROM lineitem),
        |agg AS (
        |  SELECT flag, count(*) AS n, sum(z) AS sz, sum(y) AS sy,
        |    sum(x) AS sx, sum(z * y) AS szy, sum(z * x) AS szx,
        |    sum(z * z) AS szz
        |  FROM base GROUP BY 1)
        |SELECT flag, n,
        |  round((CAST(n AS DOUBLE) * szy - sz * sy)
        |    / nullif(CAST(n AS DOUBLE) * szz - sz * sz, 0), 6) AS itt,
        |  round((CAST(n AS DOUBLE) * szx - sz * sx)
        |    / nullif(CAST(n AS DOUBLE) * szz - sz * sz, 0), 6) AS first_stage,
        |  round((CAST(n AS DOUBLE) * szy - sz * sy)
        |    / nullif(CAST(n AS DOUBLE) * szx - sz * sx, 0), 6) AS beta_iv
        |FROM agg ORDER BY flag""".stripMargin,

    // identical per-user integral-cents pre/post collapse, pooled theta
    // from the same one-row moments, identical adjusted-mean order
    "q288_cuped" ->
      """WITH pu AS (
        |  SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
        |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
        |      AS DOUBLE) AS x,
        |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
        |      AS DOUBLE) AS y
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT count(*) AS gn, sum(x) AS gsx, sum(y) AS gsy,
        |    sum(x * y) AS gsxy, sum(x * x) AS gsxx FROM pu),
        |th AS (
        |  SELECT (CAST(gn AS DOUBLE) * gsxy - gsx * gsy)
        |      / (CAST(gn AS DOUBLE) * gsxx - gsx * gsx) AS theta,
        |    gsx / CAST(gn AS DOUBLE) AS gmx FROM g),
        |a AS (
        |  SELECT arm, count(*) AS n, sum(y) AS sy, sum(x) AS sx
        |  FROM pu GROUP BY 1)
        |SELECT arm, n,
        |  round(sy / CAST(n AS DOUBLE), 6) AS mean_y,
        |  round(sx / CAST(n AS DOUBLE), 6) AS mean_x,
        |  round(sy / CAST(n AS DOUBLE)
        |    - theta * (sx / CAST(n AS DOUBLE) - gmx), 6) AS mean_y_adj
        |FROM a CROSS JOIN th ORDER BY arm""".stripMargin,

    // identical whole-dollar running variable, side-conditional sums, and
    // two-sided local-linear closed forms; slopes reported in ppm so the
    // 6-digit grid keeps significant digits
    "q289_rdd" ->
      """WITH pts AS (
        |  SELECT CAST(CAST(round(o_totalprice) AS BIGINT) AS DOUBLE)
        |      - 250000.0 AS x,
        |    CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
        |      AS DOUBLE) AS y
        |  FROM orders
        |  WHERE abs(CAST(CAST(round(o_totalprice) AS BIGINT) AS DOUBLE)
        |    - 250000.0) <= 100000.0),
        |agg AS (
        |  SELECT
        |    sum(CASE WHEN x < 0 THEN 1 ELSE 0 END) AS n_l,
        |    sum(CASE WHEN x < 0 THEN y ELSE 0.0 END) AS sy_l,
        |    sum(CASE WHEN x < 0 THEN x ELSE 0.0 END) AS sx_l,
        |    sum(CASE WHEN x < 0 THEN x * y ELSE 0.0 END) AS sxy_l,
        |    sum(CASE WHEN x < 0 THEN x * x ELSE 0.0 END) AS sxx_l,
        |    sum(CASE WHEN x >= 0 THEN 1 ELSE 0 END) AS n_r,
        |    sum(CASE WHEN x >= 0 THEN y ELSE 0.0 END) AS sy_r,
        |    sum(CASE WHEN x >= 0 THEN x ELSE 0.0 END) AS sx_r,
        |    sum(CASE WHEN x >= 0 THEN x * y ELSE 0.0 END) AS sxy_r,
        |    sum(CASE WHEN x >= 0 THEN x * x ELSE 0.0 END) AS sxx_r
        |  FROM pts),
        |ab AS (
        |  SELECT n_l, n_r,
        |    (CAST(n_l AS DOUBLE) * sxy_l - sx_l * sy_l)
        |      / (CAST(n_l AS DOUBLE) * sxx_l - sx_l * sx_l) AS b_l,
        |    (CAST(n_r AS DOUBLE) * sxy_r - sx_r * sy_r)
        |      / (CAST(n_r AS DOUBLE) * sxx_r - sx_r * sx_r) AS b_r,
        |    sy_l, sx_l, sy_r, sx_r
        |  FROM agg),
        |fin AS (
        |  SELECT n_l, n_r, b_l, b_r,
        |    (sy_l - b_l * sx_l) / CAST(n_l AS DOUBLE) AS a_l,
        |    (sy_r - b_r * sx_r) / CAST(n_r AS DOUBLE) AS a_r
        |  FROM ab)
        |SELECT CAST(n_l AS BIGINT) AS n_l, CAST(n_r AS BIGINT) AS n_r,
        |  round(b_l * 1000000.0, 6) AS slope_l_ppm,
        |  round(b_r * 1000000.0, 6) AS slope_r_ppm,
        |  round(a_l, 6) AS lim_l, round(a_r, 6) AS lim_r,
        |  round(a_r - a_l, 6) AS tau
        |FROM fin""".stripMargin,

    // brute-force ε-graph over the same float→double coordinates (the
    // grid is only candidate blocking — recall is complete either way),
    // identical (dx² + dy²) ≤ eps·eps predicate, same core threshold,
    // recursive-CTE closure with min labels, min-label border attachment
    "q290_dbscan" ->
      """WITH RECURSIVE p AS (
        |  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
        |    CAST(embedding[2] AS DOUBLE) AS y FROM embeddings),
        |nb AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM p a JOIN p b
        |  ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        |    <= CAST(0.02 AS DOUBLE) * CAST(0.02 AS DOUBLE)),
        |deg AS (SELECT id_a, count(*) AS d FROM nb GROUP BY 1),
        |cores AS (SELECT id_a AS id FROM deg WHERE d >= 5),
        |ce AS (
        |  SELECT id_a, id_b FROM nb
        |  WHERE id_a < id_b AND id_a IN (SELECT id FROM cores)
        |    AND id_b IN (SELECT id FROM cores)),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM ce
        |  UNION ALL SELECT id_b, id_a FROM ce),
        |cc(id, label) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, c.label FROM cc c JOIN edges e ON c.id = e.src),
        |clab AS (SELECT id, min(label) AS lbl FROM cc GROUP BY id),
        |corelab AS (
        |  SELECT c.id, coalesce(cl.lbl, c.id) AS lbl
        |  FROM cores c LEFT JOIN clab cl ON cl.id = c.id),
        |border AS (
        |  SELECT nb.id_a, min(k.lbl) AS lbl
        |  FROM nb JOIN corelab k ON k.id = nb.id_b
        |  WHERE nb.id_a NOT IN (SELECT id FROM cores)
        |  GROUP BY 1)
        |SELECT p.vec_id, cl.id IS NOT NULL AS is_core,
        |  coalesce(cl.lbl, b.lbl) AS cluster
        |FROM p
        |LEFT JOIN corelab cl ON cl.id = p.vec_id
        |LEFT JOIN border b ON b.id_a = p.vec_id
        |ORDER BY p.vec_id""".stripMargin,

    // brute-force length-banded reference — the segment filter is only
    // candidate generation (recall-complete by the pigeonhole theorem),
    // the verify step applies the same levenshtein predicate
    "q291_edit_join" ->
      """SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
        |  CAST(levenshtein(a.s_name, b.s_name) AS INT) AS dist
        |FROM supplier a JOIN supplier b
        |  ON a.s_suppkey < b.s_suppkey
        |  AND abs(length(a.s_name) - length(b.s_name)) <= 1
        |WHERE levenshtein(a.s_name, b.s_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    // identical (score desc, doc) total order, running-relevant window,
    // exact small-integer precision ratios on the 6-digit grid
    "q292_map" ->
      """WITH ranked AS (
        |  SELECT source, doc_id,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS r,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) OVER (
        |      PARTITION BY source ORDER BY n_chars DESC, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM documents)
        |SELECT source, count(*) AS n_candidates,
        |  CAST(sum(rel) AS BIGINT) AS n_rel,
        |  round(CASE WHEN sum(rel) > 0 THEN
        |    sum(CASE WHEN r <= 10 AND rel = 1
        |      THEN CAST(cum AS DOUBLE) / CAST(r AS DOUBLE) ELSE 0.0 END)
        |    / CAST(least(sum(rel), 10) AS DOUBLE) END, 6) AS ap
        |FROM ranked GROUP BY source ORDER BY source""".stripMargin,

    // three unrolled boosting rounds: each = the identical melt +
    // (feature, value) collapse + cumulative windows + SSE-reduction
    // score (Sl²/nl + Sr²/nr, strict > root S²/n), leaf updates
    // floor(0.5·S/n) in integer micro-units so residuals stay exact
    "q293_gbm_stumps" ->
      """WITH base AS MATERIALIZED (
        |  SELECT CAST(CASE WHEN l_returnflag = 'R' THEN 1000000 ELSE 0
        |      END AS BIGINT) AS y6,
        |    l_quantity AS f1, l_discount AS f2, l_tax AS f3
        |  FROM lineitem),
        |m1 AS (
        |  SELECT 'l_quantity' AS feature, f1 AS v, y6 AS r FROM base
        |  UNION ALL SELECT 'l_discount', f2, y6 FROM base
        |  UNION ALL SELECT 'l_tax', f3, y6 FROM base),
        |a1 AS (SELECT feature, v, count(*) AS n, sum(r) AS s
        |  FROM m1 GROUP BY 1, 2),
        |c1 AS (SELECT feature, v,
        |    sum(n) OVER (PARTITION BY feature ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS nl,
        |    sum(s) OVER (PARTITION BY feature ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS sl,
        |    sum(n) OVER (PARTITION BY feature) AS nt,
        |    sum(s) OVER (PARTITION BY feature) AS st
        |  FROM a1),
        |s1 AS (SELECT feature, v, nl, nt - nl AS nr, sl, st - sl AS sr,
        |    CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)
        |    + CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
        |      / CAST(nt - nl AS DOUBLE) AS score,
        |    CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
        |      AS pscore
        |  FROM c1 WHERE nl >= 1 AND nt - nl >= 1),
        |b1 AS (SELECT feature, v, nl, nr, sl, sr,
        |    CAST(floor(0.5 * (CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)))
        |      AS BIGINT) AS dl,
        |    CAST(floor(0.5 * (CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE)))
        |      AS BIGINT) AS dr
        |  FROM s1 WHERE score > pscore
        |  ORDER BY score DESC, feature, v LIMIT 1),
        |res2 AS MATERIALIZED (
        |  SELECT f1, f2, f3, y6 - (CASE WHEN (CASE b.feature
        |      WHEN 'l_quantity' THEN f1 WHEN 'l_discount' THEN f2
        |      ELSE f3 END) <= b.v THEN b.dl ELSE b.dr END) AS r
        |  FROM base CROSS JOIN b1 b),
        |m2 AS (
        |  SELECT 'l_quantity' AS feature, f1 AS v, r FROM res2
        |  UNION ALL SELECT 'l_discount', f2, r FROM res2
        |  UNION ALL SELECT 'l_tax', f3, r FROM res2),
        |a2 AS (SELECT feature, v, count(*) AS n, sum(r) AS s
        |  FROM m2 GROUP BY 1, 2),
        |c2 AS (SELECT feature, v,
        |    sum(n) OVER (PARTITION BY feature ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS nl,
        |    sum(s) OVER (PARTITION BY feature ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS sl,
        |    sum(n) OVER (PARTITION BY feature) AS nt,
        |    sum(s) OVER (PARTITION BY feature) AS st
        |  FROM a2),
        |s2 AS (SELECT feature, v, nl, nt - nl AS nr, sl, st - sl AS sr,
        |    CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)
        |    + CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
        |      / CAST(nt - nl AS DOUBLE) AS score,
        |    CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
        |      AS pscore
        |  FROM c2 WHERE nl >= 1 AND nt - nl >= 1),
        |b2 AS (SELECT feature, v, nl, nr, sl, sr,
        |    CAST(floor(0.5 * (CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)))
        |      AS BIGINT) AS dl,
        |    CAST(floor(0.5 * (CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE)))
        |      AS BIGINT) AS dr
        |  FROM s2 WHERE score > pscore
        |  ORDER BY score DESC, feature, v LIMIT 1),
        |res3 AS MATERIALIZED (
        |  SELECT f1, f2, f3, r - (CASE WHEN (CASE b.feature
        |      WHEN 'l_quantity' THEN f1 WHEN 'l_discount' THEN f2
        |      ELSE f3 END) <= b.v THEN b.dl ELSE b.dr END) AS r
        |  FROM res2 CROSS JOIN b2 b),
        |m3 AS (
        |  SELECT 'l_quantity' AS feature, f1 AS v, r FROM res3
        |  UNION ALL SELECT 'l_discount', f2, r FROM res3
        |  UNION ALL SELECT 'l_tax', f3, r FROM res3),
        |a3 AS (SELECT feature, v, count(*) AS n, sum(r) AS s
        |  FROM m3 GROUP BY 1, 2),
        |c3 AS (SELECT feature, v,
        |    sum(n) OVER (PARTITION BY feature ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS nl,
        |    sum(s) OVER (PARTITION BY feature ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS sl,
        |    sum(n) OVER (PARTITION BY feature) AS nt,
        |    sum(s) OVER (PARTITION BY feature) AS st
        |  FROM a3),
        |s3 AS (SELECT feature, v, nl, nt - nl AS nr, sl, st - sl AS sr,
        |    CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)
        |    + CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
        |      / CAST(nt - nl AS DOUBLE) AS score,
        |    CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
        |      AS pscore
        |  FROM c3 WHERE nl >= 1 AND nt - nl >= 1),
        |b3 AS (SELECT feature, v, nl, nr, sl, sr,
        |    CAST(floor(0.5 * (CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)))
        |      AS BIGINT) AS dl,
        |    CAST(floor(0.5 * (CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE)))
        |      AS BIGINT) AS dr
        |  FROM s3 WHERE score > pscore
        |  ORDER BY score DESC, feature, v LIMIT 1)
        |SELECT 1 AS round, feature, CAST(v AS DOUBLE) AS threshold,
        |    CAST(nl AS BIGINT) AS n_l, CAST(nr AS BIGINT) AS n_r,
        |    dl AS delta_l, dr AS delta_r FROM b1
        |UNION ALL
        |SELECT 2, feature, CAST(v AS DOUBLE), CAST(nl AS BIGINT),
        |    CAST(nr AS BIGINT), dl, dr FROM b2
        |UNION ALL
        |SELECT 3, feature, CAST(v AS DOUBLE), CAST(nl AS BIGINT),
        |    CAST(nr AS BIGINT), dl, dr FROM b3
        |ORDER BY round""".stripMargin,

    // OLS init + 3 unrolled IRLS steps with the delta continuation
    // (delta_1 = quantized mean |OLS residual|, delta_{t+1} = max(1e-6,
    // delta_t·0.1) — chained multiplications, no pow); betas floored to
    // the 1e-8 grid after every 2x2 solve (Cramer here, Cholesky
    // engine-side — they agree far inside half a grid cell, so the
    // quantized fixed point is identical); tau = 0.5 weights are
    // sign-free
    "q294_quantreg" ->
      """WITH d AS MATERIALIZED (
        |  SELECT CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y
        |  FROM lineitem),
        |g0 AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS sw, sum(x) AS swx,
        |    sum(x * x) AS swxx, sum(y) AS swy, sum(x * y) AS swxy
        |  FROM d),
        |b0 AS (
        |  SELECT
        |    floor(((swy * swxx - swx * swxy)
        |      / (sw * swxx - swx * swx)) * 1e8 + 0.5) / 1e8 AS c0,
        |    floor(((sw * swxy - swx * swy)
        |      / (sw * swxx - swx * swx)) * 1e8 + 0.5) / 1e8 AS c1
        |  FROM g0),
        |s0 AS (
        |  SELECT greatest(1e-6, floor(avg(abs(y - (c0 + c1 * x))) * 1e8
        |    + 0.5) / 1e8) AS d1
        |  FROM d CROSS JOIN b0),
        |g1 AS (
        |  SELECT sum(w) AS sw, sum(w * x) AS swx, sum(w * x * x) AS swxx,
        |    sum(w * y) AS swy, sum(w * x * y) AS swxy
        |  FROM (SELECT x, y,
        |      0.5 / greatest(abs(y - (c0 + c1 * x)), d1) AS w
        |    FROM d CROSS JOIN b0 CROSS JOIN s0)),
        |b1 AS (
        |  SELECT
        |    floor(((swy * swxx - swx * swxy)
        |      / (sw * swxx - swx * swx)) * 1e8 + 0.5) / 1e8 AS c0,
        |    floor(((sw * swxy - swx * swy)
        |      / (sw * swxx - swx * swx)) * 1e8 + 0.5) / 1e8 AS c1
        |  FROM g1),
        |g2 AS (
        |  SELECT sum(w) AS sw, sum(w * x) AS swx, sum(w * x * x) AS swxx,
        |    sum(w * y) AS swy, sum(w * x * y) AS swxy
        |  FROM (SELECT x, y,
        |      0.5 / greatest(abs(y - (c0 + c1 * x)),
        |        greatest(1e-6, d1 * 0.1)) AS w
        |    FROM d CROSS JOIN b1 CROSS JOIN s0)),
        |b2 AS (
        |  SELECT
        |    floor(((swy * swxx - swx * swxy)
        |      / (sw * swxx - swx * swx)) * 1e8 + 0.5) / 1e8 AS c0,
        |    floor(((sw * swxy - swx * swy)
        |      / (sw * swxx - swx * swx)) * 1e8 + 0.5) / 1e8 AS c1
        |  FROM g2),
        |g3 AS (
        |  SELECT sum(w) AS sw, sum(w * x) AS swx, sum(w * x * x) AS swxx,
        |    sum(w * y) AS swy, sum(w * x * y) AS swxy
        |  FROM (SELECT x, y,
        |      0.5 / greatest(abs(y - (c0 + c1 * x)),
        |        greatest(1e-6, greatest(1e-6, d1 * 0.1) * 0.1)) AS w
        |    FROM d CROSS JOIN b2 CROSS JOIN s0)),
        |b3 AS (
        |  SELECT
        |    floor(((swy * swxx - swx * swxy)
        |      / (sw * swxx - swx * swx)) * 1e8 + 0.5) / 1e8 AS c0,
        |    floor(((sw * swxy - swx * swy)
        |      / (sw * swxx - swx * swx)) * 1e8 + 0.5) / 1e8 AS c1
        |  FROM g3)
        |SELECT CAST(0.5 AS DOUBLE) AS tau, round(c0, 6) AS intercept,
        |  round(c1, 6) AS slope,
        |  round((SELECT avg(greatest(0.5 * (y - (c0 + c1 * x)),
        |    -0.5 * (y - (c0 + c1 * x)))) FROM d CROSS JOIN b3), 4)
        |    AS pinball
        |FROM b3""".stripMargin,

    // q18's centered-moment Cramer betas + one mean-absolute-deviation
    // pass; |beta|·dev products and the quantity-first share sum in the
    // same order
    "q295_lm_attribution" ->
      """WITH m AS (
        |  SELECT avg(l_quantity) AS mx1, avg(l_discount) AS mx2,
        |    avg(l_extendedprice) AS my,
        |    avg(l_quantity * l_quantity) AS x11,
        |    avg(l_quantity * l_discount) AS x12,
        |    avg(l_discount * l_discount) AS x22,
        |    avg(l_quantity * l_extendedprice) AS x1y,
        |    avg(l_discount * l_extendedprice) AS x2y
        |  FROM lineitem),
        |c AS (
        |  SELECT x11 - mx1 * mx1 AS s11, x12 - mx1 * mx2 AS s12,
        |    x22 - mx2 * mx2 AS s22, x1y - mx1 * my AS s1y,
        |    x2y - mx2 * my AS s2y, mx1, mx2
        |  FROM m),
        |b AS (
        |  SELECT mx1, mx2,
        |    (s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) AS b1,
        |    (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) AS b2
        |  FROM c),
        |dev AS (
        |  SELECT avg(abs(l_quantity - mx1)) AS d1,
        |    avg(abs(l_discount - mx2)) AS d2
        |  FROM lineitem CROSS JOIN b),
        |f AS (
        |  SELECT b1, b2, abs(b1) * d1 AS m1, abs(b2) * d2 AS m2
        |  FROM b CROSS JOIN dev)
        |SELECT 'l_quantity' AS feature, round(b1, 3) AS beta,
        |  round(m1, 3) AS mean_abs_phi, round(m1 / (m1 + m2), 6) AS share
        |FROM f
        |UNION ALL
        |SELECT 'l_discount', round(b2, 3), round(m2, 3),
        |  round(m2 / (m1 + m2), 6)
        |FROM f
        |ORDER BY feature""".stripMargin,

    // q293's three unrolled boosting rounds + the intervened scorer
    // averaged per grid value: substitute g for l_quantity inside each
    // round's split CASE, exact integer micro-unit sums to the divide
    "q296_pd_gbm" ->
      """WITH base AS MATERIALIZED (
        |  SELECT CAST(CASE WHEN l_returnflag = 'R' THEN 1000000 ELSE 0
        |      END AS BIGINT) AS y6,
        |    l_quantity AS f1, l_discount AS f2, l_tax AS f3
        |  FROM lineitem),
        |m1 AS (
        |  SELECT 'l_quantity' AS feature, f1 AS v, y6 AS r FROM base
        |  UNION ALL SELECT 'l_discount', f2, y6 FROM base
        |  UNION ALL SELECT 'l_tax', f3, y6 FROM base),
        |a1 AS (SELECT feature, v, count(*) AS n, sum(r) AS s
        |  FROM m1 GROUP BY 1, 2),
        |c1 AS (SELECT feature, v,
        |    sum(n) OVER (PARTITION BY feature ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS nl,
        |    sum(s) OVER (PARTITION BY feature ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS sl,
        |    sum(n) OVER (PARTITION BY feature) AS nt,
        |    sum(s) OVER (PARTITION BY feature) AS st
        |  FROM a1),
        |s1 AS (SELECT feature, v, nl, nt - nl AS nr, sl, st - sl AS sr,
        |    CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)
        |    + CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
        |      / CAST(nt - nl AS DOUBLE) AS score,
        |    CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
        |      AS pscore
        |  FROM c1 WHERE nl >= 1 AND nt - nl >= 1),
        |b1 AS (SELECT feature, v,
        |    CAST(floor(0.5 * (CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)))
        |      AS BIGINT) AS dl,
        |    CAST(floor(0.5 * (CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE)))
        |      AS BIGINT) AS dr
        |  FROM s1 WHERE score > pscore
        |  ORDER BY score DESC, feature, v LIMIT 1),
        |res2 AS MATERIALIZED (
        |  SELECT f1, f2, f3, y6 - (CASE WHEN (CASE b.feature
        |      WHEN 'l_quantity' THEN f1 WHEN 'l_discount' THEN f2
        |      ELSE f3 END) <= b.v THEN b.dl ELSE b.dr END) AS r
        |  FROM base CROSS JOIN b1 b),
        |m2 AS (
        |  SELECT 'l_quantity' AS feature, f1 AS v, r FROM res2
        |  UNION ALL SELECT 'l_discount', f2, r FROM res2
        |  UNION ALL SELECT 'l_tax', f3, r FROM res2),
        |a2 AS (SELECT feature, v, count(*) AS n, sum(r) AS s
        |  FROM m2 GROUP BY 1, 2),
        |c2 AS (SELECT feature, v,
        |    sum(n) OVER (PARTITION BY feature ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS nl,
        |    sum(s) OVER (PARTITION BY feature ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS sl,
        |    sum(n) OVER (PARTITION BY feature) AS nt,
        |    sum(s) OVER (PARTITION BY feature) AS st
        |  FROM a2),
        |s2 AS (SELECT feature, v, nl, nt - nl AS nr, sl, st - sl AS sr,
        |    CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)
        |    + CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
        |      / CAST(nt - nl AS DOUBLE) AS score,
        |    CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
        |      AS pscore
        |  FROM c2 WHERE nl >= 1 AND nt - nl >= 1),
        |b2 AS (SELECT feature, v,
        |    CAST(floor(0.5 * (CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)))
        |      AS BIGINT) AS dl,
        |    CAST(floor(0.5 * (CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE)))
        |      AS BIGINT) AS dr
        |  FROM s2 WHERE score > pscore
        |  ORDER BY score DESC, feature, v LIMIT 1),
        |res3 AS MATERIALIZED (
        |  SELECT f1, f2, f3, r - (CASE WHEN (CASE b.feature
        |      WHEN 'l_quantity' THEN f1 WHEN 'l_discount' THEN f2
        |      ELSE f3 END) <= b.v THEN b.dl ELSE b.dr END) AS r
        |  FROM res2 CROSS JOIN b2 b),
        |m3 AS (
        |  SELECT 'l_quantity' AS feature, f1 AS v, r FROM res3
        |  UNION ALL SELECT 'l_discount', f2, r FROM res3
        |  UNION ALL SELECT 'l_tax', f3, r FROM res3),
        |a3 AS (SELECT feature, v, count(*) AS n, sum(r) AS s
        |  FROM m3 GROUP BY 1, 2),
        |c3 AS (SELECT feature, v,
        |    sum(n) OVER (PARTITION BY feature ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS nl,
        |    sum(s) OVER (PARTITION BY feature ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS sl,
        |    sum(n) OVER (PARTITION BY feature) AS nt,
        |    sum(s) OVER (PARTITION BY feature) AS st
        |  FROM a3),
        |s3 AS (SELECT feature, v, nl, nt - nl AS nr, sl, st - sl AS sr,
        |    CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)
        |    + CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
        |      / CAST(nt - nl AS DOUBLE) AS score,
        |    CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
        |      AS pscore
        |  FROM c3 WHERE nl >= 1 AND nt - nl >= 1),
        |b3 AS (SELECT feature, v,
        |    CAST(floor(0.5 * (CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)))
        |      AS BIGINT) AS dl,
        |    CAST(floor(0.5 * (CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE)))
        |      AS BIGINT) AS dr
        |  FROM s3 WHERE score > pscore
        |  ORDER BY score DESC, feature, v LIMIT 1),
        |grid AS (
        |  SELECT CAST(v * 5 AS DOUBLE) AS g
        |  FROM (SELECT unnest(generate_series(1, 10)) AS v))
        |SELECT g AS value,
        |  round(avg(
        |    (CASE WHEN (CASE b1.feature WHEN 'l_quantity' THEN g
        |        WHEN 'l_discount' THEN f2 ELSE f3 END) <= b1.v
        |      THEN b1.dl ELSE b1.dr END)
        |    + (CASE WHEN (CASE b2.feature WHEN 'l_quantity' THEN g
        |        WHEN 'l_discount' THEN f2 ELSE f3 END) <= b2.v
        |      THEN b2.dl ELSE b2.dr END)
        |    + (CASE WHEN (CASE b3.feature WHEN 'l_quantity' THEN g
        |        WHEN 'l_discount' THEN f2 ELSE f3 END) <= b3.v
        |      THEN b3.dl ELSE b3.dr END)) / 1e6, 6) AS pd
        |FROM base CROSS JOIN grid
        |CROSS JOIN b1 CROSS JOIN b2 CROSS JOIN b3
        |GROUP BY g ORDER BY value""".stripMargin,

    // identical md5 60-bit draws against the same exact-long Poisson(1)
    // cumulative thresholds, identical replicate sums and (mean_b, b)
    // order statistics
    "q297_bootstrap_ci" ->
      """WITH base AS (
        |  SELECT CAST(c_custkey AS VARCHAR) AS id,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS v
        |  FROM customer),
        |obs AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS s FROM base),
        |drawn AS (
        |  SELECT b, v,
        |    CASE WHEN u < 424136118829305344 THEN 0
        |      WHEN u < 848272237658610688 THEN 1
        |      WHEN u < 1060340297073263360 THEN 2
        |      WHEN u < 1131029650211480960 THEN 3
        |      WHEN u < 1148701988496035328 THEN 4
        |      WHEN u < 1152236456152946176 THEN 5
        |      WHEN u < 1152825534095764608 THEN 6
        |      ELSE 7 END AS w
        |  FROM (
        |    SELECT v, b, ('0x' || substr(md5(id || '#' ||
        |      CAST(b AS VARCHAR)), 1, 15))::BIGINT AS u
        |    FROM base, UNNEST(generate_series(1, 200)) q(b))),
        |reps AS (
        |  SELECT b, CAST(sum(w) AS BIGINT) AS sw,
        |    CAST(sum(w * v) AS BIGINT) AS swv
        |  FROM drawn GROUP BY 1 HAVING sum(w) > 0),
        |ranked AS (
        |  SELECT CAST(swv AS DOUBLE) / sw AS mean_b,
        |    row_number() OVER (ORDER BY CAST(swv AS DOUBLE) / sw, b)
        |      AS rk,
        |    count(*) OVER () AS kept
        |  FROM reps)
        |SELECT obs.n, round(CAST(obs.s AS DOUBLE) / obs.n, 6) AS mean,
        |  200 AS n_boot,
        |  (SELECT CAST(max(kept) AS BIGINT) FROM ranked) AS n_boot_kept,
        |  round((SELECT mean_b FROM ranked WHERE rk = 5), 6) AS ci_lo,
        |  round((SELECT mean_b FROM ranked WHERE rk = 195), 6) AS ci_hi
        |FROM obs""".stripMargin,

    // identical adjacency explode, (count desc, word) vocab order, PPMI
    // on 6-digit grid BEFORE the cosine, context-keyed dot self-join,
    // dot/sqrt(na·nb) division order, (cosine desc, w1, w2) rank
    "q298_ppmi_similarity" ->
      """WITH toks AS (
        |  SELECT list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '') AS t
        |  FROM documents),
        |adj AS (
        |  SELECT t[i] AS a, t[i + 1] AS b
        |  FROM toks, unnest(generate_series(1, len(t) - 1)) u(i)
        |  WHERE len(t) >= 2),
        |pairs AS (
        |  SELECT a AS w, b AS c FROM adj
        |  UNION ALL SELECT b, a FROM adj),
        |tc AS (SELECT unnest(t) AS w FROM toks),
        |vocab AS (
        |  SELECT w FROM (
        |    SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) AS rk
        |    FROM tc GROUP BY 1)
        |  WHERE rk <= 50),
        |vp AS (
        |  SELECT w, c, count(*) AS n FROM pairs
        |  WHERE w IN (SELECT w FROM vocab) AND c IN (SELECT w FROM vocab)
        |  GROUP BY 1, 2),
        |rw AS (SELECT w, CAST(sum(n) AS BIGINT) AS rn FROM vp GROUP BY 1),
        |rc AS (SELECT c, CAST(sum(n) AS BIGINT) AS cn FROM vp GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM vp),
        |vecs AS (
        |  SELECT w, c, p FROM (
        |    SELECT w, c, round(greatest(0.0,
        |      ln(CAST(n AS DOUBLE) * nt
        |        / (CAST(rn AS DOUBLE) * cn))), 6) AS p
        |    FROM vp JOIN rw USING (w) JOIN rc USING (c) CROSS JOIN tot)
        |  WHERE p > 0),
        |norms AS (SELECT w, sum(p * p) AS n2 FROM vecs GROUP BY 1),
        |dots AS (
        |  SELECT x.w AS w1, y.w AS w2, sum(x.p * y.p) AS dt
        |  FROM vecs x JOIN vecs y ON x.c = y.c AND x.w < y.w
        |  GROUP BY 1, 2)
        |SELECT w1, w2, round(dt / sqrt(na.n2 * nb.n2), 6) AS cosine
        |FROM dots
        |JOIN norms na ON na.w = w1
        |JOIN norms nb ON nb.w = w2
        |ORDER BY cosine DESC, w1, w2 LIMIT 20""".stripMargin,

    // q113's batch funnel SQL verbatim — the streaming state fold must
    // reproduce the greedy first-touch walk exactly
    "q299_funnel_stream" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1),
        |c AS (SELECT (SELECT count(*) FROM s1) AS u1,
        |             (SELECT count(*) FROM s2) AS u2,
        |             (SELECT count(*) FROM s3) AS u3)
        |SELECT CAST(1 AS INT) AS step_no, 'view' AS step, u1 AS users,
        |  round(CAST(1.0 AS DOUBLE), 6) AS frac_first,
        |  round(CAST(1.0 AS DOUBLE), 6) AS frac_prev FROM c
        |UNION ALL
        |SELECT CAST(2 AS INT), 'click', u2,
        |  round(CAST(u2 AS DOUBLE) / u1, 6), round(CAST(u2 AS DOUBLE) / u1, 6)
        |FROM c
        |UNION ALL
        |SELECT CAST(3 AS INT), 'purchase', u3,
        |  round(CAST(u3 AS DOUBLE) / u1, 6), round(CAST(u3 AS DOUBLE) / u2, 6)
        |FROM c
        |ORDER BY step_no""".stripMargin,

    // identical journey extraction ((ts, id)-ordered touches strictly
    // before the first conversion), exact count-ratio chain, 8 unrolled
    // knockout-variant chain rounds on the same 1e-12 mass grid
    "q300_markov_attribution" ->
      """WITH ev AS (
        |  SELECT user_id AS u, event_type AS et, ts, event_id AS eid
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'signup', 'error',
        |    'purchase')),
        |conv AS (
        |  SELECT u, ts AS cts, eid AS cid FROM (
        |    SELECT u, ts, eid,
        |      row_number() OVER (PARTITION BY u ORDER BY ts, eid) AS rk
        |    FROM ev WHERE et = 'purchase')
        |  WHERE rk = 1),
        |touches AS (
        |  SELECT e.u, e.et, e.ts, e.eid, (c.u IS NOT NULL) AS cv
        |  FROM ev e LEFT JOIN conv c ON c.u = e.u
        |  WHERE e.et <> 'purchase'
        |    AND (c.u IS NULL OR (e.ts, e.eid) < (c.cts, c.cid))),
        |seq AS (
        |  SELECT u, et, cv,
        |    row_number() OVER (PARTITION BY u ORDER BY ts, eid) AS pos,
        |    lead(et) OVER (PARTITION BY u ORDER BY ts, eid) AS nxt
        |  FROM touches),
        |tl AS (
        |  SELECT u, u IN (SELECT u FROM conv) AS cv
        |  FROM (SELECT DISTINCT u FROM ev)
        |  WHERE u NOT IN (SELECT DISTINCT u FROM touches)),
        |edges AS (
        |  SELECT '__start' AS src, et AS dst FROM seq WHERE pos = 1
        |  UNION ALL SELECT et, nxt FROM seq WHERE nxt IS NOT NULL
        |  UNION ALL SELECT et,
        |    CASE WHEN cv THEN '__conv' ELSE '__null' END
        |  FROM seq WHERE nxt IS NULL
        |  UNION ALL SELECT '__start',
        |    CASE WHEN cv THEN '__conv' ELSE '__null' END FROM tl),
        |cnt AS (SELECT src, dst, count(*) AS n FROM edges GROUP BY 1, 2),
        |tr AS (
        |  SELECT src, dst,
        |    CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src) AS p
        |  FROM cnt),
        |ch AS (
        |  SELECT src AS c FROM tr
        |  WHERE src NOT IN ('__start', '__conv', '__null')
        |  UNION
        |  SELECT dst FROM tr
        |  WHERE dst NOT IN ('__start', '__conv', '__null')),
        |va AS (SELECT c AS v FROM ch UNION ALL SELECT '__none'),
        |vt AS (
        |  SELECT va.v, tr.src,
        |    CASE WHEN tr.dst = va.v THEN '__null' ELSE tr.dst END AS dst,
        |    tr.p
        |  FROM tr CROSS JOIN va WHERE tr.src <> va.v
        |  UNION ALL SELECT v, '__conv', '__conv', 1.0 FROM va
        |  UNION ALL SELECT v, '__null', '__null', 1.0 FROM va),
        |v0 AS (
        |  SELECT v, '__start' AS state, CAST(1.0 AS DOUBLE) AS mass
        |  FROM va),
        |v1 AS (
        |  SELECT vt.v, vt.dst AS state,
        |    floor(sum(v0.mass * vt.p) * 1e12 + 0.5) / 1e12 AS mass
        |  FROM v0 JOIN vt ON vt.v = v0.v AND vt.src = v0.state
        |  GROUP BY 1, 2),
        |v2 AS (
        |  SELECT vt.v, vt.dst AS state,
        |    floor(sum(v1.mass * vt.p) * 1e12 + 0.5) / 1e12 AS mass
        |  FROM v1 JOIN vt ON vt.v = v1.v AND vt.src = v1.state
        |  GROUP BY 1, 2),
        |v3 AS (
        |  SELECT vt.v, vt.dst AS state,
        |    floor(sum(v2.mass * vt.p) * 1e12 + 0.5) / 1e12 AS mass
        |  FROM v2 JOIN vt ON vt.v = v2.v AND vt.src = v2.state
        |  GROUP BY 1, 2),
        |v4 AS (
        |  SELECT vt.v, vt.dst AS state,
        |    floor(sum(v3.mass * vt.p) * 1e12 + 0.5) / 1e12 AS mass
        |  FROM v3 JOIN vt ON vt.v = v3.v AND vt.src = v3.state
        |  GROUP BY 1, 2),
        |v5 AS (
        |  SELECT vt.v, vt.dst AS state,
        |    floor(sum(v4.mass * vt.p) * 1e12 + 0.5) / 1e12 AS mass
        |  FROM v4 JOIN vt ON vt.v = v4.v AND vt.src = v4.state
        |  GROUP BY 1, 2),
        |v6 AS (
        |  SELECT vt.v, vt.dst AS state,
        |    floor(sum(v5.mass * vt.p) * 1e12 + 0.5) / 1e12 AS mass
        |  FROM v5 JOIN vt ON vt.v = v5.v AND vt.src = v5.state
        |  GROUP BY 1, 2),
        |v7 AS (
        |  SELECT vt.v, vt.dst AS state,
        |    floor(sum(v6.mass * vt.p) * 1e12 + 0.5) / 1e12 AS mass
        |  FROM v6 JOIN vt ON vt.v = v6.v AND vt.src = v6.state
        |  GROUP BY 1, 2),
        |v8 AS (
        |  SELECT vt.v, vt.dst AS state,
        |    floor(sum(v7.mass * vt.p) * 1e12 + 0.5) / 1e12 AS mass
        |  FROM v7 JOIN vt ON vt.v = v7.v AND vt.src = v7.state
        |  GROUP BY 1, 2),
        |pc AS (SELECT v, mass FROM v8 WHERE state = '__conv'),
        |b AS (SELECT mass AS p0 FROM pc WHERE v = '__none'),
        |re AS (
        |  SELECT ch.c AS channel, b.p0,
        |    CASE WHEN b.p0 > 0
        |      THEN 1.0 - coalesce(pc.mass, 0.0) / b.p0
        |      ELSE 0.0 END AS re
        |  FROM ch CROSS JOIN b LEFT JOIN pc ON pc.v = ch.c),
        |rt AS (SELECT sum(re) AS ret FROM re)
        |SELECT channel, round(p0, 6) AS p_conv,
        |  round(re, 6) AS removal_effect,
        |  round(CASE WHEN rt.ret > 0 THEN re / rt.ret ELSE 0.0 END, 6)
        |    AS attribution
        |FROM re CROSS JOIN rt ORDER BY channel""".stripMargin,

    // saturated exponential-AFT MLE: per-cell rate = events/exposure,
    // AFT beta = negated log-rate contrasts, SEs from the analytic
    // information (1/e0, 1/e0 + 1/e1) — the q20 closed-cell discipline
    "q301_aft_exponential" ->
      """WITH per AS (
        |  SELECT user_id, min(ts) AS t0,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
        |    max(ts) AS tl, avg(value) AS av
        |  FROM events GROUP BY 1),
        |d AS (
        |  SELECT CAST(epoch_us(coalesce(tp, tl)) - epoch_us(t0) AS DOUBLE)
        |      / 3600000000.0 AS dur,
        |    CAST(tp IS NOT NULL AS INT) AS ev,
        |    CASE WHEN av > 49 THEN 1 ELSE 0 END AS xh
        |  FROM per WHERE av IS NOT NULL),
        |f AS (
        |  SELECT xh, CAST(sum(ev) AS DOUBLE) AS e, sum(dur) AS tt
        |  FROM d WHERE dur > 0 GROUP BY 1),
        |g AS (
        |  SELECT
        |    max(CASE WHEN xh = 0 THEN ln(e / tt) END) AS g0,
        |    max(CASE WHEN xh = 1 THEN ln(e / tt) END) AS g1,
        |    max(CASE WHEN xh = 0 THEN e END) AS e0,
        |    max(CASE WHEN xh = 1 THEN e END) AS e1
        |  FROM f)
        |SELECT '(Intercept)' AS feature, round(-g0, 6) AS beta,
        |  round(1.0 / sqrt(e0), 6) AS se FROM g
        |UNION ALL
        |SELECT 'x_high', round(-(g1 - g0), 6),
        |  round(sqrt(1.0 / e0 + 1.0 / e1), 6) FROM g
        |ORDER BY feature""".stripMargin,

    // identical graph + seed set, restart value 1/|S|, 3 unrolled rounds
    // of rst·((1−d) + d·dm) + d·in-mass on the same 1e-12 grid (dangling
    // mass computed each round — identically zero on the symmetrized
    // graph but the arithmetic replays either way)
    "q302_ppr" ->
      """WITH pe AS (
        |  SELECT DISTINCT 'p' || l_partkey AS u, 's' || l_suppkey AS v
        |  FROM lineitem),
        |e AS (SELECT u, v FROM pe UNION ALL SELECT v AS u, u AS v FROM pe),
        |deg AS (SELECT u, count(*) AS d FROM e GROUP BY 1),
        |src AS (
        |  SELECT DISTINCT 'p' || l_partkey AS u FROM lineitem
        |  WHERE l_partkey % 100 = 0),
        |ns AS (SELECT CAST(count(*) AS DOUBLE) AS ns FROM src),
        |restart AS (
        |  SELECT u, CAST(1.0 AS DOUBLE) / ns AS rst FROM src, ns),
        |r0 AS (SELECT u, rst AS r FROM restart),
        |dm0 AS (
        |  SELECT coalesce(sum(r), 0.0) AS dm FROM r0
        |  WHERE u NOT IN (SELECT u FROM deg)),
        |im1 AS (
        |  SELECT e.v AS u, sum(p.r / deg.d) AS im
        |  FROM e JOIN r0 p USING (u) JOIN deg USING (u) GROUP BY 1),
        |r1 AS (
        |  SELECT u, r FROM (
        |    SELECT u,
        |      floor((coalesce(rst, 0.0)
        |        * ((CAST(1.0 AS DOUBLE) - 0.85) + 0.85 * dm)
        |        + 0.85 * coalesce(im, 0.0)) * 1e12 + 0.5) / 1e12 AS r
        |    FROM restart FULL JOIN im1 USING (u) CROSS JOIN dm0)
        |  WHERE r > 0),
        |dm1 AS (
        |  SELECT coalesce(sum(r), 0.0) AS dm FROM r1
        |  WHERE u NOT IN (SELECT u FROM deg)),
        |im2 AS (
        |  SELECT e.v AS u, sum(p.r / deg.d) AS im
        |  FROM e JOIN r1 p USING (u) JOIN deg USING (u) GROUP BY 1),
        |r2 AS (
        |  SELECT u, r FROM (
        |    SELECT u,
        |      floor((coalesce(rst, 0.0)
        |        * ((CAST(1.0 AS DOUBLE) - 0.85) + 0.85 * dm)
        |        + 0.85 * coalesce(im, 0.0)) * 1e12 + 0.5) / 1e12 AS r
        |    FROM restart FULL JOIN im2 USING (u) CROSS JOIN dm1)
        |  WHERE r > 0),
        |dm2 AS (
        |  SELECT coalesce(sum(r), 0.0) AS dm FROM r2
        |  WHERE u NOT IN (SELECT u FROM deg)),
        |im3 AS (
        |  SELECT e.v AS u, sum(p.r / deg.d) AS im
        |  FROM e JOIN r2 p USING (u) JOIN deg USING (u) GROUP BY 1),
        |r3 AS (
        |  SELECT u, r FROM (
        |    SELECT u,
        |      floor((coalesce(rst, 0.0)
        |        * ((CAST(1.0 AS DOUBLE) - 0.85) + 0.85 * dm)
        |        + 0.85 * coalesce(im, 0.0)) * 1e12 + 0.5) / 1e12 AS r
        |    FROM restart FULL JOIN im3 USING (u) CROSS JOIN dm2)
        |  WHERE r > 0)
        |SELECT u AS node, round(r * 1000, 6) AS ppr_k
        |FROM r3 WHERE u LIKE 's%'
        |ORDER BY node""".stripMargin,

    // per-stratum saturated exponential-AFT MLE: the q301 closed cell
    // rates and information SEs with a GROUP BY stratum
    "q303_grouped_aft" ->
      """WITH per AS (
        |  SELECT user_id, min(ts) AS t0,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
        |    max(ts) AS tl, avg(value) AS av
        |  FROM events GROUP BY 1),
        |d AS (
        |  SELECT user_id % 3 AS g,
        |    CAST(epoch_us(coalesce(tp, tl)) - epoch_us(t0) AS DOUBLE)
        |      / 3600000000.0 AS dur,
        |    CAST(tp IS NOT NULL AS INT) AS ev,
        |    CASE WHEN av > 49 THEN 1 ELSE 0 END AS xh
        |  FROM per WHERE av IS NOT NULL),
        |f AS (
        |  SELECT g, xh, CAST(sum(ev) AS DOUBLE) AS e, sum(dur) AS tt,
        |    CAST(count(*) AS BIGINT) AS nn
        |  FROM d WHERE dur > 0 GROUP BY 1, 2),
        |gg AS (
        |  SELECT g,
        |    max(CASE WHEN xh = 0 THEN ln(e / tt) END) AS g0,
        |    max(CASE WHEN xh = 1 THEN ln(e / tt) END) AS g1,
        |    max(CASE WHEN xh = 0 THEN e END) AS e0,
        |    max(CASE WHEN xh = 1 THEN e END) AS e1,
        |    CAST(sum(nn) AS BIGINT) AS n_rows
        |  FROM f GROUP BY 1)
        |SELECT g AS stratum, round(-g0, 6) AS beta_intercept,
        |  round(-(g1 - g0), 6) AS beta_x_high,
        |  round(1.0 / sqrt(e0), 6) AS se_intercept,
        |  round(sqrt(1.0 / e0 + 1.0 / e1), 6) AS se_x_high, n_rows
        |FROM gg ORDER BY stratum""".stripMargin,

    // unigram-LM EM unrolled: the lattice forward/backward recurrences
    // become chained CTEs with the engine's EXACT float association
    // order; per-position posteriors quantize to integer micro-units
    // before any aggregation (so sum order is moot) and M-step probs are
    // exact integer ratios — identical bits both engines. Counts CAST to
    // BIGINT (DuckDB HUGEINT sums surface as float64 — the q266 lesson).
    "q304_unigram_lm" -> {
      s"""WITH $unigramSeedCtes,
         |${unigramEmRound(1, "pr0")},
         |${unigramEmRound(2, "pr1")}
         |SELECT piece, c AS weight_micro,
         |  round(CAST(c AS DOUBLE)
         |    / (SELECT CAST(sum(c) AS DOUBLE) FROM cf2), 6) AS p
         |FROM cf2 ORDER BY weight_micro DESC, piece LIMIT 40""".stripMargin
    },

    // q312's sign/bucket replay, self-joined with the bucket-size cap;
    // threshold on the rounded cosine, DISTINCT pairs
    "q313_cosine_pairs_lsh_portable" ->
      """WITH g AS MATERIALIZED (
        |  SELECT vec_id AS id, embedding FROM embeddings),
        |bits AS MATERIALIZED (
        |  SELECT id, b.b AS b,
        |    CASE WHEN sum(
        |      (CASE WHEN ('0x' || substr(md5(b.b || '#' || k.k), 1, 15))
        |          ::BIGINT % 2 = 0 THEN 1.0 ELSE -1.0 END)
        |      * CAST(embedding[k.k + 1] AS DOUBLE)) >= 0
        |    THEN 1 ELSE 0 END AS bit
        |  FROM g, UNNEST(generate_series(0, 15)) b(b),
        |    UNNEST(generate_series(0, 63)) k(k)
        |  GROUP BY id, b.b),
        |bk AS MATERIALIZED (
        |  SELECT id, CAST(b // 4 AS INT) AS band,
        |    string_agg(CAST(bit AS VARCHAR), '' ORDER BY b) AS bkey
        |  FROM bits GROUP BY 1, 2),
        |small AS (
        |  SELECT band, bkey FROM bk GROUP BY 1, 2
        |  HAVING count(*) <= 1000),
        |pruned AS (SELECT bk.* FROM bk JOIN small USING (band, bkey)),
        |cand AS MATERIALIZED (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM pruned a JOIN pruned b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id),
        |nrm AS MATERIALIZED (
        |  SELECT id, sqrt(sum(CAST(embedding[k.k + 1] AS DOUBLE)
        |    * CAST(embedding[k.k + 1] AS DOUBLE))) AS nn
        |  FROM g, UNNEST(generate_series(0, 63)) k(k) GROUP BY 1),
        |sc AS (
        |  SELECT cand.id_a, cand.id_b,
        |    round(sum(CAST(ae.embedding[k.k + 1] AS DOUBLE)
        |        * CAST(be.embedding[k.k + 1] AS DOUBLE))
        |      / (any_value(an.nn) * any_value(bn.nn)), 6) AS cos
        |  FROM cand
        |  JOIN g ae ON ae.id = cand.id_a
        |  JOIN g be ON be.id = cand.id_b
        |  JOIN nrm an ON an.id = cand.id_a
        |  JOIN nrm bn ON bn.id = cand.id_b
        |  CROSS JOIN UNNEST(generate_series(0, 63)) k(k)
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, cos FROM sc WHERE cos >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,

    // identical md5("b#j")-parity signs (the q272 replay), sign-bit
    // signatures, 4-bit band buckets as strings (engine joins on the
    // sliced arrays — same candidate SET), exact cosine on the 6-digit
    // grid with the id tiebreak
    "q312_ann_lsh_portable" ->
      """WITH g AS MATERIALIZED (
        |  SELECT vec_id AS id, embedding FROM embeddings),
        |bits AS MATERIALIZED (
        |  SELECT id, b.b AS b,
        |    CASE WHEN sum(
        |      (CASE WHEN ('0x' || substr(md5(b.b || '#' || k.k), 1, 15))
        |          ::BIGINT % 2 = 0 THEN 1.0 ELSE -1.0 END)
        |      * CAST(embedding[k.k + 1] AS DOUBLE)) >= 0
        |    THEN 1 ELSE 0 END AS bit
        |  FROM g, UNNEST(generate_series(0, 15)) b(b),
        |    UNNEST(generate_series(0, 63)) k(k)
        |  GROUP BY id, b.b),
        |bk AS MATERIALIZED (
        |  SELECT id, CAST(b // 4 AS INT) AS band,
        |    string_agg(CAST(bit AS VARCHAR), '' ORDER BY b) AS bkey
        |  FROM bits GROUP BY 1, 2),
        |cand AS MATERIALIZED (
        |  SELECT DISTINCT q.id AS query_id, c.id AS vec_id
        |  FROM bk q JOIN bk c ON q.band = c.band AND q.bkey = c.bkey
        |    AND c.id <> q.id
        |  WHERE q.id < 3),
        |nrm AS MATERIALIZED (
        |  SELECT id, sqrt(sum(CAST(embedding[k.k + 1] AS DOUBLE)
        |    * CAST(embedding[k.k + 1] AS DOUBLE))) AS nn
        |  FROM g, UNNEST(generate_series(0, 63)) k(k) GROUP BY 1),
        |sc AS (
        |  SELECT cand.query_id, cand.vec_id,
        |    round(sum(CAST(qe.embedding[k.k + 1] AS DOUBLE)
        |        * CAST(ce.embedding[k.k + 1] AS DOUBLE))
        |      / (any_value(qn.nn) * any_value(cn.nn)), 6) AS cos
        |  FROM cand
        |  JOIN g qe ON qe.id = cand.query_id
        |  JOIN g ce ON ce.id = cand.vec_id
        |  JOIN nrm qn ON qn.id = cand.query_id
        |  JOIN nrm cn ON cn.id = cand.vec_id
        |  CROSS JOIN UNNEST(generate_series(0, 63)) k(k)
        |  GROUP BY 1, 2)
        |SELECT query_id, vec_id, cos, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
        |  FROM sc)
        |WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin,

    // q305's DP per distinct word; tokens rejoin the corpus in word
    // order (row_number over the pre-filter ordinality), then the
    // per-word piece strings re-split to one row per token. NOTE the
    // oracle's '|' join/re-split assumes no '|' inside a token (true of
    // this corpus; the ENGINE needs no delimiter — tokens stay arrays)
    "q311_unigram_tokenize" -> {
      val toks = (unigramL to 1 by -1).map { k =>
        s"CASE WHEN e_$k IS NOT NULL THEN " +
          s"substr(w, e_$k + 1, e_${k - 1} - e_$k) END"
      }.mkString(", ")
      s"""WITH wd0 AS (
         |  SELECT doc_id, unnest(l) AS t0,
         |    unnest(generate_series(1, len(l))) AS ord
         |  FROM (SELECT doc_id,
         |      regexp_split_to_array(text, '\\s+') AS l FROM documents)),
         |wd AS MATERIALIZED (
         |  SELECT doc_id, substr(t0, 1, $unigramL) AS w,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS wpos
         |  FROM wd0 WHERE t0 <> ''),
         |w AS MATERIALIZED (SELECT DISTINCT w FROM wd),
         |$unigramVitCtes,
         |dict AS (
         |  SELECT w, concat_ws('|', $toks) AS toks FROM e$unigramL),
         |per AS (
         |  SELECT wd.doc_id,
         |    string_agg(dict.toks, '|' ORDER BY wd.wpos) AS alltoks
         |  FROM wd JOIN dict USING (w) GROUP BY 1),
         |px2 AS (SELECT doc_id, string_split(alltoks, '|') AS tl FROM per)
         |SELECT doc_id, CAST(ord - 1 AS INT) AS pos, token FROM (
         |  SELECT doc_id, unnest(tl) AS token,
         |    unnest(generate_series(1, len(tl))) AS ord
         |  FROM px2)
         |ORDER BY doc_id, pos""".stripMargin
    },

    // q105's PSI arithmetic over the events time split — the streaming
    // replay aggregates exact integer bin counts, so batch SQL is the
    // oracle verbatim (the q113↔q299 parity-gate pattern)
    "q310_psi_stream" ->
      """WITH b AS (
        |  SELECT ts < TIMESTAMP '2024-01-16 00:00:00' AS is_ref,
        |    CASE WHEN value IS NULL THEN -1
        |         WHEN value <= 15.0 THEN 0
        |         WHEN value <= 35.0 THEN 1
        |         WHEN value <= 70.0 THEN 2
        |         ELSE 3 END AS bin
        |  FROM events),
        |pr AS (
        |  SELECT bin, CAST(count(*) AS DOUBLE)
        |      / sum(count(*)) OVER () AS p
        |  FROM b WHERE is_ref GROUP BY bin),
        |pc AS (
        |  SELECT bin, CAST(count(*) AS DOUBLE)
        |      / sum(count(*)) OVER () AS p
        |  FROM b WHERE NOT is_ref GROUP BY bin),
        |j AS (
        |  SELECT greatest(coalesce(pr.p, 0.0), 0.000001) AS a,
        |    greatest(coalesce(pc.p, 0.0), 0.000001) AS c
        |  FROM pr FULL OUTER JOIN pc USING (bin))
        |SELECT round(sum((a - c) * ln(a / c)), 8) AS psi,
        |  count(*) AS n_bins
        |FROM j""".stripMargin,

    // identical token filter, window starts every 24, 1-based list
    // slicing, short tails (< 4 tokens) dropped
    "q309_sliding_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> '') AS l
        |  FROM documents),
        |win AS (
        |  SELECT doc_id, CAST(st.s / 24 AS INT) AS chunk_id,
        |    l[st.s + 1 : least(len(l), st.s + 32)] AS w
        |  FROM toks,
        |    UNNEST(generate_series(0, greatest(len(l) - 1, 0), 24)) st(s))
        |SELECT doc_id, chunk_id, CAST(len(w) AS INT) AS n_tokens,
        |  array_to_string(w, ' ') AS chunk
        |FROM win WHERE len(w) >= 4
        |ORDER BY doc_id, chunk_id""".stripMargin,

    // IVF-PQ: q273's seeded-codebook machinery twice over — an m=1/8-cell
    // coarse quantizer for assignment + probes (argmin / rank<=2 on the
    // raw partial distance with the cell tiebreak, the q163 discipline),
    // then q274's LUT rescoring restricted to the probed candidates; the
    // final grid round carries q274's `+ 0.0` signed-zero normalization
    "q308_ivfpq_topk" ->
      """WITH seeds AS MATERIALIZED (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, embedding
        |  FROM (SELECT vec_id, embedding FROM embeddings
        |        WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 16)),
        |cells AS MATERIALIZED (
        |  SELECT s.s, c, j.j AS j,
        |    CAST(embedding[s.s * 8 + j.j + 1] AS DOUBLE) AS w
        |  FROM seeds, UNNEST(generate_series(0, 7)) s(s),
        |    UNNEST(generate_series(0, 7)) j(j)),
        |cn AS MATERIALIZED (
        |  SELECT s, c, sum(w * w) AS n2 FROM cells GROUP BY 1, 2),
        |x AS MATERIALIZED (
        |  SELECT vec_id, s.s, j.j AS j,
        |    CAST(embedding[s.s * 8 + j.j + 1] AS DOUBLE) AS v
        |  FROM embeddings, UNNEST(generate_series(0, 7)) s(s),
        |    UNNEST(generate_series(0, 7)) j(j)),
        |codes AS MATERIALIZED (
        |  SELECT vec_id, s, c FROM (
        |    SELECT x.vec_id, x.s, cells.c, row_number() OVER (
        |      PARTITION BY x.vec_id, x.s ORDER BY
        |        -2 * sum(x.v * cells.w) + any_value(cn.n2), cells.c) AS rk
        |    FROM x JOIN cells ON x.s = cells.s AND x.j = cells.j
        |    JOIN cn ON cells.s = cn.s AND cells.c = cn.c
        |    GROUP BY x.vec_id, x.s, cells.c)
        |  WHERE rk = 1),
        |cseeds AS MATERIALIZED (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, embedding
        |  FROM (SELECT vec_id, embedding FROM embeddings
        |        WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 8)),
        |ccells AS MATERIALIZED (
        |  SELECT c, j.j AS j, CAST(embedding[j.j + 1] AS DOUBLE) AS w
        |  FROM cseeds, UNNEST(generate_series(0, 63)) j(j)),
        |ccn AS MATERIALIZED (
        |  SELECT c, sum(w * w) AS n2 FROM ccells GROUP BY 1),
        |cx AS MATERIALIZED (
        |  SELECT vec_id, j.j AS j, CAST(embedding[j.j + 1] AS DOUBLE) AS v
        |  FROM embeddings, UNNEST(generate_series(0, 63)) j(j)),
        |assign AS MATERIALIZED (
        |  SELECT vec_id, c AS cluster FROM (
        |    SELECT cx.vec_id, ccells.c, row_number() OVER (
        |      PARTITION BY cx.vec_id ORDER BY
        |        -2 * sum(cx.v * ccells.w) + any_value(ccn.n2), ccells.c)
        |      AS rk
        |    FROM cx JOIN ccells ON cx.j = ccells.j
        |    JOIN ccn ON ccells.c = ccn.c
        |    GROUP BY cx.vec_id, ccells.c)
        |  WHERE rk = 1),
        |q AS MATERIALIZED (
        |  SELECT vec_id AS query_id, embedding FROM embeddings
        |  ORDER BY vec_id LIMIT 3),
        |qq AS (
        |  SELECT query_id,
        |    sum(CAST(embedding[u.ix + 1] AS DOUBLE)
        |      * CAST(embedding[u.ix + 1] AS DOUBLE)) AS qq
        |  FROM q, UNNEST(generate_series(0, 63)) u(ix) GROUP BY 1),
        |qcx AS MATERIALIZED (
        |  SELECT query_id, j.j AS j,
        |    CAST(embedding[j.j + 1] AS DOUBLE) AS v
        |  FROM q, UNNEST(generate_series(0, 63)) j(j)),
        |probes AS MATERIALIZED (
        |  SELECT query_id, c AS cluster FROM (
        |    SELECT qcx.query_id, ccells.c, row_number() OVER (
        |      PARTITION BY qcx.query_id ORDER BY
        |        -2 * sum(qcx.v * ccells.w) + any_value(ccn.n2), ccells.c)
        |      AS rk
        |    FROM qcx JOIN ccells ON qcx.j = ccells.j
        |    JOIN ccn ON ccells.c = ccn.c
        |    GROUP BY qcx.query_id, ccells.c)
        |  WHERE rk <= 2),
        |qx AS (
        |  SELECT query_id, s.s, j.j AS j,
        |    CAST(embedding[s.s * 8 + j.j + 1] AS DOUBLE) AS v
        |  FROM q, UNNEST(generate_series(0, 7)) s(s),
        |    UNNEST(generate_series(0, 7)) j(j)),
        |lut AS MATERIALIZED (
        |  SELECT qx.query_id, qx.s, cells.c,
        |    -2 * sum(qx.v * cells.w) + any_value(cn.n2) AS pd
        |  FROM qx JOIN cells ON qx.s = cells.s AND qx.j = cells.j
        |  JOIN cn ON cells.s = cn.s AND cells.c = cn.c
        |  GROUP BY qx.query_id, qx.s, cells.c),
        |cand AS MATERIALIZED (
        |  SELECT p.query_id, a.vec_id
        |  FROM probes p JOIN assign a ON a.cluster = p.cluster),
        |sc AS (
        |  SELECT cand.query_id, codes.vec_id,
        |    round(sum(l.pd) + any_value(qq.qq), 6) + 0.0 AS adist2
        |  FROM cand JOIN codes ON codes.vec_id = cand.vec_id
        |  JOIN lut l ON codes.s = l.s AND codes.c = l.c
        |    AND l.query_id = cand.query_id
        |  JOIN qq ON qq.query_id = cand.query_id
        |  GROUP BY 1, 2)
        |SELECT query_id, vec_id, adist2, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY adist2, vec_id) AS rn
        |  FROM sc)
        |WHERE rn <= 5 ORDER BY query_id, vec_id""".stripMargin,

    // the full Kudo loop: 2 EM rounds, PRUNE (keep all singles + top-40
    // multi-char pieces by exact integer count — the deterministic
    // stand-in for the likelihood-loss ranking), 2 more EM rounds
    "q307_unigram_pruned" -> {
      s"""WITH $unigramSeedCtes,
         |${unigramEmRound(1, "pr0")},
         |${unigramEmRound(2, "pr1")},
         |k2 AS MATERIALIZED (
         |  SELECT piece, c FROM (
         |    SELECT piece, c FROM cf2 WHERE length(piece) > 1
         |    ORDER BY c DESC, piece LIMIT 40)
         |  UNION ALL
         |  SELECT piece, c FROM cf2 WHERE length(piece) = 1),
         |prk AS (
         |  SELECT piece, CAST(c AS DOUBLE)
         |    / (SELECT CAST(sum(c) AS DOUBLE) FROM k2) AS p FROM k2),
         |${unigramEmRound(3, "prk")},
         |${unigramEmRound(4, "pr3")}
         |SELECT piece, c AS weight_micro,
         |  round(CAST(c AS DOUBLE)
         |    / (SELECT CAST(sum(c) AS DOUBLE) FROM cf4), 6) AS p
         |FROM cf4 ORDER BY weight_micro DESC, piece LIMIT 40""".stripMargin
    },

    // Viterbi unigram segmentation replay: the integer-score DP unrolls
    // as chained CTEs with the engine's exact first-max-wins tie-break
    // (fold over j ascending, strict >); OOV single chars take the unk
    // penalty, OOV multi-char pieces have no edge. Integer arithmetic
    // end-to-end — FULL hash equality.
    "q305_unigram_segment" -> {
      val toks = (unigramL to 1 by -1).map { k =>
        s"CASE WHEN e_$k IS NOT NULL THEN " +
          s"substr(w, e_$k + 1, e_${k - 1} - e_$k) END"
      }.mkString(", ")
      s"""WITH w AS MATERIALIZED (
         |  SELECT DISTINCT substr(t, 1, $unigramL) AS w FROM (
         |    SELECT unnest(regexp_split_to_array(text, '\\s+')) AS t
         |    FROM documents)
         |  WHERE t <> ''),
         |$unigramVitCtes
         |SELECT w, concat_ws('|', $toks) AS toks
         |FROM e$unigramL ORDER BY w""".stripMargin
    },

    // per-document unigram-LM fit: the same DP, per-word best-path
    // micro-nat totals and piece counts dictionary-joined back onto the
    // (doc, word) frame — exact integer sums, one pinned double division
    "q306_unigram_score" -> {
      val scoreCase = (1 to unigramL)
        .map(l => s"WHEN $l THEN v_${l}_b").mkString(" ")
      val nPieces = (1 to unigramL)
        .map(k => s"(CASE WHEN e_$k IS NOT NULL THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH wd AS MATERIALIZED (
         |  SELECT doc_id, substr(t, 1, $unigramL) AS w FROM (
         |    SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS t
         |    FROM documents)
         |  WHERE t <> ''),
         |w AS MATERIALIZED (SELECT DISTINCT w FROM wd),
         |$unigramVitCtes,
         |dict AS (
         |  SELECT w, CASE length(w) $scoreCase END AS score_micro,
         |    $nPieces AS n_pieces
         |  FROM e$unigramL),
         |per AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |    CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
         |    CAST(sum(score_micro) AS BIGINT) AS score_micro
         |  FROM wd JOIN dict USING (w) GROUP BY 1)
         |SELECT d.doc_id, coalesce(n_words, 0) AS n_words,
         |  coalesce(n_pieces, 0) AS n_pieces,
         |  coalesce(score_micro, 0) AS score_micro,
         |  CASE WHEN coalesce(n_pieces, 0) > 0
         |    THEN round(CAST(score_micro AS DOUBLE)
         |      / CAST(n_pieces AS DOUBLE) / 1e6, 6) END AS avg_nats
         |FROM documents d LEFT JOIN per USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },

    // WordPiece training: the q223 space-padded-string replay with the
    // likelihood score — per round ONE pair collapse, ONE symbol
    // collapse, the pinned-float argmax, and the ##-stripping replace
    "q314_wordpiece_merges" -> {
      def rnd(r: Int): String =
        s"""sy$r AS (
           |  SELECT sym, sum(n) AS sc FROM (
           |    SELECT unnest(string_split(trim(s), '  ')) AS sym, n
           |    FROM v$r)
           |  GROUP BY 1),
           |pc$r AS (
           |  SELECT l[i] AS a, l[i+1] AS b, sum(n) AS cnt
           |  FROM (SELECT string_split(trim(s), '  ') AS l, n FROM v$r),
           |    UNNEST(generate_series(1, len(l) - 1)) t(i)
           |  GROUP BY 1, 2),
           |m$r AS (
           |  SELECT a, b, cnt FROM (
           |    SELECT p.a, p.b, p.cnt, CAST(p.cnt AS DOUBLE)
           |      / (CAST(sa.sc AS DOUBLE) * CAST(sb.sc AS DOUBLE)) AS score
           |    FROM pc$r p
           |    JOIN sy$r sa ON sa.sym = p.a
           |    JOIN sy$r sb ON sb.sym = p.b
           |    WHERE p.cnt >= 2)
           |  ORDER BY score DESC, a, b LIMIT 1),
           |v${r + 1} AS MATERIALIZED (
           |  SELECT replace(s, ' ' || a || '  ' || b || ' ',
           |    ' ' || a || CASE WHEN b LIKE '##%' THEN substr(b, 3)
           |      ELSE b END || ' ') AS s, n
           |  FROM v$r CROSS JOIN m$r)""".stripMargin
      """WITH toks AS (
        |  SELECT t AS w FROM (
        |    SELECT unnest(regexp_split_to_array(text, '\s+')) AS t
        |    FROM documents)
        |  WHERE t <> ''),
        |v1 AS MATERIALIZED (
        |  SELECT CASE WHEN length(w) = 1 THEN '  ' || w || '  '
        |    ELSE '  ' || substr(w, 1, 1) || '  ' || array_to_string(
        |      list_transform(regexp_split_to_array(substr(w, 2), ''),
        |        c -> '##' || c), '  ') || '  ' END AS s,
        |    count(*) AS n
        |  FROM toks GROUP BY 1),
        |""".stripMargin +
        (1 to 8).map(rnd).mkString(",\n") +
        "\nSELECT * FROM (\n" +
        (1 to 8).map(r =>
          s"""SELECT $r AS rank, a AS "left", b AS "right",
             |  CAST(cnt AS BIGINT) AS pair_count FROM m$r""".stripMargin)
          .mkString("\nUNION ALL ") +
        "\n) ORDER BY rank"
    },

    // WordPiece greedy encoding: per-(position, length) vocab membership
    // pivoted onto the word frame, the longest-match lengths packed into
    // one list, then the greedy cursor walk unrolled as chained CTEs —
    // identical substring/## arithmetic to the engine's named columns
    "q315_wordpiece_segment" -> wordpieceSegSql,

    // the sort-based selection the engine's histogram refinement
    // replaces: row_number over the cents column, rank = ceil(p·n) —
    // identical double arithmetic for the rank, exact integers after
    "q316_exact_quantiles" ->
      """WITH v AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |n AS (SELECT count(*) AS n FROM v),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
        |p(p) AS (VALUES (CAST(0.01 AS DOUBLE)), (CAST(0.25 AS DOUBLE)),
        |  (CAST(0.5 AS DOUBLE)), (CAST(0.75 AS DOUBLE)),
        |  (CAST(0.99 AS DOUBLE))),
        |k AS (
        |  SELECT p.p,
        |    GREATEST(CAST(1 AS BIGINT), CAST(ceil(p.p * n.n) AS BIGINT))
        |      AS rnk
        |  FROM p, n)
        |SELECT k.p, k.rnk, r.v AS value
        |FROM k JOIN r ON r.rn = k.rnk
        |ORDER BY p""".stripMargin,

    // brute-force ordered-pair containment (q262's oracle shape with
    // a <> b and the |A|-normalized ratio): prefix filtering is exact,
    // so the quadratic oracle and the engine must agree pair for pair
    "q317_containment_join" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, len(t) - 2),
        |    i -> array_to_string(list_slice(t, i, i + 3), ' '))) AS shingles
        |  FROM toks WHERE len(t) >= 4),
        |sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
        |p AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |inter AS (
        |  SELECT a.doc_id AS id_sub, b.doc_id AS id_sup, count(*) AS ni
        |  FROM p a JOIN p b ON a.s = b.s AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_sub, id_sup,
        |  round(CAST(ni AS DOUBLE) / CAST(sa.n_sh AS DOUBLE), 6)
        |    AS containment
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_sub
        |WHERE CAST(ni AS DOUBLE) / CAST(sa.n_sh AS DOUBLE) >= 0.4
        |ORDER BY id_sub, id_sup""".stripMargin,

    // three weighted q284 stump pipelines, bag b's weights from the
    // md5(rid#b) 60-bit draw against the exact Poisson(1) long ladder
    "q318_forest" -> forestOracleSql,

    // 2 unrolled PLSA EM rounds (the q304 unrolled-CTE discipline):
    // md5-mod-k doubled-share init, pinned posterior chain, per-cell
    // micro quantization, exact-ratio θ/φ with the 1-floor
    "q319_plsa_topics" -> (plsaOracleCtes +
      "\nSELECT * FROM (\n" +
      (0 until 4).map(z =>
        s"""SELECT $z AS topic, w AS word,
           |  CAST(c_$z AS BIGINT) AS weight_micro,
           |  round(CAST(c_$z AS DOUBLE) / CAST(s$z AS DOUBLE), 6) AS p
           |FROM phw2 CROSS JOIN pt2""".stripMargin)
        .mkString("\nUNION ALL\n") +
      "\n) ORDER BY topic, word"),

    "q320_plsa_docs" -> (plsaOracleCtes +
      "\nSELECT * FROM (\n" +
      (0 until 4).map(z =>
        s"""SELECT d AS doc_id, $z AS topic,
           |  CAST(t_$z AS BIGINT) AS weight_micro,
           |  round(CAST(t_$z AS DOUBLE)
           |    / (((CAST(t_0 AS DOUBLE) + CAST(t_1 AS DOUBLE))
           |      + CAST(t_2 AS DOUBLE)) + CAST(t_3 AS DOUBLE)), 6) AS p
           |FROM th2""".stripMargin)
        .mkString("\nUNION ALL\n") +
      "\n) ORDER BY doc_id, topic"),

    // 6 unrolled alternation rounds (closed saturated-cell η at the
    // round's k, then 2 quantized k Newton steps — the q282 shape);
    // identical f/fp association order and the round(greatest(...), 8)
    // grid; output = negated log cell rates over the final k
    "q321_aft_weibull" -> weibullOracleSql,

    // identical collapse + exact distinct count (nulls excluded by
    // COUNT(DISTINCT) semantics in both engines)
    "q322_l_diversity" ->
      """SELECT c_mktsegment, c_nationkey,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT c_acctbal) AS BIGINT) AS n_sensitive
        |FROM customer
        |GROUP BY 1, 2
        |HAVING count(DISTINCT c_acctbal) < 12
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    // 2 unrolled GMM EM rounds (md5-seeded means, global-moment
    // variances, micro-quantized responsibilities, exact-ratio updates
    // with the 1-floor) — the q319 CTE discipline over float inputs
    "q323_gmm_model" -> (gmmOracleCtes +
      "\nSELECT * FROM (\n" +
      (for (z <- 0 until 3; j <- 0 until 4) yield
        s"""SELECT $z AS cluster,
           |  CAST(greatest(sw_$z, 1) AS BIGINT) AS weight_micro,
           |  round(pi_$z, 6) AS pi, $j AS dim,
           |  round(mu_${z}_$j, 6) AS mean,
           |  round(v_${z}_$j, 6) AS variance
           |FROM p2 CROSS JOIN m2""".stripMargin)
        .mkString("\nUNION ALL\n") +
      "\n) ORDER BY cluster, dim"),

    // unrolled isolation-forest training (2 trees × 3 levels): per level
    // ONE per-node min/max aggregation pivoted to a one-row split state,
    // node reassignment as a CASE chain — the md5 feature/fraction draws
    // are data-independent, so they land as builder literals
    "q325_isoforest_model" -> (isoOracleCtes +
      "\nSELECT * FROM (\n" + isoNodeTableSql + "\n) ORDER BY tree, path"),

    // the scoring projection under the q325 forest: depth + c(leaf size)
    // per tree, averaged in tree order, 2^(−avg/c(n)); ordered by the
    // ROUNDED score so ulp-level ln/pow differences cannot reorder the
    // top-50 cut
    "q326_isoforest_scores" -> (isoOracleCtes + s"""
       |SELECT okey AS l_orderkey, line AS l_linenumber, score
       |FROM (
       |  SELECT okey, line, round(power(2.0, -((
       |      (length(nd_0) + $isoCSql0) + (length(nd_1) + $isoCSql1)
       |    ) / 2.0) / (SELECT $isoCSqlN FROM nn)), 6) AS score
       |  FROM r3
       |  JOIN lc0 ON lc0.node = r3.nd_0
       |  JOIN lc1 ON lc1.node = r3.nd_1)
       |ORDER BY score DESC, okey, line LIMIT 50""".stripMargin),

    // identical two cell collapses + the ψ expression + one mean; the
    // only float sum is Σψ, rounded at 4 (cents-scale values)
    "q327_aipw_ate" ->
      """WITH base AS (
        |  SELECT l_linestatus AS ps, l_partkey % 7 AS om,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS t,
        |    CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DOUBLE)
        |      AS y
        |  FROM lineitem),
        |pc AS (
        |  SELECT ps, CAST(sum(t) AS DOUBLE) / count(*) AS e
        |  FROM base GROUP BY 1),
        |oc AS (
        |  SELECT om,
        |    sum(CASE WHEN t = 1 THEN y END)
        |      / sum(CASE WHEN t = 1 THEN 1.0 END) AS m1,
        |    sum(CASE WHEN t = 0 THEN y END)
        |      / sum(CASE WHEN t = 0 THEN 1.0 END) AS m0
        |  FROM base GROUP BY 1),
        |j AS (
        |  SELECT t, y, e, m1, m0,
        |    (e > 0.0 AND e < 1.0 AND m1 IS NOT NULL AND m0 IS NOT NULL)
        |      AS ok
        |  FROM base JOIN pc USING (ps) JOIN oc USING (om))
        |SELECT
        |  CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_used,
        |  CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_excluded,
        |  round(sum(CASE WHEN ok THEN
        |      ((m1 - m0) + (CAST(t AS DOUBLE) * (y - m1) / e))
        |        - ((1.0 - CAST(t AS DOUBLE)) * (y - m0) / (1.0 - e))
        |    END) / sum(CASE WHEN ok THEN 1.0 END), 4) AS ate_aipw
        |FROM j""".stripMargin,

    // exact-quantile bounds by sort-based selection (the q316 oracle
    // shape) + the identical conditional/clamped aggregates
    "q328_trimmed_mean" ->
      """WITH v AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |n AS (SELECT count(*) AS n FROM v),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
        |k AS (
        |  SELECT
        |    (SELECT v FROM r, n WHERE rn = GREATEST(CAST(1 AS BIGINT),
        |      CAST(ceil(CAST(0.05 AS DOUBLE) * n.n) AS BIGINT))) AS qlo,
        |    (SELECT v FROM r, n WHERE rn = GREATEST(CAST(1 AS BIGINT),
        |      CAST(ceil(CAST(0.95 AS DOUBLE) * n.n) AS BIGINT))) AS qhi)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN v.v >= qlo AND v.v <= qhi THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept,
        |  CAST(qlo AS BIGINT) AS q_lo, CAST(qhi AS BIGINT) AS q_hi,
        |  round(CAST(sum(CASE WHEN v.v >= qlo AND v.v <= qhi THEN v.v END)
        |      AS DOUBLE)
        |    / CAST(sum(CASE WHEN v.v >= qlo AND v.v <= qhi THEN 1 ELSE 0
        |      END) AS DOUBLE), 6) AS trimmed_mean,
        |  round(CAST(sum(LEAST(GREATEST(v.v, qlo), qhi)) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS winsorized_mean
        |FROM v CROSS JOIN k
        |GROUP BY qlo, qhi""".stripMargin,

    // identical binning, dense class × value grid, exact integer
    // cumulative mass on denominator N·n_c, one division per class
    "q329_t_closeness" ->
      """WITH base AS (
        |  SELECT c_mktsegment, c_nationkey,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS v
        |  FROM customer WHERE c_acctbal IS NOT NULL),
        |vals AS (SELECT v, count(*) AS nv FROM base GROUP BY 1),
        |tot AS (SELECT sum(nv) AS nn FROM vals),
        |cls AS (SELECT c_mktsegment, c_nationkey, count(*) AS n
        |        FROM base GROUP BY 1, 2),
        |cells AS (SELECT c_mktsegment, c_nationkey, v, count(*) AS c
        |          FROM base GROUP BY 1, 2, 3),
        |grid AS (
        |  SELECT cls.c_mktsegment, cls.c_nationkey, cls.n, vals.v,
        |    vals.nv, tot.nn, coalesce(cells.c, 0) AS c
        |  FROM cls CROSS JOIN vals CROSS JOIN tot
        |  LEFT JOIN cells ON cells.c_mktsegment = cls.c_mktsegment
        |    AND cells.c_nationkey = cls.c_nationkey AND cells.v = vals.v),
        |cum AS (
        |  SELECT c_mktsegment, c_nationkey, n, nn,
        |    sum(nv * n - c * nn) OVER (
        |      PARTITION BY c_mktsegment, c_nationkey ORDER BY v) AS cum
        |  FROM grid)
        |SELECT c_mktsegment, c_nationkey, CAST(n AS BIGINT) AS n,
        |  round(CAST(sum(abs(cum)) AS DOUBLE) /
        |    (CAST(nn AS DOUBLE) * CAST(n AS DOUBLE) *
        |     CAST(count(*) - 1 AS DOUBLE)), 9) AS emd
        |FROM cum GROUP BY c_mktsegment, c_nationkey, n, nn
        |HAVING round(CAST(sum(abs(cum)) AS DOUBLE) /
        |    (CAST(nn AS DOUBLE) * CAST(n AS DOUBLE) *
        |     CAST(count(*) - 1 AS DOUBLE)), 9) > 0.15
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    // q73's shingle/pair/recursive-CC chain verbatim, then the Newman
    // contribution arithmetic over symmetrized stubs
    "q330_modularity" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, len(t) - 3), i -> array_to_string(list_slice(t, i, i + 4), ' '))) AS shingles
        |  FROM toks),
        |sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
        |prs AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |  FROM prs a JOIN prs b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |e0 AS (
        |  SELECT id_a, id_b FROM inter
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM e0
        |  UNION ALL SELECT id_b, id_a FROM e0),
        |cc(id, label) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, c.label FROM cc c JOIN edges e ON c.id = e.src),
        |lab AS (SELECT id, min(label) AS label FROM cc GROUP BY id),
        |m2 AS (SELECT count(*) AS m2 FROM edges),
        |stubs AS (
        |  SELECT lu.label AS lab_u, lv.label AS lab_v
        |  FROM edges e JOIN lab lu ON e.src = lu.id
        |  JOIN lab lv ON e.dst = lv.id),
        |perc AS (
        |  SELECT lab_u AS label,
        |    sum(CASE WHEN lab_u = lab_v THEN 1 ELSE 0 END) AS intra2,
        |    count(*) AS degree2
        |  FROM stubs GROUP BY 1),
        |nnodes AS (SELECT label, count(*) AS n_nodes FROM lab GROUP BY 1)
        |SELECT p.label AS label, CAST(n_nodes AS BIGINT) AS n_nodes,
        |  CAST(intra2 AS BIGINT) AS intra2,
        |  CAST(degree2 AS BIGINT) AS degree2,
        |  round((CAST(intra2 AS DOUBLE) - CAST(degree2 AS DOUBLE) * degree2 /
        |    CAST(m2.m2 AS DOUBLE)) / CAST(m2.m2 AS DOUBLE), 9) AS q_contrib
        |FROM perc p JOIN nnodes USING (label) CROSS JOIN m2
        |ORDER BY label""".stripMargin,

    // identical spectrum/next-count join; exact integers up to the one
    // r* division per spectrum row
    "q331_good_turing" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> x <> '')) AS w
        |  FROM documents),
        |counts AS (SELECT w, count(*) AS r FROM toks GROUP BY 1),
        |spec AS (SELECT r, count(*) AS n_r FROM counts GROUP BY 1),
        |tot AS (SELECT sum(r * n_r) AS n FROM spec),
        |nxt AS (SELECT r - 1 AS r, n_r AS n_next FROM spec)
        |SELECT s.r, CAST(s.n_r AS BIGINT) AS n_r,
        |  round(CAST(s.r + 1 AS DOUBLE) * n.n_next / CAST(s.n_r AS DOUBLE),
        |    6) AS r_star,
        |  round(CAST(s.r + 1 AS DOUBLE) * n.n_next /
        |    (CAST(s.n_r AS DOUBLE) * CAST(t.n AS DOUBLE)), 9) AS p_r
        |FROM spec s LEFT JOIN nxt n USING (r) CROSS JOIN tot t
        |ORDER BY s.r""".stripMargin,

    // identical melt/cell/marginal collapses; MI is the one float sum
    // (6-digit grid)
    "q332_mi_ranking" ->
      """WITH m AS (
        |  SELECT 'line_status' AS feature,
        |    coalesce(CAST(l_linestatus AS VARCHAR), ' null') AS v,
        |    CAST(l_returnflag AS VARCHAR) AS l FROM lineitem
        |  UNION ALL SELECT 'qty_bin',
        |    coalesce(CAST(CAST(floor(l_quantity / 10) AS BIGINT)
        |      AS VARCHAR), ' null'),
        |    CAST(l_returnflag AS VARCHAR) FROM lineitem
        |  UNION ALL SELECT 'tax_bin',
        |    coalesce(CAST(CAST(floor(l_tax * 100) AS BIGINT)
        |      AS VARCHAR), ' null'),
        |    CAST(l_returnflag AS VARCHAR) FROM lineitem
        |  UNION ALL SELECT 'disc_bin',
        |    coalesce(CAST(CAST(floor(l_discount * 100 / 2) AS BIGINT)
        |      AS VARCHAR), ' null'),
        |    CAST(l_returnflag AS VARCHAR) FROM lineitem),
        |mm AS (SELECT feature, v, l FROM m WHERE l IS NOT NULL),
        |cells AS (SELECT feature, v, l, count(*) AS c FROM mm GROUP BY 1, 2, 3),
        |fv AS (SELECT feature, v, sum(c) AS cfv FROM cells GROUP BY 1, 2),
        |fl AS (SELECT feature, l, sum(c) AS cfl FROM cells GROUP BY 1, 2),
        |f AS (SELECT feature, sum(c) AS n FROM cells GROUP BY 1)
        |SELECT cells.feature, CAST(any_value(n) AS BIGINT) AS n,
        |  CAST(count(DISTINCT cells.v) AS BIGINT) AS n_values,
        |  CAST(count(DISTINCT cells.l) AS BIGINT) AS n_labels,
        |  round(sum((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) * n /
        |    (CAST(cfv AS DOUBLE) * cfl))), 6) AS mi
        |FROM cells JOIN fv USING (feature, v) JOIN fl USING (feature, l)
        |JOIN f USING (feature)
        |GROUP BY cells.feature ORDER BY feature""".stripMargin,

    // identical 60-bit md5 hash, low-bit bucket, bin()-length rank
    "q333_hll_registers" ->
      """WITH h AS (
        |  SELECT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
        |    ::BIGINT AS h
        |  FROM lineitem WHERE l_orderkey IS NOT NULL)
        |SELECT h & 511 AS bucket,
        |  CAST(max(CASE WHEN (h >> 9) = 0 THEN 52
        |    ELSE 52 - length(bin(h >> 9)) END) AS INT) AS r
        |FROM h GROUP BY 1 ORDER BY bucket""".stripMargin,

    // identical registers for both sources + the exact-integer-scaled
    // harmonic sum; raw-vs-linear-counting branch on identical doubles
    "q334_hll_estimate" ->
      """WITH hb AS (
        |  SELECT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
        |    ::BIGINT AS h
        |  FROM lineitem WHERE l_orderkey IS NOT NULL),
        |rb AS (SELECT h & 511 AS bucket,
        |    max(CASE WHEN (h >> 9) = 0 THEN 52
        |      ELSE 52 - length(bin(h >> 9)) END) AS r
        |  FROM hb GROUP BY 1),
        |hs AS (
        |  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
        |    ::BIGINT AS h
        |  FROM events WHERE user_id IS NOT NULL),
        |rs AS (SELECT h & 511 AS bucket,
        |    max(CASE WHEN (h >> 9) = 0 THEN 52
        |      ELSE 52 - length(bin(h >> 9)) END) AS r
        |  FROM hs GROUP BY 1),
        |eb AS (SELECT 'orderkeys' AS key, count(*) AS n_occupied,
        |    sum(1::BIGINT << CAST(52 - r AS INT)) AS s_occ FROM rb),
        |es AS (SELECT 'users' AS key, count(*) AS n_occupied,
        |    sum(1::BIGINT << CAST(52 - r AS INT)) AS s_occ FROM rs),
        |u AS (SELECT * FROM eb UNION ALL SELECT * FROM es),
        |c AS (SELECT key, CAST(512 AS BIGINT) AS m,
        |    CAST(n_occupied AS BIGINT) AS n_occupied,
        |    CAST(512 - n_occupied AS BIGINT) AS v_zero,
        |    CAST(s_occ + (512 - n_occupied) * (1::BIGINT << 52) AS BIGINT)
        |      AS s_scaled
        |  FROM u)
        |SELECT key, m, n_occupied, v_zero, s_scaled,
        |  round(CASE WHEN 0.7213 / (1.0 + 1.079 / 512.0) * 512.0 * 512.0
        |      * 4503599627370496.0 / CAST(s_scaled AS DOUBLE)
        |        <= 2.5 * 512.0 AND v_zero > 0
        |    THEN 512.0 * ln(512.0 / CAST(v_zero AS DOUBLE))
        |    ELSE 0.7213 / (1.0 + 1.079 / 512.0) * 512.0 * 512.0
        |      * 4503599627370496.0 / CAST(s_scaled AS DOUBLE) END, 6)
        |    AS estimate
        |FROM c ORDER BY key""".stripMargin,

    // 3 unrolled frontier levels: identical row_number positions,
    // earliest-end min-aggs, and exact distinct-key supports
    "q335_prefixspan" ->
      """WITH ev0 AS (
        |  SELECT user_id AS k, event_type AS i,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS pos
        |  FROM events WHERE event_id % 13 = 0 AND event_type IS NOT NULL),
        |f1 AS (SELECT i, count(DISTINCT k) AS support FROM ev0 GROUP BY 1
        |       HAVING count(DISTINCT k) >= 25),
        |evf AS (SELECT ev0.k, ev0.i, ev0.pos FROM ev0
        |        JOIN f1 ON ev0.i = f1.i),
        |m1 AS (SELECT k, i AS p, min(pos) AS e FROM evf GROUP BY 1, 2),
        |x2 AS (SELECT m1.k, m1.p || '→' || evf.i AS p, min(evf.pos) AS e
        |       FROM m1 JOIN evf ON m1.k = evf.k AND evf.pos > m1.e
        |       GROUP BY 1, 2),
        |f2 AS (SELECT p, count(DISTINCT k) AS support FROM x2 GROUP BY 1
        |       HAVING count(DISTINCT k) >= 25),
        |m2 AS (SELECT x2.k, x2.p, x2.e FROM x2 JOIN f2 ON x2.p = f2.p),
        |x3 AS (SELECT m2.k, m2.p || '→' || evf.i AS p, min(evf.pos) AS e
        |       FROM m2 JOIN evf ON m2.k = evf.k AND evf.pos > m2.e
        |       GROUP BY 1, 2),
        |f3 AS (SELECT p, count(DISTINCT k) AS support FROM x3 GROUP BY 1
        |       HAVING count(DISTINCT k) >= 25)
        |SELECT i AS pattern, 1 AS len, support FROM f1
        |UNION ALL SELECT p, 2, support FROM f2
        |UNION ALL SELECT p, 3, support FROM f3
        |ORDER BY len, pattern""".stripMargin,

    // oracle = the BATCH register SQL over the same events keys — the
    // streaming/batch parity contract, verbatim q333 arithmetic
    "q336_hll_stream" ->
      """WITH h AS (
        |  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
        |    ::BIGINT AS h
        |  FROM events WHERE user_id IS NOT NULL)
        |SELECT h & 511 AS bucket,
        |  CAST(max(CASE WHEN (h >> 9) = 0 THEN 52
        |    ELSE 52 - length(bin(h >> 9)) END) AS INT) AS r
        |FROM h GROUP BY 1 ORDER BY bucket""".stripMargin,

    // 4 unrolled md5-draw walk steps over the id-ranked adjacency
    "q337_deepwalk_walks" -> (deepwalkOracleCtes + """
        |SELECT walk_id, step, node FROM allsteps
        |ORDER BY walk_id, step""".stripMargin),

    // identical walks + lead-window pairs both directions + one pinned
    // PMI expression; LIMIT under the (pmi desc, a, b) total order
    "q338_deepwalk_pmi" -> (deepwalkOracleCtes + """,
        |pr0 AS (
        |  SELECT node, lead(node) OVER (PARTITION BY walk_id
        |                                ORDER BY step) AS nxt
        |  FROM allsteps),
        |pr AS (SELECT node AS a, nxt AS b FROM pr0 WHERE nxt IS NOT NULL
        |  UNION ALL
        |  SELECT nxt AS a, node AS b FROM pr0 WHERE nxt IS NOT NULL),
        |nab AS (SELECT a, b, count(*) AS n_ab FROM pr GROUP BY 1, 2),
        |na AS (SELECT a, sum(n_ab) AS na FROM nab GROUP BY 1),
        |tot AS (SELECT sum(n_ab) AS n FROM nab)
        |SELECT nab.a, nab.b, CAST(n_ab AS BIGINT) AS n_ab,
        |  round(ln(CAST(n_ab AS DOUBLE) * n /
        |    (CAST(sa.na AS DOUBLE) * sb.na)), 6) AS pmi
        |FROM nab JOIN na sa ON nab.a = sa.a JOIN na sb ON nab.b = sb.a
        |CROSS JOIN tot
        |ORDER BY pmi DESC, nab.a, nab.b LIMIT 50""".stripMargin),

    // identical stratum 2x2 collapse + pinned E/V/odds sums over the
    // K-row frame (float sums over K strata -> 6-digit grid)
    "q339_cmh" ->
      """WITH base AS (
        |  SELECT o_orderpriority AS s, o_totalprice > 150000 AS ex,
        |    o_orderstatus = 'F' AS oc
        |  FROM orders
        |  WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL),
        |cells AS (
        |  SELECT s,
        |    sum(CASE WHEN ex AND oc THEN 1 ELSE 0 END) AS a,
        |    sum(CASE WHEN ex AND NOT oc THEN 1 ELSE 0 END) AS b,
        |    sum(CASE WHEN NOT ex AND oc THEN 1 ELSE 0 END) AS c,
        |    sum(CASE WHEN NOT ex AND NOT oc THEN 1 ELSE 0 END) AS d
        |  FROM base GROUP BY 1),
        |k AS (SELECT a, b, c, d, a + b + c + d AS n_k FROM cells
        |      WHERE a + b + c + d >= 2),
        |agg AS (
        |  SELECT count(*) AS k_strata, sum(n_k) AS n,
        |    sum(CAST(a AS DOUBLE)
        |      - CAST(a + b AS DOUBLE) * (a + c) / CAST(n_k AS DOUBLE))
        |      AS num,
        |    sum(CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d)
        |      / (CAST(n_k AS DOUBLE) * n_k * (n_k - 1.0))) AS var,
        |    sum(CAST(a AS DOUBLE) * d / CAST(n_k AS DOUBLE)) AS ad,
        |    sum(CAST(b AS DOUBLE) * c / CAST(n_k AS DOUBLE)) AS bc
        |  FROM k)
        |SELECT CAST(k_strata AS BIGINT) AS k_strata, CAST(n AS BIGINT) AS n,
        |  round(num * num / var, 6) AS chi2_cmh,
        |  round(CASE WHEN bc > 0.0 THEN ad / bc END, 6) AS or_mh
        |FROM agg""".stripMargin,

    // distributed relevance + candidate cut, 5 unrolled greedy rounds
    "q340_mmr_select" -> mmrOracle,

    // integer micro-nat Viterbi DP unrolled as pivoted CTE rounds,
    // generated from the same model maps as the query
    "q342_hmm_decode" -> hmmOracle,

    // identical grouped registers + per-group scaled harmonic readout
    "q343_hll_by_group" ->
      """WITH h AS (
        |  SELECT l_returnflag AS g,
        |    ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
        |      ::BIGINT AS h
        |  FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_returnflag IS NOT NULL),
        |r AS (SELECT g, h & 511 AS bucket,
        |    max(CASE WHEN (h >> 9) = 0 THEN 52
        |      ELSE 52 - length(bin(h >> 9)) END) AS r
        |  FROM h GROUP BY 1, 2),
        |a AS (SELECT g, count(*) AS n_occupied,
        |    sum(1::BIGINT << CAST(52 - r AS INT)) AS s_occ
        |  FROM r GROUP BY 1),
        |c AS (SELECT g, CAST(n_occupied AS BIGINT) AS n_occupied,
        |    CAST(512 - n_occupied AS BIGINT) AS v_zero,
        |    CAST(s_occ + (512 - n_occupied) * (1::BIGINT << 52) AS BIGINT)
        |      AS s_scaled
        |  FROM a)
        |SELECT g AS l_returnflag, n_occupied, v_zero, s_scaled,
        |  round(CASE WHEN 0.7213 / (1.0 + 1.079 / 512.0) * 512.0 * 512.0
        |      * 4503599627370496.0 / CAST(s_scaled AS DOUBLE)
        |        <= 2.5 * 512.0 AND v_zero > 0
        |    THEN 512.0 * ln(512.0 / CAST(v_zero AS DOUBLE))
        |    ELSE 0.7213 / (1.0 + 1.079 / 512.0) * 512.0 * 512.0
        |      * 4503599627370496.0 / CAST(s_scaled AS DOUBLE) END, 6)
        |    AS estimate
        |FROM c ORDER BY l_returnflag""".stripMargin,

    // 6 unrolled Mondrian median-split rounds, exact integer recursion
    "q345_mondrian" -> mondrianOracle,

    // per-candidate conditional moments + closed-form two-piece OLS +
    // the (sse, c) argmin — identical arithmetic order
    "q349_broken_stick" -> brokenStickOracle,

    // identical spectrum reduce + pinned Chao1/coverage expressions
    "q354_vocab_richness" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text),
        |    '\s+'), x -> x <> '')) AS w
        |  FROM documents),
        |c AS (SELECT w, count(*) AS r FROM toks GROUP BY 1),
        |a AS (SELECT count(*) AS s_obs, sum(r) AS n_tokens,
        |    sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS n2
        |  FROM c)
        |SELECT CAST(s_obs AS BIGINT) AS s_obs,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  round(CAST(s_obs AS DOUBLE) + CAST(n1 AS DOUBLE) * (n1 - 1)
        |    / (2.0 * (CAST(n2 AS DOUBLE) + 1.0)), 6) AS chao1,
        |  round(1.0 - CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
        |    AS coverage
        |FROM a""".stripMargin,

    // identical token/doc collapse + pinned df/cf ratio
    "q355_token_dispersion" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(
        |    lower(text), '\s+'), x -> x <> '')) AS token
        |  FROM documents)
        |SELECT token, CAST(count(*) AS BIGINT) AS cf,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
        |  round(CAST(count(DISTINCT doc_id) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS dispersion
        |FROM toks GROUP BY 1 HAVING count(*) >= 2
        |ORDER BY token""".stripMargin,

    // identical contingency collapse, margin entropies, pinned MI sum,
    // unrounded-ratio U with the zero-entropy guard
    "q353_theils_u" ->
      """WITH base AS (
        |  SELECT l_returnflag AS a,
        |    CAST(floor(l_quantity / 10) AS BIGINT) AS b
        |  FROM lineitem),
        |obs AS (SELECT a, b, count(*) AS o FROM base GROUP BY 1, 2),
        |ra AS (SELECT a, sum(o) AS ra FROM obs GROUP BY 1),
        |cb AS (SELECT b, sum(o) AS cb FROM obs GROUP BY 1),
        |tot AS (SELECT sum(o) AS n FROM obs),
        |ha AS (SELECT -coalesce(sum((CAST(ra AS DOUBLE) / n)
        |    * ln(CAST(ra AS DOUBLE) / n)), 0) AS h_a
        |  FROM ra CROSS JOIN tot),
        |hb AS (SELECT -coalesce(sum((CAST(cb AS DOUBLE) / n)
        |    * ln(CAST(cb AS DOUBLE) / n)), 0) AS h_b
        |  FROM cb CROSS JOIN tot),
        |mi AS (SELECT any_value(n) AS n,
        |    sum((CAST(o AS DOUBLE) / n) * ln(CAST(o AS DOUBLE) * n
        |      / (CAST(ra.ra AS DOUBLE) * cb.cb))) AS mi
        |  FROM obs JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot)
        |SELECT CAST(n AS BIGINT) AS n, round(h_a, 6) AS h_a,
        |  round(h_b, 6) AS h_b, round(mi, 6) AS mi,
        |  round(CASE WHEN h_a > 0 THEN mi / h_a END, 6) AS u_a_given_b,
        |  round(CASE WHEN h_b > 0 THEN mi / h_b END, 6) AS u_b_given_a
        |FROM mi CROSS JOIN ha CROSS JOIN hb""".stripMargin,

    // identical count collapse, exact squared-count HHI, top-K mass
    // under the (count desc, key) total order
    "q352_key_skew" ->
      """WITH c AS (
        |  SELECT l_orderkey, count(*) AS c FROM lineitem
        |  WHERE l_orderkey IS NOT NULL GROUP BY 1),
        |tot AS (SELECT count(*) AS n_keys, sum(c) AS n_rows,
        |  sum(c * c) AS c2 FROM c),
        |top AS (SELECT coalesce(max(c), 0) AS top1,
        |    coalesce(sum(c), 0) AS topk
        |  FROM (SELECT c FROM c ORDER BY c DESC, l_orderkey LIMIT 10))
        |SELECT CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_keys AS BIGINT) AS n_keys,
        |  round(CAST(c2 AS DOUBLE)
        |    / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)), 9) AS hhi,
        |  round(CAST(top1 AS DOUBLE) / CAST(n_rows AS DOUBLE), 9)
        |    AS top1_share,
        |  round(CAST(topk AS DOUBLE) / CAST(n_rows AS DOUBLE), 9)
        |    AS topk_share
        |FROM tot CROSS JOIN top""".stripMargin,

    // identical md5 rank + window count + round(n*frac) threshold
    "q350_exact_split" ->
      """WITH r AS (
        |  SELECT c_custkey, c_mktsegment,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rk,
        |    count(*) OVER (PARTITION BY c_mktsegment) AS n
        |  FROM customer)
        |SELECT c_custkey, c_mktsegment,
        |  CASE WHEN rk <= CAST(round(n * 0.2) AS BIGINT)
        |    THEN 'test' ELSE 'train' END AS split
        |FROM r ORDER BY c_custkey""".stripMargin,

    // identical per-user collapse, exact moments, |d| collapse +
    // cumulative doubled midranks, pinned t/z formulas
    "q351_paired_tests" ->
      """WITH base AS (
        |  SELECT user_id AS k,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        |      THEN 'pre' ELSE 'post' END AS g,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |p AS (SELECT k,
        |    sum(CASE WHEN g = 'pre' THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN g = 'pre' THEN v ELSE 0 END) AS sa,
        |    sum(CASE WHEN g = 'post' THEN 1 ELSE 0 END) AS nb,
        |    sum(CASE WHEN g = 'post' THEN v ELSE 0 END) AS sb
        |  FROM base GROUP BY 1),
        |d AS (SELECT k, sa - sb AS d FROM p WHERE na > 0 AND nb > 0),
        |mo AS (SELECT count(*) AS n,
        |    sum(CASE WHEN d <> 0 THEN 1 ELSE 0 END) AS m,
        |    sum(d) AS sd, sum(d * d) AS sdd FROM d),
        |ab AS (SELECT abs(d) AS av, count(*) AS cnt,
        |    sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS pos
        |  FROM d WHERE d <> 0 GROUP BY 1),
        |rk AS (SELECT av, cnt, pos,
        |    sum(cnt) OVER (ORDER BY av) - cnt AS below FROM ab),
        |w AS (SELECT coalesce(sum(pos * (2 * below + cnt + 1)), 0) AS w2,
        |    coalesce(sum(cnt * cnt * cnt - cnt), 0) AS tie3 FROM rk)
        |SELECT CAST(n AS BIGINT) AS n_pairs, CAST(m AS BIGINT) AS n_nonzero,
        |  round(CAST(sd AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_diff,
        |  round(CASE WHEN n >= 2 AND (CAST(sdd AS DOUBLE)
        |      - CAST(sd AS DOUBLE) * sd / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0) > 0
        |    THEN (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
        |      / sqrt(((CAST(sdd AS DOUBLE)
        |        - CAST(sd AS DOUBLE) * sd / CAST(n AS DOUBLE))
        |        / (CAST(n AS DOUBLE) - 1.0)) / CAST(n AS DOUBLE))
        |    END, 6) AS t_stat,
        |  CAST(w2 AS DOUBLE) / 2.0 AS w_plus,
        |  round(CASE WHEN m >= 2
        |    THEN (CAST(w2 AS DOUBLE) / 2.0
        |        - CAST(m AS DOUBLE) * (CAST(m AS DOUBLE) + 1.0) / 4.0)
        |      / sqrt(CAST(m AS DOUBLE) * (CAST(m AS DOUBLE) + 1.0)
        |        * (2.0 * CAST(m AS DOUBLE) + 1.0) / 24.0
        |        - CAST(tie3 AS DOUBLE) / 48.0)
        |    END, 6) AS z_wilcoxon
        |FROM mo CROSS JOIN w""".stripMargin,

    // identical distinct-value collapse, CDF numerators, lead gaps,
    // exact integer term sums, one pinned division
    "q346_wasserstein" ->
      """WITH base AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        |      THEN 1 ELSE 0 END AS is_ref
        |  FROM events WHERE value IS NOT NULL),
        |byv AS (SELECT v,
        |    sum(CASE WHEN is_ref = 1 THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN is_ref = 1 THEN 0 ELSE 1 END) AS cb
        |  FROM base GROUP BY 1),
        |tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM byv),
        |cum AS (SELECT v,
        |    sum(ca) OVER (ORDER BY v) AS ca_cum,
        |    sum(cb) OVER (ORDER BY v) AS cb_cum,
        |    lead(v) OVER (ORDER BY v) AS nv
        |  FROM byv),
        |s AS (SELECT sum(abs(ca_cum * nb - cb_cum * na) * (nv - v)) AS s
        |  FROM cum CROSS JOIN tot WHERE nv IS NOT NULL)
        |SELECT CAST(na AS BIGINT) AS n_ref, CAST(nb AS BIGINT) AS n_cur,
        |  round(CAST(coalesce(s, 0) AS DOUBLE)
        |    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS w1
        |FROM tot CROSS JOIN s""".stripMargin,

    // identical length/cf collapses, bounded docs × terms grid, pinned
    // Dirichlet ln terms, rounded-score LIMIT order
    "q347_query_likelihood" ->
      """WITH toks AS (
        |  SELECT doc_id AS id, unnest(list_filter(
        |    regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS w
        |  FROM documents),
        |dlen AS (SELECT id, count(*) AS len FROM toks GROUP BY 1),
        |cf AS (SELECT w, count(*) AS cf FROM toks GROUP BY 1),
        |ct AS (SELECT sum(cf) AS ct FROM cf),
        |q AS (SELECT unnest(['query', 'join', 'dup', 'vector']) AS w),
        |ts AS (SELECT q.w, coalesce(cf.cf, 0) AS cf
        |       FROM q LEFT JOIN cf ON q.w = cf.w),
        |tf AS (SELECT id, w, count(*) AS tf FROM toks JOIN q USING (w)
        |       GROUP BY 1, 2),
        |grid AS (
        |  SELECT dlen.id, dlen.len, ts.w, ts.cf, ct.ct,
        |    coalesce(tf.tf, 0) AS tf
        |  FROM dlen CROSS JOIN ts CROSS JOIN ct
        |  LEFT JOIN tf ON tf.id = dlen.id AND tf.w = ts.w)
        |SELECT id AS doc_id, CAST(any_value(len) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_matched,
        |  round(sum(ln((CAST(tf AS DOUBLE)
        |      + 2000.0 * CAST(cf AS DOUBLE) / CAST(ct AS DOUBLE))
        |    / (CAST(len AS DOUBLE) + 2000.0))), 6) AS score
        |FROM grid GROUP BY id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // identical level-pruned lattice: L1 → pair join → L2 → triple
    // join → L3, exact distinct-basket supports
    "q344_freq_itemsets" ->
      """WITH inc AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey % 50 AS i
        |  FROM lineitem),
        |keep AS (SELECT b FROM inc GROUP BY b HAVING count(*) <= 50),
        |p AS (SELECT inc.b, inc.i FROM inc JOIN keep USING (b)),
        |l1 AS (SELECT i, count(*) AS support FROM p GROUP BY 1
        |       HAVING count(*) >= 40),
        |pf AS (SELECT p.b, p.i FROM p JOIN l1 ON p.i = l1.i),
        |p2 AS (SELECT a.b, a.i AS i1, c.i AS i2
        |       FROM pf a JOIN pf c ON a.b = c.b AND a.i < c.i),
        |l2 AS (SELECT i1, i2, count(*) AS support FROM p2 GROUP BY 1, 2
        |       HAVING count(*) >= 40),
        |p2f AS (SELECT p2.b, p2.i1, p2.i2 FROM p2 JOIN l2 USING (i1, i2)),
        |p3 AS (SELECT a.b, a.i1, a.i2, c.i AS i3
        |       FROM p2f a JOIN pf c ON a.b = c.b AND c.i > a.i2),
        |l3 AS (SELECT i1, i2, i3, count(*) AS support FROM p3
        |       GROUP BY 1, 2, 3 HAVING count(*) >= 40)
        |SELECT CAST(i AS VARCHAR) AS itemset, 1 AS size,
        |  CAST(support AS BIGINT) AS support FROM l1
        |UNION ALL SELECT CAST(i1 AS VARCHAR) || ',' || CAST(i2 AS VARCHAR),
        |  2, CAST(support AS BIGINT) FROM l2
        |UNION ALL SELECT CAST(i1 AS VARCHAR) || ',' || CAST(i2 AS VARCHAR)
        |  || ',' || CAST(i3 AS VARCHAR), 3, CAST(support AS BIGINT) FROM l3
        |ORDER BY size, itemset""".stripMargin,

    // identical propensity/target projections + micro/milli-quantized
    // Horvitz–Thompson sums; pinned final divisions
    "q341_policy_value" ->
      """WITH base AS (
        |  SELECT event_type,
        |    CASE WHEN event_type = 'click' THEN 0.4
        |         WHEN event_type = 'view' THEN 0.3 ELSE 0.1 END AS p,
        |    value,
        |    CASE WHEN value > 10 THEN 'click' ELSE 'view' END AS target
        |  FROM events),
        |q AS (
        |  SELECT count(*) AS n,
        |    sum(CASE WHEN event_type = target THEN 1 ELSE 0 END)
        |      AS n_matched,
        |    sum(CASE WHEN event_type = target
        |      THEN CAST(round(value / p * 1e6) AS BIGINT) ELSE 0 END)
        |      AS srw,
        |    sum(CASE WHEN event_type = target
        |      THEN CAST(round(1.0 / p * 1e6) AS BIGINT) ELSE 0 END)
        |      AS siw,
        |    sum(CASE WHEN event_type = target
        |      THEN CAST(round(1.0 / p * 1e3) AS BIGINT) ELSE 0 END)
        |      AS swm,
        |    sum(CASE WHEN event_type = target
        |      THEN CAST(round(1.0 / p * 1e3) AS BIGINT)
        |         * CAST(round(1.0 / p * 1e3) AS BIGINT) ELSE 0 END)
        |      AS swm2
        |  FROM base)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST(n_matched AS BIGINT) AS n_matched,
        |  round(CAST(srw AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE), 6)
        |    AS ips,
        |  round(CASE WHEN siw > 0
        |    THEN CAST(srw AS DOUBLE) / CAST(siw AS DOUBLE) END, 6)
        |    AS snips,
        |  round(CASE WHEN swm2 > 0
        |    THEN CAST(swm AS DOUBLE) * swm / CAST(swm2 AS DOUBLE) END, 6)
        |    AS ess
        |FROM q""".stripMargin,

    // hard assignment under the q323 model: per-row log-density chain,
    // first-max-wins over z ascending (>= comparisons)
    "q324_gmm_assign" -> (gmmOracleCtes +
      s"""
         |SELECT vec_id,
         |  CASE WHEN ${gmmLl(0)} >= ${gmmLl(1)}
         |         AND ${gmmLl(0)} >= ${gmmLl(2)} THEN 0
         |       WHEN ${gmmLl(1)} >= ${gmmLl(2)} THEN 1
         |       ELSE 2 END AS cluster
         |FROM base CROSS JOIN p2
         |ORDER BY vec_id""".stripMargin),

    // the same synthetic hex layout re-parsed with substr/endian folds:
    // PNG width/height = BE32 at bytes 16/20 (hex chars 33/41), GIF =
    // LE16 at bytes 6/8, WAV sample rate = LE32 at byte 24 — an
    // independent SQL parse of the identical byte stream
    "q356_header_decode" ->
      """WITH d AS (SELECT doc_id FROM documents
        |  WHERE doc_id IS NOT NULL),
        |hx AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN
        |      '89504E470D0A1A0A0000000D49484452'
        |        || lpad(to_hex(100 + doc_id % 900), 8, '0')
        |        || lpad(to_hex(50 + doc_id % 500), 8, '0')
        |        || '0802000000'
        |    WHEN doc_id % 3 = 1 THEN
        |      '474946383761'
        |        || lpad(to_hex((100 + doc_id % 900) % 256), 2, '0')
        |        || lpad(to_hex((100 + doc_id % 900) // 256), 2, '0')
        |        || lpad(to_hex((50 + doc_id % 500) % 256), 2, '0')
        |        || lpad(to_hex((50 + doc_id % 500) // 256), 2, '0')
        |    ELSE
        |      '524946462400000057415645666D7420100000000100'
        |        || lpad(to_hex((1 + doc_id % 2) % 256), 2, '0') || '00'
        |        || lpad(to_hex((8000 + 1000 * (doc_id % 5)) % 256), 2, '0')
        |        || lpad(to_hex((8000 + 1000 * (doc_id % 5)) // 256 % 256),
        |             2, '0')
        |        || lpad(to_hex((8000 + 1000 * (doc_id % 5)) // 65536), 2,
        |             '0') || '00'
        |        || lpad(to_hex((16000 + 2000 * (doc_id % 5)) % 256), 2, '0')
        |        || lpad(to_hex((16000 + 2000 * (doc_id % 5)) // 256 % 256),
        |             2, '0')
        |        || lpad(to_hex((16000 + 2000 * (doc_id % 5)) // 65536), 2,
        |             '0') || '00'
        |        || '02001000'
        |    END AS h,
        |    CASE WHEN doc_id % 3 = 0 THEN 'png'
        |         WHEN doc_id % 3 = 1 THEN 'gif' ELSE 'wav' END AS fmt
        |  FROM d)
        |SELECT doc_id AS media_id, CAST(length(h) // 2 AS BIGINT) AS n_bytes,
        |  fmt AS format_detected,
        |  CAST(CASE WHEN fmt = 'png' THEN ('0x' || substr(h, 33, 8))::BIGINT
        |    WHEN fmt = 'gif'
        |      THEN ('0x' || substr(h, 15, 2) || substr(h, 13, 2))::BIGINT
        |    ELSE -1 END AS INT) AS width,
        |  CAST(CASE WHEN fmt = 'png' THEN ('0x' || substr(h, 41, 8))::BIGINT
        |    WHEN fmt = 'gif'
        |      THEN ('0x' || substr(h, 19, 2) || substr(h, 17, 2))::BIGINT
        |    ELSE -1 END AS INT) AS height,
        |  CAST(CASE WHEN fmt = 'wav'
        |    THEN ('0x' || substr(h, 55, 2) || substr(h, 53, 2)
        |      || substr(h, 51, 2) || substr(h, 49, 2))::BIGINT
        |    ELSE -1 END AS INT) AS sample_rate
        |FROM hx ORDER BY media_id""".stripMargin,

    // identical cell collapse, strict x1 < x2 pair join, marginal tie
    // terms; hugeint sums are exact so the one double division matches
    "q357_kendall_tau" ->
      """WITH cells AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(floor(l_discount * 100) AS BIGINT) AS y, count(*) AS c
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
        |  GROUP BY 1, 2),
        |p AS (SELECT
        |    coalesce(sum(CASE WHEN a.y < b.y THEN a.c * b.c ELSE 0 END), 0)
        |      AS nc,
        |    coalesce(sum(CASE WHEN a.y > b.y THEN a.c * b.c ELSE 0 END), 0)
        |      AS nd
        |  FROM cells a JOIN cells b ON a.x < b.x),
        |tx AS (SELECT sum(t * (t - 1) // 2) AS n1 FROM
        |  (SELECT sum(c) AS t FROM cells GROUP BY x)),
        |ty AS (SELECT sum(t * (t - 1) // 2) AS n2 FROM
        |  (SELECT sum(c) AS t FROM cells GROUP BY y)),
        |tot AS (SELECT sum(c) AS n, sum(c) * (sum(c) - 1) // 2 AS n0,
        |    count(*) AS n_cells
        |  FROM cells)
        |SELECT CAST(n AS BIGINT) AS n, CAST(n_cells AS BIGINT) AS n_cells,
        |  round(CASE WHEN CAST(n0 - n1 AS DOUBLE)
        |        * CAST(n0 - n2 AS DOUBLE) > 0
        |    THEN CAST(nc - nd AS DOUBLE) / sqrt(CAST(n0 - n1 AS DOUBLE)
        |      * CAST(n0 - n2 AS DOUBLE)) END, 6) AS tau_b
        |FROM tot CROSS JOIN p CROSS JOIN tx CROSS JOIN ty""".stripMargin,

    // identical five global sums; z and chi2 replay the exact
    // X * (Y / Z) double-op ordering of the query
    "q358_trend_test" ->
      """WITH base AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS s,
        |    (l_returnflag = 'R') AS y
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL),
        |a AS (SELECT count(*) AS n,
        |    sum(CASE WHEN y THEN 1 ELSE 0 END) AS r,
        |    sum(CASE WHEN y THEN s ELSE 0 END) AS sa,
        |    sum(s) AS sb, sum(s * s) AS sc,
        |    count(DISTINCT s) AS k FROM base)
        |SELECT CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS n_success,
        |  CAST(k AS BIGINT) AS k_scores,
        |  round(CASE WHEN CAST(r * (n - r) AS DOUBLE)
        |      * (CAST(n * sc - sb * sb AS DOUBLE) / CAST(n AS DOUBLE)) > 0
        |    THEN CAST(n * sa - r * sb AS DOUBLE)
        |      / sqrt(CAST(r * (n - r) AS DOUBLE)
        |        * (CAST(n * sc - sb * sb AS DOUBLE) / CAST(n AS DOUBLE)))
        |    END, 6) AS z_trend,
        |  round(CASE WHEN CAST(r * (n - r) AS DOUBLE)
        |      * (CAST(n * sc - sb * sb AS DOUBLE) / CAST(n AS DOUBLE)) > 0
        |    THEN CAST(n * sa - r * sb AS DOUBLE)
        |      * CAST(n * sa - r * sb AS DOUBLE)
        |      / (CAST(r * (n - r) AS DOUBLE)
        |        * (CAST(n * sc - sb * sb AS DOUBLE) / CAST(n AS DOUBLE)))
        |    END, 6) AS chi2_trend
        |FROM a""".stripMargin,

    // identical filtered-ordinality positions + 3 forward leads, both
    // orientations as a 6-way UNION ALL
    "q359_skipgram_pairs" ->
      """WITH tk0 AS (
        |  SELECT doc_id, unnest(l) AS t0,
        |    unnest(generate_series(1, len(l))) AS ord
        |  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS l
        |        FROM documents WHERE doc_id % 10 = 0 AND text IS NOT NULL)),
        |tk AS (SELECT doc_id AS doc,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS pos,
        |    t0 AS tok
        |  FROM tk0 WHERE t0 <> ''),
        |ld AS (SELECT doc, pos, tok,
        |    lead(tok, 1) OVER (PARTITION BY doc ORDER BY pos) AS l1,
        |    lead(tok, 2) OVER (PARTITION BY doc ORDER BY pos) AS l2,
        |    lead(tok, 3) OVER (PARTITION BY doc ORDER BY pos) AS l3
        |  FROM tk),
        |o AS (
        |  SELECT doc, pos, tok AS center, l1 AS context, 1 AS dist FROM ld
        |  UNION ALL SELECT doc, pos + 1, l1, tok, 1 FROM ld
        |  UNION ALL SELECT doc, pos, tok, l2, 2 FROM ld
        |  UNION ALL SELECT doc, pos + 2, l2, tok, 2 FROM ld
        |  UNION ALL SELECT doc, pos, tok, l3, 3 FROM ld
        |  UNION ALL SELECT doc, pos + 3, l3, tok, 3 FROM ld)
        |SELECT doc, CAST(pos AS INT) AS pos, center, context,
        |  CAST(dist AS INT) AS dist
        |FROM o WHERE center IS NOT NULL AND context IS NOT NULL
        |ORDER BY doc, pos, dist, center, context""".stripMargin,

    // identical pairs (window 2) + 1e3-quantized sqrt-composed x^0.75
    // weights + token-ascending CDF + integer-ceil cell tiling +
    // content-keyed md5 cell draws
    "q360_negative_audit" ->
      """WITH tk0 AS (
        |  SELECT doc_id, unnest(l) AS t0,
        |    unnest(generate_series(1, len(l))) AS ord
        |  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS l
        |        FROM documents WHERE doc_id % 10 = 0 AND text IS NOT NULL)),
        |tk AS (SELECT doc_id AS doc,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS pos,
        |    t0 AS tok
        |  FROM tk0 WHERE t0 <> ''),
        |ld AS (SELECT doc, pos, tok,
        |    lead(tok, 1) OVER (PARTITION BY doc ORDER BY pos) AS l1,
        |    lead(tok, 2) OVER (PARTITION BY doc ORDER BY pos) AS l2
        |  FROM tk),
        |o AS (
        |  SELECT doc, pos, tok AS center, l1 AS context FROM ld
        |  UNION ALL SELECT doc, pos + 1, l1, tok FROM ld
        |  UNION ALL SELECT doc, pos, tok, l2 FROM ld
        |  UNION ALL SELECT doc, pos + 2, l2, tok FROM ld),
        |p AS (SELECT doc, pos, center, context FROM o
        |  WHERE center IS NOT NULL AND context IS NOT NULL),
        |v AS (SELECT tok, count(*) AS c FROM tk GROUP BY 1),
        |w AS (SELECT tok, CAST(round(sqrt(CAST(c AS DOUBLE))
        |    * sqrt(sqrt(CAST(c AS DOUBLE))) * 1000) AS BIGINT) AS w
        |  FROM v),
        |cum AS (SELECT tok, w,
        |    sum(w) OVER (ORDER BY tok ROWS UNBOUNDED PRECEDING) AS hi
        |  FROM w),
        |cum2 AS (SELECT tok, CAST(hi - w AS BIGINT) AS lo,
        |    CAST(hi AS BIGINT) AS hi FROM cum),
        |wt AS (SELECT CAST(max(hi) AS BIGINT) AS wtot FROM cum2),
        |cells AS (
        |  SELECT tok, unnest(generate_series(
        |      (lo * 4096 + wtot - 1) // wtot,
        |      (hi * 4096 + wtot - 1) // wtot - 1)) AS cell
        |  FROM cum2, wt
        |  WHERE (hi * 4096 + wtot - 1) // wtot
        |      > (lo * 4096 + wtot - 1) // wtot),
        |d2 AS (SELECT p.*, ks.k FROM p
        |  CROSS JOIN (VALUES (1), (2)) AS ks(k)),
        |dr AS (SELECT
        |    ('0x' || substr(md5(doc || '#' || pos || '#' || center
        |      || '#' || context || '#' || k), 1, 15))::BIGINT % 4096 AS cell
        |  FROM d2)
        |SELECT tok AS negative, count(*) AS n_draws
        |FROM dr JOIN cells USING (cell)
        |GROUP BY 1 ORDER BY n_draws DESC, negative LIMIT 100""".stripMargin,

    // identical per-(ranker, nation) row_number ranks + exact integer
    // 10^12 // (60 + rank) fusion + per-nation top-5 total order
    "q361_rrf_fusion" ->
      """WITH a AS (SELECT 'bal' AS ranker, s_nationkey AS nation,
        |    s_suppkey AS id, CAST(s_acctbal AS DOUBLE) AS score
        |  FROM supplier),
        |b AS (SELECT 'vol' AS ranker, s_nationkey AS nation,
        |    l_suppkey AS id, CAST(count(*) AS DOUBLE) AS score
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY s_nationkey, l_suppkey),
        |u AS (SELECT * FROM a UNION ALL SELECT * FROM b),
        |r AS (SELECT nation, id,
        |    row_number() OVER (PARTITION BY ranker, nation
        |      ORDER BY score DESC, id) AS rnk
        |  FROM u WHERE score IS NOT NULL AND id IS NOT NULL),
        |f AS (SELECT nation, id, count(*) AS n_rankers,
        |    sum(1000000000000 // (60 + rnk)) AS rrf
        |  FROM r GROUP BY 1, 2),
        |t2 AS (SELECT nation, id, n_rankers, rrf,
        |    row_number() OVER (PARTITION BY nation
        |      ORDER BY rrf DESC, id) AS rank
        |  FROM f)
        |SELECT nation, CAST(rank AS INT) AS rank, id,
        |  CAST(n_rankers AS BIGINT) AS n_rankers,
        |  round(CAST(rrf AS DOUBLE) / 1e12, 9) AS rrf_score
        |FROM t2 WHERE rank <= 5 ORDER BY nation, rank""".stripMargin,

    // identical micro-quantization, integer bin, pinned per-bin gaps
    "q362_ece" ->
      """WITH q AS (
        |  SELECT CAST(round(CAST(l_quantity AS DOUBLE) / 50.0 * 1e6)
        |      AS BIGINT) AS sm,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem),
        |b AS (SELECT least(sm * 10 // 1000000, 9) AS bin, count(*) AS n,
        |    sum(sm) AS smt, sum(y) AS pos
        |  FROM q GROUP BY 1),
        |t2 AS (SELECT sum(n) AS nn, count(*) AS nb FROM b),
        |g AS (SELECT n, abs(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
        |    - CAST(smt AS DOUBLE) / CAST(n AS DOUBLE) / 1e6) AS gap
        |  FROM b)
        |SELECT CAST(nn AS BIGINT) AS n, CAST(nb AS BIGINT) AS n_bins_used,
        |  round(sum(gap * CAST(n AS DOUBLE)) / CAST(nn AS DOUBLE), 6)
        |    AS ece,
        |  round(max(gap), 6) AS mce
        |FROM g CROSS JOIN t2 GROUP BY nn, nb""".stripMargin,

    // identical key collapse, micro-quantized rate moments, pinned MoM
    // alpha/beta and posterior arithmetic
    "q363_eb_shrinkage" ->
      """WITH bk AS (
        |  SELECT o_custkey, count(*) AS n,
        |    sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS x
        |  FROM orders
        |  WHERE o_custkey IS NOT NULL AND o_orderstatus IS NOT NULL
        |  GROUP BY 1),
        |bk2 AS (SELECT o_custkey, n, x, (x * 1000000) // n AS r FROM bk),
        |m AS (SELECT count(*) AS k, sum(r) AS sr, sum(r * r) AS sr2
        |  FROM bk2),
        |p AS (SELECT k,
        |    CAST(sr AS DOUBLE) / CAST(k AS DOUBLE) / 1e6 AS mu,
        |    (CAST(sr2 AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)
        |      / CAST(k AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0) / 1e12 AS v
        |  FROM m),
        |pp AS (SELECT k, mu, v, mu * (1.0 - mu) / v - 1.0 AS mm FROM p),
        |ab AS (SELECT
        |    CASE WHEN k >= 2 AND v > 0 AND mm > 0 THEN mu * mm END
        |      AS alpha,
        |    CASE WHEN k >= 2 AND v > 0 AND mm > 0 THEN (1.0 - mu) * mm END
        |      AS beta
        |  FROM pp)
        |SELECT o_custkey, CAST(n AS BIGINT) AS n, CAST(x AS BIGINT) AS x,
        |  round(CAST(r AS DOUBLE) / 1e6, 6) AS rate,
        |  round(alpha, 6) AS alpha, round(beta, 6) AS beta,
        |  round((CAST(x AS DOUBLE) + alpha)
        |    / (CAST(n AS DOUBLE) + alpha + beta), 6) AS shrunk_rate
        |FROM bk2 CROSS JOIN ab ORDER BY o_custkey""".stripMargin,

    // the q163 Lloyd replay + per-point distances to the FINAL
    // centroids, (d, c) rank for a/b, micro-quantized per-cluster mean
    "q364_silhouette" ->
      (kmeansOracleCtes + s""",
        |n2f AS (SELECT c, sum(w * w) AS n2 FROM ct$kmeansRounds
        |  GROUP BY 1),
        |xxf AS (SELECT id, sum(v * v) AS xx FROM e GROUP BY 1),
        |distf AS (
        |  SELECT e.id, ct.c,
        |    sqrt(greatest(any_value(xxf.xx) + (-2.0 * sum(e.v * ct.w))
        |      + any_value(n2f.n2), 0)) AS d
        |  FROM e JOIN ct$kmeansRounds ct ON e.p = ct.p
        |  JOIN n2f ON ct.c = n2f.c JOIN xxf ON xxf.id = e.id
        |  GROUP BY e.id, ct.c),
        |rkf AS (SELECT id, c, d,
        |    row_number() OVER (PARTITION BY id ORDER BY d, c) AS rk
        |  FROM distf),
        |abf AS (SELECT r1.id, r1.c AS cluster, r1.d AS a, r2.d AS b
        |  FROM rkf r1 JOIN rkf r2 ON r1.id = r2.id AND r2.rk = 2
        |  WHERE r1.rk = 1),
        |smf AS (SELECT cluster,
        |    CAST(round(CASE WHEN greatest(a, b) > 0
        |      THEN (b - a) / greatest(a, b) ELSE 0.0 END * 1e6) AS BIGINT)
        |      AS sm
        |  FROM abf)
        |SELECT CAST(cluster AS INT) AS cluster,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(sm) / CAST(count(*) AS DOUBLE) / 1e6, 4) AS silhouette
        |FROM smf GROUP BY 1 ORDER BY 1""".stripMargin),

    // identical length-minus-stripped counts over RE2's Unicode script
    // classes, pinned fraction divisions, first-max-wins dominance
    "q365_script_profile" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CASE WHEN text IS NULL THEN 0 ELSE length(text) END AS n,
        |    CASE WHEN text IS NULL THEN 0 ELSE length(text) -
        |      length(regexp_replace(text, '[\p{Latin}]', '', 'g')) END
        |      AS c_latin,
        |    CASE WHEN text IS NULL THEN 0 ELSE length(text) -
        |      length(regexp_replace(text, '[\p{Cyrillic}]', '', 'g')) END
        |      AS c_cyrillic,
        |    CASE WHEN text IS NULL THEN 0 ELSE length(text) -
        |      length(regexp_replace(text, '[\p{Han}]', '', 'g')) END
        |      AS c_han,
        |    CASE WHEN text IS NULL THEN 0 ELSE length(text) -
        |      length(regexp_replace(text, '[\p{Arabic}]', '', 'g')) END
        |      AS c_arabic,
        |    CASE WHEN text IS NULL THEN 0 ELSE length(text) -
        |      length(regexp_replace(text, '[0-9]', '', 'g')) END
        |      AS c_digit,
        |    CASE WHEN text IS NULL THEN 0 ELSE length(text) -
        |      length(regexp_replace(text, '[\s]', '', 'g')) END
        |      AS c_space
        |  FROM documents)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
        |  round(CASE WHEN n > 0
        |    THEN CAST(c_latin AS DOUBLE) / CAST(n AS DOUBLE) END, 6)
        |    AS latin_frac,
        |  round(CASE WHEN n > 0
        |    THEN CAST(c_cyrillic AS DOUBLE) / CAST(n AS DOUBLE) END, 6)
        |    AS cyrillic_frac,
        |  round(CASE WHEN n > 0
        |    THEN CAST(c_han AS DOUBLE) / CAST(n AS DOUBLE) END, 6)
        |    AS han_frac,
        |  round(CASE WHEN n > 0
        |    THEN CAST(c_arabic AS DOUBLE) / CAST(n AS DOUBLE) END, 6)
        |    AS arabic_frac,
        |  round(CASE WHEN n > 0
        |    THEN CAST(c_digit AS DOUBLE) / CAST(n AS DOUBLE) END, 6)
        |    AS digit_frac,
        |  round(CASE WHEN n > 0
        |    THEN CAST(c_space AS DOUBLE) / CAST(n AS DOUBLE) END, 6)
        |    AS space_frac,
        |  CASE WHEN n = 0
        |      OR greatest(c_latin, c_cyrillic, c_han, c_arabic) = 0
        |    THEN 'none'
        |    WHEN c_latin >= greatest(c_latin, c_cyrillic, c_han, c_arabic)
        |    THEN 'latin'
        |    WHEN c_cyrillic >= greatest(c_latin, c_cyrillic, c_han,
        |      c_arabic) THEN 'cyrillic'
        |    WHEN c_han >= greatest(c_latin, c_cyrillic, c_han, c_arabic)
        |    THEN 'han'
        |    ELSE 'arabic' END AS dominant_script
        |FROM c ORDER BY doc_id""".stripMargin,

    // identical contingency collapse, exact hugeint C(x,2) sums, pinned
    // ARI arithmetic; entropy/MI replay q353's float class
    "q366_cluster_agreement" ->
      """WITH obs AS (
        |  SELECT l_returnflag AS a, l_linestatus AS b, count(*) AS o
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
        |  GROUP BY 1, 2),
        |ra AS (SELECT a, sum(o) AS ra FROM obs GROUP BY 1),
        |cb AS (SELECT b, sum(o) AS cb FROM obs GROUP BY 1),
        |tot AS (SELECT sum(o) AS n FROM obs),
        |idx AS (SELECT count(*) AS n_cells, sum(o) AS n,
        |    sum(o * (o - 1) // 2) AS sidx FROM obs),
        |sab AS (SELECT
        |    (SELECT sum(ra * (ra - 1) // 2) FROM ra) AS sa,
        |    (SELECT sum(cb * (cb - 1) // 2) FROM cb) AS sb),
        |ha AS (SELECT -coalesce(sum((CAST(ra AS DOUBLE) / n)
        |    * ln(CAST(ra AS DOUBLE) / n)), 0) AS h_a
        |  FROM ra CROSS JOIN tot),
        |hb AS (SELECT -coalesce(sum((CAST(cb AS DOUBLE) / n)
        |    * ln(CAST(cb AS DOUBLE) / n)), 0) AS h_b
        |  FROM cb CROSS JOIN tot),
        |mi AS (SELECT sum((CAST(o AS DOUBLE) / n) * ln(CAST(o AS DOUBLE)
        |      * n / (CAST(ra.ra AS DOUBLE) * cb.cb))) AS mi
        |  FROM obs JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot),
        |fin AS (SELECT n, n_cells, sidx, sa, sb,
        |    n * (n - 1) // 2 AS cn2 FROM idx CROSS JOIN sab)
        |SELECT CAST(n AS BIGINT) AS n, CAST(n_cells AS BIGINT) AS n_cells,
        |  round(CASE WHEN cn2 > 0 AND (CAST(sa AS DOUBLE)
        |        + CAST(sb AS DOUBLE)) / 2.0
        |        - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)
        |          / CAST(cn2 AS DOUBLE) <> 0
        |    THEN (CAST(sidx AS DOUBLE) - CAST(sa AS DOUBLE)
        |        * CAST(sb AS DOUBLE) / CAST(cn2 AS DOUBLE))
        |      / ((CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE)) / 2.0
        |        - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)
        |          / CAST(cn2 AS DOUBLE)) END, 6) AS ari,
        |  round(CASE WHEN h_a > 0 AND h_b > 0
        |    THEN mi / sqrt(h_a * h_b) END, 6) AS nmi
        |FROM fin CROSS JOIN mi CROSS JOIN ha CROSS JOIN hb""".stripMargin,

    // identical top-(k+1) value cut (ties at the boundary are
    // value-equal, so the value multiset is order-free), micro-quantized
    // log excesses, pinned division
    "q367_hill_tail" ->
      """WITH tk AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> len(x) > 0)) AS tok
        |  FROM documents),
        |cnt AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM tk GROUP BY tok),
        |top AS (SELECT c AS v FROM cnt WHERE c > 0
        |  ORDER BY c DESC LIMIT 101),
        |thr AS (SELECT min(v) AS t, count(*) AS m FROM top),
        |lx AS (SELECT CASE WHEN v > t
        |    THEN CAST(round(ln(v / t) * 1e6) AS BIGINT) ELSE 0 END AS lx,
        |    t, m
        |  FROM top CROSS JOIN thr)
        |SELECT CAST(100 AS INT) AS k, CAST(m - 1 AS BIGINT) AS n_tail,
        |  any_value(t) AS threshold,
        |  round(CASE WHEN m - 1 >= 2 AND sum(lx) > 0
        |    THEN CAST(m - 1 AS DOUBLE) / (CAST(sum(lx) AS DOUBLE) / 1e6)
        |    END, 6) AS alpha
        |FROM lx GROUP BY m""".stripMargin,

    // identical value collapse + inclusive cumulatives + floor-divided
    // micro gaps + the pinned G²·S/(na·nb·N²) chain
    "q368_cvm_test" ->
      """WITH byv AS (
        |  SELECT l_extendedprice AS v,
        |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS cb
        |  FROM lineitem WHERE l_returnflag IN ('R', 'A')
        |    AND l_extendedprice IS NOT NULL
        |  GROUP BY 1),
        |c AS (SELECT ca, cb,
        |    sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cca,
        |    sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ccb,
        |    sum(ca) OVER () AS na, sum(cb) OVER () AS nb
        |  FROM byv),
        |q AS (SELECT ca + cb AS c, na, nb,
        |    greatest(1, (na * nb) // 1000000) AS g,
        |    abs(cca * nb - ccb * na)
        |      // greatest(1, (na * nb) // 1000000) AS dq
        |  FROM c)
        |SELECT CAST(max(na) AS BIGINT) AS n_a,
        |  CAST(max(nb) AS BIGINT) AS n_b,
        |  round(CASE WHEN max(na) > 0 AND max(nb) > 0
        |    THEN CAST(max(g) AS DOUBLE) * CAST(max(g) AS DOUBLE)
        |      * CAST(sum(c * dq * dq) AS DOUBLE)
        |      / (CAST(max(na) AS DOUBLE) * CAST(max(nb) AS DOUBLE))
        |      / (CAST(max(na) + max(nb) AS DOUBLE)
        |        * CAST(max(na) + max(nb) AS DOUBLE))
        |    END, 6) AS t_cvm
        |FROM q""".stripMargin,

    // identical seconds-of-day angle, micro-quantized cos/sin sums,
    // pinned R-bar / z / exp chain
    "q369_rayleigh" ->
      """WITH q AS (
        |  SELECT CAST(round(cos(CAST(epoch_us(ts) % 86400000000 AS DOUBLE)
        |      / 86400000000.0 * 6.283185307179586) * 1e6) AS BIGINT) AS c,
        |    CAST(round(sin(CAST(epoch_us(ts) % 86400000000 AS DOUBLE)
        |      / 86400000000.0 * 6.283185307179586) * 1e6) AS BIGINT) AS s
        |  FROM events WHERE ts IS NOT NULL),
        |a AS (SELECT count(*) AS n, sum(c) AS sc, sum(s) AS ss FROM q),
        |rb AS (SELECT n,
        |    sqrt(CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
        |      + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * 1e6) AS r
        |  FROM a)
        |SELECT CAST(n AS BIGINT) AS n,
        |  round(CASE WHEN n > 0 THEN r END, 6) AS r_bar,
        |  round(CASE WHEN n > 0 THEN CAST(n AS DOUBLE) * r * r END, 6)
        |    AS rayleigh_z,
        |  round(CASE WHEN n > 0
        |    THEN exp(-(CAST(n AS DOUBLE) * r * r)) END, 6) AS p_approx
        |FROM rb""".stripMargin,

    // identical descending cumulatives, cum-minus-current previous
    // corner, micro-quantized curve values, pinned area/diagonal
    "q370_qini" ->
      """WITH b AS (
        |  SELECT CAST(l_extendedprice AS DOUBLE) AS s,
        |    CASE WHEN l_partkey % 2 = 0 THEN 1 ELSE 0 END AS tr,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |bys AS (SELECT s, count(*) AS n,
        |    sum(CASE WHEN tr = 1 THEN 1 ELSE 0 END) AS nt,
        |    sum(CASE WHEN tr = 1 AND y = 1 THEN 1 ELSE 0 END) AS yt,
        |    sum(CASE WHEN tr = 0 THEN 1 ELSE 0 END) AS nc,
        |    sum(CASE WHEN tr = 0 AND y = 1 THEN 1 ELSE 0 END) AS yc
        |  FROM b GROUP BY 1),
        |c AS (SELECT s, n, nt, yt, nc, yc,
        |    sum(nt) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING)
        |      AS ntc,
        |    sum(yt) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING)
        |      AS ytc,
        |    sum(nc) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING)
        |      AS ncc,
        |    sum(yc) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING)
        |      AS ycc
        |  FROM bys),
        |q AS (SELECT s, n, nt, nc,
        |    CAST(round((CAST(ytc AS DOUBLE) - CASE WHEN ncc > 0
        |      THEN CAST(ycc AS DOUBLE) * CAST(ntc AS DOUBLE)
        |        / CAST(ncc AS DOUBLE) ELSE 0.0 END) * 1e6) AS BIGINT)
        |      AS qq,
        |    CAST(round((CAST(ytc - yt AS DOUBLE) - CASE WHEN ncc - nc > 0
        |      THEN CAST(ycc - yc AS DOUBLE) * CAST(ntc - nt AS DOUBLE)
        |        / CAST(ncc - nc AS DOUBLE) ELSE 0.0 END) * 1e6) AS BIGINT)
        |      AS qp
        |  FROM c),
        |a AS (SELECT sum(n) AS n, sum(nt) AS n_treat, sum(nc) AS n_ctrl,
        |    sum((qp + qq) * n) AS area2, min_by(qq, s) AS qtot FROM q)
        |SELECT CAST(n AS BIGINT) AS n, CAST(n_treat AS BIGINT) AS n_treat,
        |  CAST(n_ctrl AS BIGINT) AS n_ctrl,
        |  round(CAST(qtot AS DOUBLE) / 1e6, 6) AS uplift_total,
        |  round(CASE WHEN n > 0
        |    THEN CAST(area2 AS DOUBLE) / 2.0 / (CAST(n AS DOUBLE) * 1e6)
        |      - CAST(qtot AS DOUBLE) / 2.0 / 1e6 END, 6) AS qini
        |FROM a""".stripMargin,

    // identical 0x00+md5+utf8 hex assembly, per-byte hex-pair explode,
    // high-nibble bins (bin = v div 16 = the first hex digit, so the
    // bin is readable straight off the pair), exact integer bin counts,
    // per-byte-VALUE entropy terms micro-quantized at 1e12 then summed
    // exactly in any order → the 4-digit grid
    "q371_byte_features" -> {
      val binSums = (0 until 16).map(k =>
        f"sum(CASE WHEN strpos('0123456789ABCDEF', substr(hb, 1, 1)) - 1 = $k THEN c ELSE 0 END) AS c$k%02d")
        .mkString(",\n        |    ")
      val binOut = (0 until 16).map(k => f"CAST(c$k%02d AS BIGINT) AS c$k%02d")
        .mkString(",\n        |  ")
      s"""WITH hx AS (
        |  SELECT doc_id AS media_id,
        |    '00' || upper(md5(CAST(doc_id AS VARCHAR))) ||
        |      hex(encode(coalesce(text, ''))) AS h
        |  FROM documents WHERE doc_id IS NOT NULL),
        |ex AS (SELECT media_id, length(h) // 2 AS n, h,
        |    unnest(range(0, length(h) // 2)) AS u FROM hx),
        |byt AS (SELECT media_id, n,
        |    substr(h, CAST(2 * u + 1 AS INT), 2) AS hb FROM ex),
        |cnt AS (SELECT media_id, any_value(n) AS n, hb, count(*) AS c
        |  FROM byt GROUP BY media_id, hb),
        |agg AS (SELECT media_id, any_value(n) AS n,
        |    $binSums,
        |    sum(CAST(round(-(CAST(c AS DOUBLE) / n) *
        |      ln(CAST(c AS DOUBLE) / n) / ln(2) * 1e12) AS BIGINT)) AS eq
        |  FROM cnt GROUP BY media_id)
        |SELECT media_id, CAST(n AS BIGINT) AS n_bytes,
        |  'unknown' AS format_detected,
        |  $binOut,
        |  round(eq / 1e12, 4) AS entropy_r4
        |FROM agg ORDER BY media_id""".stripMargin
    },

    // q370's oracle with every cumulative/reduce PARTITIONED/GROUPED by
    // ship month — identical corners, quantization and pinned chain
    "q372_qini_by_segment" ->
      """WITH b AS (
        |  SELECT CAST(month(l_shipdate) AS INT) AS seg,
        |    CAST(l_extendedprice AS DOUBLE) AS s,
        |    CASE WHEN l_partkey % 2 = 0 THEN 1 ELSE 0 END AS tr,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |bys AS (SELECT seg, s, count(*) AS n,
        |    sum(CASE WHEN tr = 1 THEN 1 ELSE 0 END) AS nt,
        |    sum(CASE WHEN tr = 1 AND y = 1 THEN 1 ELSE 0 END) AS yt,
        |    sum(CASE WHEN tr = 0 THEN 1 ELSE 0 END) AS nc,
        |    sum(CASE WHEN tr = 0 AND y = 1 THEN 1 ELSE 0 END) AS yc
        |  FROM b GROUP BY 1, 2),
        |c AS (SELECT seg, s, n, nt, yt, nc, yc,
        |    sum(nt) OVER (PARTITION BY seg ORDER BY s DESC
        |      ROWS UNBOUNDED PRECEDING) AS ntc,
        |    sum(yt) OVER (PARTITION BY seg ORDER BY s DESC
        |      ROWS UNBOUNDED PRECEDING) AS ytc,
        |    sum(nc) OVER (PARTITION BY seg ORDER BY s DESC
        |      ROWS UNBOUNDED PRECEDING) AS ncc,
        |    sum(yc) OVER (PARTITION BY seg ORDER BY s DESC
        |      ROWS UNBOUNDED PRECEDING) AS ycc
        |  FROM bys),
        |q AS (SELECT seg, s, n, nt, nc,
        |    CAST(round((CAST(ytc AS DOUBLE) - CASE WHEN ncc > 0
        |      THEN CAST(ycc AS DOUBLE) * CAST(ntc AS DOUBLE)
        |        / CAST(ncc AS DOUBLE) ELSE 0.0 END) * 1e6) AS BIGINT)
        |      AS qq,
        |    CAST(round((CAST(ytc - yt AS DOUBLE) - CASE WHEN ncc - nc > 0
        |      THEN CAST(ycc - yc AS DOUBLE) * CAST(ntc - nt AS DOUBLE)
        |        / CAST(ncc - nc AS DOUBLE) ELSE 0.0 END) * 1e6) AS BIGINT)
        |      AS qp
        |  FROM c),
        |a AS (SELECT seg, sum(n) AS n, sum(nt) AS n_treat,
        |    sum(nc) AS n_ctrl, sum((qp + qq) * n) AS area2,
        |    min_by(qq, s) AS qtot FROM q GROUP BY seg)
        |SELECT seg AS segment, CAST(n AS BIGINT) AS n,
        |  CAST(n_treat AS BIGINT) AS n_treat,
        |  CAST(n_ctrl AS BIGINT) AS n_ctrl,
        |  round(CAST(qtot AS DOUBLE) / 1e6, 6) AS uplift_total,
        |  round(CASE WHEN n > 0
        |    THEN CAST(area2 AS DOUBLE) / 2.0 / (CAST(n AS DOUBLE) * 1e6)
        |      - CAST(qtot AS DOUBLE) / 2.0 / 1e6 END, 6) AS qini
        |FROM a ORDER BY segment""".stripMargin,

    // q308's replay with the residual refinement: coarse assign first,
    // residuals r = v − c_cell per dimension, PQ seeds/codes/LUT all
    // over r, the LUT per (query, PROBED CELL) from q − c_cell, and
    // ‖q − c_cell‖² as the constant term
    "q373_ivfpq_residual" ->
      """WITH cseeds AS MATERIALIZED (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, embedding
        |  FROM (SELECT vec_id, embedding FROM embeddings
        |        WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 8)),
        |ccells AS MATERIALIZED (
        |  SELECT c, j.j AS j, CAST(embedding[j.j + 1] AS DOUBLE) AS w
        |  FROM cseeds, UNNEST(generate_series(0, 63)) j(j)),
        |ccn AS MATERIALIZED (
        |  SELECT c, sum(w * w) AS n2 FROM ccells GROUP BY 1),
        |cx AS MATERIALIZED (
        |  SELECT vec_id, j.j AS j, CAST(embedding[j.j + 1] AS DOUBLE) AS v
        |  FROM embeddings, UNNEST(generate_series(0, 63)) j(j)),
        |assign AS MATERIALIZED (
        |  SELECT vec_id, c AS cluster FROM (
        |    SELECT cx.vec_id, ccells.c, row_number() OVER (
        |      PARTITION BY cx.vec_id ORDER BY
        |        -2 * sum(cx.v * ccells.w) + any_value(ccn.n2), ccells.c)
        |      AS rk
        |    FROM cx JOIN ccells ON cx.j = ccells.j
        |    JOIN ccn ON ccells.c = ccn.c
        |    GROUP BY cx.vec_id, ccells.c)
        |  WHERE rk = 1),
        |res AS MATERIALIZED (
        |  SELECT cx.vec_id, a.cluster, CAST(cx.j // 8 AS INT) AS s,
        |    cx.j % 8 AS jj, cx.v - ccells.w AS r
        |  FROM cx JOIN assign a ON cx.vec_id = a.vec_id
        |  JOIN ccells ON ccells.c = a.cluster AND ccells.j = cx.j),
        |cells AS MATERIALIZED (
        |  SELECT res.s, sd.c, res.jj AS j, res.r AS w
        |  FROM (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
        |          vec_id
        |        FROM embeddings WHERE embedding IS NOT NULL
        |        ORDER BY vec_id LIMIT 16) sd
        |  JOIN res ON res.vec_id = sd.vec_id),
        |cn AS MATERIALIZED (
        |  SELECT s, c, sum(w * w) AS n2 FROM cells GROUP BY 1, 2),
        |codes AS MATERIALIZED (
        |  SELECT vec_id, s, c FROM (
        |    SELECT res.vec_id, res.s, cells.c, row_number() OVER (
        |      PARTITION BY res.vec_id, res.s ORDER BY
        |        -2 * sum(res.r * cells.w) + any_value(cn.n2), cells.c)
        |      AS rk
        |    FROM res JOIN cells ON res.s = cells.s AND res.jj = cells.j
        |    JOIN cn ON cells.s = cn.s AND cells.c = cn.c
        |    GROUP BY res.vec_id, res.s, cells.c)
        |  WHERE rk = 1),
        |q AS MATERIALIZED (
        |  SELECT vec_id AS query_id, embedding FROM embeddings
        |  ORDER BY vec_id LIMIT 3),
        |qcx AS MATERIALIZED (
        |  SELECT query_id, j.j AS j,
        |    CAST(embedding[j.j + 1] AS DOUBLE) AS v
        |  FROM q, UNNEST(generate_series(0, 63)) j(j)),
        |probes AS MATERIALIZED (
        |  SELECT query_id, c AS cluster FROM (
        |    SELECT qcx.query_id, ccells.c, row_number() OVER (
        |      PARTITION BY qcx.query_id ORDER BY
        |        -2 * sum(qcx.v * ccells.w) + any_value(ccn.n2), ccells.c)
        |      AS rk
        |    FROM qcx JOIN ccells ON qcx.j = ccells.j
        |    JOIN ccn ON ccells.c = ccn.c
        |    GROUP BY qcx.query_id, ccells.c)
        |  WHERE rk <= 2),
        |qres AS MATERIALIZED (
        |  SELECT p.query_id, p.cluster, CAST(qcx.j // 8 AS INT) AS s,
        |    qcx.j % 8 AS jj, qcx.v - ccells.w AS r
        |  FROM probes p JOIN qcx ON qcx.query_id = p.query_id
        |  JOIN ccells ON ccells.c = p.cluster AND ccells.j = qcx.j),
        |qqres AS (
        |  SELECT query_id, cluster, sum(r * r) AS qq
        |  FROM qres GROUP BY 1, 2),
        |lut AS MATERIALIZED (
        |  SELECT qres.query_id, qres.cluster, qres.s, cells.c,
        |    -2 * sum(qres.r * cells.w) + any_value(cn.n2) AS pd
        |  FROM qres JOIN cells ON qres.s = cells.s AND qres.jj = cells.j
        |  JOIN cn ON cells.s = cn.s AND cells.c = cn.c
        |  GROUP BY qres.query_id, qres.cluster, qres.s, cells.c),
        |cand AS MATERIALIZED (
        |  SELECT p.query_id, p.cluster, a.vec_id
        |  FROM probes p JOIN assign a ON a.cluster = p.cluster),
        |sc AS (
        |  SELECT cand.query_id, codes.vec_id,
        |    round(sum(l.pd) + any_value(qr.qq), 6) + 0.0 AS adist2
        |  FROM cand JOIN codes ON codes.vec_id = cand.vec_id
        |  JOIN lut l ON codes.s = l.s AND codes.c = l.c
        |    AND l.query_id = cand.query_id AND l.cluster = cand.cluster
        |  JOIN qqres qr ON qr.query_id = cand.query_id
        |    AND qr.cluster = cand.cluster
        |  GROUP BY 1, 2)
        |SELECT query_id, vec_id, adist2, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY adist2, vec_id) AS rn
        |  FROM sc)
        |WHERE rn <= 5 ORDER BY query_id, vec_id""".stripMargin,

    // DuckDB's jaro_winkler_similarity IS the reference the native
    // expression replicates (fuzz-pinned); both sides threshold on the
    // 6-digit-rounded value so grid-edge wobble can't flip membership
    "q374_jaro_winkler" ->
      """WITH b AS (
        |  SELECT p_partkey AS id, p_name AS s,
        |    split_part(p_name, ' ', 1) AS blk
        |  FROM part),
        |ok AS (SELECT blk FROM b GROUP BY blk HAVING count(*) <= 1000),
        |bb AS (SELECT b.id, b.s, b.blk FROM b JOIN ok USING (blk))
        |SELECT x.id AS id_a, y.id AS id_b,
        |  round(jaro_winkler_similarity(x.s, y.s), 6) AS jw
        |FROM bb x JOIN bb y ON x.blk = y.blk AND x.id < y.id
        |WHERE round(jaro_winkler_similarity(x.s, y.s), 6) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,

    // the one float op per row (running-mean shortfall) lands on the
    // 1e-6-cent grid BEFORE any summation; every cumulative below it is
    // exact long arithmetic — λ = 100 units = 1e10 micro-cents
    "q375_page_hinkley" ->
      """WITH s AS (
        |  SELECT user_id, ts,
        |    sum(CAST(round(CAST(value AS DOUBLE) * 100, 0) AS BIGINT))
        |      AS x
        |  FROM events
        |  WHERE event_type = 'purchase' AND ts IS NOT NULL
        |    AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, x, row_number() OVER w AS i, sum(x) OVER w AS sx
        |  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING)),
        |q AS (
        |  SELECT user_id, i,
        |    CAST(round((CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / i - 0.0)
        |      * 1e6, 0) AS BIGINT) AS qv
        |  FROM r),
        |m AS (
        |  SELECT user_id, i, sum(qv) OVER w AS mv
        |  FROM q WINDOW w AS (PARTITION BY user_id ORDER BY i
        |    ROWS UNBOUNDED PRECEDING)),
        |p AS (
        |  SELECT user_id, i, mv - min(mv) OVER w AS ph
        |  FROM m WINDOW w AS (PARTITION BY user_id ORDER BY i
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT user_id, max(i) AS n_points,
        |  round(CAST(arg_max(ph, i) AS DOUBLE) / 1e8, 6) AS ph_end,
        |  round(CAST(max(ph) AS DOUBLE) / 1e8, 6) AS ph_max,
        |  min(CASE WHEN ph > 10000000000 THEN i END) AS first_alarm
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q376_ktruss" -> ktrussOracleSql,

    // two stacked α=1/2 EWMA folds; level/trend/forecast mirror the
    // engine's pinned op order exactly (see brownFoldSql)
    "q377_brown_forecast" -> {
      val lag1 = (1 to 8).map(j => s"lag(v, $j) OVER w AS v$j")
        .mkString(", ")
      val lag2 = (1 to 8).map(j => s"lag(s1, $j) OVER w AS s1_$j")
        .mkString(", ")
      val f1 = brownFoldSql("v" +: (1 to 8).map(j => s"v$j"))
      val f2 = brownFoldSql("s1" +: (1 to 8).map(j => s"s1_$j"))
      s"""WITH a AS (
         |  SELECT event_type, date_trunc('hour', ts) AS bucket,
         |    round(avg(value), 6) AS v
         |  FROM events WHERE event_type IN ('purchase', 'signup')
         |  GROUP BY 1, 2),
         |l1 AS (
         |  SELECT event_type, bucket, v, $lag1
         |  FROM a WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
         |s1c AS (
         |  SELECT event_type, bucket, v, $f1 AS s1
         |  FROM l1),
         |l2 AS (
         |  SELECT event_type, bucket, v, s1, $lag2
         |  FROM s1c WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
         |f AS (
         |  SELECT event_type, bucket, v, s1, $f2 AS s2 FROM l2)
         |SELECT event_type, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS hour,
         |  v, round(s1, 6) AS s1, round(s2, 6) AS s2,
         |  round(s1 * 2.0 - s2, 6) AS level,
         |  round((s1 - s2) * 1.0, 6) AS trend,
         |  round((s1 * 2.0 - s2) + ((s1 - s2) * 1.0) * 3, 6) AS forecast
         |FROM f ORDER BY event_type, hour""".stripMargin
    }
  )

  // ------- q325/q326 isolation-forest oracle builder -------

  private val isoFeats =
    Seq("l_quantity", "l_discount", "l_tax", "l_extendedprice")
  private def isoDraw(t: Int, kind: String, path: String): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"$t#$kind#$path").substring(0, 15), 16)
  private def isoFeatOf(t: Int, path: String): String =
    isoFeats((isoDraw(t, "f", path) % isoFeats.length).toInt)
  private def isoFracOf(t: Int, path: String): Double =
    isoDraw(t, "s", path).toDouble / math.pow(2.0, 60)
  private def isoPid(p: String): String = if (p.isEmpty) "r" else p

  /** c(m) — average BST path length, identical formula to the engine. */
  private def isoC(m: String): String =
    s"(CASE WHEN $m <= 1 THEN 0.0 WHEN $m = 2 THEN 1.0 " +
      s"ELSE 2.0 * (ln($m - 1.0) + 0.5772156649) " +
      s"- 2.0 * ($m - 1.0) / $m END)"
  private def isoCSql0: String = isoC("lc0.m")
  private def isoCSql1: String = isoC("lc1.m")
  private def isoCSqlN: String = isoC("nn.n")

  /** Training CTEs (T = 2 trees, D = 3 levels over [[isoFeats]]):
    * r$l row frames carry per-tree node paths; per level ONE per-node
    * min/max/count aggregation pivots to a one-row split state with the
    * builder-literal md5 fractions; lc0/lc1 are the final leaf sizes.
    */
  private def isoOracleCtes: String = {
    val D = 3
    def paths(l: Int): Seq[String] =
      if (l == 0) Seq("") else paths(l - 1).flatMap(p =>
        Seq(p + "L", p + "R"))
    def level(t: Int, l: Int): String = {
      val ps = paths(l)
      val featCase = "CASE nd_" + t + " " + ps.map(p =>
        s"WHEN '$p' THEN ${isoFeatOf(t, p)}").mkString(" ") + " END"
      val pivots = ps.map { p =>
        val frac = isoFracOf(t, p)
        s"max(CASE WHEN node = '$p' THEN CASE WHEN cnt >= 2 AND mx > mn " +
          s"THEN mn + $frac * (mx - mn) END END) AS s${t}_${isoPid(p)}"
      }.mkString(", ")
      s"""ag${t}_$l AS (
         |  SELECT node, min(fe) AS mn, max(fe) AS mx, count(*) AS cnt
         |  FROM (SELECT nd_$t AS node, $featCase AS fe FROM r$l)
         |  GROUP BY 1),
         |sp${t}_$l AS MATERIALIZED (SELECT $pivots FROM ag${t}_$l)"""
        .stripMargin
    }
    def ndUpdate(t: Int, l: Int): String = {
      val arms = paths(l).map { p =>
        val pid = isoPid(p)
        s"WHEN '$p' THEN (CASE WHEN s${t}_$pid IS NULL THEN '$p' " +
          s"WHEN ${isoFeatOf(t, p)} < s${t}_$pid THEN '${p}L' " +
          s"ELSE '${p}R' END)"
      }.mkString(" ")
      s"(CASE nd_$t $arms ELSE nd_$t END) AS nd_$t"
    }
    val featsSel = isoFeats.map(f =>
      s"CAST($f AS DOUBLE) AS $f").mkString(", ")
    val baseCols = "okey, line, " + isoFeats.mkString(", ")
    val levels = (0 until D).map { l =>
      s"""${level(0, l)},
         |${level(1, l)},
         |r${l + 1} AS MATERIALIZED (
         |  SELECT $baseCols, ${ndUpdate(0, l)}, ${ndUpdate(1, l)}
         |  FROM r$l CROSS JOIN sp0_$l CROSS JOIN sp1_$l)""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS MATERIALIZED (
       |  SELECT l_orderkey AS okey, l_linenumber AS line, $featsSel
       |  FROM lineitem),
       |nn AS (SELECT count(*) AS n FROM base),
       |r0 AS (SELECT *, '' AS nd_0, '' AS nd_1 FROM base),
       |$levels,
       |lc0 AS MATERIALIZED (
       |  SELECT nd_0 AS node, count(*) AS m FROM r$D GROUP BY 1),
       |lc1 AS MATERIALIZED (
       |  SELECT nd_1 AS node, count(*) AS m FROM r$D GROUP BY 1)"""
      .stripMargin
  }

  /** q325 node-table arms: internal rows off each level's split state,
    * leaf rows off the final-assignment counts.
    */
  private def isoNodeTableSql: String = {
    val D = 3
    def paths(l: Int): Seq[String] =
      if (l == 0) Seq("") else paths(l - 1).flatMap(p =>
        Seq(p + "L", p + "R"))
    val internals = for (t <- 0 until 2; l <- 0 until D; p <- paths(l))
      yield {
        val pid = isoPid(p)
        s"""SELECT $t AS tree, '$p' AS path,
           |  '${isoFeatOf(t, p)}' AS feature,
           |  round(s${t}_$pid, 6) AS split, CAST(-1 AS BIGINT) AS size
           |FROM sp${t}_$l WHERE s${t}_$pid IS NOT NULL""".stripMargin
      }
    val leaves = (0 until 2).map(t =>
      s"""SELECT $t AS tree, node AS path, CAST(NULL AS VARCHAR),
         |  CAST(NULL AS DOUBLE), CAST(m AS BIGINT) FROM lc$t"""
        .stripMargin)
    (internals ++ leaves).mkString("\nUNION ALL\n")
  }

  /** The per-cluster log-density chain of the q323/q324 oracles (2π
    * dropped — per-row constant): ln π_z − 0.5·(((t0+t1)+t2)+t3) with
    * t_j = ((x_j − μ)² / v + ln v), x_j = xq_j/1e3.
    */
  private def gmmLl(z: Int): String = {
    val terms = (0 until 4).map { j =>
      s"(((CAST(xq_$j AS DOUBLE) / 1e3 - mu_${z}_$j) " +
        s"* (CAST(xq_$j AS DOUBLE) / 1e3 - mu_${z}_$j)) / v_${z}_$j " +
        s"+ ln(v_${z}_$j))"
    }
    val fold = terms.reduceLeft((a, b) => s"($a + $b)")
    s"(ln(pi_$z) - 0.5 * $fold)"
  }

  /** q323/q324 shared oracle CTEs: milli-quantized components,
    * (md5(id), id)-ranked seed means, global-moment initial variances,
    * then 2 unrolled EM rounds mirroring
    * [[graft.ops.Mixture.fitGmmDiag]] (k = 3, dims = 4).
    */
  private def gmmOracleCtes: String = {
    val K = 3; val D = 4
    def zs(f: Int => String, sep: String = ", "): String =
      (0 until K).map(f).mkString(sep)
    def js(f: Int => String, sep: String = ", "): String =
      (0 until D).map(f).mkString(sep)
    def zjs(f: (Int, Int) => String): String =
      (for (z <- 0 until K; j <- 0 until D) yield f(z, j)).mkString(", ")
    val wTot = s"((greatest(sw_0, 1) + greatest(sw_1, 1)) " +
      s"+ greatest(sw_2, 1))"
    def round(t: Int): String = {
      val es = zs(z => s"exp(${gmmLl(z)}) AS e_$z")
      val den = "((e_0 + e_1) + e_2)"
      s"""r$t AS MATERIALIZED (
         |  SELECT vec_id, ${js(j => s"xq_$j")},
         |    ${zs(z =>
               s"CAST(round((e_$z / $den) * 1e6) AS BIGINT) AS w_$z")}
         |  FROM (SELECT base.*, $es FROM base CROSS JOIN p${t - 1})),
         |m$t AS MATERIALIZED (
         |  SELECT ${zs(z => s"sum(w_$z) AS sw_$z")},
         |    ${zjs((z, j) => s"sum(w_$z * xq_$j) AS mm_${z}_$j")},
         |    ${zjs((z, j) => s"sum(w_$z * xq_$j * xq_$j) AS ss_${z}_$j")}
         |  FROM r$t),
         |p$t AS MATERIALIZED (
         |  SELECT ${zs(z =>
             s"CAST(greatest(sw_$z, 1) AS DOUBLE) " +
               s"/ CAST($wTot AS DOUBLE) AS pi_$z")},
         |    ${zjs((z, j) =>
               s"(CAST(mm_${z}_$j AS DOUBLE) " +
                 s"/ CAST(greatest(sw_$z, 1) AS DOUBLE)) / 1e3 " +
                 s"AS mu_${z}_$j")},
         |    ${zjs((z, j) =>
               s"greatest((CAST(ss_${z}_$j AS DOUBLE) " +
                 s"/ CAST(greatest(sw_$z, 1) AS DOUBLE)) / 1e6 " +
                 s"- ((CAST(mm_${z}_$j AS DOUBLE) " +
                 s"/ CAST(greatest(sw_$z, 1) AS DOUBLE)) / 1e3) " +
                 s"* ((CAST(mm_${z}_$j AS DOUBLE) " +
                 s"/ CAST(greatest(sw_$z, 1) AS DOUBLE)) / 1e3), 1e-6) " +
                 s"AS v_${z}_$j")}
         |  FROM m$t)""".stripMargin
    }
    s"""WITH base AS MATERIALIZED (
       |  SELECT vec_id, CAST(vec_id AS VARCHAR) AS id,
       |    ${js(j => s"CAST(round(CAST(embedding[${j + 1}] AS DOUBLE) " +
           s"* 1e3) AS BIGINT) AS xq_$j")}
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) >= $D),
       |sd AS (
       |  SELECT ${js(j => s"xq_$j")},
       |    row_number() OVER (ORDER BY md5(id), id) AS rn
       |  FROM base),
       |mu0 AS (
       |  SELECT ${zjs((z, j) =>
           s"max(CASE WHEN rn = ${z + 1} THEN " +
             s"CAST(xq_$j AS DOUBLE) / 1e3 END) AS mu_${z}_$j")}
       |  FROM sd WHERE rn <= $K),
       |g0 AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    ${js(j => s"CAST(sum(xq_$j) AS BIGINT) AS s1_$j")},
       |    ${js(j => s"CAST(sum(xq_$j * xq_$j) AS BIGINT) AS s2_$j")}
       |  FROM base),
       |p0 AS MATERIALIZED (
       |  SELECT ${zs(z =>
           s"CAST(1 AS DOUBLE) / CAST($K AS DOUBLE) AS pi_$z")},
       |    ${zjs((z, j) => s"mu_${z}_$j")},
       |    ${zjs((z, j) =>
             s"greatest((CAST(s2_$j AS DOUBLE) / CAST(n AS DOUBLE)) / 1e6" +
               s" - ((CAST(s1_$j AS DOUBLE) / CAST(n AS DOUBLE)) / 1e3) " +
               s"* ((CAST(s1_$j AS DOUBLE) / CAST(n AS DOUBLE)) / 1e3), " +
               s"1e-6) AS v_${z}_$j")}
       |  FROM mu0 CROSS JOIN g0),
       |${round(1)},
       |${round(2)}""".stripMargin
  }

  /** q321 oracle builder: the q301 event-duration frame, then 6 rounds
    * of (closed cell MLE η at current k; 2 Newton k-steps on the 1e-8
    * grid) mirroring [[graft.glm.Survival.aftWeibull]]'s alternation.
    */
  private def weibullOracleSql: String = {
    def kin(r: Int, s: Int): String =
      if (s == 1) { if (r == 1) "k0" else s"k${r - 1}_2" } else s"k${r}_1"
    def step(r: Int, s: Int): String = {
      val k = kin(r, s)
      s"""g${r}_$s AS MATERIALIZED (
         |  SELECT sc.dd / $k.k + sc.ll - sum(
         |      (CASE WHEN d.xh = 1 THEN eta$r.eh1 ELSE eta$r.eh0 END)
         |        * exp($k.k * d.lt) * d.lt) AS f,
         |    -sc.dd / ($k.k * $k.k) - sum(
         |      (CASE WHEN d.xh = 1 THEN eta$r.eh1 ELSE eta$r.eh0 END)
         |        * exp($k.k * d.lt) * d.lt * d.lt) AS fp
         |  FROM d CROSS JOIN eta$r CROSS JOIN $k CROSS JOIN sc
         |  GROUP BY sc.dd, sc.ll, $k.k),
         |k${r}_$s AS MATERIALIZED (
         |  SELECT round(greatest(1e-4,
         |    CASE WHEN g.fp < 0 THEN $k.k - g.f / g.fp ELSE $k.k END), 8)
         |    AS k
         |  FROM g${r}_$s g CROSS JOIN $k)""".stripMargin
    }
    def round(r: Int): String = {
      val k = kin(r, 1)
      s"""tc$r AS MATERIALIZED (
         |  SELECT xh, sum(exp($k.k * lt)) AS tt
         |  FROM d CROSS JOIN $k GROUP BY xh),
         |eta$r AS MATERIALIZED (
         |  SELECT
         |    max(CASE WHEN t.xh = 0 THEN c.e / t.tt END) AS eh0,
         |    max(CASE WHEN t.xh = 1 THEN c.e / t.tt END) AS eh1
         |  FROM tc$r t JOIN ce c USING (xh)),
         |${step(r, 1)},
         |${step(r, 2)}""".stripMargin
    }
    """WITH per AS (
      |  SELECT user_id, min(ts) AS t0,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
      |    max(ts) AS tl, avg(value) AS av
      |  FROM events GROUP BY 1),
      |d0 AS (
      |  SELECT CAST(epoch_us(coalesce(tp, tl)) - epoch_us(t0) AS DOUBLE)
      |      / 3600000000.0 AS dur,
      |    CAST(tp IS NOT NULL AS INT) AS ev,
      |    CASE WHEN av > 49 THEN 1 ELSE 0 END AS xh
      |  FROM per WHERE av IS NOT NULL),
      |d AS MATERIALIZED (
      |  SELECT dur, ev, xh, ln(dur) AS lt FROM d0 WHERE dur > 0),
      |sc AS (SELECT CAST(sum(ev) AS DOUBLE) AS dd,
      |  sum(ev * lt) AS ll FROM d),
      |ce AS (SELECT xh, CAST(sum(ev) AS DOUBLE) AS e FROM d GROUP BY xh),
      |k0 AS (SELECT CAST(1.0 AS DOUBLE) AS k),
      |""".stripMargin +
      (1 to 6).map(round).mkString(",\n") +
      """
        |SELECT * FROM (
        |SELECT '(Intercept)' AS term, round(-ln(eh0) / k, 6) AS estimate
        |  FROM eta6 CROSS JOIN k6_2
        |UNION ALL
        |SELECT 'scale', round(1.0 / k, 6) FROM k6_2
        |UNION ALL
        |SELECT 'x_high', round(-(ln(eh1) - ln(eh0)) / k, 6)
        |  FROM eta6 CROSS JOIN k6_2
        |) ORDER BY term""".stripMargin
  }

  /** q319/q320 shared oracle CTEs: vocab, counts, md5-mod-k init, and 2
    * unrolled EM rounds mirroring [[graft.ops.Topics.fitPlsa]] (k = 4,
    * topV = 50) — identical pinned float chains and micro quantization.
    */
  private def plsaOracleCtes: String = {
    val K = 4
    def zs(f: Int => String, sep: String = ", "): String =
      (0 until K).map(f).mkString(sep)
    def round(r: Int): String = {
      val prev = r - 1
      val tot = "(((CAST(t_0 AS DOUBLE) + CAST(t_1 AS DOUBLE)) " +
        "+ CAST(t_2 AS DOUBLE)) + CAST(t_3 AS DOUBLE))"
      def num(z: Int) = s"((CAST(t_$z AS DOUBLE) / tot) * p_$z)"
      val den = s"(((${num(0)} + ${num(1)}) + ${num(2)}) + ${num(3)})"
      s"""jn$r AS (
         |  SELECT c.d, c.w, c.n, ${zs(z => s"t.t_$z")},
         |    ${zs(z => s"p.p_$z")}
         |  FROM cnt c JOIN th$prev t USING (d) JOIN php$prev p USING (w)),
         |cell$r AS MATERIALIZED (
         |  SELECT d, w, ${zs(z =>
             s"CAST(round((CAST(n AS DOUBLE) * (${num(z)} / $den)) " +
               s"* 1e6) AS BIGINT) AS c_$z")}
         |  FROM (SELECT *, $tot AS tot FROM jn$r)),
         |th$r AS MATERIALIZED (
         |  SELECT d, ${zs(z =>
             s"CAST(greatest(sum(c_$z), 1) AS BIGINT) AS t_$z")}
         |  FROM cell$r GROUP BY d),
         |phw$r AS MATERIALIZED (
         |  SELECT w, ${zs(z =>
             s"CAST(greatest(sum(c_$z), 1) AS BIGINT) AS c_$z")}
         |  FROM cell$r GROUP BY w),
         |pt$r AS (SELECT ${zs(z =>
             s"CAST(sum(c_$z) AS BIGINT) AS s$z")} FROM phw$r),
         |php$r AS (
         |  SELECT w, ${zs(z =>
             s"CAST(c_$z AS DOUBLE) / CAST(s$z AS DOUBLE) AS p_$z")}
         |  FROM phw$r CROSS JOIN pt$r)""".stripMargin
    }
    s"""WITH wn AS (
       |  SELECT d, w FROM (
       |    SELECT doc_id AS d,
       |      unnest(regexp_split_to_array(text, '\\s+')) AS w
       |    FROM documents)
       |  WHERE w <> ''),
       |voc AS MATERIALIZED (
       |  SELECT w FROM (
       |    SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) AS rk
       |    FROM wn GROUP BY w)
       |  WHERE rk <= 50),
       |cnt AS MATERIALIZED (
       |  SELECT d, w, count(*) AS n FROM wn JOIN voc USING (w)
       |  GROUP BY 1, 2),
       |ph0 AS (
       |  SELECT w, ${zs(z => s"CASE WHEN hz = $z THEN 2 ELSE 1 END AS c_$z")}
       |  FROM (SELECT w,
       |    ('0x' || substr(md5(w), 1, 15))::BIGINT % $K AS hz FROM voc)),
       |pt0 AS (SELECT ${zs(z => s"CAST(sum(c_$z) AS BIGINT) AS s$z")}
       |  FROM ph0),
       |php0 AS (
       |  SELECT w, ${zs(z =>
           s"CAST(c_$z AS DOUBLE) / CAST(s$z AS DOUBLE) AS p_$z")}
       |  FROM ph0 CROSS JOIN pt0),
       |th0 AS MATERIALIZED (
       |  SELECT d, ${zs(z =>
           s"CASE WHEN hd = $z THEN 2000000 ELSE 1000000 END AS t_$z")}
       |  FROM (SELECT DISTINCT d,
       |    ('0x' || substr(md5(CAST(d AS VARCHAR)), 1, 15))::BIGINT % $K
       |      AS hd FROM cnt)),
       |${round(1)},
       |${round(2)}"""
      .stripMargin
  }

  /** q318 oracle builder: per bag, the q284 melt/collapse/window/argmax
    * pipeline with integer Poisson weights (w replaces count, w·y
    * replaces sum(y)); weights from the q297 ladder on md5(rid#bag).
    */
  private def forestOracleSql: String = {
    val ladder =
      """CASE WHEN u < 424136118829305344 THEN 0
        |      WHEN u < 848272237658610688 THEN 1
        |      WHEN u < 1060340297073263360 THEN 2
        |      WHEN u < 1131029650211480960 THEN 3
        |      WHEN u < 1148701988496035328 THEN 4
        |      WHEN u < 1152236456152946176 THEN 5
        |      WHEN u < 1152825534095764608 THEN 6
        |      ELSE 7 END""".stripMargin
    def bag(b: Int): String =
      s"""bw$b AS MATERIALIZED (
         |  SELECT y, f1, f2, $ladder AS w
         |  FROM (SELECT y, f1, f2,
         |    ('0x' || substr(md5(rid || '#$b'), 1, 15))::BIGINT AS u
         |    FROM base)
         |  WHERE $ladder > 0),
         |melt$b AS (
         |  SELECT 'l_quantity' AS feature, f1 AS v, y, w FROM bw$b
         |  UNION ALL SELECT 'l_discount', f2, y, w FROM bw$b),
         |agg$b AS (
         |  SELECT feature, v, sum(w) AS n, sum(w * y) AS pos
         |  FROM melt$b GROUP BY 1, 2),
         |cum$b AS (
         |  SELECT feature, v,
         |    sum(n) OVER (PARTITION BY feature ORDER BY v
         |      ROWS UNBOUNDED PRECEDING) AS nl,
         |    sum(pos) OVER (PARTITION BY feature ORDER BY v
         |      ROWS UNBOUNDED PRECEDING) AS posl,
         |    sum(n) OVER (PARTITION BY feature) AS nt,
         |    sum(pos) OVER (PARTITION BY feature) AS post
         |  FROM agg$b),
         |sc$b AS (
         |  SELECT feature, v, nl, posl, nt - nl AS nr, post - posl AS posr,
         |    (CAST(posl AS DOUBLE) * CAST(posl AS DOUBLE)
         |      + CAST(nl - posl AS DOUBLE) * CAST(nl - posl AS DOUBLE))
         |      / CAST(nl AS DOUBLE)
         |    + (CAST(post - posl AS DOUBLE) * CAST(post - posl AS DOUBLE)
         |      + CAST((nt - nl) - (post - posl) AS DOUBLE)
         |        * CAST((nt - nl) - (post - posl) AS DOUBLE))
         |      / CAST(nt - nl AS DOUBLE) AS score
         |  FROM cum$b WHERE nl >= 1 AND nt - nl >= 1),
         |par$b AS (
         |  SELECT sum(w) AS n, sum(w * y) AS pos,
         |    (CAST(sum(w * y) AS DOUBLE) * CAST(sum(w * y) AS DOUBLE)
         |      + CAST(sum(w) - sum(w * y) AS DOUBLE)
         |        * CAST(sum(w) - sum(w * y) AS DOUBLE))
         |      / CAST(sum(w) AS DOUBLE) AS pscore
         |  FROM bw$b),
         |best$b AS (
         |  SELECT feature, v, nl, posl, nr, posr
         |  FROM sc$b CROSS JOIN par$b WHERE score > pscore
         |  ORDER BY score DESC, feature, v LIMIT 1)""".stripMargin
    def rows(b: Int): String =
      s"""SELECT $b AS tree, '' AS path, 0 AS depth,
         |    CAST(par$b.n AS BIGINT) AS n, CAST(par$b.pos AS BIGINT) AS pos,
         |    best$b.feature, CAST(best$b.v AS DOUBLE) AS threshold,
         |    CASE WHEN 2 * par$b.pos > par$b.n THEN 1 ELSE 0 END AS pred
         |  FROM par$b CROSS JOIN best$b
         |UNION ALL
         |SELECT $b, 'L', 1, CAST(nl AS BIGINT), CAST(posl AS BIGINT),
         |    NULL, NULL, CASE WHEN 2 * posl > nl THEN 1 ELSE 0 END
         |  FROM best$b
         |UNION ALL
         |SELECT $b, 'R', 1, CAST(nr AS BIGINT), CAST(posr AS BIGINT),
         |    NULL, NULL, CASE WHEN 2 * posr > nr THEN 1 ELSE 0 END
         |  FROM best$b""".stripMargin
    """WITH base AS MATERIALIZED (
      |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
      |    l_quantity AS f1, l_discount AS f2,
      |    concat_ws('-', l_orderkey, l_linenumber) AS rid
      |  FROM lineitem),
      |""".stripMargin +
      (1 to 3).map(bag).mkString(",\n") +
      "\nSELECT * FROM (\n" +
      (1 to 3).map(rows).mkString("\nUNION ALL\n") +
      "\n) ORDER BY tree, path"
  }

  /** q315 oracle: the greedy longest-match walk over the fixed
    * [[wordpieceVocab]], maxPieceLen 7 / maxWordLen 12 — matches
    * [[graft.ops.WordPiece.segmentWordsGreedy]] step for step.
    */
  private def wordpieceSegSql: String = {
    val L = 12; val G = 7
    val pos = for { j <- 0 until L; l <- 1 to math.min(G, L - j) }
      yield (j, l)
    val posVals = pos.map { case (j, l) => s"($j, $l)" }.mkString(", ")
    val vocVals = wordpieceVocab.map(p => s"('$p')").mkString(", ")
    val hCols = pos.map { case (j, l) =>
      s"max(CASE WHEN j = $j AND l = $l THEN h END) AS h_${j}_$l"
    }.mkString(", ")
    val mCols = (0 until L).map { j =>
      val arms = (math.min(G, L - j) to 1 by -1)
        .map(l => s"WHEN h_${j}_$l = 1 THEN $l").mkString(" ")
      s"CASE $arms END AS m_$j"
    }.mkString(", ")
    val mArr = (0 until L).map(j => s"m_$j").mkString(", ")
    val steps = (1 to L).map { k =>
      val p = k - 1
      s"""st$k AS (
         |  SELECT *, CASE WHEN s_$p IS NOT NULL AND s_$p < length(w)
         |      THEN m_arr[s_$p + 1] END AS mk_$k,
         |    CASE WHEN s_$p IS NOT NULL AND s_$p < length(w)
         |      THEN s_$p + m_arr[s_$p + 1] ELSE s_$p END AS s_$k,
         |    CASE WHEN s_$p IS NOT NULL AND s_$p < length(w)
         |        AND m_arr[s_$p + 1] IS NOT NULL
         |      THEN CASE WHEN s_$p = 0 THEN substr(w, 1, m_arr[s_$p + 1])
         |        ELSE '##' || substr(w, s_$p + 1, m_arr[s_$p + 1]) END
         |      END AS tok_$k
         |  FROM st${k - 1})""".stripMargin
    }.mkString(",\n")
    val toks = (1 to L).map(k => s"tok_$k").mkString(", ")
    s"""WITH w AS MATERIALIZED (
       |  SELECT DISTINCT substr(t, 1, $L) AS w FROM (
       |    SELECT unnest(regexp_split_to_array(text, '\\s+')) AS t
       |    FROM documents)
       |  WHERE t <> ''),
       |voc(p) AS (VALUES $vocVals),
       |sub AS (
       |  SELECT w.w, pos.j, pos.l,
       |    CASE WHEN pos.j = 0 THEN substr(w.w, 1, pos.l)
       |      ELSE '##' || substr(w.w, pos.j + 1, pos.l) END AS piece
       |  FROM w, (VALUES $posVals) pos(j, l)
       |  WHERE length(w.w) >= pos.j + pos.l),
       |hit AS (
       |  SELECT s.w, s.j, s.l, CASE WHEN v.p IS NOT NULL THEN 1 END AS h
       |  FROM sub s LEFT JOIN voc v ON v.p = s.piece),
       |px AS MATERIALIZED (SELECT w, $hCols FROM hit GROUP BY w),
       |ma AS (SELECT w, $mCols FROM px),
       |st0 AS (SELECT *, list_value($mArr) AS m_arr, 0 AS s_0 FROM ma),
       |$steps
       |SELECT w, CASE WHEN s_$L IS NOT NULL
       |  THEN concat_ws('|', $toks) ELSE '[UNK]' END AS toks
       |FROM st$L ORDER BY w""".stripMargin
  }

  private val unigramL = 8

  /** q304/q307 shared seed CTEs: distinct-word frame, (j, i) lattice
    * positions, seed substring counts, seed vocab v0 (top-by-count over
    * minCount ∪ all single chars) and its exact-ratio probs pr0.
    */
  private def unigramSeedCtes: String = {
    val L = unigramL; val G = 3; val VS = 150; val MC = 2
    val pos = for { i <- 1 to L; j <- math.max(0, i - G) until i }
      yield (j, i)
    val posVals = pos.map { case (j, i) => s"($j, $i)" }.mkString(", ")
    s"""w AS MATERIALIZED (
       |  SELECT substr(t, 1, $L) AS w, count(*) AS n FROM (
       |    SELECT unnest(regexp_split_to_array(text, '\\s+')) AS t
       |    FROM documents)
       |  WHERE t <> '' GROUP BY 1),
       |subpos AS MATERIALIZED (
       |  SELECT w.w, w.n, pos.j, pos.i,
       |    substr(w.w, pos.j + 1, pos.i - pos.j) AS piece
       |  FROM w, (VALUES $posVals) pos(j, i)
       |  WHERE length(w.w) >= pos.i),
       |seed AS MATERIALIZED (
       |  SELECT piece, sum(n) AS cnt FROM subpos GROUP BY 1),
       |v0 AS MATERIALIZED (
       |  SELECT piece, max(cnt) AS cnt FROM (
       |    SELECT piece, cnt FROM (
       |      SELECT piece, cnt FROM seed
       |      WHERE cnt >= $MC OR length(piece) = 1
       |      ORDER BY cnt DESC, piece LIMIT $VS)
       |    UNION ALL
       |    SELECT piece, cnt FROM seed WHERE length(piece) = 1
       |  ) GROUP BY 1),
       |pr0 AS (
       |  SELECT piece, CAST(cnt AS DOUBLE)
       |    / (SELECT CAST(sum(cnt) AS DOUBLE) FROM v0) AS p FROM v0)"""
      .stripMargin
  }

  /** One unrolled EM round for the q304/q307 oracles: pivot the piece
    * probs of `pr` onto the word frame, chain the α/β recurrences with
    * the engine's exact float association order, quantize per-position
    * posteriors to integer micro-units, aggregate — then cf$idx applies
    * the singles count floor (max(c, 1) — the engine's coverage rule)
    * and pr$idx takes exact integer-ratio probs.
    */
  private def unigramEmRound(idx: Int, pr: String): String = {
    val L = unigramL; val G = 3
    val pos = for { i <- 1 to L; j <- math.max(0, i - G) until i }
      yield (j, i)
    val pCols = pos.map { case (j, i) =>
      s"max(CASE WHEN j = $j AND i = $i THEN p END) AS p_${j}_$i"
    }.mkString(", ")
    val alphas = (1 to L).map { i =>
      val terms = (math.max(0, i - G) until i).map { j =>
        val aj = if (j == 0) "1.0" else s"a_$j"
        s"coalesce($aj * p_${j}_$i, 0.0)"
      }.reduceLeft((x, y) => s"($x + $y)")
      val src = if (i == 1) s"px$idx" else s"al$idx${i - 1}"
      s"al$idx$i AS (SELECT *, $terms AS a_$i FROM $src)"
    }.mkString(",\n")
    val betas = (L to 0 by -1).map { j =>
      val body =
        if (j == L) "0.0"
        else ((j + 1) to math.min(L, j + G)).map { i =>
          s"coalesce(p_${j}_$i * b_$i, 0.0)"
        }.reduceLeft((x, y) => s"($x + $y)")
      val src = if (j == L) s"al$idx$L" else s"bt$idx${j + 1}"
      s"bt$idx$j AS (SELECT *, CASE WHEN length(w) = $j THEN 1.0 " +
        s"ELSE $body END AS b_$j FROM $src)"
    }.mkString(",\n")
    val zCase = (1 to L).map(l => s"WHEN length(w) = $l THEN a_$l")
      .mkString(" ")
    val arms = pos.map { case (j, i) =>
      val aj = if (j == 0) "1.0" else s"a_$j"
      s"SELECT substr(w, ${j + 1}, ${i - j}) AS piece, " +
        s"CAST(round((((($aj * p_${j}_$i) * b_$i) / z) " +
        s"* CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS c FROM zz$idx"
    }.mkString(" UNION ALL ")
    s"""sub$idx AS (
       |  SELECT s.w, s.n, s.j, s.i, pp.p
       |  FROM subpos s LEFT JOIN $pr pp ON pp.piece = s.piece),
       |px$idx AS MATERIALIZED (
       |  SELECT w, n, $pCols FROM sub$idx GROUP BY w, n),
       |$alphas,
       |$betas,
       |zz$idx AS MATERIALIZED (
       |  SELECT *, CASE $zCase END AS z FROM bt${idx}0),
       |c$idx AS MATERIALIZED (
       |  SELECT piece, CAST(sum(c) AS BIGINT) AS c FROM ($arms)
       |  WHERE c IS NOT NULL AND c > 0 GROUP BY 1),
       |cf$idx AS MATERIALIZED (
       |  SELECT piece, max(c) AS c FROM (
       |    SELECT piece, c FROM c$idx
       |    UNION ALL
       |    SELECT piece, 1::BIGINT AS c FROM v0 WHERE length(piece) = 1
       |  ) GROUP BY 1),
       |pr$idx AS (
       |  SELECT piece, CAST(c AS DOUBLE)
       |    / (SELECT CAST(sum(c) AS DOUBLE) FROM cf$idx) AS p
       |  FROM cf$idx)""".stripMargin
  }

  /** Shared q305/q306 oracle CTE chain: lattice scores (voc/sub/px), DP
    * levels v1..vL (fold over j ascending, strict > — the engine's
    * first-max-wins tie-break verbatim) and the backpointer walk e0..eL.
    * Callers must define a CTE `w(w)` of distinct (truncated) words
    * FIRST, and close the WITH list after.
    */
  private def unigramVitCtes: String = {
    val L = unigramL; val G = 3; val UNK = -20000000L
    val pos = for { i <- 1 to L; j <- math.max(0, i - G) until i }
      yield (j, i)
    val vocVals = unigramScores
      .map { case (p, s) => s"('$p', ${s}::BIGINT)" }.mkString(", ")
    val pCols = pos.map { case (j, i) =>
      s"max(CASE WHEN j = $j AND i = $i THEN v END) AS sc_${j}_$i"
    }.mkString(", ")
    // DP levels: textual acc nesting is bounded by maxPieceLen
    val dp = (1 to L).map { i =>
      val js = math.max(0, i - G) until i
      val (bExpr, jExpr) = js.foldLeft(
        ("CAST(NULL AS BIGINT)", "-1")) { case ((ab, aj), j) =>
        val base = if (j == 0) "0" else s"v_${j}_b"
        val cand = s"($base + sc_${j}_$i)"
        (s"CASE WHEN $cand IS NOT NULL AND (($ab) IS NULL OR $cand > " +
          s"($ab)) THEN $cand ELSE $ab END",
          s"CASE WHEN $cand IS NOT NULL AND (($ab) IS NULL OR $cand > " +
            s"($ab)) THEN $j ELSE $aj END")
      }
      val src = if (i == 1) "px" else s"v${i - 1}"
      s"v$i AS (SELECT *, $bExpr AS v_${i}_b, $jExpr AS v_${i}_j FROM $src)"
    }.mkString(",\n")
    // backpointer walk e_k = v_{e_{k-1}}_j
    val walk = (1 to L).map { k =>
      val look = (1 to L).map(i => s"WHEN $i THEN v_${i}_j").mkString(" ")
      val src = if (k == 1) "e0" else s"e${k - 1}"
      s"e$k AS (SELECT *, CASE WHEN e_${k - 1} > 0 THEN " +
        s"(CASE e_${k - 1} $look END) END AS e_$k FROM $src)"
    }.mkString(",\n")
    s"""voc(piece, s) AS (VALUES $vocVals),
       |sub0 AS (
       |  SELECT w.w, pos.j, pos.i,
       |    substr(w.w, pos.j + 1, pos.i - pos.j) AS piece
       |  FROM w, (VALUES ${pos.map { case (j, i) => s"($j, $i)" }
           .mkString(", ")}) pos(j, i)
       |  WHERE length(w.w) >= pos.i),
       |sub AS (
       |  SELECT s0.w, s0.j, s0.i,
       |    CASE WHEN s0.i - s0.j = 1
       |      THEN coalesce(voc.s, ${UNK}::BIGINT) ELSE voc.s END AS v
       |  FROM sub0 s0 LEFT JOIN voc ON voc.piece = s0.piece),
       |px AS MATERIALIZED (
       |  SELECT w, $pCols FROM sub GROUP BY w),
       |$dp,
       |e0 AS (SELECT *, CAST(length(w) AS INT) AS e_0 FROM v$L),
       |$walk""".stripMargin
  }
}
