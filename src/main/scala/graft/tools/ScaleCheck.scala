package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured scale evidence: blows the sf directory up by a deterministic
  * factor (default 10×) and times a structurally diverse set of headline
  * queries at BOTH scales, so the 100 TB design argument rests on data,
  * not only on plan shape. A linear operator should show time ratio ≈
  * the blow-up factor (usually less: fixed job overheads amortize);
  * anything clearly super-linear is a scale bug to chase.
  *
  * The blow-up replicates every table `copies` times, offsetting each
  * KEY DOMAIN (orderkey, custkey, partkey, suppkey, user/event ids,
  * doc/vec ids) by `copy * (max_key + 1)` — copies stay join-consistent
  * with each other and disjoint across copies, exactly like a larger
  * TPC-H SF (dimension tables scale with SF there too). Timestamps are
  * NOT shifted: event density per hour grows 10×, the realistic shape
  * for event-time windows. Values/text are bit-identical per copy, so
  * per-copy aggregates replicate the base distribution.
  *
  * The query set deliberately EXCLUDES the LSH/MinHash pair generators:
  * exact replication turns every document into a 10-deep duplicate
  * cluster, so the PAIR OUTPUT grows quadratically in the factor by
  * construction — a semantic property of replicated data, not an
  * execution defect (SCALE.md documents this; the banded joins carry
  * caps for exactly this shape).
  *
  *   SPARK_DRIVER_MEM=48g sbt "runMain graft.tools.ScaleCheck"
  *   # args: [srcSfDir] [workDir] [copies]
  */
object ScaleCheck {

  /** (table, key columns sharing a domain base). */
  private val tables: Seq[(String, Seq[(String, String)])] = Seq(
    // table -> (column, domain) pairs; domains resolved to one base each
    "lineitem" -> Seq("l_orderkey" -> "order", "l_partkey" -> "part",
      "l_suppkey" -> "supp"),
    "orders" -> Seq("o_orderkey" -> "order", "o_custkey" -> "cust"),
    "customer" -> Seq("c_custkey" -> "cust"),
    "part" -> Seq("p_partkey" -> "part"),
    "supplier" -> Seq("s_suppkey" -> "supp"),
    "events" -> Seq("event_id" -> "event", "user_id" -> "user"),
    "documents" -> Seq("doc_id" -> "doc"),
    "embeddings" -> Seq("vec_id" -> "vec"),
    "region" -> Nil,
    "nation" -> Nil)

  /** Structurally diverse, linear-expected headline queries. */
  private val queryNames = Seq(
    "q01_pricing_summary", // scan + agg
    "q03_join_topk", // 3-way join + agg + top-k
    "q05_window_rank", // keyed window
    "q11_events_hourly", // event-time windows
    "q21_dedup_exact", // hash-groupBy dedup
    "q56_glm_gaussian_coefs", // IRLS GLM, fused Gram passes
    "q61_distinct_approx", // HLL sketch
    "q64_grouped_glm", // per-group IRLS aggregator
    "q73_cc_labels", // iterative graph (LSS rounds)
    "q74_heavy_hitters", // token heavy hitters
    "q81_grouped_poisson", // grouped GLM, different family
    "q249_duplicate_spans", // gram-hash doc-frequency profile
    // round-10 additions (q262 jaccard join is EXCLUDED for the same
    // reason as the LSH pair generators: exact replication makes every
    // doc a 10-deep duplicate cluster, so its pair output is
    // quadratic-in-factor by construction)
    "q266_dsir_weights", // bucket collapses + broadcast λ + token explode
    "q268_als_factors", // iterative: 2 ALS sweeps of join + Gram solve
    "q270_countmin_cells", // sketch build: explode + partial agg
    // round-10 second batch (q290 dbscan and q291 edit-join are EXCLUDED
    // like the pair generators: replication clones every point/string 10
    // deep, so their neighbor/pair outputs grow quadratically in the
    // factor by construction)
    "q285_tree", // 2 levels × (melt + (node, feature, value) collapse)
    "q287_iv_wald", // one conditional-moment aggregation
    "q293_gbm_stumps", // 3 boosting rounds × (melt + collapse)
    "q294_quantreg", // OLS + 3 weighted Gram IRLS passes
    "q297_bootstrap_ci", // deliberate B·n explode through one shuffle
    "q300_markov_attribution", // journey windows + knockout chain rounds
    // round-10 tail + round-11 (VERDICT r10 #4)
    "q298_ppmi_similarity", // vocab-bounded context-keyed dot self-join
    "q299_funnel_stream", // stateful streaming funnel at 10x event density
    "q301_aft_exponential", // Poisson-offset fused-Gram IRLS
    "q302_ppr", // iterative contribution join + agg rounds
    "q303_grouped_aft", // per-segment GroupedGLM aggregator
    "q304_unigram_lm", // distinct-word EM: corpus collapse + lattice rounds
    "q306_unigram_score", // Viterbi DP per distinct word + dictionary join
    "q308_ivfpq_topk", // coarse assign + probe + candidate-sliced rescoring
    "q309_sliding_chunks", // corpus window explode (pure generator)
    "q310_psi_stream", // bounded bin-count state at 10x event density
    "q312_ann_lsh_portable", // portable LSH: bucket join + candidate rescoring
    "q313_cosine_pairs_lsh_portable", // capped band-bucket self-join pairs
    // round-11 second batch (q317 containment join is EXCLUDED like q262:
    // replication clones every doc 10 deep, so its ordered-pair output is
    // quadratic in the factor by construction)
    "q314_wordpiece_merges", // distinct-word collapse + 8 bounded rounds
    "q315_wordpiece_segment", // greedy walk once per DISTINCT word
    "q316_exact_quantiles", // bounded-histogram refinement rounds
    "q318_forest", // 3 bags x weighted melt-collapse stump fits
    "q319_plsa_topics", // 2 EM rounds: keyed join + quantized cell aggs
    "q321_aft_weibull", // alternating IRLS + shape-Newton aggregations
    "q323_gmm_model", // 2 GMM EM rounds: projection + one moment agg each
    "q326_isoforest_scores", // 3 min/max levels + literal-CASE scoring
    // round-11 third batch (q330 modularity rides the q73 pair graph,
    // which replication makes denser — the label joins themselves are
    // node-linear; measured, not assumed)
    "q329_t_closeness", // bounded class × value grid + per-class window
    "q330_modularity", // CC labels + two label joins + community agg
    "q331_good_turing", // token counts → O(√corpus) spectrum self-join
    "q332_mi_ranking", // one melt scan + cell-frame window marginals
    "q333_hll_registers", // ≤ 2^p-cell partial-agg sketch build
    "q335_prefixspan", // 3 frontier levels: keyed join + min-agg each
    "q336_hll_stream", // streaming HLL at 10x key density, bounded state
    "q337_deepwalk_walks", // 4 steps × two node-keyed joins per step
    "q338_deepwalk_pmi", // walks + lead pairs + PMI top-k
    "q339_cmh", // one stratum collapse + one-row reduce
    "q340_mmr_select", // distributed cut + model-sized greedy
    // round-11 fourth batch
    "q341_policy_value", // one micro-quantized HT aggregation
    "q342_hmm_decode", // 5 steps × keyed join + k²-candidate projection
    "q344_freq_itemsets", // level-pruned pair/triple lattice joins
    "q345_mondrian", // 6 rounds × three leaf-keyed aggs + rank window
    "q346_wasserstein", // value collapse + cumulative pass + lead gaps
    "q347_query_likelihood", // two collapses + docs × |q| grid
    "q348_compression_quality", // per-row zlib via mapPartitions
    "q349_broken_stick", // whole candidate grid in ONE fused agg
    // round-12 batch (q350 rank-window + q352 spectrum collapses should
    // be sublinear past the scan; measured, not assumed)
    "q350_exact_split", // stratum-partitioned rank window + count
    "q351_paired_tests", // key collapse + |d| midrank cumulative pass
    "q352_key_skew", // count collapse + HHI reduce + TakeOrdered top-K
    "q353_theils_u", // one contingency collapse + entropy reduces
    "q354_vocab_richness", // token counts → O(√corpus) spectrum reduce
    "q355_token_dispersion", // one exploded pass → per-token (cf, df)
    "q356_header_decode", // hex-assembled payloads + per-row byte parse
    "q137_profile_approx", // typed melt → k·2^p register collapse
    "q197_rolling_active_hll", // day × 2^p register union + readout
    "q357_kendall_tau", // (x,y) cell collapse + bounded C^2 pair join
    "q358_trend_test", // five global sums in one aggregation
    "q359_skipgram_pairs", // one doc-keyed window, bounded lead unroll
    "q360_negative_audit", // pairs + vocab CDF + broadcast cell joins
    "q361_rrf_fusion", // two keyed rank windows + a (query,id) collapse
    "q362_ece", // micro-quantized bin collapse + <= nBins reduce
    "q363_eb_shrinkage", // key collapse + one-row moments + broadcast
    "q364_silhouette", // kmeans rounds + literal-centroid projection
    "q365_script_profile", // per-row regexp counts, one scan
    "q366_cluster_agreement", // one contingency collapse + reduces
    "q367_hill_tail", // token counts + TakeOrdered top-(k+1) + tiny agg
    "q368_cvm_test", // value collapse + cumulative pass + one reduce
    "q369_rayleigh", // one quantized-trig aggregation
    "q370_qini", // score collapse + descending cumulative + one reduce
    "q371_byte_features", // per-row md5+utf8 byte kernels, fanned-out scan
    "q372_qini_by_segment", // keyed collapse + keyed window + keyed reduce
    "q373_ivfpq_residual", // coarse assign + residual codes + cell-probed rescoring
    // round-14: representatives of the 41 text fronts the PlanSpec
    // check-6 net flagged (split/regex kernel directly over the
    // documents scan), one per kernel shape — measured to decide
    // fanOut-vs-sanction for the whole class
    "q22_text_stats", // regex+split stat projection → one agg
    "q23_lang_hist", // split+explode stopword probe → lang agg
    "q24_fingerprint", // regexp_replace+split+sort fingerprint per row
    "q41_tfidf", // split+explode → tf/df aggs + join
    "q100_decontaminate", // n-gram shingle explode → probe join
    "q154_bm25", // split+explode tf + df aggs + score join
    "q199_redact", // regexp_extract_all counts + regexp_replace rewrite
    "q243_pattern_counts", // multi-pattern regexp_extract_all projection
    "q374_jaro_winkler", // blocked JW self-join (codegen'd kernel)
    "q375_page_hinkley", // (key,ts) collapse + 3 keyed window passes
    "q376_ktruss", // bounded peel rounds x (wedge join + support agg)
    "q377_brown_forecast") // hourly collapse + two stacked EWMA windows

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = if (args.length > 1) args(1) else "/tmp/graft_scale10x"
    val copies = if (args.length > 2) args(2).toInt else 10
    // optional 4th+ args: measure only the named queries (incremental
    // SCALE.md rows without re-timing the whole set)
    val only = args.drop(3).toSet
    val unknown = only -- queryNames.toSet
    require(unknown.isEmpty,
      s"unknown query filter(s): ${unknown.mkString(", ")} — a typo here " +
        "would otherwise measure nothing and exit green")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val done = new java.io.File(s"$work/_BUILT")
    if (!done.exists()) {
      build(spark, src, work, copies)
      done.getParentFile.mkdirs()
      done.createNewFile()
    }

    // min-of-3 with base/big reps INTERLEAVED: this host sees CPU-steal
    // storms (MICROBENCH.md) that can inflate a single shot 10×+ — the
    // first scale run "measured" q249 at ratio 61 from exactly that
    // (calm min-of-3: 2.9). Interleaving + min makes a storm have to
    // last the whole query to survive into the ratio.
    val results = queryNames
      .filter(n => only.isEmpty || only(n))
      .map { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(dir: String): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val reps = (1 to 3).map(_ => (once(src), once(work)))
      val base = reps.map(_._1).min
      val big = reps.map(_._2).min
      val ratio = big / base
      println(f"[scale] $name%-24s base=$base%7.2fs x$copies=$big%7.2fs ratio=$ratio%5.2f")
      (name, base, big, ratio)
    }
    val js = results.map { case (n, b, g, r) =>
      f""""$n":{"base_sec":$b%.3f,"x${copies}_sec":$g%.3f,"ratio":$r%.2f}"""
    }.mkString(",")
    println(s"""{"metric":"scale_check","copies":$copies,"src":"$src","queries":{$js}}""")
    spark.stop()
  }

  private def build(spark: SparkSession, src: String, work: String,
      copies: Int): Unit = {
    // one base per key domain = max over every column mapped to it, + 1
    val domainCols: Map[String, Seq[(String, String)]] =
      tables.flatMap { case (t, cols) =>
        cols.map { case (c, d) => (d, (t, c)) }
      }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val bases: Map[String, Long] = domainCols.map { case (d, tcs) =>
      d -> (tcs.map { case (t, c) =>
        read(spark, src, t).agg(max(col(c))).head().getLong(0)
      }.max + 1L)
    }
    println(s"[scale] key-domain bases: $bases")
    tables.foreach { case (t, cols) =>
      val df = read(spark, src, t)
      val blown =
        if (cols.isEmpty) df
        else df
          .withColumn("__c", explode(sequence(lit(0L), lit(copies - 1L))))
          .select(df.columns.toSeq.map(c =>
            cols.collectFirst { case (`c`, d) =>
              (col(c) + col("__c") * bases(d)).as(c)
            }.getOrElse(col(c))): _*)
      blown.write.mode("overwrite").parquet(s"$work/$t.parquet")
      println(s"[scale] built $t")
    }
  }

  private def read(spark: SparkSession, dir: String, t: String): DataFrame =
    if (t == "events") graft.Events.read(spark, dir)
    else graft.Events.readTable(spark, s"$dir/$t.parquet")
}
