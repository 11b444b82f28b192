package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical association statistics from one contingency aggregation:
  * Pearson χ², degrees of freedom, Cramér's V, and mutual information —
  * the feature-screening numbers a curation pipeline wants per pair of
  * label-ish columns (language × source, split × label, …).
  *
  * Scale shape: ONE groupBy(a,b) shuffle reduces the data to its
  * contingency table; everything after runs on that table (cells ×
  * marginals joins — post-aggregation frames, broadcast-sized for any
  * realistic cardinality). Zero-count cells are handled algebraically,
  * not materialized: every unobserved cell contributes exactly its
  * expected count e to χ², and Σ_all e = n, so
  *
  *   χ² = Σ_obs[(o−e)²/e − e] + n
  *
  * — no cross join of the marginal domains, which would explode for
  * high-cardinality columns. MI's zero cells contribute 0 and need no
  * correction.
  */
object Contingency {

  /** One-row result: chi2, df, cramers_v, mutual_info (nats), n_rows.
    * NULL categories participate as their own level (they are grouped like
    * any other value by groupBy).
    */
  def analyze(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(aCol, bCol).agg(count(lit(1)).as("o"))
    val ra = obs.groupBy(aCol).agg(sum("o").as("ra"))
    val cb = obs.groupBy(bCol).agg(sum("o").as("cb"))
    val tot = obs.agg(sum("o").as("n"),
      countDistinct(aCol).as("nr"), countDistinct(bCol).as("nc"))
    val cells = obs.join(ra, Seq(aCol)).join(cb, Seq(bCol)).crossJoin(tot)
    val e = col("ra").cast("double") * col("cb") / col("n")
    val o = col("o").cast("double")
    cells.agg(
      (sum((o - e) * (o - e) / e - e) + first(col("n"))).as("chi2"),
      ((first(col("nr")) - 1) * (first(col("nc")) - 1)).as("df"),
      first(col("n")).as("n"),
      first(col("nr")).as("nr"),
      first(col("nc")).as("nc"),
      sum((o / col("n")) * log(o * col("n") / (col("ra") * col("cb"))))
        .as("mutual_info"))
      .select(col("chi2"), col("df"),
        sqrt(col("chi2") / (col("n") *
          least(col("nr") - 1, col("nc") - 1))).as("cramers_v"),
        col("mutual_info"), col("n").as("n_rows"))
  }

  /** One-way ANOVA — the numeric × categorical association twin of
    * [[analyze]] (numeric × numeric is plain `corr`): F statistic and η²
    * (variance explained by the grouping) from ONE groupBy(by) shuffle of
    * per-group (n, Σx, Σx²) triples; the between/within decomposition runs
    * on the k-row group frame.
    *
    *   SS_total   = Σx² − (Σx)²/n
    *   SS_between = Σ_g (Σ_g x)²/n_g − (Σx)²/n
    *   F = (SS_b/(k−1)) / ((SS_t − SS_b)/(n−k)),   η² = SS_b/SS_t
    */
  def anova(df: DataFrame, valueCol: String, byCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val groups = df.groupBy(byCol).agg(
      count(lit(1)).as("ng"), sum(x).as("sg"), sum(x * x).as("qg"))
    groups.agg(
      sum("ng").as("n"), count(lit(1)).as("k"),
      sum("sg").as("s"), sum("qg").as("q"),
      sum(col("sg") * col("sg") / col("ng")).as("sb_raw"))
      .select(
        (col("q") - col("s") * col("s") / col("n")).as("ss_total"),
        (col("sb_raw") - col("s") * col("s") / col("n")).as("ss_between"),
        col("n"), col("k"))
      .select(
        (((col("ss_between") / (col("k") - 1)) /
          ((col("ss_total") - col("ss_between")) / (col("n") - col("k"))))
        ).as("f_stat"),
        (col("k") - 1).as("df_between"),
        (col("n") - col("k")).as("df_within"),
        (col("ss_between") / col("ss_total")).as("eta_sq"),
        col("n").as("n_rows"))
  }

  /** Cohen's kappa — chance-corrected agreement between two categorical
    * ratings (annotator agreement, model-vs-gold label audits):
    *
    *   κ = (p_o − p_e)/(1 − p_e),  p_o = Σ_i p_ii,  p_e = Σ_i r_i·c_i/n²
    *
    * Same scale shape as [[analyze]]: ONE groupBy(a,b) contingency
    * shuffle; marginal products run on the reduced table. Observed
    * agreement keys on null-safe equality, so a (null, null) rating pair
    * counts as agreement like any shared level.
    *
    * @return one row (kappa, p_observed, p_expected, n_rows)
    */
  def kappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(aCol, bCol).agg(count(lit(1)).as("o"))
    val ra = obs.groupBy(aCol).agg(sum("o").as("ra"))
    val cb = obs.groupBy(bCol).agg(sum("o").as("cb"))
    val agree = obs.agg(
      sum("o").as("n"),
      sum(when(col(aCol) <=> col(bCol), col("o")).otherwise(0L)).as("oa"))
    // p_e needs Σ_i r_i·c_i over MATCHING levels only: join the marginals
    // on the level value (null-safe), a |levels|-sized frame
    val pe = ra.join(cb, ra(aCol) <=> cb(bCol))
      .agg(coalesce(sum(col("ra").cast("double") * col("cb")), lit(0.0))
        .as("rc"))
    agree.crossJoin(pe)
      .select(
        (col("oa").cast("double") / col("n")).as("po"),
        (col("rc") / (col("n").cast("double") * col("n"))).as("pe"),
        col("n"))
      .select(
        ((col("po") - col("pe")) / (lit(1.0) - col("pe"))).as("kappa"),
        col("po").as("p_observed"), col("pe").as("p_expected"),
        col("n").as("n_rows"))
  }

  /** Shannon entropy (nats) of a categorical column from ONE groupBy
    * shuffle: H = −Σ p ln p over the level frame; ties into the
    * [[analyze]] MI as H(a) + H(b) − H(a,b).
    *
    * @return one row (entropy, n_levels, n_rows)
    */
  def entropy(df: DataFrame, aCol: String): DataFrame = {
    val levels = df.groupBy(aCol).agg(count(lit(1)).as("c"))
    levels.agg(sum("c").as("n"), count(lit(1)).as("k"),
        sum(col("c").cast("double") * log(col("c"))).as("clnc"))
      .select(
        (log(col("n")) - col("clnc") / col("n")).as("entropy"),
        col("k").as("n_levels"), col("n").as("n_rows"))
  }

  /** Pairwise Pearson correlation matrix over `cols` from ONE aggregation
    * pass: n + k first moments + k second moments + k(k−1)/2 cross
    * products — the Gram discipline (glm/Gram.scala) applied to EDA. The
    * pair arithmetic
    *
    *   r_ij = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))
    *
    * runs on the single moments row; `inline` unpivots the pair structs to
    * a long (col_a, col_b, corr) frame, i < j lexicographically by input
    * position. One job, one scan, no shuffle beyond the scalar agg.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    def x(c: String): Column = col(c).cast("double")
    val moments =
      Seq(count(lit(1)).as("n")) ++
      cols.map(c => sum(x(c)).as(s"s_$c")) ++
      cols.map(c => sum(x(c) * x(c)).as(s"q_$c")) ++
      cols.combinations(2).map { case Seq(a, b) =>
        sum(x(a) * x(b)).as(s"p_${a}_$b")
      }.toSeq
    val one = df.agg(moments.head, moments.tail: _*)
    val pairs = cols.combinations(2).map { case Seq(a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        ((col("n") * col(s"p_${a}_$b") - col(s"s_$a") * col(s"s_$b")) /
          sqrt((col("n") * col(s"q_$a") - col(s"s_$a") * col(s"s_$a")) *
            (col("n") * col(s"q_$b") - col(s"s_$b") * col(s"s_$b"))))
          .as("corr"))
    }.toSeq
    one.select(inline(array(pairs: _*)))
  }

  /** χ²-based term–class feature selection: for every (term, class) pair
    * the 2×2 presence table {has term, lacks term} × {in class, not in
    * class} scores
    *
    *   χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)),
    *
    * the classic supervised vocabulary ranking (which words characterize
    * a language / source / topic?). Term presence is per-document
    * DISTINCT (a 1000-fold repeat in one doc is one vote), so the only
    * data-sized shuffle is (term, class) document counts; margins join on
    * the reduced frame, and the per-class top-k is a keyed window over
    * the term frame. All counts are exact integers; χ² is one fixed
    * expression per row, rounded to a 6-digit grid with a term tiebreak
    * BEFORE ranking so the cut is engine-stable.
    *
    * @param minDocFreq drop terms in fewer than this many documents
    * @return (class, term, n_docs_term_class, chi2, rank) — top `topK`
    *         terms per class by (chi2 desc, term)
    */
  def termClassChi2(df: DataFrame, idCol: String, textCol: String,
      classCol: String, minDocFreq: Long, topK: Int): DataFrame = {
    require(minDocFreq >= 1 && topK >= 1, "minDocFreq and topK must be >= 1")
    // fan out before the split+explode (r13 class)
    val docTerms = fanOut(df).select(col(idCol), col(classCol).as("class"),
        explode(array_distinct(
          filter(split(col(textCol), "\\s+"), t => t =!= ""))).as("term"))
    val a = docTerms.groupBy("term", "class").agg(count(lit(1)).as("n_tc"))
    val termTot = a.groupBy("term").agg(sum("n_tc").as("n_t"))
      .filter(col("n_t") >= minDocFreq)
    val classTot = df.groupBy(col(classCol).as("class"))
      .agg(count(lit(1)).as("n_c"))
    val nTot = df.agg(count(lit(1)).as("n_all"))
    val cells = a.join(termTot, "term").join(classTot, "class")
      .crossJoin(broadcast(nTot))
      .select(col("class"), col("term"), col("n_tc"),
        col("n_tc").as("ca"), (col("n_t") - col("n_tc")).as("cb"),
        (col("n_c") - col("n_tc")).as("cc"),
        (col("n_all") - col("n_t") - col("n_c") + col("n_tc")).as("cd"),
        col("n_all"))
    // every product is N²..N⁴-sized — long math overflows at corpus
    // scale, so compute in double from the start: exact while ad−bc ≤ 2⁵³
    // (~9e7 docs), and past that χ² is still a 15-significant-digit
    // score, far inside the 6-digit grid. Squaring is an explicit
    // multiply, not pow() — libm pow is not bit-identical across engines.
    val adbc = col("ca").cast("double") * col("cd") -
      col("cb").cast("double") * col("cc")
    val chi2 = round(
      col("n_all").cast("double") * (adbc * adbc) /
        ((col("ca") + col("cb")).cast("double") *
          (col("cc") + col("cd")).cast("double") *
          (col("ca") + col("cc")).cast("double") *
          (col("cb") + col("cd")).cast("double")),
      6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("class").orderBy(col("chi2").desc, col("term"))
    cells.withColumn("chi2", chi2)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("class"), col("term"),
        col("n_tc").as("n_docs_term_class"), col("chi2"), col("rank"))
  }

  /** Mutual-information feature ranking — [[analyze]]'s k-at-once melt:
    * MI(feature; label) in nats for EVERY requested categorical feature
    * against one label, from ONE scan. The standard screening pass before
    * fitting anything (which metadata columns predict quality? which
    * leak the label?).
    *
    * Shapes: the scan melts to (feature, value, label) triples via one
    * Expand (×k rows, the [[Profile.summarize]] trick) and collapses to
    * per-feature contingency cells; marginals are window sums over that
    * COLLAPSED cell frame (joins of cells-derived frames would re-plan
    * the scan once per marginal), and the final per-feature combine runs
    * on cell-cardinality-sized frames. All counts exact integers; ln is
    * the one pinned float op. Rows with a null label are dropped; null
    * feature VALUES form their own level (encoded, so the equi-joins
    * keep them).
    *
    * @return per feature: (feature, n, n_values, n_labels, mi) — mi in
    *         nats on the 6-digit grid (MI is a float SUM over cells, so
    *         the engines' aggregation orders differ; cells are few and
    *         the terms O(1), leaving ~1e-15 slack against the grid),
    *         n = label-non-null rows
    */
  /** Theil's uncertainty coefficient — the NORMALIZED, ASYMMETRIC
    * association readout the symmetric [[analyze]] numbers can't give:
    * U(a|b) = MI/H(a) is the fraction of a's entropy explained by
    * knowing b (1 = b determines a; directionality matters — zip code
    * determines city almost fully, city barely determines zip).
    *
    * One contingency collapse (the [[analyze]] shape); entropies from
    * the margin frames, MI from the cell frame, each a float sum over
    * cardinality-bounded rows → 6-digit grid.
    *
    * @return one row: (n, h_a, h_b, mi, u_a_given_b, u_b_given_a) —
    *         U null when the conditioned entropy is 0 (constant column)
    */
  def theilsU(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(aCol, bCol).agg(count(lit(1)).as("o"))
    val ra = obs.groupBy(aCol).agg(sum("o").as("ra"))
    val cb = obs.groupBy(bCol).agg(sum("o").as("cb"))
    val tot = obs.agg(sum("o").as("n"))
    def entropy(m: DataFrame, c: String, out: String) = m
      .crossJoin(broadcast(tot))
      .agg(coalesce(sum((col(c).cast("double") / col("n")) *
        log(col(c).cast("double") / col("n"))), lit(0.0)).as(out))
      .select((-col(out)).as(out))
    val ha = entropy(ra, "ra", "h_a")
    val hb = entropy(cb, "cb", "h_b")
    val mi = obs.join(ra, Seq(aCol)).join(cb, Seq(bCol))
      .crossJoin(broadcast(tot))
      .agg(any_value(col("n")).as("n"),
        sum((col("o").cast("double") / col("n")) *
          log(col("o").cast("double") * col("n") /
            (col("ra").cast("double") * col("cb")))).as("mi"))
    mi.crossJoin(broadcast(ha)).crossJoin(broadcast(hb))
      .select(col("n"), round(col("h_a"), 6).as("h_a"),
        round(col("h_b"), 6).as("h_b"), round(col("mi"), 6).as("mi"),
        round(when(col("h_a") > 0.0, col("mi") / col("h_a")), 6)
          .as("u_a_given_b"),
        round(when(col("h_b") > 0.0, col("mi") / col("h_b")), 6)
          .as("u_b_given_a"))
  }

  /** Adjusted Rand Index + normalized mutual information between two
    * labelings (Hubert & Arabie 1985 / Strehl & Ghosh 2002) — THE
    * clustering-agreement readouts: compare a new clustering run against
    * yesterday's, a clustering against ground-truth labels, or two
    * dedup-component labelings. Chance-corrected (ARI = 0 for random
    * agreement, 1 for identical partitions; label NAMES never matter):
    *
    *   ARI = (Σ_ij C(n_ij,2) − ΣC(a_i,2)·ΣC(b_j,2)/C(n,2)) /
    *         ((ΣC(a_i,2)+ΣC(b_j,2))/2 − ΣC(a_i,2)·ΣC(b_j,2)/C(n,2)),
    *   NMI = MI / √(H_a·H_b)
    *
    * ONE (a, b) contingency collapse is the only data-sized shuffle;
    * marginals and reduces ride the cell frame. Every pair count
    * C(x, 2) = x(x−1)/2 is an exact integer summed in Decimal(38,0) —
    * 128-bit safe at any scale — so ARI is three pinned float ops; the
    * MI/entropy sums are the [[theilsU]] cardinality-bounded float
    * class → 6-digit grid.
    *
    * @return one row: (n, n_cells, ari, nmi) — ari null when both
    *         labelings are single-cluster or both are all-singletons
    *         (the chance-correction denominator is 0), nmi null when
    *         either entropy is 0
    */
  def adjustedRandIndex(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def c2(x: Column): Column =
      (x.cast(dec) * (x - 1).cast(dec) / 2).cast(dec)
    val obs = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(aCol, bCol).agg(count(lit(1)).as("o"))
    val ra = obs.groupBy(aCol).agg(sum("o").as("ra"))
    val cb = obs.groupBy(bCol).agg(sum("o").as("cb"))
    val idx = obs.agg(count(lit(1)).as("n_cells"), sum("o").as("n"),
      sum(c2(col("o"))).as("sidx"))
    val sa = ra.agg(sum(c2(col("ra"))).as("sa"))
    val sb = cb.agg(sum(c2(col("cb"))).as("sb"))
    // entropies + MI on the cell frame (theilsU's float class)
    val tot = obs.agg(sum("o").as("__n"))
    def entropy(m: DataFrame, c: String, out: String) = m
      .crossJoin(broadcast(tot))
      .agg(coalesce(sum((col(c).cast("double") / col("__n")) *
        log(col(c).cast("double") / col("__n"))), lit(0.0)).as(out))
      .select((-col(out)).as(out))
    val ha = entropy(ra, "ra", "h_a")
    val hb = entropy(cb, "cb", "h_b")
    val mi = obs.join(ra, Seq(aCol)).join(cb, Seq(bCol))
      .crossJoin(broadcast(tot))
      .agg(sum((col("o").cast("double") / col("__n")) *
        log(col("o").cast("double") * col("__n") /
          (col("ra").cast("double") * col("cb")))).as("mi"))
    val cn2 = c2(col("n"))
    val expct = col("sa").cast("double") * col("sb").cast("double") /
      cn2.cast("double")
    val maxIdx = (col("sa").cast("double") + col("sb").cast("double")) /
      lit(2.0)
    idx.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .crossJoin(broadcast(mi))
      .crossJoin(broadcast(ha)).crossJoin(broadcast(hb))
      .select(col("n").cast("long").as("n"), col("n_cells"),
        round(when(cn2 > 0 && maxIdx - expct =!= 0.0,
          (col("sidx").cast("double") - expct) / (maxIdx - expct)), 6)
          .as("ari"),
        round(when(col("h_a") > 0.0 && col("h_b") > 0.0,
          col("mi") / sqrt(col("h_a") * col("h_b"))), 6).as("nmi"))
  }

  /** Cochran–Mantel–Haenszel test + common odds ratio — the STRATIFIED
    * member of the contingency family ([[analyze]] pools everything;
    * CMH conditions on a confounder, the textbook Simpson's-paradox
    * guard): over K 2×2 tables (a_k..d_k per stratum),
    *
    *   χ²_CMH = (Σ_k (a_k − E_k))² / Σ_k V_k   (1 df, no continuity
    *            correction — documented choice),
    *   E_k = r1_k·c1_k/n_k,
    *   V_k = r1_k·r0_k·c1_k·c0_k / (n_k²·(n_k−1)),
    *   OR_MH = Σ_k (a_k·d_k/n_k) / Σ_k (b_k·c_k/n_k).
    *
    * ONE groupBy(stratum) collapse to exact integer cell counts, then a
    * one-row reduce of the K-row frame; strata with n_k < 2 contribute
    * nothing to the variance (V's n−1 term) and are excluded entirely,
    * loudly countable via k_used. Float sums run over K strata of O(1)
    * terms → 6-digit grid.
    *
    * @param exposureCol boolean-like (treated as exposed when true)
    * @param outcomeCol  boolean-like
    * @return one row: (k_strata, n, chi2_cmh, or_mh) — or_mh null when
    *         no discordant pairs exist
    */
  def mantelHaenszel(df: DataFrame, stratumCol: String,
      exposureCol: String, outcomeCol: String): DataFrame = {
    val ex = col(exposureCol).cast("boolean")
    val oc = col(outcomeCol).cast("boolean")
    val cells = df.filter(ex.isNotNull && oc.isNotNull)
      .groupBy(col(stratumCol).as("__s"))
      .agg(sum(when(ex && oc, 1L).otherwise(0L)).as("a"),
        sum(when(ex && !oc, 1L).otherwise(0L)).as("b"),
        sum(when(!ex && oc, 1L).otherwise(0L)).as("c"),
        sum(when(!ex && !oc, 1L).otherwise(0L)).as("d"))
      .withColumn("n_k", col("a") + col("b") + col("c") + col("d"))
      .filter(col("n_k") >= 2)
    val r1 = (col("a") + col("b")).cast("double")
    val r0 = (col("c") + col("d")).cast("double")
    val c1 = (col("a") + col("c")).cast("double")
    val c0 = (col("b") + col("d")).cast("double")
    val nk = col("n_k").cast("double")
    cells.agg(
      count(lit(1)).as("k_strata"),
      sum("n_k").as("n"),
      sum(col("a").cast("double") - r1 * c1 / nk).as("__num"),
      sum(r1 * r0 * c1 * c0 / (nk * nk * (nk - 1.0))).as("__var"),
      sum(col("a").cast("double") * col("d") / nk).as("__ad"),
      sum(col("b").cast("double") * col("c") / nk).as("__bc"))
      .select(col("k_strata"), col("n"),
        round(col("__num") * col("__num") / col("__var"), 6)
          .as("chi2_cmh"),
        round(when(col("__bc") > 0.0, col("__ad") / col("__bc")), 6)
          .as("or_mh"))
  }

  def mutualInfoRanking(df: DataFrame, featureCols: Seq[String],
      labelCol: String): DataFrame = {
    require(featureCols.nonEmpty, "need at least one feature column")
    require(!featureCols.contains(labelCol),
      s"label column '$labelCol' cannot also be a feature")
    // typed melt — an array of (feature, isnull, value) structs +
    // explode, never a string-interpolated selectExpr stack() (which
    // broke, or allowed expression injection, for column names holding
    // quotes). Null feature values carry a DEDICATED flag column
    // rather than a sentinel string, so no genuine string value can
    // ever silently merge with SQL NULL.
    val entries = featureCols.map(c =>
      struct(lit(c).as("feature"), col(c).isNull.as("__vn"),
        coalesce(col(c).cast("string"), lit("")).as("__v")))
    val melted = df.filter(col(labelCol).isNotNull)
      .select(col(labelCol).cast("string").as("__l"),
        explode(array(entries: _*)).as("__e"))
      .select(col("__l"), col("__e.feature").as("feature"),
        col("__e.__vn").as("__vn"), col("__e.__v").as("__v"))
    val cells = melted.groupBy("feature", "__vn", "__v", "__l")
      .agg(count(lit(1)).as("__c"))
    // marginals as window sums over the COLLAPSED cell frame — joins of
    // frames derived from `cells` would each re-plan the whole scan
    // (Spark shares no subplans), turning one pass into four
    import org.apache.spark.sql.expressions.Window
    cells
      .withColumn("__cfv",
        sum("__c").over(Window.partitionBy("feature", "__vn", "__v")))
      .withColumn("__cfl",
        sum("__c").over(Window.partitionBy("feature", "__l")))
      .withColumn("__n", sum("__c").over(Window.partitionBy("feature")))
      .groupBy("feature")
      .agg(any_value(col("__n")).as("n"),
        countDistinct(col("__vn"), col("__v")).as("n_values"),
        countDistinct(col("__l")).as("n_labels"),
        round(sum((col("__c").cast("double") / col("__n")) *
          log(col("__c").cast("double") * col("__n") /
            (col("__cfv").cast("double") * col("__cfl")))), 6).as("mi"))
  }
}
