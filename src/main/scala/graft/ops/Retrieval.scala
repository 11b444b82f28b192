package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword retrieval and corpus-statistics scoring over a document table —
  * the search-and-curation side of a training-data pipeline: BM25 keyword
  * scoring, unigram-surprisal quality scoring, and reciprocal-rank fusion
  * of independent rankings.
  *
  * Scale shape, per operator:
  *  - [[bm25]] filters the exploded token stream to the query's terms
  *    BEFORE any shuffle, so only matching (doc, term) pairs move; the
  *    document-frequency frame is |query|-sized and broadcast.
  *  - [[surprisal]] shuffles (term) counts once and (doc, term) pairs once
  *    — the same shape as TextOps.tfIdf; the vocabulary join is left to
  *    AQE (vocab-sized, usually broadcast at runtime size).
  *  - [[rrf]] never runs an unpartitioned `row_number` window: each
  *    ranking is a distinct-value collapse + the two-level
  *    [[Cumulative]] prefix pass (min-rank = n − #rows ≤ v + 1), so the
  *    only single-task pass is bucket-count-sized.
  */
object Retrieval {

  private def toks(c: org.apache.spark.sql.Column) =
    filter(split(c, "\\s+"), t => length(t) > 0)

  /** Okapi BM25 score of every document against a bag of query terms.
    *
    * score(D) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|D|/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))   (Lucene's non-negative
    * variant). Documents sharing no term with the query are omitted.
    *
    * @return (id, n_terms_hit, score) — callers rank/limit on a rounded
    *         score grid (the per-doc sum is a ≤|query|-term float add,
    *         so cross-engine comparison needs a grid)
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    // fan out before the split kernels (r14: q154 measured on a
    // one-row-group source, see SCALE.md)
    val base = fanOut(df)
      .select(col(idCol).as("id"), toks(col(textCol)).as("__t"))
      .withColumn("__len", size(col("__t")).cast("double"))
    // one-row corpus stats: N and average document length
    val stats = base.agg(count(lit(1)).as("__n"), avg("__len").as("__avgdl"))
    // explode → filter to query terms BEFORE the shuffle: only hits move
    val tf = base.select(col("id"), col("__len"),
        explode(col("__t")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("id", "__len", "term").agg(count(lit(1)).as("tf"))
    // document frequency per query term: ≤ |query| rows — broadcast
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("__s",
        col("__idf") * col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("__len") / col("__avgdl"))))
      .groupBy("id")
      .agg(count(lit(1)).as("n_terms_hit"), sum("__s").as("score"))
  }

  /** Mean unigram surprisal per document: −(1/|D|) Σ_t tf(t,D)·ln p(t),
    * p(t) = corpus count of t / total tokens. High surprisal = rare
    * vocabulary (or noise); low = boilerplate/stop-heavy text — a cheap
    * corpus-relative quality signal needing no external model.
    *
    * @return (id, n_tokens, surprisal)
    */
  def surprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // fan out before the split+explode (r13 class)
    val tf = fanOut(df).select(col(idCol).as("id"),
        explode(toks(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val ctf = tf.groupBy("term").agg(sum("tf").as("ctf"))
    val total = ctf.agg(sum("ctf").as("__tot"))
    // vocab-sized term join: strategy left to AQE (measured-size broadcast)
    tf.join(ctf, "term")
      .crossJoin(broadcast(total))
      .groupBy("id")
      .agg(sum("tf").as("n_tokens"),
        (-sum(col("tf") * log(col("ctf").cast("double") / col("__tot"))) /
          sum("tf")).as("surprisal"))
  }

  /** Reciprocal-rank fusion of independent per-document rankings:
    * rrf(D) = Σ_c 1/(k + rank_c(D)), each ranking DESCENDING on its
    * column with competition ("min") ranks — ties share the smallest rank,
    * matching SQL `rank() OVER (ORDER BY c DESC)`.
    *
    * Ranks come from a distinct-value collapse + the two-level
    * [[Cumulative]] pass (rank = n − #rows ≤ v + 1), never an
    * unpartitioned window; each rank map joins back under AQE strategy
    * choice.
    *
    * @return input plus `rank_<c>` per ranking column and `rrf`
    */
  def rrf(df: DataFrame, rankCols: Seq[String], k: Int = 60,
      outputCol: String = "rrf"): DataFrame = {
    require(rankCols.nonEmpty, "need at least one ranking column")
    val ranked = rankCols.foldLeft(df) { (d, c) =>
      val byV = d.select(col(c).cast("double").as("__v"))
        .groupBy("__v").agg(count(lit(1)).as("__cnt"))
      val cum = Cumulative.runningSums(byV, "__v", Seq("__cnt"))
      val total = byV.agg(sum("__cnt").as("__n"))
      val rankMap = cum.crossJoin(broadcast(total))
        .select(col("__v"),
          (col("__n") - col("__cnt_cum") + 1L).as(s"rank_$c"))
      d.join(rankMap, col(c).cast("double") <=> col("__v")).drop("__v")
    }
    ranked.withColumn(outputCol,
      rankCols.map(c => lit(1.0) / (lit(k.toDouble) + col(s"rank_$c")))
        .reduce(_ + _))
  }

  /** Class-based TF-IDF (BERTopic's c-TF-IDF): treat each class as ONE
    * meta-document and rank the terms that characterize it —
    * W(t,c) = tf(t,c) · ln(1 + A / f(t)), A = average tokens per class,
    * f(t) = corpus frequency of t. The go-to "what is this
    * cluster/source/label about" summary after clustering or labeling a
    * corpus.
    *
    * One (label, term) count shuffle; f(t) and A are aggregations OF that
    * frame (vocab-sized, one-row); top-k per class is a window keyed by
    * label, ordered on a `scoreDigits` grid (term tie-break) so the
    * selected rows are engine-stable.
    *
    * @return (label, term, tf, score, rn) for rn ≤ topK
    */
  def classTfIdf(df: DataFrame, labelCol: String, textCol: String,
      topK: Int = 10, scoreDigits: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(labelCol).as("label"),
        explode(toks(col(textCol))).as("term"))
      .groupBy("label", "term").agg(count(lit(1)).as("tf"))
    val f = tf.groupBy("term").agg(sum("tf").as("__f"))
    val a = tf.agg((sum("tf").cast("double") /
      countDistinct("label")).as("__a"))
    val w = Window.partitionBy("label")
      .orderBy(col("score").desc, col("term"))
    tf.join(f, "term")
      .crossJoin(broadcast(a))
      .withColumn("score",
        round(col("tf") * log(lit(1.0) + col("__a") / col("__f")),
          scoreDigits))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= topK)
      .select("label", "term", "tf", "score", "rn")
  }

  /** Inverted-index build: one posting row per term with its document
    * frequency and the sorted posting list, serialized as a
    * comma-joined string (a string column round-trips every engine and
    * file format identically; consumers split it or re-explode).
    *
    * Presence is per-document DISTINCT; the only data-sized shuffle is
    * the (term, doc) aggregation. Posting lists are term-df-sized — cap
    * the head with `minDf`/stopword policy upstream if a corpus-scale
    * index must exclude the near-universal terms (their lists are the
    * |corpus|-length rows of the output).
    *
    * @return (term, df, postings) — postings ascending by id
    */
  def buildIndex(df: DataFrame, idCol: String, textCol: String,
      minDf: Long = 1): DataFrame = {
    require(minDf >= 1, s"need minDf >= 1, got $minDf")
    // sort NUMERICALLY first, stringify after — a string sort would order
    // "10" before "2" (fanned: split+explode is the r13 class)
    fanOut(df).select(col(idCol).cast("long").as("__doc"),
        explode(array_distinct(
          filter(split(col(textCol), "\\s+"), t => t =!= ""))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        array_join(transform(array_sort(collect_list(col("__doc"))),
          x => x.cast("string")), ",").as("postings"))
      .filter(col("df") >= minDf)
  }

  /** Reciprocal rank of the FIRST relevant document per query under the
    * (score desc, doc asc) total order, truncated at k — MRR's per-query
    * frame ([[ndcgAtK]]'s binary-relevance sibling; average `rr` for the
    * headline MRR@k). ONE query-partitioned rank window + ONE per-query
    * aggregation.
    *
    * @param relCol relevance, relevant iff > 0
    * @return per query: (queryCol, n_candidates, first_rel_rank, rr) —
    *         both null when no relevant doc lands in the top k
    */
  def reciprocalRankAtK(df: DataFrame, queryCol: String, docCol: String,
      scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val byScore = org.apache.spark.sql.expressions.Window
      .partitionBy(queryCol).orderBy(col(scoreCol).desc, col(docCol))
    df
      .withColumn("__r", row_number().over(byScore))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_candidates"),
        min(when(col(relCol) > 0 && col("__r") <= k, col("__r")))
          .as("first_rel_rank"))
      .select(col(queryCol), col("n_candidates"),
        col("first_rel_rank").cast("int").as("first_rel_rank"),
        round(lit(1.0) / col("first_rel_rank"), 6).as("rr"))
  }

  /** NDCG@k — the graded-relevance ranking metric (Järvelin &
    * Kekäläinen 2002, exponential gain): per query,
    *
    *   DCG@k = Σ_{i≤k} (2^rel_i − 1) / log2(i + 1)  over the ranking
    *   by (score desc, doc asc); IDCG@k re-ranks by (rel desc, doc asc);
    *   ndcg = DCG/IDCG.
    *
    * The doc-id tiebreak makes both rankings total orders, so the
    * metric is deterministic and engine-reproducible. Two windows
    * PARTITIONED BY the query (per-query candidate lists are
    * retrieval-depth-sized, never corpus-sized) + one per-query
    * aggregation.
    *
    * @param relCol integer graded relevance ≥ 0 (0 = irrelevant)
    * @return per query: (queryCol, n_candidates, dcg, idcg, ndcg) —
    *         ndcg null when the query has no relevant docs (idcg 0)
    */
  def ndcgAtK(df: DataFrame, queryCol: String, docCol: String,
      scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val byScore = org.apache.spark.sql.expressions.Window
      .partitionBy(queryCol).orderBy(col(scoreCol).desc, col(docCol))
    val byRel = org.apache.spark.sql.expressions.Window
      .partitionBy(queryCol).orderBy(col(relCol).desc, col(docCol))
    val gain = pow(lit(2.0), col(relCol).cast("double")) - lit(1.0)
    df
      .withColumn("__r", row_number().over(byScore))
      .withColumn("__ri", row_number().over(byRel))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("__r") <= k,
          gain / log2(col("__r").cast("double") + 1.0))
          .otherwise(lit(0.0))).as("__dcg"),
        sum(when(col("__ri") <= k,
          gain / log2(col("__ri").cast("double") + 1.0))
          .otherwise(lit(0.0))).as("__idcg"))
      .select(col(queryCol), col("n_candidates"),
        round(col("__dcg"), 6).as("dcg"),
        round(col("__idcg"), 6).as("idcg"),
        round(when(col("__idcg") > 0, col("__dcg") / col("__idcg")), 6)
          .as("ndcg"))
  }

  /** Average precision @ k per query (whose mean over queries is MAP@k) —
    * the binary-relevance ranking metric between [[reciprocalRankAtK]]
    * (first hit only) and [[ndcgAtK]] (graded gains):
    *
    *   AP@k = Σ_{r ≤ k, rel_r} (Σ_{j ≤ r} rel_j) / r  ÷  min(R, k)
    *
    * over the (score desc, doc asc) total order, R = the query's relevant
    * count. Same shapes as NDCG: one query-partitioned rank window, one
    * running-relevant window over it, one per-query aggregation. Each
    * precision term is an exact small-integer ratio, so the metric
    * replays across engines on the 6-digit grid.
    *
    * @param relCol relevance; > 0 counts as relevant
    * @return per query: (queryCol, n_candidates, n_rel, ap) — ap null
    *         when the query has no relevant docs
    */
  def averagePrecisionAtK(df: DataFrame, queryCol: String, docCol: String,
      scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val byScore = org.apache.spark.sql.expressions.Window
      .partitionBy(queryCol).orderBy(col(scoreCol).desc, col(docCol))
    val isRel = (col(relCol) > 0).cast("int")
    df
      .withColumn("__rel", isRel)
      .withColumn("__r", row_number().over(byScore))
      .withColumn("__cum", sum(col("__rel")).over(byScore
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_candidates"),
        sum(col("__rel")).as("n_rel"),
        sum(when(col("__r") <= k && col("__rel") === 1,
          col("__cum").cast("double") / col("__r").cast("double"))
          .otherwise(lit(0.0))).as("__sump"))
      .select(col(queryCol), col("n_candidates"),
        col("n_rel").cast("long").as("n_rel"),
        round(when(col("n_rel") > 0,
          col("__sump") / least(col("n_rel"), lit(k)).cast("double")), 6)
          .as("ap"))
  }

  /** Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty
    * 2001) — the language-modeling scorer next to [[bm25]]'s
    * tf-saturation one; the standard second opinion in hybrid keyword
    * retrieval:
    *
    *   score(q, d) = Σ_{w∈q} ln( (tf_dw + μ·cf_w/|C|) / (|d| + μ) )
    *
    * Shapes: doc lengths and collection term frequencies each collapse
    * in ONE pass; the scoring grid is docs × |q| — a bounded ≤|q|-fold
    * amplification via a broadcast term frame (zero-tf terms MUST score
    * too; smoothing is the point — but a term with zero COLLECTION
    * frequency has no finite log-likelihood and is rejected loudly) —
    * then one per-doc sum of |q| pinned
    * ln terms (float sum over ≤|q| O(1) terms → 6-digit grid) and a
    * TakeOrderedAndProject under the (score desc, id) total order.
    *
    * @return top-K (idCol, n_tokens, n_matched, score)
    */
  def queryLikelihood(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], mu: Double, topK: Int): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.size <= 16,
      s"need 1..16 query terms, got ${queryTerms.size}")
    require(mu > 0, s"need mu > 0, got $mu")
    require(topK >= 1, s"need topK >= 1, got $topK")
    val toksC = filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")
    // fan out before the split+explode (one-row-group source = one core)
    val toks = fanOut(docs).select(col(idCol).as("__id"),
      explode(toksC).as("__w"))
    val dlen = toks.groupBy("__id").agg(count(lit(1)).as("__len"))
    val cf = toks.groupBy("__w").agg(count(lit(1)).as("__cf"))
    val ctot = cf.agg(sum("__cf").as("__ct"))
    val qterms = cf.sparkSession.createDataFrame(
      queryTerms.distinct.map(Tuple1(_))).toDF("__w")
    // a term with ZERO collection frequency has no finite
    // log-likelihood (ln 0) — reject loudly instead of engine-dependent
    // null/−inf semantics
    // the assert wraps the kept column — a standalone guard column
    // would be pruned away by the optimizer and never evaluate
    val termStats = broadcast(qterms
      .join(cf, Seq("__w"), "left")
      .select(col("__w"),
        when(assert_true(col("__cf").isNotNull && col("__cf") > 0,
          concat(lit("query term absent from the collection: "),
            col("__w"))).isNull, col("__cf")).as("__cf"))
      .crossJoin(ctot))
    val tf = toks.join(qterms, Seq("__w"), "left_semi")
      .groupBy("__id", "__w").agg(count(lit(1)).as("__tf"))
    val grid = dlen.crossJoin(termStats)
      .join(tf, Seq("__id", "__w"), "left")
      .withColumn("__tf", coalesce(col("__tf"), lit(0L)))
    val term = log(
      (col("__tf").cast("double") +
        lit(mu) * col("__cf").cast("double") / col("__ct").cast("double")) /
        (col("__len").cast("double") + lit(mu)))
    grid.groupBy("__id")
      .agg(any_value(col("__len")).as("n_tokens"),
        sum(when(col("__tf") > 0, 1L).otherwise(0L)).as("n_matched"),
        round(sum(term), 6).as("score"))
      .orderBy(col("score").desc, col("__id"))
      .limit(topK)
      .withColumnRenamed("__id", idCol)
  }

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein 1998):
    * the diversity-aware top-k every RAG/curation pipeline reaches for —
    * greedy picks maximizing λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s),
    * so near-duplicates of an already-chosen result are demoted.
    *
    * Scale split: relevance scoring and the candidate cut are fully
    * distributed (one projection + TakeOrderedAndProject under the
    * (rel desc, id) total order); the greedy loop then runs on the
    * COLLECTED candidate slate — model-sized, REQUIRED ≤ 256 — because
    * the k·N pairwise-sim recurrence is inherently sequential. Every
    * number is engine-replayable: cosines are ascending-dim sequential
    * folds (the [[Similarity.dot]] order), the (1−λ) factor is computed
    * as written, selection compares raw doubles with an id tiebreak.
    *
    * @param query  literal query embedding
    * @return k rows: (rank, id, relevance, mmr_score) on the 6-digit
    *         grid; rank 1's mmr_score is λ·rel (empty selected set)
    */
  def mmrSelect(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, lambda: Double,
      candidateN: Int = 64): DataFrame = {
    require(k >= 1 && candidateN >= k,
      s"need 1 <= k <= candidateN, got k=$k candidateN=$candidateN")
    require(candidateN <= 256,
      s"candidate slate $candidateN exceeds the model-sized bound 256")
    require(lambda > 0 && lambda <= 1, s"need 0 < lambda <= 1, got $lambda")
    // The greedy loop tiebreaks on id ASC, so the id must carry a total
    // order the oracle can replay: require an integral id LOUDLY (a
    // string/decimal id would previously ClassCastException at getLong)
    val idType = df.select(col(idCol)).schema.head.dataType
    val integralIdTypes = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType)
    require(integralIdTypes.contains(idType),
      s"mmrSelect needs an integral id column (tiebreak order); " +
        s"'$idCol' is $idType — cast or surrogate-key it first")
    val q = array(query.map(lit): _*)
    val spark = df.sparkSession
    val cand = df
      .select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"),
        Similarity.cosine(col(vecCol), q).cast("double").as("__rel"))
      .orderBy(col("__rel").desc, col("__id"))
      .limit(candidateN)
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Any](1).map {
          case f: Float => f.toDouble
          case d: Double => d
        }.toArray,
        r.getDouble(2)))
    // ascending-dim sequential fold — the Similarity.dot / SQL
    // sum-over-unnest association order, bit-identical across engines
    def dotD(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def normD(a: Array[Double]): Double = math.sqrt(dotD(a, a))
    val sel = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Double, Double)] // (id, rel, mmr)
    val remaining = scala.collection.mutable.LinkedHashMap(
      cand.map(c => c._1 -> c): _*)
    for (_ <- 1 to math.min(k, cand.length)) {
      val scored = remaining.values.map { case (id, v, rel) =>
        val maxSim =
          if (sel.isEmpty) 0.0
          else sel.map { case (sid, _, _) =>
            val other = cand.find(_._1 == sid).get._2
            dotD(v, other) / (normD(v) * normD(other))
          }.max
        val score =
          if (sel.isEmpty) lambda * rel
          else lambda * rel - (1.0 - lambda) * maxSim
        (id, rel, score)
      }
      val best = scored.minBy { case (id, _, s) => (-s, id) }
      sel += best
      remaining.remove(best._1)
    }
    import spark.implicits._
    def rd6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    sel.zipWithIndex
      .map { case ((id, rel, s), i) => (i + 1, id, rd6(rel), rd6(s)) }
      .toSeq.toDF("rank", idCol, "relevance", "mmr_score")
  }

  /** Reciprocal-rank fusion in the LONG format — [[rrf]]'s per-QUERY
    * sibling (rrf fuses score COLUMNS of one global frame; hybrid
    * retrieval produces (ranker, query, id, score) ROWS — BM25 +
    * embedding + anything, per query): per ranker and query, rank
    * candidates under the (score desc, id) total order; a candidate's
    * fused score is Σ over rankers of 1/(kConst + rank).
    *
    * INTEGER-quantized for engine-free replay: each term is
    * 10¹² div (kConst + rank) — exact integer division, so the fused
    * sum is an exact long in ANY aggregation order (no float
    * reassociation), and the top-k cut under (fused desc, id) is a
    * total order. The emitted `rrf_score` divides once at the end
    * (9-digit grid); quantization only matters past rank ~10⁶, far
    * beyond any slate.
    *
    * Duplicate (ranker, query, id) rows are DEDUPED to their max score
    * before ranking — without this, each duplicate would take its own
    * rank and add another 1/(k+rank) term, silently inflating both
    * n_rankers and the fused score (every ranker contributes at most
    * one term per candidate, the RRF contract).
    *
    * Scale shape: one (ranker, query, id) dedup collapse, one
    * (ranker, query)-partitioned rank window, one (query, id) collapse,
    * one query-partitioned top-k window — all keyed, nothing global.
    *
    * @return per query: (queryCol, rank, idCol, n_rankers, rrf_score)
    */
  def rrfFuse(df: DataFrame, rankerCol: String, queryCol: String,
      idCol: String, scoreCol: String, kConst: Int = 60,
      topK: Int = 10): DataFrame = {
    require(kConst >= 1, s"need kConst >= 1, got $kConst")
    require(topK >= 1, s"need topK >= 1, got $topK")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(rankerCol, queryCol)
      .orderBy(col("__score").desc, col(idCol))
    val ranked = df
      .filter(col(scoreCol).isNotNull && col(idCol).isNotNull)
      .groupBy(col(rankerCol), col(queryCol), col(idCol))
      .agg(max(col(scoreCol)).as("__score"))
      .withColumn("__rank", row_number().over(w))
    val fused = ranked.groupBy(col(queryCol), col(idCol))
      .agg(count(lit(1)).as("n_rankers"),
        sum(expr(s"1000000000000L div (${kConst}L + __rank)"))
          .as("__rrf"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(queryCol).orderBy(col("__rrf").desc, col(idCol))
    fused.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= topK)
      .select(col(queryCol), col("rank"), col(idCol), col("n_rankers"),
        round(col("__rrf").cast("double") / 1e12, 9).as("rrf_score"))
  }
}
