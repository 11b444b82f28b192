package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation mining: which word pairs co-occur more than chance? The
  * corpus-analysis primitive behind phrase detection ("new york"),
  * tokenizer-merge candidates, and boilerplate discovery.
  *
  * Pointwise mutual information over adjacent-bigram events:
  *
  *   PMI(a, b) = ln( n_ab · N / (r_a · c_b) )
  *
  * with N = total bigrams, r_a = bigrams starting with a, c_b = bigrams
  * ending with b — the margins come from the bigram table itself (the
  * Contingency discipline), so the whole statistic costs ONE shuffle of
  * bigram pairs: tokenization and pairing are per-row array ops
  * (`zip_with` over two slices, codegen'd), margins are aggregations on
  * the already-reduced pair frame.
  */
object Colloc {

  /** Top-`topK` bigrams by PMI among those seen ≥ `minCount` times.
    * PMI is rounded to 6 digits BEFORE ordering (ln differs in the last
    * ulp across engines; the rounded grid with a (w1, w2) tiebreak makes
    * the ranking engine-reproducible).
    *
    * @return (w1, w2, n_ab, pmi) ordered by (pmi desc, w1, w2)
    */
  def pmiBigrams(df: DataFrame, textCol: String, minCount: Long,
      topK: Int): DataFrame = {
    require(minCount >= 1 && topK >= 1, "minCount and topK must be >= 1")
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= "")
    val left = slice(toks, lit(1), size(toks) - 1)
    val right = slice(toks, lit(2), size(toks) - 1)
    // fan out before the split + zip explode (r13 class)
    val pairs = fanOut(df)
      .select(explode(zip_with(left, right,
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val counts = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
    val ra = counts.groupBy("w1").agg(sum("n_ab").as("r_a"))
    val cb = counts.groupBy("w2").agg(sum("n_ab").as("c_b"))
    val tot = counts.agg(sum("n_ab").as("n_tot"))
    counts.filter(col("n_ab") >= minCount)
      .join(ra, "w1").join(cb, "w2").crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("n_ab"),
        round(log(col("n_ab").cast("double") * col("n_tot") /
          (col("r_a").cast("double") * col("c_b"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Count-based word embeddings from scratch: each vocabulary word's
    * vector is its PPMI row over window-1 contexts (Levy & Goldberg 2014
    * — PPMI factorization is what word2vec implicitly approximates), and
    * similarity is the cosine of those sparse rows. Returns the top-K
    * most similar word pairs — the distributional-similarity readout a
    * corpus pipeline uses for synonym mining / near-duplicate phrasing.
    *
    * Shapes: ONE adjacency explode + (w, c) collapse; vocabulary = the
    * `topV` most frequent tokens under the (count desc, word) total
    * order, so every later frame is vocab-bounded — context postings are
    * ≤ topV by construction and the context-keyed dot-product self-join
    * is capped at topV² pairs. PPMI and cosine are rounded to 6 digits
    * BEFORE ordering (the [[pmiBigrams]] ln convention) with (w1, w2)
    * tiebreaks, so the ranking replays across engines.
    *
    * @return (w1, w2, cosine) with w1 < w2, ordered (cosine desc, w1, w2)
    */
  def ppmiSimilarity(df: DataFrame, textCol: String, topV: Int = 50,
      topK: Int = 20): DataFrame = {
    require(topV >= 2 && topK >= 1, "topV must be >= 2, topK >= 1")
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= "")
    val left = slice(toks, lit(1), size(toks) - 1)
    val right = slice(toks, lit(2), size(toks) - 1)
    // fan out before the split+explode (one-row-group source = one core)
    val fanned = fanOut(df)
    val adj = fanned
      .select(explode(zip_with(left, right,
        (a, b) => struct(a.as("a"), b.as("b")))).as("bg"))
      .select(col("bg.a").as("a"), col("bg.b").as("b"))
    val pairs = adj.select(col("a").as("w"), col("b").as("c"))
      .union(adj.select(col("b").as("w"), col("a").as("c")))
    val wRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("w"))
    val vocab = fanned.select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= topV).select("w")
    val vp = pairs
      .join(vocab, Seq("w"), "left_semi")
      .join(vocab.withColumnRenamed("w", "c"), Seq("c"), "left_semi")
      .groupBy("w", "c").agg(count(lit(1)).as("n"))
    val rw = vp.groupBy("w").agg(sum("n").as("rn"))
    val rc = vp.groupBy("c").agg(sum("n").as("cn"))
    val tot = vp.agg(sum("n").as("nt"))
    val vecs = vp.join(rw, "w").join(rc, "c").crossJoin(broadcast(tot))
      .select(col("w"), col("c"),
        round(greatest(lit(0.0),
          log(col("n").cast("double") * col("nt") /
            (col("rn").cast("double") * col("cn")))), 6).as("p"))
      .filter(col("p") > 0)
    val norms = vecs.groupBy("w").agg(sum(col("p") * col("p")).as("n2"))
    vecs.select(col("c"), col("w").as("w1"), col("p").as("pa"))
      .join(vecs.select(col("c"), col("w").as("w2"), col("p").as("pb")),
        "c")
      .filter(col("w1") < col("w2"))
      .groupBy("w1", "w2").agg(sum(col("pa") * col("pb")).as("dt"))
      .join(norms.select(col("w").as("w1"), col("n2").as("na")), "w1")
      .join(norms.select(col("w").as("w2"), col("n2").as("nb")), "w2")
      .select(col("w1"), col("w2"),
        round(col("dt") / sqrt(col("na") * col("nb")), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("w1"), col("w2"))
      .limit(topK)
  }
}
