package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based n-gram language modeling over a document corpus: the
  * classic data-quality scorer (a document whose bigrams are improbable
  * under the corpus's own statistics is boilerplate, noise, or another
  * language) and the classic pre-neural LM baseline.
  *
  * Everything derives from ONE shuffle of adjacent-bigram pairs (the
  * Colloc pairing discipline): bigram counts c(w1,w2), left margins
  * c(w1·), continuation counts N1+(w1·) / N1+(·w2) / N1+(··) are all
  * aggregations of the already-reduced bigram frame, so model size is
  * |observed bigrams| — data-sized, never vocab².
  */
object Ngram {

  /** Adjacent-bigram pairs of `textCol`, one row per occurrence. */
  private def bigramPairs(df: DataFrame, textCol: String): DataFrame = {
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= "")
    val left = slice(toks, lit(1), size(toks) - 1)
    val right = slice(toks, lit(2), size(toks) - 1)
    // fan out before the split + zip explode (r13 class)
    fanOut(df).select(explode(zip_with(left, right,
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** Interpolated Kneser–Ney bigram probabilities with a fixed discount
    * (Chen & Goodman 1998's one-discount variant):
    *
    *   P(w2|w1) = (c(w1,w2) − D)/c(w1·)
    *            + D · N1+(w1·)/c(w1·) · N1+(·w2)/N1+(··)
    *
    * The continuation distribution N1+(·w2)/N1+(··) ("in how many
    * distinct contexts does w2 complete a bigram?") is what
    * distinguishes KN from naive backoff. Every count is an exact
    * integer aggregate; the probability is one fixed-order double
    * expression per row, so p_kn is bit-identical across engines.
    *
    * @return (w1, w2, n_ab, p_kn) for every observed bigram
    */
  def kneserNeyBigrams(df: DataFrame, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, "discount must be in (0, 1)")
    val counts = bigramPairs(df, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
    // all margins come from the reduced bigram frame: c(w1·) and the
    // distinct-continuation counts are one aggregation each
    val leftM = counts.groupBy("w1")
      .agg(sum("n_ab").as("c_w1"), count(lit(1)).as("n1_w1"))
    val rightM = counts.groupBy("w2").agg(count(lit(1)).as("n1_w2"))
    val tot = counts.agg(count(lit(1)).as("n1_tot"))
    counts.join(leftM, "w1").join(rightM, "w2").crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("n_ab"),
        ((col("n_ab") - lit(discount)) / col("c_w1") +
          lit(discount) * col("n1_w1") / col("c_w1") *
            (col("n1_w2").cast("double") / col("n1_tot"))).as("p_kn"))
  }

  /** Per-document bigram perplexity under the corpus's own KN model:
    * ppl(doc) = exp(−mean ln P(w_i | w_{i−1})). Documents shorter than
    * two tokens carry no bigram and are absent from the result.
    *
    * The LM is trained on the scored corpus itself, so every document
    * bigram is present in the model and the scoring join is lossless;
    * strategy (broadcast vs shuffle) is left to AQE — the model frame
    * is |observed bigrams|-sized, not bounded.
    *
    * @return (idCol, n_bigrams, ppl) — ppl on a 6-digit grid (the only
    *         cross-engine-ordered sum is the per-doc mean)
    */
  def perplexity(df: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    val lm = kneserNeyBigrams(df, textCol, discount)
      .select(col("w1"), col("w2"), col("p_kn"))
    val docBigrams = {
      val toks = filter(split(col(textCol), "\\s+"), t => t =!= "")
      val left = slice(toks, lit(1), size(toks) - 1)
      val right = slice(toks, lit(2), size(toks) - 1)
      fanOut(df).select(col(idCol), explode(zip_with(left, right,
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    }
    docBigrams.join(lm, Seq("w1", "w2"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        round(exp(-avg(log(col("p_kn")))), 6).as("ppl"))
  }

  /** Corpus-divergence probe: cross-entropy and KL divergence between
    * the unigram distributions of two corpora — the distribution-shift
    * check a data pipeline runs between snapshots/sources/splits
    * (a drifting KL flags contamination, topic shift, or a broken
    * extractor upstream).
    *
    * Add-one smoothing over the JOINT observed vocabulary V:
    *   p(w) = (c_a(w)+1)/(n_a+|V|),  q(w) = (c_b(w)+1)/(n_b+|V|)
    *   H(P,Q) = −Σ_V p·ln q,  KL(P‖Q) = Σ_V p·ln(p/q)
    *
    * Both corpora collapse to vocabulary-sized count frames, meet in
    * ONE full-outer join on the token, and reduce to a single row —
    * the result frame is O(1), the shuffles are vocab-sized.
    *
    * @return one row: (vocab, n_a, n_b, cross_entropy, entropy_a,
    *         kl_ab) on the 6-digit grid (nats)
    */
  def unigramDivergence(dfA: DataFrame, dfB: DataFrame,
      textCol: String): DataFrame = {
    def counts(df: DataFrame, cnt: String) = {
      val toks = filter(split(col(textCol), "\\s+"), t => t =!= "")
      fanOut(df).select(explode(toks).as("__w"))
        .groupBy("__w").agg(count(lit(1)).as(cnt))
    }
    val joined = counts(dfA, "__ca")
      .join(counts(dfB, "__cb"), Seq("__w"), "full_outer")
      .select(coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val tot = joined.agg(count(lit(1)).as("vocab"),
      sum("__ca").as("n_a"), sum("__cb").as("n_b"))
    val p = (col("__ca") + 1).cast("double") /
      (col("n_a") + col("vocab")).cast("double")
    val q = (col("__cb") + 1).cast("double") /
      (col("n_b") + col("vocab")).cast("double")
    joined.crossJoin(broadcast(tot))
      .agg(any_value(col("vocab")).as("vocab"),
        any_value(col("n_a")).as("n_a"),
        any_value(col("n_b")).as("n_b"),
        round(-sum(p * log(q)), 6).as("cross_entropy"),
        round(-sum(p * log(p)), 6).as("entropy_a"),
        round(sum(p * log(p / q)), 6).as("kl_ab"))
  }

  /** Good–Turing frequency smoothing (Gale & Sampson 1995 "simple GT"
    * without the log-linear fit — the raw Turing estimates): from the
    * corpus frequency spectrum N_r (how many distinct tokens occur
    * exactly r times), the adjusted count r* = (r+1)·N_{r+1}/N_r and the
    * total unseen-mass estimate P₀ = N_1/N. The smoothing family's
    * count-based member next to [[kneserNeyBigrams]]'s discounting — and
    * the first thing a tokenizer-vocabulary audit reads (a fat N_1 tail
    * means the corpus is full of hapax noise).
    *
    * Shapes: the corpus collapses to token counts (ONE explode + agg),
    * then to the frequency spectrum (ONE agg over the vocab frame,
    * O(√corpus) rows), and r+1 lookup is a self-join of that tiny frame;
    * the total rides as a broadcast one-row crossJoin. Everything up to
    * the final r* division is exact integer counts.
    *
    * @return per occupied frequency r: (r, n_r, r_star, p_r) — r_star
    *         null when N_{r+1} = 0 (the spectrum gap; simple GT would
    *         switch to the fitted proxy there), p_r = probability mass
    *         a single token of count r gets (r-star over N), 9-digit grid
    */
  /** Vocabulary-richness readout off the [[goodTuring]] spectrum —
    * bias-corrected Chao1 (Chao 1984/Chiu 2014: Ŝ = S_obs +
    * N₁(N₁−1)/(2(N₂+1)), defined even without doubletons) and Good's
    * coverage Ĉ = 1 − N₁/N: how much of the type space has the corpus
    * actually seen, and how much mass sits on unseen types — the
    * dedup/crawl-saturation readout (coverage near 1 = more crawling
    * repeats what you have).
    *
    * Same shapes as [[goodTuring]]: token counts → O(√corpus) spectrum,
    * then a one-row reduce; exact integers up to the two pinned final
    * expressions.
    *
    * @return one row: (s_obs, n_tokens, n1, n2, chao1, coverage) —
    *         chao1/coverage on the 6-digit grid
    */
  def vocabRichness(df: DataFrame, textCol: String): DataFrame = {
    val toks = filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")
    // fan out before the split+explode (one-row-group source = one core)
    val counts = fanOut(df).select(explode(toks).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__r"))
    counts.agg(
      count(lit(1)).as("s_obs"),
      sum("__r").as("n_tokens"),
      sum(when(col("__r") === 1L, 1L).otherwise(0L)).as("n1"),
      sum(when(col("__r") === 2L, 1L).otherwise(0L)).as("n2"))
      .select(col("s_obs"), col("n_tokens"), col("n1"), col("n2"),
        round(col("s_obs").cast("double") +
          col("n1").cast("double") * (col("n1") - 1L) /
            (lit(2.0) * (col("n2").cast("double") + 1.0)), 6).as("chao1"),
        round(lit(1.0) - col("n1").cast("double") /
          col("n_tokens").cast("double"), 6).as("coverage"))
  }

  /** Token dispersion — the burstiness audit: a token whose collection
    * frequency concentrates in few documents (low df/cf against its
    * size) is template/spam-shaped, not language-shaped. ONE exploded
    * pass collapses to per-token (cf, df = distinct docs); dispersion =
    * df/cf ∈ (0, 1] with 1 = perfectly spread singletons.
    *
    * @param minCf report only tokens with collection frequency ≥ this
    * @return per token: (token, cf, df, dispersion) — 6-digit grid
    */
  def tokenDispersion(df: DataFrame, idCol: String, textCol: String,
      minCf: Long = 2): DataFrame = {
    require(minCf >= 1, s"need minCf >= 1, got $minCf")
    val toks = filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")
    // the split+explode is the per-row cost — fan out so a one-row-group
    // source doesn't put the whole corpus through one core
    fanOut(df).select(col(idCol).as("__id"), explode(toks).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cf"), countDistinct("__id").as("df"))
      .filter(col("cf") >= minCf)
      .select(col("token"), col("cf"), col("df"),
        round(col("df").cast("double") / col("cf").cast("double"), 6)
          .as("dispersion"))
  }

  def goodTuring(df: DataFrame, textCol: String): DataFrame = {
    val toks = filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")
    // fan out before the split+explode (one-row-group source = one core)
    val counts = fanOut(df).select(explode(toks).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__r"))
    val spectrum = counts.groupBy(col("__r").as("r"))
      .agg(count(lit(1)).as("n_r"))
    val tot = spectrum.agg(sum(col("r") * col("n_r")).as("__n"))
    val next = spectrum.select((col("r") - 1).as("r"),
      col("n_r").as("__n_next"))
    spectrum.join(next, Seq("r"), "left")
      .crossJoin(broadcast(tot))
      .select(col("r"), col("n_r"),
        round((col("r") + 1).cast("double") * col("__n_next") /
          col("n_r").cast("double"), 6).as("r_star"),
        round((col("r") + 1).cast("double") * col("__n_next") /
          (col("n_r").cast("double") * col("__n").cast("double")), 9)
          .as("p_r"))
  }
}
