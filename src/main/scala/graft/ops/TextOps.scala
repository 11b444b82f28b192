package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language identification, and document
  * fingerprinting — all pure column expressions (whole-stage codegen, no
  * UDFs, no shuffles beyond what the caller aggregates), so they run at
  * full scan speed over any corpus size.
  */
object TextOps {

  /** Whitespace tokenizer. */
  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word segmentation count: splits on whitespace AND on
    * letter/digit/punctuation boundaries, a cheap proxy for a real BPE
    * tokenizer's token count.
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?<=\\p{L})(?=\\p{N})|(?<=\\p{N})(?=\\p{L})|\\s+|(?=\\p{Punct})|(?<=\\p{Punct})"),
      t => length(t) > 0))

  def avgWordLen(text: Column): Column = {
    val t = tokens(text)
    aggregate(t, lit(0.0), (acc, w) => acc + length(w)) / greatest(size(t), lit(1))
  }

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
      greatest(length(text), lit(1))

  /** Fraction of characters that are uppercase. */
  def upperRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[A-Z]", ""))).cast("double") /
      greatest(length(text), lit(1))

  /** Fraction of tokens that appear in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    size(filter(t, w => w.isin(stopwords.map(lit(_)): _*))).cast("double") /
      greatest(size(t), lit(1))
  }

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for")

  /** Composite quality score in [0,1]: rewards mid-length documents with a
    * healthy stopword ratio and penalizes punctuation-heavy text. Weights
    * are heuristic but deterministic — a standard pre-training-filter shape.
    */
  def qualityScore(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val nTok = tokenCount(text).cast("double")
    val lengthScore = least(nTok / 50.0, lit(1.0))
    val stopScore = least(stopwordRatio(text, stopwords) * 5.0, lit(1.0))
    val punctPenalty = greatest(lit(1.0) - punctRatio(text) * 4.0, lit(0.0))
    (lengthScore * 0.4 + stopScore * 0.4 + punctPenalty * 0.2)
  }

  /** Marker words per language for the n-gram/heuristic language scorer. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "en" -> Seq("the", "and", "of", "is", "not"),
    "es" -> Seq("el", "la", "los", "que", "y"),
    "fr" -> Seq("le", "la", "les", "et", "ne"),
    "zh" -> Seq("de5", "shi4", "le5", "bu4", "wo3"))

  /** Count of occurrences of `word` as a whole token inside `text`:
    * tokenize, filter, size. Portable to DuckDB as
    * `len(list_filter(regexp_split_to_array(text, '\s+'), t -> t = word))`.
    */
  def wordOccurrences(text: Column, word: String): Column =
    size(filter(tokens(text), t => t === word)).cast("double")

  /** Unicode-script character profile per document — the robust
    * complement to the stopword [[langId]] at corpus scale (stopword
    * lists miss scripts entirely; script ratios catch wrong-script and
    * mixed-script documents no marker list can): per doc, the fraction
    * of characters in the Latin / Cyrillic / Han / Arabic scripts plus
    * digits and whitespace, and the dominant script by first-max-wins
    * over that fixed order (ties to the earlier class).
    *
    * Counting is `length(text) − length(regexp_replace(text, cls, ""))`
    * — pure codegen'd column arithmetic, one scan, no explode. Script
    * classes are Unicode script properties; engines agree to the extent
    * their script tables implement the same Unicode version (Java's
    * `\p{IsLatin}` and RE2's `\p{Latin}` can diverge on codepoints whose
    * script assignment changed between Unicode releases — an
    * estimate-class caveat for exotic codepoints, not a portability
    * guarantee).
    *
    * @return (idCol, n_chars, latin_frac, cyrillic_frac, han_frac,
    *         arabic_frac, digit_frac, space_frac, dominant_script) —
    *         fractions on the 6-digit grid; empty/null text reports
    *         zero counts, null fractions and script 'none'
    */
  def scriptProfile(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val t = col(textCol)
    val n = when(t.isNull, lit(0)).otherwise(length(t))
    def cnt(cls: String): Column =
      when(t.isNull, lit(0))
        .otherwise(length(t) - length(regexp_replace(t, cls, "")))
    val classes = Seq(
      "latin" -> "[\\p{IsLatin}]", "cyrillic" -> "[\\p{IsCyrillic}]",
      "han" -> "[\\p{IsHan}]", "arabic" -> "[\\p{IsArabic}]",
      "digit" -> "[0-9]", "space" -> "[\\s]")
    // per-CHAR regex counting is the expensive per-row kernel of this op
    // — fan out first so a few-row-group source (the testdata parquet is
    // ONE row group) doesn't serialize the whole corpus onto one core
    // (measured: the 100x scale row was ~70x before, scan-bound after)
    val counted = fanOut(df).select(
      col(idCol) +: n.as("n_chars") +:
        classes.map { case (nm, cls) => cnt(cls).as(s"__c_$nm") }: _*)
    val fracs = classes.map { case (nm, _) =>
      round(when(col("n_chars") > 0,
        col(s"__c_$nm").cast("double") / col("n_chars").cast("double")),
        6).as(s"${nm}_frac")
    }
    // dominant over the SCRIPT classes only (digit/space excluded);
    // first-max-wins in declaration order
    val scripts = Seq("latin", "cyrillic", "han", "arabic")
    val best = scripts.map(nm => col(s"__c_$nm")).reduceLeft(greatest(_, _))
    val dom = when(col("n_chars") === 0 || best === 0, lit("none"))
      .otherwise(scripts.foldRight(lit(scripts.last)) { (nm, acc) =>
        if (nm == scripts.last) acc
        else when(col(s"__c_$nm") >= best, lit(nm)).otherwise(acc)
      })
    counted.select(col(idCol) +: col("n_chars").cast("long").as("n_chars")
      +: fracs :+ dom.as("dominant_script"): _*)
  }

  /** Per-language marker score over an already-tokenized array: fraction of
    * tokens that are marker words. Token-array form so the (regex) split
    * runs ONCE per document however many languages are scored.
    */
  def langScoreTokens(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit(_)): _*))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")

  def langScore(text: Column, markers: Seq[String]): Column =
    langScoreTokens(tokens(text), markers)

  /** Predicted language from a token array: argmax of [[langScoreTokens]]
    * over [[langMarkers]], ties broken by language code order.
    */
  def langIdTokens(toks: Column): Column = {
    val scored = langMarkers.map { case (lang, mk) => (lang, langScoreTokens(toks, mk)) }
    // fold to (bestLang, bestScore) with strict > so earlier (lexicographic
    // smaller) language wins ties
    scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bl, bs), (lang, s)) =>
        (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }._1
  }

  def langId(text: Column): Column = langIdTokens(tokens(text))

  /** Staged language-id: tokenize once, score each language into its own
    * aliased column, then argmax over plain column references.
    *
    * The single-expression [[langId]] is correct but its argmax fold
    * duplicates each score subtree (including the regex split) exponentially
    * in the number of languages; as multi-referenced non-cheap aliases,
    * these stay materialized per stage (CollapseProject will not re-inline
    * them), so the split and each filter run once per row.
    */
  def withLangId(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val toks = "__langid_toks"
    val sCols = langMarkers.indices.map(i => s"__langid_s$i")
    // fan out before the per-row split+marker kernels (one-row-group
    // source = one core; r14 measured q23 at 33.6x before, see SCALE.md)
    val staged = langMarkers.zipWithIndex.foldLeft(
      fanOut(df).withColumn(toks, tokens(col(textCol)))) {
      case (d, ((_, mk), i)) => d.withColumn(sCols(i), langScoreTokens(col(toks), mk))
    }
    val scored = langMarkers.zipWithIndex.map { case ((lang, _), i) => (lang, col(sCols(i))) }
    val langExpr = scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bl, bs), (lang, s)) =>
        (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }._1
    staged.withColumn(outCol, langExpr).drop(toks +: sCols: _*)
  }

  /** TF-IDF over a tokenized corpus: one explode pass, document
    * frequencies from a term-level aggregation (map-side partials), idf =
    * ln((N+1)/(df+1)) + 1 (smoothed, sklearn-style), score = tf · idf.
    * Returns (id, term, tf, df, tfidf) — downstream callers rank or pivot
    * as needed. Both aggregations shuffle (term) or (id, term) keys only.
    */
  def tfIdf(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = df.count()
    // fan out before the split+explode (r14: q41 measured 22.6x on a
    // one-row-group source before this)
    val terms = fanOut(df).select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "term")
      .withColumn("tfidf",
        col("tf") * (log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0))
      .select("id", "term", "tf", "df", "tfidf")
  }

  /** OpenRefine-style key-collision fingerprint: lowercase, strip
    * non-alphanumerics, split, dedupe, sort, re-join. Two documents with the
    * same fingerprint are permutations/duplications of the same vocabulary.
    */
  def fingerprint(text: Column): Column =
    array_join(
      array_sort(array_distinct(filter(
        split(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +"),
        t => length(t) > 0))),
      " ")

  /** Rolling hash of the token stream — an order-sensitive document
    * signature, unlike [[fingerprint]]. Chained xxhash64(acc, token) rather
    * than a polynomial accumulator: same streaming shape, no ANSI-mode
    * 64-bit multiply overflow.
    */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, w) => xxhash64(acc, w))

  /** Gopher-style repetition signals, per document:
    *
    *  - `dup_token_frac` — fraction of token occurrences beyond each
    *    token's first (1 − distinct/total): machine-generated and
    *    boilerplate text repeats vocabulary far more than prose;
    *  - `top_2gram_frac` — occurrences of the single most frequent word
    *    bigram over all bigram slots: the classic repeated-phrase signal
    *    (Rae et al. 2021 §A1.1 use the same family of thresholds).
    *
    * The distinct-count side is a per-row HOF (`array_distinct`, no
    * shuffle); the bigram side explodes to (id, gram) and aggregates —
    * shuffling 8-byte ids plus short gram strings, the same shape as
    * [[tfIdf]]. Documents with < 2 tokens get `top_2gram_frac` 0.
    *
    * @return (id, n_tokens, dup_token_frac, top_2gram_frac)
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = filter(tokens(col(textCol)), t => length(t) > 0)
    // fan out before the split + per-row gram assembly (r13 class)
    val base = fanOut(df).select(col(idCol).as("id"), toks.as("__t"))
      .withColumn("n_tokens", size(col("__t")).cast("long"))
      .withColumn("dup_token_frac",
        lit(1.0) - size(array_distinct(col("__t"))).cast("double") /
          greatest(col("n_tokens"), lit(1L)))
    val grams = base
      .filter(col("n_tokens") >= 2)
      .select(col("id"), explode(transform(
        sequence(lit(1), (col("n_tokens") - 1).cast("int")),
        i => concat_ws(" ", element_at(col("__t"), i.cast("int")),
          element_at(col("__t"), (i + 1).cast("int"))))).as("gram"))
    val top = grams.groupBy("id", "gram").agg(count(lit(1)).as("__c"))
      .groupBy("id").agg(max("__c").as("__top"))
    base.join(top, Seq("id"), "left")
      .withColumn("top_2gram_frac",
        coalesce(col("__top").cast("double") / (col("n_tokens") - 1), lit(0.0)))
      .select("id", "n_tokens", "dup_token_frac", "top_2gram_frac")
  }

  /** Sliding-stride token windowing — the standard pretraining chunk
    * layout: each document's whitespace tokens explode into fixed-size
    * windows starting every `stride` tokens (stride < windowSize gives
    * the usual overlap so no span is ever cut at only one boundary).
    * Pure projection + one generator: starts = sequence(0, n−1, stride),
    * window = slice — no shuffle, no state, chunk ids reproducible on
    * any partitioning. The tail window may be shorter; windows under
    * `minTokens` are dropped.
    *
    * @return one row per window: (idCol, chunk_id, n_tokens, chunk)
    */
  def slidingChunks(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, windowSize: Int, stride: Int,
      minTokens: Int = 1): org.apache.spark.sql.DataFrame = {
    require(windowSize >= 1 && stride >= 1 && stride <= windowSize
      && minTokens >= 1,
      s"need 1 <= stride <= windowSize and minTokens >= 1, got " +
        s"windowSize=$windowSize stride=$stride minTokens=$minTokens")
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    val windows = transform(
      sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(stride)),
      st => slice(toks, st + 1, lit(windowSize)))
    // split + window slicing + join-back is the per-row cost — fan out
    // so a one-row-group source doesn't run the corpus on one core
    // (measured: the 100x scale row was 64x before, ~6x after)
    fanOut(df).select(col(idCol), posexplode(windows).as(Seq("chunk_id", "__w")))
      .filter(size(col("__w")) >= minTokens)
      .select(col(idCol), col("chunk_id"),
        size(col("__w")).as("n_tokens"),
        array_join(col("__w"), " ").as("chunk"))
  }

  /** Sentence-boundary chunking for training-data preparation: split a
    * document on sentence ends, then greedily pack consecutive sentences
    * into chunks of at most `maxTokens` whitespace tokens (a sentence
    * longer than the budget forms its own oversized chunk — sentences
    * are never split). Pure per-row higher-order-function fold: no
    * shuffle at all, one generator pass; order inside the document is
    * the array fold order, so chunk ids are reproducible on any
    * partitioning.
    *
    * @return one row per chunk: (idCol, chunk_id, chunk, n_tokens)
    */
  def chunkBySentence(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, maxTokens: Int): org.apache.spark.sql.DataFrame = {
    require(maxTokens >= 1, s"need maxTokens >= 1, got $maxTokens")
    // fan out before the per-row sentence-split fold (r13 class)
    val fanned = fanOut(df)
    val sentences = filter(
      split(col(textCol), "(?<=[.!?])\\s+"), s => s =!= "")
    val acc0 = expr(
      "CAST(array() AS ARRAY<STRUCT<txt: STRING, n: INT>>)")
    val packed = aggregate(sentences, acc0, (acc, sent) => {
      val t = size(filter(split(sent, "\\s+"), w => w =!= ""))
      val last = element_at(acc, -1)
      val fits = size(acc) > 0 && (last.getField("n") + t <= maxTokens)
      when(fits,
        concat(slice(acc, lit(1), size(acc) - 1),
          array(struct(
            concat(last.getField("txt"), lit(" "), sent).as("txt"),
            (last.getField("n") + t).as("n")))))
        .otherwise(concat(acc, array(struct(sent.as("txt"), t.as("n")))))
    })
    fanned.select(col(idCol), posexplode(packed).as(Seq("chunk_id", "ch")))
      .select(col(idCol), col("chunk_id"),
        col("ch.txt").as("chunk"), col("ch.n").as("n_tokens"))
  }

  /** Email pattern shared by redaction and counting — RE2-compatible
    * (no lookaround), so the DuckDB oracle runs the identical regex.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NNN-NNN-NNNN phone shape (the deterministic test-corpus form). */
  val phonePattern = "\\d{3}-\\d{3}-\\d{4}"

  /** PII scrubbing for training corpora: replace emails and
    * NNN-NNN-NNNN phone numbers with redaction tags and count what was
    * removed — a pure projection (regex per row, no shuffle), the
    * standard pre-training scrub pass. Patterns avoid every
    * Java-regex-only feature so downstream engines agree byte-for-byte.
    *
    * @return input plus (redacted, n_emails, n_phones)
    */
  def redactPII(df: org.apache.spark.sql.DataFrame, textCol: String,
      outputCol: String = "redacted"): org.apache.spark.sql.DataFrame = {
    require(!df.columns.contains(outputCol),
      s"output column '$outputCol' already exists")
    val t = col(textCol)
    // fan out before the per-row regex kernels (r14: q199 measured on a
    // one-row-group source, see SCALE.md)
    fanOut(df).withColumn("n_emails", regexp_count(t, lit(emailPattern)))
      .withColumn("n_phones", regexp_count(t, lit(phonePattern)))
      .withColumn(outputCol,
        regexp_replace(regexp_replace(t, emailPattern, "[EMAIL]"),
          phonePattern, "[PHONE]"))
  }

  /** Hashing-trick term frequencies (Weinberger et al. 2009): tokens map
    * to a FIXED dimension id by hash — the vocabulary-free vectorizer
    * (no level discovery, no dictionary state, collisions accepted).
    * The hash is md5-derived (first 15 hex digits mod dim) so the
    * mapping is engine-reproducible, the content-keyed-split discipline.
    *
    * ONE explode + one (id, dim) aggregation; output is the sparse
    * triplet form downstream models consume.
    *
    * @return (idCol, dim, cnt) — occupied dimensions only
    */
  def hashingTf(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, dim: Int): org.apache.spark.sql.DataFrame = {
    require(dim >= 2, s"need dim >= 2, got $dim")
    val tok = explode(filter(split(col(textCol), "\\s+"), t => t =!= ""))
    // fan out before the split+explode+md5 kernel (r13 class)
    fanOut(df).select(col(idCol), tok.as("__t"))
      .select(col(idCol),
        pmod(conv(substring(md5(col("__t")), 1, 15), 16, 10).cast("long"),
          lit(dim.toLong)).cast("int").as("dim"))
      .groupBy(col(idCol), col("dim"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Skip-gram context pairs (word2vec-style training-pair generation):
    * for every token position, emit (center, context) for contexts
    * within ±window positions, with the standard 1/distance weight.
    * Counts and summed weights aggregate per ordered pair — the corpus
    * co-occurrence table embedding trainers and PMI-style association
    * measures consume (the adjacent-only special case is
    * [[Colloc]]'s bigram table).
    *
    * Pure per-row generator (position × offset explode, bounded by
    * window) + ONE (center, context) aggregation — token-keyed shuffles
    * only.
    *
    * @return (center, context, n_pairs, sum_weight) — sum_weight =
    *         Σ 1/|distance| on a 6-digit grid
    */
  def skipGrams(df: org.apache.spark.sql.DataFrame, textCol: String,
      window: Int): org.apache.spark.sql.DataFrame = {
    require(window >= 1, s"need window >= 1, got $window")
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= "")
    // fan out before the split + position-window generator (r13 class)
    val pairs = fanOut(df)
      .select(toks.as("__t"))
      .select(posexplode(col("__t")).as(Seq("__i", "center")),
        col("__t"))
      .select(col("center"),
        explode(filter(
          transform(sequence(lit(-window), lit(window)), o =>
            // the lower guard matters: a NEGATIVE index would wrap to the
            // array's tail under element_at semantics
            when(o =!= 0 && col("__i") + 1 + o >= 1, struct(
              try_element_at(col("__t"), col("__i") + 1 + o).as("w"),
              abs(o).as("d")))),
          s => s.isNotNull && s.getField("w").isNotNull)).as("__c"))
      .select(col("center"), col("__c.w").as("context"),
        col("__c.d").as("__d"))
    pairs.groupBy("center", "context")
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(lit(1.0) / col("__d")), 6).as("sum_weight"))
  }

  /** ROUGE-N overlap between paired texts — the summarization/
    * generation eval metric (recall-oriented n-gram overlap of a
    * candidate against its reference).
    *
    * Clipped-count convention (the standard one): overlap =
    * Σ_g min(count_ref(g), count_cand(g)) over n-grams g; precision =
    * overlap/|cand grams|, recall = overlap/|ref grams|, F1 their
    * harmonic mean. Tokens split on whitespace.
    *
    * Execution: both sides explode to (pair id, gram) counts and meet in
    * ONE full-outer equi-join keyed by (id, gram) — everything shuffles
    * on the pair id, nothing quadratic, no driver state. Exact integers
    * until the final ratios (6-digit grid).
    *
    * @return (idCol, n_ref, n_cand, overlap, precision, recall, f1)
    */
  def rougeN(df: org.apache.spark.sql.DataFrame, idCol: String,
      refCol: String, candCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    require(n >= 1, s"need n >= 1, got $n")
    def grams(c: Column) = {
      val toks = filter(split(c, "\\s+"), t => t =!= "")
      // sequence(1, 0) is the DESCENDING [1, 0] in Spark, and slice with
      // start 0 throws — short/empty docs must short-circuit to no grams.
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))
    }
    def side(c: String, cnt: String) = df
      .select(col(idCol), explode(grams(col(c))).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as(cnt))
    val joined = side(refCol, "rc")
      .join(side(candCol, "cc"), Seq(idCol, "g"), "full_outer")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("rc"), lit(0L))).as("n_ref"),
        sum(coalesce(col("cc"), lit(0L))).as("n_cand"),
        sum(least(coalesce(col("rc"), lit(0L)),
          coalesce(col("cc"), lit(0L)))).as("overlap"))
    joined.select(col(idCol), col("n_ref"), col("n_cand"), col("overlap"),
      round(when(col("n_cand") > 0,
        col("overlap").cast("double") / col("n_cand")), 6).as("precision"),
      round(when(col("n_ref") > 0,
        col("overlap").cast("double") / col("n_ref")), 6).as("recall"),
      round(when(col("n_ref") > 0 && col("n_cand") > 0 &&
          col("overlap") > 0,
        lit(2.0) * (col("overlap").cast("double") / col("n_cand")) *
          (col("overlap").cast("double") / col("n_ref")) /
          (col("overlap").cast("double") / col("n_cand") +
            col("overlap").cast("double") / col("n_ref")))
        .otherwise(when(col("n_ref") > 0 && col("n_cand") > 0, lit(0.0))),
        6).as("f1"))
  }

  /** Zipf-law fit of the token frequency distribution: OLS slope of
    * ln(count) on ln(rank) over the vocabulary — natural corpora sit
    * near −1, and the deviation is a cheap quality/synthetic-data signal.
    *
    * Ranks use the (count desc, token asc) total order (deterministic
    * ties); the regression is closed-form from five sums over the
    * VOCABULARY frame. The rank window is a single ordered pass over
    * that frame — vocabulary-sized, not data-sized (the q148/q180
    * category-frame caveat; at web scale feed it `topK` first).
    *
    * @return one row: (n_tokens, vocab, slope, intercept, r2) — slope on
    *         a 6-digit grid
    */
  def zipfFit(df: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame = {
    // fan out before the split+explode (r13 class)
    val toks = fanOut(df)
      .select(explode(split(col(textCol), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("token"))
    val xy = vocab.withColumn("__r", row_number().over(w))
      .select(log(col("__r").cast("double")).as("x"),
        log(col("cnt").cast("double")).as("y"), col("cnt"))
    val s = xy.agg(count(lit(1)).as("v"), sum("cnt").as("n_tokens"),
      sum("x").as("sx"), sum("y").as("sy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"), sum(col("y") * col("y")).as("syy"))
    s.select(col("n_tokens"), col("v").as("vocab"),
      round((col("v") * col("sxy") - col("sx") * col("sy")) /
        (col("v") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
      round((col("sy") - (col("v") * col("sxy") - col("sx") * col("sy")) /
        (col("v") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
        col("v"), 6).as("intercept"),
      round(pow(col("v") * col("sxy") - col("sx") * col("sy"), 2) /
        ((col("v") * col("sxx") - col("sx") * col("sx")) *
          (col("v") * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
  }

  /** Flesch readability scoring — the classic text-quality feature for
    * corpus curation (too-hard and too-trivial documents both get
    * filtered). Counts are RE2-compatible regex counts so the arithmetic
    * is engine-reproducible:
    *
    *  - words      = matches of `[A-Za-z]+`
    *  - sentences  = matches of `[.!?]+` (floored at 1 so headline-style
    *    fragments still score)
    *  - syllables  = matches of `[aeiouyAEIOUY]+` — the standard
    *    vowel-group heuristic, summed over the text (groups never span a
    *    word boundary, so this equals the per-word sum)
    *
    * Flesch reading ease = 206.835 − 1.015·W/S − 84.6·Syl/W;
    * Flesch–Kincaid grade = 0.39·W/S + 11.8·Syl/W − 15.59. Pure
    * projection — no shuffle; scores are fixed-order double expressions
    * on a 4-digit grid, null when the text has no words.
    */
  def readability(df: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    val w = regexp_count(t, lit("[A-Za-z]+"))
    val s = greatest(regexp_count(t, lit("[.!?]+")), lit(1))
    val syl = regexp_count(t, lit("[aeiouyAEIOUY]+"))
    val wps = w.cast("double") / s.cast("double")
    val spw = syl.cast("double") / w.cast("double")
    // fan out before the per-row regex-count kernels (r13 class)
    fanOut(df).withColumn("n_words", w)
      .withColumn("n_sentences", s)
      .withColumn("n_syllables", syl)
      .withColumn("flesch", when(w > 0, round(
        lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 4)))
      .withColumn("fk_grade", when(w > 0, round(
        lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 4)))
  }

  /** Named-pattern scan: one count column per (name, regex) — the
    * PII/markup/leak-screening primitive of a corpus pipeline (emails,
    * URLs, phone-ish digit runs, secrets-looking tokens…). Pure
    * projection via `regexp_count` — codegen'd, no shuffle, full scan
    * speed. Keep patterns RE2-compatible (no backreferences) so counts
    * reproduce across engines.
    *
    * @param patterns (outputColumn, regex) pairs
    */
  def patternCounts(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[(String, String)]): DataFrame = {
    require(patterns.nonEmpty, "need at least one pattern")
    // fan out before the per-row multi-pattern regex counts (r13 class)
    fanOut(df).select(col(idCol) +: patterns.map { case (name, re) =>
      regexp_count(col(textCol), lit(re)).as(name) }: _*)
  }

  /** Redaction: replace every match of each named pattern with its
    * `<TAG>` placeholder, applied in sequence — [[patternCounts]]'s
    * remediation twin (count first, redact before release). Pure
    * regexp_replace chain — codegen'd, no shuffle. Earlier patterns
    * win overlaps (their tags are no longer matchable text).
    *
    * @param patterns (tag, regex) — matches become `<TAG>`
    * @return input + `<outputCol>` + `n_redacted` (Σ of each pattern's
    *         matches in the ORIGINAL text — an upper bound on actual
    *         replacements when patterns overlap)
    */
  def redact(df: DataFrame, textCol: String,
      patterns: Seq[(String, String)],
      outputCol: String = "redacted"): DataFrame = {
    require(patterns.nonEmpty, "need at least one pattern")
    val out = patterns.foldLeft(col(textCol)) { case (acc, (tag, re)) =>
      regexp_replace(acc, re, s"<${tag.toUpperCase}>")
    }
    val total = patterns.map { case (_, re) =>
      regexp_count(col(textCol), lit(re)) }.reduce(_ + _)
    // fan out before the per-row multi-pattern regex kernels (r13 class)
    fanOut(df).withColumn(outputCol, out).withColumn("n_redacted", total)
  }

  /** Canonical text normalization for dedup keys and training text:
    * lowercase → punctuation/symbols to spaces → whitespace runs
    * collapsed → trimmed. The preprocessing step before exact dedup,
    * shingling, or tokenizer training, kept deliberately simple and
    * engine-reproducible (ASCII-safe regex classes, no locale-dependent
    * case folding beyond `lower`).
    *
    * Pure projection — codegen'd, no shuffle.
    *
    * @return input + `<outputCol>` (normalized text) + `norm_len`
    */
  def normalizeText(df: DataFrame, textCol: String,
      outputCol: String = "norm_text"): DataFrame = {
    val cleaned = trim(regexp_replace(regexp_replace(lower(col(textCol)),
      "[^a-z0-9\\s]", " "), "\\s+", " "))
    // fan out before the per-row regex rewrite (r13 class)
    fanOut(df).withColumn(outputCol, cleaned)
      .withColumn("norm_len", length(col(outputCol)))
  }

  /** Corpus-trained bigram language-model score per document — the
    * perplexity-proxy quality filter (the CCNet/Gopher pipelines score
    * documents under an LM and drop the tail; this is the self-trained
    * bigram form, no external model needed):
    *
    *   P(w_i | w_{i−1}) = (c(w_{i−1}, w_i) + k) / (ctx(w_{i−1}) + k·V)
    *   avg_logprob(doc) = mean over the doc's bigram POSITIONS of ln P
    *   ppl(doc) = exp(−avg_logprob)
    *
    * with bigram/context counts over the WHOLE corpus, V = corpus
    * vocabulary size, add-k smoothing. Low avg_logprob = improbable
    * token sequences (gibberish, boilerplate soup, wrong-language
    * text).
    *
    * Execution: tokens travel as xxhash64 longs (strings never
    * shuffle); one bigram explode (linear), two keyed count
    * aggregations, one distinct for V, one hash join of doc bigrams
    * against the count tables, one per-doc aggregation. Every count is
    * an exact integer, so the score is deterministic on any
    * partitioning.
    *
    * @return per doc: (idCol, n_tokens, n_bigrams, avg_logprob, ppl) —
    *         avg_logprob/ppl null for docs with fewer than 2 tokens
    */
  def ngramLmScore(df: DataFrame, idCol: String, textCol: String,
      addK: Double = 1.0): DataFrame = {
    require(addK > 0, s"need addK > 0, got $addK")
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= "")
    val base = fanOut(df).select(col(idCol).as("__id"), toks.as("__t"))
    val bigrams = base.select(col("__id"),
      explode(when(size(col("__t")) < 2,
          array().cast("array<struct<hp:bigint,hc:bigint>>"))
        .otherwise(transform(sequence(lit(1), size(col("__t")) - 1),
          i => struct(xxhash64(element_at(col("__t"), i)).as("hp"),
            xxhash64(element_at(col("__t"), i + 1)).as("hc")))))
        .as("__bg"))
      .select(col("__id"), col("__bg.hp").as("__hp"),
        col("__bg.hc").as("__hc"))
    val bgCount = bigrams.groupBy("__hp", "__hc")
      .agg(count(lit(1)).as("__cbg"))
    val ctxCount = bigrams.groupBy("__hp")
      .agg(count(lit(1)).as("__cctx"))
    val v = base.select(explode(col("__t")).as("__w"))
      .select(xxhash64(col("__w")).as("__h")).distinct().count()
    val scored = bigrams
      .join(bgCount, Seq("__hp", "__hc"))
      .join(ctxCount, Seq("__hp"))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_bigrams"),
        avg(log((col("__cbg") + addK) /
          (col("__cctx") + lit(addK * v)))).as("avg_logprob"))
    base.select(col("__id"), size(col("__t")).cast("long").as("n_tokens"))
      .join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_tokens"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_logprob"),
        exp(-col("avg_logprob")).as("ppl"))
  }

  /** DEFLATE compression-ratio quality signal — the model-free
    * repetition detector big-corpus filters run alongside
    * [[repetitionStats]] and the LM scores (Gopher/RefinedWeb lineage):
    * boilerplate and template spam compress far below natural prose, so
    * a low `ratio` flags low-information text without tokenizing
    * anything. zlib at the fixed default level over UTF-8 bytes,
    * deflater reused per partition — `mapPartitions` because no
    * Catalyst expression exposes a codec (the [[Multimodal]] byte-level
    * precedent; the driver gate is rows-only for the same structural
    * reason: no DuckDB analog of the JVM's zlib stream).
    *
    * @return (idCol, n_bytes, n_deflate, ratio) — ratio =
    *         n_deflate/n_bytes on the 6-digit grid, null for empty text
    */
  def compressionSignals(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"),
        coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, false)
        val buf = new Array[Byte](16384)
        it.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var n = 0L
          while (!deflater.finished()) n += deflater.deflate(buf)
          val ratio = if (bytes.nonEmpty)
            Some(BigDecimal(n.toDouble / bytes.length)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          else None
          (id, bytes.length.toLong, n, ratio)
        }
      }
      .toDF(idCol, "n_bytes", "n_deflate", "ratio")
  }
}
