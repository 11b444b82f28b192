package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (Kudo 2018, "Subword Regularization:
  * Improving Neural Network Translation Models with Multiple Subword
  * Candidates" §3) — the SentencePiece-lineage counterpart to [[Bpe]]:
  * seed a candidate-substring vocabulary, then run EM where the E-step
  * computes each piece's EXPECTED count over all segmentations of every
  * word (forward–backward over the segmentation lattice) and the M-step
  * renormalizes piece probabilities.
  *
  * Scale shape (the [[Bpe]] discipline): the corpus collapses ONCE to
  * the distinct-word frame (word, n) — vocabulary-sized, never
  * corpus-sized — and each EM round is a PURE PROJECTION over that
  * frame: the piece→probability map rides along as a plan literal
  * (vocab-bounded, like [[Quantize]] codebooks and [[Cluster.kmeans]]
  * centroids), the per-word forward/backward recurrences are chained
  * column expressions (no UDF, no per-word state), and ONE piece-keyed
  * aggregation produces the next round's counts. The only collects are
  * vocab-sized model state.
  *
  * Exact-replay discipline (gates this in SQL, hash-equality):
  *  - every float chain (α, β, posterior) is written with a PINNED
  *    association order, identical in the SQL oracle;
  *  - per-position expected counts are quantized to integer micro-units
  *    BEFORE any cross-row summation, so aggregation order never
  *    matters;
  *  - M-step probabilities are exact ratios of those integer totals, so
  *    float divergence cannot accumulate across rounds.
  *
  * Words are whitespace tokens truncated to `maxWordLen` chars (so the
  * lattice depth is bounded and the oracle's unrolled recurrences stay
  * finite); candidate pieces are all substrings up to `maxPieceLen`.
  */
object Unigram {

  /** Vocab-bounded trained state: piece → probability, plus the integer
    * micro-count evidence behind it.
    */
  final case class UnigramModel(probs: Map[String, Double],
      countsMicro: Map[String, Long])

  private def words(df: DataFrame, textCol: String,
      maxWordLen: Int): DataFrame =
    // fan out before the split+explode (one-row-group source = one core)
    fanOut(df).select(explode(split(col(textCol), "\\s+")).as("w0"))
      .filter(length(col("w0")) > 0)
      .select(substring(col("w0"), 1, maxWordLen).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))

  /** All lattice positions (j, i): 0 <= j < i <= maxWordLen,
    * i − j <= maxPieceLen. Guards against short words happen per-use
    * (a substring past the word end would silently ALIAS a shorter
    * piece — e.g. substr("ab", 2, 2) = "b" — so every position is
    * validity-checked against length(w) >= i).
    */
  private def positions(maxWordLen: Int, maxPieceLen: Int): Seq[(Int, Int)] =
    for {
      i <- 1 to maxWordLen
      j <- math.max(0, i - maxPieceLen) until i
    } yield (j, i)

  private def pieceAt(j: Int, i: Int): Column =
    substring(col("w"), j + 1, i - j)

  /** Seed candidate counts: every (j, i) occurrence of every substring,
    * weighted by word frequency — exact integers.
    */
  private def seedCounts(w: DataFrame, maxWordLen: Int,
      maxPieceLen: Int): DataFrame = {
    val occs = positions(maxWordLen, maxPieceLen).map { case (j, i) =>
      when(length(col("w")) >= i, pieceAt(j, i))
    }
    w.select(col("n"), explode(array(occs: _*)).as("piece"))
      .filter(col("piece").isNotNull)
      .groupBy("piece").agg(sum("n").as("cnt"))
  }

  /** Train a unigram LM over `textCol`.
    *
    * @return per-piece final state: (piece, weight_micro, p) — the last
    *         E-step's integer micro-count total and the exact-ratio
    *         probability it implies — ordered (weight_micro DESC, piece),
    *         pieces whose expected count quantized to zero excluded.
    */
  /** @param pruneTo if set, a Kudo prune step runs after the first
    *                 `emIters` rounds: keep the top `pruneTo` MULTI-char
    *                 pieces by (count desc, piece) plus ALL single chars
    *                 (coverage), then run `postPruneIters` more EM rounds
    */
  def train(df: DataFrame, textCol: String, vocabSize: Int = 150,
      maxPieceLen: Int = 3, maxWordLen: Int = 8, minCount: Int = 2,
      emIters: Int = 2, pruneTo: Option[Int] = None,
      postPruneIters: Int = 2): DataFrame = {
    require(vocabSize >= 1 && maxPieceLen >= 1 && maxWordLen >= maxPieceLen
      && minCount >= 1 && emIters >= 1 && pruneTo.forall(_ >= 1)
      && postPruneIters >= 1,
      s"bad config: vocabSize=$vocabSize maxPieceLen=$maxPieceLen " +
        s"maxWordLen=$maxWordLen minCount=$minCount emIters=$emIters " +
        s"pruneTo=$pruneTo postPruneIters=$postPruneIters")
    val spark = df.sparkSession
    val w = words(df, textCol, maxWordLen).persist()
    w.count()
    try {
      // seed vocab: top-by-count candidates over minCount, UNION all
      // single chars (coverage: every word must have a full lattice path)
      val seeds = seedCounts(w, maxWordLen, maxPieceLen).persist()
      val top = seeds
        .filter(col("cnt") >= minCount || length(col("piece")) === 1)
        .orderBy(col("cnt").desc, col("piece")).limit(vocabSize)
      val singles0 = seeds.filter(length(col("piece")) === 1)
      val vocab0 = top.unionByName(singles0).groupBy("piece")
        .agg(max("cnt").as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      seeds.unpersist(blocking = false)
      require(vocab0.nonEmpty,
        "unigram train: corpus has no words (empty or all-whitespace text)")
      val singles = vocab0.keySet.filter(_.length == 1)
      val tot0 = vocab0.values.sum
      var probs: Map[String, Double] =
        vocab0.map { case (p, c) => p -> c.toDouble / tot0.toDouble }

      // singles never drop: a char whose expected count quantizes to 0
      // would otherwise leave later rounds with a ZERO-mass lattice for
      // any word containing it (Z = 0 → NaN) — the SentencePiece
      // always-keep-characters rule, as a 1-micro-unit count floor
      def floored(c: Map[String, Long]): Map[String, Long] =
        c ++ singles.filterNot(c.contains).map(_ -> 1L)
      def normalize(c: Map[String, Long]): Map[String, Double] = {
        val tot = c.values.sum
        c.map { case (p, n) => p -> n.toDouble / tot.toDouble }
      }

      var counts: Map[String, Long] = Map.empty
      for (_ <- 1 to emIters) {
        counts = floored(eStepMicro(w, probs, maxWordLen, maxPieceLen))
        probs = normalize(counts)
      }
      pruneTo.foreach { k =>
        // keep all singles + the top-k multi-char pieces — the
        // deterministic integer stand-in for Kudo's likelihood-loss
        // ranking (expected count IS the piece's likelihood mass here)
        val keptMulti = counts.toSeq.filter(_._1.length > 1)
          .sortBy { case (p, c) => (-c, p) }.take(k).map(_._1).toSet
        counts = counts.filter { case (p, _) =>
          p.length == 1 || keptMulti(p) }
        probs = normalize(counts)
        for (_ <- 1 to postPruneIters) {
          counts = floored(eStepMicro(w, probs, maxWordLen, maxPieceLen))
          probs = normalize(counts)
        }
      }
      import spark.implicits._
      val totD = counts.values.sum.toDouble
      counts.toSeq
        .map { case (p, c) => (p, c, c.toDouble / totD) }
        .toDF("piece", "weight_micro", "p")
        .orderBy(col("weight_micro").desc, col("piece"))
    } finally w.unpersist(blocking = false)
  }

  /** Viterbi segmentation of a DISTINCT-WORD frame under integer
    * micro-nat piece scores — the decode half of the unigram tokenizer
    * (SentencePiece's `encode`; scores are typically
    * round(ln(p)·1e6) of a [[train]]ed model, kept as EXACT integers so
    * the DP — max of integer sums — replays identically in any engine).
    *
    * Best path = argmax Σ scores; ties prefer the SMALLEST split point j
    * at each lattice node (first-max-wins over j ascending —
    * deterministic on any partitioning). Out-of-vocab SINGLE chars get
    * `unkMicro` (so every word segments); multi-char pieces must be in
    * vocab. Pure projection: the same named-column lattice staging as
    * the E-step, plus a bounded backpointer walk — no UDF, no shuffle.
    *
    * @param words frame with `wordCol` (expected ≤ maxWordLen chars —
    *              longer words are truncated like [[train]] does)
    * @param withScore also emit `score_micro`: the best path's total
    *                  integer micro-nat score (the word's LM fit)
    * @return input plus `outputCol`: array<string> of pieces, in order
    */
  def segmentWordsViterbi(words: DataFrame, wordCol: String,
      scoresMicro: Map[String, Long], maxPieceLen: Int = 3,
      maxWordLen: Int = 8, unkMicro: Long = -20000000L,
      outputCol: String = "tokens", withScore: Boolean = false): DataFrame = {
    require(maxPieceLen >= 1 && maxWordLen >= maxPieceLen,
      s"bad config: maxPieceLen=$maxPieceLen maxWordLen=$maxWordLen")
    require(wordCol == "w" || !words.columns.contains("w"),
      "segmentWordsViterbi stages the truncated word as column 'w' — " +
        s"rename the existing 'w' column (wordCol=$wordCol)")
    val reserved = words.columns.filter(c => c == "bp_arr" ||
      c == outputCol || c.matches("(sc_\\d+_\\d+|v_\\d+|e_\\d+)"))
    require(reserved.isEmpty,
      s"segmentWordsViterbi stages internal columns that clash with " +
        s"input columns ${reserved.mkString(", ")} — rename them")
    // early exit on the TRUE max word length (the Hmm.viterbiDecode
    // discipline): one cheap scalar agg caps the unrolled lattice /
    // backpointer width, so the generated expression tree tracks the
    // data, not the declared bound
    val effWordLen = {
      val r = words.agg(max(least(length(col(wordCol)),
        lit(maxWordLen)))).head()
      if (r.isNullAt(0)) 1 else math.max(1, r.getInt(0))
    }
    val sm = typedLit(scoresMicro)
    val pos = positions(effWordLen, maxPieceLen)
    val passthru = words.columns.toSeq.map(col)
    var cur = words.withColumn("w", substring(col(wordCol), 1, effWordLen))
    // edge scores: vocab lookup; OOV single chars fall back to unkMicro,
    // OOV multi-char pieces have no edge (null)
    cur = cur.select((cur.columns.toSeq.map(col) ++ pos.map { case (j, i) =>
      val hit = element_at(sm, pieceAt(j, i))
      when(length(col("w")) >= i,
        if (i - j == 1) coalesce(hit, lit(unkMicro)) else hit)
        .as(s"sc_${j}_$i")
    }): _*)
    // DP: v(i) = struct(best score, argmax j) — fold over j ASCENDING
    // with strict >, so the first maximum (smallest j) wins ties
    def best(j: Int): Column =
      if (j == 0) lit(0L) else col(s"v_$j").getField("b")
    for (i <- 1 to effWordLen) {
      val init = struct(lit(null).cast("long").as("b"),
        lit(-1).cast("int").as("j"))
      val v = (math.max(0, i - maxPieceLen) until i).foldLeft(init) {
        (acc, j) =>
          val cand = best(j) + col(s"sc_${j}_$i")
          when(cand.isNotNull &&
              (acc.getField("b").isNull || cand > acc.getField("b")),
            struct(cand.as("b"), lit(j).cast("int").as("j"))).otherwise(acc)
      }
      cur = cur.withColumn(s"v_$i", v)
    }
    // backpointer walk: boundaries e(0) = L, e(k) = bp(e(k-1)), stopping
    // at 0 — at most effWordLen steps, each a named column
    cur = cur.withColumn("bp_arr",
      array((1 to effWordLen).map(i => col(s"v_$i").getField("j")): _*))
    cur = cur.withColumn("e_0", length(col("w")).cast("int"))
    for (k <- 1 to effWordLen) {
      cur = cur.withColumn(s"e_$k",
        when(col(s"e_${k - 1}") > 0,
          element_at(col("bp_arr"), col(s"e_${k - 1}"))))
    }
    // tokens left-to-right: the deepest non-null boundary is 0 (every
    // piece ≥ 1 char), so walking k = L..1 emits first piece first
    val toks = (effWordLen to 1 by -1).map { k =>
      when(col(s"e_$k").isNotNull,
        expr(s"substr(w, e_$k + 1, e_${k - 1} - e_$k)"))
    }
    cur = cur.withColumn(outputCol,
      filter(array(toks: _*), t => t.isNotNull))
    val outCols =
      if (!withScore) passthru :+ col(outputCol)
      else passthru :+ col(outputCol) :+
        (1 to effWordLen).foldLeft(lit(null).cast("long")) { (acc, l) =>
          when(length(col("w")) === l, col(s"v_$l").getField("b"))
            .otherwise(acc)
        }.as("score_micro")
    cur.select(outCols: _*)
  }

  /** Per-document unigram-LM fit score — the model-based quality signal
    * this tokenizer family gives for free: each word's Viterbi best-path
    * micro-nat total, summed over the document (EXACT integers on any
    * partitioning), plus token/piece counts and the per-piece average in
    * nats. Low (very negative) averages flag texts the LM cannot
    * compress: boilerplate, non-language, wrong-language, encoding junk.
    *
    * Dictionary-join shape like [[tokenize]]: the DP runs once per
    * DISTINCT word; the corpus-sized side only explodes, joins and sums.
    *
    * @return (idCol, n_words, n_pieces, score_micro, avg_nats) — docs
    *         with no tokens keep zero counts and a null average
    */
  def scoreDocs(df: DataFrame, idCol: String, textCol: String,
      scoresMicro: Map[String, Long], maxPieceLen: Int = 3,
      maxWordLen: Int = 8, unkMicro: Long = -20000000L): DataFrame = {
    // fan out before the split+explode (one-row-group source = one core)
    val wordsOf = fanOut(df).select(col(idCol),
      explode(filter(split(col(textCol), "\\s+"), w => length(w) > 0))
        .as("__w0"))
      .select(col(idCol), substring(col("__w0"), 1, maxWordLen).as("__w"))
    val dict = segmentWordsViterbi(wordsOf.select("__w").distinct(), "__w",
      scoresMicro, maxPieceLen, maxWordLen, unkMicro,
      outputCol = "__toks", withScore = true)
    // the dict side is the DISTINCT maxWordLen-truncated words — vocab-
    // bounded (it stops growing with the corpus once the language's
    // truncated-word inventory is seen), while wordsOf is corpus-sized.
    // Broadcast it so the corpus side never shuffles for this join; its
    // only shuffle is the per-doc aggregation that follows. Measured at
    // 100x: 22.9 s -> 10.4 s (ratio 11.4 -> 2.7) — the residual the r13
    // fanOut fix left behind was exactly this sort-merge shuffle.
    val per = wordsOf.join(broadcast(dict), "__w")
      .groupBy(idCol).agg(
        count(lit(1)).as("n_words"),
        sum(size(col("__toks"))).as("n_pieces"),
        sum("score_micro").as("score_micro"))
    df.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("score_micro"), lit(0L)).as("score_micro"))
      .withColumn("avg_nats",
        when(col("n_pieces") > 0,
          col("score_micro").cast("double") / col("n_pieces").cast("double")
            / lit(1e6)))
  }

  /** Tokenize a text column with a trained score map: the corpus
    * collapses to the distinct-word frame, [[segmentWordsViterbi]] runs
    * ONCE per distinct word, and a dictionary join fans the tokens back
    * out — at 100 TB the word frame is natural-language-bounded, so the
    * expensive DP never touches the corpus-sized side.
    */
  def tokenize(df: DataFrame, textCol: String,
      scoresMicro: Map[String, Long], maxPieceLen: Int = 3,
      maxWordLen: Int = 8, outputCol: String = "tokens"): DataFrame = {
    // keyed on the TEXT value, not a generated row id: tokens are a pure
    // function of the text, so identical texts share one DP + assembly,
    // and the join-back is deterministic under recomputation (a
    // monotonically_increasing_id key would be re-assigned differently
    // on each side of the self-join under task retry / AQE replans)
    val texts = df.select(col(textCol).as("__txt"))
      .filter(col("__txt").isNotNull).distinct()
    val exploded = texts.select(col("__txt"),
      posexplode(filter(split(col("__txt"), "\\s+"), w => length(w) > 0))
        .as(Seq("__pos", "__w0")))
      .select(col("__txt"), col("__pos"),
        substring(col("__w0"), 1, maxWordLen).as("__w"))
    val dict = segmentWordsViterbi(
      exploded.select(col("__w")).distinct(), "__w", scoresMicro,
      maxPieceLen, maxWordLen, outputCol = "__toks")
    // vocab-bounded dict side (see scoreDocs): broadcast so the
    // distinct-text side only shuffles for its own per-text collapse
    val perText = exploded.join(broadcast(dict), "__w")
      .groupBy("__txt")
      .agg(flatten(array_sort(collect_list(struct(col("__pos"),
        col("__toks")))).getField("__toks")).as(outputCol))
    df.join(perText, col(textCol) === col("__txt"), "left")
      .drop("__txt")
      .withColumn(outputCol,
        coalesce(col(outputCol), array().cast("array<string>")))
  }

  /** One E-step: expected piece counts over all segmentations,
    * forward–backward on the lattice, quantized per POSITION to integer
    * micro-units (round(x·1e6) — bit-identical in any ANSI engine since
    * the unquantized x is an order-pinned float chain), then ONE
    * piece-keyed integer aggregation. Returns the vocab-sized totals.
    */
  private def eStepMicro(w: DataFrame, probs: Map[String, Double],
      maxWordLen: Int, maxPieceLen: Int): Map[String, Long] = {
    val pm = typedLit(probs)
    val pos = positions(maxWordLen, maxPieceLen)
    // every lattice level lands as a NAMED column in a staged projection
    // — naming keeps each α/β computed once (an inlined Column tree
    // recurses into copies of the previous three levels: exponential
    // expression size that blows janino's 64 KB method limit; Catalyst's
    // CollapseProject keeps multi-use non-cheap aliases staged)
    def a(j: Int): Column = if (j == 0) lit(1.0) else col(s"a_$j")
    // p(j,i): probability of the piece at (j, i), null when the word is
    // too short or the piece is out of vocab
    var cur = w.select(col("w") +: col("n") +: pos.map { case (j, i) =>
      when(length(col("w")) >= i, element_at(pm, pieceAt(j, i)))
        .as(s"p_${j}_$i")
    }: _*)
    // forward: a(0) = 1; a(i) = Σ_j a(j)·p(j,i), j ASCENDING,
    // left-associated — adding a coalesced 0.0 is an exact no-op for the
    // non-negative α terms, so "skip missing" ≡ "add 0"
    for (i <- 1 to maxWordLen) {
      val terms = (math.max(0, i - maxPieceLen) until i)
        .map(j => coalesce(a(j) * col(s"p_${j}_$i"), lit(0.0)))
      cur = cur.withColumn(s"a_$i", terms.reduceLeft(_ + _))
    }
    // backward: b(L) = 1 per word — positions past the word's own end
    // carry p = null, so for i > L the recurrence naturally yields 0 and
    // the length CASE picks b at the true L
    cur = cur.withColumn(s"b_$maxWordLen",
      when(length(col("w")) === maxWordLen, lit(1.0)).otherwise(lit(0.0)))
    for (j <- maxWordLen - 1 to 0 by -1) {
      val terms = ((j + 1) to math.min(maxWordLen, j + maxPieceLen))
        .map(i => coalesce(col(s"p_${j}_$i") * col(s"b_$i"), lit(0.0)))
      cur = cur.withColumn(s"b_$j",
        when(length(col("w")) === j, lit(1.0))
          .otherwise(terms.reduceLeft(_ + _)))
    }
    // Z = a(L) — total lattice mass of the word (always > 0: single
    // chars are in-vocab with positive probability)
    cur = cur.withColumn("z",
      (1 to maxWordLen).foldLeft(lit(Double.NaN)) { (acc, l) =>
        when(length(col("w")) === l, col(s"a_$l")).otherwise(acc)
      })
    // per-position posterior mass, quantized BEFORE any shuffle:
    // micro(j,i) = round((((a_j·p)·b_i)/Z)·n·1e6)
    val cells = pos.map { case (j, i) =>
      struct(
        pieceAt(j, i).as("piece"),
        round((((a(j) * col(s"p_${j}_$i")) * col(s"b_$i")) / col("z"))
          * col("n").cast("double") * lit(1e6)).cast("long").as("c"))
    }
    cur.select(explode(array(cells: _*)).as("cell"))
      .select(col("cell.piece").as("piece"), col("cell.c").as("c"))
      .filter(col("c").isNotNull && col("c") > 0L)
      .groupBy("piece").agg(sum("c").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }
}
