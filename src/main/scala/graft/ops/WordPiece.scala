package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer — the BERT-lineage member completing this repo's
  * tokenizer-training triad next to [[Bpe]] (GPT-2 lineage, raw-count
  * merges) and [[Unigram]] (Llama/T5 lineage, EM over a substring
  * vocabulary). Training (Schuster & Nakajima 2012, as implemented in
  * the HuggingFace `tokenizers` WordPiece trainer) is BPE's loop with a
  * LIKELIHOOD score: each round merges the adjacent symbol pair
  * maximizing count(ab) / (count(a) · count(b)) — the corpus
  * log-likelihood gain of fusing the pair under a unigram factorization
  * — instead of the raw pair count. Non-initial symbols carry the `##`
  * continuation prefix; a merge of (a, ##b) produces a##b-without-##,
  * i.e. `a + b.stripPrefix("##")`.
  *
  * Scale shape (the [[Bpe]] discipline): the corpus collapses ONCE to
  * the distinct-word frame (word, n) — vocabulary-sized, never
  * corpus-sized — and every round runs three bounded shapes on it: one
  * adjacent-pair explode + ONE (a, b) aggregation, one symbol explode +
  * ONE symbol aggregation, and a single argmax row to the driver
  * (score desc, pair asc — a total order, so the learned merges are
  * deterministic and partition-invariant). The merge applies as a
  * codegen'd HOF fold; rounds are merge-count-bounded.
  *
  * Exact-replay discipline: the score is ONE pinned float expression —
  * CAST(cnt) / (CAST(ca) · CAST(cb)) — over exact integer counts, so
  * both engines compute identical IEEE754 bits and the argmax ordering
  * replays verbatim; no score ever crosses an aggregation.
  *
  * Greedy encoding ([[segmentWordsGreedy]]) is HuggingFace's
  * longest-match-first walk: at each position take the LONGEST vocab
  * piece (`##`-prefixed when non-initial); any position with no match
  * collapses the whole word to `[UNK]` — exactly the reference
  * WordPiece semantics, as a pure projection over named lattice
  * columns (the [[Unigram.segmentWordsViterbi]] staging pattern).
  */
object WordPiece {

  // split(s, "") leaves a trailing empty string (Java split, limit -1)
  private def chars(text: Column): Column =
    filter(split(text, ""), s => s =!= "")

  /** Word → WordPiece start symbols: first char bare, the rest
    * `##`-prefixed.
    */
  private def toSymbols(word: Column): Column =
    transform(chars(word), (c, i) =>
      when(i === 0, c).otherwise(concat(lit("##"), c)))

  /** Collapse a text column to the (syms, n) distinct-word frame. */
  private def vocabFrame(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(toSymbols(col("w")).as("syms"), col("n"))

  /** One merge (a, b) → a + b-without-## applied as a left fold —
    * leftmost-first, non-overlapping (the [[Bpe.applyMerge]] fold with
    * the WordPiece continuation-prefix fusion rule).
    */
  private def applyMerge(syms: Column, a: String, b: String): Column = {
    // the merge pair enters as stable_lits: every merge round shares ONE
    // compiled projection stage instead of recompiling the higher-order
    // fold per (a, b) (r14)
    import graft.functions.stableLitS
    val merged = stableLitS(a + b.stripPrefix("##"))
    aggregate(syms,
      expr("CAST(array() AS ARRAY<STRING>)"),
      (acc, s) => {
        val prev = try_element_at(acc, lit(-1))
        when(prev === stableLitS(a) && s === stableLitS(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
          .otherwise(concat(acc, array(s)))
      })
  }

  /** Learn `numMerges` likelihood-scored merge rules.
    *
    * @return (rank, left, right, pair_count) — rank is 1-based merge
    *         order; fewer rows when no pair repeats (pair_count < 2)
    */
  def learnMerges(df: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"need numMerges >= 1, got $numMerges")
    val spark = df.sparkSession
    graft.plans.GraftExtensions.ensureRegistered(spark)
    var v = vocabFrame(df, textCol).persist()
    v.count()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var exhausted = false
    for (rank <- 1 to numMerges if !exhausted) {
      val pairs = v
        .select(col("n"), col("syms"), posexplode(slice(col("syms"), lit(1),
          greatest(size(col("syms")) - 1, lit(0)))))
        .select(col("n"), col("col").as("a"),
          element_at(col("syms"), col("pos") + 2).as("b"))
        .filter(col("b").isNotNull)
        .groupBy("a", "b").agg(sum("n").as("cnt"))
      val symCnt = v
        .select(col("n"), explode(col("syms")).as("s"))
        .groupBy("s").agg(sum("n").as("sc"))
      // likelihood score over exact integer counts, ONE pinned float
      // expression (cnt / (ca·cb)) — bit-identical in any engine; the
      // argmax row is the ONLY driver value (score desc, pair asc)
      val top = pairs
        .join(symCnt.select(col("s").as("a"), col("sc").as("ca")), "a")
        .join(symCnt.select(col("s").as("b"), col("sc").as("cb")), "b")
        .filter(col("cnt") >= 2)
        .withColumn("score", col("cnt").cast("double") /
          (col("ca").cast("double") * col("cb").cast("double")))
        .orderBy(col("score").desc, col("a"), col("b"))
        .head(1)
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (top.head.getAs[String]("a"),
          top.head.getAs[String]("b"), top.head.getAs[Long]("cnt"))
        merges += ((rank, a, b, cnt))
        val next = v.select(applyMerge(col("syms"), a, b).as("syms"),
          col("n")).persist()
        next.count()
        v.unpersist(blocking = false)
        v = next
      }
    }
    v.unpersist(blocking = false)
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** Greedy longest-match-first segmentation of a DISTINCT-WORD frame —
    * the WordPiece encoder (HuggingFace `WordPiece.tokenize` semantics):
    * at each position consume the LONGEST vocab piece, `##`-prefixed
    * when non-initial; a position with NO matching piece collapses the
    * whole word to `unk`. Words longer than `maxWordLen` are truncated
    * (the [[Unigram]] lattice-bounding convention).
    *
    * Pure projection: per-position longest-match lengths land in one
    * array column, the greedy walk is `maxWordLen` named cursor
    * columns, tokens substring off the cursor trail — no UDF, no
    * shuffle, no state.
    *
    * @param words frame with `wordCol`
    * @return input plus `outputCol`: array<string> of pieces in order
    */
  def segmentWordsGreedy(words: DataFrame, wordCol: String,
      vocab: Seq[String], maxPieceLen: Int = 8, maxWordLen: Int = 12,
      unk: String = "[UNK]", outputCol: String = "tokens"): DataFrame = {
    require(maxPieceLen >= 1 && maxWordLen >= maxPieceLen,
      s"bad config: maxPieceLen=$maxPieceLen maxWordLen=$maxWordLen")
    require(vocab.nonEmpty, "empty vocab")
    require(wordCol == "w" || !words.columns.contains("w"),
      "segmentWordsGreedy stages the truncated word as column 'w' — " +
        s"rename the existing 'w' column (wordCol=$wordCol)")
    val reserved = words.columns.filter(c => c == outputCol ||
      c == "m_arr" || c.matches("(s_\\d+|mk_\\d+|tok_\\d+)"))
    require(reserved.isEmpty,
      s"segmentWordsGreedy stages internal columns that clash with " +
        s"input columns ${reserved.mkString(", ")} — rename them")
    // early exit on the TRUE max word length — same discipline as the
    // unigram lattice: the greedy-cursor unroll width tracks the data
    val effWordLen = {
      val r = words.agg(max(least(length(col(wordCol)),
        lit(maxWordLen)))).head()
      if (r.isNullAt(0)) 1 else math.max(1, r.getInt(0))
    }
    val vm = typedLit(vocab.map(_ -> 1).toMap)
    val passthru = words.columns.toSeq.map(col)
    var cur = words.withColumn("w", substring(col(wordCol), 1, effWordLen))
    val L = length(col("w"))
    // piece at 0-based position j, length l: ## prefix when j > 0
    def pieceAt(j: Int, l: Int): Column =
      if (j == 0) substring(col("w"), 1, l)
      else concat(lit("##"), substring(col("w"), j + 1, l))
    // per-position longest match: null when nothing in vocab matches
    def matchLen(j: Int): Column =
      (math.min(maxPieceLen, effWordLen - j) to 1 by -1).foldLeft(
        lit(null).cast("int")) { (acc, l) =>
        coalesce(acc,
          when(L >= j + l && element_at(vm, pieceAt(j, l)).isNotNull,
            lit(l)))
      }
    cur = cur.withColumn("m_arr",
      array((0 until effWordLen).map(matchLen): _*))
    // greedy cursor walk: s_0 = 0; s_k = s_{k-1} + m_arr[s_{k-1}+1]
    // while s_{k-1} < L — a null match poisons the rest of the trail
    // (the whole-word [UNK] rule); a finished cursor carries forward
    cur = cur.withColumn("s_0", lit(0))
    for (k <- 1 to effWordLen) {
      val prev = col(s"s_${k - 1}")
      cur = cur
        .withColumn(s"mk_$k",
          when(prev.isNotNull && prev < L,
            element_at(col("m_arr"), prev + 1)))
        .withColumn(s"s_$k",
          when(prev.isNotNull && prev < L, prev + col(s"mk_$k"))
            .otherwise(prev))
        .withColumn(s"tok_$k",
          when(col(s"mk_$k").isNotNull,
            when(prev === 0, col("w").substr(lit(1), col(s"mk_$k")))
              .otherwise(concat(lit("##"),
                col("w").substr(prev + 1, col(s"mk_$k"))))))
    }
    // success iff the final cursor reached L; any OOV position nulled it
    val toks = filter(
      array((1 to effWordLen).map(k => col(s"tok_$k")): _*),
      t => t.isNotNull)
    cur = cur.withColumn(outputCol,
      when(col(s"s_$effWordLen").isNotNull, toks)
        .otherwise(array(lit(unk))))
    cur.select(passthru :+ col(outputCol): _*)
  }

  /** Tokenize a text column through the trained-vocab dictionary join —
    * the [[Unigram.tokenize]] fan-out shape: the greedy walk runs ONCE
    * per DISTINCT word, tokens rejoin the corpus in text order through
    * a positional struct-sort. At 100 TB the word frame is
    * natural-language-bounded; the corpus-sized side only explodes,
    * joins and re-assembles.
    */
  def tokenize(df: DataFrame, textCol: String, vocab: Seq[String],
      maxPieceLen: Int = 8, maxWordLen: Int = 12, unk: String = "[UNK]",
      outputCol: String = "tokens"): DataFrame = {
    val texts = df.select(col(textCol).as("__txt"))
      .filter(col("__txt").isNotNull).distinct()
    val exploded = texts.select(col("__txt"),
      posexplode(filter(split(col("__txt"), "\\s+"), w => length(w) > 0))
        .as(Seq("__pos", "__w0")))
      .select(col("__txt"), col("__pos"),
        substring(col("__w0"), 1, maxWordLen).as("__w"))
    val dict = segmentWordsGreedy(
      exploded.select(col("__w")).distinct(), "__w", vocab,
      maxPieceLen, maxWordLen, unk, outputCol = "__toks")
    val perText = exploded.join(dict, "__w")
      .groupBy("__txt")
      .agg(flatten(array_sort(collect_list(struct(col("__pos"),
        col("__toks")))).getField("__toks")).as(outputCol))
    df.join(perText, col(textCol) === col("__txt"), "left")
      .drop("__txt")
      .withColumn(outputCol,
        coalesce(col(outputCol), array().cast("array<string>")))
  }
}
