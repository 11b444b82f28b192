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
    df.select(explode(split(col(textCol), "\\s+")).as("w0"))
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
  def train(df: DataFrame, textCol: String, vocabSize: Int = 150,
      maxPieceLen: Int = 3, maxWordLen: Int = 8, minCount: Int = 2,
      emIters: Int = 2): DataFrame = {
    require(vocabSize >= 1 && maxPieceLen >= 1 && maxWordLen >= maxPieceLen
      && minCount >= 1 && emIters >= 1,
      s"bad config: vocabSize=$vocabSize maxPieceLen=$maxPieceLen " +
        s"maxWordLen=$maxWordLen minCount=$minCount emIters=$emIters")
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
      val singles = seeds.filter(length(col("piece")) === 1)
      val vocab0 = top.unionByName(singles).groupBy("piece")
        .agg(max("cnt").as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      seeds.unpersist(blocking = false)
      val tot0 = vocab0.values.sum
      var probs: Map[String, Double] =
        vocab0.map { case (p, c) => p -> c.toDouble / tot0.toDouble }

      var counts: Map[String, Long] = Map.empty
      for (_ <- 1 to emIters) {
        counts = eStepMicro(w, probs, maxWordLen, maxPieceLen)
        val tot = counts.values.sum
        probs = counts.map { case (p, c) => p -> c.toDouble / tot.toDouble }
      }
      import spark.implicits._
      val totD = counts.values.sum.toDouble
      counts.toSeq
        .map { case (p, c) => (p, c, c.toDouble / totD) }
        .toDF("piece", "weight_micro", "p")
        .orderBy(col("weight_micro").desc, col("piece"))
    } finally w.unpersist(blocking = false)
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
