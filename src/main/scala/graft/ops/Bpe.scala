package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning — the tokenizer-training primitive
  * of every LLM data pipeline (Sennrich et al. 2016). Learns the top
  * `numMerges` merge rules from a corpus and can tokenize text with them.
  *
  * Scale shape: the corpus first collapses to the DISTINCT-WORD frame
  * (word, count) — vocabulary-sized, never corpus-sized — and every
  * merge round runs on that frame: one explode of adjacent symbol pairs
  * weighted by word count, ONE (pair) aggregation, a single argmax row
  * to the driver (count desc, pair asc — a total order, so the learned
  * merges are deterministic and partition-invariant), and a codegen'd
  * HOF fold that applies the merge to each word's symbol array. Rounds
  * are merge-count-bounded; nothing data-sized ever reaches the driver.
  *
  * Words are whitespace tokens with the standard end-of-word marker `_`
  * appended; symbols start as single characters.
  */
object Bpe {

// split(s, "") leaves a trailing empty string (Java split, limit -1)
  private def toSymbols(text: org.apache.spark.sql.Column) =
    filter(split(text, ""), s => s =!= "")

  /** Collapse a text column to the (word, n) vocabulary frame with each
    * word exploded to its initial character symbols (+ `_` end marker).
    */
  private def vocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(toSymbols(concat(col("w"), lit("_"))).as("syms"), col("n"))

  /** Apply one merge (a, b) → ab to a symbol array: a left fold that
    * joins every adjacent (a, b) occurrence, leftmost-first,
    * non-overlapping — the reference BPE semantics.
    */
  private def applyMerge(syms: org.apache.spark.sql.Column, a: String,
      b: String) = {
    // merge pair as stable_lits: all merge rounds share one compiled
    // projection stage (r14)
    import graft.functions.stableLitS
    val merged = stableLitS(a + b)
    aggregate(syms,
      expr("CAST(array() AS ARRAY<STRING>)"),
      (acc, s) => {
        // try_element_at: null on the empty array (ANSI element_at
        // throws); null === a is null, so the guard resolves false — the
        // EventSeq.walkSteps pattern
        val prev = try_element_at(acc, lit(-1))
        when(prev === stableLitS(a) && s === stableLitS(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
          .otherwise(concat(acc, array(s)))
      })
  }

  /** Learn `numMerges` merge rules.
    *
    * @return (rank, left, right, pair_count) — rank is 1-based merge
    *         order; fewer rows when the corpus runs out of repeated pairs
    */
  def learnMerges(df: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"need numMerges >= 1, got $numMerges")
    val spark = df.sparkSession
    graft.plans.GraftExtensions.ensureRegistered(spark)
    var v = vocab(df, textCol).persist()
    v.count()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var exhausted = false
    for (rank <- 1 to numMerges if !exhausted) {
      // adjacent-pair counts weighted by word frequency; the argmax row
      // is the ONLY driver value (count desc, pair asc total order)
      val top = v
        .select(col("n"), col("syms"), posexplode(slice(col("syms"), lit(1),
          greatest(size(col("syms")) - 1, lit(0)))))
        .select(col("n"), col("col").as("a"),
          element_at(col("syms"), col("pos") + 2).as("b"))
        .filter(col("b").isNotNull)
        .groupBy("a", "b").agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .head(1)
      if (top.isEmpty || top.head.getLong(2) < 2) exhausted = true
      else {
        val (a, b, cnt) =
          (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
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

  /** Tokenize a text column with an ordered merge list (as returned by
    * [[learnMerges]], applied in rank order) — a pure projection: the
    * merge rules become a fixed chain of HOF folds, no shuffle, no state.
    *
    * @return input plus `tokens` (array of learned subword strings)
    */
  def tokenize(df: DataFrame, textCol: String,
      merges: Seq[(String, String)], outputCol: String = "tokens"): DataFrame = {
    val words = filter(split(col(textCol), "\\s+"), w => length(w) > 0)
    val tokenized = flatten(transform(words, w => {
      val base = toSymbols(concat(w, lit("_")))
      merges.foldLeft(base) { case (acc, (a, b)) => applyMerge(acc, a, b) }
    }))
    df.withColumn(outputCol, tokenized)
  }
}
