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
    val pairs = df
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
}
