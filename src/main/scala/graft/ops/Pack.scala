package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are concatenated in a
  * deterministic order and cut into fixed `budget`-token context windows
  * (documents straddle chunk boundaries — the standard "concat then
  * chunk" packing, which wastes zero tokens, rather than first-fit bin
  * packing, which is inherently sequential and leaves per-bin slack).
  *
  * The whole assignment is arithmetic on the exclusive running token sum
  * in document order: start_offset = Σ tokens before, chunk = ⌊start /
  * budget⌋, position-in-chunk = start mod budget. The running sum is the
  * two-level [[Cumulative]] prefix pass — parallel at any corpus size; no
  * sequential state, so the layout is reproducible from the order key
  * alone (same property the q63 content-keyed splits rely on).
  */
object Pack {

  /** Assigns each document its packed location. Order (`orderCol`) must be
    * unique — it IS the layout, so ties would make the pack ambiguous.
    *
    * @return input plus `start_offset` (tokens before this doc),
    *         `chunk` (= ⌊start_offset/budget⌋, the context window the doc
    *         STARTS in), `pos` (token position inside that window) and
    *         `n_chunks` (how many windows the doc touches)
    */
  def chunkAssign(df: DataFrame, tokenCol: String, orderCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val toks = col(tokenCol).cast("long")
    val withCum = Cumulative.runningSums(
      df.withColumn("__tok", toks), orderCol, Seq("__tok"))
    withCum
      .withColumn("start_offset", col("__tok_cum") - col("__tok"))
      .withColumn("chunk", (col("start_offset") / budget).cast("long"))
      .withColumn("pos", pmod(col("start_offset"), lit(budget)))
      .withColumn("n_chunks",
        ((col("pos") + col("__tok") + budget - 1) / budget).cast("long"))
      .drop("__tok", "__tok_cum")
  }
}
