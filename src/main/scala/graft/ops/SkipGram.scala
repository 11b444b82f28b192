package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skip-gram training-data generation (Mikolov et al. 2013) — the
  * embedding-training member of the text family: positive
  * (center, context) pairs from a ±window token neighborhood, and
  * negatives drawn from the unigram^(3/4) distribution through
  * word2vec's inverse-CDF cell table. Everything is deterministic and
  * engine-replayable: draws are content-keyed md5 (the q337 DeepWalk
  * discipline), and the ^0.75 weights compose IEEE-exact `sqrt`
  * (x^(3/4) = sqrt(x)·sqrt(sqrt(x)) — sqrt and * are correctly rounded
  * in every IEEE engine, unlike `pow`, whose libm differs across
  * engines in the last ulp).
  *
  * Scale shapes: pairs = ONE doc-partitioned window pass with a
  * bounded lead unroll (no self-join); the cell table lives on the
  * REQUIRED ≤ maxVocab vocabulary frame and has exactly `tableSize`
  * rows; negative draws join that broadcast-sized table by cell id.
  */
object SkipGram {

  /** Positive skip-gram pairs: for each token, its neighbors at
    * distance 1..window on BOTH sides (each unordered co-occurrence
    * appears twice, center/context swapped — the standard skip-gram
    * orientation). ONE window pass: forward leads only, the backward
    * orientation is the same lead row re-emitted swapped.
    *
    * @return (doc, pos, center, context, dist) — pos = the center's
    *         0-based token position after empty-token filtering
    */
  def pairs(df: DataFrame, idCol: String, textCol: String,
      window: Int): DataFrame = {
    require(window >= 1 && window <= 8, s"need 1 <= window <= 8, got $window")
    // fan out before the split + position explode (r13 class)
    val toks = fanOut(df.filter(col(textCol).isNotNull))
      .select(col(idCol).as("doc"),
        posexplode(filter(split(col(textCol), "\\s+"),
          t => length(t) > 0)).as(Seq("pos", "tok")))
    val w = Window.partitionBy("doc").orderBy("pos")
    val withLeads = toks.select(
      Seq(col("doc"), col("pos"), col("tok")) ++
        (1 to window).map(d => lead(col("tok"), d).over(w).as(s"__l$d")): _*)
    val orient = (1 to window).flatMap { d =>
      Seq(
        struct(col("pos").as("pos"), col("tok").as("center"),
          col(s"__l$d").as("context"), lit(d).as("dist")),
        struct((col("pos") + d).as("pos"), col(s"__l$d").as("center"),
          col("tok").as("context"), lit(d).as("dist")))
    }
    withLeads
      .select(col("doc"), explode(array(orient: _*)).as("e"))
      .filter(col("e.center").isNotNull && col("e.context").isNotNull)
      .select(col("doc"), col("e.pos").as("pos"),
        col("e.center").as("center"), col("e.context").as("context"),
        col("e.dist").as("dist"))
  }

  /** word2vec's unigram^(3/4) inverse-CDF cell table: vocabulary token
    * counts → 1e3-quantized x^(3/4) weights (IEEE-exact sqrt
    * composition) → token-ascending CDF → each token owns the cells
    * whose scaled positions fall in its [lo, hi) mass range. The table
    * tiles [0, tableSize) exactly, so a uniform cell draw IS a draw
    * from the quantized unigram^(3/4) distribution.
    *
    * Vocabulary is REQUIRED ≤ maxVocab loudly (the CDF runs as one
    * unpartitioned window over the vocab frame — model-sized by
    * contract, like the mmrSelect slate); cell arithmetic is exact
    * longs, guarded against overflow at wTotal · tableSize.
    *
    * @return (cell, tok) — exactly tableSize rows
    */
  def unigramTable(df: DataFrame, textCol: String, tableSize: Int,
      maxVocab: Int = 65536): DataFrame = {
    require(tableSize >= 2 && tableSize <= (1 << 20),
      s"need 2 <= tableSize <= 2^20, got $tableSize")
    val cnt = fanOut(df.filter(col(textCol).isNotNull))
      .select(explode(filter(split(col(textCol), "\\s+"),
        t => length(t) > 0)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val nVocab = cnt.count()
    require(nVocab >= 1 && nVocab <= maxVocab,
      s"vocabulary has $nVocab tokens > maxVocab=$maxVocab — cut rare " +
        "tokens first (the CDF window is model-sized by contract)")
    // x^(3/4) = sqrt(x) * sqrt(sqrt(x)): correctly-rounded IEEE ops only
    val wgt = round(sqrt(col("c").cast("double")) *
      sqrt(sqrt(col("c").cast("double"))) * 1000).cast("long")
    val wv = Window.orderBy("tok")
    val cum = cnt.select(col("tok"), wgt.as("w"))
      .withColumn("hi", sum("w").over(wv))
      .withColumn("lo", col("hi") - col("w"))
    val wTotal = cum.agg(max("hi")).head().getLong(0)
    // the ceil expressions peak at hi*tableSize + wTotal - 1 (hi <= wTotal),
    // so the guard must leave wTotal-1 of headroom beyond wTotal*tableSize
    require(wTotal > 0 &&
      wTotal <= (Long.MaxValue - wTotal + 1) / tableSize,
      s"weight total $wTotal overflows the cell arithmetic at " +
        s"tableSize=$tableSize")
    // token owns cells t with lo <= (t*wTotal) div tableSize < hi:
    // t in [ceil(lo*T/W), ceil(hi*T/W))
    val tmin = expr(s"(lo * ${tableSize}L + ${wTotal}L - 1) div ${wTotal}L")
    val tmax = expr(s"(hi * ${tableSize}L + ${wTotal}L - 1) div ${wTotal}L")
    cum.select(col("tok"), tmin.as("__tmin"), tmax.as("__tmax"))
      .filter(col("__tmax") > col("__tmin"))
      .select(col("tok"),
        explode(sequence(col("__tmin"), col("__tmax") - 1)).as("cell"))
      .select(col("cell"), col("tok"))
  }

  /** Deterministic negative sampling: `negK` negatives per positive
    * pair, each a content-keyed md5 draw (doc#pos#center#context#k)
    * into the broadcast [[unigramTable]]. The same pair always draws
    * the same negatives, on any engine and partitioning.
    *
    * @param pairsDf output of [[pairs]] (doc, pos, center, context, …)
    * @return pairsDf columns + (k, negative)
    */
  def negativeSamples(pairsDf: DataFrame, table: DataFrame,
      tableSize: Int, negK: Int): DataFrame = {
    require(negK >= 1 && negK <= 16, s"need 1 <= negK <= 16, got $negK")
    val drawn = pairsDf
      .withColumn("k", explode(array((1 to negK).map(lit): _*)))
      .withColumn("__cell",
        pmod(conv(substring(md5(concat_ws("#", col("doc"), col("pos"),
          col("center"), col("context"), col("k"))), 1, 15), 16, 10)
          .cast("long"), lit(tableSize.toLong)))
    drawn
      .join(broadcast(table.withColumnRenamed("tok", "negative")),
        col("__cell") === col("cell"))
      .drop("__cell", "cell")
  }
}
