package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over whitespace tokens — the classic
  * counts-only text classifier (language ID, source/domain routing,
  * quality tiering). Everything is relational: fitting is two
  * aggregations, scoring is one join + one aggregation + one keyed
  * window; there is no iterative loop and no driver-side state beyond
  * the scalar smoothing constant.
  *
  * Scale shape: the (label, term) count frame is vocab×classes-sized;
  * the label frame is classes-sized and broadcast; the scoring join
  * shuffles (doc, term) pairs once. The argmax is a window keyed by
  * document id — never unpartitioned.
  */
object NBayes {

  /** Fit on (textCol, labelCol) and score every row back (resubstitution;
    * split upstream for held-out evaluation). Laplace smoothing `alpha`:
    * score(l, D) = ln p(l) + Σ_t tf(t,D)·ln((n(l,t)+α)/(n(l)+α·V)).
    *
    * The per-class score is rounded to `scoreDigits` BEFORE the argmax
    * (label ascending as tie-break), so the prediction is stable under
    * engine/partition summation-order differences.
    *
    * @return (id, label, predicted, score) — `score` the winning class's
    *         rounded log-score
    */
  def fitPredict(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, alpha: Double = 1.0,
      scoreDigits: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // fan out before the split+explode (r13 class)
    val base = fanOut(df).select(col(idCol).as("id"),
      col(labelCol).as("label"),
      filter(split(col(textCol), "\\s+"), t => length(t) > 0).as("__t"))
    val tf = base.select(col("id"), col("label"), explode(col("__t")).as("term"))
      .groupBy("id", "label", "term").agg(count(lit(1)).as("tf"))
    // class-conditional term counts n(l,t) and class totals n(l)
    val classTok = tf.groupBy("label", "term").agg(sum("tf").as("nlt"))
    val classTot = classTok.groupBy("label").agg(sum("nlt").as("nl"))
    // priors from document counts; vocabulary size V for the smoothing
    val nDocs = base.count()
    val priors = base.groupBy("label").agg(count(lit(1)).as("ndoc"))
      .join(classTot, "label")
      .withColumn("lprior", log(col("ndoc").cast("double") / nDocs))
      .select(col("label").as("c_label"), col("nl"), col("lprior"))
    val vocab = classTok.agg(countDistinct("term").as("__v"))
    // score every doc against every class: the smoothing term applies to
    // UNSEEN (term, class) pairs too, so the class join is a cross join
    // with the tiny label frame followed by a left join on the counts
    val classTokR = classTok.select(col("label").as("t_label"),
      col("term").as("t_term"), col("nlt"))
    val scored = tf.crossJoin(broadcast(priors))
      .join(classTokR,
        col("term") === col("t_term") && col("c_label") === col("t_label"),
        "left")
      .drop("t_term", "t_label")
      .crossJoin(broadcast(vocab))
      .withColumn("__contrib",
        col("tf") * log((coalesce(col("nlt"), lit(0L)) + alpha) /
          (col("nl") + lit(alpha) * col("__v"))))
      .groupBy(col("id"), col("label"), col("c_label"))
      .agg(round(first("lprior") + sum("__contrib"), scoreDigits).as("score"))
    val w = Window.partitionBy("id")
      .orderBy(col("score").desc, col("c_label"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("id"), col("label"), col("c_label").as("predicted"),
        col("score"))
  }
}
