package graft.glm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multiclass classification by one-vs-rest binomial GLMs — the standard
  * reduction when the reference stack is binomial-only: one logistic
  * model per class ("this class vs everything else"), per-class
  * probabilities normalized to sum to 1, argmax with a class-name
  * tiebreak so prediction is deterministic.
  *
  * Cluster cost: K independent GLM fits (each the usual one-fused-
  * aggregation-per-IRLS-iteration loop over a persisted frame) and ONE
  * scoring projection — the per-class scores are literal-β inverse-link
  * expressions, so scoring is a single codegen'd pass, no joins. The
  * class list is a driver collect of class-count size.
  *
  * OvR probabilities are calibrated per class but not jointly (the
  * normalization is the usual pragmatic fix); for a true joint softmax
  * fit, use the reduction as the warm start of a dedicated solver.
  */
object Multinomial {

  final case class OvRModel(classes: Seq[String], models: Seq[GLMModel]) {
    /** Adds p_<class> columns (normalized), plus `predicted`. All K
      * scores are pure projections (literal-β inverse links), so the
      * whole scoring chain fuses into one codegen'd pass.
      */
    def predict(df: DataFrame): DataFrame = {
      val withRaw = classes.zip(models).foldLeft(df) { case (d, (c, m)) =>
        m.predict(d, s"__raw_$c")
      }
      val total = classes.map(c => col(s"__raw_$c")).reduce(_ + _)
      val withP = classes.foldLeft(withRaw) { (d, c) =>
        d.withColumn(s"p_$c", col(s"__raw_$c") / total)
      }
      // pairwise argmax; strict > means the FIRST (sorted) class wins ties
      val pred = classes.map(c => (col(s"p_$c"), lit(c)))
        .reduceLeft[(Column, Column)] { case ((bp, bc), (p, c)) =>
          (when(p > bp, p).otherwise(bp), when(p > bp, c).otherwise(bc))
        }
      withP.withColumn("predicted", pred._2)
        .drop(classes.map(c => s"__raw_$c"): _*)
    }
  }

  /** Fit one binomial GLM per distinct value of `targetCol` (collected,
    * sorted — class-count-sized driver state).
    */
  def fitOneVsRest(df: DataFrame, xCols: Seq[String], targetCol: String,
      linkName: String = "logit", tol: Double = 1e-10,
      maxIter: Int = 50): OvRModel = {
    val classes = df.select(col(targetCol).cast("string"))
      .filter(col(targetCol).isNotNull)
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    require(classes.size >= 2, s"need >= 2 classes, got ${classes.size}")
    val models = classes.map { c =>
      val labeled = df.withColumn("__ovr_y",
        (col(targetCol).cast("string") === c).cast("double"))
      GLM.fit(labeled, xCols, "__ovr_y", family = "binomial",
        linkName = linkName, tol = tol, maxIter = maxIter)
    }
    OvRModel(classes, models)
  }
}
