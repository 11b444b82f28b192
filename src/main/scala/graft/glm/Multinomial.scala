package graft.glm

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multiclass classification, two ways:
  *
  *  - [[fitOneVsRest]] — K independent binomial GLMs ("this class vs
  *    everything else"), per-class probabilities normalized to sum to 1.
  *    Calibrated per class but NOT jointly; coefficients are not
  *    comparable to R's `nnet::multinom`. The scalable pragmatic
  *    reduction (K embarrassingly parallel fits).
  *  - [[fitSoftmax]] — the TRUE joint multinomial (softmax) logit:
  *    P(y = c | x) = exp(η_c) / Σ_k exp(η_k), with the FIRST (sorted)
  *    class as baseline (η_1 = 0) and η_c = xᵀβ_c — exactly
  *    `nnet::multinom`'s parameterization, so coefficients transfer.
  *    Fit by BHHH scoring (the [[Ordinal]] machinery generalized): per
  *    iteration ONE fused aggregation computes ℓ, the m = (K−1)(p+1)
  *    per-row gradient sums and their m(m+1)/2 outer products as
  *    literal-parameter column expressions over the persisted input;
  *    only O(m²) scalars reach the driver. Steps halve when ℓ drops.
  *
  * Cluster cost either way is fused-aggregation passes over a persisted
  * frame; scoring is a single codegen'd projection (literal-β softmax),
  * no joins. The class list is a driver collect of class-count size.
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

  /** Joint softmax fit result. `beta(c)(j)`: class `classes(c + 1)` vs
    * the baseline `classes(0)`; j = 0 is the intercept when fitted, then
    * one slope per feature — `nnet::multinom`'s coefficient layout.
    */
  final case class SoftmaxModel(classes: Seq[String], features: Seq[String],
      intercept: Boolean, beta: Array[Array[Double]], loglik: Double,
      nullLoglik: Double, n: Long, iter: Int) {

    private def etas: Seq[Column] = beta.toSeq.map { b =>
      val terms = (if (intercept) Seq(lit(b(0))) else Nil) ++
        features.zipWithIndex.map { case (f, j) =>
          col(f) * lit(b(if (intercept) j + 1 else j)) }
      terms.reduce(_ + _)
    }

    /** p_<class> softmax probabilities + argmax `predicted` — one
      * codegen'd projection (log-sum-exp stabilized), no joins.
      */
    def predict(df: DataFrame): DataFrame = {
      val es = etas
      val mx = greatest((lit(0.0) +: es): _*)
      val den = exp(-mx) + es.map(e => exp(e - mx)).reduce(_ + _)
      val probs = (lit(0.0) +: es).map(e => exp(e - mx) / den)
      val withP = classes.zip(probs).foldLeft(df) { case (d, (c, pc)) =>
        d.withColumn(s"p_$c", pc)
      }
      val pred = classes.map(c => (col(s"p_$c"), lit(c)))
        .reduceLeft[(Column, Column)] { case ((bp, bc), (pc, cc)) =>
          (when(pc > bp, pc).otherwise(bp), when(pc > bp, cc).otherwise(bc))
        }
      withP.withColumn("predicted", pred._2)
    }
  }

  /** True joint multinomial (softmax) logit via BHHH scoring — see the
    * object doc. Baseline = first class in sorted order, as in
    * `nnet::multinom` (which baselines the first factor level).
    *
    * @param intercept fit a per-class intercept (R default)
    */
  def fitSoftmax(df: DataFrame, xCols: Seq[String], targetCol: String,
      intercept: Boolean = true, tol: Double = 1e-9,
      maxIter: Int = 60): SoftmaxModel = {
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    val classes = df.select(col(targetCol).cast("string"))
      .filter(col(targetCol).isNotNull)
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    val k = classes.size
    require(k >= 2, s"need >= 2 classes, got $k")
    val x = xCols.map(c => col(c).cast("double"))
    val pFeat = xCols.length
    val pc = pFeat + (if (intercept) 1 else 0) // params per non-base class
    val m = (k - 1) * pc
    require(m >= 1, "no parameters to fit (no features, no intercept)")
    // class index 0..K−1 (0 = baseline)
    val yIdx = classes.zipWithIndex.foldLeft(lit(-1)) { case (acc, (cv, i)) =>
      when(col(targetCol).cast("string") === cv, lit(i)).otherwise(acc)
    }
    val base = df
      .filter(col(targetCol).isNotNull &&
        (if (pFeat == 0) lit(true) else x.map(_.isNotNull).reduce(_ && _)))
      .select((yIdx.as("__y") +: x.zipWithIndex.map { case (c, i) =>
        c.as(s"__x$i") }): _*)
      .persist()
    val n = base.count()

    // design columns per non-base class: intercept (1) then features
    def designCol(j: Int): Column =
      if (intercept) { if (j == 0) lit(1.0) else col(s"__x${j - 1}") }
      else col(s"__x$j")

    def pass(b: Array[Array[Double]]): (Double, BDV[Double], BDM[Double]) = {
      val es: Seq[Column] = (0 until k - 1).map { c =>
        (0 until pc).map(j => designCol(j) * graft.functions.stableLit(b(c)(j))).reduce(_ + _)
      }
      val mx = greatest((lit(0.0) +: es): _*)
      val den = exp(-mx) + es.map(e => exp(e - mx)).reduce(_ + _)
      val lse = mx + log(den) // ln Σ_k exp(η_k), η_base = 0
      val probs = es.map(e => exp(e - mx) / den)
      val etaY = (0 until k - 1).foldLeft(lit(0.0)) { (acc, c) =>
        when(col("__y") === c + 1, es(c)).otherwise(acc)
      }
      // per-row gradient g_{c,j} = (1[y = c] − P_c) · design_j
      val gCols: Seq[Column] = for (c <- 0 until k - 1; j <- 0 until pc)
        yield (when(col("__y") === c + 1, lit(1.0)).otherwise(lit(0.0)) -
          probs(c)) * designCol(j)
      val withG = base.select(
        ((etaY - lse).as("__ll") +: gCols.zipWithIndex.map { case (c, i) =>
          c.as(s"__g$i") }): _*)
      val aggs = Seq(sum(col("__ll")).as("ll")) ++
        (0 until m).map(i => sum(col(s"__g$i")).as(s"g$i")) ++
        (for (i <- 0 until m; j <- i until m) yield
          sum(col(s"__g$i") * col(s"__g$j")).as(s"h_${i}_$j"))
      val row = withG.agg(aggs.head, aggs.tail: _*).head()
      val ll = row.getDouble(0)
      val g = BDV.tabulate(m)(i => row.getDouble(1 + i))
      val h = BDM.zeros[Double](m, m)
      var idx = 1 + m
      for (i <- 0 until m; j <- i until m) {
        h(i, j) = row.getDouble(idx); h(j, i) = h(i, j); idx += 1
      }
      (ll, g, h)
    }

    var beta = Array.fill(k - 1)(Array.fill(pc)(0.0))
    var (ll, g, h) = pass(beta)
    var lastLl = Double.NegativeInfinity
    var iter = 0
    while (iter < maxIter && math.abs(ll - lastLl) >= tol) {
      lastLl = ll
      val dir = LinAlg.solvePD(h, g)
      var step = 1.0
      var accepted = false
      var tries = 0
      while (!accepted && tries < 8) {
        val b2 = Array.tabulate(k - 1, pc)((c, j) =>
          beta(c)(j) + step * dir(c * pc + j))
        val (ll2, g2, h2) = pass(b2)
        if (ll2 > ll || math.abs(ll2 - ll) < tol) {
          beta = b2; ll = ll2; g = g2; h = h2; accepted = true
        } else { step /= 2; tries += 1 }
      }
      if (!accepted) lastLl = ll // stuck: exit on the tol check
      iter += 1
    }
    // null model: intercept-only softmax has closed-form MLE at the
    // class frequencies — ℓ0 = Σ_c n_c ln(n_c/n)
    val counts = base.groupBy("__y").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(1))
    val ll0 = counts.map(c => c * math.log(c.toDouble / n)).sum
    base.unpersist(blocking = false)
    SoftmaxModel(classes, xCols, intercept, beta, ll, ll0, n, iter)
  }
}
