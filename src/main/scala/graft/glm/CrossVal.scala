package graft.glm

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** k-fold cross-validation for least squares in exactly TWO distributed
  * passes, independent of k.
  *
  * The naive CV loop refits k times — k full data passes. Here pass 1
  * computes the PER-FOLD Gram blocks (the same p(p+1)/2 + p + 3 sums as
  * [[Gram.normal]], grouped by the fold column: one shuffle of k·p²-sized
  * partial buffers), and every held-out fit falls out driver-side from
  * COMPLEMENT sums
  *
  *   β_f = (XᵀWX_total − XᵀWX_f)⁻¹ (XᵀWy_total − XᵀWy_f)
  *
  * because the Gram of "all data except fold f" is a subtraction, not a
  * second scan. Pass 2 scores each row with ITS fold's out-of-fold β via a
  * literal CASE dispatch (codegen'd, no join) and aggregates per-fold test
  * error. At 100 TB this is two scans total where the textbook loop costs
  * k — and the fold column should be content-keyed
  * ([[graft.ops.Sampling.splitColumn]]-style), never `rand()`.
  *
  * The reference has no model-selection machinery at all; this is the CV
  * counterpart of its LM (reference: LM.scala:241-274) built the way only
  * an aggregation-first architecture allows.
  */
object CrossVal {

  /** Run k-fold CV for `yCol ~ xCols`.
    *
    * @param foldCol integer-valued fold id column (any small cardinality k;
    *                deterministic content-keyed assignment recommended)
    * @return one row per fold: fold, n_train, n_test, mse, rmse — the
    *         out-of-fold test error of the model fit WITHOUT that fold
    */
  def lmCV(
      df: DataFrame,
      xCols: Seq[String],
      yCol: String,
      foldCol: Column,
      intercept: Boolean = true,
      weightCol: Option[String] = None): DataFrame = {
    require(xCols.nonEmpty, "at least one feature column required")
    val xs: Seq[Column] =
      (if (intercept) Seq(lit(1.0)) else Nil) ++ xCols.map(c => col(c).cast(DoubleType))
    val p = xs.size
    require(p <= Gram.maxExprWidth,
      s"lmCV supports p <= ${Gram.maxExprWidth} features (got $p)")
    val w = weightCol.map(c => col(c).cast(DoubleType)).getOrElse(lit(1.0))
    val y = col(yCol).cast(DoubleType)

    // pass 1: per-fold Gram blocks — identical sums to Gram.normal's
    // narrow path, one grouped aggregation (map-side partials carry k·p²
    // doubles per task)
    val upper = for { i <- 0 until p; j <- i until p }
      yield sum(w * xs(i) * xs(j)).as(s"g_${i}_$j")
    val moment = (0 until p).map(i => sum(w * xs(i) * y).as(s"v_$i"))
    val scalars = Seq(sum(w * y * y).as("yty"), count(lit(1)).as("n"))
    val all = upper ++ moment ++ scalars
    val perFold = df.groupBy(foldCol.as("fold"))
      .agg(all.head, all.tail: _*)
      .collect()
    require(perFold.length >= 2, s"need >= 2 folds, got ${perFold.length}")

    def block(r: org.apache.spark.sql.Row): (Int, BDM[Double], BDV[Double], Long) = {
      var idx = 1
      def next(): Double = { val v = r.get(idx) match {
        case null => 0.0
        case x: Double => x
        case x: Number => x.doubleValue()
      }; idx += 1; v }
      val xtx = BDM.zeros[Double](p, p)
      for (i <- 0 until p; j <- i until p) {
        val v = next(); xtx(i, j) = v; xtx(j, i) = v
      }
      val xty = BDV.tabulate(p)(_ => next())
      next() // yty (unused driver-side; test error comes from pass 2)
      val fold = r.get(0) match {
        case i: Int => i
        case l: Long => l.toInt
        case x: Number => x.intValue()
        case other => throw new IllegalArgumentException(
          s"foldCol must be integer-valued, got $other")
      }
      (fold, xtx, xty, r.getLong(idx))
    }
    val folds = perFold.map(block).sortBy(_._1)
    val xtxTot = folds.map(_._2).reduce(_ + _)
    val xtyTot = folds.map(_._3).reduce(_ + _)
    val nTot = folds.map(_._4).sum

    // driver: out-of-fold β per fold from complement sums
    val betas = folds.map { case (f, xtx, xty, nTest) =>
      val nTrain = nTot - nTest
      require(nTrain > p, s"fold $f leaves only $nTrain training rows for $p params")
      (f, LinAlg.solvePD(xtxTot - xtx, xtyTot - xty), nTrain, nTest)
    }

    // pass 2: literal CASE dispatch to the row's out-of-fold β, then
    // per-fold test-error aggregation — one codegen'd scan
    def predExpr(beta: BDV[Double]): Column =
      xs.zipWithIndex.map { case (x, i) => x * lit(beta(i)) }.reduce(_ + _)
    val dispatch = betas.tail.foldLeft(
      when(foldCol === lit(betas.head._1), predExpr(betas.head._2))) {
      case (acc, (f, b, _, _)) => acc.when(foldCol === lit(f), predExpr(b))
    }
    val err = y - dispatch
    val trainN = map(betas.flatMap { case (f, _, nTrain, _) =>
      Seq(lit(f), lit(nTrain)) }: _*)
    df.groupBy(foldCol.as("fold"))
      .agg(count(lit(1)).as("n_test"),
        avg(err * err).as("mse"))
      .withColumn("n_train", element_at(trainN, col("fold")))
      .withColumn("rmse", sqrt(col("mse")))
      .select("fold", "n_train", "n_test", "mse", "rmse")
  }
}
