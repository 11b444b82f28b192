package graft.glm

import breeze.linalg.{eigSym, DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Principal component analysis as one Gram pass + a driver-side p×p
  * eigendecomposition.
  *
  * The covariance matrix is p×p regardless of row count, so the ONLY
  * distributed work is the same fused second-moment aggregation LM uses
  * ([[Gram.normal]] — the all-ones slot supplies the column sums, so means
  * and covariances fall out of one job; above the expression-width cap the
  * packed `treeAggregate` path takes over, which is what a 64-dim
  * embedding column hits). Projection is a pure literal-coefficient
  * column expression — codegen'd, no UDF, streaming-safe.
  *
  * The reference has no dimensionality reduction; this is the natural
  * next consumer of the Gram primitive (embeddings: whitening before
  * clustering/ANN, variance auditing before an IVF index).
  */
object PCA {

  /** Eigenvalues descending; `components` columns are the matching unit
    * eigenvectors (p×p, column k = PC k+1).
    */
  final class PCAModel(
      val cols: Array[String],
      val vecCol: Option[String], // set when fit on an array column
      val mean: BDV[Double],
      val eigenvalues: BDV[Double],
      val components: BDM[Double],
      val n: Long) extends Serializable {

    def p: Int = mean.length

    /** Fraction of total variance captured by the top k components. */
    def varianceExplained(k: Int): Double = {
      require(k >= 1 && k <= p, s"k must be in [1,$p], got $k")
      val tot = breeze.linalg.sum(eigenvalues)
      if (tot <= 0) Double.NaN
      else (0 until k).map(eigenvalues(_)).sum / tot
    }

    private def inputExprs: Seq[Column] = vecCol match {
      case Some(vc) =>
        (1 to p).map(i => element_at(col(vc), i).cast(DoubleType))
      case None => cols.toSeq.map(c => col(c).cast(DoubleType))
    }

    /** Append `pc1..pck` — centered projections onto the top k components,
      * one codegen'd projection with literal loadings.
      */
    def transform(df: DataFrame, k: Int): DataFrame = {
      require(k >= 1 && k <= p, s"k must be in [1,$p], got $k")
      val xs = inputExprs
      (0 until k).foldLeft(df) { (d, c) =>
        val proj = xs.zipWithIndex.map { case (x, j) =>
          (x - lit(mean(j))) * lit(components(j, c))
        }.reduce(_ + _)
        d.withColumn(s"pc${c + 1}", proj)
      }
    }
  }

  private def fromGram(names: Array[String], vecCol: Option[String],
      g: Normal): PCAModel = {
    val p = g.p - 1 // slot 0 is the all-ones column
    val n = g.xtx(0, 0)
    require(g.n > 1, s"need at least 2 rows, got ${g.n}")
    val mean = BDV.tabulate(p)(j => g.xtx(0, j + 1) / n)
    val cov = BDM.tabulate(p, p) { (i, j) =>
      (g.xtx(i + 1, j + 1) - n * mean(i) * mean(j)) / (n - 1.0)
    }
    val es = eigSym(cov) // breeze: eigenvalues ascending
    val order = (0 until p).sortBy(i => -es.eigenvalues(i))
    val ev = BDV.tabulate(p)(k => es.eigenvalues(order(k)))
    val comp = BDM.tabulate(p, p)((j, k) => es.eigenvectors(j, order(k)))
    new PCAModel(names, vecCol, mean, ev, comp, g.n)
  }

  /** Fit on scalar numeric columns. */
  def fit(df: DataFrame, xCols: Seq[String]): PCAModel = {
    require(xCols.nonEmpty, "at least one column required")
    val xs = lit(1.0) +: xCols.map(c => col(c).cast(DoubleType))
    fromGram(xCols.toArray, None,
      Gram.normal(df, xs, lit(0.0)))
  }

  /** Fit on a fixed-dimension array column (e.g. an embedding):
    * `element_at` projections feed the same Gram — for dim ≥
    * [[Gram.maxExprWidth]] that is automatically the packed
    * `treeAggregate` path.
    */
  def fitVector(df: DataFrame, vecCol: String, dim: Int): PCAModel = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val xs = lit(1.0) +:
      (1 to dim).map(i => element_at(col(vecCol), i).cast(DoubleType))
    fromGram((1 to dim).map(i => s"$vecCol[$i]").toArray, Some(vecCol),
      Gram.normal(df, xs, lit(0.0)))
  }
}
