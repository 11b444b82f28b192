package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Diagonal-covariance Gaussian mixture model by EM — soft clustering
  * over embedding columns, the probabilistic companion to
  * [[Cluster.kmeans]] (k-means is the σ²→0 limit): cluster weights,
  * per-dimension means and variances, and per-row responsibilities.
  *
  * Scale shape: E+M is ONE pass per iteration — responsibilities are a
  * pure projection (parameters ride as plan literals, the
  * [[Cluster.kmeans]] centroid discipline), and the moment update is
  * ONE aggregation whose output is k·(2·dims + 1) cells. No per-row
  * state, no join, nothing data-sized on the driver.
  *
  * Exact-replay discipline (the [[Topics]] rules, extended to float
  * inputs): every vector component is quantized ONCE to the integer
  * MILLI grid (x̃ = round(x·1e3) — both engines then read the identical
  * doubles x̃/1e3); per-row responsibilities quantize to integer
  * micro-units BEFORE the moment sums, and the moment cells are exact
  * integer products w·x̃ and w·x̃² — so means/variances/weights are
  * exact integer ratios under pinned division order, identical in any
  * engine. The softmax drops the 2π term (a per-row constant shift
  * cancels in the ratio), and ln/exp ulp differences across engines are
  * absorbed by the micro quantization. Long-range bound: Σ w·x̃² per
  * (cluster, dim) must stay under 2⁶³ — with micro responsibilities and
  * milli components that allows ~10⁹ rows per cluster at unit-scale
  * data; rescale the grids for wider regimes.
  *
  * Seeding is content-keyed (the k rows ranked first by
  * (md5(id), id) — deterministic, partition-invariant); initial
  * variances are the global per-dimension moments; initial weights 1/k.
  */
object Mixture {

  /** Fitted diagonal GMM. `means(z)(j)`/`vars(z)(j)` are exact-ratio
    * doubles; `weightMicro(z)` the integer responsibility mass.
    */
  final case class GmmModel(k: Int, dims: Int, vecCol: String,
      pi: Array[Double], means: Array[Array[Double]],
      vars: Array[Array[Double]], weightMicro: Array[Long]) {

    /** (cluster, weight_micro, pi, dim, mean, variance) — k·dims rows. */
    def toDF(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      (for (z <- 0 until k; j <- 0 until dims)
        yield (z, weightMicro(z), pi(z), j, means(z)(j), vars(z)(j)))
        .toDF("cluster", "weight_micro", "pi", "dim", "mean", "variance")
    }

    private def xq(j: Int): Column =
      round(element_at(col(vecCol), j + 1).cast("double") * 1e3)
        .cast("long")

    /** Per-cluster log-density chain (2π dropped — constant per row). */
    private[ops] def llExpr(z: Int): Column = {
      val terms = (0 until dims).map { j =>
        val x = xq(j).cast("double") / lit(1e3)
        val d = x - lit(means(z)(j))
        (d * d) / lit(vars(z)(j)) + lit(math.log(vars(z)(j)))
      }
      lit(math.log(pi(z))) - lit(0.5) * terms.reduceLeft(_ + _)
    }

    /** Hard assignment: argmax_z log-density, first-max-wins over z
      * ascending — a pure projection. Built as ONE n-ary `greatest`
      * over (ll, −z) structs (lexicographic struct order makes the
      * smallest z win ties), NOT a when-chain fold: a fold embeds the
      * accumulator twice per level, 2^k expression blow-up.
      */
    def assignExpr: Column = {
      val cands = (0 until k).map(z =>
        struct(llExpr(z).as("b"), lit(-z).as("nz")))
      -greatest(cands: _*).getField("nz")
    }

    def assign(df: DataFrame, outputCol: String = "cluster"): DataFrame =
      df.withColumn(outputCol, assignExpr)
  }

  /** Fit a `k`-component diagonal GMM over the first `dims` components
    * of `vecCol` with `iters` EM rounds.
    */
  def fitGmmDiag(df: DataFrame, idCol: String, vecCol: String, dims: Int,
      k: Int, iters: Int = 3): GmmModel = {
    require(k >= 2, s"need k >= 2, got $k")
    require(dims >= 1, s"need dims >= 1, got $dims")
    require(iters >= 1, s"need iters >= 1, got $iters")
    val base = df
      .filter(col(vecCol).isNotNull && size(col(vecCol)) >= dims)
      .select(col(idCol).cast("string").as("__id") +:
        (0 until dims).map(j =>
          round(element_at(col(vecCol), j + 1).cast("double") * 1e3)
            .cast("long").as(s"xq_$j")): _*)
      .persist()
    try {
      // content-keyed seeds: the k rows ranked first by (md5(id), id)
      val seeds = base.orderBy(md5(col("__id")), col("__id")).limit(k)
        .collect()
      require(seeds.length == k,
        s"need at least k=$k rows with a $dims-dim vector, " +
          s"got ${seeds.length}")
      var means = Array.tabulate(k, dims)((z, j) =>
        seeds(z).getLong(1 + j).toDouble / 1e3)
      // global per-dim moments → shared initial variances (floored)
      val g = base.agg(
        count(lit(1)).as("n"),
        (0 until dims).flatMap(j => Seq(
          sum(s"xq_$j").as(s"s1_$j"),
          sum(col(s"xq_$j") * col(s"xq_$j")).as(s"s2_$j"))): _*).head()
      val n = g.getLong(0)
      var vars = Array.tabulate(k, dims) { (_, j) =>
        val m = (g.getLong(1 + 2 * j).toDouble / n.toDouble) / 1e3
        val v = (g.getLong(2 + 2 * j).toDouble / n.toDouble) / 1e6 - m * m
        math.max(v, 1e-6)
      }
      var pi = Array.fill(k)(1.0 / k)
      var wMicro = Array.fill(k)(0L)

      for (_ <- 1 to iters) {
        def ll(z: Int): Column = {
          val terms = (0 until dims).map { j =>
            val x = col(s"xq_$j").cast("double") / lit(1e3)
            val d = x - lit(means(z)(j))
            (d * d) / lit(vars(z)(j)) + lit(math.log(vars(z)(j)))
          }
          lit(math.log(pi(z))) - lit(0.5) * terms.reduceLeft(_ + _)
        }
        val es = (0 until k).map(z => exp(ll(z)))
        val den = es.reduceLeft(_ + _)
        val ws = (0 until k).map(z =>
          round((es(z) / den) * lit(1e6)).cast("long").as(s"w_$z"))
        val staged = base.select((0 until dims).map(j =>
          col(s"xq_$j")) ++ ws: _*)
        val aggs = (0 until k).flatMap { z =>
          sum(s"w_$z").as(s"sw_$z") +:
            (0 until dims).flatMap(j => Seq(
              sum(col(s"w_$z") * col(s"xq_$j")).as(s"m_${z}_$j"),
              sum(col(s"w_$z") * col(s"xq_$j") * col(s"xq_$j"))
                .as(s"s_${z}_$j")))
        }
        val row = staged.agg(aggs.head, aggs.tail: _*).head()
        def get(name: String): Long =
          row.getLong(row.schema.fieldIndex(name))
        wMicro = Array.tabulate(k)(z => math.max(get(s"sw_$z"), 1L))
        val wTot = wMicro.sum
        pi = wMicro.map(_.toDouble / wTot.toDouble)
        means = Array.tabulate(k, dims)((z, j) =>
          (get(s"m_${z}_$j").toDouble / wMicro(z).toDouble) / 1e3)
        vars = Array.tabulate(k, dims) { (z, j) =>
          val mu = means(z)(j)
          val v = (get(s"s_${z}_$j").toDouble / wMicro(z).toDouble) / 1e6 -
            mu * mu
          math.max(v, 1e-6)
        }
      }
      GmmModel(k, dims, vecCol, pi, means, vars, wMicro)
    } finally { base.unpersist(blocking = false); () }
  }
}
