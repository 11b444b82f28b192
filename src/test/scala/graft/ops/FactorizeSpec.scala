package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FactorizeSpec extends SparkSpec {
  import spark.implicits._

  // exactly rank-1 ratings: r_ui = a_u · b_i
  private def rank1Ratings = {
    val as = Map(1L -> 2.0, 2L -> 0.5, 3L -> 1.5)
    val bs = Map(10L -> 4.0, 11L -> 1.0, 12L -> 2.0, 13L -> 3.0)
    (for (u <- as.keys; i <- bs.keys) yield (u, i, as(u) * bs(i)))
      .toSeq.toDF("u", "i", "r")
  }

  test("rank-1 structure is recovered: predictions match the ratings") {
    val m = Factorize.als(rank1Ratings, "u", "i", "r", rank = 1,
      iters = 8, lambda = 1e-3)
    val err = m.predict(rank1Ratings)
      .select(max(abs(col("prediction") - col("r"))))
      .head.getDouble(0)
    assert(err < 0.05, s"rank-1 matrix must be recovered, max err $err")
  }

  test("hash init: higher rank fits a rank-2 matrix better than rank 1") {
    // rank-2 ratings: two independent factor directions
    val rows = for (u <- 1L to 6L; i <- 10L to 19L) yield {
      val a = Seq(u.toDouble / 3.0, (u % 3).toDouble)
      val b = Seq((i - 9).toDouble / 4.0, (i % 2).toDouble)
      (u, i, a.zip(b).map { case (x, y) => x * y }.sum)
    }
    val df = rows.toDF("u", "i", "r")
    def sse(rank: Int) = {
      val m = Factorize.als(df, "u", "i", "r", rank = rank, iters = 10,
        lambda = 1e-3)
      m.predict(df).select(sum(pow(col("prediction") - col("r"), 2)))
        .head.getDouble(0)
    }
    val (s1, s2) = (sse(1), sse(2))
    assert(s2 < s1 * 0.1, s"rank 2 must fit a rank-2 matrix: $s1 vs $s2")
  }

  test("fit is deterministic and partition-invariant on the 6-digit grid") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Factorize.als(df, "u", "i", "r", rank = 2, iters = 3, lambda = 0.1)
        .userFactors
        .select(col("u"), round(col("f_0"), 6), round(col("f_1"), 6))
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
        .toMap
    assert(run(rank1Ratings) === run(rank1Ratings.repartition(7)))
  }

  test("predict: unseen user or item scores null, rows preserved") {
    val m = Factorize.als(rank1Ratings, "u", "i", "r", rank = 1,
      iters = 2, lambda = 0.1)
    val probe = Seq((1L, 10L), (99L, 10L), (1L, 99L)).toDF("u", "i")
    val got = m.predict(probe).select("u", "i", "prediction").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.isNullAt(2)).toMap
    assert(got.size === 3)
    assert(!got((1L, 10L)) && got((99L, 10L)) && got((1L, 99L)))
  }

  test("grouped ridge: underdetermined groups solve when lambda > 0") {
    // one observation, two features: OLS is underdetermined (NaN), the
    // penalized solve is defined
    val df = Seq((1L, 1.0, 2.0, 3.0)).toDF("g", "x1", "x2", "y")
    val ols = graft.glm.GroupedLM.fit(df, Seq("g"), Seq("x1", "x2"), "y",
      intercept = false)
    assert(ols.select("b_x1").head.getDouble(0).isNaN)
    val ridge = graft.glm.GroupedLM.fit(df, Seq("g"), Seq("x1", "x2"), "y",
      intercept = false, ridge = 1.0)
    val b = ridge.select("b_x1", "b_x2").head
    // closed form: (XᵀX + I)β = Xᵀy with X = [1 2], y = 3:
    // [[2,2],[2,5]]β = [3,6] → β = (1/2)·[1, 2]... solve: β1 = 0.5, β2 = 1.0
    assert(math.abs(b.getDouble(0) - 0.5) < 1e-9 &&
      math.abs(b.getDouble(1) - 1.0) < 1e-9)
  }
}
