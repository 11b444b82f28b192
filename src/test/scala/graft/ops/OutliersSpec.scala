package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("madOutliers: closed case with one wild value") {
    // group g: values 1..9 (median 5, adev 0..4, MAD 2) plus one wild 1000
    // n=10: median of 1..9,1000 = 5.5; adevs 4.5,3.5,...,0.5,994.5 → MAD 2.5
    val df = ((1 to 9).map(v => ("g", v.toDouble)) :+ (("g", 1000.0)))
      .toDF("k", "v")
    val out = Outliers.madOutliers(df, "k", "v", k = 3.0).head()
    assert(out.getAs[Long]("n") === 10L)
    assert(out.getAs[Double]("median") === 5.5)
    assert(out.getAs[Double]("mad") === 2.5)
    // threshold = 3 * 1.4826 * 2.5 = 11.1195; only 1000 exceeds it
    assert(out.getAs[Long]("n_outliers") === 1L)
  }

  test("madOutliers: robustness — the wild value does not mask itself") {
    // classic failure of mean/sigma: with n=10 and one huge value the
    // z-score threshold can swallow the outlier; MAD must not
    val vals = Seq.fill(9)(10.0) :+ 1e6
    val df = vals.map(("g", _)).toDF("k", "v")
    val out = Outliers.madOutliers(df, "k", "v").head()
    assert(out.getAs[Double]("mad") === 0.0)
    assert(out.getAs[Long]("n_outliers") === 1L) // MAD=0 rule: != median
  }

  test("madOutliers: no outliers in a tight group; groups are independent") {
    val df = (Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)) ++
      Seq(("b", 5.0), ("b", 5.0), ("b", 500.0))).toDF("k", "v")
    val m = Outliers.madOutliers(df, "k", "v").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_outliers")).toMap
    assert(m("a") === 0L)
    assert(m("b") === 1L)
  }

  test("mahalanobis matches a local 2x2 closed-form computation") {
    val data = Seq((1.0, 2.0), (2.0, 4.1), (3.0, 5.9), (4.0, 8.2),
      (5.0, 9.8), (2.5, 5.0), (3.5, 7.1))
    val df = data.toDF("x", "y")
    val got = Outliers.mahalanobis(df, Seq("x", "y")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    // local reference
    val n = data.size.toDouble
    val mx = data.map(_._1).sum / n
    val my = data.map(_._2).sum / n
    def cov(f: ((Double, Double)) => Double, g: ((Double, Double)) => Double) =
      (data.map(p => f(p) * g(p)).sum -
        data.map(f).sum * data.map(g).sum / n) / (n - 1)
    val (sxx, syy, sxy) = (cov(_._1, _._1), cov(_._2, _._2), cov(_._1, _._2))
    val det = sxx * syy - sxy * sxy
    data.foreach { case (x, y) =>
      val (dx, dy) = (x - mx, y - my)
      val expect = (syy * dx * dx - 2 * sxy * dx * dy + sxx * dy * dy) / det
      assert(math.abs(got((x, y)) - expect) < 1e-9, (x, y))
    }
  }

  test("mahalanobis: an off-ridge point outscores on-ridge points") {
    // y ~ 2x ridge plus one point inside the marginal ranges but off-ridge
    val base = (1 to 20).map(i => (i.toDouble, 2.0 * i + (i % 3) * 0.1))
    val off = (10.0, 2.0) // x typical, y typical-range, correlation broken
    val df = (base :+ off).toDF("x", "y")
    val got = Outliers.mahalanobis(df, Seq("x", "y")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val ridgeMax = base.map(got(_)).max
    assert(got(off) > 4 * ridgeMax, "off-ridge point must dominate")
  }

  test("mahalanobis guards its output column and rank") {
    val df = Seq((1.0, 2.0), (2.0, 3.0), (3.0, 5.0)).toDF("x", "md2")
    intercept[IllegalArgumentException] {
      Outliers.mahalanobis(df, Seq("x", "md2"))
    }
    intercept[IllegalArgumentException] {
      Outliers.mahalanobis(df.limit(2), Seq("x", "md2"), "out")
    }
  }

  test("isolationForest: the planted outlier gets the top score") {
    // tight 2-D cluster + one far point
    val rows = (for (a <- 0 until 6; b <- 0 until 6)
      yield (a.toLong * 6 + b, 1.0 + a * 0.01, 2.0 + b * 0.01)) :+
      ((99L, 50.0, -40.0))
    val df = rows.toDF("id", "f1", "f2")
    val (scored, nodes) = Outliers.isolationForest(df, Seq("f1", "f2"),
      nTrees = 4, maxDepth = 6)
    val top = scored.orderBy(col("iso_score").desc).head()
    assert(top.getLong(0) === 99L, s"top=${top}")
    // outlier scores high in absolute terms, inliers clearly lower
    assert(top.getDouble(3) > 0.6)
    val inlierMax = scored.filter(col("id") =!= 99L)
      .agg(max("iso_score")).head().getDouble(0)
    assert(top.getDouble(3) > inlierMax + 0.1)
    assert(nodes.nonEmpty)
  }

  test("isolationForest: scores are in (0, 1) and model is sane") {
    val df = (1 to 100).map(i => (i.toLong, (i % 13).toDouble,
      (i % 7).toDouble)).toDF("id", "f1", "f2")
    val (scored, nodes) = Outliers.isolationForest(df, Seq("f1", "f2"),
      nTrees = 3, maxDepth = 4)
    val mm = scored.agg(min("iso_score"), max("iso_score")).head()
    assert(mm.getDouble(0) > 0.0 && mm.getDouble(1) < 1.0)
    // internal nodes carry a feature from the requested set
    assert(nodes.flatMap(_.feature)
      .forall(f => Seq("f1", "f2").contains(f)))
    // leaf sizes cover all rows per tree
    for (t <- 0 until 3)
      assert(nodes.filter(nd => nd.tree == t && nd.feature.isEmpty)
        .map(_.size).sum === 100L, s"tree $t")
  }

  test("isolationForest is partition-invariant (md5 draws, exact min/max)") {
    val rows = (1 to 80).map(i => (i.toLong, (i % 11).toDouble,
      (i * 7 % 17).toDouble))
    val df = rows.toDF("id", "f1", "f2")
    val (a, na) = Outliers.isolationForest(df.repartition(1),
      Seq("f1", "f2"), nTrees = 3, maxDepth = 5)
    val (b, nb) = Outliers.isolationForest(df.repartition(7),
      Seq("f1", "f2"), nTrees = 3, maxDepth = 5)
    assert(na === nb)
    val sa = a.orderBy("id").collect().map(_.getDouble(3)).toSeq
    val sb = b.orderBy("id").collect().map(_.getDouble(3)).toSeq
    assert(sa === sb)
  }

  test("isolationForest: constant data never splits, score is uniform") {
    val df = (1 to 30).map(i => (i.toLong, 5.0)).toDF("id", "f1")
    val (scored, nodes) = Outliers.isolationForest(df, Seq("f1"),
      nTrees = 2, maxDepth = 4)
    assert(nodes.forall(_.feature.isEmpty)) // roots stay leaves
    val d = scored.select("iso_score").distinct().collect()
    assert(d.length === 1)
  }
}