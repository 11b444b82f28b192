package graft.ops

import graft.SparkSpec
import org.apache.commons.math3.distribution.{NormalDistribution, TDistribution}
import org.apache.spark.sql.functions._

class HypothesisSpec extends SparkSpec {
  import spark.implicits._

  private def row1(df: org.apache.spark.sql.DataFrame) = df.collect().head

  // ---- Welch t ----

  test("welchT matches a hand-computed two-sample case") {
    // a: 1,2,3,4 (mean 2.5, var 5/3); b: 2,4,6 (mean 4, var 4)
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0)).toDF("g", "x")
    val r = row1(Hypothesis.welchT(df, "x", "g", "a", "b"))
    val va = (5.0 / 3) / 4; val vb = 4.0 / 3
    val t = (2.5 - 4.0) / math.sqrt(va + vb)
    val dfw = math.pow(va + vb, 2) /
      (va * va / 3 + vb * vb / 2)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-12)
    assert(math.abs(r.getAs[Double]("df_welch") - dfw) < 1e-12)
    assert(r.getAs[Long]("n_a") == 4 && r.getAs[Long]("n_b") == 3)
    // p-value the caller would derive is finite and in (0,1)
    val p = 2 * (1 - new TDistribution(r.getAs[Double]("df_welch"))
      .cumulativeProbability(math.abs(r.getAs[Double]("t_stat"))))
    assert(p > 0 && p < 1)
  }

  test("welchT is antisymmetric in the group order and ignores other groups") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 6.0),
      ("z", 99.0), ("z", -99.0)).toDF("g", "x")
    val ab = row1(Hypothesis.welchT(df, "x", "g", "a", "b"))
    val ba = row1(Hypothesis.welchT(df, "x", "g", "b", "a"))
    assert(math.abs(ab.getAs[Double]("t_stat") + ba.getAs[Double]("t_stat")) < 1e-12)
    assert(math.abs(ab.getAs[Double]("df_welch") - ba.getAs[Double]("df_welch")) < 1e-12)
  }

  // ---- two-proportion z ----

  test("twoProportionZ matches the pooled closed form") {
    // a: 30/100 successes, b: 45/90
    val rows = (Seq.fill(30)(("a", 1)) ++ Seq.fill(70)(("a", 0)) ++
      Seq.fill(45)(("b", 1)) ++ Seq.fill(45)(("b", 0)))
    val r = row1(Hypothesis.twoProportionZ(rows.toDF("g", "y"), "y", "g", "a", "b"))
    val p = (30.0 + 45.0) / 190.0
    val z = (0.3 - 0.5) / math.sqrt(p * (1 - p) * (1.0 / 100 + 1.0 / 90))
    assert(math.abs(r.getAs[Double]("z_stat") - z) < 1e-12)
    assert(math.abs(r.getAs[Double]("p_a") - 0.3) < 1e-12)
    assert(math.abs(r.getAs[Double]("p_b") - 0.5) < 1e-12)
    val pv = 2 * new NormalDistribution()
      .cumulativeProbability(-math.abs(r.getAs[Double]("z_stat")))
    assert(pv > 0 && pv < 1)
  }

  test("twoProportionZ is zero for identical proportions") {
    val rows = Seq(("a", 1), ("a", 0), ("b", 1), ("b", 0))
    val r = row1(Hypothesis.twoProportionZ(rows.toDF("g", "y"), "y", "g", "a", "b"))
    assert(r.getAs[Double]("z_stat") == 0.0)
  }

  // ---- KS ----

  test("ksTest matches the brute-force ECDF maximum with ties") {
    val a = Seq(1.0, 2.0, 2.0, 3.0, 7.0)
    val b = Seq(2.0, 5.0, 6.0)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "x")
    val r = row1(Hypothesis.ksTest(df, "x", "g", "a", "b"))
    val support = (a ++ b).distinct.sorted
    val brute = support.map { v =>
      math.abs(a.count(_ <= v).toDouble / a.size - b.count(_ <= v).toDouble / b.size)
    }.max
    assert(math.abs(r.getAs[Double]("d_stat") - brute) < 1e-12)
    assert(r.getAs[Long]("n_a") == 5 && r.getAs[Long]("n_b") == 3)
  }

  test("ksTest is 0 on identical samples and 1 on disjoint supports") {
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)).toDF("g", "x")
    assert(row1(Hypothesis.ksTest(same, "x", "g", "a", "b"))
      .getAs[Double]("d_stat") == 0.0)
    val disj = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0), ("b", 20.0)).toDF("g", "x")
    assert(row1(Hypothesis.ksTest(disj, "x", "g", "a", "b"))
      .getAs[Double]("d_stat") == 1.0)
  }

  // ---- Spearman ----

  test("spearman matches the average-rank definition with ties") {
    val xs = Seq(1.0, 2.0, 2.0, 4.0, 5.0)
    val ys = Seq(2.0, 1.0, 3.0, 3.0, 5.0)
    val df = xs.zip(ys).toDF("x", "y")
    def avgRanks(v: Seq[Double]): Seq[Double] = {
      val sorted = v.sorted
      v.map { x =>
        val below = sorted.count(_ < x)
        val ties = sorted.count(_ == x)
        below + (ties + 1) / 2.0
      }
    }
    val rx = avgRanks(xs); val ry = avgRanks(ys)
    val n = xs.size
    val sx = rx.sum; val sy = ry.sum
    val qx = rx.map(r => r * r).sum; val qy = ry.map(r => r * r).sum
    val sxy = rx.zip(ry).map { case (p, q) => p * q }.sum
    val rho = (n * sxy - sx * sy) /
      math.sqrt((n * qx - sx * sx) * (n * qy - sy * sy))
    val r = row1(Hypothesis.spearman(df, "x", "y"))
    assert(math.abs(r.getAs[Double]("rho") - rho) < 1e-12)
    assert(r.getAs[Long]("n") == 5)
  }

  test("spearman is 1 on any monotone transform and -1 on a reversal") {
    val df = Seq(1.0, 3.0, 7.0, 20.0).map(x => (x, math.exp(x))).toDF("x", "y")
    assert(math.abs(row1(Hypothesis.spearman(df, "x", "y"))
      .getAs[Double]("rho") - 1.0) < 1e-12)
    val rev = Seq((1.0, 9.0), (2.0, 7.0), (3.0, 5.0), (4.0, 1.0)).toDF("x", "y")
    assert(math.abs(row1(Hypothesis.spearman(rev, "x", "y"))
      .getAs[Double]("rho") + 1.0) < 1e-12)
  }

  test("mannWhitney: U equals the brute-force pairwise count with tie credit") {
    val rows = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 5.0), ("a", 7.0),
      ("b", 2.0), ("b", 3.0), ("b", 3.0), ("b", 6.0), ("c", 99.0))
    val got = row1(Hypothesis.mannWhitney(rows.toDF("g", "v"), "v", "g", "a", "b"))
    val as = rows.filter(_._1 == "a").map(_._2)
    val bs = rows.filter(_._1 == "b").map(_._2)
    val brute = (for (x <- as; y <- bs)
      yield if (x > y) 1.0 else if (x == y) 0.5 else 0.0).sum
    assert(got.getAs[Double]("u_stat") === brute)
    assert(got.getAs[Long]("n_a") === as.size.toLong)
    assert(got.getAs[Long]("n_b") === bs.size.toLong)
    // tie-corrected z against the hand formula on the same pooled sample
    val na = as.size.toDouble; val nb = bs.size.toDouble; val n = na + nb
    val tie3 = (as ++ bs).groupBy(identity).values
      .map(g => math.pow(g.size, 3) - g.size).sum
    val refZ = (brute - na * nb / 2.0) /
      math.sqrt(na * nb / 12.0 * ((n + 1) - tie3 / (n * (n - 1))))
    assert(math.abs(got.getAs[Double]("z_stat") - refZ) < 1e-12)
  }

  test("mannWhitney: symmetric samples give z = 0, shifted samples a signed z") {
    val sym = ((1 to 20).map(i => ("a", i.toDouble)) ++
      (1 to 20).map(i => ("b", i.toDouble))).toDF("g", "v")
    assert(math.abs(row1(Hypothesis.mannWhitney(sym, "v", "g", "a", "b"))
      .getAs[Double]("z_stat")) < 1e-12)
    val shifted = ((1 to 20).map(i => ("a", i + 100.0)) ++
      (1 to 20).map(i => ("b", i.toDouble))).toDF("g", "v")
    assert(row1(Hypothesis.mannWhitney(shifted, "v", "g", "a", "b"))
      .getAs[Double]("z_stat") > 3.0)
  }

  test("bhAdjust matches R's p.adjust(method = 'BH') on a tied closed case") {
    // R: p.adjust(c(.01,.02,.04,.04,.3), 'BH') = .05 .05 .05 .05 .3
    val df = Seq(0.01, 0.02, 0.04, 0.04, 0.3).toDF("p")
    val out = Hypothesis.bhAdjust(df, "p").orderBy("p_value").collect()
    assert(out.map(_.getAs[Double]("p_value")).toSeq ===
      Seq(0.01, 0.02, 0.04, 0.3))
    assert(out.map(_.getAs[Long]("n_tests_at_p")).toSeq === Seq(1L, 1L, 2L, 1L))
    val q = out.map(_.getAs[Double]("q_value"))
    assert(math.abs(q(0) - 0.05) < 1e-12 && math.abs(q(1) - 0.05) < 1e-12)
    assert(math.abs(q(2) - 0.05) < 1e-12 && math.abs(q(3) - 0.3) < 1e-12)
  }

  test("bhAdjust: q is monotone in p, capped at 1, and q(max p) = max p · m/m") {
    val ps = (1 to 200).map(i => ((i * 37) % 100 + 1) / 100.0)
    val out = Hypothesis.bhAdjust(ps.toDF("p"), "p")
      .orderBy("p_value").collect()
    val q = out.map(_.getAs[Double]("q_value"))
    q.sliding(2).foreach { w =>
      if (w.size == 2) assert(w(0) <= w(1) + 1e-15, "q must be monotone in p") }
    assert(q.forall(_ <= 1.0 + 1e-15))
    // the largest p has rank m, so its raw c = p — before the cap
    assert(math.abs(q.last - math.min(1.0, ps.max)) < 1e-12)
  }

  test("spearman equals Spark's corr on the rank-transformed rows") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_quantity").cast("double").as("x"),
        col("l_extendedprice").cast("double").as("y"))
    val rho = row1(Hypothesis.spearman(li, "x", "y")).getAs[Double]("rho")
    // independent reference: rank via window functions, then corr
    import org.apache.spark.sql.expressions.Window
    val rkx = rank().over(Window.orderBy("x")) +
      (count(lit(1)).over(Window.partitionBy("x")) - 1) / 2.0
    val rky = rank().over(Window.orderBy("y")) +
      (count(lit(1)).over(Window.partitionBy("y")) - 1) / 2.0
    val ref = li.withColumn("rx", rkx).withColumn("ry", rky)
      .agg(corr("rx", "ry")).collect().head.getDouble(0)
    assert(math.abs(rho - ref) < 1e-9)
  }

  test("mcnemar matches R's continuity-corrected statistic on a closed case") {
    // 10 agreements, 6 A-only, 2 B-only: chi2 = (|6-2|-1)^2/8 = 1.125
    // (R: mcnemar.test(matrix(c(5,2,6,5),2)) -> X-squared = 1.125)
    val rows = Seq.fill(5)((true, true)) ++ Seq.fill(5)((false, false)) ++
      Seq.fill(6)((true, false)) ++ Seq.fill(2)((false, true))
    val r = Hypothesis.mcnemar(rows.toDF("a", "b"), "a", "b").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((6L, 2L, 10L)))
    assert(r.getDouble(3) === 1.125)
  }

  test("mcnemar: total agreement gives a null statistic; nulls drop") {
    val rows = Seq((Some(true), Some(true)), (Some(false), Some(false)),
      (None, Some(true)), (Some(true), None))
    val r = Hypothesis.mcnemar(rows.toDF("a", "b"), "a", "b").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((0L, 0L, 2L)))
    assert(r.isNullAt(3))
  }

  test("mcnemar is order-symmetric in its statistic") {
    val rows = Seq.fill(3)((true, false)) ++ Seq.fill(8)((false, true)) ++
      Seq.fill(4)((true, true))
    val df = rows.toDF("a", "b")
    val ab = Hypothesis.mcnemar(df, "a", "b").head().getDouble(3)
    val ba = Hypothesis.mcnemar(df, "b", "a").head().getDouble(3)
    assert(ab === ba)
  }

  // ---- covariate balance ----

  test("standardizedMeanDiff: closed two-covariate case") {
    // x1: treat {2,4} vs ctrl {1,3}: means 3 vs 2, both var 2 → smd = 1/√2
    // x2 identical in both arms → smd 0
    val rows = Seq((true, 2.0, 5.0), (true, 4.0, 7.0),
      (false, 1.0, 5.0), (false, 3.0, 7.0))
    val out = Hypothesis.standardizedMeanDiff(
        rows.toDF("tr", "x1", "x2"), "tr", Seq("x1", "x2"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("x1").getAs[Double]("mean_treat") === 3.0)
    assert(out("x1").getAs[Double]("mean_ctrl") === 2.0)
    assert(math.abs(out("x1").getAs[Double]("smd") - 1.0 / math.sqrt(2))
      < 1e-6)
    assert(out("x2").getAs[Double]("smd") === 0.0)
  }

  test("standardizedMeanDiff: zero pooled variance yields null") {
    val rows = Seq((true, 5.0), (true, 5.0), (false, 5.0), (false, 5.0))
    val out = Hypothesis.standardizedMeanDiff(rows.toDF("tr", "x"),
      "tr", Seq("x")).head()
    assert(out.isNullAt(out.fieldIndex("smd")))
  }

  test("standardizedMeanDiff is symmetric up to sign") {
    val rows = (1 to 40).map(i => (i % 2 == 0, i * 1.0 + (i % 3)))
    val df = rows.toDF("tr", "x")
    val a = Hypothesis.standardizedMeanDiff(df, "tr", Seq("x"))
      .head().getAs[Double]("smd")
    val flipped = df.select((!$"tr").as("tr"), $"x")
    val b = Hypothesis.standardizedMeanDiff(flipped, "tr", Seq("x"))
      .head().getAs[Double]("smd")
    assert(math.abs(a + b) < 1e-9)
  }

  // ---- diff-in-diff ----

  test("diffInDiff: closed 2x2 case recovers the planted effect") {
    // treat pre mean 10, post 25 (Δ 15); ctrl pre 20, post 24 (Δ 4);
    // did = 11
    val rows =
      Seq.fill(4)((true, false, 10.0)) ++ Seq.fill(2)((true, true, 25.0)) ++
      Seq.fill(3)((false, false, 20.0)) ++ Seq.fill(5)((false, true, 24.0))
    val r = Hypothesis.diffInDiff(rows.toDF("tr", "po", "v"), "tr", "po", "v")
      .head()
    assert(r.getAs[Long]("n_treat_pre") === 4L)
    assert(r.getAs[Double]("mean_treat_pre") === 10.0)
    assert(r.getAs[Double]("mean_ctrl_post") === 24.0)
    assert(r.getAs[Double]("did") === 11.0)
  }

  test("diffInDiff: parallel trends with no effect gives did = 0") {
    val rows = Seq((true, false, 5.0), (true, true, 8.0),
      (false, false, 15.0), (false, true, 18.0))
    val r = Hypothesis.diffInDiff(rows.toDF("tr", "po", "v"), "tr", "po", "v")
      .head()
    assert(r.getAs[Double]("did") === 0.0)
  }

  test("diffInDiff accepts 0/1 integer indicators") {
    val rows = Seq((1, 0, 5.0), (1, 1, 9.0), (0, 0, 1.0), (0, 1, 2.0))
    val r = Hypothesis.diffInDiff(rows.toDF("tr", "po", "v"), "tr", "po", "v")
      .head()
    assert(r.getAs[Double]("did") === 3.0)
  }

  // ---- SPRT ----

  test("sprt: closed-form LLR off cumulative counts, all-success drives H1") {
    // periods 1..3, 10 trials each, all successes; p0=0.5 vs p1=0.6
    val df = (1 to 3).flatMap(d => (1 to 10).map(_ => (d, 1)))
      .toDF("day", "s")
    val out = Hypothesis.sprt(df, "day", "s", p0 = 0.5, p1 = 0.6)
      .orderBy("day").collect()
    val l1 = math.log(0.6 / 0.5)
    out.zipWithIndex.foreach { case (r, i) =>
      val want = BigDecimal(10.0 * (i + 1) * l1)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("llr") - want) < 1e-9, s"day ${i + 1}")
    }
    // upper bound ln(0.8/0.05) = 2.77; 20 successes give llr 3.65
    assert(out(0).getAs[String]("decision") === "continue")
    assert(out(1).getAs[String]("decision") === "accept_h1")
    assert(out(2).getAs[String]("decision") === "accept_h1")
  }

  test("sprt: all-failure evidence accepts H0") {
    val df = (1 to 5).flatMap(d => (1 to 20).map(_ => (d, 0)))
      .toDF("day", "s")
    val out = Hypothesis.sprt(df, "day", "s", 0.5, 0.6)
      .orderBy("day").collect()
    assert(out.last.getAs[String]("decision") === "accept_h0")
    assert(out.last.getAs[Long]("x_cum") === 0L)
    assert(out.last.getAs[Long]("n_cum") === 100L)
  }

  test("sprt: p at the null keeps the test in the continue band") {
    // exactly half successes per period: llr = n/2·(l1+l0) drifts slowly
    // negative but stays inside the band for small n
    val df = (1 to 2).flatMap(d =>
      (1 to 10).map(i => (d, if (i <= 5) 1 else 0))).toDF("day", "s")
    val out = Hypothesis.sprt(df, "day", "s", 0.5, 0.6).collect()
    assert(out.forall(_.getAs[String]("decision") === "continue"))
  }

  test("sprt validates parameters and collapses duplicate periods") {
    intercept[IllegalArgumentException] {
      Hypothesis.sprt(Seq((1, 1)).toDF("d", "s"), "d", "s", 0.5, 0.5)
    }
    val df = Seq((1, 1), (1, 0), (2, 1)).toDF("d", "s")
    val out = Hypothesis.sprt(df, "d", "s", 0.4, 0.6).orderBy("d").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("n") === 2L)
  }

  test("permutation test: a planted large effect is significant") {
    // group A ~ 1000 + i, group B ~ 100 + i: huge separation
    val rows = (1 to 60).map(i => (i.toLong, 1000L + i % 7, "A")) ++
      (61 to 120).map(i => (i.toLong, 100L + i % 7, "B"))
    val df = rows.toDF("id", "v", "g")
    val r = Hypothesis.permutationTestMeanDiff(df, "v", "g", "A", "B",
      "id", nPerm = 99).head()
    assert(r.getAs[Long]("n_a") === 60L && r.getAs[Long]("n_b") === 60L)
    assert(math.abs(r.getAs[Double]("diff_obs") - 900.0) < 1.0)
    assert(r.getAs[Double]("p_value") === 0.01) // 1/(99+1): no extremes
    assert(r.getAs[Long]("n_extreme") === 0L)
  }

  test("permutation test: identical groups are not significant") {
    val rows = (1 to 50).map(i => (i.toLong, (i % 11).toLong, "A")) ++
      (51 to 100).map(i => (i.toLong, (i % 11).toLong, "B"))
    val df = rows.toDF("id", "v", "g")
    val r = Hypothesis.permutationTestMeanDiff(df, "v", "g", "A", "B",
      "id", nPerm = 99).head()
    assert(r.getAs[Double]("p_value") > 0.1,
      s"null effect must not look significant: ${r}")
  }

  test("permutation test is deterministic and partition-invariant") {
    val rows = (1 to 80).map(i =>
      (i.toLong, (i * 13 % 40).toLong, if (i % 2 == 0) "A" else "B"))
    val df = rows.toDF("id", "v", "g")
    val a = Hypothesis.permutationTestMeanDiff(df, "v", "g", "A", "B",
      "id", nPerm = 50).head()
    val b = Hypothesis.permutationTestMeanDiff(df.repartition(9), "v", "g",
      "A", "B", "id", nPerm = 50).head()
    assert(a === b)
  }

  test("benjaminiHochberg matches R p.adjust(method = 'BH')") {
    // R: p.adjust(c(0.01, 0.02, 0.03, 0.04, 0.2), "BH")
    //    = 0.05, 0.05, 0.05, 0.05, 0.2
    val df = Seq((1L, 0.01), (2L, 0.02), (3L, 0.03), (4L, 0.04),
      (5L, 0.2)).toDF("id", "p")
    val got = Hypothesis.benjaminiHochberg(df, "id", "p", alpha = 0.05)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(math.abs(got(1L)._1 - 0.05) < 1e-12 && got(1L)._2)
    assert(math.abs(got(4L)._1 - 0.05) < 1e-12 && got(4L)._2)
    assert(math.abs(got(5L)._1 - 0.2) < 1e-12 && !got(5L)._2)
  }

  test("benjaminiHochberg: ties, clipping at 1, null p dropped") {
    val df = Seq((1L, Some(0.5)), (2L, Some(0.5)), (3L, Some(0.9)),
      (4L, None)).toDF("id", "p")
    val out = Hypothesis.benjaminiHochberg(df, "id", "p").collect()
    assert(out.length === 3) // null dropped
    val got = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // m = 3: ranks over (0.5, 0.5, 0.9): adj = min suffix of
    // (3*.5/1, 3*.5/2, 3*.9/3) = (.75, .75, .9); tie rows equal
    assert(math.abs(got(1L) - 0.75) < 1e-12)
    assert(math.abs(got(2L) - 0.75) < 1e-12)
    assert(math.abs(got(3L) - 0.9) < 1e-12)
  }

  test("benjaminiHochberg is partition-invariant") {
    val df = (1 to 200).map(i => (i.toLong, (i % 37 + 1) / 40.0))
      .toDF("id", "p")
    val a = Hypothesis.benjaminiHochberg(df, "id", "p")
      .orderBy("id").collect().toSeq
    val b = Hypothesis.benjaminiHochberg(df.repartition(9), "id", "p")
      .orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("bootstrapMeanCI: interval brackets the mean, width tracks spread") {
    // values 0..99 (mean 49.5, sd ~29): CI must bracket the sample mean
    val df = (0 until 100).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    val r = Hypothesis.bootstrapMeanCI(df, "v", "id", nBoot = 200).head()
    val (mean, lo, hi) = (r.getAs[Double]("mean"),
      r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo < mean && mean < hi, s"$lo !< $mean !< $hi")
    assert(hi - lo > 1.0 && hi - lo < 30.0, s"width ${hi - lo}")
    // a constant column has a zero-width interval at the constant
    val const = (0 until 100).map(i => (i.toLong, 7L)).toDF("id", "v")
    val c = Hypothesis.bootstrapMeanCI(const, "v", "id", nBoot = 50).head()
    assert(c.getAs[Double]("ci_lo") == 7.0 && c.getAs[Double]("ci_hi") == 7.0)
  }

  test("bootstrapMeanCI rejects non-integral values; partition-invariant") {
    val dbl = Seq((1L, 1.5)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Hypothesis.bootstrapMeanCI(dbl, "v", "id")
    }
    val df = (0 until 60).map(i => (i.toLong, (i * 13 % 101).toLong))
      .toDF("id", "v")
    val a = Hypothesis.bootstrapMeanCI(df.repartition(1), "v", "id").head()
    val b = Hypothesis.bootstrapMeanCI(df.repartition(7), "v", "id").head()
    assert(a == b)
  }

  test("pairedTests: closed case with a zero difference and no ties") {
    // per-key diffs: k1 +2, k2 -1, k3 +3, k4 0 (counted in n, dropped
    // from the signed ranks); k5 appears only pre -> excluded entirely
    val df = Seq(
      ("k1", "pre", 5L), ("k1", "post", 3L),
      ("k2", "pre", 2L), ("k2", "post", 3L),
      ("k3", "pre", 6L), ("k3", "post", 3L),
      ("k4", "pre", 3L), ("k4", "post", 3L),
      ("k5", "pre", 9L)).toDF("k", "g", "v")
    val r = Hypothesis.pairedTests(df, "k", "v", "g", "pre", "post")
      .head()
    assert(r.getLong(0) === 4L && r.getLong(1) === 3L)
    assert(r.getDouble(2) === 1.0) // mean diff 4/4
    // t = 1 / sqrt(((14 - 16/4)/3)/4)
    val t = 1.0 / math.sqrt(((14.0 - 16.0 / 4) / 3) / 4)
    assert(math.abs(r.getDouble(3) - t) < 1e-6)
    assert(r.getDouble(4) === 5.0) // W+ = ranks 2 + 3
    val z = (5.0 - 3.0 * 4 / 4) / math.sqrt(3.0 * 4 * 7 / 24)
    assert(math.abs(r.getDouble(5) - z) < 1e-6)
  }

  test("pairedTests: tied |d| values take midranks") {
    // diffs +2, -2, +4: |d| ties at 2 -> doubled midranks 2*1.5 = 3
    // W2+ = 3 + 6 -> W+ = 4.5
    val df = Seq(
      ("a", "pre", 3L), ("a", "post", 1L),
      ("b", "pre", 1L), ("b", "post", 3L),
      ("c", "pre", 5L), ("c", "post", 1L)).toDF("k", "g", "v")
    val r = Hypothesis.pairedTests(df, "k", "v", "g", "pre", "post")
      .head()
    assert(r.getDouble(4) === 4.5)
  }

  test("pairedTests is partition-invariant on real events") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("g", when(col("event_id") % 2 === 0, "pre")
        .otherwise("post"))
      .withColumn("cents", round(col("value") * 100).cast("long"))
    val run = (p: Int) => Hypothesis.pairedTests(ev.repartition(p),
      "user_id", "cents", "g", "pre", "post").collect().toSeq
    assert(run(1) === run(7))
  }

  test("kendallTau: closed no-tie case nc=2 nd=1") {
    val df = Seq((1L, 1L), (2L, 3L), (3L, 2L)).toDF("x", "y")
    val r = row1(Hypothesis.kendallTau(df, "x", "y"))
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    // tau = (2-1)/sqrt(3*3)
    assert(r.getAs[Double]("tau_b") === rd6kt(1.0 / 3.0))
  }

  test("kendallTau: tie-corrected case is exactly 0; constant col null") {
    // x=[1,1,2,2], y=[1,2,1,2]: nc=1, nd=1, n0=6, n1=n2=2 -> tau_b=0
    val df = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("x", "y")
    val r = row1(Hypothesis.kendallTau(df, "x", "y"))
    assert(r.getAs[Double]("tau_b") === 0.0)
    val const = Seq((1L, 1L), (1L, 2L)).toDF("x", "y")
    assert(row1(Hypothesis.kendallTau(const, "x", "y")).isNullAt(2))
  }

  test("kendallTau: perfect concordance/reversal hit +/-1; brute parity") {
    val up = Seq((1L, 10L), (2L, 20L), (3L, 25L), (4L, 40L)).toDF("x", "y")
    assert(row1(Hypothesis.kendallTau(up, "x", "y"))
      .getAs[Double]("tau_b") === 1.0)
    val rng = new scala.util.Random(11)
    val rows = (1 to 60).map(_ => (rng.nextInt(6).toLong,
      rng.nextInt(5).toLong))
    val r = row1(Hypothesis.kendallTau(rows.toDF("x", "y"), "x", "y"))
    // brute-force tau-b over all pairs
    var nc = 0L; var nd = 0L; var tx = 0L; var ty = 0L
    for (i <- rows.indices; j <- rows.indices if i < j) {
      val ((x1, y1), (x2, y2)) = (rows(i), rows(j))
      if (x1 != x2 && y1 != y2) {
        if ((x1 < x2) == (y1 < y2)) nc += 1 else nd += 1
      } else if (x1 == x2 && y1 != y2) tx += 1
      else if (x1 != x2 && y1 == y2) ty += 1
      else { tx += 1; ty += 1 }
    }
    val n0 = rows.size.toLong * (rows.size - 1) / 2
    val tau = (nc - nd).toDouble /
      math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
    assert(r.getAs[Double]("tau_b") === rd6kt(tau))
  }

  test("kendallTau rejects float values and oversized cell frames loudly") {
    val fl = Seq((1.5, 2.0), (2.0, 3.0)).toDF("x", "y")
    intercept[Exception] { Hypothesis.kendallTau(fl, "x", "y").collect() }
    val many = (1L to 100L).map(i => (i, i)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      Hypothesis.kendallTau(many, "x", "y", maxCells = 10)
    }
  }

  test("kendallTau is partition-invariant on lineitem") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_quantity"),
        floor(col("l_discount") * 100).cast("long").as("d"))
    val run = (p: Int) => Hypothesis.kendallTau(li.repartition(p),
      "l_quantity", "d").collect().toSeq
    assert(run(1) === run(7))
  }

  private def rd6kt(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("cochranArmitage: closed increasing-trend case") {
    // score 0: 1/4, score 1: 2/4, score 2: 3/4 successes
    // N=12 R=6 A=8 B=12 C=20: num=24, var=36*(96/12)=288
    // z = 24/sqrt(288) = sqrt(2), chi2 = 2 exactly
    val rows = (Seq.fill(1)((true, 0L)) ++ Seq.fill(3)((false, 0L)) ++
      Seq.fill(2)((true, 1L)) ++ Seq.fill(2)((false, 1L)) ++
      Seq.fill(3)((true, 2L)) ++ Seq.fill(1)((false, 2L)))
    val r = row1(Hypothesis.cochranArmitage(rows.toDF("y", "s"), "y", "s"))
    assert(r.getLong(0) === 12L && r.getLong(1) === 6L && r.getLong(2) === 3L)
    assert(r.getAs[Double]("z_trend") === rd6kt(math.sqrt(2.0)))
    assert(r.getAs[Double]("chi2_trend") === 2.0)
  }

  test("cochranArmitage: flat rates give 0; degenerate inputs null") {
    val flat = (Seq.fill(2)((true, 0L)) ++ Seq.fill(2)((false, 0L)) ++
      Seq.fill(2)((true, 1L)) ++ Seq.fill(2)((false, 1L)))
    val r = row1(Hypothesis.cochranArmitage(flat.toDF("y", "s"), "y", "s"))
    assert(r.getAs[Double]("z_trend") === 0.0)
    val const = Seq((true, 5L), (false, 5L)).toDF("y", "s")
    assert(row1(Hypothesis.cochranArmitage(const, "y", "s")).isNullAt(3))
    val allTrue = Seq((true, 1L), (true, 2L)).toDF("y", "s")
    assert(row1(Hypothesis.cochranArmitage(allTrue, "y", "s")).isNullAt(3))
    val fl = Seq((true, 1.5)).toDF("y", "s")
    intercept[Exception] {
      Hypothesis.cochranArmitage(fl, "y", "s").collect()
    }
  }

  test("cochranArmitage is partition-invariant on lineitem") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select((col("l_returnflag") === "R").as("ret"), col("l_quantity"))
    val run = (p: Int) => Hypothesis.cochranArmitage(li.repartition(p),
      "ret", "l_quantity").collect().toSeq
    assert(run(1) === run(7))
  }

  test("cramerVonMises: closed separated case T = 0.375; identity 0") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "v")
    val r = row1(Hypothesis.cramerVonMises(df, "v", "g", "a", "b"))
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(r.getAs[Double]("t_cvm") === 0.375)
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("g", "v")
    assert(row1(Hypothesis.cramerVonMises(same, "v", "g", "a", "b"))
      .getAs[Double]("t_cvm") === 0.0)
  }

  test("cramerVonMises is a rank statistic: monotone-transform invariant") {
    val base = Seq(("a", 1.0), ("a", 5.0), ("a", 9.0),
      ("b", 2.0), ("b", 3.0), ("b", 7.0)).toDF("g", "v")
    val scaled = base.select(col("g"), (col("v") * 1000.0 + 5.0).as("v"))
    val t1 = row1(Hypothesis.cramerVonMises(base, "v", "g", "a", "b"))
      .getAs[Double]("t_cvm")
    val t2 = row1(Hypothesis.cramerVonMises(scaled, "v", "g", "a", "b"))
      .getAs[Double]("t_cvm")
    assert(t1 === t2 && t1 > 0.0)
  }

  test("cramerVonMises: empty side goes null; grid tracks the float form") {
    val onlyA = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val r = row1(Hypothesis.cramerVonMises(onlyA, "v", "g", "a", "b"))
    assert(r.isNullAt(2))
    // real data: the quantized statistic sits within 1e-4 of the direct
    // float evaluation (grid G > 1 kicks in at na*nb > 1e6)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val got = row1(Hypothesis.cramerVonMises(li, "l_extendedprice",
      "l_returnflag", "R", "A"))
    val rows = li.filter(col("l_returnflag").isin("R", "A"))
      .select(col("l_extendedprice").as("v"), col("l_returnflag").as("g"))
      .collect().map(r2 => (r2.getDouble(0), r2.getString(1)))
    val na = rows.count(_._2 == "R").toDouble
    val nb = rows.count(_._2 == "A").toDouble
    val byV = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (v, g) => (g.count(_._2 == "R"), g.count(_._2 == "A")) }
    var (cca, ccb, sum2) = (0.0, 0.0, 0.0)
    byV.foreach { case (ca, cb) =>
      cca += ca; ccb += cb
      val gap = cca / na - ccb / nb
      sum2 += (ca + cb) * gap * gap
    }
    val direct = na * nb / math.pow(na + nb, 2) * sum2
    assert(math.abs(got.getAs[Double]("t_cvm") - direct) < 1e-4,
      s"quantized ${got.getAs[Double]("t_cvm")} vs direct $direct")
  }

  test("cramerVonMises is partition-invariant") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val run = (p: Int) => Hypothesis.cramerVonMises(li.repartition(p),
      "l_quantity", "l_returnflag", "R", "A").collect().toSeq
    assert(run(1) === run(7))
  }
}
