package graft.functions

import graft.SparkSpec
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

class ErfSpec extends SparkSpec {
  import spark.implicits._

  private def registered() = { GraftExtensions.ensureRegistered(spark); spark }

  test("erf/erfc/erfinv resolve in SQL text and match commons-math") {
    registered()
    val xs = Seq(-3.0, -0.7, 0.0, 0.3, 1.0, 5.0)
    val got = spark.sql(
      "SELECT " + xs.map(x => s"erf(${x}d), erfc(${x}d)").mkString(", "))
      .head()
    xs.zipWithIndex.foreach { case (x, i) =>
      assert(got.getDouble(2 * i) ===
        org.apache.commons.math3.special.Erf.erf(x), s"erf($x)")
      assert(got.getDouble(2 * i + 1) ===
        org.apache.commons.math3.special.Erf.erfc(x), s"erfc($x)")
    }
    val inv = Seq(-0.99, -0.5, 0.0, 0.25, 0.9)
    val gotInv = spark.sql(
      "SELECT " + inv.map(x => s"erfinv(${x}d)").mkString(", ")).head()
    inv.zipWithIndex.foreach { case (x, i) =>
      assert(gotInv.getDouble(i) ===
        org.apache.commons.math3.special.Erf.erfInv(x), s"erfinv($x)")
    }
  }

  test("erfinv edge contract: ±1 to ±∞; null in, null out") {
    registered()
    val r = spark.sql(
      "SELECT erfinv(1.0d), erfinv(-1.0d), erf(CAST(NULL AS DOUBLE))").head()
    assert(r.getDouble(0).isPosInfinity && r.getDouble(1).isNegInfinity)
    assert(r.isNullAt(2))
  }

  test("pnorm column expression is bit-identical to NormalDistribution") {
    registered()
    val std =
      new org.apache.commons.math3.distribution.NormalDistribution(0.0, 1.0)
    // spans both branches: the 40σ cutoff and the erfc path, both signs
    val xs = Seq(-50.0, -41.0, -4.2, -1.0, -1e-12, 0.0, 0.33, 2.5, 41.0)
    val got = xs.toDF("x")
      .select(graft.glm.LinkFn.pnorm(col("x")).as("p"), col("x"))
      .collect().map(r => r.getDouble(1) -> r.getDouble(0)).toMap
    xs.foreach { x =>
      assert(got(x) === std.cumulativeProbability(x), s"pnorm($x)")
    }
  }

  test("pnorm(NaN) is NaN, matching NormalDistribution (not the 40σ branch)") {
    registered()
    // Spark's NaN ordering makes abs(NaN) > 40 true: without the isnan
    // guard the cutoff branch returned 1.0 here, silently hiding a
    // diverged probit eta
    val p = Seq(Double.NaN).toDF("x")
      .select(graft.glm.LinkFn.pnorm(col("x")).as("p")).head().getDouble(0)
    assert(p.isNaN, s"pnorm(NaN) = $p, want NaN")
    val std =
      new org.apache.commons.math3.distribution.NormalDistribution(0.0, 1.0)
    assert(std.cumulativeProbability(Double.NaN).isNaN)
  }

  test("qnorm column expression is bit-identical to NormalDistribution") {
    registered()
    val std =
      new org.apache.commons.math3.distribution.NormalDistribution(0.0, 1.0)
    val ps = Seq(1e-10, 0.025, 0.5, 0.6789, 0.975, 1.0 - 1e-12)
    val got = ps.toDF("p")
      .select(graft.glm.LinkFn.qnorm(col("p")).as("q"), col("p"))
      .collect().map(r => r.getDouble(1) -> r.getDouble(0)).toMap
    ps.foreach { p =>
      assert(got(p) === std.inverseCumulativeProbability(p), s"qnorm($p)")
    }
  }

  test("probit link stays inside whole-stage codegen (no ScalaUDF)") {
    registered()
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val eta = col("l_extendedprice").cast("double") / 100000.0 - 0.3
    val df = li.select(
      graft.glm.LinkFn.Probit.inverse(eta, lit(1.0)).as("mu"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan.take(500))
    assert(plan.contains("*("),
      "expected a WholeStageCodegen stage:\n" + plan.take(500))
  }

  test("interpreted eval matches codegen (literal-fold vs row path)") {
    registered()
    // a literal argument constant-folds through the interpreted eval;
    // the same value through a column rides codegen
    val lit1 = spark.sql("SELECT erf(0.7d), erfc(0.7d), erfinv(0.7d)").head()
    val row = Seq(0.7).toDF("x").select(
      call_function("erf", col("x")),
      call_function("erfc", col("x")),
      call_function("erfinv", col("x"))).head()
    (0 to 2).foreach(i => assert(lit1.getDouble(i) === row.getDouble(i)))
  }
}
