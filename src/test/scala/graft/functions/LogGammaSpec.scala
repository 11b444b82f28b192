package graft.functions

import graft.SparkSpec
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

class LogGammaSpec extends SparkSpec {
  import spark.implicits._

  private def registered() = { GraftExtensions.ensureRegistered(spark); spark }

  test("lgamma resolves in SQL text and matches known values") {
    registered()
    // Γ(5) = 24, Γ(1) = Γ(2) = 1, Γ(0.5) = sqrt(π)
    val r = spark.sql(
      "SELECT lgamma(5.0d), lgamma(1.0d), lgamma(2.0d), lgamma(0.5d)")
      .head()
    assert(math.abs(r.getDouble(0) - math.log(24.0)) < 1e-12)
    assert(r.getDouble(1) === 0.0 && r.getDouble(2) === 0.0)
    assert(math.abs(r.getDouble(3) - 0.5 * math.log(math.Pi)) < 1e-12)
  }

  test("expression is bit-identical to the shared scalar entry point") {
    registered()
    val xs = Seq(0.5, 1.0, 2.5, 10.0, 100.5, 1234.0)
    val got = xs.toDF("x")
      .select(call_function("lgamma", col("x")).as("lg"))
      .collect().map(_.getDouble(0))
    xs.zip(got).foreach { case (x, g) =>
      assert(g === LogGamma.lgamma(x), s"x=$x")
    }
  }

  test("null in, null out; int arguments implicit-cast to double") {
    registered()
    val r = spark.sql("SELECT lgamma(CAST(NULL AS DOUBLE)) AS lg").head()
    assert(r.isNullAt(0))
    val i = spark.sql("SELECT lgamma(5) AS lg").head().getDouble(0)
    assert(math.abs(i - math.log(24.0)) < 1e-12)
  }

  test("lgamma participates in whole-stage codegen (no UDF in the plan)") {
    registered()
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val df = li.select(call_function("lgamma",
      col("l_quantity").cast("double") + lit(1.0)).as("lf"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan.take(500))
    assert(plan.contains("*("),
      "expected a WholeStageCodegen stage:\n" + plan.take(500))
  }

  test("the GLM composites match their direct log-gamma formulas") {
    registered()
    val df = Seq((10.0, 3.0)).toDF("m", "y")
    val r = df.select(
      graft.glm.GLM.logChoose(col("m"), col("y")).as("lc"),
      graft.glm.GLM.logFactorial(col("y")).as("lf"),
      graft.glm.GLM.logGammaRatio(col("y"), lit(2.5)).as("lr")).head()
    assert(math.abs(r.getDouble(0) - math.log(120.0)) < 1e-10) // C(10,3)
    assert(math.abs(r.getDouble(1) - math.log(6.0)) < 1e-12)   // 3!
    assert(r.getDouble(2) ===
      LogGamma.lgamma(3.0 + 2.5) - LogGamma.lgamma(2.5))
  }
}
