package graft.glm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GroupedLMSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

  test("per-group fit equals an independent LM.fit per group") {
    val grouped = GroupedLM.fit(li, Seq("l_returnflag"), Seq("l_quantity"), "l_extendedprice")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    grouped.keys.foreach { flag =>
      val single = LM.fit(li.filter($"l_returnflag" === flag),
        Seq("l_quantity"), "l_extendedprice")
      val (b0, b1, r2, n) = grouped(flag)
      assert(math.abs(b0 - single.coefs(0)) < 1e-6 * math.max(1, math.abs(b0)), s"$flag b0")
      assert(math.abs(b1 - single.coefs(1)) < 1e-8 * math.max(1, math.abs(b1)), s"$flag b1")
      assert(math.abs(r2 - single.r2) < 1e-9, s"$flag r2")
      assert(n === single.n)
    }
  }

  test("per-group standard errors equal an independent LM.fit per group") {
    val grouped = GroupedLM.fit(li, Seq("l_returnflag"), Seq("l_quantity"), "l_extendedprice")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("se_intercept"), r.getAs[Double]("se_l_quantity"))).toMap
    grouped.keys.foreach { flag =>
      val single = LM.fit(li.filter($"l_returnflag" === flag),
        Seq("l_quantity"), "l_extendedprice")
      val (se0, se1) = grouped(flag)
      assert(math.abs(se0 - single.stdErr(0)) < 1e-8 * single.stdErr(0), s"$flag se0")
      assert(math.abs(se1 - single.stdErr(1)) < 1e-8 * single.stdErr(1), s"$flag se1")
    }
  }

  test("multi-regressor grouped fit matches per-group LM") {
    val g = GroupedLM.fit(li, Seq("l_linestatus"), Seq("l_quantity", "l_discount"),
      "l_extendedprice").collect()
    g.foreach { r =>
      val flag = r.getString(0)
      val single = LM.fit(li.filter($"l_linestatus" === flag),
        Seq("l_quantity", "l_discount"), "l_extendedprice")
      (0 until 3).foreach { i =>
        assert(math.abs(r.getDouble(1 + i) - single.coefs(i)) <
          1e-6 * math.max(1, math.abs(single.coefs(i))), s"$flag coef $i")
      }
    }
  }

  test("underdetermined groups produce NaN coefficients, not failures") {
    val tiny = Seq((1L, "a", 1.0, 2.0), (2L, "a", 2.0, 4.0), (3L, "b", 1.0, 1.0))
      .toDF("id", "g", "x", "y")
    val out = GroupedLM.fit(tiny, Seq("g"), Seq("x"), "y")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("b").isNaN) // 1 row < 2 params
  }

  test("exactly-determined groups get the exact-fit line (n == p)") {
    // 2 points, intercept + 1 feature: the line through (1,3) and (3,7)
    // is y = 1 + 2x — well-defined, zero residual (DuckDB regr_slope agrees)
    val tiny = Seq(("a", 1.0, 3.0), ("a", 3.0, 7.0)).toDF("g", "x", "y")
    val row = GroupedLM.fit(tiny, Seq("g"), Seq("x"), "y").head()
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12) // b_intercept
    assert(math.abs(row.getDouble(2) - 2.0) < 1e-12) // b_x
    assert(row.getDouble(3) === 1.0)                 // r2 exactly 1
    assert(row.getLong(4) === 2L)
    assert(row.getDouble(5).isNaN)                   // sigma: 0 residual df
  }

  test("predictWithSe equals the single-model LM.predictWithSe per group") {
    val betas = GroupedLM.fit(li, Seq("l_returnflag"), Seq("l_quantity"),
      "l_extendedprice", kernel = true)
    val scored = GroupedLM.predictWithSe(betas, li, Seq("l_returnflag"),
        Seq("l_quantity"), interval = "confidence")
      .select($"l_returnflag", $"l_quantity", $"prediction", $"se_fit", $"lwr", $"upr")
      .collect()
    val flags = scored.map(_.getString(0)).distinct
    flags.foreach { flag =>
      val sub = li.filter($"l_returnflag" === flag)
      val m = LM.fit(sub, Seq("l_quantity"), "l_extendedprice")
      val ref = m.predictWithSe(sub, interval = "confidence")
        .select($"l_quantity", $"prediction", $"se_fit", $"lwr", $"upr")
        .collect()
        .map(r => r.getDouble(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
        .toMap
      scored.filter(_.getString(0) == flag).take(30).foreach { r =>
        val (p, se, lw) = ref(r.getDouble(1))
        assert(math.abs(r.getDouble(2) - p) < 1e-6 * (1 + math.abs(p)), s"$flag pred")
        assert(math.abs(r.getDouble(3) - se) < 1e-6 * (1 + se), s"$flag se")
        assert(math.abs(r.getDouble(4) - lw) < 1e-6 * (1 + math.abs(lw)), s"$flag lwr")
      }
    }
  }

  test("predictWithSe marks unknown groups NaN and requires the kernel") {
    val betas = GroupedLM.fit(li, Seq("l_returnflag"), Seq("l_quantity"),
      "l_extendedprice", kernel = true)
    val alien = Seq(("Z", 10.0)).toDF("l_returnflag", "l_quantity")
    val r = GroupedLM.predictWithSe(betas, alien, Seq("l_returnflag"),
      Seq("l_quantity")).select("prediction", "se_fit").head()
    assert(r.getDouble(0).isNaN && r.getDouble(1).isNaN)
    val noKernel = GroupedLM.fit(li, Seq("l_returnflag"), Seq("l_quantity"),
      "l_extendedprice")
    val e = intercept[IllegalArgumentException] {
      GroupedLM.predictWithSe(noKernel, li, Seq("l_returnflag"), Seq("l_quantity"))
    }
    assert(e.getMessage.contains("kernel"))
  }

  test("weighted grouped fit honors the weight column") {
    val w2 = li.withColumn("w", lit(2.0))
    val a = GroupedLM.fit(li, Seq("l_returnflag"), Seq("l_quantity"), "l_extendedprice")
    val b = GroupedLM.fit(w2, Seq("l_returnflag"), Seq("l_quantity"), "l_extendedprice",
      weightCol = Some("w"))
    val ja = a.select($"l_returnflag", $"b_l_quantity".as("ba")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    b.select($"l_returnflag", $"b_l_quantity").collect().foreach { r =>
      // constant weights don't change the solution
      assert(math.abs(r.getDouble(1) - ja(r.getString(0))) < 1e-9)
    }
  }
}
