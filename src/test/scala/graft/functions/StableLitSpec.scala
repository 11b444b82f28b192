package graft.functions

import graft.SparkSpec
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

/** The r14 iteration-stable literal: arithmetic parity with `lit`,
  * survival of constant folding, type preservation, and the property it
  * exists for — two plans differing ONLY in stable_lit values generate
  * the same codegen source (observable via the codegen-cache hit: the
  * compilation counter must not advance on the second run).
  */
class StableLitSpec extends SparkSpec {

  private def registered() = { GraftExtensions.ensureRegistered(spark); spark }

  test("stable_lit(v) equals lit(v) bit for bit, and is NOT constant-folded") {
    registered()
    val df = spark.range(100).select(
      (col("id").cast("double") * call_function("stable_lit", lit(0.1)) +
        call_function("stable_lit", lit(-3.75))).as("a"),
      (col("id").cast("double") * lit(0.1) + lit(-3.75)).as("b"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // the optimized plan must still carry the stable_lit expression —
    // a folded plan would have inlined a plain Literal and the whole
    // codegen-reuse property collapses silently
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("stable_lit"), opt)
  }

  test("type preservation: long, int and string stable_lits") {
    registered()
    val r = spark.range(1).select(
      call_function("stable_lit", lit(7L)).as("l"),
      call_function("stable_lit", lit(3)).as("i"),
      call_function("stable_lit", lit("x#2")).as("s"),
      concat(lit("w"), call_function("stable_lit", lit(2))).as("c")).head()
    assert(r.getLong(0) === 7L)
    assert(r.getInt(1) === 3)
    assert(r.getString(2) === "x#2")
    assert(r.getString(3) === "w2")
  }

  test("null constant stays null") {
    registered()
    val r = spark.range(1).select(
      call_function("stable_lit", lit(null).cast("double")).as("n"),
      (call_function("stable_lit", lit(null).cast("double")) + lit(1.0))
        .as("n1")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("codegen reuse: changing only the stable_lit value does not recompile") {
    registered()
    def run(v: Double): Unit =
      spark.range(1000).select(
          sum(col("id").cast("double") * call_function("stable_lit", lit(v)))
            .as("s"))
        .write.format("noop").mode("overwrite").save()
    run(1.5) // first value: compiles the stage(s)
    val hist = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME
    val before = hist.getCount
    run(2.5) // same plan shape, new value: must hit the codegen cache
    assert(hist.getCount === before,
      s"stable_lit value change recompiled codegen " +
        s"(${hist.getCount - before} new compilations)")
    // CONTROL: the same loop with plain lit() must recompile — otherwise
    // this test proves nothing about what stable_lit buys
    def runLit(v: Double): Unit =
      spark.range(1000).select(
          sum(col("id").cast("double") * lit(v)).as("s"))
        .write.format("noop").mode("overwrite").save()
    runLit(1.5)
    val beforeLit = hist.getCount
    runLit(2.5)
    assert(hist.getCount > beforeLit,
      "plain lit() unexpectedly reused codegen — the stable_lit " +
        "assertion above is vacuous on this Spark version")
  }
}
