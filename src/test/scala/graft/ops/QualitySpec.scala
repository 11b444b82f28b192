package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def facts = Seq(
    (Some(1L), Some("a"), 5.0, "AB"),
    (Some(1L), Some("a"), 50.0, "AB"),   // dup key, out-of-range
    (Some(2L), Some("b"), 7.0, "xy"),    // pattern violation
    (Some(3L), None, 9.0, "CD"),         // null cat, fk orphan (3 not in dim)
    (None, Some("c"), -1.0, "EF")        // null id, out-of-range
  ).toDF("id", "cat", "x", "code")

  private def dim = Seq(1L, 2L).toDF("pk")

  test("report evaluates every rule kind with literal counts") {
    val out = Quality.report(facts, Seq(
      Quality.NotNull("id"), Quality.NotNull("cat"),
      Quality.Unique(Seq("id", "cat")),
      Quality.InRange("x", 0.0, 10.0),
      Quality.Matches("code", "^[A-Z]{2}$"),
      Quality.ForeignKey(dim, "id", "pk", "dim")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("not_null(id)") === 1L)
    assert(out("not_null(cat)") === 1L)
    assert(out("unique(id,cat)") === 1L)      // (1,a) appears twice
    assert(out("in_range(x,0.0,10.0)") === 2L) // 50.0 and -1.0
    assert(out("matches(code)") === 1L)        // "xy"
    assert(out("foreign_key(id->dim.pk)") === 1L) // id=3 (nulls skipped)
  }

  test("clean data yields zero violations everywhere") {
    val clean = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "cat", "x")
    val out = Quality.report(clean, Seq(
      Quality.NotNull("id"), Quality.Unique(Seq("id")),
      Quality.InRange("x", 0.0, 10.0),
      Quality.ForeignKey(Seq(1L, 2L, 3L).toDF("pk"), "id", "pk", "dim")))
      .agg(sum("violations")).head().getLong(0)
    assert(out === 0L)
  }

  test("scalar rules fuse into one scan (single FileScan, Expand for unique)") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val plan = Quality.report(li, Seq(
      Quality.NotNull("l_orderkey"),
      Quality.Unique(Seq("l_orderkey", "l_linenumber")),
      Quality.InRange("l_discount", 0.0, 0.1)))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("FileScan")) === 1,
      plan.take(1500))
  }

  test("report preserves rule order and rejects empty rule lists") {
    val out = Quality.report(facts, Seq(
      Quality.InRange("x", 0.0, 10.0), Quality.NotNull("id")))
      .collect().map(_.getString(0))
    assert(out.toSeq === Seq("in_range(x,0.0,10.0)", "not_null(id)"))
    intercept[IllegalArgumentException] { Quality.report(facts, Nil) }
  }
}
