package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DiffSpec extends SparkSpec {
  import spark.implicits._

  private def oldDf = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, null, 40.0)
  ).toDF("id", "name", "amt")

  private def newDf = Seq(
    (2L, "b", 20.0), (3L, "x", 30.0), (4L, null, 40.0), (5L, "d", 50.0)
  ).toDF("id", "name", "amt")

  test("tableDiff classifies added/removed/changed/unchanged") {
    val got = Diff.tableDiff(oldDf, newDf, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "unchanged", 5L -> "added"))
  }

  test("tableDiff: null values compare null-safely (null == null is a match)") {
    // id 4 has a null name on both sides and must be 'unchanged' (asserted
    // above); a null appearing on ONE side only is a change
    val newer = newDf.withColumn("name",
      when(col("id") === 4L, lit("now-set")).otherwise(col("name")))
    val got = Diff.tableDiff(oldDf, newer, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(4L) === "changed")
  }

  test("tableDiff works on composite keys and key-only tables") {
    val o = Seq((1L, 1L), (1L, 2L)).toDF("a", "b")
    val n = Seq((1L, 2L), (2L, 1L)).toDF("a", "b")
    val got = Diff.tableDiff(o, n, Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(got === Map((1L, 1L) -> "removed", (1L, 2L) -> "unchanged",
      (2L, 1L) -> "added"))
  }

  test("diffSummary counts match the row-level statuses") {
    val r = Diff.diffSummary(oldDf, newDf, Seq("id")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((1L, 1L, 1L, 2L)))
  }

  test("tableDiff rejects mismatched schemas and empty keys") {
    intercept[IllegalArgumentException] {
      Diff.tableDiff(oldDf, newDf.drop("amt"), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      Diff.tableDiff(oldDf, newDf, Seq.empty)
    }
  }

  test("columnChanges counts per-column diffs over matched keys only") {
    val got = Diff.columnChanges(oldDf, newDf, Seq("id"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // matched keys: 2, 3, 4; only id 3 changed (name), amt never
    assert(got === Map("name" -> ((1L, 3L)), "amt" -> ((0L, 3L))))
  }
}
