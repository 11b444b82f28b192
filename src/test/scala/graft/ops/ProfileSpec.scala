package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("summarize: rows, nulls, distincts per column on a closed case") {
    val df = Seq(
      (Some("a"), Some(1.0)), (Some("a"), None),
      (Some("b"), Some(2.0)), (None, Some(2.0))
    ).toDF("s", "x")
    val out = Profile.summarize(df, Seq("s", "x")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("s") === ((4L, 1L, 2L)))
    assert(out("x") === ((4L, 1L, 2L)))
  }

  test("summarize matches independent per-column queries on the corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = Profile.summarize(docs, Seq("lang", "source")).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("lang") === docs.select("lang").distinct().count())
    assert(out("source") === docs.select("source").distinct().count())
  }

  test("summarize is one job — a single aggregation, no per-column scans") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val plan = Profile.summarize(docs, Seq("lang", "source", "n_chars"))
      .queryExecution.executedPlan.toString
    // the multi-countDistinct plans through ONE Expand over one scan
    assert(plan.linesIterator.count(_.contains("FileScan")) === 1, plan.take(1500))
    assert(plan.contains("Expand"), plan.take(1500))
  }

  test("summarize rejects unknown columns") {
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[IllegalArgumentException] { Profile.summarize(df, Seq("zz")) }
  }
}
