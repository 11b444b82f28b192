package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewTfIdfSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals the plain groupBy for any salt") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val plain = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    Seq(1, 4, 64).foreach { salt =>
      Skew.saltedSumCount(li, Seq("l_returnflag"), "l_quantity", salt)
        .collect().foreach { r =>
          val (s, n) = plain(r.getString(0))
          assert(math.abs(r.getDouble(1) - s) < 1e-6, s"salt=$salt sum")
          assert(r.getLong(2) === n, s"salt=$salt count")
        }
    }
  }

  test("tf-idf: rare terms outscore ubiquitous terms at equal tf") {
    val docs = Seq(
      (1L, "common rare1"), (2L, "common rare2"), (3L, "common rare3"),
      (4L, "common rare4")).toDF("doc_id", "text")
    val scores = TextOps.tfIdf(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(scores((1L, "rare1")) > scores((1L, "common")))
    // df of "common" is 4, of each rare term 1
    val out = TextOps.tfIdf(docs, "doc_id", "text")
      .filter($"term" === "common").select("df").head().getLong(0)
    assert(out === 4L)
  }

  test("tf counts repeated terms within a document") {
    val docs = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val tf = TextOps.tfIdf(docs, "doc_id", "text")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(tf("a") === 3L && tf("b") === 1L)
  }
}
