package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackSpec extends SparkSpec {
  import spark.implicits._

  test("chunkAssign lays documents head-to-tail with zero waste") {
    val docs = Seq((1L, 300L), (2L, 500L), (3L, 600L), (4L, 100L), (5L, 1200L))
      .toDF("doc_id", "n_tok")
    val out = Pack.chunkAssign(docs, "n_tok", "doc_id", budget = 512)
      .orderBy("doc_id").collect()
    // exclusive running sums: 0, 300, 800, 1400, 1500
    assert(out.map(_.getAs[Long]("start_offset")).toSeq ===
      Seq(0L, 300L, 800L, 1400L, 1500L))
    assert(out.map(_.getAs[Long]("chunk")).toSeq === Seq(0L, 0L, 1L, 2L, 2L))
    assert(out.map(_.getAs[Long]("pos")).toSeq === Seq(0L, 300L, 288L, 376L, 476L))
    // doc 5: starts at pos 476, 1200 tokens → spans ceil(1676/512) = 4 windows
    assert(out.map(_.getAs[Long]("n_chunks")).toSeq === Seq(1L, 2L, 2L, 1L, 4L))
  }

  test("assignment is partition-invariant and total tokens are preserved") {
    val docs = (1 to 997).map(i => (i.toLong, (i % 37 + 1).toLong))
      .toDF("doc_id", "n_tok")
    val a = Pack.chunkAssign(docs, "n_tok", "doc_id", 256)
      .select("doc_id", "chunk", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = Pack.chunkAssign(docs.repartition(13), "n_tok", "doc_id", 256)
      .select("doc_id", "chunk", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    // the last doc's start + its tokens equals the total token count
    val total = docs.agg(sum("n_tok")).head().getLong(0)
    val last = Pack.chunkAssign(docs, "n_tok", "doc_id", 256)
      .orderBy(col("doc_id").desc).limit(1)
      .select(col("start_offset") + col("n_tok")).head().getLong(0)
    assert(last === total)
  }

  test("chunkAssign rejects a non-positive budget") {
    val docs = Seq((1L, 10L)).toDF("doc_id", "n_tok")
    intercept[IllegalArgumentException] {
      Pack.chunkAssign(docs, "n_tok", "doc_id", 0)
    }
  }
}
