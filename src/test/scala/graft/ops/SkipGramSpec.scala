package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkipGramSpec extends SparkSpec {
  import spark.implicits._

  test("pairs: closed ±2 window over a 3-token doc") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val got = SkipGram.pairs(df, "doc_id", "text", window = 2)
      .collect()
      .map(r => (r.getInt(1), r.getString(2), r.getString(3), r.getInt(4)))
      .toSet
    assert(got === Set(
      (0, "a", "b", 1), (1, "b", "a", 1),
      (1, "b", "c", 1), (2, "c", "b", 1),
      (0, "a", "c", 2), (2, "c", "a", 2)))
  }

  test("pairs: window clamps at doc edges; empty tokens drop") {
    val df = Seq((1L, "  x   y  ")).toDF("doc_id", "text")
    val got = SkipGram.pairs(df, "doc_id", "text", window = 3).collect()
    assert(got.length === 2) // (x,y) and (y,x), nothing else
    assert(got.map(_.getInt(1)).sorted.toSeq === Seq(0, 1))
    intercept[IllegalArgumentException] {
      SkipGram.pairs(df, "doc_id", "text", window = 0)
    }
  }

  test("unigramTable: closed 16:1 case tiles the cells 8:1") {
    // counts a=16, b=1 → weights 8000/1000; T=9 → a owns cells 0..7
    val df = Seq((1L, (Seq.fill(16)("a") ++ Seq("b")).mkString(" ")))
      .toDF("doc_id", "text")
    val tab = SkipGram.unigramTable(df, "text", tableSize = 9)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tab.size === 9)
    assert((0L to 7L).forall(tab(_) == "a") && tab(8L) === "b")
  }

  test("unigramTable tiles [0, T) exactly on the corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val tab = SkipGram.unigramTable(docs, "text", tableSize = 4096)
    assert(tab.count() === 4096L)
    assert(tab.select("cell").distinct().count() === 4096L)
    val mm = tab.agg(min("cell"), max("cell")).head()
    assert(mm.getLong(0) === 0L && mm.getLong(1) === 4095L)
  }

  test("unigramTable rejects an oversized vocabulary loudly") {
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      SkipGram.unigramTable(df, "text", tableSize = 16, maxVocab = 2)
    }
    assert(e.getMessage.contains("maxVocab"))
  }

  test("negativeSamples: negK rows per pair, deterministic, in-vocab") {
    val df = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val p = SkipGram.pairs(df, "doc_id", "text", window = 2)
    val tab = SkipGram.unigramTable(df, "text", tableSize = 64)
    val neg = SkipGram.negativeSamples(p, tab, 64, negK = 3)
    assert(neg.count() === p.count() * 3)
    val vocab = Set("a", "b", "c")
    assert(neg.select("negative").distinct().collect()
      .forall(r => vocab(r.getString(0))))
    // same pair → same negatives on any partitioning
    val run = (n: Int) => SkipGram.negativeSamples(
        p.repartition(n), tab, 64, negK = 3)
      .orderBy("doc", "pos", "dist", "center", "context", "k")
      .collect().toSeq
    assert(run(1) === run(5))
  }

  test("pairs are partition-invariant on documents") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 20 === 0)
    val run = (n: Int) => SkipGram.pairs(docs.repartition(n),
        "doc_id", "text", window = 2)
      .orderBy("doc", "pos", "dist", "center", "context")
      .collect().toSeq
    val a = run(1)
    assert(a === run(7) && a.nonEmpty)
  }
}
