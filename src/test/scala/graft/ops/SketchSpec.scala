package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def keys = (Seq.fill(100)("hot") ++ (1 to 50).map(i => s"k$i"))
    .toDF("k")

  test("estimates always over-count, never under-count") {
    val sk = Sketch.countMin(keys, "k", width = 32, depth = 3)
    val exact = keys.groupBy("k").count()
    val est = Sketch.countMinEstimate(sk, exact, "k", width = 32, depth = 3)
    val bad = est.join(exact, "k")
      .filter(col("estimate") < col("count")).count()
    assert(bad === 0, "count-min must never under-estimate")
  }

  test("a wide sketch is exact for a small key set") {
    val sk = Sketch.countMin(keys, "k", width = 4096, depth = 4)
    val exact = keys.groupBy("k").count()
    val diff = Sketch.countMinEstimate(sk, exact, "k", 4096, 4)
      .join(exact, "k")
      .filter(col("estimate") =!= col("count")).count()
    assert(diff === 0, "with w >> keys, all 4 rows should be collision-free")
  }

  test("unseen keys estimate zero (wide sketch) and sketch size is bounded") {
    val sk = Sketch.countMin(keys, "k", width = 4096, depth = 3)
    assert(sk.count() <= 3L * 4096)
    val unseen = Seq("never-seen-a", "never-seen-b").toDF("k")
    val est = Sketch.countMinEstimate(sk, unseen, "k", 4096, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.values.forall(_ === 0L))
  }

  test("weighted build counts each row weight times") {
    val wdf = Seq(("a", 5L), ("a", 2L), ("b", 1L)).toDF("k", "w")
    val sk = Sketch.countMin(wdf, "k", width = 1024, depth = 3,
      weightCol = Some("w"))
    val est = Sketch.countMinEstimate(sk, Seq("a", "b").toDF("k"), "k",
      1024, 3).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("a") === 7L && est("b") === 1L)
  }

  test("sketch build is deterministic and partition-invariant") {
    def cells(df: org.apache.spark.sql.DataFrame) =
      Sketch.countMin(df, "k", width = 64, depth = 3)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    assert(cells(keys) === cells(keys.repartition(11)))
  }

  test("hll: estimate tracks true distinct within the m=512 error band") {
    val n = 5000L
    val df = (1L to n).map(i => s"key-$i").toDF("k")
      .unionByName((1L to n / 2).map(i => s"key-$i").toDF("k")) // dups
    val est = Sketch.hllEstimate(Sketch.hllRegisters(df, "k", 9), 9)
      .head().getAs[Double]("estimate")
    // sigma = 1.04/sqrt(512) ~ 4.6%; allow 3 sigma
    assert(math.abs(est - n) / n < 0.14, s"estimate $est for true $n")
  }

  test("hll: linear-counting branch fires for small cardinalities") {
    val df = (1L to 40L).map(i => s"u$i").toDF("k")
    val row = Sketch.hllEstimate(Sketch.hllRegisters(df, "k", 9), 9).head()
    val v = row.getAs[Long]("v_zero")
    assert(v > 0L)
    val expected = 512.0 * math.log(512.0 / v)
    assert(math.abs(row.getAs[Double]("estimate") - expected) < 1e-4,
      "small range must read m ln(m/V)")
  }

  test("hll small-p readout uses the paper's alpha constants") {
    // p=4 (m=16): Flajolet et al. pin alpha_16 = 0.673, not the
    // asymptotic 0.7213/(1+1.079/16) ~ 0.6756 — recompute the raw
    // readout from the collected registers and require the paper value
    val df = (1L to 3000L).map(i => s"key-$i").toDF("k")
    val row = Sketch.hllEstimate(Sketch.hllRegisters(df, "k", 4), 4).head()
    assert(row.getAs[Long]("v_zero") === 0L, "3000 keys fill 16 buckets")
    val m = 16.0
    val sScaled = row.getAs[Long]("s_scaled").toDouble
    val expected = 0.673 * m * m * math.pow(2.0, 57) / sScaled
    assert(math.abs(row.getAs[Double]("estimate") - expected) < 1e-4,
      "p=4 raw estimate must use alpha_16 = 0.673")
  }

  test("hll registers are mergeable: max of halves equals whole") {
    val df = (1L to 1000L).map(i => s"key-$i").toDF("k")
    val a = Sketch.hllRegisters(df.filter(length(col("k")) <= 6), "k", 7)
    val b = Sketch.hllRegisters(df.filter(length(col("k")) > 6), "k", 7)
    val merged = a.unionByName(b).groupBy("bucket")
      .agg(max("r").as("r"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val whole = Sketch.hllRegisters(df, "k", 7)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(merged === whole)
  }

  test("hllEstimateByGroup tracks per-group exact distincts") {
    val df = (1L to 4000L).map(i => (s"g${i % 3}", s"key-$i"))
      .toDF("g", "k")
    val est = Sketch.hllEstimateByGroup(df, "g", "k", 9)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("estimate"))
      .toMap
    val exact = df.groupBy("g").agg(countDistinct("k").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n) / n < 0.14,
        s"group $g: est ${est(g)} vs exact $n")
    }
    // grouped readout ≡ per-group global readout
    val solo = Sketch.hllEstimate(
      Sketch.hllRegisters(df.filter(col("g") === "g1"), "k", 9), 9)
      .head().getAs[Double]("estimate")
    assert(est("g1") === solo)
  }

  test("hll registers are partition-invariant with bounded rank range") {
    val df = (1L to 3000L).map(i => s"id-$i").toDF("k")
    val a = Sketch.hllRegisters(df.repartition(1), "k", 9)
      .orderBy("bucket").collect().toSeq
    val b = Sketch.hllRegisters(df.repartition(13), "k", 9)
      .orderBy("bucket").collect().toSeq
    assert(a === b)
    a.foreach(r => assert(r.getInt(1) >= 1 && r.getInt(1) <= 52))
  }
}
