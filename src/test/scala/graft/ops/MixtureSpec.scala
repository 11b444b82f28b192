package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  // two planted 2-D blobs, deterministic grid offsets — no RNG
  private def blobs: Seq[(Long, Seq[Float])] = {
    val offs = for (a <- -2 to 2; b <- -2 to 2) yield (a * 0.03, b * 0.03)
    offs.zipWithIndex.flatMap { case ((dx, dy), i) =>
      Seq(
        (i.toLong * 2, Seq((0.3 + dx).toFloat, (0.3 + dy).toFloat)),
        (i.toLong * 2 + 1, Seq((-0.3 + dx).toFloat, (-0.3 + dy).toFloat)))
    }
  }

  test("recovers two planted blobs: means, weights, assignment") {
    val df = blobs.toDF("id", "vec")
    val m = Mixture.fitGmmDiag(df, "id", "vec", dims = 2, k = 2,
      iters = 5)
    // one cluster near (0.3, 0.3), the other near (-0.3, -0.3)
    val byMean = m.means.sortBy(_.head)
    assert(math.abs(byMean(0)(0) + 0.3) < 0.05, byMean(0).toSeq)
    assert(math.abs(byMean(0)(1) + 0.3) < 0.05)
    assert(math.abs(byMean(1)(0) - 0.3) < 0.05)
    // balanced blobs → weights near 1/2
    assert(m.pi.forall(p => math.abs(p - 0.5) < 0.05), m.pi.toSeq)
    // hard assignment separates the blobs exactly (they are far apart)
    val assigned = m.assign(df).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val even = blobs.filter(_._1 % 2 == 0).map(b => assigned(b._1)).distinct
    val odd = blobs.filter(_._1 % 2 == 1).map(b => assigned(b._1)).distinct
    assert(even.size === 1 && odd.size === 1 && even != odd)
  }

  test("variances track the planted spread") {
    val df = blobs.toDF("id", "vec")
    val m = Mixture.fitGmmDiag(df, "id", "vec", dims = 2, k = 2,
      iters = 5)
    // per-blob variance of the 5x5 grid at step .03:
    // E[d²] with d in {-.06,-.03,0,.03,.06} uniformly = 0.0018
    for (z <- 0 until 2; j <- 0 until 2)
      assert(math.abs(m.vars(z)(j) - 0.0018) < 6e-4,
        s"var($z)($j)=${m.vars(z)(j)}")
  }

  test("clusters align with the planted embedding labels") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nLabels = e.select("label").distinct().count().toInt
    val m = Mixture.fitGmmDiag(e, "vec_id", "embedding", dims = 8,
      k = nLabels, iters = 4)
    // majority-label purity of the hard assignment: well above chance
    val assigned = m.assign(e).select(col("label"), col("cluster"))
    val purity = assigned.groupBy("cluster", "label").count()
      .groupBy("cluster").agg(max("count").as("top"),
        sum("count").as("tot"))
      .agg(sum("top"), sum("tot")).head()
    val frac = purity.getLong(0).toDouble / purity.getLong(1)
    assert(frac > 1.5 / nLabels, s"purity=$frac vs chance=${1.0 / nLabels}")
  }

  test("fit is partition-invariant (content-keyed seeds, integer cells)") {
    val df = blobs.toDF("id", "vec")
    val a = Mixture.fitGmmDiag(df.repartition(1), "id", "vec", 2, 2, 3)
    val b = Mixture.fitGmmDiag(df.repartition(7), "id", "vec", 2, 2, 3)
    assert(a.means.map(_.toSeq).toSeq === b.means.map(_.toSeq).toSeq)
    assert(a.vars.map(_.toSeq).toSeq === b.vars.map(_.toSeq).toSeq)
    assert(a.pi.toSeq === b.pi.toSeq)
    assert(a.weightMicro.toSeq === b.weightMicro.toSeq)
  }

  test("too few rows rejects loudly") {
    intercept[IllegalArgumentException] {
      Mixture.fitGmmDiag(Seq((1L, Seq(0.1f, 0.2f))).toDF("id", "vec"),
        "id", "vec", dims = 2, k = 2)
    }
  }
}
