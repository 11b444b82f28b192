package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  // two exact integer-valued blobs: float sums are exact, so assignments
  // and centroids are deterministic bit-for-bit
  private def blobs = Seq(
    (1L, Array(0.0, 0.0)), (2L, Array(1.0, 0.0)), (3L, Array(0.0, 1.0)),
    (4L, Array(10.0, 10.0)), (5L, Array(11.0, 10.0)), (6L, Array(10.0, 11.0))
  ).toDF("vec_id", "embedding")

  test("kmeans: separates two blobs and recovers their means") {
    val res = Cluster.kmeans(blobs, "vec_id", "embedding", k = 2, maxIter = 10)
    val byCluster = res.assignments.collect()
      .map(r => r.getLong(0) -> r.getInt(r.fieldIndex("cluster"))).toMap
    assert(Set(1L, 2L, 3L).map(byCluster) .size === 1, "blob A split")
    assert(Set(4L, 5L, 6L).map(byCluster).size === 1, "blob B split")
    assert(byCluster(1L) !== byCluster(4L), "blobs merged")
    val means = res.centroids.map(_.toSeq).toSet
    assert(means === Set(Seq(1.0 / 3, 1.0 / 3), Seq(31.0 / 3, 31.0 / 3)))
    // inertia = Σ‖x−c‖²: each blob contributes 3 points at distance²
    // (2/9+2/9+... ) — compute directly
    val expected = Seq(
      (0.0, 0.0), (1.0, 0.0), (0.0, 1.0)).map { case (x, y) =>
        math.pow(x - 1.0 / 3, 2) + math.pow(y - 1.0 / 3, 2) }.sum * 2
    assert(math.abs(res.inertia - expected) < 1e-9)
  }

  test("kmeans: converges early and is partition-invariant") {
    val res = Cluster.kmeans(blobs, "vec_id", "embedding", k = 2, maxIter = 20)
    assert(res.iterations < 20, "should converge well before the cap")
    val res7 = Cluster.kmeans(blobs.repartition(7), "vec_id", "embedding",
      k = 2, maxIter = 20)
    assert(res.centroids.map(_.toSeq).toSet ===
      res7.centroids.map(_.toSeq).toSet)
  }

  test("kmeans: empty cluster keeps its centroid, no crash") {
    // 3 centroids over 2 distinct points: one centroid never wins a point
    val df = Seq((1L, Array(0.0)), (2L, Array(0.0)), (3L, Array(100.0)),
      (4L, Array(100.0))).toDF("vec_id", "embedding")
    val res = Cluster.kmeans(df, "vec_id", "embedding", k = 3, maxIter = 5)
    assert(res.centroids.length === 3)
    val clusters = res.assignments.collect()
      .map(_.getInt(res.assignments.columns.indexOf("cluster"))).toSet
    assert(clusters.size <= 3)
  }

  test("kmeans on the embeddings table: every row assigned, k clusters used") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val res = Cluster.kmeans(emb, "vec_id", "embedding", k = 4, maxIter = 5)
    val n = emb.count()
    assert(res.assignments.count() === n)
    val sizes = res.assignments.groupBy("cluster").count().collect()
    assert(sizes.map(_.getLong(1)).sum === n)
    assert(res.inertia >= 0.0)
  }

  test("semanticDedup keeps the smallest id of each duplicate group") {
    // 4 is colinear with 1 (cosine exactly 1.0); everything else distinct
    val df = (Seq(
      (1L, Array(1.0, 2.0)), (2L, Array(5.0, 0.1)), (3L, Array(0.1, 7.0)),
      (4L, Array(2.0, 4.0)),   // colinear with 1 -> cosine 1.0
      (5L, Array(-3.0, -1.0))
    )).toDF("vec_id", "embedding")
    val out = Cluster.semanticDedup(df, "vec_id", "embedding", k = 1,
        threshold = 0.999, maxIter = 4)
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 2L, 3L, 5L), "4 is colinear with 1; 1 survives")
  }

  test("semanticDedup misses nothing when k=1 and drops nothing below threshold") {
    val df = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0)), (3L, Array(-1.0, 0.5))
    ).toDF("vec_id", "embedding")
    val out = Cluster.semanticDedup(df, "vec_id", "embedding", k = 1,
      threshold = 0.999, maxIter = 3).collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 2L, 3L))
  }

  test("semanticDedup: oversized clusters are skipped (cap honored)") {
    val df = (1L to 20L).map(i => (i, Array(1.0, 1.0 + i * 1e-9)))
      .toDF("vec_id", "embedding")
    // cap below the cluster size: nothing can pair, everything survives
    val out = Cluster.semanticDedup(df, "vec_id", "embedding", k = 1,
      threshold = 0.9, maxIter = 2, maxClusterSize = 10)
    assert(out.count() === 20L)
    // with the cap lifted the near-identical fan collapses to one row
    val collapsed = Cluster.semanticDedup(df, "vec_id", "embedding", k = 1,
      threshold = 0.9, maxIter = 2, maxClusterSize = 1000)
    assert(collapsed.count() === 1L)
  }

  test("semanticDedup transitively merges chains across pairs") {
    // a-b and b-c similar, a-c slightly less: components still merge all 3
    val df = Seq(
      (10L, Array(1.0, 0.00)), (11L, Array(1.0, 0.02)),
      (12L, Array(1.0, 0.04)), (13L, Array(0.0, 1.0))
    ).toDF("vec_id", "embedding")
    val out = Cluster.semanticDedup(df, "vec_id", "embedding", k = 1,
      threshold = 0.9995, maxIter = 2).collect().map(_.getLong(0)).toSet
    assert(out === Set(10L, 13L))
  }

  // --- DBSCAN ---

  private def dbscanFixture = {
    // two dense blobs + one far-out noise point; eps = 1.5, minPts = 3
    // blob A: unit cross around (0,0); blob B: around (10,10); noise (50,50)
    Seq(
      (1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 0.0, 1.0), (4L, -1.0, 0.0),
      (5L, 10.0, 10.0), (6L, 11.0, 10.0), (7L, 10.0, 11.0),
      (8L, 50.0, 50.0)
    ).toDF("id", "x", "y")
  }

  test("dbscan: two blobs cluster, far point is noise, labels are min ids") {
    val out = Cluster.dbscan(dbscanFixture, "id", "x", "y",
        eps = 1.5, minPts = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert((1L to 4L).forall(i => out(i)._2.contains(1L)))
    assert((5L to 7L).forall(i => out(i)._2.contains(5L)))
    assert(out(8L) == (false, None))
    assert(out(1L)._1, "hub of blob A is core")
  }

  test("dbscan: border point attaches to the min core neighbor's cluster") {
    // degrees at eps=1.5 (self counts): 1→2, 2→3, 3→3, 9→2; cores {2, 3}
    // form one component with min label 2; 1 and 9 are border points of it
    val df = Seq(
      (1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 2.0, 0.0), (9L, 3.2, 0.0)
    ).toDF("id", "x", "y")
    val out = Cluster.dbscan(df, "id", "x", "y", eps = 1.5, minPts = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(out(2L)._1 && out(2L)._2.contains(2L))
    assert(out(3L)._1 && out(3L)._2.contains(2L))
    assert(!out(1L)._1 && out(1L)._2.contains(2L), "border joins cluster 2")
    assert(!out(9L)._1 && out(9L)._2.contains(2L), "border joins cluster 2")
  }

  test("dbscan: isolated core (minPts=1 singleton) labels itself") {
    val df = Seq((7L, 0.0, 0.0), (8L, 100.0, 100.0)).toDF("id", "x", "y")
    val out = Cluster.dbscan(df, "id", "x", "y", eps = 1.0, minPts = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(7L -> 7L, 8L -> 8L))
  }

  test("dbscan: hot-cell guard fails loudly") {
    val df = (1L to 50L).map(i => (i, 0.0, 0.0)).toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      Cluster.dbscan(df, "id", "x", "y", eps = 1.0, minPts = 3,
        maxCellSize = 10)
    }
    assert(e.getMessage.contains("maxCellSize"))
  }

  test("dbscan: cross-cell neighbors are found (grid is only blocking)") {
    // points straddle a cell boundary at x = eps
    val df = Seq((1L, 0.9, 0.0), (2L, 1.1, 0.0), (3L, 1.3, 0.0))
      .toDF("id", "x", "y")
    val out = Cluster.dbscan(df, "id", "x", "y", eps = 1.0, minPts = 3)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out.values.forall(_.contains(1L)), s"all one cluster: $out")
  }

  test("dbscan is partition-invariant") {
    val a = Cluster.dbscan(dbscanFixture.repartition(1), "id", "x", "y",
      eps = 1.5, minPts = 3).orderBy("id").collect().toSeq
    val b = Cluster.dbscan(dbscanFixture.repartition(5), "id", "x", "y",
      eps = 1.5, minPts = 3).orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("simplifiedSilhouette: closed two-centroid geometry") {
    val cents = Array(Array(0.0, 0.0), Array(10.0, 0.0))
    val df = Seq(Seq(0.0f, 1.0f), Seq(10.0f, 1.0f), Seq(5.0f, 0.0f))
      .map(Tuple1(_)).toDF("v")
    val got = Cluster.simplifiedSilhouette(df, "v", cents)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getAs[Double]("silhouette")))).toMap
    // (0,1): a=1, b=sqrt(101) → s=(b−1)/b; the midpoint (5,0) ties
    // a=b=5 → s=0 and lands in cluster 0 (tie to the lower index)
    val s01 = (math.sqrt(101.0) - 1.0) / math.sqrt(101.0)
    val q = math.rint(s01 * 1e6) / 1e6 // micro quantization
    def rd4(v: Double) = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0)._1 === 2L, "midpoint ties into cluster 0")
    assert(got(0)._2 === rd4((q + 0.0) / 2))
    assert(got(1)._1 === 1L && got(1)._2 === rd4(q))
  }

  test("simplifiedSilhouette: separation orders the score; guard fires") {
    val rng = new scala.util.Random(3)
    def blob(cx: Double, cy: Double, n: Int) = (1 to n).map(_ =>
      Seq((cx + rng.nextGaussian() * 0.1).toFloat,
        (cy + rng.nextGaussian() * 0.1).toFloat))
    val tight = (blob(0, 0, 40) ++ blob(50, 0, 40)).map(Tuple1(_)).toDF("v")
    val loose = (blob(0, 0, 40) ++ blob(1.0, 0, 40)).map(Tuple1(_)).toDF("v")
    val cT = Array(Array(0.0, 0.0), Array(50.0, 0.0))
    val cL = Array(Array(0.0, 0.0), Array(1.0, 0.0))
    val sT = Cluster.simplifiedSilhouette(tight, "v", cT)
      .agg(avg("silhouette")).head().getDouble(0)
    val sL = Cluster.simplifiedSilhouette(loose, "v", cL)
      .agg(avg("silhouette")).head().getDouble(0)
    assert(sT > 0.9 && sT > sL, s"tight $sT must beat loose $sL")
    intercept[IllegalArgumentException] {
      Cluster.simplifiedSilhouette(tight, "v", Array(Array(0.0)))
    }
  }

  test("simplifiedSilhouette on the kmeans fit covers every cluster") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val res = Cluster.kmeans(emb, "vec_id", "embedding", k = 4, maxIter = 5)
    val sil = Cluster.simplifiedSilhouette(emb, "embedding", res.centroids)
      .collect()
    assert(sil.map(_.getLong(1)).sum === emb.count())
    sil.foreach { r =>
      val v = r.getAs[Double]("silhouette")
      assert(v >= 0.0 && v <= 1.0, s"cluster ${r.getInt(0)}: $v")
    }
  }
}
