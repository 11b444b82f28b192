package graft.ops

import graft.SparkSpec

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
}
