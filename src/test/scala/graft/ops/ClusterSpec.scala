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
}
