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
}
