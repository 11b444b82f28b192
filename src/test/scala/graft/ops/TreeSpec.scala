package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TreeSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    // y = 1 iff x1 > 5 (x2 is noise constant enough to never win)
    (1.0, 10.0, 0), (2.0, 10.0, 0), (3.0, 10.0, 0), (4.0, 10.0, 0),
    (5.0, 20.0, 0), (6.0, 10.0, 1), (7.0, 20.0, 1), (8.0, 10.0, 1),
    (9.0, 20.0, 1), (10.0, 10.0, 1)
  ).toDF("x1", "x2", "y")

  test("stump finds the separating threshold and pure leaves") {
    val m = Tree.fit(fixture, Seq("x1", "x2"), "y", maxDepth = 1)
    val root = m.nodes.find(_.path == "").get
    assert(root.feature.contains("x1"))
    assert(root.threshold.contains(5.0))
    val l = m.nodes.find(_.path == "L").get
    val r = m.nodes.find(_.path == "R").get
    assert(l.n == 5 && l.pos == 0 && l.pred == 0)
    assert(r.n == 5 && r.pos == 5 && r.pred == 1)
  }

  test("predict is a pure projection matching the training labels") {
    val m = Tree.fit(fixture, Seq("x1", "x2"), "y", maxDepth = 1)
    val wrong = m.predict(fixture)
      .where(col("pred") =!= col("y")).count()
    assert(wrong == 0)
    // no join/shuffle in the scoring plan
    val plan = m.predict(fixture).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("depth-2 recovers a nested rule: y = (x1 > 5) && (x2 > 3)") {
    val rows = for (x1 <- 1 to 10; x2 <- 1 to 6)
      yield (x1.toDouble, x2.toDouble, if (x1 > 5 && x2 > 3) 1 else 0)
    val df = rows.toDF("x1", "x2", "y")
    val m = Tree.fit(df, Seq("x1", "x2"), "y", maxDepth = 2)
    val root = m.nodes.find(_.path == "").get
    assert(root.feature.contains("x1") && root.threshold.contains(5.0))
    // left child is pure (x1 <= 5 → y = 0): no further split
    assert(m.nodes.find(_.path == "L").get.feature.isEmpty)
    val r = m.nodes.find(_.path == "R").get
    assert(r.feature.contains("x2") && r.threshold.contains(3.0))
    assert(m.predict(df).where(col("pred") =!= col("y")).count() == 0)
  }

  test("pure and too-small nodes do not split; minLeaf respected") {
    val pure = Seq((1.0, 0), (2.0, 0), (3.0, 0)).toDF("x1", "y")
    assert(Tree.fit(pure, Seq("x1"), "y").nodes.map(_.path) == Seq(""))
    val m = Tree.fit(fixture, Seq("x1", "x2"), "y", maxDepth = 1,
      minLeaf = 6L)
    assert(m.nodes.find(_.path == "").get.feature.isEmpty)
  }

  test("tie-break is (score desc, feature asc, value asc)") {
    // x1 and xa give identical perfect splits; 'x1' < 'xa' lexicographically
    val df = Seq((1.0, 1.0, 0), (2.0, 2.0, 0), (3.0, 3.0, 1), (4.0, 4.0, 1))
      .toDF("xa", "x1", "y")
    val m = Tree.fit(df, Seq("xa", "x1"), "y", maxDepth = 1)
    assert(m.nodes.find(_.path == "").get.feature.contains("x1"))
  }

  test("binned mode bounds candidates and still separates clean data") {
    val rows = (1 to 400).map(i => (i.toDouble, if (i > 200) 1 else 0))
    val df = rows.toDF("x1", "y")
    val m = Tree.fit(df, Seq("x1"), "y", maxDepth = 1, bins = Some(8))
    val root = m.nodes.find(_.path == "").get
    assert(root.feature.contains("x1"))
    // 8 fixed-width bins over [1, 400]: the chosen edge is a bin edge and
    // the split is within one bin width of the true boundary
    val th = root.threshold.get
    assert(math.abs(th - 200.0) <= (400.0 - 1.0) / 8 + 1e-9)
    assert(m.predict(df).where(col("pred") =!= col("y")).count() <= 50)
  }

  test("partition invariance") {
    val df = fixture
    val a = Tree.fit(df.repartition(1), Seq("x1", "x2"), "y").toDF(spark)
    val b = Tree.fit(df.repartition(7), Seq("x1", "x2"), "y").toDF(spark)
    assert(a.collect().toSeq == b.collect().toSeq)
  }

  // --- gradient-boosted stumps ---

  test("boosted stumps: one round at lr=1 nails a separable step") {
    val m = Tree.fitBoostedStumps(fixture, Seq("x1", "x2"), "y",
      rounds = 1, learningRate = 1.0)
    assert(m.stumps.length == 1)
    val st = m.stumps.head
    assert(st.feature == "x1" && st.threshold == 5.0)
    assert(st.deltaL == 0L && st.deltaR == 1000000L)
    val wrong = m.predict(fixture)
      .where(abs(col("pred") - col("y")) > 1e-9).count()
    assert(wrong == 0)
  }

  test("boosted stumps: residual fitting reduces SSE round over round") {
    // y has two steps — one stump can't fit both, three rounds get close
    val rows = (1 to 60).map { i =>
      val x = i.toDouble
      (x, if (x > 40) 2.0 else if (x > 20) 1.0 else 0.0)
    }
    val df = rows.toDF("x1", "y")
    def sse(rounds: Int): Double = {
      val m = Tree.fitBoostedStumps(df, Seq("x1"), "y", rounds = rounds,
        learningRate = 1.0)
      m.predict(df).select(
        sum(pow(col("pred") - col("y"), 2.0))).head().getDouble(0)
    }
    val s1 = sse(1); val s2 = sse(2); val s3 = sse(3)
    assert(s2 < s1 && s3 < s2)
    // each round fits one boundary of the other step's residual pattern:
    // SSE shrinks geometrically (×1/4 here), not to zero in finite rounds
    assert(s3 <= s1 / 10.0, s"expected ≥10x SSE reduction, got $s1 -> $s3")
  }

  test("boosted stumps: constant label stops immediately") {
    val df = Seq((1.0, 1.0), (2.0, 1.0), (3.0, 1.0)).toDF("x1", "y")
    val m = Tree.fitBoostedStumps(df, Seq("x1"), "y", rounds = 3)
    assert(m.stumps.isEmpty)
    // prediction falls back to 0 (the F_0 baseline)
    assert(m.predict(df).select(max(abs(col("pred")))).head()
      .getDouble(0) == 0.0)
  }

  test("boosted stumps are partition-invariant") {
    val rows = (1 to 60).map { i =>
      (i.toDouble, (i % 7).toDouble, if (i > 30) 1.0 else 0.0)
    }
    val df = rows.toDF("x1", "x2", "y")
    val a = Tree.fitBoostedStumps(df.repartition(1), Seq("x1", "x2"), "y",
      rounds = 3).stumps
    val b = Tree.fitBoostedStumps(df.repartition(7), Seq("x1", "x2"), "y",
      rounds = 3).stumps
    assert(a == b && a.nonEmpty)
  }

  test("weighted fit equals the unweighted fit on row-expanded data") {
    val weighted = Seq((1.0, 0, 3L), (2.0, 0, 1L), (3.0, 1, 2L),
      (2.5, 1, 2L), (1.5, 0, 2L)).toDF("x", "y", "w")
    val expanded = Seq((1.0, 0, 3L), (2.0, 0, 1L), (3.0, 1, 2L),
        (2.5, 1, 2L), (1.5, 0, 2L))
      .flatMap { case (x, y, w) => Seq.fill(w.toInt)((x, y)) }
      .toDF("x", "y")
    val a = Tree.fit(weighted, Seq("x"), "y", maxDepth = 2,
      weightCol = Some("w")).nodes.sortBy(_.path)
    val b = Tree.fit(expanded, Seq("x"), "y", maxDepth = 2)
      .nodes.sortBy(_.path)
    assert(a === b)
  }

  test("zero-weight rows are invisible, including to the binned range") {
    val withZero = Seq((1.0, 0, 1L), (2.0, 0, 1L), (3.0, 1, 1L),
      (4.0, 1, 1L), (100.0, 1, 0L)).toDF("x", "y", "w")
    val without = Seq((1.0, 0, 1L), (2.0, 0, 1L), (3.0, 1, 1L),
      (4.0, 1, 1L)).toDF("x", "y", "w")
    val a = Tree.fit(withZero, Seq("x"), "y", maxDepth = 1,
      bins = Some(4), weightCol = Some("w")).nodes
    val b = Tree.fit(without, Seq("x"), "y", maxDepth = 1,
      bins = Some(4), weightCol = Some("w")).nodes
    assert(a === b)
    // a 100-spanning binned range would put the split edge past 4.0
    assert(a.head.threshold.exists(_ <= 4.0))
  }

  test("forest: separable data scores the classes 0 and 1 exactly") {
    val rows = (1 to 80).map(i => (i.toLong, i.toDouble,
      if (i > 40) 1 else 0))
    val df = rows.toDF("id", "x", "y")
    val f = Tree.fitForest(df, Seq("x"), "y", "id", nTrees = 3,
      maxDepth = 1)
    assert(f.trees.size === 3)
    // every bag still separates perfectly → every leaf rate is 0 or 1
    val scored = f.predict(df).select(col("x"), col("score"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(scored(5.0) === 0.0)
    assert(scored(75.0) === 1.0)
  }

  test("forest training is partition-invariant (md5 bag weights)") {
    val rows = (1 to 60).map(i =>
      (i.toLong, (i % 13).toDouble, (i % 7).toDouble,
        if (i % 3 == 0) 1 else 0))
    val df = rows.toDF("id", "x1", "x2", "y")
    val a = Tree.fitForest(df.repartition(1), Seq("x1", "x2"), "y", "id",
      nTrees = 3, maxDepth = 2).trees.map(_.nodes.sortBy(_.path))
    val b = Tree.fitForest(df.repartition(7), Seq("x1", "x2"), "y", "id",
      nTrees = 3, maxDepth = 2).trees.map(_.nodes.sortBy(_.path))
    assert(a === b)
  }
}
