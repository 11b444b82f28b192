package graft.glm

import graft.SparkSpec
import graft.ops.Tree
import org.apache.spark.sql.functions._

class ExplainSpec extends SparkSpec {
  import spark.implicits._

  test("linearAttribution: exact closed case and share normalization") {
    // x1 ∈ {0,2} (mean 1, mean abs dev 1); x2 ∈ {0,4} (mean 2, dev 2)
    val df = Seq((0.0, 0.0), (2.0, 4.0), (0.0, 4.0), (2.0, 0.0))
      .toDF("x1", "x2")
    val out = Explain.linearAttribution(df, Seq("x1", "x2"),
        Array(7.0, 3.0, -1.0))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out("x1") == ((3.0, 3.0, 0.6)))  // |3|·1 = 3; 3/(3+2)
    assert(out("x2") == ((-1.0, 2.0, 0.4))) // |−1|·2 = 2
  }

  test("linearAttribution rejects a mis-sized coefficient vector") {
    val df = Seq((1.0, 2.0)).toDF("x1", "x2")
    intercept[IllegalArgumentException] {
      Explain.linearAttribution(df, Seq("x1", "x2"), Array(1.0, 2.0))
    }
  }

  test("partialDependence: intervention on a boosted stump flips branches") {
    val df = (1 to 10).map(i => (i.toDouble, if (i > 5) 1.0 else 0.0))
      .toDF("x1", "y")
    val m = Tree.fitBoostedStumps(df, Seq("x1"), "y", rounds = 1,
      learningRate = 1.0)
    val pd = Explain.partialDependence(df, Seq(3.0, 8.0),
        g => m.predictMicroExprWith(f => if (f == "x1") g else col(f)))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // forcing x1 = 3 routes EVERY row left (delta 0); x1 = 8 right (1e6)
    assert(pd(3.0) == 0.0 && pd(8.0) == 1000000.0)
  }

  test("partialDependence evaluates the whole grid in one scan") {
    val df = (1 to 100).map(i => (i.toDouble, i.toDouble)).toDF("x1", "y")
    val grid = (1 to 20).map(_.toDouble)
    val out = Explain.partialDependence(df, grid, g => g * 2.0)
    assert(out.count() == 20)
    // constant-in-rows score: pd(g) = 2g exactly
    assert(out.collect().forall(r => r.getDouble(1) == r.getDouble(0) * 2))
  }
}
