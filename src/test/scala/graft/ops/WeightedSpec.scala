package graft.ops

import graft.SparkSpec

class WeightedSpec extends SparkSpec {
  import spark.implicits._

  test("weightedQuantiles: lower-quantile convention on a closed case") {
    // masses: 1->1, 2->3, 5->2, 9->4 (W=10); cum: 1,4,6,10
    val df = Seq((1.0, 1L), (2.0, 2L), (2.0, 1L), (5.0, 2L), (9.0, 4L))
      .toDF("v", "w")
    val got = Weighted.weightedQuantiles(df, "v", "w",
        Seq(0.1, 0.4, 0.5, 0.61, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got(0.1) === 1.0)  // cum 1 >= 1
    assert(got(0.4) === 2.0)  // cum 4 >= 4 (exact boundary takes the value)
    assert(got(0.5) === 5.0)  // need cum >= 5 -> value 5 (cum 6)
    assert(got(0.61) === 9.0) // need 6.1 -> 9
    assert(got(1.0) === 9.0)
  }

  test("weightedQuantiles: equal weights match the unweighted lower quantile") {
    val xs = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val df = xs.map((_, 1L)).toDF("v", "w")
    val got = Weighted.weightedQuantiles(df, "v", "w", Seq(0.5))
      .head().getDouble(1)
    // lower median of 8 values = 4th smallest (cum 4 >= 4)
    assert(got === xs.sorted.apply(3))
  }

  test("weightedQuantiles drops null rows and rejects bad levels") {
    val df = Seq((Some(1.0), Some(1L)), (None, Some(5L)), (Some(9.0), None),
      (Some(2.0), Some(1L))).toDF("v", "w")
    val got = Weighted.weightedQuantiles(df, "v", "w", Seq(1.0))
      .head().getDouble(1)
    assert(got === 2.0)
    intercept[IllegalArgumentException] {
      Weighted.weightedQuantiles(df, "v", "w", Seq(0.0))
    }
  }

  test("weightedQuantiles is partition-invariant") {
    val df = (1 to 500).map(i => (i.toDouble % 37, (i % 5 + 1).toLong))
      .toDF("v", "w")
    val a = Weighted.weightedQuantiles(df, "v", "w", Seq(0.25, 0.5, 0.75))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val b = Weighted.weightedQuantiles(df.repartition(11), "v", "w",
      Seq(0.25, 0.5, 0.75)).collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(a === b)
  }
}
