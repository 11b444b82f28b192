package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("zscore: mean 0, population sd 1; constant column stays finite") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0).toDF("x")
    val z = Normalize.zscore(df, "x").select("z").collect().map(_.getDouble(0))
    assert(math.abs(z.sum) < 1e-12)
    assert(math.abs(z.map(v => v * v).sum / z.length - 1.0) < 1e-12)
    val const = Normalize.zscore(Seq(7.0, 7.0, 7.0).toDF("x"), "x")
      .select("z").collect().map(_.getDouble(0))
    assert(const.forall(_ == 0.0))
  }

  test("minmax maps onto [0,1] with endpoints hit") {
    val df = Seq(10.0, 20.0, 15.0, 30.0).toDF("x")
    val s = Normalize.minmax(df, "x").orderBy("x").select("scaled")
      .collect().map(_.getDouble(0))
    assert(s.head === 0.0 && s.last === 1.0)
    assert(math.abs(s(1) - 0.25) < 1e-12)
  }

  test("ecdf equals cume_dist on a tied sample and survives repartitioning") {
    val df = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0).toDF("x")
    val got = Normalize.ecdf(df.repartition(5), "x")
      .select("x", "ecdf").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val ref = df.withColumn("cd",
        cume_dist().over(org.apache.spark.sql.expressions.Window.orderBy("x")))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got.keySet === ref.keySet)
    ref.foreach { case (v, cd) => assert(math.abs(got(v) - cd) < 1e-12, s"x=$v") }
  }

  test("row count passes through ecdf (no drop on duplicates)") {
    val df = Seq(1.0, 1.0, 2.0, 2.0, 2.0).toDF("x")
    assert(Normalize.ecdf(df, "x").count() === 5L)
  }
}
