package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")

  test("saltedJoin equals the plain inner join for any salt") {
    val o = orders.select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, Seq("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    Seq(1, 4, 32).foreach { salt =>
      val got = JoinOps.saltedJoin(li, o, Seq("l_orderkey"), col("l_linenumber"), salt)
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
        .collect()
      assert(got.length === plain.size, s"salt=$salt group count")
      got.foreach { r =>
        val (s, n) = plain(r.getString(0))
        assert(math.abs(r.getDouble(1) - s) < 1e-6, s"salt=$salt sum")
        assert(r.getLong(2) === n, s"salt=$salt count")
      }
    }
  }

  test("saltedJoin drops the salt column and keeps both sides' columns") {
    val o = orders.select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val cols = JoinOps.saltedJoin(li, o, Seq("l_orderkey"), col("l_linenumber"), 4).columns
    assert(!cols.contains("__salt"))
    assert(cols.contains("l_quantity") && cols.contains("o_orderpriority"))
  }

  test("bloomPrunedJoin equals the plain inner join") {
    val part = spark.read.parquet(s"$sfDir/part.parquet").filter(col("p_size") >= 48)
    val plain = li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = JoinOps.bloomPrunedJoin(li, part, "l_partkey", "p_partkey",
        expectedItems = 1000L)
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === plain)
  }

  test("bloomPrunedJoin prefilter passes every matching key (no false negatives)") {
    val dim = Seq(2L, 4L, 6L).toDF("k")
    val fact = (1L to 100L).toDF("fk")
    val joined = JoinOps.bloomPrunedJoin(fact, dim, "fk", "k", expectedItems = 10L)
      .select("fk").as[Long].collect().sorted
    assert(joined === Array(2L, 4L, 6L))
  }

  test("bloomPrunedJoin routes null fact keys out before the filter UDF") {
    val dim = Seq(1L, 2L).toDF("k")
    val fact = Seq(Some(1L), None, Some(2L), Some(99L)).toDF("fk")
    val out = JoinOps.bloomPrunedJoin(fact, dim, "fk", "k", expectedItems = 10L)
      .select("fk").as[Long].collect().sorted
    assert(out === Array(1L, 2L))
  }
}
