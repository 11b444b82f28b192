package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffling fact tables on the join key at write time so
  * repeated joins run WITHOUT an exchange — the core co-located-join
  * technique for 100 TB fact-to-fact joins.
  */
class BucketingSpec extends SparkSpec {

  test("a join between co-bucketed tables has no shuffle exchange") {
    val tmp = Files.createTempDirectory("graft_buckets").toString
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    o.write.mode("overwrite").option("path", s"$tmp/o")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    c.write.mode("overwrite").option("path", s"$tmp/c")
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      val joinSection = plan.split("HashAggregate").last // below the agg
      assert(joinSection.contains("SortMergeJoin"), plan.take(800))
      assert(!joinSection.contains("Exchange"),
        "co-bucketed join should not shuffle:\n" + plan.take(1500))
      // sanity: same result as the plain join
      val expect = o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      j.collect().foreach { r => assert(expect(r.getString(0)) === r.getLong(1)) }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
