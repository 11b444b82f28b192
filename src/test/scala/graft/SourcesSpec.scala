package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source/sink round-trips: parquet is exercised everywhere; this covers
  * JSON (the reference's only file source) and CSV, plus partitioned
  * parquet writes (the sink layout used for scale-out reads).
  */
class SourcesSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("JSON round-trip preserves rows and values") {
    val dir = Files.createTempDirectory("graft_json").toString
    docs.limit(50).write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() === 50)
    val a = docs.limit(50).select("doc_id", "lang").orderBy("doc_id").collect()
    val b = back.select("doc_id", "lang").orderBy("doc_id").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("CSV round-trip with header and explicit schema") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
    sup.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(sup.schema).csv(dir)
    assert(back.orderBy("s_suppkey").collect().map(_.toSeq).toSeq ===
      sup.orderBy("s_suppkey").collect().map(_.toSeq).toSeq)
  }

  test("ORC round-trip preserves rows, values, and pushes filters") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
    sup.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.orderBy("s_suppkey").collect().map(_.toSeq).toSeq ===
      sup.orderBy("s_suppkey").collect().map(_.toSeq).toSeq)
    // predicate pushdown reaches the ORC scan too
    val plan = back.filter(col("s_acctbal") > 1000.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("s_acctbal"), plan.take(600))
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = Files.createTempDirectory("graft_part").toString
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("lang") === "en")
    // partition pruning: the scan should read only the lang=en directory
    val scan = one.queryExecution.executedPlan.toString
    assert(one.count() === docs.filter(col("lang") === "en").count())
    assert(scan.contains("PartitionFilters: [isnotnull(lang"), scan.take(600))
  }

  test("range-clustered write produces files with disjoint key ranges") {
    val dir = Files.createTempDirectory("graft_clustered").toString
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    graft.ops.Layout.writeRangeClustered(li, dir, Seq("l_shipdate"), 4)
    val files = spark.read.parquet(dir).inputFiles
    assert(files.length >= 3, s"expected >=3 clustered files, got ${files.length}")
    // each file must cover a slice of the key space that does not reach
    // into the next file's interior — the property footer-stats skipping
    // relies on (boundary values may be shared by sampling ties)
    // NTZ timestamps come back as LocalDateTime; ISO strings order the same
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("l_shipdate").cast("string"), max("l_shipdate").cast("string")).head()
      (r.getString(0), r.getString(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, prevMax), (nextMin, _)) =>
        assert(prevMax <= nextMin,
          s"file ranges overlap: prev max $prevMax > next min $nextMin")
      case _ =>
    }
    // a range predicate on the cluster key reaches the scan as a pushed
    // filter, so footer/row-group stats can act on it
    val q = spark.read.parquet(dir)
      .filter(col("l_shipdate") >= lit("1998-01-01"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("l_shipdate"),
      plan.take(600))
    assert(q.count() ===
      li.filter(col("l_shipdate") >= lit("1998-01-01")).count())
  }

  test("z-order lets a predicate on the SECOND column skip files; range clustering cannot") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val zDir = Files.createTempDirectory("graft_zorder").toString
    val rDir = Files.createTempDirectory("graft_range1d").toString
    graft.ops.Layout.writeZOrdered(li, zDir,
      Seq("l_quantity", "l_extendedprice"), numFiles = 8)
    graft.ops.Layout.writeRangeClustered(li, rDir, Seq("l_quantity"), 8)
    // data survives the z-ordered round trip exactly
    val back = spark.read.parquet(zDir)
    assert(back.count() === li.count())
    val med = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.001)(0)
    def extRanges(dir: String): Array[(Double, Double)] =
      spark.read.parquet(dir).inputFiles.map { f =>
        val r = spark.read.parquet(f)
          .agg(min("l_extendedprice").cast("double"),
            max("l_extendedprice").cast("double")).head()
        (r.getDouble(0), r.getDouble(1))
      }
    // an "l_extendedprice >= median" scan: some z-ordered files sit
    // entirely below the median (their footer max excludes the predicate),
    // while every range-clustered-on-quantity file spans the full
    // extendedprice range and none can be skipped
    val zSkippable = extRanges(zDir).count(_._2 < med)
    val rSkippable = extRanges(rDir).count(_._2 < med)
    assert(zSkippable >= 1,
      s"z-order produced no file entirely below the l_extendedprice median")
    assert(rSkippable === 0,
      "range clustering on l_quantity unexpectedly clustered l_extendedprice")
    // and the predicate result is identical to the original table's
    assert(back.filter(col("l_extendedprice") >= med).count() ===
      li.filter(col("l_extendedprice") >= med).count())
  }
}
