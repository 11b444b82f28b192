package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class SegmentSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  // 4 customers with strictly ordered metrics on every axis: quartiles
  // must come out as a clean 1..4 / 4..1 assignment
  private def orders = Seq(
    (1L, ts("2024-01-10"), 10.0), // most recent, 4 orders, highest spend
    (1L, ts("2024-01-09"), 10.0),
    (1L, ts("2024-01-08"), 10.0),
    (1L, ts("2024-01-07"), 10.0),
    (2L, ts("2024-01-06"), 8.0),
    (2L, ts("2024-01-05"), 8.0),
    (2L, ts("2024-01-04"), 8.0),
    (3L, ts("2024-01-03"), 7.5),
    (3L, ts("2024-01-02"), 7.5),
    (4L, ts("2024-01-01"), 9.0)
  ).toDF("cust", "ts", "amount")

  test("rfm: strictly ordered metrics give the full quartile spread") {
    val out = Segment.rfm(orders, "cust", "ts", "amount")
      .orderBy("cust").collect()
    val byCust = out.map(r => r.getLong(0) -> r).toMap
    // recency: c1 = 0 days from ref, c4 = 9 days
    assert(byCust(1L).getAs[Long]("recency_days") === 0L)
    assert(byCust(4L).getAs[Long]("recency_days") === 9L)
    // cents are exact
    assert(byCust(1L).getAs[Long]("monetary_cents") === 4000L)
    assert(byCust(3L).getAs[Long]("monetary_cents") === 1500L)
    // scores: 4 = best on every axis
    assert(byCust(1L).getAs[String]("rfm") === "444")
    assert(byCust(2L).getAs[Int]("r_score") === 3)
    assert(byCust(2L).getAs[Int]("f_score") === 3)
    assert(byCust(4L).getAs[Int]("r_score") === 1)
    assert(byCust(4L).getAs[Int]("f_score") === 1) // 1 order = least
  }

  test("rfm: tied metric values share a score") {
    val df = Seq(
      (1L, ts("2024-01-05"), 5.0),
      (2L, ts("2024-01-05"), 5.0),
      (3L, ts("2024-01-05"), 5.0),
      (4L, ts("2024-01-05"), 5.0)
    ).toDF("cust", "ts", "amount")
    val out = Segment.rfm(df, "cust", "ts", "amount").collect()
    // every metric fully tied → cum share = 1 → group 4 on every axis;
    // recency: ascending group 4 → score 5-4 = 1
    assert(out.forall(_.getAs[String]("rfm") === "144"))
  }

  test("rfm: quartile boundary arithmetic is the ceil of the cum share") {
    // 8 customers, distinct frequencies 1..8 → scores 1,1,2,2,3,3,4,4
    val rows = (1 to 8).flatMap { c =>
      (1 to c).map(i => (c.toLong, ts(f"2024-01-${i}%02d"), 1.0))
    }
    val out = Segment.rfm(rows.toDF("cust", "ts", "amount"),
        "cust", "ts", "amount")
      .orderBy("frequency").collect()
    assert(out.map(_.getAs[Int]("f_score")).toSeq ===
      Seq(1, 1, 2, 2, 3, 3, 4, 4))
  }

  test("rfm is invariant to input partitioning") {
    val a = Segment.rfm(orders, "cust", "ts", "amount")
      .orderBy("cust").collect().toSeq
    val b = Segment.rfm(orders.repartition(7), "cust", "ts", "amount")
      .orderBy("cust").collect().toSeq
    assert(a === b)
  }

  test("cohortLtv: closed cohort/age revenue matrix with cumulative") {
    val df = Seq(
      // cust 1: cohort Jan, buys Jan(10), Feb(20), Apr(5)
      (1L, ts("2024-01-15"), 10.0), (1L, ts("2024-02-20"), 20.0),
      (1L, ts("2024-04-01"), 5.0),
      // cust 2: cohort Jan, buys Jan only
      (2L, ts("2024-01-02"), 7.0),
      // cust 3: cohort Feb, buys Feb + Mar
      (3L, ts("2024-02-10"), 3.0), (3L, ts("2024-03-10"), 4.0)
    ).toDF("cust", "ts", "amount")
    val out = Segment.cohortLtv(df, "cust", "ts", "amount")
      .orderBy("cohort", "age_months").collect()
      .map(r => (r.getTimestamp(0).toString.take(7), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // Jan cohort: age 0 = 1700 (both), age 1 = 2000, age 3 = 500
    assert(out(("2024-01", 0L)) === ((2L, 1700L, 1700L)))
    assert(out(("2024-01", 1L)) === ((1L, 2000L, 3700L)))
    assert(out(("2024-01", 3L)) === ((1L, 500L, 4200L)))
    // Feb cohort independent
    assert(out(("2024-02", 0L)) === ((1L, 300L, 300L)))
    assert(out(("2024-02", 1L)) === ((1L, 400L, 700L)))
    assert(out.size === 5)
  }

  test("cohortLtv: year boundaries use exact month indices") {
    val df = Seq((1L, ts("2023-12-05"), 1.0), (1L, ts("2024-01-05"), 2.0))
      .toDF("cust", "ts", "amount")
    val out = Segment.cohortLtv(df, "cust", "ts", "amount")
      .orderBy("age_months").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(0L, 1L))
  }
}
