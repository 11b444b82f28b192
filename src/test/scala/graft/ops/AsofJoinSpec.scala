package graft.ops

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof join picks the latest right row at or before each left ts") {
    val l = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, "c"))
      .toDF("k", "ts", "v")
    val r = Seq((1L, 8L, 100.0), (1L, 20L, 200.0), (2L, 9L, 300.0))
      .toDF("k", "rts", "price")
    val out = AsofJoin.asofJoin(l, r, Seq("k"), "ts", "rts", Seq("price"))
      .orderBy("k", "ts")
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getString(2),
        Option(row.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq === Seq(
      (1L, 10L, "a", Some(100.0)),   // 8 <= 10 < 20
      (1L, 25L, "b", Some(200.0)),   // latest <= 25 is 20
      (2L, 5L, "c", None)))          // no right row at or before 5
  }

  test("a right row at exactly left.ts is visible (>= semantics)") {
    val l = Seq((1L, 20L, "x")).toDF("k", "ts", "v")
    val r = Seq((1L, 20L, 7.0)).toDF("k", "rts", "price")
    val out = AsofJoin.asofJoin(l, r, Seq("k"), "ts", "rts", Seq("price")).head()
    assert(out.getDouble(3) === 7.0)
  }

  test("a matching right row with a genuinely NULL value yields NULL, not an older value") {
    val l = Seq((1L, 30L, "x")).toDF("k", "ts", "v")
    val r = Seq((1L, 10L, Some(5.0)), (1L, 20L, None))
      .toDF("k", "rts", "price")
    val out = AsofJoin.asofJoin(l, r, Seq("k"), "ts", "rts", Seq("price")).head()
    // latest right row (ts=20) matches and its price is NULL — it must NOT
    // be skipped in favor of the ts=10 row's 5.0
    assert(out.isNullAt(3))
  }

  test("left row multiplicity and columns are preserved") {
    val l = Seq((1L, 10L, "a"), (1L, 10L, "b")).toDF("k", "ts", "v")
    val r = Seq((1L, 9L, 1.0)).toDF("k", "rts", "price")
    val out = AsofJoin.asofJoin(l, r, Seq("k"), "ts", "rts", Seq("price"))
    assert(out.count() === 2)
    assert(out.columns.toSeq === Seq("k", "ts", "v", "price"))
  }

  test("nearestJoin picks the closer side; ties go to the earlier row") {
    val l = Seq((1L, 10L), (1L, 100L), (1L, 55L)).toDF("k", "ts")
    val r = Seq((1L, 40L, "early"), (1L, 70L, "late")).toDF("k", "rts", "tag")
    val got = AsofJoin.nearestJoin(l, r, Seq("k"), "ts", "rts", Seq("tag"))
      .collect().map(x => x.getLong(1) ->
        (x.getString(2), x.getDouble(3))).toMap
    assert(got(10L) === (("early", 30.0)))  // only forward exists
    assert(got(100L) === (("late", -30.0))) // only backward
    // 55 is equidistant (15 both ways): tie -> earlier right row
    assert(got(55L) === (("early", -15.0)))
  }

  test("nearestJoin honors tolerance and missing partners") {
    val l = Seq((1L, 10L), (2L, 10L)).toDF("k", "ts")
    val r = Seq((1L, 500L, "far")).toDF("k", "rts", "tag")
    val out = AsofJoin.nearestJoin(l, r, Seq("k"), "ts", "rts", Seq("tag"),
        tolerance = Some(100.0))
      .collect().map(x => x.getLong(0) -> x.isNullAt(2)).toMap
    assert(out(1L), "match beyond tolerance must be null")
    assert(out(2L), "key with no right rows must be null")
    val noTol = AsofJoin.nearestJoin(l, r, Seq("k"), "ts", "rts", Seq("tag"))
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(2)) null else x.getString(2))).toMap
    assert(noTol(1L) === "far" && noTol(2L) === null)
  }

  test("nearestJoin is partition-invariant") {
    val l = (1L to 40L).map(i => (i % 3, i * 7)).toDF("k", "ts")
    val r = (1L to 20L).map(i => (i % 3, i * 13, i)).toDF("k", "rts", "rid")
    val a = AsofJoin.nearestJoin(l, r, Seq("k"), "ts", "rts", Seq("rid"))
      .orderBy("k", "ts").collect().toSeq
    val b = AsofJoin.nearestJoin(l.repartition(7), r.repartition(5),
        Seq("k"), "ts", "rts", Seq("rid"))
      .orderBy("k", "ts").collect().toSeq
    assert(a === b)
  }
}
