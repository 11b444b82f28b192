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
}
