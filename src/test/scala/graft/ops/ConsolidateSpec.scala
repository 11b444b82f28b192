package graft.ops

import graft.SparkSpec

class ConsolidateSpec extends SparkSpec {
  import spark.implicits._

  private def records = Seq(
    // cluster 1: clear majorities
    (1L, "acme corp", "NYC"), (1L, "acme corp", "NYC"), (1L, "acme", "LA"),
    // cluster 2: 1-1 tie on city -> smallest value wins
    (2L, "beta", "Austin"), (2L, "beta", "Boston"),
    // cluster 3: single record
    (3L, "gamma", null)
  ).toDF("cluster", "name", "city")

  test("goldenRecord picks the majority value per attribute") {
    val got = Consolidate.goldenRecord(records, "cluster",
        Seq("name", "city"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getString(3))).toMap
    assert(got(1L) === ((3L, "acme corp", "NYC")))
  }

  test("goldenRecord breaks ties toward the smallest value") {
    val got = Consolidate.goldenRecord(records, "cluster",
        Seq("name", "city"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got(2L) === "Austin")
  }

  test("goldenRecord: nulls never vote; all-null attributes stay null") {
    val got = Consolidate.goldenRecord(records, "cluster",
      Seq("name", "city")).collect().map(r =>
        r.getLong(0) -> (r.getLong(1), Option(r.getString(3)))).toMap
    assert(got(3L) === ((1L, None)))
    // a null alongside real votes loses to any real value
    val mixed = Seq((9L, Some("x")), (9L, None), (9L, None))
      .toDF("cluster", "v")
    val g = Consolidate.goldenRecord(mixed, "cluster", Seq("v")).head()
    assert(g.getString(2) === "x")
  }

  test("goldenRecord votes on the string view of non-string attributes") {
    val df = Seq((1L, 10, 2.5), (1L, 10, 3.5), (1L, 20, 3.5))
      .toDF("cluster", "a", "b")
    val r = Consolidate.goldenRecord(df, "cluster", Seq("a", "b")).head()
    assert(r.getString(2) === "10")
    assert(r.getString(3) === "3.5")
  }

  test("goldenRecord is partition-invariant") {
    val base = Consolidate.goldenRecord(records, "cluster", Seq("name", "city"))
      .collect().map(_.toSeq).toSet
    val rep = Consolidate.goldenRecord(records.repartition(7), "cluster",
      Seq("name", "city")).collect().map(_.toSeq).toSet
    assert(rep === base)
  }
}
