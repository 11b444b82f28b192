package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MatchingSpec extends SparkSpec {
  import spark.implicits._

  // (stratum, treat, score, id)
  private def rows = Seq(
    ("s1", 1, 10.0, 1L), ("s1", 1, 20.0, 2L),
    ("s1", 0, 12.0, 101L), ("s1", 0, 27.0, 102L),
    ("s2", 1, 5.0, 3L), ("s2", 0, 50.0, 103L),
    ("s3", 1, 9.0, 4L)) // stratum with no controls

  test("psMatch pairs each treated unit with the nearest in-stratum control") {
    val df = rows.toDF("g", "treat", "score", "id")
    val got = Matching.psMatch(df, Seq("g"), "treat", "score", "id")
      .collect().map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(r.fieldIndex("control_id"))) None
         else Some((r.getAs[Long]("control_id"),
           r.getAs[Double]("score_diff"))))).toMap
    assert(got(1L) === Some((101L, 2.0)))   // |12-10| < |27-10|
    assert(got(2L) === Some((102L, 7.0)))   // |27-20| < |12-20|
    assert(got(3L) === Some((103L, 45.0)))  // only control, far
    assert(got(4L) === None)                // stratum without controls
  }

  test("psMatch caliper leaves distant treated units unmatched") {
    val df = rows.toDF("g", "treat", "score", "id")
    val got = Matching.psMatch(df, Seq("g"), "treat", "score", "id",
        caliper = Some(10.0))
      .collect().map(r => r.getAs[Long]("id") ->
        r.isNullAt(r.fieldIndex("control_id"))).toMap
    assert(!got(1L) && !got(2L))
    assert(got(3L), "45-away control must fall outside the 10 caliper")
  }

  test("psMatch: equal-score controls collapse to the min id; with replacement") {
    val df = Seq(
      ("s", 1, 10.0, 1L), ("s", 1, 11.0, 2L),
      ("s", 0, 10.5, 100L), ("s", 0, 10.5, 99L)).toDF("g", "treat", "score", "id")
    val got = Matching.psMatch(df, Seq("g"), "treat", "score", "id")
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Long]("control_id")).toMap
    // both treated match the SAME (deduped, min-id) control
    assert(got === Map(1L -> 99L, 2L -> 99L))
  }

  test("psMatch is partition-invariant") {
    val df = (1L to 60L).map(i =>
      (s"g${i % 3}", (i % 2).toInt, (i * 13 % 41).toDouble, i))
      .toDF("g", "treat", "score", "id")
    val a = Matching.psMatch(df, Seq("g"), "treat", "score", "id")
      .orderBy("id").collect().toSeq
    val b = Matching.psMatch(df.repartition(7), Seq("g"), "treat", "score", "id")
      .orderBy("id").collect().toSeq
    assert(a === b)
  }

  // confounded two-stratum fixture: treatment effect is exactly 2 in both
  // strata, but treatment probability differs (0.8 vs 0.2), so the naive
  // difference is biased; IPW recovers 2 exactly (closed-form arithmetic)
  private def confounded = (
    Seq.fill(8)(("s1", 1, 3.0)) ++ Seq.fill(2)(("s1", 0, 1.0)) ++
    Seq.fill(2)(("s2", 1, 5.0)) ++ Seq.fill(8)(("s2", 0, 3.0))
  ).toDF("s", "treat", "y")

  test("ipwAte removes confounding the naive difference keeps") {
    val row = Matching.ipwAte(confounded, Seq("s"), "treat", "y").head
    assert(row.getAs[Long]("n_used") === 20L)
    assert(math.abs(row.getAs[Double]("ate_ipw") - 2.0) < 1e-12)
    assert(math.abs(row.getAs[Double]("mean_treated") - 4.0) < 1e-12)
    assert(math.abs(row.getAs[Double]("mean_control") - 2.0) < 1e-12)
    // the naive difference is 3.4 - 2.6 = 0.8 — confounded
    val naive = confounded.groupBy("treat").agg(avg("y").as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs((naive(1) - naive(0)) - 0.8) < 1e-12)
  }

  test("ipwAte excludes positivity-violating strata and counts them") {
    val withBad = confounded.unionByName(
      Seq.fill(5)(("s3", 1, 9.0)).toDF("s", "treat", "y"))
    val row = Matching.ipwAte(withBad, Seq("s"), "treat", "y").head
    assert(row.getAs[Long]("n_excluded") === 5L)
    assert(row.getAs[Long]("n_used") === 20L)
    assert(math.abs(row.getAs[Double]("ate_ipw") - 2.0) < 1e-12)
  }

  test("ipwAte is partition-invariant") {
    val a = Matching.ipwAte(confounded, Seq("s"), "treat", "y").head
    val b = Matching.ipwAte(confounded.repartition(11), Seq("s"),
      "treat", "y").head
    assert(math.abs(a.getAs[Double]("ate_ipw") -
      b.getAs[Double]("ate_ipw")) < 1e-12)
  }

  // noise-free confounded data: y = 2·t + 10·x exactly, treatment share
  // 0.2 at x = 0 and 0.8 at x = 1; "j" is an irrelevant junk stratum
  // BALANCED within every (x, t) cell, so the finite-sample AIPW
  // cancellations are exact (realized share within each (x, j) equals
  // the x-stratum share). Naive treated-minus-control = 10 − 2 = 8;
  // the true effect is 2.
  private lazy val aipwData = {
    def cell(x: String, j: String, t: Int, y: Double, n: Int) =
      Seq.fill(n)((x, j, t, y))
    val rows =
      cell("x0", "ja", 0, 0.0, 4) ++ cell("x0", "ja", 1, 2.0, 1) ++
      cell("x0", "jb", 0, 0.0, 4) ++ cell("x0", "jb", 1, 2.0, 1) ++
      cell("x1", "ja", 0, 10.0, 1) ++ cell("x1", "ja", 1, 12.0, 4) ++
      cell("x1", "jb", 0, 10.0, 1) ++ cell("x1", "jb", 1, 12.0, 4)
    rows.toDF("x", "j", "treat", "y")
  }

  test("aipwAte is doubly robust: either correct model recovers the effect") {
    // correct propensity, junk outcome model
    val a = Matching.aipwAte(aipwData, Seq("x"), Seq("j"), "treat", "y")
      .head
    assert(math.abs(a.getAs[Double]("ate_aipw") - 2.0) < 1e-12)
    // junk propensity, correct outcome model
    val b = Matching.aipwAte(aipwData, Seq("j"), Seq("x"), "treat", "y")
      .head
    assert(math.abs(b.getAs[Double]("ate_aipw") - 2.0) < 1e-12)
    // BOTH junk: biased (sanity that the fixture actually confounds)
    val c = Matching.aipwAte(aipwData, Seq("j"), Seq("j"), "treat", "y")
      .head
    assert(math.abs(c.getAs[Double]("ate_aipw") - 2.0) > 1.0)
  }

  test("aipwAte excludes positivity violations and missing arms") {
    val withBad = aipwData.unionByName(
      Seq.fill(5)(("x2", "j0", 1, 9.0)).toDF("x", "j", "treat", "y"))
    // x2 is all-treated: e = 1 → its 5 rows are excluded
    val row = Matching.aipwAte(withBad, Seq("x"), Seq("x"), "treat", "y")
      .head
    assert(row.getAs[Long]("n_excluded") === 5L)
    assert(row.getAs[Long]("n_used") === 20L)
    assert(math.abs(row.getAs[Double]("ate_aipw") - 2.0) < 1e-12)
  }

  test("aipwAte is partition-invariant within float-sum precision") {
    val a = Matching.aipwAte(aipwData, Seq("x"), Seq("j"), "treat", "y")
      .head.getAs[Double]("ate_aipw")
    val b = Matching.aipwAte(aipwData.repartition(7), Seq("x"), Seq("j"),
      "treat", "y").head.getAs[Double]("ate_aipw")
    assert(math.abs(a - b) < 1e-9)
  }
}
