package graft.ops

import graft.SparkSpec

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val log2 = math.log(2.0)

  test("fellegiSunter: closed-form weights with the 0.5-adjusted u") {
    // field1 agreements [1,1,0] → u1 = 2.5/4; field2 [0,0,0] → u2 = 0.5/4
    val pairs = Seq((1L, 2L, true, false), (1L, 3L, true, false),
      (2L, 3L, false, false)).toDF("a", "b", "f1", "f2")
    val out = Linkage.fellegiSunter(pairs, Seq("f1", "f2"), Seq(0.9, 0.8))
      .orderBy("a", "b").collect()
    val u1 = 2.5 / 4; val u2 = 0.5 / 4
    val s12 = math.log(0.9 / u1) / log2 + math.log(0.2 / (1 - u2)) / log2
    val s23 = math.log(0.1 / (1 - u1)) / log2 + math.log(0.2 / (1 - u2)) / log2
    assert(math.abs(out(0).getAs[Double]("fs_score") -
      BigDecimal(s12).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
    assert(math.abs(out(2).getAs[Double]("fs_score") -
      BigDecimal(s23).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
  }

  test("fellegiSunter: agreement on a rare field outweighs a common one") {
    // f_rare agrees on 1 of 20 pairs; f_common on 19 of 20 — matching on
    // the rare field must carry more evidence
    val pairs = (1 to 20).map(i =>
      (i.toLong, (i + 100).toLong, i == 1, i != 1))
      .toDF("a", "b", "f_rare", "f_common")
    val out = Linkage.fellegiSunter(pairs, Seq("f_rare", "f_common"),
        Seq(0.9, 0.9))
      .collect().map(r => r.getAs[Long]("a") -> r.getAs[Double]("fs_score"))
      .toMap
    assert(out(1L) > out(2L)) // pair 1 (rare agree) beats the rest
  }

  test("fellegiSunter: score is monotone in the number of agreements") {
    val pairs = Seq((1L, true, true), (2L, true, false), (3L, false, false))
      .toDF("a", "f1", "f2")
    val out = Linkage.fellegiSunter(pairs, Seq("f1", "f2"), Seq(0.9, 0.9))
      .collect().map(r => r.getAs[Long]("a") -> r.getAs[Double]("fs_score"))
      .toMap
    assert(out(1L) > out(2L) && out(2L) > out(3L))
  }

  test("fellegiSunter: 0-1 integer agreement columns are accepted") {
    val pairs = Seq((1L, 1, 0), (2L, 0, 1)).toDF("a", "f1", "f2")
    val out = Linkage.fellegiSunter(pairs, Seq("f1", "f2"), Seq(0.9, 0.9))
    assert(out.count() === 2)
    assert(out.columns.contains("fs_score"))
  }

  test("fellegiSunter validates its parameters") {
    val pairs = Seq((1L, true)).toDF("a", "f1")
    intercept[IllegalArgumentException] {
      Linkage.fellegiSunter(pairs, Seq(), Seq())
    }
    intercept[IllegalArgumentException] {
      Linkage.fellegiSunter(pairs, Seq("f1"), Seq(1.0))
    }
    intercept[IllegalArgumentException] {
      Linkage.fellegiSunter(pairs, Seq("f1"), Seq(0.9, 0.8))
    }
  }
}
