package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContingencySpec extends SparkSpec {
  import spark.implicits._

  test("chi2/V/MI match a literal full-table computation including empty cells") {
    // deliberate empty cell: (c, y) never occurs
    val rows = Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(8)(("b", "x")) ++ Seq.fill(22)(("b", "y")) ++
      Seq.fill(12)(("c", "x"))
    val df = rows.toDF("u", "v")
    val got = Contingency.analyze(df, "u", "v").head()

    val n = rows.size.toDouble
    val as = rows.map(_._1).distinct.sorted
    val bs = rows.map(_._2).distinct.sorted
    val cnt = rows.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val raM = as.map(a => a -> rows.count(_._1 == a).toDouble).toMap
    val cbM = bs.map(b => b -> rows.count(_._2 == b).toDouble).toMap
    // literal chi2 over the FULL grid (empty cells contribute e)
    val chi2Ref = (for (a <- as; b <- bs) yield {
      val o = cnt.getOrElse((a, b), 0.0)
      val e = raM(a) * cbM(b) / n
      (o - e) * (o - e) / e
    }).sum
    val miRef = (for (a <- as; b <- bs; o = cnt.getOrElse((a, b), 0.0); if o > 0)
      yield (o / n) * math.log(o * n / (raM(a) * cbM(b)))).sum

    assert(math.abs(got.getDouble(0) - chi2Ref) < 1e-9, s"${got.getDouble(0)} vs $chi2Ref")
    assert(got.getLong(1) === 2L) // (3-1)*(2-1)
    assert(math.abs(got.getDouble(2) - math.sqrt(chi2Ref / (n * 1))) < 1e-10)
    assert(math.abs(got.getDouble(3) - miRef) < 1e-10)
    assert(got.getLong(4) === rows.size.toLong)
  }

  test("independent columns give chi2 ~ 0 and MI ~ 0 on a product design") {
    // perfectly independent: every (u, v) cell has identical count
    val rows = for (a <- Seq("a", "b", "c"); b <- Seq("x", "y"); _ <- 1 to 7)
      yield (a, b)
    val got = Contingency.analyze(rows.toDF("u", "v"), "u", "v").head()
    assert(math.abs(got.getDouble(0)) < 1e-9) // chi2 = 0 exactly
    assert(math.abs(got.getDouble(3)) < 1e-12)
  }
}
