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

  test("anova matches the literal between/within decomposition and the LM F-test") {
    val rng = new scala.util.Random(53)
    val rows = (1 to 300).map { _ =>
      val g = Seq("a", "b", "c")(rng.nextInt(3))
      val shift = Map("a" -> 0.0, "b" -> 1.0, "c" -> 2.5)(g)
      (g, shift + rng.nextGaussian())
    }
    val df = rows.toDF("g", "x")
    val got = Contingency.anova(df, "x", "g").head()

    val n = rows.size.toDouble
    val mean = rows.map(_._2).sum / n
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val ssb = byG.values.map(v => v.size * math.pow(v.sum / v.size - mean, 2)).sum
    val sst = rows.map(r => math.pow(r._2 - mean, 2)).sum
    val k = byG.size
    val fRef = (ssb / (k - 1)) / ((sst - ssb) / (n - k))
    assert(math.abs(got.getDouble(0) - fRef) < 1e-8 * (1 + fRef), s"${got.getDouble(0)} vs $fRef")
    assert(got.getLong(1) === (k - 1).toLong)
    assert(got.getLong(2) === (n - k).toLong)
    assert(math.abs(got.getDouble(3) - ssb / sst) < 1e-12)
    // one-way ANOVA F == the F of the dummy-coded LM (textbook identity)
    val lm = graft.glm.LM.fitFormula(df, "x ~ g")
    assert(math.abs(got.getDouble(0) - lm.fStat) < 1e-6 * (1 + lm.fStat))
  }

  test("corrMatrix matches Spark's corr for every pair, in one pass") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val got = Contingency.corrMatrix(li, cols).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.size === 6) // 4 choose 2
    for (Seq(a, b) <- cols.combinations(2)) {
      val ref = li.agg(corr(col(a), col(b))).head().getDouble(0)
      assert(math.abs(got((a, b)) - ref) < 1e-9, s"$a vs $b")
    }
  }

  test("corrMatrix: perfectly correlated and anti-correlated pairs hit ±1") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, -3.0), (2.0, 4.0, -6.0), (5.0, 10.0, -15.0))
      .toDF("x", "y", "z")
    val got = Contingency.corrMatrix(df, Seq("x", "y", "z")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(got(("x", "y")) - 1.0) < 1e-12)
    assert(math.abs(got(("x", "z")) + 1.0) < 1e-12)
    assert(math.abs(got(("y", "z")) + 1.0) < 1e-12)
  }

  test("kappa matches the literal computation; perfect agreement gives 1") {
    import spark.implicits._
    // classic worked example: 2 raters, 2 levels
    //   yes/yes 20, yes/no 5, no/yes 10, no/no 15 → po=0.7, pe=0.5, κ=0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val got = Contingency.kappa(rows.toDF("a", "b"), "a", "b").head()
    assert(math.abs(got.getAs[Double]("p_observed") - 0.7) < 1e-12)
    assert(math.abs(got.getAs[Double]("p_expected") - 0.5) < 1e-12)
    assert(math.abs(got.getAs[Double]("kappa") - 0.4) < 1e-12)
    assert(got.getAs[Long]("n_rows") === 50L)
    val perfect = Contingency.kappa(
      Seq(("a", "a"), ("b", "b"), ("c", "c")).toDF("a", "b"), "a", "b").head()
    assert(math.abs(perfect.getAs[Double]("kappa") - 1.0) < 1e-12)
  }

  test("kappa counts (null, null) ratings as agreement") {
    import spark.implicits._
    val df = Seq((Some("a"), Some("a")), (None, None), (Some("b"), Some("a")))
      .toDF("a", "b")
    val got = Contingency.kappa(df, "a", "b").head()
    assert(math.abs(got.getAs[Double]("p_observed") - 2.0 / 3) < 1e-12)
  }

  test("entropy: uniform hits ln k, constant hits 0, matches literal") {
    import spark.implicits._
    val uni = Seq("a", "b", "c", "d").toDF("x")
    assert(math.abs(Contingency.entropy(uni, "x").head().getDouble(0)
      - math.log(4)) < 1e-12)
    val const = Seq("a", "a", "a").toDF("x")
    assert(math.abs(Contingency.entropy(const, "x").head().getDouble(0)) < 1e-12)
    val skew = Seq("a", "a", "a", "b").toDF("x") // H = -(.75 ln .75 + .25 ln .25)
    val expect = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(math.abs(Contingency.entropy(skew, "x").head().getDouble(0)
      - expect) < 1e-12)
  }

  test("termClassChi2 matches the hand-computed 2x2 tables") {
    val docs = Seq(
      (1L, "x y", "A"), (2L, "x z", "A"), (3L, "y z", "B"), (4L, "z w", "B")
    ).toDF("doc_id", "text", "cls")
    val got = Contingency.termClassChi2(docs, "doc_id", "text", "cls",
        minDocFreq = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // term x, class A: a=2 b=0 c=0 d=2 -> chi2 = 4*(4-0)^2/(2*2*2*2) = 4
    assert(got(("A", "x")) === ((2L, 4.0)))
    // term z, class A: a=1 b=2 c=1 d=0 -> 4*(0-2)^2/(3*1*2*2) = 4/3
    assert(got(("A", "z")) === ((1L, rd6(4.0 / 3))))
    // term y is one doc in each class: a=1 b=1 c=1 d=1 -> chi2 = 0
    assert(got(("A", "y")) === ((1L, 0.0)))
    assert(got(("B", "y")) === ((1L, 0.0)))
    // a term repeated inside one doc still counts once
    val rep = Seq((1L, "x x x", "A"), (2L, "y", "B")).toDF("doc_id", "text", "cls")
    val r = Contingency.termClassChi2(rep, "doc_id", "text", "cls", 1, 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(r(("A", "x")) === 1L)
  }

  private def rd6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("termClassChi2 honors minDocFreq and the per-class topK rank cut") {
    val docs = Seq(
      (1L, "a b c", "X"), (2L, "a b", "X"), (3L, "a d", "Y"), (4L, "d e", "Y")
    ).toDF("doc_id", "text", "cls")
    val top1 = Contingency.termClassChi2(docs, "doc_id", "text", "cls",
      minDocFreq = 2, topK = 1).collect()
    // only terms in >= 2 docs survive (a, b, d); one row per class, rank 1
    assert(top1.length === top1.map(_.getString(0)).distinct.length)
    top1.foreach { r =>
      assert(Set("a", "b", "d").contains(r.getString(1)))
      assert(r.getInt(4) === 1)
    }
  }

  test("theilsU: determination is asymmetric; independence gives 0") {
    // b determines a (each b value maps to one a), a does NOT
    // determine b: U(a|b) = 1, U(b|a) = MI/H(b) = H(a)/H(b) < 1
    val df = Seq(("x", 1), ("x", 2), ("y", 3), ("x", 1), ("y", 3))
      .toDF("a", "b")
    val r = Contingency.theilsU(df, "a", "b").head()
    assert(r.getDouble(4) === 1.0)
    assert(r.getDouble(5) < 1.0 && r.getDouble(5) > 0.0)
    // independent balanced design → MI 0, U 0 both ways
    val ind = (for (a <- Seq("x", "y"); b <- Seq(1, 2); _ <- 1 to 3)
      yield (a, b)).toDF("a", "b")
    val ri = Contingency.theilsU(ind, "a", "b").head()
    assert(ri.getDouble(3) === 0.0)
    assert(ri.getDouble(4) === 0.0 && ri.getDouble(5) === 0.0)
    // constant column: its entropy is 0 → U conditioned on it is null
    val const = Seq(("k", 1), ("k", 2)).toDF("a", "b")
    assert(Contingency.theilsU(const, "a", "b").head().isNullAt(4))
  }

  test("mantelHaenszel: closed two-stratum case") {
    // per stratum: a=10 b=5 c=5 d=10 → E=7.5, V=50625/26100;
    // two identical strata: chi2 = 25/(2V) = 6.444444…, OR_MH = 4
    def stratum(s: String) =
      Seq.fill(10)((s, true, true)) ++ Seq.fill(5)((s, true, false)) ++
        Seq.fill(5)((s, false, true)) ++ Seq.fill(10)((s, false, false))
    val df = (stratum("s1") ++ stratum("s2")).toDF("s", "ex", "oc")
    val row = Contingency.mantelHaenszel(df, "s", "ex", "oc").head()
    assert(row.getLong(0) === 2L && row.getLong(1) === 60L)
    val v = 2.0 * (15.0 * 15.0 * 15.0 * 15.0) / (30.0 * 30.0 * 29.0)
    assert(math.abs(row.getDouble(2) - 25.0 / v) < 1e-5)
    assert(row.getDouble(3) === 4.0)
  }

  test("mantelHaenszel: degenerate strata excluded, nulls dropped") {
    val df = (Seq(("tiny", true, true)) ++ // n_k = 1 → excluded
      Seq.fill(4)(("s", true, true)) ++ Seq.fill(4)(("s", false, false)) ++
      Seq.fill(2)(("s", true, false)) ++ Seq.fill(2)(("s", false, true)))
      .toDF("s", "ex", "oc")
      .unionByName(Seq(("s", Option.empty[Boolean], Option(true)))
        .toDF("s", "ex", "oc"))
    val row = Contingency.mantelHaenszel(df, "s", "ex", "oc").head()
    assert(row.getLong(0) === 1L, "only the big stratum counts")
    assert(row.getLong(1) === 12L)
    // OR = (4·4/12)/(2·2/12) = 4
    assert(row.getDouble(3) === 4.0)
  }

  test("mutualInfoRanking: perfect predictor scores H(label), noise 0") {
    // label ∈ {x, y} balanced: H = ln 2; copy = label exactly;
    // junk is constant (MI = 0 exactly, single cell ln(1))
    val df = Seq(("x", "x", "k"), ("y", "y", "k"), ("x", "x", "k"),
      ("y", "y", "k")).toDF("lab", "copy", "junk")
    val got = Contingency.mutualInfoRanking(df, Seq("copy", "junk"), "lab")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(got("junk") === 0.0)
    assert(got("copy") === rd6(math.log(2.0)))
  }

  test("mutualInfoRanking: null labels drop, null values are a level") {
    val df = Seq((Some("x"), Some("p")), (Some("x"), None),
      (None, Some("p")), (Some("y"), Some("q"))).toDF("lab", "f")
    val out = Contingency.mutualInfoRanking(df, Seq("f"), "lab").head()
    assert(out.getLong(1) === 3L)  // null-label row dropped
    assert(out.getLong(2) === 3L)  // p, q, and the null level
    assert(out.getLong(3) === 2L)
    intercept[IllegalArgumentException] {
      Contingency.mutualInfoRanking(df, Seq("lab"), "lab")
    }
  }

  test("mutualInfoRanking: sentinel-looking strings stay distinct from " +
      "NULL and quoted column names are safe") {
    // a genuine " null" string value must NOT merge with SQL NULL
    // (the old sentinel encoding did); a quote in the feature column
    // name must not break the melt (the old selectExpr stack() did)
    val df = Seq((Some("x"), Some("\u0000null")), (Some("y"), None),
      (Some("x"), Some("p"))).toDF("lab", "weird'col")
    val out = Contingency.mutualInfoRanking(df, Seq("weird'col"), "lab")
      .head()
    assert(out.getLong(2) === 3L, "three distinct levels, null its own")
  }

  test("mutualInfoRanking agrees with analyze's pairwise MI") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag"), col("l_linestatus"))
    val ranked = Contingency.mutualInfoRanking(li, Seq("l_linestatus"),
      "l_returnflag").head().getDouble(4)
    val pair = Contingency.analyze(li, "l_linestatus", "l_returnflag")
      .head().getAs[Double]("mutual_info")
    assert(math.abs(ranked - pair) < 1e-6)
  }

  test("mutualInfoRanking melts through ONE scan of the input") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val plan = Contingency.mutualInfoRanking(li,
      Seq("l_returnflag", "l_linestatus", "l_shipdate"), "l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("FileScan")) === 1,
      plan.take(1500))
  }

  test("adjustedRandIndex: identical partitions score 1/1; sklearn case") {
    val same = Seq(("x", "p"), ("x", "p"), ("y", "q")).toDF("a", "b")
    val r1 = Contingency.adjustedRandIndex(same, "a", "b").head()
    assert(r1.getAs[Double]("ari") === 1.0)
    assert(r1.getAs[Double]("nmi") === 1.0)
    // the sklearn docs example: true [0,0,1,1], pred [0,0,1,2] -> 0.571429
    val df = Seq((0, 0), (0, 0), (1, 1), (1, 2)).toDF("a", "b")
    val r2 = Contingency.adjustedRandIndex(df, "a", "b").head()
    assert(r2.getLong(0) === 4L && r2.getLong(1) === 3L)
    val expect = (1.0 - 1.0 / 3) / (1.5 - 1.0 / 3)
    assert(r2.getAs[Double]("ari") ===
      BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
  }

  test("adjustedRandIndex is label-name invariant and null when degenerate") {
    val df = Seq((0, 0), (0, 0), (1, 1), (1, 2)).toDF("a", "b")
    val renamed = df.select((col("a") + 100).as("a"),
      concat(lit("z"), col("b")).as("b"))
    assert(Contingency.adjustedRandIndex(df, "a", "b").head()
      .getAs[Double]("ari") ===
      Contingency.adjustedRandIndex(renamed, "a", "b").head()
        .getAs[Double]("ari"))
    // single cluster on both sides: chance correction divides by zero
    val one = Seq((1, 1), (1, 1)).toDF("a", "b")
    val r = Contingency.adjustedRandIndex(one, "a", "b").head()
    assert(r.isNullAt(r.fieldIndex("ari")))
    assert(r.isNullAt(r.fieldIndex("nmi")))
  }

  test("adjustedRandIndex is partition-invariant on real labelings") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag").as("a"), col("l_linestatus").as("b"))
    val run = (p: Int) => Contingency.adjustedRandIndex(
      li.repartition(p), "a", "b").collect().toSeq
    assert(run(1) === run(7))
  }
}
