package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("summarize: rows, nulls, distincts per column on a closed case") {
    val df = Seq(
      (Some("a"), Some(1.0)), (Some("a"), None),
      (Some("b"), Some(2.0)), (None, Some(2.0))
    ).toDF("s", "x")
    val out = Profile.summarize(df, Seq("s", "x")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("s") === ((4L, 1L, 2L)))
    assert(out("x") === ((4L, 1L, 2L)))
  }

  test("summarize matches independent per-column queries on the corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = Profile.summarize(docs, Seq("lang", "source")).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("lang") === docs.select("lang").distinct().count())
    assert(out("source") === docs.select("source").distinct().count())
  }

  test("summarize is one job — a single aggregation, no per-column scans") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val plan = Profile.summarize(docs, Seq("lang", "source", "n_chars"))
      .queryExecution.executedPlan.toString
    // the multi-countDistinct plans through ONE Expand over one scan
    assert(plan.linesIterator.count(_.contains("FileScan")) === 1, plan.take(1500))
    assert(plan.contains("Expand"), plan.take(1500))
  }

  test("approxDistinct: HLL++ twin tracks the exact counts within tolerance") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val exact = Profile.summarize(docs, Seq("lang", "source", "doc_id"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Profile.summarize(docs, Seq("lang", "source", "doc_id"),
      approxDistinct = true, rsd = 0.02).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    exact.foreach { case (c, nd) =>
      assert(math.abs(approx(c) - nd) <= math.max(2L, (nd * 0.1).toLong),
        s"col=$c exact=$nd approx=${approx(c)}")
    }
    // the approx plan must NOT expand per-column distinct values
    val plan = Profile.summarize(docs, Seq("lang", "source"),
      approxDistinct = true).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan.take(1500))
  }

  test("summarize rejects unknown columns") {
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[IllegalArgumentException] { Profile.summarize(df, Seq("zz")) }
  }

  test("benford: digits from the decimal string, literal fractions, p sums to 1") {
    val df = Seq(12L, 19L, 105L, 2L, 250L, 29L, 3L, 999L, 0L, -5L)
      .toDF("x").withColumn("x", col("x"))
    val out = Profile.benford(df, "x").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // 0 and -5 excluded -> 8 rows counted: digits 1:3 (12,19,105), 2:3
    // (2,250,29), 3:1, 9:1
    assert(out.keySet === Set(1, 2, 3, 9))
    assert(out(1)._1 === 3L && out(2)._1 === 3L && out(3)._1 === 1L)
    assert(math.abs(out(1)._2 - 3.0 / 8) < 1e-12)
    // Benford expectations: p(1) = log10(2) etc., full support sums to 1
    val full = Profile.benford((1L to 999L).toDF("x"), "x")
      .collect().map(_.getDouble(3))
    assert(math.abs(full.sum - 1.0) < 1e-12)
    assert(math.abs(full.head - math.log10(2)) < 1e-12)
  }

  test("gini: 0 for equal masses, sorted-rank literal otherwise") {
    val eq = Seq(5.0, 5.0, 5.0, 5.0).toDF("x")
    assert(math.abs(Profile.gini(eq, "x").head().getDouble(0)) < 1e-12)
    // literal check against G = (2 Σ i·x_(i))/(n Σx) − (n+1)/n with ties
    val vals = Seq(1.0, 2.0, 2.0, 4.0, 8.0, 8.0, 25.0)
    val sorted = vals.sorted
    val n = sorted.size
    // tie-averaged rank form (equivalent to the Lorenz trapezoid)
    val ranks = sorted.map(v =>
      (sorted.zipWithIndex.filter(_._1 == v).map(_._2 + 1).sum.toDouble /
        sorted.count(_ == v)))
    val expect = 2.0 * sorted.zip(ranks).map { case (v, r) => v * r }.sum /
      (n * sorted.sum) - (n + 1.0) / n
    val got = Profile.gini(vals.toDF("x"), "x").head()
    assert(math.abs(got.getDouble(0) - expect) < 1e-12, got.getDouble(0))
    assert(got.getLong(1) === n.toLong)
  }

  test("gini is partition-invariant and ignores nulls") {
    val base = (1 to 500).map(i => (i % 23 + 1).toDouble)
    val a = Profile.gini(base.toDF("x"), "x").head().getDouble(0)
    val b = Profile.gini(base.toDF("x").repartition(11), "x").head().getDouble(0)
    assert(math.abs(a - b) < 1e-12)
    val withNull = base.map(Option(_)) ++ Seq(None, None)
    val c = Profile.gini(withNull.toDF("x"), "x").head()
    assert(math.abs(c.getDouble(0) - a) < 1e-12)
    assert(c.getLong(1) === 500L)
  }

  test("histogram: closed case with underflow/overflow bins and edges") {
    val df = Seq(-1.0, 0.0, 0.5, 1.0, 2.5, 5.0, 7.0).toDF("x")
    val out = Profile.histogram(df, "x", lo = 0.0, hi = 5.0, bins = 5)
      .collect().map(r => r.getInt(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out(-1) === ((Double.NegativeInfinity, 0.0, 1L)))
    assert(out(0) === ((0.0, 1.0, 2L)))   // 0.0, 0.5
    assert(out(1) === ((1.0, 2.0, 1L)))
    assert(out(2) === ((2.0, 3.0, 1L)))
    assert(out(5) === ((5.0, Double.PositiveInfinity, 2L))) // 5.0, 7.0
    assert(!out.contains(3) && !out.contains(4), "empty bins are absent")
  }

  test("histogram: counts sum to non-null rows; nulls excluded") {
    val df = Seq(Some(1.0), Some(2.0), None, Some(3.0)).toDF("x")
    val out = Profile.histogram(df, "x", 0.0, 4.0, 4)
    assert(out.agg(org.apache.spark.sql.functions.sum("n"))
      .head().getLong(0) === 3L)
  }

  test("fkCandidates: full containment on a real FK, partial otherwise") {
    val parent = Seq(1L, 2L, 3L, 4L).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(2L), None).toDF("fk")
    val r = Profile.fkCandidates(child, "fk", parent, "pk").head()
    assert(r.getLong(0) === 2L) // child distinct (non-null)
    assert(r.getLong(1) === 4L)
    assert(r.getLong(2) === 2L)
    assert(r.getDouble(3) === 1.0)
    assert(r.getLong(4) === 1L) // null child rows
    val stray = Seq(1L, 9L).toDF("fk")
    val r2 = Profile.fkCandidates(stray, "fk", parent, "pk").head()
    assert(r2.getDouble(3) === 0.5)
  }

  test("fkCandidates: an empty child yields null containment") {
    val parent = Seq(1L).toDF("pk")
    val child = Seq.empty[Long].toDF("fk")
    val r = Profile.fkCandidates(child, "fk", parent, "pk").head()
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(3))
  }

  test("histogram2d: right-open cells, clamps, under/overflow, null drop") {
    val df = Seq(
      (0.0, 0.0), (0.9, 0.9),      // cell (0,0)
      (1.0, 0.0),                  // x clamps into bin 0? no: bin 1 of [0,2)x2
      (2.0, 2.0),                  // hi on both axes -> last bin via clamp? >= hi -> overflow
      (-1.0, 0.5),                 // x underflow
      (0.5, Double.NaN)
    ).toDF("x", "y")
    val got = Profile.histogram2d(df.filter(!isnan(col("y"))), "x", "y",
        0.0, 2.0, 2, 0.0, 2.0, 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got(((0, 0))) === 2L)
    assert(got(((1, 0))) === 1L)
    assert(got(((2, 2))) === 1L) // overflow bins carry id = bins
    assert(got(((-1, 0))) === 1L)
    assert(got.values.sum === 5L)
  }

  test("groupedBinQuantiles: closed per-group bin selection") {
    // group a: 10 values in bin 0 ([0,1)), 10 in bin 9 ([9,10)) →
    // median bin = 0 (cum 10 >= 0.5*20), p90 bin = 9
    // group b: all 5 values in bin 4 → every quantile bin = 4
    val rows = (1 to 10).map(_ => ("a", 0.5)) ++
      (1 to 10).map(_ => ("a", 9.5)) ++ (1 to 5).map(_ => ("b", 4.5))
    val out = Profile.groupedBinQuantiles(rows.toDF("k", "x"), "k", "x",
        lo = 0.0, hi = 10.0, nBins = 10, qs = Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getInt(2), r.getDouble(3))).toMap
    assert(out(("a", 0.5)) === ((0, 0.0)))
    assert(out(("a", 0.9)) === ((9, 9.0)))
    assert(out(("b", 0.5)) === ((4, 4.0)))
    assert(out(("b", 0.9)) === ((4, 4.0)))
  }

  test("groupedBinQuantiles: out-of-range values clamp into edge bins") {
    val rows = Seq(("g", -5.0), ("g", -4.0), ("g", 99.0))
    val out = Profile.groupedBinQuantiles(rows.toDF("k", "x"), "k", "x",
        0.0, 10.0, 5, Seq(0.5, 1.0))
      .collect().map(r => r.getDouble(1) -> r.getInt(2)).toMap
    assert(out(0.5) === 0) // two clamped-low of three
    assert(out(1.0) === 4) // clamped-high lands in the last bin
  }

  test("groupedMode: most frequent value per group, ties to the smallest") {
    val df = Seq(("a", 2), ("a", 2), ("a", 5), ("b", 7), ("b", 3),
      ("c", 9)).toDF("k", "v")
    val got = Profile.groupedMode(df, "k", "v").collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(got("a") === ((2, 2L)))
    assert(got("b") === ((3, 1L))) // tie 7 vs 3 at count 1 → smaller value
    assert(got("c") === ((9, 1L)))
  }

  test("groupedMode ignores null values") {
    val df = Seq(("a", Some(1)), ("a", None), ("a", None)).toDF("k", "v")
    val got = Profile.groupedMode(df, "k", "v").collect()
    assert(got.length === 1 && got.head.getInt(1) === 1)
  }

  test("groupedBinQuantiles brackets the exact quantile within one bin") {
    val rows = (1 to 1000).map(i => ("g", i / 100.0)) // uniform (0, 10]
    val out = Profile.groupedBinQuantiles(rows.toDF("k", "x"), "k", "x",
        0.0, 10.0, 100, Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getDouble(1) -> r.getDouble(3)).toMap
    assert(math.abs(out(0.25) - 2.5) <= 0.1)
    assert(math.abs(out(0.5) - 5.0) <= 0.1)
    assert(math.abs(out(0.75) - 7.5) <= 0.1)
  }

  test("exactQuantiles selects the exact order statistics") {
    val df = (1 to 10).map(_.toLong).toDF("v")
    val got = Profile.exactQuantiles(df, "v", Seq(0.25, 0.5, 1.0))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    // ranks ceil(p·10) = 3, 5, 10
    assert(got.toSeq === Seq((0.25, 3L, 3L), (0.5, 5L, 5L), (1.0, 10L, 10L)))
  }

  test("exactQuantiles handles duplicates, negatives, and tiny p") {
    val df = Seq(-5L, -5L, -5L, 0L, 7L, 7L, 9L).toDF("v")
    val got = Profile.exactQuantiles(df, "v", Seq(0.001, 0.2, 0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getLong(2)).toMap
    // ranks: max(1, ceil(.007)) = 1, ceil(1.4) = 2, ceil(3.5) = 4,
    // ceil(6.3) = 7
    assert(got === Map(0.001 -> -5L, 0.2 -> -5L, 0.5 -> 0L, 0.9 -> 9L))
  }

  test("exactQuantiles agrees with a full sort at every bucket width") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(round(col("l_extendedprice") * 100).cast("long").as("v"))
    val probs = Seq(0.01, 0.5, 0.99)
    val n = li.count()
    val w = org.apache.spark.sql.expressions.Window.orderBy("v")
    val ranked = li.withColumn("rn", row_number().over(w))
    val want = probs.map { p =>
      val k = math.max(1L, math.ceil(p * n).toLong)
      p -> ranked.filter(col("rn") === k).head().getLong(0)
    }.toMap
    for (b <- Seq(2, 16, 1024)) {
      val got = Profile.exactQuantiles(li, "v", probs, buckets = b)
        .collect().map(r => r.getDouble(0) -> r.getLong(2)).toMap
      assert(got === want, s"buckets=$b")
    }
  }

  test("exactQuantiles rejects float columns and empty input loudly") {
    intercept[IllegalArgumentException] {
      Profile.exactQuantiles(Seq(1.5).toDF("v"), "v", Seq(0.5))
    }
    intercept[IllegalArgumentException] {
      Profile.exactQuantiles(Seq.empty[Long].toDF("v"), "v", Seq(0.5))
    }
  }

  test("kAnonymityViolations flags classes under k, nulls group as values") {
    val df = Seq(
      ("a", 1), ("a", 1), ("a", 1),     // class of 3: safe at k = 3
      ("b", 2), ("b", 2),               // class of 2: violation
      ("c", 3),                         // singleton: violation
      (null, 4), (null, 4)              // null quasi: class of 2
    ).toDF("q1", "q2")
    val got = Profile.kAnonymityViolations(df, Seq("q1", "q2"), 3)
      .collect().map(r => (Option(r.getString(0)).getOrElse("<null>"),
        r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === Map(("b", 2) -> 2L, ("c", 3) -> 1L, ("<null>", 4) -> 2L))
    intercept[IllegalArgumentException] {
      Profile.kAnonymityViolations(df, Nil, 3)
    }
  }

  test("trimmedMean: closed case with exact quantile bounds") {
    // 1..20: p05 → rank 1 → 1; p95 → rank 19 → 19
    val df = (1L to 20L).toDF("v")
    val r = Profile.trimmedMean(df, "v", 0.05, 0.95).head()
    assert(r.getAs[Long]("n") === 20L)
    assert(r.getAs[Long]("q_lo") === 1L && r.getAs[Long]("q_hi") === 19L)
    assert(r.getAs[Long]("n_kept") === 19L) // only 20 is dropped
    assert(r.getAs[Double]("trimmed_mean") === (1 to 19).sum / 19.0)
    // winsorized: 20 clamps to 19
    assert(r.getAs[Double]("winsorized_mean") ===
      ((1 to 19).sum + 19) / 20.0)
  }

  test("trimmedMean resists a whale the plain mean cannot") {
    val df = ((1L to 99L) :+ 1000000L).toDF("v")
    val r = Profile.trimmedMean(df, "v", 0.05, 0.95).head()
    assert(r.getAs[Double]("trimmed_mean") < 60.0)
    assert(r.getAs[Double]("winsorized_mean") < 60.0)
  }

  test("lDiversityViolations flags low-diversity classes; nulls excluded") {
    val df = Seq(
      ("a", "flu"), ("a", "cold"), ("a", "flu"),   // 2 distinct: ok at l=2
      ("b", "flu"), ("b", "flu"), ("b", "flu"),    // 1 distinct: violation
      ("c", null), ("c", "flu")                    // nulls not diverse: 1
    ).toDF("q", "dx")
    val got = Profile.lDiversityViolations(df, Seq("q"), "dx", 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === Map("b" -> ((3L, 1L)), "c" -> ((2L, 1L))))
    intercept[IllegalArgumentException] {
      Profile.lDiversityViolations(df, Seq("dx"), "dx", 2)
    }
  }

  test("tClosenessViolations: closed EMD on two skewed classes") {
    // global values {1,2,3,4} each mass 1/4; class A holds only {1,2},
    // class B only {3,4}: cum diffs (±1/4, ±1/2, ±1/4, 0) → EMD = 1/3
    val df = Seq(
      ("A", 1L), ("A", 1L), ("A", 2L), ("A", 2L),
      ("B", 3L), ("B", 3L), ("B", 4L), ("B", 4L)
    ).toDF("q", "v")
    val got = Profile.tClosenessViolations(df, Seq("q"), "v", t = 0.3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val emd = BigDecimal(1.0 / 3.0)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Map("A" -> ((4L, emd)), "B" -> ((4L, emd))))
    // a uniform class is 0-distant and never flagged
    val uni = df.unionByName(
      Seq(("C", 1L), ("C", 2L), ("C", 3L), ("C", 4L)).toDF("q", "v"))
    val flagged = Profile.tClosenessViolations(uni, Seq("q"), "v", 0.01)
      .collect().map(_.getString(0)).toSet
    assert(!flagged.contains("C"))
  }

  test("tClosenessViolations: null sensitive dropped, guards fire") {
    val df = Seq(("A", Some(1L)), ("A", None), ("B", Some(2L)),
      ("B", Some(1L))).toDF("q", "v")
    // nulls drop: global = {1: 2, 2: 1}; class A = {1}, n = 1
    val a = Profile.tClosenessViolations(df, Seq("q"), "v", 0.1)
      .filter(col("q") === "A").head()
    assert(a.getLong(1) === 1L) // n counts only non-null-sensitive rows
    intercept[IllegalArgumentException] { // sensitive also quasi
      Profile.tClosenessViolations(df, Seq("v"), "v", 0.1)
    }
    intercept[IllegalArgumentException] { // domain too wide
      Profile.tClosenessViolations(df, Seq("q"), "v", 0.1, maxValues = 1)
    }
  }

  test("keySkew: closed concentration case") {
    // counts: a=6, b=2, c=1, d=1 over 10 rows
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .toDF("k")
    val r = Profile.keySkew(df, "k", topK = 2).head()
    assert(r.getLong(0) === 10L && r.getLong(1) === 4L)
    assert(r.getDouble(2) === 0.42) // (36+4+1+1)/100
    assert(r.getDouble(3) === 0.6)
    assert(r.getDouble(4) === 0.8)  // a + b
    // uniform keys: hhi = 1/n_keys
    val uni = (1L to 8L).map(_.toString).toDF("k")
    assert(Profile.keySkew(uni, "k").head().getDouble(2) === 0.125)
  }

  test("mondrianAnonymize: closed single-attribute recursion") {
    val df = (1L to 8L).map(v => Tuple1(v)).toDF("v")
    val got = Profile.mondrianAnonymize(df, Seq("v"), k = 2, rounds = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // med(1..8) = 4 → L/R; med(1..4) = 2 → LL/LR; n=2 < 2k stops
    assert(got === Map(
      "rLL" -> ((2L, 1L, 2L)), "rLR" -> ((2L, 3L, 4L)),
      "rRL" -> ((2L, 5L, 6L)), "rRR" -> ((2L, 7L, 8L))))
  }

  test("mondrianAnonymize: splits the widest-range attribute") {
    val df = (0L until 40L).map(i => (i % 2, i * 10)).toDF("a", "b")
    val out = Profile.mondrianAnonymize(df, Seq("a", "b"), 10, 1)
      .collect()
    // b spans 0..390 vs a 0..1: the cut must be on b
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getLong(2) === 0L && r.getLong(3) === 1L,
        "a stays unsplit (full range) in every leaf")
    }
    assert(out.map(_.getLong(5)).min < 390L, "b max shrank in one leaf")
  }

  test("mondrianAnonymize: constant data and k floor block the cut") {
    val df = Seq.fill(10)(Tuple1(7L)).toDF("v")
    val out = Profile.mondrianAnonymize(df, Seq("v"), 2, 4).collect()
    assert(out.length === 1 && out.head.getString(0) === "r")
    assert(out.head.getLong(1) === 10L)
    // every released leaf satisfies k on real data
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_acctbal").cast("long").as("bal"), col("c_custkey"))
    Profile.mondrianAnonymize(cust, Seq("bal", "c_custkey"), 5, 6)
      .collect().foreach(r => assert(r.getLong(1) >= 5L))
  }

  test("mondrianAnonymize refuses a sub-k input loudly") {
    // 3 non-null rows < k=5: releasing the root leaf would quietly
    // breach the k-contract — it must throw, not return n=3
    val df = Seq(Some(1L), Some(2L), None, Some(3L)).toDF("v")
    val e = intercept[Exception] {
      Profile.mondrianAnonymize(df, Seq("v"), k = 5, rounds = 2).collect()
    }
    assert(e.getMessage != null)
  }

  test("mondrianAnonymize is partition-invariant") {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_acctbal").cast("long").as("bal"),
        col("c_nationkey"))
    val run = (p: Int) => Profile.mondrianAnonymize(cust.repartition(p),
        Seq("bal", "c_nationkey"), 10, 4)
      .orderBy("leaf").collect().toSeq
    assert(run(1) === run(7))
  }

  test("tClosenessViolations is partition-invariant") {
    val df = spark.read.parquet(s"$sfDir/customer.parquet")
      .withColumn("bin", floor(col("c_acctbal") / 1000).cast("long"))
    val run = (p: Int) => Profile.tClosenessViolations(
      df.repartition(p), Seq("c_mktsegment"), "bin", 0.01)
      .orderBy("c_mktsegment").collect().toSeq
    assert(run(1) === run(7))
  }
}
