package graft.glm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("auc: perfect, inverted, and random-ish separation") {
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)).toDF("s", "y")
    assert(Eval.auc(perfect, "s", "y").head().getDouble(0) === 1.0)
    val inverted = Seq((0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)).toDF("s", "y")
    assert(Eval.auc(inverted, "s", "y").head().getDouble(0) === 0.0)
    val half = Seq((0.7, 1), (0.7, 0), (0.3, 1), (0.3, 0)).toDF("s", "y")
    assert(Eval.auc(half, "s", "y").head().getDouble(0) === 0.5)
  }

  test("auc equals the brute-force pairwise probability (with tie credit)") {
    val rows = Seq(
      (0.1, 0), (0.2, 1), (0.2, 0), (0.35, 0), (0.5, 1), (0.5, 0),
      (0.5, 1), (0.8, 0), (0.9, 1), (0.9, 1))
    val df = rows.toDF("s", "y")
    val got = Eval.auc(df, "s", "y").head()
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val brute = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum / (pos.size * neg.size)
    assert(math.abs(got.getDouble(0) - brute) < 1e-12)
    assert(got.getLong(1) === pos.size.toLong && got.getLong(2) === neg.size.toLong)
  }

  test("calibration: fixed-width bins, clamping, exact fractions") {
    val df = Seq(
      (0.05, 0), (0.15, 0), (0.15, 1),     // bins 0 and 1
      (0.95, 1), (1.0, 1)                  // 1.0 clamps into the last bin
    ).toDF("s", "y")
    val out = Eval.calibration(df, "s", "y", nBins = 10, lo = 0.0, hi = 1.0)
      .orderBy("bin").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(0, 1, 9))
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L, 2L))
    assert(math.abs(out(1).getDouble(3) - 0.5) < 1e-12)
    assert(math.abs(out(2).getDouble(3) - 1.0) < 1e-12)
    assert(math.abs(out(2).getDouble(2) - 0.975) < 1e-12)
  }

  test("calibrationQuantile: equi-mass bins on a skewed unbounded score") {
    // lognormal-ish skew: fixed-width bins would pile everything left
    val df = (1 to 2000)
      .map(i => (math.exp(i % 97 / 10.0), if (i % 5 == 0) 1 else 0))
      .toDF("s", "y")
    val out = Eval.calibrationQuantile(df, "s", "y", nBins = 8)
      .orderBy("bin").collect()
    val counts = out.map(_.getLong(1))
    assert(counts.sum === 2000L)
    // every bin within 50% of the ideal n/nBins (ties distort, never empty)
    counts.foreach(c => assert(c > 0 && c < 2 * 2000 / 8, counts.mkString(",")))
    // bin means must be strictly increasing (edges partition the support)
    val means = out.map(_.getDouble(2))
    assert(means.zip(means.tail).forall { case (a, b) => a < b }, means.mkString(","))
  }

  test("calibrationQuantile agrees with calibration on a uniform score") {
    // uniform scores on [0,1): quantile edges ≈ fixed-width edges, so the
    // per-bin positive fractions must match the exact fixed-width pass
    val df = (0 until 1000).map(i => (i / 1000.0, if (i % 3 == 0) 1 else 0))
      .toDF("s", "y")
    val fixed = Eval.calibration(df, "s", "y", nBins = 4, lo = 0.0, hi = 1.0)
      .orderBy("bin").collect().map(r => (r.getLong(1), r.getDouble(3)))
    val quant = Eval.calibrationQuantile(df, "s", "y", nBins = 4,
        relativeError = 1e-6)
      .orderBy("bin").collect().map(r => (r.getLong(1), r.getDouble(3)))
    assert(fixed.length === quant.length)
    fixed.zip(quant).foreach { case ((nf, ff), (nq, fq)) =>
      assert(math.abs(nf - nq) <= 1, s"bin sizes $nf vs $nq")
      assert(math.abs(ff - fq) < 0.01, s"fractions $ff vs $fq")
    }
  }

  test("logRank: identical groups give chi2 ~ 0; separated groups do not") {
    // identical survival in both groups → no signal
    val same = (1 to 20).flatMap(i =>
      Seq(("a", i.toDouble, 1), ("b", i.toDouble, 1))).toDF("g", "dur", "ev")
    val chiSame = Survival.logRank(same, "dur", "ev", "g", "a")
      .head().getDouble(0)
    assert(chiSame < 1e-9)
    // group a fails much earlier → strong signal
    val sep = ((1 to 20).map(i => ("a", i.toDouble, 1)) ++
      (31 to 50).map(i => ("b", i.toDouble, 1))).toDF("g", "dur", "ev")
    val chiSep = Survival.logRank(sep, "dur", "ev", "g", "a")
      .head().getDouble(0)
    assert(chiSep > 10.0, s"chi2 = $chiSep")
  }

  test("averagePrecision: closed cases and brute-force threshold-sweep parity") {
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)).toDF("s", "y")
    assert(Eval.averagePrecision(perfect, "s", "y").head().getDouble(0) === 1.0)
    // hand case: thresholds desc 0.9 (tp=1/tot=1), 0.8 (p=0), 0.7 (tp=2/tot=3)
    // → AP = (1/2)·1 + (1/2)·(2/3) = 5/6
    val mixed = Seq((0.9, 1), (0.8, 0), (0.7, 1)).toDF("s", "y")
    assert(math.abs(Eval.averagePrecision(mixed, "s", "y").head().getDouble(0)
      - 5.0 / 6.0) < 1e-12)

    // brute force: walk distinct scores descending, AP = Σ ΔR·P — with ties
    val rows = Seq(
      (0.1, 0), (0.2, 1), (0.2, 0), (0.35, 0), (0.5, 1), (0.5, 0),
      (0.5, 1), (0.8, 0), (0.9, 1), (0.9, 1))
    val got = Eval.averagePrecision(rows.toDF("s", "y"), "s", "y").head()
    val p = rows.count(_._2 == 1).toDouble
    val brute = rows.map(_._1).distinct.sorted.reverse.map { thr =>
      val above = rows.filter(_._1 >= thr)
      val tpAt = rows.count(r => r._1 == thr && r._2 == 1)
      tpAt / p * above.count(_._2 == 1) / above.size
    }.sum
    assert(math.abs(got.getDouble(0) - brute) < 1e-12)
    assert(got.getLong(1) === rows.count(_._2 == 1).toLong)
    assert(got.getLong(2) === rows.size.toLong)
  }

  test("thresholdMetrics: exact confusion counts and derived metrics") {
    val df = Seq(
      (0.9, 1), (0.8, 1), (0.7, 0), (0.6, 1), (0.4, 0), (0.3, 1), (0.1, 0)
    ).toDF("s", "y")
    val out = Eval.thresholdMetrics(df, "s", "y", Seq(0.5, 0.65))
      .orderBy("threshold").collect()
    // τ=0.5: predicted pos = {0.9,0.8,0.7,0.6} → tp=3 fp=1; fn=1 tn=2
    assert(out(0).getAs[Long]("tp") === 3L && out(0).getAs[Long]("fp") === 1L)
    assert(out(0).getAs[Long]("fn") === 1L && out(0).getAs[Long]("tn") === 2L)
    assert(math.abs(out(0).getAs[Double]("precision") - 0.75) < 1e-12)
    assert(math.abs(out(0).getAs[Double]("recall") - 0.75) < 1e-12)
    assert(math.abs(out(0).getAs[Double]("f1") - 0.75) < 1e-12)
    assert(math.abs(out(0).getAs[Double]("accuracy") - 5.0 / 7.0) < 1e-12)
    // τ=0.65: predicted pos = {0.9,0.8,0.7} → tp=2 fp=1; fn=2 tn=2
    assert(out(1).getAs[Long]("tp") === 2L && out(1).getAs[Long]("fp") === 1L)
    assert(math.abs(out(1).getAs[Double]("f1") - 2.0 * 2 / (3 + 4)) < 1e-12)
  }

  test("logRank matches a local reference on a censored closed case") {
    val data = Seq(
      ("a", 1.0, 1), ("a", 2.0, 0), ("a", 3.0, 1), ("a", 5.0, 1),
      ("b", 2.0, 1), ("b", 4.0, 1), ("b", 5.0, 0), ("b", 6.0, 1))
    val df = data.toDF("g", "dur", "ev")
    val got = Survival.logRank(df, "dur", "ev", "g", "a").head()
    // local reference: walk distinct times with risk sets
    var (omE, v) = (0.0, 0.0)
    var obs1 = 0.0
    val times = data.map(_._2).distinct.sorted
    for (t <- times) {
      val atRisk = data.filter(_._2 >= t)
      val n = atRisk.size.toDouble
      val n1 = atRisk.count(_._1 == "a").toDouble
      val d = data.count(r => r._2 == t && r._3 == 1).toDouble
      val d1 = data.count(r => r._1 == "a" && r._2 == t && r._3 == 1).toDouble
      obs1 += d1
      if (d > 0 && n > 1) {
        omE += d1 - d * n1 / n
        v += d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1)
      } else if (d > 0) omE += d1 - d * n1 / n
    }
    val ref = omE * omE / v
    assert(math.abs(got.getDouble(0) - ref) < 1e-12)
    assert(math.abs(got.getLong(1) - obs1) < 1e-12)
  }

  // one labeled point per (bin, label) need: score in [0,1), 4 bins of 0.25
  private def isoInput(rates: Seq[(Double, Int, Int)]) = {
    // (bin center score, positives, negatives)
    import spark.implicits._
    rates.flatMap { case (s, p, n) =>
      Seq.fill(p)((s, 1)) ++ Seq.fill(n)((s, 0))
    }.toDF("s", "y")
  }

  test("aucByGroup matches the global auc computed per subset") {
    val rows = Seq(
      ("g1", 0.1, 0), ("g1", 0.4, 0), ("g1", 0.35, 1), ("g1", 0.8, 1),
      ("g2", 0.2, 1), ("g2", 0.3, 0), ("g2", 0.5, 0), ("g2", 0.5, 1))
    val df = rows.toDF("g", "s", "y")
    val grouped = Eval.aucByGroup(df, "g", "s", "y").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("auc")).toMap
    for (g <- Seq("g1", "g2")) {
      val global = Eval.auc(df.filter($"g" === g), "s", "y")
        .head().getDouble(0)
      assert(math.abs(grouped(g) -
        BigDecimal(global).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble) < 1e-9, g)
    }
  }

  test("aucByGroup: single-class groups yield null") {
    val df = Seq(("a", 0.5, 1), ("a", 0.6, 1), ("b", 0.1, 0), ("b", 0.9, 1))
      .toDF("g", "s", "y")
    val out = Eval.aucByGroup(df, "g", "s", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("a").isNullAt(out("a").fieldIndex("auc")))
    assert(out("b").getAs[Double]("auc") === 1.0)
  }

  test("groupFairness: closed rates and 80%-rule ratios") {
    // group A: 10 rows, 5 pos labels, 6 selected (4 TP, 2 FP)
    // group B: 10 rows, 5 pos labels, 3 selected (3 TP, 0 FP)
    val rows =
      (1 to 4).map(_ => ("A", 1, 1)) ++ Seq(("A", 1, 0)) ++
      (1 to 2).map(_ => ("A", 0, 1)) ++ (1 to 3).map(_ => ("A", 0, 0)) ++
      (1 to 3).map(_ => ("B", 1, 1)) ++ (1 to 2).map(_ => ("B", 1, 0)) ++
      (1 to 5).map(_ => ("B", 0, 0))
    val out = Eval.groupFairness(rows.toDF("g", "y", "p"), "g", "y", "p")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getAs[Double]("selection_rate") === 0.6)
    assert(out("B").getAs[Double]("selection_rate") === 0.3)
    assert(out("A").getAs[Double]("tpr") === 0.8)
    assert(out("B").getAs[Double]("tpr") === 0.6)
    assert(out("A").getAs[Double]("fpr") === 0.4)
    assert(out("B").getAs[Double]("fpr") === 0.0)
    assert(out("A").getAs[Double]("rate_ratio") === 1.0)
    assert(out("B").getAs[Double]("rate_ratio") === 0.5)
    assert(out("B").getAs[Double]("tpr_ratio") === 0.75)
  }

  test("groupFairness: degenerate groups yield null rates, not errors") {
    // group C has no positive labels → tpr null; all-positive → fpr null
    val rows = Seq(("C", 0, 1), ("C", 0, 0), ("D", 1, 1), ("D", 1, 0))
    val out = Eval.groupFairness(rows.toDF("g", "y", "p"), "g", "y", "p")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("C").isNullAt(out("C").fieldIndex("tpr")))
    assert(out("D").isNullAt(out("D").fieldIndex("fpr")))
  }

  test("brierDecomposition: Murphy identity on bin-constant forecasts") {
    // forecasts constant within bins → brier = rel − res + unc exactly
    // bin rates: 0.2 @ s=0.1 (10 rows), 0.8 @ s=0.7 (10 rows)
    val df = isoInput(Seq((0.1, 2, 8), (0.7, 8, 2)))
    val r = Eval.brierDecomposition(df, "s", "y", nBins = 5).head()
    val brier = r.getAs[Double]("brier")
    val rel = r.getAs[Double]("reliability")
    val res = r.getAs[Double]("resolution")
    val unc = r.getAs[Double]("uncertainty")
    assert(math.abs(brier - (rel - res + unc)) < 1e-6)
    assert(r.getAs[Double]("within_bin_var") === 0.0)
    // hand values: obar=0.5 → unc=0.25; rel = ((0.1-0.2)²+(0.7-0.8)²)/2
    assert(math.abs(unc - 0.25) < 1e-9)
    assert(math.abs(rel - 0.01) < 1e-9)
    assert(math.abs(res - (2 * 10 * 0.09) / 20) < 1e-9)
  }

  test("brierDecomposition: perfect confident forecasts score 0") {
    val df = isoInput(Seq((0.0, 0, 10), (0.9999, 10, 0)))
    val r = Eval.brierDecomposition(df, "s", "y", nBins = 10).head()
    assert(r.getAs[Double]("brier") < 1e-6)
    assert(r.getAs[Double]("reliability") < 1e-6)
  }

  test("gainsTable: closed deciles, capture and lift") {
    // 100 rows, scores 1..100, positives exactly the top 20 scores
    val df = (1 to 100).map(i => (i.toDouble, if (i > 80) 1 else 0))
      .toDF("s", "y")
    val out = Eval.gainsTable(df, "s", "y", nTiles = 10)
      .orderBy("tile").collect()
    assert(out.length === 10)
    val t1 = out.head
    assert(t1.getAs[Long]("n") === 10L && t1.getAs[Long]("n_pos") === 10L)
    assert(t1.getAs[Double]("capture") === 0.5)
    assert(t1.getAs[Double]("lift") === 5.0)
    val t2 = out(1)
    assert(t2.getAs[Double]("capture") === 1.0)
    assert(t2.getAs[Double]("lift") === 5.0)
    // once all positives are captured lift decays as 1/share
    assert(out.last.getAs[Double]("lift") === 1.0)
    assert(out.map(_.getAs[Long]("n")).sum === 100L)
  }

  test("gainsTable: tied scores share a tile deterministically") {
    // one score carries 60% of rows: its tile is ceil(10·0.6) = 6
    val df = ((1 to 60).map(_ => (5.0, 0)) ++
      (1 to 40).map(i => (10.0 + i, if (i > 20) 1 else 0)))
      .toDF("s", "y")
    val out = Eval.gainsTable(df, "s", "y", nTiles = 10)
      .orderBy("tile").collect()
    val big = out.find(_.getAs[Long]("n") === 60L).get
    assert(big.getAs[Int]("tile") === 10) // worst scores, ceil share = 1.0
    assert(out.map(_.getAs[Long]("n")).sum === 100L)
  }

  test("isotonicCalibration: PAV pools a violating pair") {
    // raw rates by bin: 0.1, 0.5, 0.3, 0.7 (10 rows each) → pooling bins
    // 1 and 2 to 0.4 restores monotonicity
    val df = isoInput(Seq((0.1, 1, 9), (0.35, 5, 5), (0.6, 3, 7),
      (0.85, 7, 3)))
    val out = Eval.isotonicCalibration(df, "s", "y", nBins = 4,
        lo = 0.0, hi = 1.0)
      .orderBy("bin").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(0, 1, 2, 3))
    val iso = out.map(_.getAs[Double]("iso_rate"))
    assert(iso.toSeq === Seq(0.1, 0.4, 0.4, 0.7))
    val raw = out.map(_.getAs[Double]("frac_pos"))
    assert(raw.toSeq === Seq(0.1, 0.5, 0.3, 0.7))
  }

  test("isotonicCalibration: already-monotone rates pass through") {
    val df = isoInput(Seq((0.1, 1, 9), (0.35, 3, 7), (0.6, 5, 5),
      (0.85, 9, 1)))
    val out = Eval.isotonicCalibration(df, "s", "y", 4, 0.0, 1.0)
      .orderBy("bin").collect()
    out.foreach { r =>
      assert(r.getAs[Double]("iso_rate") === r.getAs[Double]("frac_pos"))
    }
  }

  test("isotonicCalibration: pooling is count-weighted, cascades left") {
    // bins: rate 0.8 (10 rows), 0.2 (30 rows) → single pool at
    // (8+6)/40 = 0.35; a third bin at 0.9 stays its own pool
    val df = isoInput(Seq((0.1, 8, 2), (0.35, 6, 24), (0.6, 9, 1)))
    val out = Eval.isotonicCalibration(df, "s", "y", 4, 0.0, 1.0)
      .orderBy("bin").collect()
    val iso = out.map(_.getAs[Double]("iso_rate"))
    assert(math.abs(iso(0) - 0.35) < 1e-12)
    assert(math.abs(iso(1) - 0.35) < 1e-12)
    assert(math.abs(iso(2) - 0.9) < 1e-12)
  }

  test("isotonicCalibration result is monotone on adversarial rates") {
    val df = isoInput(Seq((0.1, 9, 1), (0.35, 7, 3), (0.6, 5, 5),
      (0.85, 1, 9)))
    val iso = Eval.isotonicCalibration(df, "s", "y", 4, 0.0, 1.0)
      .orderBy("bin").collect().map(_.getAs[Double]("iso_rate"))
    assert(iso.sliding(2).forall { case Array(x, y) => x <= y })
    // total positives are conserved under pooling (weighted mean)
    assert(math.abs(iso.head - 22.0 / 40) < 1e-12)
  }

  test("multiclassMetrics: hand-computed 3-class fixture") {
    import spark.implicits._
    // label/pred pairs: A: 3 true (2 hit), B: 2 true (1 hit),
    // C predicted twice but never true
    val df = Seq(("A", "A"), ("A", "A"), ("A", "C"), ("B", "B"),
      ("B", "C")).toDF("y", "p")
    val got = Eval.multiclassMetrics(df, "y", "p").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = got("A")
    assert(a.getLong(1) === 3L && a.getLong(2) === 2L && a.getLong(3) === 2L)
    assert(a.getDouble(4) === 1.0) // precision 2/2
    assert(math.abs(a.getDouble(5) - rd6(2.0 / 3)) < 1e-12) // recall
    val c = got("C")
    assert(c.getLong(1) === 0L && c.getLong(2) === 2L)
    assert(c.isNullAt(5), "recall undefined for never-true class")
    assert(c.getDouble(4) === 0.0) // precision 0/2
    val m = got("__macro__")
    // macro precision over {A: 1, B: 1, C: 0} = 2/3
    assert(math.abs(m.getDouble(4) - rd6(2.0 / 3)) < 1e-12)
    // macro recall over defined {A: 2/3, B: 1/2}
    assert(math.abs(m.getDouble(5) - rd6((2.0 / 3 + 0.5) / 2)) < 1e-12)
  }

  test("cohensKappa: hand-computed 2x2 fixture") {
    // classic example: 45 yes-yes, 15 yes-no, 25 no-yes, 15 no-no
    // po = 60/100; pe = (60*70 + 40*30)/100^2 = 0.54
    // kappa = (0.6 - 0.54)/(1 - 0.54) = 6/46
    val rows = Seq.fill(45)(("y", "y")) ++ Seq.fill(15)(("y", "n")) ++
      Seq.fill(25)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = Eval.cohensKappa(rows.toDF("r1", "r2"), "r1", "r2").head()
    assert(r.getLong(0) === 100L)
    assert(math.abs(r.getDouble(1) - 0.6) < 1e-12)
    assert(math.abs(r.getDouble(2) - 0.54) < 1e-12)
    assert(math.abs(r.getDouble(3) - 6.0 / 46) < 1e-12)
  }

  test("cohensKappa: perfect agreement is 1, constant raters null") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("r1", "r2")
    assert(math.abs(Eval.cohensKappa(perfect, "r1", "r2").head()
      .getDouble(3) - 1.0) < 1e-12)
    val const = Seq(("a", "a"), ("a", "a")).toDF("r1", "r2")
    assert(Eval.cohensKappa(const, "r1", "r2").head().isNullAt(3))
  }

  test("upliftByTile: persuadables front-load uplift and qini") {
    // score 2 = persuadables (treated respond, control don't);
    // score 1 = lost causes (nobody responds)
    val rows =
      Seq.fill(10)((2.0, 1, 1)) ++ Seq.fill(10)((2.0, 0, 0)) ++
      Seq.fill(10)((1.0, 1, 0)) ++ Seq.fill(10)((1.0, 0, 0))
    val df = rows.toDF("score", "treat", "label")
    val t = Eval.upliftByTile(df, "score", "treat", "label", nTiles = 2)
      .orderBy("tile").collect()
    assert(t.length === 2)
    val t1 = t.head
    assert(t1.getAs[Long]("cum_n_treat") === 10L &&
      t1.getAs[Long]("cum_pos_treat") === 10L)
    assert(t1.getAs[Double]("uplift") === 1.0)
    assert(t1.getAs[Double]("qini") === 10.0)
    val t2 = t(1)
    assert(t2.getAs[Double]("uplift") === 0.5)
    assert(t2.getAs[Double]("qini") === 10.0) // no extra lift in tile 2
  }

  test("upliftByTile: empty control arm yields null uplift, exact counts invariant") {
    val all = (1 to 30).map(i => (i.toDouble, 1, i % 2)).toDF("score", "treat", "label")
    val t = Eval.upliftByTile(all, "score", "treat", "label", nTiles = 3)
      .orderBy("tile").collect()
    assert(t.forall(_.isNullAt(6)), "no control rows -> null uplift")
    val again = Eval.upliftByTile(all.repartition(7), "score", "treat",
      "label", nTiles = 3).orderBy("tile").collect()
    assert(t.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("expectedCalibrationError: closed two-bin case") {
    // bin 2 (scores 0.2): conf 0.2, acc 0.5; bin 7 (0.7): conf 0.7,
    // acc 1.0 — both gaps 0.3 → ece 0.3, mce 0.3
    val df = Seq((0.2, 1), (0.2, 0), (0.7, 1), (0.7, 1))
      .toDF("score", "label")
    val r = Eval.expectedCalibrationError(df, "score", "label", 10).head()
    assert(r.getLong(0) === 4L && r.getLong(1) === 2L)
    assert(math.abs(r.getAs[Double]("ece") - 0.3) < 1e-9)
    assert(math.abs(r.getAs[Double]("mce") - 0.3) < 1e-9)
  }

  test("expectedCalibrationError: perfect calibration scores 0; " +
      "score 1.0 clamps into the last bin") {
    val df = Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0), (1.0, 1))
      .toDF("score", "label")
    val r = Eval.expectedCalibrationError(df, "score", "label", 10).head()
    assert(r.getLong(1) === 2L) // bins 5 and 9 (clamped)
    assert(r.getAs[Double]("mce") >= 0.0)
    val perfect = Seq((0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0))
      .toDF("score", "label")
    assert(Eval.expectedCalibrationError(perfect, "score", "label", 4)
      .head().getAs[Double]("ece") === 0.0)
  }

  test("expectedCalibrationError rejects out-of-range scores loudly") {
    val df = Seq((1.5, 1)).toDF("score", "label")
    intercept[Exception] {
      Eval.expectedCalibrationError(df, "score", "label", 10).collect()
    }
  }

  test("expectedCalibrationError is partition-invariant on lineitem") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("score", col("l_quantity") / lit(50.0))
      .withColumn("label", when(col("l_returnflag") === "R", 1)
        .otherwise(0))
    val run = (p: Int) => Eval.expectedCalibrationError(
      li.repartition(p), "score", "label", 10).collect().toSeq
    assert(run(1) === run(7))
  }

  test("qiniCoefficient: closed 4-row curve scores 0.75; reversal -0.375") {
    // descending cutoffs: Q = 1, 1, 1, 0 -> trapezoid area 0.75, Qtot 0
    val good = Seq((4.0, 1, 1), (3.0, 0, 0), (2.0, 1, 0), (1.0, 0, 1))
      .toDF("score", "treat", "label")
    val g = Eval.qiniCoefficient(good, "score", "treat", "label").head()
    assert(g.getLong(0) === 4L && g.getLong(1) === 2L && g.getLong(2) === 2L)
    assert(g.getAs[Double]("uplift_total") === 0.0)
    assert(g.getAs[Double]("qini") === 0.75)
    // the same rows ranked WORST-first flip the area's sign
    val bad = Seq((1.0, 1, 1), (2.0, 0, 0), (3.0, 1, 0), (4.0, 0, 1))
      .toDF("score", "treat", "label")
    assert(Eval.qiniCoefficient(bad, "score", "treat", "label").head()
      .getAs[Double]("qini") === -0.375)
  }

  test("qiniCoefficient: a constant score is exactly random (qini 0)") {
    val df = Seq((1.0, 1, 1), (1.0, 0, 0), (1.0, 1, 0), (1.0, 0, 1))
      .toDF("score", "treat", "label")
    val r = Eval.qiniCoefficient(df, "score", "treat", "label").head()
    assert(r.getAs[Double]("qini") === 0.0,
      "the trapezoid convention has no single-cutoff artifact")
  }

  test("qiniBySegment matches the global qini computed per filtered segment") {
    // the grouped readout must be EXACTLY the global arithmetic per
    // slice: the closed 0.75 curve and its -0.375 reversal as two
    // segments of one frame
    val df = Seq(
      ("a", 4.0, 1, 1), ("a", 3.0, 0, 0), ("a", 2.0, 1, 0), ("a", 1.0, 0, 1),
      ("b", 1.0, 1, 1), ("b", 2.0, 0, 0), ("b", 3.0, 1, 0), ("b", 4.0, 0, 1)
    ).toDF("seg", "score", "treat", "label")
    val got = Eval.qiniBySegment(df, "seg", "score", "treat", "label")
      .orderBy("seg").collect()
    assert(got.map(_.getString(0)).toSeq === Seq("a", "b"))
    assert(got(0).getAs[Double]("qini") === 0.75)
    assert(got(1).getAs[Double]("qini") === -0.375)
    // and on real data: per-segment rows equal the global op on the slice
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(month(col("l_shipdate")).as("seg"),
        col("l_extendedprice").as("score"),
        (col("l_partkey") % 2 === 0).cast("int").as("treat"),
        (col("l_returnflag") === "R").cast("int").as("label"))
    val grouped = Eval.qiniBySegment(li, "seg", "score", "treat", "label")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getAs[Double]("uplift_total"),
          r.getAs[Double]("qini"))).toMap
    val modes = grouped.keySet
    assert(modes.size >= 2)
    modes.take(2).foreach { m =>
      val g = Eval.qiniCoefficient(li.filter(col("seg") === m).drop("seg"),
        "score", "treat", "label").head()
      assert(grouped(m) === ((g.getLong(0),
        g.getAs[Double]("uplift_total"), g.getAs[Double]("qini"))), m)
    }
  }

  test("qiniBySegment is partition-invariant") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(month(col("l_shipdate")).as("seg"),
        col("l_extendedprice").as("score"),
        (col("l_partkey") % 2 === 0).cast("int").as("treat"),
        (col("l_returnflag") === "R").cast("int").as("label"))
    val run = (p: Int) => Eval.qiniBySegment(li.repartition(p), "seg",
      "score", "treat", "label").orderBy("seg").collect().toSeq
    assert(run(1) === run(7))
  }

  test("qiniCoefficient is partition-invariant on lineitem") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_extendedprice").as("score"),
        (col("l_partkey") % 2 === 0).cast("int").as("treat"),
        (col("l_returnflag") === "R").cast("int").as("label"))
    val run = (p: Int) => Eval.qiniCoefficient(li.repartition(p),
      "score", "treat", "label").collect().toSeq
    assert(run(1) === run(7))
  }

  private def rd6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
