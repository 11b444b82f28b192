package graft.glm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CoxSpec extends SparkSpec {
  import spark.implicits._

  /** Independent driver-local Breslow partial-likelihood Newton fit —
    * written directly from the formula, sharing no code with Cox.fit.
    */
  private def localCox(rows: Seq[(Double, Int, Array[Double])],
      p: Int, iters: Int = 50): Array[Double] = {
    var beta = Array.fill(p)(0.0)
    for (_ <- 1 to iters) {
      val u = Array.fill(p)(0.0)
      val h = Array.fill(p, p)(0.0)
      val times = rows.filter(_._2 == 1).map(_._1).distinct.sorted
      for (t <- times) {
        val risk = rows.filter(_._1 >= t)
        val evs = rows.filter(r => r._1 == t && r._2 == 1)
        val w = risk.map(r => math.exp(
          (0 until p).map(i => r._3(i) * beta(i)).sum))
        val s0 = w.sum
        val s1 = (0 until p).map(i =>
          risk.zip(w).map { case (r, wi) => r._3(i) * wi }.sum)
        for (i <- 0 until p)
          u(i) += evs.map(_._3(i)).sum - evs.size * s1(i) / s0
        for (i <- 0 until p; j <- 0 until p) {
          val s2 = risk.zip(w).map { case (r, wi) => r._3(i) * r._3(j) * wi }.sum
          h(i)(j) += evs.size * (s2 / s0 - (s1(i) / s0) * (s1(j) / s0))
        }
      }
      // solve h · delta = u (tiny p: Gaussian elimination)
      val m = h.map(_.clone)
      val b = u.clone
      for (c <- 0 until p) {
        val piv = m(c)(c)
        for (r <- c + 1 until p) {
          val f = m(r)(c) / piv
          for (cc <- c until p) m(r)(cc) -= f * m(c)(cc)
          b(r) -= f * b(c)
        }
      }
      val delta = Array.fill(p)(0.0)
      for (r <- (p - 1) to 0 by -1) {
        var s = b(r)
        for (cc <- r + 1 until p) s -= m(r)(cc) * delta(cc)
        delta(r) = s / m(r)(r)
      }
      beta = beta.zip(delta).map { case (x, d) => x + d }
    }
    beta
  }

  private val data = Seq(
    // (duration, event, x1, x2) — mixed censoring, one tie at t=5
    (1.0, 1, 1.0, 0.3), (2.0, 1, 0.0, 1.2), (3.0, 0, 1.0, 0.5),
    (4.0, 1, 0.0, 0.1), (5.0, 1, 1.0, 0.9), (5.0, 1, 0.0, 0.4),
    (6.0, 0, 1.0, 1.5), (7.0, 1, 0.0, 0.2), (8.0, 0, 0.0, 0.8),
    (9.0, 1, 1.0, 1.1))

  test("fit matches an independent local Breslow Newton solver") {
    val df = data.toDF("t", "e", "x1", "x2")
    val m = Cox.fit(df, "t", "e", Seq("x1", "x2"), ties = "breslow")
    val ref = localCox(data.map { case (t, e, a, b) =>
      (t, e, Array(a, b)) }, p = 2)
    assert(math.abs(m.beta(0) - ref(0)) < 1e-6,
      s"${m.beta(0)} vs ${ref(0)}")
    assert(math.abs(m.beta(1) - ref(1)) < 1e-6,
      s"${m.beta(1)} vs ${ref(1)}")
    assert(m.loglik > m.nullLoglik - 1e-12)
    assert(m.nEvents === 7L && m.n === 10L)
    assert(m.se.forall(s => s > 0 && s.isFinite))
  }

  test("a hazardous covariate gets a positive coefficient") {
    // x = 1 rows fail early, x = 0 rows late or censored
    val rows = Seq((1.0, 1, 1.0), (1.5, 1, 1.0), (2.0, 1, 1.0),
      (8.0, 1, 0.0), (9.0, 1, 0.0), (10.0, 0, 0.0))
    val m = Cox.fit(rows.toDF("t", "e", "x"), "t", "e", Seq("x"))
    assert(m.beta(0) > 1.0)
  }

  test("a covariate independent of hazard fits near zero") {
    // alternating x uncorrelated with failure order
    val rows = (1 to 12).map(i => (i.toDouble, 1, (i % 2).toDouble))
    val m = Cox.fit(rows.toDF("t", "e", "x"), "t", "e", Seq("x"))
    val ref = localCox(rows.map { case (t, e, x) => (t, e, Array(x)) }, 1)
    assert(math.abs(m.beta(0) - ref(0)) < 1e-6)
  }

  test("stratified fit with one stratum equals the unstratified fit") {
    val df = data.toDF("t", "e", "x1", "x2")
      .withColumn("g", org.apache.spark.sql.functions.lit("all"))
    val a = Cox.fit(df, "t", "e", Seq("x1", "x2"))
    val b = Cox.fit(df, "t", "e", Seq("x1", "x2"), strataCol = Some("g"))
    assert(math.abs(a.beta(0) - b.beta(0)) < 1e-10)
    assert(math.abs(a.beta(1) - b.beta(1)) < 1e-10)
    assert(math.abs(a.loglik - b.loglik) < 1e-10)
  }

  test("stratified fit matches a per-stratum local Breslow reference") {
    // two strata with different baselines, shared effect
    val strat = Seq(
      ("a", 1.0, 1, 1.0), ("a", 2.0, 1, 0.0), ("a", 3.0, 1, 1.0),
      ("a", 4.0, 0, 0.0), ("a", 5.0, 1, 0.0),
      ("b", 10.0, 1, 1.0), ("b", 20.0, 1, 1.0), ("b", 30.0, 1, 0.0),
      ("b", 40.0, 1, 0.0), ("b", 50.0, 0, 1.0))
    val df = strat.toDF("g", "t", "e", "x")
    val m = Cox.fit(df, "t", "e", Seq("x"), strataCol = Some("g"))
    // local reference: Newton on the summed per-stratum score/information
    var beta = 0.0
    for (_ <- 1 to 60) {
      var u = 0.0; var h = 0.0
      for (g <- Seq("a", "b")) {
        val rows = strat.filter(_._1 == g).map(r => (r._2, r._3, r._4))
        val times = rows.filter(_._2 == 1).map(_._1).distinct.sorted
        for (t <- times) {
          val risk = rows.filter(_._1 >= t)
          val evs = rows.filter(r => r._1 == t && r._2 == 1)
          val w = risk.map(r => math.exp(r._3 * beta))
          val s0 = w.sum
          val s1 = risk.zip(w).map { case (r, wi) => r._3 * wi }.sum
          val s2 = risk.zip(w).map { case (r, wi) => r._3 * r._3 * wi }.sum
          u += evs.map(_._3).sum - evs.size * s1 / s0
          h += evs.size * (s2 / s0 - (s1 / s0) * (s1 / s0))
        }
      }
      beta += u / h
    }
    assert(math.abs(m.beta(0) - beta) < 1e-6, s"${m.beta(0)} vs $beta")
  }

  test("fit is invariant to input partitioning") {
    val df = data.toDF("t", "e", "x1", "x2")
    val a = Cox.fit(df, "t", "e", Seq("x1", "x2"))
    val b = Cox.fit(df.repartition(7), "t", "e", Seq("x1", "x2"))
    assert(math.abs(a.beta(0) - b.beta(0)) < 1e-12)
    assert(math.abs(a.beta(1) - b.beta(1)) < 1e-12)
  }

  test("predictRisk is a pure projection of exp(x'beta)") {
    val df = data.toDF("t", "e", "x1", "x2")
    val m = Cox.fit(df, "t", "e", Seq("x1", "x2"))
    val out = m.predictRisk(df).select("x1", "x2", "risk").head()
    val want = math.exp(out.getDouble(0) * m.beta(0) +
      out.getDouble(1) * m.beta(1))
    assert(math.abs(out.getDouble(2) - want) < 1e-12)
  }

  /** Independent driver-local EFRON partial-likelihood Newton fit —
    * written directly from the formula (Efron 1977), sharing no code
    * with Cox.fit: per event time, the l-th of d tied events sees the
    * risk set minus l/d of the tied group's weight.
    */
  private def localCoxEfron(rows: Seq[(Double, Int, Array[Double])],
      p: Int, iters: Int = 50): (Array[Double], Double) = {
    var beta = Array.fill(p)(0.0)
    var ll = 0.0
    for (_ <- 1 to iters) {
      val u = Array.fill(p)(0.0)
      val h = Array.fill(p, p)(0.0)
      ll = 0.0
      val times = rows.filter(_._2 == 1).map(_._1).distinct.sorted
      for (t <- times) {
        val risk = rows.filter(_._1 >= t)
        val evs = rows.filter(r => r._1 == t && r._2 == 1)
        val d = evs.size
        def wOf(r: (Double, Int, Array[Double])) = math.exp(
          (0 until p).map(i => r._3(i) * beta(i)).sum)
        val s0 = risk.map(wOf).sum
        val s1 = (0 until p).map(i => risk.map(r => r._3(i) * wOf(r)).sum)
        val s2 = Array.tabulate(p, p)((i, j) =>
          risk.map(r => r._3(i) * r._3(j) * wOf(r)).sum)
        val e0 = evs.map(wOf).sum
        val e1 = (0 until p).map(i => evs.map(r => r._3(i) * wOf(r)).sum)
        val e2 = Array.tabulate(p, p)((i, j) =>
          evs.map(r => r._3(i) * r._3(j) * wOf(r)).sum)
        ll += evs.map(r => (0 until p).map(i => r._3(i) * beta(i)).sum).sum
        for (i <- 0 until p) u(i) += evs.map(_._3(i)).sum
        for (l <- 0 until d) {
          val f = l.toDouble / d
          val s0l = s0 - f * e0
          ll -= math.log(s0l)
          for (i <- 0 until p) {
            val s1l = s1(i) - f * e1(i)
            u(i) -= s1l / s0l
            for (j <- 0 until p) {
              val s1lj = s1(j) - f * e1(j)
              h(i)(j) += (s2(i)(j) - f * e2(i)(j)) / s0l -
                (s1l / s0l) * (s1lj / s0l)
            }
          }
        }
      }
      // tiny-p Gaussian elimination, as in localCox
      val m = h.map(_.clone); val b = u.clone
      for (c <- 0 until p) {
        val piv = m(c)(c)
        for (r <- c + 1 until p) {
          val f = m(r)(c) / piv
          for (cc <- c until p) m(r)(cc) -= f * m(c)(cc)
          b(r) -= f * b(c)
        }
      }
      val delta = Array.fill(p)(0.0)
      for (r <- (p - 1) to 0 by -1) {
        var s = b(r)
        for (cc <- r + 1 until p) s -= m(r)(cc) * delta(cc)
        delta(r) = s / m(r)(r)
      }
      beta = beta.zip(delta).map { case (x, dd) => x + dd }
    }
    (beta, ll)
  }

  // heavy ties: three events at t=2, two at t=5 — Breslow and Efron
  // genuinely disagree here
  private val tied = Seq(
    (1.0, 1, 1.0, 0.2), (2.0, 1, 1.0, 0.7), (2.0, 1, 0.0, 1.1),
    (2.0, 1, 1.0, 0.4), (3.0, 0, 0.0, 0.9), (5.0, 1, 0.0, 0.3),
    (5.0, 1, 1.0, 1.3), (6.0, 1, 0.0, 0.6), (7.0, 0, 1.0, 0.1),
    (8.0, 1, 0.0, 1.0))

  test("efron ties match an independent local Efron Newton solver") {
    val df = tied.toDF("t", "e", "x1", "x2")
    val m = Cox.fit(df, "t", "e", Seq("x1", "x2"), ties = "efron")
    val (ref, refLl) = localCoxEfron(tied.map { case (t, e, a, b) =>
      (t, e, Array(a, b)) }, p = 2)
    assert(math.abs(m.beta(0) - ref(0)) < 1e-6, s"${m.beta(0)} vs ${ref(0)}")
    assert(math.abs(m.beta(1) - ref(1)) < 1e-6, s"${m.beta(1)} vs ${ref(1)}")
    assert(math.abs(m.loglik - refLl) < 1e-6, s"${m.loglik} vs $refLl")
    assert(m.se.forall(s => s > 0 && s.isFinite))
  }

  test("efron and breslow disagree on tied data, agree when untied") {
    val df = tied.toDF("t", "e", "x1", "x2")
    val eb = Cox.fit(df, "t", "e", Seq("x1", "x2")) // efron IS the default
    val bb = Cox.fit(df, "t", "e", Seq("x1", "x2"), ties = "breslow")
    assert(math.abs(eb.beta(0) - bb.beta(0)) > 1e-4,
      "ties present: conventions must differ")
    // untied fixture: identical fits to high precision
    val untied = data.toDF("t", "e", "x1", "x2")
      .filter(col("x2") =!= 0.9) // drops one of the two t=5 rows
    val e2 = Cox.fit(untied, "t", "e", Seq("x1", "x2"), ties = "efron")
    val b2 = Cox.fit(untied, "t", "e", Seq("x1", "x2"))
    assert(math.abs(e2.beta(0) - b2.beta(0)) < 1e-9)
    assert(math.abs(e2.beta(1) - b2.beta(1)) < 1e-9)
    assert(math.abs(e2.loglik - b2.loglik) < 1e-9)
    assert(math.abs(e2.nullLoglik - b2.nullLoglik) < 1e-9)
  }

  test("stratified efron matches stratified local reference") {
    // one stratum reduces to the global fit; check strat machinery + ties
    val df = tied.toDF("t", "e", "x1", "x2").withColumn("g", lit("s"))
    val a = Cox.fit(df, "t", "e", Seq("x1", "x2"), ties = "efron")
    val b = Cox.fit(df, "t", "e", Seq("x1", "x2"), strataCol = Some("g"),
      ties = "efron")
    assert(math.abs(a.beta(0) - b.beta(0)) < 1e-10)
    assert(math.abs(a.beta(1) - b.beta(1)) < 1e-10)
    assert(math.abs(a.loglik - b.loglik) < 1e-10)
  }
}
