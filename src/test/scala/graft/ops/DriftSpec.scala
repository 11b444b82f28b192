package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical distributions give PSI = 0; a known shift matches the literal formula") {
    val ref = (1 to 400).map(i => i % 100 * 1.0).toDF("x")
    val same = Drift.psi(ref, ref, "x", cuts = Seq(25.0, 50.0, 75.0)).head()
    assert(math.abs(same.getDouble(0)) < 1e-12)
    assert(same.getLong(1) === 4L)

    // shifted copy: literal PSI over the known bin proportions
    val cur = (1 to 400).map(i => (i % 100) * 1.0 + 20.0).toDF("x")
    val got = Drift.psi(ref, cur, "x", cuts = Seq(25.0, 50.0, 75.0))
      .head().getDouble(0)
    def props(vals: Seq[Double]): Seq[Double] = {
      val bins = vals.map(v =>
        if (v <= 25.0) 0 else if (v <= 50.0) 1 else if (v <= 75.0) 2 else 3)
      (0 to 3).map(b => bins.count(_ == b).toDouble / vals.size)
    }
    val (pa, pb) = (props((1 to 400).map(_ % 100 * 1.0)),
      props((1 to 400).map(i => (i % 100) * 1.0 + 20.0)))
    val ref2 = pa.zip(pb).map { case (a0, b0) =>
      val a = math.max(a0, 1e-6); val b = math.max(b0, 1e-6)
      (a - b) * math.log(a / b)
    }.sum
    assert(math.abs(got - ref2) < 1e-10, s"$got vs $ref2")
    assert(got > 0.1) // a 20-point shift over 4 bins is a real drift signal
  }

  test("categorical PSI: nulls are a bin, absent categories are eps-floored") {
    val ref = Seq("a", "a", "a", "b", null).toDF("c")
    val cur = Seq("a", "b", "b", "b", "z").toDF("c")
    val row = Drift.categoricalPsi(ref, cur, "c").head()
    assert(row.getLong(1) === 4L) // a, b, __null__, z
    // literal: p_ref = (a .6, b .2, null .2, z eps), p_cur = (a .2, b .6, null eps, z .2)
    val pairs = Seq((0.6, 0.2), (0.2, 0.6), (0.2, 1e-6), (1e-6, 0.2))
    val ref2 = pairs.map { case (a, b) => (a - b) * math.log(a / b) }.sum
    assert(math.abs(row.getDouble(0) - ref2) < 1e-10, s"${row.getDouble(0)} vs $ref2")
  }

  test("psiAuto derives reference-decile cuts and flags a scale shift") {
    val rng = new scala.util.Random(61)
    val ref = (1 to 2000).map(_ => rng.nextGaussian()).toDF("x")
    val cur = (1 to 2000).map(_ => rng.nextGaussian() * 2.0).toDF("x")
    val same = Drift.psiAuto(ref, ref, "x", bins = 10).head().getDouble(0)
    assert(math.abs(same) < 1e-12) // identical sides: exact 0 whatever the cuts
    val shifted = Drift.psiAuto(ref, cur, "x", bins = 10).head().getDouble(0)
    assert(shifted > 0.05, s"variance doubling should register: $shifted")
  }

  test("jsd: 0 on identical mixes, ln 2 on disjoint supports, literal middle") {
    import spark.implicits._
    val a = Seq("x", "x", "y", "y").toDF("c")
    assert(math.abs(Drift.jsd(a, a, "c").head().getDouble(0)) < 1e-12)
    val b = Seq("z", "z", "w").toDF("c")
    assert(math.abs(Drift.jsd(a, b, "c").head().getDouble(0)
      - math.log(2)) < 1e-12)
    // P = (3/4, 1/4), Q = (1/4, 3/4) → JSD = ½ΣpLn(p/m)+½ΣqLn(q/m), m=(½,½)
    val p = Seq("x", "x", "x", "y").toDF("c")
    val q = Seq("x", "y", "y", "y").toDF("c")
    val expect = 0.75 * math.log(1.5) + 0.25 * math.log(0.5)
    assert(math.abs(Drift.jsd(p, q, "c").head().getDouble(0) - expect) < 1e-12)
    // bounded and symmetric
    assert(Drift.jsd(p, q, "c").head().getDouble(0) ===
      Drift.jsd(q, p, "c").head().getDouble(0))
  }

  test("wasserstein1: closed shift and identity cases") {
    val ref = Seq(0L, 0L).toDF("v")
    val cur = Seq(2L, 2L).toDF("v")
    val row = Drift.wasserstein1(ref, cur, "v").head()
    assert(row.getLong(0) === 2L && row.getLong(1) === 2L)
    assert(row.getDouble(2) === 2.0, "all mass moved distance 2")
    // identical distributions → 0
    assert(Drift.wasserstein1(ref, ref, "v").head().getDouble(2) === 0.0)
    // W1 of a pure +c shift is c regardless of shape
    val shape = Seq(1L, 5L, 5L, 9L).toDF("v")
    val shifted = shape.select((col("v") + 3L).as("v"))
    assert(Drift.wasserstein1(shape, shifted, "v").head()
      .getDouble(2) === 3.0)
  }

  test("wasserstein1: unequal sizes weight by CDF, floats rejected") {
    // ref {0}, cur {0, 4}: |F_r − F_c| = 1/2 on [0, 4) → W1 = 2
    val row = Drift.wasserstein1(Seq(0L).toDF("v"),
      Seq(0L, 4L).toDF("v"), "v").head()
    assert(row.getDouble(2) === 2.0)
    val e = intercept[Exception] {
      Drift.wasserstein1(Seq(0.5).toDF("v"), Seq(1.0).toDF("v"), "v")
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("wasserstein1 is partition-invariant on real event values") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("cents", round(col("value") * 100).cast("long"))
    val half = ev.filter(col("event_id") % 2 === 0)
    val other = ev.filter(col("event_id") % 2 === 1)
    val run = (p: Int) => Drift.wasserstein1(half.repartition(p),
      other.repartition(p), "cents").collect().toSeq
    assert(run(1) === run(7))
  }
}
