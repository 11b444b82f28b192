package graft.glm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultinomialSpec extends SparkSpec {
  import spark.implicits._

  // saturated design: one binary feature, three classes with known cell
  // proportions -> each OvR binomial fit recovers the cell proportions
  // exactly, and the normalized scores are those proportions rescaled
  private def cells = Seq(
    // (x, class, copies): x=0 cell is A-heavy, x=1 cell is C-heavy
    (0.0, "A", 6), (0.0, "B", 3), (0.0, "C", 1),
    (1.0, "A", 1), (1.0, "B", 4), (1.0, "C", 5)
  ).flatMap { case (x, c, n) => Seq.fill(n)((x, c)) }.toDF("x", "cls")

  test("fitOneVsRest recovers saturated cell proportions, normalized") {
    val m = Multinomial.fitOneVsRest(cells, Seq("x"), "cls")
    assert(m.classes === Seq("A", "B", "C"))
    val scored = m.predict(cells).select("x", "p_A", "p_B", "p_C", "predicted")
      .distinct().collect().map(r => r.getDouble(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getString(4))).toMap
    // x=0: raw probs 0.6/0.3/0.1 already sum to 1
    val (a0, b0, c0, p0) = scored(0.0)
    assert(math.abs(a0 - 0.6) < 1e-6 && math.abs(b0 - 0.3) < 1e-6 &&
      math.abs(c0 - 0.1) < 1e-6)
    assert(p0 === "A")
    val (a1, b1, c1, p1) = scored(1.0)
    assert(math.abs(a1 - 0.1) < 1e-6 && math.abs(b1 - 0.4) < 1e-6 &&
      math.abs(c1 - 0.5) < 1e-6)
    assert(p1 === "C")
  }

  test("predict: probabilities sum to 1 and ties break to the first class") {
    val m = Multinomial.fitOneVsRest(cells, Seq("x"), "cls")
    val sums = m.predict(cells)
      .select((col("p_A") + col("p_B") + col("p_C")).as("s"))
      .collect().map(_.getDouble(0))
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-12))
    // two-class perfect tie: balanced cells -> p = 0.5 each -> 'A' wins
    val tie = Seq((0.0, "A"), (1.0, "A"), (0.0, "B"), (1.0, "B"))
      .toDF("x", "cls")
    val mt = Multinomial.fitOneVsRest(tie, Seq("x"), "cls")
    assert(mt.predict(tie).select("predicted").head().getString(0) === "A")
  }

  test("fitOneVsRest rejects single-class targets") {
    val one = Seq((0.0, "A"), (1.0, "A")).toDF("x", "cls")
    intercept[IllegalArgumentException] {
      Multinomial.fitOneVsRest(one, Seq("x"), "cls")
    }
  }
}
