package graft.ops

import graft.SparkSpec

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  /** Independent driver-local MM reference (Hunter 2004), written
    * directly from the update formula, sharing no code with the op.
    */
  private def localBT(games: Seq[(String, String)],
      iters: Int): Map[String, Double] = {
    def key(x: String, y: String) = if (x < y) (x, y) else (y, x)
    val items = games.flatMap(g => Seq(g._1, g._2)).distinct.sorted
    val wins = games.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val nij = games.groupBy(g => key(g._1, g._2))
      .view.mapValues(_.size.toDouble).toMap
    var pi = items.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      pi = items.map { i =>
        val d = items.filter(_ != i).map { j =>
          nij.getOrElse(key(i, j), 0.0) / (pi(i) + pi(j))
        }.sum
        i -> (if (d > 0) wins.getOrElse(i, 0.0) / d else 0.0)
      }.toMap
    }
    val t = pi.values.sum
    pi.view.mapValues(v => BigDecimal(v / t).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
  }

  // a > b > c with some upsets; d never wins
  private def games = Seq(
    ("a", "b"), ("a", "b"), ("a", "c"), ("a", "c"), ("b", "a"),
    ("b", "c"), ("b", "c"), ("c", "b"), ("a", "d"), ("b", "d"),
    ("c", "d"))

  test("bradleyTerry matches the independent local MM reference") {
    val df = games.toDF("winner", "loser")
    val got = Preference.bradleyTerry(df, "winner", "loser", iters = 10)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("score")).toMap
    val ref = localBT(games, iters = 10)
    ref.foreach { case (i, s) =>
      assert(math.abs(got(i) - s) < 1e-9, s"$i: ${got(i)} vs $s")
    }
  }

  test("strength order follows the planted dominance; never-winner scores 0") {
    val df = games.toDF("winner", "loser")
    val got = Preference.bradleyTerry(df, "winner", "loser", iters = 20)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("wins"), r.getAs[Long]("n_games"),
          r.getAs[Double]("score"))).toMap
    assert(got("a")._3 > got("b")._3 && got("b")._3 > got("c")._3)
    assert(got("d")._3 === 0.0)
    assert(got("a")._1 === 5L) // wins
    assert(got("d")._2 === 3L) // games
  }

  test("bradleyTerry is partition-invariant and rejects bad iters") {
    val df = games.toDF("winner", "loser")
    val a = Preference.bradleyTerry(df, "winner", "loser", 5)
      .orderBy("item").collect().toSeq
    val b = Preference.bradleyTerry(df.repartition(7), "winner", "loser", 5)
      .orderBy("item").collect().toSeq
    assert(a === b)
    intercept[IllegalArgumentException] {
      Preference.bradleyTerry(df, "winner", "loser", 0)
    }
  }
}
