package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EncodeSpec extends SparkSpec {
  import spark.implicits._

  private def toy = Seq(
    (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0), (4L, "a", 40.0),
    (5L, "b", 1.0), (6L, "b", 2.0), (7L, "b", 3.0),
    (8L, "c", 100.0)
  ).toDF("id", "cat", "y")

  test("encoding equals the literal out-of-fold mean for every row") {
    val out = Encode.targetEncode(toy, "cat", "y", "id", k = 3).collect()
    val rows = toy.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val folds = out.map(r => r.getAs[Long]("id") -> r.getAs[Int]("fold")).toMap
    out.foreach { r =>
      val (id, cat, fold) = (r.getAs[Long]("id"), r.getAs[String]("cat"),
        r.getAs[Int]("fold"))
      val others = rows.filter(t => t._2 == cat && folds(t._1) != fold)
      val expect =
        if (others.nonEmpty) others.map(_._3).sum / others.size
        else { // fallback: global out-of-fold mean
          val g = rows.filter(t => folds(t._1) != fold)
          g.map(_._3).sum / g.size
        }
      assert(math.abs(r.getAs[Double]("te") - expect) < 1e-12,
        s"id=$id cat=$cat fold=$fold")
    }
  }

  test("no self-leakage: a category with one extreme row is not encoded by it") {
    // 'c' has a single row (y=100): its own encoding must NOT contain 100
    val out = Encode.targetEncode(toy, "cat", "y", "id", k = 3)
      .filter($"cat" === "c").collect()
    assert(out.length == 1)
    val te = out.head.getAs[Double]("te")
    assert(te < 100.0) // fell back to the out-of-fold global mean
  }

  test("smoothing shrinks toward the out-of-fold global prior") {
    val raw = Encode.targetEncode(toy, "cat", "y", "id", k = 3, smoothing = 0.0)
      .filter($"cat" === "a").select("id", "te", "fold").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sm = Encode.targetEncode(toy, "cat", "y", "id", k = 3, smoothing = 1000.0)
      .filter($"cat" === "a").select("id", "te", "fold").collect()
    // with huge smoothing, encodings approach the out-of-fold global mean:
    // spread across rows collapses relative to the raw encodings
    val rawSpread = raw.values.max - raw.values.min
    val smVals = sm.map(_.getDouble(1))
    val smSpread = smVals.max - smVals.min
    assert(smSpread < rawSpread / 2 || rawSpread == 0.0)
  }

  test("fold assignment is deterministic and partition-invariant") {
    val a = Encode.targetEncode(toy, "cat", "y", "id", k = 5)
      .select("id", "fold", "te").collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
    val b = Encode.targetEncode(toy.repartition(7), "cat", "y", "id", k = 5)
      .select("id", "fold", "te").collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("row count and schema pass through") {
    val out = Encode.targetEncode(toy, "cat", "y", "id", k = 2)
    assert(out.count() == toy.count())
    assert(out.columns.toSet == Set("id", "cat", "y", "fold", "te"))
  }

  test("null categories are kept (null-safe join), encoded as their own level") {
    val withNull = toy.union(Seq((9L, null: String, 7.0), (10L, null: String, 9.0))
      .toDF("id", "cat", "y"))
    val out = Encode.targetEncode(withNull, "cat", "y", "id", k = 2)
    assert(out.count() == withNull.count()) // no silent drop (r7 advice)
    val nulls = out.filter($"cat".isNull).collect()
    assert(nulls.length == 2)
    nulls.foreach(r => assert(!r.getAs[Double]("te").isNaN))
  }

  test("injected column names must not shadow caller data") {
    intercept[IllegalArgumentException] {
      Encode.targetEncode(toy.withColumn("fold", lit(1)), "cat", "y", "id")
    }
    intercept[IllegalArgumentException] {
      Encode.targetEncode(toy.withColumn("te", lit(1.0)), "cat", "y", "id")
    }
  }

  test("woe matches the hand-computed adjusted shares") {
    // cat a: 3 rows 2 pos; cat b: 2 rows 0 pos -> pos=2, neg=3
    val df = Seq(("a", 1), ("a", 1), ("a", 0), ("b", 0), ("b", 0))
      .toDF("cat", "y")
    val got = Encode.woe(df, "cat", "y").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    def rd6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (posA, negA) = ((2 + 0.5) / 2, (1 + 0.5) / 3)
    assert(got("a")._1 === 3L && got("a")._2 === 2L)
    assert(got("a")._3 === rd6(math.log(posA / negA)))
    assert(got("a")._4 === rd6((posA - negA) * math.log(posA / negA)))
    val (posB, negB) = ((0 + 0.5) / 2, (2 + 0.5) / 3)
    assert(got("b")._3 === rd6(math.log(posB / negB)))
  }

  test("woe: a one-class target yields null woe (no evidence scale)") {
    val df = Seq(("a", 1), ("b", 1)).toDF("cat", "y")
    val rows = Encode.woe(df, "cat", "y").collect()
    assert(rows.forall(_.isNullAt(3)))
    assert(rows.forall(_.isNullAt(4)))
  }

  test("woe: null categories form their own voting row") {
    val df = Seq((Some("a"), 1), (None, 1), (None, 0)).toDF("cat", "y")
    val got = Encode.woe(df, "cat", "y").collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(got(None) === 2L)
    assert(got(Some("a")) === 1L)
  }
}
