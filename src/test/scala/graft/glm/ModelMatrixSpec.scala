package graft.glm

import graft.SparkSpec
import org.apache.spark.sql.types.DoubleType

/** Ported reference assertions (reference: modelMatrix$Test.scala:10-49,
  * utils$Test.scala:10-24) plus ordering guarantees.
  */
class ModelMatrixSpec extends SparkSpec {
  import spark.implicits._

  private lazy val mixed = Seq(
    (1, "b", 2.5), (2, "a", 3.5), (3, "c", 4.5)
  ).toDF("intField", "strField", "numField")

  test("mixed-type encoding: k-1 lexicographic dummies, all double") {
    val out = ModelMatrix.encode(mixed)
    assert(out.columns.toSeq == Seq("intField", "strField_b", "strField_c", "numField"))
    assert(out.schema.fields.forall(_.dataType == DoubleType))
    val rows = out.orderBy("intField").collect()
    // row 1: strField=b -> (1,0); row 2: a (baseline) -> (0,0); row 3: c -> (0,1)
    assert(rows(0).getDouble(1) == 1.0 && rows(0).getDouble(2) == 0.0)
    assert(rows(1).getDouble(1) == 0.0 && rows(1).getDouble(2) == 0.0)
    assert(rows(2).getDouble(1) == 0.0 && rows(2).getDouble(2) == 1.0)
  }

  test("numeric-only passthrough casts to double") {
    val out = ModelMatrix.encode(Seq((1, 2L, 3.0f)).toDF("a", "b", "c"))
    assert(out.columns.toSeq == Seq("a", "b", "c"))
    assert(out.schema.fields.forall(_.dataType == DoubleType))
  }

  test("string-only encoding") {
    val out = ModelMatrix.encode(Seq(("x", "q"), ("y", "r")).toDF("s1", "s2"))
    assert(out.columns.toSeq == Seq("s1_y", "s2_r"))
  }

  test("matchCols adds missing columns as 0.0 and reorders") {
    val score = Seq((2.0, 9.0)).toDF("b", "z")
    val out = ModelMatrix.matchCols(Seq("a", "b"), score)
    assert(out.columns.toSeq == Seq("a", "b", "z"))
    val r = out.head()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 2.0)
  }

  test("levels is one job and lexicographically sorted") {
    val lv = ModelMatrix.levels(mixed, Seq("strField"))
    assert(lv("strField").toSeq == Seq("a", "b", "c"))
  }

  test("naDrop removes rows with any null") {
    val df = Seq((Some(1.0), "a"), (None, "b")).toDF("x", "s")
    assert(ModelMatrix.naDrop(df).count() == 1)
  }

  test("levels fails fast BY NAME on an id-like high-cardinality column") {
    val ids = (1 to ModelMatrix.maxLevels + 1).map(i => (i, s"id_$i")).toDF("n", "uid")
    val e = intercept[IllegalArgumentException] {
      ModelMatrix.levels(ids, Seq("uid"))
    }
    assert(e.getMessage.contains("uid") && e.getMessage.contains("distinct"))
  }
}
