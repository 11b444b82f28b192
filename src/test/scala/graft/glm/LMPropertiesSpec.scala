package graft.glm

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-based invariants of the least-squares kernel (SURVEY.md §5:
  * residual orthogonality and partition invariance are the algebraic
  * contracts the reference's single/multi split was supposed to provide).
  * Uses ScalaCheck generators directly with fixed seeds (the
  * scalatest-scalacheck bridge artifact is not on the offline classpath).
  */
class LMPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val dataGen = for {
    n <- Gen.choose(30, 120)
    seed <- Gen.choose(0L, 10000L)
  } yield {
    val rng = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val x1 = rng.nextDouble() * 10 - 5
      val x2 = rng.nextDouble() * 3
      val y = 2.0 + 1.5 * x1 - 0.7 * x2 + rng.nextGaussian()
      (x1, x2, y)
    }
  }

  private def samples[T](g: Gen[T], k: Int): Seq[T] =
    (0 until k).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("property: residuals are orthogonal to every regressor column") {
    samples(dataGen, 8).foreach { rows =>
      val df = rows.toDF("x1", "x2", "y")
      val m = LM.fit(df, Seq("x1", "x2"), "y")
      val res = m.predict(df).withColumn("r", col("y") - col("prediction"))
      val dots = res.agg(
        sum(col("r")).as("d0"),
        sum(col("r") * col("x1")).as("d1"),
        sum(col("r") * col("x2")).as("d2")).head()
      (0 until 3).foreach { i =>
        assert(math.abs(dots.getDouble(i)) < 1e-6, s"residual not ⟂ column $i")
      }
    }
  }

  test("property: fit is invariant to the number of partitions") {
    samples(dataGen.flatMap(r => Gen.choose(2, 7).map((r, _))), 8)
      .foreach { case (rows, parts) =>
        val df = rows.toDF("x1", "x2", "y")
        val a = LM.fit(df.coalesce(1), Seq("x1", "x2"), "y")
        val b = LM.fit(df.repartition(parts), Seq("x1", "x2"), "y")
        (0 until 3).foreach { i =>
          assert(math.abs(a.coefs(i) - b.coefs(i)) < 1e-9)
        }
      }
  }

  test("property: scaling a feature by c scales its coefficient by 1/c") {
    samples(dataGen.flatMap(r => Gen.choose(2.0, 50.0).map((r, _))), 8)
      .foreach { case (rows, c) =>
        val df = rows.toDF("x1", "x2", "y")
        val a = LM.fit(df, Seq("x1", "x2"), "y")
        val b = LM.fit(df.withColumn("x1", col("x1") * c), Seq("x1", "x2"), "y")
        assert(math.abs(a.coefs(1) - b.coefs(1) * c) < 1e-6 * math.max(1, math.abs(a.coefs(1))))
        assert(math.abs(a.coefs(2) - b.coefs(2)) < 1e-6)
      }
  }
}
