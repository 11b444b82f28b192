package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

class ArrayDotSpec extends SparkSpec {
  import spark.implicits._

  private def registered() = { GraftExtensions.ensureRegistered(spark); spark }

  test("array_dot resolves in SQL text and computes the dot product") {
    registered()
    val r = spark.sql("SELECT array_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(r === 32.0)
  }

  test("native expression is bit-identical to the HOF fold on real embeddings") {
    registered()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(100)
    val both = emb.as("a").crossJoin(emb.as("b")).limit(500)
      .select(
        Similarity.dot($"a.embedding", $"b.embedding").as("hof"),
        call_function("array_dot",
          $"a.embedding".cast("array<double>"),
          $"b.embedding".cast("array<double>")).as("native"))
    assert(both.filter($"hof" =!= $"native").count() === 0)
  }

  test("null inputs produce null, mismatched lengths use the shorter") {
    registered()
    val r = spark.sql(
      "SELECT array_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d").head()
    assert(r.isNullAt(0))
    val s = spark.sql(
      "SELECT array_dot(array(1.0d, 2.0d), array(3.0d)) AS d").head().getDouble(0)
    assert(s === 3.0)
  }

  test("array_dot participates in whole-stage codegen (no UDF in the plan)") {
    registered()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val df = emb.select(call_function("array_dot",
      $"embedding".cast("array<double>"), $"embedding".cast("array<double>")).as("n2"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan.take(500))
    assert(plan.contains("*(") , "expected a WholeStageCodegen stage:\n" + plan.take(500))
  }

  test("registration is idempotent") {
    registered(); registered()
    assert(spark.catalog.functionExists("array_dot"))
  }
}
