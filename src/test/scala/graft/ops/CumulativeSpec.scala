package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class CumulativeSpec extends SparkSpec {
  import spark.implicits._

  private def collectPlans(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => collectPlans(a.executedPlan)
    case other =>
      other +: (other.children ++ other.subqueries).flatMap(collectPlans)
  }

  test("two-level running sum equals the single-window reference") {
    val df = (1 to 997).map(i => (i * 7 % 1000, (i % 13).toLong, i * 0.5))
      .toDF("v", "c", "x")
      .groupBy("v").agg(sum("c").as("c"), sum("x").as("x"))
    val got = Cumulative.runningSums(df, "v", Seq("c", "x"), numPartitions = 7)
      .select("v", "c_cum", "x_cum")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df.select(col("v"), sum("c").over(w).as("cc"),
        sum("x").over(w).as("xc"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    assert(got.keySet === ref.keySet)
    ref.foreach { case (v, (cc, xc)) =>
      assert(got(v)._1 === cc, s"v=$v count cumsum")
      assert(math.abs(got(v)._2 - xc) < 1e-9, s"v=$v double cumsum")
    }
  }

  test("degenerate shapes: empty frame, one row, fewer rows than buckets") {
    val empty = Seq.empty[(Int, Long)].toDF("v", "c")
    assert(Cumulative.runningSums(empty, "v", Seq("c"), 4).count() === 0L)
    val one = Seq((5, 3L)).toDF("v", "c")
    val r1 = Cumulative.runningSums(one, "v", Seq("c"), 4)
      .select("c_cum").head().getLong(0)
    assert(r1 === 3L)
    val few = Seq((1, 1L), (2, 1L), (3, 1L)).toDF("v", "c")
    val r3 = Cumulative.runningSums(few, "v", Seq("c"), 8)
      .orderBy("v").select("c_cum").collect().map(_.getLong(0))
    assert(r3.toSeq === Seq(1L, 2L, 3L))
  }

  test("no single-task window touches the data frame (only bucket offsets)") {
    // every unpartitioned WindowExec in the plan must be the bucket-offset
    // pass (ordered by __b over one row per bucket), never the data pass
    val df = (1 to 500).map(i => (i, 1L)).toDF("v", "c")
    val plan = Cumulative.runningSums(df, "v", Seq("c"), 16)
      .queryExecution.executedPlan
    val unpartitioned = collectPlans(plan).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.nonEmpty, "expected the bucket-offset window")
    unpartitioned.foreach { w =>
      val orderCols = w.orderSpec.map(_.child.toString).mkString(",")
      assert(orderCols.contains("__b"),
        s"unpartitioned window over data detected: ordered by $orderCols")
    }
  }

  test("auc / ksTest / spearman plans carry no unpartitioned data window") {
    val scored = (1 to 300)
      .map(i => (i * 0.003 + (i % 7) * 0.01, if (i % 3 == 0) 1 else 0))
      .toDF("score", "label")
    val plans = Seq(
      graft.glm.Eval.auc(scored, "score", "label"),
      Hypothesis.ksTest(
        scored.withColumn("g", when(col("label") === 1, "a").otherwise("b")),
        "score", "g", "a", "b"),
      Hypothesis.spearman(scored, "score", "label"))
    plans.foreach { q =>
      val unpart = collectPlans(q.queryExecution.executedPlan).collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      unpart.foreach { w =>
        val orderCols = w.orderSpec.map(_.child.toString).mkString(",")
        assert(orderCols.contains("__b"),
          s"unpartitioned data window in plan: ordered by $orderCols")
      }
    }
  }

  test("two-level running min equals the single-window reference, both directions") {
    val df = (1 to 499).map(i => (i * 11 % 503, (i % 17) * 0.25 - 1.0))
      .toDF("v", "x")
      .groupBy("v").agg(min("x").as("x"))
    for (desc <- Seq(false, true)) {
      val got = Cumulative.runningMins(df, "v", Seq("x"), descending = desc,
          numPartitions = 7)
        .collect().map(r => r.getAs[Int]("v") -> r.getAs[Double]("x_cummin")).toMap
      val w = Window.orderBy(if (desc) col("v").desc else col("v").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ref = df.select(col("v"), min("x").over(w).as("xm"))
        .collect().map(r => r.getAs[Int]("v") -> r.getAs[Double]("xm")).toMap
      assert(got.keySet === ref.keySet)
      // min is fully associative/commutative, so parity is exact
      ref.foreach { case (v, m) => assert(got(v) === m, s"v=$v desc=$desc") }
    }
  }

  test("runningMins degenerate shapes") {
    val one = Seq((5, 3.0)).toDF("v", "x")
    assert(Cumulative.runningMins(one, "v", Seq("x"), numPartitions = 4)
      .select("x_cummin").head().getDouble(0) === 3.0)
    val few = Seq((1, 3.0), (2, 1.0), (3, 2.0)).toDF("v", "x")
    val asc = Cumulative.runningMins(few, "v", Seq("x"), numPartitions = 8)
      .orderBy("v").select("x_cummin").collect().map(_.getDouble(0))
    assert(asc.toSeq === Seq(3.0, 1.0, 1.0))
    val desc = Cumulative.runningMins(few, "v", Seq("x"), descending = true,
        numPartitions = 8)
      .orderBy("v").select("x_cummin").collect().map(_.getDouble(0))
    assert(desc.toSeq === Seq(1.0, 1.0, 2.0))
  }
}
