package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy CART decision trees over binary labels (Gini impurity).
  *
  * The missing classic next to the GLM family: an axis-aligned split model
  * whose training statistic is a pure counting problem — which makes it both
  * exactly reproducible across engines (integer counts, one documented
  * double-division order) and cheaply distributable.
  *
  * Distribution (per depth level, ALL frontier nodes at once):
  *   1. assign each row its current node path — a literal nested-CASE
  *      projection built from the splits found so far (codegen'd, no join);
  *   2. fan every row out to its (node, feature, value) candidate triples —
  *      one `explode` of a features-array literal;
  *   3. ONE groupBy(node, feature, value) aggregation collapses the data to
  *      the candidate frame (bounded by Σ_f |distinct(f)| per node — pass
  *      `bins = Some(b)` to hard-bound it at b fixed-width bins per feature
  *      for continuous columns at scale);
  *   4. cumulative windows PARTITIONED BY (node, feature) over that
  *      collapsed frame give left/right class counts at every threshold;
  *   5. a per-node rank picks the best (score desc, feature asc, value asc)
  *      split; the ≤ 2^depth winners come back to the driver (the GLM-beta
  *      discipline: driver state is model-sized, never data-sized).
  *
  * So each level costs exactly one shuffle of the collapsed candidate frame,
  * and prediction is a pure nested-CASE column — no join, no UDF.
  *
  * Split goodness uses the sum-of-squares form of weighted Gini: maximizing
  *   score = (posL² + negL²)/nL + (posR² + negR²)/nR
  * is equivalent to minimizing Σ n_side · gini_side. Counts are exact
  * longs; the score divides documented-order doubles, so an ANSI engine
  * replaying the same arithmetic reproduces it bit-for-bit. A node splits
  * only on strict improvement over its own score (score > parentScore).
  *
  * Reference scope: alteryx/sparkGLM has no tree learner; this extends the
  * model family the same way Multinomial/Ordinal/Cox do — training as
  * aggregation, scoring as projection.
  */
object Tree {

  /** One fitted node. `feature`/`threshold` are set on internal nodes
    * (split predicate: `feature <= threshold` goes left); `pred` is the
    * node's majority class (ties to 0).
    */
  final case class TreeNode(path: String, depth: Int, n: Long, pos: Long,
      feature: Option[String], threshold: Option[Double]) {
    def pred: Int = if (2L * pos > n) 1 else 0
  }

  final case class TreeModel(nodes: Seq[TreeNode]) {
    private val byPath = nodes.map(nd => nd.path -> nd).toMap

    /** Node-path assignment expression at a given depth (internal). */
    private[ops] def pathExpr(depth: Int): Column = {
      def walk(path: String, d: Int): Column =
        byPath.get(path) match {
          case Some(nd) if d > 0 && nd.feature.isDefined =>
            when(col(nd.feature.get).cast("double") <= lit(nd.threshold.get),
              walk(path + "L", d - 1)).otherwise(walk(path + "R", d - 1))
          case _ => lit(path)
        }
      walk("", depth)
    }

    /** Majority-class prediction as a literal nested-CASE column. */
    def predictExpr: Column = {
      def walk(path: String): Column = {
        val nd = byPath(path)
        nd.feature match {
          case Some(f) if byPath.contains(path + "L") =>
            when(col(f).cast("double") <= lit(nd.threshold.get),
              walk(path + "L")).otherwise(walk(path + "R"))
          case _ => lit(nd.pred)
        }
      }
      walk("")
    }

    def predict(df: DataFrame, outputCol: String = "pred"): DataFrame =
      df.withColumn(outputCol, predictExpr)

    /** The node table: (path, depth, n, pos, feature, threshold, pred),
      * one row per node, root first — the gate/serialization surface.
      */
    def toDF(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      nodes.sortBy(_.path)
        .map(nd => (nd.path, nd.depth, nd.n, nd.pos,
          nd.feature.orNull, nd.threshold.map(Double.box).orNull, nd.pred))
        .toDF("path", "depth", "n", "pos", "feature", "threshold", "pred")
        .withColumn("threshold", col("threshold").cast("double"))
    }
  }

  /** Fit a depth-≤`maxDepth` CART tree on integer 0/1 `labelCol` over
    * numeric `features`.
    *
    * @param bins    None (default) = every observed distinct value is a
    *                candidate threshold (exact; right for low-cardinality
    *                features). Some(b) = fixed-width binning to ≤ b
    *                candidate upper-edge thresholds per feature — the
    *                bounded-candidate mode for continuous features at
    *                scale (keeps the per-(node, feature) window partition
    *                ≤ b rows regardless of data size).
    * @param minLeaf a split is admissible only if both children have at
    *                least this many rows
    */
  def fit(df: DataFrame, features: Seq[String], labelCol: String,
      maxDepth: Int = 2, minLeaf: Long = 1L,
      bins: Option[Int] = None): TreeModel = {
    require(features.nonEmpty, "need at least one feature")
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    require(minLeaf >= 1L, s"minLeaf must be >= 1, got $minLeaf")
    bins.foreach(b => require(b >= 2, s"bins must be >= 2, got $b"))
    val spark = df.sparkSession

    val y = col(labelCol).cast("long")
    // candidate-value expression per feature: raw value, or the upper edge
    // of its fixed-width bin (edges = min + k·width, k = 1..b; a value maps
    // to the smallest edge ≥ it under the same floor both engines compute)
    val valueOf: Map[String, Column] = bins match {
      case None => features.map(f => f -> col(f).cast("double")).toMap
      case Some(b) =>
        val aggs = features.flatMap(f => Seq(
          min(col(f).cast("double")).as(s"__min_$f"),
          max(col(f).cast("double")).as(s"__max_$f")))
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        features.zipWithIndex.map { case (f, i) =>
          val lo = row.getDouble(2 * i); val hi = row.getDouble(2 * i + 1)
          val width = (hi - lo) / b
          val c =
            if (width == 0.0) col(f).cast("double")
            else lit(lo) + (least(floor((col(f).cast("double") - lit(lo))
              / lit(width)), lit(b - 1.0)) + lit(1.0)) * lit(width)
          f -> c
        }.toMap
    }
    val melted = explode(array(features.map(f =>
      struct(lit(f).as("feature"), valueOf(f).as("v"))): _*))

    var model = {
      val r0 = df.agg(count(lit(1)).as("n"), sum(y).as("pos")).head()
      TreeModel(Seq(TreeNode("", 0, r0.getLong(0), r0.getLong(1),
        None, None)))
    }

    for (depth <- 0 until maxDepth) {
      val frontier = model.nodes.filter(nd =>
        nd.depth == depth && nd.feature.isEmpty &&
          nd.n >= 2 * minLeaf && nd.pos > 0L && nd.pos < nd.n)
      if (frontier.nonEmpty) {
        val frontierPaths = frontier.map(_.path).toSet
        val cand = df
          .select(model.pathExpr(depth).as("node"), melted.as("fv"), y.as("y"))
          .where(col("node").isin(frontierPaths.toSeq: _*))
          .groupBy(col("node"), col("fv.feature").as("feature"),
            col("fv.v").as("v"))
          .agg(count(lit(1)).as("n"), sum("y").as("pos"))
        val wCum = Window.partitionBy("node", "feature").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy("node", "feature")
        val parentOf = frontier.map(nd => nd.path ->
          (nd.pos.toDouble * nd.pos + (nd.n - nd.pos).toDouble *
            (nd.n - nd.pos)) / nd.n).toMap
        val parentScore = frontierPaths.foldLeft(lit(Double.NaN)) {
          (acc, p) => when(col("node") === p, lit(parentOf(p))).otherwise(acc)
        }
        // sum-of-squares Gini score; doubles divided in this one order
        def sq(p: Column, q: Column, t: Column) = {
          val pd = p.cast("double"); val qd = q.cast("double")
          (pd * pd + qd * qd) / t.cast("double")
        }
        val scored = cand
          .withColumn("nl", sum("n").over(wCum))
          .withColumn("posl", sum("pos").over(wCum))
          .withColumn("nt", sum("n").over(wAll))
          .withColumn("post", sum("pos").over(wAll))
          .withColumn("nr", col("nt") - col("nl"))
          .withColumn("posr", col("post") - col("posl"))
          .where(col("nl") >= minLeaf && col("nr") >= minLeaf)
          .withColumn("score",
            sq(col("posl"), col("nl") - col("posl"), col("nl")) +
              sq(col("posr"), col("nr") - col("posr"), col("nr")))
          .where(col("score") > parentScore)
        val wRank = Window.partitionBy("node")
          .orderBy(col("score").desc, col("feature"), col("v"))
        val best = scored
          .withColumn("rk", row_number().over(wRank))
          .where(col("rk") === 1)
          .select("node", "feature", "v", "nl", "posl", "nr", "posr")
          .collect() // ≤ 2^depth rows: model-sized by construction
        if (best.nonEmpty) {
          val updated = model.nodes.map { nd =>
            best.find(_.getString(0) == nd.path) match {
              case Some(row) => nd.copy(
                feature = Some(row.getString(1)),
                threshold = Some(row.getDouble(2)))
              case None => nd
            }
          }
          val children = best.flatMap { row =>
            val p = row.getString(0)
            Seq(
              TreeNode(p + "L", depth + 1, row.getLong(3), row.getLong(4),
                None, None),
              TreeNode(p + "R", depth + 1, row.getLong(5), row.getLong(6),
                None, None))
          }
          model = TreeModel(updated ++ children)
        }
      }
    }
    model
  }
}
