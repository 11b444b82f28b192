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

    /** Leaf POSITIVE-RATE prediction (pos/n of the landed leaf) as a
      * literal nested-CASE column — the probability-style score
      * ensembles average. One pinned double division per leaf.
      */
    def rateExpr: Column = {
      def walk(path: String): Column = {
        val nd = byPath(path)
        nd.feature match {
          case Some(f) if byPath.contains(path + "L") =>
            when(col(f).cast("double") <= lit(nd.threshold.get),
              walk(path + "L")).otherwise(walk(path + "R"))
          case _ => lit(nd.pos.toDouble / nd.n)
        }
      }
      walk("")
    }

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

  /** The (feature, candidate-value) melt expression shared by the tree
    * and boosting fitters: every row fans out to one struct per feature.
    * Candidate value = the raw value (exact mode), or the upper edge of
    * its fixed-width bin — edges lo + k·width with width = (hi − lo)/b
    * off one (min, max) pass, a value mapping to the smallest edge ≥ it
    * under the same floor both engines compute.
    */
  private def meltExpr(df: DataFrame, features: Seq[String],
      bins: Option[Int]): Column = {
    val valueOf: Map[String, Column] = bins match {
      case None => features.map(f => f -> col(f).cast("double")).toMap
      case Some(b) =>
        require(b >= 2, s"bins must be >= 2, got $b")
        val aggs = features.flatMap(f => Seq(
          min(col(f).cast("double")).as(s"__min_$f"),
          max(col(f).cast("double")).as(s"__max_$f")))
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        features.zipWithIndex.map { case (f, i) =>
          require(!row.isNullAt(2 * i) && !row.isNullAt(2 * i + 1),
            s"binned range for '$f' is null — empty input or all-null column")
          val lo = row.getDouble(2 * i); val hi = row.getDouble(2 * i + 1)
          val width = (hi - lo) / b
          val c =
            if (width == 0.0) col(f).cast("double")
            else lit(lo) + (least(floor((col(f).cast("double") - lit(lo))
              / lit(width)), lit(b - 1.0)) + lit(1.0)) * lit(width)
          f -> c
        }.toMap
    }
    explode(array(features.map(f =>
      struct(lit(f).as("feature"), valueOf(f).as("v"))): _*))
  }

  /** One boosted stump: split + the (micro-unit) leaf updates it adds. */
  final case class Stump(round: Int, feature: String, threshold: Double,
      nL: Long, nR: Long, deltaL: Long, deltaR: Long)

  /** Gradient-boosted stumps model. Predictions accumulate the per-round
    * leaf updates, which are kept in integer MICRO-units (1e-6 of the
    * label scale) — the DSIR trick: integer state sums exactly on any
    * partitioning and replays exactly on any engine.
    */
  final case class BoostedModel(stumps: Seq[Stump]) {
    /** Σ_m Δ_m(x) in micro-units — a literal CASE chain, codegen'd. */
    def predictMicroExpr: Column = predictMicroExprWith(col)

    /** Same, but feature references resolve through `resolve` — the hook
      * partial-dependence style interventions use (substitute one feature
      * with a grid literal, keep the rest from the row).
      */
    def predictMicroExprWith(resolve: String => Column): Column =
      if (stumps.isEmpty) lit(0L)
      else stumps.map(st =>
        when(resolve(st.feature).cast("double") <= lit(st.threshold),
          lit(st.deltaL)).otherwise(lit(st.deltaR))).reduce(_ + _)

    /** Prediction on the label scale. */
    def predictExpr: Column = predictMicroExpr.cast("double") / lit(1e6)

    def predict(df: DataFrame, outputCol: String = "pred"): DataFrame =
      df.withColumn(outputCol, predictExpr)

    def toDF(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      stumps.map(st => (st.round, st.feature, st.threshold, st.nL, st.nR,
          st.deltaL, st.deltaR))
        .toDF("round", "feature", "threshold", "n_l", "n_r",
          "delta_l", "delta_r")
    }
  }

  /** Gradient boosting with depth-1 regression stumps under squared loss
    * (Friedman 2001): each round fits a stump to the current residuals
    * and adds `learningRate` times its leaf means to the model.
    *
    * Determinism/scale design:
    *  - labels enter as exact integer micro-units (round(y·1e6)); every
    *    leaf update is floored to an integer micro-unit, so RESIDUALS
    *    STAY INTEGRAL — per-round candidate statistics are exact long
    *    sums, immune to partitioning and engine;
    *  - the split criterion is the SSE-reduction identity: maximize
    *    S_L²/n_L + S_R²/n_R (S = residual sum), strict improvement over
    *    the root's S²/n, ties (score desc, feature asc, value asc);
    *  - each round costs ONE (feature, value) collapse — the residual is
    *    a literal CASE chain over the stumps so far, no materialized
    *    state, no join;
    *  - stops early when no split strictly improves (residual constant).
    *
    * @param bins as in [[fit]]: cap candidate thresholds per feature
    */
  def fitBoostedStumps(df: DataFrame, features: Seq[String],
      labelCol: String, rounds: Int = 3, learningRate: Double = 0.5,
      minLeaf: Long = 1L, bins: Option[Int] = None): BoostedModel = {
    require(features.nonEmpty, "need at least one feature")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(learningRate > 0 && learningRate <= 1,
      s"learningRate must be in (0, 1], got $learningRate")
    val y6 = round(col(labelCol).cast("double") * 1e6).cast("long")
    val melted = meltExpr(df, features, bins)

    var stumps = Vector.empty[Stump]
    var stopped = false
    for (round <- 1 to rounds if !stopped) {
      val residual = y6 - BoostedModel(stumps).predictMicroExpr
      val wCum = Window.partitionBy("feature").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("feature")
      def sq(s: Column, n: Column) = {
        val sd = s.cast("double")
        sd * sd / n.cast("double")
      }
      val best = df
        .select(melted.as("fv"), residual.as("r"))
        .groupBy(col("fv.feature").as("feature"), col("fv.v").as("v"))
        .agg(count(lit(1)).as("n"), sum("r").as("s"))
        .withColumn("nl", sum("n").over(wCum))
        .withColumn("sl", sum("s").over(wCum))
        .withColumn("nt", sum("n").over(wAll))
        .withColumn("st", sum("s").over(wAll))
        .withColumn("nr", col("nt") - col("nl"))
        .withColumn("sr", col("st") - col("sl"))
        .where(col("nl") >= minLeaf && col("nr") >= minLeaf)
        .withColumn("score", sq(col("sl"), col("nl")) +
          sq(col("sr"), col("nr")))
        .where(col("score") > sq(col("st"), col("nt")))
        .orderBy(col("score").desc, col("feature"), col("v"))
        .limit(1)
        .select("feature", "v", "nl", "nr", "sl", "sr")
        .collect()
      best.headOption match {
        case None => stopped = true
        case Some(b) =>
          val (nl, nr) = (b.getLong(2), b.getLong(3))
          val (sl, sr) = (b.getLong(4), b.getLong(5))
          // leaf update = floor(lr · mean residual), in micro-units —
          // floor (not round) so both engines agree at exact halves
          val dl = math.floor(learningRate * (sl.toDouble / nl.toDouble)).toLong
          val dr = math.floor(learningRate * (sr.toDouble / nr.toDouble)).toLong
          stumps = stumps :+ Stump(round, b.getString(0), b.getDouble(1),
            nl, nr, dl, dr)
      }
    }
    BoostedModel(stumps)
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
  /** @param weightCol optional INTEGRAL row weights (exact-count
    *                   semantics: a weight-w row counts as w copies —
    *                   Poisson bag weights, dedup multiplicities,
    *                   pre-aggregated frequency tables). Zero-weight
    *                   rows are dropped before any statistic, including
    *                   the binned min/max pass. Integral so every count
    *                   stays an exact long sum on any partitioning.
    */
  def fit(df: DataFrame, features: Seq[String], labelCol: String,
      maxDepth: Int = 2, minLeaf: Long = 1L,
      bins: Option[Int] = None,
      weightCol: Option[String] = None): TreeModel = {
    require(features.nonEmpty, "need at least one feature")
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    require(minLeaf >= 1L, s"minLeaf must be >= 1, got $minLeaf")
    bins.foreach(b => require(b >= 2, s"bins must be >= 2, got $b"))
    weightCol.foreach { wc =>
      val integral = Set("byte", "short", "int", "bigint", "tinyint",
        "smallint", "integer", "long")
      require(integral(df.schema(wc).dataType.simpleString),
        s"weightCol '$wc' must be integral (exact-count semantics), got " +
          df.schema(wc).dataType.simpleString)
    }
    val spark = df.sparkSession

    val base = weightCol match {
      case Some(wc) => df.filter(col(wc) > 0L)
      case None => df
    }
    val wAs: Column = weightCol.map(col(_).cast("long")).getOrElse(lit(1L))
    val y = col(labelCol).cast("long")
    val melted = meltExpr(base, features, bins)

    var model = {
      val r0 = base.agg(sum(wAs).as("n"), sum(wAs * y).as("pos")).head()
      require(!r0.isNullAt(0),
        "tree fit: no rows (empty input or all weights zero)")
      TreeModel(Seq(TreeNode("", 0, r0.getLong(0), r0.getLong(1),
        None, None)))
    }

    for (depth <- 0 until maxDepth) {
      val frontier = model.nodes.filter(nd =>
        nd.depth == depth && nd.feature.isEmpty &&
          nd.n >= 2 * minLeaf && nd.pos > 0L && nd.pos < nd.n)
      if (frontier.nonEmpty) {
        val frontierPaths = frontier.map(_.path).toSet
        val cand = base
          .select(model.pathExpr(depth).as("node"), melted.as("fv"),
            y.as("y"), wAs.as("w"))
          .where(col("node").isin(frontierPaths.toSeq: _*))
          .groupBy(col("node"), col("fv.feature").as("feature"),
            col("fv.v").as("v"))
          .agg(sum("w").as("n"), sum(col("w") * col("y")).as("pos"))
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

  /** Bagged forest: per-tree leaf-rate scores averaged in tree order. */
  final case class ForestModel(trees: Seq[TreeModel]) {
    /** Mean leaf positive rate — tree scores summed in tree order (a
      * pinned left fold) then divided by the tree count: one documented
      * float association, engine-replayable.
      */
    def predictScoreExpr: Column =
      trees.map(_.rateExpr).reduceLeft(_ + _) / lit(trees.size.toDouble)

    def predict(df: DataFrame, outputCol: String = "score"): DataFrame =
      df.withColumn(outputCol, predictScoreExpr)

    /** All node tables stacked with a 1-based `tree` id. */
    def toDF(spark: org.apache.spark.sql.SparkSession): DataFrame =
      trees.zipWithIndex.map { case (t, i) =>
        t.toDF(spark).select(lit(i + 1).as("tree"), col("*"))
      }.reduceLeft(_ unionByName _)
  }

  /** Bagged CART forest (Breiman bagging with the distributed-bootstrap
    * Poisson(1) approximation): tree b trains on POISSON bag weights
    * drawn from md5(id#b) — the [[Hypothesis.bootstrapMeanCI]] ladder:
    * content-keyed, partition-invariant, engine-reproducible, and
    * INTEGER, so every bag statistic is an exact long sum (the
    * [[fit]] weighted mode). No per-tree feature subsampling — with the
    * deterministic-replay discipline the bag randomness is the ensemble
    * driver, and candidate features stay the caller-chosen set.
    *
    * Cost: `nTrees` independent [[fit]] loops — nTrees·maxDepth bounded
    * candidate collapses over the data, each tree's driver state ≤
    * 2^maxDepth rows. Scoring is a literal CASE chain per tree, summed
    * in tree order: pure projection, no join, no UDF.
    */
  def fitForest(df: DataFrame, features: Seq[String], labelCol: String,
      idCol: String, nTrees: Int = 5, maxDepth: Int = 2,
      minLeaf: Long = 1L, bins: Option[Int] = None): ForestModel = {
    require(nTrees >= 1, s"need nTrees >= 1, got $nTrees")
    require(!df.columns.contains("__bagw"),
      "fitForest stages bag weights as column '__bagw' — rename it")
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    // independent trees: run the per-tree fits CONCURRENTLY (guide §2.6 —
    // each fit is a short chain of agg jobs with idle driver gaps between
    // them; overlapped jobs back-fill each other's stragglers, FIFO
    // scheduling keeps earlier trees ahead). The tree seed enters the
    // md5 draw as a stable_lit so all trees share one compiled stage set
    // instead of recompiling the 60-arm Poisson CASE per tree (r14).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(nTrees, 4))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val futures = (1 to nTrees).map { b =>
      scala.concurrent.Future {
        val draw = conv(substring(md5(concat(col(idCol).cast("string"),
          lit("#"), graft.functions.stableLitS(b.toString))), 1, 15),
          16, 10).cast("long")
        val w = Hypothesis.poisson1Cut60.zipWithIndex
          .foldRight(lit(7L): Column) { case ((cut, k), rest) =>
            when(draw < cut, lit(k.toLong)).otherwise(rest)
          }
        fit(df.withColumn("__bagw", w), features, labelCol, maxDepth,
          minLeaf, bins, weightCol = Some("__bagw"))
      }
    }
    val trees = try futures.map(f => scala.concurrent.Await.result(f,
      scala.concurrent.duration.Duration.Inf))
    catch { case e: Throwable =>
      // a failed tree must not leave sibling fits running (and their own
      // failures unobserved) on non-daemon pool threads after the caller
      // has seen the error — interrupt outstanding work before rethrowing
      pool.shutdownNow(); throw e
    }
    finally pool.shutdown()
    ForestModel(trees)
  }
}
