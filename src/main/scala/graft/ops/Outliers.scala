package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier scoring: median / MAD (median absolute
  * deviation), the standard robust alternative to mean/σ z-scores — one
  * wild value cannot drag the threshold the way it drags a standard
  * deviation.
  *
  * Uses EXACT medians (Spark's sort-based `percentile`), which buffer a
  * group's values during aggregation — the same deliberate trade as the
  * q33 exact-percentile gate; for billion-row groups swap in
  * `percentile_approx` (the q58 pattern) at the two call sites. The
  * per-group medians frame is tiny and broadcast back, so the data is
  * scanned three times but never reshuffled by anything except the group
  * key.
  */
object Outliers {

  /** Per-group robust outlier summary.
    *
    * score(x) = |x − median| / (1.4826 · MAD); rows with score > `k` are
    * outliers (1.4826 makes MAD consistent for the normal distribution).
    * Groups with MAD = 0 (over half the values identical) report outliers
    * as the count of values different from the median, matching the
    * score → ∞ limit.
    *
    * @return (group, n, median, mad, n_outliers)
    */
  def madOutliers(df: DataFrame, keyCol: String, valCol: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0, "k must be positive")
    val med = df.groupBy(col(keyCol))
      .agg(expr(s"percentile($valCol, 0.5)").as("median"))
    val dev = df.join(broadcast(med), keyCol)
      .withColumn("__adev", abs(col(valCol) - col("median")))
    val mad = dev.groupBy(col(keyCol))
      .agg(first("median").as("median"), expr("percentile(__adev, 0.5)").as("mad"))
    dev.drop("median").join(broadcast(mad), keyCol)
      .withColumn("__thr", lit(k) * lit(1.4826) * col("mad"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        first("median").as("median"),
        first("mad").as("mad"),
        sum(when((col("mad") > 0 && col("__adev") > col("__thr")) ||
          (col("mad") === 0 && col("__adev") > 0), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Multivariate outlier scoring: squared Mahalanobis distance
    * d²(x) = (x−μ)ᵀ Σ⁻¹ (x−μ) against the columns' own sample
    * covariance — the joint-distribution outlier test (a row can be
    * unremarkable per column yet far off the correlation ridge; d² is
    * what sees it). Under normality d² ~ χ²(k), so flag at the χ²
    * quantile of choice downstream.
    *
    * Execution is the Gram discipline: ONE fused aggregation collects
    * n + k means + k(k+1)/2 second moments (a (k²+k)-double driver row),
    * the k×k inverse is driver math, and the scoring pass is
    * [[graft.glm.LinAlg.quadFormExpr]] — literal-kernel multiply-adds
    * inside whole-stage codegen, no join, no second shuffle.
    *
    * @return input rows plus `outputCol` = d² (sample covariance,
    *         n−1 denominator)
    */
  def mahalanobis(df: DataFrame, cols: Seq[String],
      outputCol: String = "md2"): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    require(!df.columns.contains(outputCol),
      s"output column '$outputCol' already exists")
    import breeze.linalg.{DenseMatrix => BDM}
    def x(c: String) = col(c).cast("double")
    val k = cols.size
    val moments =
      Seq(count(lit(1)).as("n")) ++
      cols.map(c => sum(x(c)).as(s"s_$c")) ++
      (for (i <- 0 until k; j <- i until k) yield
        sum(x(cols(i)) * x(cols(j))).as(s"q_${i}_$j"))
    val row = df.agg(moments.head, moments.tail: _*).head()
    val n = row.getLong(0).toDouble
    require(n > k, s"need more rows ($n) than columns ($k)")
    val sums = cols.indices.map(i => row.getDouble(1 + i)).toArray
    val cov = BDM.zeros[Double](k, k)
    var idx = 1 + k
    for (i <- 0 until k; j <- i until k) {
      val c = (row.getDouble(idx) - sums(i) * sums(j) / n) / (n - 1)
      cov(i, j) = c; cov(j, i) = c
      idx += 1
    }
    val inv = graft.glm.LinAlg.invPD(cov)
    val centered = cols.indices.map(i =>
      x(cols(i)) - lit(sums(i) / n)).toArray
    df.withColumn(outputCol,
      graft.glm.LinAlg.quadFormExpr(inv, centered))
  }

  /** One fitted isolation-forest node: `feature`/`split` set on
    * internal nodes (value < split goes left), `size` the node's row
    * count (filled for leaves, used by the path-length correction).
    */
  final case class IsoNode(tree: Int, path: String,
      feature: Option[String], split: Option[Double], size: Long)

  /** Deterministic isolation forest (Liu/Ting/Zhou 2008) — the
    * MULTIVARIATE anomaly score next to the univariate [[madOutliers]]
    * and the Gaussian-shaped [[mahalanobis]]: anomalous rows isolate in
    * few random axis-aligned splits, so a short expected path depth
    * marks an outlier WITHOUT any distributional assumption.
    *
    * Randomness is content-keyed, not random: node (t, path) draws its
    * feature as md5(t·"f"·path) mod |features| and its split fraction
    * as the 60-bit md5(t·"s"·path) over 2⁶⁰ — deterministic,
    * partition-invariant, identical in any engine. The split VALUE is
    * min + frac·(max − min) of the node's rows.
    *
    * Distribution (per level, ALL trees and frontier nodes at once):
    * node assignment per tree is a literal nested-CASE projection;
    * ONE (tree, node) aggregation computes each node's min/max of its
    * own chosen feature (a per-node literal CASE selects which feature
    * feeds the agg); ≤ trees·2^depth rows return to the driver. Exact
    * replay is STRONGER than the EM operators': min/max carry exact
    * input doubles (never a float sum), split arithmetic is one pinned
    * product, and path depths are integers — only the final score
    * chain is float, identical in any engine.
    *
    * Scoring: s(x) = 2^(−E_t[h_t(x)] / c(n)) with h = depth +
    * c(leaf size), c(m) the average BST path length (c(1) = 0,
    * c(2) = 1, else 2(ln(m−1) + γ) − 2(m−1)/m, γ = 0.5772156649) — a
    * pure per-tree nested-CASE projection averaged in tree order.
    *
    * @return input plus `outputCol` (anomaly score in (0, 1); higher =
    *         more anomalous) and the model's node table
    */
  def isolationForest(df: DataFrame, features: Seq[String],
      nTrees: Int = 4, maxDepth: Int = 6,
      outputCol: String = "iso_score"): (DataFrame, Seq[IsoNode]) = {
    require(features.nonEmpty, "need at least one feature")
    require(nTrees >= 1 && maxDepth >= 1,
      s"need nTrees >= 1 and maxDepth >= 1, got $nTrees/$maxDepth")
    require(!df.columns.contains(outputCol),
      s"output column '$outputCol' already exists")
    val spark = df.sparkSession
    def x(c: String) = col(c).cast("double")

    // content-keyed draws: 60-bit md5 of "t#kind#path"
    def draw(t: Int, kind: String, path: String): Long =
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils
          .md5Hex(s"$t#$kind#$path").substring(0, 15), 16)
    def featOf(t: Int, path: String): String =
      features((draw(t, "f", path) % features.length).toInt)
    def fracOf(t: Int, path: String): Double =
      draw(t, "s", path).toDouble / math.pow(2.0, 60)

    val n = df.count()
    require(n >= 2, s"need at least 2 rows, got $n")
    // splits(t) = path -> (feature, split value); sizes(t) = leaf sizes
    val splits = Array.fill(nTrees)(
      scala.collection.mutable.Map.empty[String, (String, Double)])
    var frontier: Seq[(Int, String)] =
      (0 until nTrees).map(t => (t, ""))
    val leafSize = scala.collection.mutable.Map.empty[(Int, String), Long]
    ((0 until nTrees)).foreach(t => leafSize((t, "")) = n)

    def nodeExpr(t: Int, depth: Int): org.apache.spark.sql.Column = {
      def walk(path: String, d: Int): org.apache.spark.sql.Column =
        splits(t).get(path) match {
          case Some((f, s)) if d > 0 =>
            when(x(f) < lit(s), walk(path + "L", d - 1))
              .otherwise(walk(path + "R", d - 1))
          case _ => lit(path)
        }
      walk("", depth)
    }

    for (depth <- 0 until maxDepth if frontier.nonEmpty) {
      // ONE scan for ALL trees: each row fans out to (t, node, v) cells
      // — the node's OWN drawn feature selected by a literal CASE keyed
      // on the STAGED node column (staging keeps the 2^depth assignment
      // case-tree computed once per tree, not once per frontier node)
      val withNodes = df.select(features.map(x) ++
        (0 until nTrees).map(t => nodeExpr(t, depth).as(s"__n_$t")): _*)
      val cells = (0 until nTrees).flatMap { t =>
        val nodes = frontier.filter(_._1 == t).map(_._2)
        if (nodes.isEmpty) None
        else {
          val featCase = nodes.tail.foldLeft(
            x(featOf(t, nodes.head))) { (acc, p) =>
            when(col(s"__n_$t") === p, x(featOf(t, p))).otherwise(acc)
          }
          Some(struct(lit(t).as("t"), col(s"__n_$t").as("node"),
            featCase.as("v")))
        }
      }
      val live = frontier.map { case (t, p) => s"$t#$p" }.toSet
      val stats = withNodes
        .select(explode(array(cells: _*)).as("c"))
        .select(col("c.t").as("t"), col("c.node").as("node"),
          col("c.v").as("v"))
        .where(concat(col("t"), lit("#"), col("node"))
          .isin(live.toSeq: _*))
        .groupBy("t", "node")
        .agg(min("v").as("mn"), max("v").as("mx"),
          count(lit(1)).as("cnt"))
        .collect() // ≤ trees · 2^depth rows: model-sized
        .map(r => (r.getInt(0), r.getString(1)) ->
          (r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
      val next = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
      frontier.foreach { case (t, p) =>
        stats.get((t, p)) match {
          case Some((mn, mx, cnt)) if cnt >= 2 && mx > mn =>
            val f = featOf(t, p)
            val s = mn + fracOf(t, p) * (mx - mn)
            splits(t)(p) = (f, s)
            leafSize.remove((t, p))
            // children sizes land next level (or at the depth cap below)
            next += ((t, p + "L")); next += ((t, p + "R"))
          case Some((_, _, cnt)) =>
            leafSize((t, p)) = cnt
          case None => leafSize((t, p)) = 0L
        }
      }
      frontier = next.toSeq
    }
    // depth-capped frontier nodes become leaves: ONE counting pass
    if (frontier.nonEmpty) {
      val cells = (0 until nTrees).map(t =>
        struct(lit(t).as("t"), nodeExpr(t, maxDepth).as("node")))
      val counts = df
        .select(explode(array(cells: _*)).as("c"))
        .select(col("c.t").as("t"), col("c.node").as("node"))
        .groupBy("t", "node").agg(count(lit(1)).as("cnt"))
        .collect()
        .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
      frontier.foreach { case (t, p) =>
        leafSize((t, p)) = counts.getOrElse((t, p), 0L)
      }
    }

    // c(m): average BST path length — the Liu et al. correction
    def cOf(m: Long): Double =
      if (m <= 1L) 0.0
      else if (m == 2L) 1.0
      else 2.0 * (math.log(m - 1.0) + 0.5772156649) -
        2.0 * (m - 1.0) / m
    def hExpr(t: Int): org.apache.spark.sql.Column = {
      def walk(path: String, depth: Int): org.apache.spark.sql.Column =
        splits(t).get(path) match {
          case Some((f, s)) =>
            when(x(f) < lit(s), walk(path + "L", depth + 1))
              .otherwise(walk(path + "R", depth + 1))
          case None =>
            lit(depth.toDouble + cOf(leafSize.getOrElse((t, path), 0L)))
        }
      walk("", 0)
    }
    val avgH = (0 until nTrees).map(hExpr).reduceLeft(_ + _) /
      lit(nTrees.toDouble)
    val score = pow(lit(2.0), -avgH / lit(cOf(n)))
    val nodesOut = (0 until nTrees).flatMap { t =>
      splits(t).toSeq.map { case (p, (f, s)) =>
        IsoNode(t, p, Some(f), Some(s), -1L)
      } ++ leafSize.collect { case ((`t`, p), m) =>
        IsoNode(t, p, None, None, m)
      }
    }.sortBy(nd => (nd.tree, nd.path))
    (df.withColumn(outputCol, score), nodesOut)
  }
}
