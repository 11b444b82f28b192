package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph propagation beyond connected components: PageRank over
  * an edge relation. Each iteration is one equi-join + one aggregation on
  * the edge key — the textbook distributed formulation (contributions flow
  * along edges, never a matrix in driver memory), so the cluster cost is
  * `iters` keyed shuffles of (node, rank) pairs.
  *
  * For long runs the caller should pass `checkpointEvery` so the lineage
  * is cut the same way the connected-components loops do it
  * (graft.Checkpointer); the default (0 = off) suits the few-iteration
  * analytical use this engine gates.
  */
object Graph {

  /** Standard damped PageRank on a DIRECTED edge list `(u, v)` (symmetrize
    * first for undirected graphs). Every node must appear as a source at
    * least once (true for symmetrized graphs); dangling-node mass is not
    * redistributed.
    *
    * r₀ = 1/n; rₖ₊₁(v) = (1−d)/n + d · Σ_{u→v} rₖ(u)/outdeg(u).
    *
    * @return (u, rank) for every node, Σ rank ≈ 1 (up to dangling loss)
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
      checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
    val deg = edges.groupBy("u").agg(count(lit(1)).as("d"))
    // node count is scalar metadata (one count job), not data on the driver
    val n = deg.count()
    val cp = if (checkpointEvery > 0)
      Some(new graft.Checkpointer(edges.sparkSession, None)) else None
    // the edge relation is loop-invariant: pin it so every generation reads
    // a materialized frame instead of re-planning the join lineage
    val withDeg0 = edges.join(deg, "u")
    val withDeg = cp.map(_.pin(withDeg0)).getOrElse(withDeg0)
    var ranks = deg.select(col("u"), lit(1.0 / n).as("r"))
    for (i <- 1 to iters) {
      val next = withDeg.join(ranks, "u")
        .groupBy(col("v"))
        .agg(sum(col("r") / col("d")).as("in_mass"))
        .select(col("v").as("u"),
          (lit((1.0 - damping) / n) + lit(damping) * col("in_mass")).as("r"))
      // the FINAL generation always materializes through the checkpointer
      // so close() can free the pinned edges before we return
      ranks = cp match {
        case Some(c) if i % checkpointEvery == 0 || i == iters => c(next)
        case _ => next
      }
    }
    cp.foreach(_.close())
    ranks
  }
}
