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
    * first for undirected graphs). Nodes are the union of sources and
    * sinks; dangling nodes (no outgoing edge) redistribute their rank
    * uniformly each iteration, so Σ rank = 1 exactly on ANY directed
    * graph:
    *
    * r₀ = 1/n; rₖ₊₁(v) = (1−d)/n + d · (Σ_{u→v} rₖ(u)/outdeg(u) + Dₖ/n)
    *
    * where Dₖ = Σ rₖ over dangling nodes — ONE extra anti-join aggregate
    * per iteration, carried as a broadcast one-row frame (no driver
    * action, the loop stays fully declarative).
    *
    * @return (u, rank) for every node, Σ rank = 1 (float tolerance)
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
      checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
    val deg = edges.groupBy("u").agg(count(lit(1)).as("d"))
    val cp = if (checkpointEvery > 0)
      Some(new graft.Checkpointer(edges.sparkSession, None)) else None
    // loop invariants: the degree'd edge relation AND the node universe —
    // pin both so every generation reads materialized frames instead of
    // re-planning the join lineage
    val withDeg0 = edges.join(deg, "u")
    val withDeg = cp.map(_.pin(withDeg0)).getOrElse(withDeg0)
    val nodes0 = edges.select(col("u"))
      .union(edges.select(col("v").as("u"))).distinct()
    val nodes = cp.map(_.pin(nodes0)).getOrElse(nodes0)
    // node count is scalar metadata (one count job), not data on the driver
    val n = nodes.count()
    var ranks = nodes.select(col("u"), lit(1.0 / n).as("r"))
    for (i <- 1 to iters) {
      // dangling mass: rank held by nodes with no outgoing edge
      val dangling = ranks.join(deg, Seq("u"), "left_anti")
        .agg(coalesce(sum("r"), lit(0.0)).as("dm"))
      val inMass = withDeg.join(ranks, "u")
        .groupBy(col("v"))
        .agg(sum(col("r") / col("d")).as("in_mass"))
        .select(col("v").as("u"), col("in_mass"))
      val next = nodes.join(inMass, Seq("u"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("u"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("in_mass"), lit(0.0)) + col("dm") / n)).as("r"))
      // the FINAL generation always materializes through the checkpointer
      // so close() can free the pinned frames before we return
      ranks = cp match {
        case Some(c) if i % checkpointEvery == 0 || i == iters => c(next)
        case _ => next
      }
    }
    cp.foreach(_.close())
    ranks
  }
}
