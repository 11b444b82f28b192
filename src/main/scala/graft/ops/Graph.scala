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
    // the input relation is consumed several times (degree agg, dangling
    // probe, every iteration's join) and is often itself an expensive
    // lazy plan (a distinct, a filter over a big fact) — pin it ONCE so
    // all consumers read a materialized frame
    val cp = new graft.Checkpointer(edges.sparkSession, None)
    val e = cp.pin(edges)
    val deg = e.groupBy("u").agg(count(lit(1)).as("d"))
    // dangling detection: does any edge TARGET a node that never appears
    // as a source? One anti-join probe with a `take(1)` short circuit
    // over the pinned edges — the build side is the (much smaller)
    // source-key frame, typically a broadcast probe
    val hasDangling = !e.select(col("v"))
      .join(deg.select(col("u").as("__s")), col("v") === col("__s"),
        "left_anti")
      .isEmpty
    if (!hasDangling) {
      // node universe ≡ source keys; scalar metadata via one count job
      val n = deg.count()
      // closed graph (every node is a source — always true for
      // symmetrized graphs): the loop is a pure lazy chain, ONE join+agg
      // per iteration, nothing consumed twice; the FINAL generation
      // materializes through the checkpointer so close() can free the
      // pinned edges, intermediates follow the checkpointEvery cadence
      val withDeg = e.join(deg, "u")
      var ranks = deg.select(col("u"), lit(1.0 / n).as("r"))
      for (i <- 1 to iters) {
        val next = withDeg.join(ranks, "u")
          .groupBy(col("v"))
          .agg(sum(col("r") / col("d")).as("in_mass"))
          .select(col("v").as("u"),
            (lit((1.0 - damping) / n) + lit(damping) * col("in_mass")).as("r"))
        ranks =
          if (i == iters || (checkpointEvery > 0 && i % checkpointEvery == 0))
            cp(next)
          else next
      }
      cp.close()
      ranks
    } else {
      // dangling nodes exist: their rank is redistributed uniformly each
      // iteration, so Σ rank = 1 exactly. The dangling aggregate and the
      // contribution join BOTH consume the previous ranks — a lazy chain
      // would re-execute each prior iteration per consumer (exponential),
      // so every generation materializes through the checkpointer (the
      // GroupedGLM discipline; local checkpoints, superseded generations
      // freed as the next lands).
      val withDeg = cp.pin(e.join(deg, "u"))
      val nodes = cp.pin(e.select(col("u"))
        .union(e.select(col("v").as("u"))).distinct())
      // node count is scalar metadata (one count job over the pinned set)
      val n = nodes.count()
      var ranks = cp(nodes.select(col("u"), lit(1.0 / n).as("r")))
      for (_ <- 1 to iters) {
        // dangling mass: a tiny aggregate over the MATERIALIZED ranks,
        // carried as a broadcast one-row frame (no driver action)
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
        ranks = cp(next)
      }
      cp.close() // the final generation backs `ranks` and stays alive
      ranks
    }
  }
}
