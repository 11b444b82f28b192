package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** The production long-id knob (`spark.graft.graph.longIds`, see
  * Graph.nodeDict) must be a pure execution-strategy switch: flag-on and
  * flag-off runs of the encoded ops return IDENTICAL rows. Vote counts
  * are exact integers and nid order == string order, so labelPropagation
  * parity is bit-exact; pageRank sums doubles in a different partition
  * order under encoding, so its parity is checked on the 1e-9 grid.
  */
class GraphLongIdSpec extends SparkSpec {

  private def edges = {
    val base = spark.range(0, 400).select(
      concat(lit("p"), (col("id") % 40)).as("u"),
      concat(lit("s"), (col("id") % 7)).as("v"))
    base.unionByName(base.select(col("v").as("u"), col("u").as("v"))).distinct()
  }

  private def withFlag[A](on: Boolean)(body: => A): A = {
    spark.conf.set("spark.graft.graph.longIds", on.toString)
    try body finally spark.conf.unset("spark.graft.graph.longIds")
  }

  test("labelPropagation: long-id flag does not change the result") {
    val off = withFlag(false)(
      Graph.labelPropagation(edges, rounds = 3).orderBy("u").collect())
    val on = withFlag(true)(
      Graph.labelPropagation(edges, rounds = 3).orderBy("u").collect())
    assert(on.toSeq === off.toSeq)
  }

  test("pageRank: long-id flag agrees on the 1e-9 grid") {
    val off = withFlag(false)(
      Graph.pageRank(edges, iters = 3).orderBy("u").collect())
    val on = withFlag(true)(
      Graph.pageRank(edges, iters = 3).orderBy("u").collect())
    assert(on.length === off.length)
    on.zip(off).foreach { case (a, b) =>
      assert(a.getString(0) === b.getString(0))
      assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-9,
        s"rank mismatch at ${a.getString(0)}")
    }
  }
}
