package graft.tools
import org.apache.spark.sql.SparkSession
object PlanDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { q =>
      println(s"=== $q ===")
      println(graft.SparkEntry.queries(q)(spark, args.head)
        .queryExecution.optimizedPlan.treeString.take(6000))
    }
  }
}
