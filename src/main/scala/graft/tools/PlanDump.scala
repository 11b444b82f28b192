package graft.tools

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` output for the named queries to
  * `<outDir>/<query>_<suffix>.txt` — the plans/r14 evidence files.
  *
  *   sbt "runMain graft.tools.PlanDump /root/testdata/sf0.01 plans/r14 after q275_zip ..."
  *
  * Note: operators that materialize eagerly through [[graft.Checkpointer]]
  * (pins + generation chains) run their inner stages DURING query
  * construction; the dumped plan is the final consumer stage over the
  * checkpointed result, so for those the interesting shape lives in the
  * op code and the ProfileBench job/stage metrics, not this file.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, queries @ _*) = args.toSeq.toArray
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    queries.foreach { q =>
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${q}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plandump] wrote $q")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $q failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
