package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** MicroBench with a SparkListener attached: per query, alongside wall
  * time, reports job/stage/task counts, summed task time, summed GC
  * time, shuffle bytes written and executor-CPU utilization
  * (task_time / (wall * cores)). Low utilization on a hot query means
  * the wall clock is going to DRIVER work (planning, codegen,
  * job-scheduling gaps between the many jobs of iterative fits), not to
  * the executors — the guide's "measure first" split between §1
  * (driver/plan shape) and §2 (shuffle/task work).
  *
  *   sbt "runMain graft.tools.ProfileBench q275_zip q176_label_prop"
  */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    val gcTimeMs = new AtomicLong(0L)
    val shuffleWriteB = new AtomicLong(0L)
    val shuffleReadB = new AtomicLong(0L)
    // per-stage task-time attribution: top offenders printed per rep so a
    // hot query's time maps back to a callsite, not just a global sum
    val stageTime = new java.util.concurrent.ConcurrentHashMap[Int, AtomicLong]()
    val stageName = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val graftFrame = s.stageInfo.details.split("\n")
          .find(l => l.contains("graft.") && !l.contains("tools."))
          .getOrElse("").trim.take(80)
        stageName.put(s.stageInfo.stageId,
          s.stageInfo.name.split("\n").head.take(60) + " | " + graftFrame +
            s" | ${s.stageInfo.numTasks}t")
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          stageTime.computeIfAbsent(t.stageId, _ => new AtomicLong(0))
            .addAndGet(m.executorRunTime)
          taskTimeMs.addAndGet(m.executorRunTime)
          gcTimeMs.addAndGet(m.jvmGCTime)
          shuffleWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shuffleReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0)
      gcTimeMs.set(0); shuffleWriteB.set(0); shuffleReadB.set(0)
      stageTime.clear(); stageName.clear()
    }

    var cgCount0 = 0L
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    spark.read.parquet(s"$sfDir/documents.parquet").count() // warmup
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to reps).foreach { rep =>
        spark.catalog.clearCache()
        System.gc()
        reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // let the async listener bus drain before reading counters
        Thread.sleep(300)
        val cgHist = org.apache.spark.metrics.source.CodegenMetrics
          .METRIC_COMPILATION_TIME
        val cgN = cgHist.getCount - cgCount0
        cgCount0 = cgHist.getCount
        val util = taskTimeMs.get() / 1e3 / (wall * cpus.toInt)
        println(f"[prof] $name%-28s rep=$rep wall=$wall%6.2f jobs=${jobs.get()}%3d " +
          f"stages=${stages.get()}%4d tasks=${tasks.get()}%5d " +
          f"taskTime=${taskTimeMs.get() / 1e3}%7.1fs gc=${gcTimeMs.get() / 1e3}%5.1fs " +
          f"shW=${shuffleWriteB.get() / 1e6}%8.1fMB shR=${shuffleReadB.get() / 1e6}%8.1fMB " +
          f"util=$util%5.2f cgCompiles=$cgN%4d cgMeanMs=${cgHist.getSnapshot.getMean}%6.1f")
        if (sys.env.contains("SPARK_GRAFT_PROF_STAGES")) {
          import scala.jdk.CollectionConverters._
          stageTime.asScala.toSeq.sortBy(-_._2.get()).take(8).foreach {
            case (sid, tms) =>
              println(f"[prof-stage]   ${tms.get() / 1e3}%7.1fs stage=$sid%4d " +
                stageName.getOrDefault(sid, "?"))
          }
        }
      }
    }
    spark.stop()
  }
}
