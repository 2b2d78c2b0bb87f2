package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** One-off diagnostic: per-stage peak task execution memory for a named
  * SparkEntry query — attributes the "largest single-task acquisition"
  * (SCALING.md's q49 finding) to the actual operator in the plan rather
  * than to a guess. Usage: runMain graft.tools.PeakProbe <sfDir> <query>. */
object PeakProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val q = args(1)
    val parts = if (args.length > 2) args(2) else "32"
    val advisory = sys.env.getOrElse("GRAFT_PROBE_ADVISORY", "64m")
    val pageSize = sys.env.getOrElse("GRAFT_PROBE_PAGESIZE", "")
    val b0 = SparkSession.builder().master("local[32]")
    val b1a = if (pageSize.nonEmpty) b0.config("spark.buffer.pageSize", pageSize) else b0
    val bcThresh = sys.env.getOrElse("GRAFT_PROBE_BC_THRESHOLD", "")
    val b1 = if (bcThresh.nonEmpty)
      b1a.config("spark.sql.autoBroadcastJoinThreshold", bcThresh) else b1a
    val spark = b1
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stagePeak = TrieMap.empty[Int, Long]   // stageId -> max task peak
    val stageSpill = TrieMap.empty[Int, Long]  // stageId -> sum mem spilled
    val stageTasks = TrieMap.empty[Int, Long]
    val stageShufRead = TrieMap.empty[Int, Long]
    val stageShufWrite = TrieMap.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          stagePeak.updateWith(t.stageId)(v =>
            Some(math.max(v.getOrElse(0L), m.peakExecutionMemory)))
          stageSpill.updateWith(t.stageId)(v =>
            Some(v.getOrElse(0L) + m.memoryBytesSpilled))
          stageTasks.updateWith(t.stageId)(v => Some(v.getOrElse(0L) + 1))
          stageShufRead.updateWith(t.stageId)(v =>
            Some(v.getOrElse(0L) + m.shuffleReadMetrics.totalBytesRead))
          stageShufWrite.updateWith(t.stageId)(v =>
            Some(v.getOrElse(0L) + m.shuffleWriteMetrics.bytesWritten))
        }
      }
    })

    val df = graft.SparkEntry.queries(q)(spark, d)
    df.write.format("noop").mode("overwrite").save()

    // per-operator peak-memory SQL metrics from the executed plan
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p.metrics.foreach { case (k, m) =>
        if (k.toLowerCase.contains("peak") && m.value > 32 * 1024 * 1024)
          println(f"  OP ${p.nodeName}%-40s $k=${m.value / 1024.0 / 1024.0}%9.1f MB")
      }
      p.children.foreach(walk)
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(s.plan)
        case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec =>
          r.children.foreach(walk)
        case _ =>
      }
    }
    walk(df.queryExecution.executedPlan)

    println(s"PEAK-PROBE $q parts=$parts advisory=$advisory sf=$d")
    stagePeak.toSeq.sortBy(-_._2).take(8).foreach { case (sid, peak) =>
      def mb(x: Long) = x / 1024.0 / 1024.0
      println(f"  stage $sid%4d tasks=${stageTasks.getOrElse(sid, 0L)}%4d " +
        f"peakTask=${mb(peak)}%9.1f MB spilled=${mb(stageSpill.getOrElse(sid, 0L))}%9.1f MB " +
        f"shufRead=${mb(stageShufRead.getOrElse(sid, 0L))}%9.1f MB " +
        f"shufWrite=${mb(stageShufWrite.getOrElse(sid, 0L))}%9.1f MB")
    }
    spark.stop()
  }
}
