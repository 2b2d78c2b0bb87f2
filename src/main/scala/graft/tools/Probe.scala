package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/perf probe: runs named queries N times and prints timings
  * + formatted plan. Usage: runMain graft.tools.Probe <sfDir> <n> <q>... */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args.drop(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.add((si.stageId, si.taskMetrics.executorRunTime,
          si.numTasks.toLong, si.name.take(120)))
      }
    })

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to n).foreach { i =>
        stages.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[probe] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
        if (i == n && sys.env.contains("PROBE_STAGES")) {
          Thread.sleep(400) // let the listener bus drain
          stages.toArray(Array.empty[(Int, Long, Long, String)])
            .sortBy(-_._2).take(6).foreach { case (id, rt, nt, nm) =>
              println(f"[stage] id=$id run=${rt}ms tasks=$nt $nm")
            }
        }
      }
      if (sys.env.contains("PROBE_EXPLAIN")) fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
