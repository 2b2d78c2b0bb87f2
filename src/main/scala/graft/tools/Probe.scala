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
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[probe] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      if (sys.env.contains("PROBE_EXPLAIN")) fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
