package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: prints FileScan / Exchange / ReusedExchange counts in the
  * executed (post-AQE) plan of the named queries. */
object PlanCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      def n(p: String) = p.r.findAllIn(plan).length
      println(s"[plancount] $name scans=${n("FileScan|BatchScan")} " +
        s"exchanges=${n("Exchange (hash|range|Single)")} reused=${n("ReusedExchange")} " +
        s"bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")}")
    }
    spark.stop()
  }
}
