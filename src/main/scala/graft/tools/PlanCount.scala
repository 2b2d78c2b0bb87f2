package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: prints FileScan / Exchange / ReusedExchange counts in the
  * executed (post-AQE) plan of the named queries. */
object PlanCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // the standard engine tuning (incl. the 64 MB broadcast threshold):
    // a hand-rolled config block reported smj where every real session
    // plans bhj for 10-64 MB dims — plan evidence must describe the
    // plans the engine actually runs
    val spark = graft.core.GraftSession.tuned(
      SparkSession.builder().master("local[8]"), 8).getOrCreate()
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
