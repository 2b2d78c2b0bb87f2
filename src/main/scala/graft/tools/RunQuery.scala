package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc result probe: runs named inventory queries and prints their rows
  * (dev-time spot check before the full Verify/oracle gate).
  * Usage: runMain graft.tools.RunQuery <sfDir> <q>... */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    // the standard engine tuning — results and plans must match the
    // sessions Verify/Bench run, not a hand-rolled config block
    val spark = graft.core.GraftSession.tuned(
      SparkSession.builder().master("local[8]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"== $n ==")
      graft.SparkEntry.queries(n)(spark, sfDir).show(50, false)
    }
    spark.stop()
  }
}
