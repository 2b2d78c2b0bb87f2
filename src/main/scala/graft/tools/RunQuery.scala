package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc result probe: runs named inventory queries and prints their rows
  * (dev-time spot check before the full Verify/oracle gate).
  * Usage: runMain graft.tools.RunQuery <sfDir> <q>... */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"== $n ==")
      graft.SparkEntry.queries(n)(spark, sfDir).show(50, false)
    }
    spark.stop()
  }
}
