package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner: drives SparkEntry.entry exactly like the driver's
  * rows>0 check (t1 tier, sf0.001). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(8)
    val df = SparkEntry.entry(spark)
    df.show(10, truncate = false)
    println(s"[smoke] entry rows=${df.count()}")
    spark.stop()
  }
}
