package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B planning-cost probe: times fresh-plan runs of the named queries
  * with a Catalyst conf toggled across values in the same JVM (warm
  * JIT/codegen cache).
  * Usage: runMain graft.tools.PlanCost <sfDir> <confKey> <v1,v2> <q>... */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val key = args(1)
    val values = args(2).split(",").toSeq
    val names = args.drop(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // JIT warm pass with default conf
    names.foreach(run)
    (values ++ values).foreach { v =>
      spark.conf.set(key, v)
      val times = names.map(n => f"$n=${run(n)}%.2f").mkString(" ")
      println(s"[plancost] $key=$v $times")
    }
    spark.stop()
  }
}
