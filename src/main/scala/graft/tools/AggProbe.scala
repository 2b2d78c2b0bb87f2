package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object AggProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    def time(tag: String)(f: => Unit): Unit = {
      f; val t0 = System.nanoTime(); f; f
      println(f"TIMING $tag ${(System.nanoTime() - t0) / 2e9}%.2f s")
    }
    def dec(t: String) = Seq(
      sum(col("l_quantity").cast(t)),
      sum(col("l_extendedprice").cast(t)),
      sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(t)),
      sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).cast(t)),
      sum(col("l_discount").cast(t)), count(lit(1)))
    time("plain_double") { li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity"), sum("l_extendedprice"), avg("l_discount"), count(lit(1)))
      .write.format("noop").mode("overwrite").save() }
    time("decimal25") { li.groupBy("l_returnflag", "l_linestatus")
      .agg(dec("decimal(25,6)").head, dec("decimal(25,6)").tail: _*)
      .write.format("noop").mode("overwrite").save() }
    time("decimal18") { li.groupBy("l_returnflag", "l_linestatus")
      .agg(dec("decimal(18,6)").head, dec("decimal(18,6)").tail: _*)
      .write.format("noop").mode("overwrite").save() }
    time("repart32_decimal25") { li.repartition(32).groupBy("l_returnflag", "l_linestatus")
      .agg(dec("decimal(25,6)").head, dec("decimal(25,6)").tail: _*)
      .write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
