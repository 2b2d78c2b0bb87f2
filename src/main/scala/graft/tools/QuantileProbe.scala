package graft.tools

import org.apache.spark.sql.functions._

/** Diagnostic: times the q52 percentile shapes head-to-head at a given
  * sf — the built-in sort-buffer `percentile` aggregate vs the two-pass
  * histogram selection (operators.Quantiles.exactPercentiles) — and
  * verifies they return bit-identical values.
  * Usage: runMain graft.tools.QuantileProbe [sfDir] [reps]
  */
object QuantileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val slim = graft.core.Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_extendedprice")

    def buffer() = {
      val s = slim
      s.repartition(s.sparkSession.sparkContext.defaultParallelism)
        .groupBy(col("l_returnflag"))
        .agg(percentile(col("l_extendedprice"),
          array(lit(0.5), lit(0.9))).as("ps"))
        .select(col("l_returnflag"),
          element_at(col("ps"), 1).as("p50"), element_at(col("ps"), 2).as("p90"))
        .orderBy("l_returnflag").collect()
    }
    def twoPass() =
      graft.operators.Quantiles.exactPercentiles(slim, "l_returnflag",
          "l_extendedprice", Seq(0.5, 0.9))
        .select(col("l_returnflag"),
          element_at(col("ps"), 1).as("p50"), element_at(col("ps"), 2).as("p90"))
        .orderBy("l_returnflag").collect()

    var last: (Seq[String], Seq[String]) = (Nil, Nil)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime(); val a = buffer()
      val t1 = System.nanoTime(); val b = twoPass()
      val t2 = System.nanoTime()
      println(f"[probe] run$i buffer=${(t1 - t0) / 1e9}%.2f s twopass=${(t2 - t1) / 1e9}%.2f s")
      last = (a.map(_.toString).toSeq, b.map(_.toString).toSeq)
    }
    val same = last._1 == last._2
    println(s"[probe] identical=$same")
    last._1.zip(last._2).foreach { case (x, y) => println(s"  $x | $y") }
    if (!same) sys.exit(1)
    spark.stop()
  }
}
