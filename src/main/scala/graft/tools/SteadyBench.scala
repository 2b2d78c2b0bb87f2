package graft.tools

import org.apache.spark.sql.SparkSession

/** Steady-state benchmark: runs every query `reps+1` times in one session
  * and reports the best post-warmup time — separating real execution cost
  * from the one-time whole-stage-codegen compilation that dominates the
  * single-shot Bench numbers. Prints one JSON line.
  * Usage: runMain graft.tools.SteadyBench [sfDir] [reps]
  */
object SteadyBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val results = graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // fresh plan per run: planning + execution
      val times = (0 to reps).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      // warm rerun: re-execute the cached physical plan. NOTE this also
      // reuses shuffle outputs from the first run, so upstream stages are
      // skipped — it bounds the final-stage + sink cost from below, it is
      // NOT full execution time. The honest single-query execution cost
      // lies between this and the fresh-plan time above (which adds
      // analysis/optimization/AQE/codegen per invocation).
      val execT = try {
        val rdd = fn(spark, sfDir).queryExecution.toRdd
        rdd.foreachPartition(_ => ())
        val t0 = System.nanoTime()
        rdd.foreachPartition(_ => ())
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 } finally spark.catalog.clearCache()
      name -> (times.drop(1).min, execT)
    }
    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val es = results.map { case (k, (_, e)) => "\"" + k + "\":" + f"$e%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"steady_total","value":${results.map(_._2._1).sum},"unit":"sec","queries":$qs,"warm_rerun_total":${results.map(_._2._2).sum},"warm_rerun":$es,"sf":"$sfDir"}""")
    spark.stop()
  }
}
