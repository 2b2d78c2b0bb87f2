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
    val spark = graft.core.GraftSession.tuned(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // a failed rep must NOT record its time-to-exception as a steady-state
    // cell — a regression that breaks a query would read as a performance
    // win. Failures are counted and surfaced in the JSON line.
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val results = graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // fresh plan per run: planning + execution. Rep index travels with
      // each sample — rep 0 is ALWAYS the discarded warmup, even when it
      // fails: dropping failures first would silently promote the first
      // post-failure success into the warmup slot (or record a cold
      // planning-inclusive run as the steady cell when only one rep
      // succeeds).
      val times = (0 to reps).flatMap { rep =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case scala.util.control.NonFatal(_) =>
            failed(name) = failed.getOrElse(name, 0) + 1; false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        if (ok) Some((rep, dt)) else None
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
      } catch { case scala.util.control.NonFatal(_) => -1.0
      } finally spark.catalog.clearCache()
      // best SUCCESSFUL time among post-warmup reps (rep >= 1); -1 marks
      // a query with no successful post-warmup rep
      val post = times.collect { case (rep, dt) if rep >= 1 => dt }
      val steady = if (post.isEmpty) -1.0 else post.min
      name -> (steady, execT)
    }
    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val es = results.map { case (k, (_, e)) => "\"" + k + "\":" + f"$e%.3f" }
      .mkString("{", ",", "}")
    val fs = failed.map { case (k, n) => "\"" + k + "\":" + n }
      .mkString("{", ",", "}")
    println(s"""{"metric":"steady_total","value":${results.map(_._2._1).filter(_ >= 0).sum},"unit":"sec","queries":$qs,"warm_rerun_total":${results.map(_._2._2).filter(_ >= 0).sum},"warm_rerun":$es,"failed":$fs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
