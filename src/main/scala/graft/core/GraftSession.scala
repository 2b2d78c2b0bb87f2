package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the engine.
  *
  * Design point (SURVEY §6): the engine must hold up on a 1000-executor
  * cluster at ~100 TB. Locally we run `local[N]`, but every config here is
  * chosen to be correct at both scales:
  *   - AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  *     replaces hand-tuned partition counts at any scale.
  *   - UTC session timezone: deterministic timestamp semantics vs the oracle.
  *   - shuffle.partitions defaults to the local core count; on a real cluster
  *     AQE's coalescing makes the initial number mostly irrelevant.
  */
object GraftSession {

  /** Apply the engine's standard tuning to a builder. */
  def tuned(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      // events.ts is ns-precision parquet; read as long, Tables.events converts
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Local session for tests / ad-hoc runs. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = tuned(
      SparkSession.builder().master(s"local[$cores]").appName("graft")
        .config("spark.sql.warehouse.dir",
          s"${System.getProperty("java.io.tmpdir")}/graft-warehouse"),
      math.max(cores, 4)
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // the compiled graft_* expressions are part of the engine surface —
    // any session from this factory can use them (idempotent)
    graft.functions.GraftFunctions.register(s)
    s
  }
}
