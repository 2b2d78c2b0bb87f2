package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Num._

/** Event-time windowed aggregations (SURVEY §2.7 T3).
  *
  * Each builder works unchanged on a batch DataFrame (where the optional
  * watermark is a no-op) and on a streaming DataFrame (where it bounds
  * state and drops late rows) — one definition, two execution modes.
  * That is the Structured Streaming contract: the plan is declarative, the
  * incrementalization is Spark's.
  */
object EventWindows {

  private def watermarked(events: DataFrame, watermark: Option[String]): DataFrame =
    watermark.fold(events)(w => events.withWatermark("ts", w))

  /** Tumbling event-time window counts + value sums per event type. */
  def tumbling(events: DataFrame, size: String,
      watermark: Option[String] = None): DataFrame =
    watermarked(events, watermark)
      .groupBy(window(col("ts"), size), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding event-time window (size, slide). */
  def sliding(events: DataFrame, size: String, slide: String,
      watermark: Option[String] = None): DataFrame =
    watermarked(events, watermark)
      .groupBy(window(col("ts"), size, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session windows per user with the given inactivity gap. */
  def sessions(events: DataFrame, gap: String,
      watermark: Option[String] = None): DataFrame =
    watermarked(events, watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("n"), col("sum_value"))
}
