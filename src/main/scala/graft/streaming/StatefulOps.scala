package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** A typed event row for stateful streaming ops (mirrors the events
  * table; `ts` is a java.sql.Timestamp — Spark's product encoder stores
  * it as micros internally). */
final case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** Stateful stream processing (SURVEY §2.7 T4/T5).
  *
  * Scale notes: all state is keyed (`groupByKey`) so it shards across
  * executors; production deployments enable the RocksDB state store
  * provider (`spark.sql.streaming.stateStore.providerClass`) so state is
  * disk-backed — nothing here assumes state fits in executor heap.
  */
object StatefulOps {

  implicit private val eventEnc: Encoder[Event] = Encoders.product[Event]
  implicit private val longEnc: Encoder[Long] = Encoders.scalaLong
  implicit private val stateEnc: Encoder[(Long, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)

  /** A2 DISCARD policy on a stream: exactly-once keyed dedup within the
    * watermark (state expires with it). */
  def dedupWithinWatermark(events: DataFrame, watermark: String,
      keys: Seq[String]): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)

  /** A3 REPLACE-WITH-LATEST as continuous keyed state: emits the current
    * latest row per user whenever it changes. Tie-break on (ts, event_id)
    * makes arrival order irrelevant — determinism rule from SURVEY §7.4. */
  def keepLatestPerUser(events: Dataset[Event]): Dataset[Event] =
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Event, Event](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[Event], state: GroupState[Event]) =>
          val newest = (state.getOption.iterator ++ rows)
            .maxBy(e => (e.ts.getTime, e.event_id))
          if (state.getOption.contains(newest)) Iterator.empty
          else { state.update(newest); Iterator.single(newest) }
      }

  /** Running per-user aggregate (count + sum) maintained as keyed state. */
  def runningUserTotals(events: Dataset[Event]): Dataset[(Long, Long, Double)] = {
    implicit val enc: Encoder[(Long, Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { e => n += 1; s += e.value }
          state.update((n, s))
          Iterator.single((uid, n, s))
      }
  }

  /** Keep-latest as a transformWithState processor — the current
    * (Spark 4) stateful API; state lives in the RocksDB store, which
    * transformWithState requires, giving the disk-backed 100 TB state
    * path by construction. */
  class KeepLatestProcessor extends StatefulProcessor[Long, Event, Event] {
    @transient private var latest: ValueState[Event] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[Event]("latest",
        Encoders.product[Event], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[Event] = {
      val cur = if (latest.exists()) Some(latest.get()) else None
      val newest = (cur.iterator ++ rows).maxBy(e => (e.ts.getTime, e.event_id))
      if (cur.contains(newest)) Iterator.empty
      else { latest.update(newest); Iterator.single(newest) }
    }
  }

  /** [[keepLatestPerUser]] on the transformWithState API. */
  def keepLatestPerUserTws(events: Dataset[Event]): Dataset[Event] =
    events.groupByKey(_.user_id)
      .transformWithState(new KeepLatestProcessor,
        TimeMode.None(), OutputMode.Update())

  /** Typed view of an events DataFrame (batch or stream). */
  def asEvents(df: DataFrame): Dataset[Event] =
    df.selectExpr("event_id", "ts", "user_id", "event_type", "value").as[Event]
}
