package graft

import org.apache.spark.sql.functions._

import graft.streaming.KafkaIO

/** S1/S2 contract verification WITHOUT a broker (SURVEY §2.1; VERDICT r8
  * item 6). The container ships no spark-sql-kafka jar and no broker, so
  * `.load()`/`.start()` stay environmental — but everything else the
  * builders do is pinned here: the option maps they bind (a future
  * environment with the jar gets runtime verification for free — these
  * exact keys are what the connector reads), and the wire transforms
  * (encode rows → Kafka (key,value) → decode back), proven to
  * round-trip bit-identically on the events schema. */
class KafkaContractSpec extends SparkTestBase {
  import spark.implicits._

  test("S1 reader option contract: bootstrap servers, subscribe, tail offsets") {
    val opts = KafkaIO.sourceOptions("broker1:9092,broker2:9092", "events")
    assert(opts === Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "events",
      "startingOffsets" -> "latest"))
  }

  test("S2 writer option contract: bootstrap servers, topic, checkpoint") {
    val opts = KafkaIO.sinkOptions("b:9092", "alerts", "/ckpt/alerts")
    assert(opts === Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "topic" -> "alerts",
      "checkpointLocation" -> "/ckpt/alerts"))
  }

  test("publish→consume wire round-trip: encodePayload output decodes back bit-identically") {
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-01 10:00:00"), 7L,
        "purchase", 19.5, """{"k":1}"""),
      (2L, java.sql.Timestamp.valueOf("2024-03-01 10:00:01"), 8L,
        "signup", 0.0, null.asInstanceOf[String]),
      // null-heavy row: every nullable field absent survives the wire
      (3L, null.asInstanceOf[java.sql.Timestamp], 9L,
        null.asInstanceOf[String], 2.25, """{"nested":{"a":[1,2]}}""")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    // what S2 puts on the wire
    val wire = KafkaIO.encodePayload(events, "user_id")
    assert(wire.columns.toSeq === Seq("key", "value"))
    assert(wire.select("key").as[String].collect().sorted === Array("7", "8", "9"))

    // what S1 reads back: the connector presents (topic, value binary)
    val raw = wire.select(lit("events").as("topic"),
      col("value").cast("binary").as("value"))
    val decoded = KafkaIO.decodeEvents(raw, "b:9092")
    assert(decoded.columns.toSeq ===
      Seq("broker", "topic") ++ KafkaIO.eventSchema.fieldNames.toSeq)
    val back = decoded
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .orderBy("event_id").collect().toSeq
    val orig = events.orderBy("event_id").collect().toSeq
    assert(back === orig)
    assert(decoded.select("broker", "topic").distinct().collect().toSeq
      === Seq(org.apache.spark.sql.Row("b:9092", "events")))
  }

  test("decodeEvents tolerates corrupt payloads: bad JSON yields null fields, not a crash") {
    val raw = Seq(("events", "not json at all"), ("events", """{"event_id":5}"""))
      .toDF("topic", "value")
    val decoded = KafkaIO.decodeEvents(raw, "b:9092")
      .orderBy(asc_nulls_first("event_id"))
      .select("event_id", "event_type").collect().toSeq
    assert(decoded.length === 2)
    assert(decoded(0).isNullAt(0) && decoded(1).getLong(0) === 5L)
  }
}
