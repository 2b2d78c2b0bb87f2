package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Kafka source/sink builders (SURVEY §2.1 S1/S2 — the reference links
  * rdkafka but its publish/consume are stubs; here the real production
  * path is the Spark Kafka connector).
  *
  * NOTE: this container ships no spark-sql-kafka connector jar and no
  * broker — deployments add
  * `--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>`. The
  * surface is still runtime-verified end-to-end: a TEST-classpath
  * DataSource V2 shim registered under short name `kafka`
  * (graft.testkit.FakeKafkaProvider) resolves these builders'
  * `format("kafka").load()`/`.start()` calls against an in-memory
  * broker, enforcing the exact option contract and serving the real
  * connector's 7-column record schema (KafkaEndToEndSpec) — only the
  * wire protocol itself stays environmental. KafkaContractSpec
  * additionally pins the option maps ([[sourceOptions]]/[[sinkOptions]])
  * and proves the wire transforms
  * ([[encodePayload]]/[[decodeEvents]]) round-trip bit-identically.
  */
object KafkaIO {

  /** JSON event payload schema (matches the events table). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The option map the S1 reader binds: connector-addressed broker list,
    * topic subscription, and tail-start offsets. Public so environments
    * (and KafkaContractSpec) can verify the contract without the
    * connector jar present. */
  def sourceOptions(servers: String, topic: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> servers,
    "subscribe" -> topic,
    "startingOffsets" -> "latest")

  /** The option map the S2 writer binds: broker list, target topic, and
    * the checkpoint dir that makes delivery exactly-once per T1. */
  def sinkOptions(servers: String, topic: String,
      checkpointDir: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> servers,
    "topic" -> topic,
    "checkpointLocation" -> checkpointDir)

  /** Decode a Kafka wire batch — (topic, value bytes) rows as the
    * connector delivers them — into typed event rows with the
    * reference's (broker, topic) compound key. Pure transform, shared by
    * [[eventSource]] and runtime-tested broker-free. */
  def decodeEvents(raw: DataFrame, servers: String): DataFrame =
    raw.select(
        lit(servers).as("broker"), col("topic"),
        from_json(col("value").cast("string"), eventSchema).as("e"))
      .select(col("broker"), col("topic"), col("e.*"))

  /** Encode rows into the (key, value) wire shape S2 publishes: the key
    * column as a string key, the whole row as a JSON value. Pure
    * transform, shared by [[sink]] and runtime-tested broker-free. */
  def encodePayload(df: DataFrame, keyCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.map(col): _*)).as("value"))

  /** S1: subscribe to a topic; value bytes → parsed event columns, with
    * (broker, topic) carried as the reference's compound key. */
  def eventSource(spark: SparkSession, servers: String, topic: String): DataFrame =
    decodeEvents(
      spark.readStream
        .format("kafka")
        .options(sourceOptions(servers, topic))
        .load(),
      servers)

  /** S2: publish rows as JSON values keyed by a column. */
  def sink(df: DataFrame, servers: String, topic: String, keyCol: String,
      checkpointDir: String): StreamingQuery =
    encodePayload(df, keyCol)
      .writeStream
      .format("kafka")
      .options(sinkOptions(servers, topic, checkpointDir))
      .start()
}
