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
  * broker, so these builders are compile-time surface only — deployments
  * add `--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>`.
  * Everything downstream of the source (parsing, windows, state, sinks)
  * is identical to the file/memory-stream paths that ARE tested.
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

  /** S1: subscribe to a topic; value bytes → parsed event columns, with
    * (broker, topic) carried as the reference's compound key. */
  def eventSource(spark: SparkSession, servers: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", "latest")
      .load()
      .select(
        lit(servers).as("broker"), col("topic"),
        from_json(col("value").cast("string"), eventSchema).as("e"))
      .select(col("broker"), col("topic"), col("e.*"))

  /** S2: publish rows as JSON values keyed by a column. */
  def sink(df: DataFrame, servers: String, topic: String, keyCol: String,
      checkpointDir: String): StreamingQuery =
    df.select(
        col(keyCol).cast("string").as("key"),
        to_json(struct(df.columns.map(col): _*)).as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
      .start()
}
