package graft.testkit

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** TEST-ONLY in-memory broker backing the [[FakeKafkaProvider]] shim.
  *
  * One JVM-wide topic map (the test JVM runs local-mode, so executors
  * share this singleton). Records are (key bytes, value bytes, append
  * time millis); a topic is a single append-only partition whose offset
  * is its length — exactly the model the real connector exposes per
  * partition. An epoch ledger per topic dedupes sink commit replays, so
  * a restarted query re-emitting an epoch appends nothing (T1
  * exactly-once at the shim boundary, mirroring what checkpointed
  * offsets give the real connector). */
object FakeBroker {
  type Rec = (Array[Byte], Array[Byte], Long)
  private val topics = new ConcurrentHashMap[String, ArrayBuffer[Rec]]()
  private val committedEpochs = new ConcurrentHashMap[String, java.util.Set[Long]]()

  private def buf(topic: String): ArrayBuffer[Rec] =
    topics.computeIfAbsent(topic, _ => new ArrayBuffer[Rec]())

  def append(topic: String, key: Array[Byte], value: Array[Byte],
      tsMillis: Long): Unit = {
    val b = buf(topic)
    b.synchronized { b += ((key, value, tsMillis)) }
  }

  def size(topic: String): Long = { val b = buf(topic); b.synchronized(b.length.toLong) }

  def fetch(topic: String, from: Long, until: Long): Array[Rec] = {
    val b = buf(topic)
    b.synchronized { b.slice(from.toInt, until.toInt).toArray }
  }

  /** Append a whole epoch's rows unless this (topic, epoch) already
    * committed — the sink's replay-dedup point. Returns true if applied. */
  def commitEpoch(topic: String, epochId: Long, rows: Seq[Rec]): Boolean = {
    val seen = committedEpochs.computeIfAbsent(topic,
      _ => ConcurrentHashMap.newKeySet[Long]())
    if (!seen.add(epochId)) false
    else { rows.foreach { case (k, v, t) => append(topic, k, v, t) }; true }
  }

  def reset(): Unit = {
    topics.clear(); committedEpochs.clear()
    crashAfterCommitTopic = None; crashMidWriteTopic = None
  }

  // ---- fault injection (KafkaEndToEndSpec epoch-path soaks) -----------
  // One-shot switches, disarmed at first trigger: the injected fault
  // models a single crash, after which the restarted query must converge.
  @volatile private var crashAfterCommitTopic: Option[String] = None
  @volatile private var crashMidWriteTopic: Option[String] = None

  /** Arm: the next sink epoch COMMIT for `topic` appends to the broker,
    * then throws — the crash window between the external commit and
    * Spark's own commit log, the exact case epoch dedup exists for. */
  def injectCrashAfterCommit(topic: String): Unit =
    crashAfterCommitTopic = Some(topic)

  /** Arm: the next task writing to `topic` throws on its first row,
    * BEFORE any commit — a mid-batch task death; nothing may leak. */
  def injectCrashMidWrite(topic: String): Unit =
    crashMidWriteTopic = Some(topic)

  private[testkit] def shouldCrashAfterCommit(topic: String): Boolean =
    synchronized {
      if (crashAfterCommitTopic.contains(topic)) {
        crashAfterCommitTopic = None; true
      } else false
    }

  private[testkit] def shouldCrashMidWrite(topic: String): Boolean =
    synchronized {
      if (crashMidWriteTopic.contains(topic)) {
        crashMidWriteTopic = None; true
      } else false
    }
}

/** TEST-ONLY DataSource V2 provider registered under short name `kafka`
  * (VERDICT r9 item 1). The production container has no
  * spark-sql-kafka jar, so this shim — registered via
  * META-INF/services on the TEST classpath only — lets
  * `KafkaIO.eventSource` / `KafkaIO.sink` execute their real
  * `readStream.format("kafka").load()` → pipeline →
  * `writeStream.format("kafka").start()` paths end-to-end against
  * [[FakeBroker]], leaving only the wire protocol environmental.
  *
  * It accepts EXACTLY the option contract `KafkaIO.sourceOptions` /
  * `sinkOptions` bind (and fails fast on anything missing), and
  * presents the same 7-column record schema the real connector does,
  * so a green run here means the builders' options and schemas are
  * what a real deployment would consume. */
class FakeKafkaProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kafka"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FakeKafkaProvider.recordSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new FakeKafkaTable(new CaseInsensitiveStringMap(properties))
}

object FakeKafkaProvider {
  /** Mirror of the real connector's record schema (key/value bytes plus
    * provenance columns) — what `KafkaIO.decodeEvents` consumes. */
  val recordSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))
}

class FakeKafkaTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = "fake-kafka"
  override def schema(): StructType = FakeKafkaProvider.recordSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE).asJava

  override def newScanBuilder(readOptions: CaseInsensitiveStringMap): ScanBuilder = {
    require(readOptions.containsKey("kafka.bootstrap.servers"),
      "contract: reader must bind kafka.bootstrap.servers")
    require(readOptions.containsKey("subscribe"),
      "contract: reader must bind subscribe")
    val topic = readOptions.get("subscribe")
    val starting = Option(readOptions.get("startingOffsets")).getOrElse("latest")
    () => new FakeKafkaScan(topic, starting)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val opts = info.options()
    require(opts.containsKey("kafka.bootstrap.servers"),
      "contract: writer must bind kafka.bootstrap.servers")
    require(opts.containsKey("topic"), "contract: writer must bind topic")
    val topic = opts.get("topic")
    val schema = info.schema()
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite =
          new FakeKafkaStreamingWrite(topic, schema)
      }
    }
  }
}

case class FakeKafkaOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class FakeKafkaScan(topic: String, startingOffsets: String) extends Scan {
  override def readSchema(): StructType = FakeKafkaProvider.recordSchema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FakeKafkaMicroBatchStream(topic, startingOffsets)
}

class FakeKafkaMicroBatchStream(topic: String, startingOffsets: String)
    extends MicroBatchStream {
  override def initialOffset(): Offset = startingOffsets match {
    case "earliest" => FakeKafkaOffset(0L)
    case _ => FakeKafkaOffset(FakeBroker.size(topic)) // "latest": tail-start
  }
  override def latestOffset(): Offset = FakeKafkaOffset(FakeBroker.size(topic))
  override def deserializeOffset(json: String): Offset =
    FakeKafkaOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FakeKafkaOffset].n
    val e = end.asInstanceOf[FakeKafkaOffset].n
    if (e <= s) Array.empty
    else Array(FakeKafkaInputPartition(topic, s, FakeBroker.fetch(topic, s, e)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[FakeKafkaInputPartition]
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < p.records.length }
          override def get(): InternalRow = {
            val (k, v, ts) = p.records(i)
            new GenericInternalRow(Array[Any](
              k, v, UTF8String.fromString(p.topic), 0,
              p.baseOffset + i, ts * 1000L /* millis → micros */, 0))
          }
          override def close(): Unit = ()
        }
      }
    }
}

case class FakeKafkaInputPartition(topic: String, baseOffset: Long,
    records: Array[FakeBroker.Rec]) extends InputPartition

/** Rows collected per task, shipped to the driver in the commit message,
  * appended to the broker exactly once per epoch. */
case class FakeKafkaCommit(rows: Seq[(Array[Byte], Array[Byte])])
    extends WriterCommitMessage

object FakeKafkaStreamingWrite {
  private[testkit] def bytesAt(schema: StructType, row: InternalRow,
      idx: Int): Array[Byte] =
    if (idx < 0 || row.isNullAt(idx)) null
    else schema.fields(idx).dataType match {
      case BinaryType => row.getBinary(idx)
      case StringType => row.getUTF8String(idx).getBytes
      case dt => sys.error(s"contract: key/value must be string or binary, got $dt")
    }
}

class FakeKafkaStreamingWrite(topic: String, schema: StructType)
    extends StreamingWrite {
  private val keyIdx = schema.fieldNames.indexOf("key")
  private val valueIdx = schema.fieldNames.indexOf("value")
  require(valueIdx >= 0, "contract: sink input must carry a value column")

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val (ki, vi, sch, tp) = (keyIdx, valueIdx, schema, topic)
    (partitionId: Int, taskId: Long, epochId: Long) =>
      new DataWriter[InternalRow] {
        private val rows = ArrayBuffer.empty[(Array[Byte], Array[Byte])]
        override def write(row: InternalRow): Unit = {
          if (FakeBroker.shouldCrashMidWrite(tp))
            sys.error(s"injected: task death mid-write to $tp")
          rows += ((FakeKafkaStreamingWrite.bytesAt(sch, row, ki),
            FakeKafkaStreamingWrite.bytesAt(sch, row, vi)))
        }
        override def commit(): WriterCommitMessage = FakeKafkaCommit(rows.toSeq)
        override def abort(): Unit = rows.clear()
        override def close(): Unit = ()
      }
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val now = System.currentTimeMillis()
    val rows = messages.toSeq.flatMap {
      case FakeKafkaCommit(rs) => rs
      case _ => Seq.empty
    }.map { case (k, v) => (k, v, now) }
    FakeBroker.commitEpoch(topic, epochId, rows)
    // crash AFTER the external system committed, BEFORE Spark can mark
    // the epoch done in its commit log — the replay window
    if (FakeBroker.shouldCrashAfterCommit(topic))
      sys.error(s"injected: crash after broker commit of $topic epoch $epochId")
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}
