package graft.streaming

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A real Structured Streaming source (DataSource v2 `MicroBatchStream`)
  * over the [[MiniBroker]] wire protocol — the S8 queue source with the
  * Kafka shape: `value binary` + `offset long`, so
  * [[StreamOps.kafkaQueueDecode]] applies unchanged and the whole
  * downstream path (decode → score → idempotent upsert) is IDENTICAL to
  * what a spark-sql-kafka deployment runs. This is the half of the
  * broker integration the engine owns; on a cluster only the format
  * string and options change.
  *
  *   spark.readStream.format(classOf[BrokerSourceProvider].getName)
  *     .option("host", h).option("port", p).option("topic", t)
  *     .option("maxPerTrigger", n).load()
  *
  * Offset model: the broker's log position (a single long — one ordered
  * log per topic, mirroring a 1-partition Kafka topic). `latestOffset`
  * asks the broker for its end and caps admission at `maxPerTrigger`
  * rows past the previous endpoint (ST6 backpressure, the
  * `maxOffsetsPerTrigger` analogue). Offsets are checkpointed by the
  * engine; a restart resumes from the committed endpoint, giving
  * at-least-once delivery into the idempotent store — the same contract
  * every queue-source flavour here honours. Each planned range becomes
  * ONE input partition whose reader fetches that range over its own
  * socket from the executor: reader connections are per-task and
  * short-lived, nothing driver-side is serialized into tasks but the
  * (host, port, topic, range) coordinates. */
class BrokerSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BrokerSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BrokerTable(new CaseInsensitiveStringMap(properties))
}

object BrokerSource {
  /** Kafka-shaped record schema ([[StreamOps.kafkaQueueDecode]] input). */
  val Schema: StructType = StructType(Seq(
    StructField("value", BinaryType, nullable = false),
    StructField("offset", LongType, nullable = false)))
}

private[streaming] final class BrokerTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    s"mini-broker://${options.get("host")}:${options.get("port")}/${options.get("topic")}"
  override def schema(): StructType = BrokerSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = BrokerSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new BrokerMicroBatchStream(
            options.get("host"),
            options.getInt("port", -1),
            options.get("topic"),
            options.getLong("maxPerTrigger", Long.MaxValue))
      }
    }
}

private[streaming] final case class BrokerOffset(position: Long) extends Offset {
  override def json(): String = position.toString
}

private[streaming] final class BrokerMicroBatchStream(
    host: String, port: Int, topic: String, maxPerTrigger: Long)
    extends MicroBatchStream {
  require(host != null && port > 0 && topic != null,
    "broker source requires host, port, and topic options")

  // one driver-side control connection for offset discovery (lazy: the
  // stream object is constructed during planning, possibly before the
  // broker is reachable from this process)
  @transient private lazy val control = new MiniBrokerClient(host, port)
  // the last batch endpoint this stream PLANNED (admission control base);
  // initialized from the checkpoint via initialOffset/deserializeOffset
  @volatile private var planned: Long = 0L

  override def initialOffset(): Offset = BrokerOffset(0L)
  override def deserializeOffset(json: String): Offset = {
    val o = BrokerOffset(json.toLong)
    planned = math.max(planned, o.position)
    o
  }
  override def latestOffset(): Offset = {
    val end = control.endOffset(topic)
    // SATURATING add: planned + Long.MaxValue (the uncapped default)
    // overflows negative, and that poisoned endpoint would be persisted
    // in the offset log by the trailing zero-data batch — the restart
    // would then re-plan from Long.MinValue and replay the whole log
    val cap =
      if (maxPerTrigger >= Long.MaxValue - planned) Long.MaxValue
      else planned + maxPerTrigger
    val capped = math.min(end, cap)
    planned = math.max(planned, capped)
    BrokerOffset(capped)
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit =
    try control.close() catch { case _: Exception => () }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BrokerOffset].position
    val e = end.asInstanceOf[BrokerOffset].position
    if (e <= s) Array.empty
    else Array(BrokerRangePartition(host, port, topic, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[BrokerRangePartition]
        new BrokerPartitionReader(p)
      }
    }
}

private[streaming] final case class BrokerRangePartition(
    host: String, port: Int, topic: String, from: Long, until: Long)
    extends InputPartition

/** Executor-side reader: fetches its assigned range over its own socket
  * in bounded chunks (a huge backlog batch must not buffer entirely in
  * one response). */
private[streaming] final class BrokerPartitionReader(p: BrokerRangePartition)
    extends PartitionReader[InternalRow] {
  private val client = new MiniBrokerClient(p.host, p.port)
  private val ChunkSize = 4096
  private var buffer: Iterator[(Long, Array[Byte])] = Iterator.empty
  private var position = p.from
  private var current: (Long, Array[Byte]) = _

  override def next(): Boolean = {
    if (!buffer.hasNext && position < p.until) {
      val want = math.min(ChunkSize.toLong, p.until - position).toInt
      val chunk = client.fetch(p.topic, position, want)
      // the range was planned against the broker's own end offset and the
      // log is append-only, so a short read means a protocol violation —
      // surface it rather than silently dropping planned rows
      if (chunk.size != want)
        throw new IllegalStateException(
          s"broker returned ${chunk.size}/$want messages for planned range " +
            s"[${position}, ${p.until}) of '${p.topic}'")
      position += want
      buffer = chunk.iterator
    }
    if (buffer.hasNext) { current = buffer.next(); true } else false
  }

  override def get(): InternalRow =
    InternalRow(current._2, current._1)

  override def close(): Unit = client.close()
}
