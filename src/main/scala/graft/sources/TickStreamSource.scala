package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable.ArrayBuffer

/** S5 — custom DSv2 micro-batch streaming source for WSS tick frames.
  *
  * The reference's Bitfinex WSS client is a library thread filling a
  * per-channel in-memory queue that the consumer drains non-blocking
  * (main.py:375-398). Spark-first equivalent: the socket thread appends
  * raw positional frames to [[TickChannels]]; this DSv2 source exposes the
  * buffer as an unbounded table — offsets are buffer positions, each
  * micro-batch reads the newly-arrived slice (ST2's "empty queue -> no-op"
  * is an empty offset range). In production one [[InputPartition]] per
  * subscribed channel keeps per-pair ordering, mirroring the reference's
  * queue-per-channel isolation; the tests drive a single channel.
  *
  * The live WSS SOCKET client (the reference's btfxwss subscribe/ping
  * thread, main.py:375-398) is [[WsTickClient]] (round 16): a
  * java.net.http.WebSocket — already in the JDK, zero new jars — whose
  * onText callback parses positional ticker frames and calls
  * TickChannels.append; nothing downstream changes. In the sandbox it
  * is exercised over a real socket against an in-process RFC 6455
  * loopback server (StreamingSpec), including reconnect. The reference's
  * rotating file logger stays scoped out
  * (main.py:98-105): ops-plane process logging, superseded by log4j2
  * config on a Spark cluster, with the config surface (logs_max_size /
  * logs_rotated_files / logs_filename) still parsed and typed in
  * [[ConfigSource]] for parity.
  *
  * Usage: `spark.readStream.format("graft-ticks").option("channel", name)`.
  */
object TickChannels {
  /** (exchange, pair, frame, epochMicros) — the raw WSS positional frame
    * plus receive metadata, pre-projection (P2 runs downstream). */
  type Frame = (String, String, Array[Double], Long)
  private val channels = new java.util.concurrent.ConcurrentHashMap[String, ArrayBuffer[Frame]]()
  private def buf(name: String): ArrayBuffer[Frame] =
    channels.computeIfAbsent(name, _ => ArrayBuffer.empty)
  def append(name: String, f: Frame): Unit = buf(name).synchronized { buf(name) += f }
  def size(name: String): Long = buf(name).synchronized { buf(name).size.toLong }
  def slice(name: String, from: Long, until: Long): Seq[Frame] =
    buf(name).synchronized { buf(name).slice(from.toInt, until.toInt).toSeq }
  def clear(): Unit = channels.clear()

  val schema: StructType = StructType(Seq(
    StructField("exchange", StringType, nullable = false),
    StructField("pair", StringType, nullable = false),
    StructField("frame", ArrayType(DoubleType, containsNull = false)),
    StructField("ts", TimestampType, nullable = false)))
}

class TickStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-ticks"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TickChannels.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new TickTable(properties.getOrDefault("channel", "default"))
}

private final class TickTable(channel: String) extends Table with SupportsRead {
  override def name(): String = s"graft-ticks:$channel"
  override def schema(): StructType = TickChannels.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = TickChannels.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new TickMicroBatchStream(channel)
      }
    }
}

private final case class TickOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

private final case class TickRange(channel: String, from: Long, until: Long)
  extends InputPartition

private final class TickMicroBatchStream(channel: String) extends MicroBatchStream {
  override def initialOffset(): Offset = TickOffset(0L)
  override def latestOffset(): Offset = TickOffset(TickChannels.size(channel))
  override def deserializeOffset(json: String): Offset = TickOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    Array(TickRange(channel, start.asInstanceOf[TickOffset].pos,
      end.asInstanceOf[TickOffset].pos))
  override def createReaderFactory(): PartitionReaderFactory =
    TickReaderFactory
}

private object TickReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val TickRange(channel, from, until) = partition.asInstanceOf[TickRange]
    // local-mode: executors share the JVM with the buffer (like `memory`);
    // a production WSS source would hold the socket per partition instead.
    val rows = TickChannels.slice(channel, from, until).iterator
    new PartitionReader[InternalRow] {
      private var current: TickChannels.Frame = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = InternalRow.fromSeq(Seq(
        UTF8String.fromString(current._1),
        UTF8String.fromString(current._2),
        ArrayData.toArrayData(current._3),
        current._4))
      override def close(): Unit = ()
    }
  }
}
