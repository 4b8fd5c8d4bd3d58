package graft.testkit

import java.util.Base64

import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** In-JVM DSv2 micro-batch source that impersonates the awslabs
  * spark-sql-kinesis connector's OUTPUT CONTRACT — the record schema
  * (`data` binary beside `streamName`/`partitionKey`/`sequenceNumber`/
  * `approximateArrivalTimestamp`) and the streaming-table plumbing
  * (TableProvider → MicroBatchStream) — without any AWS transport.
  * [[graft.streaming.KinesisLiveCdcSource]] resolves its connector by
  * NAME at runtime; handing it this class's fully-qualified name drives
  * `spark.readStream.format(...)` → adapter → envelope parse → merge
  * through the EXACT production glue, which is the end-to-end the r16
  * verdict asked for (the adapter alone was already parity-tested; the
  * `start()` path was not).
  *
  * Fixture transport: option `path` names a file of JSON lines, one per
  * Kinesis record — `{"data":"<base64>", "partitionKey":"…",
  * "sequenceNumber":"…", "arrivalMs":<long>}` — read DRIVER-side at
  * planning (fixtures are tiny) and served as one micro-batch per
  * `latestOffset` advance. Offsets are plain record counts, so restart
  * bookkeeping behaves like a real sequence-number cursor.
  */
class StubKinesisSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StubKinesisSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new StubKinesisTable(properties.get("path"))
}

object StubKinesisSource {
  /** The awslabs connector's record schema, column-for-column. */
  val schema: StructType = StructType(Seq(
    StructField("data", BinaryType),
    StructField("streamName", StringType),
    StructField("partitionKey", StringType),
    StructField("sequenceNumber", StringType),
    StructField("approximateArrivalTimestamp", TimestampType)))

  final case class Rec(data: Array[Byte], partitionKey: String,
      sequenceNumber: String, arrivalMs: Long)

  /** Render records to the stub's fixture-line format. */
  def fixtureLines(recs: Seq[Rec]): Seq[String] = recs.map { r =>
    val b64 = Base64.getEncoder.encodeToString(r.data)
    s"""{"data":"$b64","partitionKey":"${r.partitionKey}",""" +
      s""""sequenceNumber":"${r.sequenceNumber}","arrivalMs":${r.arrivalMs}}"""
  }

  private[testkit] def readFixture(path: String): IndexedSeq[Rec] = {
    if (path == null) return IndexedSeq.empty
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) return IndexedSeq.empty
    java.nio.file.Files.readAllLines(p).asScala.filter(_.nonEmpty).map { l =>
      // fixture-grade parse: fields are written by fixtureLines, so a
      // regex per field is exact (no JSON library needed test-side)
      def str(k: String) =
        s""""$k":"([^"]*)"""".r.findFirstMatchIn(l).map(_.group(1)).get
      def num(k: String) =
        s""""$k":(-?[0-9]+)""".r.findFirstMatchIn(l).map(_.group(1).toLong).get
      Rec(Base64.getDecoder.decode(str("data")), str("partitionKey"),
        str("sequenceNumber"), num("arrivalMs"))
    }.toIndexedSeq
  }
}

private final class StubKinesisTable(path: String)
    extends Table with SupportsRead {
  override def name(): String = s"stub-kinesis($path)"
  override def schema(): StructType = StubKinesisSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = StubKinesisSource.schema
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream = new StubKinesisStream(path)
      }
    }
}

private final case class StubOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private final case class StubPartition(recs: Seq[StubKinesisSource.Rec])
    extends InputPartition

private final class StubKinesisStream(path: String)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  // re-listed per latestOffset call until AvailableNow pins a bound —
  // the shape of a real shard-iterator poll
  @volatile private var bound: Option[Long] = None
  private def recs = StubKinesisSource.readFixture(path)

  override def prepareForTriggerAvailableNow(): Unit =
    bound = Some(recs.length.toLong)
  override def initialOffset(): Offset = StubOffset(0L)
  // SupportsTriggerAvailableNow rides SupportsAdmissionControl: the
  // engine calls the two-arg form; the no-arg form must not be reached
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: use latestOffset(start, limit)")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    StubOffset(bound.getOrElse(recs.length.toLong))
  override def reportLatestOffset(): Offset =
    StubOffset(recs.length.toLong)
  override def deserializeOffset(json: String): Offset =
    StubOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[StubOffset].n.toInt
    val e = end.asInstanceOf[StubOffset].n.toInt
    val slice = recs.slice(s, e)
    if (slice.isEmpty) Array.empty else Array(StubPartition(slice))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition)
          : PartitionReader[InternalRow] = {
        val rs = partition.asInstanceOf[StubPartition].recs
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rs.length }
          override def get(): InternalRow = {
            val r = rs(i)
            InternalRow(
              r.data,
              UTF8String.fromString("activity-stream"),
              UTF8String.fromString(r.partitionKey),
              UTF8String.fromString(r.sequenceNumber),
              r.arrivalMs * 1000L) // TimestampType = micros since epoch
          }
          override def close(): Unit = ()
        }
      }
    }
}
