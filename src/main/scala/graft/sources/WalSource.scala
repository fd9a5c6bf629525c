package graft.sources

import java.nio.file.{Files, Paths}
import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * DataSource V2 streaming source that tails a directory of append-only WAL
 * segments (JSONL, lexicographically ordered = LSN ordered) — the engine's
 * first-class replacement for the reference's replication-slot scan:
 *
 *  - O1 slot creation / idempotent init (PostgresConnector.java:67-100)
 *    == `initialOffset` + tolerant directory bootstrap;
 *  - O2 WAL tail scan / readPending (PostgresConnector.java:106-108)
 *    == `planInputPartitions(start, end)` over newly published segments;
 *  - O3 current-LSN probe (PostgresConnector.java:110-122)
 *    == `latestOffset()` = the count of fully published segments.
 *
 * Offsets are segment counts (segments are atomically published via rename,
 * so a visible segment is complete); the LSN high-watermark lives in the
 * sink (MergeEngine), the offset log only needs source progress — the same
 * two-sided split the reference has between the slot's restart LSN and the
 * consumer's position.
 *
 * Usage: spark.readStream.format("graft-wal").load(dir) => one `value:
 * string` column per WAL line, one input partition per segment.
 */
class WalSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-wal"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WalSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val dir = Option(properties.get("path"))
      .getOrElse(throw new IllegalArgumentException("graft-wal requires .load(path)"))
    new WalTable(dir)
  }
}

object WalSource {
  val schema: StructType = StructType(Seq(StructField("value", StringType)))

  /** Complete (atomically renamed) segments, in LSN order. */
  def listSegments(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) return Nil
    Files.list(p).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("wal-") && n.endsWith(".jsonl"))
      .toSeq.sorted
  }
}

class WalTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft-wal($dir)"
  override def schema(): StructType = WalSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxPerTrigger = Option(options.get("maxSegmentsPerTrigger")).map(_.toInt)
    () => new WalScan(dir, maxPerTrigger)
  }
}

class WalScan(dir: String, maxPerTrigger: Option[Int]) extends Scan {
  override def readSchema(): StructType = WalSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new WalMicroBatchStream(dir, maxPerTrigger)
}

/** Offset = number of fully consumed segments. */
case class WalOffset(segments: Long) extends Offset {
  override def json(): String = s"""{"segments":$segments}"""
}

class WalMicroBatchStream(dir: String, maxPerTrigger: Option[Int] = None)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxFiles}

  // Trigger.AvailableNow: pin the end of "available" at query start so the
  // run terminates even while the WAL keeps growing (and so admission
  // control below still splits the run into rate-limited micro-batches).
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(WalSource.listSegments(dir).size.toLong)

  override def initialOffset(): Offset = WalOffset(0L)

  override def latestOffset(): Offset =
    WalOffset(WalSource.listSegments(dir).size.toLong)

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(m => ReadLimit.maxFiles(m)).getOrElse(ReadLimit.allAvailable())

  /** Rate-limited tail: at most maxFiles new segments per micro-batch. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[WalOffset].segments
    val all = availableNowTarget
      .getOrElse(WalSource.listSegments(dir).size.toLong)
    limit match {
      case mf: ReadMaxFiles => WalOffset(math.min(all, s + mf.maxFiles()))
      case _ => WalOffset(all)
    }
  }

  override def deserializeOffset(json: String): Offset = {
    val m = """"segments"\s*:\s*(\d+)""".r
    m.findFirstMatchIn(json) match {
      case Some(g) => WalOffset(g.group(1).toLong)
      case None => throw new IllegalArgumentException(s"bad WAL offset: $json")
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[WalOffset].segments
    val e = end.asInstanceOf[WalOffset].segments
    val segs = WalSource.listSegments(dir)
    (s until e).map(i => WalInputPartition(s"$dir/${segs(i.toInt)}")
      .asInstanceOf[InputPartition]).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WalReaderFactory

  override def commit(end: Offset): Unit = () // segments are retained
  override def stop(): Unit = ()
}

case class WalInputPartition(path: String) extends InputPartition

class WalReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[WalInputPartition].path
    new PartitionReader[InternalRow] {
      private val reader = Files.newBufferedReader(Paths.get(path))
      private var line: String = _
      override def next(): Boolean = { line = reader.readLine(); line != null }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(line))
      override def close(): Unit = reader.close()
    }
  }
}
