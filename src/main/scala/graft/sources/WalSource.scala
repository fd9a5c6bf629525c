package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
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
 *    == `latestOffset()` = the greatest fully published segment NAME;
 *  - LSN ack / WAL release (SlotReaderCallback.java:70-85) == `commit(end)`
 *    with `retention=delete`: segments at or below the durably-logged offset
 *    are pruned, the analog of Postgres reclaiming acked WAL.
 *
 * Offsets are segment NAMES, never listing positions: segment retention or
 * repair can add/remove directory entries at any time, and a positional
 * offset would silently re-read or skip segments when indices shift. Name
 * offsets are immune — `planInputPartitions` selects exactly the segments in
 * (start.last, end.last]. Contract with the WAL writer: segments are
 * published (atomic rename) in monotonically increasing name order, so a
 * visible segment is complete and nothing below the consumed name will ever
 * be new data.
 *
 * I/O goes through the Hadoop FileSystem API, so `file:`, `hdfs:`, `s3a:`
 * etc. all work, and large segments are split into line-aligned byte ranges
 * (`splitBytes`, default 64 MiB) — one oversized segment no longer
 * serializes onto a single core.
 *
 * Usage: spark.readStream.format("graft-wal").load(dir) => one `value:
 * string` column per WAL line.
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

  val DefaultSplitBytes: Long = 64L * 1024 * 1024

  /** Complete (atomically renamed) segment names, in LSN (= name) order. */
  def listSegments(dir: String): Seq[String] =
    new HadoopWalProvider(dir).listSegments().map(_._1)
}

/**
 * The replication-connector SEAM — the engine analog of the reference's
 * PostgresConnector surface (`readPending()` / `getCurrentLSN()` /
 * `setFlushedLSN()`, PostgresConnector.java:106-127): a WAL provider
 * publishes complete, immutable, monotonically-named segments; the engine
 * tails, reads, and acknowledges them. [[WalMicroBatchStream]] is written
 * against this trait only, so a live-database provider (e.g. one staging a
 * pgoutput/wal2json stream into segments) plugs in without touching the
 * Spark source machinery. The bundled [[HadoopWalProvider]] serves any
 * Hadoop filesystem (file:, hdfs:, s3a:, ...).
 */
trait WalProvider {
  /** O2 readPending: complete segments as (name, byteSize), name order. */
  def listSegments(): Seq[(String, Long)]
  /** Executor-readable URI of one segment (the data plane). */
  def segmentPath(name: String): String
  /** LSN ack (O10, SlotReaderCallback.java:70-85): the consumer's position
    * is durably recorded at or beyond `upToInclusive`; the provider may
    * reclaim everything at or below it. */
  def release(upToInclusive: String): Unit
}

class HadoopWalProvider(dir: String) extends WalProvider {
  private def fsAndPath(): (FileSystem, HPath) = {
    val p = new HPath(dir)
    (p.getFileSystem(graft.util.HadoopConfs.active()), p)
  }

  private def isSegment(n: String): Boolean =
    n.startsWith("wal-") && n.endsWith(".jsonl")

  override def listSegments(): Seq[(String, Long)] = {
    val (fs, p) = fsAndPath()
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && isSegment(s.getPath.getName))
      .map(s => (s.getPath.getName, s.getLen))
      .sortBy(_._1)
  }

  override def segmentPath(name: String): String = s"$dir/$name"

  override def release(upToInclusive: String): Unit = {
    val (fs, p) = fsAndPath()
    listSegments().map(_._1)
      .filter(_ <= upToInclusive)
      .foreach(n => fs.delete(new HPath(p, n), false))
  }
}

class WalTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft-wal($dir)"
  override def schema(): StructType = WalSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxPerTrigger = Option(options.get("maxSegmentsPerTrigger")).map(_.toInt)
    val maxBytes = Option(options.get("maxBytesPerTrigger")).map(_.toLong)
    val splitBytes = Option(options.get("splitBytes")).map(_.toLong)
      .getOrElse(WalSource.DefaultSplitBytes)
    val retention = Option(options.get("retention")).contains("delete")
    () => new WalScan(dir, maxPerTrigger, maxBytes, splitBytes, retention)
  }
}

class WalScan(dir: String, maxPerTrigger: Option[Int], maxBytes: Option[Long],
              splitBytes: Long, retention: Boolean) extends Scan {
  override def readSchema(): StructType = WalSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new WalMicroBatchStream(dir, maxPerTrigger, splitBytes, retention,
      maxBytesPerTrigger = maxBytes)
}

/** Offset = NAME of the last fully consumed segment ("" before any). Names
  * are zero-padded (`wal-%09d.jsonl`) so lexicographic order = LSN order. */
case class WalOffset(last: String) extends Offset {
  override def json(): String = {
    // \u-escape control characters too: Spark's offset log is line-oriented,
    // so a provider segment name containing a raw newline would split the
    // checkpoint entry and make it unparseable on restart.
    val esc = last.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < 0x20 => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    s"""{"last":"$esc"}"""
  }
}

class WalMicroBatchStream(dir: String, maxPerTrigger: Option[Int] = None,
                          splitBytes: Long = WalSource.DefaultSplitBytes,
                          retention: Boolean = false,
                          provider: WalProvider = null,
                          // byte-based admission control: file-count limits
                          // don't bound batch memory when segment sizes vary
                          maxBytesPerTrigger: Option[Long] = None)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxFiles}

  private val wal: WalProvider =
    Option(provider).getOrElse(new HadoopWalProvider(dir))

  private def lastName(): String =
    wal.listSegments().lastOption.map(_._1).getOrElse("")

  // Trigger.AvailableNow: pin the end of "available" at query start so the
  // run terminates even while the WAL keeps growing (and so admission
  // control below still splits the run into rate-limited micro-batches).
  @volatile private var availableNowTarget: Option[String] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(lastName())

  override def initialOffset(): Offset = WalOffset("")

  override def latestOffset(): Offset = WalOffset(lastName())

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(m => ReadLimit.maxFiles(m)).getOrElse(ReadLimit.allAvailable())

  /** Rate-limited tail: at most maxFiles new segments AND (if configured)
    * at most maxBytesPerTrigger cumulative bytes per micro-batch — always
    * admitting at least one segment so the stream can't stall on a single
    * oversized segment (its byte-range splits keep it parallel anyway). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[WalOffset].last
    // `start` is the end of the last fully COMMITTED batch (a new trigger
    // begins only after the previous batch reached the commit log; a crash
    // replay re-plans from the offset log without calling this) — so
    // segments at or below it are releasable now. Spark only invokes
    // commit(end) lazily at the next batch construction, which would leave
    // the final batch's segments unpruned until the next run.
    prune(s)
    val target = availableNowTarget.getOrElse(lastName())
    val pending = wal.listSegments()
      .filter { case (n, _) => n > s && n <= target }
    val byFiles = limit match {
      case mf: ReadMaxFiles => math.min(pending.size, mf.maxFiles())
      case _ => pending.size
    }
    val takeN = maxBytesPerTrigger match {
      case None => byFiles
      case Some(budget) =>
        var cum = 0L
        var k = 0
        while (k < byFiles && (k == 0 || cum + pending(k)._2 <= budget)) {
          cum += pending(k)._2
          k += 1
        }
        k
    }
    if (takeN == 0) WalOffset(s) else WalOffset(pending(takeN - 1)._1)
  }

  override def deserializeOffset(json: String): Offset = {
    // Hand-parse the escaped string value so names round-trip exactly as
    // WalOffset.json() wrote them: a provider's segment names may legally
    // contain '"' or '\' (only HadoopWalProvider's wal-*.jsonl convention
    // forbids them), and a regex on [^"]* would truncate at the escape.
    val marker = "\"last\""
    val at = json.indexOf(marker)
    if (at >= 0) {
      val open = json.indexOf('"', json.indexOf(':', at + marker.length) + 1)
      val sb = new StringBuilder
      var i = open + 1
      var closed = false
      while (!closed && i < json.length) {
        json.charAt(i) match {
          case '\\' if i + 1 < json.length =>
            json.charAt(i + 1) match {
              case 'u' if i + 5 < json.length =>
                sb.append(Integer.parseInt(json.substring(i + 2, i + 6), 16)
                  .toChar)
                i += 6
              case e => sb.append(e); i += 2
            }
          case '"' => closed = true
          case c => sb.append(c); i += 1
        }
      }
      WalOffset(sb.toString)
    } else {
      // migrate a pre-name-offset checkpoint: {"segments":N} meant "the
      // first N segments of the listing" — valid only while nothing was
      // ever deleted, which held under the old source (no retention).
      val legacy = """"segments"\s*:\s*(\d+)""".r
      legacy.findFirstMatchIn(json) match {
        case Some(g) =>
          val n = g.group(1).toInt
          val segs = wal.listSegments().map(_._1)
          if (n == 0) WalOffset("")
          else if (n <= segs.size) {
            // Positions are only trustworthy if the listing is still the
            // original prefix: if retention/repair deleted any consumed
            // segment before this first restart on name offsets, index
            // n-1 would silently resolve to the WRONG segment (re-read or
            // skip). Segment names embed their ordinal, so verify it.
            val resolved = segs(n - 1)
            val ordinal = "\\d+".r.findFirstIn(resolved).map(_.toLong)
            if (!ordinal.contains((n - 1).toLong))
              throw new IllegalArgumentException(
                s"cannot migrate legacy positional WAL offset $n: segment " +
                  s"listing in $dir no longer starts at the first-ever " +
                  s"segment (position ${n - 1} resolves to $resolved) — " +
                  "a consumed segment was deleted; restart from a fresh " +
                  "checkpoint or set the offset to the segment name")
            WalOffset(resolved)
          }
          else throw new IllegalArgumentException(
            s"legacy WAL offset $n exceeds ${segs.size} segments in $dir")
        case None => throw new IllegalArgumentException(s"bad WAL offset: $json")
      }
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[WalOffset].last
    val e = end.asInstanceOf[WalOffset].last
    wal.listSegments()
      .filter { case (n, _) => n > s && n <= e }
      .flatMap { case (n, size) =>
        // line-aligned byte-range splits: a split owns every line that
        // STARTS inside (start, end] — Hadoop LineRecordReader semantics:
        // the reader skips a leading partial-or-whole first line when
        // start > 0, reads through the line straddling its end, and claims
        // a line beginning exactly at `end` (which the next split skips)
        val nSplits = math.max(1L, (size + splitBytes - 1) / splitBytes)
        (0L until nSplits).map { k =>
          val off = k * splitBytes
          WalInputPartition(wal.segmentPath(n), off, math.min(splitBytes, size - off))
            .asInstanceOf[InputPartition]
        }
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // Capture the SESSION Hadoop configuration on the driver and ship it to
    // executors: a default `new Configuration()` built executor-side would
    // silently drop every `spark.hadoop.*` session setting (s3a credentials,
    // endpoints), leaving only classpath core-site.xml filesystems working.
    new WalReaderFactory(
      new org.apache.spark.util.SerializableConfiguration(graft.util.HadoopConfs.active()))
  }

  /** WAL release: once the engine durably logs `end` (exactly-once offset
    * log + idempotent sink), segments at or below it are never needed again.
    * With `retention=delete` they are pruned — the reference's LSN-ack WAL
    * reclamation (SlotReaderCallback.java:70-85). Name offsets make this
    * safe: deletion can never shift what the remaining names mean. */
  override def commit(end: Offset): Unit =
    prune(end.asInstanceOf[WalOffset].last)

  private def prune(upTo: String): Unit =
    if (retention && upTo.nonEmpty) wal.release(upTo)

  override def stop(): Unit = ()
}

/** One line-aligned byte range of one segment. */
case class WalInputPartition(path: String, start: Long, length: Long)
    extends InputPartition

class WalReaderFactory(val conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WalInputPartition]
    new WalPartitionReader(p.path, p.start, p.length, conf.value)
  }
}

/**
 * Reads the lines of one byte range via the Hadoop FileSystem API
 * (filesystem-agnostic, executor-side, with the driver's session Hadoop
 * configuration shipped in through [[WalReaderFactory]]). Range semantics
 * are Hadoop LineRecordReader's: if start > 0 the leading partial line
 * belongs to the previous split and is skipped; a line may BEGIN at any
 * pos <= end (including exactly at `end` — the next split unconditionally
 * skips its first partial-or-whole line, so the line starting at a split
 * boundary must be claimed by the split ENDING there, or it is lost); the
 * line straddling the range end is read to completion. Lines are emitted as
 * raw UTF-8 bytes (no UTF-16 round trip — the downstream native parser
 * consumes UTF8String directly).
 */
class WalPartitionReader(path: String, start: Long, length: Long,
                         hadoopConf: Configuration)
    extends PartitionReader[InternalRow] {
  private val end = start + length
  private val hp = new HPath(path)
  private val fs = hp.getFileSystem(hadoopConf)
  private val stream = fs.open(hp)
  if (start > 0) stream.seek(start)
  private val in = new java.io.BufferedInputStream(stream, 1 << 16)
  private var pos: Long = start
  private val buf = new java.io.ByteArrayOutputStream(4096)
  private var line: UTF8String = _

  if (start > 0) skipToLineStart()

  /** The partial line at the head of a mid-file split belongs to the
    * previous split — consume through its newline. */
  private def skipToLineStart(): Unit = {
    var b = in.read()
    while (b != -1) {
      pos += 1
      if (b == '\n') return
      b = in.read()
    }
  }

  override def next(): Boolean = {
    // pos > end, NOT >=: a line starting exactly at `end` belongs to THIS
    // split (the next split, whose skipToLineStart discards everything up to
    // and including its first newline, will not read it). With >= the line
    // at a boundary was read by NEITHER split — silent data loss whenever a
    // line happened to end exactly at a splitBytes multiple.
    if (pos > end) return false
    buf.reset()
    var b = in.read()
    if (b == -1) return false
    while (b != -1 && b != '\n') {
      buf.write(b)
      pos += 1
      b = in.read()
    }
    if (b == '\n') pos += 1
    // strip a trailing \r (CRLF input)
    val arr = buf.toByteArray
    val len = if (arr.nonEmpty && arr(arr.length - 1) == '\r') arr.length - 1 else arr.length
    line = UTF8String.fromBytes(arr, 0, len)
    true
  }

  override def get(): InternalRow = InternalRow(line)
  override def close(): Unit = in.close()
}
