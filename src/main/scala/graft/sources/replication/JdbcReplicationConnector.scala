package graft.sources.replication

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.sql.SQLException

/**
 * The minimal pgjdbc surface the live binding consumes — a thin shim over
 * the PostgreSQL JDBC replication API so the engine COMPILES AND TESTS
 * without the driver jar on the classpath (this sandbox ships none):
 *
 *  - [[PgReplicationShim.createLogicalSlot]] == `pgReplicationConnection
 *    .createReplicationSlot().logical().withOutputPlugin(p)
 *    .withSlotName(n).make()` (PostgresConnector.java:84-90), raising
 *    SQLSTATE 42710 when the slot already exists;
 *  - [[PgReplicationShim.startStream]] == `replicationStream().logical()
 *    .withStatusInterval(...).withSlotOptions(...).withSlotName(n).start()`
 *    (PostgresConnector.java:217-229), raising SQLSTATE 55006 while
 *    another PID consumes the slot;
 *  - the stream mirrors `PGReplicationStream`: readPending /
 *    getLastReceiveLSN / setAppliedLSN / setFlushedLSN /
 *    forceUpdateStatus (PostgresConnector.java:106-131).
 *
 * [[PgjdbcShim]] is the production implementation (reflection-bound to
 * `org.postgresql`); the test suite drives [[JdbcReplicationConnector]]
 * through a fault-injecting fake of this trait with the full contract
 * suite (JdbcReplicationSpec).
 */
trait PgReplicationShim extends AutoCloseable {
  /** CREATE_REPLICATION_SLOT <name> LOGICAL <plugin>. 42710 = exists. */
  def createLogicalSlot(slotName: String, outputPlugin: String): Unit
  /** START_REPLICATION at the slot's confirmed position. 55006 = busy. */
  def startStream(slotName: String, slotOptions: Map[String, String],
                  statusIntervalMs: Long): PgReplicationStreamShim
}

/** Mirror of the `PGReplicationStream` methods the reference uses. */
trait PgReplicationStreamShim extends AutoCloseable {
  /** Non-blocking read; null when caught up (readPending()). */
  def readPending(): ByteBuffer
  /** Last position received on THIS stream — chunk positions plus server
    * keepalives past fully-sent WAL; never ahead of undelivered data. */
  def getLastReceiveLSN(): Long
  def setAppliedLSN(lsn: Long): Unit
  def setFlushedLSN(lsn: Long): Unit
  /** Send the standby status update NOW (pgjdbc otherwise piggybacks it on
    * a later read — an ack the server never saw is no ack). */
  def forceUpdateStatus(): Unit
}

object JdbcReplicationConnector {
  /** SQLSTATEs the reference pins (PostgresConnector.java:47-48,
    * SlotReaderKinesisWriter.java:56). */
  val AlreadyExistsSqlState = "42710"
  val SlotBusySqlState = "55006"
  val RecoveryModeSqlState = "57P03"
}

/**
 * The live JDBC binding behind the [[ReplicationConnector]] seam: maps the
 * pgjdbc replication API onto the engine contract and the reference's
 * SQLSTATE taxonomy — 55006 -> [[SlotBusyException]] (patient retry,
 * blue/green overlap), 57P03 -> [[RecoveryModeException]] (transient),
 * 42710 -> idempotent slot creation.
 *
 * `currentLsn()` is the STREAM's last-received position
 * (getLastReceiveLSN) — deliberately NOT the reference's out-of-band
 * `select pg_current_wal_lsn()` probe (PostgresConnector.java:110-122),
 * which can exceed commits not yet streamed; see the trait contract.
 * `ack` sets applied+flushed AND forces the status update out, so a
 * publish-then-ack sequence leaves the durable cursor on the server the
 * moment ack returns (the reference only forces on close,
 * PostgresConnector.java:138-141 — its in-flight acks ride later reads).
 */
final class JdbcReplicationConnector(
    conn: ConnectionConfig,
    slot: SlotConfig,
    shimFactory: () => PgReplicationShim) extends ReplicationConnector {
  import JdbcReplicationConnector._

  conn.validate()
  slot.validate()

  private var shimOpt: Option[PgReplicationShim] = None
  private var stream: PgReplicationStreamShim = _

  private def shim: PgReplicationShim = {
    if (shimOpt.isEmpty) shimOpt = Some(shimFactory())
    shimOpt.get
  }

  /** Translate the wire taxonomy into the engine taxonomy. */
  private def mapped[A](body: => A): A =
    try body
    catch {
      case e: SQLException if e.getSQLState == SlotBusySqlState =>
        throw new SlotBusyException(e.getMessage)
      case e: SQLException if e.getSQLState == RecoveryModeSqlState =>
        throw new RecoveryModeException(e.getMessage)
    }

  override def createSlotIfAbsent(): Boolean =
    try { mapped(shim.createLogicalSlot(slot.slotName, slot.outputPlugin)); true }
    catch {
      case e: SQLException if e.getSQLState == AlreadyExistsSqlState => false
    }

  override def openStream(): Unit = mapped {
    // release a previous handle first — a broken stream still HOLDS the
    // slot until closed (the server would reject the reopen as slot-busy)
    if (stream != null) {
      try stream.close() catch { case _: Exception => () }
      stream = null
    }
    // a (re)opened stream redelivers from confirmed-flush at transaction
    // START — leftover transcoder state from a partially-consumed txn
    // would make the redelivered Begin a framing violation (a healthy
    // reconnect misclassified as a permanent DataError)
    pgoutputTranscoder.foreach(_.reset())
    wal2jsonV2Transcoder.foreach(_.reset())
    stream = shim.startStream(slot.slotName, slot.slotOptions,
      slot.statusIntervalMs)
  }

  private def requireOpen(): Unit =
    require(stream != null, "stream not open")

  /** pgoutput transcoder state (relation metadata, open transaction) —
    * the output plugin manifests HERE, at the sequential wire boundary;
    * everything downstream consumes plugin-agnostic wal2json-parity
    * lines (the engine analog of the reference's getSlotMessage
    * extension point, README.md:101-104). */
  private val pgoutputTranscoder: Option[graft.decode.PgoutputTranscoder] =
    if (slot.outputPlugin == "pgoutput")
      Some(new graft.decode.PgoutputTranscoder(
        truncateSkippable = slot.truncateSkippable))
    else None

  /** wal2json format-version 2: per-ACTION lines folded back to one
    * v1-parity line per transaction at the same boundary. */
  private val wal2jsonV2Transcoder: Option[graft.decode.Wal2JsonV2Transcoder] =
    if (slot.outputPlugin == "wal2json" && slot.formatVersion >= 2)
      Some(new graft.decode.Wal2JsonV2Transcoder(slot.truncateSkippable))
    else None

  override def readPending(): Option[WalChunk] = mapped {
    requireOpen()
    (pgoutputTranscoder, wal2jsonV2Transcoder) match {
      case (None, None) =>
        Option(stream.readPending()).map { buf =>
          val bytes = new Array[Byte](buf.remaining())
          buf.get(bytes)
          // getLastReceiveLSN after a successful read is the position of
          // the message just read (pgjdbc advances it on receipt)
          val lsn = stream.getLastReceiveLSN()
          // REAL wal2json carries no top-level "lsn" (the position is
          // protocol-side); the engine's envelope requires it in-band —
          // splice it in unless the payload already has one (synthetic
          // endpoint / transcoder lines do). Without this, every live
          // wal2json line is malformed downstream.
          WalChunk(lsn, WalEnvelope.ensureLsn(
            new String(bytes, StandardCharsets.UTF_8), lsn))
        }
      case (Some(transcoder), _) =>
        // one WalChunk per committed TRANSACTION: pump binary messages
        // through the transcoder until a Commit completes a line (matching
        // wal2json's one-chunk-per-txn default) or the stream is caught up
        // mid-transaction (state is retained; the next call resumes)
        pump(bytes => transcoder.feed(bytes))
      case (_, Some(transcoder)) =>
        // wal2json format-version 2: the same pump over per-ACTION text
        // lines; C completes the v1-parity transaction line, whose lsn is
        // the stream position (real v2 carries no positions in-band)
        pump(bytes =>
          transcoder.feed(new String(bytes, StandardCharsets.UTF_8)))
    }
  }

  /** Pump wire chunks through a per-stream folder until a transaction
    * completes a line or the stream is caught up mid-transaction (state
    * is retained; the next call resumes). The completed line's position
    * is spliced in-band — transcoder output carries none when the wire
    * format does not (lesson 25's splice rule, uniform across plugins). */
  private def pump(fold: Array[Byte] => Option[String]): Option[WalChunk] = {
    var out: Option[WalChunk] = None
    var buf = stream.readPending()
    while (out.isEmpty && buf != null) {
      val bytes = new Array[Byte](buf.remaining())
      buf.get(bytes)
      fold(bytes) match {
        case Some(line) =>
          val lsn = stream.getLastReceiveLSN()
          out = Some(WalChunk(lsn, WalEnvelope.ensureLsn(line, lsn)))
        case None =>
          buf = stream.readPending()
      }
    }
    out
  }

  override def currentLsn(): Long = {
    requireOpen()
    stream.getLastReceiveLSN()
  }

  override def ack(lsn: Long): Unit = mapped {
    requireOpen()
    stream.setAppliedLSN(lsn)
    stream.setFlushedLSN(lsn)
    stream.forceUpdateStatus()
  }

  override def close(): Unit = {
    // release any spilled streamed-transaction state (protocol v2); the
    // slot redelivers unacked streams from the start on reconnect
    pgoutputTranscoder.foreach(t => try t.close() catch { case _: Exception => () })
    if (stream != null) {
      // flush any recorded-but-unsent positions, like the reference's
      // close (PostgresConnector.java:138-141); best-effort — the slot
      // redelivers anything unacked
      try stream.forceUpdateStatus() catch { case _: Exception => () }
      try stream.close() catch { case _: Exception => () }
      stream = null
    }
    shimOpt.foreach(s => try s.close() catch { case _: Exception => () })
    shimOpt = None
  }
}

/**
 * Production [[PgReplicationShim]] bound to pgjdbc REFLECTIVELY: the
 * driver jar is not on this build's classpath (and none exists in the
 * sandbox), so the binding compiles and fails fast with a clear message
 * when `org.postgresql` is absent at runtime, and binds to the real
 * `PGConnection.getReplicationAPI()` fluent builders when present —
 * the exact call surface of the reference (PostgresConnector.java:67-131,
 * 217-243). SQLExceptions thrown inside the driver propagate with their
 * SQLSTATE intact (InvocationTargetException unwrapped), so
 * [[JdbcReplicationConnector]]'s taxonomy mapping applies unchanged.
 */
final class PgjdbcShim(conn: ConnectionConfig) extends PgReplicationShim {
  import PgjdbcShim._

  private val connection: java.sql.Connection = {
    loadClass("org.postgresql.Driver") // registers with DriverManager
    val props = new java.util.Properties()
    conn.replicationProperties.foreach { case (k, v) => props.setProperty(k, v) }
    java.sql.DriverManager.getConnection(conn.url, props)
  }
  private val replicationApi: AnyRef = {
    val pgClass = loadClass("org.postgresql.PGConnection")
    val pg = connection.unwrap(pgClass).asInstanceOf[AnyRef]
    call(pg, "getReplicationAPI")
  }

  override def createLogicalSlot(slotName: String, outputPlugin: String): Unit = {
    val b0 = call(replicationApi, "createReplicationSlot")
    val b1 = call(b0, "logical")
    val b2 = call1(b1, "withOutputPlugin", classOf[String], outputPlugin)
    val b3 = call1(b2, "withSlotName", classOf[String], slotName)
    call(b3, "make")
    ()
  }

  override def startStream(slotName: String, slotOptions: Map[String, String],
                           statusIntervalMs: Long): PgReplicationStreamShim = {
    val b0 = call(replicationApi, "replicationStream")
    var b = call(b0, "logical")
    b = invoke(b, "withStatusInterval",
      Seq(classOf[Int], classOf[java.util.concurrent.TimeUnit]),
      Seq(Int.box(statusIntervalMs.toInt),
        java.util.concurrent.TimeUnit.MILLISECONDS))
    slotOptions.toSeq.sorted.foreach { case (k, v) =>
      b = invoke(b, "withSlotOption",
        Seq(classOf[String], classOf[String]), Seq(k, v))
    }
    b = call1(b, "withSlotName", classOf[String], slotName)
    val stream = unwrapping(call(b, "start"))
    new ReflectiveStream(stream)
  }

  override def close(): Unit = connection.close()

  /** PGReplicationStream via reflection; LSNs cross as longs through
    * LogSequenceNumber.valueOf/asLong. */
  private final class ReflectiveStream(stream: AnyRef)
      extends PgReplicationStreamShim {
    private val lsnClass = loadClass("org.postgresql.replication.LogSequenceNumber")
    private val valueOf = lsnClass.getMethod("valueOf", classOf[Long])
    private val lsnAsLong = lsnClass.getMethod("asLong")
    private def lsnOf(v: Long): AnyRef = valueOf.invoke(null, Long.box(v))
    private def asLong(lsn: AnyRef): Long =
      lsnAsLong.invoke(lsn).asInstanceOf[Long]

    // Method objects resolved ONCE: readPending/getLastReceiveLSN run once
    // per chunk on the ingest hot loop — a fresh getMethod scan plus a
    // setAccessible attempt per call is pure per-chunk overhead
    private val mReadPending = resolve(stream, "readPending")
    private val mLastReceive = resolve(stream, "getLastReceiveLSN")
    private val mSetApplied = resolve(stream, "setAppliedLSN", lsnClass)
    private val mSetFlushed = resolve(stream, "setFlushedLSN", lsnClass)
    private val mForceStatus = resolve(stream, "forceUpdateStatus")
    private val mClose = resolve(stream, "close")

    override def readPending(): ByteBuffer =
      unwrapping(mReadPending.invoke(stream)).asInstanceOf[ByteBuffer]
    override def getLastReceiveLSN(): Long =
      asLong(unwrapping(mLastReceive.invoke(stream)))
    override def setAppliedLSN(lsn: Long): Unit =
      { unwrapping(mSetApplied.invoke(stream, lsnOf(lsn))); () }
    override def setFlushedLSN(lsn: Long): Unit =
      { unwrapping(mSetFlushed.invoke(stream, lsnOf(lsn))); () }
    override def forceUpdateStatus(): Unit =
      { unwrapping(mForceStatus.invoke(stream)); () }
    override def close(): Unit = { unwrapping(mClose.invoke(stream)); () }
  }
}

object PgjdbcShim {
  private def loadClass(name: String): Class[_] =
    try Class.forName(name)
    catch {
      case e: ClassNotFoundException =>
        throw new IllegalStateException(
          s"$name not on the classpath — the live PostgreSQL binding needs " +
            "the pgjdbc driver jar (org.postgresql:postgresql); use the " +
            "synthetic connector for offline runs", e)
    }

  /** Reflective invoke, unwrapping InvocationTargetException so driver
    * SQLExceptions keep their SQLSTATE for the taxonomy mapping. The
    * method is resolved on the runtime class (fluent builders return
    * package-private implementations of public interfaces, so the Method
    * object may need accessibility forced — classpath code, no module
    * seal). */
  private def resolve(target: AnyRef, method: String,
                      types: Class[_]*): java.lang.reflect.Method = {
    val m = target.getClass.getMethod(method, types: _*)
    try m.setAccessible(true) catch { case _: Exception => () }
    m
  }

  private def invoke(target: AnyRef, method: String,
                     types: Seq[Class[_]], args: Seq[AnyRef]): AnyRef =
    unwrapping(resolve(target, method, types: _*).invoke(target, args: _*))

  private def call(target: AnyRef, method: String): AnyRef =
    invoke(target, method, Nil, Nil)

  private def call1(target: AnyRef, method: String, t: Class[_], arg: AnyRef): AnyRef =
    invoke(target, method, Seq(t), Seq(arg))

  private def unwrapping[A](body: => A): A =
    try body
    catch {
      case e: java.lang.reflect.InvocationTargetException if e.getCause != null =>
        throw e.getCause
    }
}
