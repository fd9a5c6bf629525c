package graft

import java.nio.ByteBuffer
import java.sql.SQLException
import org.apache.spark.sql.functions._
import graft.cli.Main
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.sources.WalSource
import graft.sources.replication._
import graft.streaming.{CdcPipeline, TableTarget}

/**
 * In-memory PostgreSQL-shaped endpoint implementing the pgjdbc SHIM
 * surface (not the engine connector) with the wire-level behaviors the
 * real driver exhibits, for driving [[JdbcReplicationConnector]] through
 * the full replication contract suite:
 *
 *  - SQLSTATE taxonomy exactly as the reference pins it
 *    (PostgresConnectorTest.java:137-188): 42710 duplicate slot, 55006
 *    slot held by another PID, 57P03 recovery mode;
 *  - server-held confirmed-flush LSN that advances ONLY on
 *    forceUpdateStatus / stream close carrying a setFlushedLSN value —
 *    pgjdbc records set*LSN locally and piggybacks them, so an ack the
 *    binding never forces out is an ack the server never saw;
 *  - getLastReceiveLSN advanced by message receipt: a chunk sets it to
 *    the chunk position; an empty read (keepalive) may advance it past
 *    slot-irrelevant WAL only when the stream is fully drained — never
 *    past an undelivered commit.
 */
final class FakePgServer(genCfg: GenConfig, initialTxns: Long,
                         plugin: String = "wal2json",
                         protoVersion: Int = 1,
                         realWal2Json: Boolean = false,
                         formatVersion: Int = 1) {
  @volatile var nTxns: Long = initialTxns
  /** startStream attempts that fail 55006 before succeeding. */
  @volatile var busyStarts: Int = 0
  /** readPending calls that fail 57P03. */
  @volatile var recoveryReads: Int = 0
  /** successful reads to serve before ONE mid-stream 57P03 (-1 = never) —
    * lands a failure INSIDE a transaction's message sequence. */
  @volatile var failAfterReads: Int = -1
  /** WAL beyond the last deliverable chunk (other tables, vacuum, ...). */
  @volatile var keepalivePadding: Long = 0L

  private val slots = scala.collection.mutable.Map.empty[String, Long]
  private val active = scala.collection.mutable.Set.empty[String]

  def confirmedFlushLsn(slot: String): Long = synchronized(slots(slot))
  def slotExists(slot: String): Boolean = synchronized(slots.contains(slot))

  def shim(): PgReplicationShim = new Shim

  private final class Shim extends PgReplicationShim {
    override def createLogicalSlot(slotName: String, plugin: String): Unit =
      FakePgServer.this.synchronized {
        if (slots.contains(slotName))
          throw new SQLException(
            s"""replication slot "$slotName" already exists""", "42710")
        slots(slotName) = 0L
      }

    override def startStream(slotName: String,
        slotOptions: Map[String, String],
        statusIntervalMs: Long): PgReplicationStreamShim =
      FakePgServer.this.synchronized {
        require(slots.contains(slotName), s"no slot '$slotName'")
        // the plugin's options must reach START_REPLICATION
        if (plugin == "pgoutput") {
          require(slotOptions.get("proto_version")
              .contains(protoVersion.toString) &&
            slotOptions.contains("publication_names"),
            "pgoutput needs proto_version + publication_names")
          if (protoVersion >= 2)
            require(slotOptions.get("streaming").contains("on"),
              "protocol v2 sessions must request streaming")
        }
        else {
          require(slotOptions.contains("include-xids"),
            "the wal2json options must reach START_REPLICATION")
          if (formatVersion >= 2)
            require(slotOptions.get("format-version").contains("2"),
              "a v2 session must request format-version=2")
        }
        if (busyStarts > 0) {
          busyStarts -= 1
          throw new SQLException(
            s"""replication slot "$slotName" is active for PID 4242""", "55006")
        }
        if (active(slotName))
          throw new SQLException(
            s"""replication slot "$slotName" is active for PID 4242""", "55006")
        active += slotName
        new Stream(slotName)
      }

    override def close(): Unit = ()
  }

  private final class Stream(slotName: String) extends PgReplicationStreamShim {
    /** next txn ordinal to deliver (txn ids are lsn-1). */
    private var cursor: Long = FakePgServer.this.synchronized(slots(slotName))
    private var lastReceive: Long = cursor
    private var flushed: Long = -1L
    private var closed = false

    /** pgoutput mode: queued binary messages of in-flight txns, paired
      * with the receive-LSN the stream reaches once each is handed out
      * (-1 = position unchanged) — receipt-driven like pgjdbc. */
    private val msgQueue =
      scala.collection.mutable.Queue.empty[(Array[Byte], Long)]
    /** wal2json format-version 2 mode: queued per-ACTION text lines, the
      * same receipt-driven (line, lsn-after) pairing. */
    private val lineQueue =
      scala.collection.mutable.Queue.empty[(String, Long)]
    private var lastEra: Option[graft.gen.PgoutputGen.Era] = None

    /** v1: one whole txn at commit. v2: a PAIR of concurrent transactions
      * as protocol-v2 streamed segments, interleaved segment-by-segment
      * (the wire pattern streaming exists for), Stream Commits in commit
      * order — falling back to a single streamed txn at the tail or when
      * the pair straddles a schema era (DDL takes an exclusive lock;
      * concurrent txns cannot observe different schemas). */
    private def enqueueNextTxns(): Unit = {
      import graft.gen.PgoutputGen
      if (protoVersion >= 2) {
        val t1 = ChangeStreamGen.txn(genCfg, cursor); cursor += 1
        val e1 = PgoutputGen.era(genCfg, t1.lsn)
        val t2opt =
          if (cursor < nTxns) {
            val t2 = ChangeStreamGen.txn(genCfg, cursor)
            if (PgoutputGen.era(genCfg, t2.lsn) == e1) {
              cursor += 1; Some(t2)
            } else None
          } else None
        val (seg1, commit1, e1b) =
          PgoutputGen.streamedTxnMessages(genCfg, t1, lastEra, 1)
        t2opt match {
          case Some(t2) =>
            val (seg2, commit2, e2) =
              PgoutputGen.streamedTxnMessages(genCfg, t2, Some(e1b), 1)
            lastEra = Some(e2)
            seg1.zipAll(seg2, Seq.empty[Array[Byte]], Seq.empty[Array[Byte]])
              .foreach { case (a, b) =>
                a.foreach(m => msgQueue += ((m, -1L)))
                b.foreach(m => msgQueue += ((m, -1L)))
              }
            msgQueue += ((commit1, t1.lsn))
            msgQueue += ((commit2, t2.lsn))
          case None =>
            lastEra = Some(e1b)
            seg1.foreach(_.foreach(m => msgQueue += ((m, -1L))))
            msgQueue += ((commit1, t1.lsn))
        }
      } else {
        val t = ChangeStreamGen.txn(genCfg, cursor); cursor += 1
        val (msgs, e) = PgoutputGen.txnMessages(genCfg, t, lastEra)
        lastEra = Some(e)
        // receipt-driven: the stream position reaches the commit LSN when
        // the txn's LAST message (Commit) is handed out, not before
        msgs.dropRight(1).foreach(m => msgQueue += ((m, -1L)))
        msgQueue += ((msgs.last, t.lsn))
      }
    }

    override def readPending(): ByteBuffer = FakePgServer.this.synchronized {
      require(!closed, "stream closed")
      if (recoveryReads > 0) {
        recoveryReads -= 1
        throw new SQLException(
          "the database system is in recovery mode", "57P03")
      }
      if (failAfterReads == 0) {
        failAfterReads = -1
        throw new SQLException(
          "the database system is in recovery mode", "57P03")
      }
      if (failAfterReads > 0) failAfterReads -= 1
      if (plugin == "pgoutput") {
        if (msgQueue.isEmpty) {
          if (cursor >= nTxns) {
            lastReceive = math.max(lastReceive, nTxns + keepalivePadding)
            return null
          }
          enqueueNextTxns()
        }
        val (m, lsnAfter) = msgQueue.dequeue()
        if (lsnAfter >= 0) lastReceive = math.max(lastReceive, lsnAfter)
        ByteBuffer.wrap(m)
      } else if (formatVersion >= 2) {
        if (lineQueue.isEmpty) {
          if (cursor >= nTxns) {
            lastReceive = math.max(lastReceive, nTxns + keepalivePadding)
            return null
          }
          val t = ChangeStreamGen.txn(genCfg, cursor); cursor += 1
          // TRUE v2 wire shape: one document per action, no positions
          // in-band; the position reaches the commit LSN only when the
          // txn's LAST line (C) is handed out
          val lines = graft.gen.Wal2JsonV2Gen.txnLines(genCfg, t)
          lines.dropRight(1).foreach(l => lineQueue += ((l, -1L)))
          lineQueue += ((lines.last, t.lsn))
        }
        val (l, lsnAfter) = lineQueue.dequeue()
        if (lsnAfter >= 0) lastReceive = math.max(lastReceive, lsnAfter)
        ByteBuffer.wrap(l.getBytes("UTF-8"))
      } else if (cursor >= nTxns) {
        // keepalive: the server's sent-WAL position covers only WAL this
        // stream has fully seen — safe to advance past the padding
        lastReceive = math.max(lastReceive, nTxns + keepalivePadding)
        null
      } else {
        val t = ChangeStreamGen.txn(genCfg, cursor)
        cursor += 1
        lastReceive = t.lsn
        val line = ChangeStreamGen.renderLine(genCfg, t)
        // realWal2Json: what an actual wal2json plugin emits — NO top-level
        // lsn (the position travels on the replication protocol only)
        val payload =
          if (realWal2Json) line.replaceFirst("^\\{\"lsn\":\\d+,", "{")
          else line
        ByteBuffer.wrap(payload.getBytes("UTF-8"))
      }
    }

    override def getLastReceiveLSN(): Long =
      FakePgServer.this.synchronized(lastReceive)

    override def setAppliedLSN(lsn: Long): Unit = ()
    override def setFlushedLSN(lsn: Long): Unit =
      FakePgServer.this.synchronized { flushed = math.max(flushed, lsn) }

    /** Only HERE does the server's confirmed-flush move (monotone). */
    override def forceUpdateStatus(): Unit = FakePgServer.this.synchronized {
      require(!closed, "stream closed")
      if (flushed >= 0)
        slots(slotName) = math.max(slots(slotName), flushed)
    }

    override def close(): Unit = FakePgServer.this.synchronized {
      if (!closed) { closed = true; active -= slotName }
    }
  }
}

/**
 * The live-binding contract suite: [[JdbcReplicationConnector]] over the
 * pgjdbc-shaped [[FakePgServer]] must satisfy every protocol contract the
 * synthetic connector satisfies — SQLSTATE taxonomy mapping, slot-busy
 * retry budget, recovery-mode healing, ack-after-publish durability on
 * the server, idle fast-forward that never skips an undelivered commit,
 * and crash redelivery that stays exactly-once through the lake.
 */
class JdbcReplicationSpec extends SparkSpec {

  private val genCfg = GenConfig(seed = 13L, nRepos = 12, pathsPerRepo = 4,
    maxChangesPerTxn = 3)
  private val nTxns = 300L

  private val conn = ConnectionConfig(host = "db.example.org",
    database = "graft", username = "replicator", password = "s3cret")
  private def slotCfg = SlotConfig("graft_slot",
    slotBusyRetrySleepMs = 0L, idleSlotIntervalMs = 1000L)

  private def hconf = spark.sessionState.newHadoopConf()

  private def connector(server: FakePgServer): JdbcReplicationConnector =
    new JdbcReplicationConnector(conn, slotCfg, () => server.shim())

  private def sha256(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def expected: Map[(String, String), (String, String)] =
    ChangeStreamGen.expectedFinalState(genCfg, nTxns).map { case (k, ch) =>
      k -> (ch.commit, sha256(ch.content))
    }

  private def applyStaged(walDir: String): Map[(String, String), (String, String)] = {
    val t = new LakeTable(spark, tmpDir("jdbc-table"))
    t.create(Main.reposSchema, Seq("repo", "path"), nBuckets = 8, Main.reposRenameMap)
    new CdcPipeline(spark, walDir, tmpDir("jdbc-ckpt"),
      Seq(TableTarget("repos", t, Main.reposSchema, Seq("repo", "path"), 8,
        Main.reposRenameMap)), Set("repos")).runAvailable()
    t.read().select(col("repo"), col("path"), col("commit"),
      sha2(col("content"), 256).as("sha")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getString(2), r.getString(3))).toMap
  }

  test("SQLSTATE taxonomy maps exactly as the reference pins it") {
    val server = new FakePgServer(genCfg, 5L)
    val c = connector(server)
    assert(c.createSlotIfAbsent() === true)
    assert(c.createSlotIfAbsent() === false) // 42710 -> idempotent, not an error

    server.busyStarts = 1
    val busy = intercept[SlotBusyException] { c.openStream() }
    assert(busy.getMessage.contains("active for PID"))
    assert(CdcPipeline.classify(busy) === CdcPipeline.FailureKind.Contention)

    c.openStream()
    server.recoveryReads = 1
    val rec = intercept[RecoveryModeException] { c.readPending() }
    assert(rec.getMessage.contains("recovery"))
    assert(CdcPipeline.classify(rec) === CdcPipeline.FailureKind.Transient)
    // recovery heals in place: the same stream keeps delivering
    assert(c.readPending().isDefined)
    c.close()
  }

  test("an un-forced ack never reaches the server (status updates are explicit)") {
    // The binding must force the status update inside ack(): pgjdbc's
    // set*LSN only record positions locally. A shim stream that never
    // sees forceUpdateStatus keeps confirmed-flush at 0 — and the
    // connector's ack must move it.
    val server = new FakePgServer(genCfg, 10L)
    val c = connector(server)
    c.createSlotIfAbsent(); c.openStream()
    var n = 0
    while (c.readPending().isDefined) n += 1
    assert(n === 10)
    assert(server.confirmedFlushLsn("graft_slot") === 0L)
    c.ack(10L)
    assert(server.confirmedFlushLsn("graft_slot") === 10L,
      "ack must setFlushed AND force the update out")
    c.close()
  }

  test("WalEnvelope splices the stream lsn only when the top level lacks one") {
    import graft.sources.replication.WalEnvelope
    // nested "lsn" members (inside change objects) must NOT count
    assert(WalEnvelope.ensureLsn("""{"xid":7,"change":[{"lsn":99}]}""", 5L) ===
      """{"lsn":5,"xid":7,"change":[{"lsn":99}]}""")
    val withLsn = """{"lsn":3,"xid":7,"change":[]}"""
    assert(WalEnvelope.ensureLsn(withLsn, 5L) eq withLsn,
      "a pre-enveloped payload must pass through byte-identical")
    assert(WalEnvelope.ensureLsn("{}", 5L) === """{"lsn":5}""")
    val garbage = "not json"
    assert(WalEnvelope.ensureLsn(garbage, 5L) eq garbage,
      "malformed payloads are strict decode's job, not the splice's")
    // INVALID JSON that merely starts with '{' must not throw (a
    // JsonParseException escaping readPending classifies as Transient and
    // burns that budget on deterministic corrupt data) — the spliced line
    // stays malformed and strict decode rejects it under DataError
    assert(WalEnvelope.ensureLsn("{bad}", 5L) === """{"lsn":5,bad}""")
    assert(WalEnvelope.ensureLsn("""{"xid"  }""", 5L)
      .startsWith("""{"lsn":5,"""))
  }

  test("REAL wal2json (no in-band lsn) stages correctly via envelope splicing") {
    // an actual wal2json plugin emits {"xid":N,"change":[...]} — the WAL
    // position travels on the replication protocol, never in the JSON.
    // Without the splice, every live line is malformed downstream (the
    // synthetic endpoint masked this by injecting lsn itself).
    val n = 50L
    val server = new FakePgServer(genCfg, n, realWal2Json = true)
    val walDir = tmpDir("jdbc-wal-real")
    val ingest = new ReplicationIngest(connector(server), walDir, hconf,
      slotCfg, flushChunks = 20L)
    ingest.start()
    val stats = ingest.pump()
    ingest.close()
    assert(stats.chunks === n)
    // the splice reconstructs EXACTLY the canonical envelope: staged bytes
    // equal the synthetic renderer's output line-for-line
    val staged = WalSource.listSegments(walDir).sorted
      .flatMap(s => scala.io.Source.fromFile(
        new java.io.File(walDir, s)).getLines().toList)
    val canonical = (0L until n)
      .map(id => ChangeStreamGen.renderLine(genCfg, ChangeStreamGen.txn(genCfg, id)))
    assert(staged === canonical)
    // and the staged WAL applies to the oracle state
    val applied = applyStaged(walDir)
    assert(applied === ChangeStreamGen.expectedFinalState(genCfg, n)
      .map { case (k, ch) => k -> (ch.commit, sha256(ch.content)) })
  }

  test("wal2json FORMAT-VERSION 2 stages via the action-line fold; reconnect mid-txn") {
    // the live v2 wire: one document per ACTION, no positions in-band —
    // the connector folds B..C to one v1-parity line and splices the
    // stream position at the boundary
    val n = 60L
    val server = new FakePgServer(genCfg, n, formatVersion = 2)
    val slot = SlotConfig("graft_slot", formatVersion = 2,
      slotBusyRetrySleepMs = 0L)
    val c = new JdbcReplicationConnector(conn, slot, () => server.shim())
    c.createSlotIfAbsent()
    c.openStream()
    assert(c.readPending().isDefined) // txn 1 folded whole
    // fail INSIDE txn 2's action sequence (B consumed, C never): the
    // transcoder is left mid-transaction; reconnect redelivers from txn
    // START — without the openStream reset the redelivered B is a
    // framing violation (healthy recovery misclassified as DataError)
    server.failAfterReads = 1
    intercept[RecoveryModeException] { c.readPending() }
    c.openStream()
    val rest = Iterator.continually(c.readPending())
      .takeWhile(_.isDefined).map(_.get).toList
    assert(rest.size === n, "full redelivery (nothing was acked)")
    c.close()

    // end-to-end: staged bytes == canonical v1 envelope; state == oracle
    val server2 = new FakePgServer(genCfg, n, formatVersion = 2)
    val walDir = tmpDir("jdbc-wal-v2")
    val ingest = new ReplicationIngest(
      new JdbcReplicationConnector(conn, slot, () => server2.shim()),
      walDir, hconf, slot, flushChunks = 25L)
    ingest.start()
    assert(ingest.pump().chunks === n)
    ingest.close()
    val staged = WalSource.listSegments(walDir).sorted
      .flatMap(s => scala.io.Source.fromFile(
        new java.io.File(walDir, s)).getLines().toList)
    val canonical = (0L until n)
      .map(id => ChangeStreamGen.renderLine(genCfg, ChangeStreamGen.txn(genCfg, id)))
    assert(staged === canonical)
    assert(applyStaged(walDir) === ChangeStreamGen.expectedFinalState(genCfg, n)
      .map { case (k, ch) => k -> (ch.commit, sha256(ch.content)) })
  }

  test("pgoutput stream reopen after a mid-transaction failure redelivers cleanly") {
    val server = new FakePgServer(genCfg, 3L, plugin = "pgoutput")
    val slot = SlotConfig("graft_slot", outputPlugin = "pgoutput",
      slotBusyRetrySleepMs = 0L)
    val c = new JdbcReplicationConnector(conn, slot, () => server.shim())
    c.createSlotIfAbsent()
    c.openStream()
    assert(c.readPending().isDefined) // txn 1 transcoded whole
    // fail INSIDE txn 2's message sequence (Begin consumed, Commit never):
    // the transcoder is left mid-transaction
    server.failAfterReads = 2
    intercept[RecoveryModeException] { c.readPending() }
    // reconnect: the slot redelivers from confirmed-flush, i.e. txn 1's
    // BEGIN again — without the openStream transcoder reset this fails
    // MalformedPgoutputException("Begin ... inside an open transaction"),
    // misclassifying a healthy recovery as a permanent DataError
    c.openStream()
    val lines = Iterator.continually(c.readPending())
      .takeWhile(_.isDefined).map(_.get).toList
    assert(lines.size === 3, "full redelivery (nothing was acked)")
    c.close()
  }

  test("live ingest end-to-end through the JDBC binding == oracle") {
    val server = new FakePgServer(genCfg, nTxns)
    val walDir = tmpDir("jdbc-wal")
    val ingest = new ReplicationIngest(connector(server), walDir, hconf,
      slotCfg, flushChunks = 70L)
    ingest.start()
    assert(server.slotExists("graft_slot"))
    val stats = ingest.pump()
    ingest.close()
    assert(stats.chunks === nTxns)
    assert(server.confirmedFlushLsn("graft_slot") === nTxns)
    assert(WalSource.listSegments(walDir).size === stats.segments)
    assert(applyStaged(walDir) === expected)
  }

  test("slot-busy starts retry within the budget and fail loudly beyond it") {
    val server = new FakePgServer(genCfg, nTxns)
    var sleeps = 0
    server.busyStarts = 3
    val ingest = new ReplicationIngest(connector(server), tmpDir("jdbc-wal"),
      hconf, slotCfg.copy(slotBusyRetryLimit = 5), sleepMs = _ => sleeps += 1)
    ingest.start()
    assert(sleeps === 3)
    ingest.close()

    server.busyStarts = 5
    val tight = new ReplicationIngest(connector(server), tmpDir("jdbc-wal"),
      hconf, slotCfg.copy(slotBusyRetryLimit = 3), sleepMs = _ => ())
    intercept[SlotBusyException] { tight.start() }

    // a genuinely held slot stays busy until the holder's stream closes
    server.busyStarts = 0
    val holder = connector(server)
    holder.createSlotIfAbsent(); holder.openStream()
    val contender = connector(server)
    intercept[SlotBusyException] { contender.openStream() }
    holder.close()
    contender.openStream(); contender.close()
  }

  test("idle fast-forward acks keepalive positions past the last delivery") {
    val server = new FakePgServer(genCfg, 10L)
    var now = 0L
    val ingest = new ReplicationIngest(connector(server), tmpDir("jdbc-idle"),
      hconf, slotCfg, nowMs = () => now)
    ingest.start()
    assert(ingest.pump().ackedLsn === 10L)

    // keepalives past slot-irrelevant WAL: the drained stream's
    // getLastReceiveLSN advances with them, and after the idle window the
    // fast-forward acks it so the server can reclaim WAL
    server.keepalivePadding = 500L
    now += slotCfg.idleSlotIntervalMs + 1
    assert(ingest.pump().ackedLsn === 510L)
    assert(server.confirmedFlushLsn("graft_slot") === 510L)
    ingest.close()
  }

  test("idle fast-forward never acks past an undelivered commit (receipt-driven LSN)") {
    // A commit that lands between the drain's final empty read and the
    // idle probe: getLastReceiveLSN only advances on message RECEIPT, so
    // the probe structurally cannot see the new commit — unlike the
    // reference's out-of-band `select pg_current_wal_lsn()`, which returns
    // the new insert position and would ack past the undelivered commit
    // (permanent loss: slots never resend below confirmed-flush).
    val server = new FakePgServer(genCfg, 10L)
    val real = connector(server)
    val racing = new ReplicationConnector {
      def createSlotIfAbsent(): Boolean = real.createSlotIfAbsent()
      def openStream(): Unit = real.openStream()
      def readPending(): Option[WalChunk] = real.readPending()
      def currentLsn(): Long = {
        server.nTxns += 1 // the commit lands inside the idle window
        real.currentLsn()
      }
      def ack(lsn: Long): Unit = real.ack(lsn)
      def close(): Unit = real.close()
    }
    var now = 0L
    val ingest = new ReplicationIngest(racing, tmpDir("jdbc-race"), hconf,
      slotCfg, nowMs = () => now)
    ingest.start()
    assert(ingest.pump().ackedLsn === 10L)
    now += slotCfg.idleSlotIntervalMs + 1
    val idle = ingest.pump() // idle branch fires; commit 11 lands mid-probe
    assert(idle.ackedLsn === 10L,
      "fast-forward must not ack past the undelivered commit")
    val after = ingest.pump()
    assert(after.chunks === 11L, "the late commit must be delivered, not skipped")
    assert(after.ackedLsn === 11L)
    ingest.close()
    assert(server.confirmedFlushLsn("graft_slot") === 11L)
  }

  test("crash between publish and ack redelivers a suffix; lake state stays exactly-once") {
    val server = new FakePgServer(genCfg, nTxns)
    val walDir = tmpDir("jdbc-crash")
    val real = connector(server)
    val crashing = new ReplicationConnector {
      private var reads = 0
      def createSlotIfAbsent(): Boolean = real.createSlotIfAbsent()
      def openStream(): Unit = real.openStream()
      def currentLsn(): Long = real.currentLsn()
      def readPending(): Option[WalChunk] = {
        reads += 1
        if (reads > 200) { real.close(); throw new RuntimeException("process died") }
        real.readPending()
      }
      def ack(lsn: Long): Unit = if (reads <= 100) real.ack(lsn)
      def close(): Unit = real.close()
    }
    val ingest = new ReplicationIngest(crashing, walDir, hconf, slotCfg,
      flushChunks = 50L)
    ingest.start()
    intercept[RuntimeException] { ingest.pump() }

    val resumed = new ReplicationIngest(connector(server), walDir, hconf,
      slotCfg, flushChunks = 50L)
    resumed.start()
    resumed.pump()
    resumed.close()
    assert(server.confirmedFlushLsn("graft_slot") === nTxns)

    val lsns = WalSource.listSegments(walDir)
      .flatMap(n => scala.io.Source.fromFile(s"$walDir/$n").getLines())
      .map(l => """"lsn":(\d+)""".r.findFirstMatchIn(l).get.group(1).toLong)
    assert(lsns.size > lsns.distinct.size, "crash redelivery stages duplicates")
    assert(lsns.distinct.sorted === (1L to nTxns), "and loses nothing")
    assert(applyStaged(walDir) === expected)
  }

  test("absent pgjdbc driver fails fast with an informative message") {
    val c = new JdbcReplicationConnector(conn, slotCfg,
      () => new PgjdbcShim(conn))
    val e = intercept[IllegalStateException] { c.createSlotIfAbsent() }
    assert(e.getMessage.contains("org.postgresql"))
    assert(e.getMessage.contains("pgjdbc"))
  }

  test("TRUNCATE through the live binding: irrelevant tables skip, consumed tables fail typed") {
    // a FOR-ALL-TABLES publication carries EVERY table's truncates; the
    // binding must pass SlotConfig.relevantTables down to the transcoder
    // so an ops-table truncate cannot wedge the whole stream, while a
    // consumed-table truncate still fails loud under DataError
    import graft.decode.Pgoutput
    import Pgoutput._
    def scripted(msgs: Seq[Array[Byte]]): PgReplicationShim =
      new PgReplicationShim {
        override def createLogicalSlot(n: String, p: String): Unit = ()
        override def startStream(n: String, o: Map[String, String],
            s: Long): PgReplicationStreamShim = new PgReplicationStreamShim {
          private val q = scala.collection.mutable.Queue(msgs: _*)
          private var recv = 0L
          override def readPending(): java.nio.ByteBuffer =
            if (q.isEmpty) null
            else { recv += 1; java.nio.ByteBuffer.wrap(q.dequeue()) }
          override def getLastReceiveLSN(): Long = recv
          override def setAppliedLSN(l: Long): Unit = ()
          override def setFlushedLSN(l: Long): Unit = ()
          override def forceUpdateStatus(): Unit = ()
          override def close(): Unit = ()
        }
        override def close(): Unit = ()
      }
    val relOps = Relation(8, "public", "ops_scratch", 'd'.toByte,
      IndexedSeq(RelationColumn(1, "id", 23, -1)))
    val relRepos = Relation(7, "public", "repos", 'd'.toByte,
      IndexedSeq(RelationColumn(1, "id", 23, -1)))
    val slot = SlotConfig("graft_slot", outputPlugin = "pgoutput",
      publication = Some("pub"), relevantTables = Set("repos"))
    val good = Seq(
      Pgoutput.write(Begin(1, 0, 42)),
      Pgoutput.write(relOps),
      Pgoutput.write(relRepos),
      Pgoutput.write(Truncate(0, IndexedSeq(8))), // irrelevant: skipped
      Pgoutput.write(Insert(7, IndexedSeq(TextValue("1")))),
      Pgoutput.write(Commit(0, 5L, 6L, 7L)))
    val c = new JdbcReplicationConnector(conn, slot, () => scripted(good))
    c.createSlotIfAbsent(); c.openStream()
    val chunk = c.readPending().get
    assert(chunk.line.contains("\"insert\""),
      "the transaction around the skipped truncate must still deliver")
    assert(!chunk.line.toLowerCase.contains("truncate"))
    c.close()
    val bad = Seq(
      Pgoutput.write(Begin(1, 0, 43)),
      Pgoutput.write(relRepos),
      Pgoutput.write(Truncate(0, IndexedSeq(7)))) // consumed: must fail
    val c2 = new JdbcReplicationConnector(conn, slot, () => scripted(bad))
    c2.createSlotIfAbsent(); c2.openStream()
    val ex = intercept[Exception] { c2.readPending() }
    assert(ex.getMessage.contains("repos"))
    assert(CdcPipeline.classify(ex) === CdcPipeline.FailureKind.DataError)
    c2.close()
  }
}
