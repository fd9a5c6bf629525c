package graft

import org.apache.spark.sql.functions._
import graft.cli.Main
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.sources.WalSource
import graft.sources.replication._
import graft.streaming.{CdcPipeline, TableTarget}

/**
 * The live replication-protocol layer: config/SSL-surface validation,
 * slot lifecycle (idempotent create, busy retry, server-held cursor),
 * the ingest loop's ack-after-publish contract, crash redelivery that
 * stays exactly-once end to end, idle fast-forward, and the supervision
 * taxonomy mapping of protocol faults.
 */
class ReplicationSpec extends SparkSpec {

  private val genCfg = GenConfig(seed = 11L, nRepos = 15, pathsPerRepo = 4,
    maxChangesPerTxn = 3)
  private val nTxns = 400L

  private val conn = ConnectionConfig(host = "db.example.org", database = "graft",
    username = "replicator", password = "s3cret")
  private def slotCfg = SlotConfig("graft_slot",
    slotBusyRetrySleepMs = 0L, idleSlotIntervalMs = 1000L)

  private def hconf = spark.sessionState.newHadoopConf()

  private def sha256(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def expected: Map[(String, String), (String, String)] =
    ChangeStreamGen.expectedFinalState(genCfg, nTxns).map { case (k, ch) =>
      k -> (ch.commit, sha256(ch.content))
    }

  /** Tail the staged WAL through the full pipeline into a fresh table. */
  private def applyStaged(walDir: String): Map[(String, String), (String, String)] = {
    val t = new LakeTable(spark, tmpDir("repl-table"))
    t.create(Main.reposSchema, Seq("repo", "path"), nBuckets = 8, Main.reposRenameMap)
    new CdcPipeline(spark, walDir, tmpDir("repl-ckpt"),
      Seq(TableTarget("repos", t, Main.reposSchema, Seq("repo", "path"), 8,
        Main.reposRenameMap)), Set("repos")).runAvailable()
    t.read().select(col("repo"), col("path"), col("commit"),
      sha2(col("content"), 256).as("sha")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getString(2), r.getString(3))).toMap
  }

  test("connection config: SSL surface validates up front, before any connection") {
    conn.validate() // the plain config is fine
    intercept[IllegalArgumentException] {
      conn.copy(sslMode = "verify-full").validate() // no trust root
    }
    intercept[IllegalArgumentException] {
      conn.copy(sslMode = "verify-ca").validate()
    }
    conn.copy(sslMode = "verify-ca", sslRootCert = Some("/certs/ca.pem")).validate()
    intercept[IllegalArgumentException] {
      conn.copy(sslCert = Some("/certs/client.pem")).validate() // cert sans key
    }
    intercept[IllegalArgumentException] {
      conn.copy(sslKey = Some("/certs/client.key")).validate() // key sans cert
    }
    intercept[IllegalArgumentException] {
      conn.copy(sslPassword = Some("pw")).validate() // passphrase sans key
    }
    intercept[IllegalArgumentException] { conn.copy(sslMode = "tls").validate() }
    intercept[IllegalArgumentException] { conn.copy(port = 0).validate() }
    intercept[IllegalArgumentException] { conn.copy(host = "").validate() }
    intercept[IllegalArgumentException] { conn.copy(username = "").validate() }
  }

  test("connection config renders the driver property sets the reference builds") {
    val c = conn.copy(sslMode = "verify-full",
      sslRootCert = Some("/certs/ca.pem"), sslCert = Some("/certs/client.pem"),
      sslKey = Some("/certs/client.key"), sslPassword = Some("kp")).validate()
    assert(c.url === "jdbc:postgresql://db.example.org:5432/graft")
    val q = c.queryProperties
    assert(q("user") === "replicator" && q("password") === "s3cret")
    assert(q("assumeMinServerVersion") === "10.3")
    assert(q("sslmode") === "verify-full" && q("sslrootcert") === "/certs/ca.pem")
    assert(q("sslcert") === "/certs/client.pem" && q("sslkey") === "/certs/client.key")
    assert(q("sslpassword") === "kp")
    assert(!q.contains("replication"))
    // the replication connection adds exactly the two stream-mode keys
    val r = c.replicationProperties
    assert(r === q ++ Map("replication" -> "database", "preferQueryMode" -> "simple"))
  }

  test("slot config validates the slot name and renders plugin options") {
    slotCfg.validate()
    intercept[IllegalArgumentException] { SlotConfig("Bad-Name").validate() }
    intercept[IllegalArgumentException] { SlotConfig("").validate() }
    intercept[IllegalArgumentException] { SlotConfig("a" * 64).validate() }
    assert(SlotConfig("s1").slotOptions === Map("include-xids" -> "true"))
    assert(SlotConfig("s1", includeXids = false)
      .slotOptions === Map("include-xids" -> "false"))
  }

  test("live ingest end-to-end: server -> stager -> graft-wal -> MERGE == oracle") {
    val server = new SyntheticReplicationServer(genCfg, nTxns)
    val walDir = tmpDir("repl-wal")
    val ingest = new ReplicationIngest(server.connect(conn, slotCfg), walDir,
      hconf, slotCfg, flushChunks = 90L)
    ingest.start()
    assert(server.slotExists("graft_slot"))
    val stats = ingest.pump()
    ingest.close()
    assert(stats.chunks === nTxns)
    assert(stats.segments >= 4, "publish cadence must have rolled multiple segments")
    // the server-held cursor IS the durable resume point (no local cursor)
    assert(server.confirmedFlushLsn("graft_slot") === nTxns)
    assert(WalSource.listSegments(walDir).size === stats.segments)
    assert(applyStaged(walDir) === expected)
  }

  test("synthetic endpoint honors --plugin pgoutput at protocol v2: streamed binary -> same final state") {
    // the same formula stream served as protocol-v2 STREAMED pgoutput
    // segments, folded through the real transcoder server-side — the
    // plugin is exercised, not silently swapped for wal2json lines
    val slotV2 = SlotConfig("graft_slot", outputPlugin = "pgoutput",
      protoVersion = 2, slotBusyRetrySleepMs = 0L, idleSlotIntervalMs = 1000L)
    val server = new SyntheticReplicationServer(genCfg, nTxns)
    val walDir = tmpDir("repl-wal-pgout2")
    val ingest = new ReplicationIngest(server.connect(conn, slotV2), walDir,
      hconf, slotV2, flushChunks = 90L)
    ingest.start()
    val stats = ingest.pump()
    ingest.close()
    assert(stats.chunks === nTxns)
    assert(server.confirmedFlushLsn("graft_slot") === nTxns)
    assert(applyStaged(walDir) === expected)
  }

  test("crash between publish and ack redelivers a suffix; end state stays exactly-once") {
    val server = new SyntheticReplicationServer(genCfg, nTxns)
    val walDir = tmpDir("repl-wal")

    // A connector whose process "dies" mid-stream: acks stop reaching the
    // server shortly before the crash (published-but-unacked segments), then
    // a read blows up; the connection drop releases the slot.
    val real = server.connect(conn, slotCfg)
    val crashing = new ReplicationConnector {
      private var reads = 0
      def createSlotIfAbsent(): Boolean = real.createSlotIfAbsent()
      def openStream(): Unit = real.openStream()
      def currentLsn(): Long = real.currentLsn()
      def readPending(): Option[WalChunk] = {
        reads += 1
        if (reads > 250) { real.close(); throw new RuntimeException("process died") }
        real.readPending()
      }
      def ack(lsn: Long): Unit = if (reads <= 130) real.ack(lsn) // later acks lost
      def close(): Unit = real.close()
    }
    val ingest = new ReplicationIngest(crashing, walDir, hconf, slotCfg,
      flushChunks = 60L)
    ingest.start()
    intercept[RuntimeException] { ingest.pump() } // the crash; no close()

    // restart: a fresh connector resumes from the server-held cursor
    val resumed = new ReplicationIngest(server.connect(conn, slotCfg), walDir,
      hconf, slotCfg, flushChunks = 60L)
    resumed.start()
    resumed.pump()
    resumed.close()
    assert(server.confirmedFlushLsn("graft_slot") === nTxns)

    // the staged WAL must actually contain redelivered duplicates …
    val lsns = WalSource.listSegments(walDir)
      .flatMap(n => scala.io.Source.fromFile(s"$walDir/$n").getLines())
      .map(l => """"lsn":(\d+)""".r.findFirstMatchIn(l).get.group(1).toLong)
    assert(lsns.size > lsns.distinct.size,
      "crash redelivery should stage some LSNs twice")
    assert(lsns.distinct.sorted === (1L to nTxns), "and lose nothing")
    // … and the pipeline must still converge to the sequential oracle
    assert(applyStaged(walDir) === expected)
  }

  test("slot-busy opens retry within the budget and fail loudly beyond it") {
    val server = new SyntheticReplicationServer(genCfg, nTxns)
    val walDir = tmpDir("repl-wal")
    var sleeps = 0
    server.busyOpens = 3
    val ingest = new ReplicationIngest(server.connect(conn, slotCfg), walDir,
      hconf, slotCfg.copy(slotBusyRetryLimit = 5), sleepMs = _ => sleeps += 1)
    ingest.start() // 3 busy attempts, then opens
    assert(sleeps === 3)
    ingest.close()

    server.busyOpens = 5
    val tight = new ReplicationIngest(server.connect(conn, slotCfg), walDir,
      hconf, slotCfg.copy(slotBusyRetryLimit = 3), sleepMs = _ => ())
    intercept[SlotBusyException] { tight.start() }

    // a genuinely held slot is busy for a second consumer until released
    server.busyOpens = 0
    val holder = server.connect(conn, slotCfg)
    holder.createSlotIfAbsent(); holder.openStream()
    val contender = server.connect(conn, slotCfg)
    intercept[SlotBusyException] { contender.openStream() }
    holder.close()
    contender.openStream(); contender.close()
  }

  test("idle fast-forward acks the server's current LSN past the last delivery") {
    val server = new SyntheticReplicationServer(genCfg, nTxns)
    var now = 0L
    val ingest = new ReplicationIngest(server.connect(conn, slotCfg),
      tmpDir("repl-wal"), hconf, slotCfg, nowMs = () => now)
    ingest.start()
    assert(ingest.pump().ackedLsn === nTxns) // drained and acked
    // WAL advances with traffic irrelevant to this slot; nothing pending
    server.currentLsnPadding = 500L
    assert(ingest.pump().ackedLsn === nTxns, "not idle long enough yet")
    now += slotCfg.idleSlotIntervalMs + 1
    assert(ingest.pump().ackedLsn === nTxns + 500L)
    assert(server.confirmedFlushLsn("graft_slot") === nTxns + 500L)
    ingest.close()
  }

  test("idle fast-forward never acks past an undelivered commit") {
    // A transaction that commits BETWEEN the drain's final empty read and
    // the fast-forward probe must not be skipped: currentLsn() is
    // contractually delivered-through, so it may not run ahead of the
    // commit until the commit has actually been handed out. (An
    // out-of-band pg_current_wal_lsn probe here would return the new
    // insert position; acking it advances confirmed-flush past the
    // undelivered commit — the slot never resends below that = silent,
    // permanent loss.)
    val server = new SyntheticReplicationServer(genCfg, 10L)
    val real = server.connect(conn, slotCfg)
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
    val ingest = new ReplicationIngest(racing, tmpDir("repl-race"), hconf,
      slotCfg, nowMs = () => now)
    ingest.start()
    assert(ingest.pump().ackedLsn === 10L) // drained the initial 10
    now += slotCfg.idleSlotIntervalMs + 1
    val idle = ingest.pump() // idle branch fires; commit 11 lands mid-probe
    assert(idle.ackedLsn === 10L,
      "fast-forward must not ack past the undelivered commit")
    val after = ingest.pump() // the commit is still deliverable
    assert(after.chunks === 11L, "the late commit must be delivered, not skipped")
    assert(after.ackedLsn === 11L)
    ingest.close()
    assert(server.confirmedFlushLsn("graft_slot") === 11L)
  }

  test("protocol faults map onto the supervision taxonomy") {
    import CdcPipeline.FailureKind._
    assert(CdcPipeline.classify(new SlotBusyException("55006")) === Contention)
    assert(CdcPipeline.classify(new RecoveryModeException("57P03")) === Transient)
    // …including when wrapped the way streaming wraps batch failures
    assert(CdcPipeline.classify(
      new RuntimeException("outer", new SlotBusyException("x"))) === Contention)

    // recovery mode is retryable in place: the next read proceeds
    val server = new SyntheticReplicationServer(genCfg, 10L)
    val ingest = new ReplicationIngest(server.connect(conn, slotCfg),
      tmpDir("repl-wal"), hconf, slotCfg)
    ingest.start()
    server.recoveryReads = 1
    intercept[RecoveryModeException] { ingest.pump() }
    assert(ingest.pump().chunks === 10L) // healed: same ingest drains fully
    ingest.close()
    assert(server.confirmedFlushLsn("graft_slot") === 10L)
  }

  test("live concurrent staging: ingest publishes while the pipeline consumes with retention") {
    val server = new SyntheticReplicationServer(genCfg, nTxns)
    val walDir = tmpDir("repl-live")

    // Gate the connector so delivery happens in waves — the ingest thread
    // stays live across the whole consume run instead of draining up front.
    val real = server.connect(conn, slotCfg)
    val gate = new java.util.concurrent.atomic.AtomicLong(0L)
    val gated = new ReplicationConnector {
      private var reads = 0L
      def createSlotIfAbsent(): Boolean = real.createSlotIfAbsent()
      def openStream(): Unit = real.openStream()
      def currentLsn(): Long = real.currentLsn()
      def readPending(): Option[WalChunk] =
        if (reads >= gate.get()) None
        else { reads += 1; real.readPending() }
      def ack(lsn: Long): Unit = real.ack(lsn)
      def close(): Unit = real.close()
    }
    val ingest = new ReplicationIngest(gated, walDir, hconf, slotCfg,
      flushChunks = 25L)
    ingest.start()
    val stagingDone = new java.util.concurrent.CountDownLatch(1)
    val stagerThread = new Thread(() => {
      try {
        while (gate.get() < nTxns) {
          gate.addAndGet(50L)
          ingest.pump()
          Thread.sleep(20L)
        }
        ingest.pump()
        ingest.close()
      } finally stagingDone.countDown()
    })
    stagerThread.start()

    // Consumer: repeated AvailableNow drains against the SAME checkpoint,
    // with consumed-WAL deletion racing the live stager.
    val t = new LakeTable(spark, tmpDir("repl-live-table"))
    t.create(Main.reposSchema, Seq("repo", "path"), nBuckets = 8, Main.reposRenameMap)
    val pipe = new CdcPipeline(spark, walDir, tmpDir("repl-live-ckpt"),
      Seq(TableTarget("repos", t, Main.reposSchema, Seq("repo", "path"), 8,
        Main.reposRenameMap)), Set("repos"), walRetention = true)
    var rounds = 0
    val deadline = System.currentTimeMillis() + 120000L
    while (t.currentSnapshot.get.lsnHighWatermark < nTxns &&
           System.currentTimeMillis() < deadline) {
      pipe.runAvailable()
      rounds += 1
    }
    assert(stagingDone.await(30, java.util.concurrent.TimeUnit.SECONDS))
    pipe.runAvailable() // sweep any tail published after the last drain

    assert(t.currentSnapshot.get.lsnHighWatermark === nTxns)
    assert(rounds > 1, "consumption must have interleaved with staging")
    assert(server.confirmedFlushLsn("graft_slot") === nTxns)
    val state = t.read().select(col("repo"), col("path"), col("commit"),
      sha2(col("content"), 256).as("sha")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getString(2), r.getString(3))).toMap
    assert(state === expected)
  }

  test("segment stats count auto-rolls (rollBytes) as well as cadence rolls") {
    val server = new SyntheticReplicationServer(genCfg, 100L)
    val walDir = tmpDir("repl-autoroll")
    // tiny rollBytes => many auto-rolls between the (huge) flush cadences
    val ingest = new ReplicationIngest(server.connect(conn, slotCfg), walDir,
      hconf, slotCfg, rollBytes = 4096L, flushChunks = 1000000L)
    ingest.start()
    val stats = ingest.pump()
    ingest.close()
    val onDisk = WalSource.listSegments(walDir).size
    assert(onDisk > 5, s"expected many auto-rolled segments, got $onDisk")
    assert(stats.segments === onDisk,
      "IngestStats.segments must include auto-rolled segments")
  }

  test("status interval bounds ack latency during a long drain") {
    val server = new SyntheticReplicationServer(genCfg, 100L)
    var now = 0L
    val ingest = new ReplicationIngest(server.connect(conn, slotCfg),
      tmpDir("repl-status"), hconf,
      slotCfg.copy(statusIntervalMs = 1000L),
      flushChunks = 1000000L, // cadence alone would never publish mid-drain
      nowMs = () => { now += 150L; now }) // wall time advances as chunks flow
    ingest.start()
    val stats = ingest.pump()
    ingest.close()
    // without the time-based bound this drain would publish exactly once
    assert(stats.segments > 3,
      s"statusIntervalMs must force periodic publishes, got ${stats.segments}")
    assert(server.confirmedFlushLsn("graft_slot") === 100L)
  }

  test("createSlotIfAbsent is idempotent (42710 analog)") {
    val server = new SyntheticReplicationServer(genCfg, 5L)
    val c = server.connect(conn, slotCfg)
    assert(c.createSlotIfAbsent() === true)
    assert(c.createSlotIfAbsent() === false)
    c.close()
  }
}
