package graft.sources.replication

import graft.gen.{ChangeStreamGen, GenConfig}

/** One decoded chunk off the replication stream: the WAL position it was
  * read at plus the plugin's (wal2json) text payload. */
final case class WalChunk(lsn: Long, line: String)

/** The slot is held by another consumer — the reference's SQLSTATE 55006
  * ("currently running process on slot", PostgresConnector.java:48,186-189).
  * Retried patiently: blue/green deploys overlap. */
final class SlotBusyException(msg: String) extends RuntimeException(msg)

/** The server is in recovery — the reference's SQLSTATE 57P03
  * (SlotReaderKinesisWriter.java:56,137-144). A transient condition: sleep
  * and reattempt. */
final class RecoveryModeException(msg: String) extends RuntimeException(msg)

/**
 * The live replication-protocol seam — the engine analog of the reference's
 * `PostgresConnector` (PostgresConnector.java:46-244). One implementation
 * speaks to a real server over a JDBC replication connection built from
 * [[ConnectionConfig.replicationProperties]]; the bundled
 * [[SyntheticReplicationServer]] provides a deterministic in-memory stand-in
 * (this sandbox has no database), exercising every protocol edge the loop
 * must survive: slot-busy opens, recovery mode, restart redelivery from the
 * server-held cursor.
 *
 * Durability model (same as the reference): the slot's confirmed-flush LSN
 * lives ON THE SERVER — [[ack]] is the standby status update that advances
 * it (PostgresConnector.setStreamLsn, :124-131). A restarted consumer
 * reopens the stream and is redelivered everything after the last ack, so
 * the staging loop needs no cursor of its own; duplicates land in later
 * segments and the lake's per-bucket LSN watermark gate drops them.
 */
trait ReplicationConnector extends AutoCloseable {
  /** Idempotent logical-slot creation — tolerate "already exists" (42710,
    * PostgresConnector.java:82-98). @return true if newly created. */
  def createSlotIfAbsent(): Boolean

  /** Open the replication stream at the slot's confirmed position. May
    * throw [[SlotBusyException]]; the caller owns the retry budget. */
  def openStream(): Unit

  /** Non-blocking read of the next pending chunk (readPending,
    * PostgresConnector.java:106-108); None when caught up. */
  def readPending(): Option[WalChunk]

  /** The position through which the server has DELIVERED everything
    * slot-relevant on this stream — used for idle fast-forward, so it may
    * run ahead of the last chunk when the gap is WAL this slot will never
    * see (other tables' activity, vacuum...). CONTRACT: after
    * [[readPending]] returns None, every change at or below this position
    * has already been handed to the consumer; acking it can never skip
    * undelivered data. A JDBC binding implements this as the stream's
    * last-received position (`PGReplicationStream.getLastReceiveLSN`,
    * advanced by server keepalives only past fully-sent WAL) — NOT as the
    * reference's `select pg_current_wal_lsn()` probe
    * (PostgresConnector.java:110-122), which is sampled out-of-band and
    * may exceed positions of committed-but-not-yet-streamed transactions;
    * acking such a probe after an idle drain permanently skips them. */
  def currentLsn(): Long

  /** Standby status update: mark everything <= lsn applied AND flushed
    * (setStreamLsn, PostgresConnector.java:124-131). Must only be called
    * with positions whose effects are durable downstream. */
  def ack(lsn: Long): Unit
}

/**
 * Deterministic in-memory replication server: serves the
 * [[ChangeStreamGen]] formula stream as a slot's pending chunks, with real
 * server-side slot state — confirmed-flush LSN (restart redelivery), a
 * single-consumer lock (slot-busy), and scriptable fault injection. The
 * double for everything a live endpoint would do, minus the socket.
 */
final class SyntheticReplicationServer(genCfg: GenConfig, initialTxns: Long) {

  /** Total committed transactions; tests raise it mid-run to model a commit
    * landing between a consumer's drain and its idle fast-forward. */
  @volatile var nTxns: Long = initialTxns

  /** slot name -> confirmed-flush LSN (0 = deliver from the beginning). */
  private val slots = scala.collection.mutable.Map.empty[String, Long]
  /** slots currently held open by a connector. */
  private val inUse = scala.collection.mutable.Set.empty[String]
  /** remaining openStream attempts that fail slot-busy (fault injection). */
  @volatile var busyOpens: Int = 0
  /** remaining readPending calls that fail recovery-mode (fault injection). */
  @volatile var recoveryReads: Int = 0
  /** WAL written by activity irrelevant to this slot: pushes the current
    * LSN past the last deliverable chunk, the situation idle fast-forward
    * exists for (SlotReaderKinesisWriter.java:188-208). */
  @volatile var currentLsnPadding: Long = 0L

  def confirmedFlushLsn(slot: String): Long = synchronized(slots(slot))
  def slotExists(slot: String): Boolean = synchronized(slots.contains(slot))

  def connect(conn: ConnectionConfig, slot: SlotConfig): ReplicationConnector = {
    conn.validate(); slot.validate()
    new Connector(slot)
  }

  private final class Connector(slot: SlotConfig) extends ReplicationConnector {
    private val slotName = slot.slotName
    private var open = false
    /** next txn id to deliver on this stream. */
    private var cursor: Long = _

    /** With `--plugin pgoutput` the synthetic server HONORS the plugin:
      * each txn is rendered as its binary pgoutput message sequence
      * (protocol v2 streams it segment-wise when requested) and folded
      * through the real [[graft.decode.PgoutputTranscoder]] — the same
      * code path a live binary stream takes, not a silent wal2json
      * fallback. */
    private val transcoder: Option[graft.decode.PgoutputTranscoder] =
      if (slot.outputPlugin == "pgoutput")
        Some(new graft.decode.PgoutputTranscoder(
          truncateSkippable = slot.truncateSkippable))
      else None
    /** With `--format-version 2` the wal2json plugin emits per-ACTION
      * lines; the synthetic server serves that true wire shape folded
      * through the real [[graft.decode.Wal2JsonV2Transcoder]] — the same
      * code path a live v2 stream takes. */
    private val v2Transcoder: Option[graft.decode.Wal2JsonV2Transcoder] =
      if (slot.outputPlugin == "wal2json" && slot.formatVersion >= 2)
        Some(new graft.decode.Wal2JsonV2Transcoder(slot.truncateSkippable))
      else None
    private var lastEra: Option[graft.gen.PgoutputGen.Era] = None

    override def createSlotIfAbsent(): Boolean =
      SyntheticReplicationServer.this.synchronized {
        if (slots.contains(slotName)) false
        else { slots(slotName) = 0L; true }
      }

    override def openStream(): Unit =
      SyntheticReplicationServer.this.synchronized {
        require(slots.contains(slotName), s"no slot '$slotName'")
        if (busyOpens > 0) {
          busyOpens -= 1
          throw new SlotBusyException(
            s"replication slot \"$slotName\" is active for another process")
        }
        if (inUse(slotName))
          throw new SlotBusyException(
            s"replication slot \"$slotName\" is active for another process")
        inUse += slotName
        cursor = slots(slotName) // txn ids are lsn-1: resume AFTER the ack
        open = true
      }

    override def readPending(): Option[WalChunk] =
      SyntheticReplicationServer.this.synchronized {
        require(open, "stream not open")
        if (recoveryReads > 0) {
          recoveryReads -= 1
          throw new RecoveryModeException("the database system is in recovery mode")
        }
        if (cursor >= nTxns) None
        else {
          val t = ChangeStreamGen.txn(genCfg, cursor)
          cursor += 1
          val line = transcoder match {
            case Some(tr) =>
              import graft.gen.PgoutputGen
              val msgs =
                if (slot.protoVersion >= 2) {
                  val (segs, commit, e) =
                    PgoutputGen.streamedTxnMessages(genCfg, t, lastEra, 2)
                  lastEra = Some(e)
                  segs.flatten :+ commit
                } else {
                  val (m, e) = PgoutputGen.txnMessages(genCfg, t, lastEra)
                  lastEra = Some(e)
                  m
                }
              WalEnvelope.foldOne(msgs, tr.feed, t.lsn)
            case None => v2Transcoder match {
              case Some(tr) =>
                // true v2 wire shape (no positions in-band); foldOne
                // splices the position, exactly as the live boundary does
                WalEnvelope.foldOne(
                  graft.gen.Wal2JsonV2Gen.txnLines(genCfg, t), tr.feed, t.lsn)
              case None => ChangeStreamGen.renderLine(genCfg, t)
            }
          }
          Some(WalChunk(t.lsn, line))
        }
      }

    // Delivered-through semantics (see the trait contract): never runs
    // ahead of an undelivered chunk. Only a fully-drained stream reports
    // the padding (slot-irrelevant WAL beyond the last deliverable chunk);
    // txn ids are lsn-1, so mid-stream the delivered-through position is
    // exactly `cursor`. The naive form `nTxns + padding` would model the
    // reference's pg_current_wal_lsn probe — an idle ack of it skips any
    // transaction committed between the consumer's last drain and the
    // probe, permanently (the slot never resends below confirmed-flush).
    override def currentLsn(): Long =
      SyntheticReplicationServer.this.synchronized {
        if (cursor >= nTxns) nTxns + currentLsnPadding else cursor
      }

    override def ack(lsn: Long): Unit =
      SyntheticReplicationServer.this.synchronized {
        require(open, "stream not open")
        // monotone, like a real slot: status updates never move backwards
        slots(slotName) = math.max(slots(slotName), lsn)
      }

    override def close(): Unit =
      SyntheticReplicationServer.this.synchronized {
        transcoder.foreach(t => try t.close() catch { case _: Exception => () })
        if (open) { inUse -= slotName; open = false }
      }
  }
}
