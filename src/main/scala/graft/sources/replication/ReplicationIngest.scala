package graft.sources.replication

import org.apache.hadoop.conf.Configuration
import graft.sources.WalStager

/** CUMULATIVE ingest totals over this instance's lifetime (every pump()
  * returns the running totals, not a per-pump delta): chunks staged,
  * segments published, last acked LSN. */
final case class IngestStats(chunks: Long, segments: Long, ackedLsn: Long)

/**
 * The consume half of a live CDC deployment — the reference's
 * readSlotWriteToKinesis loop (SlotReaderKinesisWriter.java:120-210)
 * re-targeted at the engine's staging directory: pull pending chunks off a
 * [[ReplicationConnector]], append them to a [[WalStager]], and send the
 * standby status update (ack) ONLY after the segment holding them is
 * durably published. `graft-wal` then tails the segments exactly as it
 * would any staged WAL.
 *
 * Delivery contract:
 *  - at-least-once INTO the staging dir: a crash between publish and ack
 *    redelivers from the server-held cursor, so a suffix can appear twice
 *    (in later-named segments). The lake's per-bucket LSN watermark gate +
 *    keep-last dedup make the duplicates no-ops — exactly-once END TO END.
 *  - acks are monotone and never exceed a published segment boundary,
 *    except for the reference's idle fast-forward (no pending work for
 *    this slot => confirm the server's current position so the server can
 *    reclaim WAL, SlotReaderKinesisWriter.java:188-208).
 *
 * Slot-busy opens retry on [[SlotConfig.slotBusyRetryLimit]] /
 * [[SlotConfig.slotBusyRetrySleepMs]] — the reference's blue/green overlap
 * budget (PostgresConnector.java:164-215).
 */
final class ReplicationIngest(
    connector: ReplicationConnector,
    walDir: String,
    hadoopConf: Configuration,
    slot: SlotConfig,
    rollBytes: Long = 64L * 1024 * 1024,
    flushChunks: Long = 10000L,
    nowMs: () => Long = () => System.currentTimeMillis(),
    sleepMs: Long => Unit = Thread.sleep) {

  private val stager = new WalStager(walDir, hadoopConf, rollBytes)
  private var lastAppendedLsn = -1L
  private var ackedLsn = -1L
  private var chunksSinceRoll = 0L
  private var lastFlushMs = nowMs()
  private var chunks = 0L

  /** Create the slot if absent (idempotent, O1) and open the stream,
    * waiting out a slot-busy holder within the configured budget. */
  def start(): Unit = {
    connector.createSlotIfAbsent()
    var tries = slot.slotBusyRetryLimit
    var opened = false
    while (!opened) {
      try { connector.openStream(); opened = true }
      catch {
        case e: SlotBusyException =>
          tries -= 1
          if (tries <= 0) throw e
          sleepMs(slot.slotBusyRetrySleepMs)
      }
    }
  }

  /** Publish whatever is buffered and ack up to it. After an explicit roll
    * every appended line is durable (auto-rolled prefixes included), so the
    * ack position is simply the last appended LSN. */
  private def publishAndAck(): Unit = {
    stager.roll()
    if (lastAppendedLsn > ackedLsn) {
      connector.ack(lastAppendedLsn)
      ackedLsn = lastAppendedLsn
    }
    lastFlushMs = nowMs()
  }

  /** Drain everything currently pending on the stream, publishing +
    * acking every `flushChunks` chunks — or every
    * [[SlotConfig.statusIntervalMs]] of wall time during a long drain,
    * whichever comes first (the reference's standby-status cadence: the
    * server sees progress at a bounded interval even when the stream is
    * firehosing; transport-level keepalive on a quiet socket is the
    * connector binding's own job) — and once at the end; when the stream
    * is idle past [[SlotConfig.idleSlotIntervalMs]], fast-forward the ack
    * to the server's current LSN. @return stats for this pump */
  def pump(): IngestStats = {
    var pending = connector.readPending()
    while (pending.isDefined) {
      val c = pending.get
      stager.append(c.line)
      lastAppendedLsn = c.lsn
      chunks += 1; chunksSinceRoll += 1
      if (chunksSinceRoll >= flushChunks ||
          nowMs() - lastFlushMs > slot.statusIntervalMs) {
        publishAndAck(); chunksSinceRoll = 0
      }
      pending = connector.readPending()
    }
    if (chunksSinceRoll > 0) { publishAndAck(); chunksSinceRoll = 0 }
    else if (nowMs() - lastFlushMs > slot.idleSlotIntervalMs) {
      // Idle fast-forward: nothing pending for this slot — confirm the
      // server's current position so it can reclaim WAL upstream. Safe
      // ONLY because currentLsn() is contractually delivered-through (see
      // ReplicationConnector): everything at or below it already came out
      // of readPending() and is staged. An out-of-band probe such as
      // pg_current_wal_lsn here would permanently skip any transaction
      // that committed between the drain above and the probe.
      val lsn = connector.currentLsn()
      if (lsn > ackedLsn) { connector.ack(lsn); ackedLsn = lsn }
      lastFlushMs = nowMs()
    }
    // segment count comes from the stager so AUTO-rolls (rollBytes hit
    // inside append) are included, not just explicit publish-cadence rolls
    IngestStats(chunks, stager.publishedSegments, ackedLsn)
  }

  /** Publish any tail and release the slot. Each step is individually
    * best-effort: a dead stream must not abort the later cleanups (a
    * failed ack would otherwise leave the stager's .tmp file behind and
    * the connector's resources held — the slot redelivers anything
    * unacked, so skipping a final ack is safe; skipping close is a leak).
    * The first failure is rethrown AFTER all cleanups ran. */
  def close(): Unit = {
    var first: Throwable = null
    def attempt(step: => Unit): Unit =
      try step catch { case e: Exception => if (first == null) first = e }
    attempt(publishAndAck())
    attempt(stager.close())
    attempt(connector.close())
    if (first != null) throw first
  }
}
