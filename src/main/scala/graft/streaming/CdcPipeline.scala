package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.lake.LakeTable

/**
 * The end-to-end CDC pipeline: WAL-segment tail -> decode -> LSN-ordered
 * MERGE upsert, as a Structured Streaming query.
 *
 * Maps the reference's runLoop (SlotReaderKinesisWriter.java:84-209):
 *  - WAL tail (readPending, PostgresConnector.java:106-108) ==> a file
 *    streaming source over append-only JSONL WAL segments; the streaming
 *    checkpoint's offset log replaces the replication slot's restart LSN;
 *  - decode + table filter ==> [[ChangeDecoder]];
 *  - the Kinesis sink + LSN-ack callback (SlotReaderCallback.java:70-85)
 *    ==> foreachBatch MERGE with fenced snapshot commit; a batch is the unit
 *    of acknowledgment, and because the sink itself stores per-bucket LSN
 *    watermarks, a replayed batch is a no-op: exactly-once table state,
 *    strictly stronger than the reference's at-least-once delivery;
 *  - supervision/retry (O13/O14) ==> Spark task retries + restart from
 *    checkpoint (see CheckpointResumeSpec).
 *
 * State stays bounded: no mapGroupsWithState — all long-lived state lives in
 * the sink table snapshots and the checkpoint, so 10^10 events need no
 * executor-resident state.
 */
final case class TableTarget(
    name: String,
    table: LakeTable,
    schema: StructType,
    keyColumns: Seq[String],
    nBuckets: Int,
    renameMap: Map[String, String] = Map.empty,
    // PARTIAL-UPDATE (unchanged-TOAST) table property — see Snapshot
    partialUpdates: Boolean = false)

class CdcPipeline(
    spark: SparkSession,
    walDir: String,
    checkpointDir: String,
    targets: Seq[TableTarget],
    relevantTables: Set[String] = Set.empty,
    metricsPath: Option[String] = None,
    maxFilesPerTrigger: Option[Int] = None,
    strictDecode: Boolean = true,
    // delete WAL segments once their offset is durably committed (the
    // reference's LSN-ack WAL release); safe because offsets are segment
    // names and the sink is idempotent
    walRetention: Boolean = false,
    walSplitBytes: Option[Long] = None,
    // > 0 forces the explicit two-phase (salted) keep-last dedup for
    // streams whose hot keys overflow map-side hash tables
    saltBuckets: Int = 0,
    // byte-based admission control (bounds batch memory when segment
    // sizes vary; at least one segment always admitted)
    maxBytesPerTrigger: Option[Long] = None,
    // Multi-target strategy switch: with >= this many targets the batch is
    // DEMUXED once (scan + decode + scratch write partitioned by table,
    // per-target partition-pruned applies — ONE source scan no matter how
    // many tables); below it each target applies from its own lazy filter
    // of the decoded batch (N re-decodes, ZERO scratch writes).
    // MultiTableBench measured the local crossover: materializing the wide
    // payload costs about what ~8 re-decodes cost on one box (lesson 9),
    // so small fleets prefer the lazy path — but every lazy target re-READS
    // the raw WAL, so when the source is a remote object store the demux's
    // single scan wins on network bytes alone from N=2 up. Default favors
    // the deployment shape (remote source); single-box latency-sensitive
    // small-N runs can raise it.
    demuxMinTables: Int = 2) {

  // Idempotent table creation (reference tolerates slot-already-exists,
  // PostgresConnector.java:90-97).
  targets.foreach(t => t.table.create(t.schema, t.keyColumns, t.nBuckets,
    t.renameMap, partialUpdates = t.partialUpdates))

  @volatile private var batchStats =
    List.empty[(Long, String, MergeEngine.MergeStats)]
  def stats: List[(Long, String, MergeEngine.MergeStats)] = batchStats

  private def emitMetrics(batchId: Long, tableName: String,
                          s: MergeEngine.MergeStats): Unit = {
    // bounded: a continuous query (graft-lake sink on a ProcessingTime
    // trigger) runs micro-batches indefinitely — unbounded prepend would
    // grow driver memory with uptime. The durable record is the JSONL.
    batchStats = ((batchId, tableName, s) :: batchStats).take(10000)
    metricsPath.foreach { p =>
      val line = s"""{"batchId":$batchId,"table":"$tableName","committed":${s.committed},""" +
        s""""snapshotId":${s.snapshotId},"appliedKeys":${s.appliedKeys},""" +
        s""""inserted":${s.inserted},"updated":${s.updated},"deleted":${s.deleted},""" +
        s""""minLsn":${s.minLsn},"maxLsn":${s.maxLsn},"touchedBuckets":${s.touchedBuckets}}""" + "\n"
      val path = Paths.get(p)
      Option(path.getParent).foreach(Files.createDirectories(_))
      Files.writeString(path, line, StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  /** The per-micro-batch apply, also callable directly on a static batch of
    * WAL lines (used by tests and the bench harness).
    *
    * Strict decode parity with the reference (required=true aborts the
    * loop) costs ZERO extra parses: validation rides the single decode pass
    * as observe/CollectMetrics counts (inline raise_error guards are
    * legally optimizable away, and a separate validation query would parse
    * every line twice more — it measurably dominated decode CPU). The
    * count is checked after the batch's first action and BEFORE any write
    * or commit (MergeEngine's validate hook); sample bad lines are fetched
    * by a second query only on the failure path. */
  def processBatch(lines: DataFrame, batchId: Long): Unit = {
    // Deliberately NOT cached: the decoded events carry wide parallel
    // arrays + full content — caching them costs more memory/GC than the
    // (CPU-parallel, linearly-scaling) re-decode it would save. The merge
    // engine caches only the deduped, typed rows.
    val decoded =
      if (strictDecode) ChangeDecoder.decodeValidated(lines, relevantTables)
      else ChangeDecoder.ValidatedDecode(
        ChangeDecoder.decode(lines, relevantTables, strict = false), () => 0L)
    def validate(): Unit = {
      val nBad = decoded.malformedCount()
      if (nBad > 0) {
        val samples = ChangeDecoder.malformedLines(lines) // failure path only
        throw new graft.decode.MalformedBatchException(
          s"batch $batchId contains $nBad " +
            s"${ChangeDecoder.MalformedMessagePrefix} line(s): " +
            samples.mkString(" | "))
      }
    }
    if (targets.size < demuxMinTables || targets.size == 1) {
      // Lazy path: each target filters the decoded batch itself. N targets
      // = N decode passes (cheap — lesson 9) but also N SOURCE scans, so
      // this is the small-N / local-source shape. Validation rides the
      // FIRST target's full-size action (the filter applies post-decode,
      // so the observe counts are complete) and aborts before ANY commit.
      targets.zipWithIndex.foreach { case (t, i) =>
        val forTable = decoded.events.filter(col("table") === t.name)
        val stats = MergeEngine.applyBatch(t.table, forTable,
          saltBuckets = saltBuckets,
          validate = if (i == 0) validate _ else () => ())
        emitMetrics(batchId, t.name, stats)
      }
    } else processMultiTable(decoded.events, validate _, batchId)
  }

  /**
   * SINGLE-PASS multi-table apply. The reference's slot carries EVERY
   * table's changes in one stream (`relevantTables` is a SET, applied per
   * change — SlotReaderKinesisWriter.java:281-287) and its consumer
   * handles the mixed stream (SlotMessageRecordProcessor.java:42-88); the
   * lazy per-target filter above would re-execute the WAL scan AND the
   * ParseWalLine decode once per target — 50 tables = 50 full decodes of
   * the same batch, the dominant CPU at 10^10 events.
   *
   * Instead the decoded batch is DEMUXED once: one job scans + decodes +
   * writes the events as parquet partitioned by `table` under a
   * batch-scoped scratch dir (shuffle-free — each task appends to its
   * tables' partition dirs), the strict-decode observe counts riding that
   * single pass. Each target then applies from ONLY its partition
   * directory (columnar, partition-pruned — O(its changes), zero
   * re-decode). Exactly-once is untouched: the per-table LSN watermark
   * fences gate replays individually, so a crash BETWEEN per-table
   * commits replays the batch, no-ops the already-committed tables, and
   * completes the rest; the scratch dir is rebuilt idempotently on replay
   * and removed when the batch finishes (or fails).
   *
   * Why not persist(): caching the wide decoded payloads measurably costs
   * more than one recompute (CLAUDE.md lesson 9) and every target would
   * still scan the FULL batch; the partitioned write gives each target
   * only its slice, and the write itself is the single full-size pass the
   * single-table path pays anyway (its delta write).
   */
  private def processMultiTable(events: DataFrame, validate: () => Unit,
                                batchId: Long): Unit = {
    val scratch = s"$checkpointDir/_demux/batch-$batchId"
    val scratchPath = new org.apache.hadoop.fs.Path(scratch)
    val fs = scratchPath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(scratchPath, true) // crash replay rebuilds from scratch
    try {
      // the ONE full-size pass: scan + decode + demux write
      events.write.partitionBy("table").parquet(scratch)
      validate() // observe counts are complete; abort BEFORE any apply
      val eventSchema = org.apache.spark.sql.types.StructType(
        events.schema.fields.filterNot(_.name == "table"))
      targets.foreach { t =>
        // explicit schema (no footer-inference job — CLAUDE.md lesson 20);
        // basePath keeps `table` a partition column so the equality filter
        // partition-prunes to exactly one directory at planning time
        val slice = spark.read
          .option("basePath", scratch)
          .schema(eventSchema.add("table", "string"))
          .parquet(scratch)
          .filter(col("table") === t.name)
          .drop("table")
        val stats = MergeEngine.applyBatch(t.table, slice,
          saltBuckets = saltBuckets)
        emitMetrics(batchId, t.name, stats)
      }
    } finally fs.delete(scratchPath, true)
  }

  /** Start the streaming query tailing the WAL segment directory.
    *
    * Uses the graft-wal DSv2 source, NOT the generic file source: the file
    * source orders files by modification time, so a healed/rewritten old
    * segment would be delivered AFTER newer ones — and the sink's LSN
    * watermark gate would then (correctly, but fatally) drop it. graft-wal
    * delivers segments in name (= LSN) order regardless of mtime. */
  def start(trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val reader = spark.readStream.format("graft-wal")
    maxFilesPerTrigger.foreach(m => reader.option("maxSegmentsPerTrigger", m))
    maxBytesPerTrigger.foreach(b => reader.option("maxBytesPerTrigger", b))
    if (walRetention) reader.option("retention", "delete")
    walSplitBytes.foreach(b => reader.option("splitBytes", b))
    val lines = reader.load(walDir)
    lines.writeStream
      .queryName("graft-cdc")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((df: DataFrame, id: Long) => processBatch(df, id))
      .start()
  }

  /** Run to completion over currently-available segments and stop. */
  def runAvailable(): Unit = {
    val listener = new ProgressListener(metricsPath)
    spark.streams.addListener(listener)
    try {
      val q = start(Trigger.AvailableNow())
      q.awaitTermination()
    } finally spark.streams.removeListener(listener)
  }

  /**
   * Supervised run — the reference's outer retry loop (O13, runLoop at
   * SlotReaderKinesisWriter.java:84-88 with exception handling at :121-167)
   * WITH its error taxonomy: the reference distinguishes recovery-mode
   * (57P03: sleep and retry until the database heals) from slot-busy
   * (55006: 30 patient retries for the other consumer to release) from
   * fatal (SlotReaderKinesisWriter.java:134-144, PostgresConnector.java:
   * 164-215). The engine's analogs:
   *
   *  - [[CdcPipeline.FailureKind.DataError]] — malformed wal2json input:
   *    retrying helps only after an operator repairs the WAL (the healed-
   *    segment workflow), so it gets the small `maxRestarts` budget;
   *  - [[CdcPipeline.FailureKind.Contention]] — snapshot-fencing conflicts
   *    that survived applyBatch's inner retries (another writer holds the
   *    table): patient, like slot-busy — `contentionRestarts` attempts;
   *  - [[CdcPipeline.FailureKind.Transient]] — everything else (flakes):
   *    `maxRestarts` with backoff.
   *
   * A failed query restarts from the checkpoint; exactly-once fencing makes
   * any replayed work a no-op, so supervision is safe by construction.
   * Budgets are per-class: a poisoned segment cannot eat the restart budget
   * a genuine transient flake would need, and vice versa.
   *
   * @return number of restarts performed
   */
  def runSupervised(maxRestarts: Int = 3, backoffMs: Long = 1000L,
                    contentionRestarts: Int = 30,
                    onRestart: Int => Unit = _ => ()): Int =
    CdcPipeline.supervise(() => runAvailable(),
      maxRestarts, backoffMs, contentionRestarts, onRestart)
}

object CdcPipeline {

  /** The budgeted restart loop itself, usable with ANY run body (the
    * pipeline's own runAvailable, the CLI's connector-mode query, ...):
    * classify the failure, charge the matching per-class budget, back off,
    * retry — identical semantics everywhere, so the same fault never
    * survives in one run mode and dies in another. @return restarts */
  def supervise(run: () => Unit,
                maxRestarts: Int = 3, backoffMs: Long = 1000L,
                contentionRestarts: Int = 30,
                onRestart: Int => Unit = _ => ()): Int = {
    import FailureKind._
    var dataErrors = 0; var contentions = 0; var transients = 0
    var total = 0
    while (true) {
      try {
        run()
        return total
      } catch {
        case e: Exception =>
          val canRetry = classify(e) match {
            case DataError => dataErrors += 1; dataErrors <= maxRestarts
            case Contention => contentions += 1; contentions <= contentionRestarts
            case Transient => transients += 1; transients <= maxRestarts
          }
          if (!canRetry) throw e // budget exhausted: the reference's fatal path
          total += 1
          Thread.sleep(backoffMs)
          onRestart(total)
      }
    }
    total // unreachable
  }

  /** Failure classes for supervision (see [[CdcPipeline.runSupervised]]). */
  sealed trait FailureKind
  object FailureKind {
    /** Malformed input — a repair-then-retry case, never a silent skip. */
    case object DataError extends FailureKind
    /** Lost the single-writer fencing race persistently (slot-busy analog). */
    case object Contention extends FailureKind
    /** Anything else — a transient flake worth a small retry budget. */
    case object Transient extends FailureKind
  }

  /** Classify by walking the cause chain (streaming wraps the batch's
    * exception in StreamingQueryException). */
  def classify(e: Throwable): FailureKind = {
    var c: Throwable = e
    while (c != null) {
      c match {
        case _: graft.decode.MalformedBatchException =>
          return FailureKind.DataError
        // malformed BINARY plugin input (pgoutput codec/transcoder) is as
        // deterministic as malformed wal2json: the slot redelivers the
        // same bytes on every retry — repair-then-retry, never Transient
        case _: graft.decode.Pgoutput.MalformedPgoutputException =>
          return FailureKind.DataError
        // same determinism for the wal2json v2 per-action grammar
        case _: graft.decode.Wal2JsonV2.MalformedWal2JsonV2Exception =>
          return FailureKind.DataError
        // fallback for malformed input surfaced by the IN-PLAN raise_error
        // guard (decode(strict=true) without the explicit validation pass):
        // Spark raises its own exception type there, so the message text is
        // the only signal — the prefix is a shared constant with
        // ChangeDecoder's guards so a reword cannot break classification
        case other if other.getMessage != null &&
            other.getMessage.contains(
              graft.decode.ChangeDecoder.MalformedMessagePrefix) =>
          return FailureKind.DataError
        // ANSI-mode typed-key cast failure: a well-formed envelope carrying
        // a wrongly-typed key value ("abc" where the key column is int)
        // fails deterministically at MergeEngine's key cast — retrying
        // replays the same bytes, so burning the Transient budget on it
        // would mask the repair case the taxonomy exists to surface
        case st: org.apache.spark.SparkThrowable
            if st.getCondition != null &&
              st.getCondition.startsWith("CAST_INVALID_INPUT") =>
          return FailureKind.DataError
        case _: graft.lake.CommitConflictException =>
          return FailureKind.Contention
        // live-replication analogs: slot held by another consumer is the
        // reference's 55006 (patient), recovery mode its 57P03 (transient)
        case _: graft.sources.replication.SlotBusyException =>
          return FailureKind.Contention
        case _: graft.sources.replication.RecoveryModeException =>
          return FailureKind.Transient
        case _ => ()
      }
      c = if (c.getCause eq c) null else c.getCause
    }
    FailureKind.Transient
  }
}

/**
 * Per-micro-batch metrics emission (north rule), the engine analog of the
 * reference's status-interval heartbeat (O15, PostgresConnector.java:217-229):
 * rates and durations from Structured Streaming's progress events, appended
 * as JSONL next to the per-batch lineage records.
 */
class ProgressListener(metricsPath: Option[String])
    extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._

  @volatile var progressed: Int = 0

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    progressed += 1
    val p = e.progress
    metricsPath.foreach { mp =>
      val path = java.nio.file.Paths.get(mp + ".progress.jsonl")
      Option(path.getParent).foreach(java.nio.file.Files.createDirectories(_))
      val line = s"""{"batchId":${p.batchId},"numInputRows":${p.numInputRows},""" +
        s""""processedRowsPerSecond":${p.processedRowsPerSecond},""" +
        s""""durationMs":${Option(p.durationMs.get("triggerExecution")).getOrElse(-1L)}}""" + "\n"
      java.nio.file.Files.writeString(path, line,
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    }
  }
}
