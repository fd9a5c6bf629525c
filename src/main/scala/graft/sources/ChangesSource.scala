package graft.sources

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.SerializedOffset
import org.apache.spark.sql.graft.BatchRewrap
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types._
import graft.lake.LakeTable

/**
 * Streaming CHANGE DATA FEED source: `readStream.format("graft-changes")
 * .option("path", tableRoot)` turns a lake table into a live CDC *source*
 * for downstream incremental consumers — the net keep-last row changes of
 * each commit (including delete tombstones), delivered in snapshot order,
 * exactly once per snapshot. This closes the loop the reference leaves to
 * Kinesis: pg2k4j's consumers tail the stream it publishes
 * (reference: SlotReaderKinesisWriter.java — the Kinesis stream IS its
 * change feed); here the table's own commit log is the stream, so a second
 * engine instance can mirror the table with no extra infrastructure
 * ([[graft.streaming.Mirror]]).
 *
 * Built on the V1 `Source` seam (the same stable API the `graft-lake` sink
 * uses): a micro-batch of this source IS a DataFrame —
 * [[LakeTable.changes]] over a snapshot range, O(changed bytes), zero
 * manifest IO — which is exactly the contract `getBatch(start, end)` hands
 * over. The DSv2 per-row PartitionReader surface would force re-implementing
 * the feed's projection row-by-row outside Catalyst. Admission control and
 * Trigger.AvailableNow are implemented natively via
 * `SupportsAdmissionControl` / `SupportsTriggerAvailableNow` (the
 * FileStreamSource pattern) — NOT via the v1 `getOffset`, because Spark's
 * AvailableNow wrapper snapshots a v1 source's offset exactly once, which
 * would silently collapse a rate-limited catch-up to its first batch.
 *
 * Offsets are SNAPSHOT IDS — durable names from the table's own commit
 * log, never positions in a directory listing (CLAUDE.md lesson 11): a
 * batch `(start, end]` replays byte-identically forever (until its
 * snapshots are expired), which is what makes checkpoint recovery
 * exactly-once.
 *
 * Options:
 *   - `path` (required): table root (any Hadoop filesystem scheme)
 *   - `fromSnapshot` (default -1): exclusive lower bound — -1 streams the
 *     feed from table creation; `currentSnapshot.snapshotId` streams only
 *     commits after stream start
 *   - `maxSnapshotsPerTrigger` (default unbounded): admission control —
 *     at most this many commits per micro-batch (honored under every
 *     trigger, including AvailableNow)
 *
 * Failure modes are LOUD, never silent:
 *   - schema evolution mid-stream fails the batch with instructions to
 *     restart (a restarted query re-derives the source schema and picks up
 *     the evolved table — the same contract lakehouse streaming sources
 *     document);
 *   - a `fromSnapshot`/checkpoint offset below the retention horizon fails
 *     with FileNotFound when [[LakeTable.changes]] reads the expired root
 *     (feed history lives exactly as long as its snapshots).
 */
class ChangesSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-changes"

  private def tableAnd(sqlContext: SQLContext,
                       parameters: Map[String, String]): (LakeTable, graft.lake.Snapshot) = {
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-changes source requires option 'path' (the lake table root)"))
    val table = new LakeTable(sqlContext.sparkSession, root)
    // root-only: schema + id are all the source needs at open
    val snap = table.currentRootSnapshot.getOrElse(throw new IllegalArgumentException(
      s"graft-changes source: no table at $root — create it first"))
    (table, snap)
  }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val (_, snap) = tableAnd(sqlContext, parameters)
    (shortName(), ChangesSource.feedSchema(snap.schema, snap.partialUpdates))
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val (table, snap) = tableAnd(sqlContext, parameters)
    val from = parameters.get("fromSnapshot").map(_.toLong).getOrElse(-1L)
    require(from >= -1, s"fromSnapshot must be >= -1: got $from")
    val maxSnaps = parameters.get("maxSnapshotsPerTrigger").map(_.toLong)
      .getOrElse(Long.MaxValue)
    require(maxSnaps > 0, s"maxSnapshotsPerTrigger must be positive: got $maxSnaps")
    new ChangesSource(table, snap.schema, from, maxSnaps,
      partialUpdates = snap.partialUpdates)
  }
}

object ChangesSource {
  /** The fixed stream schema: the table's columns (nullable — deletes carry
    * null non-key columns) plus the feed metadata, in [[LakeTable.changes]]
    * output order. PARTIAL-UPDATE tables additionally expose `_cols` (the
    * columns the collapsed tuple actually carried) and `_barrier` (the
    * window contained an insert/delete) — without them a consumer cannot
    * tell an unchanged-TOAST omission from an explicit SQL NULL. */
  def feedSchema(tableSchema: StructType,
                 partialUpdates: Boolean = false): StructType =
    StructType(tableSchema.fields.map(_.copy(nullable = true)) ++ Seq(
      StructField("_lsn", LongType),
      StructField("_seq", IntegerType),
      StructField("_kind", StringType)) ++
      (if (partialUpdates) Seq(
        StructField("_cols", ArrayType(StringType)),
        StructField("_barrier", BooleanType)) else Nil) ++ Seq(
      StructField("_snapshot", LongType)))
}

/** One streaming query's view of a table's change feed. `startSchema` is the
  * table schema at stream start — the stream's schema is FIXED for its
  * lifetime (Spark cannot change a query's schema mid-run), so a batch whose
  * end snapshot evolved the table fails loudly instead of silently dropping
  * the new columns. Stateless between calls: the engine supplies the start
  * offset to `latestOffset`, so a restarted query resumes purely from its
  * checkpoint. */
class ChangesSource(table: LakeTable, startSchema: StructType,
                    fromSnapshot: Long, maxSnapshotsPerTrigger: Long,
                    partialUpdates: Boolean = false)
  extends Source with SupportsAdmissionControl with SupportsTriggerAvailableNow
  with Logging {

  override val schema: StructType =
    ChangesSource.feedSchema(startSchema, partialUpdates)

  /** Fixed at AvailableNow start: the catch-up target. A rate-limited
    * AvailableNow run advances maxSnapshotsPerTrigger per batch until it
    * reaches this, then stops — never past it, even if the table keeps
    * committing. */
  private var availableNowEnd: Option[Long] = None

  // id-only, called EVERY trigger: currentSnapshotId is one directory
  // listing; currentSnapshot would resolve O(buckets) manifests per
  // trigger on a distributed-manifest table
  private def latestTableSnapshot: Long =
    table.currentSnapshotId.getOrElse(-1L)

  private def snapId(o: OffsetV2): Long = o match {
    case s: SnapshotOffset => s.snapshotId
    case s: SerializedOffset => SnapshotOffset.fromJson(s.json).snapshotId
    case other => throw new IllegalArgumentException(
      s"graft-changes: unexpected offset type ${other.getClass.getName}")
  }

  override def initialOffset(): OffsetV2 = SnapshotOffset(fromSnapshot)
  override def deserializeOffset(json: String): OffsetV2 =
    SnapshotOffset.fromJson(json)

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowEnd = Some(latestTableSnapshot)
    logInfo(s"graft-changes AvailableNow: catching up to snapshot " +
      s"${availableNowEnd.get} of ${table.root}")
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** The engine-facing admission point (used under EVERY trigger once the
    * source declares SupportsAdmissionControl): advance at most
    * maxSnapshotsPerTrigger snapshots per batch, never past the
    * AvailableNow target when one is set. */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val startId = Option(start).map(snapId).getOrElse(fromSnapshot)
    val ceiling = availableNowEnd.getOrElse(latestTableSnapshot)
    // saturating add: a huge non-sentinel cap (e.g. Long.MaxValue - 1) must
    // mean "unbounded", not wrap negative and stall the stream forever
    val next =
      if (maxSnapshotsPerTrigger >= ceiling - startId) ceiling
      else startId + maxSnapshotsPerTrigger
    SnapshotOffset(math.max(startId, next)) // never regress below start
  }

  /** v1 polling entry point — unreachable once SupportsAdmissionControl is
    * declared (the engine always routes through latestOffset). */
  override def getOffset: Option[Offset] =
    throw new UnsupportedOperationException(
      "graft-changes uses SupportsAdmissionControl.latestOffset")

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(o => snapId(o.asInstanceOf[OffsetV2])).getOrElse(fromSnapshot)
    val to = snapId(end.asInstanceOf[OffsetV2])
    val endSchema = table.snapshotAt(to).schema
    // Evolution is ADDITIVE-or-WIDENING (MergeEngine.evolveSchema appends
    // columns and widens non-key types on the safe parquet lattice), so
    // every older snapshot's schema is a PREFIX of every newer one, column
    // by column AT-OR-BELOW the newer type. A batch whose end era is such
    // a prefix of the stream schema replays fine — older deltas project
    // onto the stream schema with nulls for not-yet-existing columns and
    // widening reads for narrower-era files. Only an end era NEWER than
    // the stream schema (more columns, or a type the stream schema is
    // narrower than — the table evolved mid-stream) must fail: replaying
    // it on the stream schema would silently drop columns or overflow
    // values. This asymmetry is what makes the "restart" advice actually
    // converge — after a restart the stream schema is the newest, so
    // every pinned replay batch (including pre-widening eras) is a prefix
    // of it; strict type equality here would wedge the checkpoint forever
    // on the first pinned narrow-era batch after a widening restart.
    val isPrefixOfStream = endSchema.fields.length <= startSchema.fields.length &&
      endSchema.fields.zip(startSchema.fields).forall { case (e, s) =>
        e.name == s.name && (e.dataType == s.dataType ||
          graft.apply.MergeEngine.widen(e.dataType, s.dataType)
            .contains(s.dataType))
      }
    if (!isPrefixOfStream)
      throw new IllegalStateException(
        s"graft-changes: table schema changed during the stream (snapshot $to " +
          s"has ${endSchema.simpleString}, stream started on " +
          s"${startSchema.simpleString}). Restart the streaming query to pick " +
          "up the evolved schema; the checkpoint offset is preserved.")
    logInfo(s"graft-changes batch: snapshots ($from, $to] of ${table.root}")
    val feed = table.changes(from, to, projectTo = Some(startSchema))
    // getBatch must return a streaming-flagged DataFrame (MicroBatchExecution
    // asserts isStreaming); align columns to the declared schema first.
    BatchRewrap.asStream(
      feed.select(schema.fieldNames.map(org.apache.spark.sql.functions.col)
        .toIndexedSeq: _*))
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"ChangesSource[${table.root}]"
}

/** Offset = snapshot id, serialized as JSON for Spark's offset log. */
case class SnapshotOffset(snapshotId: Long) extends Offset {
  override def json: String = s"""{"snapshot":$snapshotId}"""
}

object SnapshotOffset {
  private val Pattern = """\{"snapshot":(-?\d+)\}""".r
  def fromJson(json: String): SnapshotOffset = json.trim match {
    case Pattern(id) => SnapshotOffset(id.toLong)
    case other => throw new IllegalArgumentException(
      s"graft-changes: cannot parse checkpoint offset '$other' " +
        """(expected {"snapshot":N})""")
  }
}
