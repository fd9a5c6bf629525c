package graft.sinks

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StringType
import graft.lake.LakeTable
import graft.sources.{LakeFeedRelation, LakeRelation}
import graft.streaming.{CdcPipeline, TableTarget}

/**
 * First-class streaming SINK for the lake table: `writeStream
 * .format("graft-lake").option("path", tableRoot)` replaces the foreachBatch
 * wiring — the decode -> validate -> LSN-gated MERGE -> fenced-commit
 * protocol becomes a named connector instead of user code.
 *
 * Implemented against the stable micro-batch Sink seam (`addBatch(batchId,
 * df)`): a CDC MERGE is a multi-stage Spark job over the whole batch
 * (dedup aggregation, delta write, stats readback), which is exactly the
 * DataFrame-level contract this API hands over — the per-row DataWriter
 * surface of DSv2 StreamingWrite cannot launch the jobs a MERGE needs.
 * This is the same seam production lakehouse sinks use for their streaming
 * writers.
 *
 * The target table must already exist (create it with [[LakeTable.create]]
 * or the CLI) — schema, key columns, bucket count, and rename map all come
 * from the table's own current snapshot, so the sink needs no schema
 * options and can never disagree with the table it writes.
 *
 * Exactly-once: the sink's idempotency does not depend on the checkpoint —
 * every bucket's LSN high watermark fences replayed events, so a replayed
 * or concurrently-raced batch commits nothing (verified by the existing
 * fencing/replay suites). Input: the WAL-line schema produced by the
 * `graft-wal` source (`value: string`).
 *
 * Options:
 *   - `path` (required): table root (any Hadoop filesystem scheme)
 *   - `table` (required): the wal2json table name this sink applies
 *   - `metricsPath` (optional): JSONL per-batch lineage destination
 *   - `strict` (default true): abort the batch on any malformed WAL line
 *   - `saltBuckets` (default 0): explicit two-phase salted dedup for
 *     hot-key streams
 *   - `maxDeltas` (default 64): delta-file fan-in cap per bucket (the
 *     compaction TRIGGER is `maxDeltaBytes`, default 32 MiB)
 *   - `manifestThreshold` (default 4096): live files before snapshots
 *     spill to distributed per-bucket manifests
 */
class LakeSinkProvider extends StreamSinkProvider with RelationProvider
    with CreatableRelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-lake"

  /** Batch READ: `spark.read.format("graft-lake")` (merged keep-last state,
    * `asOf` time travel) or the batch change feed (`changes=true` with
    * `fromSnapshot`/`toSnapshot`). See [[graft.sources.LakeRelation]]. */
  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-lake read requires option 'path'"))
    val table = new LakeTable(sqlContext.sparkSession, root)
    if (!table.exists) throw new IllegalArgumentException(
      s"graft-lake read: no table at $root — create it first (LakeTable.create)")
    // Options that silently do nothing are worse than errors: a feed range
    // without changes=true would hand back the ENTIRE merged table to a
    // consumer expecting a delta, and asOf on a feed/meta read would
    // time-travel nothing. Reject wrong combinations loudly.
    def reject(context: String, names: String*): Unit = {
      val stray = names.filter(parameters.contains)
      if (stray.nonEmpty) throw new IllegalArgumentException(
        s"graft-lake read: option(s) ${stray.mkString(", ")} have no effect " +
          s"with $context — remove them or change the read mode")
    }
    parameters.get("meta") match {
      case Some("snapshots") =>
        reject("meta='snapshots'", "asOf", "changes", "fromSnapshot", "toSnapshot")
        new graft.sources.LakeHistoryRelation(sqlContext, table,
          parameters.get("limit").map(_.toInt).getOrElse(100))
      case Some(other) => throw new IllegalArgumentException(
        s"graft-lake read: unknown meta '$other' (supported: snapshots)")
      case None if parameters.get("changes").exists(_.toBoolean) =>
        reject("changes=true", "asOf")
        val to = parameters.get("toSnapshot").map(_.toLong)
          .getOrElse(table.currentSnapshotId.get)
        val from = parameters.get("fromSnapshot").map(_.toLong).getOrElse(-1L)
        new LakeFeedRelation(sqlContext, table, from, to)
      case None =>
        reject("a state read (no changes=true)", "fromSnapshot", "toSnapshot")
        new LakeRelation(sqlContext, table, parameters.get("asOf").map(_.toLong))
    }
  }

  /** Batch WRITE: `df.write.format("graft-lake").mode("append")` — one
    * batch of WAL lines (`value: string`, the streaming sink's contract)
    * through the identical decode -> validate -> LSN-fenced MERGE ->
    * fenced-commit pipeline. The one meaningful mode is Append: a CDC
    * apply is inherently additive, and the LSN watermark fence makes a
    * re-save of the same batch a no-op — batch backfills get the same
    * exactly-once the streaming sink has. Overwrite/Ignore are refused
    * loudly (truncating a CDC lake is a maintenance decision, not a
    * DataFrameWriter default). Returns the table's read relation. */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    if (mode != SaveMode.Append) throw new IllegalArgumentException(
      s"graft-lake batch write supports SaveMode.Append only (the LSN fence " +
        s"already makes replayed batches no-ops); got $mode — use " +
        "df.write.mode(\"append\")")
    val valueField = data.schema.fields.find(_.name == "value")
    if (!valueField.exists(_.dataType == StringType))
      throw new IllegalArgumentException(
        "graft-lake batch write expects WAL lines as a `value: string` " +
          s"column (the graft-wal source's shape); got ${data.schema.simpleString}")
    val sink = createSink(sqlContext, parameters, Nil, OutputMode.Append())
      .asInstanceOf[LakeSink]
    sink.applyBatchNow(data)
    new LakeRelation(sqlContext, sink.lakeTable, asOf = None)
  }

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-lake sink requires option 'path'"))
    val tableName = parameters.getOrElse("table",
      throw new IllegalArgumentException("graft-lake sink requires option 'table'"))
    val table = new LakeTable(sqlContext.sparkSession, root,
      maxDeltasPerBucket = parameters.get("maxDeltas").map(_.toInt).getOrElse(64),
      maxDeltaBytesPerBucket = parameters.get("maxDeltaBytes").map(_.toLong)
        .getOrElse(32L * 1024 * 1024),
      manifestThresholdFiles =
        parameters.get("manifestThreshold").map(_.toInt).getOrElse(4096),
      inlineCompaction =
        parameters.get("inlineCompaction").forall(_.toBoolean))
    // root-only: keyColumns/nBuckets are root fields; a full currentSnapshot
    // would resolve O(buckets) manifests on a distributed-manifest table
    val snap = table.currentRootSnapshot.getOrElse(throw new IllegalArgumentException(
      s"graft-lake sink: no table at $root — create it first (LakeTable.create)"))
    new LakeSink(table, tableName, snap.keyColumns, snap.nBuckets,
      parameters.get("metricsPath"),
      parameters.get("strict").forall(_.toBoolean),
      parameters.get("saltBuckets").map(_.toInt).getOrElse(0),
      // honor the caller's table filter — defaulting silently to the one
      // target table made `--relevant-tables` a no-op in connector mode
      parameters.get("relevantTables")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
        .filter(_.nonEmpty) // blank value = absent, never Set("") (which
                            // would silently filter out EVERY event)
        .getOrElse(Set(tableName)))
  }
}

class LakeSink(table: LakeTable, tableName: String, keyColumns: Seq[String],
               nBuckets: Int, metricsPath: Option[String], strict: Boolean,
               saltBuckets: Int,
               relevantTables: Set[String]) extends Sink {

  // Reuse the pipeline's per-batch apply verbatim: single-pass validated
  // decode, observe-based malformed gate, LSN-fenced MERGE, lineage JSONL.
  private val pipeline = {
    val snap = table.currentRootSnapshot.get // schema/renameMap: root fields
    new CdcPipeline(table.spark, walDir = "", checkpointDir = "",
      targets = Seq(TableTarget(tableName, table, snap.schema,
        keyColumns, nBuckets, snap.renameMap)),
      relevantTables = relevantTables,
      metricsPath = metricsPath,
      strictDecode = strict,
      saltBuckets = saltBuckets)
  }

  override def addBatch(batchId: Long, data: DataFrame): Unit =
    // the Sink API hands a still-streaming-flagged DataFrame; re-wrap the
    // same physical rows as a batch DF (what ForeachBatchSink itself does)
    // so the single-pass observe validation and the batch writes work
    pipeline.processBatch(org.apache.spark.sql.graft.BatchRewrap.asBatch(data), batchId)

  /** Batch-write entry ([[LakeSinkProvider.createRelation]]): already-batch
    * data, batch id labeled by the snapshot it will produce (metrics/errors
    * name a real commit instead of a synthetic stream position). */
  private[sinks] def applyBatchNow(data: DataFrame): Unit =
    pipeline.processBatch(data,
      table.currentSnapshotId.map(_ + 1).getOrElse(0L))

  private[sinks] def lakeTable: LakeTable = table

  override def toString: String = s"GraftLakeSink($tableName -> ${table.root})"
}
