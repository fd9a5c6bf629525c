package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic

/**
 * Re-wraps the DataFrame a V1 streaming `Sink.addBatch` receives — which
 * still carries `isStreaming = true` and therefore rejects batch-only
 * features (Observation, DataFrameWriter) — as a plain BATCH DataFrame over
 * the SAME physical rows. This is byte-for-byte what Spark's own
 * ForeachBatchSink does before handing the micro-batch to user code
 * (sql/core ForeachBatchSink.addBatch: queryExecution.toRdd +
 * internalCreateDataFrame(isStreaming = false)); the helper lives under
 * org.apache.spark.sql only because internalCreateDataFrame is
 * private[sql] — the established pattern for external lakehouse sinks.
 */
object BatchRewrap {
  def asBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = false)
  }

  /** The inverse direction, for a V1 streaming `Source.getBatch`: the engine
    * asserts the DataFrame a source returns carries `isStreaming = true`
    * (MicroBatchExecution's runBatch assert), but the batch is *computed* —
    * a DataFrame query over lake metadata — not a file-stream relation.
    * Re-wrap the computed plan's rows as a streaming-flagged DataFrame, the
    * same pattern production lakehouse sources use for their change feeds
    * (Delta's DeltaSource.getBatch → createDataFrame(isStreaming = true)). */
  def asStream(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }
}
