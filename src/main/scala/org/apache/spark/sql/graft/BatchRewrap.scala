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
}
