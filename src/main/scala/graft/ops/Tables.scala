package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Shared table reader for the query library, with an INPUT-SIZE-ADAPTIVE
 * parallelism floor (optimization guide §2.5: "Input skew: one huge
 * unsplittable file ... repartition immediately after the read").
 *
 * Why: the benchmark inputs are single-file, single-row-group parquet, so a
 * bare scan can never exceed ONE task no matter how many cores the session
 * has (row groups are the parallelism grain; `files.minPartitionNum` cannot
 * split inside one) — and this library's expensive per-row work (md5
 * shingling, JSON render/parse, explode pipelines, decimal aggregation) all
 * hangs DOWNSTREAM of those scans, so it was measured running single-threaded
 * on a 32-core session (listener: 1 task per stage across the headline set).
 *
 * The fix is deliberately conditional, derived from input size, never a
 * constant tuned for local mode: when the scan's total bytes are below
 * `bytesPerCore x defaultParallelism` (i.e. the whole input is small enough
 * that one extra round-robin exchange is trivially cheap, and the cluster
 * would otherwise idle), spread rows across the default parallelism; past
 * the threshold the input already yields enough natural splits and the
 * DataFrame is returned UNCHANGED — at 100 TB the branch is never taken and
 * no extra exchange exists in any plan. Catalyst pushes filters and column
 * pruning through Repartition, so parquet PushedFilters/ReadSchema are
 * unaffected (asserted in plans/r06).
 *
 * `bytesPerCore` is env-overridable (SPARK_GRAFT_SPREAD_BYTES_PER_CORE);
 * setting it to 0 disables the spread everywhere.
 */
private[graft] object Tables {

  private val bytesPerCore: Long =
    sys.env.get("SPARK_GRAFT_SPREAD_BYTES_PER_CORE").map(_.toLong)
      .getOrElse(16L << 20)

  /** Read `dir/name.parquet`; with `spread = true`, tiny inputs are
    * round-robin redistributed (see object doc). Spread is OPT-IN per call
    * site because it was measured BOTH ways at sf0.1: queries whose
    * downstream per-row work is heavy (md5 shingling, JSON render/parse)
    * gained 30-60%, while cheap scan+aggregate queries LOST 30-100% — the
    * extra exchange plus 32 scheduled tasks per downstream stage cost more
    * than the parallelism bought. Only the expression-heavy paths opt in. */
  def read(spark: SparkSession, dir: String, name: String,
           spread: Boolean = false): DataFrame = {
    val path = s"$dir/$name.parquet"
    val df = spark.read.parquet(path)
    val cores = spark.sparkContext.defaultParallelism
    if (spread && bytesPerCore > 0 &&
      inputBytes(spark, path) < bytesPerCore * cores)
      df.repartition(cores)
    else df
  }

  /** Pin a pre-join clustering on `cols` at the session's shuffle partition
    * count. Why: a CPU-dense blocked product join (tiny shuffle BYTES, huge
    * per-row fan-out — the embedding-cosine dots joins) gets serialized two
    * ways at small scale: AQE's byte-based coalescing folds the post-shuffle
    * side to one task, or the planner broadcasts the build side and the
    * probe stage inherits the scan's single split. An explicit repartition
    * on the join keys is the SAME exchange a shuffle join requires, so at
    * scale it is never an extra shuffle — it only pins the partition count
    * against byte-based coalescing of compute-heavy, byte-light stages. */
  def pinned(df: org.apache.spark.sql.DataFrame,
             cols: org.apache.spark.sql.Column*): org.apache.spark.sql.DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
      cols: _*)

  /** Driver-side metadata stat (no Spark job). */
  private def inputBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.getContentSummary(p).getLength
  }
}
