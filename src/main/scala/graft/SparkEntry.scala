package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` covers the CDC dataflow operators of the reference
  * (SURVEY.md §2.1, over the `events` change-log proxy), the standard
  * relational catalog (§2.2), and the training-data-pipeline operator
  * families (dedup / similarity / text / multimodal). Each entry has a
  * DuckDB oracle in `oracleSql` with identical column names; all
  * FP-sensitive math is decimal- or integer-exact for cross-engine parity.
  */
object SparkEntry {

  private val registry: Map[String, ((SparkSession, String) => DataFrame, String)] =
    CdcQueries.all ++ RelationalQueries.all ++ EventTimeOps.all ++
      DedupOps.all ++ SimilarityOps.all ++ TextOps.all ++ MultimodalOps.all ++
      PipelineOps.all ++ SamplingOps.all ++ ScrubOps.all

  /** Flagship: the full CDC engine end-to-end at sf-tiny — generate a
    * deterministic wal2json change stream, stream-apply it with LSN-ordered
    * MERGE into a lake table, return the final state. */
  def entry(spark: SparkSession): DataFrame = {
    import graft.apply.MergeEngine
    import graft.decode.ChangeDecoder
    import graft.gen.{ChangeStreamGen, GenConfig}
    import graft.lake.LakeTable

    val cfg = GenConfig(seed = 42L, nRepos = 50, pathsPerRepo = 10)
    val root = graft.util.TempDirs.scratch("graft-entry")
    val table = new LakeTable(spark, root)
    table.create(graft.cli.Main.reposSchema, Seq("repo", "path"), nBuckets = 8,
      graft.cli.Main.reposRenameMap)
    val lines = ChangeStreamGen.lines(spark, cfg, nTxns = 300L, partitions = 8).toDF("value")
    MergeEngine.applyBatch(table, ChangeDecoder.decode(lines))
    table.read()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, (fn, _)) => k -> fn } ++
      RelationalQueries.noOracle // sketches: rows-only check, no SQL oracle

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] =
    registry.map { case (k, (_, sql)) => k -> sql }
}
