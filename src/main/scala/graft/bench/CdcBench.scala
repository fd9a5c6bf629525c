package graft.bench

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.cli.Main
import graft.decode.ChangeDecoder
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.streaming.{CdcPipeline, TableTarget}

/**
 * CDC apply-throughput benchmark: the BASELINE.json primary metric.
 *
 * End-to-end timed span: read JSONL WAL segments from disk -> from_json
 * decode -> table filter -> typed pivot -> keep-last dedup -> bucket MERGE
 * -> parquet write -> fenced snapshot commit. Generation happens before the
 * clock starts (it stands in for the upstream database's WAL).
 *
 * Reference floor: pg2k4j claims ~1M records/min ≈ 16.7k events/s through
 * the Kinesis Producer Library (reference README.md:76-80).
 */
object CdcBench {

  final case class Result(events: Long, seconds: Double, buckets: Int) {
    def eventsPerSec: Double = events / seconds
  }

  import graft.util.TempDirs.deleteDir

  def run(spark: SparkSession, nTxns: Long, txnsPerSegment: Long,
          nBuckets: Int = 32, walDirOverride: Option[String] = None): Result = {
    val cfg = GenConfig(seed = 42L, nRepos = 5000, pathsPerRepo = 500)
    val walDir = walDirOverride.getOrElse {
      val d = graft.util.TempDirs.scratch("graft-bench-wal")
      ChangeStreamGen.writeSegments(spark, cfg, d, nTxns, txnsPerSegment)
      d
    }
    // scratch = exit-hook backstop for crashes/interrupts; the finally
    // below is the immediate fast path
    val root = graft.util.TempDirs.scratch("graft-bench-table")
    val ckpt = graft.util.TempDirs.scratch("graft-bench-ckpt")
    try {
      val target = TableTarget("repos", new LakeTable(spark, root),
        Main.reposSchema, Seq("repo", "path"), nBuckets, Main.reposRenameMap)
      val pipe = new CdcPipeline(spark, walDir, ckpt, Seq(target), Set("repos"))

      // Count input change events outside the timed span (metric denominator).
      val lines = spark.read.text(walDir)
      val events = ChangeDecoder.decode(lines).count()

      val t0 = System.nanoTime()
      pipe.processBatch(lines, batchId = 0L)
      val seconds = (System.nanoTime() - t0) / 1e9
      Result(events, seconds, nBuckets)
    } finally { deleteDir(root); deleteDir(ckpt) } // after the clock stopped
  }

  /**
   * Multi-micro-batch variant: the same WAL replayed through the streaming
   * pipeline in `segmentsPerTrigger`-segment batches. This is the shape of
   * the 10^10-event workload (an endless sequence of micro-batches into an
   * ever-growing table) and what merge-on-read optimizes: per-batch cost is
   * O(batch), while bucket-grain copy-on-write degraded to O(table) per
   * batch. Timed span includes checkpointing and all commits.
   */
  def runStreaming(spark: SparkSession, nTxns: Long, txnsPerSegment: Long,
                   segmentsPerTrigger: Int, nBuckets: Int = 32,
                   walDirOverride: Option[String] = None,
                   maxDeltasPerBucket: Int = 64): Result = {
    val cfg = GenConfig(seed = 42L, nRepos = 5000, pathsPerRepo = 500)
    val walDir = walDirOverride.getOrElse {
      val d = graft.util.TempDirs.scratch("graft-bench-wal")
      ChangeStreamGen.writeSegments(spark, cfg, d, nTxns, txnsPerSegment)
      d
    }
    // scratch = exit-hook backstop for crashes/interrupts; the finally
    // below is the immediate fast path
    val root = graft.util.TempDirs.scratch("graft-bench-table")
    val ckpt = graft.util.TempDirs.scratch("graft-bench-ckpt")
    try {
      val target = TableTarget("repos", new LakeTable(spark, root, maxDeltasPerBucket),
        Main.reposSchema, Seq("repo", "path"), nBuckets, Main.reposRenameMap)
      val pipe = new CdcPipeline(spark, walDir, ckpt, Seq(target), Set("repos"),
        maxFilesPerTrigger = Some(segmentsPerTrigger))
      val events = ChangeDecoder.decode(spark.read.text(walDir)).count()
      val t0 = System.nanoTime()
      pipe.runAvailable()
      val seconds = (System.nanoTime() - t0) / 1e9
      Result(events, seconds, nBuckets)
    } finally { deleteDir(root); deleteDir(ckpt) } // after the clock stopped
  }

  /** Pre-write a WAL once so multiple sessions bench the identical input.
    * Deleted at JVM exit; to reuse a WAL across invocations, `gen` one to a
    * path you own and pass it as the reuse argument instead. */
  def prepareWal(spark: SparkSession, nTxns: Long, txnsPerSegment: Long): String = {
    val cfg = GenConfig(seed = 42L, nRepos = 5000, pathsPerRepo = 500)
    val d = graft.util.TempDirs.scratch("graft-scale-wal")
    ChangeStreamGen.writeSegments(spark, cfg, d, nTxns, txnsPerSegment)
    d
  }
}
