package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable

/**
 * PARTIAL-UPDATE cost decision bench: what does column-wise keep-last
 * ([[graft.functions.OverlayKeepLast]] + the read-side overlay fold) cost
 * over the whole-row `max_by` path, on the SAME TOAST-omitting stream?
 *
 *  - APPLY: the stream applied in 4 batches to a DEFAULT table (max_by —
 *    which silently nulls omitted content; the semantics a partial table
 *    exists to fix) vs a PARTIAL table (overlay aggregate + _barrier
 *    deltas). Same input bytes, same decode, same bucket/commit work —
 *    the delta is the dedup aggregate + the wider delta rows.
 *  - READ: the merged view over base + 4 delta layers per bucket, in both
 *    merge shapes (zero-shuffle local fold vs key-hash shuffle), default
 *    whole-row vs partial overlay resolution.
 *
 * Reps are INTERLEAVED (the host is 5-10x noisy) and reported best-of.
 *
 * Usage: runMain graft.bench.PartialBench [nTxns] [reps]
 */
object PartialBench {
  def main(args: Array[String]): Unit = {
    val nTxns = args.headOption.map(_.toLong).getOrElse(400000L)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cfg = GenConfig(seed = 7L, nRepos = 20000, pathsPerRepo = 20,
      maxChangesPerTxn = 3, toastOmitUpdates = true)
    val scratch = graft.util.TempDirs.scratch("partial-bench")
    val wal = s"$scratch/wal"
    ChangeStreamGen.writeSegments(spark, cfg, wal, nTxns, nTxns / 8)
    val lines = spark.read.textFile(wal).toDF("value")
    val decoded = ChangeDecoder.decode(lines)
    val nBatches = 4
    val per = nTxns / nBatches

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    /** One full build: 4 applyBatch commits into a fresh table. Deltas are
      * kept un-compacted (huge thresholds) so READ measures the overlay
      * over base + 4 delta layers — the steady merge-on-read shape. */
    def build(rep: Int, partial: Boolean): (String, Double, Double, Double) = {
      val root = s"$scratch/t-$partial-$rep"
      val t = new LakeTable(spark, root,
        maxDeltasPerBucket = 1000000, maxDeltaBytesPerBucket = Long.MaxValue / 4)
      t.create(graft.cli.Main.reposSchema, Seq("repo", "path"), nBuckets = 8,
        graft.cli.Main.reposRenameMap, partialUpdates = partial)
      val (applySec, _) = timed {
        (0 until nBatches).foreach { b =>
          MergeEngine.applyBatch(t, decoded.filter(
            col("lsn") > b * per && col("lsn") <= (b + 1) * per))
        }
      }
      def checksum(tt: LakeTable): Long = tt.read()
        .agg(bit_xor(xxhash64(col("repo"), col("path"), col("commit"),
          col("language"), col("content")))).head().getLong(0)
      val (readLocalSec, c1) = timed(checksum(t))
      val shuffleTwin = new LakeTable(spark, root, maxLocalMergeBytesPerBucket = 0L)
      val (readShufSec, c2) = timed(checksum(shuffleTwin))
      require(c1 == c2, s"merge shapes disagree: $c1 != $c2")
      (if (partial) "partial" else "default", applySec, readLocalSec, readShufSec)
    }

    // one warm pass each (JIT), then interleaved timed reps
    build(-1, partial = false); build(-1, partial = true)
    val samples = (0 until reps).flatMap { r =>
      Seq(build(r, partial = false), build(r, partial = true))
    }
    val events = decoded.count()
    println(f"PartialBench: $nTxns txns = $events events, 4 batches, 8 buckets, local[8], best-of-$reps (interleaved)")
    println("| mode | apply s (best) | ev/s | read local s | read shuffle s |")
    println("|---|---|---|---|---|")
    Seq("default", "partial").foreach { m =>
      val s = samples.filter(_._1 == m)
      val a = s.map(_._2).min; val rl = s.map(_._3).min; val rs = s.map(_._4).min
      println(f"| $m | $a%.2f | ${events / a}%.0f | $rl%.2f | $rs%.2f |")
    }
    samples.foreach { case (m, a, rl, rs) =>
      println(f"  raw $m apply=$a%.2f readLocal=$rl%.2f readShuffle=$rs%.2f")
    }
    spark.stop()
  }
}
