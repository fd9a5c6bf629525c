package graft.bench

import org.apache.spark.sql.SparkSession
import graft.apply.MergeEngine
import graft.cli.Main
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.streaming.{CdcPipeline, TableTarget}

/**
 * Decision benchmark: INLINE size-tiered compaction (rides the apply
 * commit) vs DEFERRED (inlineCompaction=false + one standalone
 * [[MergeEngine.compactAll]] maintenance pass at the end). The question a
 * latency-sensitive deployment asks: how much per-batch apply tail latency
 * does the inline bucket rewrite cost, and what does deferring it cost in
 * read amplification until maintenance runs?
 *
 * Method: one WAL generated once; per config, the same per-segment batches
 * through the same pipeline (fresh table each), per-batch seconds recorded.
 * Config runs INTERLEAVE (inline, deferred, inline, deferred) and the
 * summary takes per-config best-of-2 on each statistic — lesson 17: never
 * trust one sample of anything on this host. After the batches, each
 * config's merged-read time is measured (deferred reads pre-maintenance
 * carry every accumulated delta), then the deferred config pays its
 * compactAll and the read is measured again.
 *
 * Usage: runMain graft.bench.CompactionBench [batches] [txnsPerBatch]
 */
object CompactionBench {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(60)
    val txnsPerBatch = args.drop(1).headOption.map(_.toLong).getOrElse(10000L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cfg = GenConfig(seed = 42L, nRepos = 5000, pathsPerRepo = 500)
    val walDir = graft.util.TempDirs.scratch("graft-compbench-wal")
    ChangeStreamGen.writeSegments(spark, cfg, walDir,
      batches * txnsPerBatch, txnsPerBatch)
    val segments = new java.io.File(walDir).listFiles().map(_.getPath).sorted

    // 256 KiB trigger so the inline rewrite actually fires many times over
    // the run (the 32 MiB default would never trip at this batch size —
    // both configs use the same thresholds; deferred ignores them by flag)
    final case class RunResult(perBatch: Seq[Double], readSec: Double,
                               compactSec: Double, readAfterSec: Double)
    def runConfig(inline: Boolean, tag: String): RunResult = {
      val root = graft.util.TempDirs.scratch(s"graft-compbench-$tag")
      val ckpt = graft.util.TempDirs.scratch(s"graft-compbench-ckpt-$tag")
      val table = new LakeTable(spark, root,
        maxDeltasPerBucket = Int.MaxValue, // isolate the SIZE trigger
        maxDeltaBytesPerBucket = 256L * 1024,
        inlineCompaction = inline)
      val target = TableTarget("repos", table, Main.reposSchema,
        Seq("repo", "path"), nBuckets = 32, Main.reposRenameMap)
      val pipe = new CdcPipeline(spark, walDir, ckpt, Seq(target), Set("repos"))
      val perBatch = segments.zipWithIndex.map { case (seg, i) =>
        val lines = spark.read.text(seg)
        val t0 = System.nanoTime()
        pipe.processBatch(lines, batchId = i.toLong)
        (System.nanoTime() - t0) / 1e9
      }.toSeq
      def readOnce(): Double = {
        val t0 = System.nanoTime()
        graft.Bench.checksum(table.read())
        (System.nanoTime() - t0) / 1e9
      }
      val readSec = readOnce()
      val t0 = System.nanoTime()
      if (!inline) MergeEngine.compactAll(table)
      val compactSec = if (inline) 0.0 else (System.nanoTime() - t0) / 1e9
      val readAfterSec = if (inline) readSec else readOnce()
      RunResult(perBatch, readSec, compactSec, readAfterSec)
    }

    // interleaved: a contended window inflates one run, never both of a config
    val runs = Seq(true, false, true, false).zipWithIndex.map { case (inline, i) =>
      inline -> runConfig(inline, s"r$i-${if (inline) "inline" else "deferred"}")
    }
    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted; s(math.min(s.size - 1, (p * s.size).toInt))
    }
    def summarize(inline: Boolean): Map[String, Double] = {
      val rs = runs.collect { case (i, r) if i == inline => r }
      def best(f: RunResult => Double): Double = rs.map(f).min
      Map(
        "p50" -> best(r => pct(r.perBatch, 0.50)),
        "p95" -> best(r => pct(r.perBatch, 0.95)),
        "p99" -> best(r => pct(r.perBatch, 0.99)),
        "max" -> best(r => r.perBatch.max),
        "total" -> best(r => r.perBatch.sum),
        "read" -> best(_.readSec),
        "compactAll" -> best(_.compactSec),
        "readAfter" -> best(_.readAfterSec))
    }
    val inline = summarize(inline = true)
    val deferred = summarize(inline = false)
    println(f"${"config"}%-9s ${"p50"}%7s ${"p95"}%7s ${"p99"}%7s ${"max"}%7s " +
      f"${"total"}%8s ${"read"}%7s ${"compact"}%8s ${"readAfter"}%9s")
    Seq("inline" -> inline, "deferred" -> deferred).foreach { case (n, m) =>
      println(f"$n%-9s ${m("p50")}%7.3f ${m("p95")}%7.3f ${m("p99")}%7.3f " +
        f"${m("max")}%7.3f ${m("total")}%8.2f ${m("read")}%7.2f " +
        f"${m("compactAll")}%8.2f ${m("readAfter")}%9.2f")
    }
    def js(m: Map[String, Double]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":${f"$v%.3f"}""" }
        .mkString("{", ",", "}")
    println(s"""{"metric":"inline_vs_deferred_compaction","batches":$batches,""" +
      s""""txnsPerBatch":$txnsPerBatch,"inline":${js(inline)},""" +
      s""""deferred":${js(deferred)}}""")
    spark.stop()
  }
}
