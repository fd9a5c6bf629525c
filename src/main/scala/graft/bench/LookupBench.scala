package graft.bench

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import graft.apply.MergeEngine
import graft.cli.Main
import graft.decode.ChangeDecoder
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable

/**
 * Point-read service benchmark: K single-key lookups (one Spark job each —
 * already stats-pruned and plan-time-job-free) vs ONE batched
 * lookup(Seq[keys]) resolving all K in a single job. The claim under test:
 * at service QPS the scheduler round-trip per job, not the scan, is the
 * bottleneck — batching K keys into one job amortizes it K-fold.
 *
 * Method: one table built once (two applies so half the buckets carry
 * deltas and the merge path engages); per K in the sweep, the SAME keys
 * resolved both ways, interleaved batched/serial x2, best-of-2 per config
 * (lesson 17). Row parity asserted every rep — the batch must return
 * exactly the union of the singles.
 *
 * Usage: runMain graft.bench.LookupBench [rows] [kList]
 *   e.g. runMain graft.bench.LookupBench 400000 4,16,64,256
 */
object LookupBench {
  def main(args: Array[String]): Unit = {
    val txns = args.headOption.map(_.toLong).getOrElse(400000L)
    val kList = args.drop(1).headOption.getOrElse("4,16,64,256")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cfg = GenConfig(seed = 42L, nRepos = 2000, pathsPerRepo = 200)
    val table = new LakeTable(spark,
      graft.util.TempDirs.scratch("graft-lookupbench"))
    table.create(Main.reposSchema, Seq("repo", "path"), nBuckets = 64,
      Main.reposRenameMap)
    // two applies: the second leaves fresh deltas on its touched buckets,
    // so the batch spans merge-path AND base-only buckets
    import spark.implicits._
    def lines(a: Long, b: Long) =
      spark.range(a, b, 1, 8)
        .map(id => ChangeStreamGen.renderLine(cfg, ChangeStreamGen.txn(cfg, id)))
        .toDF("value")
    MergeEngine.applyBatch(table, ChangeDecoder.decode(lines(0L, txns / 2)))
    MergeEngine.applyBatch(table,
      ChangeDecoder.decode(lines(txns / 2, txns)))

    // deterministic existing keys, spread across buckets
    val allKeys = table.read().select("repo", "path").limit(4096)
      .collect().map(r => Map[String, Any]("repo" -> r.getString(0),
        "path" -> r.getString(1))).toSeq
    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    val results = kList.map { k =>
      val keys = allKeys.take(k)
      def batched(): (Double, Int, Long) = {
        jobs.set(0)
        val (sec, rows) = timed(table.lookup(keys).count())
        (sec, jobs.get(), rows)
      }
      def serial(): (Double, Int, Long) = {
        jobs.set(0)
        val (sec, rows) = timed(keys.map(table.lookup(_).count()).sum)
        (sec, jobs.get(), rows)
      }
      val reps = Seq(batched(), serial(), batched(), serial())
      val b = Seq(reps(0), reps(2)); val s = Seq(reps(1), reps(3))
      require(reps.map(_._3).distinct.size == 1,
        s"row parity broke at K=$k: ${reps.map(_._3)}")
      val bBest = b.minBy(_._1); val sBest = s.minBy(_._1)
      println(f"K=$k%4d batched ${bBest._1}%6.3fs/${bBest._2}%4d jobs   " +
        f"serial ${sBest._1}%7.3fs/${sBest._2}%4d jobs   " +
        f"speedup ${sBest._1 / bBest._1}%5.2fx   rows=${bBest._3}")
      (k, bBest, sBest)
    }
    val js = results.map { case (k, b, s) =>
      s"""{"k":$k,"batchedSec":${f"${b._1}%.3f"},"batchedJobs":${b._2},""" +
        s""""serialSec":${f"${s._1}%.3f"},"serialJobs":${s._2},""" +
        s""""speedup":${f"${s._1 / b._1}%.3f"}}"""
    }.mkString(",")
    println(s"""{"metric":"batched_lookup","rows":$txns,"sweep":[$js]}""")
    spark.stop()
  }
}
