package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/**
 * Round-6 optimization measurement harness (guide §1) — SEPARATE from the
 * frozen graft.Bench so the driver's methodology is untouched.
 *
 * For each named query (default: Bench.headline):
 *  - writes `plans/r06/<name>_<tag>.txt` with the `.explain("formatted")`
 *    output (tag = args(0), e.g. "before"/"after"),
 *  - times the computation through the NOOP sink (guide §1.4 — forces every
 *    column of every row, no checksum-aggregation overhead in the number),
 *    best-of-N interleaved rounds,
 *  - counts jobs / stages / tasks / shuffle bytes via a listener, so plan
 *    claims ("2 Exchange -> 1") are cross-checked by runtime stage counts.
 *
 * Usage: runMain graft.BenchExtra <tag> [query1,query2,...]
 */
object BenchExtra {

  private class Counters extends SparkListener {
    val jobs = new AtomicLong
    val stages = new AtomicLong
    val tasks = new AtomicLong
    val shuffleWrite = new AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
    def snapshot: (Long, Long, Long, Long) =
      (jobs.get, stages.get, tasks.get, shuffleWrite.get)
  }

  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "before"
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").map(_.trim).toSet) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val counters = new Counters
    spark.sparkContext.addSparkListener(counters)

    val queries = SparkEntry.queries
    // default: the headline set; an explicit list may name ANY declared
    // query (plan capture for untimed-but-restructured queries)
    val names = only match {
      case Some(set) => set.toSeq.sorted.filter(queries.contains)
      case None => Bench.headline.filter(queries.contains)
    }
    Files.createDirectories(Paths.get("plans/r06"))

    def noop(name: String): Unit = {
      spark.sparkContext.setJobDescription(s"$name [$tag]")
      queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.sparkContext.setJobDescription(null)
    }

    // plan capture + warm pass
    names.foreach { name =>
      val df = queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(s"plans/r06/${name}_$tag.txt"),
        plan.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      noop(name) // warm (footer cache, codegen) — untimed
    }

    val nRounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val samples = scala.collection.mutable.LinkedHashMap[String, Vector[Double]](
      names.map(_ -> Vector.empty[Double]): _*)
    val stats = scala.collection.mutable.LinkedHashMap[String, (Long, Long, Long, Long)]()
    (1 to nRounds).foreach { r =>
      names.foreach { name =>
        val before = counters.snapshot
        val t0 = System.nanoTime()
        noop(name)
        samples(name) :+= (System.nanoTime() - t0) / 1e9
        if (r == 1) {
          val after = counters.snapshot
          stats(name) = (after._1 - before._1, after._2 - before._2,
            after._3 - before._3, after._4 - before._4)
        }
      }
    }
    println(s"== BenchExtra [$tag] sf=$sfDir noop-sink best-of-$nRounds ==")
    names.foreach { n =>
      val (j, st, tk, sw) = stats(n)
      val s = samples(n)
      println(f"$n%-28s best=${s.min}%7.3f  samples=${s.map(x => f"$x%.3f").mkString("[", ",", "]")}  jobs=$j stages=$st tasks=$tk shuffleMB=${sw / 1e6}%.1f")
    }
    println(f"TOTAL best-sum=${names.map(n => samples(n).min).sum}%.3f")
    spark.stop()
  }
}
