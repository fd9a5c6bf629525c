package graft.bench

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/**
 * Round-6 measurement probe for the CDC apply hot path (guide §1): runs the
 * SAME workload as the frozen Bench's cdc_apply entry (CdcBench.run over a
 * pre-generated WAL) with a per-job listener, printing each Spark job's
 * wall time so the batch's cost is attributable (decode+dedup+write vs
 * stats read-back vs commit overhead). Does not touch Bench/CdcBench.
 *
 * Usage: runMain graft.bench.ApplyProbe [nTxns] [reps]
 */
object ApplyProbe {

  private class JobTimer extends SparkListener {
    val start = new ConcurrentHashMap[Int, (Long, String)]()
    val log = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double)]()
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      // the result stage's name carries the action's call site — enough to
      // attribute each job to a pipeline phase
      val site = j.stageInfos.sortBy(_.stageId).lastOption.map(_.name).getOrElse("?")
      val nStages = j.stageInfos.size
      start.put(j.jobId, (System.nanoTime(), s"stages=$nStages  $site"))
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = {
      val s = start.remove(j.jobId)
      if (s != null) log.add((j.jobId, s._2, (System.nanoTime() - s._1) / 1e9))
    }
  }

  def main(args: Array[String]): Unit = {
    val nTxns = if (args.length > 0) args(0).toLong else 300000L
    val reps = if (args.length > 1) args(1).toInt else 3
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
    val timer = new JobTimer
    spark.sparkContext.addSparkListener(timer)

    val wal = CdcBench.prepareWal(spark, nTxns, txnsPerSegment = 5000L)
    (1 to reps).foreach { r =>
      timer.log.clear()
      val res = CdcBench.run(spark, nTxns, txnsPerSegment = 5000L,
        walDirOverride = Some(wal))
      println(f"== rep $r: ${res.seconds}%.3f s, ${res.eventsPerSec}%.0f ev/s ==")
      import scala.jdk.CollectionConverters._
      timer.log.asScala.toSeq.sortBy(_._1).foreach { case (id, desc, secs) =>
        println(f"  job $id%3d  $secs%7.3f s  $desc")
      }
    }
    spark.stop()
  }
}
