package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.streaming.{CdcPipeline, TableTarget}

/**
 * spark-submit entry point — parity with the reference's CommandLineRunner
 * (CommandLineRunner.java:24-46), reshaped for a lake-sink engine:
 *
 * {{{
 *   gen  --wal-dir D --txns N [--txns-per-segment K] [--seed S]
 *        [--add-col-at L] [--rename-at L]            synthesize WAL segments
 *   run  --wal-dir D --table-root R --checkpoint C   stream-apply to the lake
 *        [--buckets B] [--relevant-tables a,b]
 *   show --table-root R                              print final table state
 * }}}
 */
object Main {

  val reposSchema: StructType = StructType(Seq(
    StructField("repo", StringType),
    StructField("path", StringType),
    StructField("commit", StringType),
    StructField("language", StringType),
    StructField("content", StringType)))

  val reposRenameMap: Map[String, String] = Map("lang" -> "language")

  def parseArgs(args: Array[String]): (String, Map[String, String]) = {
    require(args.nonEmpty, "usage: gen|run|show --key value ...")
    val cmd = args.head
    val kv = args.tail.grouped(2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap
    (cmd, kv)
  }

  def session(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cdc")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val (cmd, kv) = parseArgs(args)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = session(cpus)
    try cmd match {
      case "gen" =>
        val cfg = GenConfig(
          seed = kv.getOrElse("seed", "42").toLong,
          addColumnAtLsn = kv.get("add-col-at").map(_.toLong).getOrElse(Long.MaxValue),
          renameAtLsn = kv.get("rename-at").map(_.toLong).getOrElse(Long.MaxValue))
        val n = kv("txns").toLong
        val per = kv.getOrElse("txns-per-segment", "10000").toLong
        ChangeStreamGen.writeSegments(spark, cfg, kv("wal-dir"), n, per)
        println(s"""{"wrote_txns":$n,"segments":${(n + per - 1) / per},"dir":"${kv("wal-dir")}"}""")

      case "run" =>
        val root = kv("table-root")
        val target = TableTarget("repos", new LakeTable(spark, root),
          reposSchema, Seq("repo", "path"),
          nBuckets = kv.getOrElse("buckets", "32").toInt, reposRenameMap)
        val relevant = kv.get("relevant-tables")
          .map(_.split(",").toSet).getOrElse(Set("repos"))
        val pipe = new CdcPipeline(spark, kv("wal-dir"), kv("checkpoint"),
          Seq(target), relevant, metricsPath = Some(s"$root/_metrics/batches.jsonl"))
        val t0 = System.nanoTime()
        pipe.runAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        val applied = pipe.stats.map(_._3.appliedKeys).sum
        val snap = target.table.currentSnapshot.get
        println(s"""{"batches":${pipe.stats.size},"appliedKeys":$applied,""" +
          s""""highWatermark":${snap.lsnHighWatermark},"snapshotId":${snap.snapshotId},""" +
          s""""seconds":$sec}""")

      case "show" =>
        val t = new LakeTable(spark, kv("table-root"))
        val df = t.read(asOfSnapshot = kv.get("as-of").map(_.toLong))
        val n = df.count()
        println(s"rows=$n")
        df.orderBy("repo", "path")
          .select(col("repo"), col("path"), col("language"),
            sha2(col("content"), 256).as("content_sha256"))
          .show(kv.getOrElse("limit", "10").toInt, truncate = false)

      case "vacuum" =>
        val t = new LakeTable(spark, kv("table-root"))
        val (snaps, files) = t.expireSnapshots(kv.getOrElse("keep-last", "5").toInt)
        println(s"""{"expired_snapshots":$snaps,"deleted_files":$files}""")

      case other => sys.error(s"unknown command $other")
    } finally spark.stop()
  }
}
