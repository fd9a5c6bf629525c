package graft.bench

import org.apache.spark.sql.SparkSession
import graft.cli.Main
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.streaming.{CdcPipeline, TableTarget}

/**
 * Decision benchmark for the multi-table apply strategy. Three shapes per
 * table count N over the SAME mixed WAL:
 *
 *  - demux:       ONE pipeline, decoded batch demuxed once (scan + decode +
 *                 scratch parquet partitioned by table, per-target
 *                 partition-pruned applies). One SOURCE scan total.
 *  - lazy:        ONE pipeline, each target lazily filters the decoded
 *                 batch (N decode passes, N source scans, ZERO scratch
 *                 writes) — demuxMinTables raised past N.
 *  - independent: N single-table pipelines, each its own checkpoint — the
 *                 deployment the multi-target pipeline replaces.
 *
 * What this decides: materializing the wide decoded payload (content +
 * _row/_types maps) costs real IO, while a re-decode is cheap CPU
 * (CLAUDE.md lesson 9) — so on ONE BOX with a page-cached WAL the lazy
 * path can match or beat the demux at small N. The demux's structural win
 * is the SINGLE source scan: on a cluster reading the WAL from an object
 * store, lazy/independent pay N x network bytes for the raw WAL. This
 * bench measures the local-CPU side of that trade; the network side is
 * arithmetic (N x WAL bytes).
 *
 * Method: configs interleaved x2, best-of-2 (lesson 17); state checksums
 * asserted identical across ALL configs every rep.
 *
 * Usage: runMain graft.bench.MultiTableBench [tableList] [txns] [segments]
 *   e.g. runMain graft.bench.MultiTableBench 2,8 200000 10
 */
object MultiTableBench {
  def main(args: Array[String]): Unit = {
    val tableCounts = args.headOption.getOrElse("2,8")
      .split(",").map(_.trim.toInt).toSeq
    val txns = args.drop(1).headOption.map(_.toLong).getOrElse(200000L)
    val segments = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val allJson = tableCounts.map { nTables =>
      val tableNames = (0 until nTables).map(i => f"t$i%02d").toIndexedSeq
      val cfg = GenConfig(seed = 42L, nRepos = 5000, pathsPerRepo = 500,
        tables = tableNames)
      val walDir = graft.util.TempDirs.scratch(s"graft-mtbench-wal$nTables")
      ChangeStreamGen.writeSegments(spark, cfg, walDir, txns, txns / segments)
      val segs = new java.io.File(walDir).listFiles().map(_.getPath).sorted
      val walLines = spark.read.textFile(walDir).count() // warms FS cache

      def freshTargets(tag: String): IndexedSeq[TableTarget] =
        tableNames.map(name => TableTarget(name, new LakeTable(spark,
          graft.util.TempDirs.scratch(s"graft-mtbench-$tag-$name")),
          Main.reposSchema, Seq("repo", "path"), nBuckets = 16,
          Main.reposRenameMap))

      def drive(pipes: Seq[CdcPipeline],
                targets: Seq[TableTarget]): (Double, Long) = {
        val t0 = System.nanoTime()
        segs.zipWithIndex.foreach { case (s, i) =>
          val lines = spark.read.text(s)
          pipes.foreach(_.processBatch(lines, i.toLong))
        }
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, targets.map(t => graft.Bench.checksum(t.table.read())).sum)
      }

      def run(config: String, tag: String): (Double, Long) = {
        val targets = freshTargets(tag)
        def ckpt(sfx: String) =
          graft.util.TempDirs.scratch(s"graft-mtbench-ckpt-$tag$sfx")
        config match {
          case "demux" => drive(Seq(new CdcPipeline(spark, walDir, ckpt(""),
            targets, tableNames.toSet, demuxMinTables = 2)), targets)
          case "lazy" => drive(Seq(new CdcPipeline(spark, walDir, ckpt(""),
            targets, tableNames.toSet, demuxMinTables = Int.MaxValue)),
            targets)
          case "independent" => drive(targets.map(t => new CdcPipeline(
            spark, walDir, ckpt(s"-${t.name}"), Seq(t), Set(t.name))),
            targets)
        }
      }

      val configs = Seq("demux", "lazy", "independent")
      val runs = (0 until 2).flatMap(rep =>
        configs.map(c => c -> run(c, s"$nTables-$c-$rep")))
      val sums = runs.map(_._2._2).distinct
      require(sums.size == 1, s"checksums diverged at N=$nTables: $sums")
      val best = configs.map(c =>
        c -> runs.collect { case (`c`, (s, _)) if true => s }.min).toMap
      println(f"tables=$nTables%2d walLines=$walLines " +
        configs.map(c => f"$c=${best(c)}%.2fs").mkString(" "))
      s"""{"tables":$nTables,"walLines":$walLines,""" +
        configs.map(c => s""""$c":${f"${best(c)}%.3f"}""").mkString(",") +
        s""","samples":{""" + configs.map(c =>
          s""""$c":[${runs.collect { case (`c`, (s, _)) => f"$s%.3f" }
            .mkString(",")}]""").mkString(",") + "}}"
    }
    println(s"""{"metric":"multi_table_apply","txns":$txns,""" +
      s""""segments":$segments,"sweep":[${allJson.mkString(",")}]}""")
    spark.stop()
  }
}
