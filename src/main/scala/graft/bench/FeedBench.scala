package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.apply.MergeEngine
import graft.lake.LakeTable

/**
 * Decision benchmark for the CHANGE DATA FEED's core scale claim:
 * reading a commit's changes costs O(changed bytes), INDEPENDENT of table
 * size — while a full table read grows with the table. At 100 TB a
 * downstream consumer (mirror, index builder, cache invalidator) must pay
 * for the day's changes, never the table.
 *
 * Method: commits of IDENTICAL size (fresh keys each commit, so the table
 * grows linearly) applied in sequence; after each commit, time
 * (best-of-2, this host's noise lesson)
 *   - feed:  checksum(changes(last-1, last])  — the per-commit feed read
 *   - scan:  checksum(read())                 — the full merged table read
 * and record live data bytes from the snapshot. The feed column must stay
 * flat as the scan column grows.
 *
 * Usage: runMain graft.bench.FeedBench [commits] [rowsPerCommit]
 */
object FeedBench {
  def main(args: Array[String]): Unit = {
    val commits = args.headOption.map(_.toInt).getOrElse(10)
    val rowsPerCommit = args.drop(1).headOption.map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = graft.util.TempDirs.scratch("graft-feedbench")
    val t = new LakeTable(spark, root)
    t.create(StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))),
      Seq("id"), nBuckets = 16)

    /** Commit c inserts rowsPerCommit FRESH keys (decoded-change shape,
      * ~160-byte payloads) — constant change volume, linearly growing
      * table. */
    def commitDf(c: Long): DataFrame =
      spark.range(c * rowsPerCommit, (c + 1) * rowsPerCommit).select(
        (col("id") + 1).as("lsn"),
        lit(0).as("seq"),
        col("id").as("xid"),
        lit("insert").as("kind"),
        lit("public").as("schema"),
        lit("t").as("table"),
        array(lit("id"), lit("v")).as("columnnames"),
        array(lit("bigint"), lit("text")).as("columntypes"),
        array(col("id").cast("string"),
          repeat(md5(col("id").cast("string")), 5)).as("columnvalues"),
        lit(null).cast(graft.model.Wal2Json.oldKeysSchema).as("oldkeys"))

    def bestOf2(f: => Unit): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    println(f"${"commit"}%7s ${"tableRows"}%10s ${"tableMB"}%8s " +
      f"${"feedRows"}%9s ${"feedSec"}%8s ${"scanSec"}%8s")
    val rows = (0 until commits).map { c =>
      MergeEngine.applyBatch(t, commitDf(c))
      val snap = t.currentSnapshot.get
      val tableBytes = snap.fileBytes.values.sum
      val feedRows = t.changes(snap.snapshotId - 1, snap.snapshotId).count()
      val feedSec = bestOf2 {
        graft.Bench.checksum(t.changes(snap.snapshotId - 1, snap.snapshotId))
      }
      val scanSec = bestOf2 { graft.Bench.checksum(t.read()) }
      val tableRows = (c + 1) * rowsPerCommit
      println(f"${c + 1}%7d $tableRows%10d ${tableBytes / 1e6}%8.1f " +
        f"$feedRows%9d $feedSec%8.3f $scanSec%8.3f")
      (feedSec, scanSec)
    }
    // headline ratio: last-commit feed time vs first, and same for scan —
    // feed must stay ~flat (ratio ~1) while scan grows with the table
    val feedGrowth = rows.last._1 / rows.head._1
    val scanGrowth = rows.last._2 / rows.head._2
    println(s"""{"metric":"feed_read_growth_over_${commits}x_table",""" +
      s""""feedGrowth":${f"$feedGrowth%.2f"},"scanGrowth":${f"$scanGrowth%.2f"},""" +
      s""""commits":$commits,"rowsPerCommit":$rowsPerCommit}""")
    spark.stop()
  }
}
