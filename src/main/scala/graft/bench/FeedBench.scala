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
    if (args.headOption.contains("catchup")) { catchup(args.drop(1)); return }
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

  /**
   * CATCH-UP decision benchmark: the metadata cost of resolving a LONG
   * `changes(from, to]` range — a mirror restarting after a day of
   * 5-second micro-batches pays this before any data moves. Historically
   * one snapshot-ROOT read per id, SERIAL on the driver: ~17k sequential
   * object-store GETs ≈ tens of driver-minutes per catch-up window. The
   * fix is two-layered: a bounded-parallel root fetch (always on) and the
   * feed-log index (`indexFeed` maintenance, O(range/segment) reads).
   *
   * Local fs reads take ~50 µs, which would hide a serial-GET bottleneck
   * entirely — so the bench measures on a LakeTable instance constructed
   * with `metaReadDelayMs` (an immutable per-read latency emulating an
   * object store's GET RTT).
   * Commit volume: every 20th commit is a real apply, the rest are idle
   * fast-forwards — metadata-identical to real commits (the reader cannot
   * know a root is feed-empty without fetching it), so the ≥10³-commit
   * history builds in seconds while measuring exactly the pain point.
   *
   * Usage: runMain graft.bench.FeedBench catchup [commits] [delayMs]
   */
  def catchup(args: Array[String]): Unit = {
    val commits = args.headOption.map(_.toInt).getOrElse(1200)
    val delayMs = args.drop(1).headOption.map(_.toLong).getOrElse(10L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = graft.util.TempDirs.scratch("graft-feedcatchup")
    val t = new LakeTable(spark, root)
    t.create(StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))),
      Seq("id"), nBuckets = 16)
    def commitDf(c: Long): DataFrame =
      spark.range(c * 50, (c + 1) * 50).select(
        (col("id") + 1).as("lsn"), lit(0).as("seq"), col("id").as("xid"),
        lit("insert").as("kind"), lit("public").as("schema"), lit("t").as("table"),
        array(lit("id"), lit("v")).as("columnnames"),
        array(lit("bigint"), lit("text")).as("columntypes"),
        array(col("id").cast("string"), md5(col("id").cast("string")))
          .as("columnvalues"),
        lit(null).cast(graft.model.Wal2Json.oldKeysSchema).as("oldkeys"))
    print(s"building $commits-commit history... ")
    (0 until commits).foreach { c =>
      if (c % 20 == 0) MergeEngine.applyBatch(t, commitDf(c))
      else MergeEngine.fastForward(t,
        t.currentSnapshot.get.lsnHighWatermark + 1)
    }
    val latest = t.currentSnapshot.get.snapshotId
    println(s"done (latest snapshot $latest)")

    // the delay is an IMMUTABLE constructor knob (a mutable hook a failing
    // bench forgot to reset would poison the instance) — measurements run
    // on a dedicated delayed instance over the same root
    val delayed = new LakeTable(spark, root, metaReadDelayMs = delayMs)
    def measure(label: String)(body: LakeTable => Long): (Long, Double, Long) = {
      // best-of-2 (lesson 17: this host's noise hits within one process);
      // reads counted on the first sample only — deterministic either way
      val r0 = delayed.metaReads.get()
      var rows = 0L
      val sec = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); rows = body(delayed)
        (System.nanoTime() - t0) / 1e9
      }.min
      val reads = (delayed.metaReads.get() - r0) / 2
      println(f"$label%-28s metaReads=$reads%6d  driverSec=$sec%8.2f  rows=$rows")
      (reads, sec, rows)
    }
    println(f"emulated metadata GET latency: ${delayMs}ms/read")
    delayed.feedMetaParallelism = 1
    val (serR, serS, serRows) = measure("serial roots (the old path)") {
      _.changes(-1, latest).count() }
    delayed.feedMetaParallelism = 32
    val (parR, parS, parRows) = measure("parallel roots (32-way)") {
      _.changes(-1, latest).count() }
    val segs = delayed.indexFeed(segmentSize = 128) // pays the same RTTs
    val (idxR, idxS, idxRows) = measure(s"feed-log index ($segs segs)") {
      _.changes(-1, latest).count() }
    require(serRows == parRows && parRows == idxRows,
      s"resolution paths disagree: $serRows/$parRows/$idxRows")
    println(s"""{"metric":"feed_catchup_metadata","commits":$commits,""" +
      s""""delayMs":$delayMs,"serialReads":$serR,"serialSec":${f"$serS%.2f"},""" +
      s""""parallelReads":$parR,"parallelSec":${f"$parS%.2f"},""" +
      s""""indexedReads":$idxR,"indexedSec":${f"$idxS%.2f"},""" +
      s""""segments":$segs,"rows":$idxRows}""")
    spark.stop()
  }
}
