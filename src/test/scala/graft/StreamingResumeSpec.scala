package graft

import org.apache.spark.sql.functions._
import graft.cli.Main
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.streaming.{CdcPipeline, TableTarget}

/**
 * Structured Streaming lifecycle: WAL-segment tailing, micro-batch apply,
 * checkpoint resume (the engine analog of the reference's restart-from-slot
 * semantics — the replication slot's restart LSN becomes the checkpoint
 * offset log, SURVEY.md §1.4).
 */
class StreamingResumeSpec extends SparkSpec {

  val cfg = GenConfig(seed = 11L, nRepos = 15, pathsPerRepo = 4, maxChangesPerTxn = 3)
  val nTxns = 200L

  private def sha256(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def expected(n: Long): Map[(String, String), String] =
    ChangeStreamGen.expectedFinalState(cfg, n).map { case (k, ch) => k -> sha256(ch.content) }

  private def state(t: LakeTable): Map[(String, String), String] =
    t.read().select(col("repo"), col("path"), sha2(col("content"), 256)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap

  private def mkPipeline(walDir: String, ckpt: String, t: LakeTable) =
    new CdcPipeline(spark, walDir, ckpt, Seq(
      TableTarget("repos", t, Main.reposSchema, Seq("repo", "path"), 8, Main.reposRenameMap)),
      relevantTables = Set("repos"), maxFilesPerTrigger = Some(1))

  test("streaming apply over segments, one segment per micro-batch") {
    val wal = tmpDir("wal"); val ckpt = tmpDir("ckpt")
    ChangeStreamGen.writeSegments(spark, cfg, wal, nTxns, txnsPerSegment = 40)
    val t = new LakeTable(spark, tmpDir("repos"))
    val pipe = mkPipeline(wal, ckpt, t)
    pipe.runAvailable()
    assert(pipe.stats.size >= 5, s"expected >=5 micro-batches, got ${pipe.stats.size}")
    assert(state(t) === expected(nTxns))
    // lineage recorded on the snapshot
    val lineage = t.currentSnapshot.get.lineage
    assert(lineage.contains("maxLsn") && lineage("maxLsn") === nTxns)
  }

  test("checkpoint resume: restart applies only new segments") {
    val wal = tmpDir("wal"); val ckpt = tmpDir("ckpt")
    ChangeStreamGen.writeSegments(spark, cfg, wal, 120L, txnsPerSegment = 40)
    val t = new LakeTable(spark, tmpDir("repos"))
    mkPipeline(wal, ckpt, t).runAvailable()
    assert(state(t) === expected(120L))
    val snapAfterFirst = t.currentSnapshot.get.snapshotId

    // "the database keeps writing": full stream shares the prefix (determinism),
    // so regenerating to a longer horizon just appends segments
    ChangeStreamGen.writeSegments(spark, cfg, wal, nTxns, txnsPerSegment = 40)
    val pipe2 = mkPipeline(wal, ckpt, t)
    pipe2.runAvailable()
    assert(state(t) === expected(nTxns))
    // resumed run must not have re-applied old LSNs
    val minApplied = pipe2.stats.map(_._3).filter(_.committed).map(_.minLsn).min
    assert(minApplied > 120L, s"resume re-applied old lsn $minApplied")
    assert(t.currentSnapshot.get.snapshotId > snapAfterFirst)
  }

  test("graft-lake sink: writeStream.format connector replaces foreachBatch") {
    val wal = tmpDir("wal"); val ckpt = tmpDir("ckpt")
    ChangeStreamGen.writeSegments(spark, cfg, wal, 120L, txnsPerSegment = 40)
    val root = tmpDir("repos")
    new LakeTable(spark, root)
      .create(Main.reposSchema, Seq("repo", "path"), 8, Main.reposRenameMap)

    def runOnce(ck: String): Unit = {
      val q = spark.readStream.format("graft-wal")
        .option("maxSegmentsPerTrigger", "1").load(wal)
        .writeStream.format("graft-lake")
        .option("path", root)
        .option("table", "repos")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    runOnce(ckpt)
    val t = new LakeTable(spark, root)
    assert(state(t) === expected(120L))
    val snapAfterFirst = t.currentSnapshot.get.snapshotId

    // exactly-once across checkpoint loss: replaying the whole WAL through
    // a FRESH checkpoint must commit nothing (LSN watermark fencing)
    runOnce(tmpDir("ckpt-lost"))
    assert(t.currentSnapshot.get.snapshotId === snapAfterFirst)
    assert(state(t) === expected(120L))

    // resume: new tail segments through the ORIGINAL checkpoint
    ChangeStreamGen.writeSegments(spark, cfg, wal, nTxns, txnsPerSegment = 40)
    runOnce(ckpt)
    assert(state(t) === expected(nTxns))
    assert(t.currentSnapshot.get.lineage("minLsn") > 120L,
      "resumed sink re-applied old LSNs")
  }

  test("crash-replay simulation: fresh checkpoint over applied table is a no-op") {
    val wal = tmpDir("wal")
    ChangeStreamGen.writeSegments(spark, cfg, wal, 120L, txnsPerSegment = 40)
    val t = new LakeTable(spark, tmpDir("repos"))
    mkPipeline(wal, tmpDir("ckpt1"), t).runAvailable()
    val snapBefore = t.currentSnapshot.get
    // lose the checkpoint entirely; replay the whole stream
    val pipe2 = mkPipeline(wal, tmpDir("ckpt2"), t)
    pipe2.runAvailable()
    val snapAfter = t.currentSnapshot.get
    assert(snapAfter.snapshotId === snapBefore.snapshotId)
    assert(snapAfter.bucketFiles === snapBefore.bucketFiles)
    assert(pipe2.stats.forall(s => !s._3.committed))
    assert(state(t) === expected(120L))
  }
}
