package graft

import org.apache.spark.sql.functions._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.cli.Main

/**
 * Standalone full compaction ([[MergeEngine.compactAll]]): every
 * delta-carrying bucket folded to a fresh base in one fenced commit, on
 * demand — sharing the inline (size-tiered) compaction's write path, so
 * the invariants under test are the COMMIT-shape ones: no row changes, no
 * feed contribution, watermarks untouched (replays still gate exactly),
 * stale file metadata dropped.
 */
class CompactAllSpec extends SparkSpec {
  import spark.implicits._

  val cfg = GenConfig(seed = 23L, nRepos = 15, pathsPerRepo = 4, maxChangesPerTxn = 3)
  val nTxns = 240L

  /** Inline compaction disabled (huge byte/count triggers) so deltas pile
    * up and compactAll has real work. */
  private def newTable(): LakeTable = {
    val t = new LakeTable(spark, tmpDir("compactall"),
      maxDeltasPerBucket = 1000,
      maxDeltaBytesPerBucket = Long.MaxValue)
    t.create(Main.reposSchema, Seq("repo", "path"), nBuckets = 8, Main.reposRenameMap)
    t
  }

  private def applyRange(t: LakeTable, from: Long, until: Long): MergeEngine.MergeStats = {
    val lines = (from until until).map(id =>
      ChangeStreamGen.renderLine(cfg, ChangeStreamGen.txn(cfg, id)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(
      spark.createDataset(lines).toDF("value")))
  }

  private def sha256(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def state(t: LakeTable): Map[(String, String), (String, String)] =
    t.read().select(col("repo"), col("path"), col("commit"),
      sha2(col("content"), 256).as("sha")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getString(2), r.getString(3))).toMap

  private def expected(n: Long): Map[(String, String), (String, String)] =
    ChangeStreamGen.expectedFinalState(cfg, n).map { case (k, ch) =>
      k -> (ch.commit, sha256(ch.content))
    }

  test("compactAll folds all deltas, preserves state/watermarks, feeds nothing") {
    val t = newTable()
    for (i <- 0 until 6) applyRange(t, i * 40L, (i + 1) * 40L)
    val before = t.currentSnapshot.get
    assert(before.bucketDeltas.values.exists(_.nonEmpty), "deltas must be pending")
    val exp = expected(nTxns)
    assert(state(t) === exp)

    val snap = MergeEngine.compactAll(t)
    assert(snap.snapshotId === before.snapshotId + 1)
    assert(snap.bucketDeltas.isEmpty)
    assert(state(t) === exp, "compaction changed table state")
    // no logical changes: zero feed rows, watermarks untouched
    assert(snap.commitDeltas.isEmpty)
    assert(t.changes(before.snapshotId, snap.snapshotId).count() === 0L)
    assert(snap.bucketWatermarks === before.bucketWatermarks)
    // file metadata carries ONLY live files (stale delta entries dropped)
    val live = snap.allFiles.toSet
    assert(snap.fileStats.keySet.subsetOf(live))
    assert(snap.fileBytes.keySet.subsetOf(live))
    // compacted deltas stay on disk for the PRIOR snapshots' feed reads
    val priorFeed = t.changes(-1, before.snapshotId)
    assert(priorFeed.count() > 0L, "feed history must survive compaction")

    // replay exactness survives: the whole stream again = zero applied
    assert(applyRange(t, 0, nTxns).appliedKeys === 0L)
    assert(t.currentSnapshot.get.snapshotId === snap.snapshotId)

    // idempotent: nothing pending now — no-op, no commit
    assert(MergeEngine.compactAll(t).snapshotId === snap.snapshotId)

    // continued ingest converges on the compacted layout
    // (fresh config keeps the generator's oracle aligned)
    applyRange(t, nTxns, nTxns + 60)
    assert(state(t) === expected(nTxns + 60))
  }

  test("compactAll in distributed-manifest mode") {
    val t = new LakeTable(spark, tmpDir("compactall-dm"),
      maxDeltasPerBucket = 1000,
      maxDeltaBytesPerBucket = Long.MaxValue,
      manifestThresholdFiles = 0)
    t.create(Main.reposSchema, Seq("repo", "path"), nBuckets = 8, Main.reposRenameMap)
    for (i <- 0 until 4) applyRange(t, i * 40L, (i + 1) * 40L)
    val exp = state(t)
    val snap = MergeEngine.compactAll(t)
    assert(snap.bucketManifests.nonEmpty)
    assert(snap.bucketDeltas.isEmpty)
    assert(state(t) === exp)
    assert(applyRange(t, 0, 160).appliedKeys === 0L)
  }
}
