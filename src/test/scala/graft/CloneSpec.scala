package graft

import org.apache.spark.sql.functions._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.cli.Main

/**
 * Table cloning ([[LakeTable.cloneTo]]): a snapshot materialized at a
 * fresh root as an independent table. The CDC-specific property under
 * test is WATERMARK TRAVEL — the clone resumes ingest exactly-once from
 * the cloned position (full-replay no-op, tail-only catch-up), which is
 * what makes clone-then-catch-up a real point-in-time recovery and not
 * just a file copy.
 */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  val cfg = GenConfig(seed = 31L, nRepos = 15, pathsPerRepo = 4, maxChangesPerTxn = 3)
  val nTxns = 240L

  private def newTable(manifestThreshold: Int = 4096): LakeTable = {
    val t = new LakeTable(spark, tmpDir("clone-src"),
      manifestThresholdFiles = manifestThreshold)
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

  test("clone preserves state; resumes exactly-once; diverges independently") {
    val src = newTable()
    applyRange(src, 0, 120)
    applyRange(src, 120, nTxns) // second commit => deltas + history exist
    val exp = expected(nTxns)
    assert(state(src) === exp)

    val cloneRoot = tmpDir("clone-dst")
    val snap0 = src.cloneTo(cloneRoot)
    assert(snap0.snapshotId === 0L)
    assert(snap0.commitDeltas.isEmpty, "the clone's feed history starts empty")
    val clone = new LakeTable(spark, cloneRoot)
    assert(state(clone) === exp)
    assert(clone.changes(-1, 0).count() === 0L)

    // WATERMARK TRAVEL: a full WAL replay into the clone gates to zero
    assert(applyRange(clone, 0, nTxns).appliedKeys === 0L)
    // ...and the tail of an extended stream catches the clone up
    applyRange(clone, nTxns, nTxns + 60)
    assert(state(clone) === expected(nTxns + 60))
    // the source is untouched by the clone's writes (and vice versa)
    assert(state(src) === exp)
    applyRange(src, nTxns, nTxns + 30)
    assert(state(src) === expected(nTxns + 30))
    assert(state(clone) === expected(nTxns + 60))

    // a second clone to the same root is rejected
    intercept[IllegalArgumentException] { src.cloneTo(cloneRoot) }
  }

  test("as-of clone is point-in-time recovery: old state, then catch-up") {
    val src = newTable()
    applyRange(src, 0, 120)
    val midId = src.currentSnapshot.get.snapshotId
    val midState = state(src)
    applyRange(src, 120, nTxns)

    val clone = new LakeTable(spark, {
      val r = tmpDir("clone-pitr")
      src.cloneTo(r, asOfSnapshot = Some(midId)); r
    })
    assert(state(clone) === midState)
    // recovery: re-ingesting the FULL stream applies exactly the tail
    val stats = applyRange(clone, 0, nTxns)
    assert(stats.appliedKeys > 0L)
    assert(state(clone) === expected(nTxns))
  }

  test("full lifecycle composition: apply -> rebucket -> compact -> clone -> ingest") {
    // every maintenance operation chained on one table, then the clone
    // and the source diverge — the composed invariants (exact watermarks
    // through rebucket, feed-immune compaction, watermark travel through
    // clone) must hold in sequence, not just in isolation
    val src = newTable()
    applyRange(src, 0, 100)
    MergeEngine.rebucket(src, 12)
    applyRange(src, 100, 180)
    MergeEngine.compactAll(src)
    val cloneRoot = tmpDir("clone-lifecycle")
    src.cloneTo(cloneRoot)
    val clone = new LakeTable(spark, cloneRoot)
    assert(state(clone) === expected(180))
    assert(clone.currentSnapshot.get.nBuckets === 12, "bucket layout travels")

    // both roots continue independently; the clone even rebuckets again
    applyRange(src, 180, nTxns)
    MergeEngine.rebucket(clone, 5)
    assert(applyRange(clone, 0, 180).appliedKeys === 0L, "replay gates exactly")
    applyRange(clone, 180, nTxns)
    assert(state(src) === expected(nTxns))
    assert(state(clone) === expected(nTxns))
  }

  test("clone of a distributed-manifest source; only referenced files travel") {
    // aggressive inline compaction => the source's latest commit holds
    // commitDeltas files that are NOT in bucketDeltas (compacted away in
    // their own commit, kept for the source's feed) — the clone must not
    // copy those, or the target starts life with unreferenced orphans
    val src = new LakeTable(spark, tmpDir("clone-src-dm"),
      manifestThresholdFiles = 0, maxDeltaBytesPerBucket = 1L)
    src.create(Main.reposSchema, Seq("repo", "path"), nBuckets = 8, Main.reposRenameMap)
    applyRange(src, 0, 120)
    applyRange(src, 120, nTxns)
    val srcSnap = src.currentSnapshot.get
    assert(srcSnap.commitDeltas.values.flatten.nonEmpty &&
      srcSnap.bucketDeltas.isEmpty,
      "precondition: last commit compacted its own deltas away")
    val cloneRoot = tmpDir("clone-dm")
    val snap0 = src.cloneTo(cloneRoot)
    val clone = new LakeTable(spark, cloneRoot)
    assert(state(clone) === expected(nTxns))
    // the clone carries ONLY the cloned snapshot's files: every data file
    // on the target disk is referenced by snapshot 0
    val onDisk = java.nio.file.Files.walk(java.nio.file.Paths.get(cloneRoot, "data"))
      .iterator()
    var dataFiles = 0
    while (onDisk.hasNext) {
      val p = onDisk.next()
      if (p.toString.endsWith(".parquet")) dataFiles += 1
    }
    assert(dataFiles === snap0.allFiles.size)
    // lookup prunes through the cloned per-file stats
    val (k, _) = expected(nTxns).head
    assert(clone.lookup(Map("repo" -> k._1, "path" -> k._2)).count() === 1L)
  }
}
