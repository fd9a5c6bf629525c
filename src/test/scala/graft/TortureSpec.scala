package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.cli.Main
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.streaming.{CdcPipeline, TableTarget}

/**
 * Everything at once: rate-limited micro-batches + byte-range segment
 * splits + WAL retention + schema evolution mid-stream + aggressive
 * compaction + a poisoned segment healed under supervision — the final
 * state must still equal the sequential replay oracle, exactly once.
 */
class TortureSpec extends SparkSpec {

  private def sha256(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def state(t: LakeTable): Map[(String, String), String] =
    t.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap

  private def torture(manifestThreshold: Int): Unit = {
    val cfg = GenConfig(seed = 67L, nRepos = 12, pathsPerRepo = 4,
      maxChangesPerTxn = 3, addColumnAtLsn = 90L, renameAtLsn = 150L)
    val wal = tmpDir("wal"); val ckpt = tmpDir("ckpt")
    ChangeStreamGen.writeSegments(spark, cfg, wal, 200L, txnsPerSegment = 25)

    // poison a middle segment; the operator heals it on the first restart
    val seg = Paths.get(s"$wal/wal-000000004.jsonl")
    val good = Files.readString(seg)
    Files.writeString(seg, good + "{\"not\": \"wal2json\"}\n")

    val table = new LakeTable(spark, tmpDir("repos"), maxDeltasPerBucket = 2,
      manifestThresholdFiles = manifestThreshold)
    val pipe = new CdcPipeline(spark, wal, ckpt,
      Seq(TableTarget("repos", table, Main.reposSchema, Seq("repo", "path"),
        4, Main.reposRenameMap)),
      Set("repos"),
      maxFilesPerTrigger = Some(2),     // 4 micro-batches
      walRetention = true,              // consumed segments deleted
      walSplitBytes = Some(4096L))      // multiple input partitions/segment
    val restarts = pipe.runSupervised(maxRestarts = 2, backoffMs = 10L,
      onRestart = _ => Files.writeString(seg, good))
    assert(restarts === 1)

    val exp = ChangeStreamGen.expectedFinalState(cfg, 200L)
      .map { case (k, ch) => k -> sha256(ch.content) }
    assert(state(table) === exp)

    val snap = table.currentSnapshot.get
    assert(snap.lsnHighWatermark === 200L)
    // evolution really happened (additive column present, rename applied)
    assert(snap.schema.fieldNames.contains("size_bytes"))
    assert(snap.schema.fieldNames.contains("language"))
    // compaction really happened at maxDeltas=2 across >= 4 batches
    assert(snap.bucketDeltas.values.forall(_.size < 2))
    assert(snap.bucketFiles.nonEmpty)
    // retention really happened: the consumed WAL was released
    assert(graft.sources.WalSource.listSegments(wal).size <= 1)

    // and a replay from a fresh checkpoint is a fenced no-op even though
    // the WAL is gone (watermarks gate whatever segments remain)
    val pipe2 = new CdcPipeline(spark, wal, tmpDir("ckpt2"),
      Seq(TableTarget("repos", table, Main.reposSchema, Seq("repo", "path"),
        4, Main.reposRenameMap)), Set("repos"))
    pipe2.runAvailable()
    assert(table.currentSnapshot.get.snapshotId === snap.snapshotId)
    assert(state(table) === exp)
    // in distributed-manifest mode every round of the torture committed
    // through per-bucket manifests
    if (manifestThreshold == 0)
      assert(table.currentSnapshot.get.bucketManifests.nonEmpty)
  }

  test("retention + splits + rate limit + evolution + poison-heal => oracle parity") {
    torture(manifestThreshold = 4096) // inline snapshots (default shape)
  }

  test("the same torture with distributed per-bucket manifests") {
    torture(manifestThreshold = 0)
  }
}
