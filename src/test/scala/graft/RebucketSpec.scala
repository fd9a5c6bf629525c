package graft

import org.apache.spark.sql.functions._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.streaming.Mirror
import graft.cli.Main

/**
 * Bucket-count evolution ([[MergeEngine.rebucket]]): the table's merged
 * state rewritten under a new bucket count in one fenced commit. The
 * dangerous invariant under test is WATERMARK EXACTNESS — base rows carry
 * no LSN, so a replayed event that slips past the post-rebucket gate would
 * regress its row (an over-conservative watermark is as wrong as a missing
 * one). Every new bucket (including empty ones) must gate at the global
 * high watermark.
 */
class RebucketSpec extends SparkSpec {
  import spark.implicits._

  // Small key universe => dense update/delete collisions, so a watermark
  // leak would visibly regress rows and resurrect deleted keys.
  val cfg = GenConfig(seed = 11L, nRepos = 15, pathsPerRepo = 4, maxChangesPerTxn = 3)
  val nTxns = 300L

  private def newTable(manifestThreshold: Int = 4096): LakeTable = {
    val t = new LakeTable(spark, tmpDir("rebucket"),
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

  private def state(t: LakeTable, asOf: Option[Long] = None): Map[(String, String), (String, String)] =
    t.read(asOfSnapshot = asOf).select(col("repo"), col("path"), col("commit"),
      sha2(col("content"), 256).as("sha")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getString(2), r.getString(3))).toMap

  private def expected(n: Long): Map[(String, String), (String, String)] =
    ChangeStreamGen.expectedFinalState(cfg, n).map { case (k, ch) =>
      k -> (ch.commit, sha256(ch.content))
    }

  test("rebucket up and down preserves state; snapshot invariants hold") {
    val t = newTable()
    applyRange(t, 0, nTxns)
    val exp = expected(nTxns)
    val wm = t.currentSnapshot.get.lsnHighWatermark

    for (n <- Seq(16, 3)) {
      val snap = MergeEngine.rebucket(t, n)
      assert(snap.nBuckets === n)
      assert(state(t) === exp, s"state diverged after rebucket to $n")
      // merged state fully rewritten: no deltas, no stale base buckets
      assert(snap.bucketDeltas.isEmpty)
      assert(snap.bucketFiles.keySet.forall(b => b >= 0 && b < n))
      // EXACT watermarks covering EVERY bucket (empty ones included — a
      // deleted key's replayed insert must still gate, or it resurrects)
      assert(snap.bucketWatermarks === (0 until n).map(_ -> wm).toMap)
      assert(snap.lsnHighWatermark === wm)
      // no logical changes: the feed must skip this commit
      assert(snap.commitDeltas.isEmpty)
    }
    // same-count rebucket is a no-op commit-wise
    val before = t.currentSnapshot.get
    assert(MergeEngine.rebucket(t, 3).snapshotId === before.snapshotId)
    intercept[IllegalArgumentException] { MergeEngine.rebucket(t, 0) }
  }

  test("full replay after rebucket is a no-op; continued ingest converges") {
    val t = newTable()
    applyRange(t, 0, 200)
    MergeEngine.rebucket(t, 16)
    val snapAfter = t.currentSnapshot.get.snapshotId

    // the WHOLE prefix replayed (crash redelivery): every event is at or
    // below the uniform watermark — zero applied, no commit, and (the
    // regression this suite exists for) no row regressed to an older value
    val replay = applyRange(t, 0, 200)
    assert(replay.appliedKeys === 0L)
    assert(t.currentSnapshot.get.snapshotId === snapAfter)
    assert(state(t) === expected(200))

    // the stream continues under the new bucketing (applyBatch re-reads
    // the snapshot, so a streaming writer follows the rebucket untouched)
    applyRange(t, 200, nTxns)
    assert(state(t) === expected(nTxns))
    // ...and deltas written post-rebucket land in new-bucket range
    val snap = t.currentSnapshot.get
    assert(snap.bucketDeltas.keySet.forall(b => b >= 0 && b < 16))
  }

  test("time travel crosses the rebucket; change feed skips it") {
    val t = newTable()
    applyRange(t, 0, 150)
    val preId = t.currentSnapshot.get.snapshotId
    val preState = state(t)
    MergeEngine.rebucket(t, 16)
    val rebucketId = t.currentSnapshot.get.snapshotId
    applyRange(t, 150, nTxns)

    // old snapshots stay readable under their own bucket count
    assert(t.snapshotAt(preId).nBuckets === 8)
    assert(state(t, asOf = Some(preId)) === preState)

    // the rebucket commit contributes ZERO feed rows (no logical changes)
    assert(t.changes(preId, rebucketId).count() === 0L)
    // and a feed range spanning it delivers exactly the later commits'
    // change SET — identical (key, lsn, snapshot) tuples as a range
    // starting after the rebucket (a count-only compare would let N
    // re-delivered rows mask N attribution losses)
    def feedSet(from: Long) =
      t.changes(from, t.currentSnapshot.get.snapshotId)
        .select(col("repo"), col("path"), col("_lsn"), col("_snapshot"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet
    assert(feedSet(preId) === feedSet(rebucketId))
    assert(feedSet(preId).nonEmpty)

    // point lookups route through the new bucketing
    val (k, _) = expected(nTxns).head
    val (bucket, _, _) = t.planFiles(t.currentSnapshot.get,
      Map("repo" -> k._1, "path" -> k._2))
    assert(bucket >= 0 && bucket < 16)
    val row = t.lookup(Map("repo" -> k._1, "path" -> k._2)).collect()
    assert(row.length === 1)
  }

  test("rebucket in distributed-manifest mode") {
    val t = newTable(manifestThreshold = 0)
    applyRange(t, 0, 200)
    val snap = MergeEngine.rebucket(t, 12)
    assert(snap.bucketManifests.nonEmpty, "root should point at per-bucket manifests")
    assert(state(t) === expected(200))
    // replay exactness holds through the manifest round trip too
    assert(applyRange(t, 0, 200).appliedKeys === 0L)
    applyRange(t, 200, nTxns)
    assert(state(t) === expected(nTxns))
  }

  test("torture: random apply/replay/rebucket interleavings converge to the oracle") {
    // the adversarial schedule for the watermark-exactness invariant:
    // arbitrary batch boundaries, arbitrary REPLAYS of already-applied
    // ranges (crash redelivery can resend any suffix), and rebuckets to
    // arbitrary counts between any two of them — state must track the
    // sequential oracle at every step
    val rnd = new scala.util.Random(4242)
    for (round <- 1 to 2) {
      val t = newTable()
      var applied = 0L
      while (applied < nTxns) {
        val step = 1 + rnd.nextInt(80)
        val until = math.min(nTxns, applied + step)
        applyRange(t, applied, until)
        applied = until
        rnd.nextInt(4) match {
          case 0 => // rebucket to a random count
            MergeEngine.rebucket(t, 1 + rnd.nextInt(24))
          case 1 if applied > 1 => // replay a random already-applied range
            val from = rnd.nextLong(applied)
            val stats = applyRange(t, from, applied)
            assert(stats.appliedKeys === 0L,
              s"replay of [$from,$applied) applied rows (round $round)")
          case _ => ()
        }
      }
      assert(state(t) === expected(nTxns), s"divergence in round $round")
    }
  }

  test("watermark gate via broadcast join (high-bucket-count path) is exact") {
    // past watermarkJoinThreshold active buckets the gate swaps its inline
    // map literal for a broadcast join; force that path at small scale and
    // re-prove the exactly-once semantics through it
    val saved = MergeEngine.watermarkJoinThreshold
    MergeEngine.watermarkJoinThreshold = 0
    try {
      val t = newTable()
      applyRange(t, 0, 150)
      assert(applyRange(t, 0, 150).appliedKeys === 0L, "replay must no-op")
      applyRange(t, 150, nTxns)
      assert(state(t) === expected(nTxns))
    } finally MergeEngine.watermarkJoinThreshold = saved
  }

  test("a mirror consuming the feed replicates across a source rebucket") {
    val src = newTable()
    applyRange(src, 0, 150)
    val mirror = Mirror.ensureMirror(spark, tmpDir("rebucket-mirror"),
      src.currentSnapshot.get)
    var synced = -1L
    def syncMirror(): Unit = {
      val to = src.currentSnapshot.get.snapshotId
      if (to > synced) {
        Mirror.applyFeedBatch(mirror, src.changes(synced, to))
        synced = to
      }
    }
    syncMirror()
    assert(state(mirror) === state(src))

    // source rebuckets (mirror keeps its own count — feed rows are
    // bucket-agnostic) and keeps ingesting; the mirror syncs a range that
    // SPANS the rebucket commit and must converge regardless
    MergeEngine.rebucket(src, 16)
    applyRange(src, 150, nTxns)
    syncMirror()
    assert(state(mirror) === state(src))
    assert(state(mirror) === expected(nTxns))
  }
}
