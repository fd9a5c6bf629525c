package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.cli.Main

/**
 * CHANGE DATA FEED ([[LakeTable.changes]]): the lake table as a CDC
 * *source*. Each commit's net keep-last changes — including delete
 * tombstones — are readable per snapshot range, attributed to the snapshot
 * that committed them, immune to immediate same-commit compaction, and
 * retained exactly as long as the snapshots recording them.
 */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  val cfg = GenConfig(seed = 91L, nRepos = 10, pathsPerRepo = 4, maxChangesPerTxn = 3)

  private def lines(from: Long, until: Long) =
    spark.createDataset((from until until)
      .map(id => ChangeStreamGen.renderLine(cfg, ChangeStreamGen.txn(cfg, id)))).toDF("value")

  /** Ground truth straight from the generator: the net keep-last change per
    * key across txns [from, until) — (kind, lsn) of each key's last change. */
  private def expectedNet(from: Long, until: Long): Map[(String, String), (String, Long)] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[(String, String), (String, Long)]
    (from until until).foreach { id =>
      val t = ChangeStreamGen.txn(cfg, id)
      t.changes.foreach(c => m((c.repo, c.path)) = (c.kind, t.lsn))
    }
    m.toMap
  }

  private def feedMap(df: DataFrame): Map[(String, String), (String, Long)] =
    df.select(col("repo"), col("path"), col("_kind"), col("_lsn")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getString(2), r.getLong(3))).toMap

  private def newTable(dir: String, maxDeltas: Int = 64,
                       manifestThreshold: Int = 4096): LakeTable = {
    val t = new LakeTable(spark, tmpDir(dir), maxDeltasPerBucket = maxDeltas,
      manifestThresholdFiles = manifestThreshold)
    t.create(Main.reposSchema, Seq("repo", "path"), 4, Main.reposRenameMap)
    t
  }

  test("changes(from, to) returns each commit's net keep-last changes incl. tombstones") {
    val t = newTable("feed")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 120)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(120, 240)))
    assert(feedMap(t.changes(0, 1)) === expectedNet(0, 120))
    assert(feedMap(t.changes(1, 2)) === expectedNet(120, 240))
    // full range: one row per (key, snapshot), correctly attributed
    val both = t.changes(-1, 2)
    assert(both.count() ===
      expectedNet(0, 120).size + expectedNet(120, 240).size)
    assert(feedMap(both.filter(col("_snapshot") === 1L)) === expectedNet(0, 120))
    assert(feedMap(both.filter(col("_snapshot") === 2L)) === expectedNet(120, 240))
    // tombstones are IN the feed (deletes are changes), though not in read()
    val dels = both.filter(col("_kind") === "delete")
    assert(dels.count() > 0, "the generator stream must contain deletes")
    // empty range and validation
    assert(t.changes(2, 2).count() === 0)
    intercept[IllegalArgumentException] { t.changes(2, 1) }
    intercept[IllegalArgumentException] { t.changes(0, 99) }
  }

  test("immediate same-commit compaction cannot lose feed rows; orphan sweep keeps them") {
    // maxDeltasPerBucket = 1: every commit folds its freshly written delta
    // into a new base IN THE SAME COMMIT — bucketDeltas ends empty, but the
    // written delta files stay referenced as commitDeltas
    val t = newTable("feedc", maxDeltas = 1)
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 120)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(120, 240)))
    assert(t.currentSnapshot.get.bucketDeltas.isEmpty, "compaction must have fired")
    assert(feedMap(t.changes(1, 2)) === expectedNet(120, 240))
    // the compacted-away-but-feed-referenced delta dirs are NOT orphans
    assert(t.removeOrphans(graceMs = 0L) === 0)
    assert(feedMap(t.changes(1, 2)) === expectedNet(120, 240))
    // O(changed bytes) pinned at the SCAN level: the feed's input files are
    // exactly the commit's recorded deltas — never the (larger) compacted
    // bases the same commit produced, never any other commit's files
    val scanned = t.changes(1, 2).inputFiles.map(_.split("/").last).toSet
    val recorded = t.snapshotAt(2).commitDeltas.values.flatten
      .map(_.split("/").last).toSet
    assert(scanned === recorded, "feed must scan exactly the commit's delta files")
    assert(t.changes(1, 2).inputFiles.forall(_.contains("/delta-")),
      "feed must never read base/compacted files")
  }

  test("feed history is GC'd with its snapshots (retention coupling)") {
    val t = newTable("feedgc", maxDeltas = 1)
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 80)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(80, 160)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(160, 240)))
    val lastFeed = feedMap(t.changes(2, 3))
    val (droppedSnaps, deletedFiles) = t.expireSnapshots(keepLast = 1)
    assert(droppedSnaps === 3) // snapshots 0..2 (0 = the empty create)
    assert(deletedFiles > 0, "expired commits' files must be deleted")
    // the kept snapshot's feed remains intact...
    assert(feedMap(t.changes(2, 3)) === lastFeed)
    // ...while expired ranges are gone with their snapshots — and the
    // failure is TYPED, naming retention, not a raw metadata FileNotFound
    val ex = intercept[IllegalStateException] { t.changes(0, 1) }
    assert(ex.getMessage.contains("expired"))
  }

  test("long-history reads attribute correctly past the broadcast-join threshold") {
    // >64 referenced delta files forces the attribution off the literal-map
    // path (linear scan per row) onto the broadcast hash join; both shapes
    // must attribute identically
    val t = newTable("feedwide")
    (0 until 20).foreach { i =>
      MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(i * 12L, (i + 1) * 12L)))
    }
    val nFiles = (1 to 20)
      .map(s => t.snapshotAt(s).commitDeltas.values.flatten.size).sum
    assert(nFiles > 64, s"need >64 files to exercise the join path, got $nFiles")
    val all = t.changes(-1, 20)
    assert(all.filter(col("_snapshot").isNull).count() === 0,
      "every feed row must be attributed")
    (1 to 20).foreach { s =>
      assert(feedMap(all.filter(col("_snapshot") === s.toLong)) ===
        expectedNet((s - 1) * 12L, s * 12L), s"snapshot $s attribution")
    }
  }

  test("feed works identically on distributed-manifest snapshots (commitDeltas in the root)") {
    val t = newTable("feedm", manifestThreshold = 0)
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 120)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(120, 240)))
    assert(t.currentSnapshot.get.bucketManifests.nonEmpty, "distributed form expected")
    assert(feedMap(t.changes(1, 2)) === expectedNet(120, 240))
    assert(feedMap(t.changes(0, 1)) === expectedNet(0, 120))
  }

  test("idle fast-forward is feed-empty and never re-delivers the prior commit") {
    val t = newTable("feedff")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 100)))
    val afterApply = t.currentSnapshot.get.snapshotId
    // upstream LSN advances with no changes for this table (reference O12)
    MergeEngine.fastForward(t, 150L)
    val afterFf = t.currentSnapshot.get.snapshotId
    assert(afterFf === afterApply + 1)
    // the fast-forward commit contributes NOTHING to the feed — carrying
    // the previous commitDeltas forward would re-deliver commit 1's whole
    // change set under the new snapshot id
    assert(t.changes(afterApply, afterFf).count() === 0,
      "an idle fast-forward must be feed-empty")
    assert(feedMap(t.changes(-1, afterFf)) === expectedNet(0, 100),
      "full-range feed must contain each change exactly once")
    // later real commits feed normally (lsns 201.. clear the 150 watermark)
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(200, 300)))
    assert(feedMap(t.changes(afterFf, afterFf + 1)) === expectedNet(200, 300))
  }

  test("feed torture: random applies, fast-forwards, compaction, then expiration") {
    // interaction coverage the pairwise tests can't give: a seeded-random
    // interleaving of real commits and idle fast-forwards on a
    // compaction-heavy table (maxDeltas=2 folds deltas constantly), ground
    // truth per snapshot straight from the generator; then retention is
    // applied and the surviving feed must still match while expired ranges
    // fail typed
    val rnd = new scala.util.Random(13)
    val t = newTable("feedtorture", maxDeltas = 2)
    var cursor = 0L // generator txn ids consumed so far (lsn = id + 1)
    val snapNet = scala.collection.mutable.LinkedHashMap[Long, Map[(String, String), (String, Long)]]()
    (1 to 12).foreach { _ =>
      if (rnd.nextInt(4) == 0) {
        // idle fast-forward: upstream lsn advances with no txns for this
        // table — skip the generator range so ground truth agrees
        cursor += 5
        MergeEngine.fastForward(t, cursor) // lsn(cursor-1) = cursor
        snapNet.getOrElseUpdate(t.currentSnapshot.get.snapshotId, Map.empty)
        ()
      } else {
        val n = 20 + rnd.nextInt(30)
        MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(cursor, cursor + n)))
        snapNet(t.currentSnapshot.get.snapshotId) = expectedNet(cursor, cursor + n)
        cursor += n
      }
    }
    val latest = t.currentSnapshot.get.snapshotId
    val all = t.changes(-1, latest)
    assert(all.count() === snapNet.values.map(_.size).sum)
    snapNet.foreach { case (sid, net) =>
      assert(feedMap(all.filter(col("_snapshot") === sid)) === net, s"snapshot $sid")
    }
    // retention: the kept tail still feeds identically; expired fails typed
    val keep = 3
    t.expireSnapshots(keepLast = keep)
    val oldestKept = latest - keep + 1
    val tail = t.changes(oldestKept - 1, latest)
    snapNet.filter(_._1 >= oldestKept).foreach { case (sid, net) =>
      assert(feedMap(tail.filter(col("_snapshot") === sid)) === net,
        s"post-expire snapshot $sid")
    }
    val ex = intercept[IllegalStateException] { t.changes(-1, latest) }
    assert(ex.getMessage.contains("expired"))
  }

  test("feed-log index: indexed catch-up matches root resolution and caps metadata reads") {
    val t = newTable("feedidx")
    t.feedIndexMinRange = 2 // ranges here are tiny; production gates at 32
    (0 until 9).foreach { i =>
      MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(i * 12L, (i + 1) * 12L)))
    }
    def reads(body: => Unit): Long = {
      val before = t.metaReads.get(); body; t.metaReads.get() - before
    }
    val unindexed = t.changes(-1, 9)
    val unindexedReads = reads { t.changes(-1, 9) }
    assert(unindexedReads >= 10, // one root per id in (-1, 9] — the cost being indexed away
      s"expected one root read per snapshot before indexing, got $unindexedReads")
    // maintenance builds aligned segments [0,3] and [4,7]; [8,9] stays tail
    assert(t.indexFeed(segmentSize = 4) === 2)
    assert(t.indexFeed(segmentSize = 4) === 0, "re-index must be a no-op")
    var indexedDf: DataFrame = null
    val indexedReads = reads { indexedDf = t.changes(-1, 9) }
    // to-root + 2 segments + 1 uncovered tail root (id 8) = 4
    assert(indexedReads <= 4,
      s"indexed catch-up must read O(range/segment) metadata, got $indexedReads")
    assert(indexedDf.count() === unindexed.count())
    (1 to 9).foreach { s =>
      assert(feedMap(indexedDf.filter(col("_snapshot") === s.toLong)) ===
        expectedNet((s - 1) * 12L, s * 12L), s"snapshot $s attribution under index")
    }
  }

  test("feed-log index: a torn segment is skipped and a stale one cannot serve expired history") {
    val t = newTable("feedidxtorn")
    t.feedIndexMinRange = 2 // ranges here are tiny; production gates at 32
    (0 until 6).foreach { i =>
      MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(i * 12L, (i + 1) * 12L)))
    }
    assert(t.indexFeed(segmentSize = 3) === 2) // [0,2], [3,5]
    val metaDir = new java.io.File(new java.net.URI(t.root).getPath, "meta")
    val seg0 = new java.io.File(metaDir,
      f"feedlog-${0L}%012d-${2L}%012d.json")
    val staleBytes = java.nio.file.Files.readAllBytes(seg0.toPath)
    // torn segment (crash leftover): parse fails, resolution falls back to
    // roots — same answer, never an error
    java.nio.file.Files.write(seg0.toPath, "{\"first\":0,\"la".getBytes)
    val torn = t.changes(-1, 2)
    assert(feedMap(torn.filter(col("_snapshot") === 1L)) === expectedNet(0, 12))
    assert(feedMap(torn.filter(col("_snapshot") === 2L)) === expectedNet(12, 24))
    java.nio.file.Files.write(seg0.toPath, staleBytes)
    // expire: segments referencing expired ids die with their snapshots
    t.expireSnapshots(keepLast = 2)
    assert(!seg0.exists(), "expire must GC segments referencing expired ids")
    // simulate the crash window between root- and segment-deletion: put the
    // stale segment back — expired history must STILL fail typed, because
    // the range head is existence-checked before any segment is trusted
    java.nio.file.Files.write(seg0.toPath, staleBytes)
    val ex = intercept[IllegalStateException] { t.changes(-1, 2) }
    assert(ex.getMessage.contains("expired"))
    // and the retained tail still reads correctly despite the stale file
    assert(feedMap(t.changes(5, 6)) === expectedNet(60, 72))
  }

  test("feed deletes carry null non-key columns; upserts carry the payload") {
    val t = newTable("feedp")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 240)))
    val feed = t.changes(0, 1)
    val del = feed.filter(col("_kind") === "delete")
    assert(del.count() > 0)
    assert(del.filter(col("content").isNotNull).count() === 0,
      "tombstones must not invent payloads")
    val up = feed.filter(col("_kind") =!= "delete")
    assert(up.filter(col("content").isNull).count() === 0,
      "upserts must carry their payload")
    // the feed's survivors replayed equal the table: apply(feed) == read()
    val applied = up.select(col("repo"), col("path"), sha2(col("content"), 256))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    val dels = del.select(col("repo"), col("path"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val state = t.read().select(col("repo"), col("path"), sha2(col("content"), 256))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(applied.view.filterKeys(!dels.contains(_)).toMap === state)
  }
}
