package graft

import java.util.concurrent.{CyclicBarrier, Executors, TimeUnit}
import org.apache.spark.sql.functions._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.cli.Main

/**
 * The zombie-writer race END TO END (not just the commit primitive,
 * CommitFencingSpec covers that): two writers concurrently apply the SAME
 * batch — a stale driver finishing after failover. Snapshot-id fencing
 * serializes the commits; the loser's optimistic retry re-reads the
 * winner's snapshot and the watermark gate turns its replay into a no-op.
 * Exactly-once table state, no orphaned attempt directories.
 *
 * (Note: the engine's delivery contract is LSN-ordered batches from ONE
 * logical stream — concurrency arises from replays/zombies, not from two
 * independent out-of-order streams.)
 */
class ConcurrentApplySpec extends SparkSpec {
  import spark.implicits._

  val cfg = GenConfig(seed = 83L, nRepos = 10, pathsPerRepo = 4, maxChangesPerTxn = 2)

  private def lines(from: Long, until: Long) =
    spark.createDataset((from until until)
      .map(id => ChangeStreamGen.renderLine(cfg, ChangeStreamGen.txn(cfg, id)))).toDF("value")

  test("zombie writer: concurrent duplicate applies stay exactly-once, no orphans") {
    val t = new LakeTable(spark, tmpDir("race"), maxDeltasPerBucket = 3)
    t.create(Main.reposSchema, Seq("repo", "path"), 4, Main.reposRenameMap)
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 40)))

    val pool = Executors.newFixedThreadPool(2)
    val barrier = new CyclicBarrier(2)
    try {
      // the next batch is delivered TWICE, concurrently (failover overlap)
      val results = Seq(0, 1).map { _ =>
        pool.submit(new java.util.concurrent.Callable[MergeEngine.MergeStats] {
          override def call(): MergeEngine.MergeStats = {
            val replayed = ChangeDecoder.decode(lines(40, 80))
            barrier.await(30, TimeUnit.SECONDS)
            MergeEngine.applyBatch(t, replayed)
          }
        })
      }.map(_.get(300, TimeUnit.SECONDS))

      // exactly one delivery took effect: whatever the interleaving, the
      // batch's keys were applied once in total (the loser either no-ops
      // after the winner's watermark advance, or its retry applies zero)
      val expectedKeys = results.map(_.appliedKeys).max
      assert(results.map(_.appliedKeys).sum === expectedKeys)
      // exactly ONE delivery commits: the loser's retry watermark-gates to
      // zero fresh events and returns the no-op stats (committed = false)
      assert(results.count(_.committed) === 1)
    } finally pool.shutdownNow()

    def sha256(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val exp = ChangeStreamGen.expectedFinalState(cfg, 80L)
      .map { case (k, ch) => k -> sha256(ch.content) }
    val got = t.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(got === exp)

    // every attempt dir on disk is referenced by some live snapshot: the
    // losing zombie's files were cleaned up, not leaked
    assertNoOrphans(t)
  }

  test("maintenance racing live ingest: rebucket + compactAll vs applies") {
    // ONLINE maintenance contract: rebucket and compactAll are fenced
    // commits like any other — racing them against a stream of applies
    // must lose/retry cleanly on BOTH sides, never corrupt state, never
    // leak attempt dirs, and the replay gate must stay exact throughout.
    val t = new LakeTable(spark, tmpDir("maint-race"), maxDeltasPerBucket = 1000,
      maxDeltaBytesPerBucket = Long.MaxValue)
    t.create(Main.reposSchema, Seq("repo", "path"), 8, Main.reposRenameMap)
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 40)))

    val pool = Executors.newFixedThreadPool(2)
    val barrier = new CyclicBarrier(2)
    try {
      val ingest = pool.submit(new Runnable {
        override def run(): Unit = {
          barrier.await(30, TimeUnit.SECONDS)
          for (i <- 1 to 4)
            MergeEngine.applyBatch(t,
              ChangeDecoder.decode(lines(i * 40L, (i + 1) * 40L)))
        }
      })
      val maintenance = pool.submit(new Runnable {
        override def run(): Unit = {
          barrier.await(30, TimeUnit.SECONDS)
          MergeEngine.rebucket(t, 7)
          MergeEngine.compactAll(t)
          MergeEngine.rebucket(t, 4)
        }
      })
      ingest.get(300, TimeUnit.SECONDS)
      maintenance.get(300, TimeUnit.SECONDS)
    } finally pool.shutdownNow()

    def sha256(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val exp = ChangeStreamGen.expectedFinalState(cfg, 200L)
      .map { case (k, ch) => k -> sha256(ch.content) }
    val got = t.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(got === exp)
    // applies never change the bucket count, so the last maintenance wins
    assert(t.currentSnapshot.get.nBuckets === 4)
    // the replay gate stayed exact through every interleaving
    assert(MergeEngine.applyBatch(t,
      ChangeDecoder.decode(lines(0, 200))).appliedKeys === 0L)
    assertNoOrphans(t)
  }

  private def assertNoOrphans(t: LakeTable): Unit = {
    val maxId = t.currentSnapshot.get.snapshotId
    val live = (0L to maxId).flatMap(id => t.readSnapshot(id).allFiles)
      .map(f => java.nio.file.Paths.get(f).getName(1).toString).toSet
    val onDisk = java.nio.file.Files.list(java.nio.file.Paths.get(t.root, "data"))
      .iterator()
    val orphans = new scala.collection.mutable.ListBuffer[String]
    while (onDisk.hasNext) {
      val d = onDisk.next().getFileName.toString
      if (!live.contains(d)) orphans += d
    }
    assert(orphans.isEmpty, s"orphaned attempt dirs: $orphans")
  }
}
