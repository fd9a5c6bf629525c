package graft

import org.apache.spark.sql.functions._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.{CommitConflictException, LakeTable}
import graft.cli.Main

/**
 * Replays deterministic generated change streams through the MERGE engine
 * and checks final state against a sequential driver-side oracle — the
 * property the reference only exercises at 7-row scale
 * (KinesisReceivesPostgresChangesIT), strengthened here: any micro-batch
 * partitioning of the same stream must converge to the same final state,
 * with per-row sha256(content) equality (the north-rule invariant).
 */
class GenReplaySpec extends SparkSpec {
  import spark.implicits._

  // Small universe => plenty of key collisions (updates/deletes that matter).
  val cfg = GenConfig(seed = 7L, nRepos = 20, pathsPerRepo = 5, maxChangesPerTxn = 3)
  val nTxns = 300L

  private def newTable(c: GenConfig = cfg): LakeTable = {
    val t = new LakeTable(spark, tmpDir("repos"))
    t.create(Main.reposSchema, Seq("repo", "path"), nBuckets = 8, Main.reposRenameMap)
    t
  }

  private def applyRange(t: LakeTable, c: GenConfig, from: Long, until: Long): MergeEngine.MergeStats = {
    val lines = (from until until).map(id => ChangeStreamGen.renderLine(c, ChangeStreamGen.txn(c, id)))
    val df = spark.createDataset(lines).toDF("value")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(df))
  }

  private def sha256(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def stateWithSha(t: LakeTable): Map[(String, String), (String, String)] =
    t.read().select(col("repo"), col("path"), col("commit"),
      sha2(col("content"), 256).as("sha")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getString(2), r.getString(3))).toMap

  private def expected(c: GenConfig, n: Long): Map[(String, String), (String, String)] =
    ChangeStreamGen.expectedFinalState(c, n).map { case (k, ch) =>
      k -> (ch.commit, sha256(ch.content))
    }

  test("replayed stream converges to the sequential oracle (single batch)") {
    val t = newTable()
    applyRange(t, cfg, 0, nTxns)
    assert(stateWithSha(t) === expected(cfg, nTxns))
  }

  test("micro-batch partitioning invariance: 1 vs 3 vs 10 batches, same final state") {
    val exp = expected(cfg, nTxns)
    for (batches <- Seq(3, 10)) {
      val t = newTable()
      val step = nTxns / batches
      var from = 0L
      while (from < nTxns) {
        applyRange(t, cfg, from, math.min(nTxns, from + step))
        from += step
      }
      assert(stateWithSha(t) === exp, s"divergence with $batches batches")
    }
  }

  test("property: random batch boundaries converge to the oracle") {
    val exp = expected(cfg, nTxns)
    val rnd = new scala.util.Random(99)
    for (round <- 1 to 3) {
      val t = newTable()
      var from = 0L
      while (from < nTxns) {
        val step = 1 + rnd.nextInt(120)
        applyRange(t, cfg, from, math.min(nTxns, from + step))
        from += step
      }
      assert(stateWithSha(t) === exp, s"divergence in round $round")
    }
  }

  test("additive column mid-stream: schema evolves, old rows read as null") {
    val c = cfg.copy(addColumnAtLsn = 150L)
    val t = newTable(c)
    applyRange(t, c, 0, 100)   // pre-evolution batch
    assert(!t.currentSnapshot.get.schema.fieldNames.contains("size_bytes"))
    applyRange(t, c, 100, nTxns) // post-evolution batch
    val snap = t.currentSnapshot.get
    assert(snap.schema.fieldNames.contains("size_bytes"))
    val df = t.read()
    val expState = ChangeStreamGen.expectedFinalState(c, nTxns)
    // rows last touched at lsn >= 150 carry size_bytes = content length
    val got = df.select(col("repo"), col("path"), col("size_bytes"),
      length(col("content")).cast("long").as("len")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3))).toMap
    // derive from the ORACLE which keys were last touched at/after the
    // evolution point — exactly those (and only those) must carry the new
    // column; a guard like "check only rows that happen to be non-null"
    // would let an evolution bug silently null the column everywhere
    val lastLsn = scala.collection.mutable.Map.empty[(String, String), Long]
    (0L until nTxns).foreach { id =>
      val txn = ChangeStreamGen.txn(c, id)
      txn.changes.foreach { ch =>
        val k = (ch.repo, ch.path)
        if (ch.kind == "delete") lastLsn.remove(k) else lastLsn(k) = txn.lsn
      }
    }
    expState.foreach { case (k, _) =>
      val (sz, len) = got(k)
      if (lastLsn(k) >= 150L)
        assert(sz === len, s"size_bytes missing/wrong for post-evolution $k " +
          s"(last touched at lsn ${lastLsn(k)})")
      else
        assert(sz === -1L, s"pre-evolution row $k must read size_bytes null")
    }
    assert(got.values.exists(_._1 >= 0), "no post-evolution rows found")
    assert(got.values.exists(_._1 == -1L), "no pre-evolution rows survived")
    assert(got.keySet === expState.keySet)
  }

  test("renamed column mid-stream: lang -> language coalesced across eras") {
    val c = cfg.copy(renameAtLsn = 150L)
    val t = newTable(c)
    applyRange(t, c, 0, 100)
    applyRange(t, c, 100, nTxns)
    val df = t.read()
    assert(df.columns.contains("language") && !df.columns.contains("lang"))
    // every surviving non-deleted row must have a non-null language
    assert(df.filter(col("language").isNull).count() === 0)
    assert(stateWithSha(t) === expected(c, nTxns))
  }

  test("snapshot-id fencing: stale commit is rejected") {
    val t = newTable()
    applyRange(t, cfg, 0, 50)
    val snap = t.currentSnapshot.get
    // another writer advances the table
    applyRange(t, cfg, 50, 100)
    intercept[CommitConflictException] {
      t.commit(snap.copy(lsnHighWatermark = 9999L), expectedSnapshotId = snap.snapshotId)
    }
  }

  test("idle fast-forward advances the watermark monotonically (reference O12)") {
    val t = newTable()
    applyRange(t, cfg, 0, 50)
    val before = t.currentSnapshot.get.lsnHighWatermark
    val s1 = MergeEngine.fastForward(t, before + 500)
    assert(s1.lsnHighWatermark === before + 500)
    val s2 = MergeEngine.fastForward(t, before + 100) // backwards: no-op
    assert(s2.lsnHighWatermark === before + 500)
    // data is untouched
    assert(t.read().count() > 0)
  }

  test("generator determinism: same (seed, txnId) => identical line") {
    val a = ChangeStreamGen.renderLine(cfg, ChangeStreamGen.txn(cfg, 123L))
    val b = ChangeStreamGen.renderLine(cfg, ChangeStreamGen.txn(cfg, 123L))
    assert(a === b)
    val other = ChangeStreamGen.renderLine(cfg.copy(seed = 8L),
      ChangeStreamGen.txn(cfg.copy(seed = 8L), 123L))
    assert(a !== other)
  }

  test("zipfRank covers the full configured range [0, n)") {
    // pow(n, u) < n for every u < 1 made rank n-1 unreachable: the key
    // space was silently one repo smaller than configured
    val n = 8
    val ranks = (0 until 100000)
      .map(i => ChangeStreamGen.zipfRank(i / 100000.0, n)).toSet
    assert(ranks === (0 until n).toSet,
      s"every rank must be reachable, got ${ranks.toSeq.sorted}")
    assert(ChangeStreamGen.zipfRank(0.0, n) === 0)
    assert(ChangeStreamGen.zipfRank(0.999999, n) === n - 1)
  }

  test("hot-repo skew exists in the generated stream (Zipf head)") {
    val lines = ChangeStreamGen.lines(spark, cfg, 500L, 4)
    val byRepo = ChangeDecoder.decode(lines.toDF("value"))
      .groupBy(ChangeDecoder.keyValue("repo").as("repo")).count()
      .orderBy(desc("count")).collect()
    val top = byRepo.head.getLong(1).toDouble
    val total = byRepo.map(_.getLong(1)).sum.toDouble
    assert(top / total > 0.15, s"expected a hot head repo, got ${top / total}")
  }
}
