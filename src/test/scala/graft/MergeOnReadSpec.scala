package graft

import org.apache.spark.sql.functions._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.cli.Main

/**
 * Merge-on-read semantics: a batch appends per-bucket delta files instead
 * of rewriting touched buckets (apply is O(batch), not O(table)); read
 * resolves keep-last; compaction is amortized, bounded, and state-preserving.
 */
class MergeOnReadSpec extends SparkSpec {
  import spark.implicits._

  val cfg = GenConfig(seed = 47L, nRepos = 12, pathsPerRepo = 4, maxChangesPerTxn = 3)

  private def lines(from: Long, until: Long) =
    spark.createDataset((from until until)
      .map(id => ChangeStreamGen.renderLine(cfg, ChangeStreamGen.txn(cfg, id)))).toDF("value")

  private def state(t: LakeTable): Map[(String, String), String] =
    t.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap

  private def newTable(maxDeltas: Int): LakeTable = {
    val t = new LakeTable(spark, tmpDir("repos"), maxDeltasPerBucket = maxDeltas)
    t.create(Main.reposSchema, Seq("repo", "path"), 4, Main.reposRenameMap)
    t
  }

  test("data-aware hybrid read: local/shuffle split agrees with all-local") {
    // the merge-shape choice is now per BUCKET (on-disk bytes vs
    // maxLocalMergeBytesPerBucket); whatever mix of local and shuffle
    // subtrees a snapshot resolves to, the merged state must be identical
    val t = newTable(maxDeltas = 100)
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 120)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(120, 200)))
    val allLocal = state(t)
    val allShuffle = new LakeTable(spark, t.root,
      maxLocalMergeBytesPerBucket = 0L)
    assert(state(allShuffle) === allLocal)
    // a threshold between the smallest and largest bucket => genuine split
    val snap = t.currentSnapshot.get
    def bb(b: Int): Long =
      (snap.bucketFiles.getOrElse(b, Nil) ++ snap.bucketDeltas.getOrElse(b, Nil))
        .map(snap.fileBytes(_)).sum
    val sizes = snap.dataBuckets.toSeq.map(bb).sorted
    assert(sizes.head < sizes.last, "fixture must have uneven buckets")
    val split = new LakeTable(spark, t.root,
      maxLocalMergeBytesPerBucket = sizes(sizes.size / 2))
    assert(state(split) === allLocal)
    val plan = split.read().queryExecution.executedPlan.toString
    assert(plan.contains("Exchange"), "the big buckets must take the shuffle merge")
  }

  test("inlineCompaction=false defers every rewrite to maintenance; state identical throughout") {
    // both triggers set aggressively low — with the flag off, NEITHER may
    // fire inside an ingest commit
    val t = new LakeTable(spark, tmpDir("noinline"), maxDeltasPerBucket = 1,
      maxDeltaBytesPerBucket = 1L, inlineCompaction = false)
    t.create(Main.reposSchema, Seq("repo", "path"), 4, Main.reposRenameMap)
    val ref = newTable(maxDeltas = 1) // inline-compacting twin, same input
    (0 until 4).foreach { i =>
      val batch = lines(i * 50L, (i + 1) * 50L)
      MergeEngine.applyBatch(t, ChangeDecoder.decode(batch))
      MergeEngine.applyBatch(ref, ChangeDecoder.decode(batch))
    }
    val snap = t.currentSnapshot.get
    assert(snap.bucketDeltas.values.map(_.size).max >= 4,
      "deltas must accumulate past both thresholds with the flag off")
    assert(ref.currentSnapshot.get.bucketDeltas.values.forall(_.isEmpty),
      "the inline twin must have compacted")
    assert(state(t) === state(ref), "deferred reads must merge identically")
    // the maintenance pass folds everything; state unchanged
    MergeEngine.compactAll(t)
    assert(t.currentSnapshot.get.bucketDeltas.values.forall(_.isEmpty))
    assert(state(t) === state(ref))
  }

  test("size-tiered compaction: tiny deltas defer, large deltas compact early") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType)))
    def ins(lsn: Long, id: Int, v: String): String =
      s"""{"lsn":$lsn,"xid":$lsn,"change":[{"kind":"insert","schema":"public","table":"t",""" +
        s""""columnnames":["id","v"],"columntypes":["integer","text"],""" +
        s""""columnvalues":[$id,"$v"]}]}"""
    def applyLines(t: LakeTable, ls: Seq[String]): Unit =
      MergeEngine.applyBatch(t,
        ChangeDecoder.decode(spark.createDataset(ls).toDF("value")))

    // MANY TINY deltas: past the old count-8 trigger but far below the
    // byte cap — a full bucket rewrite to fold kilobytes is the waste the
    // size-tiered trigger exists to avoid, so compaction must DEFER
    val tiny = new LakeTable(spark, tmpDir("tiny"),
      maxDeltasPerBucket = 64, maxDeltaBytesPerBucket = 1L * 1024 * 1024)
    tiny.create(schema, Seq("id"), 1)
    (1 to 10).foreach(i => applyLines(tiny, Seq(ins(i, i, s"x$i"))))
    val ts = tiny.currentSnapshot.get
    assert(ts.bucketDeltas(0).size === 10,
      "tiny deltas must accumulate, not compact")
    assert(ts.fileBytes.keySet === ts.allFiles.toSet,
      "every live file's size rides the snapshot")
    assert(LakeTable.fromJson(LakeTable.toJson(ts)) === ts,
      "fileBytes must round-trip the snapshot JSON")

    // LARGE deltas: the byte cap triggers well under the file-count cap
    val big = new LakeTable(spark, tmpDir("big"),
      maxDeltasPerBucket = 64, maxDeltaBytesPerBucket = 2000L)
    big.create(schema, Seq("id"), 1)
    applyLines(big, (1 to 40).map(i => ins(i, i, "v" * 50)))
    applyLines(big, (41 to 80).map(i => ins(i.toLong, i, "w" * 50)))
    val bs = big.currentSnapshot.get
    assert(bs.bucketDeltas.values.forall(_.isEmpty),
      "large deltas must compact promptly")
    assert(bs.bucketFiles(0).size === 1)
    assert(big.read().count() === 80)
    // and the file-count HARD CAP still bounds fan-in on its own
    val capped = new LakeTable(spark, tmpDir("capped"),
      maxDeltasPerBucket = 3, maxDeltaBytesPerBucket = Long.MaxValue)
    capped.create(schema, Seq("id"), 1)
    (1 to 3).foreach(i => applyLines(capped, Seq(ins(i, i, "z"))))
    assert(capped.currentSnapshot.get.bucketDeltas.values.forall(_.isEmpty))
  }

  test("an upsert batch appends deltas and does NOT rewrite base files") {
    val t = newTable(maxDeltas = 100) // threshold out of the way
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 100)))
    val s1 = t.currentSnapshot.get
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(100, 140)))
    val s2 = t.currentSnapshot.get
    // base untouched; only delta chains grew (apply wrote O(batch) bytes)
    assert(s2.bucketFiles === s1.bucketFiles)
    assert(s2.bucketDeltas.values.map(_.size).sum >
      s1.bucketDeltas.values.map(_.size).sum)
  }

  test("reading delta-carrying buckets is SHUFFLE-FREE (no Exchange in the plan)") {
    val t = newTable(maxDeltas = 100)
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 100)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(100, 160)))
    assert(t.currentSnapshot.get.bucketDeltas.values.exists(_.nonEmpty),
      "fixture must have delta-carrying buckets")
    val df = t.read()
    df.collect() // settle AQE
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // bucket layout co-locates all versions of a key, so the keep-last
    // merge must not pay a cluster-wide shuffle at read time
    assert(!plan.contains("Exchange"), s"merge read shuffled:\n$plan")
    // and the local merge agrees with the shuffle-based formulation
    val snap = t.currentSnapshot.get
    val shuffled = t.mergedView(snap.schema, snap.keyColumns, snap.renameMap,
      snap.dataBuckets.toSeq.flatMap(b => snap.bucketFiles.getOrElse(b, Nil)),
      snap.dataBuckets.toSeq.flatMap(b => snap.bucketDeltas.getOrElse(b, Nil)))
      .select(col("repo"), col("path"), sha2(col("content"), 256)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(state(t) === shuffled)
  }

  test("past the plan-size guard the shuffle fallback returns the identical state") {
    // two tables over the same root data shape: one forced onto the
    // shuffle-merge fallback (threshold 1 < delta-carrying buckets), one on
    // the default local merge — byte-identical reads
    val root = tmpDir("repos")
    val local = new LakeTable(spark, root)
    local.create(Main.reposSchema, Seq("repo", "path"), 4, Main.reposRenameMap)
    MergeEngine.applyBatch(local, ChangeDecoder.decode(lines(0, 120)))
    val fallback = new LakeTable(spark, root, maxLocalMergeBuckets = 1)
    assert(local.currentSnapshot.get.bucketDeltas.count(_._2.nonEmpty) > 1)
    val a = state(local)
    val b = fallback.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(a === b)
    // and the fallback plan really is the shuffle formulation
    val p = fallback.read().queryExecution.executedPlan.toString
    assert(p.contains("Exchange"), "fallback should shuffle")
  }

  test("state parity: merge-on-read table == replay oracle across many batches") {
    val t = newTable(maxDeltas = 3) // force compactions along the way
    (0L until 200L by 40L).foreach { from =>
      MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(from, from + 40)))
    }
    def sha256(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val exp = ChangeStreamGen.expectedFinalState(cfg, 200L)
      .map { case (k, ch) => k -> sha256(ch.content) }
    assert(state(t) === exp)
    // compaction actually fired: no bucket's chain may reach the threshold
    val s = t.currentSnapshot.get
    assert(s.bucketDeltas.values.forall(_.size < 3))
    assert(s.bucketFiles.nonEmpty)
  }

  test("compaction preserves state and clears the compacted chains") {
    val t = newTable(maxDeltas = 2)
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 80)))
    val before = state(t)
    // second batch pushes every touched bucket to the threshold => compact
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(80, 81)))
    val s = t.currentSnapshot.get
    val after = state(t)
    assert(s.bucketDeltas.values.forall(_.size < 2))
    // keys may only vanish when the second batch explicitly deleted them
    val exp0 = ChangeStreamGen.expectedFinalState(cfg, 81L).keySet
    assert((before.keySet -- after.keySet).subsetOf(before.keySet -- exp0))
    // replay oracle parity after compaction
    def sha256(x: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val exp = ChangeStreamGen.expectedFinalState(cfg, 81L)
      .map { case (k, ch) => k -> sha256(ch.content) }
    assert(after === exp)
  }

  test("delete markers remove rows through the merged view and compaction") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType)))
    val t = new LakeTable(spark, tmpDir("dels"), maxDeltasPerBucket = 3)
    t.create(schema, Seq("id"), 2)
    def ins(lsn: Long, id: Int) =
      s"""{"lsn":$lsn,"xid":$lsn,"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["id","name"],"columntypes":["integer","text"],"columnvalues":[$id,"n$id"]}]}"""
    def del(lsn: Long, id: Int) =
      s"""{"lsn":$lsn,"xid":$lsn,"change":[{"kind":"delete","schema":"s","table":"t","oldkeys":{"keynames":["id"],"keytypes":["integer"],"keyvalues":[$id]}}]}"""
    def apply(ls: Seq[String]) =
      MergeEngine.applyBatch(t, ChangeDecoder.decode(spark.createDataset(ls).toDF("value")))
    apply(Seq(ins(1, 1), ins(2, 2), ins(3, 3)))
    apply(Seq(del(4, 2)))                      // delta delete marker
    assert(t.read().select("id").collect().map(_.getInt(0)).toSet === Set(1, 3))
    apply(Seq(del(5, 1)))                      // triggers compaction (3 deltas)
    assert(t.read().select("id").collect().map(_.getInt(0)).toSet === Set(3))
    val s = t.currentSnapshot.get
    assert(s.bucketDeltas.values.forall(_.size < 3))
  }

  test("time travel reads historical snapshots across delta/compaction eras") {
    val t = newTable(maxDeltas = 2)
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 60)))
    val sid1 = t.currentSnapshot.get.snapshotId
    val stateAt1 = state(t)
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(60, 120)))  // compacts
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(120, 180))) // new deltas
    assert(state(t) !== stateAt1)
    assert(t.read(asOfSnapshot = Some(sid1))
      .select(col("repo"), col("path"), sha2(col("content"), 256)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap === stateAt1)
  }
}
