package graft

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.cli.Main
import graft.sources.SnapshotOffset
import graft.streaming.Mirror

/**
 * Streaming CHANGE DATA FEED (`readStream.format("graft-changes")`) and the
 * table→table replication built on it ([[Mirror]]): snapshot-id offsets,
 * admission control under AvailableNow, checkpoint-recovery exactly-once,
 * loud schema-change failure, and the cascade WAL → primary → feed → mirror
 * converging to the identical final state.
 */
class ChangeFeedStreamSpec extends SparkSpec {
  import spark.implicits._

  val cfg = GenConfig(seed = 47L, nRepos = 12, pathsPerRepo = 5, maxChangesPerTxn = 3)

  private def lines(from: Long, until: Long) =
    spark.createDataset((from until until)
      .map(id => ChangeStreamGen.renderLine(cfg, ChangeStreamGen.txn(cfg, id)))).toDF("value")

  private def expectedNet(from: Long, until: Long): Map[(String, String), (String, Long)] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[(String, String), (String, Long)]
    (from until until).foreach { id =>
      val t = ChangeStreamGen.txn(cfg, id)
      t.changes.foreach(c => m((c.repo, c.path)) = (c.kind, t.lsn))
    }
    m.toMap
  }

  private def newTable(dir: String): LakeTable = {
    val t = new LakeTable(spark, tmpDir(dir))
    t.create(Main.reposSchema, Seq("repo", "path"), 4, Main.reposRenameMap)
    t
  }

  private def feedRows(df: DataFrame): Seq[((String, String), (String, Long), Long)] =
    df.select(col("repo"), col("path"), col("_kind"), col("_lsn"), col("_snapshot"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getString(2), r.getLong(3)),
        r.getLong(4))).toSeq

  /** Run the feed stream into a buffer via foreachBatch; returns batches in
    * order. AvailableNow: terminates at the source's snapshot at start. */
  private def runStream(root: String, checkpoint: String,
                        options: Map[String, String] = Map.empty)
      : ArrayBuffer[Seq[((String, String), (String, Long), Long)]] = {
    val batches = ArrayBuffer.empty[Seq[((String, String), (String, Long), Long)]]
    var reader = spark.readStream.format("graft-changes").option("path", root)
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        batches.synchronized { batches += feedRows(df) }
        ()
      }
      .start()
    q.awaitTermination()
    batches
  }

  test("snapshot offsets round-trip their JSON (incl. the checkpoint path)") {
    assert(SnapshotOffset(7).json === """{"snapshot":7}""")
    assert(SnapshotOffset.fromJson("""{"snapshot":7}""") === SnapshotOffset(7))
    assert(SnapshotOffset.fromJson(SnapshotOffset(-1).json) === SnapshotOffset(-1))
    intercept[IllegalArgumentException](SnapshotOffset.fromJson("""{"v":1}"""))
  }

  test("AvailableNow + maxSnapshotsPerTrigger=1 delivers one commit per batch, exactly once") {
    val t = newTable("feedstream")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 80)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(80, 160)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(160, 240)))

    val batches = runStream(t.root, tmpDir("feedstream-ckpt"),
      Map("maxSnapshotsPerTrigger" -> "1"))
    // snapshot 0 is the CREATE (no commit deltas): empty first batch, then
    // one batch per commit — admission control held under AvailableNow
    // (the v1 wrapper would have frozen the stream at its first offset).
    assert(batches.length === 4, s"got ${batches.length} batches")
    assert(batches(0).isEmpty)
    batches.zipWithIndex.drop(1).foreach { case (b, i) =>
      assert(b.map(_._3).toSet === Set(i.toLong), s"batch $i spans snapshots")
      val expect = expectedNet((i - 1) * 80L, i * 80L)
      assert(b.map(r => r._1 -> r._2).toMap === expect, s"batch $i contents")
    }
  }

  test("checkpoint recovery is exactly-once: restart resumes, replays nothing, idles cleanly") {
    val t = newTable("feedresume")
    val ckpt = tmpDir("feedresume-ckpt")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 100)))

    val first = runStream(t.root, ckpt)
    assert(first.flatten.map(r => r._1 -> r._2).toMap === expectedNet(0, 100))

    // new commits arrive; the SAME checkpoint picks up only the tail
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(100, 200)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(200, 300)))
    val second = runStream(t.root, ckpt)
    val tail = second.flatten
    assert(tail.map(_._3).toSet === Set(2L, 3L), "resume must deliver only new snapshots")
    assert(tail.filter(_._3 == 2L).map(r => r._1 -> r._2).toMap === expectedNet(100, 200))
    assert(tail.filter(_._3 == 3L).map(r => r._1 -> r._2).toMap === expectedNet(200, 300))

    // nothing new: the run terminates with zero batches delivered
    val third = runStream(t.root, ckpt)
    assert(third.flatten.isEmpty)
  }

  test("mirror follow: WAL -> primary -> feed -> mirror converges to the identical state") {
    val t = newTable("mirrorsrc")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 150)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(150, 300)))

    val mirrorRoot = tmpDir("mirrordst")
    val ckpt = tmpDir("mirror-ckpt")
    val stats = ArrayBuffer.empty[MergeEngine.MergeStats]
    val q = Mirror.follow(spark, t.root, mirrorRoot, ckpt,
      onBatch = s => stats.synchronized { stats += s; () })
    q.awaitTermination()

    def state(table: LakeTable): Set[Seq[Any]] = {
      val cols = table.currentSnapshot.get.schema.fieldNames
      table.read().select(cols.map(col).toIndexedSeq: _*)
        .collect().map(_.toSeq).toSet
    }
    val mirror = new LakeTable(spark, mirrorRoot)
    assert(state(mirror) === state(t), "mirror state must equal source state")
    assert(state(mirror).nonEmpty)

    // replay: re-running the follow with the same checkpoint applies zero
    // (offsets), and with a FRESH checkpoint the LSN fence applies zero
    val q2 = Mirror.follow(spark, t.root, mirrorRoot, ckpt,
      onBatch = s => stats.synchronized { stats += s; () })
    q2.awaitTermination()
    val before = stats.map(_.appliedKeys).sum
    val q3 = Mirror.follow(spark, t.root, mirrorRoot, tmpDir("mirror-ckpt2"),
      onBatch = s => stats.synchronized { stats += s; () })
    q3.awaitTermination()
    assert(stats.map(_.appliedKeys).sum === before,
      "a fresh-checkpoint replay must be fenced to zero applied keys by LSN watermarks")
    assert(state(mirror) === state(t))

    // incremental follow: new source commits flow through the same checkpoint
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(300, 400)))
    val q4 = Mirror.follow(spark, t.root, mirrorRoot, ckpt)
    q4.awaitTermination()
    assert(state(mirror) === state(t), "mirror must track the new commit")
  }

  test("deletes propagate to the mirror as real row removals") {
    val t = newTable("mirrordel")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 200)))
    val deleted = expectedNet(0, 200).collect {
      case ((repo, path), ("delete", _)) => (repo, path)
    }.toSet
    assert(deleted.nonEmpty, "generator must produce net deletes for this test")
    val mirrorRoot = tmpDir("mirrordel-dst")
    val q = Mirror.follow(spark, t.root, mirrorRoot, tmpDir("mirrordel-ckpt"))
    q.awaitTermination()
    val mirror = new LakeTable(spark, mirrorRoot)
    val mirrorKeys = mirror.read().select("repo", "path").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(mirrorKeys.intersect(deleted) === Set.empty,
      "net-deleted keys must not exist in the mirror")
  }

  test("live cascade: streaming WAL ingest and streaming mirror run CONCURRENTLY") {
    val wal = tmpDir("cascade-wal")
    ChangeStreamGen.writeSegments(spark, cfg, wal, 300L, txnsPerSegment = 30)
    val root = tmpDir("cascade-src")
    new LakeTable(spark, root).create(Main.reposSchema, Seq("repo", "path"), 4,
      Main.reposRenameMap)

    // primary: one WAL segment per micro-batch => 10 commits landing over
    // time, through the real DSv2 source + lake sink connector
    val primary = spark.readStream.format("graft-wal")
      .option("maxSegmentsPerTrigger", "1").load(wal)
      .writeStream.format("graft-lake")
      .option("path", root).option("table", "repos")
      .option("checkpointLocation", tmpDir("cascade-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()

    // mirror: follows LIVE while the primary is still committing — feed
    // reads race the committing writer (snapshot roots are immutable once
    // published, so a feed batch over (from, to] is stable regardless of
    // what commits concurrently)
    val mirrorRoot = tmpDir("cascade-dst")
    val follow = Mirror.follow(spark, root, mirrorRoot, tmpDir("cascade-mckpt"),
      trigger = Trigger.ProcessingTime(0L), maxSnapshotsPerTrigger = Some(2L))
    primary.awaitTermination()
    follow.processAllAvailable()
    follow.stop()

    def state(table: LakeTable): Map[(String, String), String] =
      table.read().select(col("repo"), col("path"), sha2(col("content"), 256))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    val src = new LakeTable(spark, root)
    val dst = new LakeTable(spark, mirrorRoot)
    assert(state(dst) === state(src), "live mirror must converge to the source state")
    assert(state(dst).nonEmpty)
    assert(dst.currentSnapshot.get.snapshotId > 1,
      "the mirror must have followed incrementally (multiple fenced commits)")
  }

  test("schema evolution mid-stream fails loudly, never drops columns silently") {
    val cfgEvolve = cfg.copy(addColumnAtLsn = 120)
    def evolveLines(from: Long, until: Long) =
      spark.createDataset((from until until)
        .map(id => ChangeStreamGen.renderLine(cfgEvolve, ChangeStreamGen.txn(cfgEvolve, id))))
        .toDF("value")
    val t = newTable("feedevolve")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(evolveLines(0, 100)))
    val startSchema = t.currentSnapshot.get.schema

    // commit 2 evolves the schema (size_bytes appears at lsn 120)
    MergeEngine.applyBatch(t, ChangeDecoder.decode(evolveLines(100, 200)))
    assert(t.currentSnapshot.get.schema !== startSchema, "generator must evolve")

    val src = new graft.sources.ChangesSource(t, startSchema, -1L, Long.MaxValue)
    val ex = intercept[IllegalStateException] {
      src.getBatch(None, SnapshotOffset(t.currentSnapshot.get.snapshotId))
    }
    assert(ex.getMessage.contains("schema changed"))
    // ranges entirely before the evolution still read fine on the old schema
    assert(src.getBatch(None, SnapshotOffset(1)).isStreaming)

    // RESTART convergence: a stream restarted on the EVOLVED schema must
    // replay old-era pinned batches (prefix eras project with nulls for the
    // not-yet-existing column) — strict schema equality would wedge the
    // checkpoint forever if the table evolved again before the restart.
    val evolved = t.currentSnapshot.get.schema
    val restarted = new graft.sources.ChangesSource(t, evolved, -1L, Long.MaxValue)
    // guard: old-era pinned batches REPLAY (no throw) on the evolved stream
    assert(restarted.getBatch(None, SnapshotOffset(1)).isStreaming)
    assert(restarted.getBatch(Some(SnapshotOffset(1)), SnapshotOffset(2)).isStreaming)
    // projection: the same read the source performs, via the public API —
    // pre-evolution rows project null for the later column, evolved-era
    // rows carry real values
    val newCol = evolved.fieldNames.diff(startSchema.fieldNames).head
    val replayOld = t.changes(-1, 1, projectTo = Some(evolved))
    assert(replayOld.count() > 0)
    assert(replayOld.filter(col(newCol).isNotNull).count() === 0,
      "pre-evolution rows must project null for the later column")
    assert(t.changes(1, 2, projectTo = Some(evolved))
      .filter(col(newCol).isNotNull).count() > 0)
  }

  test("mirror converges across a WAL-level column rename; old-era feed rows read under the new name") {
    // the real-user rename path: upstream emits `lang` below renameAtLsn and
    // `language` after; the TABLE schema always has the new name and
    // prepare() normalizes both eras at write time — so the feed (and
    // everything downstream of it) must see ONLY the new name, populated,
    // for old-era rows too
    val cfgRen = cfg.copy(renameAtLsn = 120)
    def renLines(from: Long, until: Long) =
      spark.createDataset((from until until)
        .map(id => ChangeStreamGen.renderLine(cfgRen, ChangeStreamGen.txn(cfgRen, id))))
        .toDF("value")
    val t = newTable("mirrrename")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(renLines(0, 100))) // all old-era
    val mirrorRoot = tmpDir("mirrrename-dst")
    val ckpt = tmpDir("mirrrename-ckpt")
    Mirror.follow(spark, t.root, mirrorRoot, ckpt).awaitTermination()

    // restart across the rename boundary: commit 2 spans lsn 120
    MergeEngine.applyBatch(t, ChangeDecoder.decode(renLines(100, 200)))
    Mirror.follow(spark, t.root, mirrorRoot, ckpt).awaitTermination()

    // old-era feed batches carry the RENAMED column, populated
    val feed1 = t.changes(0, 1)
    assert(feed1.columns.contains("language") && !feed1.columns.contains("lang"))
    assert(feed1.filter(col("_kind") =!= "delete" && col("language").isNull)
      .count() === 0, "old-era upserts must read their value under the new name")

    val mirror = new LakeTable(spark, mirrorRoot)
    val mcols = mirror.currentSnapshot.get.schema.fieldNames
    assert(mcols.contains("language") && !mcols.contains("lang"))
    assert(mirror.read().filter(col("language").isNull).count() === 0)
    def state(table: LakeTable): Set[Seq[Any]] = {
      val cols = t.currentSnapshot.get.schema.fieldNames
      table.read().select(cols.map(col).toIndexedSeq: _*)
        .collect().map(_.toSeq).toSet
    }
    assert(state(mirror) === state(t),
      "mirror must equal source across the rename boundary")
    assert(state(mirror).nonEmpty)
  }

  test("a schema-level key rename mid-stream fails loudly in BOTH eras, never a silent misread") {
    // unlike additive evolution (prefix eras replay with nulls), a RENAME is
    // non-prefix in both directions: a stream started before it must fail
    // on the renamed era, and a stream restarted after it must fail on
    // old-era pinned batches — silently reading old columns under new names
    // (or dropping them) would corrupt every downstream consumer
    val t = newTable("feedrename")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 100)))
    val preSchema = t.currentSnapshot.get.schema
    val snap = t.currentSnapshot.get
    // an upstream DDL rename reaching the lake as a schema change
    val renamedSchema = org.apache.spark.sql.types.StructType(
      snap.schema.fields.map(f =>
        if (f.name == "path") f.copy(name = "filepath") else f))
    t.commit(snap.copy(schema = renamedSchema,
      keyColumns = Seq("repo", "filepath"),
      commitDeltas = Map.empty), // lesson 24: never carry per-commit provenance
      expectedSnapshotId = snap.snapshotId)
    val latest = t.currentSnapshot.get.snapshotId

    // era 1 stream reaching the renamed era: loud failure
    val src = new graft.sources.ChangesSource(t, preSchema, -1L, Long.MaxValue)
    val ex = intercept[IllegalStateException] {
      src.getBatch(None, SnapshotOffset(latest))
    }
    assert(ex.getMessage.contains("schema changed"))

    // restarted stream (renamed schema): old-era pinned batches ALSO fail
    // loudly — the additive-prefix replay rule must NOT treat a rename as
    // a projectable prefix
    val restarted = new graft.sources.ChangesSource(t, renamedSchema, -1L, Long.MaxValue)
    val ex2 = intercept[IllegalStateException] {
      restarted.getBatch(None, SnapshotOffset(1))
    }
    assert(ex2.getMessage.contains("schema changed"))
    // convergence: a consumer starting AT the rename point reads cleanly
    assert(restarted.getBatch(Some(SnapshotOffset(latest - 1)),
      SnapshotOffset(latest)).isStreaming)
  }

  test("mirror picks up source schema evolution on restart (no silent column drop)") {
    val cfgEvolve = cfg.copy(addColumnAtLsn = 120)
    def evolveLines(from: Long, until: Long) =
      spark.createDataset((from until until)
        .map(id => ChangeStreamGen.renderLine(cfgEvolve, ChangeStreamGen.txn(cfgEvolve, id))))
        .toDF("value")
    val t = newTable("mirrevolve")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(evolveLines(0, 100)))

    // follow run 1: mirror created at the pre-evolution schema
    val mirrorRoot = tmpDir("mirrevolve-dst")
    val ckpt = tmpDir("mirrevolve-ckpt")
    Mirror.follow(spark, t.root, mirrorRoot, ckpt).awaitTermination()
    val mirror = new LakeTable(spark, mirrorRoot)
    val preFields = mirror.currentSnapshot.get.schema.fieldNames.toSet

    // source evolves (size_bytes appears at lsn 120), stream restarted:
    // the feed now carries the new column and the mirror must EVOLVE —
    // encoding against the mirror's stale schema would drop it forever
    MergeEngine.applyBatch(t, ChangeDecoder.decode(evolveLines(100, 200)))
    val newCol = t.currentSnapshot.get.schema.fieldNames.toSet.diff(preFields)
    assert(newCol.nonEmpty, "generator must evolve the source schema")
    Mirror.follow(spark, t.root, mirrorRoot, ckpt).awaitTermination()

    val evolvedMirror = new LakeTable(spark, mirrorRoot)
    assert(newCol.subsetOf(evolvedMirror.currentSnapshot.get.schema.fieldNames.toSet),
      "mirror schema must have evolved with the feed")
    def state(table: LakeTable): Set[Seq[Any]] = {
      val cols = t.currentSnapshot.get.schema.fieldNames // source column set
      table.read().select(cols.map(col).toIndexedSeq: _*)
        .collect().map(_.toSeq).toSet
    }
    assert(state(evolvedMirror) === state(t),
      "mirror must carry the evolved column's DATA, not just the schema")
  }
}
