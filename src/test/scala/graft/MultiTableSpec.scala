package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.{LakeTable, Snapshot}
import graft.streaming.{CdcPipeline, TableTarget}

/**
 * SINGLE-PASS multi-table apply (the reference's single slot carries EVERY
 * table's changes — SlotReaderKinesisWriter.java:281-287; its consumer
 * handles the mixed stream — SlotMessageRecordProcessor.java:42-88).
 *
 * Pins the three contracts the demux path must keep:
 *  1. the mixed WAL batch is scanned + decoded EXACTLY ONCE regardless of
 *     the target count (accumulator-counted — the lazy per-target filter
 *     would read it once per table);
 *  2. one-pass output == N independent single-table pipelines over the
 *     same WAL (including schema evolution crossing both eras);
 *  3. exactly-once across a REAL crash mid-multi-commit: table A committed,
 *     table B's commit dies — the replayed batch must no-op A (watermark
 *     fence) and complete B, converging to the independent result.
 */
class MultiTableSpec extends SparkSpec {

  // mixed two-table stream whose evolution points cross BOTH eras
  private val cfg = GenConfig(seed = 23L, nRepos = 40, pathsPerRepo = 8,
    maxChangesPerTxn = 3, addColumnAtLsn = 150L, renameAtLsn = 260L,
    tables = IndexedSeq("ta", "tb"))
  private val nTxns = 400L

  private def target(name: String, table: LakeTable): TableTarget =
    TableTarget(name, table, graft.cli.Main.reposSchema, Seq("repo", "path"),
      nBuckets = 8, graft.cli.Main.reposRenameMap)

  private def rawLines: DataFrame =
    ChangeStreamGen.lines(spark, cfg, nTxns, partitions = 4).toDF("value")

  /** Canonical sorted row images of a table's merged state. */
  private def stateOf(t: LakeTable): Seq[String] =
    t.read().selectExpr("to_json(struct(*)) AS j")
      .collect().map(_.getString(0)).sorted.toSeq

  /** The independent-pipelines reference: one fresh table per name, each
    * applied from its own filtered decode of the same WAL. */
  private def independentStates(): Map[String, Seq[String]] =
    cfg.tables.map { name =>
      val t = new LakeTable(spark, tmpDir(s"mt-indep-$name"))
      t.create(graft.cli.Main.reposSchema, Seq("repo", "path"), 8,
        graft.cli.Main.reposRenameMap)
      MergeEngine.applyBatch(t,
        ChangeDecoder.decode(rawLines).filter(col("table") === name))
      name -> stateOf(t)
    }.toMap

  test("the stream routes changes to BOTH tables (fixture sanity)") {
    val byTable = ChangeDecoder.decode(rawLines)
      .groupBy("table").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTable.keySet === Set("ta", "tb"))
    assert(byTable.values.forall(_ > 100L), s"lopsided routing: $byTable")
  }

  test("one decode pass serves N targets; output == independent pipelines") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("walLineReads")
    val counted = ChangeStreamGen.lines(spark, cfg, nTxns, partitions = 4)
      .mapPartitions(it => it.map { s => acc.add(1); s }).toDF("value")

    val tables = cfg.tables.map(n =>
      n -> new LakeTable(spark, tmpDir(s"mt-one-$n"))).toMap
    // plus a target the stream never mentions: must no-op, never fail
    val silent = new LakeTable(spark, tmpDir("mt-one-silent"))
    val pipe = new CdcPipeline(spark, tmpDir("mt-one-wal"),
      tmpDir("mt-one-ckpt"),
      cfg.tables.map(n => target(n, tables(n))) :+ target("tc", silent),
      relevantTables = Set("ta", "tb", "tc"))
    pipe.processBatch(counted, 0L)

    // the single full-size pass: every WAL line read exactly once, not
    // once per target (3 targets would read 3x nTxns via lazy filters)
    assert(acc.value === nTxns,
      s"expected one decode pass over $nTxns lines, measured ${acc.value}")

    val indep = independentStates()
    cfg.tables.foreach { n =>
      assert(stateOf(tables(n)) === indep(n), s"table $n diverged")
    }
    // the silent target saw zero changes: no commit, empty state
    assert(silent.currentSnapshot.get.snapshotId === 0L)
    assert(stateOf(silent).isEmpty)
    // per-table metrics emitted for every target, including the silent one
    assert(pipe.stats.map(_._2).toSet === Set("ta", "tb", "tc"))
  }

  /** A LakeTable whose next `commit` dies once when armed — a real crash
    * window BETWEEN per-table commits of one multi-table batch. */
  private class CrashingTable(root: String) extends LakeTable(spark, root) {
    @volatile var armed = false
    override def commit(next: Snapshot, expectedSnapshotId: Long,
                        prev: Option[Snapshot] = None): Snapshot = {
      if (armed) { armed = false; throw new RuntimeException("injected crash") }
      super.commit(next, expectedSnapshotId, prev)
    }
  }

  test("crash between per-table commits replays exactly-once") {
    val ta = new LakeTable(spark, tmpDir("mt-crash-ta"))
    val tb = new CrashingTable(tmpDir("mt-crash-tb"))
    val ckpt = tmpDir("mt-crash-ckpt")
    val pipe = new CdcPipeline(spark, ckpt, ckpt,
      Seq(target("ta", ta), target("tb", tb)),
      relevantTables = Set("ta", "tb"))
    tb.armed = true // AFTER construction: create() must succeed

    val ex = intercept[RuntimeException] { pipe.processBatch(rawLines, 0L) }
    assert(ex.getMessage.contains("injected crash"))
    // the crash window: ta committed its batch, tb did not
    assert(ta.currentSnapshot.get.snapshotId === 1L)
    assert(tb.currentSnapshot.get.snapshotId === 0L)
    // the demux scratch must not leak across the failure
    assert(!new java.io.File(s"$ckpt/_demux/batch-0").exists())

    // restart: streaming replays the SAME batch; ta's watermark fence must
    // no-op (same snapshot id), tb must complete
    pipe.processBatch(rawLines, 0L)
    assert(ta.currentSnapshot.get.snapshotId === 1L,
      "replay must not double-apply the committed table")
    assert(tb.currentSnapshot.get.snapshotId === 1L)
    assert(!new java.io.File(s"$ckpt/_demux/batch-0").exists())

    val indep = independentStates()
    assert(stateOf(ta) === indep("ta"))
    assert(stateOf(tb) === indep("tb"))
  }

  test("a malformed line aborts the whole multi-table batch pre-commit") {
    import spark.implicits._
    val poisoned = rawLines.union(Seq("""{"garbage":1}""").toDF("value"))
    val tables = cfg.tables.map(n =>
      n -> new LakeTable(spark, tmpDir(s"mt-bad-$n"))).toMap
    val ckpt = tmpDir("mt-bad-ckpt")
    val pipe = new CdcPipeline(spark, ckpt, ckpt,
      cfg.tables.map(n => target(n, tables(n))),
      relevantTables = Set("ta", "tb"))
    intercept[graft.decode.MalformedBatchException] {
      pipe.processBatch(poisoned, 0L)
    }
    // nothing committed anywhere, scratch cleaned up
    cfg.tables.foreach(n =>
      assert(tables(n).currentSnapshot.get.snapshotId === 0L))
    assert(!new java.io.File(s"$ckpt/_demux/batch-0").exists())
  }

  test("lazy multi-target path (demuxMinTables raised): same state, no scratch") {
    val tables = cfg.tables.map(n =>
      n -> new LakeTable(spark, tmpDir(s"mt-lazy-$n"))).toMap
    val ckpt = tmpDir("mt-lazy-ckpt")
    val pipe = new CdcPipeline(spark, ckpt, ckpt,
      cfg.tables.map(n => target(n, tables(n))),
      relevantTables = Set("ta", "tb"),
      demuxMinTables = Int.MaxValue)
    pipe.processBatch(rawLines, 0L)
    // the lazy path never materializes the demux scratch dir
    assert(!new java.io.File(s"$ckpt/_demux").exists())
    val indep = independentStates()
    cfg.tables.foreach(n =>
      assert(stateOf(tables(n)) === indep(n), s"table $n diverged (lazy)"))
  }

  test("lazy path: a malformed line still aborts before ANY commit") {
    import spark.implicits._
    val poisoned = rawLines.union(Seq("""{"garbage":1}""").toDF("value"))
    val tables = cfg.tables.map(n =>
      n -> new LakeTable(spark, tmpDir(s"mt-lazybad-$n"))).toMap
    val ckpt = tmpDir("mt-lazybad-ckpt")
    val pipe = new CdcPipeline(spark, ckpt, ckpt,
      cfg.tables.map(n => target(n, tables(n))),
      relevantTables = Set("ta", "tb"),
      demuxMinTables = Int.MaxValue)
    intercept[graft.decode.MalformedBatchException] {
      pipe.processBatch(poisoned, 0L)
    }
    // validation rides the FIRST target's action and fires pre-commit, so
    // neither table (incl. the later ones) may have committed anything
    cfg.tables.foreach(n =>
      assert(tables(n).currentSnapshot.get.snapshotId === 0L))
  }
}
