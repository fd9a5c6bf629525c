package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.cli.Main
import graft.streaming.{CdcPipeline, TableTarget}

/** Salting equivalence, per-bucket lineage, snapshot time travel,
  * multi-table streams. */
class LakeFeatureSpec extends SparkSpec {
  import spark.implicits._

  val cfg = GenConfig(seed = 31L, nRepos = 12, pathsPerRepo = 4, maxChangesPerTxn = 3)

  private def newTable(): LakeTable = {
    val t = new LakeTable(spark, tmpDir("repos"))
    t.create(Main.reposSchema, Seq("repo", "path"), 4, Main.reposRenameMap)
    t
  }

  private def lines(from: Long, until: Long, c: GenConfig = cfg) =
    spark.createDataset((from until until)
      .map(id => ChangeStreamGen.renderLine(c, ChangeStreamGen.txn(c, id)))).toDF("value")

  private def state(t: LakeTable, asOf: Option[Long] = None): Map[(String, String), String] =
    t.read(asOfSnapshot = asOf)
      .select(col("repo"), col("path"), sha2(col("content"), 256)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap

  test("salted two-phase dedup produces the identical final state") {
    val plain = newTable(); val salted = newTable()
    MergeEngine.applyBatch(plain, ChangeDecoder.decode(lines(0, 200)))
    MergeEngine.applyBatch(salted, ChangeDecoder.decode(lines(0, 200)), saltBuckets = 7)
    assert(state(plain) === state(salted))
    assert(state(plain).nonEmpty)
  }

  test("per-bucket lineage accumulates across commits") {
    val t = newTable()
    val s1 = MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 100)))
    val s2 = MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(100, 200)))
    assert(s1.inputEvents > 0 && s2.inputEvents > 0)
    assert(s1.dedupDropped >= 0)
    val snap = t.currentSnapshot.get
    assert(snap.bucketLineage.nonEmpty)
    val totalKeys = snap.bucketLineage.values.map(_("keys")).sum
    assert(totalKeys === s1.appliedKeys + s2.appliedKeys)
    // LSN bounds widened, not replaced: the min still reflects batch 1
    // (<= 100; keep-last dedup may drop the very first LSN when its key is
    // rewritten later in the batch), the max reflects batch 2's tail
    assert(snap.bucketLineage.values.map(_("minLsn")).min <= 100L)
    assert(snap.bucketLineage.values.map(_("maxLsn")).max === 200L)
    // snapshot-level lineage carries dedup stats
    assert(snap.lineage("inputEvents") === s2.inputEvents)
    assert(snap.lineage("dedupDropped") === s2.dedupDropped)
  }

  test("createOrReplaceView exposes the table (and time travel) to plain SQL") {
    val t = newTable()
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 100)))
    val snap1 = t.currentSnapshot.get.snapshotId
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(100, 200)))
    t.createOrReplaceView("repos_now")
    t.createOrReplaceView("repos_then", asOfSnapshot = Some(snap1))
    val nowN = spark.sql("SELECT count(*) FROM repos_now").head().getLong(0)
    val thenN = spark.sql("SELECT count(*) FROM repos_then").head().getLong(0)
    assert(nowN === t.read().count())
    assert(thenN === t.read(asOfSnapshot = Some(snap1)).count())
    // joins across eras work like any other SQL view
    val changed = spark.sql(
      """SELECT count(*) FROM repos_now n JOIN repos_then o
        |ON n.repo = o.repo AND n.path = o.path
        |WHERE n.content <> o.content""".stripMargin).head().getLong(0)
    assert(changed > 0)
  }

  test("time travel: historical snapshots stay readable and immutable") {
    val t = newTable()
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 100)))
    val sid1 = t.currentSnapshot.get.snapshotId
    val stateAt1 = state(t)
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(100, 200)))
    assert(state(t) !== stateAt1)                 // table moved on
    assert(state(t, asOf = Some(sid1)) === stateAt1) // history intact
  }

  test("multi-table WAL: one stream feeds two independent lake tables") {
    // interleave apples + repos changes in one WAL
    val apples = Seq(
      """{"lsn":1000001,"xid":1,"change":[{"kind":"insert","schema":"public","table":"apples","columnnames":["id","name","quantity"],"columntypes":["integer","text","integer"],"columnvalues":[1,"Fuji",2]}]}""",
      """{"lsn":1000002,"xid":2,"change":[{"kind":"update","schema":"public","table":"apples","columnnames":["id","name","quantity"],"columntypes":["integer","text","integer"],"columnvalues":[1,"Fuji",9],"oldkeys":{"keynames":["id"],"keytypes":["integer"],"keyvalues":[1]}}]}""")
    val repoLines = (0L until 50L).map(id => ChangeStreamGen.renderLine(cfg, ChangeStreamGen.txn(cfg, id)))
    val wal = tmpDir("wal")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$wal/wal-000000000.jsonl"),
      scala.util.Random.shuffle(apples ++ repoLines).mkString("\n") + "\n")

    val applesSchema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("quantity", IntegerType)))
    val tRepos = new LakeTable(spark, tmpDir("repos"))
    val tApples = new LakeTable(spark, tmpDir("apples"))
    val pipe = new CdcPipeline(spark, wal, tmpDir("ckpt"),
      Seq(
        TableTarget("repos", tRepos, Main.reposSchema, Seq("repo", "path"), 4, Main.reposRenameMap),
        TableTarget("apples", tApples, applesSchema, Seq("id"), 2)),
      relevantTables = Set("repos", "apples"))
    pipe.runAvailable()

    assert(tApples.read().collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
      === Set((1, "Fuji", 9)))
    def sha256(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val exp = ChangeStreamGen.expectedFinalState(cfg, 50L)
      .map { case (k, ch) => k -> sha256(ch.content) }
    assert(state(tRepos) === exp)
  }

  test("expireSnapshots keeps recent history, deletes dead files") {
    val t = newTable()
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 60)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(60, 120)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(120, 180)))
    val before = state(t)
    val sidCurrent = t.currentSnapshot.get.snapshotId
    val (removedSnaps, removedFiles) = t.expireSnapshots(keepLast = 2)
    assert(removedSnaps === 2) // snapshots 0 (empty) and 1
    assert(state(t) === before) // current state untouched
    // previous snapshot still time-travelable
    assert(t.read(asOfSnapshot = Some(sidCurrent - 1)).count() > 0)
    // expired snapshot gone — specifically NOT-FOUND (any-exception would
    // also pass if readSnapshot were simply broken)
    intercept[java.io.FileNotFoundException] { t.readSnapshot(1L) }
    // and expiry is idempotent
    assert(t.expireSnapshots(keepLast = 2) === ((0, 0)))
  }

  test("a crashed expire's durable plan is completed by the next maintenance pass") {
    val t = newTable()
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 60)))
    // simulate the crash window: an expire pass wrote its plan and died
    // BEFORE deleting the listed dead files — without the plan they'd leak
    // forever (the orphan sweep is directory-grained and cannot see dead
    // files inside directories that still hold live ones)
    val liveDir = t.currentSnapshot.get.allFiles.head.split("/")(1)
    val deadRel = s"data/$liveDir/dead-from-crashed-expire.parquet"
    val deadAbs = java.nio.file.Paths.get(t.root, deadRel)
    java.nio.file.Files.write(deadAbs, Array[Byte](1, 2, 3))
    val plan = java.nio.file.Paths.get(t.root, "meta", ".expire-plan-test1.json")
    java.nio.file.Files.writeString(plan,
      s"""{"files":["$deadRel"],"manifests":[]}""")
    val before = state(t)
    assert(t.removeOrphans(graceMs = Long.MaxValue / 2) === 0) // nothing orphaned
    assert(!java.nio.file.Files.exists(deadAbs), "planned deletion completed")
    assert(!java.nio.file.Files.exists(plan), "plan retired after execution")
    assert(state(t) === before) // live data untouched
    // a TORN plan (crash mid-plan-write) is discarded without wedging:
    // the roots survive in that window, so a re-run recomputes the plan
    val torn = java.nio.file.Paths.get(t.root, "meta", ".expire-plan-torn.json")
    java.nio.file.Files.writeString(torn, """{"files":["data/x""")
    assert(t.expireSnapshots(keepLast = 1)._1 >= 0) // must not throw
    assert(!java.nio.file.Files.exists(torn))
    assert(state(t) === before)
  }
}
