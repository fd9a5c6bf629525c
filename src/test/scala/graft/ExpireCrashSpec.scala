package graft

import java.net.URI
import org.apache.hadoop.fs.{Path => HPath, RawLocalFileSystem}
import org.apache.spark.sql.types._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.lake.LakeTable

/** Fault-injecting filesystem: throws after a configured number of
  * MUTATING operations (create/delete/rename) — every k sweeps the whole
  * crash-window space of a maintenance pass. Non-`file` scheme, so the
  * table takes the Hadoop (HDFS-ish) code path. */
class CrashInjectedFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("crashfs:///")
  override def getScheme: String = "crashfs"
  override def create(f: HPath, permission: org.apache.hadoop.fs.permission.FsPermission,
                      overwrite: Boolean, bufferSize: Int, replication: Short,
                      blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable) = {
    CrashInjectedFileSystem.tick()
    super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
  }
  override def delete(f: HPath, recursive: Boolean): Boolean = {
    CrashInjectedFileSystem.tick()
    super.delete(f, recursive)
  }
  override def rename(src: HPath, dst: HPath): Boolean = {
    CrashInjectedFileSystem.tick()
    super.rename(src, dst)
  }
}

object CrashInjectedFileSystem {
  final class InjectedCrash extends java.io.IOException("injected crash")
  /** Mutations remaining before the next one crashes; MaxValue = disarmed. */
  @volatile var countdown: Long = Long.MaxValue
  /** Total mutations observed (for sizing the sweep). */
  @volatile var ops: Long = 0L
  def tick(): Unit = synchronized {
    ops += 1
    if (countdown != Long.MaxValue) {
      countdown -= 1
      if (countdown < 0) throw new InjectedCrash
    }
  }
}

/**
 * Crash-window sweep of snapshot expiry on a distributed-manifest table:
 * for EVERY prefix length k of the pass's mutating filesystem operations,
 * crash at op k, then run ONE unarmed maintenance pass and require full
 * recovery — table readable at the same content, exactly keepLast
 * snapshots, zero leaked data files/manifests/plans, and no wedge. This
 * is the property the durable expire plan + deletion ordering exist to
 * provide; any ordering bug (roots-after-manifests, plan-after-roots)
 * fails for SOME k.
 */
class ExpireCrashSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("name", StringType)))

  private def ins(lsn: Long, id: Int, name: String): String =
    s"""{"lsn":$lsn,"xid":$lsn,"change":[{"kind":"insert","schema":"public","table":"t",""" +
      s""""columnnames":["id","name"],"columntypes":["integer","text"],""" +
      s""""columnvalues":[$id,"$name"]}]}"""

  private def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    val s = java.nio.file.Files.walk(src)
    try s.forEach { p =>
      val q = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(q)
      else java.nio.file.Files.copy(p, q)
    } finally s.close()
  }

  test("expire survives a crash after EVERY mutating filesystem operation") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.crashfs.impl", classOf[CrashInjectedFileSystem].getName)

    // template: distributed-manifest table with three snapshots
    val templateDir = java.nio.file.Paths.get(tmpDir("crash-template"))
    val template = new LakeTable(spark, s"crashfs:$templateDir",
      maxDeltasPerBucket = 100, manifestThresholdFiles = 0)
    template.create(schema, Seq("id"), nBuckets = 4)
    import spark.implicits._
    def apply(t: LakeTable, lines: Seq[String]): Unit =
      MergeEngine.applyBatch(t,
        ChangeDecoder.decode(spark.createDataset(lines).toDF("value")))
    apply(template, (1 to 8).map(i => ins(i, i, s"a$i")))
    apply(template, Seq(ins(20, 1, "b1")))
    apply(template, Seq(ins(21, 2, "b2")))
    val expected = template.read().collect()
      .map(r => r.getInt(0) -> r.getString(1)).toSet

    // measure the unarmed pass's mutation count on a throwaway copy
    val probeDir = java.nio.file.Paths.get(tmpDir("crash-probe"))
    copyTree(templateDir, probeDir)
    val before = CrashInjectedFileSystem.ops
    new LakeTable(spark, s"crashfs:$probeDir", 100, 256, 0)
      .expireSnapshots(keepLast = 1)
    val totalOps = (CrashInjectedFileSystem.ops - before).toInt
    assert(totalOps > 3, s"expire must mutate several times, saw $totalOps")

    for (k <- 0 until totalOps) {
      val work = java.nio.file.Paths.get(tmpDir(s"crash-k$k"))
      copyTree(templateDir, work)
      val t = new LakeTable(spark, s"crashfs:$work", 100, 256, 0)
      CrashInjectedFileSystem.countdown = k
      val crashed =
        try { t.expireSnapshots(keepLast = 1); false }
        catch { case _: CrashInjectedFileSystem.InjectedCrash => true }
      CrashInjectedFileSystem.countdown = Long.MaxValue
      assert(crashed, s"k=$k should crash mid-pass (pass has $totalOps mutations)")

      // ONE unarmed recovery pass must fully converge
      val r = new LakeTable(spark, s"crashfs:$work", 100, 256, 0)
      r.expireSnapshots(keepLast = 1)
      r.removeOrphans(graceMs = 0L)

      // invariant 1: same content, resolvable snapshot
      assert(r.read().collect().map(x => x.getInt(0) -> x.getString(1)).toSet
        === expected, s"k=$k content diverged")
      // invariant 2: exactly one snapshot remains
      val metaNames = {
        val s = java.nio.file.Files.list(work.resolve("meta"))
        try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
          .asScala.map(_.getFileName.toString).toSet
        finally s.close()
      }
      assert(metaNames.count(_.startsWith("snapshot-")) === 1, s"k=$k $metaNames")
      // invariant 3: no stranded expire plans
      assert(!metaNames.exists(_.startsWith(".expire-plan")), s"k=$k $metaNames")
      // invariant 4: nothing leaked — every surviving data file and
      // manifest is referenced by the surviving snapshot
      val snap = r.currentSnapshot.get
      val referenced = snap.allFiles.toSet
      val onDisk = {
        val s = java.nio.file.Files.walk(work.resolve("data"))
        try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
          .asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(p => work.relativize(p).toString)
          // Spark job markers and checksum siblings are not table state
          .filterNot(p => p.endsWith(".crc") || p.endsWith("_SUCCESS")).toSet
        finally s.close()
      }
      assert(onDisk === referenced, s"k=$k leak/loss: " +
        s"extra=${onDisk -- referenced} missing=${referenced -- onDisk}")
      val manifestFiles = {
        val d = work.resolve("meta").resolve("manifests")
        if (!java.nio.file.Files.exists(d)) Set.empty[String]
        else {
          val s = java.nio.file.Files.list(d)
          try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
            .asScala.map(_.getFileName.toString)
            .filterNot(_.startsWith(".")).toSet
          finally s.close()
        }
      }
      assert(manifestFiles ===
        snap.bucketManifests.values.map(_.split("/").last).toSet,
        s"k=$k manifest leak/loss")
    }
  }
}

/**
 * Crash-window sweep of the APPLY path (delta write -> validate -> stats
 * -> compaction -> fenced commit): crash after sampled prefixes of the
 * pass's mutating filesystem operations, then REPLAY the same batch
 * unarmed (what Structured Streaming does after a crash) and require
 * exactly-once convergence: identical final content, at most one new
 * snapshot, and — after the grace period "passes" — no leaked attempt
 * files. The strongest form of the north rule's exactly-once claim.
 */
class ApplyCrashSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("name", StringType)))

  private def ins(lsn: Long, id: Int, name: String): String =
    s"""{"lsn":$lsn,"xid":$lsn,"change":[{"kind":"insert","schema":"public","table":"t",""" +
      s""""columnnames":["id","name"],"columntypes":["integer","text"],""" +
      s""""columnvalues":[$id,"$name"]}]}"""

  private def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    val s = java.nio.file.Files.walk(src)
    try s.forEach { p =>
      val q = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(q)
      else java.nio.file.Files.copy(p, q)
    } finally s.close()
  }

  test("apply replays to exactly-once after a crash at sampled mutation points") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.crashfs.impl", classOf[CrashInjectedFileSystem].getName)
    import spark.implicits._
    def decode(lines: Seq[String]) =
      ChangeDecoder.decode(spark.createDataset(lines).toDF("value"))

    val templateDir = java.nio.file.Paths.get(tmpDir("applycrash-template"))
    val template = new LakeTable(spark, s"crashfs:$templateDir",
      maxDeltasPerBucket = 2, manifestThresholdFiles = 0) // compaction + manifests in play
    template.create(schema, Seq("id"), nBuckets = 2)
    MergeEngine.applyBatch(template, decode((1 to 6).map(i => ins(i, i, s"a$i"))))
    val baseSnapId = template.currentSnapshot.get.snapshotId

    val batch = Seq(ins(10, 1, "updated-1"), ins(11, 7, "new-7"), ins(12, 2, "updated-2"))
    val expected = Map(1 -> "updated-1", 2 -> "updated-2", 7 -> "new-7") ++
      (3 to 6).map(i => i -> s"a$i").toMap

    // probe the unarmed apply's mutation count
    val probeDir = java.nio.file.Paths.get(tmpDir("applycrash-probe"))
    copyTree(templateDir, probeDir)
    val before = CrashInjectedFileSystem.ops
    MergeEngine.applyBatch(
      new LakeTable(spark, s"crashfs:$probeDir", 2, 256, 0), decode(batch))
    val totalOps = (CrashInjectedFileSystem.ops - before).toInt
    assert(totalOps > 5, s"apply must mutate several times, saw $totalOps")

    // sample ~16 evenly-spread crash points (full sweep would be minutes)
    val stride = math.max(1, totalOps / 16)
    for (k <- 0 until totalOps by stride) {
      val work = java.nio.file.Paths.get(tmpDir(s"applycrash-k$k"))
      copyTree(templateDir, work)
      val t = new LakeTable(spark, s"crashfs:$work", 2, 256, 0)
      CrashInjectedFileSystem.countdown = k
      try { MergeEngine.applyBatch(t, decode(batch)); () }
      catch { case _: Throwable => () } // the crash (possibly Spark-wrapped)
      CrashInjectedFileSystem.countdown = Long.MaxValue

      // replay after restart: the SAME batch through a fresh table handle
      val r = new LakeTable(spark, s"crashfs:$work", 2, 256, 0)
      MergeEngine.applyBatch(r, decode(batch))

      // exactly-once: converged content, at most one new snapshot
      assert(r.read().collect().map(x => x.getInt(0) -> x.getString(1)).toMap
        === expected, s"k=$k content diverged")
      val sid = r.currentSnapshot.get.snapshotId
      assert(sid === baseSnapId + 1,
        s"k=$k expected exactly one new snapshot, got $sid (base $baseSnapId)")

      // and the crashed attempt's files are sweepable once grace passes:
      // expire history (earlier snapshots legitimately reference the
      // pre-compaction deltas — that's time travel, not a leak), age
      // everything, sweep, then require disk == referenced
      r.expireSnapshots(keepLast = 1)
      val old = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10_000_000L)
      val aged = java.nio.file.Files.walk(work)
      try aged.forEach(p => java.nio.file.Files.setLastModifiedTime(p, old))
      finally aged.close()
      r.removeOrphans(graceMs = 1_000_000L)
      val referenced = r.currentSnapshot.get.allFiles.toSet
      val onDisk = {
        val s = java.nio.file.Files.walk(work.resolve("data"))
        try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
          .asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(p => work.relativize(p).toString)
          .filterNot(p => p.endsWith(".crc") || p.endsWith("_SUCCESS")).toSet
        finally s.close()
      }
      assert(onDisk === referenced, s"k=$k attempt leak: " +
        s"extra=${onDisk -- referenced} missing=${referenced -- onDisk}")
    }
  }
}

/**
 * Crash-window sweep of the stager's PUBLISH path (high-water record ->
 * segment publish): crash at every mutating operation of roll(), restart
 * the stager, and require the numbering contract to hold — published
 * names strictly increase, a name is NEVER reused (the consumer's
 * durable offset makes reuse permanent loss), and every already-
 * published segment's content is intact. This is the sweep form of the
 * torn-high-water-record scenario.
 */
class StagerCrashSpec extends SparkSpec {
  import graft.sources.{WalSource, WalStager}

  test("roll survives a crash at every mutating operation without name reuse") {
    val conf = spark.sessionState.newHadoopConf()
    conf.set("fs.crashfs.impl", classOf[CrashInjectedFileSystem].getName)

    // template: two published segments + pending next index record
    def build(dir: String): Unit = {
      val st = new WalStager(s"crashfs:$dir", conf)
      st.append("seg0-line"); st.roll()
      st.append("seg1-line"); st.roll()
      st.close()
    }
    def segments(dir: String): Seq[String] =
      WalSource.listSegments(s"crashfs:$dir")

    // probe roll()'s mutation count
    val probe = java.nio.file.Paths.get(tmpDir("stager-probe")).toString
    build(probe)
    val pst = new WalStager(s"crashfs:$probe", conf)
    pst.append("probe-line")
    val before = CrashInjectedFileSystem.ops
    pst.roll(); pst.close()
    val totalOps = (CrashInjectedFileSystem.ops - before).toInt
    assert(totalOps > 1, s"roll must mutate more than once, saw $totalOps")

    for (k <- 0 until totalOps) {
      val dir = java.nio.file.Paths.get(tmpDir(s"stager-k$k")).toString
      build(dir)
      val st = new WalStager(s"crashfs:$dir", conf)
      st.append("crashing-line")
      CrashInjectedFileSystem.countdown = k
      val crashed =
        try { st.roll(); false }
        catch { case _: CrashInjectedFileSystem.InjectedCrash => true }
      CrashInjectedFileSystem.countdown = Long.MaxValue
      assert(crashed, s"k=$k should crash mid-roll ($totalOps mutations)")

      // restart (the crashed stager is dead; its temp is swept on init)
      val r = new WalStager(s"crashfs:$dir", conf)
      r.append("after-crash"); val published = r.roll(); r.close()

      val names = segments(dir)
      // the pre-crash segments are intact, content preserved
      assert(names.take(2) === Seq("wal-000000000.jsonl", "wal-000000001.jsonl"),
        s"k=$k lost a published segment: $names")
      assert(scala.io.Source.fromFile(s"$dir/wal-000000000.jsonl").mkString
        === "seg0-line\n", s"k=$k segment 0 content")
      // names strictly increase and are unique — NEVER reused
      assert(names.distinct === names, s"k=$k duplicate names: $names")
      assert(names === names.sorted, s"k=$k names out of order: $names")
      // the post-restart publish landed above everything pre-crash
      assert(published.exists(_ > "wal-000000001.jsonl"),
        s"k=$k restart reused or regressed the numbering: $published")
      // the crashed roll either published its line or lost it to the crash
      // (never acked upstream — roll() did not return); what is FORBIDDEN
      // is a half-visible segment
      names.foreach { n =>
        val content = scala.io.Source.fromFile(s"$dir/$n").mkString
        assert(content.endsWith("\n") && content.nonEmpty, s"k=$k torn segment $n")
      }
    }
  }
}
