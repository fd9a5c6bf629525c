package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, CyclicBarrier, Executors, TimeUnit}
import org.apache.spark.sql.types._
import graft.lake.{CommitConflictException, LakeTable, Snapshot}

/**
 * Snapshot fencing under a genuinely concurrent commit race (the zombie-
 * driver scenario: a stale foreachBatch finishing after failover must LOSE).
 * On POSIX, rename(2) silently replaces an existing target, so the fencing
 * primitive must be link(2)/createLink, which atomically fails with EEXIST.
 */
/** Object-store double (S3-like): "rename" is copy+delete — it silently
  * REPLACES an existing destination, last writer wins, the HDFS atomic
  * fail-if-exists contract does NOT hold. What the store DOES offer is an
  * atomic conditional PUT: create(overwrite = false) claims the object name
  * atomically (modeled with Files.createFile) and fails with
  * FileAlreadyExistsException when it is already claimed — the S3
  * If-None-Match / GCS if-generation-match primitive. */
class LwwObjectStoreFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftlww:///")
  override def getScheme: String = "graftlww"

  override def rename(src: org.apache.hadoop.fs.Path,
                      dst: org.apache.hadoop.fs.Path): Boolean = {
    if (exists(dst)) delete(dst, false) // copy+delete semantics: LWW
    super.rename(src, dst)
  }

  /** The atomic conditional claim. NB: RawLocalFileSystem implements BOTH
    * the permission and the no-permission create overloads directly (the
    * no-permission one does a non-atomic exists()-then-create — overriding
    * only the permission variant leaves fs.create(p, false) racy). */
  private def claim(f: org.apache.hadoop.fs.Path): Unit = {
    val local = pathToFile(f).toPath
    java.nio.file.Files.createDirectories(local.getParent)
    try java.nio.file.Files.createFile(local)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
    }
  }

  /** Fault injection: conditional-create streams throw on write while
    * this is > 0 (decremented per failing stream). */
  @volatile var failingCreateWrites: Int = 0

  private def maybeFailing(
      s: org.apache.hadoop.fs.FSDataOutputStream): org.apache.hadoop.fs.FSDataOutputStream =
    if (failingCreateWrites <= 0) s
    else {
      failingCreateWrites -= 1
      new org.apache.hadoop.fs.FSDataOutputStream(
        new java.io.FilterOutputStream(s) {
          override def write(b: Int): Unit =
            throw new java.io.IOException("injected write failure")
          override def write(b: Array[Byte], off: Int, len: Int): Unit =
            throw new java.io.IOException("injected write failure")
        }, null)
    }

  override def create(f: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite) {
      claim(f)
      maybeFailing(
        super.create(f, permission, true, bufferSize, replication, blockSize, progress))
    } else super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }

  override def create(f: org.apache.hadoop.fs.Path, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite) {
      claim(f)
      maybeFailing(super.create(f, true, bufferSize, replication, blockSize, progress))
    } else super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }
}

/** Condition-at-CLOSE object-store double — REAL S3/GCS conditional-PUT
  * semantics, where the LWW double above is too kind: create(overwrite =
  * false) holds NO claim (the object materializes all-or-nothing at
  * close(), where the If-None-Match condition is evaluated), hsync/hflush
  * throw UnsupportedOperationException (GCS, pre-3.3.1 S3A), and the
  * stream is not Abortable (abort() falls back to close(), which COMPLETES
  * the PUT with whatever was buffered). A concurrent committer can
  * therefore land the target BETWEEN our create() and our failure — the
  * failure path must never delete that committed object. */
class CondAtCloseObjectStoreFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftcac:///")
  override def getScheme: String = "graftcac"

  /** Fault injection: runs once on the next conditional-create stream's
    * first write (e.g. to land a concurrent committer's object), then the
    * write fails. */
  @volatile var onWrite: () => Unit = null
  /** Fault injection: the next hsync throws a GENERIC IOException (instead
    * of the usual UnsupportedOperationException) — a failure AFTER the
    * full content was buffered. */
  @volatile var failNextSync: Boolean = false

  private class PutOnClose(local: java.nio.file.Path)
      extends java.io.OutputStream with org.apache.hadoop.fs.Syncable {
    private val buf = new java.io.ByteArrayOutputStream()
    private var closed = false
    private def maybeFail(): Unit = {
      val h = onWrite
      if (h != null) {
        onWrite = null
        h()
        throw new java.io.IOException("injected write failure")
      }
    }
    override def write(b: Int): Unit = { maybeFail(); buf.write(b) }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      maybeFail(); buf.write(b, off, len)
    }
    override def hflush(): Unit =
      throw new UnsupportedOperationException("hflush not supported")
    override def hsync(): Unit =
      if (failNextSync) {
        failNextSync = false
        throw new java.io.IOException("injected sync failure")
      } else throw new UnsupportedOperationException("hsync not supported")
    override def close(): Unit = {
      if (closed) return
      closed = true
      java.nio.file.Files.createDirectories(local.getParent)
      try {
        java.nio.file.Files.write(local, buf.toByteArray,
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        ()
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(local.toString)
      }
    }
  }

  private def putOnClose(f: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FSDataOutputStream =
    new org.apache.hadoop.fs.FSDataOutputStream(
      new PutOnClose(pathToFile(f).toPath), null)

  override def create(f: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream =
    if (!overwrite) putOnClose(f)
    else super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)

  override def create(f: org.apache.hadoop.fs.Path, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream =
    if (!overwrite) putOnClose(f)
    else super.create(f, overwrite, bufferSize, replication, blockSize, progress)
}

class CommitFencingSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("id", IntegerType)))

  private def registerLww(mode: String): Unit = {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.graftlww.impl", classOf[LwwObjectStoreFileSystem].getName)
    spark.conf.set("spark.hadoop.graft.lake.fencing.graftlww", mode)
  }

  /** Two committers race from the same base snapshot; returns their
    * outcomes and the surviving snapshot's writer tag. */
  private def raceOnce(t: LakeTable): (Seq[String], Long) = {
    val pool = Executors.newFixedThreadPool(2)
    try {
      val base = t.currentSnapshot.get
      val barrier = new CyclicBarrier(2)
      val done = new CountDownLatch(2)
      val results = new java.util.concurrent.ConcurrentHashMap[String, String]()
      Seq("A", "B").foreach { who =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            val mine = base.copy(lineage = Map("writer" -> who.hashCode.toLong))
            barrier.await(10, TimeUnit.SECONDS)
            try {
              t.commit(mine, expectedSnapshotId = base.snapshotId)
              results.put(who, "won")
            } catch {
              case _: CommitConflictException => results.put(who, "lost")
            } finally done.countDown()
          }
        })
      }
      assert(done.await(30, TimeUnit.SECONDS), "race timed out")
      (Seq("A", "B").map(results.get), t.currentSnapshot.get.lineage("writer"))
    } finally pool.shutdownNow()
  }

  private def freshTable(rootPrefix: String = ""): LakeTable = {
    val t = new LakeTable(spark, rootPrefix + tmpDir("fence"))
    t.create(schema, Seq("id"), 2)
    t
  }

  test("concurrent committers: exactly one wins, winner's snapshot survives") {
    val pool = Executors.newFixedThreadPool(2)
    try {
      for (round <- 0 until 30) {
        // half the rounds address the table root as an explicit file: URI —
        // the metadata layer must behave identically when the root carries a
        // scheme and is resolved through the Hadoop FileSystem API
        val t = freshTable(if (round % 2 == 0) "" else "file:")
        val base = t.currentSnapshot.get
        val barrier = new CyclicBarrier(2)
        val done = new CountDownLatch(2)
        val results = new java.util.concurrent.ConcurrentHashMap[String, String]()
        Seq("A", "B").foreach { who =>
          pool.submit(new Runnable {
            override def run(): Unit = {
              val mine = base.copy(lineage = Map("writer" -> who.hashCode.toLong))
              barrier.await(10, TimeUnit.SECONDS)
              try {
                t.commit(mine, expectedSnapshotId = base.snapshotId)
                results.put(who, "won")
              } catch {
                case _: CommitConflictException => results.put(who, "lost")
              } finally done.countDown()
            }
          })
        }
        assert(done.await(30, TimeUnit.SECONDS), s"round $round timed out")
        val outcomes = Seq("A", "B").map(results.get)
        assert(outcomes.count(_ == "won") == 1,
          s"round $round: expected exactly one winner, got $outcomes")
        // the surviving snapshot is the winner's, not the loser's
        val winner = Seq("A", "B").find(results.get(_) == "won").get
        val surviving = t.currentSnapshot.get
        assert(surviving.snapshotId == base.snapshotId + 1)
        assert(surviving.lineage("writer") == winner.hashCode.toLong, s"round $round clobbered")
      }
    } finally pool.shutdownNow()
  }

  test("LWW-rename store: the rename contract double-wins (the documented hazard)") {
    // Forcing the rename path onto a store whose rename replaces silently:
    // BOTH committers report success and the loser's snapshot clobbers the
    // winner's — this is exactly why object-store schemes default to
    // conditional-put fencing instead.
    registerLww(mode = "rename")
    val t = new LakeTable(spark, s"graftlww:${tmpDir("lww")}")
    t.create(schema, Seq("id"), 2)
    val (outcomes, _) = raceOnce(t)
    assert(outcomes === Seq("won", "won"),
      s"rename on an LWW store must double-win (got $outcomes) — " +
        "if this starts failing, the double no longer models the hazard")
  }

  test("conditional-put fencing: single winner on the LWW store (30-round race)") {
    registerLww(mode = "conditional-put")
    for (round <- 0 until 30) {
      val t = new LakeTable(spark, s"graftlww:${tmpDir("lwwcp")}")
      t.create(schema, Seq("id"), 2)
      assert(t.fencingMode === "conditional-put")
      val (outcomes, survivor) = raceOnce(t)
      assert(outcomes.count(_ == "won") === 1,
        s"round $round: expected exactly one winner, got $outcomes")
      val winner = Seq("A", "B")(outcomes.indexOf("won"))
      assert(survivor === winner.hashCode.toLong, s"round $round clobbered")
    }
  }

  test("a failed conditional-put ABORTS and releases the claim — never publishes torn content") {
    // close() would COMPLETE the conditional PUT: a failed publish could
    // materialize a torn snapshot as the latest (wedging every read) or a
    // full one while commit() reports failure. The failure path must leave
    // NO target object and allow a clean retry.
    registerLww(mode = "conditional-put")
    val t = new LakeTable(spark, s"graftlww:${tmpDir("lwwabort")}")
    t.create(schema, Seq("id"), 2)
    val base = t.currentSnapshot.get
    val fs = new org.apache.hadoop.fs.Path("graftlww:/x")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .asInstanceOf[LwwObjectStoreFileSystem]
    fs.failingCreateWrites = 1
    try {
      val e = intercept[java.io.IOException] {
        t.commit(base.copy(lineage = Map("writer" -> 1L)), base.snapshotId)
      }
      assert(e.getMessage.contains("injected"))
    } finally fs.failingCreateWrites = 0
    // no torn snapshot-1 left behind; the table still reads its old state
    assert(t.currentSnapshot.get.snapshotId === base.snapshotId)
    // and the claim is released: the retry succeeds
    val again = t.commit(base.copy(lineage = Map("writer" -> 2L)), base.snapshotId)
    assert(again.snapshotId === base.snapshotId + 1)
    assert(t.currentSnapshot.get.lineage("writer") === 2L)
  }

  private def condAtCloseFs(): CondAtCloseObjectStoreFileSystem = {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.graftcac.impl", classOf[CondAtCloseObjectStoreFileSystem].getName)
    spark.conf.set("spark.hadoop.graft.lake.fencing.graftcac", "conditional-put")
    new org.apache.hadoop.fs.Path("graftcac:/x")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .asInstanceOf[CondAtCloseObjectStoreFileSystem]
  }

  test("condition-at-close store: commits succeed without hsync support") {
    // GCS / pre-3.3.1 S3A throw UnsupportedOperationException from hsync;
    // PUT-on-close is the durability barrier there — publish must not fail
    condAtCloseFs()
    val t = new LakeTable(spark, s"graftcac:${tmpDir("cac")}")
    t.create(schema, Seq("id"), 2)
    val base = t.currentSnapshot.get
    val next = t.commit(base.copy(lineage = Map("writer" -> 7L)), base.snapshotId)
    assert(next.snapshotId === base.snapshotId + 1)
    assert(t.currentSnapshot.get.lineage("writer") === 7L)
  }

  test("condition-at-close store: failure with a CONCURRENT winner never deletes the winner's snapshot") {
    // On a real store the condition is evaluated at close(), so create()
    // holds no claim: committer B can land the target BETWEEN A's create()
    // and A's failure. A's cleanup must classify that as a conflict and
    // leave B's COMMITTED object untouched — an unconditional delete here
    // would silently revert the table under B (lost commit).
    val fs = condAtCloseFs()
    val root = s"graftcac:${tmpDir("cacrace")}"
    val t = new LakeTable(spark, root)
    t.create(schema, Seq("id"), 2)
    val base = t.currentSnapshot.get
    fs.onWrite = () => {
      // committer B: a full commit through its own table handle, landing
      // while A is mid-upload
      val tb = new LakeTable(spark, root)
      tb.commit(base.copy(lineage = Map("writer" -> 2L)), base.snapshotId)
      ()
    }
    try {
      intercept[CommitConflictException] {
        t.commit(base.copy(lineage = Map("writer" -> 1L)), base.snapshotId)
      }
    } finally fs.onWrite = null
    // B's snapshot survives A's failure cleanup
    val surviving = t.currentSnapshot.get
    assert(surviving.snapshotId === base.snapshotId + 1)
    assert(surviving.lineage("writer") === 2L, "the concurrent winner was clobbered")
  }

  test("condition-at-close store: post-write failure whose close() completes the PUT resolves as WON") {
    // The stream is not Abortable, so after a failure the fallback close()
    // COMPLETES the conditional PUT with the fully-buffered content. The
    // read-back must recognize the landed object as our own and report the
    // commit as SUCCEEDED — not fail the caller while the snapshot
    // materialized (a retry would then hit a false conflict).
    val fs = condAtCloseFs()
    val t = new LakeTable(spark, s"graftcac:${tmpDir("cacwon")}")
    t.create(schema, Seq("id"), 2)
    val base = t.currentSnapshot.get
    fs.failNextSync = true
    val next =
      try t.commit(base.copy(lineage = Map("writer" -> 9L)), base.snapshotId)
      finally fs.failNextSync = false
    assert(next.snapshotId === base.snapshotId + 1)
    assert(t.currentSnapshot.get.lineage("writer") === 9L)
  }

  test("object-store schemes default to conditional-put without configuration") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.graftlww.impl", classOf[LwwObjectStoreFileSystem].getName)
    spark.conf.unset("spark.hadoop.graft.lake.fencing.graftlww")
    // the double's own scheme is unknown => rename default; the KNOWN
    // object-store schemes resolve to conditional-put
    assert(graft.lake.LakeTable.ObjectStoreSchemes("s3a"))
    assert(graft.lake.LakeTable.ObjectStoreSchemes("gs"))
    assert(!graft.lake.LakeTable.ObjectStoreSchemes("hdfs"))
    val t = new LakeTable(spark, s"graftlww:${tmpDir("lwwdef")}")
    assert(t.fencingMode === "rename") // unknown scheme keeps the contract default
  }

  test("removeOrphans deletes stale unreferenced data dirs, keeps live + fresh ones") {
    val t = freshTable()
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // live commit: one real bucketed write + commit
    val df = Seq(1, 2, 3).toDF("id").withColumn("_bucket", t.bucketExpr(Seq("id"), 2))
    val snap = t.currentSnapshot.get
    val dirName = t.newCommitDirName(snap.snapshotId + 1)
    val written = t.writeBucketed(df, dirName)
    t.commit(snap.copy(bucketFiles = written, lsnHighWatermark = 1L), snap.snapshotId)

    // orphan: a stale attempt dir (conflict loser) — EVERYTHING in the
    // tree is old (liveness is the newest mtime anywhere underneath)
    val orphan = Paths.get(t.root, "data", "commit-000000000007-deadbeef")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("part-0.parquet"), "junk")
    val old = java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 10_000_000L)
    Files.setLastModifiedTime(orphan.resolve("part-0.parquet"), old)
    Files.setLastModifiedTime(orphan, old)

    // fresh unreferenced dir (in-flight writer) must survive the grace period
    val inflight = Paths.get(t.root, "data", "commit-000000000008-cafebabe")
    Files.createDirectories(inflight)

    // in-flight LONG-RUNNING writer: the top dir was mkdir'd long ago but
    // tasks are still writing under _temporary/ — judging grace on the top
    // mtime alone would GC the attempt mid-job
    val longJob = Paths.get(t.root, "data", "commit-000000000009-0ddjob00")
    Files.createDirectories(longJob.resolve("_temporary"))
    Files.writeString(longJob.resolve("_temporary").resolve("task-0.parquet"), "wip")
    Files.setLastModifiedTime(longJob, old) // top dir looks ancient

    assert(t.removeOrphans(graceMs = 1_000_000L) == 1)
    assert(!Files.exists(orphan))
    assert(Files.exists(inflight))
    assert(Files.exists(longJob), "active write tree must survive grace")
    assert(t.read().count() == 3) // live data untouched
  }

  test("failed apply cleans up its attempted data directories (engine failure path)") {
    // Drive MergeEngine's OWN failure path — the validate() hook aborts
    // after the delta write — and assert the ENGINE removed the attempt
    // dirs. (An earlier version of this test deleted the dir in its own
    // catch block, which verified test code, not the engine.)
    val t = freshTable()
    val line =
      """{"lsn":1,"xid":1,"change":[{"kind":"insert","schema":"public",""" +
        """"table":"things","columnnames":["id"],"columntypes":["integer"],""" +
        """"columnvalues":[7]}]}"""
    import spark.implicits._
    val changes = graft.decode.ChangeDecoder.decode(
      spark.createDataset(Seq(line)).toDF("value"))
    def dataDirs: Set[String] = {
      val d = Paths.get(t.root, "data")
      if (!Files.exists(d)) Set.empty
      else {
        val s = Files.list(d)
        try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
          .asScala.map(_.getFileName.toString).toSet
        finally s.close()
      }
    }
    val before = dataDirs
    val boom = new IllegalArgumentException("validation abort")
    val ex = intercept[IllegalArgumentException] {
      graft.apply.MergeEngine.applyBatch(t, changes,
        validate = () => throw boom)
    }
    assert(ex eq boom)
    assert(dataDirs === before, "the engine must remove its attempt dirs")
    assert(t.currentSnapshot.get.snapshotId === 0L) // nothing committed
  }
}
