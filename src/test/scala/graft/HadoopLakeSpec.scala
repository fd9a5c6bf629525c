package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.lake.{CommitConflictException, LakeTable}

/** Test-only FileSystem with its own scheme, backed by the local disk:
  * forces LakeTable down the NON-local (Hadoop rename-publish) code path —
  * the one an HDFS deployment takes — without needing a real cluster. */
class GraftTestFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
  override def getScheme: String = "graftfs"
}

/**
 * The lake's metadata/commit layer must be filesystem-agnostic: everything
 * the table does (create, snapshot read/write, commit fencing, writeBucketed
 * listing, expire, orphan sweep) routes through the Hadoop FileSystem API of
 * the table root's scheme — never through java.nio on an assumed local disk.
 * These tests drive the full CDC apply + maintenance cycle over a table
 * whose root is a non-`file:` scheme.
 */
class HadoopLakeSpec extends SparkSpec {

  private def registerScheme(): Unit =
    spark.sparkContext.hadoopConfiguration.set(
      "fs.graftfs.impl", classOf[GraftTestFileSystem].getName)

  val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType),
    StructField("quantity", IntegerType)))

  private def ins(lsn: Long, id: Int, name: String, q: Int): String =
    s"""{"lsn":$lsn,"xid":$lsn,"change":[{"kind":"insert","schema":"public","table":"apples",""" +
      s""""columnnames":["id","name","quantity"],"columntypes":["integer","character varying(50)","integer"],""" +
      s""""columnvalues":[$id,"$name",$q]}]}"""

  private def del(lsn: Long, id: Int): String =
    s"""{"lsn":$lsn,"xid":$lsn,"change":[{"kind":"delete","schema":"public","table":"apples",""" +
      s""""oldkeys":{"keynames":["id"],"keytypes":["integer"],"keyvalues":[$id]}}]}"""

  private def apply(t: LakeTable, lines: Seq[String]): MergeEngine.MergeStats = {
    import spark.implicits._
    MergeEngine.applyBatch(t,
      ChangeDecoder.decode(spark.createDataset(lines).toDF("value")))
  }

  test("full apply + read + maintenance cycle on a non-local filesystem scheme") {
    registerScheme()
    val root = s"graftfs:${tmpDir("hlake")}"
    val t = new LakeTable(spark, root, maxDeltasPerBucket = 2)
    t.create(schema, Seq("id"), nBuckets = 4)
    assert(t.exists)

    // several commits: deltas accumulate and compaction triggers (delta cap 2)
    apply(t, Seq(ins(1, 1, "Fuji", 2), ins(2, 2, "Gala", 3)))
    apply(t, Seq(ins(3, 3, "Kanzi", 4), del(4, 2)))
    apply(t, Seq(ins(5, 4, "Braeburn", 1)))
    val got = t.read().collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(got === Set((1, "Fuji", 2), (3, "Kanzi", 4), (4, "Braeburn", 1)))

    // exactly-once: a replayed batch is a no-op commit-wise
    val before = t.currentSnapshot.get.snapshotId
    val stats = apply(t, Seq(ins(1, 1, "Fuji", 2)))
    assert(!stats.committed && t.currentSnapshot.get.snapshotId === before)

    // time travel still works through the Hadoop path
    assert(t.read(asOfSnapshot = Some(1L)).count() === 2)

    // fencing: committing against a stale expected id must fail, and the
    // conflict must NOT clobber the current snapshot
    val cur = t.currentSnapshot.get
    intercept[CommitConflictException] {
      t.commit(cur, expectedSnapshotId = cur.snapshotId - 1)
    }
    assert(t.currentSnapshot.get.snapshotId === cur.snapshotId)

    // maintenance: expire + orphan sweep run through the same FileSystem
    val (expired, deleted) = t.expireSnapshots(keepLast = 1)
    assert(expired > 0)
    assert(t.read().collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet === got)
    // orphan sweep may remove commit dirs left holding only _SUCCESS
    // markers after expire deleted their data files; live data must survive
    t.removeOrphans(graceMs = 0L)
    assert(t.read().collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet === got)
  }

  test("distributed manifests work end-to-end on a non-local filesystem scheme") {
    registerScheme()
    val root = s"graftfs:${tmpDir("hlake3")}"
    val t = new LakeTable(spark, root, maxDeltasPerBucket = 100,
      manifestThresholdFiles = 0)
    t.create(schema, Seq("id"), nBuckets = 4)
    apply(t, (1 to 12).map(i => ins(i, i, s"a$i", i)))
    val s1 = t.currentSnapshot.get
    assert(s1.bucketManifests.nonEmpty, "distributed form on graftfs:")
    // untouched buckets reuse pointers across a single-bucket commit
    apply(t, Seq(ins(50, 1, "updated", 9)))
    val s2 = t.currentSnapshot.get
    assert(s2.bucketManifests.count { case (b, p) =>
      !s1.bucketManifests.get(b).contains(p) } === 1)
    // reads, lazy lookup, expiry + manifest GC — all through the Hadoop FS
    assert(t.read().count() === 12)
    assert(t.lookup(Map("id" -> 1)).collect().map(_.getString(1)).toSeq === Seq("updated"))
    t.expireSnapshots(keepLast = 1)
    assert(t.read().count() === 12)
    assert(t.removeOrphans(graceMs = 0L) === 0, "nothing unreferenced leaks")
  }

  test("snapshot JSON written through Hadoop FS is byte-complete and re-readable") {
    registerScheme()
    val root = s"graftfs:${tmpDir("hlake2")}"
    val t = new LakeTable(spark, root)
    t.create(schema, Seq("id"), nBuckets = 2)
    apply(t, Seq(ins(1, 1, "Fuji", 2)))
    val snap = t.currentSnapshot.get
    val again = t.readSnapshot(snap.snapshotId)
    assert(again === snap)
    // and the manifest is valid standalone JSON on disk
    val local = java.nio.file.Paths.get(
      root.stripPrefix("graftfs:"), "meta",
      f"snapshot-${snap.snapshotId}%012d.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = mapper.readTree(java.nio.file.Files.readString(local))
    assert(tree.get("snapshotId").asLong() === snap.snapshotId)
  }
}
