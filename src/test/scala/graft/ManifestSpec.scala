package graft

import org.apache.spark.sql.types._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.lake.{CommitConflictException, LakeTable}

/**
 * Distributed snapshot manifests: past `manifestThresholdFiles` the root
 * stays O(buckets) and a commit rewrites ONLY the buckets it touched —
 * untouched buckets reuse the previous manifest file by pointer. Without
 * this the driver-side JSON grows O(files) and is fully rewritten per
 * batch, which cannot survive 10^10 rows.
 */
class ManifestSpec extends SparkSpec {

  val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType)))

  private def ins(lsn: Long, id: Int, name: String): String =
    s"""{"lsn":$lsn,"xid":$lsn,"change":[{"kind":"insert","schema":"public","table":"apples",""" +
      s""""columnnames":["id","name"],"columntypes":["integer","character varying(50)"],""" +
      s""""columnvalues":[$id,"$name"]}]}"""

  private def apply(t: LakeTable, lines: Seq[String]): Unit = {
    import spark.implicits._
    MergeEngine.applyBatch(t,
      ChangeDecoder.decode(spark.createDataset(lines).toDF("value")))
  }

  private def distributedTable(dir: String): LakeTable = {
    val t = new LakeTable(spark, dir, maxDeltasPerBucket = 100,
      manifestThresholdFiles = 0) // always distribute (tiny test scale)
    t.create(schema, Seq("id"), nBuckets = 4)
    t
  }

  private def rootJson(t: LakeTable, id: Long): String = {
    val p = java.nio.file.Paths.get(t.root, "meta", f"snapshot-$id%012d.json")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  test("past the threshold the root is O(buckets); untouched buckets reuse manifests") {
    val t = distributedTable(tmpDir("mani"))
    apply(t, (1 to 20).map(i => ins(i, i, s"a$i")))
    val s1 = t.currentSnapshot.get
    assert(s1.bucketManifests.nonEmpty, "snapshot must be in distributed form")
    assert(s1.bucketManifests.keySet === s1.manifestBuckets)
    val root1 = rootJson(t, s1.snapshotId)
    assert(!root1.contains("bucketFiles") && !root1.contains("fileStats"),
      "per-file state must NOT be inline in a distributed root")
    assert(root1.contains("bucketManifests"))
    // the resolved snapshot is complete: reads, stats, watermarks all there
    assert(t.read().count() === 20)
    assert(s1.fileStats.nonEmpty && s1.bucketWatermarks.nonEmpty)

    // second batch touches ONE key => one bucket; the rest must reuse
    apply(t, Seq(ins(100, 1, "updated")))
    val s2 = t.currentSnapshot.get
    val touched = s2.bucketManifests.filter { case (b, p) =>
      !s1.bucketManifests.get(b).contains(p)
    }
    assert(touched.size === 1,
      s"exactly one bucket's manifest should be rewritten, got ${touched.keySet}")
    assert((s2.bucketManifests -- touched.keySet) ===
      (s1.bucketManifests -- touched.keySet), "untouched pointers identical")
    // and the data is right
    val rows = t.read().collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rows(1) === "updated" && rows(7) === "a7" && rows.size === 20)
  }

  test("inline and distributed forms resolve to the same table state") {
    val lines = (1 to 25).map(i => ins(i, i, s"v$i")) ++
      Seq(ins(30, 3, "x3"), ins(31, 9, "x9"))
    val inline = new LakeTable(spark, tmpDir("mani-i"), maxDeltasPerBucket = 100)
    inline.create(schema, Seq("id"), nBuckets = 4)
    apply(inline, lines)
    val dist = distributedTable(tmpDir("mani-d"))
    apply(dist, lines)
    val a = inline.currentSnapshot.get
    val b = dist.currentSnapshot.get
    // data file paths carry per-attempt UUIDs, so compare everything else
    // field-for-field and the file-level state by VALUE
    assert(a.bucketWatermarks === b.bucketWatermarks)
    assert(a.lineage === b.lineage && a.bucketLineage === b.bucketLineage)
    assert(a.lsnHighWatermark === b.lsnHighWatermark)
    assert(a.bucketDeltas.view.mapValues(_.size).toMap ===
      b.bucketDeltas.view.mapValues(_.size).toMap)
    def statRanges(s: graft.lake.Snapshot) =
      s.fileStats.values.map(_.toSeq.sorted).toSeq
        .sortBy(_.mkString) // per-file key ranges, path-independent
    assert(statRanges(a) === statRanges(b))
    assert(inline.read().collect().toSet === dist.read().collect().toSet)
    // point lookup prunes through the distributed form too
    val (_, bases, deltas) = dist.planFiles(b, Map("id" -> 9))
    assert(bases.size + deltas.size < b.allFiles.size,
      "stats pruning must still engage")
    assert(dist.lookup(Map("id" -> 9)).collect().map(_.getString(1)).toSeq === Seq("x9"))
  }

  test("time travel across distributed snapshots") {
    val t = distributedTable(tmpDir("mani-tt"))
    apply(t, (1 to 5).map(i => ins(i, i, s"a$i")))
    val id1 = t.currentSnapshot.get.snapshotId
    apply(t, Seq(ins(10, 2, "later")))
    val atS1 = t.read(asOfSnapshot = Some(id1)).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(atS1(2) === "a2")
    val now = t.read().collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(now(2) === "later")
  }

  test("expire + orphan sweep GC manifests; referenced ones survive") {
    val t = distributedTable(tmpDir("mani-gc"))
    apply(t, (1 to 8).map(i => ins(i, i, s"a$i")))
    apply(t, Seq(ins(20, 1, "b1")))
    apply(t, Seq(ins(21, 2, "b2")))
    val manifestsDir = java.nio.file.Paths.get(t.root, "meta", "manifests")
    // raw listing minus Hadoop's local .crc checksum siblings
    def listed: Set[String] = {
      val it = java.nio.file.Files.list(manifestsDir).iterator()
      scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
        .map(_.getFileName.toString).filterNot(_.startsWith(".")).toSet
    }
    val before = listed.size
    t.expireSnapshots(keepLast = 1)
    val live = t.currentSnapshot.get.bucketManifests.values
      .map(_.split("/").last).toSet
    assert(listed === live, "exactly the referenced manifests survive expiry")
    assert(listed.size < before, "expiry must have deleted stale manifests")
    assert(t.read().count() === 8) // table intact

    // an unreferenced manifest (crashed attempt) is swept with grace
    val stray = manifestsDir.resolve("manifest-999-b0-deadbeef.json")
    java.nio.file.Files.writeString(stray, "{}")
    assert(t.removeOrphans(graceMs = 1_000_000L) === 0, "grace protects it")
    assert(t.removeOrphans(graceMs = 0L) === 1)
    assert(!java.nio.file.Files.exists(stray))
  }

  test("point lookup reads the root + ONE bucket manifest (O(1) metadata IO)") {
    val t = distributedTable(tmpDir("mani-lazy"))
    apply(t, (1 to 20).map(i => ins(i, i, s"a$i")))
    val snap = t.currentSnapshot.get
    val (keyBucket, _, _) = t.planFiles(snap, Map("id" -> 7))
    // corrupt EVERY OTHER bucket's manifest: if the lookup touched any of
    // them it would blow up — surviving proves it resolved only its own
    snap.bucketManifests.foreach { case (b, rel) =>
      if (b != keyBucket)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(t.root, rel), "NOT JSON")
    }
    assert(t.lookup(Map("id" -> 7)).collect().map(_.getString(1)).toSeq === Seq("a7"))
    // a wrong key set gets the informative error BEFORE any bucket math
    val e = intercept[IllegalArgumentException] { t.lookup(Map("bogus" -> 7)) }
    assert(e.getMessage.contains("lookup needs exactly the key columns"))
    // whereas the full resolve must now fail (sanity: corruption is real)
    intercept[Exception] { t.currentSnapshot.get }
  }

  test("bucket-subset read resolves only the requested buckets' manifests") {
    val t = distributedTable(tmpDir("mani-subset"))
    apply(t, (1 to 20).map(i => ins(i, i, s"a$i")))
    val snap = t.currentSnapshot.get
    val (keyBucket, _, _) = t.planFiles(snap, Map("id" -> 7))
    val expected = (1 to 20).filter { i =>
      t.planFiles(snap, Map("id" -> i))._1 == keyBucket
    }.toSet
    // corrupt every OTHER bucket's manifest: the subset read survives only
    // if it resolved exactly the requested bucket's manifest
    snap.bucketManifests.foreach { case (b, rel) =>
      if (b != keyBucket)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(t.root, rel), "NOT JSON")
    }
    val got = t.read(buckets = Some(Set(keyBucket))).collect()
      .map(_.getInt(0)).toSet
    assert(got === expected, "subset read returns exactly that bucket's rows")
    intercept[Exception] { t.read().collect() } // full read must fail (sanity)
  }

  test("expire-plan recovery deletes roots BEFORE manifests (no lesson-13 wedge)") {
    // crash window: an expire wrote its durable plan (roots + their
    // exclusive manifests) and died before deleting anything. Recovery
    // must remove the ROOTS first — deleting a still-listed root's
    // manifests would leave a snapshot readSnapshot can never resolve,
    // wedging every later maintenance pass
    val t = distributedTable(tmpDir("mani-plan"))
    apply(t, (1 to 8).map(i => ins(i, i, s"a$i")))     // snapshot 1
    apply(t, Seq(ins(20, 1, "v2")))                    // snapshot 2
    val s1 = t.readSnapshot(1L)
    val s2 = t.currentSnapshot.get
    val deadManifests = s1.bucketManifests.values.toSet -- s2.bucketManifests.values
    assert(deadManifests.nonEmpty, "snapshot 1 must own at least one manifest")
    val planJson =
      s"""{"roots":[1],"manifests":[${deadManifests.map("\"" + _ + "\"").mkString(",")}],"files":[]}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(t.root, "meta", ".expire-plan-crash.json"), planJson)
    // both maintenance entry points must complete the plan without wedging
    t.removeOrphans(graceMs = Long.MaxValue / 2)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(t.root, "meta", "snapshot-000000000001.json")))
    deadManifests.foreach(m => assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(t.root, m)), s"dead manifest $m removed"))
    assert(t.currentSnapshot.get.snapshotId === 2L) // table fully readable
    assert(t.read().count() === 8)
    t.expireSnapshots(keepLast = 1) // and further maintenance still works
  }

  test("a commit-race loser deletes the manifests it wrote") {
    import org.apache.hadoop.fs.{Path => HPath}
    val dir = tmpDir("mani-race")
    val setup = distributedTable(dir)
    apply(setup, (1 to 6).map(i => ins(i, i, s"a$i")))
    val base = setup.currentSnapshot.get
    val nManifests = base.bucketManifests.size
    val manifestsDir = java.nio.file.Paths.get(dir, "meta", "manifests")
    def listed: Long = {
      val it = java.nio.file.Files.list(manifestsDir).iterator()
      scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
        .count(p => !p.getFileName.toString.startsWith("."))
    }
    val before = listed

    // Both writers must get PAST the optimistic check and write their
    // manifests before either publishes — a barrier inside publish holds
    // them at the fence together (the genuine zombie-writer shape).
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    def racer(): LakeTable =
      new LakeTable(spark, dir, 100, 256, 0) {
        override protected def publish(tmp: HPath, target: HPath,
                                       content: String): Unit = {
          barrier.await(10, java.util.concurrent.TimeUnit.SECONDS)
          super.publish(tmp, target, content)
        }
      }
    val outcomes = (1 to 2).map { i =>
      new java.util.concurrent.FutureTask[Option[Throwable]](() =>
        try {
          racer().commit(base.copy(lsnHighWatermark = 50L + i,
            // perturb every bucket slice so BOTH writers write manifests
            bucketWatermarks = base.bucketWatermarks.map { case (b, w) => b -> (w + i) }),
            base.snapshotId, prev = Some(base))
          None
        } catch { case e: Throwable => Some(e) })
    }
    val threads = outcomes.map(new Thread(_))
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    val results = outcomes.map(_.get())
    assert(results.count(_.isEmpty) === 1, s"exactly one winner: $results")
    assert(results.flatten.forall(_.isInstanceOf[CommitConflictException]))
    // base's manifests + exactly the winner's — the loser's are cleaned
    assert(listed === before + nManifests,
      "the loser's manifest files must not leak")
    // and every pointer in the surviving root resolves
    val cur = setup.currentSnapshot.get
    assert(cur.lsnHighWatermark >= 51L)
    assert(cur.bucketManifests.size === nManifests)
  }
}
