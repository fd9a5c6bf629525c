package graft

import org.apache.spark.sql.types._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.lake.LakeTable

/**
 * Per-file key min/max statistics + point-lookup pruning: a 1-key lookup
 * into a multi-file bucket must scan only the files whose recorded key
 * range can contain the key — never the whole bucket.
 */
class FileStatsSpec extends SparkSpec {

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

  test("lookup prunes a multi-delta-file bucket down to the covering file") {
    // ONE bucket so every batch's delta file lands together; three batches
    // with disjoint, clustered key ranges => three delta files whose
    // recorded [min,max] ranges are disjoint
    val t = new LakeTable(spark, tmpDir("stats"), maxDeltasPerBucket = 100)
    t.create(schema, Seq("id"), nBuckets = 1)
    apply(t, (1 to 10).map(i => ins(i, i, s"a$i")))
    apply(t, (11 to 20).map(i => ins(100 + i, i, s"b$i")))
    apply(t, (21 to 30).map(i => ins(200 + i, i, s"c$i")))

    val snap = t.currentSnapshot.get
    assert(snap.bucketDeltas(0).size === 3, "need a multi-file bucket")
    assert(snap.fileStats.size === 3, "every delta file has recorded stats")

    // the lookup plan must keep exactly ONE file — the one covering id=15
    val (_, baseFiles, deltaFiles) = t.planFiles(snap, Map("id" -> 15))
    assert(baseFiles.isEmpty)
    assert(deltaFiles.size === 1, s"expected 1 pruned delta file, got $deltaFiles")
    assert(snap.fileStats(deltaFiles.head)("id") === (("11", "20")))

    // and the pruned read returns exactly the right row
    val rows = t.lookup(Map("id" -> 15)).collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq === Seq((15, "b15")))
    // a key outside every range scans nothing and returns nothing
    val (_, b2, d2) = t.planFiles(snap, Map("id" -> 999))
    assert(b2.isEmpty && d2.isEmpty)
    assert(t.lookup(Map("id" -> 999)).isEmpty)
  }

  test("compaction records base-file stats; lookup scans one base file") {
    val t = new LakeTable(spark, tmpDir("stats2"), maxDeltasPerBucket = 2)
    t.create(schema, Seq("id"), nBuckets = 2)
    apply(t, (1 to 20).map(i => ins(i, i, s"a$i")))
    apply(t, (1 to 20).map(i => ins(100 + i, i, s"b$i"))) // trips compaction
    val snap = t.currentSnapshot.get
    assert(snap.bucketDeltas.values.forall(_.isEmpty), "all buckets compacted")
    // compaction writes ONE key-sorted file per bucket, with stats
    snap.bucketFiles.foreach { case (b, fs) =>
      assert(fs.size === 1, s"bucket $b should hold one compacted file")
      assert(snap.fileStats.contains(fs.head), s"missing stats for ${fs.head}")
    }
    // stats must survive commits: only live files carry entries
    assert(snap.fileStats.keySet === snap.allFiles.toSet)

    val (_, baseFiles, deltaFiles) = t.planFiles(snap, Map("id" -> 7))
    assert(baseFiles.size === 1 && deltaFiles.isEmpty)
    val rows = t.lookup(Map("id" -> 7)).collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq === Seq((7, "b7")))
  }

  test("string keys prune lexicographically; files without stats are kept") {
    val sch = StructType(Seq(
      StructField("k", StringType), StructField("v", IntegerType)))
    val snap = graft.lake.Snapshot(0L, sch, Seq("k"), 1,
      bucketFiles = Map(0 -> Seq("data/c1/f1", "data/c1/f2", "data/c1/f3")),
      bucketWatermarks = Map.empty, bucketDeltas = Map.empty,
      lsnHighWatermark = -1L, renameMap = Map.empty, lineage = Map.empty,
      fileStats = Map(
        "data/c1/f1" -> Map("k" -> (("apple", "cherry"))),
        "data/c1/f2" -> Map("k" -> (("mango", "pear")))))
        // f3 has no stats -> always kept
    val t = new LakeTable(spark, tmpDir("stats3"))
    val (_, bases, _) = t.planFiles(snap, Map("k" -> "banana"))
    assert(bases === Seq("data/c1/f1", "data/c1/f3"))
  }

  test("string pruning compares in UTF-8 byte order, not UTF-16 code units") {
    // Spark computed the stats over UTF8String (unsigned UTF-8 byte order).
    // U+E000 (private use, UTF-8 EE 80 80) sorts BELOW U+1F600 (emoji,
    // UTF-8 F0 9F 98 80) in byte order, but its UTF-16 code unit 0xE000
    // sorts ABOVE the emoji's lead surrogate 0xD83D — a Java String
    // comparison would wrongly prune the file that contains the key.
    val sch = StructType(Seq(
      StructField("k", StringType), StructField("v", IntegerType)))
    val snap = graft.lake.Snapshot(0L, sch, Seq("k"), 1,
      bucketFiles = Map(0 -> Seq("data/c1/f1")),
      bucketWatermarks = Map.empty, bucketDeltas = Map.empty,
      lsnHighWatermark = -1L, renameMap = Map.empty, lineage = Map.empty,
      fileStats = Map("data/c1/f1" -> Map("k" -> (("a", "😀")))))
    val t = new LakeTable(spark, tmpDir("stats4"))
    val (_, kept, _) = t.planFiles(snap, Map("k" -> "\uE000"))
    assert(kept === Seq("data/c1/f1"),
      "U+E000 is inside [a, U+1F600] in the byte order the stats were written in")
  }

  test("fileStats round-trips through the snapshot JSON") {
    val s = graft.lake.Snapshot(3L, schema, Seq("id"), 2,
      bucketFiles = Map(0 -> Seq("data/x/f")), bucketWatermarks = Map(0 -> 5L),
      bucketDeltas = Map.empty, lsnHighWatermark = 5L,
      renameMap = Map.empty, lineage = Map.empty,
      fileStats = Map("data/x/f" -> Map("id" -> (("1", "42")))))
    assert(LakeTable.fromJson(LakeTable.toJson(s)) === s)
  }
}
