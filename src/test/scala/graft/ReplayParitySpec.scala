package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.lake.LakeTable

/**
 * Replay parity with the reference's integration tests
 * (KinesisReceivesPostgresChangesIT.java:94-123): the exact wal2json event
 * sequences the reference's scenarios produce, streamed through
 * decode -> MERGE into a lake table, must reproduce the final table states.
 *
 *  IT-1: insert {Fuji:2, Gala:3} then delete both        => final state empty
 *  IT-2: insert {Macintosh:5, Granny Smith:7}, update
 *        Macintosh -> quantity 1                         => {(1,Macintosh,1),(2,Granny Smith,7)}
 */
class ReplayParitySpec extends SparkSpec {
  import spark.implicits._

  val applesSchema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType),
    StructField("quantity", IntegerType)))

  private def ins(lsn: Long, xid: Long, id: Int, name: String, q: Int): String =
    s"""{"lsn":$lsn,"xid":$xid,"change":[{"kind":"insert","schema":"public","table":"apples",""" +
      s""""columnnames":["id","name","quantity"],""" +
      s""""columntypes":["integer","character varying(50)","integer"],""" +
      s""""columnvalues":[$id,"$name",$q]}]}"""

  private def upd(lsn: Long, xid: Long, id: Int, name: String, q: Int): String =
    s"""{"lsn":$lsn,"xid":$xid,"change":[{"kind":"update","schema":"public","table":"apples",""" +
      s""""columnnames":["id","name","quantity"],""" +
      s""""columntypes":["integer","character varying(50)","integer"],""" +
      s""""columnvalues":[$id,"$name",$q],""" +
      s""""oldkeys":{"keynames":["id"],"keytypes":["integer"],"keyvalues":[$id]}}]}"""

  private def del(lsn: Long, xid: Long, id: Int): String =
    s"""{"lsn":$lsn,"xid":$xid,"change":[{"kind":"delete","schema":"public","table":"apples",""" +
      s""""oldkeys":{"keynames":["id"],"keytypes":["integer"],"keyvalues":[$id]}}]}"""

  private def newTable(): LakeTable = {
    val t = new LakeTable(spark, tmpDir("apples"))
    t.create(applesSchema, Seq("id"), nBuckets = 4)
    t
  }

  private def apply(t: LakeTable, lines: Seq[String]): MergeEngine.MergeStats = {
    val df = spark.createDataset(lines).toDF("value")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(df))
  }

  private def state(t: LakeTable): Set[(Int, String, Int)] =
    t.read().collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet

  test("IT-1 replay: insert Fuji+Gala then delete both => empty final state") {
    val t = newTable()
    apply(t, Seq(
      ins(1, 560, 1, "Fuji", 2), ins(2, 561, 2, "Gala", 3),
      del(3, 562, 1), del(4, 563, 2)))
    assert(state(t) === Set.empty)
  }

  test("IT-1 replay across micro-batches: inserts then deletes") {
    val t = newTable()
    apply(t, Seq(ins(1, 560, 1, "Fuji", 2), ins(2, 561, 2, "Gala", 3)))
    assert(state(t) === Set((1, "Fuji", 2), (2, "Gala", 3)))
    apply(t, Seq(del(3, 562, 1), del(4, 563, 2)))
    assert(state(t) === Set.empty)
  }

  test("IT-2 replay: inserts then update => updated final state") {
    val t = newTable()
    apply(t, Seq(
      ins(1, 570, 1, "Macintosh", 5), ins(2, 571, 2, "Granny Smith", 7),
      upd(3, 572, 1, "Macintosh", 1)))
    assert(state(t) === Set((1, "Macintosh", 1), (2, "Granny Smith", 7)))
  }

  test("IT-2 per-row sha256 parity with expected content") {
    val t = newTable()
    apply(t, Seq(
      ins(1, 570, 1, "Macintosh", 5), ins(2, 571, 2, "Granny Smith", 7),
      upd(3, 572, 1, "Macintosh", 1)))
    val got = t.read()
      .select(col("id"), sha2(concat_ws("|", col("id"), col("name"), col("quantity")), 256).as("h"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toMap
    val exp = Map(
      1 -> java.security.MessageDigest.getInstance("SHA-256")
        .digest("1|Macintosh|1".getBytes("UTF-8")).map("%02x".format(_)).mkString,
      2 -> java.security.MessageDigest.getInstance("SHA-256")
        .digest("2|Granny Smith|7".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(got === exp)
  }

  test("exactly-once: re-applying a committed batch is a no-op") {
    val t = newTable()
    val batch = Seq(
      ins(1, 570, 1, "Macintosh", 5), ins(2, 571, 2, "Granny Smith", 7),
      upd(3, 572, 1, "Macintosh", 1))
    val s1 = apply(t, batch)
    assert(s1.committed)
    val snapBefore = t.currentSnapshot.get
    val s2 = apply(t, batch) // forced double-apply (crash-replay simulation)
    assert(!s2.committed)
    val snapAfter = t.currentSnapshot.get
    assert(snapBefore.snapshotId === snapAfter.snapshotId)
    assert(snapBefore.bucketFiles === snapAfter.bucketFiles)
    assert(state(t) === Set((1, "Macintosh", 1), (2, "Granny Smith", 7)))
  }

  test("partially-overlapping batch applies only events above the watermark") {
    val t = newTable()
    apply(t, Seq(ins(1, 570, 1, "Macintosh", 5)))
    // replayed first event + one new event in the same batch
    apply(t, Seq(ins(1, 570, 1, "Macintosh", 99), ins(2, 571, 2, "Granny Smith", 7)))
    // lsn=1 must NOT be re-applied (value 99 would clobber nothing here, but
    // watermark semantics say it is filtered)
    assert(state(t) === Set((1, "Macintosh", 5), (2, "Granny Smith", 7)))
  }

  test("table filter drops irrelevant tables (reference O5)") {
    val t = newTable()
    val other =
      s"""{"lsn":5,"xid":580,"change":[{"kind":"insert","schema":"public","table":"oranges",""" +
        s""""columnnames":["id"],"columntypes":["integer"],"columnvalues":[9]}]}"""
    val df = spark.createDataset(Seq(ins(1, 560, 1, "Fuji", 2), other)).toDF("value")
    val changes = ChangeDecoder.decode(df, relevantTables = Set("apples"))
    assert(changes.select("table").distinct().collect().map(_.getString(0)).toSet === Set("apples"))
    MergeEngine.applyBatch(t, changes)
    assert(state(t) === Set((1, "Fuji", 2)))
  }

  test("64-bit xid survives decode (reference pins xid > Int.MaxValue)") {
    val df = spark.createDataset(Seq(ins(1, 3147483647L, 1, "Fuji", 2))).toDF("value")
    val xids = ChangeDecoder.decode(df).select("xid").collect().map(_.getLong(0))
    assert(xids.toSeq === Seq(3147483647L))
  }

  test("strict decode raises on malformed payload (required=true parity)") {
    val df = spark.createDataset(Seq("""{"nonsense": true}""")).toDF("value")
    val ex = intercept[Exception] {
      ChangeDecoder.decode(df, strict = true).collect()
    }
    // the MALFORMED guard must be the thing that fired — any-exception
    // would also pass for an unrelated plan/codegen failure
    assert(ex.getMessage.contains("malformed wal2json line"), ex.getMessage)
  }

  test("non-strict decode drops malformed payloads") {
    val df = spark.createDataset(Seq("""{"nonsense": true}""", ins(1, 5, 1, "Fuji", 2)))
      .toDF("value")
    assert(ChangeDecoder.decode(df, strict = false).count() === 1)
  }

  test("KPL-aggregated lines: an array of slot messages decodes like singles") {
    // reference consumer accepts single objects or arrays
    // (SlotMessageRecordProcessor.java:73-82)
    val agg = "[" + Seq(ins(1, 560, 1, "Fuji", 2), ins(2, 561, 2, "Gala", 3))
      .mkString(",") + "]"
    val single = upd(3, 562, 1, "Fuji", 7)
    val df = spark.createDataset(Seq(agg, single)).toDF("value")
    assert(graft.decode.ChangeDecoder.malformedLines(df).isEmpty)
    val t = newTable()
    MergeEngine.applyBatch(t, ChangeDecoder.decode(df))
    assert(state(t) === Set((1, "Fuji", 7), (2, "Gala", 3)))
    // malformed aggregated line is caught by strict validation
    val bad = spark.createDataset(Seq("""[{"lsn":1},{"nope":true}]""")).toDF("value")
    assert(graft.decode.ChangeDecoder.malformedLines(bad).nonEmpty)
  }

  test("typed Dataset[ChangeEvent] view: decode round-trips into the case-class model") {
    val df = spark.createDataset(Seq(
      ins(1, 100, 1, "Fuji", 2), upd(2, 101, 1, "Fuji", 9))).toDF("value")
    val evs = ChangeDecoder.typed(ChangeDecoder.decode(df))
      .collect().sortBy(e => (e.lsn, e.seq))
    assert(evs.map(_.kind).toSeq === Seq("insert", "update"))
    assert(evs(0).oldkeys.isEmpty && evs(1).oldkeys.isDefined)
    assert(evs(1).oldkeys.get.keyvalues === Seq("1"))
    // reference Change.getValueForColumn parity (Change.java:80-88):
    // by-name lookup, unknown column throws like UnknownColumnNameException
    assert(evs(0).valueForColumn("name") === "Fuji")
    assert(evs(1).valueForColumn("quantity") === "9")
    val e = intercept[IllegalArgumentException] { evs(0).valueForColumn("nope") }
    assert(e.getMessage.contains("Unknown column name"))
  }
}
