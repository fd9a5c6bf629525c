package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.lake.LakeTable

/**
 * Deeper MERGE semantics: primary-key-changing updates, hot-key skew
 * absorption, multi-change transactions, intra-transaction ordering.
 */
class MergeSemanticsSpec extends SparkSpec {
  import spark.implicits._

  val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType),
    StructField("quantity", IntegerType)))

  private def newTable(): LakeTable = {
    val t = new LakeTable(spark, tmpDir("apples"))
    t.create(schema, Seq("id"), nBuckets = 4)
    t
  }

  private def ins(lsn: Long, id: Int, name: String, q: Int): String =
    s"""{"lsn":$lsn,"xid":$lsn,"change":[{"kind":"insert","schema":"public","table":"apples",""" +
      s""""columnnames":["id","name","quantity"],"columntypes":["integer","character varying(50)","integer"],""" +
      s""""columnvalues":[$id,"$name",$q]}]}"""

  private def updKeyChange(lsn: Long, oldId: Int, newId: Int, name: String, q: Int): String =
    s"""{"lsn":$lsn,"xid":$lsn,"change":[{"kind":"update","schema":"public","table":"apples",""" +
      s""""columnnames":["id","name","quantity"],"columntypes":["integer","character varying(50)","integer"],""" +
      s""""columnvalues":[$newId,"$name",$q],""" +
      s""""oldkeys":{"keynames":["id"],"keytypes":["integer"],"keyvalues":[$oldId]}}]}"""

  private def apply(t: LakeTable, lines: Seq[String]): MergeEngine.MergeStats =
    MergeEngine.applyBatch(t, ChangeDecoder.decode(spark.createDataset(lines).toDF("value")))

  private def state(t: LakeTable): Set[(Int, String, Int)] =
    t.read().collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet

  test("PK-changing update deletes the old key and inserts the new key") {
    val t = newTable()
    apply(t, Seq(ins(1, 1, "Fuji", 2), ins(2, 2, "Gala", 3)))
    apply(t, Seq(updKeyChange(3, 1, 7, "Fuji Prime", 9)))
    assert(state(t) === Set((7, "Fuji Prime", 9), (2, "Gala", 3)))
  }

  test("PK-changing update within a single batch") {
    val t = newTable()
    apply(t, Seq(
      ins(1, 1, "Fuji", 2),
      updKeyChange(2, 1, 7, "Fuji Prime", 9),
      ins(3, 1, "NewApple", 1))) // old id reused after the move
    assert(state(t) === Set((7, "Fuji Prime", 9), (1, "NewApple", 1)))
  }

  test("PK-changing update onto an existing key overwrites it") {
    val t = newTable()
    apply(t, Seq(ins(1, 1, "Fuji", 2), ins(2, 2, "Gala", 3)))
    apply(t, Seq(updKeyChange(3, 1, 2, "Merged", 5)))
    assert(state(t) === Set((2, "Merged", 5)))
  }

  test("non-PK update via oldkeys still lands on the same key") {
    val t = newTable()
    apply(t, Seq(ins(1, 1, "Fuji", 2)))
    apply(t, Seq(updKeyChange(2, 1, 1, "Fuji", 42)))
    assert(state(t) === Set((1, "Fuji", 42)))
  }

  test("hot-key batch (90% of events on one key) dedups correctly") {
    // the reference randomizes shard keys to dodge hot keys
    // (SlotReaderKinesisWriter.java:259-267); we keep key semantics and rely
    // on declarative max_by partial aggregation to absorb the skew map-side.
    val t = newTable()
    val hot = (1L to 900L).map(i => ins(i, 1, s"v$i", i.toInt))
    val cold = (901L to 1000L).map(i => ins(i, i.toInt, s"k$i", 1))
    val stats = apply(t, scala.util.Random.shuffle(hot ++ cold))
    assert(stats.appliedKeys === 101)
    val got = state(t)
    assert(got.contains((1, "v900", 900)))
    assert(got.size === 101)
  }

  test("multi-change transaction applies in list order (same lsn, seq order)") {
    val t = newTable()
    val multi =
      s"""{"lsn":1,"xid":9,"change":[
         |{"kind":"insert","schema":"public","table":"apples","columnnames":["id","name","quantity"],"columntypes":["integer","text","integer"],"columnvalues":[1,"A",1]},
         |{"kind":"update","schema":"public","table":"apples","columnnames":["id","name","quantity"],"columntypes":["integer","text","integer"],"columnvalues":[1,"B",2],"oldkeys":{"keynames":["id"],"keytypes":["integer"],"keyvalues":[1]}},
         |{"kind":"update","schema":"public","table":"apples","columnnames":["id","name","quantity"],"columntypes":["integer","text","integer"],"columnvalues":[1,"C",3],"oldkeys":{"keynames":["id"],"keytypes":["integer"],"keyvalues":[1]}}
         |]}""".stripMargin.replaceAll("\n", "")
    apply(t, Seq(multi))
    assert(state(t) === Set((1, "C", 3)))
  }

  test("key-column rename: old-era oldkeys still identify the row") {
    // rename id -> ident; every event below is OLD-era (carries "id" in
    // columnnames AND oldkeys.keynames). The rename must hit both carriers:
    // with only columnnames renamed, the update splits as a bogus PK change
    // and the delete emits a null-keyed marker that removes nothing.
    val renamedSchema = StructType(Seq(
      StructField("ident", IntegerType),
      StructField("name", StringType),
      StructField("quantity", IntegerType)))
    val t = new LakeTable(spark, tmpDir("apples-rename"))
    t.create(renamedSchema, Seq("ident"), nBuckets = 4,
      renameMap = Map("id" -> "ident"))
    apply(t, Seq(ins(1, 1, "Fuji", 2), ins(2, 2, "Gala", 3)))
    // non-PK update identified via oldkeys under the OLD name
    apply(t, Seq(updKeyChange(3, 1, 1, "Fuji v2", 5)))
    // delete identified via oldkeys under the OLD name
    val del =
      s"""{"lsn":4,"xid":4,"change":[{"kind":"delete","schema":"public","table":"apples",""" +
        s""""oldkeys":{"keynames":["id"],"keytypes":["integer"],"keyvalues":[2]}}]}"""
    apply(t, Seq(del))
    assert(state(t) === Set((1, "Fuji v2", 5)))
    // and a genuine PK change under the old name still splits correctly
    apply(t, Seq(updKeyChange(5, 1, 9, "Moved", 7)))
    assert(state(t) === Set((9, "Moved", 7)))
  }

  test("delete of a never-seen key is a harmless no-op") {
    val t = newTable()
    val del =
      s"""{"lsn":1,"xid":1,"change":[{"kind":"delete","schema":"public","table":"apples",""" +
        s""""oldkeys":{"keynames":["id"],"keytypes":["integer"],"keyvalues":[99]}}]}"""
    val stats = apply(t, Seq(del))
    assert(stats.committed)
    assert(state(t) === Set.empty)
  }
}
