package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.decode.ChangeDecoder
import graft.lake.LakeTable
import graft.streaming.{CdcPipeline, TableTarget}

/**
 * Single-pass strict validation: malformed-line detection rides the one
 * decode pass as observe/CollectMetrics counts (no separate validation
 * query re-parsing the batch), and a strict pipeline still aborts a
 * malformed batch BEFORE anything is committed.
 */
class DecodeValidationSpec extends SparkSpec {
  import spark.implicits._

  private def ins(lsn: Long, id: Int): String =
    s"""{"lsn":$lsn,"xid":$lsn,"change":[{"kind":"insert","schema":"public","table":"apples",""" +
      s""""columnnames":["id","name","quantity"],""" +
      s""""columntypes":["integer","text","integer"],""" +
      s""""columnvalues":[$id,"n$id",1]}]}"""

  private val applesSchema = StructType(Seq(
    StructField("id", IntegerType), StructField("name", StringType),
    StructField("quantity", IntegerType)))

  test("decodeValidated counts malformed lines across single and aggregated branches") {
    val lines = Seq(
      ins(1, 1),
      """{"nonsense": true}""",                    // single-line malformed
      "[" + ins(2, 2) + "," + ins(3, 3) + "]",     // valid KPL aggregate
      """[{"lsn":1},{"nope":true}]""",             // agg with malformed elements
      """[broken json""")                          // unparseable aggregate
    val v = ChangeDecoder.decodeValidated(spark.createDataset(lines).toDF("value"))
    val events = v.events.collect()
    assert(events.length === 3) // ids 1,2,3
    // 1 single bad + 2 bad elements re-entering the single path + 1 bad array
    assert(v.malformedCount() === 4)
  }

  test("decodeValidated events match decode(strict=false) exactly") {
    val cfg = graft.gen.GenConfig(seed = 99L, nRepos = 8, pathsPerRepo = 3)
    val lines = (0L until 150L).map(id =>
      graft.gen.ChangeStreamGen.renderLine(cfg, graft.gen.ChangeStreamGen.txn(cfg, id)))
    val df = spark.createDataset(lines).toDF("value")
    val a = ChangeDecoder.decodeValidated(df).events
      .select(to_json(struct(col("*")))).collect().map(_.getString(0)).sorted
    val b = ChangeDecoder.decode(df, strict = false)
      .select(to_json(struct(col("*")))).collect().map(_.getString(0)).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("the validated decode plan parses each line exactly once") {
    val df = spark.createDataset(Seq(ins(1, 1))).toDF("value")
    val v = ChangeDecoder.decodeValidated(df)
    val plan = v.events.queryExecution.optimizedPlan.toString
    val nParses = "parse_wal_line".r.findAllIn(plan).length
    assert(nParses === 1, s"expected a single parse, plan:\n$plan")
  }

  private def pipelineFor(wal: String, table: LakeTable): CdcPipeline =
    new CdcPipeline(spark, wal, tmpDir("ckpt"),
      Seq(TableTarget("apples", table, applesSchema, Seq("id"), 2)),
      relevantTables = Set("apples"))

  test("strict pipeline aborts a malformed batch before any commit") {
    val table = new LakeTable(spark, tmpDir("apples"))
    val pipe = pipelineFor(tmpDir("wal-unused"), table)
    val snapBefore = table.currentSnapshot.get
    val batch = spark.createDataset(Seq(ins(1, 1), """{"garbage":1}""", ins(2, 2)))
      .toDF("value")
    val ex = intercept[IllegalArgumentException] { pipe.processBatch(batch, 0L) }
    assert(ex.getMessage.contains("malformed wal2json line"))
    assert(ex.getMessage.contains("garbage")) // sample of the offending line
    val snapAfter = table.currentSnapshot.get
    assert(snapAfter.snapshotId === snapBefore.snapshotId) // nothing committed
    assert(table.read().count() === 0)
  }

  test("a batch that is malformed in full still fails (never a silent no-op)") {
    val table = new LakeTable(spark, tmpDir("apples"))
    val pipe = pipelineFor(tmpDir("wal-unused"), table)
    val batch = spark.createDataset(Seq("""{"garbage":1}""", "also not json"))
      .toDF("value")
    val ex = intercept[IllegalArgumentException] { pipe.processBatch(batch, 0L) }
    assert(ex.getMessage.contains("2 malformed wal2json line"))
  }

  test("non-strict pipeline drops malformed lines and applies the rest") {
    val table = new LakeTable(spark, tmpDir("apples"))
    val pipe = new CdcPipeline(spark, tmpDir("wal-unused"), tmpDir("ckpt"),
      Seq(TableTarget("apples", table, applesSchema, Seq("id"), 2)),
      relevantTables = Set("apples"), strictDecode = false)
    val batch = spark.createDataset(Seq(ins(1, 1), """{"garbage":1}""", ins(2, 2)))
      .toDF("value")
    pipe.processBatch(batch, 0L)
    assert(table.read().count() === 2)
  }

  test("strict decode is self-contained for unparseable aggregated lines") {
    val df = spark.createDataset(Seq("""[not valid json""")).toDF("value")
    val ex = intercept[Exception] {
      ChangeDecoder.decode(df, strict = true).collect()
    }
    assert(ex.getMessage != null)
  }
}
