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
    // the explicit fallback counter must agree EXACTLY with the observe
    // path (same element granularity) — a lost-metrics batch must not
    // report a different number for identical input
    assert(ChangeDecoder.malformedCount(
      spark.createDataset(lines).toDF("value")) === 4)
  }

  test("whitespace-prefixed aggregate lines route to the aggregate parser") {
    // ltrim alone strips only spaces — a tab/CR prefix must not demote a
    // valid KPL aggregate to the single-line parser (where it would be
    // rejected as malformed)
    val lines = Seq("\t[" + ins(5, 5) + "]", "\r\n [" + ins(6, 6) + "]")
    val v = ChangeDecoder.decodeValidated(spark.createDataset(lines).toDF("value"))
    assert(v.events.collect().length === 2)
    assert(v.malformedCount() === 0)
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

  test("the decode plan scans the input exactly once") {
    // the old singles/aggregates filter-split read every WAL segment twice
    // (two filters over one source = two scans; no scan dedup in Spark)
    val df = spark.createDataset(Seq(ins(1, 1), "[" + ins(2, 2) + "]")).toDF("value")
    val plan = ChangeDecoder.decode(df).queryExecution.optimizedPlan.toString
    val nScans = "LocalRelation".r.findAllIn(plan).length
    assert(nScans === 1, s"expected a single input scan, plan:\n$plan")
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
    // the MALFORMED guard must be the thing that fired — any-exception
    // would also pass for an unrelated plan/codegen failure
    assert(ex.getMessage.contains("malformed wal2json line"), ex.getMessage)
  }
}
