package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.cli.Main
import graft.sources.DataFrameRelation

/**
 * Batch READ connector (`spark.read.format("graft-lake")`): the pure-SQL /
 * pure-DataFrame face of [[LakeTable.read]] and [[LakeTable.changes]] —
 * merged keep-last state, `asOf` time travel, and the batch change feed,
 * with scan pruning/filters forwarded into the inner Catalyst plan.
 */
class LakeBatchReadSpec extends SparkSpec {
  import spark.implicits._

  val cfg = GenConfig(seed = 77L, nRepos = 8, pathsPerRepo = 4, maxChangesPerTxn = 3)

  private def lines(from: Long, until: Long) =
    spark.createDataset((from until until)
      .map(id => ChangeStreamGen.renderLine(cfg, ChangeStreamGen.txn(cfg, id)))).toDF("value")

  private def newTable(dir: String, manifestThreshold: Int = 4096): LakeTable = {
    val t = new LakeTable(spark, tmpDir(dir),
      manifestThresholdFiles = manifestThreshold)
    t.create(Main.reposSchema, Seq("repo", "path"), 4, Main.reposRenameMap)
    t
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.orderBy(df.columns.map(c => col("`" + c + "`")).toSeq: _*)
      .collect().map(_.toString).toSeq

  test("format('graft-lake') load == LakeTable.read, schema included") {
    val t = newTable("bread")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 150)))
    val viaConnector = spark.read.format("graft-lake").option("path", t.root).load()
    assert(viaConnector.schema === t.read().schema)
    assert(sortedRows(viaConnector) === sortedRows(t.read()))
    // count(*) exercises the empty-projection buildScan shape
    assert(viaConnector.count() === t.read().count())
  }

  test("asOf option time-travels to the immutable snapshot") {
    val t = newTable("bread-asof")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 100)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(100, 200)))
    val old = spark.read.format("graft-lake")
      .option("path", t.root).option("asOf", "1").load()
    assert(sortedRows(old) === sortedRows(t.read(asOfSnapshot = Some(1))))
    assert(sortedRows(old) !== sortedRows(t.read())) // the table moved on
  }

  test("filters and projection prune through the connector correctly") {
    val t = newTable("bread-filter")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 150)))
    val full = t.read()
    val someRepo = full.select("repo").limit(1).collect()(0).getString(0)
    val viaConnector = spark.read.format("graft-lake").option("path", t.root).load()
      .filter(col("repo") === someRepo && col("commit").isNotNull)
      .select("repo", "path", "commit")
    val direct = full.filter(col("repo") === someRepo && col("commit").isNotNull)
      .select("repo", "path", "commit")
    assert(viaConnector.schema.fieldNames.toSeq === Seq("repo", "path", "commit"))
    assert(sortedRows(viaConnector) === sortedRows(direct))
  }

  test("changes=true reads the batch change feed, range and schema exact") {
    val t = newTable("bread-feed")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 100)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(100, 200)))
    val feed = spark.read.format("graft-lake")
      .option("path", t.root).option("changes", "true").load()
    assert(feed.schema === t.changes(-1, 2).schema)
    assert(sortedRows(feed) === sortedRows(t.changes(-1, 2)))
    val tail = spark.read.format("graft-lake")
      .option("path", t.root).option("changes", "true")
      .option("fromSnapshot", "1").option("toSnapshot", "2").load()
    assert(sortedRows(tail) === sortedRows(t.changes(1, 2)))
  }

  test("pure-SQL access: CREATE TEMPORARY VIEW ... USING graft-lake") {
    val t = newTable("bread-sql")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 120)))
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW lake_sql_v
                  USING `graft-lake` OPTIONS (path '${t.root}')""")
    val viaSql = spark.sql(
      "SELECT repo, count(*) AS n FROM lake_sql_v GROUP BY repo")
    val direct = t.read().groupBy("repo").agg(count(lit(1)).as("n"))
    assert(sortedRows(viaSql) === sortedRows(direct))
  }

  test("missing path / missing table fail loudly") {
    val noPath = intercept[IllegalArgumentException] {
      spark.read.format("graft-lake").load()
    }
    assert(noPath.getMessage.contains("path"))
    val noTable = intercept[IllegalArgumentException] {
      spark.read.format("graft-lake").option("path", tmpDir("bread-none")).load()
    }
    assert(noTable.getMessage.contains("create it first"))
  }

  test("meta=snapshots exposes history as a DataFrame (ids desc, lineage)") {
    val t = newTable("bread-hist")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 80)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(80, 160)))
    val hist = spark.read.format("graft-lake")
      .option("path", t.root).option("meta", "snapshots").load()
    val rows = hist.select("snapshot_id", "high_watermark").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L, 1L, 0L)) // newest first
    assert(rows.map(_.getLong(1)).toSeq === Seq(160L, 80L, -1L)) // create = -1
    // pure SQL + limit honored
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW lake_hist USING `graft-lake`
                  OPTIONS (path '${t.root}', meta 'snapshots', limit '2')""")
    assert(spark.table("lake_hist").count() === 2)
    val badMeta = intercept[IllegalArgumentException] {
      spark.read.format("graft-lake")
        .option("path", t.root).option("meta", "nope").load()
    }
    assert(badMeta.getMessage.contains("unknown meta"))
  }

  test("meta=snapshots: expired ids skipped, corrupt snapshot JSON fails LOUDLY") {
    val t = newTable("bread-hist-err")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 80)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(80, 160)))
    def hist() = spark.read.format("graft-lake")
      .option("path", t.root).option("meta", "snapshots").load()
      .select("snapshot_id").collect().map(_.getLong(0)).toSeq
    // expired history legitimately vanishes (FileNotFound -> skipped)
    t.expireSnapshots(keepLast = 1)
    assert(hist() === Seq(2L))
    // corrupt metadata must PROPAGATE, never read as "expired" (the old
    // blanket Try(...).toOption silently dropped it from the output)
    val p = java.nio.file.Paths.get(t.root, "meta", f"snapshot-${2L}%012d.json")
    java.nio.file.Files.write(p, "{not json".getBytes("UTF-8"))
    intercept[Exception] { hist() } // intercept fails the test if it succeeds
  }

  test("inline-snapshot tables report honest sizeInBytes -> dim joins auto-broadcast") {
    val t = newTable("bread-stats")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 60)))
    val dim = spark.read.format("graft-lake").option("path", t.root).load()
    val rel = dim.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation
    }.get
    // recorded snapshot bytes, not the "unknown = huge" default that
    // forbids auto-broadcast forever
    assert(rel.sizeInBytes > 0 && rel.sizeInBytes < 64L * 1024 * 1024)
    val facts = spark.range(1000).toDF("n")
      .withColumn("repo", concat(lit("repo-"), col("n") % 8))
    val plan = facts.join(dim, Seq("repo")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("batch WRITE: df.write.format('graft-lake').mode('append') applies, fenced") {
    // connector write == direct MergeEngine apply, and the LSN fence makes
    // a re-save of the same batch a no-op (batch exactly-once)
    val viaLib = newTable("bwrite-lib")
    MergeEngine.applyBatch(viaLib, ChangeDecoder.decode(lines(0, 120)))
    val viaConn = newTable("bwrite-conn")
    def save(): Unit = lines(0, 120).write.format("graft-lake")
      .option("path", viaConn.root).option("table", "repos")
      .mode("append").save()
    save()
    assert(sortedRows(viaConn.read()) === sortedRows(viaLib.read()))
    val snapAfterFirst = viaConn.currentSnapshot.get.snapshotId
    save() // replayed batch: every LSN below the watermark -> no new state
    assert(sortedRows(viaConn.read()) === sortedRows(viaLib.read()))
    assert(viaConn.currentSnapshot.get.snapshotId === snapAfterFirst)
  }

  test("batch WRITE rejects non-append modes and non-WAL schemas loudly") {
    val t = newTable("bwrite-reject")
    val overwrite = intercept[IllegalArgumentException] {
      lines(0, 10).write.format("graft-lake")
        .option("path", t.root).option("table", "repos")
        .mode("overwrite").save()
    }
    assert(overwrite.getMessage.contains("Append only"))
    val badSchema = intercept[IllegalArgumentException] {
      spark.range(3).toDF("value") // value: bigint, not string
        .write.format("graft-lake").option("path", t.root)
        .option("table", "repos").mode("append").save()
    }
    assert(badSchema.getMessage.contains("value: string"))
  }

  test("pinnedKeys: equality/IN conjuncts over ALL key columns route, else not") {
    import graft.sources.LakeRelation.{pinnedKeys => pk}
    val cols = Seq("repo", "path")
    // full equality pin (incl. And-nesting and a residual non-key filter)
    assert(pk(Array(EqualTo("repo", "r"), EqualTo("path", "p")), cols) ===
      Some(Seq(Map("repo" -> "r", "path" -> "p"))))
    assert(pk(Array(And(EqualTo("repo", "r"),
      And(EqualTo("path", "p"), IsNotNull("commit")))), cols) ===
      Some(Seq(Map("repo" -> "r", "path" -> "p"))))
    // IN expands (2 x 1 keys)
    assert(pk(Array(In("repo", Array("a", "b")), EqualTo("path", "p")), cols)
      .map(_.toSet) === Some(Set(
        Map("repo" -> "a", "path" -> "p"), Map("repo" -> "b", "path" -> "p"))))
    // multiple pins on one column intersect
    assert(pk(Array(In("repo", Array("a", "b")), EqualTo("repo", "a"),
      EqualTo("path", "p")), cols) ===
      Some(Seq(Map("repo" -> "a", "path" -> "p"))))
    // unpinned key column / contradiction / cap / range-only: no route
    assert(pk(Array(EqualTo("repo", "r")), cols).isEmpty)
    assert(pk(Array(EqualTo("repo", "a"), EqualTo("repo", "b"),
      EqualTo("path", "p")), cols).isEmpty)
    assert(pk(Array(In("repo", (1 to 300).map(i => s"r$i").toArray[Any]),
      EqualTo("path", "p")), cols).isEmpty)
    assert(pk(Array(GreaterThan("repo", "a"), EqualTo("path", "p")), cols).isEmpty)
    // null pin values never match a key
    assert(pk(Array(EqualTo("repo", null), EqualTo("path", "p")), cols).isEmpty)
  }

  test("point queries route to the pruned lookup with identical answers") {
    val t = newTable("bread-point")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 150)))
    val direct = t.read()
    val probe = direct.select("repo", "path").orderBy("repo", "path")
      .limit(3).collect().map(r => (r.getString(0), r.getString(1)))
    val conn = spark.read.format("graft-lake").option("path", t.root).load()
    // single-key equality (+ a residual non-key predicate)
    val (r0, p0) = probe(0)
    assert(sortedRows(conn.filter(col("repo") === r0 && col("path") === p0
        && col("commit").isNotNull)) ===
      sortedRows(direct.filter(col("repo") === r0 && col("path") === p0
        && col("commit").isNotNull)))
    // IN over repo (expands to multiple key combos)
    val repos = probe.map(_._1).distinct.toSeq
    assert(sortedRows(conn.filter(col("repo").isin(repos: _*)
        && col("path") === p0)) ===
      sortedRows(direct.filter(col("repo").isin(repos: _*)
        && col("path") === p0)))
    // a key pin that matches nothing returns empty, not an error
    assert(conn.filter(col("repo") === "no-such-repo"
      && col("path") === "nope").count() === 0)
  }

  test("connector works on DISTRIBUTED-manifest tables: state, point route, feed, stats") {
    // threshold 0 => every snapshot stores per-bucket manifest files behind
    // an O(buckets) root; the relation's root-only metadata, the routed
    // lookup's manifest resolution, and the stats fallback all differ
    val t = newTable("bread-dist", manifestThreshold = 0)
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 100)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(100, 200)))
    assert(new java.io.File(s"${t.root}/meta/manifests").exists(), "precondition")
    val conn = spark.read.format("graft-lake").option("path", t.root).load()
    assert(sortedRows(conn) === sortedRows(t.read()))
    // distributed snapshots carry no inline fileBytes: stats stay at the
    // huge default (never auto-broadcast a big table)
    val rel = conn.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation
    }.get
    assert(rel.sizeInBytes === spark.sessionState.conf.defaultSizeInBytes)
    // point route resolves root + touched manifests only, same answer
    val (r0, p0) = {
      val r = t.read().select("repo", "path").orderBy("repo", "path").head()
      (r.getString(0), r.getString(1))
    }
    assert(sortedRows(conn.filter(col("repo") === r0 && col("path") === p0)) ===
      sortedRows(t.read().filter(col("repo") === r0 && col("path") === p0)))
    // batch feed over distributed snapshots
    val feed = spark.read.format("graft-lake").option("path", t.root)
      .option("changes", "true").option("fromSnapshot", "1").load()
    assert(sortedRows(feed) === sortedRows(t.changes(1, 2)))
  }

  test("Filter -> Column translation: exact nodes forward, unknown drop safely") {
    val t = newTable("bread-xlate")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 50)))
    val df = t.read()
    def tr(f: Filter) = DataFrameRelation.toColumn(df, f)
    assert(tr(EqualTo("repo", "r")).isDefined)
    assert(tr(In("repo", Array("a", "b"))).isDefined)
    assert(tr(And(EqualTo("repo", "r"), IsNotNull("path"))).isDefined)
    // And forwards its one translatable side
    assert(tr(And(EqualTo("repo", "r"),
      AlwaysFalse)).isDefined === tr(EqualTo("repo", "r")).isDefined)
    // Or with an untranslatable side must NOT forward (would narrow wrongly)
    assert(tr(Or(EqualTo("repo", "r"), AlwaysFalse)).isEmpty)
    assert(tr(Not(AlwaysFalse)).isEmpty)
    // Not over an exactly-translatable child forwards...
    assert(tr(Not(EqualTo("repo", "r"))).isDefined)
    // ...but Not over a WEAKENED And must not: !(x) is STRONGER than
    // !(x && untranslatable) — pushed rows lost forever
    assert(tr(Not(And(EqualTo("repo", "r"), AlwaysFalse))).isEmpty)
    assert(tr(Not(Or(EqualTo("repo", "r"), AlwaysFalse))).isEmpty)
  }

  test("wrong option combinations fail loudly instead of silently ignoring") {
    val t = newTable("bread-opts")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 40)))
    // a feed range WITHOUT changes=true would return the ENTIRE table
    val strayRange = intercept[IllegalArgumentException] {
      spark.read.format("graft-lake").option("path", t.root)
        .option("fromSnapshot", "0").load()
    }
    assert(strayRange.getMessage.contains("no effect"))
    // asOf on a feed read would time-travel nothing
    val feedAsOf = intercept[IllegalArgumentException] {
      spark.read.format("graft-lake").option("path", t.root)
        .option("changes", "true").option("asOf", "1").load()
    }
    assert(feedAsOf.getMessage.contains("no effect"))
    val metaAsOf = intercept[IllegalArgumentException] {
      spark.read.format("graft-lake").option("path", t.root)
        .option("meta", "snapshots").option("asOf", "1").load()
    }
    assert(metaAsOf.getMessage.contains("no effect"))
  }
}
