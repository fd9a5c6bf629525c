package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.decode.ChangeDecoder

/**
 * Driver-verifiable CDC operator queries. The `events` parquet table serves
 * as a deterministic change log: `event_id` is the LSN, `user_id` the
 * primary key, and `event_type` maps onto wal2json kinds
 * (signup -> insert, error -> delete, otherwise update) — so every CDC
 * dataflow operator from SURVEY.md §2.1 has a DuckDB-expressible oracle over
 * the same parquet input.
 */
object CdcQueries {

  private def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")

  /** The decode/transcode fixtures pay heavy per-row work (JSON render +
    * parse, binary transcode) — the one profile the input-size-adaptive
    * spread (Tables.read) was measured to help; plain aggregation queries
    * over `events` stay on the bare scan (spread measured slower there). */
  private def eventsSpread(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "events", spread = true)

  private val kindCol = when(col("event_type") === "signup", "insert")
    .when(col("event_type") === "error", "delete")
    .otherwise("update")

  private val tblCol = when(col("user_id") % 3 === 0, "events_a").otherwise("events_b")

  private val kindSql =
    "CASE WHEN event_type='signup' THEN 'insert' WHEN event_type='error' THEN 'delete' ELSE 'update' END"
  private val tblSql = "CASE WHEN user_id % 3 = 0 THEN 'events_a' ELSE 'events_b' END"

  /** Render each event as a wal2json line (reference O7, serialize) —
    * the JSON then goes through the real decoder (O4). */
  private def walLines(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsSpread(spark, dir)
      .withColumn("kind", kindCol)
      .withColumn("tbl", tblCol)
    ev.select(to_json(struct(
      col("event_id").as("lsn"),
      (col("event_id") + 3000000000L).as("xid"),
      array(struct(
        col("kind"),
        lit("public").as("schema"),
        col("tbl").as("table"),
        when(col("kind") =!= "delete",
          array(lit("user_id"), lit("value"))).as("columnnames"),
        when(col("kind") =!= "delete",
          array(lit("bigint"), lit("double precision"))).as("columntypes"),
        when(col("kind") =!= "delete",
          array(col("user_id").cast("string"), col("value").cast("string")))
          .as("columnvalues"),
        when(col("kind") =!= "insert", struct(
          array(lit("user_id")).as("keynames"),
          array(lit("bigint")).as("keytypes"),
          array(col("user_id").cast("string")).as("keyvalues"))).as("oldkeys")
      )).as("change"))).as("value"))
  }

  /** TYPE-WIDENING evolution under the driver's gate: the first half of
    * the stream declares `cnt` as INTEGER (values fit int32) and is
    * applied + FULLY COMPACTED — so the narrow era lives in typed INT32
    * base parquet, not delta string-maps — then the second half declares
    * `cnt` BIGINT with values past 2^31 (the upstream `ALTER COLUMN TYPE`
    * moment). The schema widens in place, Spark 4's widening parquet
    * reads decode the INT32 files under the LongType read schema, and
    * DuckDB recomputes the keep-last state with BIGINT arithmetic. */
  def schemaWidening(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val ev = events(spark, dir).withColumn("kind", kindCol)
    val split = ev.agg(max(col("event_id"))).head().getLong(0) / 2
    def lines(narrow: Boolean) = {
      val part =
        if (narrow) ev.filter(col("event_id") <= split)
        else ev.filter(col("event_id") > split)
      val declared = if (narrow) "integer" else "bigint"
      val cnt =
        if (narrow) (col("event_id") % 1000000).cast("string")
        else (col("event_id") + 3000000000L).cast("string")
      part.select(to_json(struct(
        col("event_id").as("lsn"),
        (col("event_id") + 3000000000L).as("xid"),
        array(struct(
          col("kind"), lit("public").as("schema"), lit("t").as("table"),
          when(col("kind") =!= "delete",
            array(lit("user_id"), lit("cnt"))).as("columnnames"),
          when(col("kind") =!= "delete",
            array(lit("bigint"), lit(declared))).as("columntypes"),
          when(col("kind") =!= "delete",
            array(col("user_id").cast("string"), cnt)).as("columnvalues"),
          when(col("kind") =!= "insert", struct(
            array(lit("user_id")).as("keynames"),
            array(lit("bigint")).as("keytypes"),
            array(col("user_id").cast("string")).as("keyvalues"))).as("oldkeys")
        )).as("change"))).as("value"))
    }
    val t = new graft.lake.LakeTable(spark,
      graft.util.TempDirs.scratch("graft-cdc-widen"))
    t.create(StructType(Seq(
      StructField("user_id", LongType),
      StructField("cnt", IntegerType))), Seq("user_id"), nBuckets = 8)
    graft.apply.MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(narrow = true)))
    graft.apply.MergeEngine.compactAll(t) // narrow era into TYPED INT32 base files
    graft.apply.MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(narrow = false)))
    t.read().select(col("user_id"), col("cnt")).orderBy("user_id")
  }

  val schemaWideningSql: String =
    s"""WITH ranked AS (
       |  SELECT user_id,
       |    CAST(CASE WHEN event_id <= (SELECT CAST(max(event_id) // 2 AS BIGINT) FROM events)
       |      THEN event_id % 1000000
       |      ELSE event_id + 3000000000 END AS BIGINT) AS cnt,
       |    $kindSql AS kind,
       |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
       |  FROM events)
       |SELECT user_id, cnt FROM ranked WHERE rn = 1 AND kind <> 'delete'
       |ORDER BY user_id""".stripMargin

  /** O4+O7: serialize -> decode roundtrip through the real ChangeDecoder. */
  def decodeRoundtrip(spark: SparkSession, dir: String): DataFrame =
    ChangeDecoder.decode(walLines(spark, dir))
      .select(
        col("lsn"), col("xid"), col("kind"), col("table").as("tbl"),
        ChangeDecoder.keyValue("user_id").cast("long").as("key"),
        when(col("kind") =!= "delete",
          ChangeDecoder.columnValue("value").cast("double")).as("val"))
      .orderBy("lsn")

  val decodeRoundtripSql: String =
    s"""SELECT event_id AS lsn, event_id + 3000000000 AS xid, $kindSql AS kind,
       |  $tblSql AS tbl, user_id AS key,
       |  CASE WHEN $kindSql = 'delete' THEN NULL ELSE value END AS val
       |FROM events ORDER BY lsn""".stripMargin

  /** Shared body of the pgoutput decode queries: each event rendered as
    * its transaction's pgoutput BINARY message sequence (`frame` decides
    * the protocol — v1 whole-txn vs v2 streamed), transcoded to the
    * wal2json-parity line, then decoded by the SAME ChangeDecoder and
    * projected exactly like [[decodeRoundtrip]] — so the DuckDB oracle is
    * IDENTICAL for all four decode queries. Distributed: each partition
    * transcodes its own rows; no driver-side loop. */
  private def decodeViaPgoutput(spark: SparkSession, dir: String, relOid: Int)(
      frame: (Long, graft.decode.Pgoutput.Relation, graft.decode.Pgoutput.Message,
              Long) => Seq[graft.decode.Pgoutput.Message]): DataFrame = {
    import spark.implicits._
    import graft.decode.Pgoutput
    import graft.decode.Pgoutput._
    val lines = eventsSpread(spark, dir)
      .withColumn("kind", kindCol)
      .withColumn("tbl", tblCol)
      .select(col("event_id"), col("kind"), col("tbl"), col("user_id"),
        col("value").cast("string"))
      .as[(Long, String, String, Long, String)]
      .mapPartitions { it =>
        it.map { case (lsn, kind, tbl, uid, v) =>
          val rel = Relation(relOid, "public", tbl, 'd'.toByte, IndexedSeq(
            RelationColumn(1, "user_id", 20, -1),    // bigint key
            RelationColumn(0, "value", 701, -1)))    // double precision
          val vVal: TupleValue = if (v == null) NullValue else TextValue(v)
          val newT = IndexedSeq[TupleValue](TextValue(uid.toString), vVal)
          val keyT = IndexedSeq[TupleValue](TextValue(uid.toString), NullValue)
          val dml = kind match {
            case "insert" => Insert(relOid, newT)
            case "delete" => Delete(relOid, 'K', keyT)
            case _ => Update(relOid, Some('K'), Some(keyT), newT)
          }
          val t = new graft.decode.PgoutputTranscoder
          frame(lsn + 3000000000L, rel, dml, lsn)
            .flatMap(m => t.feed(Pgoutput.write(m))).head
        }
      }.toDF("value")
    ChangeDecoder.decode(lines)
      .select(
        col("lsn"), col("xid"), col("kind"), col("table").as("tbl"),
        ChangeDecoder.keyValue("user_id").cast("long").as("key"),
        when(col("kind") =!= "delete",
          ChangeDecoder.columnValue("value").cast("double")).as("val"))
      .orderBy("lsn")
  }

  /** O4 through the SECOND plugin grammar (one whole txn per event,
    * Relation re-sent per txn, which pgoutput permits) — the
    * driver-verified half of the plugin-parity story (PgoutputSpec pins
    * the grammar level). */
  def decodePgoutput(spark: SparkSession, dir: String): DataFrame =
    decodeViaPgoutput(spark, dir, relOid = 777) { (xid, rel, dml, lsn) =>
      import graft.decode.Pgoutput._
      Seq(Begin(lsn, 0L, xid), rel, dml, Commit(0, lsn, lsn + 1, 0L))
    }

  /** O4 through pgoutput PROTOCOL V2: each transaction shipped as a
    * STREAMED in-progress txn (Stream Start / xid-prefixed Relation+DML /
    * Stream Stop / Stream Commit — PostgreSQL 14+ larger-than-memory txn
    * streaming) — the driver-verified half of the v2 parity story
    * (PgoutputSpec pins the interleaving/abort/spill semantics). */
  def decodePgoutputStreamed(spark: SparkSession, dir: String): DataFrame =
    decodeViaPgoutput(spark, dir, relOid = 778) { (xid, rel, dml, lsn) =>
      import graft.decode.Pgoutput._
      Seq(StreamStart(xid, firstSegment = true),
        Streamed(xid, rel), Streamed(xid, dml), StreamStop,
        StreamCommit(xid, 0, lsn, lsn + 1, 0L))
    }

  /** O4 through the THIRD plugin grammar — wal2json FORMAT-VERSION 2
    * (one document per ACTION: B / I / U / D / C lines, no positions
    * in-band): each event rendered as its transaction's v2 action
    * sequence, folded through the real [[graft.decode.Wal2JsonV2Transcoder]]
    * with the position spliced at the boundary (WalEnvelope — the same
    * path live v2 ingest takes), then decoded by the SAME ChangeDecoder
    * and projected exactly like [[decodeRoundtrip]] — so the DuckDB
    * oracle is IDENTICAL for all four decode queries. */
  def decodeWal2JsonV2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lines = eventsSpread(spark, dir)
      .withColumn("kind", kindCol)
      .withColumn("tbl", tblCol)
      .select(col("event_id"), col("kind"), col("tbl"), col("user_id"),
        col("value").cast("string"))
      .as[(Long, String, String, Long, String)]
      .mapPartitions { it =>
        val tr = new graft.decode.Wal2JsonV2Transcoder
        it.map { case (lsn, kind, tbl, uid, v) =>
          def c(n: String, t: String, value: String) =
            s"""{"name":"$n","type":"$t","value":$value}"""
          // numbers ride unquoted — EXCEPT NaN/±Infinity, legal float
          // text but not legal bare JSON tokens (wal2json quotes them;
          // same rule as the pgoutput renderValue)
          val vTok =
            if (v == null) "null"
            else if (v == "NaN" || v == "Infinity" || v == "-Infinity")
              "\"" + v + "\""
            else v
          val cols = s"${c("user_id", "bigint", uid.toString)}," +
            c("value", "double precision", vTok)
          val ident = s""","identity":[${c("user_id", "bigint", uid.toString)}]"""
          val action = kind match {
            case "insert" =>
              s"""{"action":"I","schema":"public","table":"$tbl","columns":[$cols]}"""
            case "delete" =>
              s"""{"action":"D","schema":"public","table":"$tbl"$ident}"""
            case _ =>
              s"""{"action":"U","schema":"public","table":"$tbl","columns":[$cols]$ident}"""
          }
          graft.sources.replication.WalEnvelope.foldOne(
            Seq(s"""{"action":"B","xid":${lsn + 3000000000L}}""", action,
              """{"action":"C"}"""), tr.feed, lsn)
        }
      }.toDF("value")
    ChangeDecoder.decode(lines)
      .select(
        col("lsn"), col("xid"), col("kind"), col("table").as("tbl"),
        ChangeDecoder.keyValue("user_id").cast("long").as("key"),
        when(col("kind") =!= "delete",
          ChangeDecoder.columnValue("value").cast("double")).as("val"))
      .orderBy("lsn")
  }

  /** O5: relevant-table predicate inside the decoder. */
  def tableFilter(spark: SparkSession, dir: String): DataFrame =
    ChangeDecoder.decode(walLines(spark, dir), relevantTables = Set("events_a"))
      .select(col("lsn"), col("kind"),
        ChangeDecoder.keyValue("user_id").cast("long").as("key"))
      .orderBy("lsn")

  val tableFilterSql: String =
    s"""SELECT event_id AS lsn, $kindSql AS kind, user_id AS key
       |FROM events WHERE user_id % 3 = 0 ORDER BY lsn""".stripMargin

  /** Keep-last-per-key dedup — the heart of LSN-ordered MERGE (declarative
    * max_by => map-side partial aggregation; see MergeEngine). */
  def dedupKeepLast(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("user_id"))
      // tie-break FULLY: event_id is unique by construction, but max_by
      // on a bare key picks an arbitrary row on duplicates — a flaky
      // cross-engine compare waiting to happen (the oracle row_number
      // carries the same full ordering)
      .agg(max_by(
        struct(col("event_id"), col("event_type"), col("value")),
        struct(col("event_id"), col("event_type"), col("value"))).as("w"))
      .select(col("user_id"), col("w.event_id").as("last_lsn"),
        col("w.event_type").as("last_type"), col("w.value").as("last_value"))
      .orderBy("user_id")

  val dedupKeepLastSql: String =
    """SELECT user_id, event_id AS last_lsn, event_type AS last_type, value AS last_value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |        ORDER BY event_id DESC, event_type DESC, value DESC) rn
      |      FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** O17: apply semantics — final table state after replaying the log
    * (keep-last per key, deletes remove the row). */
  def mergeFinalState(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("kind", kindCol)
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("event_id"), col("kind"), col("value")),
        struct(col("event_id"), col("kind"), col("value"))).as("w"))
      .filter(col("w.kind") =!= "delete")
      .select(col("user_id"), col("w.event_id").as("last_lsn"),
        col("w.kind").as("kind"), col("w.value").as("value"))
      .orderBy("user_id")

  val mergeFinalStateSql: String =
    s"""SELECT user_id, event_id AS last_lsn, $kindSql AS kind, value
       |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
       |        ORDER BY event_id DESC, $kindSql DESC, value DESC) rn
       |      FROM events) WHERE rn = 1 AND $kindSql <> 'delete'
       |ORDER BY user_id""".stripMargin

  /** The lake table as a CDC SOURCE, driven through the REAL engine: the
    * events WAL (walLines -> ChangeDecoder) applied to a throwaway lake
    * table in TWO batches split at the stream's midpoint LSN, then the
    * CHANGE DATA FEED of the second commit ([[graft.lake.LakeTable.changes]]
    * — reads ONLY that commit's recorded delta files, no table scan) — the
    * net keep-last change per key including delete tombstones. The DuckDB
    * oracle recomputes the same net changes relationally over the tail
    * half of the stream. */
  def changeFeed(spark: SparkSession, dir: String): DataFrame = {
    val (t, mid) = twoCommitTable(spark, dir, "graft-cdc-feed")
    val end = t.currentSnapshot.get.snapshotId
    t.changes(mid, end)
      .select(col("user_id").as("key"), col("_lsn").as("lsn"),
        col("_kind").as("kind"), col("value").as("val"))
      .orderBy("key")
  }

  val changeFeedSql: String =
    s"""SELECT user_id AS key, event_id AS lsn, $kindSql AS kind,
       |  CASE WHEN $kindSql = 'delete' THEN NULL ELSE value END AS val
       |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
       |        ORDER BY event_id DESC) rn
       |      FROM events
       |      WHERE event_id > (SELECT CAST(max(event_id) // 2 AS BIGINT)
       |                        FROM events))
       |WHERE rn = 1 ORDER BY key""".stripMargin

  /** Shared setup for the streaming-feed queries: the events WAL applied to
    * a throwaway lake table in TWO commits split at the midpoint LSN.
    * Returns (table, mid-snapshot id). */
  private def twoCommitTable(spark: SparkSession, dir: String, prefix: String,
                             betweenCommits: (graft.lake.LakeTable, DataFrame, Long) => Unit =
                               (_, _, _) => ()): (graft.lake.LakeTable, Long) = {
    import org.apache.spark.sql.types._
    val split = events(spark, dir).agg(max(col("event_id"))).head().getLong(0) / 2
    val t = new graft.lake.LakeTable(spark, graft.util.TempDirs.scratch(prefix))
    t.create(StructType(Seq(
      StructField("user_id", LongType),
      StructField("value", DoubleType))), Seq("user_id"), nBuckets = 8)
    val decoded = ChangeDecoder.decode(walLines(spark, dir))
    graft.apply.MergeEngine.applyBatch(t, decoded.filter(col("lsn") <= split))
    val mid = t.currentSnapshot.get.snapshotId
    betweenCommits(t, decoded, split)
    graft.apply.MergeEngine.applyBatch(t, decoded.filter(col("lsn") > split))
    (t, mid)
  }

  /** The change feed consumed through the STREAMING source
    * (`readStream.format("graft-changes")`, snapshot-id offsets,
    * Trigger.AvailableNow) instead of the batch [[changeFeed]] path — same
    * net changes, so the DuckDB oracle is IDENTICAL. Proves the streaming
    * surface end-to-end under the driver's gate. */
  def changeFeedStreamed(spark: SparkSession, dir: String): DataFrame = {
    val (t, mid) = twoCommitTable(spark, dir, "graft-cdc-feedstream")
    val qn = s"cdc_feed_stream_sink_$mid"
    val q = spark.readStream.format("graft-changes")
      .option("path", t.root)
      .option("fromSnapshot", mid)
      .option("maxSnapshotsPerTrigger", 1)
      .load()
      .writeStream.format("memory").queryName(qn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(qn)
      .select(col("user_id").as("key"), col("_lsn").as("lsn"),
        col("_kind").as("kind"), col("value").as("val"))
      .orderBy("key")
  }

  /** Full table→table CDC replication through the engine's own feed:
    * WAL → primary lake table (two commits) → `graft-changes` stream →
    * [[graft.streaming.Mirror]] LSN-fenced apply → mirror table. Output is
    * the MIRROR's final state; the oracle recomputes the keep-last
    * non-deleted state relationally — the cascade must converge to exactly
    * the state a direct apply would have produced. */
  def feedMirror(spark: SparkSession, dir: String): DataFrame = {
    val (t, _) = twoCommitTable(spark, dir, "graft-cdc-mirrorsrc")
    val mirrorRoot = graft.util.TempDirs.scratch("graft-cdc-mirrordst")
    val q = graft.streaming.Mirror.follow(spark, t.root, mirrorRoot,
      graft.util.TempDirs.scratch("graft-cdc-mirrorckpt"))
    q.awaitTermination()
    new graft.lake.LakeTable(spark, mirrorRoot).read()
      .select(col("user_id"), col("value"))
      .orderBy("user_id")
  }

  val feedMirrorSql: String =
    s"""SELECT user_id, value
       |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
       |        ORDER BY event_id DESC) rn
       |      FROM events) WHERE rn = 1 AND $kindSql <> 'delete'
       |ORDER BY user_id""".stripMargin

  /** BOOTSTRAP replication of an EXISTING, retention-pruned table — the
    * deployment case plain [[feedMirror]] cannot serve: the source's early
    * snapshots are EXPIRED before the mirror exists, so a full-history
    * feed replay would fail at the retention horizon (and following from
    * "current" would silently skip every pre-existing row).
    * [[graft.streaming.Mirror.bootstrap]] clones at a pinned snapshot and
    * follows the feed from there; the post-pin commit then flows through
    * the same checkpoint. Final state == keep-last over the WHOLE stream,
    * so the oracle is [[feedMirrorSql]] verbatim. */
  def mirrorBootstrap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val decoded = ChangeDecoder.decode(walLines(spark, dir))
    val maxId = events(spark, dir).agg(max(col("event_id"))).head().getLong(0)
    val (c1, c2) = (maxId / 3, 2 * maxId / 3)
    val t = new graft.lake.LakeTable(spark,
      graft.util.TempDirs.scratch("graft-cdc-bootsrc"))
    t.create(StructType(Seq(
      StructField("user_id", LongType),
      StructField("value", DoubleType))), Seq("user_id"), nBuckets = 8)
    graft.apply.MergeEngine.applyBatch(t, decoded.filter(col("lsn") <= c1))
    graft.apply.MergeEngine.applyBatch(t,
      decoded.filter(col("lsn") > c1 && col("lsn") <= c2))
    t.expireSnapshots(keepLast = 1) // history below the pin is GONE
    val mirrorRoot = graft.util.TempDirs.scratch("graft-cdc-bootdst")
    val ckpt = graft.util.TempDirs.scratch("graft-cdc-bootckpt")
    graft.streaming.Mirror.bootstrap(spark, t.root, mirrorRoot, ckpt)
      .awaitTermination()
    // commits landing AFTER the bootstrap flow through the same checkpoint
    graft.apply.MergeEngine.applyBatch(t, decoded.filter(col("lsn") > c2))
    graft.streaming.Mirror.bootstrap(spark, t.root, mirrorRoot, ckpt)
      .awaitTermination()
    new graft.lake.LakeTable(spark, mirrorRoot).read()
      .select(col("user_id"), col("value"))
      .orderBy("user_id")
  }

  /** Batch READ connector (`spark.read.format("graft-lake")` /
    * `CREATE TEMPORARY VIEW ... USING graft-lake`): the two-commit lake
    * table read back through PURE SQL — current merged state AND `asOf`
    * time travel to the mid-stream snapshot, tagged by era. The oracle
    * recomputes both keep-last non-deleted states relationally (the `mid`
    * era over the first half of the stream only), so the connector's
    * merged view, snapshot resolution, and time travel are all under the
    * DuckDB gate. */
  def batchReadConnector(spark: SparkSession, dir: String): DataFrame = {
    val (t, mid) = twoCommitTable(spark, dir, "graft-cdc-bread")
    def era(tag: String, asOf: Option[Long]): DataFrame = {
      val vn = s"graft_bread_$tag"
      // single quotes in the scratch path must not break the spliced DDL
      val opts = s"path '${t.root.replace("'", "''")}'" +
        asOf.map(id => s", asOf '$id'").getOrElse("")
      spark.sql(
        s"CREATE OR REPLACE TEMPORARY VIEW $vn USING `graft-lake` OPTIONS ($opts)")
      spark.table(vn).select(lit(tag).as("era"), col("user_id"), col("value"))
    }
    era("final", None).unionByName(era("mid", Some(mid)))
      .orderBy("era", "user_id")
  }

  val batchReadConnectorSql: String =
    s"""WITH halves AS (
       |  SELECT 'final' AS era, * FROM events
       |  UNION ALL
       |  SELECT 'mid', * FROM events
       |  WHERE event_id <= (SELECT CAST(max(event_id) // 2 AS BIGINT) FROM events)),
       |ranked AS (
       |  SELECT era, user_id, value, $kindSql AS kind,
       |    row_number() OVER (PARTITION BY era, user_id ORDER BY event_id DESC) rn
       |  FROM halves)
       |SELECT era, user_id, value FROM ranked
       |WHERE rn = 1 AND kind <> 'delete' ORDER BY era, user_id""".stripMargin

  /** SINGLE-PASS MULTI-TABLE APPLY through the REAL engine: the mixed
    * events_a/events_b WAL (the reference's single slot carries EVERY
    * table — SlotReaderKinesisWriter.java:281-287) pushed through
    * [[graft.streaming.CdcPipeline.processBatch]] with TWO lake-table
    * targets — the demux path decodes the batch EXACTLY ONCE, writes it
    * partitioned by table, and fans out per-table LSN-fenced MERGEs.
    * Output is the union of both tables' final states tagged by table;
    * the oracle recomputes keep-last non-deleted state per routed table. */
  def multiTableApply(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("value", DoubleType)))
    def mk(name: String) = graft.streaming.TableTarget(name,
      new graft.lake.LakeTable(spark,
        graft.util.TempDirs.scratch(s"graft-cdc-mt-$name")),
      schema, Seq("user_id"), nBuckets = 8)
    val targets = Seq(mk("events_a"), mk("events_b"))
    val ckpt = graft.util.TempDirs.scratch("graft-cdc-mt-ckpt")
    val pipe = new graft.streaming.CdcPipeline(spark, ckpt, ckpt,
      targets, Set("events_a", "events_b"))
    pipe.processBatch(walLines(spark, dir), 0L)
    targets.map(t => t.table.read()
        .select(lit(t.name).as("tbl"), col("user_id"), col("value")))
      .reduce(_ union _)
      .orderBy("tbl", "user_id")
  }

  val multiTableSql: String =
    s"""SELECT $tblSql AS tbl, user_id, value
       |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
       |        ORDER BY event_id DESC) rn
       |      FROM events) WHERE rn = 1 AND $kindSql <> 'delete'
       |ORDER BY tbl, user_id""".stripMargin

  /** BUCKET-COUNT EVOLUTION through the REAL engine: the events WAL
    * applied in two commits with a [[graft.apply.MergeEngine.rebucket]]
    * (8 -> 16) between them, PLUS a full-prefix crash replay right after
    * the rebucket — which must no-op against the exact post-rebucket
    * watermarks (base rows carry no LSN, so a leaked replay event would
    * REGRESS its row to the older value, and a deleted key would
    * resurrect). Output is the final merged state; the oracle is the
    * plain relational keep-last non-deleted state, so any watermark leak
    * or bucket misroute fails the compare. */
  def rebucketState(spark: SparkSession, dir: String): DataFrame = {
    val (t, _) = twoCommitTable(spark, dir, "graft-cdc-rebucket",
      betweenCommits = (t, decoded, split) => {
        graft.apply.MergeEngine.rebucket(t, 16)
        // full-prefix crash replay: must no-op against the exact
        // post-rebucket watermarks (the oracle catches any leak)
        graft.apply.MergeEngine.applyBatch(t, decoded.filter(col("lsn") <= split))
      })
    t.read().select(col("user_id"), col("value")).orderBy("user_id")
  }

  /** PARTIAL-UPDATE (unchanged-TOAST) semantics through the REAL engine:
    * the events WAL re-rendered so UPDATE tuples deterministically OMIT
    * columns — `value` only when `event_id` is even, `note` only when
    * `event_id % 3 == 0` (PostgreSQL never re-sends an unchanged TOASTed
    * value; wal2json drops it from `columnnames`) — decoded by the real
    * ChangeDecoder and applied in TWO commits to a `partialUpdates` lake
    * table, so the final state crosses base rows, older deltas, and the
    * in-batch overlay. The DuckDB oracle resolves each column to its
    * latest CARRIED value no older than the key's latest barrier
    * (insert/delete), on live keys only — exactly the overlay contract. */
  def partialUpdateState(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val split = events(spark, dir).agg(max(col("event_id"))).head().getLong(0) / 2
    val t = new graft.lake.LakeTable(spark,
      graft.util.TempDirs.scratch("graft-cdc-partial"))
    t.create(StructType(Seq(
      StructField("user_id", LongType),
      StructField("value", DoubleType),
      StructField("note", StringType))), Seq("user_id"), nBuckets = 8,
      partialUpdates = true)
    val ev = eventsSpread(spark, dir)
      .withColumn("kind", kindCol)
      .withColumn("note", concat(lit("n"), col("event_id")))
      .withColumn("has_value", col("kind") === "insert" || col("event_id") % 2 === 0)
      .withColumn("has_note", col("kind") === "insert" || col("event_id") % 3 === 0)
    val entries = array(
      struct(lit("user_id").as("n"), lit("bigint").as("t"),
        col("user_id").cast("string").as("v"), lit(true).as("p")),
      struct(lit("value").as("n"), lit("double precision").as("t"),
        col("value").cast("string").as("v"), col("has_value").as("p")),
      struct(lit("note").as("n"), lit("text").as("t"),
        col("note").as("v"), col("has_note").as("p")))
    val present = filter(entries, _.getField("p"))
    val lines = ev.select(to_json(struct(
      col("event_id").as("lsn"),
      (col("event_id") + 3000000000L).as("xid"),
      array(struct(
        col("kind"),
        lit("public").as("schema"),
        lit("events_p").as("table"),
        when(col("kind") =!= "delete",
          transform(present, _.getField("n"))).as("columnnames"),
        when(col("kind") =!= "delete",
          transform(present, _.getField("t"))).as("columntypes"),
        when(col("kind") =!= "delete",
          transform(present, _.getField("v"))).as("columnvalues"),
        when(col("kind") =!= "insert", struct(
          array(lit("user_id")).as("keynames"),
          array(lit("bigint")).as("keytypes"),
          array(col("user_id").cast("string")).as("keyvalues"))).as("oldkeys")
      )).as("change"))).as("value"))
    val decoded = ChangeDecoder.decode(lines)
    graft.apply.MergeEngine.applyBatch(t, decoded.filter(col("lsn") <= split))
    graft.apply.MergeEngine.applyBatch(t, decoded.filter(col("lsn") > split))
    t.read().orderBy("user_id")
  }

  val partialUpdateSql: String =
    s"""WITH ev AS (
       |  SELECT event_id AS lsn, user_id, $kindSql AS kind, value,
       |    'n' || CAST(event_id AS VARCHAR) AS note,
       |    ($kindSql = 'insert' OR event_id % 2 = 0) AS has_value,
       |    ($kindSql = 'insert' OR event_id % 3 = 0) AS has_note
       |  FROM events),
       |bar AS (
       |  SELECT user_id,
       |    COALESCE(MAX(lsn) FILTER (WHERE kind <> 'update'), -1) AS bar_lsn,
       |    ARG_MAX(kind, lsn) AS last_kind
       |  FROM ev GROUP BY user_id),
       |vals AS (
       |  -- struct-wrapped ARG_MAX: a bare ARG_MAX skips NULL arguments,
       |  -- which would resurrect an older value past an explicitly-carried
       |  -- SQL NULL — the engine's contract is explicit-null-WINS
       |  SELECT e.user_id,
       |    (ARG_MAX({'x': e.value}, e.lsn) FILTER (WHERE e.has_value)).x AS value,
       |    (ARG_MAX({'x': e.note}, e.lsn) FILTER (WHERE e.has_note)).x AS note
       |  FROM ev e JOIN bar b USING (user_id)
       |  WHERE e.kind <> 'delete' AND e.lsn >= b.bar_lsn
       |  GROUP BY e.user_id)
       |SELECT b.user_id, v.value, v.note
       |FROM bar b JOIN vals v USING (user_id)
       |WHERE b.last_kind <> 'delete'
       |ORDER BY user_id""".stripMargin

  /** Per-batch lineage metrics (north rule: per-partition lineage). */
  def lineageStats(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("kind", kindCol)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("min_lsn"),
        max(col("event_id")).as("max_lsn"),
        countDistinct(col("user_id")).as("n_keys"))
      .orderBy("kind")

  val lineageStatsSql: String =
    s"""SELECT $kindSql AS kind, count(*) AS n_events, min(event_id) AS min_lsn,
       |  max(event_id) AS max_lsn, count(DISTINCT user_id) AS n_keys
       |FROM events GROUP BY 1 ORDER BY kind""".stripMargin

  /** O10: per-partition LSN high watermarks (key-hash bucketed). */
  def bucketWatermarks(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      // % (sign-preserving) on BOTH engines — pmod is always non-negative
      // while DuckDB % keeps the dividend's sign: a negative key would get
      // different buckets. The lake's real bucketing stays pmod (storage
      // wants non-negative); this query's contract is oracle parity.
      .withColumn("bucket", (col("user_id") % 8).cast("int"))
      .groupBy(col("bucket"))
      .agg(max(col("event_id")).as("high_watermark"),
        count(lit(1)).as("n_events"))
      .orderBy("bucket")

  val bucketWatermarksSql: String =
    """SELECT CAST(user_id % 8 AS INT) AS bucket, max(event_id) AS high_watermark,
      |  count(*) AS n_events
      |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin

  /** O6: empty-transaction elision — txns with zero relevant changes vanish. */
  def txnElision(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      // `div` = exact 64-bit truncating division, the semantics DuckDB's
      // integer `//` has (measured: both truncate toward zero). Double
      // division rounds past 2^53 — wrong txn grouping for large LSNs.
      .withColumn("txn_id", expr("event_id div 10"))
      .groupBy(col("txn_id"))
      .agg(sum(when(col("user_id") % 3 === 0, 1L).otherwise(0L)).as("n_relevant"))
      .filter(col("n_relevant") > 0)
      .orderBy("txn_id")

  val txnElisionSql: String =
    """SELECT CAST(event_id // 10 AS BIGINT) AS txn_id,
      |  CAST(sum(CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_relevant
      |FROM events GROUP BY 1 HAVING n_relevant > 0 ORDER BY txn_id""".stripMargin

  /** Intra-transaction ordering: (lsn, seq) total order via sort_array +
    * posexplode (the engine's seq assignment, SURVEY.md §1.4). */
  def intraTxnSeq(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      // `div` = exact 64-bit truncating division, the semantics DuckDB's
      // integer `//` has (measured: both truncate toward zero). Double
      // division rounds past 2^53 — wrong txn grouping for large LSNs.
      .withColumn("txn_id", expr("event_id div 10"))
      .groupBy(col("txn_id"))
      .agg(sort_array(collect_list(col("event_id"))).as("evs"))
      .select(col("txn_id"), posexplode(col("evs")).as(Seq("seq", "lsn")))
      .orderBy("txn_id", "seq")

  val intraTxnSeqSql: String =
    """SELECT CAST(event_id // 10 AS BIGINT) AS txn_id,
      |  CAST(row_number() OVER (PARTITION BY event_id // 10 ORDER BY event_id) - 1 AS INT) AS seq,
      |  event_id AS lsn
      |FROM events ORDER BY txn_id, seq""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "cdc_decode_roundtrip" -> (decodeRoundtrip _, decodeRoundtripSql),
    "cdc_decode_pgoutput" -> (decodePgoutput _, decodeRoundtripSql),
    "cdc_decode_pgoutput_streamed" -> (decodePgoutputStreamed _, decodeRoundtripSql),
    "cdc_decode_wal2json_v2" -> (decodeWal2JsonV2 _, decodeRoundtripSql),
    "cdc_table_filter" -> (tableFilter _, tableFilterSql),
    "cdc_dedup_keeplast" -> (dedupKeepLast _, dedupKeepLastSql),
    "cdc_merge_final_state" -> (mergeFinalState _, mergeFinalStateSql),
    "cdc_multi_table" -> (multiTableApply _, multiTableSql),
    "cdc_batch_read" -> (batchReadConnector _, batchReadConnectorSql),
    "cdc_change_feed" -> (changeFeed _, changeFeedSql),
    "cdc_change_feed_streamed" -> (changeFeedStreamed _, changeFeedSql),
    "cdc_feed_mirror" -> (feedMirror _, feedMirrorSql),
    // bootstrap converges to the SAME final state as the plain mirror —
    // what it adds is surviving the EXPIRED early history the fixture
    // forces before the mirror exists
    "cdc_mirror_bootstrap" -> (mirrorBootstrap _, feedMirrorSql),
    // rebucket converges to the SAME final state as a straight apply, so
    // its oracle is the mirror query's keep-last non-deleted state
    "cdc_rebucket" -> (rebucketState _, feedMirrorSql),
    "cdc_partial_update" -> (partialUpdateState _, partialUpdateSql),
    "cdc_schema_widening" -> (schemaWidening _, schemaWideningSql),
    "cdc_lineage_stats" -> (lineageStats _, lineageStatsSql),
    "cdc_bucket_watermarks" -> (bucketWatermarks _, bucketWatermarksSql),
    "cdc_txn_elision" -> (txnElision _, txnElisionSql),
    "cdc_intra_txn_seq" -> (intraTxnSeq _, intraTxnSeqSql))
}
