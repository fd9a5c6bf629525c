package graft

import org.apache.spark.sql.functions._
import graft.decode.{ChangeDecoder, Pgoutput, PgoutputTranscoder}
import graft.decode.Pgoutput._
import graft.gen.{ChangeStreamGen, GenConfig, PgoutputGen}
import graft.sources.replication._

/**
 * The second-plugin decode path (pgoutput, binary) — codec roundtrip,
 * transcoder semantics, and the headline PARITY contract: the same
 * logical stream through the wal2json grammar and through the pgoutput
 * transcoder yields IDENTICAL decoded change-event rows, including
 * mid-stream schema evolution (additive column + rename eras arriving as
 * re-sent Relation messages).
 */
class PgoutputSpec extends SparkSpec {

  test("binary codec: every message type roundtrips write -> parse") {
    val rel = Relation(1234, "public", "repos", 'd'.toByte, IndexedSeq(
      RelationColumn(1, "id", 23, -1),
      RelationColumn(0, "name", 1043, 54), // varchar(50)
      RelationColumn(0, "price", 1700, (10 << 16 | 2) + 4), // numeric(10,2)
      RelationColumn(0, "ok", 16, -1),
      RelationColumn(0, "blob", 17, -1)))
    val msgs: Seq[Message] = Seq(
      Begin(987654321L, 1699999999000000L, 3000000005L), // 64-bit-range xid
      rel,
      Insert(1234, IndexedSeq(TextValue("7"), TextValue("naïve \"x\"\n"),
        TextValue("12.50"), TextValue("t"), NullValue)),
      Update(1234, Some('K'),
        Some(IndexedSeq(TextValue("7"), NullValue, NullValue, NullValue, NullValue)),
        IndexedSeq(TextValue("7"), TextValue("y"), TextValue("0.99"),
          TextValue("f"), UnchangedToast)),
      Update(1234, None, None, IndexedSeq(TextValue("7"), TextValue("z"),
        NullValue, TextValue("t"), NullValue)),
      Delete(1234, 'K', IndexedSeq(TextValue("7"), NullValue, NullValue,
        NullValue, NullValue)),
      Delete(1234, 'O', IndexedSeq(TextValue("7"), TextValue("y"),
        TextValue("0.99"), TextValue("f"), NullValue)),
      Commit(0, 987654322L, 987654323L, 1699999999000001L),
      Skipped('Y'))
    msgs.foreach { m =>
      assert(Pgoutput.parse(Pgoutput.write(m)) === m, m.toString)
    }
  }

  test("malformed binary fails loudly: truncation, unknown tags, DML before Relation") {
    val ins = Pgoutput.write(Insert(9, IndexedSeq(TextValue("x"))))
    intercept[MalformedPgoutputException] {
      Pgoutput.parse(ins.take(ins.length - 2)) // truncated value
    }
    intercept[MalformedPgoutputException] { Pgoutput.parse(Array[Byte]('Z')) }
    intercept[MalformedPgoutputException] { Pgoutput.parse(Array.emptyByteArray) }
    val t = new PgoutputTranscoder
    t.feed(Pgoutput.write(Begin(1, 0, 1)))
    intercept[MalformedPgoutputException] { t.feed(ins) } // no Relation yet
  }

  test("type OIDs render the SQL names wal2json prints") {
    assert(Pgoutput.typeName(25, -1) === "text")
    assert(Pgoutput.typeName(20, -1) === "bigint")
    assert(Pgoutput.typeName(1043, 54) === "character varying(50)")
    assert(Pgoutput.typeName(1700, (10 << 16 | 2) + 4) === "numeric(10,2)")
    assert(Pgoutput.typeName(16, -1) === "boolean")
    assert(Pgoutput.typeName(701, -1) === "double precision")
  }

  /** Decoded rows as canonical sorted JSON for cross-grammar comparison. */
  private def decodedRows(lines: Seq[String]): Seq[String] = {
    import spark.implicits._
    ChangeDecoder.decode(spark.createDataset(lines).toDF("value"))
      .selectExpr("to_json(struct(*)) AS j")
      .collect().map(_.getString(0)).sorted.toSeq
  }

  test("PARITY: wal2json and pgoutput decode to identical change events across schema evolution") {
    val cfg = GenConfig(seed = 31L, nRepos = 20, pathsPerRepo = 6,
      maxChangesPerTxn = 3, addColumnAtLsn = 80L, renameAtLsn = 140L)
    val n = 200L

    val wal2json = (0L until n).map(i =>
      ChangeStreamGen.renderLine(cfg, ChangeStreamGen.txn(cfg, i)))

    val transcoder = new PgoutputTranscoder
    var era: Option[PgoutputGen.Era] = None
    val pgout = (0L until n).flatMap { i =>
      val t = ChangeStreamGen.txn(cfg, i)
      val (msgs, e) = PgoutputGen.txnMessages(cfg, t, era)
      era = Some(e)
      val lines = msgs.flatMap(m => transcoder.feed(m))
      assert(lines.size === 1, s"txn $i must fold into exactly one line")
      lines
    }

    assert(decodedRows(pgout) === decodedRows(wal2json),
      "the two grammars must yield identical ChangeEvent rows")
  }

  test("update without an old tuple derives oldkeys from the new tuple's key columns") {
    val t = new PgoutputTranscoder
    t.feed(Pgoutput.write(Begin(5, 0, 42)))
    t.feed(Pgoutput.write(Relation(7, "public", "things", 'd'.toByte, IndexedSeq(
      RelationColumn(1, "id", 23, -1), RelationColumn(0, "v", 25, -1)))))
    // real pgoutput omits the old tuple when the replica identity did not
    // change; wal2json still prints oldkeys — derived from the new tuple
    t.feed(Pgoutput.write(Update(7, None, None,
      IndexedSeq(TextValue("9"), TextValue("hello")))))
    val line = t.feed(Pgoutput.write(Commit(0, 5, 6, 0))).get
    assert(line.contains(""""oldkeys":{"keynames":["id"],"keytypes":["integer"],"keyvalues":[9]}"""))
    assert(line.contains(""""columnvalues":[9,"hello"]"""))
  }

  test("unchanged TOAST columns are omitted, like wal2json") {
    val t = new PgoutputTranscoder
    t.feed(Pgoutput.write(Begin(5, 0, 42)))
    t.feed(Pgoutput.write(Relation(7, "public", "things", 'd'.toByte, IndexedSeq(
      RelationColumn(1, "id", 23, -1), RelationColumn(0, "big", 25, -1),
      RelationColumn(0, "v", 25, -1)))))
    t.feed(Pgoutput.write(Update(7, None, None,
      IndexedSeq(TextValue("9"), UnchangedToast, TextValue("x")))))
    val line = t.feed(Pgoutput.write(Commit(0, 5, 6, 0))).get
    assert(line.contains(""""columnnames":["id","v"]"""), line)
    assert(!line.contains("big"), "unchanged TOAST column must be absent")
  }

  test("json/jsonb render RAW; non-finite floats are quoted; truncation after a NUL fails typed") {
    val t = new PgoutputTranscoder
    t.feed(Pgoutput.write(Begin(5, 0, 42)))
    t.feed(Pgoutput.write(Relation(7, "public", "things", 'd'.toByte, IndexedSeq(
      RelationColumn(1, "id", 23, -1), RelationColumn(0, "doc", 3802, -1),
      RelationColumn(0, "x", 701, -1)))))
    t.feed(Pgoutput.write(Insert(7, IndexedSeq(TextValue("9"),
      TextValue("""{"a": [1, "b"]}"""), TextValue("NaN")))))
    val line = t.feed(Pgoutput.write(Commit(0, 5, 6, 0))).get
    // wal2json embeds json/jsonb verbatim as nested JSON, not as a string
    assert(line.contains(""""columnvalues":[9,{"a": [1, "b"]},"NaN"]"""), line)
    // and the line must parse through the engine's own decoder
    import spark.implicits._
    val rows = ChangeDecoder.decode(Seq(line).toDS().toDF("value")).collect()
    assert(rows.length === 1)

    // a Relation truncated right AFTER a NUL terminator must fail TYPED
    val rel = Pgoutput.write(Relation(7, "public", "t", 'd'.toByte, IndexedSeq.empty))
    val cut = rel.take(1 + 4 + "public".length + 1) // ends exactly at the NUL
    intercept[MalformedPgoutputException] { Pgoutput.parse(cut) }
  }

  test("unchanged-TOAST KEY column without an old tuple fails loudly (identity unrecoverable)") {
    val t = new PgoutputTranscoder
    t.feed(Pgoutput.write(Begin(5, 0, 42)))
    t.feed(Pgoutput.write(Relation(7, "public", "things", 'd'.toByte, IndexedSeq(
      RelationColumn(1, "big_key", 25, -1), RelationColumn(0, "v", 25, -1)))))
    val e = intercept[MalformedPgoutputException] {
      t.feed(Pgoutput.write(Update(7, None, None,
        IndexedSeq(UnchangedToast, TextValue("x")))))
    }
    assert(e.getMessage.contains("big_key"))
  }

  test("malformed pgoutput classifies as DataError in the supervision taxonomy") {
    import graft.streaming.CdcPipeline
    val e = new MalformedPgoutputException("DML for relation 9 before its Relation message")
    assert(CdcPipeline.classify(e) === CdcPipeline.FailureKind.DataError)
    assert(CdcPipeline.classify(new RuntimeException("wrapped", e))
      === CdcPipeline.FailureKind.DataError)
  }

  test("live pgoutput ingest through the JDBC binding == wal2json oracle state") {
    val genCfg = GenConfig(seed = 17L, nRepos = 10, pathsPerRepo = 4,
      maxChangesPerTxn = 3, addColumnAtLsn = 60L, renameAtLsn = 100L)
    val nTxns = 150L
    val conn = ConnectionConfig(host = "db.example.org", database = "graft",
      username = "replicator", password = "s3cret")
    val slot = SlotConfig("graft_slot", outputPlugin = "pgoutput",
      slotBusyRetrySleepMs = 0L, idleSlotIntervalMs = 1000L)
    assert(slot.slotOptions === Map(
      "proto_version" -> "1", "publication_names" -> "graft_slot"))

    val server = new FakePgServer(genCfg, nTxns, plugin = "pgoutput")
    val walDir = tmpDir("pgout-wal")
    val ingest = new ReplicationIngest(
      new JdbcReplicationConnector(conn, slot, () => server.shim()),
      walDir, spark.sessionState.newHadoopConf(), slot, flushChunks = 40L)
    ingest.start()
    val stats = ingest.pump()
    ingest.close()
    assert(stats.chunks === nTxns, "one staged line per committed txn")
    assert(server.confirmedFlushLsn("graft_slot") === nTxns)

    // the staged lines decode identically to the wal2json rendering
    val staged = graft.sources.WalSource.listSegments(walDir)
      .flatMap(s => scala.io.Source.fromFile(s"$walDir/$s").getLines())
    val viaWal2json = (0L until nTxns).map(i =>
      ChangeStreamGen.renderLine(genCfg, ChangeStreamGen.txn(genCfg, i)))
    assert(decodedRows(staged) === decodedRows(viaWal2json))

    // and the full pipeline converges to the sequential oracle
    import graft.cli.Main
    import graft.streaming.{CdcPipeline, TableTarget}
    val t = new graft.lake.LakeTable(spark, tmpDir("pgout-table"))
    t.create(Main.reposSchema, Seq("repo", "path"), 8, Main.reposRenameMap)
    new CdcPipeline(spark, walDir, tmpDir("pgout-ckpt"),
      Seq(TableTarget("repos", t, Main.reposSchema, Seq("repo", "path"), 8,
        Main.reposRenameMap)), Set("repos")).runAvailable()
    def sha(s: String) = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = t.read().select(col("repo"), col("path"),
        sha2(col("content"), 256)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    val exp = ChangeStreamGen.expectedFinalState(genCfg, nTxns)
      .map { case (k, c) => k -> sha(c.content) }
    assert(got === exp)
  }
}
