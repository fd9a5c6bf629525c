package graft

import org.apache.spark.sql.functions._
import graft.decode.{Wal2JsonV2, Wal2JsonV2Transcoder}
import graft.decode.Wal2JsonV2.MalformedWal2JsonV2Exception
import graft.gen.{ChangeStreamGen, GenConfig, Wal2JsonV2Gen}
import graft.sources.replication._
import graft.sources.WalSource
import graft.lake.LakeTable
import graft.streaming.{CdcPipeline, TableTarget}
import graft.cli.Main

/**
 * wal2json FORMAT-VERSION 2 — the third plugin grammar: per-ACTION wire
 * lines folded back to the v1-parity envelope at the ingest boundary.
 * Parity is pinned at the byte level against the v1 generator (the same
 * discipline as the pgoutput suite), and the live half runs the synthetic
 * endpoint in v2 mode through the REAL transcoder + position splice.
 */
class Wal2JsonV2Spec extends SparkSpec {

  // schema evolution mid-range: the v2 stream must carry both eras
  // (column set growth + rename) purely through its per-action columns
  val cfg = GenConfig(seed = 17L, nRepos = 12, pathsPerRepo = 4,
    maxChangesPerTxn = 3, addColumnAtLsn = 120L, renameAtLsn = 200L)
  val nTxns = 300L

  private def sha256(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("grammar parity: v2 action lines fold to BYTE-IDENTICAL v1 lines") {
    val tr = new Wal2JsonV2Transcoder
    (0L until nTxns).foreach { id =>
      val t = ChangeStreamGen.txn(cfg, id)
      val folded = Wal2JsonV2Gen.txnLines(cfg, t).flatMap(tr.feed(_))
      assert(folded.size === 1, s"txn $id must fold to exactly one line")
      // the wire carries no position; the boundary splice completes it
      assert(WalEnvelope.ensureLsn(folded.head, t.lsn) ===
        ChangeStreamGen.renderLine(cfg, t), s"divergence at txn $id")
    }
  }

  test("grammar parity under unchanged-TOAST omission stays byte-identical") {
    val omitCfg = cfg.copy(toastOmitUpdates = true)
    val tr = new Wal2JsonV2Transcoder
    (0L until nTxns).foreach { id =>
      val t = ChangeStreamGen.txn(omitCfg, id)
      val folded = Wal2JsonV2Gen.txnLines(omitCfg, t).flatMap(tr.feed(_))
      assert(folded.size === 1, s"txn $id must fold to exactly one line")
      assert(WalEnvelope.ensureLsn(folded.head, t.lsn) ===
        ChangeStreamGen.renderLine(omitCfg, t), s"divergence at txn $id")
    }
  }

  test("value rendering: escaping, numbers, null, nested json") {
    val tr = new Wal2JsonV2Transcoder
    def fold(actions: String*): String =
      ((s"""{"action":"B","xid":7}""" +: actions) :+ """{"action":"C"}""")
        .flatMap(tr.feed(_)).head
    // strings re-escape through the SHARED escaper (newlines as \n, not
    // Jackson's serializer); numbers/bools/null ride unquoted; nested
    // objects (json columns) re-serialize compactly
    val line = fold(
      """{"action":"I","schema":"s","table":"t","columns":[""" +
        """{"name":"a","type":"text","value":"x\ny"},""" +
        """{"name":"b","type":"bigint","value":42},""" +
        """{"name":"c","type":"boolean","value":true},""" +
        """{"name":"d","type":"text","value":null},""" +
        """{"name":"e","type":"jsonb","value":{"k": [1, 2]}}]}""")
    assert(line ===
      """{"xid":7,"change":[{"kind":"insert","schema":"s","table":"t",""" +
        """"columnnames":["a","b","c","d","e"],""" +
        """"columntypes":["text","bigint","boolean","text","jsonb"],""" +
        """"columnvalues":["x\ny",42,true,null,{"k":[1,2]}]}]}""")
  }

  test("high-precision numerics survive the fold exactly (no double rounding)") {
    val tr = new Wal2JsonV2Transcoder
    // a default ObjectMapper parses non-integral numbers as Java doubles:
    // 0.12345678901234567890123456789 would re-render as
    // 0.12345678901234568 — silent corruption of numeric column values on
    // this grammar alone. USE_BIG_DECIMAL_FOR_FLOATS keeps the exact text.
    val precise = "0.12345678901234567890123456789"
    val big = "123456789012345678901234567890.42"
    val line = (Seq(
      """{"action":"B","xid":7}""",
      s"""{"action":"I","schema":"s","table":"t","columns":[""" +
        s"""{"name":"n","type":"numeric","value":$precise},""" +
        s"""{"name":"m","type":"numeric","value":$big},""" +
        s"""{"name":"j","type":"jsonb","value":{"x": $precise}}]}""",
      """{"action":"C"}""").flatMap(tr.feed(_))).head
    assert(line.contains(s""""columnvalues":[$precise,$big,{"x":$precise}]"""),
      s"exact decimal text must survive: $line")
  }

  test("framing violations fail typed, never corrupt silently") {
    def fresh = new Wal2JsonV2Transcoder
    val I = """{"action":"I","schema":"s","table":"t","columns":[]}"""
    // DML outside a transaction (lost B)
    intercept[MalformedWal2JsonV2Exception] { fresh.feed(I) }
    // C outside a transaction
    intercept[MalformedWal2JsonV2Exception] { fresh.feed("""{"action":"C"}""") }
    // B inside an open transaction (lost C)
    val t1 = fresh
    t1.feed("""{"action":"B","xid":1}""")
    intercept[MalformedWal2JsonV2Exception] {
      t1.feed("""{"action":"B","xid":2}""")
    }
    // B without xid (include-xids is the engine's contract)
    intercept[MalformedWal2JsonV2Exception] { fresh.feed("""{"action":"B"}""") }
    // unknown action / non-object / unparseable
    intercept[MalformedWal2JsonV2Exception] { fresh.feed("""{"action":"Z"}""") }
    intercept[MalformedWal2JsonV2Exception] { fresh.feed(""""scalar"""") }
    intercept[MalformedWal2JsonV2Exception] { fresh.feed("{not json") }
    // delete without identity names no row — unapplicable, loud
    val t2 = fresh
    t2.feed("""{"action":"B","xid":3}""")
    val ex = intercept[MalformedWal2JsonV2Exception] {
      t2.feed("""{"action":"D","schema":"s","table":"t"}""")
    }
    assert(ex.getMessage.contains("identity"))
    // the taxonomy pins all of this as deterministic DataError
    assert(CdcPipeline.classify(ex) === CdcPipeline.FailureKind.DataError)
    // TRUNCATE of a CONSUMED table cannot be applied as keyed changes —
    // skipping it silently diverges the lake from a truncated source
    // (publications publish truncate by DEFAULT), so it fails typed under
    // DataError like D-without-identity; but a truncate of a table the
    // pipeline never reads is SKIPPED (failing table-blind would wedge
    // every table's ingestion over an ops-table truncate); logical
    // messages remain genuine no-ops
    val t3 = fresh
    t3.feed("""{"action":"B","xid":4}""")
    val exT = intercept[MalformedWal2JsonV2Exception] {
      t3.feed("""{"action":"T","schema":"s","table":"t"}""")
    }
    assert(exT.getMessage.contains("TRUNCATE"))
    assert(CdcPipeline.classify(exT) === CdcPipeline.FailureKind.DataError)
    // with a skip predicate, the irrelevant table's truncate is dropped
    // and the transaction commits; the consumed table still fails
    val tAware = new Wal2JsonV2Transcoder(truncateSkippable = _ != "t")
    tAware.feed("""{"action":"B","xid":4}""")
    assert(tAware.feed(
      """{"action":"T","schema":"s","table":"ops_scratch"}""").isEmpty)
    assert(tAware.feed("""{"action":"C"}""") ===
      Some("""{"xid":4,"change":[]}"""))
    tAware.feed("""{"action":"B","xid":5}""")
    val exT2 = intercept[MalformedWal2JsonV2Exception] {
      tAware.feed("""{"action":"T","schema":"s","table":"t"}""")
    }
    assert(exT2.getMessage.contains("\"t\"") || exT2.getMessage.contains(" t "))
    // even a skippable truncate outside a transaction is a framing error
    val tOut = new Wal2JsonV2Transcoder(truncateSkippable = _ => true)
    intercept[MalformedWal2JsonV2Exception] {
      tOut.feed("""{"action":"T","schema":"s","table":"x"}""")
    }
    val t3b = fresh
    t3b.feed("""{"action":"B","xid":4}""")
    assert(t3b.feed("""{"action":"M","prefix":"p","content":"c"}""").isEmpty)
    assert(t3b.feed("""{"action":"C"}""") ===
      Some("""{"xid":4,"change":[]}"""))
    // extra fields from plugin options must be tolerated, not fatal
    val t4 = fresh
    t4.feed("""{"action":"B","xid":5,"timestamp":"2026-01-01 00:00:00+00"}""")
    assert(t4.feed("""{"action":"C","timestamp":"2026-01-01 00:00:00+00"}""")
      .contains("""{"xid":5,"change":[]}"""))
  }

  test("reset drops an open transaction (reconnect redelivery)") {
    val tr = new Wal2JsonV2Transcoder
    tr.feed("""{"action":"B","xid":9}""")
    // mid-transaction failure: the slot redelivers from txn START —
    // without the reset the redelivered B is a framing violation
    tr.reset()
    assert(tr.feed("""{"action":"B","xid":9}""").isEmpty)
    assert(tr.feed("""{"action":"C"}""").contains("""{"xid":9,"change":[]}"""))
  }

  test("live v2 ingest through the synthetic endpoint == oracle") {
    val connCfg = ConnectionConfig(host = "db.example.org", database = "graft",
      username = "replicator", password = "s3cret")
    val slot = SlotConfig("graft_slot", formatVersion = 2,
      slotBusyRetrySleepMs = 0L, idleSlotIntervalMs = 1000L)
    val server = new SyntheticReplicationServer(cfg, nTxns)
    val walDir = tmpDir("w2v2-wal")
    val ingest = new ReplicationIngest(server.connect(connCfg, slot), walDir,
      spark.sessionState.newHadoopConf(), slot, flushChunks = 64L)
    ingest.start()
    val stats = ingest.pump()
    ingest.close()
    assert(stats.chunks === nTxns)

    // the staged bytes are the CANONICAL v1 envelope, line for line — the
    // whole downstream stays plugin-agnostic
    val staged = WalSource.listSegments(walDir).sorted
      .flatMap(s => scala.io.Source.fromFile(
        new java.io.File(walDir, s)).getLines().toList)
    val canonical = (0L until nTxns)
      .map(id => ChangeStreamGen.renderLine(cfg, ChangeStreamGen.txn(cfg, id)))
    assert(staged === canonical)

    // and the staged WAL applies to the oracle state (across both eras)
    val t = new LakeTable(spark, tmpDir("w2v2-table"))
    t.create(Main.reposSchema, Seq("repo", "path"), nBuckets = 8, Main.reposRenameMap)
    new CdcPipeline(spark, walDir, tmpDir("w2v2-ckpt"),
      Seq(TableTarget("repos", t, Main.reposSchema, Seq("repo", "path"), 8,
        Main.reposRenameMap)), Set("repos")).runAvailable()
    val got = t.read().select(col("repo"), col("path"), col("commit"),
      sha2(col("content"), 256).as("sha")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getString(2), r.getString(3))).toMap
    val exp = ChangeStreamGen.expectedFinalState(cfg, nTxns).map { case (k, ch) =>
      k -> (ch.commit, sha256(ch.content))
    }
    assert(got === exp)
  }

  test("format-version config rules") {
    intercept[IllegalArgumentException] {
      SlotConfig("s", formatVersion = 3).validate()
    }
    intercept[IllegalArgumentException] {
      SlotConfig("s", outputPlugin = "pgoutput", formatVersion = 2).validate()
    }
    intercept[IllegalArgumentException] {
      // the v2 fold needs the xid on every B — a misconfiguration must
      // fail at construction, not surface as a runtime DataError
      SlotConfig("s", formatVersion = 2, includeXids = false).validate()
    }
    val v2 = SlotConfig("s", formatVersion = 2).validate()
    assert(v2.slotOptions.get("format-version").contains("2"))
    assert(v2.slotOptions.contains("include-xids"))
    // v1 sessions must NOT send the option (older plugin builds reject it)
    assert(!SlotConfig("s").validate().slotOptions.contains("format-version"))
  }
}
