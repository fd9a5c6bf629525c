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

  test("transaction-framing violations fail typed, never drop changes silently") {
    val rel = Relation(9, "public", "t", 'd'.toByte,
      IndexedSeq(RelationColumn(1, "id", 23, -1)))
    val ins = Insert(9, IndexedSeq(TextValue("1")))
    // DML with no open transaction (a lost/reordered Begin): appending it
    // to a stale buffer the next Begin clears would VANISH the change
    val t1 = new PgoutputTranscoder
    t1.feed(Pgoutput.write(rel))
    intercept[MalformedPgoutputException] { t1.feed(Pgoutput.write(ins)) }
    // Begin while a txn is open (a lost Commit): the buffered changes must
    // not be silently discarded
    val t2 = new PgoutputTranscoder
    t2.feed(Pgoutput.write(Begin(1, 0, 1)))
    t2.feed(Pgoutput.write(rel))
    t2.feed(Pgoutput.write(ins))
    intercept[MalformedPgoutputException] { t2.feed(Pgoutput.write(Begin(2, 0, 2))) }
  }

  test("arity mismatches and trailing bytes fail typed, never truncate silently") {
    // a tuple whose arity disagrees with the cached Relation (stale
    // relation state after a dropped re-sent Relation): zip would silently
    // drop the extra column — a row missing its newest column, or a
    // wrongly-keyed update (the lesson-14 class)
    val rel1 = Relation(9, "public", "t", 'd'.toByte,
      IndexedSeq(RelationColumn(1, "id", 23, -1)))
    val t = new PgoutputTranscoder
    t.feed(Pgoutput.write(Begin(1, 0, 1)))
    t.feed(Pgoutput.write(rel1))
    val twoValues = Insert(9, IndexedSeq(TextValue("1"), TextValue("extra")))
    val ex = intercept[MalformedPgoutputException] {
      t.feed(Pgoutput.write(twoValues))
    }
    assert(ex.getMessage.contains("arity"))
    // a valid message followed by garbage bytes (framing/version drift):
    // accepting the prefix silently would mask exactly what the other
    // guards exist to surface
    val begin = Pgoutput.write(Begin(1, 0, 1))
    intercept[MalformedPgoutputException] {
      Pgoutput.parse(begin :+ 0x7f.toByte)
    }
    // Skipped messages (Origin/Type) keep their unconsumed bodies
    assert(Pgoutput.parse(Array[Byte]('O', 1, 2, 3)) === Skipped('O'))
  }

  test("TRUNCATE is table-aware: consumed tables fail typed, irrelevant tables skip") {
    // publications publish truncate by DEFAULT and a FOR-ALL-TABLES
    // publication carries EVERY table's truncates; the engine cannot
    // express a TRUNCATE of a CONSUMED table as keyed changes, so that
    // fails loud under DataError (repair = exclude truncate from the
    // publication or resync), exactly like D-without-identity — but a
    // truncate of a table the pipeline never reads must NOT wedge
    // ingestion of every table permanently
    val relConsumed = Relation(7, "public", "events", 'd'.toByte,
      IndexedSeq(RelationColumn(1, "id", 23, -1)))
    val relOps = Relation(8, "public", "ops_scratch", 'd'.toByte,
      IndexedSeq(RelationColumn(1, "id", 23, -1)))
    def transcoder() = {
      val t = new PgoutputTranscoder(truncateSkippable = _ != "events")
      t.feed(Pgoutput.write(Begin(1, 0, 42)))
      t.feed(Pgoutput.write(relConsumed))
      t.feed(Pgoutput.write(relOps))
      t
    }
    // consumed table => typed DataError naming the table
    val ex = intercept[MalformedPgoutputException] {
      transcoder().feed(Pgoutput.write(Truncate(0, IndexedSeq(7))))
    }
    assert(ex.getMessage.contains("TRUNCATE"))
    assert(ex.getMessage.contains("events"))
    assert(graft.streaming.CdcPipeline.classify(ex) ===
      graft.streaming.CdcPipeline.FailureKind.DataError)
    // a multi-relation truncate with ANY consumed table fails too
    intercept[MalformedPgoutputException] {
      transcoder().feed(Pgoutput.write(Truncate(1, IndexedSeq(8, 7))))
    }
    // irrelevant table => skipped; the transaction commits normally
    val tSkip = transcoder()
    assert(tSkip.feed(Pgoutput.write(Truncate(0, IndexedSeq(8)))).isEmpty)
    assert(tSkip.feed(Pgoutput.write(Commit(0, 5L, 6L, 7L))) ===
      Some("""{"lsn":5,"xid":42,"change":[]}"""))
    // unknown relation oid: irrelevance cannot be proven — fail
    intercept[MalformedPgoutputException] {
      transcoder().feed(Pgoutput.write(Truncate(0, IndexedSeq(99))))
    }
    // the default transcoder (no skip predicate) fails on EVERY truncate
    val tDefault = new PgoutputTranscoder
    tDefault.feed(Pgoutput.write(Begin(1, 0, 42)))
    tDefault.feed(Pgoutput.write(relOps))
    intercept[MalformedPgoutputException] {
      tDefault.feed(Pgoutput.write(Truncate(0, IndexedSeq(8))))
    }
    // streamed truncates take the same classification
    val tStream = new PgoutputTranscoder(truncateSkippable = _ != "events")
    tStream.feed(Pgoutput.write(StreamStart(9L, firstSegment = true)))
    tStream.feed(Pgoutput.write(Streamed(9L, relOps)))
    assert(tStream.feed(
      Pgoutput.write(Streamed(9L, Truncate(0, IndexedSeq(8))))).isEmpty)
    tStream.feed(Pgoutput.write(Streamed(9L, relConsumed)))
    intercept[MalformedPgoutputException] {
      tStream.feed(Pgoutput.write(Streamed(9L, Truncate(0, IndexedSeq(7)))))
    }
    // Origin/Type messages remain genuine no-ops
    val t2 = new PgoutputTranscoder
    t2.feed(Pgoutput.write(Begin(1, 0, 42)))
    assert(t2.feed(Array[Byte]('O', 1, 2, 3)).isEmpty)
    // Truncate is fully parsed: trailing bytes after it fail typed
    intercept[MalformedPgoutputException] {
      Pgoutput.parse(Pgoutput.write(Truncate(0, IndexedSeq(8))) :+ 0x7f.toByte)
    }
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

  test("PARITY under unchanged-TOAST omission: the 'u' marker folds to wal2json's dropped column") {
    val cfg = GenConfig(seed = 31L, nRepos = 20, pathsPerRepo = 6,
      maxChangesPerTxn = 3, addColumnAtLsn = 80L, renameAtLsn = 140L,
      toastOmitUpdates = true)
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
      "the two grammars must agree on which columns an update carries")
    // and the omission really happened: single-change update txns never
    // name content (multi-change lines may hold an insert beside an update)
    val updOnly = wal2json.filter(l => l.contains("\"kind\":\"update\"") &&
      l.indexOf("\"kind\":") == l.lastIndexOf("\"kind\":"))
    assert(updOnly.nonEmpty && updOnly.forall(!_.contains("\"content\"")))
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

  // ------------------------------------------ protocol v2: streamed txns

  test("v2 codec: stream messages and xid-prefixed streamed content roundtrip") {
    val msgs: Seq[Message] = Seq(
      StreamStart(3000000005L, firstSegment = true),
      StreamStart(7L, firstSegment = false),
      StreamStop,
      StreamCommit(3000000005L, 0, 987654322L, 987654323L, 1699999999000001L),
      StreamAbort(3000000005L, 3000000006L))
    msgs.foreach(m => assert(Pgoutput.parse(Pgoutput.write(m)) === m, m.toString))
    // streamed layout: content messages carry an Int32 xid after the tag,
    // and parsing them REQUIRES the in-stream context
    val streamed: Seq[Message] = Seq(
      Streamed(9L, Relation(7, "public", "t", 'd'.toByte,
        IndexedSeq(RelationColumn(1, "id", 23, -1)))),
      Streamed(4000000000L, Insert(7, IndexedSeq(TextValue("1")))),
      Streamed(9L, Update(7, None, None, IndexedSeq(TextValue("2")))),
      Streamed(9L, Delete(7, 'K', IndexedSeq(TextValue("3")))),
      Streamed(9L, Truncate(1, IndexedSeq(7, 8))))
    streamed.foreach { m =>
      assert(Pgoutput.parse(Pgoutput.write(m), inStream = true) === m, m.toString)
    }
    // the wire format is genuinely context-dependent: the same bytes
    // OUTSIDE a stream misparse (the xid shifts the whole body) — and
    // must fail TYPED, not leak a raw buffer error
    val ins = Pgoutput.write(Streamed(9L, Insert(7, IndexedSeq(TextValue("1")))))
    intercept[MalformedPgoutputException] {
      Pgoutput.parse(ins, inStream = false)
    }
  }

  test("v2 PARITY: a streamed transaction folds into the identical line as its non-streamed render") {
    val cfg = GenConfig(seed = 31L, nRepos = 20, pathsPerRepo = 6,
      maxChangesPerTxn = 3, addColumnAtLsn = 80L, renameAtLsn = 140L)
    val n = 200L

    val plain = {
      val t = new PgoutputTranscoder
      var era: Option[PgoutputGen.Era] = None
      (0L until n).flatMap { i =>
        val (msgs, e) = PgoutputGen.txnMessages(cfg, ChangeStreamGen.txn(cfg, i), era)
        era = Some(e)
        msgs.flatMap(t.feed)
      }
    }
    val streamed = {
      val t = new PgoutputTranscoder
      var era: Option[PgoutputGen.Era] = None
      (0L until n).flatMap { i =>
        val (segs, commit, e) = PgoutputGen.streamedTxnMessages(
          cfg, ChangeStreamGen.txn(cfg, i), era, changesPerSegment = 1)
        era = Some(e)
        segs.flatMap(_.flatMap(t.feed)) ++ t.feed(commit)
      }
    }
    assert(streamed === plain,
      "streamed and whole-txn renders must be byte-identical lines")
  }

  test("v2: interleaved segments of concurrent transactions commit independently") {
    val cfg = GenConfig(seed = 11L, nRepos = 8, pathsPerRepo = 3,
      maxChangesPerTxn = 4, addColumnAtLsn = 1000L, renameAtLsn = 2000L)
    val t0 = ChangeStreamGen.txn(cfg, 0L)
    val t1 = ChangeStreamGen.txn(cfg, 1L)
    val (s0, c0, e0) = PgoutputGen.streamedTxnMessages(cfg, t0, None, 1)
    val (s1, c1, _) = PgoutputGen.streamedTxnMessages(cfg, t1, Some(e0), 1)

    val tr = new PgoutputTranscoder
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    s0.zipAll(s1, Seq.empty[Array[Byte]], Seq.empty[Array[Byte]]).foreach {
      case (a, b) =>
        a.foreach(m => lines ++= tr.feed(m))
        b.foreach(m => lines ++= tr.feed(m))
    }
    lines ++= tr.feed(c0)
    lines ++= tr.feed(c1)

    val plainT = new PgoutputTranscoder
    val expected = {
      val (m0, e) = PgoutputGen.txnMessages(cfg, t0, None)
      val (m1, _) = PgoutputGen.txnMessages(cfg, t1, Some(e))
      (m0 ++ m1).flatMap(plainT.feed)
    }
    assert(lines.toSeq === expected,
      "interleaving must not bleed changes across transactions")
  }

  test("v2: spools past the threshold spill to disk, commit identically, and clean up") {
    def spoolFiles(): Set[String] =
      new java.io.File(System.getProperty("java.io.tmpdir")).list()
        .filter(_.startsWith("graft-stream-spool-")).toSet

    val cfg = GenConfig(seed = 13L, nRepos = 10, pathsPerRepo = 4,
      maxChangesPerTxn = 5, addColumnAtLsn = 1000L, renameAtLsn = 2000L)
    def run(threshold: Long): Seq[String] = {
      val t = new PgoutputTranscoder(threshold)
      var era: Option[PgoutputGen.Era] = None
      (0L until 30L).flatMap { i =>
        val (segs, commit, e) = PgoutputGen.streamedTxnMessages(
          cfg, ChangeStreamGen.txn(cfg, i), era, 1)
        era = Some(e)
        segs.flatMap(_.flatMap(t.feed)) ++ t.feed(commit)
      }
    }
    val before = spoolFiles()
    // 256 bytes: every txn spills (content alone is bigger)
    assert(run(256L) === run(1L << 20),
      "spilled and in-memory spools must render identical lines")
    assert(spoolFiles() === before,
      "every spill file must be deleted at (stream) commit")
  }

  test("v2: subtransaction abort is ROLLBACK TO SAVEPOINT; toplevel abort discards the txn") {
    val rel = Relation(7, "public", "things", 'd'.toByte, IndexedSeq(
      RelationColumn(1, "id", 23, -1), RelationColumn(0, "v", 25, -1)))
    def ins(id: Int, v: String) =
      Insert(7, IndexedSeq(TextValue(id.toString), TextValue(v)))

    // run at both thresholds: the tiny one exercises FILE truncation
    Seq(1L << 20, 64L).foreach { threshold =>
      val t = new PgoutputTranscoder(threshold)
      t.feed(Pgoutput.write(StreamStart(9L, firstSegment = true)))
      t.feed(Pgoutput.write(Streamed(9L, rel)))
      t.feed(Pgoutput.write(Streamed(9L, ins(1, "keep-a"))))
      // SAVEPOINT -> subxact 10 writes, incl. a nested subxact 11
      t.feed(Pgoutput.write(Streamed(10L, ins(2, "rollback-b"))))
      t.feed(Pgoutput.write(Streamed(11L, ins(3, "rollback-c"))))
      t.feed(Pgoutput.write(StreamStop))
      t.feed(Pgoutput.write(StreamAbort(9L, 10L))) // ROLLBACK TO SAVEPOINT
      t.feed(Pgoutput.write(StreamStart(9L, firstSegment = false)))
      t.feed(Pgoutput.write(Streamed(9L, ins(4, "keep-d"))))
      t.feed(Pgoutput.write(StreamStop))
      val line = t.feed(Pgoutput.write(StreamCommit(9L, 0, 500L, 501L, 0L))).get
      assert(line.contains("keep-a") && line.contains("keep-d"), line)
      assert(!line.contains("rollback-b") && !line.contains("rollback-c"),
        s"aborted subxact changes must not survive (threshold $threshold): $line")
    }

    // toplevel abort: the whole transaction vanishes; a later commit for
    // that xid is a protocol violation
    val t2 = new PgoutputTranscoder
    t2.feed(Pgoutput.write(StreamStart(20L, firstSegment = true)))
    t2.feed(Pgoutput.write(Streamed(20L, rel)))
    t2.feed(Pgoutput.write(Streamed(20L, ins(9, "gone"))))
    t2.feed(Pgoutput.write(StreamStop))
    t2.feed(Pgoutput.write(StreamAbort(20L, 20L)))
    intercept[MalformedPgoutputException] {
      t2.feed(Pgoutput.write(StreamCommit(20L, 0, 600L, 601L, 0L)))
    }
  }

  test("v2: stream protocol violations fail typed") {
    val t = new PgoutputTranscoder
    intercept[MalformedPgoutputException] { // stop without start
      t.feed(Pgoutput.write(StreamStop))
    }
    intercept[MalformedPgoutputException] { // continuation of unknown txn
      t.feed(Pgoutput.write(StreamStart(5L, firstSegment = false)))
    }
    t.feed(Pgoutput.write(StreamStart(5L, firstSegment = true)))
    t.feed(Pgoutput.write(StreamStop))
    intercept[MalformedPgoutputException] { // re-begin of an open txn
      t.feed(Pgoutput.write(StreamStart(5L, firstSegment = true)))
    }
    intercept[MalformedPgoutputException] { // commit of a never-begun txn
      t.feed(Pgoutput.write(StreamCommit(99L, 0, 1L, 2L, 0L)))
    }
    intercept[MalformedPgoutputException] { // abort of a never-begun txn
      t.feed(Pgoutput.write(StreamAbort(99L, 99L)))
    }
    val t3 = new PgoutputTranscoder
    t3.feed(Pgoutput.write(Begin(1L, 0L, 1L)))
    intercept[MalformedPgoutputException] { // stream start inside a txn
      t3.feed(Pgoutput.write(StreamStart(5L, firstSegment = true)))
    }
    val t4 = new PgoutputTranscoder
    t4.feed(Pgoutput.write(StreamStart(5L, firstSegment = true)))
    intercept[MalformedPgoutputException] { // lost Stop: a new segment must
      // not silently re-bucket changes under the new txn
      t4.feed(Pgoutput.write(StreamStart(6L, firstSegment = true)))
    }
    val t5 = new PgoutputTranscoder
    t5.feed(Pgoutput.write(StreamStart(7L, firstSegment = true)))
    intercept[MalformedPgoutputException] { // Begin inside an open segment
      t5.feed(Pgoutput.write(Begin(2L, 0L, 2L)))
    }
  }

  test("v2 slot options request streaming; v2 outside pgoutput is rejected") {
    val s = SlotConfig("graft_slot", outputPlugin = "pgoutput", protoVersion = 2)
    s.validate()
    assert(s.slotOptions === Map("proto_version" -> "2",
      "publication_names" -> "graft_slot", "streaming" -> "on"))
    intercept[IllegalArgumentException] {
      SlotConfig("s1", outputPlugin = "wal2json", protoVersion = 2).validate()
    }
    intercept[IllegalArgumentException] {
      SlotConfig("s1", outputPlugin = "pgoutput", protoVersion = 3).validate()
    }
  }

  test("live v2 STREAMED ingest through the JDBC binding == wal2json oracle") {
    val genCfg = GenConfig(seed = 23L, nRepos = 10, pathsPerRepo = 4,
      maxChangesPerTxn = 3, addColumnAtLsn = 60L, renameAtLsn = 100L)
    val nTxns = 150L
    val conn = ConnectionConfig(host = "db.example.org", database = "graft",
      username = "replicator", password = "s3cret")
    val slot = SlotConfig("graft_slot_v2", outputPlugin = "pgoutput",
      protoVersion = 2, slotBusyRetrySleepMs = 0L, idleSlotIntervalMs = 1000L)

    // the fake server interleaves segment PAIRS of concurrent streamed
    // txns — the wire pattern protocol v2 exists for
    val server = new FakePgServer(genCfg, nTxns, plugin = "pgoutput",
      protoVersion = 2)
    val walDir = tmpDir("pgout2-wal")
    val ingest = new ReplicationIngest(
      new JdbcReplicationConnector(conn, slot, () => server.shim()),
      walDir, spark.sessionState.newHadoopConf(), slot, flushChunks = 40L)
    ingest.start()
    val stats = ingest.pump()
    ingest.close()
    assert(stats.chunks === nTxns, "one staged line per committed txn")
    assert(server.confirmedFlushLsn("graft_slot_v2") === nTxns)

    val staged = graft.sources.WalSource.listSegments(walDir)
      .flatMap(s => scala.io.Source.fromFile(s"$walDir/$s").getLines())
    val viaWal2json = (0L until nTxns).map(i =>
      ChangeStreamGen.renderLine(genCfg, ChangeStreamGen.txn(genCfg, i)))
    assert(decodedRows(staged) === decodedRows(viaWal2json))
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
