package graft.gen

import graft.decode.Pgoutput
import graft.decode.Pgoutput._

/**
 * Renders the [[ChangeStreamGen]] formula stream as pgoutput BINARY
 * message sequences — the deterministic generator behind the
 * second-plugin decode parity tests and the fake server's pgoutput mode.
 * A Relation message is (re)emitted exactly when the schema era changes
 * (additive column at `addColumnAtLsn`, rename at `renameAtLsn`) and at
 * stream start — precisely how pgoutput manifests DDL mid-stream: no
 * out-of-band event, just new metadata ahead of the next DML.
 */
object PgoutputGen {

  /** Stable OID for the single generated relation. */
  val RelationOid = 54321

  /** Schema era: (renamed?, withSizeColumn?). */
  type Era = (Boolean, Boolean)

  def era(cfg: GenConfig, lsn: Long): Era =
    (lsn >= cfg.renameAtLsn, lsn >= cfg.addColumnAtLsn)

  def relationFor(cfg: GenConfig, lsn: Long): Relation = {
    // multi-table streams would need one Relation (and OID, and per-table
    // era tracking) per table — not wired yet; fail loud rather than emit
    // every table's changes under the "repos" relation
    require(cfg.tables == IndexedSeq("repos"),
      s"pgoutput generator supports the single default table only, got ${cfg.tables}")
    val (renamed, withSize) = era(cfg, lsn)
    val langCol = if (renamed) "language" else "lang"
    val cols = IndexedSeq(
      RelationColumn(1, "repo", 25, -1),   // key columns: flags bit 0
      RelationColumn(1, "path", 25, -1),
      RelationColumn(0, "commit", 25, -1),
      RelationColumn(0, langCol, 25, -1),
      RelationColumn(0, "content", 25, -1)) ++
      (if (withSize) IndexedSeq(RelationColumn(0, "size_bytes", 20, -1))
       else IndexedSeq.empty)
    Relation(RelationOid, "public", "repos", 'd'.toByte, cols)
  }

  /** The DML message for one change (shared by the v1 and v2 renderings —
    * the same logical stream must produce the same tuples in both). */
  private def dmlFor(cfg: GenConfig, withSize: Boolean,
                     c: ChangeStreamGen.GenChange): Message = {
    // unchanged-TOAST: pgoutput's 'u' marker on updates whose content did
    // not change — the transcoder then OMITS the column, matching
    // wal2json's behavior and ChangeStreamGen.renderLine under the flag
    val omit = cfg.toastOmitUpdates && c.kind == "update"
    val contentV: TupleValue = if (omit) UnchangedToast else TextValue(c.content)
    val sizeV: TupleValue =
      if (omit) UnchangedToast else TextValue(c.sizeBytes.toString)
    val newTuple: IndexedSeq[TupleValue] =
      IndexedSeq[TupleValue](TextValue(c.repo), TextValue(c.path),
        TextValue(c.commit), TextValue(c.lang), contentV) ++
        (if (withSize) IndexedSeq[TupleValue](sizeV)
         else IndexedSeq.empty[TupleValue])
    // 'K' tuple: replica-identity columns populated, the rest null
    val keyTuple: IndexedSeq[TupleValue] =
      IndexedSeq[TupleValue](TextValue(c.repo), TextValue(c.path),
        NullValue, NullValue, NullValue) ++
        (if (withSize) IndexedSeq[TupleValue](NullValue)
         else IndexedSeq.empty[TupleValue])
    c.kind match {
      case "insert" => Insert(RelationOid, newTuple)
      case "update" => Update(RelationOid, Some('K'), Some(keyTuple), newTuple)
      case "delete" => Delete(RelationOid, 'K', keyTuple)
    }
  }

  /**
   * Binary messages for one transaction: Begin, [Relation when the era
   * differs from `lastEra` — None at stream start always emits], one DML
   * per change, Commit. Returns the messages and the era to thread to the
   * next call.
   */
  def txnMessages(cfg: GenConfig, t: ChangeStreamGen.GenTxn,
                  lastEra: Option[Era]): (Seq[Array[Byte]], Era) = {
    val e = era(cfg, t.lsn)
    val msgs = scala.collection.mutable.ArrayBuffer.empty[Message]
    msgs += Begin(t.lsn, 1234567L, t.xid)
    if (!lastEra.contains(e)) msgs += relationFor(cfg, t.lsn)
    t.changes.foreach(c => msgs += dmlFor(cfg, e._2, c))
    msgs += Commit(0, t.lsn, t.lsn + 1, 1234567L)
    (msgs.map(Pgoutput.write).toSeq, e)
  }

  /**
   * The same transaction as protocol-v2 STREAMED segments: the DML is
   * split into stream segments of `changesPerSegment` changes, each
   * bracketed by Stream Start / Stream Stop, every content message
   * xid-prefixed ([[Pgoutput.Streamed]]), and the commit shipped as a
   * separate Stream Commit message. Segments and commit return separately
   * so callers can interleave segments of CONCURRENT streamed transactions
   * — the scenario the protocol exists for.
   */
  def streamedTxnMessages(cfg: GenConfig, t: ChangeStreamGen.GenTxn,
                          lastEra: Option[Era], changesPerSegment: Int):
      (Seq[Seq[Array[Byte]]], Array[Byte], Era) = {
    val e = era(cfg, t.lsn)
    val dml: Seq[Message] = t.changes.map(dmlFor(cfg, e._2, _))
    val groups =
      if (dml.isEmpty) Seq(Seq.empty[Message])
      else dml.grouped(changesPerSegment.max(1)).toSeq
    val segments = groups.zipWithIndex.map { case (g, i) =>
      val body = scala.collection.mutable.ArrayBuffer.empty[Message]
      body += StreamStart(t.xid, firstSegment = i == 0)
      // relation metadata rides inside the stream, xid-prefixed, exactly
      // when the schema era changes (and always in the first segment)
      if (i == 0 && !lastEra.contains(e))
        body += Streamed(t.xid, relationFor(cfg, t.lsn))
      g.foreach(m => body += Streamed(t.xid, m))
      body += StreamStop
      body.map(Pgoutput.write).toSeq
    }
    val commit = Pgoutput.write(StreamCommit(t.xid, 0, t.lsn, t.lsn + 1, 1234567L))
    (segments, commit, e)
  }
}
