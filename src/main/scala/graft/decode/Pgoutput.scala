package graft.decode

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/**
 * pgoutput — PostgreSQL's BINARY logical-replication output plugin — as a
 * second decode grammar behind the [[ChangeDecoder]] boundary. The
 * reference documents overriding its wal2json deserialization as the
 * extension point for other plugins (README.md:101-104,
 * SlotReaderKinesisWriter.getSlotMessage); the engine's analog is this
 * codec plus [[PgoutputTranscoder]], which folds a transaction's binary
 * message sequence into ONE wal2json-parity line, so every downstream
 * stage (native parse, decode, merge, oracle) is shared between plugins
 * and parity is structural rather than re-implemented.
 *
 * Wire layout follows the public PostgreSQL logical replication message
 * format documentation: single-byte message tag, network byte order,
 * NUL-terminated UTF-8 strings, text-format tuple values. Protocol v1
 * message types covered: Begin 'B', Commit 'C', Relation 'R', Insert 'I',
 * Update 'U', Delete 'D', Truncate 'T' (fully parsed — the transcoder
 * skips truncates of tables the pipeline doesn't consume and fails typed
 * on consumed ones); Origin/Type are recognized-and-skipped — they carry
 * nothing the CDC apply consumes. Protocol v2 (PostgreSQL
 * 14+) adds STREAMED in-progress transactions: Stream Start 'S' / Stop
 * 'E' / Commit 'c' / Abort 'A', with every message between Start and Stop
 * carrying an extra Int32 xid after its tag (the xid of the transaction
 * or SUBtransaction that made the change) — which makes parsing
 * context-dependent: [[parse]] takes an `inStream` flag and wraps
 * xid-prefixed messages in [[Streamed]].
 *
 * The crucial semantic difference from wal2json: pgoutput is STATEFUL —
 * Insert/Update/Delete name their relation by OID only, and the column
 * names/types arrive in a prior Relation message (re-sent whenever the
 * schema changes, which is how additive columns and renames manifest
 * mid-stream with no DDL event). The transcoder carries that state.
 */
object Pgoutput {

  sealed trait Message

  final case class Begin(finalLsn: Long, commitTimeMicros: Long, xid: Long)
      extends Message
  final case class Commit(flags: Int, commitLsn: Long, endLsn: Long,
                          commitTimeMicros: Long) extends Message

  /** Column descriptor inside a Relation message; flags bit 0 marks the
    * column as part of the replica identity (the key). */
  final case class RelationColumn(flags: Int, name: String, typeOid: Int,
                                  typeMod: Int) {
    def isKey: Boolean = (flags & 1) == 1
  }
  final case class Relation(relationId: Int, namespace: String, name: String,
                            replicaIdentity: Byte,
                            columns: IndexedSeq[RelationColumn]) extends Message

  sealed trait TupleValue
  /** SQL NULL ('n'). */
  case object NullValue extends TupleValue
  /** Unchanged TOASTed value, not sent ('u') — wal2json likewise omits
    * the column entirely. */
  case object UnchangedToast extends TupleValue
  /** Text-format value ('t'). */
  final case class TextValue(text: String) extends TupleValue

  final case class Insert(relationId: Int,
                          newTuple: IndexedSeq[TupleValue]) extends Message
  /** `oldTag` is 'K' (replica-identity key tuple) or 'O' (full old row,
    * REPLICA IDENTITY FULL); None when the key did not change. */
  final case class Update(relationId: Int, oldTag: Option[Char],
                          oldTuple: Option[IndexedSeq[TupleValue]],
                          newTuple: IndexedSeq[TupleValue]) extends Message
  final case class Delete(relationId: Int, oldTag: Char,
                          oldTuple: IndexedSeq[TupleValue]) extends Message
  /** Recognized non-DML no-op messages (Origin 'O', Type 'Y'). */
  final case class Skipped(tag: Char) extends Message
  /** TRUNCATE of one or more relations. `options` bits: 1 = CASCADE,
    * 2 = RESTART IDENTITY (public pgoutput protocol documentation). Fully
    * parsed — the transcoder must know WHICH tables were truncated to
    * decide consumed-table-fail vs irrelevant-table-skip. */
  final case class Truncate(options: Int,
                            relationIds: IndexedSeq[Int]) extends Message

  // ----------------------------------------------- protocol v2: streaming

  /** Opens one stream segment of an in-progress transaction; `xid` is the
    * TOPLEVEL transaction, `firstSegment` marks its first segment. */
  final case class StreamStart(xid: Long, firstSegment: Boolean) extends Message
  /** Closes the current stream segment (no payload). */
  case object StreamStop extends Message
  /** Commits a previously streamed transaction. */
  final case class StreamCommit(xid: Long, flags: Int, commitLsn: Long,
                                endLsn: Long, commitTimeMicros: Long)
      extends Message
  /** Aborts a streamed (sub)transaction: `subXid == xid` aborts the whole
    * transaction, otherwise ROLLBACK TO SAVEPOINT of subtransaction
    * `subXid`. */
  final case class StreamAbort(xid: Long, subXid: Long) extends Message
  /** A message that arrived inside a stream segment, carrying the xid of
    * the (sub)transaction that produced it. */
  final case class Streamed(xid: Long, inner: Message) extends Message

  // ------------------------------------------------------------- parsing

  final class MalformedPgoutputException(msg: String)
      extends IllegalArgumentException(msg)

  /** Parse one message. `inStream` = the transcoder is between a Stream
    * Start and Stream Stop, where Relation/Insert/Update/Delete/Type/
    * Truncate carry an Int32 xid right after the tag (protocol v2) — the
    * wire format itself is context-dependent there. */
  def parse(bytes: Array[Byte], inStream: Boolean = false): Message = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    def fail(msg: String) = throw new MalformedPgoutputException(
      s"$msg (message ${bytes.length} bytes)")
    def u32(): Long = java.lang.Integer.toUnsignedLong(buf.getInt())
    def cstring(): String = {
      val start = buf.position()
      var terminated = false
      while (!terminated && buf.hasRemaining) {
        if (buf.get() == 0) terminated = true
      }
      // an explicit flag, not a position-based heuristic: a message
      // truncated right AFTER some earlier NUL byte would otherwise pass
      // the check and slice with negative length (raw SIOOBE escaping the
      // malformed taxonomy)
      if (!terminated) fail("unterminated string")
      new String(bytes, start, buf.position() - 1 - start, StandardCharsets.UTF_8)
    }
    def tuple(): IndexedSeq[TupleValue] = {
      val n = buf.getShort() & 0xffff
      (0 until n).map { _ =>
        (buf.get().toChar: @unchecked) match {
          case 'n' => NullValue
          case 'u' => UnchangedToast
          case 't' =>
            val len = buf.getInt()
            if (len < 0 || len > buf.remaining()) fail(s"bad value length $len")
            val arr = new Array[Byte](len)
            buf.get(arr)
            TextValue(new String(arr, StandardCharsets.UTF_8))
          case c => fail(s"unknown tuple value tag '$c'")
        }
      }
    }
    if (bytes.isEmpty) fail("empty message")
    try {
    val tag = buf.get().toChar
    // inside a stream segment, the content-carrying messages are
    // xid-prefixed (protocol v2); transaction-control messages are not
    val streamedXid: Option[Long] =
      if (inStream && (tag == 'R' || tag == 'I' || tag == 'U' || tag == 'D' ||
        tag == 'Y' || tag == 'T')) Some(u32())
      else None
    val inner = tag match {
      case 'B' =>
        val m = Begin(buf.getLong(), buf.getLong(), u32())
        m
      case 'C' =>
        Commit(buf.get().toInt, buf.getLong(), buf.getLong(), buf.getLong())
      case 'S' =>
        val x = u32()
        buf.get().toInt match {
          case 1 => StreamStart(x, firstSegment = true)
          case 0 => StreamStart(x, firstSegment = false)
          case other => fail(s"Stream Start first_segment flag $other")
        }
      case 'E' => StreamStop
      case 'c' =>
        StreamCommit(u32(), buf.get().toInt, buf.getLong(), buf.getLong(),
          buf.getLong())
      case 'A' => StreamAbort(u32(), u32())
      case 'R' =>
        val oid = buf.getInt()
        val ns = cstring(); val name = cstring()
        val identity = buf.get()
        val ncols = buf.getShort() & 0xffff
        val cols = (0 until ncols).map { _ =>
          RelationColumn(buf.get().toInt, cstring(), buf.getInt(), buf.getInt())
        }
        Relation(oid, ns, name, identity, cols)
      case 'I' =>
        val oid = buf.getInt()
        if (buf.get().toChar != 'N') fail("Insert without 'N' new tuple")
        Insert(oid, tuple())
      case 'U' =>
        val oid = buf.getInt()
        val tag = buf.get().toChar
        if (tag == 'K' || tag == 'O') {
          val old = tuple()
          if (buf.get().toChar != 'N') fail("Update without 'N' new tuple")
          Update(oid, Some(tag), Some(old), tuple())
        } else if (tag == 'N') Update(oid, None, None, tuple())
        else fail(s"unknown Update tuple tag '$tag'")
      case 'D' =>
        val oid = buf.getInt()
        val tag = buf.get().toChar
        if (tag != 'K' && tag != 'O') fail(s"unknown Delete tuple tag '$tag'")
        Delete(oid, tag, tuple())
      case 'T' =>
        val n = buf.getInt()
        if (n < 0) fail(s"negative Truncate relation count $n")
        val opts = buf.get().toInt
        Truncate(opts, (0 until n).map(_ => buf.getInt()))
      case t @ ('O' | 'Y') => Skipped(t)
      case t => fail(s"unknown message tag '$t'")
    }
    // a fully-parsed message must consume its bytes exactly: a valid
    // prefix followed by garbage is framing/version drift, the same class
    // as truncation — accepting it silently would mask exactly what the
    // other guards exist to surface. (Skipped messages — Origin/Type —
    // are exempt: their bodies are intentionally unconsumed.)
    inner match {
      case Skipped(_) => ()
      case _ if buf.hasRemaining =>
        fail(s"${buf.remaining()} trailing bytes after '$tag' message")
      case _ => ()
    }
    streamedXid.fold(inner)(Streamed(_, inner))
    } catch {
      case _: java.nio.BufferUnderflowException => fail("truncated message")
    }
  }

  // ------------------------------------------------------------- writing
  // The deterministic writer half — the codec's own inverse, used by the
  // synthetic generator and the roundtrip property tests (a real server
  // writes these bytes in production).

  def write(m: Message): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(256)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >>> 8); u8(v) }
    def u32(v: Int): Unit = { u16(v >>> 16); u16(v) }
    def u64(v: Long): Unit = { u32((v >>> 32).toInt); u32(v.toInt) }
    def cstring(s: String): Unit = {
      out.write(s.getBytes(StandardCharsets.UTF_8)); u8(0)
    }
    def tuple(vs: IndexedSeq[TupleValue]): Unit = {
      u16(vs.length)
      vs.foreach {
        case NullValue => u8('n')
        case UnchangedToast => u8('u')
        case TextValue(t) =>
          u8('t')
          val b = t.getBytes(StandardCharsets.UTF_8)
          u32(b.length); out.write(b)
      }
    }
    m match {
      case Begin(lsn, ts, xid) => u8('B'); u64(lsn); u64(ts); u32(xid.toInt)
      case Commit(flags, c, e, ts) => u8('C'); u8(flags); u64(c); u64(e); u64(ts)
      case Relation(oid, ns, name, identity, cols) =>
        u8('R'); u32(oid); cstring(ns); cstring(name); u8(identity.toInt)
        u16(cols.length)
        cols.foreach { c => u8(c.flags); cstring(c.name); u32(c.typeOid); u32(c.typeMod) }
      case Insert(oid, nt) => u8('I'); u32(oid); u8('N'); tuple(nt)
      case Update(oid, tag, old, nt) =>
        u8('U'); u32(oid)
        tag.foreach { t => u8(t); tuple(old.get) }
        u8('N'); tuple(nt)
      case Delete(oid, tag, old) => u8('D'); u32(oid); u8(tag); tuple(old)
      case Skipped(t) => u8(t)
      case Truncate(opts, oids) =>
        u8('T'); u32(oids.length); u8(opts); oids.foreach(u32)
      case StreamStart(xid, first) =>
        u8('S'); u32(xid.toInt); u8(if (first) 1 else 0)
      case StreamStop => u8('E')
      case StreamCommit(xid, flags, c, e, ts) =>
        u8('c'); u32(xid.toInt); u8(flags); u64(c); u64(e); u64(ts)
      case StreamAbort(xid, sub) => u8('A'); u32(xid.toInt); u32(sub.toInt)
      case Streamed(xid, inner) =>
        // xid splices in right after the inner message's tag byte
        val b = write(inner)
        u8(b(0)); u32(xid.toInt); out.write(b, 1, b.length - 1)
    }
    out.toByteArray
  }

  // ----------------------------------------------------------- type OIDs

  /** pg_type OID -> the SQL type name wal2json prints (public catalog). */
  def typeName(oid: Int, typeMod: Int): String = oid match {
    case 25 => "text"
    case 20 => "bigint"
    case 23 => "integer"
    case 21 => "smallint"
    case 16 => "boolean"
    case 700 => "real"
    case 701 => "double precision"
    case 1043 =>
      if (typeMod >= 4) s"character varying(${typeMod - 4})" else "character varying"
    case 1042 => if (typeMod >= 4) s"character(${typeMod - 4})" else "character"
    case 1700 =>
      if (typeMod >= 4) {
        val m = typeMod - 4
        s"numeric(${(m >> 16) & 0xffff},${m & 0xffff})"
      } else "numeric"
    case 1082 => "date"
    case 1114 => "timestamp without time zone"
    case 1184 => "timestamp with time zone"
    case 17 => "bytea"
    case 2950 => "uuid"
    case 114 => "json"
    case 3802 => "jsonb"
    case other => s"oid$other"
  }

  /** Types wal2json renders as bare JSON numbers. */
  def isJsonNumber(oid: Int): Boolean =
    oid == 20 || oid == 23 || oid == 21 || oid == 700 || oid == 701 || oid == 1700
  def isJsonBool(oid: Int): Boolean = oid == 16
}

/**
 * Folds a pgoutput message stream into wal2json-parity WAL lines — one
 * line per committed transaction, shaped exactly like the engine's
 * wal2json wire format (`{"lsn":N,"xid":N,"change":[...]}`), so the whole
 * decode/apply path downstream of the connector is plugin-agnostic.
 *
 * Stateful by necessity: relation metadata (column names/types/keys)
 * arrives in Relation messages and applies to every later DML on that
 * relation id until re-sent. The state lives HERE — at the single-threaded
 * ingest boundary where the protocol itself is sequential — never in the
 * distributed decode.
 *
 * Protocol v2 STREAMED transactions are supported: segments of concurrent
 * in-progress transactions interleave (Stream Start/Stop bracket each
 * segment), changes accumulate per toplevel xid in a [[ChangeSpool]]
 * (heap-bounded — spills to disk past `spillThresholdBytes`, the point of
 * streaming being larger-than-memory transactions), subtransaction aborts
 * truncate ROLLBACK-TO-SAVEPOINT style, and Stream Commit folds the
 * surviving changes into the same wal2json-parity line a non-streamed
 * Commit produces — downstream cannot tell the two apart.
 */
final class PgoutputTranscoder(spillThresholdBytes: Long = 8L << 20,
                               truncateSkippable: String => Boolean =
                                 _ => false) {
  import Pgoutput._

  private val relations = scala.collection.mutable.Map.empty[Int, Relation]
  private var xid: Long = -1L
  private var inTxn = false
  private val changes = new StringBuilder

  /** Toplevel xid of the OPEN stream segment, if any — decides whether
    * the next message parses with the xid-prefixed streamed layout. */
  private var streamXid: Option[Long] = None
  /** In-flight streamed transactions: toplevel xid -> change spool. */
  private val spools = scala.collection.mutable.LinkedHashMap.empty[Long, ChangeSpool]

  private def fail(msg: String): Nothing =
    throw new Pgoutput.MalformedPgoutputException(msg)

  /** TRUNCATE cannot be expressed as keyed changes — skipping one on a
    * CONSUMED table would leave the lake/mirror silently diverged from a
    * truncated source (publications include truncate by DEFAULT). But a
    * FOR-ALL-TABLES publication also carries truncates of tables the
    * pipeline never consumes (ops/staging tables): failing on those would
    * wedge ingestion of every table permanently (DataError never retries,
    * the LSN is never acked) over a change that cannot affect the lake.
    * So: a truncate whose EVERY relation `truncateSkippable` says is
    * irrelevant is skipped; any consumed relation fails typed under the
    * DataError taxonomy, like D-without-identity — repair = exclude
    * truncate from the publication or resync the table. An OID with no
    * cached Relation fails too: irrelevance cannot be proven for a
    * nameless table. (Origin 'O' and Type 'Y' messages remain genuine
    * no-ops.) */
  private def onTruncate(oids: Seq[Int]): Option[String] = {
    val names = oids.map(oid => relations.get(oid).map(_.name).getOrElse(
      fail(s"Truncate for relation $oid before its Relation message")))
    val consumed = names.filterNot(truncateSkippable)
    if (consumed.isEmpty) None
    else fail(
      s"TRUNCATE of consumed table(s) ${consumed.mkString(", ")} is not " +
        "applicable as keyed changes — exclude truncate from the " +
        "publication (publish = 'insert, update, delete') or resync the " +
        "table")
  }

  private def esc(s: String): String = graft.util.Json.escape(s)

  private def rel(id: Int): Relation =
    relations.getOrElse(id, throw new Pgoutput.MalformedPgoutputException(
      s"DML for relation $id before its Relation message"))

  /** A tuple whose arity disagrees with the cached Relation is stale or
    * corrupted relation state (a dropped re-sent Relation after ALTER
    * TABLE, codec drift). zip would TRUNCATE silently — a row missing its
    * newest column, or a wrongly-keyed update (the lesson-14
    * silent-row-identity class). Fail typed like every other framing
    * violation. */
  private def checkArity(r: Relation, t: IndexedSeq[TupleValue]): Unit =
    if (r.columns.length != t.length)
      fail(s"tuple arity ${t.length} != relation ${r.name} arity " +
        s"${r.columns.length} — stale or corrupted relation state")

  private def renderValue(c: RelationColumn, v: String): String =
    if (c.typeOid == 114 || c.typeOid == 3802) v // json/jsonb: wal2json
      // embeds the value as RAW nested JSON, never a quoted string (the
      // native parser's nested-JSON capture is parity-tested on this)
    else if (isJsonNumber(c.typeOid))
      // NaN/±Infinity are legal float/numeric text values but not legal
      // bare JSON tokens — wal2json quotes them
      if (v == "NaN" || v == "Infinity" || v == "-Infinity") "\"" + v + "\""
      else v
    else if (isJsonBool(c.typeOid)) if (v == "t" || v == "true") "true" else "false"
    else "\"" + esc(v) + "\""

  /** The (names, types, values) arrays for a new tuple; UnchangedToast
    * columns are OMITTED entirely — wal2json's behavior for unchanged
    * TOAST (the value was not sent, inventing a null would corrupt). */
  private def newTupleArrays(r: Relation, t: IndexedSeq[TupleValue]): String = {
    val kept = r.columns.zip(t).collect {
      case (c, TextValue(v)) => (c, renderValue(c, v))
      case (c, NullValue) => (c, "null")
    }
    s""""columnnames":[${kept.map(c => "\"" + esc(c._1.name) + "\"").mkString(",")}],""" +
      s""""columntypes":[${kept.map(c =>
        "\"" + esc(typeName(c._1.typeOid, c._1.typeMod)) + "\"").mkString(",")}],""" +
      s""""columnvalues":[${kept.map(_._2).mkString(",")}]"""
  }

  /** oldkeys from a 'K' (key columns; others null) or 'O' (full old row)
    * tuple: exactly the non-null columns — for 'K' that IS the replica
    * identity, matching wal2json's oldkeys. */
  private def oldKeys(r: Relation, t: IndexedSeq[TupleValue]): String = {
    val kept = r.columns.zip(t).collect { case (c, TextValue(v)) => (c, v) }
    s""""oldkeys":{"keynames":[${kept.map(c => "\"" + esc(c._1.name) + "\"").mkString(",")}],""" +
      s""""keytypes":[${kept.map(c =>
        "\"" + esc(typeName(c._1.typeOid, c._1.typeMod)) + "\"").mkString(",")}],""" +
      s""""keyvalues":[${kept.map(c => renderValue(c._1, c._2)).mkString(",")}]}"""
  }

  private def appendChange(body: String): Unit = {
    if (changes.nonEmpty) changes.append(',')
    changes.append(body)
  }

  /** The wal2json change fragment for one DML message. */
  private def renderDml(m: Message): String = m match {
    case Insert(oid, nt) =>
      val r = rel(oid)
      checkArity(r, nt)
      s"""{"kind":"insert","schema":"${esc(r.namespace)}",""" +
        s""""table":"${esc(r.name)}",${newTupleArrays(r, nt)}}"""
    case Update(oid, _, old, nt) =>
      val r = rel(oid)
      checkArity(r, nt)
      old.foreach(checkArity(r, _))
      // no old tuple on the wire = key unchanged: wal2json still prints
      // oldkeys (the identity), recoverable from the NEW tuple's key
      // columns — UNLESS a key column arrived as unchanged-TOAST, whose
      // value the wire simply does not carry: reconstructing a null key
      // there would corrupt row identity silently (the lesson-14 class),
      // so fail loudly instead
      val oldT = old.getOrElse(r.columns.zip(nt).map {
        case (c, UnchangedToast) if c.isKey =>
          fail(s"key column ${c.name} of ${r.name} is unchanged-TOAST with " +
            "no old tuple — replica identity unrecoverable")
        case (c, v) if c.isKey => v
        case _ => NullValue
      })
      s"""{"kind":"update","schema":"${esc(r.namespace)}",""" +
        s""""table":"${esc(r.name)}",${newTupleArrays(r, nt)},${oldKeys(r, oldT)}}"""
    case Delete(oid, _, old) =>
      val r = rel(oid)
      checkArity(r, old)
      s"""{"kind":"delete","schema":"${esc(r.namespace)}",""" +
        s""""table":"${esc(r.name)}",${oldKeys(r, old)}}"""
    case other => fail(s"not a DML message: $other")
  }

  /** Feed one binary message; returns the finished WAL line at (Stream)
    * Commit. */
  def feed(bytes: Array[Byte]): Option[String] =
    Pgoutput.parse(bytes, inStream = streamXid.isDefined) match {
      case Begin(_, _, x) =>
        // a Begin with a txn already open means its Commit was lost — the
        // buffered changes would vanish silently if we just clear()ed
        if (inTxn) fail(s"Begin $x inside an open transaction $xid")
        if (streamXid.isDefined) fail(s"Begin $x inside an open stream segment")
        xid = x; inTxn = true; changes.clear(); None
      case r: Relation =>
        relations(r.relationId) = r; None
      case m @ (_: Insert | _: Update | _: Delete) =>
        // a lost/reordered Begin must not silently drop changes into a
        // stale buffer the next Begin clears
        if (!inTxn) fail("DML outside a transaction")
        appendChange(renderDml(m)); None
      case Commit(_, commitLsn, _, _) =>
        if (!inTxn) fail("Commit outside a transaction")
        if (streamXid.isDefined) fail("Commit inside an open stream segment")
        inTxn = false
        Some(s"""{"lsn":$commitLsn,"xid":$xid,"change":[$changes]}""")
      case Truncate(_, oids) => onTruncate(oids)
      case Skipped(_) => None

      // ------------------------------------- protocol v2 streamed txns
      case StreamStart(x, first) =>
        if (inTxn) fail("Stream Start inside a non-streamed transaction")
        // a lost Stream Stop must fail loudly, not silently re-bucket the
        // following changes under the new segment's txn
        if (streamXid.isDefined) fail(
          s"Stream Start for $x inside the open segment of txn ${streamXid.get}")
        if (first && spools.contains(x))
          fail(s"Stream Start first_segment=1 for already-open txn $x")
        if (!first && !spools.contains(x))
          fail(s"Stream Start continuation for unknown txn $x")
        if (first) spools(x) = new ChangeSpool(spillThresholdBytes)
        streamXid = Some(x); None
      case StreamStop =>
        if (streamXid.isEmpty) fail("Stream Stop without an open segment")
        streamXid = None; None
      case Streamed(_, r: Relation) =>
        relations(r.relationId) = r; None
      case Streamed(sub, m @ (_: Insert | _: Update | _: Delete)) =>
        val top = streamXid.getOrElse(
          fail("streamed DML outside a stream segment"))
        spools(top).append(sub, renderDml(m)); None
      case Streamed(_, Truncate(_, oids)) => onTruncate(oids)
      case Streamed(_, Skipped(_)) => None
      case Streamed(_, other) => fail(s"unexpected streamed message $other")
      case StreamAbort(x, sub) =>
        if (streamXid.isDefined) fail("Stream Abort inside an open segment")
        if (inTxn) fail("Stream Abort inside a non-streamed transaction")
        val spool = spools.getOrElse(x, fail(s"Stream Abort for unknown txn $x"))
        if (sub == x) { spool.close(); spools.remove(x); () }
        else spool.truncateFrom(sub)
        None
      case StreamCommit(x, _, commitLsn, _, _) =>
        if (streamXid.isDefined) fail("Stream Commit inside an open segment")
        if (inTxn) fail("Stream Commit inside a non-streamed transaction")
        val spool = spools.remove(x).getOrElse(
          fail(s"Stream Commit for unknown txn $x"))
        try {
          val sb = new StringBuilder
          sb.append(s"""{"lsn":$commitLsn,"xid":$x,"change":[""")
          var sep = false
          spool.changes().foreach { c =>
            if (sep) sb.append(',')
            sb.append(c); sep = true
          }
          sb.append("]}")
          Some(sb.toString)
        } finally spool.close()
    }

  /** Releases any spilled in-flight streamed-transaction state. */
  /** Drop ALL in-flight decode state — open transaction, open stream
    * segment, spools, and cached relations. Required before (re)attaching
    * to a replication stream: the slot redelivers everything past
    * confirmed-flush from transaction START, so a leftover `inTxn` from a
    * partially-consumed transaction would make the redelivered Begin a
    * framing violation (misclassifying a healthy reconnect as a permanent
    * DataError). Relations are dropped too — pgoutput re-sends Relation
    * messages per connection before first use. Duplicated lines downstream
    * are absorbed by the LSN watermark gate. */
  def reset(): Unit = {
    xid = -1L
    inTxn = false
    changes.clear()
    spools.valuesIterator.foreach(_.close())
    spools.clear()
    streamXid = None
    relations.clear()
  }

  def close(): Unit = reset()
}
