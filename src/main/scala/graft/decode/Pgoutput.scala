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
 * format documentation (protocol version 1): single-byte message tag,
 * network byte order, NUL-terminated UTF-8 strings, text-format tuple
 * values. Message types covered: Begin 'B', Commit 'C', Relation 'R',
 * Insert 'I', Update 'U', Delete 'D' (Origin/Type/Truncate are
 * recognized-and-skipped — they carry nothing the CDC apply consumes).
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
  /** Recognized non-DML messages (Origin 'O', Type 'Y', Truncate 'T'). */
  final case class Skipped(tag: Char) extends Message

  // ------------------------------------------------------------- parsing

  final class MalformedPgoutputException(msg: String)
      extends IllegalArgumentException(msg)

  def parse(bytes: Array[Byte]): Message = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    def fail(msg: String) = throw new MalformedPgoutputException(
      s"$msg (message ${bytes.length} bytes)")
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
    try buf.get().toChar match {
      case 'B' =>
        val m = Begin(buf.getLong(), buf.getLong(),
          java.lang.Integer.toUnsignedLong(buf.getInt()))
        m
      case 'C' =>
        Commit(buf.get().toInt, buf.getLong(), buf.getLong(), buf.getLong())
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
      case t @ ('O' | 'Y' | 'T') => Skipped(t)
      case t => fail(s"unknown message tag '$t'")
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
 */
final class PgoutputTranscoder {
  import Pgoutput._

  private val relations = scala.collection.mutable.Map.empty[Int, Relation]
  private var xid: Long = -1L
  private var inTxn = false
  private val changes = new StringBuilder

  private def esc(s: String): String = graft.util.Json.escape(s)

  private def rel(id: Int): Relation =
    relations.getOrElse(id, throw new Pgoutput.MalformedPgoutputException(
      s"DML for relation $id before its Relation message"))

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

  /** Feed one binary message; returns the finished WAL line at Commit. */
  def feed(bytes: Array[Byte]): Option[String] = Pgoutput.parse(bytes) match {
    case Begin(_, _, x) =>
      xid = x; inTxn = true; changes.clear(); None
    case r: Relation =>
      relations(r.relationId) = r; None
    case Insert(oid, nt) =>
      val r = rel(oid)
      appendChange(s"""{"kind":"insert","schema":"${esc(r.namespace)}",""" +
        s""""table":"${esc(r.name)}",${newTupleArrays(r, nt)}}""")
      None
    case Update(oid, _, old, nt) =>
      val r = rel(oid)
      // no old tuple on the wire = key unchanged: wal2json still prints
      // oldkeys (the identity), recoverable from the NEW tuple's key
      // columns — UNLESS a key column arrived as unchanged-TOAST, whose
      // value the wire simply does not carry: reconstructing a null key
      // there would corrupt row identity silently (the lesson-14 class),
      // so fail loudly instead
      val oldT = old.getOrElse(r.columns.zip(nt).map {
        case (c, UnchangedToast) if c.isKey =>
          throw new Pgoutput.MalformedPgoutputException(
            s"key column ${c.name} of ${r.name} is unchanged-TOAST with no " +
              "old tuple — replica identity unrecoverable")
        case (c, v) if c.isKey => v
        case _ => NullValue
      })
      appendChange(s"""{"kind":"update","schema":"${esc(r.namespace)}",""" +
        s""""table":"${esc(r.name)}",${newTupleArrays(r, nt)},${oldKeys(r, oldT)}}""")
      None
    case Delete(oid, _, old) =>
      val r = rel(oid)
      appendChange(s"""{"kind":"delete","schema":"${esc(r.namespace)}",""" +
        s""""table":"${esc(r.name)}",${oldKeys(r, old)}}""")
      None
    case Commit(_, commitLsn, _, _) =>
      if (!inTxn) throw new Pgoutput.MalformedPgoutputException(
        "Commit outside a transaction")
      inTxn = false
      Some(s"""{"lsn":$commitLsn,"xid":$xid,"change":[$changes]}""")
    case Skipped(_) => None
  }
}
