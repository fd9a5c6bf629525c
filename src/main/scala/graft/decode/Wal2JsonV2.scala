package graft.decode

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}

/**
 * wal2json FORMAT-VERSION 2 — the THIRD plugin grammar (after wal2json v1
 * and pgoutput v1/v2). Real-world v2 (the plugin's `format-version=2`
 * option, public wal2json documentation) emits ONE JSON document per
 * ACTION, not per transaction:
 *
 * {{{
 *   {"action":"B","xid":123}
 *   {"action":"I","schema":"public","table":"t",
 *    "columns":[{"name":"id","type":"integer","value":1}, ...]}
 *   {"action":"U", ..., "columns":[...], "identity":[{...}, ...]}
 *   {"action":"D", ..., "identity":[...]}
 *   {"action":"C"}
 * }}}
 *
 * — which is how large transactions stream without a single giant
 * document. The reference consumes v1 only (ReplicationConfiguration
 * .java:37); the engine supports both, folding v2 back to the v1-parity
 * envelope at the sequential ingest boundary (the same seam the pgoutput
 * transcoder uses), so EVERYTHING downstream stays plugin-agnostic.
 *
 * Like real v1 output, the folded line carries NO top-level lsn — the
 * position is protocol-side and spliced in by
 * [[graft.sources.replication.WalEnvelope.ensureLsn]] at the boundary
 * (CLAUDE.md lesson 25). `xid` is REQUIRED on B (the engine always sends
 * `include-xids`); unknown EXTRA fields on any action (timestamps from
 * `include-timestamp`, lsn from `include-lsn`, ...) are tolerated —
 * option drift must not break decode — but unknown ACTIONS fail loud.
 */
object Wal2JsonV2 {
  final class MalformedWal2JsonV2Exception(msg: String)
    extends RuntimeException(s"malformed wal2json v2: $msg")
}

/**
 * Stateful per-stream folder: one [[feed]] per wire line, emitting the
 * v1-parity transaction line when `C` closes the open transaction.
 * Sequential by construction (one replication stream = one transcoder),
 * exactly like [[PgoutputTranscoder]]. [[reset]] before (re)attaching to
 * a stream — the slot redelivers from transaction start, and a leftover
 * open transaction would misclassify the redelivered B as a framing
 * violation (the pgoutput reopen lesson, CLAUDE.md lesson 25).
 */
final class Wal2JsonV2Transcoder(truncateSkippable: String => Boolean =
                                   _ => false) {
  import Wal2JsonV2._

  // USE_BIG_DECIMAL_FOR_FLOATS: numeric column values re-render via
  // renderValue's v.toString — a DoubleNode would round >17-significant-
  // digit numerics (0.12345678901234567890123456789 prints as
  // 0.12345678901234568), silently corrupting high-precision values on
  // this grammar alone while v1/pgoutput stay exact. DecimalNode.toString
  // preserves the exact decimal text, including inside nested json/jsonb.
  private val mapper = new ObjectMapper()
    .configure(DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS, true)
  private var xid: Long = -1L
  private var inTxn = false
  private val changes = new StringBuilder

  private def fail(msg: String): Nothing =
    throw new MalformedWal2JsonV2Exception(msg)

  private def esc(s: String): String = graft.util.Json.escape(s)

  def feed(line: String): Option[String] = {
    val n =
      try mapper.readTree(line)
      catch { case e: Exception => fail(s"unparseable action line: ${e.getMessage}") }
    if (n == null || !n.isObject) fail("action line is not a JSON object")
    Option(n.get("action")).map(_.asText()).getOrElse(
      fail("missing \"action\"")) match {
      case "B" =>
        // a B with a txn already open means its C was lost — the buffered
        // changes would vanish silently if we just clear()ed
        if (inTxn) fail(s"B inside an open transaction $xid")
        xid = Option(n.get("xid")).filter(_.canConvertToLong).map(_.asLong())
          .getOrElse(fail("B without integral xid — the engine requires include-xids"))
        inTxn = true; changes.clear(); None
      case "C" =>
        if (!inTxn) fail("C outside a transaction")
        inTxn = false
        Some(s"""{"xid":$xid,"change":[$changes]}""")
      case a @ ("I" | "U" | "D") =>
        // a lost/reordered B must not silently drop changes into a stale
        // buffer the next B clears
        if (!inTxn) fail(s"$a outside a transaction")
        appendChange(renderAction(a, n)); None
      case "T" =>
        // TRUNCATE cannot be expressed as keyed changes — skipping one on
        // a CONSUMED table would leave the lake/mirror silently diverged
        // from a truncated source (publications include truncate by
        // DEFAULT). But a FOR-ALL-TABLES publication also carries
        // truncates of tables the pipeline never consumes: failing on
        // those would wedge ingestion of EVERY table permanently
        // (DataError never retries; the LSN is never acked) over a change
        // that cannot affect the lake. Skip the irrelevant ones; fail
        // typed on consumed ones — repair = exclude truncate from the
        // publication (`WITH (publish = 'insert, update, delete')`) or
        // resync the table.
        if (!inTxn) fail("T outside a transaction")
        val table = textField(n, "table", "T")
        if (truncateSkippable(table)) None
        else fail(s"TRUNCATE of consumed table $table is not applicable " +
          "as keyed changes — exclude truncate from the publication or " +
          "resync the table")
      case "M" => None // logical message: no row change
      case other => fail(s"unknown action '$other'")
    }
  }

  /** Drop any in-flight transaction state (reconnect redelivery). */
  def reset(): Unit = { xid = -1L; inTxn = false; changes.clear() }

  private def appendChange(body: String): Unit = {
    if (changes.nonEmpty) changes.append(',')
    changes.append(body)
  }

  private def textField(n: JsonNode, f: String, where: String): String =
    Option(n.get(f)).filter(_.isTextual).map(_.asText())
      .getOrElse(fail(s"$where without textual \"$f\""))

  /** One v2 value node rendered as the v1-parity JSON token. Strings are
    * re-escaped through the SHARED [[graft.util.Json.escape]] (Jackson's
    * own serializer shorthands \b and \f where the engine's convention
    * \u-escapes them — byte parity with the v1 generator and the pgoutput
    * transcoder requires one escaper). Numbers, booleans, and null pass
    * through; nested objects/arrays (json/jsonb columns) re-serialize
    * compactly — the same compact nested-JSON text the native parser
    * produces (CLAUDE.md lesson 6). */
  private def renderValue(v: JsonNode): String =
    if (v == null || v.isNull) "null"
    else if (v.isTextual) "\"" + esc(v.textValue()) + "\""
    else v.toString

  /** The `columns`/`identity` entry arrays folded to the v1 triple. */
  private def tripleOf(arr: JsonNode, where: String)
      : (Seq[String], Seq[String], Seq[String]) = {
    if (arr == null || !arr.isArray) fail(s"$where is not an array")
    val it = arr.elements()
    val names = Seq.newBuilder[String]
    val types = Seq.newBuilder[String]
    val values = Seq.newBuilder[String]
    while (it.hasNext) {
      val c = it.next()
      if (!c.isObject) fail(s"$where entry is not an object")
      names += "\"" + esc(textField(c, "name", where)) + "\""
      types += "\"" + esc(textField(c, "type", where)) + "\""
      values += renderValue(c.get("value"))
    }
    (names.result(), types.result(), values.result())
  }

  private def renderAction(a: String, n: JsonNode): String = {
    val kind = a match {
      case "I" => "insert"
      case "U" => "update"
      case "D" => "delete"
    }
    val sb = new StringBuilder(256)
    sb.append("{\"kind\":\"").append(kind)
      .append("\",\"schema\":\"").append(esc(textField(n, "schema", a)))
      .append("\",\"table\":\"").append(esc(textField(n, "table", a)))
      .append('"')
    if (a != "D") {
      val (names, types, values) = tripleOf(n.get("columns"), s"$a columns")
      sb.append(",\"columnnames\":[").append(names.mkString(","))
        .append("],\"columntypes\":[").append(types.mkString(","))
        .append("],\"columnvalues\":[").append(values.mkString(",")).append(']')
    }
    if (a != "I") {
      val id = n.get("identity")
      if (id == null) {
        // REPLICA IDENTITY NOTHING: an update still applies via its new
        // tuple's key columns (the decoder's keyFromOld coalesce), but a
        // delete without identity names NO row — unapplicable, and
        // inventing one would delete the wrong row. Fail loud.
        if (a == "D") fail(
          "D without identity (replica identity nothing?) names no row")
      } else {
        val (names, types, values) = tripleOf(id, s"$a identity")
        sb.append(",\"oldkeys\":{\"keynames\":[").append(names.mkString(","))
          .append("],\"keytypes\":[").append(types.mkString(","))
          .append("],\"keyvalues\":[").append(values.mkString(",")).append("]}")
      }
    }
    sb.append('}')
    sb.toString
  }
}
