package graft.sources.replication

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}

/**
 * The engine's WAL-line envelope vs real wal2json output.
 *
 * Real wal2json (format version 1, the reference's configuration —
 * ReplicationConfiguration.java:37) emits one JSON document per committed
 * transaction shaped `{"xid":N,"change":[...]}` — there is NO top-level
 * "lsn" member; the WAL position travels out-of-band on the replication
 * protocol (the reference reads it from the stream the same way,
 * PostgresConnector.java getLastReceiveLSN). The engine's envelope
 * ([[graft.model.Wal2Json.walLineSchema]]) requires `lsn` in-band so WAL
 * segments are self-describing and replayable.
 *
 * [[ensureLsn]] closes that gap at the ingest boundary: if the payload
 * already carries a top-level `lsn` (the synthetic endpoint and the
 * pgoutput transcoder inject their own), it passes through byte-for-byte;
 * otherwise the stream position is spliced in TEXTUALLY (no parse→
 * re-serialize round trip that could perturb nested JSON values).
 * Presence is checked with a streaming parser — top-level field names
 * only, children skipped — so a large transaction costs one shallow scan,
 * not a tree build.
 */
object WalEnvelope {
  private val factory = new JsonFactory()

  /** Does the payload's top-level object carry an "lsn" member?
    *
    * INVALID JSON that merely starts with '{' (e.g. `{bad}`) must answer
    * `false`, not throw: a JsonParseException escaping here would surface
    * from readPending, which the supervision taxonomy classifies as
    * Transient — burning the transient retry budget on deterministic
    * corrupt wire data. Answering false keeps the line malformed after the
    * splice, so the strict decoder rejects it under DataError where it
    * belongs. */
  private[replication] def hasTopLevelLsn(payload: String): Boolean = {
    val p = factory.createParser(payload)
    try {
      if (p.nextToken() != JsonToken.START_OBJECT) false
      else {
        var found = false
        var t = p.nextToken()
        while (!found && t == JsonToken.FIELD_NAME) {
          if (p.currentName() == "lsn") found = true
          else {
            p.nextToken() // move onto the value...
            p.skipChildren() // ...and skip it wholesale (no-op on scalars)
            t = p.nextToken()
          }
        }
        found
      }
    } catch {
      case _: com.fasterxml.jackson.core.JsonProcessingException => false
    } finally p.close()
  }

  /** Fold ONE transaction's wire units (binary pgoutput messages or v2
    * action lines) through a per-stream folder: the sequence must
    * complete exactly one parity line, which is position-spliced via
    * [[ensureLsn]] (a no-op for grammars that carry lsn in-band). Shared
    * by the synthetic endpoint's per-plugin arms and the driver-verified
    * decode queries — grammar #4 gets this for free. */
  def foldOne[A](units: Seq[A], feed: A => Option[String], lsn: Long): String =
    units.flatMap(feed(_)) match {
      case Seq(l) => ensureLsn(l, lsn)
      case other => throw new IllegalStateException(
        s"txn must fold into exactly one line, got ${other.size}")
    }

  /** Wrap a wal2json chunk with its stream position unless it already
    * carries one. Malformed (non-object) payloads pass through untouched —
    * strict-mode decode downstream is the single authority on rejecting
    * them (CLAUDE.md lesson 1: validation is its own query, never hidden
    * in a transform). */
  def ensureLsn(payload: String, lsn: Long): String = {
    val trimmed = payload.trim
    if (!trimmed.startsWith("{")) payload
    else if (hasTopLevelLsn(trimmed)) payload
    else {
      val rest = trimmed.substring(1).dropWhile(_.isWhitespace)
      if (rest.startsWith("}")) s"""{"lsn":$lsn}""" // empty object
      else s"""{"lsn":$lsn,${trimmed.substring(1)}"""
    }
  }
}
