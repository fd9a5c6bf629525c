package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String
import graft.model.Wal2Json

/**
 * Native Catalyst expression parsing one wal2json WAL line into the
 * [[Wal2Json.walLineSchema]] struct — a specialized replacement for
 * `from_json` on the engine's hottest path (every byte of a 10^10-event
 * stream flows through this decode).
 *
 * Why not Jackson (`from_json`): generic JSON parsing materializes a token
 * stream and per-field conversion machinery per row; this parser is a
 * single forward scan over the UTF8String's bytes with zero intermediate
 * tokens, allocating only the output values. Semantics match `from_json`
 * with the wal2json schema:
 *
 *  - unknown object keys are skipped (self-describing events may carry
 *    extra fields);
 *  - `columnvalues`/`keyvalues` elements are captured as their literal
 *    text for non-string scalars ("185.22", "true"), decoded text for
 *    strings, null for null — exactly `from_json`'s StringType behavior,
 *    including nested objects/arrays captured as raw JSON;
 *  - any structural error yields a NULL result row (PERMISSIVE), which the
 *    engine's explicit strict validation then surfaces
 *    (ChangeDecoder.malformedLines).
 *
 * Codegen: a real `doGenCode` (not CodegenFallback) — the generated code
 * calls the static parser directly on the child's UTF8String local, so the
 * expression stays INSIDE whole-stage codegen with no InternalRow
 * materialization and no per-row virtual `eval` dispatch (CodegenFallback
 * routes every row through `references[i].eval(INPUT_ROW)`, forcing the
 * input row to be constructed just to re-extract the one string).
 */
case class ParseWalLine(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = Wal2Json.walLineSchema
  override def nullable: Boolean = true
  override def prettyName: String = "parse_wal_line"

  override protected def withNewChildInternal(newChild: Expression): ParseWalLine =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    WalLineParser.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.WalLineParser$$.MODULE$$.parse($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
}

object ParseWalLine {
  /** Register `parse_wal_line` in the session's function registry (idempotent)
    * so it is usable from both the Column API (expr) and SQL. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "parse_wal_line", exprs => ParseWalLine(exprs.head), "built-in")

  /** Column form: parses a string column into the walLineSchema struct. */
  def parseWalLine(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("parse_wal_line", c)
  }
}

/** One-pass recursive-descent parser over the line's UTF-8 bytes. */
object WalLineParser {

  final class Malformed extends RuntimeException { override def fillInStackTrace(): Throwable = this }
  private val malformed = new Malformed
  /** Structural breakage INSIDE a nested json-typed value: Jackson's
    * copyCurrentStructure cannot resume past it, so parsing STOPS but the
    * envelope fields already parsed survive (measured: a mismatched
    * bracket in columnvalues yields {lsn, xid} from from_json — not a
    * whole-row null, not a recovered field). */
  final class Unresumable extends RuntimeException { override def fillInStackTrace(): Throwable = this }
  private val unresumable = new Unresumable
  /** Token-level JSON violations (bare words, leading-zero numbers, raw
    * control chars in strings): Jackson's tokenizer fails on these before
    * any value conversion, so PERMISSIVE nulls the WHOLE row — they must
    * bypass the per-field recovery that coercion failures get. */
  final class RowMalformed extends RuntimeException { override def fillInStackTrace(): Throwable = this }
  private val rowMalformed = new RowMalformed

  def parse(line: UTF8String): InternalRow = {
    val bytes = line.getBytes // materialized copy; single allocation
    try new P(bytes).parseTop()
    catch {
      case _: Malformed | _: RowMalformed =>
        // match from_json PERMISSIVE: structurally-broken input yields a
        // row of nulls; blank input yields NULL
        var k = 0; var blank = true
        while (k < bytes.length && blank) {
          val c = bytes(k)
          if (c != ' ' && c != '\t' && c != '\n' && c != '\r') blank = false
          k += 1
        }
        if (blank) null
        else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](null, null, null))
    }
  }

  private final class P(b: Array[Byte]) {
    private var i = 0
    private val n = b.length

    /** Field-level recovery, matching Spark's JSON partial-results mode: a
      * field whose value fails to parse becomes null, the scan skips the
      * raw value and continues; only structural breakage outside a field
      * value nulls the whole row. */
    private def fieldSafe[A >: Null](f: => A): A = {
      val save = i
      try f catch { case _: Malformed => i = save; skipValue(); null }
    }

    def parseTop(): InternalRow = {
      skipWs()
      expect('{')
      var lsn: Any = null
      var xid: Any = null
      var change: Any = null
      var first = true
      skipWs()
      if (peek() == '}') { i += 1; return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array(lsn, xid, change)) }
      try {
        while (true) {
          if (!first) expect(',')
          first = false
          skipWs()
          val key = parseString()
          skipWs(); expect(':'); skipWs()
          key.toString match {
            case "lsn" => lsn = fieldSafe(parseLong())
            case "xid" => xid = fieldSafe(parseLong())
            case "change" => change = fieldSafe(parseChangeArray())
            case _ => skipValue()
          }
          skipWs()
          if (peek() == '}') { i += 1
            return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array(lsn, xid, change))
          }
        }
        null // unreachable
      } catch {
        // unresumable nested breakage: parsing stops, fields completed
        // BEFORE the failure survive — Jackson's measured partial-results
        // shape ({lsn, xid} for a broken columnvalues structure)
        case _: Unresumable =>
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array(lsn, xid, change))
      }
    }

    private def parseChangeArray(): ArrayData = {
      expect('[')
      skipWs()
      if (peek() == ']') { i += 1; return new GenericArrayData(Array.empty[Any]) }
      val out = new scala.collection.mutable.ArrayBuffer[Any](4)
      var continue = true
      while (continue) {
        out += parseChange()
        skipWs()
        peek() match {
          case ',' => i += 1; skipWs()
          case ']' => i += 1; continue = false
          case _ => throw malformed
        }
      }
      new GenericArrayData(out.toArray)
    }

    private def parseChange(): InternalRow = {
      expect('{')
      var kind: Any = null; var schema: Any = null; var table: Any = null
      var names: Any = null; var types: Any = null; var values: Any = null
      var oldkeys: Any = null
      skipWs()
      if (peek() == '}') { i += 1 }
      else {
        var first = true
        var open = true
        while (open) {
          if (!first) { expect(',') }
          first = false
          skipWs()
          val key = parseString()
          skipWs(); expect(':'); skipWs()
          key.toString match {
            case "kind" => kind = fieldSafe(parseString())
            case "schema" => schema = fieldSafe(parseString())
            case "table" => table = fieldSafe(parseString())
            case "columnnames" => names = fieldSafe(parseStringArray())
            case "columntypes" => types = fieldSafe(parseStringArray())
            case "columnvalues" => values = fieldSafe(parseScalarArray())
            case "oldkeys" => oldkeys = fieldSafe(parseOldKeys())
            case _ => skipValue()
          }
          skipWs()
          if (peek() == '}') { i += 1; open = false }
        }
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array(kind, schema, table, names, types, values, oldkeys))
    }

    private def parseOldKeys(): InternalRow = {
      if (peek() == 'n') { parseNullLiteral(); return null }
      expect('{')
      var kn: Any = null; var kt: Any = null; var kv: Any = null
      skipWs()
      if (peek() == '}') { i += 1 }
      else {
        var first = true
        var open = true
        while (open) {
          if (!first) expect(',')
          first = false
          skipWs()
          val key = parseString()
          skipWs(); expect(':'); skipWs()
          key.toString match {
            case "keynames" => kn = fieldSafe(parseStringArray())
            case "keytypes" => kt = fieldSafe(parseStringArray())
            case "keyvalues" => kv = fieldSafe(parseScalarArray())
            case _ => skipValue()
          }
          skipWs()
          if (peek() == '}') { i += 1; open = false }
        }
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array(kn, kt, kv))
    }

    /** ["a","b",...] — strings only (columnnames/columntypes/keynames). */
    private def parseStringArray(): ArrayData = {
      if (peek() == 'n') { parseNullLiteral(); return null }
      expect('[')
      skipWs()
      if (peek() == ']') { i += 1; return new GenericArrayData(Array.empty[Any]) }
      val out = new scala.collection.mutable.ArrayBuffer[Any](8)
      var continue = true
      while (continue) {
        skipWs()
        out += (if (peek() == 'n') { parseNullLiteral(); null } else parseString())
        skipWs()
        peek() match {
          case ',' => i += 1
          case ']' => i += 1; continue = false
          case _ => throw malformed
        }
      }
      new GenericArrayData(out.toArray)
    }

    /** Mixed scalar array (columnvalues/keyvalues): strings decoded, other
      * scalars as literal text, nested structures as raw JSON — matching
      * from_json's StringType coercion. */
    private def parseScalarArray(): ArrayData = {
      if (peek() == 'n') { parseNullLiteral(); return null }
      expect('[')
      skipWs()
      if (peek() == ']') { i += 1; return new GenericArrayData(Array.empty[Any]) }
      val out = new scala.collection.mutable.ArrayBuffer[Any](8)
      var continue = true
      while (continue) {
        skipWs()
        out += (peek() match {
          case '"' => parseString()
          case 'n' => parseNullLiteral(); null
          case '{' | '[' => rawStructure()
          case _ => rawScalar()
        })
        skipWs()
        peek() match {
          case ',' => i += 1
          case ']' => i += 1; continue = false
          case _ => throw malformed
        }
      }
      new GenericArrayData(out.toArray)
    }

    // ---------------------------------------------------------- primitives

    private def peek(): Char = {
      if (i >= n) throw malformed
      b(i).toChar
    }

    private def expect(c: Char): Unit = {
      skipWs()
      if (i >= n || b(i) != c) throw malformed
      i += 1
    }

    private def skipWs(): Unit = {
      while (i < n && (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r')) i += 1
    }

    private def parseLong(): java.lang.Long = {
      skipWs()
      var neg = false
      if (peek() == '-') {
        neg = true; i += 1
        // '-' not followed by a digit is a TOKENIZER error in Jackson
        // (cannot resume => whole row nulls, measured), unlike a
        // wrong-typed-but-well-formed token (field-scoped)
        if (i >= n || b(i) < '0' || b(i) > '9') throw rowMalformed
      }
      if (i >= n || b(i) < '0' || b(i) > '9') throw malformed
      // Jackson's TOKENIZER rejects leading zeros ("007") before any
      // coercion => whole-row failure, unlike overflow (coercion-level,
      // field-scoped partial results)
      if (b(i) == '0' && i + 1 < n && b(i + 1) >= '0' && b(i + 1) <= '9')
        throw rowMalformed
      // accumulate in NEGATIVE space: |Long.MinValue| > Long.MaxValue, so
      // this admits exactly [-2^63, 2^63-1] and overflow-checks without
      // wrapping. Jackson (from_json) throws on out-of-range => field
      // nulled via fieldSafe; silent wrap would fabricate a wrong LSN.
      val limit = Long.MinValue / 10 // -922337203685477580
      var v = 0L
      while (i < n && b(i) >= '0' && b(i) <= '9') {
        val d = b(i) - '0'
        if (v < limit || (v == limit && d > 8)) throw malformed
        v = v * 10 - d
        i += 1
      }
      // integer followed by a fraction/exponent => not a clean long
      if (i < n && (b(i) == '.' || b(i) == 'e' || b(i) == 'E')) throw malformed
      if (!neg && v == Long.MinValue) throw malformed // 9223372036854775808
      java.lang.Long.valueOf(if (neg) v else -v)
    }

    private def parseNullLiteral(): Unit = {
      if (i + 4 <= n && b(i) == 'n' && b(i + 1) == 'u' && b(i + 2) == 'l' && b(i + 3) == 'l') i += 4
      else throw malformed
    }

    /** JSON string with full escape handling; returns decoded UTF8String. */
    private def parseString(): UTF8String = {
      if (peek() != '"') throw malformed
      i += 1
      val start = i
      // fast path: scan for end quote with no escapes. Raw control bytes
      // are tokenizer-fatal in Jackson (must be \u-escaped) => whole row.
      var j = i
      while (j < n && b(j) != '"' && b(j) != '\\') {
        if ((b(j) & 0xff) < 0x20) throw rowMalformed
        j += 1
      }
      if (j >= n) throw malformed
      if (b(j) == '"') { // no escapes: zero-copy slice
        i = j + 1
        return UTF8String.fromBytes(b, start, j - start)
      }
      // slow path with escapes
      val buf = new java.io.ByteArrayOutputStream(64)
      buf.write(b, start, j - start)
      i = j
      while (true) {
        if (i >= n) throw malformed
        b(i) match {
          case '"' => i += 1
            val arr = buf.toByteArray
            return UTF8String.fromBytes(arr, 0, arr.length)
          case '\\' =>
            i += 1
            if (i >= n) throw malformed
            b(i).toChar match {
              case '"' => buf.write('"'); i += 1
              case '\\' => buf.write('\\'); i += 1
              case '/' => buf.write('/'); i += 1
              case 'b' => buf.write('\b'); i += 1
              case 'f' => buf.write('\f'); i += 1
              case 'n' => buf.write('\n'); i += 1
              case 'r' => buf.write('\r'); i += 1
              case 't' => buf.write('\t'); i += 1
              case 'u' =>
                i += 1
                val cp0 = hex4()
                // Match Jackson + java.lang.String semantics exactly: each
                // \uXXXX is a UTF-16 code unit; a high half combines ONLY
                // with an immediately following low half, and any unpaired
                // half becomes '?' (what String.getBytes(UTF_8) emits).
                if (Character.isHighSurrogate(cp0.toChar) && i + 1 < n
                    && b(i) == '\\' && b(i + 1) == 'u') {
                  val save = i // the next escape: reprocess it unless it pairs
                  i += 2
                  val lo = hex4()
                  if (Character.isLowSurrogate(lo.toChar)) {
                    val s = new String(Character.toChars(
                      Character.toCodePoint(cp0.toChar, lo.toChar)))
                    buf.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
                  } else {
                    buf.write('?') // unpaired high half
                    i = save // the rejected escape may start its own pair
                  }
                } else if (Character.isSurrogate(cp0.toChar)) {
                  buf.write('?') // lone half with no following escape
                } else {
                  val s = new String(Character.toChars(cp0))
                  buf.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
                }
              case _ => throw malformed
            }
          case c =>
            if ((c & 0xff) < 0x20) throw rowMalformed // unescaped control byte
            buf.write(c); i += 1
        }
      }
      null // unreachable
    }

    private def hex4(): Int = {
      if (i + 4 > n) throw malformed
      var v = 0
      var k = 0
      while (k < 4) {
        val c = b(i).toChar
        val d =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else throw malformed
        v = v * 16 + d
        i += 1; k += 1
      }
      v
    }

    /** Non-string scalar (number/true/false): captured as its literal text.
      * Jackson accepts ONLY the JSON number grammar and the two boolean
      * literals here — bare words or leading-zero numbers error the row;
      * accepting them would make validation strictness depend on which
      * parser ran. */
    private def rawScalar(): UTF8String = {
      val start = i
      while (i < n && b(i) != ',' && b(i) != ']' && b(i) != '}' && b(i) != ' '
        && b(i) != '\t' && b(i) != '\n' && b(i) != '\r') i += 1
      if (i == start) throw malformed
      if (!isJsonScalarToken(start, i)) {
        // Empirical Jackson/from_json split: malformed NUMBERS (leading
        // zeros, bad fraction) fail the whole row; bare words ("abc",
        // "truefoo") recover at field scope (partial results).
        val c0 = b(start).toChar
        if (c0 == '-' || (c0 >= '0' && c0 <= '9')) throw rowMalformed
        throw malformed
      }
      UTF8String.fromBytes(b, start, i - start)
    }

    /** true | false | -?(0|[1-9][0-9]*)(.[0-9]+)?([eE][+-]?[0-9]+)? */
    private def isJsonScalarToken(start: Int, end: Int): Boolean = {
      def is(s: String): Boolean = {
        if (end - start != s.length) return false
        var k = 0
        while (k < s.length) {
          if (b(start + k) != s.charAt(k)) return false
          k += 1
        }
        true
      }
      if (is("true") || is("false")) return true
      var k = start
      if (k < end && b(k) == '-') k += 1
      if (k >= end) return false
      if (b(k) == '0') k += 1
      else if (b(k) >= '1' && b(k) <= '9') {
        while (k < end && b(k) >= '0' && b(k) <= '9') k += 1
      } else return false
      if (k < end && b(k) == '.') {
        k += 1
        val d0 = k
        while (k < end && b(k) >= '0' && b(k) <= '9') k += 1
        if (k == d0) return false
      }
      if (k < end && (b(k) == 'e' || b(k) == 'E')) {
        k += 1
        if (k < end && (b(k) == '+' || b(k) == '-')) k += 1
        val d0 = k
        while (k < end && b(k) >= '0' && b(k) <= '9') k += 1
        if (k == d0) return false
      }
      k == end
    }

    /** Nested object/array: compact JSON text — whitespace outside strings
      * is dropped AND strings are decoded then re-emitted with Jackson's
      * minimal escaping, matching from_json's StringType behavior exactly
      * (copyCurrentStructure re-serializes the subtree: an input "A"
      * becomes A, "\/" becomes /). Non-string tokens keep their literal
      * text (Jackson preserves number text).
      *
      * The subtree is GRAMMAR-VALIDATED (full recursive descent): Jackson's
      * copyCurrentStructure tokenizes it, so a mismatched bracket, missing
      * colon/value, trailing comma, or bad token fails from_json — a
      * depth-counting byte copy would instead ship the garbage into the
      * lake as a "valid" column value. Structural violations throw
      * [[Unresumable]] (parsing stops; envelope fields parsed before
      * survive — measured: both engines yield {lsn, xid} for a broken
      * nested value), malformed numbers stay whole-row, bare words stay
      * field-resumable — each outcome measured against from_json. */
    private def rawStructure(): UTF8String = {
      val buf = new java.io.ByteArrayOutputStream(64)
      copyStructure(buf)
      val arr = buf.toByteArray
      UTF8String.fromBytes(arr, 0, arr.length)
    }

    // STRUCTURAL grammar violations inside a nested value are UNRESUMABLE
    // (brackets/colon/comma/missing value — the tokenizer cannot skip past
    // them, so parsing stops and fields parsed before survive); TOKEN
    // errors keep their own classes: bad NUMBERS are whole-row
    // (RowMalformed), bare words are field-resumable (Malformed) —
    // all three outcomes measured against from_json.
    private def expectS(c: Char): Unit = {
      if (i >= n || b(i) != c) throw unresumable
      i += 1
    }

    private def copyStructure(buf: java.io.ByteArrayOutputStream): Unit = {
      skipWs()
      peek() match {
        case '{' => copyObject(buf)
        case '[' => copyArray(buf)
        case _ => throw unresumable
      }
    }

    private def copyJsonValue(buf: java.io.ByteArrayOutputStream): Unit = {
      skipWs()
      peek() match {
        case '{' => copyObject(buf)
        case '[' => copyArray(buf)
        case '"' =>
          val s = parseString()
          buf.write('"'); writeJsonEscaped(buf, s); buf.write('"')
        case 'n' =>
          try parseNullLiteral()
          catch { case _: Malformed => throw unresumable }
          buf.write('n'); buf.write('u'); buf.write('l'); buf.write('l')
        case c if c == '}' || c == ']' || c == ',' =>
          throw unresumable // missing value — structural, not a bad token
        case _ =>
          val s = rawScalar() // Malformed (bare word) / RowMalformed (number)
          val sb = s.getBytes
          buf.write(sb, 0, sb.length)
      }
    }

    private def copyObject(buf: java.io.ByteArrayOutputStream): Unit = {
      expectS('{'); buf.write('{')
      skipWs()
      if (peek() == '}') { i += 1; buf.write('}'); return }
      var first = true
      while (true) {
        if (!first) { skipWs(); expectS(','); buf.write(',') }
        first = false
        skipWs()
        val key =
          try parseString()
          catch { case _: Malformed => throw unresumable }
        buf.write('"'); writeJsonEscaped(buf, key); buf.write('"')
        skipWs(); expectS(':'); buf.write(':')
        copyJsonValue(buf)
        skipWs()
        if (peek() == '}') { i += 1; buf.write('}'); return }
        if (peek() != ',') throw unresumable
      }
    }

    private def copyArray(buf: java.io.ByteArrayOutputStream): Unit = {
      expectS('['); buf.write('[')
      skipWs()
      if (peek() == ']') { i += 1; buf.write(']'); return }
      var first = true
      while (true) {
        if (!first) { skipWs(); expectS(','); buf.write(',') }
        first = false
        copyJsonValue(buf)
        skipWs()
        if (peek() == ']') { i += 1; buf.write(']'); return }
        if (peek() != ',') throw unresumable
      }
    }

    /** The escaping Spark's nested-structure re-serialization produces:
      * mandatory + shorthand escapes, and EVERY non-ASCII char as an
      * uppercase \uXXXX per UTF-16 code unit (surrogate pairs become two
      * escapes) — measured against from_json, which escapes non-ASCII in
      * copied nested structures though not in top-level string values. */
    private def writeJsonEscaped(buf: java.io.ByteArrayOutputStream,
                                 s: UTF8String): Unit = {
      val str = s.toString
      val hex = "0123456789ABCDEF"
      def u(c: Char): Unit = {
        buf.write('\\'); buf.write('u')
        buf.write(hex.charAt((c >> 12) & 0xf)); buf.write(hex.charAt((c >> 8) & 0xf))
        buf.write(hex.charAt((c >> 4) & 0xf)); buf.write(hex.charAt(c & 0xf))
      }
      var k = 0
      while (k < str.length) {
        val c = str.charAt(k)
        if (c == '"') { buf.write('\\'); buf.write('"') }
        else if (c == '\\') { buf.write('\\'); buf.write('\\') }
        else if (c == '\b') { buf.write('\\'); buf.write('b') }
        else if (c == '\f') { buf.write('\\'); buf.write('f') }
        else if (c == '\n') { buf.write('\\'); buf.write('n') }
        else if (c == '\r') { buf.write('\\'); buf.write('r') }
        else if (c == '\t') { buf.write('\\'); buf.write('t') }
        else if (c < 0x20 || c > 0x7f) u(c)
        else buf.write(c)
        k += 1
      }
    }

    /** Skip any JSON value (unknown keys, and field-recovery re-scans).
      * Deliberately LENIENT on scalar tokens: this path only needs to move
      * past a value — re-validating would re-throw the very error the
      * field recovery is trying to absorb. */
    private def skipValue(): Unit = {
      skipWs()
      peek() match {
        case '"' => parseString()
        case '{' | '[' => skipStructureLenient()
        case 'n' => parseNullLiteral()
        case _ =>
          val start = i
          while (i < n && b(i) != ',' && b(i) != ']' && b(i) != '}' && b(i) != ' '
            && b(i) != '\t' && b(i) != '\n' && b(i) != '\r') i += 1
          if (i == start) throw malformed
      }
    }

    /** Depth-counting skip with NO grammar validation: skipValue exists to
      * reposition after a field-level recovery — re-validating here would
      * re-throw the very error the recovery is absorbing (the validated
      * copy is rawStructure's job, for values that get KEPT). */
    private def skipStructureLenient(): Unit = {
      var depth = 0
      var inStr = false
      while (i < n) {
        val c = b(i)
        if (inStr) {
          if (c == '\\') { i += 1 }
          else if (c == '"') inStr = false
        } else c.toChar match {
          case '"' => inStr = true
          case '{' | '[' => depth += 1
          case '}' | ']' =>
            depth -= 1
            if (depth == 0) { i += 1; return }
          case _ => ()
        }
        i += 1
      }
      throw malformed
    }
  }
}
