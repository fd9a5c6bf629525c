package graft

import org.apache.spark.sql.functions._
import graft.decode.ChangeDecoder
import graft.functions.ParseWalLine
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.model.Wal2Json

/**
 * The native wal2json parser must be observationally identical to
 * from_json(walLineSchema) — on generated streams, hand-written edge cases,
 * and malformed garbage (where both yield NULL rows).
 */
class ParseWalLineSpec extends SparkSpec {
  import spark.implicits._

  private def bothParses(lines: Seq[String]): (Array[String], Array[String]) = {
    val df = spark.createDataset(lines).toDF("value")
    ParseWalLine.register(spark)
    val native = df.select(to_json(call_function("parse_wal_line", col("value"))).as("j"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    val jackson = df.select(to_json(from_json(col("value"), Wal2Json.walLineSchema)).as("j"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    (native, jackson)
  }

  test("parity with from_json on a generated stream (incl. schema evolution)") {
    val cfg = GenConfig(seed = 77L, nRepos = 30, pathsPerRepo = 6,
      addColumnAtLsn = 200L, renameAtLsn = 350L)
    val lines = (0L until 500L).map(id =>
      ChangeStreamGen.renderLine(cfg, ChangeStreamGen.txn(cfg, id)))
    val (n, j) = bothParses(lines)
    assert(n.length === j.length)
    n.zip(j).zipWithIndex.foreach { case ((a, b), idx) =>
      assert(a === b, s"line $idx: ${lines(idx).take(120)}")
    }
  }

  test("parity on edge cases: escapes, unicode, nested values, field order, extras") {
    val cases = Seq(
      // escapes incl. \uXXXX and surrogate pair, tab/newline
      """{"lsn":1,"xid":2,"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["a"],"columntypes":["text"],"columnvalues":["q\"\\\/\b\f\n\r\tzé😀"]}]}""",
      // non-string scalars keep literal text; null stays null
      """{"lsn":1,"xid":2,"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["a","b","c","d"],"columntypes":["t","t","t","t"],"columnvalues":[185.22,true,null,-42]}]}""",
      // nested object/array captured as raw JSON
      """{"lsn":1,"xid":2,"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["a","b"],"columntypes":["json","json"],"columnvalues":[{"k": [1, "x"]},[1,2,3]]}]}""",
      // reordered fields + unknown extras are skipped
      """{"change":[{"table":"t","unknown":{"deep":[1,2]},"kind":"delete","oldkeys":{"keyvalues":[7],"keynames":["id"],"keytypes":["integer"]},"schema":"s"}],"xid":3147483647,"lsn":99}""",
      // empty change array; whitespace everywhere
      """ { "lsn" : 5 , "xid" : 6 , "change" : [ ] } """,
      // missing fields => nulls
      """{"lsn":7}""",
      """{"xid":8,"change":[]}""",
      // null oldkeys / null arrays
      """{"lsn":1,"xid":2,"change":[{"kind":"delete","schema":"s","table":"t","oldkeys":null}]}""",
      """{"lsn":1,"xid":2,"change":[{"kind":"insert","schema":"s","table":"t","columnnames":null,"columntypes":null,"columnvalues":null}]}""",
      // surrogate-pair edges: valid pair via \u escapes, high half followed
      // by a non-low escape, lone high half, lone low half, high-high-low
      // chain (the middle pair must still combine), half at end of string
      """{"lsn":1,"xid":2,"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["a"],"columntypes":["t"],"columnvalues":["😀ok"]}]}""",
      """{"lsn":1,"xid":2,"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["a"],"columntypes":["t"],"columnvalues":["\ud83dAtail"]}]}""",
      """{"lsn":1,"xid":2,"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["a"],"columntypes":["t"],"columnvalues":["x\ud83dy"]}]}""",
      """{"lsn":1,"xid":2,"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["a"],"columntypes":["t"],"columnvalues":["x\ude00y"]}]}""",
      """{"lsn":1,"xid":2,"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["a"],"columntypes":["t"],"columnvalues":["\ud83d😀z"]}]}""",
      """{"lsn":1,"xid":2,"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["a"],"columntypes":["t"],"columnvalues":["end\ud83d"]}]}""",
      // escape sequences INSIDE nested structures must re-serialize the way
      // Jackson does (decode + minimal re-escape), not copy verbatim
      """{"lsn":1,"xid":2,"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["a"],"columntypes":["json"],"columnvalues":[{"k":"A\/q\n"}]}]}""",
      """{"lsn":1,"xid":2,"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["a"],"columntypes":["json"],"columnvalues":[["😀", "tab\there"]]}]}""")
    val (n, j) = bothParses(cases)
    n.zip(j).zipWithIndex.foreach { case ((a, b), idx) =>
      assert(a === b, s"case $idx: ${cases(idx).take(120)}")
    }
  }

  test("malformed inputs yield NULL rows, matching from_json PERMISSIVE") {
    val cases = Seq(
      "", "not json", "[1,2,3]", "{", """{"lsn": }""", """{"lsn":1 "xid":2}""",
      """{"lsn":1.5,"xid":2,"change":[]}""", // non-integer lsn
      """{"lsn":1,"xid":2,"change":{"kind":"x"}}""", // change not an array
      """{"lsn":1,"xid":2,"change":[{"kind":"insert","columnnames":"nope"}]}""",
      // invalid scalar tokens: Jackson rejects bare words and leading-zero
      // numbers — the native parser must not be more lenient
      """{"lsn":007,"xid":2,"change":[]}""",
      """{"lsn":1,"xid":2,"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["a"],"columntypes":["t"],"columnvalues":[abc]}]}""",
      """{"lsn":1,"xid":2,"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["a"],"columntypes":["t"],"columnvalues":[truefoo]}]}""",
      """{"lsn":1,"xid":2,"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["a"],"columntypes":["t"],"columnvalues":[01.5]}]}""") ++ Seq(
      // raw (unescaped) control byte inside a string: tokenizer-fatal
      s"""{"lsn":1,"xid":2,"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["a"],"columntypes":["t"],"columnvalues":["ctrl${1.toChar}here"]}]}""",
      s"""{"lsn":1,"xid":2,"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["a"],"columntypes":["json"],"columnvalues":[{"k":"tab${9.toChar}raw"}]}]}""")
    val (n, j) = bothParses(cases)
    // cases where Jackson recovers at FIELD scope (envelope stays intact:
    // a string columnnames, bare-word scalars inside columnvalues)
    val envelopeIntact = Set(8, 10, 11)
    n.zip(j).zipWithIndex.foreach { case ((a, b), idx) =>
      assert(a === b, s"case $idx: '${cases(idx)}' native=$a jackson=$b")
      // PIN THE PREMISE, not just parity: every other case must actually
      // break the envelope (lsn/xid/change lost => the pipeline's
      // malformed predicate fires) — parity alone would also pass if both
      // parsers wrongly ACCEPTED the input (to_json omits null fields)
      val broken = b == null ||
        !(b.contains("\"lsn\"") && b.contains("\"xid\"") && b.contains("\"change\""))
      assert(broken === !envelopeIntact(idx),
        s"case $idx malformed-premise violated: '$b'")
    }
  }

  test("nested-structure grammar parity: broken nested JSON matches from_json exactly") {
    // Jackson TOKENIZES nested json-typed values (copyCurrentStructure), so
    // structural garbage can never ship as a "valid" column value; the
    // native validator reproduces the measured outcomes: structural breaks
    // are unresumable (fields parsed BEFORE survive: {lsn, xid}), malformed
    // NUMBER tokens null the whole row, valid subtrees re-serialize
    // compactly with identical escaping
    val pre = """{"lsn":1,"xid":2,"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["a"],"columntypes":["json"],"columnvalues":["""
    val post = """]}]}"""
    val cases = Seq(
      pre + """{"k":1]""" + post,   // mismatched close inside object
      pre + """{"a":}""" + post,    // missing value
      pre + """[1}""" + post,       // mismatched close inside array
      pre + """{"k" 1}""" + post,   // missing colon
      pre + """[1,]""" + post,      // trailing comma
      pre + """{"k":007}""" + post, // nested leading-zero number
      """{"bogus":{"a":]},"lsn":5,"xid":6,"change":[]}""", // broken under unknown key
      """{"lsn":1,"xid":-x,"change":[]}""", // '-' without digits
      pre + """{"ok":true,"n":[1,2,{"d":null}],"s":"x\ud83dy"}""" + post, // valid
      pre + "12.5, true, null" + post) // valid scalar mix
    val (n, j) = bothParses(cases)
    n.zip(j).zipWithIndex.foreach { case ((a, b), idx) =>
      assert(a === b, s"case $idx: '${cases(idx).take(110)}' native=$a jackson=$b")
    }
  }

  test("64-bit overflow parity: out-of-range integers null the field like Jackson") {
    val cases = Seq(
      // 2^63 (one past Long.MaxValue): Jackson coercion fails => field null
      """{"lsn":9223372036854775808,"xid":2,"change":[]}""",
      // far past: 20+ digits must not silently wrap to an arbitrary LSN
      """{"lsn":99999999999999999999,"xid":2,"change":[]}""",
      """{"lsn":1,"xid":184467440737095516160,"change":[]}""",
      // exact bounds still parse
      """{"lsn":9223372036854775807,"xid":-9223372036854775808,"change":[]}""")
    val (n, j) = bothParses(cases)
    n.zip(j).zipWithIndex.foreach { case ((a, b), idx) =>
      assert(a === b, s"case $idx: '${cases(idx)}' native=$a jackson=$b")
    }
  }

  test("engine parity: decode(native) == decode(from_json) on a real stream") {
    val cfg = GenConfig(seed = 13L, nRepos = 10, pathsPerRepo = 4)
    val lines = (0L until 200L).map(id =>
      ChangeStreamGen.renderLine(cfg, ChangeStreamGen.txn(cfg, id)))
    val df = spark.createDataset(lines).toDF("value")
    val a = ChangeDecoder.decode(df, nativeParser = true)
      .select(to_json(struct(col("*")))).collect().map(_.getString(0)).sorted
    val b = ChangeDecoder.decode(df, nativeParser = false)
      .select(to_json(struct(col("*")))).collect().map(_.getString(0)).sorted
    assert(a.toSeq === b.toSeq)
  }
}
