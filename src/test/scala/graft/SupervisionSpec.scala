package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.cli.Main
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.streaming.{CdcPipeline, TableTarget}

/**
 * Supervision (reference O13/O14): a failed streaming run restarts from the
 * checkpoint; replayed work is a fenced no-op; a poisoned input heals after
 * the cause is fixed; a persistent failure exhausts the budget and
 * propagates.
 */
class SupervisionSpec extends SparkSpec {

  val cfg = GenConfig(seed = 51L, nRepos = 8, pathsPerRepo = 3, maxChangesPerTxn = 2)

  private def mkPipe(wal: String, ckpt: String, t: LakeTable) =
    new CdcPipeline(spark, wal, ckpt, Seq(
      TableTarget("repos", t, Main.reposSchema, Seq("repo", "path"), 4, Main.reposRenameMap)),
      Set("repos"), maxFilesPerTrigger = Some(1))

  private def sha256(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("poisoned segment: fail, heal on restart, converge (reference retry loop)") {
    val wal = tmpDir("wal"); val ckpt = tmpDir("ckpt")
    ChangeStreamGen.writeSegments(spark, cfg, wal, 60L, txnsPerSegment = 20)
    // poison the middle segment
    val seg1 = Paths.get(s"$wal/wal-000000001.jsonl")
    val good = Files.readString(seg1)
    Files.writeString(seg1, good + "{\"garbage\": true}\n")

    val t = new LakeTable(spark, tmpDir("repos"))
    val pipe = mkPipe(wal, ckpt, t)
    val restarts = pipe.runSupervised(maxRestarts = 2, backoffMs = 10L,
      onRestart = _ => Files.writeString(seg1, good)) // operator fixes the WAL
    assert(restarts === 1)

    val exp = ChangeStreamGen.expectedFinalState(cfg, 60L)
      .map { case (k, c) => k -> sha256(c.content) }
    val got = t.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(got === exp)
    // segment 0 applied once, before the failure; not re-applied after restart
    assert(t.currentSnapshot.get.lsnHighWatermark === 60L)
  }

  test("error taxonomy: malformed input, fencing contention, flakes classify apart") {
    import graft.streaming.CdcPipeline.{classify, FailureKind}
    val malformed = new IllegalArgumentException(
      "batch 3 contains 2 malformed wal2json line(s): {...}")
    assert(classify(malformed) === FailureKind.DataError)
    // streaming wraps the batch failure — the cause chain must be walked
    assert(classify(new RuntimeException("query failed", malformed))
      === FailureKind.DataError)
    assert(classify(new RuntimeException("outer",
      new graft.lake.CommitConflictException("snapshot 7 already committed")))
      === FailureKind.Contention)
    assert(classify(new java.io.IOException("connection reset"))
      === FailureKind.Transient)
    // self-caused exceptions must not loop the classifier
    val selfRef = new RuntimeException("x")
    assert(classify(selfRef) === FailureKind.Transient)
    // an ANSI typed-key cast failure is DETERMINISTIC bad data, not a
    // flake: a real CAST_INVALID_INPUT raised by the engine must classify
    // as DataError (wrapped, like streaming delivers it)
    import spark.implicits._
    val castErr = intercept[Exception] {
      Seq("abc").toDF("v").selectExpr("CAST(v AS INT)").collect()
    }
    assert(classify(new RuntimeException("query failed", castErr))
      === FailureKind.DataError)
  }

  test("in-plan strict raise_error classifies as DataError (message-prefix coupling)") {
    // The classifier's text fallback and ChangeDecoder's raise_error guards
    // share MalformedMessagePrefix; this pins the coupling with a REAL
    // in-plan failure so a reword in either place fails loudly here instead
    // of silently burning the Transient budget on deterministic bad input.
    import graft.streaming.CdcPipeline.{classify, FailureKind}
    import spark.implicits._
    val bad = Seq("{\"garbage\": true}").toDF("value")
    val e = intercept[Exception] {
      graft.decode.ChangeDecoder.decode(bad, strict = true).collect()
    }
    assert(classify(new RuntimeException("query failed", e))
      === FailureKind.DataError)
  }

  test("per-class budgets: a data error cannot eat the contention budget") {
    val wal = tmpDir("wal"); val ckpt = tmpDir("ckpt")
    ChangeStreamGen.writeSegments(spark, cfg, wal, 20L, txnsPerSegment = 20)
    Files.writeString(Paths.get(s"$wal/wal-000000000.jsonl"),
      "{\"garbage\": true}\n")
    val t = new LakeTable(spark, tmpDir("repos"))
    val pipe = mkPipe(wal, ckpt, t)
    var attempts = 0
    intercept[Exception] {
      // contentionRestarts is huge; the DataError budget (maxRestarts=1)
      // must still stop the loop after exactly one restart
      pipe.runSupervised(maxRestarts = 1, backoffMs = 10L,
        contentionRestarts = 1000, onRestart = _ => attempts += 1)
    }
    assert(attempts === 1)
  }

  test("persistent failure exhausts the restart budget and propagates") {
    val wal = tmpDir("wal"); val ckpt = tmpDir("ckpt")
    ChangeStreamGen.writeSegments(spark, cfg, wal, 20L, txnsPerSegment = 20)
    Files.writeString(Paths.get(s"$wal/wal-000000000.jsonl"),
      "{\"garbage\": true}\n")
    val t = new LakeTable(spark, tmpDir("repos"))
    val pipe = mkPipe(wal, ckpt, t)
    intercept[Exception] {
      pipe.runSupervised(maxRestarts = 1, backoffMs = 10L)
    }
    assert(t.read().count() === 0) // nothing partially applied
  }
}
