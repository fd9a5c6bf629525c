package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.cli.Main
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.sources.WalSource

/**
 * The custom DSv2 streaming source (`graft-wal`): segment-count offsets,
 * partition-per-segment planning, resume, and end-to-end use as the
 * pipeline's WAL tail (reference O1/O2/O3 as source machinery).
 */
class WalSourceSpec extends SparkSpec {

  val cfg = GenConfig(seed = 21L, nRepos = 10, pathsPerRepo = 4, maxChangesPerTxn = 2)

  test("segment listing is ordered and ignores foreign/partial files") {
    val dir = tmpDir("wal")
    ChangeStreamGen.writeSegments(spark, cfg, dir, 90L, txnsPerSegment = 30)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/wal-000000099.jsonl.tmp-x"), "partial")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/unrelated.txt"), "junk")
    assert(WalSource.listSegments(dir) ===
      Seq("wal-000000000.jsonl", "wal-000000001.jsonl", "wal-000000002.jsonl"))
  }

  test("streaming read delivers every WAL line exactly once, then resumes") {
    val dir = tmpDir("wal"); val ckpt = tmpDir("ckpt")
    ChangeStreamGen.writeSegments(spark, cfg, dir, 60L, txnsPerSegment = 20)

    def runOnce(): Long = {
      var total = 0L
      val q = spark.readStream.format("graft-wal").load(dir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
          total += df.count())
        .start()
      q.awaitTermination()
      total
    }

    assert(runOnce() === 60L)           // one line per txn
    assert(runOnce() === 0L)            // nothing new => no batch content
    ChangeStreamGen.writeSegments(spark, cfg, dir, 100L, txnsPerSegment = 20)
    assert(runOnce() === 40L)           // only the two appended segments
  }

  test("end-to-end: CDC pipeline over the graft-wal source matches the oracle") {
    val dir = tmpDir("wal"); val ckpt = tmpDir("ckpt")
    ChangeStreamGen.writeSegments(spark, cfg, dir, 120L, txnsPerSegment = 40)
    val table = new LakeTable(spark, tmpDir("repos"))
    table.create(Main.reposSchema, Seq("repo", "path"), 4, Main.reposRenameMap)

    val pipe = new graft.streaming.CdcPipeline(spark, dir, ckpt,
      Seq(graft.streaming.TableTarget("repos", table, Main.reposSchema,
        Seq("repo", "path"), 4, Main.reposRenameMap)), Set("repos"))
    val q = spark.readStream.format("graft-wal").load(dir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
        pipe.processBatch(df, id))
      .start()
    q.awaitTermination()

    def sha256(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val exp = ChangeStreamGen.expectedFinalState(cfg, 120L)
      .map { case (k, ch) => k -> sha256(ch.content) }
    val got = table.read()
      .select(col("repo"), col("path"), sha2(col("content"), 256)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(got === exp)
  }
}
