package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.cli.Main
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.sources.WalSource

/**
 * The custom DSv2 streaming source (`graft-wal`): segment-NAME offsets,
 * byte-range split planning, resume under retention/deletion, and
 * end-to-end use as the pipeline's WAL tail (reference O1/O2/O3 + the
 * LSN-ack WAL release as source machinery).
 */
class WalSourceSpec extends SparkSpec {

  val cfg = GenConfig(seed = 21L, nRepos = 10, pathsPerRepo = 4, maxChangesPerTxn = 2)

  private def runCount(dir: String, ckpt: String,
                       options: Map[String, String] = Map.empty): (Long, Int) = {
    var total = 0L
    var parts = 0
    val reader = spark.readStream.format("graft-wal")
    options.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load(dir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        parts = math.max(parts, df.rdd.getNumPartitions)
        total += df.count()
      }
      .start()
    q.awaitTermination()
    (total, parts)
  }

  test("resume is immune to deletion of already-consumed segments") {
    val dir = tmpDir("wal"); val ckpt = tmpDir("ckpt")
    ChangeStreamGen.writeSegments(spark, cfg, dir, 60L, txnsPerSegment = 20)
    assert(runCount(dir, ckpt)._1 === 60L)
    // retention/repair removes two consumed segments: name-based offsets
    // must keep meaning the same thing (positional offsets would shift,
    // re-reading consumed data or skipping the new tail)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/wal-000000000.jsonl"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/wal-000000001.jsonl"))
    ChangeStreamGen.writeSegments(spark, cfg, dir, 100L, txnsPerSegment = 20)
    assert(runCount(dir, ckpt)._1 === 40L) // exactly the two appended segments
  }

  test("retention=delete prunes consumed segments, resume stays exactly-once") {
    val dir = tmpDir("wal"); val ckpt = tmpDir("ckpt")
    ChangeStreamGen.writeSegments(spark, cfg, dir, 60L, txnsPerSegment = 20)
    val opts = Map("retention" -> "delete")
    assert(runCount(dir, ckpt, opts)._1 === 60L)
    // release happens when the NEXT trigger observes the committed offset
    assert(runCount(dir, ckpt, opts)._1 === 0L) // nothing re-read
    assert(WalSource.listSegments(dir).isEmpty) // acked WAL released
    ChangeStreamGen.writeSegments(spark, cfg, dir, 100L, txnsPerSegment = 20)
    assert(runCount(dir, ckpt, opts)._1 === 40L) // only the new tail
    assert(runCount(dir, ckpt, opts)._1 === 0L)
    assert(WalSource.listSegments(dir).isEmpty)
  }

  test("a large segment splits into multiple line-aligned input partitions") {
    val dir = tmpDir("wal"); val ckpt = tmpDir("ckpt")
    ChangeStreamGen.writeSegments(spark, cfg, dir, 50L, txnsPerSegment = 50)
    val size = java.nio.file.Files.size(
      java.nio.file.Paths.get(s"$dir/wal-000000000.jsonl"))
    assert(size > 4096, "need a multi-split segment")
    val (total, parts) = runCount(dir, ckpt, Map("splitBytes" -> "4096"))
    assert(total === 50L)   // every line exactly once across splits
    assert(parts > 1)       // the segment really was split
    // and the split stream decodes identically to an unsplit read
    val ckpt2 = tmpDir("ckpt")
    val (total2, parts2) = runCount(dir, ckpt2)
    assert(total2 === 50L && parts2 === 1)
  }

  test("no line is lost or duplicated at ANY split boundary (boundary sweep)") {
    // Regression: with the old `pos >= end` stop condition, a line STARTING
    // exactly at a split boundary was read by neither split — the previous
    // split stopped at pos == end, and the next split unconditionally skips
    // through its first newline. 'ab\ncd\nef\n' with splitBytes=3 silently
    // emitted only 'ab'.
    val dir = tmpDir("wal")
    val lines = Seq("ab", "cd", "ef", "", "ghij", "k")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/wal-000000000.jsonl"),
      lines.mkString("", "\n", "\n"))
    val fileSize = java.nio.file.Files.size(
      java.nio.file.Paths.get(s"$dir/wal-000000000.jsonl"))
    for (splitBytes <- 1L to fileSize + 1) {
      val ckpt = tmpDir("ckpt")
      val got = scala.collection.mutable.ArrayBuffer.empty[String]
      val q = spark.readStream.format("graft-wal")
        .option("splitBytes", splitBytes.toString).load(dir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          got ++= df.collect().map(_.getString(0)); ()
        }
        .start()
      q.awaitTermination()
      assert(got.sorted === lines.sorted,
        s"splitBytes=$splitBytes lost or duplicated lines: $got")
    }
  }

  test("session spark.hadoop.* confs reach the executor-side partition reader") {
    spark.conf.set("spark.hadoop.graft.test.probe", "42")
    try {
      val stream = new graft.sources.WalMicroBatchStream(tmpDir("wal"))
      val factory = stream.createReaderFactory()
        .asInstanceOf[graft.sources.WalReaderFactory]
      // executor delivery = java serialization round trip of the factory
      val bytes = {
        val bo = new java.io.ByteArrayOutputStream()
        val oo = new java.io.ObjectOutputStream(bo)
        oo.writeObject(factory); oo.close(); bo.toByteArray
      }
      val revived = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bytes)).readObject()
        .asInstanceOf[graft.sources.WalReaderFactory]
      assert(revived.conf.value.get("graft.test.probe") === "42")
    } finally spark.conf.unset("spark.hadoop.graft.test.probe")
  }

  test("offsets round-trip segment names containing quotes and backslashes") {
    // only HadoopWalProvider's wal-*.jsonl convention forbids these; the
    // WalProvider seam allows any name, so the checkpoint codec must not
    // truncate at an escape
    val stream = new graft.sources.WalMicroBatchStream(tmpDir("wal"))
    for (weird <- Seq("""seg-"quoted".jsonl""", """seg-\back\slash.jsonl""",
                      """"\""""", "plain-wal-000000007.jsonl")) {
      val off = graft.sources.WalOffset(weird)
      assert(stream.deserializeOffset(off.json()) === off, off.json())
    }
  }

  test("offsets round-trip names with control characters; json stays one line") {
    // Spark's offset log is line-oriented: a raw newline in the serialized
    // offset would split the checkpoint entry and break restart. Control
    // chars must be \u-escaped on write and decoded on read.
    val stream = new graft.sources.WalMicroBatchStream(tmpDir("wal"))
    for (weird <- Seq("seg\nnewline", "seg\ttab", "seg\rcr", "\u0001\u001fctl",
                      "mix\"\\\n\u0000end")) {
      val off = graft.sources.WalOffset(weird)
      val js = off.json()
      assert(!js.exists(_ < 0x20), js)
      assert(stream.deserializeOffset(js) === off, js)
    }
  }

  test("legacy positional offset migration fails loudly after segment deletion") {
    val dir = tmpDir("wal");
    ChangeStreamGen.writeSegments(spark, cfg, dir, 60L, txnsPerSegment = 20)
    val stream = new graft.sources.WalMicroBatchStream(dir)
    // intact listing: position 2 still means the second-ever segment
    assert(stream.deserializeOffset("""{"segments":2}""").json()
      .contains("wal-000000001.jsonl"))
    // a consumed segment deleted before first restart on the new version:
    // positions have shifted — migration must refuse, not silently remap
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/wal-000000000.jsonl"))
    val e = intercept[IllegalArgumentException] {
      stream.deserializeOffset("""{"segments":2}""")
    }
    assert(e.getMessage.contains("cannot migrate"))
  }

  test("maxBytesPerTrigger bounds batch bytes, always admits one segment") {
    val dir = tmpDir("wal"); val ckpt = tmpDir("ckpt")
    ChangeStreamGen.writeSegments(spark, cfg, dir, 60L, txnsPerSegment = 20)
    val sizes = (0 to 2).map(i =>
      java.nio.file.Files.size(java.nio.file.Paths.get(f"$dir/wal-$i%09d.jsonl")))
    // budget = exactly the first two segments: batch1 = segs 0+1, batch2 = seg 2
    var batches = 0; var total = 0L
    val q = spark.readStream.format("graft-wal")
      .option("maxBytesPerTrigger", (sizes(0) + sizes(1)).toString).load(dir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = df.count(); if (n > 0) { batches += 1; total += n }; ()
      }
      .start()
    q.awaitTermination()
    assert(total === 60L)
    assert(batches === 2, s"expected 2 byte-bounded batches, got $batches")
    // a budget smaller than ANY segment still admits one per batch (no stall)
    val ckpt2 = tmpDir("ckpt")
    var batches2 = 0; var total2 = 0L
    val q2 = spark.readStream.format("graft-wal")
      .option("maxBytesPerTrigger", "1").load(dir)
      .writeStream
      .option("checkpointLocation", ckpt2)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = df.count(); if (n > 0) { batches2 += 1; total2 += n }; ()
      }
      .start()
    q2.awaitTermination()
    assert(total2 === 60L && batches2 === 3)
  }

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
