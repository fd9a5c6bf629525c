package graft

import org.apache.spark.sql.streaming.Trigger
import graft.sources.{WalSource, WalStager}

/**
 * The live-staging half of the WalProvider contract: a stager feeding
 * segments while the graft-wal source consumes them — atomic publish
 * (no partial segments ever visible), dense monotone naming, restart
 * resume, single-writer collision detection.
 */
class WalStagerSpec extends SparkSpec {

  private def conf = spark.sessionState.newHadoopConf()

  private def consume(dir: String, ckpt: String): Seq[String] = {
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = spark.readStream.format("graft-wal").load(dir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= df.collect().map(_.getString(0)); ()
      }
      .start()
    q.awaitTermination()
    got.toSeq
  }

  test("staged lines reach the consumer exactly once; partials stay invisible") {
    val dir = tmpDir("stage"); val ckpt = tmpDir("ckpt")
    val stager = new WalStager(dir, conf)
    (1 to 5).foreach(i => stager.append(s"line-$i"))
    // nothing published yet: the tailer must see an empty WAL
    assert(WalSource.listSegments(dir).isEmpty)
    assert(consume(dir, ckpt).isEmpty)
    assert(stager.roll() === Some("wal-000000000.jsonl"))
    assert(consume(dir, ckpt) === (1 to 5).map(i => s"line-$i"))
    // keep streaming while the consumer tails incrementally
    (6 to 8).foreach(i => stager.append(s"line-$i"))
    stager.roll()
    (9 to 9).foreach(i => stager.append(s"line-$i"))
    stager.close()
    assert(consume(dir, ckpt) === (6 to 9).map(i => s"line-$i"))
    assert(consume(dir, ckpt).isEmpty) // exactly once
  }

  test("auto-roll at rollBytes, dense names, restart resumes numbering") {
    val dir = tmpDir("stage")
    val stager = new WalStager(dir, conf, rollBytes = 20L)
    (1 to 6).foreach(i => stager.append(s"0123456789-$i")) // ~13B each => 2/segment
    stager.close()
    val names = WalSource.listSegments(dir)
    assert(names === names.sorted && names.size === 3)
    assert(names.head === "wal-000000000.jsonl")
    // restart: a new stager continues AFTER the highest published name
    val resumed = new WalStager(dir, conf)
    resumed.append("after-restart")
    assert(resumed.roll() === Some("wal-000000003.jsonl"))
    resumed.close()
  }

  test("a colliding publish fails loudly (single-writer)") {
    val dir = tmpDir("stage")
    val a = new WalStager(dir, conf)
    val b = new WalStager(dir, conf) // both believe the next name is 0
    a.append("from-a"); a.roll()
    b.append("from-b")
    intercept[IllegalStateException] { b.roll() }
    // the winner's segment survives untouched
    assert(WalSource.listSegments(dir) === Seq("wal-000000000.jsonl"))
  }

  test("numbering survives retention emptying the directory (no name reuse)") {
    val dir = tmpDir("stage")
    val a = new WalStager(dir, conf)
    (1 to 3).foreach { i => a.append(s"x$i"); a.roll() }
    a.close()
    // retention releases everything the consumer acked: the dir is empty
    WalSource.listSegments(dir).foreach(n =>
      java.nio.file.Files.delete(java.nio.file.Paths.get(dir, n)))
    assert(WalSource.listSegments(dir).isEmpty)
    // a restarted stager must NOT restart at wal-000000000 — that name is
    // below the consumer's offset and would be silently skipped + pruned
    val b = new WalStager(dir, conf)
    b.append("after-retention")
    assert(b.roll() === Some("wal-000000003.jsonl"))
    b.close()
  }

  test("a torn high-water record can never cause name reuse") {
    // The record is name-encoded and create-only: a crash can leave an
    // EXTRA record, never a torn one. Simulate the worst crash window —
    // new record created, old not yet pruned — plus a torn LEGACY
    // content-format file from an older version.
    val dir = tmpDir("stage")
    val a = new WalStager(dir, conf)
    (1 to 2).foreach { i => a.append(s"x$i"); a.roll() }
    a.close()
    val p = java.nio.file.Paths.get(dir)
    // crash leftovers: a stale extra record + an empty (torn) legacy file
    java.nio.file.Files.createFile(p.resolve(f".wal-stager.next-${1L}%019d"))
    java.nio.file.Files.writeString(p.resolve(".wal-stager.next"), "")
    // retention empties the listing — the name records are all that's left
    WalSource.listSegments(dir).foreach(n =>
      java.nio.file.Files.delete(p.resolve(n)))
    val b = new WalStager(dir, conf)
    b.append("after")
    assert(b.roll() === Some("wal-000000002.jsonl")) // max record wins
    b.close()
  }

  test("an unreadable legacy record with an empty listing fails loudly") {
    // Silent fallback to 0 here is exactly the permanent-loss bug: the
    // stager would republish names below the consumer's durable offset.
    val dir = tmpDir("stage")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, ".wal-stager.next"), "not a number")
    val e = intercept[IllegalStateException] { new WalStager(dir, conf) }
    assert(e.getMessage.contains("next safe index is unknown"))
  }

  test("a crashed stager's hidden temp files are swept on restart") {
    val dir = tmpDir("stage")
    val a = new WalStager(dir, conf)
    a.append("never-rolled") // crash: temp exists, nothing published
    val tmps = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator()
    val before = scala.jdk.CollectionConverters.IteratorHasAsScala(tmps).asScala
      .count(_.getFileName.toString.startsWith(".wal-staging.tmp-"))
    assert(before === 1)
    val b = new WalStager(dir, conf) // restart sweeps the orphaned temp
    val after = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator()
    assert(scala.jdk.CollectionConverters.IteratorHasAsScala(after).asScala
      .count(_.getFileName.toString.startsWith(".wal-staging.tmp-")) === 0)
    b.append("fresh"); assert(b.roll() === Some("wal-000000000.jsonl"))
    b.close()
  }

  test("end-to-end: staged WAL drives the CDC pipeline to the oracle state") {
    import graft.gen.{ChangeStreamGen, GenConfig}
    import graft.lake.LakeTable
    import graft.cli.Main
    val cfg = GenConfig(seed = 77L, nRepos = 8, pathsPerRepo = 3, maxChangesPerTxn = 2)
    val dir = tmpDir("stage"); val ckpt = tmpDir("ckpt")
    val stager = new WalStager(dir, conf)
    // "live" feed: render txn lines one by one, roll every 25
    (0L until 100L).foreach { id =>
      stager.append(ChangeStreamGen.renderLine(cfg, ChangeStreamGen.txn(cfg, id)))
      if ((id + 1) % 25 == 0) stager.roll()
    }
    stager.close()
    val table = new LakeTable(spark, tmpDir("repos"))
    table.create(Main.reposSchema, Seq("repo", "path"), 4, Main.reposRenameMap)
    val pipe = new graft.streaming.CdcPipeline(spark, dir, ckpt,
      Seq(graft.streaming.TableTarget("repos", table, Main.reposSchema,
        Seq("repo", "path"), 4, Main.reposRenameMap)), Set("repos"))
    pipe.runAvailable()
    def sha(s: String) = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val exp = ChangeStreamGen.expectedFinalState(cfg, 100L)
      .map { case (k, ch) => k -> sha(ch.content) }
    val got = table.read()
      .select(org.apache.spark.sql.functions.col("repo"),
        org.apache.spark.sql.functions.col("path"),
        org.apache.spark.sql.functions.sha2(
          org.apache.spark.sql.functions.col("content"), 256)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(got === exp)
  }
}
