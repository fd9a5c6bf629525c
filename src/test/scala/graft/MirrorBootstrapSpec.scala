package graft

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.functions._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.cli.Main
import graft.streaming.Mirror

/**
 * [[Mirror.bootstrap]] — replicating an EXISTING table whose early feed
 * history has been EXPIRED (the deployment-common case plain follow cannot
 * serve): clone at a pinned snapshot S + follow the feed from S, with S
 * crash-durable in the mirror's meta so no crash window can skip commits.
 */
class MirrorBootstrapSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = GenConfig(seed = 53L, nRepos = 10, pathsPerRepo = 4,
    maxChangesPerTxn = 3)

  private def lines(from: Long, until: Long) =
    spark.createDataset((from until until)
      .map(id => ChangeStreamGen.renderLine(cfg, ChangeStreamGen.txn(cfg, id)))).toDF("value")

  private def newSource(dir: String): LakeTable = {
    val t = new LakeTable(spark, tmpDir(dir))
    t.create(Main.reposSchema, Seq("repo", "path"), 4, Main.reposRenameMap)
    t
  }

  private def state(table: LakeTable): Set[Seq[Any]] = {
    val cols = table.currentSnapshot.get.schema.fieldNames
    table.read().select(cols.map(col).toIndexedSeq: _*)
      .collect().map(_.toSeq).toSet
  }

  test("bootstrap mirrors a retention-pruned source; plain follow(-1) fails loudly") {
    val t = newSource("bsrc")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 120)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(120, 240)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(240, 360)))
    val (expired, _) = t.expireSnapshots(keepLast = 1)
    assert(expired >= 2, "precondition: early history must actually be gone")

    // the path bootstrap exists for: a full-history follow hits the horizon
    val failRoot = tmpDir("bfail")
    val qf = Mirror.follow(spark, t.root, failRoot, tmpDir("bfail-ckpt"))
    val failure = intercept[Exception] { qf.awaitTermination() }
    def messages(e: Throwable): Seq[String] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(messages(failure).exists(_.contains("expired")),
      s"follow from -1 must fail at the retention horizon, got: $failure")

    // bootstrap: clone at current + follow from there
    val mirrorRoot = tmpDir("bdst")
    val ckpt = tmpDir("b-ckpt")
    val applied = ArrayBuffer.empty[Long]
    val q = Mirror.bootstrap(spark, t.root, mirrorRoot, ckpt,
      onBatch = s => applied.synchronized { applied += s.appliedKeys; () })
    q.awaitTermination()
    val mirror = new LakeTable(spark, mirrorRoot)
    assert(state(mirror) === state(t))
    assert(state(mirror).nonEmpty)
    assert(applied.sum === 0,
      "nothing was committed after the pin: the feed tail must be empty")

    // incremental commits flow through the SAME bootstrap entry point
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(360, 420)))
    val q2 = Mirror.bootstrap(spark, t.root, mirrorRoot, ckpt,
      onBatch = s => applied.synchronized { applied += s.appliedKeys; () })
    q2.awaitTermination()
    assert(state(mirror) === state(t), "mirror must track post-bootstrap commits")
    assert(applied.sum > 0)

    // replay with the same checkpoint: offsets make it a no-op
    val before = applied.sum
    val q3 = Mirror.bootstrap(spark, t.root, mirrorRoot, ckpt,
      onBatch = s => applied.synchronized { applied += s.appliedKeys; () })
    q3.awaitTermination()
    assert(applied.sum === before, "checkpoint replay must apply zero keys")

    // replay with a FRESH checkpoint: the cloned LSN watermarks fence the
    // full feed tail to zero applied keys — exactly-once across the seam
    val q4 = Mirror.bootstrap(spark, t.root, mirrorRoot, tmpDir("b-ckpt2"),
      onBatch = s => applied.synchronized { applied += s.appliedKeys; () })
    q4.awaitTermination()
    assert(applied.sum === before,
      "a fresh-checkpoint replay must be LSN-fenced to zero")
    assert(state(mirror) === state(t))
  }

  test("crash after clone, before any checkpointed batch: the pinned S, not 'current', seeds the feed") {
    val t = newSource("bcrash1")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 100)))
    val mirror = new LakeTable(spark, tmpDir("bcrash1-dst"))

    // simulate: bootstrap pinned S and cloned, then died before streaming
    val pinned = Mirror.ensureBootstrapped(t, mirror, asOf = None)
    assert(mirror.exists, "the clone must have materialized")
    assert(state(mirror) === state(t))

    // the source advances AND expires past the pin before the re-run —
    // if the re-run derived its lower bound from 'current', (pinned,
    // current-at-restart] would be skipped forever
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(100, 200)))
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(200, 300)))

    val q = Mirror.bootstrap(spark, t.root, mirror.root, tmpDir("bcrash1-ckpt"))
    q.awaitTermination()
    assert(state(mirror) === state(t),
      "no commit between the pin and the restart may be skipped")
    assert(Mirror.ensureBootstrapped(t, mirror, asOf = None) === pinned,
      "the marker keeps the original pin")
  }

  test("crash between marker publish and clone: re-run redoes the clone at the SAME pin") {
    val t = newSource("bcrash2")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 100)))
    val pinnedId = t.currentSnapshot.get.snapshotId

    // simulate the narrowest window: marker durable, clone never started
    val mirror = new LakeTable(spark, tmpDir("bcrash2-dst"))
    assert(mirror.publishFencedMeta(Mirror.BootstrapMarker,
      s"""{"sourceRoot":"${t.root}","sourceSnapshotId":$pinnedId}"""))
    assert(!mirror.exists)

    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(100, 180)))

    val q = Mirror.bootstrap(spark, t.root, mirror.root, tmpDir("bcrash2-ckpt"))
    q.awaitTermination()
    assert(state(mirror) === state(t),
      "redone clone at the pin + feed tail must converge")
  }

  test("misuse fails loudly: foreign mirror root, wrong source, conflicting asOf") {
    val t = newSource("bmis-src")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 50)))

    // a table NOT created by bootstrap (no marker) is refused, never guessed at
    val foreign = newSource("bmis-foreign")
    val e1 = intercept[IllegalStateException] {
      Mirror.ensureBootstrapped(t, foreign, asOf = None)
    }
    assert(e1.getMessage.contains("no bootstrap marker"))

    // a mirror of table A never follows table B's feed
    val mirror = new LakeTable(spark, tmpDir("bmis-dst"))
    Mirror.ensureBootstrapped(t, mirror, asOf = None)
    val other = newSource("bmis-other")
    MergeEngine.applyBatch(other, ChangeDecoder.decode(lines(0, 30)))
    val e2 = intercept[IllegalArgumentException] {
      Mirror.ensureBootstrapped(other, mirror, asOf = None)
    }
    assert(e2.getMessage.contains("bootstrapped from"))

    // a conflicting asOf on a re-run cannot silently re-pin
    val pinned = Mirror.ensureBootstrapped(t, mirror, asOf = None)
    val e3 = intercept[IllegalArgumentException] {
      Mirror.ensureBootstrapped(t, mirror, asOf = Some(pinned + 999))
    }
    assert(e3.getMessage.contains("conflicts"))
  }

  test("marker publish is fenced: racers with DIFFERENT pins get exactly one winner") {
    // racers pin the source snapshot THEY observed, so contents differ —
    // a tmp+move publish would let a loser silently REPLACE the winner's
    // pin (rename(2) is not a fencing primitive; lessons 10/12)
    val mirror = new LakeTable(spark, tmpDir("bfence"))
    val racers = (1 to 4).map { i =>
      new Thread {
        @volatile var won = false
        override def run(): Unit =
          won = mirror.publishFencedMeta(Mirror.BootstrapMarker,
            s"""{"sourceRoot":"/src","sourceSnapshotId":$i}""")
      }
    }
    racers.foreach(_.start()); racers.foreach(_.join())
    assert(racers.count(_.won) === 1, "exactly one publisher may win")
    val winner = racers.indexWhere(_.won) + 1
    val content = mirror.readImmutableMeta(Mirror.BootstrapMarker).get
    assert(content.contains(s""""sourceSnapshotId":$winner"""),
      "the durable pin must be the WINNER's content, never a replaced loser's")
  }

  test("equivalent spellings of the source root are accepted (qualified comparison)") {
    val t = newSource("bqual")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 40)))
    val mirror = new LakeTable(spark, tmpDir("bqual-dst"))
    val pin = Mirror.ensureBootstrapped(t, mirror, asOf = None)
    // same table addressed with an explicit scheme prefix: a raw string
    // compare would refuse it and steer the operator toward deleting the
    // mirror root
    val respelled = new LakeTable(spark, "file:" + t.root)
    assert(Mirror.ensureBootstrapped(respelled, mirror, asOf = None) === pin)
  }

  test("concurrent bootstrappers: one pin wins, both converge on the identical clone") {
    val t = newSource("brace-src")
    MergeEngine.applyBatch(t, ChangeDecoder.decode(lines(0, 80)))
    val mirrorRoot = tmpDir("brace-dst")

    val results = (1 to 2).map { i =>
      new Thread {
        var outcome: Either[Throwable, Long] = Left(new IllegalStateException("did not run"))
        override def run(): Unit = {
          outcome =
            try Right(Mirror.ensureBootstrapped(t,
              new LakeTable(spark, mirrorRoot), asOf = None))
            catch { case e: Throwable => Left(e) }
        }
      }
    }
    results.foreach(_.start()); results.foreach(_.join())
    val pins = results.map(_.outcome)
    assert(pins.forall(_.isRight), s"both racers must succeed, got: $pins")
    assert(pins.map(_.toOption.get).distinct.size === 1,
      "both racers must resolve the SAME pinned snapshot")
    val mirror = new LakeTable(spark, mirrorRoot)
    assert(state(mirror) === state(t))
  }
}
