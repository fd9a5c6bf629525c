package graft

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.lake.LakeTable
import graft.streaming.{CdcPipeline, Mirror}

/**
 * Type-WIDENING schema evolution — the recovery path for an upstream
 * `ALTER COLUMN TYPE` (int→bigint, real→double precision, int→numeric).
 * Before this, the lake schema could never follow: under Spark 4's ANSI-on
 * defaults the first overflowing value failed the cast loudly on every
 * replay — a permanent wedge with no migration story. Non-key columns now
 * widen along the safe parquet-read lattice (old narrow files stay
 * readable under the widened explicit read schema — Spark 4 widening
 * reads); keys and non-lattice observations keep the lake type
 * authoritative (a wider-declared observation is indistinguishable from a
 * creation-time custom narrow schema, which must keep working; an
 * actually-unabsorbable value still fails loudly at the ANSI cast).
 */
class SchemaWideningSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", IntegerType),
    StructField("f", FloatType)))

  /** One-change txn with explicit declared types for (id, v, f). */
  private def ins(lsn: Long, id: Long, v: String, f: String,
                  tv: String = "integer", tf: String = "real"): String =
    s"""{"lsn":$lsn,"xid":${lsn + 100},"change":[{"kind":"insert","schema":"public","table":"t",""" +
      s""""columnnames":["id","v","f"],"columntypes":["bigint","$tv","$tf"],""" +
      s""""columnvalues":[$id,$v,$f]}]}"""

  private def upd(lsn: Long, id: Long, v: String, f: String,
                  tv: String, tf: String, tid: String = "bigint"): String =
    s"""{"lsn":$lsn,"xid":${lsn + 100},"change":[{"kind":"update","schema":"public","table":"t",""" +
      s""""columnnames":["id","v","f"],"columntypes":["$tid","$tv","$tf"],""" +
      s""""columnvalues":[$id,$v,$f],""" +
      s""""oldkeys":{"keynames":["id"],"keytypes":["$tid"],"keyvalues":[$id]}}]}"""

  private def apply(t: LakeTable, lines: Seq[String]): MergeEngine.MergeStats =
    MergeEngine.applyBatch(t, ChangeDecoder.decode(
      spark.createDataset(lines).toDF("value")))

  private def newTable(prefix: String, s: StructType = schema,
                       keys: Seq[String] = Seq("id")): LakeTable = {
    val t = new LakeTable(spark, tmpDir(prefix),
      maxDeltaBytesPerBucket = Long.MaxValue) // no inline compaction unless forced
    t.create(s, keys, nBuckets = 4)
    t
  }

  test("widen lattice: strictly-wider resolves, incomparable does not") {
    assert(MergeEngine.widen(IntegerType, LongType) === Some(LongType))
    assert(MergeEngine.widen(LongType, IntegerType) === Some(LongType))
    assert(MergeEngine.widen(ShortType, DecimalType(38, 18)) === Some(DecimalType(38, 18)))
    assert(MergeEngine.widen(FloatType, DoubleType) === Some(DoubleType))
    assert(MergeEngine.widen(IntegerType, IntegerType) === Some(IntegerType))
    assert(MergeEngine.widen(IntegerType, StringType) === None)
    assert(MergeEngine.widen(FloatType, DecimalType(38, 18)) === None)
    assert(MergeEngine.widen(BooleanType, IntegerType) === None)
  }

  test("evolveSchema: widens non-key, keeps keys and non-lattice observations authoritative") {
    val cur = schema
    // non-key widening
    val w = MergeEngine.evolveSchema(cur,
      Seq(("v", "bigint"), ("f", "double precision")), Seq("id"))
    assert(w("v").dataType === LongType)
    assert(w("f").dataType === DoubleType)
    // a batch spanning the migration carries BOTH eras; order-independent
    val both = MergeEngine.evolveSchema(cur,
      Seq(("v", "bigint"), ("v", "integer")), Seq("id"))
    assert(both("v").dataType === LongType)
    // KEYS never widen in place — the stored type feeds the bucket hash,
    // and a wider-declared-than-lake key is indistinguishable from a
    // creation-time custom narrow key that must keep working
    val narrowKey = StructType(Seq(
      StructField("id", IntegerType), StructField("v", IntegerType)))
    assert(MergeEngine.evolveSchema(narrowKey, Seq(("id", "bigint")), Seq("id"))("id")
      .dataType === IntegerType)
    // incomparable / narrower: lake type stays authoritative (custom
    // schemas legitimately differ from the WAL's declared types)
    val keep = MergeEngine.evolveSchema(cur,
      Seq(("v", "text"), ("f", "real")), Seq("id"))
    assert(keep("v").dataType === IntegerType)
    assert(keep("f").dataType === FloatType)
    // additive still appends
    assert(MergeEngine.evolveSchema(cur, Seq(("nc", "bigint")), Seq("id"))("nc")
      .dataType === LongType)
  }

  test("upstream int->bigint + real->double widening applies end-to-end; old rows survive") {
    val t = newTable("widen-e2e")
    apply(t, Seq(ins(1, 1, "7", "1.5"), ins(2, 2, "8", "2.5")))
    assert(t.currentSnapshot.get.schema("v").dataType === IntegerType)
    // force the narrow era into TYPED base parquet (INT32/FLOAT physical
    // columns) BEFORE the widening: the whole safety claim is that Spark
    // 4's widening parquet reads decode those files under the widened
    // schema — narrow rows left in delta string-maps would never exercise
    // it (string casts hide a reader regression)
    MergeEngine.compactAll(t)
    assert(t.currentSnapshot.get.bucketDeltas.values.forall(_.isEmpty),
      "precondition: narrow rows must live in typed base files")

    // the migration batch: declared types widen AND a value overflows int32
    apply(t, Seq(
      upd(3, 1, "3000000000", "1e40", "bigint", "double precision"),
      ins(4, 3, "9", "3.5", "bigint", "double precision")))
    val snap = t.currentSnapshot.get
    assert(snap.schema("v").dataType === LongType)
    assert(snap.schema("f").dataType === DoubleType)

    val state = t.read().collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(state(1L) === ((3000000000L, 1e40)))  // the post-widening value
    assert(state(2L) === ((8L, 2.5)))            // pre-widening row, widened read
    assert(state(3L) === ((9L, 3.5)))

    // a LATER narrower declaration (upstream un-widened) keeps the wide type
    apply(t, Seq(upd(5, 2, "10", "4.5", "integer", "real")))
    assert(t.currentSnapshot.get.schema("v").dataType === LongType)
    assert(t.read().filter(col("id") === 2).head().getLong(1) === 10L)

    // lookups and compaction read the mixed narrow/wide files correctly
    assert(t.lookup(Map("id" -> 2L)).head().getLong(1) === 10L)
    MergeEngine.compactAll(t)
    val after = t.read().collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(after === Map(
      1L -> ((3000000000L, 1e40)), 2L -> ((10L, 4.5)), 3L -> ((9L, 3.5))))
  }

  test("a creation-time NARROW custom key over a wider-declared WAL keeps working; a real key overflow fails loudly") {
    // `run --schema 'id INT, ...' --keys id` against a WAL declaring id
    // bigint worked before type widening existed and must keep working:
    // keys never evolve from observations (the stored type feeds the
    // bucket hash), the lake type stays authoritative
    val narrow = StructType(Seq(
      StructField("id", IntegerType),
      StructField("v", IntegerType),
      StructField("f", FloatType)))
    val t = newTable("widen-narrowkey", s = narrow)
    apply(t, Seq(ins(1, 1, "7", "1.5"), ins(2, 2, "8", "2.5")))
    assert(t.currentSnapshot.get.schema("id").dataType === IntegerType,
      "the key must not evolve from the wider declared type")
    assert(t.read().count() === 2)

    // an ACTUALLY overflowing key value cannot be absorbed — it fails
    // loudly at the typed ANSI key cast and classifies DataError (the
    // upstream-key-widening migration is clone + re-ingest, never a
    // silent in-place flip that would strand rows in wrong buckets)
    val before = t.currentSnapshot.get.snapshotId
    val e = intercept[Exception] {
      apply(t, Seq(ins(3, 3000000000L, "9", "3.5")))
    }
    assert(CdcPipeline.classify(e) === CdcPipeline.FailureKind.DataError,
      s"key overflow must classify DataError, got: $e")
    assert(t.currentSnapshot.get.snapshotId === before, "no partial commit")
  }

  test("widening flows through the change feed and mirror; narrow-era replays do not wedge") {
    val t = newTable("widen-feed")
    apply(t, Seq(ins(1, 1, "7", "1.5"), ins(2, 2, "8", "2.5")))

    // mirror converges on the narrow era
    val mirrorRoot = tmpDir("widen-mirror")
    val ckpt = tmpDir("widen-ckpt")
    Mirror.follow(spark, t.root, mirrorRoot, ckpt).awaitTermination()
    val mirror = new LakeTable(spark, mirrorRoot)
    assert(mirror.currentSnapshot.get.schema("v").dataType === IntegerType)

    // source widens with an int32-overflowing value
    apply(t, Seq(upd(3, 1, "3000000000", "1e40", "bigint", "double precision")))

    // the restarted stream (same checkpoint) picks up the widened schema
    // and the mirror follows the widening through feedAsChanges
    Mirror.follow(spark, t.root, mirrorRoot, ckpt).awaitTermination()
    assert(mirror.currentSnapshot.get.schema("v").dataType === LongType)
    def state(x: LakeTable) = x.read().collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(state(mirror) === state(t))
    assert(state(mirror)(1L) === ((3000000000L, 1e40)))

    // the wedge case the lattice-aware prefix rule exists for: a FRESH
    // checkpoint replays every era per-commit under the WIDENED stream
    // schema — the narrow-era pinned batches must be accepted (and the
    // LSN fence must zero them), never wedge the checkpoint
    val applied = ArrayBuffer.empty[Long]
    val q = Mirror.follow(spark, t.root, mirrorRoot, tmpDir("widen-ckpt2"),
      maxSnapshotsPerTrigger = Some(1L),
      onBatch = s => applied.synchronized { applied += s.appliedKeys; () })
    q.awaitTermination()
    assert(applied.sum === 0, "every replayed era is LSN-fenced to zero")
    assert(state(mirror) === state(t))

    // batch feed over the WHOLE range reads narrow-era files under the
    // widened schema (widening read), values intact
    val feed = t.changes(-1, t.currentSnapshot.get.snapshotId)
      .filter(col("_kind") =!= "delete")
      .select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(feed.contains((2L, 8L)), "narrow-era feed row under widened schema")
    assert(feed.contains((1L, 3000000000L)))
  }

  test("widening on a partial-update table: the overlay keeps omitted columns across the widening") {
    val t = new LakeTable(spark, tmpDir("widen-partial"),
      maxDeltaBytesPerBucket = Long.MaxValue)
    t.create(schema, Seq("id"), nBuckets = 4, partialUpdates = true)
    apply(t, Seq(ins(1, 1, "7", "1.5")))
    // the update carries ONLY (id, v) — f omitted as unchanged TOAST —
    // and v arrives widened with an int32-overflowing value
    apply(t, Seq(
      s"""{"lsn":2,"xid":102,"change":[{"kind":"update","schema":"public","table":"t",""" +
        s""""columnnames":["id","v"],"columntypes":["bigint","bigint"],""" +
        s""""columnvalues":[1,3000000000],""" +
        s""""oldkeys":{"keynames":["id"],"keytypes":["bigint"],"keyvalues":[1]}}]}"""))
    assert(t.currentSnapshot.get.schema("v").dataType === LongType)
    val r = t.read().head()
    assert(r.getAs[Long]("v") === 3000000000L)
    assert(r.getAs[Float]("f") === 1.5f,
      "the omitted column must survive from the narrow era through the overlay")
  }

  test("mid-stream widening fails the narrow-era stream loudly; a widened stream replays narrow eras") {
    val t = newTable("widen-midstream")
    apply(t, Seq(ins(1, 1, "7", "1.5")))
    val narrowSchema = t.currentSnapshot.get.schema
    apply(t, Seq(upd(2, 1, "3000000000", "2.5", "bigint", "real")))
    val widened = t.currentSnapshot.get.schema
    assert(widened("v").dataType === LongType)

    // a stream opened on the NARROW schema hits the widened era: replaying
    // wide data on the narrow stream schema would overflow — fail loudly
    val src = new graft.sources.ChangesSource(t, narrowSchema, -1L, Long.MaxValue)
    val ex = intercept[IllegalStateException] {
      src.getBatch(None, graft.sources.SnapshotOffset(
        t.currentSnapshot.get.snapshotId))
    }
    assert(ex.getMessage.contains("schema changed"))
    // ranges ending before the widening still read fine on the narrow schema
    assert(src.getBatch(None, graft.sources.SnapshotOffset(1)).isStreaming)

    // the wedge case the lattice-aware prefix rule closes: a RESTARTED
    // stream (widened schema) must replay the narrow pinned era — strict
    // type equality would wedge the checkpoint forever here
    val restarted = new graft.sources.ChangesSource(t, widened, -1L, Long.MaxValue)
    assert(restarted.getBatch(None, graft.sources.SnapshotOffset(1)).isStreaming)
    assert(restarted.getBatch(Some(graft.sources.SnapshotOffset(1)),
      graft.sources.SnapshotOffset(2)).isStreaming)
    // narrow-era rows project onto the widened schema with intact values
    val replayOld = t.changes(-1, 1, projectTo = Some(widened))
      .filter(col("id") === 1).head()
    assert(replayOld.getAs[Long]("v") === 7L)
  }
}
