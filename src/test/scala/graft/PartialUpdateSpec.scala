package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.apply.MergeEngine
import graft.decode.ChangeDecoder
import graft.lake.LakeTable

/**
 * PARTIAL-UPDATE (unchanged-TOAST) semantics: PostgreSQL logical decoding
 * does not re-send an unchanged TOASTed value — wal2json omits the column
 * from the update's columnnames, pgoutput sends the 'u' marker the
 * transcoder likewise omits (reference behavior; see PgoutputSpec's
 * "unchanged TOAST columns are omitted"). A table created with
 * `partialUpdates = true` must resolve every column to its latest PRESENT
 * value instead of nulling whatever the last tuple did not carry — across
 * the write-side dedup, both merge-read shapes, lookups, compaction, and
 * crucially WITHOUT resurrecting columns across insert/delete barriers.
 */
class PartialUpdateSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("val", DoubleType),
    StructField("content", StringType)))

  private def q(s: String) = "\"" + s + "\""

  /** insert always carries the FULL tuple (Postgres sends complete new
    * tuples on INSERT; TOAST omission only happens on UPDATE). */
  private def ins(lsn: Long, id: Long, v: Double, content: String): String =
    s"""{"lsn":$lsn,"xid":${lsn + 100},"change":[{"kind":"insert","schema":"public","table":"t",""" +
      s""""columnnames":["id","val","content"],"columntypes":["bigint","double precision","text"],""" +
      s""""columnvalues":[$id,$v,${q(content)}]}]}"""

  /** update carrying an arbitrary subset of data columns (the key is always
    * present — keys are never TOASTed away); content = None means OMITTED,
    * Some(null) means explicit SQL NULL. */
  private def upd(lsn: Long, id: Long, v: Option[Double],
                  content: Option[String], hasContent: Boolean,
                  newId: Option[Long] = None): String = {
    val cols = Seq(("id", "bigint", newId.getOrElse(id).toString)) ++
      v.map(x => ("val", "double precision", x.toString)) ++
      (if (hasContent) Seq(("content", "text",
        content.filter(_ != null).map(q).getOrElse("null"))) else Nil)
    s"""{"lsn":$lsn,"xid":${lsn + 100},"change":[{"kind":"update","schema":"public","table":"t",""" +
      s""""columnnames":[${cols.map(c => q(c._1)).mkString(",")}],""" +
      s""""columntypes":[${cols.map(c => q(c._2)).mkString(",")}],""" +
      s""""columnvalues":[${cols.map(_._3).mkString(",")}],""" +
      s""""oldkeys":{"keynames":["id"],"keytypes":["bigint"],"keyvalues":[$id]}}]}"""
  }

  private def del(lsn: Long, id: Long): String =
    s"""{"lsn":$lsn,"xid":${lsn + 100},"change":[{"kind":"delete","schema":"public","table":"t",""" +
      s""""oldkeys":{"keynames":["id"],"keytypes":["bigint"],"keyvalues":[$id]}}]}"""

  private def apply(t: LakeTable, lines: Seq[String]): Unit =
    MergeEngine.applyBatch(t, ChangeDecoder.decode(
      spark.createDataset(lines).toDF("value")))

  private def newTable(prefix: String, partial: Boolean = true,
                       maxDeltas: Int = 64): LakeTable = {
    val t = new LakeTable(spark, tmpDir(prefix), maxDeltasPerBucket = maxDeltas)
    t.create(schema, Seq("id"), nBuckets = 4, partialUpdates = partial)
    t
  }

  private def state(t: LakeTable): Map[Long, (Option[Double], Option[String])] =
    t.read().collect().map { r =>
      r.getLong(0) -> (Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_.asInstanceOf[String]))
    }.toMap

  test("partialUpdates persists in the snapshot and survives reopen") {
    val t = newTable("pu-flag")
    assert(t.currentSnapshot.get.partialUpdates)
    val reopened = new LakeTable(spark, t.root)
    assert(reopened.currentSnapshot.get.partialUpdates)
    val off = newTable("pu-flag-off", partial = false)
    assert(!off.currentSnapshot.get.partialUpdates)
  }

  test("requesting partialUpdates on an existing full-tuple table fails loudly") {
    val t = newTable("pu-mismatch", partial = false)
    val e = intercept[IllegalStateException] {
      t.create(schema, Seq("id"), nBuckets = 4, partialUpdates = true)
    }
    assert(e.getMessage.contains("partialUpdates"))
    // the benign direction stays idempotent: the snapshot property wins
    val p = newTable("pu-mismatch-ok")
    val again = p.create(schema, Seq("id"), nBuckets = 4) // no flag
    assert(again.partialUpdates, "reopen without the flag keeps the property")
  }

  test("in-batch: an update omitting the TOASTed column keeps the inserted value") {
    val t = newTable("pu-inbatch")
    apply(t, Seq(
      ins(1, 1, 1.0, "BIG-CONTENT"),
      upd(2, 1, Some(2.0), None, hasContent = false)))
    assert(state(t) === Map(1L -> (Some(2.0), Some("BIG-CONTENT"))))
  }

  test("the same stream on a NON-partial table keeps the documented full-tuple semantics") {
    val t = newTable("pu-off", partial = false)
    apply(t, Seq(
      ins(1, 1, 1.0, "BIG-CONTENT"),
      upd(2, 1, Some(2.0), None, hasContent = false)))
    // whole-row keep-last: the partial tuple IS the row
    assert(state(t) === Map(1L -> (Some(2.0), None)))
  }

  test("cross-batch: the coalesce walks base rows and multiple deltas") {
    val t = newTable("pu-cross")
    apply(t, Seq(ins(1, 1, 1.0, "C1"), ins(2, 2, 1.0, "C2")))
    apply(t, Seq(upd(3, 1, Some(3.0), None, hasContent = false)))
    apply(t, Seq(upd(4, 1, Some(4.0), None, hasContent = false),
      upd(5, 2, None, Some("C2-v2"), hasContent = true)))
    assert(state(t) === Map(
      1L -> (Some(4.0), Some("C1")),
      2L -> (Some(1.0), Some("C2-v2"))))
  }

  test("explicit SQL NULL is not 'absent': a carried null overwrites") {
    val t = newTable("pu-null")
    apply(t, Seq(ins(1, 1, 1.0, "KEEP")))
    apply(t, Seq(upd(2, 1, Some(2.0), Some(null), hasContent = true)))
    assert(state(t) === Map(1L -> (Some(2.0), None)))
  }

  test("in-batch delete+reinsert: the new row does not inherit the dead row's columns") {
    val t = newTable("pu-barrier1")
    apply(t, Seq(ins(1, 1, 1.0, "OLD")))
    // one batch: delete then a PK-CHANGING update moving id 2 -> 1 whose
    // new tuple omits content (unchanged TOAST). The split's synthetic
    // insert at id=1 carries no content; the dead id=1 row's "OLD" must
    // NOT resurrect through the coalesce. (Known Postgres divergence,
    // inherent to the wire format: the source row retains id=2's content,
    // but wal2json/pgoutput never ship it on a PK-changing update without
    // REPLICA IDENTITY FULL — null is the only honest resolution; see
    // IMPLEMENTATION.md.)
    apply(t, Seq(
      ins(2, 2, 5.0, "MOVED"),
      del(3, 1),
      upd(4, 2, Some(6.0), None, hasContent = false, newId = Some(1))))
    assert(state(t) === Map(1L -> (Some(6.0), None)))
  }

  test("cross-batch barrier: a reinserted key stops coalescing at the insert") {
    val t = newTable("pu-barrier2")
    apply(t, Seq(ins(1, 1, 1.0, "OLD")))
    apply(t, Seq(del(2, 1)))
    // new incarnation, then a partial update in a LATER batch: content
    // coalesces back to the new insert ("NEW"), never to "OLD"
    apply(t, Seq(ins(3, 1, 2.0, "NEW")))
    apply(t, Seq(upd(4, 1, Some(9.0), None, hasContent = false)))
    assert(state(t) === Map(1L -> (Some(9.0), Some("NEW"))))
  }

  test("an update to a never-inserted key reads null for the omitted column") {
    val t = newTable("pu-orphan")
    apply(t, Seq(upd(1, 7, Some(1.5), None, hasContent = false)))
    assert(state(t) === Map(7L -> (Some(1.5), None)))
  }

  test("local and shuffle merge shapes agree, including lookups") {
    val t = newTable("pu-shapes")
    apply(t, Seq(ins(1, 1, 1.0, "A"), ins(2, 2, 2.0, "B"), ins(3, 3, 3.0, "C")))
    apply(t, Seq(
      upd(4, 1, Some(10.0), None, hasContent = false),
      upd(5, 2, None, Some("B2"), hasContent = true),
      del(6, 3)))
    val expected = Map(
      1L -> (Some(10.0), Some("A")),
      2L -> (Some(2.0), Some("B2")))
    assert(state(t) === expected)
    val shuffleTwin = new LakeTable(spark, t.root, maxLocalMergeBytesPerBucket = 0L)
    assert(state(shuffleTwin) === expected)
    // point lookup goes through the zero-shuffle slice
    val one = t.lookup(Map("id" -> 1L)).collect()
    assert(one.length === 1 && one(0).getString(2) === "A" &&
      one(0).getDouble(1) === 10.0)
    // batched lookup shares the same merge slices
    val batched = t.lookup(Seq(Map("id" -> 1L), Map("id" -> 2L), Map("id" -> 3L)))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(batched === Map(1L -> "A", 2L -> "B2"))
  }

  test("compaction folds coalesced state into full base rows; reads stay correct") {
    val t = newTable("pu-compact", maxDeltas = 1)
    apply(t, Seq(ins(1, 1, 1.0, "CONTENT-1"), ins(2, 2, 1.0, "CONTENT-2")))
    apply(t, Seq(upd(3, 1, Some(2.0), None, hasContent = false)))
    apply(t, Seq(upd(4, 2, Some(3.0), None, hasContent = false)))
    MergeEngine.compactAll(t)
    val snap = t.currentSnapshot.get
    assert(snap.bucketDeltas.values.forall(_.isEmpty), "fixture must compact")
    assert(state(t) === Map(
      1L -> (Some(2.0), Some("CONTENT-1")),
      2L -> (Some(3.0), Some("CONTENT-2"))))
    // post-compaction partial updates coalesce against the NEW base
    apply(t, Seq(upd(5, 1, Some(7.0), None, hasContent = false)))
    assert(state(t)(1L) === (Some(7.0), Some("CONTENT-1")))
  }

  test("property: random partial streams match a sequential per-column oracle") {
    val rnd = new scala.util.Random(20260819L)
    val nKeys = 12
    var lsn = 0L
    val batches = (0 until 4).map { _ =>
      (0 until 30).map { _ =>
        lsn += 1
        val id = 1L + rnd.nextInt(nKeys)
        rnd.nextInt(10) match {
          case k if k < 4 =>
            ("insert", lsn, id, Some(lsn.toDouble), Some(s"c$lsn"): Option[String], true)
          case k if k < 8 =>
            val hasV = rnd.nextBoolean()
            val hasC = rnd.nextBoolean()
            val cVal = if (rnd.nextInt(4) == 0) None else Some(s"c$lsn")
            ("update", lsn, id,
              if (hasV) Some(lsn.toDouble) else None,
              if (hasC) cVal else None, hasC)
          case _ => ("delete", lsn, id, None, None, false)
        }
      }
    }
    // sequential oracle: per key, inserts replace, updates patch carried
    // columns, deletes remove
    val oracle = scala.collection.mutable.Map[Long, (Option[Double], Option[String])]()
    batches.flatten.foreach {
      case ("insert", _, id, v, c, _) => oracle(id) = (v, c)
      case ("update", _, id, v, c, hasC) =>
        val (pv, pc) = oracle.getOrElse(id, (None, None))
        oracle(id) = (v.orElse(pv), if (hasC) c else pc)
      case ("delete", _, id, _, _, _) => oracle.remove(id)
    }
    val t = newTable("pu-prop", maxDeltas = 2) // force compactions mid-stream
    batches.foreach { b =>
      apply(t, b.map {
        case ("insert", l, id, v, c, _) => ins(l, id, v.get, c.get)
        case ("update", l, id, v, c, hasC) => upd(l, id, v, c, hasC)
        case ("delete", l, id, _, _, _) => del(l, id)
      })
    }
    assert(state(t) === oracle.toMap)
    val shuffleTwin = new LakeTable(spark, t.root, maxLocalMergeBytesPerBucket = 0L)
    assert(state(shuffleTwin) === oracle.toMap)
  }

  test("change feed on a partial table exposes presence and barrier") {
    val t = newTable("pu-feed")
    apply(t, Seq(ins(1, 1, 1.0, "BIG")))
    apply(t, Seq(upd(2, 1, Some(2.0), None, hasContent = false)))
    val feed = t.changes(-1, t.currentSnapshot.get.snapshotId)
    assert(feed.columns.contains("_cols") && feed.columns.contains("_barrier"))
    val rows = feed.orderBy("_snapshot").collect()
    assert(rows.length === 2)
    val insRow = rows(0)
    assert(insRow.getAs[String]("_kind") === "insert" &&
      insRow.getAs[Boolean]("_barrier") &&
      insRow.getAs[Seq[String]]("_cols").toSet === Set("id", "val", "content"))
    val updRow = rows(1)
    assert(updRow.getAs[String]("_kind") === "update" &&
      !updRow.getAs[Boolean]("_barrier") &&
      updRow.getAs[Seq[String]]("_cols").toSet === Set("id", "val"),
      "the omitted TOAST column must not appear as present")
    assert(updRow.isNullAt(updRow.fieldIndex("content")))
    // the batch read connector's changes form carries the same presence
    val viaConnector = spark.read.format("graft-lake")
      .option("path", t.root).option("changes", "true")
      .option("fromSnapshot", -1).load()
    assert(viaConnector.columns.contains("_cols") &&
      viaConnector.columns.contains("_barrier"))
    assert(viaConnector.count() === 2)
  }

  test("bootstrap of a partial source survives expired TOAST-omitting history") {
    val t = newTable("pu-boot-src")
    apply(t, Seq(ins(1, 1, 1.0, "BIG-1"), ins(2, 2, 2.0, "BIG-2")))
    apply(t, Seq(upd(3, 1, Some(10.0), None, hasContent = false)))
    t.expireSnapshots(keepLast = 1)
    // the feed below the horizon is GONE — and with it the ONLY rows that
    // ever carried content (every later update omitted it as unchanged
    // TOAST). No feed replay at any fromSnapshot can recover those values;
    // only the merged CLONE can supply them — the partial-table case where
    // bootstrap is not merely convenient but the only correct path.
    val mirrorRoot = tmpDir("pu-boot-dst")
    val ckpt = tmpDir("pu-boot-ckpt")
    graft.streaming.Mirror.bootstrap(spark, t.root, mirrorRoot, ckpt)
      .awaitTermination()
    val mirror = new LakeTable(spark, mirrorRoot)
    assert(mirror.currentSnapshot.get.partialUpdates,
      "the clone must carry the partialUpdates property")
    assert(state(mirror) === state(t))
    assert(state(mirror) === Map(
      1L -> (Some(10.0), Some("BIG-1")),
      2L -> (Some(2.0), Some("BIG-2"))))
    // a post-bootstrap TOAST-omitting update flows through the same
    // checkpoint as a partial feed row; the overlay must resolve its
    // absent content from the CLONE's base across the seam
    apply(t, Seq(upd(4, 2, Some(22.0), None, hasContent = false)))
    graft.streaming.Mirror.bootstrap(spark, t.root, mirrorRoot, ckpt)
      .awaitTermination()
    assert(state(mirror) === state(t))
    assert(state(mirror)(2L) === ((Some(22.0), Some("BIG-2"))))
  }

  test("mirror of a partial table converges under TOAST omission and barriers") {
    val t = newTable("pu-mirror-src")
    apply(t, Seq(ins(1, 1, 1.0, "BIG-1"), ins(2, 2, 2.0, "BIG-2"),
      ins(3, 3, 3.0, "BIG-3")))
    apply(t, Seq(
      upd(4, 1, Some(10.0), None, hasContent = false),  // TOAST omission
      upd(5, 2, Some(20.0), Some(null), hasContent = true), // explicit null
      del(6, 3)))
    apply(t, Seq(ins(7, 3, 30.0, "BIG-3-NEW"),
      upd(8, 3, Some(33.0), None, hasContent = false))) // post-reinsert patch
    val mirrorRoot = tmpDir("pu-mirror-dst")
    val q = graft.streaming.Mirror.follow(spark, t.root, mirrorRoot,
      tmpDir("pu-mirror-ckpt"))
    q.awaitTermination()
    val mirror = new LakeTable(spark, mirrorRoot)
    assert(mirror.currentSnapshot.get.partialUpdates,
      "the mirror must inherit the source's partialUpdates property")
    assert(state(mirror) === state(t))
    assert(state(mirror) === Map(
      1L -> (Some(10.0), Some("BIG-1")),
      2L -> (Some(20.0), None),
      3L -> (Some(33.0), Some("BIG-3-NEW"))))
  }

  test("a pre-existing non-partial mirror refuses a partial feed loudly") {
    val t = newTable("pu-mirror-bad-src")
    apply(t, Seq(ins(1, 1, 1.0, "X")))
    val mirrorRoot = tmpDir("pu-mirror-bad-dst")
    val bad = new LakeTable(spark, mirrorRoot)
    bad.create(schema, Seq("id"), nBuckets = 4, partialUpdates = false)
    val q = graft.streaming.Mirror.follow(spark, t.root, mirrorRoot,
      tmpDir("pu-mirror-bad-ckpt"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    def chain(x: Throwable): Seq[Throwable] =
      if (x == null) Nil else x +: chain(x.getCause)
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("partialUpdates"))))
  }

  test("e2e: TOAST-omitting generator through the pipeline matches the sequential oracle") {
    import graft.cli.Main
    import graft.gen.{ChangeStreamGen, GenConfig}
    import graft.streaming.{CdcPipeline, TableTarget}
    val cfg = GenConfig(seed = 91L, nRepos = 10, pathsPerRepo = 4,
      maxChangesPerTxn = 3, renameAtLsn = 120L, toastOmitUpdates = true)
    val wal = tmpDir("pu-e2e-wal")
    ChangeStreamGen.writeSegments(spark, cfg, wal, 200L, txnsPerSegment = 50)
    val table = new LakeTable(spark, tmpDir("pu-e2e-repos"),
      maxDeltasPerBucket = 2) // force compactions mid-stream
    val pipe = new CdcPipeline(spark, wal, tmpDir("pu-e2e-ckpt"),
      Seq(TableTarget("repos", table, Main.reposSchema, Seq("repo", "path"),
        4, Main.reposRenameMap, partialUpdates = true)),
      Set("repos"), maxFilesPerTrigger = Some(1)) // 4 micro-batches
    pipe.runAvailable()
    assert(table.currentSnapshot.get.partialUpdates)
    def sha(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val exp = ChangeStreamGen.expectedFinalState(cfg, 200L).map { case (k, ch) =>
      k -> (ch.commit, ch.lang, Option(ch.content).map(sha))
    }
    val got = table.read()
      .select(col("repo"), col("path"), col("commit"), col("language"),
        sha2(col("content"), 256))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getString(2), r.getString(3), Option(r.getString(4)))).toMap
    assert(got === exp)
    // the stream genuinely exercised omission: at least one surviving key's
    // content predates its last (update) change
    assert(exp.exists { case (_, (_, _, c)) => c.isEmpty } ||
      ChangeStreamGen.expectedFinalState(cfg.copy(toastOmitUpdates = false), 200L)
        .exists { case (k, ch) =>
          exp.get(k).exists(e => e._3 != Option(ch.content).map(sha)) })
  }

  test("distributed manifests, rebucket, and additive evolution keep partial semantics") {
    // distributed-manifest form from the first commit
    val t = new LakeTable(spark, tmpDir("pu-dm"), manifestThresholdFiles = 0)
    t.create(schema, Seq("id"), nBuckets = 4, partialUpdates = true)
    apply(t, Seq(ins(1, 1, 1.0, "KEEP-1"), ins(2, 2, 2.0, "KEEP-2")))
    apply(t, Seq(upd(3, 1, Some(3.0), None, hasContent = false)))
    assert(state(t) === Map(1L -> (Some(3.0), Some("KEEP-1")),
      2L -> (Some(2.0), Some("KEEP-2"))))
    // bucket-count evolution rewrites FULL rows; coalesce restarts at base
    MergeEngine.rebucket(t, 8)
    val snap = t.currentSnapshot.get
    assert(snap.nBuckets === 8 && snap.partialUpdates,
      "rebucket must carry the partialUpdates property")
    assert(state(t) === Map(1L -> (Some(3.0), Some("KEEP-1")),
      2L -> (Some(2.0), Some("KEEP-2"))))
    apply(t, Seq(upd(4, 2, Some(9.0), None, hasContent = false)))
    assert(state(t)(2L) === (Some(9.0), Some("KEEP-2")))
    // additive evolution: a column first seen mid-stream, then omitted
    apply(t, Seq(
      s"""{"lsn":5,"xid":105,"change":[{"kind":"update","schema":"public","table":"t",""" +
        s""""columnnames":["id","extra"],"columntypes":["bigint","text"],""" +
        s""""columnvalues":[1,"E1"],""" +
        s""""oldkeys":{"keynames":["id"],"keytypes":["bigint"],"keyvalues":[1]}}]}"""))
    apply(t, Seq(upd(6, 1, Some(6.0), None, hasContent = false)))
    val evolved = t.currentSnapshot.get
    assert(evolved.schema.fieldNames.contains("extra"))
    val row1 = t.read().filter(col("id") === 1L).collect().head
    assert(row1.getAs[Double]("val") === 6.0 &&
      row1.getAs[String]("content") === "KEEP-1" &&
      row1.getAs[String]("extra") === "E1",
      "a mid-stream column must survive later omissions like any other")
  }

  test("replayed batch is a fenced no-op on a partial table") {
    val t = newTable("pu-replay")
    val batch = Seq(ins(1, 1, 1.0, "X"), upd(2, 1, Some(2.0), None, hasContent = false))
    apply(t, batch)
    val snapBefore = t.currentSnapshot.get.snapshotId
    apply(t, batch) // crash-replay of the SAME batch
    assert(t.currentSnapshot.get.snapshotId === snapBefore,
      "all events at/below the watermark => no new commit")
    assert(state(t) === Map(1L -> (Some(2.0), Some("X"))))
  }
}
