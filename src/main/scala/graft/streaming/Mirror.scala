package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.apply.MergeEngine
import graft.lake.{LakeTable, Snapshot}

/**
 * Table→table CDC replication: the engine consuming its OWN change feed.
 * A mirror table follows a source lake table by streaming the source's
 * change data feed (`readStream.format("graft-changes")`) and applying each
 * micro-batch through the same LSN-fenced MERGE the primary ingest uses —
 * so the mirror inherits the engine's exactly-once story wholesale: a
 * replayed feed batch (checkpoint recovery) applies zero rows because every
 * row sits at or below its bucket's LSN watermark in the mirror.
 *
 * This is the downstream half the reference delegates to Kinesis consumers
 * (reference: README.md "Consumers of the Kinesis stream" — pg2k4j only
 * publishes; replaying into a second store is the consumer's problem).
 * Here the feed row format IS re-encodable as the decoder's change-event
 * schema, so the whole apply pipeline (PK split, keep-last dedup, watermark
 * fencing, schema-carrying deltas, fenced commits) is reused verbatim —
 * one code path to trust, not two.
 *
 * Scale shape: each hop is O(changed bytes) — the feed reads only commit
 * deltas, the apply writes only touched buckets. A 100 TB table with a
 * 10 GB/day change rate mirrors at the change rate, never the table size.
 */
object Mirror {

  /** Inverse of [[MergeEngine.pgTypeToSpark]] for every type the lake can
    * hold — the declared-type string a wal2json producer would emit for the
    * column. (Unknown/complex Spark types render as "text", matching the
    * decoder's strings-stay-strings fallback.) */
  def sparkTypeToPg(dt: DataType): String = dt match {
    case ShortType => "smallint"
    case IntegerType => "integer"
    case LongType => "bigint"
    case FloatType => "real"
    case DoubleType => "double precision"
    case _: DecimalType => "numeric"
    case BooleanType => "boolean"
    case DateType => "date"
    case TimestampType => "timestamp without time zone"
    case _ => "text"
  }

  /**
   * Re-encode change-feed rows (the [[LakeTable.changes]] /
   * `graft-changes` output shape) as decoded change events — the exact
   * schema [[graft.decode.ChangeDecoder.decode]] produces — so
   * [[MergeEngine.applyBatch]] can apply them to a downstream table.
   *
   * Values go through their canonical string form (wal2json carries all
   * values as text; the apply side casts back against the target schema),
   * which is the lossless round trip the primary ingest path already
   * proves. Deletes carry only `oldkeys` (null column arrays), exactly as
   * wal2json emits them; updates carry the full new tuple plus `oldkeys`
   * naming the (unchanged) key — the feed's key columns ARE the row
   * identity, so a feed row can never be a PK-changing update.
   *
   * PARTIAL-UPDATE sources (the feed carries `_cols`/`_barrier`): only the
   * columns the collapsed source tuple actually CARRIED are re-encoded —
   * replaying a pivoted row as a full tuple would null exactly the
   * unchanged-TOAST columns in the target. A window that contained an
   * insert/delete (`_barrier`) DEFINES the row, so it replays as an
   * `insert` (the apply-side barrier): the target must not coalesce the
   * row's absent columns from a dead predecessor.
   */
  def feedAsChanges(feed: DataFrame, tableSchema: StructType,
                    keyColumns: Seq[String], tableName: String): DataFrame = {
    val dataFields = tableSchema.fields.toSeq
    val partial = feed.columns.contains("_cols")
    val (names, types, vals, kindCol) =
      if (!partial) (
        array(dataFields.map(f => lit(f.name)): _*),
        array(dataFields.map(f => lit(sparkTypeToPg(f.dataType))): _*),
        array(dataFields.map(f => col(f.name).cast(StringType)): _*),
        col("_kind"))
      else {
        val entries = array(dataFields.map(f => struct(
          lit(f.name).as("n"),
          lit(sparkTypeToPg(f.dataType)).as("t"),
          col(f.name).cast(StringType).as("v"))): _*)
        val present = filter(entries,
          e => array_contains(col("_cols"), e.getField("n")))
        (transform(present, _.getField("n")),
          transform(present, _.getField("t")),
          transform(present, _.getField("v")),
          when(col("_kind") === "delete", "delete")
            .when(col("_barrier"), "insert")
            .otherwise("update"))
      }
    val keyFields = dataFields.filter(f => keyColumns.contains(f.name))
    val oldkeys = struct(
      array(keyFields.map(f => lit(f.name)): _*).as("keynames"),
      array(keyFields.map(f => lit(sparkTypeToPg(f.dataType))): _*).as("keytypes"),
      array(keyFields.map(f => col(f.name).cast(StringType)): _*).as("keyvalues"))
    feed.select(
      col("_lsn").as("lsn"),
      col("_seq").as("seq"),
      col("_lsn").as("xid"), // the feed does not retain xids; lsn is a
                             // valid stand-in (apply never reads it)
      kindCol.as("kind"),
      lit("public").as("schema"),
      lit(tableName).as("table"),
      when(kindCol =!= "delete", names).as("columnnames"),
      when(kindCol =!= "delete", types).as("columntypes"),
      when(kindCol =!= "delete", vals).as("columnvalues"),
      when(kindCol =!= "insert", oldkeys).as("oldkeys"))
  }

  /** Create the mirror table if absent, cloning the SOURCE's current shape:
    * schema, key columns, bucket count. The feed carries post-rename column
    * names, so the mirror needs no rename map of its own. */
  def ensureMirror(spark: SparkSession, mirrorRoot: String,
                   source: Snapshot, maxDeltasPerBucket: Int = 64): LakeTable = {
    val t = new LakeTable(spark, mirrorRoot, maxDeltasPerBucket = maxDeltasPerBucket)
    if (!t.exists)
      t.create(source.schema, source.keyColumns, source.nBuckets,
        partialUpdates = source.partialUpdates)
    t
  }

  /** The feed's data columns: its stream schema minus the feed metadata. */
  private val feedMetaColumns =
    Set("_lsn", "_seq", "_kind", "_snapshot", "_cols", "_barrier")

  /** Apply one micro-batch of feed rows to the mirror. Idempotent (LSN
    * watermark fencing), so safe under Structured Streaming's replay.
    *
    * The encoded columns derive from the FEED's own schema, never the
    * mirror's: after source schema evolution (stream restarted on the
    * evolved schema), the feed carries the new columns and the normal
    * apply-side schema observation evolves the mirror to match — encoding
    * against the mirror's stale schema would silently drop the new
    * columns' data forever. */
  def applyFeedBatch(mirror: LakeTable, feed: DataFrame,
                     saltBuckets: Int = 0): MergeEngine.MergeStats = {
    // root-only: keyColumns is all this needs, and it runs EVERY batch —
    // currentSnapshot would resolve O(buckets) manifests per batch on a
    // distributed-manifest mirror
    val snap = mirror.currentRootSnapshot.getOrElse(throw new IllegalStateException(
      "mirror table must exist before applying feed batches"))
    // A partial-tuple feed applied under whole-row keep-last would null the
    // mirror's unchanged-TOAST columns — refuse loudly, never corrupt.
    if (feed.columns.contains("_cols") && !snap.partialUpdates)
      throw new IllegalStateException(
        "the source table uses partialUpdates (its feed carries partial " +
          "tuples); the mirror table must be created with partialUpdates = true")
    val dataSchema = StructType(
      feed.schema.fields.filterNot(f => feedMetaColumns.contains(f.name)))
    MergeEngine.applyBatch(mirror,
      feedAsChanges(feed, dataSchema, snap.keyColumns, "mirror"),
      saltBuckets = saltBuckets)
  }

  /**
   * Wire the full replication hop: stream the source table's change feed
   * into the mirror. `Trigger.AvailableNow` catches the mirror up to the
   * source's current snapshot and stops; the default processing-time
   * trigger follows indefinitely. Exactly once end-to-end: feed offsets are
   * snapshot ids in the checkpoint, and the apply is LSN-fenced on top.
   */
  def follow(spark: SparkSession, sourceRoot: String, mirrorRoot: String,
             checkpoint: String,
             trigger: Trigger = Trigger.AvailableNow(),
             fromSnapshot: Long = -1L,
             maxSnapshotsPerTrigger: Option[Long] = None,
             onBatch: MergeEngine.MergeStats => Unit = _ => ()): StreamingQuery = {
    val source = new LakeTable(spark, sourceRoot)
    val snap = source.currentRootSnapshot.getOrElse(throw new IllegalArgumentException(
      s"no source table at $sourceRoot"))
    val mirror = ensureMirror(spark, mirrorRoot, snap)
    var reader = spark.readStream.format("graft-changes")
      .option("path", sourceRoot)
      .option("fromSnapshot", fromSnapshot)
    maxSnapshotsPerTrigger.foreach(m =>
      reader = reader.option("maxSnapshotsPerTrigger", m))
    reader.load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onBatch(applyFeedBatch(mirror, batch))
      }
      .start()
  }

  /** The mirror-side marker recording which source snapshot the bootstrap
    * clone pinned. Lives directly in the mirror's meta/ (immutable,
    * first-writer-wins publish; no maintenance pass sweeps that name). */
  private[graft] val BootstrapMarker = "mirror-bootstrap.json"

  private val markerMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def markerJson(sourceRoot: String, id: Long): String = {
    val n = markerMapper.createObjectNode()
    n.put("sourceRoot", sourceRoot)
    n.put("sourceSnapshotId", id)
    markerMapper.writeValueAsString(n)
  }

  private def parseMarker(json: String): (String, Long) = {
    val n = markerMapper.readTree(json)
    (n.get("sourceRoot").asText(), n.get("sourceSnapshotId").asLong())
  }

  /**
   * BOOTSTRAP replication of an EXISTING table — the deployment-common
   * case [[follow]] alone cannot serve: a long-lived source has expired
   * its early snapshots, so `fromSnapshot = -1` (feed since creation)
   * fails loudly at the retention horizon, and `fromSnapshot = current`
   * would mirror only future commits, silently missing every
   * pre-existing row.
   *
   * The composition: CLONE the source at a pinned snapshot S
   * ([[LakeTable.cloneTo]] — distributed copy; schema, key columns,
   * bucket count, `partialUpdates`, and the per-bucket LSN WATERMARKS all
   * travel), then [[follow]] the feed from `fromSnapshot = S`. Exactly
   * once across the seam by the same two layers the plain mirror proves:
   * snapshot-id offsets in the checkpoint above, and the cloned
   * watermarks fencing any feed overlap below (a replayed row at or
   * under its bucket's watermark applies as a no-op).
   *
   * S is durably recorded in the mirror's meta/ BEFORE the clone starts
   * (first-writer-wins publish), closing the crash windows:
   *
   *  - crash between marker and clone commit → re-run finds the marker
   *    with no table and redoes the clone at the SAME pinned S (the copy
   *    overwrites its own torn retry);
   *  - crash between clone and the first checkpointed batch → re-run
   *    reads S from the marker, never from the source's (possibly
   *    advanced) current snapshot — deriving S from "current" here would
   *    silently skip every commit landed in between;
   *  - two concurrent bootstrappers → one marker wins, the loser re-reads
   *    the winner's S and the clone commit itself is fenced, so both race
   *    toward the identical clone.
   *
   * Restart semantics: with the checkpoint present the stream resumes
   * from its own offsets (the pinned S only seeds the FIRST run). A
   * mirror root holding a table but NO marker was not made by bootstrap —
   * refused loudly rather than guessing a lower bound that could skip
   * commits. If S has been expired at the source before the clone could
   * complete, the bootstrap fails loudly (re-run with a fresh mirror root
   * to pin a newer snapshot).
   *
   * @param asOf pin a historical source snapshot instead of the current
   *             one (point-in-time mirror that then catches up); on a
   *             re-run it must match the already-pinned S.
   */
  def bootstrap(spark: SparkSession, sourceRoot: String, mirrorRoot: String,
                checkpoint: String,
                asOf: Option[Long] = None,
                trigger: Trigger = Trigger.AvailableNow(),
                maxSnapshotsPerTrigger: Option[Long] = None,
                onBatch: MergeEngine.MergeStats => Unit = _ => ()): StreamingQuery = {
    val source = new LakeTable(spark, sourceRoot)
    val mirror = new LakeTable(spark, mirrorRoot)
    val pinned = ensureBootstrapped(source, mirror, asOf)
    follow(spark, sourceRoot, mirrorRoot, checkpoint, trigger,
      fromSnapshot = pinned, maxSnapshotsPerTrigger = maxSnapshotsPerTrigger,
      onBatch = onBatch)
  }

  /** Pin S (marker), materialize the clone if absent, return S. Idempotent
    * across crashes and concurrent bootstrappers — see [[bootstrap]]. */
  private[graft] def ensureBootstrapped(source: LakeTable, mirror: LakeTable,
                                        asOf: Option[Long]): Long = {
    def readMarker(): Option[(String, Long)] =
      mirror.readImmutableMeta(BootstrapMarker).map(parseMarker)
    var pinnedOpt = readMarker()
    if (pinnedOpt.isEmpty && mirror.exists) {
      // re-read AFTER observing the table: a concurrent bootstrapper may
      // have published its marker AND committed its clone between our
      // first read and the exists check. Marker-before-clone ordering
      // makes this re-read sufficient: a committed bootstrap clone implies
      // a durable marker.
      pinnedOpt = readMarker()
      if (pinnedOpt.isEmpty)
        throw new IllegalStateException(
          s"mirror root ${mirror.root} already holds a table but no bootstrap " +
            "marker — it was not created by bootstrap; use follow() with an " +
            "explicit fromSnapshot instead")
    }
    val pinned: (String, Long) = pinnedOpt.getOrElse {
      val snap = source.currentRootSnapshot.getOrElse(
        throw new IllegalArgumentException(s"no source table at ${source.root}"))
      val id = asOf.getOrElse(snap.snapshotId)
      // FENCED publish: racers pin DIFFERENT ids (each read its own
      // "current"), so first-writer-wins must be real fencing, never
      // tmp+move (a silent rename-replace would durably re-pin a different
      // id than the committed clone's). Losing is fine — re-read the
      // winner's pin; a transiently-refused publish retries.
      var marker: Option[(String, Long)] = None
      var attempts = 0
      while (marker.isEmpty && attempts < 5) {
        mirror.publishFencedMeta(BootstrapMarker,
          markerJson(source.qualifiedRoot, id))
        marker = readMarker()
        attempts += 1
      }
      marker.getOrElse(throw new IllegalStateException(
        s"could not publish or read the bootstrap marker at ${mirror.root} " +
          s"after $attempts attempts"))
    }
    val (pinnedRoot, pinnedId) = pinned
    // FileSystem-qualified comparison (raw strings differ by scheme prefix
    // and slash spelling for one path): a clone of table A must never be
    // fed table B's feed — the watermarks would silently mis-fence
    require(source.qualify(pinnedRoot) == source.qualifiedRoot,
      s"mirror ${mirror.root} was bootstrapped from $pinnedRoot, not ${source.root}")
    asOf.foreach(a => require(a == pinnedId,
      s"bootstrap already pinned source snapshot $pinnedId; asOf=$a conflicts " +
        "(delete the mirror root to re-bootstrap at a different snapshot)"))
    if (!mirror.exists) {
      try { source.cloneTo(mirror.root, Some(pinnedId)); () }
      catch {
        // a concurrent bootstrapper landed the clone first — same pinned S,
        // identical content; never delete on conflict (lesson 23)
        case _: graft.lake.CommitConflictException => ()
        case e: IllegalArgumentException if mirror.exists => ()
        case e: java.io.FileNotFoundException =>
          throw new IllegalStateException(
            s"bootstrap snapshot $pinnedId was expired at (or never existed " +
              s"in) the source before the clone completed — delete " +
              s"${mirror.root} and re-bootstrap", e)
      }
      // belt-and-braces: if the clone somehow did not materialize, failing
      // here beats follow()'s ensureMirror creating an EMPTY mirror that
      // would then silently miss every pre-existing row
      if (!mirror.exists) throw new IllegalStateException(
        s"bootstrap clone of ${source.root}@$pinnedId did not materialize " +
          s"at ${mirror.root}")
    }
    pinnedId
  }
}
