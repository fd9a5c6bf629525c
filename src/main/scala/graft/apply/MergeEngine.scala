package graft.apply

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.lake.{CommitConflictException, LakeTable, Snapshot}

/**
 * LSN-ordered MERGE INTO: applies a batch of decoded change events to a
 * [[LakeTable]], exactly once.
 *
 * This is the engine's restatement of what a consumer of the reference
 * reconstructs from the Kinesis stream (the IT's record processor,
 * SlotMessageRecordProcessor.java:42-88): insert puts a full row, update
 * rewrites the row identified by oldkeys, delete removes it. The reference
 * scatters records randomly across shards and gives up per-key ordering
 * (SlotReaderKinesisWriter.java:259-267); we restore it by shuffling on the
 * primary key and keeping, per key, the event with the greatest (lsn, seq).
 *
 * Plan shape (all shuffles are on the PK hash, and the keep-last dedup is a
 * declarative max_by aggregation so Spark's partial aggregation gives
 * map-side combine for free — a hot key collapses to one row per map task
 * before the shuffle, which is the skew story at 10^10 events):
 *
 * {{{
 *   changes -> normalize(rename) -> filter lsn > watermark(bucket)
 *           -> groupBy(pk).agg(max_by(row, (lsn, seq)))             // dedup
 *           -> typed pivot -> append per-bucket DELTA files         // merge-
 *           -> [buckets at delta threshold: compact to fresh base]  // on-read
 *           -> fenced snapshot commit
 * }}}
 *
 * The merge itself is O(batch): deltas are appended, never joined against
 * the current state at write time; readers (and the amortized per-bucket
 * compaction) resolve keep-last-by-(lsn,seq) via [[LakeTable.mergedView]].
 */
object MergeEngine {

  /** Map wal2json/Postgres declared types to Spark types. Unknown types stay
    * strings (the reference never coerces values either — SURVEY.md §1.2). */
  def pgTypeToSpark(pg: String): DataType = {
    val t = pg.toLowerCase.takeWhile(c => c != '(').trim
    t match {
      case "smallint" | "int2" => ShortType
      case "integer" | "int" | "int4" | "serial" => IntegerType
      case "bigint" | "int8" | "bigserial" => LongType
      case "real" | "float4" => FloatType
      case "double precision" | "float8" => DoubleType
      case "numeric" | "decimal" => DecimalType(38, 18)
      case "boolean" | "bool" => BooleanType
      case "date" => DateType
      case s if s.startsWith("timestamp") => TimestampType
      case _ => StringType
    }
  }

  final case class MergeStats(
      committed: Boolean,
      snapshotId: Long,
      inputEvents: Long,
      appliedKeys: Long,
      inserted: Long,
      updated: Long,
      deleted: Long,
      dedupDropped: Long,
      minLsn: Long,
      maxLsn: Long,
      touchedBuckets: Int)

  val noopStats: MergeStats =
    MergeStats(committed = false, -1L, 0L, 0L, 0L, 0L, 0L, 0L, -1L, -1L, 0)

  /** bucketWatermarks size above which the exactly-once gate switches from
    * an inline O(buckets) map literal to a broadcast hash join (constant
    * plan size — per-batch analysis/codegen cost stops scaling with the
    * table's bucket count). Package-private and mutable so tests can force
    * the join path at small scale; every path is semantically identical. */
  private[graft] var watermarkJoinThreshold: Int = 1024

  /** Safe WIDENING lattice for schema evolution: an existing column whose
    * upstream declared type changed may move only to a type whose parquet
    * read path still decodes every file written under the old type (Spark
    * 4 widening reads — INT32 files under a LongType read schema etc.,
    * verified on both the vectorized and row readers). Chains:
    * smallint < int < bigint < numeric(38,18); real < double. Returns the
    * least upper bound, or None when the pair is incomparable (int→text,
    * bool→int, real→numeric …) — pairs [[evolveSchema]] must NOT absorb by
    * changing the stored type (float→decimal would silently re-round every
    * already-written float's exact binary value into decimal(38,18)'s 18
    * fraction digits on read). */
  private[graft] def widen(a: DataType, b: DataType): Option[DataType] = {
    if (a == b) return Some(a)
    def lub(chain: Seq[DataType]): Option[DataType] = {
      val (ia, ib) = (chain.indexOf(a), chain.indexOf(b))
      if (ia >= 0 && ib >= 0) Some(chain(math.max(ia, ib))) else None
    }
    lub(Seq(ShortType, IntegerType, LongType, DecimalType(38, 18)))
      .orElse(lub(Seq(FloatType, DoubleType)))
  }

  /** Evolve the table schema from the batch's observed (column, declared
    * wal2json type) pairs — the engine's Catalyst-driven schema merge (the
    * north rule's replacement for the reference's per-row JSON
    * pass-through). Three cases per observation:
    *
    *  - NEW column → appended nullable (additive evolution, unchanged);
    *  - existing NON-KEY column observed at a STRICTLY WIDER type on the
    *    [[widen]] lattice (upstream `ALTER COLUMN TYPE int → bigint`) →
    *    the column widens. Under Spark 4's ANSI-on defaults the old
    *    behavior was a permanent wedge: the first overflowing value failed
    *    the cast loudly on every replay and the schema could never follow.
    *    Every already-written narrow parquet file stays readable under the
    *    widened explicit read schema (widening reads);
    *  - anything else — KEY columns always, plus same / narrower /
    *    lattice-incomparable observations — the LAKE type stays
    *    authoritative, exactly as before this feature. Two reasons. (1)
    *    An observation wider than the lake type is indistinguishable from
    *    a CREATION-TIME custom schema that deliberately declared the
    *    column narrower than the WAL does (`run --schema 'id INT' --keys
    *    id` over a bigint-declared WAL worked before and must keep
    *    working — acting on the observation would wedge it from batch
    *    one). (2) A key's stored type feeds the bucket hash, so widening
    *    it in place would strand every existing row in a wrong bucket.
    *    A genuinely unabsorbable value still fails loudly at the typed
    *    ANSI cast (string→int overflow = CAST_INVALID_INPUT, classified
    *    DataError) — the upstream-key-widening recovery is a manual
    *    migration (clone to a re-keyed table + re-ingest). Caveat the
    *    float chain inherits from its pre-existing cast semantics: text
    *    beyond float/double range saturates to Infinity rather than
    *    failing (Java parseFloat), so an upstream real→numeric ALTER over
    *    a float lake column keeps float and saturates — choose the lake
    *    type for the values you expect, as before.
    *
    * Observations may repeat a name at several types (a batch spanning the
    * upstream migration); the fold resolves them order-independently. */
  def evolveSchema(current: StructType, observed: Seq[(String, String)],
                   keyColumns: Seq[String]): StructType = {
    val out = scala.collection.mutable.LinkedHashMap(
      current.fields.map(f => f.name -> f).toIndexedSeq: _*)
    observed.foreach { case (n, t) =>
      val obs = pgTypeToSpark(t)
      out.get(n) match {
        case None => out(n) = StructField(n, obs, nullable = true)
        case Some(f) => widen(f.dataType, obs) match {
          case Some(w) if w != f.dataType && !keyColumns.contains(n) =>
            out(n) = f.copy(dataType = w) // strictly wider on the lattice
          case _ => () // keys / same / narrower / incomparable: lake type
                       // stays authoritative (see scaladoc)
        }
      }
    }
    StructType(out.values.toIndexedSeq)
  }

  /**
   * Stage 1, schema-independent: extract typed key columns, split primary-
   * key-changing updates, and carry the rest of the row as name->value /
   * name->type maps (the wal2json self-describing encoding, kept dynamic
   * until after dedup so the whole batch needs only ONE full-size pass).
   *
   * Key columns come from the new tuple for inserts and from oldkeys for
   * update/delete (wal2json identifies the affected row via oldkeys — the
   * reference's oldkeys-identify-the-row rule, DeleteChange.java:57-67).
   * A PK-changing update (new tuple's key differs from oldkeys) splits into
   * a delete of the old key and an insert of the new key at adjacent
   * sequence positions: all seqs are doubled, the synthetic insert sits at
   * 2s+1, preserving the (lsn, seq) total order.
   */
  def prepare(changes: DataFrame, keyFields: Seq[StructField],
              renameMap: Map[String, String]): DataFrame = {
    val keyNames = keyFields.map(_.name)
    // The rename must hit BOTH name carriers: columnnames (new tuple) and
    // oldkeys.keynames (the row identity for update/delete). Renaming only
    // columnnames would make an old-era delete's key lookup miss under the
    // new name — a null-keyed delete marker that never removes the real row
    // — and misclassify every old-era update as a PK change.
    def renameNames(names: Column): Column =
      if (renameMap.isEmpty) names
      else {
        val mapCol = map(renameMap.toSeq.sorted
          .flatMap { case (o, n) => Seq(lit(o), lit(n)) }: _*)
        transform(names, c => coalesce(element_at(mapCol, c), c))
      }
    val renamed = changes.withColumn("columnnames", renameNames(col("columnnames")))
    val withMaps = renamed
      .withColumn("_row", map_from_arrays(col("columnnames"), col("columnvalues")))
      .withColumn("_types", map_from_arrays(col("columnnames"), col("columntypes")))
      .withColumn("_old",
        when(col("oldkeys").isNotNull,
          map_from_arrays(renameNames(col("oldkeys.keynames")),
            col("oldkeys.keyvalues"))))

    def keyFromRow(f: StructField) = element_at(col("_row"), f.name).cast(f.dataType)
    def keyFromOld(f: StructField) =
      coalesce(element_at(col("_old"), f.name), element_at(col("_row"), f.name))
        .cast(f.dataType)

    def action(kind: Column, seq: Column, keyFrom: StructField => Column,
               withValues: Boolean): Column = {
      val keys = keyFields.map(f => keyFrom(f).as(f.name))
      val payload =
        if (withValues) Seq(col("_row").as("_row"), col("_types").as("_types"))
        else Seq(lit(null).cast("map<string,string>").as("_row"),
          lit(null).cast("map<string,string>").as("_types"))
      struct((Seq(kind.as("kind"), seq.as("seq")) ++ keys ++ payload).toIndexedSeq: _*)
    }

    val normal = action(
      col("kind"), col("seq") * 2,
      f => when(col("kind") === "insert", keyFromRow(f)).otherwise(keyFromOld(f)),
      withValues = true)
    val delOld = action(lit("delete"), col("seq") * 2, keyFromOld, withValues = false)
    val insNew = action(lit("insert"), col("seq") * 2 + 1, keyFromRow, withValues = true)

    val keyChanged = col("kind") === "update" && col("oldkeys").isNotNull &&
      keyNames.map { k =>
        element_at(col("_row"), k).isNotNull &&
          !(element_at(col("_old"), k) <=> element_at(col("_row"), k))
      }.reduce(_ || _)

    withMaps
      .select(col("lsn"),
        explode(when(keyChanged, array(delOld, insNew))
          .otherwise(array(normal))).as("a"))
      .select((Seq(col("lsn"), col("a.seq").as("seq"), col("a.kind").as("kind")) ++
        keyNames.map(n => col(s"a.$n").as(n)) ++
        Seq(col("a._row").as("_row"), col("a._types").as("_types"))).toIndexedSeq: _*)
  }

  /**
   * Apply one micro-batch of change events for one table. Idempotent: events
   * at or below a bucket's LSN high watermark are filtered out, so re-running
   * a committed batch (Structured Streaming replays the last batch after a
   * crash) applies zero rows and commits nothing.
   */
  /**
   * @param validate called after the batch's first materializing action but
   *        BEFORE anything is written or committed — the hook where the
   *        pipeline checks its observe-based malformed-line count (single
   *        decode pass) and aborts the batch by throwing
   */
  def applyBatch(table: LakeTable, changes: DataFrame,
                 saltBuckets: Int = 0,
                 validate: () => Unit = () => ()): MergeStats =
    retryingOnConflict(table, "applyBatch")(snap =>
      applyOnce(table, snap, changes, saltBuckets, validate))

  /** The optimistic-concurrency scaffold every snapshot-producing
    * operation shares: re-read the current snapshot, run `op`, and on a
    * lost fencing race ([[CommitConflictException]] — a concurrent writer
    * advanced the table) retry over the fresh state, up to 5 times. */
  private def retryingOnConflict[A](table: LakeTable, what: String)
                                   (op: Snapshot => A): A = {
    var attempt = 0
    while (true) {
      val snap = table.currentSnapshot.getOrElse(
        throw new IllegalStateException(s"table must be created before $what"))
      try return op(snap)
      catch { case _: CommitConflictException if attempt < 5 => attempt += 1 }
    }
    throw new IllegalStateException("unreachable")
  }

  private def applyOnce(table: LakeTable, snap: Snapshot, changes: DataFrame,
                        saltBuckets: Int, validate: () => Unit): MergeStats = {
    val keyCols = snap.keyColumns
    val keyFields = keyCols.map(k => snap.schema(k))

    // 1. Keys + PK-change split + bucket (schema-independent, single pass).
    val prepared = prepare(changes, keyFields, snap.renameMap)
      .withColumn("_bucket", table.bucketExpr(keyCols, snap.nBuckets))

    // 2. Exactly-once gate: drop events at or below their bucket's watermark.
    val fresh0 =
      if (snap.bucketWatermarks.isEmpty)
        prepared.filter(col("lsn") > lit(-1L))
      else if (snap.bucketWatermarks.size == snap.nBuckets &&
        snap.bucketWatermarks.values.toSet.size == 1)
        // uniform full-coverage watermarks (the shape every rebucket
        // commit leaves behind): one literal instead of an O(buckets)
        // map literal in the plan. Full coverage is required — a bucket
        // ABSENT from the map gates at -1, not at the common value.
        prepared.filter(col("lsn") > lit(snap.bucketWatermarks.values.head))
      else if (snap.bucketWatermarks.size <= watermarkJoinThreshold) {
        val m = map(snap.bucketWatermarks.toSeq.sortBy(_._1)
          .flatMap { case (b, w) => Seq(lit(b), lit(w)) }: _*)
        prepared.filter(col("lsn") >
          coalesce(element_at(m, col("_bucket")), lit(-1L)))
      } else {
        // PAST the threshold (a steady-state table with 10^4..10^5 active
        // buckets), an inline map literal means 2x that many literals in
        // every batch's plan — analysis/codegen cost per micro-batch, for
        // the SAME lookup a tiny broadcast hash join does with a
        // constant-size plan. Left join + coalesce(-1) preserves the
        // absent-bucket rule exactly.
        val sp = table.spark
        import sp.implicits._
        val wmDf = snap.bucketWatermarks.toSeq.toDF("_bucket", "_wmGate")
        prepared.join(broadcast(wmDf), Seq("_bucket"), "left")
          .filter(col("lsn") > coalesce(col("_wmGate"), lit(-1L)))
          .drop("_wmGate")
      }

    // Batch-input lineage (dedup stats) measured DURING the dedup pass via
    // an observation — no extra job.
    val obs = org.apache.spark.sql.Observation()
    val fresh = fresh0.observe(obs,
      count(lit(1)).as("inputEvents"))

    // 3. Keep-last per key by (lsn, seq): declarative max_by => partial
    //    (map-side) aggregation absorbs hot keys before the shuffle. The raw
    //    row map rides along; the typed pivot happens AFTER dedup so the
    //    batch needs exactly one full-size pass (and one driver-side plan).
    //
    //    Hot-key skew: partial aggregation already collapses a hot key to
    //    one row per map task. saltBuckets > 0 additionally forces an
    //    explicit two-phase (salted) aggregation — groupBy(key, salt) then
    //    groupBy(key) — for streams whose map-side hash tables would
    //    otherwise overflow (north rule's primary-key salting).
    val rowStruct = struct(col("lsn"), col("seq"), col("kind"),
      col("_bucket"), col("_row"), col("_types"))
    val ordStruct = struct(col("lsn"), col("seq"))
    def dedupInput =
      if (saltBuckets <= 0) fresh
      else {
        val salted = fresh
          .withColumn("_salt", pmod(xxhash64(col("lsn"), col("seq")), lit(saltBuckets)))
          .groupBy((keyCols.map(col) :+ col("_salt")): _*)
          .agg(max_by(rowStruct, ordStruct).as("w"))
          .select((keyCols.map(col) :+ col("w.*")).toIndexedSeq: _*)
        salted
      }
    // explicitly-requested salting is incompatible with the overlay (see
    // the partial branch below) — say so rather than silently executing a
    // different plan than the operator tuned for
    if (snap.partialUpdates && saltBuckets > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"saltBuckets=$saltBuckets ignored on partialUpdates table " +
          s"${table.root}: the overlay aggregate relies on map-side " +
          "partial combine instead (two salt partitions of one key would " +
          "lose per-column ordering)")
    val deduped =
      if (snap.partialUpdates) {
        // PARTIAL-UPDATE tables: column-wise keep-last
        // ([[graft.functions.OverlayKeepLast]]) — the only dedup that is
        // correct when update tuples OMIT unchanged-TOAST columns (a
        // whole-row max_by would null exactly the big column TOAST exists
        // for). Still one hash aggregation with map-side partial combine
        // (ObjectHashAggregate merges serialized overlay buffers), so the
        // hot-key story is unchanged. The explicit salted two-phase is NOT
        // applied here: re-aggregating already-collapsed maps loses the
        // per-column ordering the overlay depends on (two salt partitions
        // of one key interleave in (lsn,seq)).
        fresh
          .groupBy(keyCols.map(col): _*)
          .agg(
            // register into the OPERAND's session: under foreachBatch the
            // batch df lives in a micro-batch session CLONE whose function
            // registry was copied at stream start — table.spark's registry
            // is invisible to the clone's analyzer
            graft.functions.OverlayKeepLast.overlayKeepLast(fresh.sparkSession,
              col("lsn"), col("seq").cast("int"), col("kind"),
              col("_row"), col("_types"), col("kind") =!= "update").as("w"),
            max(col("_bucket")).as("_bucket"))
          .select((keyCols.map(col) ++ Seq(col("w.lsn").as("lsn"),
            col("w.seq").as("seq"), col("w.kind").as("kind"), col("_bucket"),
            col("w._row").as("_row"), col("w._types").as("_types"),
            col("w._barrier").as("_barrier"))).toIndexedSeq: _*)
      } else dedupInput
        .groupBy(keyCols.map(col): _*)
        .agg(max_by(rowStruct, ordStruct).as("w"))
        .select((keyCols.map(col) :+ col("w.*")).toIndexedSeq: _*)

    // 4. SINGLE PASS to storage: the surviving events are written directly
    //    as per-bucket DELTA files in the raw self-describing encoding
    //    (typed keys + _row/_types maps + _lsn/_seq/_kind). No persist —
    //    caching the wide map payloads measurably cost more than the whole
    //    remaining pipeline — and no pre-write typed pivot, which would
    //    need the evolved schema and therefore a second full pass to
    //    observe it first. Per-bucket stats, lineage, and schema evolution
    //    are computed AFTER the write from the written deltas, which are
    //    O(batch)-small; readers pivot delta maps through the snapshot
    //    schema (LakeTable.mergedView).
    val deltaRows = deduped.select((keyCols.map(col) ++ Seq(
        col("_row"), col("_types"),
        col("lsn").as("_lsn"), col("seq").cast("int").as("_seq"),
        col("kind").as("_kind"), col("_bucket")) ++
        // whether the collapsed window contained an insert/delete — the
        // read-side overlay must not coalesce PAST such a row
        (if (snap.partialUpdates) Seq(col("_barrier")) else Nil))
        .toIndexedSeq: _*)
      .repartition(col("_bucket")) // one delta file per touched bucket
    val newId = snap.snapshotId + 1
    val deltaDir = table.newCommitDirName(newId, "delta")
    val (writtenDeltas, deltaBytes) = table.writeBucketedSized(deltaRows, deltaDir)
    val attemptDirs = scala.collection.mutable.ListBuffer(deltaDir)

    try {
      // Batch validation gate: the decode observe-metrics are complete (the
      // write materialized the plan) but nothing is committed — a strict-
      // mode malformed batch aborts here and the catch removes the attempt
      // directory. This runs even when zero events survived the watermark
      // gate: a batch malformed IN FULL must still fail, never no-op.
      validate()
      val inputEvents = obs.get.get("inputEvents")
        .map(_.asInstanceOf[Long]).getOrElse(-1L)

      if (writtenDeltas.isEmpty) {
        table.deleteDataDir(deltaDir)
        return noopStats.copy(snapshotId = snap.snapshotId, inputEvents = inputEvents)
      }

      // 5. Per-bucket lineage + observed schema + PER-FILE key min/max,
      //    read back from the small written deltas in ONE quick job (no
      //    re-decode, no cache). Grouping by (bucket, file) keeps the job
      //    a single pass; bucket-grain numbers are re-aggregated driver-
      //    side from the handful of per-file rows. The distinct type-map
      //    JSONs double as the schema observation: a batch carries only a
      //    handful of distinct column-set eras, so collect_set stays tiny.
      val fileRows = fileStatsJob(table, deltaDir, keyCols, withTypes = true)

      val statRows = fileRows
        .groupBy(_.getAs[Int]("_bucket")).map { case (b, rows) =>
          (b,
            rows.map(_.getAs[Long]("keys")).sum,
            rows.map(_.getAs[Long]("ins")).sum,
            rows.map(_.getAs[Long]("upd")).sum,
            rows.map(_.getAs[Long]("del")).sum,
            rows.map(_.getAs[Long]("minLsn")).min,
            rows.map(_.getAs[Long]("maxLsn")).max,
            rows.flatMap(_.getAs[scala.collection.Seq[String]]("typeSets")).distinct)
        }.toSeq
      val deltaFileStats = perFileKeyRanges(fileRows, deltaDir, keyCols)

      val touched = statRows.map(_._1).toSet
      val appliedKeys = statRows.map(_._2).sum
      val inserted = statRows.map(_._3).sum
      val updated = statRows.map(_._4).sum
      val deleted = statRows.map(_._5).sum
      val minLsn = statRows.map(_._6).min
      val maxLsn = statRows.map(_._7).max
      val perBucketMax = statRows.map(r => r._1 -> r._7).toMap

      // 6. Schema evolution: additive columns observed in the batch extend
      //    the table schema; an existing column observed at a WIDER
      //    declared type widens it (Catalyst-driven schema merge). ALL
      //    distinct (name, type) observations are passed through — a batch
      //    spanning the upstream type migration legitimately carries a
      //    column at two types, and collapsing to one arbitrary winner
      //    here would make the widening era-order-dependent.
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val observed = statRows
        .flatMap(_._8)
        .distinct
        .flatMap { js =>
          val n = mapper.readTree(js)
          import scala.jdk.CollectionConverters._
          n.properties().asScala.map(e => (e.getKey, e.getValue.asText()))
        }
        .sortBy(identity).distinct
      val schema = evolveSchema(snap.schema, observed, snap.keyColumns)

      val deltasAfter = snap.bucketDeltas ++ writtenDeltas.map { case (b, fs) =>
        b -> (snap.bucketDeltas.getOrElse(b, Nil) ++ fs)
      }

      // 7. Bounded read amplification, SIZE-TIERED: a bucket compacts back
      //    to a fresh base WITHIN this commit once its accumulated delta
      //    BYTES reach maxDeltaBytesPerBucket (sizes ride the snapshot,
      //    recorded from the write listing) — many tiny deltas defer the
      //    full bucket rewrite until it is worth paying, while one huge
      //    delta triggers promptly. maxDeltasPerBucket stays as the hard
      //    FILE-COUNT cap bounding per-read open/listing fan-in. A file
      //    with no recorded size (pre-upgrade snapshot) counts as large,
      //    preserving the old count-triggered eagerness.
      val knownBytes = snap.fileBytes ++ deltaBytes
      def deltaByteSum(fs: Seq[String]): Long =
        fs.iterator.map(f =>
          knownBytes.getOrElse(f, table.maxDeltaBytesPerBucket)).sum
      //    inlineCompaction=false defers the whole rewrite to the
      //    standalone compactAll maintenance pass: no bucket rewrite ever
      //    lands inside an ingest commit (bounded per-batch apply latency),
      //    at the cost of read amplification growing until maintenance runs.
      val toCompact =
        if (!table.inlineCompaction) Set.empty[Int]
        else deltasAfter.collect {
          case (b, fs) if fs.nonEmpty &&
            (fs.size >= table.maxDeltasPerBucket ||
              deltaByteSum(fs) >= table.maxDeltaBytesPerBucket) => b
        }.toSet
      val (bucketFiles, bucketDeltas, compactFileStats, compactBytes) =
        if (toCompact.isEmpty)
          (snap.bucketFiles, deltasAfter,
            Map.empty[String, Map[String, (String, String)]],
            Map.empty[String, Long])
        else compactWrite(table, snap, newId, schema, deltasAfter, toCompact,
          dir => attemptDirs += dir)
      val bucketWatermarks = snap.bucketWatermarks ++
        perBucketMax.map { case (b, w) =>
          b -> math.max(w, snap.bucketWatermarks.getOrElse(b, -1L))
        }
      val lineage = Map(
        "inputEvents" -> inputEvents, "appliedKeys" -> appliedKeys,
        "inserted" -> inserted, "updated" -> updated, "deleted" -> deleted,
        "dedupDropped" -> (inputEvents - appliedKeys),
        "minLsn" -> minLsn, "maxLsn" -> maxLsn,
        "touchedBuckets" -> touched.size.toLong)
      // Per-partition (bucket) lineage, accumulated across commits: applied-
      // op counts summed, LSN bounds widened (per-partition lineage).
      val batchBucketLineage = statRows.map { r =>
        r._1 -> Map(
          "keys" -> r._2, "inserted" -> r._3,
          "updated" -> r._4, "deleted" -> r._5,
          "minLsn" -> r._6, "maxLsn" -> r._7)
      }.toMap
      val bucketLineage = snap.bucketLineage ++ batchBucketLineage.map {
        case (b, cur) =>
          val prev = snap.bucketLineage.getOrElse(b, Map.empty[String, Long])
          b -> Map(
            "keys" -> (prev.getOrElse("keys", 0L) + cur("keys")),
            "inserted" -> (prev.getOrElse("inserted", 0L) + cur("inserted")),
            "updated" -> (prev.getOrElse("updated", 0L) + cur("updated")),
            "deleted" -> (prev.getOrElse("deleted", 0L) + cur("deleted")),
            "minLsn" -> math.min(prev.getOrElse("minLsn", Long.MaxValue), cur("minLsn")),
            "maxLsn" -> math.max(prev.getOrElse("maxLsn", -1L), cur("maxLsn")))
      }
      // per-file key min/max: carry forward stats for surviving files, add
      // this batch's delta files and any compaction-fresh base files, drop
      // entries for files no longer referenced (compacted-away deltas /
      // replaced bases) so the manifest never grows stale entries
      val liveFiles = (bucketFiles.values.flatten ++
        bucketDeltas.values.flatten).toSet
      val fileStats = (snap.fileStats ++ deltaFileStats ++ compactFileStats)
        .filter { case (f, _) => liveFiles.contains(f) }
      val fileBytes = (knownBytes ++ compactBytes)
        .filter { case (f, _) => liveFiles.contains(f) }
      val next = snap.copy(
        schema = schema,
        bucketFiles = bucketFiles,
        bucketDeltas = bucketDeltas.filter(_._2.nonEmpty),
        // change-feed provenance: THIS commit's written deltas (replaces
        // the previous snapshot's value — per-commit, never cumulative),
        // referenced even when a bucket compacted them away in the same
        // commit, so LakeTable.changes never loses a commit's rows
        commitDeltas = writtenDeltas,
        bucketWatermarks = bucketWatermarks,
        bucketLineage = bucketLineage,
        lsnHighWatermark = math.max(snap.lsnHighWatermark, maxLsn),
        lineage = lineage,
        fileStats = fileStats,
        fileBytes = fileBytes)
      table.commit(next, expectedSnapshotId = snap.snapshotId,
        prev = Some(snap)) // lets manifest mode diff-reuse untouched buckets

      MergeStats(committed = true, newId, inputEvents, appliedKeys,
        inserted, updated, deleted, inputEvents - appliedKeys,
        minLsn, maxLsn, touched.size)
    } catch {
      // A lost fencing race, failed validation, or any other failure must
      // not leak the attempt's data files — they are referenced by no
      // snapshot and would otherwise accumulate unbounded across retries.
      case e: Throwable =>
        attemptDirs.foreach(table.deleteDataDir)
        throw e
    }
  }

  /** Rewrite `toCompact` buckets' base+deltas to fresh key-sorted base
    * files under commit `newId` — the shared write half of both the
    * inline (size-tiered, within-apply) compaction and the standalone
    * [[compactAll]] maintenance pass. `registerDir` is invoked with the
    * attempt directory BEFORE any file is written, so the caller's
    * failure path can always clean it up.
    *
    * Exchange-free compaction: the shuffle-free per-bucket merge already
    * emits ONE partition per bucket with rows in key order, so
    * partitionBy("_bucket") writes exactly one KEY-SORTED file per
    * compacted bucket — no repartition, no extra sort. (The old shuffle
    * formulation scattered each bucket across all shuffle partitions:
    * P small files per bucket per compaction.) Past the plan-size guard,
    * fall back to the shuffle merge + repartition.
    *
    * @return (new bucketFiles, new bucketDeltas, fresh-file key stats,
    *         fresh-file bytes) */
  private def compactWrite(table: LakeTable, snap: Snapshot, newId: Long,
      schema: StructType, deltasAfter: Map[Int, Seq[String]],
      toCompact: Set[Int], registerDir: String => Unit)
      : (Map[Int, Seq[String]], Map[Int, Seq[String]],
         Map[String, Map[String, (String, String)]], Map[String, Long]) = {
    val keyCols = snap.keyColumns
    val compactBuckets = toCompact.toSeq.sorted
    val mergedRows =
      if (compactBuckets.size <= table.maxLocalMergeBuckets)
        table.mergedViewLocal(schema, keyCols, snap.renameMap,
          compactBuckets.map(b => (snap.bucketFiles.getOrElse(b, Nil),
            deltasAfter.getOrElse(b, Nil))),
          partialUpdates = snap.partialUpdates)
          .withColumn("_bucket", table.bucketExpr(keyCols, snap.nBuckets))
      else
        table.mergedView(schema, keyCols, snap.renameMap,
          compactBuckets.flatMap(b => snap.bucketFiles.getOrElse(b, Nil)),
          compactBuckets.flatMap(b => deltasAfter.getOrElse(b, Nil)),
          partialUpdates = snap.partialUpdates)
          .withColumn("_bucket", table.bucketExpr(keyCols, snap.nBuckets))
          .repartition(col("_bucket"))
          .sortWithinPartitions(keyCols.map(col): _*)
    val compactDir = table.newCommitDirName(newId, "compact")
    registerDir(compactDir)
    val (w, cBytes) = table.writeBucketedSized(mergedRows, compactDir)
    val newBase = snap.bucketFiles ++
      toCompact.map(b => b -> w.getOrElse(b, Nil)).toMap
    // per-file key ranges for the fresh base files (small job over the
    // just-written, footer-cached compaction output). A compaction whose
    // every key was deleted writes NO parquet files (only a _SUCCESS
    // marker) — there is nothing to read stats from.
    val compactRows =
      if (w.values.forall(_.isEmpty)) Array.empty[org.apache.spark.sql.Row]
      else fileStatsJob(table, compactDir, keyCols, withTypes = false)
    (newBase.filter(_._2.nonEmpty), // a fully-deleted bucket vanishes
      deltasAfter ++ toCompact.map(b => b -> Seq.empty[String]).toMap,
      perFileKeyRanges(compactRows, compactDir, keyCols),
      cBytes)
  }

  /**
   * FULL-COMPACTION maintenance: fold EVERY delta-carrying bucket back to
   * a fresh key-sorted base in one fenced commit, without waiting for the
   * size-tiered inline trigger — the "optimize before a read-heavy phase"
   * knob (Iceberg rewrite_data_files / Delta OPTIMIZE analog). Changes no
   * rows: watermarks, lineage accumulation, and the change feed all pass
   * through untouched (`commitDeltas` empty — feed history already written
   * stays referenced by PRIOR snapshots until they expire, so compaction
   * remains feed-immune). A concurrent apply wins the fence and this
   * retries over the fresh state.
   */
  def compactAll(table: LakeTable): Snapshot =
    retryingOnConflict(table, "compactAll") { snap =>
      val toCompact = snap.bucketDeltas.collect {
        case (b, fs) if fs.nonEmpty => b }.toSet
      if (toCompact.isEmpty) snap // nothing pending: no-op, no commit
      else compactAllOnce(table, snap, toCompact)
    }

  private def compactAllOnce(table: LakeTable, snap: Snapshot,
                             toCompact: Set[Int]): Snapshot = {
    val newId = snap.snapshotId + 1
    var dir: String = null
    try {
      val (bucketFiles, bucketDeltas, freshStats, freshBytes) =
        compactWrite(table, snap, newId, snap.schema, snap.bucketDeltas,
          toCompact, d => dir = d)
      val liveFiles = (bucketFiles.values.flatten ++
        bucketDeltas.values.flatten).toSet
      val next = snap.copy(
        bucketFiles = bucketFiles,
        bucketDeltas = bucketDeltas.filter(_._2.nonEmpty),
        fileStats = (snap.fileStats ++ freshStats)
          .filter { case (f, _) => liveFiles.contains(f) },
        fileBytes = (snap.fileBytes ++ freshBytes)
          .filter { case (f, _) => liveFiles.contains(f) },
        lineage = Map("compactedBuckets" -> toCompact.size.toLong),
        commitDeltas = Map.empty, // no logical changes — the feed skips this
        bucketManifests = Map.empty) // commit() recomputes in manifest mode
      table.commit(next, expectedSnapshotId = snap.snapshotId,
        prev = Some(snap))
    } catch {
      // a lost race or failed stats job must not leak the attempt's files
      case e: Throwable =>
        if (dir != null) table.deleteDataDir(dir)
        throw e
    }
  }

  /** One small job over a just-written commit directory: per (bucket, file)
    * typed key min/max (stringified AFTER the typed aggregation, so numeric
    * ordering is preserved), plus — for delta dirs — op counts, LSN bounds,
    * and the distinct `_types` JSONs used for schema observation. Compaction
    * output carries final data rows (no _kind/_lsn/_types), so those
    * aggregations are skipped there. */
  private def fileStatsJob(table: LakeTable, commitDir: String,
                           keyCols: Seq[String],
                           withTypes: Boolean): Array[org.apache.spark.sql.Row] = {
    val df = table.spark.read.parquet(s"${table.root}/data/$commitDir")
      .withColumn("_file", element_at(split(input_file_name(), "/"), -1))
    val keyAggs = Seq(count(lit(1)).as("keys")) ++ keyCols.flatMap(k => Seq(
      min(col(k)).cast("string").as(s"__min_$k"),
      max(col(k)).cast("string").as(s"__max_$k")))
    val aggs =
      if (withTypes) Seq(
        sum(when(col("_kind") === "insert", 1L).otherwise(0L)).as("ins"),
        sum(when(col("_kind") === "update", 1L).otherwise(0L)).as("upd"),
        sum(when(col("_kind") === "delete", 1L).otherwise(0L)).as("del"),
        min(col("_lsn")).as("minLsn"),
        max(col("_lsn")).as("maxLsn"),
        collect_set(to_json(col("_types"))).as("typeSets")) ++ keyAggs
      else keyAggs
    df.groupBy(col("_bucket"), col("_file"))
      .agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()
  }

  /** Per-file key column ranges keyed by table-relative path. */
  private def perFileKeyRanges(rows: Array[org.apache.spark.sql.Row],
                               commitDir: String, keyCols: Seq[String])
      : Map[String, Map[String, (String, String)]] =
    rows.map { r =>
      val b = r.getAs[Int]("_bucket")
      val f = r.getAs[String]("_file")
      val rel = s"data/$commitDir/_bucket=$b/$f"
      rel -> keyCols.flatMap { k =>
        val lo = r.getAs[String](s"__min_$k")
        val hi = r.getAs[String](s"__max_$k")
        if (lo == null || hi == null) None else Some(k -> (lo, hi))
      }.toMap
    }.toMap

  /**
   * Idle fast-forward (the reference's O12, SlotReaderKinesisWriter.java:196-208):
   * advance the global LSN high watermark without applying data, so upstream
   * WAL retention can be released even when this table sees no changes.
   */
  def fastForward(table: LakeTable, toLsn: Long): Snapshot = {
    val snap = table.currentSnapshot.get
    if (toLsn <= snap.lsnHighWatermark) snap
    // commitDeltas is PER-COMMIT provenance (the change feed reads it):
    // carrying the previous commit's value forward would make the feed
    // re-deliver that commit's entire change set under this snapshot's id.
    // An idle fast-forward changes no rows — its feed contribution is empty.
    else table.commit(
      snap.copy(lsnHighWatermark = toLsn, commitDeltas = Map.empty),
      snap.snapshotId, prev = Some(snap))
  }

  /**
   * BUCKET-COUNT EVOLUTION: rewrite the table's fully-merged state under a
   * new bucket count, as one fenced commit. The bucket count chosen at
   * creation sizes the unit of merge/compaction work; after the table grows
   * 100x, those buckets are 100x too big (stragglers in the local merge,
   * huge compaction rewrites) — and too MANY buckets on a small table pays
   * per-bucket metadata for nothing. The reference has no analog (its
   * shard count is Kinesis-side resharding); this is the lake-side
   * equivalent of Iceberg's bucket-partition spec evolution, except old
   * snapshots stay readable under their own bucket count (each snapshot
   * records its `nBuckets`, and every read/lookup path resolves bucketing
   * through the snapshot it reads).
   *
   * Concurrency: fenced like any commit — a concurrent apply advances the
   * snapshot and this retries on the fresh state (the rewrite re-runs; the
   * apply path never blocks behind it). Streaming writers follow
   * automatically: [[applyBatch]] re-reads the current snapshot per batch.
   *
   * WATERMARK EXACTNESS (the subtle invariant): base rows carry no LSN
   * (the merged view reads them as -1), so a replayed event that slips past
   * the gate is written as a delta and REGRESSES the row to its older value
   * — post-rebucket watermarks must therefore be EXACT, not conservative.
   * Every new bucket gets the global `lsnHighWatermark`: the stream is
   * consumed in LSN order with atomic cross-bucket commits (and idle
   * fast-forward only confirms delivered-through positions — CLAUDE.md
   * lesson 15), so an event is already applied IFF its lsn <= that global
   * watermark, for every key, under any bucketing. The map covers ALL new
   * buckets including empty ones — a deleted key's replayed insert must
   * still gate against the watermark, or it would resurrect.
   *
   * The change feed skips the rebucket commit (`commitDeltas` empty — no
   * logical changes; lesson 24), so streaming feed consumers and mirrors
   * pass over it as a zero-row batch. Cumulative per-bucket lineage resets
   * (old bucket ids no longer mean anything); history stays time-travelable
   * in prior snapshots.
   */
  def rebucket(table: LakeTable, newBuckets: Int): Snapshot = {
    require(newBuckets > 0, s"bucket count must be positive: $newBuckets")
    // sanity ceiling: the snapshot ROOT is O(buckets) (watermark map,
    // manifest pointers) and is rewritten every commit — a fat-fingered
    // count would permanently bloat all later metadata (and a huge one
    // OOMs the driver building the watermark map before any fence could
    // reject it). 2^20 is far above any defensible layout (at 256 MiB
    // per bucket that is a quarter-petabyte table) and far below harm.
    require(newBuckets <= (1 << 20),
      s"bucket count $newBuckets exceeds the 2^20 sanity ceiling")
    retryingOnConflict(table, "rebucket") { snap =>
      if (snap.nBuckets == newBuckets) snap
      else rebucketOnce(table, snap, newBuckets)
    }
  }

  private def rebucketOnce(table: LakeTable, snap: Snapshot,
                           newBuckets: Int): Snapshot = {
    val keyCols = snap.keyColumns
    val newId = snap.snapshotId + 1
    // One shuffle on the NEW bucket id over the fully-merged state (pinned
    // to this snapshot — the fence rejects the commit if anything moved).
    // Parallelism scales with the TARGET bucket count, not the session's
    // shuffle-partition setting: growing a 10^10-row table to 4096 buckets
    // through 32 reducers would bottleneck the whole rewrite on 32 tasks.
    // The within-partition sort leads with _bucket so the dynamic-partition
    // writer sees its required ordering already satisfied (no second,
    // key-order-destroying sort) and each bucket's file comes out
    // key-sorted for read-side range pruning.
    val shufflePartitions = math.max(newBuckets,
      table.spark.sessionState.conf.numShufflePartitions)
    val rows = table.read(asOfSnapshot = Some(snap.snapshotId))
      .withColumn("_bucket", table.bucketExpr(keyCols, newBuckets))
      .repartition(shufflePartitions, col("_bucket"))
      .sortWithinPartitions((col("_bucket") +: keyCols.map(col)).toIndexedSeq: _*)
    val dir = table.newCommitDirName(newId, "rebucket")
    try {
      val (written, bytes) = table.writeBucketedSized(rows, dir)
      // an empty table rewrites to no files (parquet leaves only _SUCCESS)
      val fileRows =
        if (written.values.forall(_.isEmpty))
          Array.empty[org.apache.spark.sql.Row]
        else fileStatsJob(table, dir, keyCols, withTypes = false)
      val rowCount = fileRows.map(_.getAs[Long]("keys")).sum
      val next = snap.copy(
        nBuckets = newBuckets,
        bucketFiles = written.filter(_._2.nonEmpty),
        bucketDeltas = Map.empty,
        bucketWatermarks =
          (0 until newBuckets).map(_ -> snap.lsnHighWatermark).toMap,
        bucketLineage = Map.empty,
        lineage = Map(
          "rebucketedFrom" -> snap.nBuckets.toLong,
          "rebucketedTo" -> newBuckets.toLong,
          "rows" -> rowCount),
        fileStats = perFileKeyRanges(fileRows, dir, keyCols),
        fileBytes = bytes,
        commitDeltas = Map.empty, // no logical changes — the feed skips this
        bucketManifests = Map.empty) // commit() recomputes in manifest mode
      table.commit(next, expectedSnapshotId = snap.snapshotId,
        prev = Some(snap))
    } catch {
      // a lost race or failed stats job must not leak the attempt's files
      case e: Throwable =>
        table.deleteDataDir(dir)
        throw e
    }
  }
}
