package graft.lake

import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, FileAlreadyExistsException, StandardOpenOption}
import scala.jdk.CollectionConverters._
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DecimalType, DoubleType, FloatType, IntegerType, LongType, MapType, ShortType, StringType, StructField, StructType}
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/**
 * Minimal Iceberg-style table format, built natively (no Iceberg runtime in
 * this sandbox): immutable Parquet data files + JSON snapshot manifests +
 * fenced single-winner commits.
 *
 * Layout:
 * {{{
 *   <root>/data/commit-<snapshotId>-<attempt>/_bucket=<k>/part-*.parquet
 *   <root>/meta/snapshot-<%012d>.json
 * }}}
 *
 * ALL metadata IO goes through the Hadoop FileSystem API resolved from the
 * table root's scheme and the session Hadoop configuration, so the table can
 * live on `file:`, `hdfs:`, or any configured store — the same deployment
 * surface as the data files (which Spark reads/writes through the same API).
 *
 * Data is hash-bucketed by the primary key: bucket = pmod(xxhash64(key), n).
 * Writes are MERGE-ON-READ: a commit appends small per-bucket DELTA files
 * (upserts + delete markers, each carrying (lsn, seq, kind)) instead of
 * rewriting the buckets it touches — apply cost is O(batch), never O(table),
 * which is what survives 10^10 rows (bucket-grain copy-on-write rewrote the
 * ENTIRE table for any batch spreading keys across all buckets). Readers
 * merge base + deltas with a keep-last-by-(lsn,seq) aggregation per key;
 * buckets with no deltas take a plain base scan. A bucket whose delta count
 * reaches `maxDeltasPerBucket` is compacted back to a fresh base file within
 * the same commit, so read amplification stays bounded.
 *
 * Consistency: the current snapshot is the highest-numbered manifest. A
 * commit writes a fully-synced temp file, then publishes it with the
 * strongest atomic FAIL-IF-EXISTS primitive the root's filesystem offers:
 *
 *  - `file:` — Files.createLink (link(2)), the one POSIX primitive that
 *    atomically fails with EEXIST when the target exists (rename(2) /
 *    ATOMIC_MOVE silently replaces, which would let two racing committers
 *    both "win"; Hadoop's RawLocalFileSystem.rename has the same flaw);
 *  - HDFS-semantics stores — `FileSystem.rename(tmp, target)`, which per
 *    the FileSystem contract atomically fails when the target exists (HDFS
 *    implements this server-side in the NameNode);
 *  - object stores — their "rename" is client-side copy+delete, LAST
 *    WRITER WINS (two racing committers would both "succeed" —
 *    CommitFencingSpec demonstrates the double-win on such a store), so
 *    known object-store schemes default to CONDITIONAL-PUT fencing: the
 *    snapshot is written directly with create(overwrite = false), which
 *    the store's FileSystem maps to an atomic conditional write (S3
 *    If-None-Match via Hadoop 3.4.1+ S3A, GCS if-generation-match, ABFS
 *    ETag create). Override per scheme with Hadoop conf
 *    `graft.lake.fencing.<scheme>`; a lock-service deployment (the
 *    pre-conditional-write Delta-on-S3 approach) still overrides
 *    [[LakeTable.publish]].
 *
 * The loser gets [[CommitConflictException]] — that is the snapshot-id
 * fencing (the transactional analog of the reference's slot-busy
 * single-writer lock wait, PostgresConnector.java:164-215). Each snapshot
 * also records per-bucket LSN high watermarks; a replayed batch whose events
 * are all <= watermark becomes a byte-identical no-op, which upgrades the
 * reference's at-least-once LSN-ack protocol (SlotReaderCallback.java:70-85,
 * README.md:112-117) to exactly-once table state.
 */
final case class Snapshot(
    snapshotId: Long,
    schema: StructType,
    keyColumns: Seq[String],
    nBuckets: Int,
    // bucket -> list of BASE data file paths (relative to table root)
    bucketFiles: Map[Int, Seq[String]],
    // bucket -> highest LSN applied to that bucket
    bucketWatermarks: Map[Int, Long],
    // bucket -> merge-on-read delta files, oldest first (empty = compacted)
    bucketDeltas: Map[Int, Seq[String]] = Map.empty,
    // global high watermark (max over buckets, monotone)
    lsnHighWatermark: Long,
    // old column name -> new column name (schema evolution by rename)
    renameMap: Map[String, String],
    // lineage of the batch that produced this snapshot
    lineage: Map[String, Long],
    // per-partition lineage accumulated across commits:
    // bucket -> {keys, inserted, updated, deleted, minLsn, maxLsn}
    bucketLineage: Map[Int, Map[String, Long]] = Map.empty,
    // data file path -> per-KEY-column min/max (as strings, compared via the
    // key's declared type) — read-side file pruning inside a bucket
    fileStats: Map[String, Map[String, (String, String)]] = Map.empty,
    // data file path -> byte size, recorded from the commit listing (zero
    // extra IO) — drives the SIZE-TIERED compaction trigger. Files from
    // pre-upgrade snapshots may be absent; the trigger treats unknown
    // sizes as large (compact), preserving the old eagerness.
    fileBytes: Map[String, Long] = Map.empty,
    // When the snapshot was stored in DISTRIBUTED-MANIFEST form: bucket ->
    // relative path of the immutable per-bucket manifest file holding that
    // bucket's files/deltas/watermark/lineage/stats. Empty for inline
    // snapshots. Write paths resolve the snapshot FULLY; bucket-subset
    // reads and point lookups resolve only the buckets they touch (partial
    // snapshots are read-only — an unresolved bucket's slice looks empty,
    // so committing from one would empty its manifest). The pointers exist
    // so a commit can REUSE untouched buckets' manifests instead of
    // rewriting O(files) metadata every batch.
    bucketManifests: Map[Int, String] = Map.empty,
    // CHANGE DATA FEED provenance: bucket -> the delta files WRITTEN by the
    // commit that produced THIS snapshot (per-commit, never cumulative —
    // the committing writer must set it). Distinct from bucketDeltas: a
    // bucket that compacts within the same commit drops its deltas from
    // bucketDeltas but its freshly written delta stays recorded here, so
    // LakeTable.changes never loses a commit's rows to immediate
    // compaction. Counted into allFiles => retained by expire/orphan
    // liveness exactly as long as this snapshot. Stored INLINE in the
    // root even in distributed-manifest form (O(touched buckets) small).
    commitDeltas: Map[Int, Seq[String]] = Map.empty,
    // PARTIAL-UPDATE (unchanged-TOAST) semantics, a PERSISTENT table
    // property set at create time: update tuples may OMIT columns whose
    // value did not change (Postgres never re-sends an unchanged TOASTed
    // value), and every keep-last resolution — write-side dedup, both
    // merge-read shapes, lookups, compaction, the change feed — resolves
    // each column to its latest PRESENT value (never past an
    // insert/delete barrier) instead of taking the whole latest row.
    // False (default) keeps the full-tuple whole-row semantics.
    partialUpdates: Boolean = false) {
  def allFiles: Seq[String] =
    (bucketFiles.values.flatten ++ bucketDeltas.values.flatten ++
      commitDeltas.values.flatten).toSeq.distinct.sorted
  /** Buckets holding any data (base or delta). */
  def dataBuckets: Set[Int] = bucketFiles.keySet ++ bucketDeltas.keySet
  /** Every bucket with any per-bucket state to persist. */
  def manifestBuckets: Set[Int] =
    dataBuckets ++ bucketWatermarks.keySet ++ bucketLineage.keySet
  /** The per-bucket slices manifests store, ALL in ONE pass over the file
    * maps — manifests are reused across commits exactly when a bucket's
    * slice is unchanged. (A per-bucket slicer filtering the full O(files)
    * stats maps per call is O(buckets x files) of pure metadata CPU —
    * measured ~3 s PER COMMIT at 50k files / 512 buckets before this
    * replaced it, MetaBench; anything needing even one slice should take
    * it from here so that trap cannot be re-entered.) */
  def bucketSlices: Map[Int, BucketManifest] = {
    val fileToBucket = scala.collection.mutable.HashMap.empty[String, Int]
    bucketFiles.foreach { case (b, fs) => fs.foreach(f => fileToBucket(f) = b) }
    bucketDeltas.foreach { case (b, fs) => fs.foreach(f => fileToBucket(f) = b) }
    val statsBy = scala.collection.mutable.HashMap
      .empty[Int, scala.collection.mutable.HashMap[String, Map[String, (String, String)]]]
    fileStats.foreach { case (f, st) =>
      fileToBucket.get(f).foreach(b =>
        statsBy.getOrElseUpdate(b,
          scala.collection.mutable.HashMap.empty).update(f, st))
    }
    val bytesBy = scala.collection.mutable.HashMap
      .empty[Int, scala.collection.mutable.HashMap[String, Long]]
    fileBytes.foreach { case (f, n) =>
      fileToBucket.get(f).foreach(b =>
        bytesBy.getOrElseUpdate(b,
          scala.collection.mutable.HashMap.empty).update(f, n))
    }
    manifestBuckets.iterator.map { b =>
      b -> BucketManifest(
        bucketFiles.getOrElse(b, Nil), bucketDeltas.getOrElse(b, Nil),
        bucketWatermarks.get(b), bucketLineage.getOrElse(b, Map.empty),
        statsBy.get(b).map(_.toMap).getOrElse(Map.empty),
        bytesBy.get(b).map(_.toMap).getOrElse(Map.empty))
    }.toMap
  }
}

/** One bucket's persisted metadata slice (see [[Snapshot.bucketSlices]]). */
final case class BucketManifest(
    files: Seq[String],
    deltas: Seq[String],
    watermark: Option[Long],
    lineage: Map[String, Long],
    fileStats: Map[String, Map[String, (String, String)]],
    fileBytes: Map[String, Long] = Map.empty)

class LakeTable(val spark: SparkSession, val root: String,
                // HARD CAP on delta files per bucket (read/listing fan-in
                // bound). The PRIMARY compaction trigger is the size-tiered
                // maxDeltaBytesPerBucket below — counting files alone made
                // eight 1 KB deltas compact as eagerly as eight 1 GB ones,
                // paying a full bucket rewrite to fold kilobytes.
                val maxDeltasPerBucket: Int = 64,
                // plan-size guard for the shuffle-free per-bucket merge:
                // past this many delta-carrying buckets in one read, fall
                // back to the shuffle merge (each bucket contributes its own
                // scan subtree, so unbounded union bloats planning time)
                val maxLocalMergeBuckets: Int = 256,
                // Above this many live files the snapshot spills to
                // DISTRIBUTED per-bucket manifests: the root stays O(buckets)
                // and a commit rewrites only the buckets it touched —
                // without this, one driver-side JSON grows O(files) and is
                // fully rewritten every batch, which cannot survive 10^10
                // rows. Below the threshold the single inline JSON is both
                // simpler and faster (one metadata read instead of
                // O(buckets)).
                val manifestThresholdFiles: Int = 4096,
                // Parquet codec for data files. Measured (CodecBench,
                // 300k-txn delta payload, interleaved): zstd writes within
                // noise of snappy/lz4, reads fastest, and is ~39% smaller —
                // at the target scale the table's storage and read IO
                // dominate the one-time write cost.
                val compressionCodec: String = "zstd",
                // Compact a bucket once its accumulated delta BYTES reach
                // this — the size-tiered PRIMARY trigger (sizes ride the
                // snapshot, recorded at write time). Placed last to keep
                // positional construction stable.
                val maxDeltaBytesPerBucket: Long = 32L * 1024 * 1024,
                // Buckets whose merge-read input (ON-DISK bytes, from the
                // snapshot) exceeds this take the key-hash SHUFFLE merge
                // instead of the zero-Exchange per-bucket local merge
                // (whose unit of parallelism is one core per bucket): a
                // pathologically hot bucket becomes a straggler task
                // exactly when its BYTES — not the table's bucket count —
                // are outsized. Default 256 MiB ≈ a ~3 s single-task bound
                // at the measured ~90 MB/s per-core merge rate
                // (HotBucketBench); deliberately high because on a CLUSTER
                // the Exchange this avoids costs network per byte, while
                // the single-box bench where shuffle looks cheap has none.
                val maxLocalMergeBytesPerBucket: Long = 256L * 1024 * 1024,
                // INLINE compaction rides the apply commit (size-tiered,
                // the two thresholds above); set false to defer ALL
                // compaction to the standalone [[graft.apply.MergeEngine
                // .compactAll]] maintenance pass — trading per-batch apply
                // latency (no bucket rewrite ever lands inside an ingest
                // commit) against read amplification between maintenance
                // runs. CompactionBench measures both sides of that trade.
                val inlineCompaction: Boolean = true,
                // TEST/BENCH ONLY: per-metadata-read latency emulating an
                // object store's ~tens-of-ms GET round-trip (local fs reads
                // in ~50 µs, which would hide a serial-read bottleneck
                // entirely). IMMUTABLE by construction: a mutable hook a
                // failing bench forgot to reset would leave every later
                // metadata read of the instance sleeping — benches build a
                // dedicated delayed instance over the same root instead.
                val metaReadDelayMs: Long = 0L) {
  import LakeTable._

  private val rootPath = new HPath(root)
  private val sessionConf = graft.util.HadoopConfs.session(spark)
  private[lake] val fs: FileSystem = rootPath.getFileSystem(sessionConf)
  private def metaDir: HPath = new HPath(rootPath, "meta")
  private def dataDir: HPath = new HPath(rootPath, "data")
  /** link(2) fencing only exists on a local filesystem. */
  private val isLocalFs: Boolean = fs.getScheme == "file"

  /** How [[publish]] claims a snapshot name, resolved from the root's
    * scheme (override per scheme with Hadoop conf
    * `graft.lake.fencing.<scheme>`):
    *
    *  - `link` — link(2) via Files.createLink, `file:` only (rename(2)
    *    silently replaces — no fencing);
    *  - `rename` — the HDFS FileSystem-contract atomic fail-if-exists
    *    rename (HDFS enforces it in the NameNode);
    *  - `conditional-put` — DEFAULT for known object-store schemes: their
    *    "rename" is client-side copy+delete, LAST WRITER WINS — the HDFS
    *    contract silently does not hold, and two racing committers would
    *    BOTH report success (CommitFencingSpec demonstrates the double-win
    *    on such a store and proves this mode single-winner). The target
    *    object is written directly with create(overwrite = false), which
    *    the store's FileSystem must map to an atomic conditional PUT
    *    (S3 If-None-Match, GCS if-generation-match 0). */
  private[graft] val fencingMode: String = {
    val scheme = fs.getScheme
    val mode = Option(sessionConf.get(s"graft.lake.fencing.$scheme"))
      .getOrElse {
        if (scheme == "file") "link"
        else if (LakeTable.ObjectStoreSchemes(scheme)) "conditional-put"
        else "rename"
      }
    require(Set("link", "rename", "conditional-put")(mode),
      s"graft.lake.fencing.$scheme must be link|rename|conditional-put, got $mode")
    require(mode != "link" || isLocalFs,
      s"link fencing requires a file: root, not $scheme:")
    mode
  }
  private def localFile(p: HPath): java.nio.file.Path =
    java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath)

  private def listMetaNames(): Seq[String] =
    if (!fs.exists(metaDir)) Nil
    else fs.listStatus(metaDir).toSeq.map(_.getPath.getName)

  def exists: Boolean = latestSnapshotId >= 0

  private def latestSnapshotId: Long =
    listMetaNames()
      .collect { case SnapshotRe(n) => n.toLong }
      .foldLeft(-1L)(math.max)

  def currentSnapshot: Option[Snapshot] = latestSnapshotId match {
    case -1L => None
    case id => Some(readSnapshot(id))
  }

  /** The latest snapshot id without resolving ANY snapshot content — one
    * directory listing. Readers that need only the id (or will follow with
    * a root-only [[snapshotAt]]) must use this instead of
    * [[currentSnapshot]]: the latter fully resolves the snapshot, which on
    * a distributed-manifest table means O(buckets) manifest reads
    * (lesson 18's metadata-cost class). */
  def currentSnapshotId: Option[Long] = latestSnapshotId match {
    case -1L => None
    case id  => Some(id)
  }

  /** The latest snapshot's ROOT-ONLY metadata (schema, key columns,
    * watermarks, rename map, lineage, commit provenance) — one listing +
    * one metadata read, zero manifest resolution. Use instead of
    * [[currentSnapshot]] whenever file-level fields (bucketFiles/Deltas,
    * fileStats/fileBytes) aren't needed. */
  def currentRootSnapshot: Option[Snapshot] = currentSnapshotId.map(snapshotAt)

  def readSnapshot(id: Long): Snapshot = readSnapshot(id, None)

  /** `only = Some(buckets)`: on a distributed snapshot, resolve ONLY those
    * buckets' manifests — O(|subset|) metadata IO. The result is partial
    * (read-only for those buckets; never commit from it). */
  private def readSnapshot(id: Long, only: Option[Set[Int]]): Snapshot =
    fromJson(readMetaFile(f"meta/snapshot-$id%012d.json"), readMetaFile, only)

  private def readMetaFile(rel: String): String = {
    metaReads.incrementAndGet()
    if (metaReadDelayMs > 0) Thread.sleep(metaReadDelayMs)
    val in = fs.open(new HPath(rootPath, rel))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Read an immutable meta file published via [[publishImmutableMeta]],
    * or None if never published. Immutable ⇒ a successful read is final;
    * there is no torn state to guard (the publish is an atomic move/PUT). */
  private[graft] def readImmutableMeta(name: String): Option[String] =
    try Some(readMetaFile(s"meta/$name"))
    catch { case _: java.io.FileNotFoundException => None }

  /** Metadata-read round-trip counter — the observable that makes feed
    * catch-up cost testable (a 10^3-commit range must NOT mean 10^3
    * sequential root reads). Every metadata-file read increments it. */
  private[graft] val metaReads = new java.util.concurrent.atomic.AtomicLong
  /** Bound on concurrent snapshot-root fetches during a feed catch-up. */
  @volatile private[graft] var feedMetaParallelism = 32
  /** Feed ranges NARROWER than this resolve by parallel root fetch alone,
    * never consulting the feed-log index: consulting it starts with a full
    * LIST of meta/, and on a never-indexed table with many retained
    * snapshots that paginated LIST costs more round-trips than the one
    * parallel fetch round it could save. Default = one fetch round. */
  @volatile private[graft] var feedIndexMinRange = 32

  /** Create the table with an initial empty snapshot (idempotent — tolerates
    * "already exists" like the reference's slot creation,
    * PostgresConnector.java:80-97). */
  def create(schema: StructType, keyColumns: Seq[String], nBuckets: Int,
             renameMap: Map[String, String] = Map.empty,
             partialUpdates: Boolean = false): Snapshot = {
    fs.mkdirs(metaDir)
    fs.mkdirs(dataDir)
    currentSnapshot match {
      case Some(s) =>
        // The SNAPSHOT property governs apply semantics, so reopening a
        // partial table without the flag is safe (the snapshot wins). The
        // reverse is the silent-corruption direction: a caller EXPECTING
        // partial semantics on a full-tuple table would have every
        // unchanged-TOAST update null the omitted columns — fail loudly.
        if (partialUpdates && !s.partialUpdates)
          throw new IllegalStateException(
            s"table at $root already exists WITHOUT partialUpdates — " +
              "unchanged-TOAST updates would silently null omitted columns; " +
              "the property is set at create time and cannot be added later")
        s
      case None =>
        val s = Snapshot(0L, schema, keyColumns, nBuckets,
          Map.empty, Map.empty, Map.empty, -1L, renameMap, Map.empty,
          partialUpdates = partialUpdates)
        try commit(s, expectedSnapshotId = -1L)
        catch { case _: CommitConflictException => () } // concurrent create
        currentSnapshot.get
    }
  }

  /**
   * Atomically publish `next` as snapshot expected+1. Throws
   * [[CommitConflictException]] if another writer advanced the table —
   * caller re-reads and retries (optimistic concurrency).
   *
   * Past [[manifestThresholdFiles]] live files the snapshot is stored in
   * distributed form: one immutable per-bucket manifest file for each
   * bucket whose slice CHANGED this commit (unchanged buckets reuse the
   * previous snapshot's manifest by pointer), plus an O(buckets) root.
   * Manifests are written before the fenced root publish; a losing racer
   * deletes the manifests it wrote. `prev` (the snapshot the caller built
   * `next` from) avoids re-reading it for the reuse diff.
   */
  def commit(next: Snapshot, expectedSnapshotId: Long,
             prev: Option[Snapshot] = None): Snapshot = {
    val newId = expectedSnapshotId + 1
    if (latestSnapshotId != expectedSnapshotId)
      throw new CommitConflictException(
        s"expected snapshot $expectedSnapshotId, found $latestSnapshotId")
    val target = new HPath(metaDir, f"snapshot-$newId%012d.json")
    val tmp = new HPath(metaDir,
      f".snapshot-$newId%012d.json.tmp-${java.util.UUID.randomUUID()}")
    if (next.allFiles.size <= manifestThresholdFiles) {
      val stamped = next.copy(snapshotId = newId, bucketManifests = Map.empty)
      publish(tmp, target, toJson(stamped))
      stamped
    } else {
      val stamped0 = next.copy(snapshotId = newId)
      val prevSnap = prev.filter(_.snapshotId == expectedSnapshotId)
        .orElse(if (expectedSnapshotId >= 0) Some(readSnapshot(expectedSnapshotId))
                else None)
      val written = scala.collection.mutable.ArrayBuffer.empty[HPath]
      // One-pass slice maps for the reuse diff: per-bucket bucketSlice()
      // calls are O(buckets x files) in aggregate (MetaBench measured ~3 s
      // of metadata CPU per commit at 50k files) — these are O(files).
      val nextSlices = stamped0.bucketSlices
      val prevSlices = prevSnap.map(_.bucketSlices).getOrElse(Map.empty)
      val pointers = stamped0.manifestBuckets.toSeq.sorted.map { b =>
        val slice = nextSlices(b)
        val reused = prevSnap.flatMap(p =>
          p.bucketManifests.get(b).filter(_ => prevSlices.get(b).contains(slice)))
        b -> reused.getOrElse {
          val rel = f"meta/manifests/manifest-$newId%012d-b$b-" +
            s"${java.util.UUID.randomUUID().toString.take(8)}.json"
          val p = new HPath(rootPath, rel)
          written += p
          writeMetaFile(p, manifestToJson(slice))
          rel
        }
      }.toMap
      val stamped = stamped0.copy(bucketManifests = pointers)
      try publish(tmp, target, toRootJson(stamped))
      catch {
        case e: CommitConflictException =>
          written.foreach(p => fs.delete(p, false)) // loser's manifests
          throw e
      }
      stamped
    }
  }

  /** Durably write an immutable metadata file (manifests): unique name, so
    * no fencing — but it must be fully on disk before the root snapshot
    * that references it can publish. On `file:` hsync is a silent no-op
    * (ChecksumFileSystem is not Syncable — CLAUDE.md lesson 12), so the
    * local path takes the same FileChannel.force + directory-fsync
    * treatment as the snapshot publish; otherwise a power loss could leave
    * a durable root pointing at a torn manifest, wedging the table. */
  private def writeMetaFile(p: HPath, content: String): Unit = {
    fs.mkdirs(p.getParent)
    if (isLocalFs) {
      writeDurableLocal(localFile(p), content)
      fsyncDir(localFile(p.getParent))
    } else {
      val out = fs.create(p, false)
      try {
        out.write(content.getBytes(StandardCharsets.UTF_8))
        // object-store connectors without sync support (GCS, pre-3.3.1
        // S3A) must not fail every manifest write: PUT-on-close is their
        // durability barrier
        try out.hsync() catch { case _: UnsupportedOperationException => () }
      } finally out.close()
    }
  }

  /** Durably write `content` to `tmp`, then atomically claim `target` with
    * fail-if-exists semantics (see class doc for the per-scheme strategy).
    * A linked-in snapshot must never be visible with partial content after
    * a crash, so the temp file is fully synced before publication. */
  protected def publish(tmp: HPath, target: HPath, content: String): Unit = {
    if (fencingMode == "conditional-put") { publishConditionalPut(target, content); return }
    if (isLocalFs && fencingMode == "link") {
      val ltmp = localFile(tmp); val ltarget = localFile(target)
      writeDurableLocal(ltmp, content)
      // link(2) atomically fails with EEXIST if a concurrent writer
      // published first; rename(2) (Files.move ATOMIC_MOVE, and Hadoop
      // RawLocalFileSystem.rename) silently REPLACES the winner's snapshot
      // on POSIX — no fencing at all. A zombie driver finishing a stale
      // foreachBatch after failover must lose here.
      try Files.createLink(ltarget, ltmp)
      catch {
        case _: FileAlreadyExistsException =>
          throw new CommitConflictException(
            s"snapshot ${target.getName} already committed")
      } finally Files.deleteIfExists(ltmp)
      fsyncDir(localFile(metaDir))
    } else {
      val out = fs.create(tmp, false)
      try {
        out.write(content.getBytes(StandardCharsets.UTF_8))
        out.hsync() // flush through to durable storage where supported
      } finally out.close()
      // FileSystem.rename contract: atomic, FAILS when target exists (HDFS
      // enforces this in the NameNode). Implementations signal the conflict
      // either by returning false or by throwing FileAlreadyExistsException.
      val renamed =
        try fs.rename(tmp, target)
        catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
      if (!renamed) {
        fs.delete(tmp, false)
        if (fs.exists(target)) {
          // Ambiguous-outcome guard: an RPC timeout/retry can report
          // failure for a rename the NameNode actually applied. If the
          // existing target carries OUR content, this publish WON —
          // misclassifying it as a conflict would make the distributed
          // commit's loser-cleanup delete manifests referenced by our own
          // just-published root, wedging the table permanently.
          // a read failure here must PROPAGATE (abort, retryable): mapping
          // it to a conflict would trigger the loser-cleanup against our
          // own possibly-published root — the exact wedge this guard exists
          // to prevent
          val existing = {
            val in = fs.open(target)
            try new String(in.readAllBytes(), StandardCharsets.UTF_8)
            finally in.close()
          }
          if (existing == content) return // our own rename landed
          throw new CommitConflictException(
            s"snapshot ${target.getName} already committed")
        }
        throw new java.io.IOException(s"rename $tmp -> $target failed")
      }
    }
  }

  /** Object-store publish: no temp file and no rename — the target object
    * is written DIRECTLY with fail-if-exists create, which the store's
    * FileSystem maps to an atomic conditional PUT (a PUT is all-or-nothing,
    * so a partially-written object is never visible; the condition is
    * evaluated when the upload completes, i.e. at close()). A conflict can
    * therefore surface at create() OR at close(); generic IOExceptions get
    * the same ambiguous-outcome read-back guard as the rename path — our
    * own retried PUT may have landed, and misclassifying that as a
    * conflict would turn loser-cleanup against our own published root. */
  private def publishConditionalPut(target: HPath, content: String): Unit = {
    def conflict() = new CommitConflictException(
      s"snapshot ${target.getName} already committed")
    def guardExisting(e: java.io.IOException): Nothing = {
      if (fs.exists(target)) {
        val in = fs.open(target)
        val existing =
          try new String(in.readAllBytes(), StandardCharsets.UTF_8)
          finally in.close()
        if (existing == content) throw Won // our own PUT landed
        throw conflict()
      }
      throw e
    }
    try {
      val out =
        try fs.create(target, false)
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => throw conflict()
          case e: java.io.IOException => guardExisting(e)
        }
      // After a mid-write failure: decide from the target's ACTUAL state
      // whose bytes (if any) landed. A claim-at-create FileSystem (the
      // local double, RawLocalFileSystem overrides) can leave OUR torn
      // bytes at the target; a condition-at-close store (real S3/GCS
      // conditional PUT) leaves either nothing, our completed PUT, or a
      // CONCURRENT committer's object — which we must never delete (their
      // commit succeeded; unconditionally deleting here would silently
      // revert the table under them). Our content is known, and a torn
      // write of ours is a strict PREFIX of it (sequential writes; a
      // prefix of snapshot JSON is truncated, so no other committer's
      // COMPLETE snapshot can be one) — that prefix test is the
      // discriminator.
      def resolveFailedPut(e: Throwable): Nothing = {
        val existing =
          try {
            if (!fs.exists(target)) None
            else {
              val in = fs.open(target)
              try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8))
              finally in.close()
            }
          } catch { case _: Exception => throw e } // target unreadable:
            // propagate the original failure; the retry re-enters the
            // create/guard path which re-classifies
        existing match {
          case None => throw e
          case Some(s) if s == content => throw Won // our PUT completed
          case Some(s) if content.startsWith(s) =>
            // our torn bytes: release the name so a torn object cannot
            // become the latest snapshot, then surface the failure
            try { fs.delete(target, false); () } catch { case _: Exception => () }
            throw e
          case Some(_) => throw conflict() // a concurrent committer's
            // COMMITTED snapshot — leave it untouched
        }
      }
      var ok = false
      try {
        out.write(content.getBytes(StandardCharsets.UTF_8))
        // PUT-on-close is the durability barrier on real object stores;
        // hsync is extra safety where supported, and an
        // UnsupportedOperationException on connectors without it (GCS,
        // pre-3.3.1 S3A) — which must not fail every publish
        try out.hsync() catch { case _: UnsupportedOperationException => () }
        ok = true
        out.close() // conditional PUT evaluated here on real object stores
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException if ok => throw conflict()
        case e: java.io.IOException if ok => guardExisting(e)
        case e: Throwable =>
          // ABORT the upload where the stream supports it, so nothing
          // materializes; streams without Abortable semantics fall back to
          // close() — which may COMPLETE the conditional PUT — and the
          // read-back below classifies whatever actually landed
          try { out.abort(); () }
          catch {
            case _: Throwable =>
              try out.close() catch { case _: Exception => () }
          }
          resolveFailedPut(e)
      }
    } catch { case Won => () }
  }

  /** Control-flow sentinel for [[publishConditionalPut]]'s read-back guard:
    * the "conflict" was our own successful publish. */
  private object Won extends scala.util.control.ControlThrowable

  /** Write content and fsync it before publishing (local-filesystem path). */
  private def writeDurableLocal(p: java.nio.file.Path, content: String): Unit = {
    val ch = FileChannel.open(p, StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    try {
      ch.write(java.nio.ByteBuffer.wrap(content.getBytes(StandardCharsets.UTF_8)))
      ch.force(true)
    } finally ch.close()
  }

  /** Make the new directory entry durable (best-effort: some filesystems
    * reject opening a directory for read). */
  private def fsyncDir(dir: java.nio.file.Path): Unit =
    try {
      val ch = FileChannel.open(dir, StandardOpenOption.READ)
      try ch.force(true) finally ch.close()
    } catch { case _: Exception => () }

  /** Expression computing the storage bucket of the given key columns. */
  def bucketExpr(keyColumns: Seq[String], nBuckets: Int) =
    pmod(xxhash64(keyColumns.map(col): _*), lit(nBuckets)).cast("int")

  /**
   * Read the content of the given buckets (or the whole table), optionally
   * as of a historical snapshot (time travel — snapshots are immutable, so
   * any committed state remains readable).
   * Handles mixed-era files: after an additive-column or rename evolution,
   * untouched buckets still hold files with the old physical schema;
   * `mergeSchema` unions them and the rename map coalesces old->new.
   */
  def read(buckets: Option[Set[Int]] = None,
           asOfSnapshot: Option[Long] = None): DataFrame = {
    val id = asOfSnapshot.getOrElse(latestSnapshotId)
    if (id < 0) throw new IllegalStateException(s"no snapshot at $root")
    // A bucket-subset read resolves ONLY those buckets' manifests on a
    // distributed snapshot (O(|subset|) metadata IO instead of O(buckets))
    val snap = readSnapshot(id, buckets)
    val sel = buckets.getOrElse(snap.dataBuckets).toSeq.sorted
    // Fast path for buckets with no pending deltas: plain base scan, no
    // merge aggregation. Only delta-carrying buckets pay the keep-last.
    val (withDeltas, clean) =
      sel.partition(b => snap.bucketDeltas.getOrElse(b, Nil).nonEmpty)
    val cleanDf = readConformed(
      clean.flatMap(b => snap.bucketFiles.getOrElse(b, Nil)),
      snap.schema, snap.renameMap)
    if (withDeltas.isEmpty) cleanDf
    else {
      // DATA-AWARE merge-shape choice, per bucket: the zero-Exchange local
      // merge serializes each bucket onto one core, so a bucket whose
      // merge input BYTES (recorded in the snapshot) exceed
      // maxLocalMergeBytesPerBucket would run as a straggler task — those
      // buckets take the key-hash shuffle merge while the rest keep the
      // local merge. Unknown sizes (pre-upgrade snapshots) count zero,
      // preserving the old always-local choice. The bucket-COUNT guard
      // stays as the plan-size bound: past it, everything shuffles.
      def bucketBytes(b: Int): Long =
        (snap.bucketFiles.getOrElse(b, Nil).iterator ++
          snap.bucketDeltas.getOrElse(b, Nil).iterator)
          .map(f => snap.fileBytes.getOrElse(f, 0L)).sum
      val (big, small) =
        withDeltas.partition(b => bucketBytes(b) > maxLocalMergeBytesPerBucket)
      val (localBuckets, shuffleBuckets) =
        if (small.size <= maxLocalMergeBuckets) (small, big)
        else (Seq.empty[Int], withDeltas)
      val parts = Seq(
        if (localBuckets.nonEmpty)
          Some(mergedViewLocal(snap.schema, snap.keyColumns, snap.renameMap,
            localBuckets.map(b => (snap.bucketFiles.getOrElse(b, Nil),
              snap.bucketDeltas.getOrElse(b, Nil))),
            partialUpdates = snap.partialUpdates))
        else None,
        if (shuffleBuckets.nonEmpty)
          Some(mergedView(snap.schema, snap.keyColumns, snap.renameMap,
            shuffleBuckets.flatMap(b => snap.bucketFiles.getOrElse(b, Nil)),
            shuffleBuckets.flatMap(b => snap.bucketDeltas.getOrElse(b, Nil)),
            partialUpdates = snap.partialUpdates))
        else None).flatten
      (cleanDf +: parts).reduce(_.unionByName(_))
    }
  }

  /**
   * CHANGE DATA FEED: the net row-level changes committed in the snapshot
   * range `(fromSnapshot, toSnapshot]` — the lake table as a CDC *source*
   * for downstream incremental consumers (the reference's consumers read
   * the Kinesis stream; this engine's read the table's own feed). Output:
   * the table schema (non-key columns null on deletes) plus `_kind`
   * (insert|update|delete), `_lsn`, `_seq`, and `_snapshot` (the snapshot
   * whose commit introduced the change).
   *
   * Semantics are NET-PER-COMMIT (Delta-CDF-under-MERGE-like): within one
   * commit the keep-last dedup already collapsed each key to its final
   * change; across commits, each commit's net change per key appears once.
   * Cost is O(changed bytes), never a table scan: only the per-commit
   * delta files recorded by the committing writer
   * ([[Snapshot.commitDeltas]], inline in the snapshot ROOT — zero
   * manifest IO even on distributed snapshots) are read, in ONE scan with
   * rows attributed to snapshots by their commit directory. Immediate
   * same-commit compaction cannot lose feed rows (the written delta files
   * stay referenced), and feed history is retained exactly as long as the
   * snapshots recording it (expireSnapshots GCs both together).
   */
  /** ROOT-only snapshot metadata for a given id — schema, key columns,
    * watermarks, commit-delta provenance — without touching any per-bucket
    * manifest (O(buckets) bytes, one metadata-file read). Throws
    * FileNotFoundException for an expired/never-existed id. */
  def snapshotAt(id: Long): Snapshot =
    LakeTable.parseRootOnly(readMetaFile(f"meta/snapshot-$id%012d.json"))._1

  /** Total recorded data bytes at a snapshot, CHEAP form: exact for INLINE
    * snapshots (the same single metadata read `snapshotAt` pays — the
    * snapshot document carries every file's size), None for
    * distributed-manifest snapshots (exactness there would cost O(buckets)
    * manifest reads, and a table past the manifest threshold is too big
    * for the planner decisions this feeds — e.g. auto-broadcast — anyway).
    * Files from pre-upgrade snapshots may lack sizes and count zero. */
  def inlineDataBytes(id: Long): Option[Long] = {
    val json = readMetaFile(f"meta/snapshot-$id%012d.json")
    LakeTable.parseRootOnly(json) match {
      case (_, Some(_)) => None // distributed form
      case (_, None)    => Some(LakeTable.fromJson(json).fileBytes.values.sum)
    }
  }

  /** @param projectTo read the feed under this (LATER-era) schema instead
    *        of `toSnapshot`'s own — evolution projection for streaming
    *        replay: a column absent when a delta was written reads as
    *        null, and a column WIDENED since then (type evolution on the
    *        MergeEngine.widen lattice) reads its narrow-era values under
    *        the wider type (delta payloads are string maps cast at read;
    *        typed base/compacted files rely on Spark 4 widening parquet
    *        reads). Must be a superset of `toSnapshot`'s schema — same
    *        leading column NAMES, each at a type at-or-above that era's
    *        on the lattice; callers (ChangesSource.getBatch's prefix
    *        rule) enforce that loudly. */
  def changes(fromSnapshot: Long, toSnapshot: Long,
              projectTo: Option[StructType] = None): DataFrame = {
    require(fromSnapshot >= -1 && fromSnapshot <= toSnapshot,
      s"changes range is (from, to] with from >= -1: got ($fromSnapshot, $toSnapshot]")
    val latest = latestSnapshotId
    require(toSnapshot <= latest,
      s"snapshot $toSnapshot does not exist (latest is $latest)")
    // typed retention error, not a raw FileNotFound from a metadata path:
    // feed history lives exactly as long as its snapshots
    def retentionError(s: Long, cause: Throwable = null) = new IllegalStateException(
      s"changes($fromSnapshot, $toSnapshot]: snapshot $s has been expired " +
        "(expireSnapshots) — feed history is retained exactly as long as " +
        "its snapshots; start from a retained snapshot id", cause)
    def snapAtRetained(s: Long): Snapshot =
      try snapshotAt(s)
      catch { case e: java.io.FileNotFoundException => throw retentionError(s, e) }
    val to = snapAtRetained(toSnapshot)
    // Catch-up metadata cost: resolving one snapshot ROOT per id SERIALLY
    // on the driver made a mirror catching up on a day of 5-second commits
    // (~17k ids) pay ~17k sequential object-store GETs before any data
    // moved. Resolution order now: (1) feed-log index segments written by
    // [[indexFeed]] maintenance — O(range/segmentSize) metadata reads;
    // (2) a BOUNDED-PARALLEL root fetch for ids no segment covers. A stale
    // segment surviving a crashed expire can never serve expired history:
    // the oldest id in the range is existence-checked first (expire drops
    // the oldest prefix, so one check gates the whole range).
    val priorIds = (fromSnapshot + 1) until toSnapshot
    if (priorIds.nonEmpty &&
        !fs.exists(new HPath(metaDir, f"snapshot-${priorIds.head}%012d.json")))
      throw retentionError(priorIds.head)
    val indexed = readFeedLogRange(priorIds)
    val fetched =
      fetchCommitDeltas(priorIds.filterNot(indexed.contains), snapAtRetained)
    val perSnap: Seq[(Long, Seq[String])] =
      ((fromSnapshot + 1) to toSnapshot).map { s =>
        s -> (if (s == toSnapshot) to.commitDeltas.values.flatten.toSeq.sorted
              else indexed.getOrElse(s, fetched(s)))
      }
    val fileToSnap: Map[String, Long] = perSnap.flatMap { case (s, fs) =>
      fs.map(f => f.split("/").last -> s) // keyed by unique parquet file name
    }.toMap
    // PARTIAL-UPDATE tables: the pivot to typed columns erases which
    // columns an update actually CARRIED (absent != present-null), and a
    // feed consumer re-applying rows as full tuples would null exactly the
    // unchanged-TOAST columns. Expose presence (`_cols`) and the barrier
    // flag so consumers (Mirror.feedAsChanges) can replay faithfully.
    val attributed = readDeltas(perSnap.flatMap(_._2),
      projectTo.getOrElse(to.schema), to.keyColumns, withSourceFile = true,
      withPresence = to.partialUpdates)
    // Attribution cost matters at scale: element_at on a LITERAL map is a
    // linear scan per row (ArrayBasedMapData), fine for a micro-batch's
    // handful of files but O(rows x files) for a long-history read — past a
    // small threshold, switch to a broadcast hash join (O(1) probe per row).
    val withSnap =
      if (fileToSnap.size <= 64)
        attributed.withColumn("_snapshot",
          element_at(typedLit(fileToSnap), col("_source_file")))
      else {
        val lookup = spark.createDataFrame(fileToSnap.toSeq)
          .toDF("_source_file", "_snapshot")
        attributed.join(broadcast(lookup), Seq("_source_file"), "left")
      }
    withSnap.drop("_source_file")
  }

  private def commitDeltasOf(sn: Snapshot): Seq[String] =
    sn.commitDeltas.values.flatten.toSeq.sorted

  /** Bounded-parallel driver-side map for metadata fetches — immutable
    * files, thread-safe FileSystem reads, latency-bound work (an object
    * store's GET RTT, not CPU). Runs on the SHARED daemon pool
    * ([[LakeTable.metaPool]]): a per-call Executors.newFixedThreadPool +
    * shutdownNow would pay thread spawn/teardown on every batched lookup
    * and feed read — exactly the high-QPS point-read path this exists
    * for. At most `width` workers drain a shared index; the first failure
    * stops the drain and rethrows its cause. */
  private def parMap[A, B](xs: Seq[A], width: Int)(f: A => B): Seq[B] =
    if (xs.size <= 1) xs.map(f)
    else {
      val xv = xs.toIndexedSeq
      val results = new Array[AnyRef](xv.size)
      val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val next = new java.util.concurrent.atomic.AtomicInteger(0)
      val workers = (0 until math.min(math.max(1, width), xv.size)).map { _ =>
        LakeTable.metaPool.submit(new Runnable {
          override def run(): Unit = {
            var i = next.getAndIncrement()
            while (i < xv.size && err.get() == null) {
              try results(i) = f(xv(i)).asInstanceOf[AnyRef]
              catch { case t: Throwable => err.compareAndSet(null, t) }
              i = next.getAndIncrement()
            }
          }
        })
      }
      workers.foreach(_.get())
      if (err.get() != null) throw err.get()
      results.view.map(_.asInstanceOf[B]).toIndexedSeq
    }

  /** Fetch `ids`' per-commit delta lists with at most
    * [[feedMetaParallelism]] concurrent root reads. Serial resolution is
    * the scale trap this replaces: metadata GET latency — not bytes —
    * dominated long-range feed reads. */
  private def fetchCommitDeltas(ids: Seq[Long],
                                read: Long => Snapshot): Map[Long, Seq[String]] =
    ids.zip(parMap(ids, feedMetaParallelism)(s => commitDeltasOf(read(s)))).toMap

  /** The id -> commit-delta-files entries every feed-log segment
    * overlapping `ids` holds for ids within the range. A segment that
    * fails to parse (torn crash leftover) is SKIPPED — its ids fall back
    * to root reads; the index is a pure metadata-cost optimization and
    * never a correctness dependency. */
  private def readFeedLogRange(ids: Seq[Long]): Map[Long, Seq[String]] = {
    // a range at most one parallel fetch round wide can never win from the
    // index — skip its meta/ LIST entirely (see feedIndexMinRange): the
    // common mirror-a-few-commits-behind read pays zero extra metadata IO
    if (ids.isEmpty || ids.size < feedIndexMinRange) return Map.empty
    val (lo, hi) = (ids.head, ids.last)
    listMetaNames().collect {
      case n @ FeedLogRe(a, b) if a.toLong <= hi && b.toLong >= lo => n
    }.flatMap { name =>
      try {
        val node = mapper.readTree(readMetaFile(s"meta/$name"))
        node.get("deltas").properties().asScala.iterator.map { e =>
          e.getKey.toLong ->
            e.getValue.elements().asScala.map(_.asText).toSeq
        }.filter { case (id, _) => id >= lo && id <= hi }.toSeq
      } catch { case scala.util.control.NonFatal(_) => Nil }
    }.toMap
  }

  /**
   * MAINTENANCE: build the CHANGE-FEED's commit-log index — immutable
   * `meta/feedlog-<first>-<last>.json` segments, each holding `segmentSize`
   * consecutive snapshots' per-commit delta lists — so [[changes]] over a
   * long catch-up range resolves in O(range / segmentSize) metadata
   * round-trips instead of one root read per id. Windows are ALIGNED to
   * multiples of `segmentSize` (idempotent across invocations), only fully
   * committed, fully retained windows are written, and publication is
   * tmp + move — a racing indexer writes byte-identical content, so even a
   * replacement race is harmless. Kept OFF the commit path on purpose: the
   * committer would need K-1 other roots to build a segment, re-paying the
   * cost this removes — and the fenced commit protocol stays untouched.
   * Run it wherever compaction/expire maintenance already runs.
   *
   * @return number of segments written
   */
  def indexFeed(segmentSize: Int = 256): Int = {
    require(segmentSize >= 2 && segmentSize <= (1 << 20),
      s"segmentSize must be in [2, 2^20]: got $segmentSize")
    // a crashed indexer's stranded tmp (publication never happened; its
    // window will be rebuilt below). A LIVE racing indexer losing its tmp
    // just fails its move and retries next maintenance pass.
    val names = listMetaNames()
    names.filter(n => n.startsWith(".feedlog-") && n.endsWith(".tmp"))
      .foreach(n => fs.delete(new HPath(metaDir, n), false))
    val snapIds = names.collect { case SnapshotRe(n) => n.toLong }
    if (snapIds.isEmpty) return 0
    val (minId, maxId) = (snapIds.min, snapIds.max)
    val existing = names.collect {
      case FeedLogRe(a, b) => (a.toLong, b.toLong) }.toSet
    var written = 0
    var first = (minId / segmentSize) * segmentSize
    if (first < minId) first += segmentSize // only fully-retained windows
    while (first + segmentSize - 1 <= maxId) {
      val last = first + segmentSize - 1
      if (!existing.contains((first, last))) {
        // a window expiring under a concurrent maintenance pass is skipped,
        // never half-indexed
        val deltas =
          try Some(fetchCommitDeltas(first to last, snapshotAt))
          catch { case _: java.io.FileNotFoundException => None }
        deltas.foreach { d =>
          val n = mapper.createObjectNode()
          n.put("first", first); n.put("last", last)
          val dn = n.putObject("deltas")
          d.toSeq.sortBy(_._1).foreach { case (id, files) =>
            val arr = dn.putArray(id.toString); files.foreach(arr.add)
          }
          if (publishImmutableMeta(f"feedlog-$first%012d-$last%012d.json",
            mapper.writeValueAsString(n))) written += 1
        }
      }
      first += segmentSize
    }
    written
  }

  /** Publish an immutable meta file whose content is BYTE-IDENTICAL across
    * all possible racers (feed-log segments: content is a pure function of
    * the name's snapshot range): durable tmp write, then move into place;
    * the loser's tmp is discarded and `false` returned so it can re-read.
    * The move is NOT a fencing primitive (rename(2) silently replaces —
    * lessons 10/12); that is tolerable here ONLY because a replaced winner
    * is byte-identical. Content that differs per racer (the mirror
    * bootstrap marker) must go through [[publishFencedMeta]] instead.
    * Readers can never observe a torn file (local: same-dir move; object
    * stores: PUT-on-close is atomic; HDFS: rename contract). Maintenance
    * never touches these names: expire deletes only snapshot/feedlog/plan
    * patterns and removeOrphans sweeps only data/ and meta/manifests/. */
  private[graft] def publishImmutableMeta(name: String, content: String): Boolean = {
    if (!fs.exists(metaDir)) fs.mkdirs(metaDir) // pre-create marker writes
    val target = new HPath(metaDir, name)
    if (fs.exists(target)) return false
    val tmp = new HPath(metaDir,
      s".$name.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    writeMetaFile(tmp, content)
    if (isLocalFs) {
      try {
        Files.move(localFile(tmp), localFile(target))
        fsyncDir(localFile(metaDir)); true
      } catch {
        case _: FileAlreadyExistsException =>
          fs.delete(tmp, false); false
        case _: java.nio.file.NoSuchFileException =>
          // a CONCURRENT indexer's startup sweep deleted our in-flight tmp
          // (it looked stranded from over there). Losing the race is fine
          // — the winner's segment is byte-identical — but it must lose as
          // "publish failed, retry next pass", never as a raw
          // NoSuchFileException aborting this whole maintenance run
          false
      }
    } else {
      val ok = try fs.rename(tmp, target)
      catch { case _: java.io.IOException => false }
      if (!ok) fs.delete(tmp, false)
      ok
    }
  }

  /** FENCED immutable-meta publish, for content that is NOT byte-identical
    * across racers (the mirror bootstrap marker — each racer pins the
    * source snapshot IT observed): the winner is decided by the same
    * per-scheme fail-if-exists primitive as snapshot commits (link(2) /
    * rename-contract / conditional PUT via [[publish]]) — never by
    * tmp+move, whose rename(2) silently REPLACES the winner and would let
    * a loser durably re-pin a different id than the committed clone's.
    * Returns true iff THIS call's content is the published one; on false
    * the caller re-reads the winner's. Also sweeps this name's stranded
    * crashed tmps (no other maintenance pass matches them); a LIVE racer
    * losing its tmp to the sweep just fails its publish and retries —
    * the same argument as indexFeed's startup sweep. */
  private[graft] def publishFencedMeta(name: String, content: String): Boolean = {
    if (!fs.exists(metaDir)) fs.mkdirs(metaDir)
    listMetaNames()
      .filter(n => n.startsWith(s".$name.") && n.endsWith(".tmp"))
      .foreach(n => fs.delete(new HPath(metaDir, n), false))
    val target = new HPath(metaDir, name)
    if (fs.exists(target)) return false
    val tmp = new HPath(metaDir,
      s".$name.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    try { publish(tmp, target, content); true }
    catch {
      case _: CommitConflictException => false // a racer won; re-read it
      case _: java.nio.file.NoSuchFileException => false // racer's sweep took our tmp
      case _: java.io.IOException => false // rename refused; caller retries
    }
  }

  /** The root as its own FileSystem qualifies it — the canonical identity
    * for cross-invocation comparisons (the raw string differs by scheme
    * prefix and slash spelling across equivalent spellings of one path). */
  private[graft] def qualifiedRoot: String = fs.makeQualified(rootPath).toString

  /** Qualify an arbitrary path string the same way (resolved through the
    * session Hadoop conf of THIS table's Spark session). */
  private[graft] def qualify(path: String): String = {
    val p = new HPath(path)
    p.getFileSystem(sessionConf).makeQualified(p).toString
  }

  /**
   * Point lookup: prune by (1) the key's storage bucket (hash), then (2)
   * the per-file key min/max ranges recorded in the snapshot, then filter
   * residually. At 10^10 rows this turns "scan the table" into "scan the
   * handful of files in one bucket whose recorded range covers the key".
   */
  def lookup(keyValues: Map[String, Any]): DataFrame = {
    val snap = snapshotForKey(keyValues)
    require(snap.keyColumns.toSet == keyValues.keySet,
      s"lookup needs exactly the key columns ${snap.keyColumns.mkString(",")}")
    val (_, baseFiles, deltaFiles) = planFiles(snap, keyValues)
    val df =
      if (deltaFiles.isEmpty) readConformed(baseFiles, snap.schema, snap.renameMap)
      else mergedViewLocal(snap.schema, snap.keyColumns, snap.renameMap,
        Seq((baseFiles, deltaFiles)), // one bucket => zero-shuffle merge
        partialUpdates = snap.partialUpdates)
    // cast the literal to the key column's DECLARED type: a raw String
    // against a numeric column would compare through lossy DOUBLE
    // (neighboring bigint keys collide above 2^53)
    keyValues.foldLeft(df) { case (d, (k, v)) =>
      d.filter(col(k) === lit(v).cast(snap.schema(k).dataType)) }
  }

  /**
   * BATCHED point lookup: K keys resolved in ONE Spark job. A point-read
   * service issuing one job per key serializes on the scheduler — at
   * high QPS the scheduler round-trip, not the scan, is the bottleneck.
   * Per key: bucket hash + per-file key-range pruning exactly as
   * [[lookup]]; keys sharing a bucket share one merge slice; buckets with
   * no deltas take a plain pruned base scan. The residual key filter is an
   * OR of typed conjunctions up to [[LakeTable.lookupPredicateKeys]] keys,
   * then a broadcast LEFT SEMI join against a driver-local key relation —
   * constant plan size at thousands of keys, still zero extra jobs
   * (LocalTableScan collects driver-side into the broadcast).
   */
  def lookup(keys: Seq[Map[String, Any]]): DataFrame = {
    val distinctKeys = keys.distinct
    val snap = snapshotForKeys(distinctKeys)
    // EVERY key validates, on both snapshot forms — the distributed branch
    // checks inside snapshotForKeys, but the inline form skips that branch
    // and a malformed non-head key would otherwise surface as a raw
    // NoSuchElementException out of bucketOf
    distinctKeys.foreach(k => require(snap.keyColumns.toSet == k.keySet,
      s"lookup needs exactly the key columns ${snap.keyColumns.mkString(",")}"))
    val byBucket = distinctKeys.map(k => planFiles(snap, k))
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (_, planned) =>
        (planned.flatMap(_._2).distinct, planned.flatMap(_._3).distinct)
      }
    val (withDeltas, baseOnly) = byBucket.partition(_._2.nonEmpty)
    val parts = Seq(
      if (baseOnly.exists(_._1.nonEmpty))
        Some(readConformed(baseOnly.flatMap(_._1), snap.schema, snap.renameMap))
      else None,
      if (withDeltas.nonEmpty)
        Some(mergedViewLocal(snap.schema, snap.keyColumns, snap.renameMap,
          withDeltas, partialUpdates = snap.partialUpdates))
      else None).flatten
    if (parts.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    val df = parts.reduce(_.unionByName(_))
    def typed(c: String, v: Any) = lit(v).cast(snap.schema(c).dataType)
    if (distinctKeys.size <= LakeTable.lookupPredicateKeys)
      df.filter(distinctKeys.map(k =>
        snap.keyColumns.map(c => col(c) === typed(c, k(c))).reduce(_ && _))
        .reduce(_ || _))
    else {
      // the key relation is built by evaluating the SAME
      // Cast(Literal, declaredType) the predicate path's lit(v).cast uses,
      // driver-side (the bucketOf pattern, CLAUDE.md lesson 22) — a
      // String.valueOf round-trip would corrupt binary keys
      // ("[B@1a2b3c".getBytes) and conflate null with the string "null",
      // flipping lookup results when the batch size crosses
      // lookupPredicateKeys
      import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
      import org.apache.spark.sql.catalyst.CatalystTypeConverters
      val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
      val keySchema = StructType(
        snap.keyColumns.map(c => StructField(c, snap.schema(c).dataType)))
      val keyDf = spark.createDataFrame(
        distinctKeys.map { k =>
          org.apache.spark.sql.Row.fromSeq(snap.keyColumns.map { c =>
            val dt = snap.schema(c).dataType
            val raw = Literal.create(k(c))
            val internal =
              if (raw.dataType == dt) raw.value else Cast(raw, dt, tz).eval(null)
            CatalystTypeConverters.convertToScala(internal, dt)
          })
        }.asJava, keySchema)
      df.join(broadcast(keyDf), snap.keyColumns.toSeq, "left_semi")
    }
  }

  /** Metadata-LIGHT snapshot resolve for a point lookup: on a distributed
    * snapshot, read the root plus ONLY the key's bucket manifest — O(1)
    * metadata IO per lookup instead of O(buckets). The returned snapshot is
    * partial (that one bucket resolved), which is exactly what
    * [[planFiles]] touches for this key. Inline snapshots resolve fully. */
  def snapshotForKey(keyValues: Map[String, Any]): Snapshot =
    snapshotForKeys(Seq(keyValues))

  /** [[snapshotForKey]] generalized to a key BATCH: root + only the
    * distinct buckets the keys hash to, manifests fetched in bounded
    * parallel (the same latency math as the feed catch-up — K manifest
    * GETs serial would put the scheduler-free batched lookup right back
    * behind a metadata wall). */
  def snapshotForKeys(keys: Seq[Map[String, Any]]): Snapshot = {
    require(keys.nonEmpty, "lookup needs at least one key")
    val id = latestSnapshotId
    if (id < 0) throw new IllegalStateException(s"no snapshot at $root")
    val json = readMetaFile(f"meta/snapshot-$id%012d.json")
    LakeTable.parseRootOnly(json) match {
      case (_, None) => fromJson(json) // inline form: one document anyway
      case (base, Some(pointers)) =>
        // validate BEFORE bucketOf touches the maps — a missing key column
        // must produce the informative error, not a NoSuchElementException
        keys.foreach(k => require(base.keyColumns.toSet == k.keySet,
          s"lookup needs exactly the key columns ${base.keyColumns.mkString(",")}"))
        val buckets = keys.map(b => bucketOf(base, b)).distinct.sorted
        val resolved = parMap(
          buckets.flatMap(b => pointers.get(b).map(b -> _)),
          feedMetaParallelism) { case (b, rel) =>
          b -> manifestFromJson(readMetaFile(rel))
        }
        base.copy(
          bucketFiles = resolved.collect {
            case (b, m) if m.files.nonEmpty => b -> m.files }.toMap,
          bucketDeltas = resolved.collect {
            case (b, m) if m.deltas.nonEmpty => b -> m.deltas }.toMap,
          bucketWatermarks = resolved.flatMap {
            case (b, m) => m.watermark.map(b -> _) }.toMap,
          bucketLineage = resolved.collect {
            case (b, m) if m.lineage.nonEmpty => b -> m.lineage }.toMap,
          fileStats = resolved.iterator.map(_._2.fileStats)
            .foldLeft(Map.empty[String, Map[String, (String, String)]])(_ ++ _),
          fileBytes = resolved.iterator.map(_._2.fileBytes)
            .foldLeft(Map.empty[String, Long])(_ ++ _),
          bucketManifests = pointers)
    }
  }

  /** Register the table (and optionally a historical snapshot) as a temp
    * view so plain `spark.sql` can query it. */
  def createOrReplaceView(name: String, asOfSnapshot: Option[Long] = None): Unit =
    read(asOfSnapshot = asOfSnapshot).createOrReplaceTempView(name)

  /** The files a point lookup must scan: the key's bucket, minus files
    * whose recorded key range cannot contain the key (files with no stats
    * recorded are conservatively kept). Exposed for plan assertions.
    * @return (bucket, base files, delta files) */
  def planFiles(snap: Snapshot,
                keyValues: Map[String, Any]): (Int, Seq[String], Seq[String]) = {
    val b = bucketOf(snap, keyValues)
    def keep(f: String): Boolean = snap.fileStats.get(f) match {
      case None => true
      case Some(ranges) => keyValues.forall { case (k, v) =>
        ranges.get(k) match {
          case None => true
          case Some((lo, hi)) => rangeContains(snap.schema(k).dataType, lo, hi, v)
        }
      }
    }
    (b,
      snap.bucketFiles.getOrElse(b, Nil).filter(keep),
      snap.bucketDeltas.getOrElse(b, Nil).filter(keep))
  }

  /** The storage bucket of a concrete key — computed by EVALUATING the SAME
    * Catalyst expression used at write time (the `xxhash64` behind
    * [[bucketExpr]]) driver-side, so pruning can never disagree with
    * executor-side bucketing (a hand-rolled JVM re-implementation of
    * xxhash64 would be a silent-divergence risk) and a point lookup no
    * longer launches a one-row Spark job just to hash its key — a high-QPS
    * lookup service would serialize on the scheduler. Key types whose
    * literal/cast cannot be represented driver-side fall back to the
    * job-based evaluation; BucketParity tests pin agreement across types. */
  def bucketOf(snap: Snapshot, keyValues: Map[String, Any]): Int =
    try {
      import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, XxHash64}
      val keyLits = snap.keyColumns.map { k =>
        val dt = snap.schema(k).dataType
        val raw = Literal.create(keyValues(k))
        if (raw.dataType == dt) raw
        else {
          val cast = Cast(raw, dt,
            Some(spark.sessionState.conf.sessionLocalTimeZone))
          Literal.create(cast.eval(null), dt)
        }
      }
      val h = new XxHash64(keyLits).eval(null).asInstanceOf[Long]
      val n = snap.nBuckets.toLong
      (((h % n) + n) % n).toInt // pmod, the defined-semantics half
    } catch {
      case scala.util.control.NonFatal(_) => bucketOfViaJob(snap, keyValues)
    }

  /** Job-based fallback (and the parity oracle in tests): the identical
    * expression evaluated by the engine itself on a one-row frame. */
  private[graft] def bucketOfViaJob(snap: Snapshot,
                                    keyValues: Map[String, Any]): Int = {
    val keyLits = snap.keyColumns.map { k =>
      lit(keyValues(k)).cast(snap.schema(k).dataType).as(k)
    }
    spark.range(1).select(keyLits: _*)
      .select(bucketExpr(snap.keyColumns, snap.nBuckets).as("b"))
      .head().getInt(0)
  }

  /** Typed containment test over stringified min/max stats. Types whose
    * string form does not order like the value (timestamps, binaries, ...)
    * conservatively return true — bucket pruning still applies. */
  private def rangeContains(dt: DataType, lo: String, hi: String, v: Any): Boolean =
    try dt match {
      case ShortType | IntegerType | LongType =>
        val x = v.toString.toLong; lo.toLong <= x && x <= hi.toLong
      case FloatType | DoubleType =>
        val x = v.toString.toDouble; lo.toDouble <= x && x <= hi.toDouble
      case _: DecimalType =>
        val x = BigDecimal(v.toString); BigDecimal(lo) <= x && x <= BigDecimal(hi)
      case StringType =>
        // Spark's min/max ordered the stats by UTF8String = UNSIGNED UTF-8
        // BYTE order; Java String <=> compares UTF-16 code units, which
        // DISAGREES outside the BMP (a surrogate pair sorts below U+E000+
        // in UTF-16 but above in UTF-8) — comparing in the wrong order
        // would wrongly prune a file that contains the key. Compare in the
        // same byte space the stats were computed in.
        val vb = v.toString.getBytes(StandardCharsets.UTF_8)
        java.util.Arrays.compareUnsigned(lo.getBytes(StandardCharsets.UTF_8), vb) <= 0 &&
          java.util.Arrays.compareUnsigned(vb, hi.getBytes(StandardCharsets.UTF_8)) <= 0
      case _ => true
    } catch { case _: NumberFormatException => true }

  /**
   * SHUFFLE-FREE merge-on-read: the bucket layout already co-locates every
   * version of a key inside one bucket's base+delta files, so the keep-last
   * merge never needs a cluster-wide exchange — each bucket's files are
   * read into ONE partition (coalesce, narrow), locally sorted by
   * (key ASC, lsn DESC, seq DESC), and streamed through a keep-first-per-key
   * dedup that drops delete markers. Output: one partition per bucket, rows
   * key-sorted — which also lets compaction write one key-ordered file per
   * bucket with no repartition.
   *
   * The per-bucket task serializes that bucket's read onto one core; that is
   * the engine's unit of merge work by design (compaction already operates
   * at bucket grain), and buckets are sized accordingly. Trade-off vs
   * [[mergedView]]: no Exchange at all, but the dedup runs as a typed
   * mapPartitions outside whole-stage codegen.
   */
  def mergedViewLocal(schema: StructType, keyColumns: Seq[String],
                      renameMap: Map[String, String],
                      bucketGroups: Seq[(Seq[String], Seq[String])],
                      partialUpdates: Boolean = false): DataFrame = {
    val perBucket = bucketGroups.map { case (baseFiles, deltaFiles) =>
      var base = readConformed(baseFiles, schema, renameMap)
        .withColumn("_lsn", lit(-1L))
        .withColumn("_seq", lit(-1).cast("int"))
        .withColumn("_kind", lit("insert"))
      if (partialUpdates)
        // base rows are FULL (every compaction emits complete rows) and
        // are the coalescing floor: _cols null = all present, barrier =
        // nothing older than base exists to coalesce from
        base = base.withColumn("_cols", lit(null).cast(ArrayType(StringType)))
          .withColumn("_barrier", lit(true))
      base.unionByName(readDeltas(deltaFiles, schema, keyColumns,
        withPresence = partialUpdates)).coalesce(1)
    }
    val all = perBucket.reduce(_.unionByName(_))
    val sorted = all.sortWithinPartitions(
      (keyColumns.map(col) ++ Seq(col("_lsn").desc, col("_seq").desc)): _*)
    val full = sorted.schema
    val kIdx = keyColumns.map(full.fieldIndex)
    val kindIdx = full.fieldIndex("_kind")
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(full)
    val deduped =
      if (!partialUpdates) sorted.mapPartitions { it =>
        var prev: Seq[Any] = null
        it.flatMap { r =>
          val k = kIdx.map(r.get)
          if (prev != null && k == prev) None // older version of the same key
          else {
            prev = k
            if (r.getString(kindIdx) == "delete") None else Some(r)
          }
        }
      }
      else {
        // PARTIAL-UPDATE fold, still streaming over the same key-desc
        // order with zero exchange: the newest version decides liveness
        // (delete = dead) and lsn/seq/kind; each column missing from it
        // coalesces from the next-older version that CARRIED the column,
        // walking no further back than the first barrier version (insert/
        // delete/base — a row redefined there must not inherit its dead
        // predecessor's columns).
        val colsIdx = full.fieldIndex("_cols")
        val barIdx = full.fieldIndex("_barrier")
        // only non-key schema fields can be absent (keys are typed columns)
        val dataIdx = schema.fieldNames.filterNot(keyColumns.contains)
          .map(full.fieldIndex).toArray
        val nameOf = full.fieldNames
        val kIdxArr = kIdx.toArray
        // companion-object call: a nested def / anonymous class here would
        // capture the enclosing LakeTable (non-serializable $outer)
        sorted.mapPartitions(it => LakeTable.partialOverlayFold(
          it, kIdxArr, kindIdx, colsIdx, barIdx, dataIdx, nameOf, full))
      }
    deduped.select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /**
   * Merge-on-read view: current rows = base rows (which any delta on the
   * same key supersedes — deltas pass the bucket watermark gate, so they
   * are strictly newer) unioned with delta rows, keep-last per key by
   * (lsn, seq), delete markers dropped. The shuffle-based formulation —
   * [[mergedViewLocal]] is preferred below [[maxLocalMergeBuckets]].
   */
  def mergedView(schema: StructType, keyColumns: Seq[String],
                 renameMap: Map[String, String],
                 baseFiles: Seq[String], deltaFiles: Seq[String],
                 partialUpdates: Boolean = false): DataFrame = {
    if (partialUpdates)
      return mergedViewPartialShuffle(schema, keyColumns, renameMap,
        baseFiles, deltaFiles)
    val base = readConformed(baseFiles, schema, renameMap)
      .withColumn("_lsn", lit(-1L))
      .withColumn("_seq", lit(-1).cast("int"))
      .withColumn("_kind", lit("insert"))
    val deltas = readDeltas(deltaFiles, schema, keyColumns)
    val all = base.unionByName(deltas)
    val dataCols = schema.fieldNames.filterNot(keyColumns.contains).toSeq
    val payload = struct((dataCols.map(col) :+ col("_kind")).toIndexedSeq: _*)
    val ord = struct(col("_lsn"), col("_seq"))
    all.groupBy(keyColumns.map(col): _*)
      .agg(max_by(payload, ord).as("_w"))
      .filter(col("_w._kind") =!= "delete")
      .select(schema.fieldNames.map(n =>
        (if (keyColumns.contains(n)) col(n) else col(s"_w.$n")).as(n)).toIndexedSeq: _*)
  }

  /** The shuffle merge under PARTIAL-UPDATE semantics: delta versions of a
    * key collapse through the same column-wise overlay the write-side
    * dedup uses ([[graft.functions.OverlayKeepLast]] — per column, the
    * latest version that CARRIED it, never past an insert/delete barrier),
    * then a full-outer join against base resolves, per column, whether the
    * overlay's window reached a barrier (its value stands, absent = null)
    * or still patches the base row (absent columns coalesce from base).
    * Shuffle budget matches the full-tuple form: deltas exchange once into
    * the aggregation, base exchanges once into the join (vs one exchange
    * of their union), both on the same key hash. */
  private def mergedViewPartialShuffle(schema: StructType,
      keyColumns: Seq[String], renameMap: Map[String, String],
      baseFiles: Seq[String], deltaFiles: Seq[String]): DataFrame = {
    val raw = readDeltaRaw(deltaFiles, schema, keyColumns)
    val agg = raw.groupBy(keyColumns.map(col): _*)
      .agg(graft.functions.OverlayKeepLast.overlayKeepLast(raw.sparkSession,
        col("_lsn"), col("_seq"), col("_kind"), col("_row"), col("_types"),
        coalesce(col("_barrier"), col("_kind") =!= "update")).as("_w"))
    val base = readConformed(baseFiles, schema, renameMap)
    val joined = base.join(agg, keyColumns.toSeq, "full_outer")
    joined
      .filter(col("_w").isNull || col("_w.kind") =!= "delete")
      .select(schema.fields.map { f =>
        if (keyColumns.contains(f.name)) col(f.name).as(f.name)
        else
          when(col("_w").isNull, col(f.name))
            .when(col("_w._barrier") ||
                map_contains_key(col("_w._row"), f.name),
              element_at(col("_w._row"), f.name).cast(f.dataType))
            .otherwise(col(f.name))
            .as(f.name)
      }.toIndexedSeq: _*)
  }

  /** The ONE physical schema of delta parquet files: typed key columns +
    * the self-describing _row/_types maps + ordering/kind + _barrier
    * (written only by partial-update tables; elsewhere reads null). Both
    * delta readers derive from here — a column added to one reader but
    * not the other would silently read as null. */
  private def deltaPhysicalSchema(schema: StructType,
                                  keyColumns: Seq[String]): StructType =
    StructType((
      keyColumns.map(k => StructField(k, schema(k).dataType)) ++ Seq(
        StructField("_row", MapType(StringType, StringType)),
        StructField("_types", MapType(StringType, StringType)),
        StructField("_lsn", LongType),
        StructField("_seq", IntegerType),
        StructField("_kind", StringType),
        StructField("_barrier", BooleanType))).map(_.copy(nullable = true)))

  /** Raw delta rows — typed keys + the self-describing maps, NOT pivoted
    * through the schema (the partial-update shuffle merge aggregates the
    * maps themselves; pivoting first would erase absent-vs-null). */
  private def readDeltaRaw(files: Seq[String], schema: StructType,
                           keyColumns: Seq[String]): DataFrame = {
    val physical = deltaPhysicalSchema(schema, keyColumns)
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], physical)
    else spark.read.schema(physical).parquet(files.map(f => s"$root/$f"): _*)
  }

  /** Read delta files (typed keys + self-describing _row/_types maps +
    * _lsn/_seq/_kind) and pivot them through `schema`: a delta written
    * before a column existed simply yields null for it, and delete markers
    * carry _row = null — the read-time half of schema evolution. */
  private def readDeltas(files: Seq[String], schema: StructType,
                         keyColumns: Seq[String],
                         withSourceFile: Boolean = false,
                         withPresence: Boolean = false): DataFrame = {
    if (files.isEmpty) {
      val full = StructType(schema.fields ++ Seq(StructField("_lsn", LongType),
        StructField("_seq", IntegerType), StructField("_kind", StringType)) ++
        (if (withPresence) Seq(StructField("_cols", ArrayType(StringType)),
          StructField("_barrier", BooleanType)) else Nil) ++
        (if (withSourceFile) Seq(StructField("_source_file", StringType)) else Nil))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full)
    } else {
      // The delta physical schema is FULLY determined by the snapshot
      // (typed keys + self-describing maps + ordering columns), so read
      // with it explicitly: schema inference over parquet footers launches
      // a Spark job at PLAN time — per point lookup, that made every
      // lookup pay a scheduler round-trip before the scan even started.
      val df = spark.read.schema(deltaPhysicalSchema(schema, keyColumns))
        .parquet(files.map(f => s"$root/$f"): _*)
      val cols = schema.fields.map { f =>
        if (keyColumns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else element_at(col("_row"), f.name).cast(f.dataType).as(f.name)
      } ++ Seq(col("_lsn"), col("_seq"), col("_kind")) ++
        // PARTIAL-UPDATE reads keep what the pivot erases: WHICH columns
        // the collapsed tuple actually carried (absent != present-null)
        // and whether its window contained an insert/delete barrier
        // (pre-upgrade rows lack the flag: kind decides, matching the
        // full-tuple assumption those rows were written under)
        (if (withPresence) Seq(map_keys(col("_row")).as("_cols"),
          coalesce(col("_barrier"), col("_kind") =!= "update").as("_barrier"))
        else Nil) ++
        (if (withSourceFile)
          // the parquet file NAME a row came from (globally unique — each
          // write job embeds its own UUID) — lets the change feed attribute
          // rows to their snapshot in ONE scan, independent of how many
          // partition-directory levels sit between the commit dir and the
          // file (delta writes partitionBy(_bucket))
          Seq(element_at(split(input_file_name(), "/"), -1).as("_source_file"))
        else Nil)
      df.select(cols.toIndexedSeq: _*)
    }
  }

  /** Read base files and conform them to `schema` (mergeSchema across eras,
    * rename coalescing, column order/casts). */
  private def readConformed(files: Seq[String], schema: StructType,
                            renameMap: Map[String, String]): DataFrame = {
    if (files.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else {
      // Explicit physical schema instead of mergeSchema footer inference
      // (which launches a Spark job at plan time): the union schema across
      // eras is known from the snapshot — current columns plus any
      // pre-rename names (their files predate the rename; same type). A
      // column absent from a given file reads as null, exactly what the
      // inference-based union produced.
      val extraOld = renameMap.toSeq.sortBy(_._1).collect {
        case (oldName, newName)
            if schema.fieldNames.contains(newName) &&
              !schema.fieldNames.contains(oldName) =>
          StructField(oldName, schema(newName).dataType)
      }
      val physical = StructType(
        (schema.fields ++ extraOld).map(_.copy(nullable = true)))
      var df = spark.read.schema(physical)
        .parquet(files.map(f => s"$root/$f"): _*)
      // Apply renames: new name wins; old-era files contribute via coalesce.
      renameMap.foreach { case (oldName, newName) =>
        val has = df.columns.toSet
        if (has.contains(oldName) && has.contains(newName))
          df = df.withColumn(newName, coalesce(col(newName), col(oldName)))
            .drop(oldName)
        else if (has.contains(oldName))
          df = df.withColumnRenamed(oldName, newName)
      }
      // Conform to snapshot schema (order + any columns absent in all files).
      val cols = schema.fields.map { f =>
        if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }
      df.select(cols.toIndexedSeq: _*)
    }
  }

  /**
   * CLONE the table at a snapshot (default: current) to a fresh root — the
   * DR / dev-copy / environment-promotion primitive. The target is an
   * independent table whose snapshot 0 carries the source snapshot's full
   * content: schema, key columns, bucket count, per-file stats, AND the
   * LSN watermarks — so pointing the ingest pipeline at the clone resumes
   * exactly-once from the cloned position (a full WAL replay gates to
   * zero; only post-watermark events apply). `asOfSnapshot` clones a
   * historical snapshot: a point-in-time recovery that then re-ingests the
   * tail of the stream to catch up.
   *
   * The data-file copy is DISTRIBUTED (one Spark task per slice of the
   * file list, each opening source/target FileSystems from the broadcast
   * Hadoop conf — the distcp shape), so a 10^10-row clone scales with the
   * cluster, not the driver. Only files referenced by the cloned snapshot
   * are copied — none of the source's other snapshots, expired history, or
   * superseded deltas travel. Per-commit feed provenance is cleared
   * (lesson 24's rule for every snap.copy commit): the clone's change feed
   * starts empty and accumulates its own history.
   *
   * Fencing: the target's snapshot 0 publishes through the same
   * conditional commit as any other — two racing cloners to one root get
   * one winner, and a pre-existing table at the target is rejected.
   *
   * @return the clone's snapshot 0
   */
  def cloneTo(targetRoot: String, asOfSnapshot: Option[Long] = None): Snapshot = {
    val id = asOfSnapshot.getOrElse(latestSnapshotId)
    if (id < 0) throw new IllegalStateException(s"no snapshot at $root")
    val snap = readSnapshot(id) // FULL resolve: manifest content inlined
    val target = new LakeTable(spark, targetRoot,
      maxDeltasPerBucket = maxDeltasPerBucket,
      maxLocalMergeBuckets = maxLocalMergeBuckets,
      manifestThresholdFiles = manifestThresholdFiles,
      compressionCodec = compressionCodec,
      maxDeltaBytesPerBucket = maxDeltaBytesPerBucket,
      maxLocalMergeBytesPerBucket = maxLocalMergeBytesPerBucket,
      inlineCompaction = inlineCompaction)
    if (target.exists)
      throw new IllegalArgumentException(
        s"clone target $targetRoot already holds a table")
    // the layout create() would have made (commit assumes meta/ exists)
    target.fs.mkdirs(target.metaDir)
    target.fs.mkdirs(target.dataDir)
    // copy ONLY what the clone's snapshot will reference: allFiles also
    // counts commitDeltas-only files (deltas compacted away within their
    // own commit, kept for the SOURCE's feed) — the clone clears its feed
    // provenance, so copying those would leave unreferenced orphans
    val files = (snap.bucketFiles.values.flatten ++
      snap.bucketDeltas.values.flatten).toSeq.distinct.sorted
    try {
    if (files.nonEmpty) {
      val confSer = new org.apache.spark.util.SerializableConfiguration(sessionConf)
      val (srcRoot, dstRoot) = (root, targetRoot)
      val slices = math.max(1, math.min(files.size,
        spark.sparkContext.defaultParallelism * 2))
      spark.sparkContext.parallelize(files, slices).foreach { rel =>
        val c = confSer.value
        val from = new HPath(s"$srcRoot/$rel")
        val to = new HPath(s"$dstRoot/$rel")
        val sfs = from.getFileSystem(c)
        val tfs = to.getFileSystem(c)
        tfs.mkdirs(to.getParent)
        org.apache.hadoop.fs.FileUtil.copy(sfs, from, tfs, to,
          false /* keep source */, true /* overwrite a torn retry */, c)
        // local targets: force the copy (and its dir entry) to disk before
        // the root snapshot references it (hsync on ChecksumFileSystem is
        // a silent no-op — the same durability rule the write path follows)
        val uri = to.toUri
        if (uri.getScheme == null || uri.getScheme == "file") {
          val p = java.nio.file.Paths.get(
            Option(uri.getPath).getOrElse(to.toString))
          val ch = FileChannel.open(p, StandardOpenOption.WRITE)
          try ch.force(true) finally ch.close()
          // ChecksumFileSystem writes a .crc sidecar per file; left
          // page-cache-only it can come back torn after a power loss and
          // every read then fails with ChecksumException (the same wedge
          // writeBucketedSized forces against)
          val crc = p.getParent.resolve("." + p.getFileName.toString + ".crc")
          if (java.nio.file.Files.exists(crc)) {
            val cch = FileChannel.open(crc, StandardOpenOption.WRITE)
            try cch.force(true) finally cch.close()
          }
          try {
            val dch = FileChannel.open(p.getParent, StandardOpenOption.READ)
            try dch.force(true) finally dch.close()
          } catch { case _: Exception => () }
        }
      }
      // the bucket dirs were fsynced per file above; the commit dirs and
      // data/ itself also carry new entries the durable root will reference
      if (target.isLocalFs) {
        files.map(_.split('/').take(2).mkString("/")).distinct.foreach { d =>
          target.fsyncDir(target.localFile(new HPath(target.rootPath, d)))
        }
        target.fsyncDir(target.localFile(target.dataDir))
      }
    }
    target.commit(
      snap.copy(
        commitDeltas = Map.empty, // the clone's feed history starts empty
        bucketManifests = Map.empty), // target commit() re-derives its own
      expectedSnapshotId = -1L)
    } catch {
      // A failed clone must not leave up to a whole table's worth of
      // unreferenced copies at the target. EXCEPT when a committed table
      // exists there: a racing cloner of the same source copied to the
      // SAME relative paths — our files ARE the winner's files, deleting
      // them would destroy a committed clone (the lesson-23 rule: never
      // delete on conflict). That protection must hold for ANY failure
      // class, not just CommitConflictException — a loser whose COPY
      // phase failed (task error) after the winner committed would
      // otherwise delete the winner's referenced files.
      case e: Throwable =>
        if (!e.isInstanceOf[CommitConflictException] && !target.exists) {
          files.foreach { rel =>
            try target.fs.delete(new HPath(target.rootPath, rel), false)
            catch { case _: Exception => () }
          }
        }
        throw e
    }
  }

  /**
   * Retention maintenance: drop snapshots older than the newest `keepLast`
   * and delete data files referenced ONLY by the dropped ones (the analog
   * of Iceberg's expire_snapshots + orphan cleanup; bounds storage growth
   * while keeping `keepLast` snapshots time-travelable).
   *
   * @return (snapshots removed, data files deleted)
   */
  def expireSnapshots(keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    executeExpirePlans() // finish a crashed prior pass's deletions first
    val ids = listMetaNames()
      .collect { case SnapshotRe(n) => n.toLong }
      .sorted
    if (ids.size <= keepLast) return (0, 0)
    val (expire, keep) = ids.splitAt(ids.size - keepLast)
    // A KEPT snapshot vanishing mid-pass means a concurrent expire with a
    // tighter policy won the race — our dead-set math is stale; retry.
    // An EXPIRING snapshot vanishing is benign (already expired): skip.
    val keptSnaps = keep.map { id =>
      try readSnapshot(id)
      catch {
        case e: java.io.FileNotFoundException
            if !fs.exists(new HPath(metaDir, f"snapshot-$id%012d.json")) =>
          throw new IllegalStateException(
            s"snapshot $id vanished during expire (concurrent maintenance)" +
              " — re-run expireSnapshots", e)
      }
    }
    val expSnaps = expire.flatMap(readSnapshotIfPresent)
    val keptFiles = keptSnaps.flatMap(_.allFiles).toSet
    val deadFiles = expSnaps.flatMap(_.allFiles).toSet -- keptFiles
    val keptManifests = keptSnaps.flatMap(_.bucketManifests.values).toSet
    val deadManifests =
      expSnaps.flatMap(_.bucketManifests.values).toSet -- keptManifests
    // Durable deletion plan BEFORE dropping the roots: the expired roots
    // are the ONLY record of which files are dead. A crash between root
    // deletion and file deletion would otherwise leak those files forever
    // — the orphan sweep works at commit-directory granularity and cannot
    // see dead files inside directories that still hold live ones.
    val planId = java.util.UUID.randomUUID().toString.take(8)
    val planPath = new HPath(metaDir, s".expire-plan-$planId.json")
    if (deadFiles.nonEmpty || deadManifests.nonEmpty) {
      // write at a name OUTSIDE executeExpirePlans' filter, then publish
      // atomically: a racing maintenance pass must never list a plan
      // mid-write (it would read torn JSON, discard it as unparseable,
      // and delete the only record of this pass's dead files)
      val tmp = new HPath(metaDir, s".expire-plan-$planId.tmp")
      writeMetaFile(tmp, expirePlanJson(expire, deadFiles, deadManifests))
      if (isLocalFs) {
        Files.move(localFile(tmp), localFile(planPath),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        fsyncDir(localFile(metaDir))
      } else if (!fs.rename(tmp, planPath))
        throw new java.io.IOException(s"could not publish expire plan $planPath")
    }
    // ORDER MATTERS for crash-resumability: drop the expired snapshot
    // JSONs FIRST — after that, the dead data files and manifests are mere
    // orphans (listed in the plan, sweepable) — whereas deleting a
    // snapshot's manifests before its root would leave a listed snapshot
    // that readSnapshot can never resolve again, wedging every later
    // maintenance pass on the same FileNotFound.
    expire.foreach(id =>
      fs.delete(new HPath(metaDir, f"snapshot-$id%012d.json"), false))
    // feed-log index segments referencing ANY expired id die with their
    // snapshots (a retained range never consults them). A crash landing
    // here leaves a stale segment — harmless: changes() existence-checks
    // the oldest id in its range before trusting any segment, and the next
    // expire pass re-derives this same dead set.
    listMetaNames().collect {
      case n @ FeedLogRe(a, _) if a.toLong < keep.head => n
    }.foreach(n => fs.delete(new HPath(metaDir, n), false))
    deadFiles.foreach(f => fs.delete(new HPath(rootPath, f), false))
    deadManifests.foreach(m => fs.delete(new HPath(rootPath, m), false))
    fs.delete(planPath, false) // deletions complete: retire the plan
    // sweep now-empty commit directories
    if (fs.exists(dataDir))
      fs.listStatus(dataDir).foreach(st => sweepEmptyDirs(st.getPath))
    (expire.size, deadFiles.size)
  }

  /** Read a snapshot, or None exactly when its ROOT file is gone (a
    * concurrent expire removed it). Any other failure — e.g. a missing
    * manifest with the root still listed — propagates: skipping such a
    * snapshot would misclassify its files as orphans. */
  private def readSnapshotIfPresent(id: Long): Option[Snapshot] =
    try Some(readSnapshot(id))
    catch {
      case _: java.io.FileNotFoundException
          if !fs.exists(new HPath(metaDir, f"snapshot-$id%012d.json")) =>
        None
    }

  private def expirePlanJson(roots: Seq[Long], files: Set[String],
                             manifests: Set[String]): String = {
    val n = mapper.createObjectNode()
    val ra = n.putArray("roots"); roots.sorted.foreach(ra.add)
    val fa = n.putArray("files"); files.toSeq.sorted.foreach(fa.add)
    val ma = n.putArray("manifests"); manifests.toSeq.sorted.foreach(ma.add)
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(n)
  }

  /** Complete the deletions of any expire pass that crashed after writing
    * its plan (idempotent: every entry is delete-if-exists; plan entries
    * were dead at planning time and data/manifest paths are never reused,
    * so re-execution can never touch live state). The plan's snapshot
    * ROOTS are deleted FIRST — lesson 13: deleting a root's manifests
    * while the root is still listed leaves a snapshot readSnapshot can
    * never resolve, wedging every later maintenance pass. */
  private def executeExpirePlans(): Unit = {
    val names = listMetaNames()
    // a pass that crashed between writing its plan .tmp and the atomic
    // publish left a stranded tmp; its roots survived (publish precedes
    // any deletion), so recomputation covers it — just sweep the file
    names.filter(n => n.startsWith(".expire-plan-") && n.endsWith(".tmp"))
      .foreach(n => fs.delete(new HPath(metaDir, n), false))
    names.filter(n =>
      n.startsWith(".expire-plan-") && n.endsWith(".json")).foreach { name =>
      val p = new HPath(metaDir, name)
      // ONLY file-not-found means "plan already retired by a racing pass";
      // any other IO failure aborts — retiring a plan whose deletions were
      // skipped would leak its dead files forever (the plan is their only
      // record)
      val json =
        try Some(readMetaFile(s"meta/$name"))
        catch { case _: java.io.FileNotFoundException => None }
      json.foreach { j =>
        // A TORN plan (crash mid-write) is safe to discard: the roots are
        // only deleted AFTER the plan write returned durably, so a torn
        // plan implies the expired roots survived and a re-run recomputes
        // the dead sets from scratch.
        val node =
          try mapper.readTree(j)
          catch { case _: com.fasterxml.jackson.core.JacksonException => null }
        if (node != null) {
          def strs(field: String): Seq[String] = {
            val arr = node.get(field)
            if (arr == null) Nil
            else (0 until arr.size()).map(arr.get(_).asText())
          }
          val roots = Option(node.get("roots")).toSeq
            .flatMap(arr => (0 until arr.size()).map(arr.get(_).asLong()))
          roots.foreach(id =>
            fs.delete(new HPath(metaDir, f"snapshot-$id%012d.json"), false))
          (strs("files") ++ strs("manifests"))
            .foreach(rel => fs.delete(new HPath(rootPath, rel), false))
        }
      }
      fs.delete(p, false)
    }
  }

  /** Newest modification time anywhere under `p` (files or directories);
    * tolerates entries vanishing mid-walk (concurrent job commit). Recurses
    * on the FileStatus the parent listing already returned — re-stat'ing
    * each child would double the metadata RPCs on remote stores. */
  private def newestMtime(p: HPath): Long =
    try newestMtime(fs.getFileStatus(p))
    catch { case _: java.io.FileNotFoundException => Long.MaxValue }

  private def newestMtime(st: org.apache.hadoop.fs.FileStatus): Long =
    if (!st.isDirectory) st.getModificationTime
    else
      try (st.getModificationTime +:
        fs.listStatus(st.getPath).toSeq.map(newestMtime)).max
      catch { case _: java.io.FileNotFoundException => Long.MaxValue }

  /** Depth-first removal of empty directories under (and including) `p`. */
  private def sweepEmptyDirs(p: HPath): Unit = {
    val children = fs.listStatus(p)
    children.filter(_.isDirectory).foreach(c => sweepEmptyDirs(c.getPath))
    if (fs.listStatus(p).isEmpty) fs.delete(p, false)
  }

  /** A fresh, collision-free data directory name for an attempted commit of
    * `snapshotId`. Unique per ATTEMPT: two racing writers targeting the same
    * snapshot id must never share a directory (mode=overwrite would clobber
    * the winner's data files before the loser's commit is fenced off). */
  def newCommitDirName(snapshotId: Long, prefix: String = "commit"): String =
    f"$prefix-$snapshotId%012d-${java.util.UUID.randomUUID().toString.take(8)}"

  /** Recursively delete an attempted commit's data directory (called when
    * the commit loses the fencing race or fails — otherwise orphaned files
    * would accumulate unbounded under concurrent-writer conflicts). */
  def deleteDataDir(dirName: String): Unit = {
    val p = new HPath(dataDir, dirName)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /**
   * Orphan sweep (the analog of Iceberg's remove_orphan_files): delete data
   * directories not referenced by ANY retained snapshot and older than
   * `graceMs` (the grace period protects an in-flight writer that has
   * written its data files but not yet committed).
   *
   * @return number of orphan directories removed
   */
  def removeOrphans(graceMs: Long = 60 * 60 * 1000L): Int = {
    executeExpirePlans() // finish a crashed expire's deletions first
    val cutoff = System.currentTimeMillis() - graceMs
    // tolerate a snapshot expiring between the listing and the read (its
    // exclusive files were deleted by that expire); any other read failure
    // aborts the pass — misreading here could orphan live files
    val snaps = listMetaNames().collect { case SnapshotRe(n) => n.toLong }
      .flatMap(readSnapshotIfPresent)
    val dirOrphans =
      if (!fs.exists(dataDir)) 0
      else {
        val liveDirs = snaps.flatMap(_.allFiles)
          .map(f => f.split("/")(1)).toSet // data/<dir>/...
        val orphans = fs.listStatus(dataDir).toSeq.filter { st =>
          // liveness = the NEWEST mtime in the tree, not the top dir's: a
          // long-running write job mutates only _temporary/ underneath,
          // leaving the top mtime at creation — grace judged on that alone
          // would GC an in-flight commit attempt mid-job
          !liveDirs.contains(st.getPath.getName) &&
            newestMtime(st.getPath) < cutoff
        }
        orphans.foreach(st => deleteDataDir(st.getPath.getName))
        orphans.size
      }
    // manifests referenced by NO snapshot (commit-race losers that crashed
    // before cleanup, crashed attempts): same grace period protects a
    // writer that has staged manifests but not yet published its root
    val manifestsDir = new HPath(metaDir, "manifests")
    val manifestOrphans =
      if (!fs.exists(manifestsDir)) 0
      else {
        val live = snaps.flatMap(_.bucketManifests.values)
          .map(_.split("/").last).toSet
        val orphans = fs.listStatus(manifestsDir).toSeq.filter { st =>
          !live.contains(st.getPath.getName) && st.getModificationTime < cutoff
        }
        orphans.foreach(st => fs.delete(st.getPath, false))
        orphans.size
      }
    dirOrphans + manifestOrphans
  }

  /** Write `df` (which must carry an integer `_bucket` column) as the data
    * files of an attempted commit; returns bucket -> new relative file
    * paths. The files are DURABLE when this returns on `file:` (each file
    * force()d + its directory entries fsynced — Spark's parquet writer
    * only close()s, which reaches the page cache): the fenced snapshot
    * commit makes these files authoritative, and by then the WAL below the
    * batch may be acked/pruned, so a power loss must not be able to tear
    * them. On HDFS the pipeline ack on close is the durability barrier
    * (dfs.datanode.synconclose for strict power-loss guarantees); on
    * object stores the PUT is atomic — visible means whole. */
  def writeBucketed(df: DataFrame, commitDir: String): Map[Int, Seq[String]] =
    writeBucketedSized(df, commitDir)._1

  /** [[writeBucketed]] plus each file's byte size, read from the SAME
    * commit-listing FileStatus objects (zero extra IO) — the snapshot
    * records them to drive size-tiered compaction. */
  def writeBucketedSized(df: DataFrame,
      commitDir: String): (Map[Int, Seq[String]], Map[String, Long]) = {
    val outPath = s"$root/data/$commitDir"
    df.write.partitionBy("_bucket").option("compression", compressionCodec)
      .mode("overwrite").parquet(outPath)
    val base = new HPath(dataDir, commitDir)
    val sizes = scala.collection.mutable.Map.empty[String, Long]
    val byBucket = fs.listStatus(base).toSeq
      .filter(_.getPath.getName.startsWith("_bucket="))
      .map { st =>
        val b = st.getPath.getName.stripPrefix("_bucket=").toInt
        val names = fs.listStatus(st.getPath).toSeq
          .filter(f => f.getPath.getName.endsWith(".parquet"))
          .map { f =>
            val rel = s"data/$commitDir/_bucket=$b/${f.getPath.getName}"
            sizes(rel) = f.getLen
            rel
          }
          .sorted
        b -> names
      }.toMap
    if (isLocalFs) {
      byBucket.values.flatten.foreach { rel =>
        val ch = FileChannel.open(localFile(new HPath(rootPath, rel)),
          StandardOpenOption.WRITE)
        try ch.force(true) finally ch.close()
        // LocalFileSystem writes a .crc checksum sibling per file; left
        // page-cache-only it can come back torn after a power loss and
        // every read then fails with ChecksumException — the exact wedge
        // the parquet force above exists to prevent
        val lf = localFile(new HPath(rootPath, rel))
        val crc = lf.getParent.resolve("." + lf.getFileName.toString + ".crc")
        if (Files.exists(crc)) {
          val cch = FileChannel.open(crc, StandardOpenOption.WRITE)
          try cch.force(true) finally cch.close()
        }
      }
      byBucket.keys.foreach(b =>
        fsyncDir(localFile(new HPath(base, s"_bucket=$b"))))
      fsyncDir(localFile(base))
      fsyncDir(localFile(dataDir))
    }
    (byBucket, sizes.toMap)
  }
}

class CommitConflictException(msg: String) extends RuntimeException(msg)

object LakeTable {
  /** Schemes whose FileSystem "rename" is client-side copy+delete with
    * last-writer-wins visibility — the HDFS atomic fail-if-exists contract
    * does not hold there, so commit fencing defaults to conditional-put
    * (the FileSystem must map create(overwrite=false) to an atomic
    * conditional write: S3 If-None-Match [Hadoop 3.4.1+ S3A],
    * GCS if-generation-match, ABFS ETag create). */
  val ObjectStoreSchemes: Set[String] = Set(
    "s3", "s3a", "s3n", "gs", "oss", "cos", "obs",
    "wasb", "wasbs", "abfs", "abfss", "swift")

  /** The PARTIAL-UPDATE streaming fold behind [[LakeTable.mergedViewLocal]]
    * — executor-side, so it lives on the companion (a nested def or
    * anonymous class inside the instance method would capture the
    * non-serializable table as `$outer`). Input: one partition's rows
    * sorted (key ASC, _lsn DESC, _seq DESC), each carrying `_cols` (the
    * columns its tuple actually CARRIED; null = all, i.e. base/full rows)
    * and `_barrier` (insert/delete/base — coalescing must not walk past
    * it). Output: one live row per key, every column resolved to its
    * latest carried value within the barrier window. */
  private[lake] def partialOverlayFold(
      it: Iterator[org.apache.spark.sql.Row],
      kIdx: Array[Int], kindIdx: Int, colsIdx: Int, barIdx: Int,
      dataIdx: Array[Int], nameOf: Array[String],
      full: StructType): Iterator[org.apache.spark.sql.Row] = {
    type R = org.apache.spark.sql.Row
    val bit = it.buffered
    def keyOf(r: R): Seq[Any] = kIdx.toSeq.map(r.get)
    def presentIn(r: R, fi: Int): Boolean =
      r.isNullAt(colsIdx) || r.getSeq[String](colsIdx).contains(nameOf(fi))
    def barrierOf(r: R): Boolean = r.isNullAt(barIdx) || r.getBoolean(barIdx)
    new Iterator[Option[R]] {
      override def hasNext: Boolean = bit.hasNext
      override def next(): Option[R] = {
        val head = bit.next()
        val k = keyOf(head)
        if (head.getString(kindIdx) == "delete") {
          while (bit.hasNext && keyOf(bit.head) == k) bit.next()
          None
        } else {
          val vals = Array.tabulate(full.size)(head.get)
          var missing = dataIdx.toList.filterNot(presentIn(head, _))
          var stop = barrierOf(head)
          while (bit.hasNext && keyOf(bit.head) == k) {
            val r = bit.next()
            if (!stop) {
              if (r.getString(kindIdx) != "delete" && missing.nonEmpty) {
                val (found, still) = missing.partition(presentIn(r, _))
                found.foreach(fi => vals(fi) = r.get(fi))
                missing = still
              }
              if (barrierOf(r)) stop = true
            }
          }
          Some(new org.apache.spark.sql.catalyst.expressions
            .GenericRowWithSchema(vals, full))
        }
      }
    }.flatten
  }

  private val SnapshotRe = "snapshot-(\\d+)\\.json".r
  // feed-log index segment covering snapshot ids [first, last], inclusive
  private val FeedLogRe = "feedlog-(\\d+)-(\\d+)\\.json".r
  /** Batched-lookup residual filter: OR-of-conjunctions up to this many
    * keys (pushdown-friendly), broadcast semi join above (bounded plan). */
  val lookupPredicateKeys = 64

  /** SHARED daemon pool for driver-side metadata IO fan-out (manifest and
    * snapshot-root fetches). Cached: threads appear on demand up to each
    * call's own `width` bound, are reused across calls, and retire after
    * 60 s idle — a point-read service issuing thousands of batched lookups
    * per second must not pay pool construction + thread spawn + teardown
    * per request. Daemon threads: metadata IO never blocks JVM exit. */
  private[lake] lazy val metaPool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newCachedThreadPool(
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger(0)
        override def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-meta-io-${n.getAndIncrement()}")
          t.setDaemon(true); t
        }
      })

  private val mapper = new ObjectMapper()

  private type JsonNode = com.fasterxml.jackson.databind.JsonNode

  private def objToMap(n: ObjectNode, field: String): Map[String, JsonNode] =
    Option(n.get(field)).map { o =>
      o.fieldNames().asScala.map(k => k -> o.get(k)).toMap
    }.getOrElse(Map.empty)

  private def putStrSeq(n: ObjectNode, field: String, v: Seq[String]): Unit = {
    val arr = n.putArray(field); v.foreach(arr.add)
  }
  private def strSeq(v: JsonNode): Seq[String] =
    v.elements().asScala.map(_.asText()).toSeq

  private def putFileStats(n: ObjectNode, field: String,
      stats: Map[String, Map[String, (String, String)]]): Unit = {
    val fsNode = n.putObject(field)
    stats.toSeq.sortBy(_._1).foreach { case (file, perCol) =>
      val o = fsNode.putObject(file)
      perCol.toSeq.sortBy(_._1).foreach { case (c, (lo, hi)) =>
        val a = o.putArray(c); a.add(lo); a.add(hi)
      }
    }
  }
  private def fileStatsOf(n: ObjectNode, field: String)
      : Map[String, Map[String, (String, String)]] =
    objToMap(n, field).map { case (file, o) =>
      file -> o.properties().asScala.map { e =>
        e.getKey -> (e.getValue.get(0).asText(), e.getValue.get(1).asText())
      }.toMap
    }

  private def putLongMap(n: ObjectNode, field: String, m: Map[String, Long]): Unit = {
    val o = n.putObject(field)
    m.toSeq.sorted.foreach { case (k, v) => o.put(k, v) }
  }

  /** Root fields shared by the inline and distributed snapshot forms. */
  private def rootNode(s: Snapshot): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("snapshotId", s.snapshotId)
    n.put("schemaJson", s.schema.json)
    putStrSeq(n, "keyColumns", s.keyColumns)
    n.put("nBuckets", s.nBuckets)
    n.put("lsnHighWatermark", s.lsnHighWatermark)
    if (s.partialUpdates) n.put("partialUpdates", true)
    val rm = n.putObject("renameMap")
    s.renameMap.toSeq.sorted.foreach { case (o, nn) => rm.put(o, nn) }
    putLongMap(n, "lineage", s.lineage)
    // change-feed provenance rides the ROOT in both forms: O(touched
    // buckets) small, and the feed reader then needs zero manifest IO
    if (s.commitDeltas.nonEmpty) {
      val cd = n.putObject("commitDeltas")
      s.commitDeltas.toSeq.sortBy(_._1).foreach { case (b, fs) =>
        putStrSeq(cd, b.toString, fs)
      }
    }
    n
  }

  /** Inline snapshot JSON: everything in one document (small tables). */
  def toJson(s: Snapshot): String = {
    val n = rootNode(s)
    val bf = n.putObject("bucketFiles")
    s.bucketFiles.toSeq.sortBy(_._1).foreach { case (b, fs) =>
      putStrSeq(bf, b.toString, fs)
    }
    val bw = n.putObject("bucketWatermarks")
    s.bucketWatermarks.toSeq.sortBy(_._1).foreach { case (b, w) =>
      bw.put(b.toString, w)
    }
    val bd = n.putObject("bucketDeltas")
    s.bucketDeltas.toSeq.sortBy(_._1).foreach { case (b, fs) =>
      putStrSeq(bd, b.toString, fs)
    }
    val bl = n.putObject("bucketLineage")
    s.bucketLineage.toSeq.sortBy(_._1).foreach { case (b, m) =>
      putLongMap(bl, b.toString, m)
    }
    putFileStats(n, "fileStats", s.fileStats)
    putLongMap(n, "fileBytes", s.fileBytes)
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(n)
  }

  /** Distributed snapshot root: O(buckets) pointers instead of O(files)
    * inline maps; per-bucket state lives in the pointed-to manifests. */
  def toRootJson(s: Snapshot): String = {
    require(s.bucketManifests.keySet == s.manifestBuckets,
      "every bucket with state needs a manifest pointer")
    val n = rootNode(s)
    val bm = n.putObject("bucketManifests")
    s.bucketManifests.toSeq.sortBy(_._1).foreach { case (b, p) =>
      bm.put(b.toString, p)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(n)
  }

  def manifestToJson(m: BucketManifest): String = {
    val n = mapper.createObjectNode()
    putStrSeq(n, "files", m.files)
    putStrSeq(n, "deltas", m.deltas)
    m.watermark.foreach(n.put("watermark", _))
    putLongMap(n, "lineage", m.lineage)
    putFileStats(n, "fileStats", m.fileStats)
    putLongMap(n, "fileBytes", m.fileBytes)
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(n)
  }

  def manifestFromJson(json: String): BucketManifest = {
    val n = mapper.readTree(json).asInstanceOf[ObjectNode]
    BucketManifest(
      files = strSeq(n.get("files")),
      deltas = strSeq(n.get("deltas")),
      watermark = Option(n.get("watermark")).map(_.asLong()),
      lineage = objToMap(n, "lineage").map { case (k, v) => k -> v.asLong() },
      fileStats = fileStatsOf(n, "fileStats"),
      fileBytes = objToMap(n, "fileBytes").map { case (k, v) => k -> v.asLong() })
  }

  /** Parse ONLY the root document: the root-level fields plus, when the
    * snapshot is in distributed form, the bucket-manifest pointer map
    * (None = inline form; the caller has the full document already). */
  def parseRootOnly(json: String): (Snapshot, Option[Map[Int, String]]) = {
    val n = mapper.readTree(json).asInstanceOf[ObjectNode]
    val base = Snapshot(
      snapshotId = n.get("snapshotId").asLong(),
      schema = DataType.fromJson(n.get("schemaJson").asText()).asInstanceOf[StructType],
      keyColumns = strSeq(n.get("keyColumns")),
      nBuckets = n.get("nBuckets").asInt(),
      bucketFiles = Map.empty,
      bucketWatermarks = Map.empty,
      lsnHighWatermark = n.get("lsnHighWatermark").asLong(),
      renameMap = objToMap(n, "renameMap").map { case (k, v) => k -> v.asText() },
      lineage = objToMap(n, "lineage").map { case (k, v) => k -> v.asLong() },
      commitDeltas = objToMap(n, "commitDeltas").map { case (k, v) =>
        k.toInt -> strSeq(v)
      },
      // pre-upgrade snapshots lack the field: full-tuple semantics
      partialUpdates = Option(n.get("partialUpdates")).exists(_.asBoolean()))
    val pointers =
      if (!n.has("bucketManifests")) None
      else Some(objToMap(n, "bucketManifests")
        .map { case (b, v) => b.toInt -> v.asText() })
    (base, pointers)
  }

  /** Parse either snapshot form; the distributed form resolves its bucket
    * manifests through `loadMeta` (relative path -> file content).
    * `only` restricts WHICH bucket manifests are resolved (a bucket-subset
    * read needs O(|subset|) metadata IO, not O(buckets)); the returned
    * snapshot is then partial — correct for reading exactly those buckets,
    * never to be committed from (an unresolved bucket's slice looks empty,
    * which would rewrite its manifest as empty). */
  def fromJson(json: String,
               loadMeta: String => String = rel =>
                 throw new IllegalStateException(
                   s"snapshot references manifest $rel but no loader was given"),
               only: Option[Set[Int]] = None)
      : Snapshot = {
    val n = mapper.readTree(json).asInstanceOf[ObjectNode]
    val (base, pointersOpt) = parseRootOnly(json)
    pointersOpt match {
      case Some(pointers) =>
        val resolve = only match {
          case Some(sel) => pointers.view.filterKeys(sel).toMap
          case None => pointers
        }
        val slices = resolve.map { case (b, rel) =>
          b -> manifestFromJson(loadMeta(rel))
        }
        base.copy(
          bucketFiles = slices.collect { case (b, m) if m.files.nonEmpty => b -> m.files },
          bucketDeltas = slices.collect { case (b, m) if m.deltas.nonEmpty => b -> m.deltas },
          bucketWatermarks = slices.collect { case (b, m) if m.watermark.isDefined => b -> m.watermark.get },
          bucketLineage = slices.collect { case (b, m) if m.lineage.nonEmpty => b -> m.lineage },
          fileStats = slices.values.flatMap(_.fileStats).toMap,
          fileBytes = slices.values.flatMap(_.fileBytes).toMap,
          bucketManifests = pointers)
      case None => base.copy(
      bucketFiles = objToMap(n, "bucketFiles").map { case (k, v) =>
        k.toInt -> strSeq(v)
      },
      bucketWatermarks = objToMap(n, "bucketWatermarks").map { case (k, v) =>
        k.toInt -> v.asLong()
      },
      bucketDeltas = objToMap(n, "bucketDeltas").map { case (k, v) =>
        k.toInt -> strSeq(v)
      },
      bucketLineage = objToMap(n, "bucketLineage").map { case (b, o) =>
        b.toInt -> o.fieldNames().asScala.map(k => k -> o.get(k).asLong()).toMap
      },
      fileStats = fileStatsOf(n, "fileStats"),
      fileBytes = objToMap(n, "fileBytes").map { case (k, v) => k -> v.asLong() })
    }
  }
}
