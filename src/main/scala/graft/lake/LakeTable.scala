package graft.lake

import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, FileAlreadyExistsException, StandardOpenOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/**
 * Minimal Iceberg-style table format, built natively (no Iceberg runtime in
 * this sandbox): immutable Parquet data files + JSON snapshot manifests +
 * atomic-rename commits with snapshot-id fencing.
 *
 * Layout:
 * {{{
 *   <root>/data/commit-<snapshotId>-<attempt>/_bucket=<k>/part-*.parquet
 *   <root>/meta/snapshot-<%012d>.json
 * }}}
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
 * commit writes a fully-fsynced temp file, then publishes it with
 * Files.createLink (link(2)) — the one POSIX primitive that atomically FAILS
 * with EEXIST when the target exists (rename(2)/ATOMIC_MOVE silently
 * replaces, which would let two racing committers both "win"). The loser
 * gets [[CommitConflictException]] — that is the snapshot-id fencing (the
 * transactional analog of the reference's slot-busy single-writer lock wait,
 * PostgresConnector.java:164-215). Each snapshot also records per-bucket LSN
 * high watermarks; a replayed batch whose events are all <= watermark
 * becomes a byte-identical no-op, which upgrades the reference's
 * at-least-once LSN-ack protocol (SlotReaderCallback.java:70-85,
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
    bucketLineage: Map[Int, Map[String, Long]] = Map.empty) {
  def allFiles: Seq[String] =
    (bucketFiles.values.flatten ++ bucketDeltas.values.flatten).toSeq.sorted
  /** Buckets holding any data (base or delta). */
  def dataBuckets: Set[Int] = bucketFiles.keySet ++ bucketDeltas.keySet
}

class LakeTable(val spark: SparkSession, val root: String,
                val maxDeltasPerBucket: Int = 8) {
  import LakeTable._

  private def metaDir: Path = Paths.get(root, "meta")
  private def dataDir: Path = Paths.get(root, "data")

  def exists: Boolean = Files.isDirectory(metaDir) && latestSnapshotId >= 0

  private def latestSnapshotId: Long = {
    if (!Files.isDirectory(metaDir)) return -1L
    Files.list(metaDir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case SnapshotRe(n) => n.toLong }
      .foldLeft(-1L)(math.max)
  }

  def currentSnapshot: Option[Snapshot] = latestSnapshotId match {
    case -1L => None
    case id => Some(readSnapshot(id))
  }

  def readSnapshot(id: Long): Snapshot =
    fromJson(Files.readString(metaDir.resolve(f"snapshot-$id%012d.json")))

  /** Create the table with an initial empty snapshot (idempotent — tolerates
    * "already exists" like the reference's slot creation,
    * PostgresConnector.java:80-97). */
  def create(schema: StructType, keyColumns: Seq[String], nBuckets: Int,
             renameMap: Map[String, String] = Map.empty): Snapshot = {
    Files.createDirectories(metaDir)
    Files.createDirectories(dataDir)
    currentSnapshot match {
      case Some(s) => s
      case None =>
        val s = Snapshot(0L, schema, keyColumns, nBuckets,
          Map.empty, Map.empty, Map.empty, -1L, renameMap, Map.empty)
        try commit(s, expectedSnapshotId = -1L)
        catch { case _: CommitConflictException => () } // concurrent create
        currentSnapshot.get
    }
  }

  /**
   * Atomically publish `next` as snapshot expected+1. Throws
   * [[CommitConflictException]] if another writer advanced the table —
   * caller re-reads and retries (optimistic concurrency).
   */
  def commit(next: Snapshot, expectedSnapshotId: Long): Snapshot = {
    val newId = expectedSnapshotId + 1
    if (latestSnapshotId != expectedSnapshotId)
      throw new CommitConflictException(
        s"expected snapshot $expectedSnapshotId, found $latestSnapshotId")
    val stamped = next.copy(snapshotId = newId)
    val target = metaDir.resolve(f"snapshot-$newId%012d.json")
    val tmp = metaDir.resolve(f".snapshot-$newId%012d.json.tmp-${java.util.UUID.randomUUID()}")
    writeDurable(tmp, toJson(stamped))
    // link(2) atomically fails with EEXIST if a concurrent writer published
    // first; rename(2) (Files.move ATOMIC_MOVE) would silently REPLACE the
    // winner's snapshot on POSIX — no fencing at all. A zombie driver
    // finishing a stale foreachBatch after failover must lose here.
    try Files.createLink(target, tmp)
    catch {
      case _: FileAlreadyExistsException =>
        throw new CommitConflictException(s"snapshot $newId already committed")
    } finally Files.deleteIfExists(tmp)
    fsyncDir(metaDir)
    stamped
  }

  /** Write content and fsync it before publishing (a linked-in snapshot must
    * never be visible with partial content after a crash). */
  private def writeDurable(p: Path, content: String): Unit = {
    val ch = FileChannel.open(p, StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    try {
      ch.write(java.nio.ByteBuffer.wrap(content.getBytes(StandardCharsets.UTF_8)))
      ch.force(true)
    } finally ch.close()
  }

  /** Make the new directory entry durable (best-effort: some filesystems
    * reject opening a directory for read). */
  private def fsyncDir(dir: Path): Unit =
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
    val snap = asOfSnapshot.map(readSnapshot).orElse(currentSnapshot).getOrElse(
      throw new IllegalStateException(s"no snapshot at $root"))
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
      val merged = mergedView(snap.schema, snap.keyColumns, snap.renameMap,
        withDeltas.flatMap(b => snap.bucketFiles.getOrElse(b, Nil)),
        withDeltas.flatMap(b => snap.bucketDeltas.getOrElse(b, Nil)))
      cleanDf.unionByName(merged)
    }
  }

  /**
   * Merge-on-read view: current rows = base rows (which any delta on the
   * same key supersedes — deltas pass the bucket watermark gate, so they
   * are strictly newer) unioned with delta rows, keep-last per key by
   * (lsn, seq), delete markers dropped. Used by [[read]] and by MERGE
   * compaction.
   */
  def mergedView(schema: StructType, keyColumns: Seq[String],
                 renameMap: Map[String, String],
                 baseFiles: Seq[String], deltaFiles: Seq[String]): DataFrame = {
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

  /** Read delta files (typed keys + self-describing _row/_types maps +
    * _lsn/_seq/_kind) and pivot them through `schema`: a delta written
    * before a column existed simply yields null for it, and delete markers
    * carry _row = null — the read-time half of schema evolution. */
  private def readDeltas(files: Seq[String], schema: StructType,
                         keyColumns: Seq[String]): DataFrame = {
    if (files.isEmpty) {
      val full = StructType(schema.fields ++ Seq(StructField("_lsn", LongType),
        StructField("_seq", IntegerType), StructField("_kind", StringType)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full)
    } else {
      val df = spark.read.option("mergeSchema", "true")
        .parquet(files.map(f => s"$root/$f"): _*)
      val cols = schema.fields.map { f =>
        if (keyColumns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else element_at(col("_row"), f.name).cast(f.dataType).as(f.name)
      } ++ Seq(col("_lsn"), col("_seq"), col("_kind"))
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
      var df = spark.read.option("mergeSchema", "true")
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
   * Retention maintenance: drop snapshots older than the newest `keepLast`
   * and delete data files referenced ONLY by the dropped ones (the analog
   * of Iceberg's expire_snapshots + orphan cleanup; bounds storage growth
   * from bucket-grain copy-on-write while keeping `keepLast` snapshots
   * time-travelable).
   *
   * @return (snapshots removed, data files deleted)
   */
  def expireSnapshots(keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val ids = {
      if (!Files.isDirectory(metaDir)) return (0, 0)
      Files.list(metaDir).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case SnapshotRe(n) => n.toLong }
        .toSeq.sorted
    }
    if (ids.size <= keepLast) return (0, 0)
    val (expire, keep) = ids.splitAt(ids.size - keepLast)
    val keptFiles = keep.flatMap(id => readSnapshot(id).allFiles).toSet
    val deadFiles = expire.flatMap(id => readSnapshot(id).allFiles).toSet -- keptFiles
    deadFiles.foreach(f => Files.deleteIfExists(Paths.get(root, f)))
    expire.foreach(id => Files.deleteIfExists(metaDir.resolve(f"snapshot-$id%012d.json")))
    // sweep now-empty commit directories
    if (Files.isDirectory(dataDir)) {
      Files.list(dataDir).iterator().asScala.toSeq.foreach { commitDir =>
        val subs = Files.walk(commitDir).iterator().asScala.toSeq.reverse
        subs.foreach { p =>
          if (Files.isDirectory(p) && !Files.list(p).iterator().hasNext)
            Files.deleteIfExists(p)
        }
      }
    }
    (expire.size, deadFiles.size)
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
    val p = Paths.get(root, "data", dirName)
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
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
    if (!Files.isDirectory(dataDir)) return 0
    val liveDirs = {
      val ids = Files.list(metaDir).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case SnapshotRe(n) => n.toLong }.toSeq
      ids.flatMap(id => readSnapshot(id).allFiles)
        .map(f => Paths.get(f).getName(1).toString).toSet // data/<dir>/...
    }
    val cutoff = System.currentTimeMillis() - graceMs
    val orphans = Files.list(dataDir).iterator().asScala.toSeq.filter { p =>
      !liveDirs.contains(p.getFileName.toString) &&
        Files.getLastModifiedTime(p).toMillis < cutoff
    }
    orphans.foreach(p => deleteDataDir(p.getFileName.toString))
    orphans.size
  }

  /** Write `df` (which must carry an integer `_bucket` column) as the data
    * files of an attempted commit; returns bucket -> new relative file paths. */
  def writeBucketed(df: DataFrame, commitDir: String): Map[Int, Seq[String]] = {
    val outPath = s"$root/data/$commitDir"
    df.write.partitionBy("_bucket").mode("overwrite").parquet(outPath)
    val base = Paths.get(outPath)
    Files.list(base).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("_bucket="))
      .map { p =>
        val b = p.getFileName.toString.stripPrefix("_bucket=").toInt
        val fs = Files.list(p).iterator().asScala
          .map(_.getFileName.toString)
          .filter(n => n.endsWith(".parquet"))
          .map(n => s"data/$commitDir/_bucket=$b/$n")
          .toSeq.sorted
        b -> fs
      }.toMap
  }
}

class CommitConflictException(msg: String) extends RuntimeException(msg)

object LakeTable {
  private val SnapshotRe = "snapshot-(\\d+)\\.json".r
  private val mapper = new ObjectMapper()

  def toJson(s: Snapshot): String = {
    val n = mapper.createObjectNode()
    n.put("snapshotId", s.snapshotId)
    n.put("schemaJson", s.schema.json)
    val keys = n.putArray("keyColumns"); s.keyColumns.foreach(keys.add)
    n.put("nBuckets", s.nBuckets)
    val bf = n.putObject("bucketFiles")
    s.bucketFiles.toSeq.sortBy(_._1).foreach { case (b, fs) =>
      val arr = bf.putArray(b.toString); fs.foreach(arr.add)
    }
    val bw = n.putObject("bucketWatermarks")
    s.bucketWatermarks.toSeq.sortBy(_._1).foreach { case (b, w) =>
      bw.put(b.toString, w)
    }
    val bd = n.putObject("bucketDeltas")
    s.bucketDeltas.toSeq.sortBy(_._1).foreach { case (b, fs) =>
      val arr = bd.putArray(b.toString); fs.foreach(arr.add)
    }
    n.put("lsnHighWatermark", s.lsnHighWatermark)
    val rm = n.putObject("renameMap")
    s.renameMap.toSeq.sorted.foreach { case (o, nn) => rm.put(o, nn) }
    val li = n.putObject("lineage")
    s.lineage.toSeq.sorted.foreach { case (k, v) => li.put(k, v) }
    val bl = n.putObject("bucketLineage")
    s.bucketLineage.toSeq.sortBy(_._1).foreach { case (b, m) =>
      val o = bl.putObject(b.toString)
      m.toSeq.sorted.foreach { case (k, v) => o.put(k, v) }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(n)
  }

  def fromJson(json: String): Snapshot = {
    val n = mapper.readTree(json).asInstanceOf[ObjectNode]
    def objToMap(field: String): Map[String, com.fasterxml.jackson.databind.JsonNode] =
      Option(n.get(field)).map { o =>
        o.fieldNames().asScala.map(k => k -> o.get(k)).toMap
      }.getOrElse(Map.empty)
    Snapshot(
      snapshotId = n.get("snapshotId").asLong(),
      schema = DataType.fromJson(n.get("schemaJson").asText()).asInstanceOf[StructType],
      keyColumns = n.get("keyColumns").elements().asScala.map(_.asText()).toSeq,
      nBuckets = n.get("nBuckets").asInt(),
      bucketFiles = objToMap("bucketFiles").map { case (k, v) =>
        k.toInt -> v.elements().asScala.map(_.asText()).toSeq
      },
      bucketWatermarks = objToMap("bucketWatermarks").map { case (k, v) =>
        k.toInt -> v.asLong()
      },
      bucketDeltas = objToMap("bucketDeltas").map { case (k, v) =>
        k.toInt -> v.elements().asScala.map(_.asText()).toSeq
      },
      lsnHighWatermark = n.get("lsnHighWatermark").asLong(),
      renameMap = objToMap("renameMap").map { case (k, v) => k -> v.asText() },
      lineage = objToMap("lineage").map { case (k, v) => k -> v.asLong() },
      bucketLineage = objToMap("bucketLineage").map { case (b, o) =>
        b.toInt -> o.fieldNames().asScala.map(k => k -> o.get(k).asLong()).toMap
      })
  }
}
