package graft.sources

import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, FileAlreadyExistsException, StandardOpenOption}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, FileSystem, Path => HPath}

/**
 * Stages a LIVE stream of WAL lines into the atomic, monotonically-named
 * segment files the `graft-wal` source tails — the glue between a real
 * replication connection and the engine. This is the publish half of the
 * [[WalProvider]] contract the reference performs implicitly by holding a
 * replication slot (PostgresConnector.java:106-108 readPending loop):
 * production wiring is a loop that calls [[append]] per decoded WAL chunk
 * and [[roll]] on its flush cadence (or lets `rollBytes` auto-roll).
 *
 * Guarantees, matching what [[WalMicroBatchStream]] assumes:
 *  - a reader can NEVER observe a partial segment: lines buffer into a
 *    hidden temp file (dot-prefixed — the source's segment filter ignores
 *    it), are made durable, and the file is atomically published under its
 *    final name only at roll;
 *  - a published segment is DURABLE before [[roll]] returns — on `file:`
 *    the content is fsynced and the publish is link(2) + directory fsync
 *    (rename(2) both silently replaces an existing target and is not
 *    durable; see CLAUDE.md lesson 10) — so an ingest loop may ack the
 *    upstream replication slot the moment roll() returns;
 *  - names are strictly increasing and NEVER reused, even after
 *    `retention=delete` has emptied the directory: the next index is
 *    recorded durably in a hidden high-water file BEFORE each publish
 *    (listing-only numbering would restart at 0 once retention removed
 *    everything, publishing names below the consumer's offset — silently
 *    skipped and then pruned: permanent loss of already-acked WAL). A
 *    crash between the record and the publish leaves a harmless gap in
 *    the numbering (the source orders by NAME, not density);
 *  - single-writer: a colliding publish (two stagers racing on one
 *    directory) fails loudly instead of silently interleaving — fail-if-
 *    exists link(2) on `file:`, the FileSystem.rename contract elsewhere.
 *
 * All IO is Hadoop FS, so staging targets `file:`, `hdfs:`, or any
 * configured store directly.
 */
class WalStager(dir: String, conf: Configuration,
                rollBytes: Long = 64L * 1024 * 1024) {

  private val dirPath = new HPath(dir)
  private val fs: FileSystem = dirPath.getFileSystem(conf)
  fs.mkdirs(dirPath)
  private val isLocalFs: Boolean = fs.getScheme == "file"
  private def localFile(p: HPath): java.nio.file.Path =
    java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath)

  /** Durable record of the next index to publish (survives retention
    * emptying the listing). The index is encoded in the file NAME and the
    * file is only ever CREATED, never overwritten — directory entries are
    * atomic, so a crash can never leave a torn record. (The previous
    * content-based `.wal-stager.next` file was truncate-in-place: a crash
    * mid-rewrite left "" which silently parsed as 0, and once retention
    * had emptied the listing the stager would REUSE published names —
    * below the consumer's durable offset = permanent acked-WAL loss.) */
  private val legacyHighWaterPath = new HPath(dirPath, ".wal-stager.next")
  private def highWaterName(n: Long): String = f".wal-stager.next-$n%019d"
  private val HighWaterRe = "\\.wal-stager\\.next-(\\d+)".r

  // declared BEFORE nextIndex: its initializer assigns them (Scala runs
  // field initializers in declaration order — a later declaration would
  // reset them to their defaults)
  private var prevRecord: Long = -1L
  private var legacySwept: Boolean = false

  private var nextIndex: Long = {
    val re = "wal-(\\d+)\\.jsonl".r
    val names =
      if (!fs.exists(dirPath)) Nil
      else fs.listStatus(dirPath).toSeq.map(_.getPath.getName)
    // sweep temp files a crashed previous stager left behind (single-writer
    // by contract; a LIVE second stager is illegal and collides loudly)
    names.filter(_.startsWith(".wal-staging.tmp-"))
      .foreach(n => fs.delete(new HPath(dirPath, n), false))
    val listed = names.collect { case re(n) => n.toLong }
      .foldLeft(-1L)(math.max) + 1
    val records = names.collect { case HighWaterRe(n) => n.toLong }
    val recorded = records.foldLeft(0L)(math.max)
    // crash leftovers below the max are pruned HERE (one listing at init)
    // so the publish hot path never has to list the directory again
    records.filter(_ < recorded)
      .foreach(n => fs.delete(new HPath(dirPath, highWaterName(n)), false))
    prevRecord = if (records.nonEmpty) recorded else -1L
    // migration: a legacy content-based record may still be present. Its
    // value is trusted when parseable; unparseable content is REFUSED when
    // the listing cannot vouch for the numbering (empty dir) — silently
    // falling back to 0 is exactly the name-reuse bug.
    val legacy =
      if (!names.contains(legacyHighWaterPath.getName)) 0L
      else {
        val txt =
          try {
            val in = fs.open(legacyHighWaterPath)
            try new String(in.readAllBytes(), StandardCharsets.UTF_8).trim
            finally in.close()
          } catch { case _: java.io.IOException => "" }
        txt.toLongOption.getOrElse {
          if (listed == 0L && recorded == 0L)
            throw new IllegalStateException(
              s"$legacyHighWaterPath is unreadable and $dir lists no " +
                "segments: the next safe index is unknown. Restore the " +
                "file or remove it after verifying no consumer offset " +
                "exceeds the last published segment name.")
          0L // listing/name-record vouches for at least their max
        }
      }
    math.max(math.max(listed, recorded), legacy)
  }

  private var tmpPath: HPath = _
  private var out: FSDataOutputStream = _
  private var bytesInSegment: Long = 0L
  private var closed = false
  private var published = 0L

  /** Segments THIS stager has published (explicit rolls AND auto-rolls). */
  def publishedSegments: Long = synchronized(published)

  /** Append one WAL line (without newline) to the open segment; auto-rolls
    * when the segment reaches `rollBytes`. Not visible to readers until
    * [[roll]]. */
  def append(line: String): Unit = synchronized {
    require(!closed, "stager is closed")
    if (out == null) {
      tmpPath = new HPath(dirPath,
        s".wal-staging.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      out = fs.create(tmpPath, false)
      bytesInSegment = 0L
    }
    val bytes = (line + "\n").getBytes(StandardCharsets.UTF_8)
    out.write(bytes)
    bytesInSegment += bytes.length
    if (bytesInSegment >= rollBytes) roll()
  }

  /** Publish the buffered lines as the next segment (no-op when empty).
    * The segment is durable when this returns. @return the name, if any */
  def roll(): Option[String] = synchronized {
    if (out == null) return None
    out.hsync() // durable on stores with a real Syncable implementation
    out.close()
    // Record the claimed index BEFORE the segment becomes visible: a crash
    // in between leaves a gap, never a reused name.
    recordHighWater(nextIndex + 1)
    val name = f"wal-$nextIndex%09d.jsonl"
    val target = new HPath(dirPath, name)
    if (isLocalFs) {
      // ChecksumFileSystem's local output stream is not Syncable — hsync
      // degraded to a flush — so force the content to disk for real, then
      // publish with the one POSIX primitive that is atomic AND fails on
      // an existing target, then make the directory entry durable.
      val ltmp = localFile(tmpPath)
      val ch = FileChannel.open(ltmp, StandardOpenOption.WRITE)
      try ch.force(true) finally ch.close()
      try Files.createLink(localFile(target), ltmp)
      catch {
        case _: FileAlreadyExistsException =>
          fs.delete(tmpPath, false)
          out = null; tmpPath = null
          throw new IllegalStateException(
            s"segment $name already exists — another stager is writing $dir")
      }
      fs.delete(tmpPath, false) // also removes the .crc sibling
      fsyncDir(localFile(dirPath))
    } else {
      // FileSystem.rename contract: atomic, fails when the target exists
      // (HDFS enforces this in the NameNode).
      val renamed =
        try fs.rename(tmpPath, target)
        catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
      if (!renamed) {
        fs.delete(tmpPath, false)
        out = null; tmpPath = null
        throw new IllegalStateException(
          s"segment $name already exists — another stager is writing $dir")
      }
    }
    nextIndex += 1
    published += 1
    out = null; tmpPath = null; bytesInSegment = 0L
    Some(name)
  }

  /** Persist the next publishable index as a CREATE-only, name-encoded
    * record: the directory entry either exists with the full value in its
    * name or does not exist at all — no write can tear it. The PREVIOUS
    * record (tracked in memory — no per-roll directory listing) and the
    * legacy content file are pruned only AFTER the new record's directory
    * entry is durable; a crash in between leaves an extra record, and the
    * reader takes the max (pruning leftovers at the next init). */
  private def recordHighWater(next: Long): Unit = {
    val p = new HPath(dirPath, highWaterName(next))
    try fs.create(p, false).close() // empty content: the name IS the value
    catch { case _: java.io.IOException if fs.exists(p) => () } // idempotent
    if (isLocalFs) fsyncDir(localFile(dirPath))
    if (prevRecord >= 0 && prevRecord < next)
      fs.delete(new HPath(dirPath, highWaterName(prevRecord)), false)
    prevRecord = next
    if (!legacySwept) { fs.delete(legacyHighWaterPath, false); legacySwept = true }
  }

  /** Make a new directory entry durable (best-effort where unsupported). */
  private def fsyncDir(d: java.nio.file.Path): Unit =
    try {
      val ch = FileChannel.open(d, StandardOpenOption.READ)
      try ch.force(true) finally ch.close()
    } catch { case _: Exception => () }

  /** Roll any buffered lines and stop accepting appends. */
  def close(): Unit = synchronized {
    if (!closed) { roll(); closed = true }
  }
}
