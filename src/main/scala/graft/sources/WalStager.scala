package graft.sources

import java.nio.charset.StandardCharsets
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
 *    it), are synced, and the file is atomically renamed to its final name
 *    only at roll;
 *  - names are dense, zero-padded, strictly increasing (`wal-%09d.jsonl`),
 *    assigned at publish time; a restarted stager resumes AFTER the highest
 *    name already present, so resumed staging never collides with or
 *    reorders history;
 *  - single-writer: a colliding publish (two stagers racing on one
 *    directory) fails loudly instead of silently interleaving.
 *
 * All IO is Hadoop FS, so staging targets `file:`, `hdfs:`, or any
 * configured store directly.
 */
class WalStager(dir: String, conf: Configuration,
                rollBytes: Long = 64L * 1024 * 1024) {

  private val dirPath = new HPath(dir)
  private val fs: FileSystem = dirPath.getFileSystem(conf)
  fs.mkdirs(dirPath)

  private var nextIndex: Long = {
    val re = "wal-(\\d+)\\.jsonl".r
    val existing =
      if (!fs.exists(dirPath)) Nil
      else fs.listStatus(dirPath).toSeq.map(_.getPath.getName)
        .collect { case re(n) => n.toLong }
    existing.foldLeft(-1L)(math.max) + 1
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
    * @return the published segment name, if any */
  def roll(): Option[String] = synchronized {
    if (out == null) return None
    out.hsync() // durable before it can become visible
    out.close()
    val name = f"wal-$nextIndex%09d.jsonl"
    val target = new HPath(dirPath, name)
    val renamed =
      try fs.rename(tmpPath, target)
      catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
    if (!renamed) {
      fs.delete(tmpPath, false)
      throw new IllegalStateException(
        s"segment $name already exists — another stager is writing $dir")
    }
    nextIndex += 1
    published += 1
    out = null; tmpPath = null; bytesInSegment = 0L
    Some(name)
  }

  /** Roll any buffered lines and stop accepting appends. */
  def close(): Unit = synchronized {
    if (!closed) { roll(); closed = true }
  }
}
