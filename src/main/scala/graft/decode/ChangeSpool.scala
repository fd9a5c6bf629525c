package graft.decode

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/**
 * Per-transaction buffer of rendered wal2json change fragments for a
 * STREAMED (pgoutput protocol v2) in-progress transaction.
 *
 * Streaming exists precisely so transactions larger than memory can be
 * shipped before they commit; N of them can be in flight concurrently.
 * This buffer therefore holds changes on the heap only up to
 * `spillThresholdBytes`, then spills everything to a private temp file and
 * appends there — the ingest boundary's memory is bounded by
 * O(threshold × concurrent-streamed-txns), not by transaction size.
 * (The committed wal2json LINE still materializes once at Stream Commit —
 * [[changes]] returns an iterator so a future writer can stream it out
 * instead.)
 *
 * Subtransaction aborts are ROLLBACK TO SAVEPOINT: everything from the
 * aborted subxid's FIRST change onward is discarded — later changes
 * necessarily ran inside that subtransaction or one nested in it, exactly
 * the spool-file truncation PostgreSQL's own apply worker performs
 * (public `worker.c` stream_abort semantics).
 */
final class ChangeSpool(spillThresholdBytes: Long) extends AutoCloseable {

  // pre-spill state: parallel arrays of change JSON + its (sub)xid
  private val memChanges = mutable.ArrayBuffer.empty[String]
  private val memSubXids = mutable.ArrayBuffer.empty[Long]
  private var memBytes = 0L // approximate (chars, not UTF-8 bytes) — a
                            // spill threshold, not an accounting ledger

  // post-spill state: length-prefixed UTF-8 entries in a temp file
  private var file: RandomAccessFile = null
  private var path: java.nio.file.Path = null
  private var fileCount = 0L
  /** first (fileOffset, entryOrdinal) per subxid, in offset order. */
  private val fileMarks = mutable.LinkedHashMap.empty[Long, (Long, Long)]

  def spilled: Boolean = file != null
  def count: Long = if (spilled) fileCount else memChanges.length.toLong
  def isEmpty: Boolean = count == 0L

  def append(subXid: Long, change: String): Unit =
    if (!spilled) {
      memChanges += change
      memSubXids += subXid
      memBytes += change.length + 1L
      if (memBytes > spillThresholdBytes) spill()
    } else writeEntry(subXid, change)

  private def spill(): Unit = {
    path = java.nio.file.Files.createTempFile("graft-stream-spool-", ".bin")
    file = new RandomAccessFile(path.toFile, "rw")
    var i = 0
    while (i < memChanges.length) {
      writeEntry(memSubXids(i), memChanges(i)); i += 1
    }
    memChanges.clear(); memSubXids.clear(); memBytes = 0L
  }

  private def writeEntry(subXid: Long, change: String): Unit = {
    if (!fileMarks.contains(subXid))
      fileMarks(subXid) = (file.getFilePointer, fileCount)
    val b = change.getBytes(StandardCharsets.UTF_8)
    file.writeInt(b.length)
    file.write(b)
    fileCount += 1
  }

  /** Discard every change from `subXid`'s first change onward (no-op when
    * the subtransaction wrote nothing). */
  def truncateFrom(subXid: Long): Unit =
    if (!spilled) {
      val i = memSubXids.indexOf(subXid)
      if (i >= 0) {
        memChanges.remove(i, memChanges.length - i)
        memSubXids.remove(i, memSubXids.length - i)
        memBytes = memChanges.iterator.map(_.length + 1L).sum
      }
    } else fileMarks.get(subXid).foreach { case (off, ordinal) =>
      file.setLength(off)
      file.seek(off)
      fileCount = ordinal
      // marks are offset-ordered: drop this one and everything after it
      val keep = fileMarks.takeWhile(_._1 != subXid).toSeq
      fileMarks.clear(); fileMarks ++= keep
    }

  /** The surviving changes in arrival order; reads back from the spill
    * file when spilled (single forward pass). */
  def changes(): Iterator[String] =
    if (!spilled) memChanges.iterator
    else {
      file.seek(0L)
      new Iterator[String] {
        private var remaining = fileCount
        override def hasNext: Boolean = remaining > 0
        override def next(): String = {
          val len = file.readInt()
          val b = new Array[Byte](len)
          file.readFully(b)
          remaining -= 1
          new String(b, StandardCharsets.UTF_8)
        }
      }
    }

  /** Releases the spill file (if any); the spool is unusable afterwards. */
  override def close(): Unit = {
    if (file != null) {
      try file.close() catch { case _: Exception => () }
      try { java.nio.file.Files.deleteIfExists(path); () }
      catch { case _: Exception => () }
      file = null
    }
    memChanges.clear(); memSubXids.clear(); memBytes = 0L
  }
}
