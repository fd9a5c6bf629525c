package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable per-group state of [[OverlayKeepLast]]: the latest version's
  * identity plus, per column, the latest version AT WHICH THE COLUMN WAS
  * PRESENT. Present-with-null (an explicit SQL NULL in the tuple) and
  * absent (the column was not in the message at all — an unchanged-TOAST
  * omission) are distinct states: the former records a null value, the
  * latter records nothing. */
final class OverlayColV(var lsn: Long, var seq: Int,
                        var value: String, var vtype: String)

final class OverlayBuffer {
  var topLsn: Long = Long.MinValue
  var topSeq: Int = Int.MinValue
  var topKind: String = _ // null = empty buffer
  var hasBarrier: Boolean = false
  var barLsn: Long = Long.MinValue
  var barSeq: Int = Int.MinValue
  val cols: mutable.HashMap[String, OverlayColV] = mutable.HashMap.empty

  def isLater(l: Long, s: Int, bl: Long, bs: Int): Boolean =
    l > bl || (l == bl && s > bs)
}

/**
 * PARTIAL-UPDATE keep-last: the column-wise generalization of
 * `max_by(row, (lsn, seq))` for change streams whose UPDATE tuples may
 * OMIT columns — PostgreSQL logical decoding does not re-send an
 * unchanged TOASTed value (wal2json drops the column from `columnnames`;
 * pgoutput sends an explicit 'u' marker the transcoder likewise omits,
 * reference behavior: wal2json README "unchanged toast datum"). A
 * whole-row keep-last would replace the stored row with the partial
 * tuple and silently NULL the very column TOAST exists for — the large
 * `content` of a source-file row is exactly what Postgres TOASTs.
 *
 * Semantics per group (one primary key):
 *  - `lsn/seq/kind` of the result = those of the LATEST version (the same
 *    winner `max_by` picks);
 *  - the result `_row`/`_types` maps hold, per column, the value from the
 *    latest version IN WHICH THAT COLUMN WAS PRESENT — but never from a
 *    version older than the latest BARRIER (a version with `barrier`
 *    true: inserts and deletes, which DEFINE the whole row rather than
 *    patch it; a resurrected key must not inherit columns from its dead
 *    predecessor);
 *  - `_barrier` reports whether the collapsed window contained a barrier,
 *    so a DOWNSTREAM overlay (the merge-on-read read path folding this
 *    delta against older deltas and base rows) knows whether to keep
 *    coalescing past this collapsed row.
 *
 * Why an aggregate and not a window/sort: the per-column argmax is a
 * commutative, associative semilattice, so Spark's partial aggregation
 * (ObjectHashAggregate) collapses hot keys map-side before the shuffle —
 * the identical skew story the max_by dedup relies on at 10^10 events.
 */
case class OverlayKeepLast(
    lsn: Expression, seq: Expression, kind: Expression,
    row: Expression, types: Expression, barrier: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[OverlayBuffer] {

  override def children: Seq[Expression] =
    Seq(lsn, seq, kind, row, types, barrier)

  override def nullable: Boolean = true
  override def prettyName: String = "overlay_keep_last"

  override def dataType: DataType = OverlayKeepLast.resultType

  override def createAggregationBuffer(): OverlayBuffer = new OverlayBuffer

  override def update(buf: OverlayBuffer, input: InternalRow): OverlayBuffer = {
    val l = lsn.eval(input)
    if (l == null) return buf // no position, no event
    val lv = l.asInstanceOf[Long]
    val sv = seq.eval(input) match {
      case null => Int.MinValue
      case x => x.asInstanceOf[Int]
    }
    val kv = kind.eval(input) match {
      case null => "update"
      case k => k.toString
    }
    if (buf.topKind == null || buf.isLater(lv, sv, buf.topLsn, buf.topSeq)) {
      buf.topLsn = lv; buf.topSeq = sv; buf.topKind = kv
    }
    val isBar = barrier.eval(input) match {
      case null => kv != "update" // absent flag (pre-upgrade delta rows):
                                  // inserts/deletes define, updates patch
      case b => b.asInstanceOf[Boolean]
    }
    if (isBar && (!buf.hasBarrier || buf.isLater(lv, sv, buf.barLsn, buf.barSeq))) {
      buf.hasBarrier = true; buf.barLsn = lv; buf.barSeq = sv
    }
    val rm = row.eval(input).asInstanceOf[MapData]
    if (rm != null) {
      val tm = types.eval(input).asInstanceOf[MapData]
      val rk = rm.keyArray(); val rv = rm.valueArray()
      // _row and _types are built from the same columnnames array
      // (map_from_arrays), so they align positionally; verify the key and
      // fall back to a scan if a caller ever passes differently-shaped maps.
      val tAligned = tm != null && tm.numElements() == rm.numElements()
      var i = 0
      val n = rm.numElements()
      while (i < n) {
        val name = rk.getUTF8String(i).toString
        val cur = buf.cols.getOrElse(name, null)
        if (cur == null || buf.isLater(lv, sv, cur.lsn, cur.seq)) {
          val value = if (rv.isNullAt(i)) null else rv.getUTF8String(i).toString
          var vtype: String = null
          if (tm != null) {
            if (tAligned && tm.keyArray().getUTF8String(i) == rk.getUTF8String(i)) {
              if (!tm.valueArray().isNullAt(i))
                vtype = tm.valueArray().getUTF8String(i).toString
            } else {
              val tk = tm.keyArray(); val tv = tm.valueArray()
              var j = 0
              while (j < tm.numElements() && vtype == null) {
                if (tk.getUTF8String(j) == rk.getUTF8String(i) && !tv.isNullAt(j))
                  vtype = tv.getUTF8String(j).toString
                j += 1
              }
            }
          }
          if (cur == null) buf.cols.update(name, new OverlayColV(lv, sv, value, vtype))
          else { cur.lsn = lv; cur.seq = sv; cur.value = value; cur.vtype = vtype }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: OverlayBuffer, b2: OverlayBuffer): OverlayBuffer = {
    if (b2.topKind == null) return b1
    if (b1.topKind == null || b1.isLater(b2.topLsn, b2.topSeq, b1.topLsn, b1.topSeq)) {
      b1.topLsn = b2.topLsn; b1.topSeq = b2.topSeq; b1.topKind = b2.topKind
    }
    if (b2.hasBarrier &&
        (!b1.hasBarrier || b1.isLater(b2.barLsn, b2.barSeq, b1.barLsn, b1.barSeq))) {
      b1.hasBarrier = true; b1.barLsn = b2.barLsn; b1.barSeq = b2.barSeq
    }
    b2.cols.foreach { case (name, c2) =>
      val c1 = b1.cols.getOrElse(name, null)
      if (c1 == null) b1.cols.update(name, c2)
      else if (b1.isLater(c2.lsn, c2.seq, c1.lsn, c1.seq)) {
        c1.lsn = c2.lsn; c1.seq = c2.seq; c1.value = c2.value; c1.vtype = c2.vtype
      }
    }
    b1
  }

  override def eval(buf: OverlayBuffer): Any = {
    if (buf.topKind == null) return null
    // Entries older than the latest barrier belong to a PREVIOUS
    // incarnation of the key (pre-delete, or pre-full-redefinition) — a
    // barrier's own entries (same ord) survive.
    val kept = buf.cols.iterator.filter { case (_, c) =>
      !buf.hasBarrier || !buf.isLater(buf.barLsn, buf.barSeq, c.lsn, c.seq)
    }.toArray.sortBy(_._1)
    val keys = new GenericArrayData(
      kept.map(e => UTF8String.fromString(e._1)): Array[Any])
    val vals = new GenericArrayData(kept.map { e =>
      if (e._2.value == null) null else UTF8String.fromString(e._2.value)
    }: Array[Any])
    val typs = new GenericArrayData(kept.map { e =>
      if (e._2.vtype == null) null else UTF8String.fromString(e._2.vtype)
    }: Array[Any])
    InternalRow(buf.topLsn, buf.topSeq, UTF8String.fromString(buf.topKind),
      new ArrayBasedMapData(keys, vals), new ArrayBasedMapData(keys, typs),
      buf.hasBarrier)
  }

  // writeUTF's 64 KB ceiling disqualifies it: a TOASTed column VALUE is
  // exactly the multi-megabyte case this aggregate exists for.
  private def writeStr(out: DataOutputStream, s: String): Unit =
    if (s == null) out.writeInt(-1)
    else {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
    }
  private def readStr(in: DataInputStream): String = {
    val n = in.readInt()
    if (n < 0) null
    else {
      val b = new Array[Byte](n); in.readFully(b)
      new String(b, java.nio.charset.StandardCharsets.UTF_8)
    }
  }

  override def serialize(buf: OverlayBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.topLsn); out.writeInt(buf.topSeq); writeStr(out, buf.topKind)
    out.writeBoolean(buf.hasBarrier)
    out.writeLong(buf.barLsn); out.writeInt(buf.barSeq)
    out.writeInt(buf.cols.size)
    buf.cols.foreach { case (name, c) =>
      writeStr(out, name)
      out.writeLong(c.lsn); out.writeInt(c.seq)
      writeStr(out, c.value); writeStr(out, c.vtype)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): OverlayBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new OverlayBuffer
    buf.topLsn = in.readLong(); buf.topSeq = in.readInt(); buf.topKind = readStr(in)
    buf.hasBarrier = in.readBoolean()
    buf.barLsn = in.readLong(); buf.barSeq = in.readInt()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val name = readStr(in)
      val lsn = in.readLong(); val seq = in.readInt()
      val value = readStr(in); val vtype = readStr(in)
      buf.cols.update(name, new OverlayColV(lsn, seq, value, vtype))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): OverlayKeepLast =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OverlayKeepLast =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): OverlayKeepLast =
    copy(lsn = newChildren(0), seq = newChildren(1), kind = newChildren(2),
      row = newChildren(3), types = newChildren(4), barrier = newChildren(5))
}

object OverlayKeepLast {
  val resultType: StructType = StructType(Seq(
    StructField("lsn", LongType),
    StructField("seq", IntegerType),
    StructField("kind", StringType),
    StructField("_row", MapType(StringType, StringType)),
    StructField("_types", MapType(StringType, StringType)),
    StructField("_barrier", BooleanType)))

  /** Register `overlay_keep_last` in the session's function registry
    * (idempotent); the analyzer wraps the raw AggregateFunction. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "overlay_keep_last",
      exprs => OverlayKeepLast(exprs(0), exprs(1), exprs(2), exprs(3),
        exprs(4), exprs(5)),
      "built-in")

  /** Column form: aggregate `(lsn, seq, kind, row, types, barrier)` rows
    * to the overlay keep-last struct (see class doc). */
  def overlayKeepLast(spark: org.apache.spark.sql.SparkSession,
                      lsn: Column, seq: Column, kind: Column,
                      row: Column, types: Column, barrier: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("overlay_keep_last",
      lsn, seq, kind, row, types, barrier)
  }
}
