package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import graft.lake.LakeTable

/**
 * Batch READ half of the `graft-lake` format: `spark.read
 * .format("graft-lake").option("path", root).load()` returns the table's
 * merged (keep-last) state as a DataFrame — the connector counterpart of
 * [[graft.lake.LakeTable.read]] — so pure-SQL / pure-DataFrame users never
 * touch the library API. `CREATE TEMPORARY VIEW t USING `graft-lake``
 * works through the same seam.
 *
 * Options:
 *   - `path` (required): table root (any Hadoop filesystem scheme)
 *   - `asOf` (optional): snapshot id — time travel over immutable snapshots
 *   - `changes` (optional, boolean): read the CHANGE DATA FEED instead of
 *     table state; with `fromSnapshot` (exclusive, default -1 = from the
 *     beginning) and `toSnapshot` (inclusive, default latest) this is the
 *     batch form of `readStream.format("graft-changes")` — output schema is
 *     the table schema plus `_lsn`, `_seq`, `_kind`, `_snapshot`
 *
 * Shape: the relation delegates to the Catalyst-planned merged view (the
 * same data-aware local/shuffle merge every other reader uses), FORWARDING
 * the scan's pruned columns and pushed filters into that inner DataFrame —
 * so key-column predicates still reach the parquet scans' PushedFilters and
 * an unreferenced column is still pruned out of ReadSchema.
 *
 * Schema freshness: the relation's schema is resolved ONCE at creation
 * (so a persistent `CREATE TEMPORARY VIEW` pins it), while each scan reads
 * the table's state as of scan time. Under additive evolution that is
 * safe — new columns simply aren't in the pinned projection; the scan's
 * select-by-name still resolves. A RENAME between view creation and scan
 * fails loudly at resolution (the pinned name no longer exists) — the same
 * fail-loud-then-recreate policy the streaming feed source uses.
 *
 * Two further freshness caveats on a CONTINUOUSLY-INGESTING table (same
 * recreate-the-view remedy): a TYPE WIDENING landing between view creation
 * and scan makes the scan produce the widened values under the pinned
 * narrower relation schema (a runtime row-conversion error, loud — never a
 * silent truncation); and two scan nodes over one relation in one query
 * (e.g. a self-join) each resolve the table's state at their own scan
 * time, so a commit landing between them can yield a torn read across the
 * two sides. Point-in-time consistency is available today by pinning
 * `asOf` explicitly (`OPTIONS (asOf '<id>')` — both scans then share one
 * snapshot); making the default path self-pin at first scan is future
 * work, noted in OPTIMIZATION_r06.md's residual list.
 *
 * The V1 relation
 * seam re-applies every filter above the scan (`unhandledFilters` default),
 * so a partially translatable predicate is forwarded best-effort and never
 * trusted for correctness. The one cost of the seam is a Row materialization
 * boundary at the relation's top edge; scans below it keep whole-stage
 * codegen, and library callers who want zero boundary keep using
 * [[graft.lake.LakeTable.read]] directly.
 */
class LakeRelation(override val sqlContext: SQLContext, table: LakeTable,
                   asOf: Option[Long]) extends DataFrameRelation {
  // ALL metadata here is LAZY and ROOT-ONLY: relation construction must be
  // free (the batch-write path returns a relation Spark discards unused),
  // and a distributed-manifest table must never pay O(buckets) manifest
  // reads just to resolve schema/stats (the lesson-18 metadata-cost class)
  // — currentSnapshotId is one directory listing, snapshotAt one root read
  // shared by schema and key columns.
  private lazy val resolvedId: Long = asOf.getOrElse(
    table.currentSnapshotId.getOrElse(throw new IllegalArgumentException(
      s"graft-lake read: no table at ${table.root} — create it first " +
        "(LakeTable.create)")))

  private lazy val rootSnap = table.snapshotAt(resolvedId)

  override def schema: StructType = rootSnap.schema

  /** Honest stats where they're cheap: an INLINE snapshot records every
    * file's bytes in the one metadata document already read, so a small
    * lake table joins as the broadcast side instead of inheriting the
    * "unknown = huge" default that forbids auto-broadcast forever. A
    * distributed-manifest table keeps the huge default — it's past the
    * size where broadcasting could ever be right, so exact stats there
    * would buy nothing for O(buckets) metadata reads. */
  // lazy + cached: planning may consult stats repeatedly; one metadata read
  private lazy val statsBytes: Option[Long] = table.inlineDataBytes(resolvedId)
  override def sizeInBytes: Long = statsBytes.getOrElse(super.sizeInBytes)

  override protected def view(): DataFrame = table.read(asOfSnapshot = asOf)

  /** POINT-LOOKUP ROUTING: a SQL `WHERE pk1 = ... AND pk2 = ...` (or IN
    * lists, up to 256 key combinations) over the connector pins every key
    * column, so the scan routes to [[graft.lake.LakeTable.lookup]] — ONE
    * job over the keys' buckets' stats-pruned files — instead of reading
    * the whole merged view and trusting parquet pushdown to skim it. At
    * 10^10 rows that is the difference between a point read and a table
    * scan. Residual/extra predicates stay safe: every filter is still
    * applied above the routed result (and Spark re-applies them above the
    * relation regardless). Time-travel reads never route — lookup serves
    * the CURRENT snapshot only. */
  override protected def scanBase(filters: Array[Filter]): DataFrame =
    (if (asOf.isEmpty) LakeRelation.pinnedKeys(filters, keyColumns) else None)
      .map(ks => table.lookup(ks))
      .getOrElse(view())

  private def keyColumns: Seq[String] = rootSnap.keyColumns
}

object LakeRelation {
  /** The key maps a filter set fully pins, if it pins ALL of `keyCols` via
    * equality / IN conjuncts: top-level filters are implicitly ANDed, Ands
    * flatten, multiple pins on one column intersect. None when any key
    * column is unpinned, an intersection is contradictory, or the cartesian
    * expansion exceeds `maxKeys` (a plan-size bound; the fallback scan is
    * always correct, routing is purely an IO optimization). Null pin values
    * never match a key and are dropped. */
  private[graft] def pinnedKeys(filters: Array[Filter], keyCols: Seq[String],
                                maxKeys: Int = 256): Option[Seq[Map[String, Any]]] = {
    if (keyCols.isEmpty) return None
    def conjuncts(f: Filter): Seq[Filter] = f match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    val flat = filters.toSeq.flatMap(conjuncts)
    val perCol: Seq[Seq[Any]] = keyCols.map { c =>
      val pins: Seq[Seq[Any]] = flat.collect {
        case EqualTo(`c`, v) if v != null       => Seq(v)
        case EqualNullSafe(`c`, v) if v != null => Seq(v)
        case In(`c`, vs)                        => vs.toSeq.filter(_ != null)
      }
      if (pins.isEmpty) Seq.empty
      else pins.map(_.distinct).reduce(_ intersect _)
    }
    // unpinned column OR contradictory pins: both look empty — don't route
    // (the fallback scan computes the [possibly empty] answer correctly)
    if (perCol.exists(_.isEmpty)) return None
    if (perCol.map(_.size.toLong).product > maxKeys) return None
    Some(keyCols.zip(perCol).foldLeft(Seq(Map.empty[String, Any])) {
      case (acc, (c, vs)) => for { m <- acc; v <- vs } yield m + (c -> v)
    })
  }
}

/** Snapshot HISTORY as a DataFrame: `option("meta", "snapshots")` — the
  * SQL face of the CLI `snapshots` command (DESCRIBE-HISTORY-shaped ops
  * visibility: id, watermark, lineage, per-commit delta counts). Newest
  * first, bounded by `limit` (default 100). Metadata is root-only — one
  * small read per retained snapshot in range, driver-side (an ops query
  * over a bounded history, not a data scan); expired ids are skipped. */
class LakeHistoryRelation(override val sqlContext: SQLContext,
                          table: LakeTable, limit: Int)
    extends DataFrameRelation {
  override val schema: StructType = LakeHistoryRelation.schema
  override protected def view(): DataFrame = {
    val spark = sqlContext.sparkSession
    val cur = table.currentSnapshotId.getOrElse(throw new IllegalArgumentException(
      s"graft-lake read: no table at ${table.root}"))
    val rows = (cur to math.max(0L, cur - limit + 1) by -1L)
      .flatMap { id =>
        // EXPIRED ids legitimately vanish from history (FileNotFound);
        // anything else — corrupt snapshot JSON, transient IO — must
        // propagate loudly, not read as "expired" (fail-loud policy; a
        // blanket Try(...).toOption silently hid real corruption here)
        try Some(table.snapshotAt(id))
        catch { case _: java.io.FileNotFoundException => None }
      }
      .map(s => org.apache.spark.sql.Row(
        s.snapshotId, s.lsnHighWatermark, s.nBuckets, s.keyColumns,
        s.renameMap, s.lineage, s.commitDeltas.values.map(_.size).sum))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), LakeHistoryRelation.schema)
  }
}

object LakeHistoryRelation {
  import org.apache.spark.sql.types._
  val schema: StructType = StructType(Seq(
    StructField("snapshot_id", LongType, nullable = false),
    StructField("high_watermark", LongType, nullable = false),
    StructField("n_buckets", IntegerType, nullable = false),
    StructField("key_columns", ArrayType(StringType), nullable = false),
    StructField("rename_map", MapType(StringType, StringType), nullable = false),
    StructField("lineage", MapType(StringType, LongType), nullable = false),
    StructField("commit_delta_files", IntegerType, nullable = false)))
}

/** Batch change-feed read: `option("changes", "true")`. Range is
  * `(fromSnapshot, toSnapshot]`, matching [[graft.lake.LakeTable.changes]]. */
class LakeFeedRelation(override val sqlContext: SQLContext, table: LakeTable,
                       fromSnapshot: Long, toSnapshot: Long)
    extends DataFrameRelation {
  override val schema: StructType = {
    val snap = table.snapshotAt(toSnapshot)
    ChangesSource.feedSchema(snap.schema, snap.partialUpdates)
  }
  override protected def view(): DataFrame =
    table.changes(fromSnapshot, toSnapshot)
}

/** A V1 relation over a computed DataFrame: prunes + filters by pushing the
  * scan's `requiredColumns`/`Filter`s into the inner (fully Catalyst-planned)
  * view, then crosses the Row boundary the V1 seam requires. */
abstract class DataFrameRelation extends BaseRelation with PrunedFilteredScan {

  protected def view(): DataFrame

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val base = scanBase(filters)
    val filtered = filters
      .flatMap(DataFrameRelation.toColumn(base, _))
      .foldLeft(base)(_.filter(_))
    // contract: exactly requiredColumns, in order (empty = count(*) shape)
    filtered.select(requiredColumns.toSeq.map(quotedCol(filtered, _)): _*).rdd
  }

  /** The DataFrame a scan starts from; subclasses may exploit the pushed
    * filters to pick a cheaper-but-equivalent source (e.g. the key-pruned
    * lookup path). Every filter is still applied on top of the result. */
  protected def scanBase(filters: Array[Filter]): DataFrame = view()

  private def quotedCol(df: DataFrame, name: String): Column =
    df.col("`" + name.replace("`", "``") + "`")
}

object DataFrameRelation {
  /** Best-effort V1 Filter -> Column translation. Untranslatable nodes
    * return None and are simply not forwarded — Spark re-evaluates every
    * filter above the relation, so this affects IO, never correctness. */
  private[graft] def toColumn(df: DataFrame, f: Filter): Option[Column] =
    toColumn(df, f, exact = false)

  /** `exact = true` (everything under a Not): best-effort WEAKENING is
    * forbidden — a weakened child negated becomes a STRONGER predicate than
    * the original filter, and rows the scan drops can never be resurrected
    * by Spark's re-application above the relation. In positive polarity a
    * weaker (superset) push is always safe. */
  private def toColumn(df: DataFrame, f: Filter, exact: Boolean): Option[Column] = {
    def c(n: String): Column = df.col("`" + n.replace("`", "``") + "`")
    f match {
      case EqualTo(a, v)            => Some(c(a) === lit(v))
      case EqualNullSafe(a, v)      => Some(c(a) <=> lit(v))
      case GreaterThan(a, v)        => Some(c(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(c(a) >= lit(v))
      case LessThan(a, v)           => Some(c(a) < lit(v))
      case LessThanOrEqual(a, v)    => Some(c(a) <= lit(v))
      case In(a, vs)                => Some(c(a).isin(vs.toSeq: _*))
      case IsNull(a)                => Some(c(a).isNull)
      case IsNotNull(a)             => Some(c(a).isNotNull)
      case StringStartsWith(a, v)   => Some(c(a).startsWith(v))
      case StringEndsWith(a, v)     => Some(c(a).endsWith(v))
      case StringContains(a, v)     => Some(c(a).contains(v))
      case And(l, r) if !exact =>
        // positive polarity: a conjunction forwards best-effort — either
        // side alone only narrows (the dropped side re-applies above)
        (toColumn(df, l, exact), toColumn(df, r, exact)) match {
          case (Some(lc), Some(rc)) => Some(lc && rc)
          case (one, other)         => one.orElse(other)
        }
      case And(l, r) => // under a Not: both sides or nothing
        for { lc <- toColumn(df, l, exact); rc <- toColumn(df, r, exact) }
          yield lc && rc
      case Or(l, r) =>
        // an Or is only forwardable if BOTH sides are (a dropped side would
        // wrongly narrow the disjunction)
        for { lc <- toColumn(df, l, exact); rc <- toColumn(df, r, exact) }
          yield lc || rc
      case Not(x) => toColumn(df, x, exact = true).map(!_)
      case _      => None
    }
  }
}
