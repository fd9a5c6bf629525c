package graft.decode

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType
import graft.model.Wal2Json

/**
 * WAL-chunk decode stage: raw JSON lines -> flattened change events.
 *
 * Mirrors the reference's Jackson deserialization of wal2json payloads into
 * SlotMessage/Change (SlotReaderKinesisWriter.java:277-288, models/Change.java:36-43)
 * but as a single codegen'd Catalyst pipeline: `from_json` (JsonToStructs)
 * + `posexplode` for the intra-transaction sequence number. No class
 * hierarchy, no per-row reflection — kind dispatch is a column predicate.
 *
 * Strictness: the reference marks every JSON property required=true and
 * fails the connector loop on malformed payloads (SURVEY.md §1.3). Catalyst's
 * PERMISSIVE mode would null them out instead, so `decode(strict = true)`
 * raises on a payload whose required envelope fields are missing, via
 * `raise_error` guarded behind the null checks.
 */
/** A batch contained malformed WAL input — deterministic (retrying replays
  * the same bad bytes), so supervision treats it as a repair case, never a
  * transient flake. Subclasses IllegalArgumentException for compatibility
  * with callers that catch the general type. */
final class MalformedBatchException(msg: String)
  extends IllegalArgumentException(msg)

object ChangeDecoder {

  /** Message prefix carried by EVERY malformed-input failure — the in-plan
    * raise_error guards below and [[MalformedBatchException]] messages — and
    * matched by CdcPipeline.classify's text fallback. One shared constant so
    * a reworded guard cannot silently reclassify deterministic DataErrors as
    * Transient (SupervisionSpec pins the coupling). */
  val MalformedMessagePrefix = "malformed wal2json"

  /** Flattened change-event columns produced by [[decode]]. */
  val outputColumns: Seq[String] = Seq(
    "lsn", "seq", "xid", "kind", "schema", "table",
    "columnnames", "columntypes", "columnvalues", "oldkeys")

  /**
   * @param lines          one column `value: String` holding one WAL line each
   *                       (one committed transaction per line)
   * @param relevantTables if non-empty, changes to other tables are dropped —
   *                       the reference's only predicate
   *                       (SlotReaderKinesisWriter.java:281-287); empty-after-
   *                       filter transactions vanish for free because explode
   *                       emits nothing (the reference's empty-txn elision,
   *                       SlotReaderKinesisWriter.java:233)
   * @param strict         fail (like the reference) vs drop on malformed lines
   */
  private def startsWithBracket(c: Column): Column =
    // ltrim alone strips only spaces: a tab/CR-prefixed aggregate line
    // would be misrouted to the single-line parser and rejected, though
    // both parsers themselves accept any JSON whitespace
    substring(ltrim(c, " \t\r\n"), 1, 1) === "["

  /** Decoded events plus a (blocking) malformed-line counter fed by
    * `observe` metrics in the SAME plan — available after the decoded
    * DataFrame's first action, at zero extra parse cost. */
  final case class ValidatedDecode(events: DataFrame, malformedCount: () => Long)

  /**
   * Single-pass decode + validation for the pipeline's hot path: malformed
   * lines are COUNTED by CollectMetrics nodes riding the one decode pass
   * (and dropped), instead of a separate validation query that parses the
   * whole batch twice more. The caller checks `malformedCount()` after the
   * first action and before committing anything (MergeEngine's validate
   * hook), preserving the reference's required=true abort semantics
   * (SlotReaderKinesisWriter.java:145-147) while parsing each line exactly
   * once. Filters cannot pass a CollectMetrics node, so the counts always
   * see every line.
   */
  def decodeValidated(lines: DataFrame, relevantTables: Set[String] = Set.empty,
                      nativeParser: Boolean = true): ValidatedDecode = {
    val obsAgg = org.apache.spark.sql.Observation()
    val obsSingle = org.apache.spark.sql.Observation()
    val events = assemble(lines, relevantTables, strict = false, nativeParser,
      Some(obsAgg), Some(obsSingle))
    def metric(o: org.apache.spark.sql.Observation): Option[Long] =
      o.get.get("nBad").map(_.asInstanceOf[Long]) // blocks until first action
    val counter = () => (metric(obsAgg), metric(obsSingle)) match {
      case (Some(a), Some(s)) => a + s
      case _ =>
        // The executed plan lost a CollectMetrics node: AQE's empty-relation
        // propagation replaces fully-empty subtrees (and ConvertToLocal-
        // Relation statically folds LocalRelation test inputs), and
        // observedMetrics are harvested from the FINAL physical plan only.
        // This happens exactly when the batch produced no rows — rare and
        // cheap — so fall back to an explicit (re-parsing) count; a present
        // metric is always trustworthy, so the hot path stays single-parse.
        malformedCount(lines, nativeParser)
    }
    ValidatedDecode(events, counter)
  }

  def decode(lines: DataFrame, relevantTables: Set[String] = Set.empty,
             strict: Boolean = true, nativeParser: Boolean = true): DataFrame =
    assemble(lines, relevantTables, strict, nativeParser, None, None)

  private def assemble(lines: DataFrame, relevantTables: Set[String],
                       strict: Boolean, nativeParser: Boolean,
                       obsAgg: Option[org.apache.spark.sql.Observation],
                       obsSingle: Option[org.apache.spark.sql.Observation]): DataFrame = {
    // The explode(array(...)) is a deliberate Generate barrier: it forces
    // the parse to be evaluated EXACTLY ONCE per row and materialized as an
    // attribute. Without it, CollapseProject/filter-pushdown substitute the
    // parse alias into every downstream reference (the strict guard
    // alone references it 5 times), re-parsing each line 5-10x — measured
    // as a ~7x CPU blowup on the decode stages.
    // KPL-aggregation parity (reference consumer accepts a single
    // SlotMessage or an ARRAY of them per record,
    // SlotMessageRecordProcessor.java:73-82): a line starting with '[' is
    // an aggregated batch of wal lines — exploded into its elements first.
    val aggType = org.apache.spark.sql.types.ArrayType(Wal2Json.walLineSchema)
    // ONE scan of the input: a filter-split into singles/aggregates would
    // read and line-split every WAL segment twice (union of two filters
    // over the same source is two scans — Spark has no scan dedup for
    // DataFrame-composed plans). Instead each line is tagged and the
    // aggregate parse is materialized ONCE behind a Generate barrier
    // (`when` is lazy per row, so single lines never run the array parse).
    var tagged = lines
      .select(col("value"), startsWithBracket(col("value")).as("isAgg"))
      .select(col("value"), col("isAgg"),
        explode(array(when(col("isAgg"), from_json(col("value"), aggType))))
          .as("arr"))
    obsAgg.foreach(o => tagged =
      tagged.observe(o,
        count(when(col("isAgg") && col("arr").isNull, 1)).as("nBad")))
    // strict must be self-contained here too: an unparseable aggregated
    // line yields a null array, and explode(null) silently emits nothing —
    // the guard lives INSIDE the generator input so it cannot be skipped
    val arrCol =
      if (strict)
        when(col("isAgg") && col("arr").isNull,
          raise_error(concat(lit(MalformedMessagePrefix + " line: "),
            substring(col("value"), 1, 256))).cast(aggType))
          .otherwise(col("arr"))
      else col("arr")
    // aggregate elements re-enter the single path as their JSON text;
    // null elements survive `transform` as null values (counted malformed
    // downstream), matching the old explode-then-to_json granularity
    val allLines = tagged
      .select(explode(
        when(col("isAgg"), transform(arrCol, e => to_json(e)))
          .otherwise(array(col("value")))).as("value"))

    val parseExpr =
      if (nativeParser)
        graft.functions.ParseWalLine.parseWalLine(lines.sparkSession, col("value"))
      else from_json(col("value"), Wal2Json.walLineSchema)
    var parsed = allLines
      .select(col("value"), explode(array(parseExpr)).as("m"))

    val malformed = col("m").isNull || col("m.lsn").isNull ||
      col("m.xid").isNull || col("m.change").isNull
    obsSingle.foreach(o => parsed =
      parsed.observe(o, count(when(malformed, 1)).as("nBad")))

    // The strict guard must live INSIDE the generator input: Catalyst's
    // InferFiltersFromGenerate inserts IsNotNull/size>0 filters below any
    // projection, so a guard on a sibling column (or a dropped guard column)
    // would never be evaluated for a malformed row — the explode must force
    // this expression, and with it the raise_error.
    val changeCol =
      if (strict)
        when(malformed,
          raise_error(concat(lit(MalformedMessagePrefix + " line: "),
            substring(col("value"), 1, 256)))
            .cast(ArrayType(Wal2Json.changeSchema)))
          .otherwise(col("m.change"))
      else col("m.change")

    val checked0 = parsed.select(
      col("m.lsn").as("lsn"), col("m.xid").as("xid"), changeCol.as("change"))
    val checked =
      if (strict) checked0
      else checked0.filter(col("lsn").isNotNull && col("xid").isNotNull
        && col("change").isNotNull)

    val exploded = checked.select(
      col("lsn"), col("xid"),
      posexplode(col("change")).as(Seq("seq", "c")))

    val filtered =
      if (relevantTables.nonEmpty)
        exploded.filter(col("c.table").isin(relevantTables.toSeq: _*))
      else exploded

    filtered.select(
      col("lsn"), col("seq"), col("xid"),
      col("c.kind").as("kind"),
      col("c.schema").as("schema"),
      col("c.table").as("table"),
      col("c.columnnames").as("columnnames"),
      col("c.columntypes").as("columntypes"),
      col("c.columnvalues").as("columnvalues"),
      col("c.oldkeys").as("oldkeys"))
  }

  /**
   * Strict-mode validation as its own query: returns (up to `limit`)
   * previews of malformed WAL lines. The inline raise_error guard in
   * [[decode]] protects plans that evaluate the change column directly, but
   * Catalyst may legally eliminate it in larger plans (IsNotNull over a
   * NullType raise_error folds to false, and InferFiltersFromGenerate drops
   * null change arrays before any guard) — so the engine ALSO runs this
   * explicit check per batch and fails before applying anything
   * (reference parity: Jackson required=true aborts the connector loop,
   * SlotReaderKinesisWriter.java:145-147 — we fail even earlier, before any
   * partial publish).
   */
  def malformedLines(lines: DataFrame, limit: Int = 5,
                     nativeParser: Boolean = true): Array[String] =
    malformedDf(lines, nativeParser)
      .select(substring(col("value"), 1, 256))
      .take(limit)
      .map(_.getString(0))

  /** Exact malformed count via an explicit query (fallback for when
    * observe metrics are unavailable — see [[decodeValidated]]). Counts at
    * the SAME granularity as the observe path: an unparseable aggregate
    * LINE counts once, each bad ELEMENT of a parseable aggregate counts
    * once, a bad single line counts once — so the reported number cannot
    * flip depending on which internal path happened to execute. */
  def malformedCount(lines: DataFrame, nativeParser: Boolean = true): Long = {
    val parseExpr =
      if (nativeParser)
        graft.functions.ParseWalLine.parseWalLine(lines.sparkSession, col("value"))
      else from_json(col("value"), Wal2Json.walLineSchema)
    val singleBad = col("m").isNull || col("m.lsn").isNull ||
      col("m.xid").isNull || col("m.change").isNull
    val badElems = size(filter(col("arr"), e =>
      e.isNull || e.getField("lsn").isNull || e.getField("xid").isNull ||
        e.getField("change").isNull))
    lines
      .withColumn("m", parseExpr)
      .withColumn("arr", from_json(col("value"),
        org.apache.spark.sql.types.ArrayType(Wal2Json.walLineSchema)))
      .select(when(startsWithBracket(col("value")),
          when(col("arr").isNull, 1L).otherwise(badElems.cast("long")))
        .otherwise(when(singleBad, 1L).otherwise(0L)).as("nBad"))
      .agg(coalesce(sum(col("nBad")), lit(0L))).head().getLong(0)
  }

  private def malformedDf(lines: DataFrame, nativeParser: Boolean): DataFrame = {
    val parseExpr =
      if (nativeParser)
        graft.functions.ParseWalLine.parseWalLine(lines.sparkSession, col("value"))
      else from_json(col("value"), Wal2Json.walLineSchema)
    val singleBad = col("m").isNull || col("m.lsn").isNull ||
      col("m.xid").isNull || col("m.change").isNull
    // aggregated (KPL) lines are valid iff the array parses and every
    // element carries the required envelope fields
    val aggOk = col("arr").isNotNull &&
      size(filter(col("arr"), e =>
        e.isNull || e.getField("lsn").isNull || e.getField("xid").isNull ||
          e.getField("change").isNull)) === 0
    lines
      .withColumn("m", parseExpr)
      .withColumn("arr", from_json(col("value"),
        org.apache.spark.sql.types.ArrayType(Wal2Json.walLineSchema)))
      .filter(when(startsWithBracket(col("value")), !aggOk).otherwise(singleBad))
  }

  /** Per-segment malformed-line audit — the report an operator repairs
    * from before re-running a strict pipeline (`lines` must carry a
    * `_file` column identifying the segment). */
  def malformedBySegment(lines: DataFrame): DataFrame =
    malformedDf(lines, nativeParser = true)
      .groupBy(col("_file"))
      .agg(count(lit(1)).as("malformed"),
        min(substring(col("value"), 1, 120)).as("sample"))
      .orderBy("_file")

  /** The typed view the north star names: decoded change events as a
    * `Dataset[ChangeEvent]`. The engine's hot path stays columnar (the
    * typed encoder round trip costs real CPU — CLAUDE.md lesson on
    * mapPartitions over wide payloads), but library users who want
    * case-class ergonomics (pattern matching on kind, valueForColumn)
    * get them from the same decode plan. */
  def typed(decoded: DataFrame): org.apache.spark.sql.Dataset[graft.model.ChangeEvent] = {
    implicit val enc: org.apache.spark.sql.Encoder[graft.model.ChangeEvent] =
      org.apache.spark.sql.Encoders.product[graft.model.ChangeEvent]
    decoded.as[graft.model.ChangeEvent]
  }

  /**
   * Primary-key columns of a change event, as a map usable for keying:
   * insert events take the key from the new tuple; update/delete take it from
   * `oldkeys` (the reference's DeleteChange delegates columnnames/values to
   * oldkeys — DeleteChange.java:57-67 — and updates identify the old row by
   * oldkeys while carrying the new tuple).
   */
  def keyValue(keyName: String): Column = {
    val fromRow = element_at(
      map_from_arrays(col("columnnames"), col("columnvalues")), keyName)
    val fromOld = element_at(
      map_from_arrays(col("oldkeys.keynames"), col("oldkeys.keyvalues")), keyName)
    when(col("kind") === "insert", fromRow)
      .otherwise(coalesce(fromOld, fromRow))
  }

  /** Extract a named column's value from the new tuple (by-name positional
    * lookup — the reference's Change.getValueForColumn, Change.java:80-88). */
  def columnValue(name: String): Column =
    element_at(map_from_arrays(col("columnnames"), col("columnvalues")), name)
}
