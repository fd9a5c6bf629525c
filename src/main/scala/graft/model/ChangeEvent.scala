package graft.model

import org.apache.spark.sql.types._

/**
 * Data model for the CDC engine: the wal2json-style change-event envelope,
 * re-expressed as Spark Catalyst schemas and typed case classes.
 *
 * Semantics derive from the reference's Jackson model
 * (reference: src/main/java/com/disneystreaming/pg2k4j/models/SlotMessage.java:33-56,
 * Change.java:36-62, InsertChange.java:33-70, UpdateChange.java:33-62,
 * DeleteChange.java:34-68, OldKeys.java:34-74):
 *
 *  - a transaction envelope `SlotMessage(xid, change[])`, with `xid` 64-bit;
 *  - each `Change` is one row mutation with `kind in {insert, update, delete}`,
 *    `schema`, `table`, and a row encoded as three parallel arrays
 *    (columnnames / columntypes / columnvalues);
 *  - update/delete additionally identify the affected row via `oldkeys`
 *    (keynames / keytypes / keyvalues parallel arrays).
 *
 * Instead of a polymorphic class hierarchy, we use a single wide struct with
 * nullable fields and discriminate on `kind` with column predicates — the
 * Spark-native equivalent of Jackson's @JsonTypeInfo dispatch.
 *
 * Column values are carried as strings (wal2json emits dynamically-typed JSON
 * scalars; keeping them as their text form is lossless and keeps the schema
 * static for Catalyst). Typed materialization happens at apply time against
 * the target table's schema.
 */
object Wal2Json {

  val oldKeysSchema: StructType = StructType(Seq(
    StructField("keynames", ArrayType(StringType, containsNull = false)),
    StructField("keytypes", ArrayType(StringType, containsNull = false)),
    StructField("keyvalues", ArrayType(StringType, containsNull = true))
  ))

  val changeSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("schema", StringType),
    StructField("table", StringType),
    StructField("columnnames", ArrayType(StringType, containsNull = false)),
    StructField("columntypes", ArrayType(StringType, containsNull = false)),
    StructField("columnvalues", ArrayType(StringType, containsNull = true)),
    StructField("oldkeys", oldKeysSchema)
  ))

  /** Envelope of one decoded WAL chunk: one JSON document per committed
    * transaction (wal2json default, one chunk == one SlotMessage). */
  val slotMessageSchema: StructType = StructType(Seq(
    StructField("xid", LongType),
    StructField("change", ArrayType(changeSchema))
  ))

  /** Wire line as our WAL segments store it: the slot message plus the WAL
    * position (LSN) assigned by the log. */
  val walLineSchema: StructType =
    StructType(StructField("lsn", LongType) +: slotMessageSchema.fields)
}

/** Row-identity carried by update/delete events (primary key or replica
  * identity). Parallel arrays, as in the reference (OldKeys.java:34-74). */
case class OldKeys(
    keynames: Seq[String],
    keytypes: Seq[String],
    keyvalues: Seq[String])

/**
 * One row-level mutation, flattened out of its transaction:
 * `(lsn, seq)` totally orders events — `lsn` is the WAL position of the
 * transaction, `seq` the index of the change within it (the reference's
 * implicit List order, SlotMessage.java:36).
 */
case class ChangeEvent(
    lsn: Long,
    seq: Int,
    xid: Long,
    kind: String,
    schema: String,
    table: String,
    columnnames: Seq[String],
    columntypes: Seq[String],
    columnvalues: Seq[String],
    oldkeys: Option[OldKeys]) {

  /** By-name positional lookup, the reference's Change.getValueForColumn
    * (Change.java:80-88). Throws on unknown columns like the reference's
    * UnknownColumnNameException. */
  def valueForColumn(name: String): String = {
    val i = columnnames.indexOf(name)
    if (i < 0) throw new IllegalArgumentException(s"Unknown column name $name")
    columnvalues(i)
  }
}
