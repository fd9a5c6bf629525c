package graft.sources.replication

/**
 * Connection + security configuration for a live logical-replication
 * endpoint — the engine analog of the reference's `PostgresConfiguration`
 * (PostgresConfiguration.java:37-97): host/port/database/credentials plus
 * the SSL surface (sslmode, root cert, client cert/key, key passphrase),
 * rendered into the exact driver property set a JDBC replication
 * connection takes. Validation happens up front, before any connection is
 * opened — the same UX as the reference's CLI (CommandLineRunner.java:48-205).
 *
 * Only configuration and rendering live here; the wire protocol itself is
 * behind [[ReplicationConnector]].
 */
final case class ConnectionConfig(
    host: String,
    database: String,
    username: String,
    password: String,
    port: Int = 5432,
    sslMode: String = "disable",
    sslRootCert: Option[String] = None,
    sslCert: Option[String] = None,
    sslKey: Option[String] = None,
    sslPassword: Option[String] = None,
    minServerVersion: String = "10.3") {

  import ConnectionConfig._

  /** Fail-fast validation of the whole security surface. */
  def validate(): this.type = {
    def bad(msg: String) = throw new IllegalArgumentException(
      s"invalid connection config: $msg")
    if (host.isEmpty) bad("host must be non-empty")
    if (database.isEmpty) bad("database must be non-empty")
    if (username.isEmpty) bad("username must be non-empty")
    if (port < 1 || port > 65535) bad(s"port $port out of range 1..65535")
    if (!sslModes.contains(sslMode))
      bad(s"sslmode '$sslMode' not one of ${sslModes.mkString(", ")}")
    // verify-ca / verify-full check the server cert against a trust root:
    // meaningless without one.
    if ((sslMode == "verify-ca" || sslMode == "verify-full") && sslRootCert.isEmpty)
      bad(s"sslmode=$sslMode requires --ssl-root-cert")
    // A client cert without its private key can never complete the handshake.
    if (sslCert.nonEmpty && sslKey.isEmpty)
      bad("--ssl-cert requires --ssl-key")
    if (sslKey.nonEmpty && sslCert.isEmpty)
      bad("--ssl-key requires --ssl-cert")
    if (sslPassword.nonEmpty && sslKey.isEmpty)
      bad("--ssl-password is the key passphrase; it requires --ssl-key")
    this
  }

  /** `jdbc:postgresql://host:port/db` — the url shape a JDBC driver takes. */
  def url: String = s"jdbc:postgresql://$host:$port/$database"

  /** Properties for the plain query connection (current-LSN probes) —
    * mirrors PostgresConfiguration.getQueryConnectionProperties. */
  def queryProperties: Map[String, String] = {
    val base = Map(
      "user" -> username,
      "password" -> password,
      "assumeMinServerVersion" -> minServerVersion,
      "sslmode" -> sslMode)
    base ++
      sslRootCert.map("sslrootcert" -> _) ++
      sslCert.map("sslcert" -> _) ++
      sslKey.map("sslkey" -> _) ++
      sslPassword.map("sslpassword" -> _)
  }

  /** Properties for the replication connection: the query set plus
    * `replication=database` + simple query mode — mirrors
    * PostgresConfiguration.getReplicationProperties. */
  def replicationProperties: Map[String, String] =
    queryProperties ++ Map(
      "replication" -> "database",
      "preferQueryMode" -> "simple")
}

object ConnectionConfig {
  /** The libpq sslmode ladder (public PostgreSQL documentation). */
  val sslModes: Set[String] =
    Set("disable", "allow", "prefer", "require", "verify-ca", "verify-full")
}

/**
 * Replication-slot configuration — the analog of the reference's
 * `ReplicationConfiguration` (ReplicationConfiguration.java:31-80): slot
 * name, output plugin + its options, status-update cadence, idle
 * fast-forward interval, and the slot-busy retry budget that lets a new
 * deployment wait out the old one (PostgresConnector.java:164-215).
 */
final case class SlotConfig(
    slotName: String,
    outputPlugin: String = "wal2json",
    includeXids: Boolean = true,
    statusIntervalMs: Long = 20000L,
    idleSlotIntervalMs: Long = 300000L,
    slotBusyRetryLimit: Int = 30,
    slotBusyRetrySleepMs: Long = 30000L,
    // pgoutput only: the publication whose tables the slot streams
    // (defaults to the slot name when unset)
    publication: Option[String] = None,
    // pgoutput only: logical replication protocol version. 1 = whole
    // transactions at commit; 2 (PostgreSQL 14+) adds STREAMED in-progress
    // transactions (larger-than-memory txns ship before commit) — the
    // engine requests streaming when this is 2
    protoVersion: Int = 1,
    // wal2json only: plugin output format. 1 = one document per txn
    // (the reference's configuration); 2 = one document per ACTION
    // (B/I/U/D/C lines — large txns stream without one giant document),
    // folded back to the v1-parity envelope at the ingest boundary
    formatVersion: Int = 1,
    // the tables the pipeline CONSUMES (empty = all of them). Only used
    // to classify TRUNCATE messages at the transcoding boundary: a
    // truncate of a table NOT in a non-empty set is skipped (it cannot
    // affect the lake), while a truncate of a consumed table fails typed
    // — failing table-blind would wedge ingestion of every table over an
    // ops-table truncate the pipeline never reads
    relevantTables: Set[String] = Set.empty) {

  def validate(): this.type = {
    def bad(msg: String) = throw new IllegalArgumentException(
      s"invalid slot config: $msg")
    // Postgres replication-slot naming rule: lower-case letters, digits,
    // underscore, at most 63 bytes (public PostgreSQL documentation).
    if (!slotName.matches("[a-z0-9_]{1,63}"))
      bad(s"slot name '$slotName' must match [a-z0-9_]{1,63}")
    if (outputPlugin.isEmpty) bad("output plugin must be non-empty")
    if (statusIntervalMs <= 0) bad("status interval must be positive")
    if (idleSlotIntervalMs <= 0) bad("idle slot interval must be positive")
    if (slotBusyRetryLimit < 1) bad("slot-busy retry limit must be >= 1")
    if (slotBusyRetrySleepMs < 0) bad("slot-busy retry sleep must be >= 0")
    if (protoVersion < 1 || protoVersion > 2)
      bad(s"proto version $protoVersion not one of 1, 2")
    if (protoVersion != 1 && outputPlugin != "pgoutput")
      bad("proto version applies to the pgoutput plugin only")
    if (formatVersion < 1 || formatVersion > 2)
      bad(s"format version $formatVersion not one of 1, 2")
    if (formatVersion != 1 && outputPlugin != "wal2json")
      bad("format version applies to the wal2json plugin only")
    if (formatVersion >= 2 && !includeXids)
      bad("format-version 2 requires include-xids (the v2 fold needs the " +
        "xid on every B action)")
    if (relevantTables.exists(_.isEmpty))
      bad("relevant table names must be non-empty")
    this
  }

  /** The TRUNCATE-skip predicate the transcoders take: with a non-empty
    * consumed-table set, truncates of every OTHER table are safe to drop;
    * with an empty set every table is consumed and no truncate may pass. */
  def truncateSkippable: String => Boolean =
    t => relevantTables.nonEmpty && !relevantTables.contains(t)

  /** Plugin options sent at stream start: wal2json's include-xids
    * (matching ReplicationConfiguration.getSlotOptions), or pgoutput's
    * proto_version + publication_names (public protocol surface). */
  def slotOptions: Map[String, String] =
    if (outputPlugin == "pgoutput")
      Map("proto_version" -> protoVersion.toString,
        "publication_names" -> publication.getOrElse(slotName)) ++
        (if (protoVersion >= 2) Map("streaming" -> "on") else Map.empty)
    else Map("include-xids" -> includeXids.toString) ++
      (if (formatVersion >= 2) Map("format-version" -> "2") else Map.empty)
}
