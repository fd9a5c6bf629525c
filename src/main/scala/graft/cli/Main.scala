package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.lake.LakeTable
import graft.streaming.{CdcPipeline, TableTarget}

/**
 * spark-submit entry point — parity with the reference's CommandLineRunner
 * (CommandLineRunner.java:24-46: declared options, required-ness,
 * validation, and a --help short-circuit before any connection is opened),
 * reshaped for a lake-sink engine.
 */
object Main {

  val reposSchema: StructType = StructType(Seq(
    StructField("repo", StringType),
    StructField("path", StringType),
    StructField("commit", StringType),
    StructField("language", StringType),
    StructField("content", StringType)))

  val reposRenameMap: Map[String, String] = Map("lang" -> "language")

  /** Declared option surface per command: name -> (required, help). The
    * validator rejects unknown flags and missing required ones up front —
    * the reference's picocli-grade UX (CommandLineRunner.java:48-205). */
  private val commands: Map[String, Map[String, (Boolean, String)]] = Map(
    "gen" -> Map(
      "wal-dir" -> (true, "directory to write WAL segments into"),
      "txns" -> (true, "number of transactions to synthesize"),
      "txns-per-segment" -> (false, "transactions per segment file (default 10000)"),
      "seed" -> (false, "deterministic stream seed (default 42)"),
      "add-col-at" -> (false, "LSN at which an additive column appears"),
      "rename-at" -> (false, "LSN at which a column rename appears"),
      "tables" -> (false, "comma-separated table names for a MIXED-table stream (each change routes by repo hash; default repos)"),
      "toast-omit" -> (false, "true = updates OMIT content/size_bytes (unchanged-TOAST modeling; pair the consumer with run --partial-updates true)")),
    "run" -> Map(
      "wal-dir" -> (true, "WAL segment directory to tail"),
      "table-root" -> (true, "lake table root directory"),
      "checkpoint" -> (true, "streaming checkpoint directory"),
      "buckets" -> (false, "primary-key hash buckets (default 32)"),
      "table" -> (false, "wal2json table name to apply (default repos)"),
      "tables" -> (false, "comma-separated table names for SINGLE-PASS multi-table apply (one decode pass fanned out to one lake table per name under <table-root>/<name>; mutually exclusive with --table/--sink connector)"),
      "schema" -> (false, "table schema as SQL DDL (default: the repos schema)"),
      "keys" -> (false, "comma-separated primary-key columns (default repo,path)"),
      "partial-updates" -> (false, "true = create the table with PARTIAL-UPDATE (unchanged-TOAST) semantics: columns absent from an update keep their stored value"),
      "sink" -> (false, "foreachbatch|connector: drive the MERGE inline or through writeStream.format(\"graft-lake\") (default foreachbatch)"),
      "relevant-tables" -> (false, "comma-separated table filter (default: the --table name)"),
      "max-segments-per-trigger" -> (false, "admission control: segments per micro-batch"),
      "max-bytes-per-trigger" -> (false, "admission control: cumulative WAL bytes per micro-batch (>=1 segment always admitted)"),
      "retention" -> (false, "delete|retain consumed WAL segments (default retain)"),
      "split-bytes" -> (false, "byte-range split size for large segments (default 64MiB)"),
      "max-deltas" -> (false, "hard cap on delta files per bucket (read fan-in bound, default 64)"),
      "max-delta-bytes" -> (false, "accumulated delta bytes per bucket before compaction (size-tiered trigger, default 33554432)"),
      "inline-compaction" -> (false, "false defers ALL compaction to the standalone `compact` maintenance command: bounded per-batch apply latency, read amplification grows until maintenance runs (default true)"),
      "manifest-threshold" -> (false, "live files before the snapshot spills to per-bucket manifests (default 4096)"),
      "salt-buckets" -> (false, "two-phase salted dedup for hot keys (default off)"),
      "strict" -> (false, "true|false: abort batches with malformed lines (default true)"),
      "max-restarts" -> (false, "supervision budget for data errors/flakes (default 0 = unsupervised)")),
    "apply" -> Map(
      "wal-dir" -> (true, "WAL segment directory to backfill in ONE batch (df.write.format(\"graft-lake\").mode(\"append\") — no checkpoint; the LSN fence makes re-applies no-ops)"),
      "table-root" -> (true, "lake table root directory (created if absent)"),
      "buckets" -> (false, "primary-key hash buckets when creating (default 32)"),
      "table" -> (false, "wal2json table name to apply (default repos)"),
      "schema" -> (false, "table schema as SQL DDL when creating (default: the repos schema)"),
      "keys" -> (false, "comma-separated primary-key columns when creating (default repo,path)"),
      "max-deltas" -> (false, "hard cap on delta files per bucket (default 64)"),
      "max-delta-bytes" -> (false, "accumulated delta bytes per bucket before compaction (default 33554432)"),
      "manifest-threshold" -> (false, "live files before the snapshot spills to per-bucket manifests (default 4096)"),
      "inline-compaction" -> (false, "false defers compaction to the `compact` maintenance command (default true)"),
      "partial-updates" -> (false, "true = create the table with PARTIAL-UPDATE (unchanged-TOAST) semantics"),
      "strict" -> (false, "true|false: abort on malformed lines (default true)")),
    "show" -> Map(
      "table-root" -> (true, "lake table root directory"),
      "as-of" -> (false, "historical snapshot id (time travel)"),
      "limit" -> (false, "rows to print (default 10)")),
    "vacuum" -> Map(
      "table-root" -> (true, "lake table root directory"),
      "keep-last" -> (false, "snapshots to retain (default 5)"),
      "orphan-grace-ms" -> (false, "also sweep unreferenced data dirs older than this")),
    "rebucket" -> Map(
      "table-root" -> (true, "lake table root directory"),
      "buckets" -> (true, "new primary-key hash bucket count (table grew/shrank past its layout — one fenced full-rewrite commit; old snapshots stay readable under their own count)")),
    "compact" -> Map(
      "table-root" -> (true, "lake table root directory (folds every delta-carrying bucket to a fresh base in one fenced commit — the optimize-before-reads knob; changes no rows)")),
    "index-feed" -> Map(
      "table-root" -> (true, "lake table root directory (builds the change feed's commit-log index: a long catch-up range then resolves in O(range/segment) metadata reads instead of one snapshot-root read per commit; run with other maintenance)"),
      "segment-size" -> (false, "snapshots per index segment (default 256)")),
    "clone" -> Map(
      "source-root" -> (true, "source lake table root"),
      "target-root" -> (true, "fresh root for the clone (must not already hold a table)"),
      "as-of" -> (false, "historical snapshot id to clone (point-in-time recovery; default current)")),
    "lookup" -> Map(
      "table-root" -> (true, "lake table root directory"),
      "key" -> (true, "primary key as col=value[,col=value...] (all key columns); ';'-separate multiple keys for a one-job batched lookup")),
    "snapshots" -> Map(
      "table-root" -> (true, "lake table root directory"),
      "limit" -> (false, "newest snapshots to list (default 20)")),
    "verify-wal" -> Map(
      "wal-dir" -> (true, "WAL segment directory to audit")),
    "changes" -> Map(
      "table-root" -> (true, "lake table root directory"),
      "from" -> (true, "exclusive lower snapshot id (-1 = since creation)"),
      "to" -> (false, "inclusive upper snapshot id (default latest)"),
      "limit" -> (false, "rows to print (default 20)")),
    "mirror" -> Map(
      "source-root" -> (true, "source lake table root (must exist)"),
      "mirror-root" -> (true, "mirror lake table root (created on first run)"),
      "checkpoint" -> (true, "streaming checkpoint directory (feed offsets)"),
      "from-snapshot" -> (false, "exclusive lower snapshot bound on FIRST run (default -1 = full history)"),
      "max-snapshots-per-trigger" -> (false, "admission control: source commits per micro-batch"),
      "bootstrap" -> (false, "true = mirror an EXISTING table: clone the source at a pinned snapshot, then follow its feed from there (survives expired early history; the pin is crash-durable)"),
      "as-of" -> (false, "with --bootstrap: pin this historical source snapshot instead of the current one")),
    "sql" -> Map(
      "table-root" -> (true, "lake table root directory"),
      "query" -> (true, "SQL over the view `t` (the table's merged current state)"),
      "as-of" -> (false, "historical snapshot id (time travel)"),
      "via" -> (false, "library|connector: connector resolves `t` through CREATE TEMPORARY VIEW ... USING graft-lake (the batch read connector) instead of the library API (default library)"),
      "limit" -> (false, "rows to print (default 20)")),
    "stage" -> Map(
      "wal-dir" -> (true, "staging directory to publish WAL segments into"),
      "txns" -> (false, "synthetic-server transactions to stream (required with --endpoint synthetic; meaningless with jdbc)"),
      "toast-omit" -> (false, "true = synthetic updates treat content as unchanged TOAST: wal2json omits the column, pgoutput sends the 'u' marker (synthetic endpoint only)"),
      "endpoint" -> (false, "synthetic|jdbc: jdbc binds to a live PostgreSQL via pgjdbc (driver jar required on the classpath; default synthetic)"),
      "host" -> (false, "server host (default localhost)"),
      "port" -> (false, "server port (default 5432)"),
      "database" -> (false, "database name (default graft)"),
      "user" -> (false, "replication user (default replicator)"),
      "password" -> (false, "password (default empty)"),
      "sslmode" -> (false, "disable|allow|prefer|require|verify-ca|verify-full (default disable)"),
      "ssl-root-cert" -> (false, "CA certificate path (required by verify-ca/verify-full)"),
      "ssl-cert" -> (false, "client certificate path (requires --ssl-key)"),
      "ssl-key" -> (false, "client key path (requires --ssl-cert)"),
      "ssl-password" -> (false, "client key passphrase (requires --ssl-key)"),
      "slot" -> (false, "replication slot name (default graft_slot)"),
      "plugin" -> (false, "logical decoding output plugin (default wal2json)"),
      "proto-version" -> (false, "pgoutput protocol version 1|2 (2 = streamed in-progress txns; default 1)"),
      "format-version" -> (false, "wal2json output format 1|2 (2 = one document per action; default 1)"),
      "include-xids" -> (false, "true|false plugin option (default true)"),
      "relevant-tables" -> (false, "comma-separated tables the pipeline consumes: TRUNCATEs of OTHER tables are skipped instead of failing the stream (default: all tables consumed)"),
      "status-interval-s" -> (false, "standby status-update cadence (default 20)"),
      "idle-slot-interval-s" -> (false, "idle fast-forward threshold (default 300)"),
      "slot-busy-retries" -> (false, "openStream retries while the slot is held (default 30)"),
      "slot-busy-sleep-s" -> (false, "sleep between slot-busy retries (default 30)"),
      "roll-bytes" -> (false, "segment bytes before auto-publish (default 64MiB)"),
      "flush-txns" -> (false, "publish+ack cadence in txns (default 10000)"),
      "seed" -> (false, "synthetic stream seed (default 42)"))
  )

  def helpText: String = {
    val sb = new StringBuilder("graft — Spark-native CDC engine (WAL tail -> lake MERGE)\n\n")
    commands.toSeq.sortBy(_._1).foreach { case (cmd, opts) =>
      sb.append(s"  $cmd\n")
      opts.toSeq.sortBy { case (k, (req, _)) => (!req, k) }.foreach {
        case (k, (req, help)) =>
          sb.append(f"    --$k%-26s ${if (req) "(required) " else ""}$help\n")
      }
    }
    sb.append("\n  help | --help                  print this message\n")
    sb.toString
  }

  def parseArgs(args: Array[String]): (String, Map[String, String]) = {
    if (args.isEmpty || args.head == "help" || args.head == "--help")
      return ("help", Map.empty)
    val cmd = args.head
    val declared = commands.getOrElse(cmd,
      throw new IllegalArgumentException(
        s"unknown command '$cmd' — expected one of ${commands.keys.toSeq.sorted.mkString(", ")}\n$helpText"))
    if (args.tail.length % 2 != 0)
      throw new IllegalArgumentException(
        s"dangling flag: every --key needs a value\n$helpText")
    val kv = args.tail.grouped(2).map {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
      case Array(k, _) =>
        throw new IllegalArgumentException(s"expected a --flag, got '$k'\n$helpText")
    }.toMap
    val unknown = kv.keySet -- declared.keySet
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"unknown option(s) for $cmd: ${unknown.toSeq.sorted.map("--" + _).mkString(", ")}\n$helpText")
    val missing = declared.collect { case (k, (true, _)) if !kv.contains(k) => k }
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"missing required option(s) for $cmd: ${missing.toSeq.sorted.map("--" + _).mkString(", ")}\n$helpText")
    (cmd, kv)
  }

  def session(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cdc")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  // ------- shared wiring between the single-table and --tables run modes
  // (one source of truth: a knob added here reaches both; the two branches
  // drifting apart once already cost the remote-scheme stderr note)

  /** (schema, key columns, rename map) from --schema/--keys, defaulting to
    * the generator's repos shape. */
  private def tableShape(kv: Map[String, String])
      : (StructType, Seq[String], Map[String, String]) = (
    kv.get("schema").map(StructType.fromDDL).getOrElse(reposSchema),
    kv.get("keys").map(_.split(",").toSeq).getOrElse(Seq("repo", "path")),
    if (kv.contains("schema")) Map.empty[String, String] else reposRenameMap)

  /** A LakeTable with every CLI-exposed storage knob applied. */
  private def lakeFromKnobs(spark: SparkSession, root: String,
                            kv: Map[String, String]): LakeTable =
    new LakeTable(spark, root,
      maxDeltasPerBucket = kv.getOrElse("max-deltas", "64").toInt,
      maxDeltaBytesPerBucket =
        kv.getOrElse("max-delta-bytes", (32L * 1024 * 1024).toString).toLong,
      manifestThresholdFiles = kv.getOrElse("manifest-threshold", "4096").toInt,
      inlineCompaction = kv.getOrElse("inline-compaction", "true").toBoolean)

  /** The lineage JSONL is appended with local file IO: only derive it from
    * the table root when that root IS a local path (a scheme'd root would
    * otherwise create a literal './hdfs:' directory); say so on stderr
    * when skipping, so an absent JSONL is explained, not a mystery. */
  private def metricsPathFor(root: String): Option[String] =
    Option(new java.net.URI(root).getScheme) match {
      case None => Some(s"$root/_metrics/batches.jsonl")
      case Some("file") =>
        Some(s"${new java.net.URI(root).getPath}/_metrics/batches.jsonl")
      case Some(s) =>
        System.err.println(
          s"note: lineage JSONL skipped — $s: table root has no local metrics dir")
        None
    }

  /** A CdcPipeline with every CLI-exposed streaming knob applied. */
  private def pipelineFromKnobs(spark: SparkSession, kv: Map[String, String],
                                targets: Seq[TableTarget],
                                relevant: Set[String],
                                metricsPath: Option[String]): CdcPipeline =
    new CdcPipeline(spark, kv("wal-dir"), kv("checkpoint"),
      targets, relevant,
      metricsPath = metricsPath,
      maxFilesPerTrigger = kv.get("max-segments-per-trigger").map(_.toInt),
      strictDecode = kv.getOrElse("strict", "true").toBoolean,
      walRetention = kv.get("retention").contains("delete"),
      walSplitBytes = kv.get("split-bytes").map(_.toLong),
      saltBuckets = kv.getOrElse("salt-buckets", "0").toInt,
      maxBytesPerTrigger = kv.get("max-bytes-per-trigger").map(_.toLong))

  /** Drain the pipeline, supervised when --max-restarts asks for it. */
  private def runPipeline(pipe: CdcPipeline, kv: Map[String, String]): Unit =
    kv.get("max-restarts").map(_.toInt) match {
      case Some(budget) if budget > 0 => pipe.runSupervised(maxRestarts = budget)
      case _ => pipe.runAvailable()
    }

  /** The live-ingest loop (reference's readSlotWriteToKinesis run mode):
    * connector -> staging segments + LSN acks. Runs WITHOUT a Spark session
    * — like the reference's connector, the consume half is plain JVM; Spark
    * enters when `run` tails the staged segments. */
  private def runStage(kv: Map[String, String]): Unit = {
    import graft.sources.replication._
    val conn = ConnectionConfig(
      host = kv.getOrElse("host", "localhost"),
      database = kv.getOrElse("database", "graft"),
      username = kv.getOrElse("user", "replicator"),
      password = kv.getOrElse("password", ""),
      port = kv.getOrElse("port", "5432").toInt,
      sslMode = kv.getOrElse("sslmode", "disable"),
      sslRootCert = kv.get("ssl-root-cert"),
      sslCert = kv.get("ssl-cert"),
      sslKey = kv.get("ssl-key"),
      sslPassword = kv.get("ssl-password")).validate()
    val slot = SlotConfig(
      slotName = kv.getOrElse("slot", "graft_slot"),
      outputPlugin = kv.getOrElse("plugin", "wal2json"),
      protoVersion = kv.getOrElse("proto-version", "1").toInt,
      formatVersion = kv.getOrElse("format-version", "1").toInt,
      includeXids = kv.getOrElse("include-xids", "true").toBoolean,
      statusIntervalMs = kv.getOrElse("status-interval-s", "20").toLong * 1000,
      idleSlotIntervalMs = kv.getOrElse("idle-slot-interval-s", "300").toLong * 1000,
      slotBusyRetryLimit = kv.getOrElse("slot-busy-retries", "30").toInt,
      slotBusyRetrySleepMs = kv.getOrElse("slot-busy-sleep-s", "30").toLong * 1000,
      relevantTables = kv.get("relevant-tables")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
        .getOrElse(Set.empty))
      .validate()
    val connector = kv.getOrElse("endpoint", "synthetic") match {
      case "jdbc" =>
        if (kv.contains("txns") || kv.contains("seed"))
          throw new IllegalArgumentException(
            "--txns/--seed apply to --endpoint synthetic only")
        // the live pgjdbc binding (reflection-bound; fails fast without
        // the driver jar) — the reference's PostgresConnector run mode
        new JdbcReplicationConnector(conn, slot, () => new PgjdbcShim(conn))
      case "synthetic" =>
        val nTxns = kv.getOrElse("txns", throw new IllegalArgumentException(
          "--txns is required with --endpoint synthetic")).toLong
        new SyntheticReplicationServer(
          GenConfig(seed = kv.getOrElse("seed", "42").toLong,
            toastOmitUpdates = kv.getOrElse("toast-omit", "false").toBoolean),
          nTxns)
          .connect(conn, slot)
      case other => throw new IllegalArgumentException(
        s"--endpoint must be synthetic|jdbc, got $other")
    }
    val ingest = new ReplicationIngest(connector,
      kv("wal-dir"), new org.apache.hadoop.conf.Configuration(), slot,
      rollBytes = kv.getOrElse("roll-bytes", (64L * 1024 * 1024).toString).toLong,
      flushChunks = kv.getOrElse("flush-txns", "10000").toLong)
    try {
      ingest.start()
      val stats = ingest.pump()
      println(s"""{"staged_txns":${stats.chunks},"segments":${stats.segments},""" +
        s""""ackedLsn":${stats.ackedLsn},"slot":"${slot.slotName}",""" +
        s""""dir":"${kv("wal-dir")}"}""")
    } finally { // release the slot even when the pump fails; a broken
      // stream's close error must not mask the original failure
      try ingest.close() catch { case _: Exception => () }
    }
  }

  def main(args: Array[String]): Unit = {
    val (cmd, kv) = parseArgs(args)
    if (cmd == "help") { println(helpText); return } // short-circuit: no session
    if (cmd == "stage") { runStage(kv); return } // plain JVM: no session either
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = session(cpus)
    try cmd match {
      case "gen" =>
        val cfg = GenConfig(
          seed = kv.getOrElse("seed", "42").toLong,
          addColumnAtLsn = kv.get("add-col-at").map(_.toLong).getOrElse(Long.MaxValue),
          renameAtLsn = kv.get("rename-at").map(_.toLong).getOrElse(Long.MaxValue),
          tables = kv.get("tables")
            .map(_.split(",").map(_.trim).filter(_.nonEmpty).toIndexedSeq)
            .getOrElse(IndexedSeq("repos")),
          toastOmitUpdates = kv.getOrElse("toast-omit", "false").toBoolean)
        val n = kv("txns").toLong
        val per = kv.getOrElse("txns-per-segment", "10000").toLong
        ChangeStreamGen.writeSegments(spark, cfg, kv("wal-dir"), n, per)
        println(s"""{"wrote_txns":$n,"segments":${(n + per - 1) / per},"dir":"${kv("wal-dir")}"}""")

      // SINGLE-PASS multi-table apply: one decode pass over the mixed WAL
      // fanned out to one lake table per name (CdcPipeline demux — the WAL
      // is scanned and ParseWalLine'd exactly once per batch, not once per
      // table), per-table watermark fences, ONE checkpoint.
      case "run" if kv.contains("tables") =>
        require(!kv.contains("table"),
          "--tables and --table are mutually exclusive")
        require(kv.getOrElse("sink", "foreachbatch") != "connector",
          "--tables drives the foreachbatch pipeline (connector sink is single-table)")
        val root = kv("table-root")
        val names = kv("tables").split(",").map(_.trim).filter(_.nonEmpty).toSeq
        require(names.nonEmpty && names.distinct.size == names.size,
          s"--tables needs distinct non-empty names, got '${kv("tables")}'")
        val (schema, keys, renameMap) = tableShape(kv)
        val targets = names.map { n =>
          TableTarget(n, lakeFromKnobs(spark, s"$root/$n", kv), schema, keys,
            nBuckets = kv.getOrElse("buckets", "32").toInt, renameMap,
            partialUpdates = kv.getOrElse("partial-updates", "false").toBoolean)
        }
        val t0 = System.nanoTime()
        val pipe = pipelineFromKnobs(spark, kv, targets, names.toSet,
          metricsPathFor(root))
        runPipeline(pipe, kv)
        val sec = (System.nanoTime() - t0) / 1e9
        val batches = pipe.stats.map(_._1).distinct.size
        val applied = pipe.stats.map(_._3.appliedKeys).sum
        val perTable = targets.map { t =>
          val snap = t.table.currentSnapshot.get
          s""""${t.name}":{"snapshotId":${snap.snapshotId},""" +
            s""""highWatermark":${snap.lsnHighWatermark}}"""
        }.mkString("{", ",", "}")
        println(s"""{"batches":$batches,"appliedKeys":$applied,""" +
          s""""tables":$perTable,"seconds":$sec}""")

      case "apply" =>
        // ONE-BATCH backfill through the batch WRITE connector
        // (df.write.format("graft-lake")) — the DataFrameWriter face of
        // `run`: no checkpoint, no streaming query; idempotency is the LSN
        // fence itself, so re-applying the same WAL is a committed no-op
        val root = kv("table-root")
        val t = lakeFromKnobs(spark, root, kv)
        if (!t.exists) {
          val (schema, keys, renameMap) = tableShape(kv)
          t.create(schema, keys, kv.getOrElse("buckets", "32").toInt, renameMap,
            partialUpdates = kv.getOrElse("partial-updates", "false").toBoolean)
        }
        val before = t.currentSnapshotId.getOrElse(-1L)
        val t0 = System.nanoTime()
        val writer = spark.read.textFile(kv("wal-dir")).toDF("value")
          .write.format("graft-lake")
          .option("path", root)
          .option("table", kv.getOrElse("table", "repos"))
          .option("strict", kv.getOrElse("strict", "true"))
          .option("maxDeltas", kv.getOrElse("max-deltas", "64"))
          .option("maxDeltaBytes",
            kv.getOrElse("max-delta-bytes", (32L * 1024 * 1024).toString))
          .option("manifestThreshold", kv.getOrElse("manifest-threshold", "4096"))
          .option("inlineCompaction", kv.getOrElse("inline-compaction", "true"))
          .mode("append")
        metricsPathFor(root).foreach(p => writer.option("metricsPath", p))
        writer.save()
        val after = new LakeTable(spark, root).currentSnapshot.get
        val applied = after.bucketLineage.values.map(_.getOrElse("keys", 0L)).sum
        println(s"""{"snapshotId":${after.snapshotId},""" +
          s""""newCommit":${after.snapshotId != before},""" +
          s""""cumulativeKeys":$applied,""" +
          s""""highWatermark":${after.lsnHighWatermark},""" +
          s""""seconds":${(System.nanoTime() - t0) / 1e9}}""")

      case "run" =>
        val root = kv("table-root")
        val tableName = kv.getOrElse("table", "repos")
        val (schema, keys, renameMap) = tableShape(kv)
        val table = lakeFromKnobs(spark, root, kv)
        val target = TableTarget(tableName, table, schema, keys,
          nBuckets = kv.getOrElse("buckets", "32").toInt, renameMap,
          partialUpdates = kv.getOrElse("partial-updates", "false").toBoolean)
        val relevant = kv.get("relevant-tables")
          .map(_.split(",").toSet).getOrElse(Set(tableName))
        val metricsPath = metricsPathFor(root)
        val t0 = System.nanoTime()
        val (batches, applied) = kv.getOrElse("sink", "foreachbatch") match {
          case "connector" =>
            // the MERGE protocol as a named connector: graft-wal source ->
            // graft-lake sink; table must pre-exist (create is idempotent)
            table.create(schema, keys, target.nBuckets, renameMap,
              partialUpdates = target.partialUpdates)
            // the metrics JSONL is append-only across runs: summarize only
            // the lines THIS run appends
            def metricsLines(): Seq[String] = metricsPath.toSeq.flatMap { p =>
              val f = new java.io.File(p)
              if (!f.exists()) Nil
              else {
                val src = scala.io.Source.fromFile(f)
                try src.getLines().toList finally src.close()
              }
            }
            val preLines = metricsLines().size
            // fallback lineage when the root is a remote scheme (no local
            // JSONL): per-bucket "keys" counters are CUMULATIVE applied
            // keys, snapshot ids advance once per committed batch — the
            // deltas are this run's summary (a remote run must not report
            // batches:0/appliedKeys:0 after committing thousands of keys)
            def snapKeys: Long = table.currentSnapshot
              .map(_.bucketLineage.values.map(_.getOrElse("keys", 0L)).sum)
              .getOrElse(0L)
            def snapId: Long = table.currentSnapshot.map(_.snapshotId).getOrElse(0L)
            val (preKeys, preSnapId) = (snapKeys, snapId)
            def runQuery(): Unit = {
              val reader = spark.readStream.format("graft-wal")
              kv.get("max-segments-per-trigger")
                .foreach(m => reader.option("maxSegmentsPerTrigger", m))
              kv.get("max-bytes-per-trigger")
                .foreach(b => reader.option("maxBytesPerTrigger", b))
              if (kv.get("retention").contains("delete"))
                reader.option("retention", "delete")
              kv.get("split-bytes").foreach(b => reader.option("splitBytes", b))
              val writer = reader.load(kv("wal-dir"))
                .writeStream.format("graft-lake")
                .option("path", root)
                .option("table", tableName)
                .option("relevantTables", relevant.mkString(","))
                .option("strict", kv.getOrElse("strict", "true"))
                .option("saltBuckets", kv.getOrElse("salt-buckets", "0"))
                .option("maxDeltas", kv.getOrElse("max-deltas", "64"))
                .option("maxDeltaBytes",
                  kv.getOrElse("max-delta-bytes", (32L * 1024 * 1024).toString))
                .option("manifestThreshold", kv.getOrElse("manifest-threshold", "4096"))
                .option("checkpointLocation", kv("checkpoint"))
                .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              metricsPath.foreach(writer.option("metricsPath", _))
              writer.start().awaitTermination()
            }
            // connector-mode supervision: the SAME classified per-class
            // budgets as the foreachbatch path (a shared catch-all budget
            // would let one fencing-contention storm exhaust the retries
            // the foreachbatch path survives) — exactly-once fencing makes
            // replays no-ops either way
            kv.get("max-restarts").map(_.toInt).filter(_ > 0) match {
              case Some(budget) =>
                CdcPipeline.supervise(() => runQuery(), maxRestarts = budget)
              case None => runQuery()
            }
            // per-batch lineage lives in the metrics JSONL the sink wrote;
            // on a remote root (no local JSONL) fall back to the table's
            // own cumulative lineage deltas
            val lines = metricsLines().drop(preLines)
            if (metricsPath.isDefined) {
              val appliedRe = """"appliedKeys":(\d+)""".r
              (lines.size,
                lines.flatMap(l => appliedRe.findFirstMatchIn(l)
                  .map(_.group(1).toLong)).sum)
            } else ((snapId - preSnapId).toInt, snapKeys - preKeys)
          case _ =>
            val pipe = pipelineFromKnobs(spark, kv, Seq(target), relevant,
              metricsPath)
            runPipeline(pipe, kv)
            (pipe.stats.size, pipe.stats.map(_._3.appliedKeys).sum)
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val snap = table.currentSnapshot.get
        println(s"""{"batches":$batches,"appliedKeys":$applied,""" +
          s""""highWatermark":${snap.lsnHighWatermark},"snapshotId":${snap.snapshotId},""" +
          s""""seconds":$sec}""")

      case "show" =>
        val t = new LakeTable(spark, kv("table-root"))
        val snap = t.currentSnapshot.getOrElse(
          throw new IllegalArgumentException(s"no table at ${kv("table-root")}"))
        val df = t.read(asOfSnapshot = kv.get("as-of").map(_.toLong))
          .persist() // count + display share ONE base+delta merge scan
        val n = df.count()
        println(s"rows=$n")
        val keyCols = snap.keyColumns.map(col)
        // repos-shaped tables get the compact sha256(content) rendering;
        // any other schema prints its own columns, keys first
        val projected =
          if (df.columns.contains("content"))
            df.select((keyCols ++ df.columns
              .filterNot(c => snap.keyColumns.contains(c) || c == "content" || c == "commit")
              .map(col) :+ sha2(col("content"), 256).as("content_sha256")): _*)
          else df
        projected.orderBy(keyCols: _*)
          .show(kv.getOrElse("limit", "10").toInt, truncate = false)

      case "vacuum" =>
        val t = new LakeTable(spark, kv("table-root"))
        val (snaps, files) = t.expireSnapshots(kv.getOrElse("keep-last", "5").toInt)
        val orphans = kv.get("orphan-grace-ms")
          .map(g => t.removeOrphans(g.toLong)).getOrElse(0)
        println(s"""{"expired_snapshots":$snaps,"deleted_files":$files,"orphan_dirs":$orphans}""")

      case "rebucket" =>
        // bucket-count evolution: one fenced commit rewriting the merged
        // state under the new count; streaming writers follow automatically
        // (applyBatch re-reads the snapshot per batch), the change feed
        // skips the commit (no logical changes)
        val t = new LakeTable(spark, kv("table-root"))
        val before = t.currentSnapshot.getOrElse(
          throw new IllegalArgumentException(s"no table at ${kv("table-root")}"))
        val t0 = System.nanoTime()
        val snap = graft.apply.MergeEngine.rebucket(t, kv("buckets").toInt)
        val secs = (System.nanoTime() - t0) / 1e9
        // a same-count call is a no-op (no commit): say so instead of
        // printing the previous commit's unrelated lineage as "rows"
        val detail =
          if (snap.snapshotId == before.snapshotId) """"noop":true"""
          else s""""rows":${snap.lineage.getOrElse("rows", -1L)}"""
        println(s"""{"fromBuckets":${before.nBuckets},""" +
          s""""toBuckets":${snap.nBuckets},"snapshotId":${snap.snapshotId},""" +
          s"""$detail,"seconds":$secs}""")

      case "compact" =>
        // full-compaction maintenance: fold all pending deltas to fresh
        // bases now instead of waiting for the size-tiered inline trigger
        val t = new LakeTable(spark, kv("table-root"))
        val before = t.currentSnapshot.getOrElse(
          throw new IllegalArgumentException(s"no table at ${kv("table-root")}"))
        val t0 = System.nanoTime()
        val snap = graft.apply.MergeEngine.compactAll(t)
        val secs = (System.nanoTime() - t0) / 1e9
        val detail =
          if (snap.snapshotId == before.snapshotId) """"noop":true"""
          else s""""compactedBuckets":${snap.lineage.getOrElse("compactedBuckets", -1L)}"""
        println(s"""{"snapshotId":${snap.snapshotId},$detail,"seconds":$secs}""")

      case "index-feed" =>
        // feed catch-up maintenance: write the commit-log index segments so
        // changes(from, to] over a long range stops paying one sequential
        // metadata read per commit (kept OFF the commit path — a committer
        // would need K-1 other roots to build a segment)
        val t = new LakeTable(spark, kv("table-root"))
        val t0 = System.nanoTime()
        val segs = t.indexFeed(kv.getOrElse("segment-size", "256").toInt)
        val secs = (System.nanoTime() - t0) / 1e9
        println(s"""{"segmentsWritten":$segs,"seconds":$secs}""")

      case "clone" =>
        // DR / dev-copy / point-in-time recovery: materialize a snapshot
        // at a fresh root (distributed file copy); watermarks travel, so
        // re-pointing the pipeline at the clone resumes exactly-once
        val t = new LakeTable(spark, kv("source-root"))
        val t0 = System.nanoTime()
        val snap = t.cloneTo(kv("target-root"), kv.get("as-of").map(_.toLong))
        val secs = (System.nanoTime() - t0) / 1e9
        println(s"""{"snapshotId":${snap.snapshotId},""" +
          s""""files":${snap.allFiles.size},""" +
          s""""bytes":${snap.fileBytes.values.sum},""" +
          s""""highWatermark":${snap.lsnHighWatermark},"seconds":$secs}""")

      case "lookup" =>
        // Point lookup through bucket + per-file key-range pruning: prints
        // how few files the read actually had to touch, then the row(s).
        val t = new LakeTable(spark, kv("table-root"))
        val snap = t.currentSnapshot.getOrElse(
          throw new IllegalArgumentException(s"no table at ${kv("table-root")}"))
        def parseKey(one: String): Map[String, Any] = one.split(",").map { pair =>
          pair.split("=", 2) match {
            case Array(k, v) =>
              // convert to the key column's DECLARED type: a raw String
              // against a numeric column makes Spark compare both sides as
              // DOUBLE — lossy above 2^53, so a neighboring bigint key
              // could match the residual filter
              val typed: Any = snap.schema.fields.find(_.name == k)
                .map(_.dataType) match {
                case Some(org.apache.spark.sql.types.LongType) => v.toLong
                case Some(org.apache.spark.sql.types.IntegerType) => v.toInt
                case Some(org.apache.spark.sql.types.ShortType) => v.toShort
                case Some(org.apache.spark.sql.types.DoubleType) => v.toDouble
                case Some(org.apache.spark.sql.types.FloatType) => v.toFloat
                case Some(org.apache.spark.sql.types.BooleanType) => v.toBoolean
                case _ => v // string-ish types (and unknown cols fail later
                            // with the informative lookup error)
              }
              k -> typed
            case _ => throw new IllegalArgumentException(
              s"bad --key element '$pair' (want col=value)\n$helpText")
          }
        }.toMap
        val keyBatch = kv("key").split(";").toSeq.map(parseKey)
        if (keyBatch.size == 1) {
          val keyVals = keyBatch.head
          val (bucket, baseFiles, deltaFiles) = t.planFiles(snap, keyVals)
          val totalFiles = snap.allFiles.size
          println(s"""{"bucket":$bucket,""" +
            s""""scannedFiles":${baseFiles.size + deltaFiles.size},""" +
            s""""tableFiles":$totalFiles}""")
          t.lookup(keyVals).show(truncate = false)
        } else {
          // batched point lookup: K keys, ONE Spark job (';'-separated)
          val planned = keyBatch.map(t.planFiles(snap, _))
          println(s"""{"keys":${keyBatch.size},""" +
            s""""buckets":${planned.map(_._1).distinct.size},""" +
            s""""scannedFiles":${
              (planned.flatMap(_._2) ++ planned.flatMap(_._3)).distinct.size},""" +
            s""""tableFiles":${snap.allFiles.size}}""")
          t.lookup(keyBatch).show(truncate = false)
        }

      case "sql" =>
        // ad-hoc analytics over the merged table state: register the
        // merge-on-read view under `t`, let Catalyst plan the rest.
        // --via connector exercises the batch READ connector instead of
        // the library API — both must answer identically.
        kv.getOrElse("via", "library") match {
          case "library" =>
            val t = new LakeTable(spark, kv("table-root"))
            t.createOrReplaceView("t", kv.get("as-of").map(_.toLong))
          case "connector" =>
            // escape single quotes: a legal path like /data/bob's-lake must
            // not break (or be interpreted as) the spliced DDL
            def lit(s: String) = s.replace("'", "''")
            val opts = s"path '${lit(kv("table-root"))}'" +
              kv.get("as-of").map(id => s", asOf '${lit(id)}'").getOrElse("")
            spark.sql(
              s"CREATE OR REPLACE TEMPORARY VIEW t USING `graft-lake` OPTIONS ($opts)")
          case other => throw new IllegalArgumentException(
            s"sql: unknown --via '$other' (library|connector)")
        }
        spark.sql(kv("query"))
          .show(kv.getOrElse("limit", "20").toInt, truncate = false)

      case "changes" =>
        // the lake table as a CDC SOURCE: net row-level changes committed
        // in snapshot range (from, to] — O(changed bytes), no table scan
        val t = new LakeTable(spark, kv("table-root"))
        val cur = t.currentSnapshot.getOrElse(
          throw new IllegalArgumentException(s"no table at ${kv("table-root")}"))
        val from = kv("from").toLong
        val to = kv.get("to").map(_.toLong).getOrElse(cur.snapshotId)
        val df = t.changes(from, to).persist()
        val kindCounts = df.groupBy("_kind").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
        val kinds = kindCounts.map { case (k, n) => s""""$k":$n""" }
        println(s"""{"from":$from,"to":$to,"changes":${kindCounts.map(_._2).sum},""" +
          s""""byKind":{${kinds.mkString(",")}}}""")
        val feedView =
          if (df.columns.contains("content"))
            df.withColumn("content_sha256", sha2(col("content"), 256))
              .drop("content", "commit")
          else df
        feedView.orderBy(col("_snapshot"), col("_lsn"), col("_seq"))
          .show(kv.getOrElse("limit", "20").toInt, truncate = false)
        df.unpersist(blocking = false)

      case "mirror" =>
        // table→table CDC replication over the engine's own change feed:
        // stream the source's per-commit net changes (snapshot-id offsets in
        // the checkpoint) through the LSN-fenced MERGE into the mirror —
        // exactly-once end-to-end, AvailableNow catch-up then stop
        val t0 = System.nanoTime()
        var batches = 0
        var applied = 0L
        // .toBoolean like every other boolean flag: "True"/"yes" must fail
        // loudly, never silently fall through to the plain-follow branch
        val bootstrapFlag = kv.get("bootstrap").exists(_.toBoolean)
        require(!(bootstrapFlag && kv.contains("from-snapshot")),
          "--from-snapshot conflicts with --bootstrap: the bootstrap pin decides " +
            "the feed's lower bound (use --as-of to pin a historical snapshot)")
        require(bootstrapFlag || !kv.contains("as-of"),
          "--as-of requires --bootstrap true (it pins the bootstrap clone's snapshot)")
        val q =
          if (bootstrapFlag)
            // existing-table case: clone at a pinned snapshot + follow from
            // there (fromSnapshot would either hit the retention horizon or
            // skip all pre-existing rows)
            graft.streaming.Mirror.bootstrap(spark,
              kv("source-root"), kv("mirror-root"), kv("checkpoint"),
              asOf = kv.get("as-of").map(_.toLong),
              maxSnapshotsPerTrigger = kv.get("max-snapshots-per-trigger").map(_.toLong),
              onBatch = s => { batches += 1; applied += s.appliedKeys })
          else graft.streaming.Mirror.follow(spark,
            kv("source-root"), kv("mirror-root"), kv("checkpoint"),
            fromSnapshot = kv.get("from-snapshot").map(_.toLong).getOrElse(-1L),
            maxSnapshotsPerTrigger = kv.get("max-snapshots-per-trigger").map(_.toLong),
            onBatch = s => { batches += 1; applied += s.appliedKeys })
        q.awaitTermination()
        val mirror = new LakeTable(spark, kv("mirror-root"))
        val snap = mirror.currentSnapshot.get
        println(s"""{"batches":$batches,"appliedKeys":$applied,""" +
          s""""mirrorSnapshot":${snap.snapshotId},""" +
          s""""mirrorHighWatermark":${snap.lsnHighWatermark},""" +
          s""""seconds":${(System.nanoTime() - t0) / 1e9}}""")

      case "verify-wal" =>
        // pre-flight audit for the repair workflow: which segments would a
        // strict run reject, with counts and a truncated sample per segment
        val segs = graft.sources.WalSource.listSegments(kv("wal-dir"))
        // same summary SHAPE as the non-empty case — a repair script
        // reading badSegments must not hit a missing key on the empty edge
        if (segs.isEmpty) { println("""{"segments":0,"badSegments":0,"malformed":0}"""); }
        else {
          val lines = spark.read.text(
            segs.map(n => s"${kv("wal-dir")}/$n"): _*)
            .withColumn("_file",
              element_at(split(input_file_name(), "/"), -1))
          val bad = graft.decode.ChangeDecoder.malformedBySegment(lines).collect()
          bad.foreach { r =>
            // full JSON string escaping: the sample IS garbage by
            // definition, so control bytes (tabs, truncated binary) are
            // expected — raw, they'd break the audit output's JSON
            val sample = r.getString(2).flatMap {
              case '\\' => "\\\\"
              case '"' => "\\\""
              case c if c < ' ' => f"\\u${c.toInt}%04x"
              case c => c.toString
            }
            println(s"""{"segment":"${r.getString(0)}","malformed":${r.getLong(1)},""" +
              s""""sample":"$sample"}""")
          }
          println(s"""{"segments":${segs.size},""" +
            s""""badSegments":${bad.length},""" +
            s""""malformed":${bad.map(_.getLong(1)).sum}}""")
        }

      case "snapshots" =>
        // operational history: one JSON line per retained snapshot, newest
        // first — id, watermark, file/delta counts, batch lineage
        val t = new LakeTable(spark, kv("table-root"))
        val cur = t.currentSnapshot.getOrElse(
          throw new IllegalArgumentException(s"no table at ${kv("table-root")}"))
        val limit = kv.getOrElse("limit", "20").toInt
        (cur.snapshotId to math.max(0L, cur.snapshotId - limit + 1) by -1L)
          .flatMap(id => scala.util.Try(t.readSnapshot(id)).toOption)
          .foreach { s =>
            val lin = s.lineage.toSeq.sorted
              .map { case (k, v) => s""""$k":$v""" }.mkString(",")
            println(s"""{"snapshotId":${s.snapshotId},""" +
              s""""highWatermark":${s.lsnHighWatermark},""" +
              s""""baseFiles":${s.bucketFiles.values.map(_.size).sum},""" +
              s""""deltaFiles":${s.bucketDeltas.values.map(_.size).sum},""" +
              s""""lineage":{$lin}}""")
          }
    } finally spark.stop()
  }
}
