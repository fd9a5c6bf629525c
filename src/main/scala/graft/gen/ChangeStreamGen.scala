package graft.gen

import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Deterministic wal2json-style change-stream generator over the north-rule
 * workload table `repos(repo, path, commit, lang, content)`.
 *
 * Everything is a pure function of (seed, txnId): no wall-clock, no
 * java.util.Random state, no stored data — which is what lets the same
 * stream scale by formula to 10^10 events without materializing rows, and
 * guarantees bit-identical payloads across parallelism levels (the
 * reference, by contrast, stamps wall-clock millis and random 128-bit hash
 * keys into its records — SlotReaderKinesisWriter.java:259-267 — which we
 * deliberately avoid for determinism).
 *
 * Stream shape:
 *  - one committed transaction per WAL chunk (wal2json default), with
 *    `lsn = txnId + 1` strictly monotone and 64-bit `xid > Int.MaxValue`
 *    (the reference pins 64-bit xids in SlotReaderKinesisWriterTest.java:123);
 *  - 1..maxChangesPerTxn row changes per transaction;
 *  - `repo` drawn from a power-law (Zipf s≈1) distribution — rank = R^u —
 *    so a hot head repo exists for skew handling tests;
 *  - op mix ≈ 60% insert / 30% update / 10% delete;
 *  - schema evolution mid-stream: transactions with lsn >= addColumnAtLsn
 *    additionally carry `size_bytes` (additive column appears in
 *    columnnames with no out-of-band DDL, exactly as wal2json would);
 *    transactions with lsn >= renameAtLsn emit `language` where older ones
 *    emitted `lang` (rename, resolved by the table's rename mapping).
 */
final case class GenConfig(
    seed: Long = 42L,
    nRepos: Int = 1000,
    pathsPerRepo: Int = 200,
    maxChangesPerTxn: Int = 4,
    contentLines: Int = 8,
    // Schema evolution switch-on points; Long.MaxValue = never.
    addColumnAtLsn: Long = Long.MaxValue,
    renameAtLsn: Long = Long.MaxValue,
    // MIXED-TABLE streams (the reference's single slot carries EVERY
    // table's changes — SlotReaderKinesisWriter.java:281-287): each change
    // routes to tables(hash(repo) % n), a pure function of the repo so a
    // given key always lives in exactly ONE table. Default single-table
    // keeps every existing stream byte-identical.
    tables: IndexedSeq[String] = IndexedSeq("repos"),
    // Unchanged-TOAST modeling: when true, UPDATE tuples treat `content`
    // as unchanged and OMIT it (and its derived size_bytes) from the
    // emitted columns — PostgreSQL never re-sends an unchanged TOASTed
    // value (wal2json drops it from columnnames). Consumers need a
    // partialUpdates lake table to keep the stored content. Updates then
    // only ever change commit/lang; content changes on insert alone.
    toastOmitUpdates: Boolean = false)

object ChangeStreamGen {

  /** splitmix64 — public-domain mixing function; stateless hashing. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def h(seed: Long, parts: Long*): Long =
    parts.foldLeft(mix(seed))((acc, p) => mix(acc ^ p))

  /** Uniform [0,1) from a hash. */
  private def unit(x: Long): Double = ((x >>> 11).toDouble) / (1L << 53).toDouble

  private val langs = Array("scala", "java", "python", "go", "rust", "c", "sql", "js")

  private val words = Array(
    "stream", "merge", "commit", "offset", "buffer", "batch", "index",
    "shard", "apply", "decode", "filter", "snapshot", "manifest", "cursor")

  /** Power-law repo rank: P(rank r) ~ 1/r over [0, nRepos). The base is
    * n+1, not n: pow(n, u) < n for every u < 1, which made the top rank
    * n-1 unreachable — the configured key space was silently one smaller. */
  def zipfRank(u: Double, n: Int): Int = {
    val r = math.pow(n.toDouble + 1.0, u).toInt
    math.min(n - 1, math.max(0, r - 1))
  }

  final case class GenChange(
      kind: String, repo: String, path: String,
      commit: String, lang: String, content: String, sizeBytes: Long,
      table: String = "repos")

  final case class GenTxn(lsn: Long, xid: Long, changes: IndexedSeq[GenChange])

  /** The pure kernel: transaction #txnId of the stream. */
  def txn(cfg: GenConfig, txnId: Long): GenTxn = {
    val lsn = txnId + 1
    val xid = 3000000000L + txnId // > Int.MaxValue: 64-bit xid on the wire
    val n = 1 + (h(cfg.seed, txnId, 1) & 0x7fffffffL).toInt % cfg.maxChangesPerTxn
    val changes = (0 until n).map { i =>
      val hk = h(cfg.seed, txnId, 2, i.toLong)
      val repoIdx = zipfRank(unit(hk), cfg.nRepos)
      val pathIdx = (h(cfg.seed, txnId, 3, i.toLong) & 0x7fffffffL).toInt % cfg.pathsPerRepo
      val repo = f"org/repo-$repoIdx%05d"
      val dir = words(pathIdx % words.length)
      val path = f"src/$dir/file_$pathIdx%04d.${langs(pathIdx % langs.length)}"
      val op = (h(cfg.seed, txnId, 4, i.toLong) & 0x7fffffffL).toInt % 10
      val kind = if (op < 6) "insert" else if (op < 9) "update" else "delete"
      val commit = f"${h(cfg.seed, txnId, 5, i.toLong)}%016x"
      val lang = langs(((h(cfg.seed, txnId, 6, i.toLong) & 0x7fffffffL) % langs.length).toInt)
      val content = if (kind == "delete") "" else genContent(cfg, repo, path, lsn, i)
      // table routing is a function of the REPO alone (stable: every
      // change of a key goes to the same table for the stream's lifetime)
      val table =
        if (cfg.tables.length == 1) cfg.tables.head
        else cfg.tables((h(cfg.seed, 8L, repoIdx.toLong) & 0x7fffffffL).toInt
          % cfg.tables.length)
      GenChange(kind, repo, path, commit, lang, content, content.length.toLong,
        table)
    }
    GenTxn(lsn, xid, changes)
  }

  /** Deterministic pseudo-source-code body, a few hundred bytes. */
  def genContent(cfg: GenConfig, repo: String, path: String, lsn: Long, i: Int): String = {
    val sb = new StringBuilder(cfg.contentLines * 48)
    sb.append("// ").append(repo).append('/').append(path)
      .append(" @lsn=").append(lsn).append('\n')
    var k = 0
    while (k < cfg.contentLines) {
      val w = h(cfg.seed, lsn, 7, i.toLong, k.toLong)
      sb.append("def ").append(words(((w >>> 8) & 0x7fffffff).toInt % words.length))
        .append('_').append((w & 0xffff).toString)
        .append("(x: Long): Long = x ^ 0x")
        .append(java.lang.Long.toHexString(w >>> 16)).append("L\n")
      k += 1
    }
    sb.toString
  }

  // ---------------------------------------------------------------- JSON

  private def esc(s: String): String = graft.util.Json.escape(s)

  /**
   * Render one transaction as a WAL line: the wal2json SlotMessage JSON with
   * the WAL position prepended. Shape matches the reference's wire format
   * (SURVEY.md §1.1); insert/update carry the full new tuple as parallel
   * name/type/value arrays, update/delete carry `oldkeys` with the primary
   * key (repo, path).
   */
  def renderLine(cfg: GenConfig, t: GenTxn): String = {
    val sb = new StringBuilder(512 * t.changes.length)
    sb.append("{\"lsn\":").append(t.lsn)
      .append(",\"xid\":").append(t.xid).append(",\"change\":[")
    var i = 0
    while (i < t.changes.length) {
      val c = t.changes(i)
      if (i > 0) sb.append(',')
      val renamed = t.lsn >= cfg.renameAtLsn
      val withSize = t.lsn >= cfg.addColumnAtLsn
      val langCol = if (renamed) "language" else "lang"
      sb.append("{\"kind\":\"").append(c.kind)
        .append("\",\"schema\":\"public\",\"table\":\"").append(esc(c.table))
        .append('"')
      if (c.kind != "delete") {
        // unchanged-TOAST: updates omit content (and its derived
        // size_bytes) entirely — absent, not null
        val withContent = !(cfg.toastOmitUpdates && c.kind == "update")
        sb.append(",\"columnnames\":[\"repo\",\"path\",\"commit\",\"")
          .append(langCol).append('"')
        if (withContent) sb.append(",\"content\"")
        if (withSize && withContent) sb.append(",\"size_bytes\"")
        sb.append("],\"columntypes\":[\"text\",\"text\",\"text\",\"text\"")
        if (withContent) sb.append(",\"text\"")
        if (withSize && withContent) sb.append(",\"bigint\"")
        sb.append("],\"columnvalues\":[\"").append(esc(c.repo))
          .append("\",\"").append(esc(c.path))
          .append("\",\"").append(c.commit)
          .append("\",\"").append(c.lang).append('"')
        if (withContent) sb.append(",\"").append(esc(c.content)).append('"')
        if (withSize && withContent) sb.append(',').append(c.sizeBytes)
        sb.append(']')
      }
      if (c.kind != "insert") {
        sb.append(",\"oldkeys\":{\"keynames\":[\"repo\",\"path\"],")
          .append("\"keytypes\":[\"text\",\"text\"],")
          .append("\"keyvalues\":[\"").append(esc(c.repo))
          .append("\",\"").append(esc(c.path)).append("\"]}")
      }
      sb.append('}')
      i += 1
    }
    sb.append("]}")
    sb.toString
  }

  /** Distributed lazy stream of WAL lines for txns [0, nTxns). The payload
    * for partition p / index i is computed on the executor from the formula —
    * nothing is collected to the driver. */
  def lines(spark: SparkSession, cfg: GenConfig, nTxns: Long,
            partitions: Int): Dataset[String] = {
    import spark.implicits._
    spark.range(0, nTxns, 1, partitions)
      .map(id => renderLine(cfg, txn(cfg, id)))
  }

  /**
   * Write WAL segment files (JSONL) under `dir`, `txnsPerSegment` txns per
   * segment, named so lexicographic order == LSN order. These stand in for
   * the replication slot: an append-only log the streaming source tails
   * (reference's PostgresConnector.readPending, PostgresConnector.java:106-108).
   */
  def writeSegments(spark: SparkSession, cfg: GenConfig, dir: String,
                    nTxns: Long, txnsPerSegment: Long): Unit = {
    import spark.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    var seg = 0L
    var start = 0L
    while (start < nTxns) {
      val end = math.min(nTxns, start + txnsPerSegment)
      val path = f"$dir/wal-$seg%09d.jsonl"
      val tmp = java.nio.file.Paths.get(s"$path.tmp")
      val out = java.nio.file.Files.newBufferedWriter(tmp)
      try {
        var id = start
        while (id < end) {
          out.write(renderLine(cfg, txn(cfg, id))); out.write("\n")
          id += 1
        }
      } catch {
        case e: Throwable =>
          // close + remove the partial .tmp so a retry into the same dir
          // doesn't trip over a stray open handle or stale file
          try out.close() catch { case _: Throwable => () }
          java.nio.file.Files.deleteIfExists(tmp)
          throw e
      }
      out.close()
      // Atomic publish so a tailing reader never sees a partial segment.
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(path),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      seg += 1
      start = end
    }
  }

  /** Driver-side expected final state at small scale (test oracle): replay
    * the same formula sequentially. Returns key -> (commit, lang, content,
    * sizeBytes option). */
  def expectedFinalState(cfg: GenConfig, nTxns: Long)
      : Map[(String, String), GenChange] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[(String, String), GenChange]
    var id = 0L
    while (id < nTxns) {
      val t = txn(cfg, id)
      t.changes.foreach { c =>
        val k = (c.repo, c.path)
        if (c.kind == "delete") m.remove(k)
        else if (cfg.toastOmitUpdates && c.kind == "update")
          // the update omitted content/size_bytes: stored values persist;
          // a never-inserted key reads them as null (content = null,
          // sizeBytes sentinel -1 => null column)
          m(k) = m.get(k) match {
            case Some(prev) =>
              c.copy(content = prev.content, sizeBytes = prev.sizeBytes)
            case None => c.copy(content = null, sizeBytes = -1L)
          }
        else m(k) = c
      }
      id += 1
    }
    m.toMap
  }
}
