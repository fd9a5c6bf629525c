package graft.gen

import graft.util.Json.escape

/**
 * Renders the [[ChangeStreamGen]] formula stream as wal2json
 * FORMAT-VERSION 2 wire lines — the TRUE wire shape (one JSON document
 * per action, no positions in-band; public wal2json documentation), the
 * deterministic generator behind the third-grammar parity tests and the
 * fake server's v2 mode. Schema evolution manifests exactly as the real
 * plugin does: the per-action `columns` array simply carries the new
 * column set / names from the era's first action on — no metadata
 * message (unlike pgoutput's Relation).
 */
object Wal2JsonV2Gen {

  /** The v2 action lines for one transaction: B, one I/U/D per change, C. */
  def txnLines(cfg: GenConfig, t: ChangeStreamGen.GenTxn): Seq[String] = {
    val renamed = t.lsn >= cfg.renameAtLsn
    val withSize = t.lsn >= cfg.addColumnAtLsn
    val langCol = if (renamed) "language" else "lang"
    def col(name: String, tpe: String, value: String): String =
      s"""{"name":"$name","type":"$tpe","value":$value}"""
    def identity(c: ChangeStreamGen.GenChange): String =
      s""","identity":[${col("repo", "text", "\"" + escape(c.repo) + "\"")},""" +
        s"""${col("path", "text", "\"" + escape(c.path) + "\"")}]"""
    val body = t.changes.map { c =>
      // unchanged-TOAST: updates drop content/size_bytes from the action's
      // columns entirely (absent, not null) — wal2json v2's wire behavior,
      // keeping the fold BYTE-IDENTICAL to v1 renderLine under the flag
      val omit = cfg.toastOmitUpdates && c.kind == "update"
      val columns =
        Seq(col("repo", "text", "\"" + escape(c.repo) + "\""),
          col("path", "text", "\"" + escape(c.path) + "\""),
          col("commit", "text", "\"" + c.commit + "\""),
          col(langCol, "text", "\"" + c.lang + "\"")) ++
          (if (!omit) Seq(col("content", "text", "\"" + escape(c.content) + "\"")) ++
            (if (withSize) Seq(col("size_bytes", "bigint", c.sizeBytes.toString))
             else Nil)
           else Nil)
      val tbl = escape(c.table)
      c.kind match {
        case "insert" =>
          s"""{"action":"I","schema":"public","table":"$tbl","columns":[${columns.mkString(",")}]}"""
        case "update" =>
          s"""{"action":"U","schema":"public","table":"$tbl","columns":[${columns.mkString(",")}]${identity(c)}}"""
        case "delete" =>
          s"""{"action":"D","schema":"public","table":"$tbl"${identity(c)}}"""
      }
    }
    (s"""{"action":"B","xid":${t.xid}}""" +: body) :+ """{"action":"C"}"""
  }
}
