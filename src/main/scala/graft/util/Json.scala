package graft.util

/** Shared wal2json-compatible JSON string escaping — used by the
  * wal2json-line generator AND the pgoutput transcoder so the two can
  * never drift apart (they must render byte-identical lines for the
  * same logical values). */
object Json {
  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
