package graft.tools

/** Tiny JSON-string escaper shared by the gate tools (Chaos/Skew/Spill/
  * Concurrency): the per-scenario artifact lines interpolate exception
  * messages, which can contain quotes, backslashes, and newlines —
  * exactly in the failure cases the gate-*.json artifacts most need to
  * stay machine-readable. */
object GateJson {
  def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'            => sb.append("\\\"")
      case '\\'           => sb.append("\\\\")
      case '\n'           => sb.append("\\n")
      case '\r'           => sb.append("\\r")
      case '\t'           => sb.append("\\t")
      case c if c < 0x20  => sb.append(f"\\u${c.toInt}%04x")
      case c              => sb.append(c)
    }
    sb.toString
  }
}
