package graft.util

import java.io.File

/** Tiny shared filesystem/JSON helpers (no library dependency drift). */
object Fs {

  def deleteRecursive(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[File]).foreach(deleteRecursive)
    f.delete()
  }

  /** JSON string escape: backslash, quote, and ALL control chars
    * (< 0x20) — a tab or CR in an embedded string would otherwise break
    * the consumer's JSON parse. */
  def jsonEscape(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case '\r' => "\\r"; case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
