package graft.util

import java.io.File

/** Tiny shared filesystem/JSON helpers (no library dependency drift). */
object Fs {

  /** 64-bit MD5-prefix hex digest of an identity string — work-dir and
    * derived-name keying. NOT `hashCode`: 32-bit hashes collide across
    * realistic identity sets and `math.abs(Int.MinValue)` is negative;
    * a collision here wipes another run's ACTIVE work area. */
  def digest(identity: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(identity.getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString

  /** Deterministic per-(purpose, identity) scratch dir under tmpdir.
    * Returns the path only — callers own wipe/create sequencing (Derby
    * needs a shutdown BEFORE the wipe, streaming wipes immediately). */
  def workDir(purpose: String, identity: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${purpose}_${digest(identity)}"

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
