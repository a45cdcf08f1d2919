package graft.ops

/** Typed decode failure (VERDICT r13 #3): every codec decode-path guard
  * throws this with an explicit, spec-pinned `kind`, so quarantine
  * classification ([[Multimodal.classifyDecodeError]]) dispatches on
  * TYPE — rewording a guard's human-readable message can no longer
  * silently reclassify an asset. Substring classification remains only
  * as the fallback for FOREIGN exceptions (a deployment wiring codecs
  * this repo does not own).
  *
  * Kinds (the quarantine taxonomy): `bad_crc` (checksum mismatch),
  * `bomb` (declared size over a decode cap — the zip-bomb header),
  * `truncated` (bytes end before the declared structure), `bad_magic`
  * (wrong container/codec signature), `no_keyframes` (structurally
  * valid but no perceptual identity), `malformed` (anything else).
  *
  * Extends IllegalArgumentException so every existing strict-path
  * contract (`intercept[IllegalArgumentException]`, `require`-style
  * messages) holds unchanged.
  */
final class DecodeException(val kind: String, msg: String)
    extends IllegalArgumentException(msg)

object Decode {
  val Kinds: Set[String] =
    Set("bad_crc", "bomb", "truncated", "bad_magic", "no_keyframes", "malformed")

  /** `require` twin carrying the failure kind. Message keeps require's
    * "requirement failed: " prefix so guard text is byte-stable across
    * the migration (oracle reason strings never carried the prefix —
    * classification is on `kind` — but spec assertions on messages do
    * not need to change either way). */
  @inline def req(cond: Boolean, kind: String, msg: => String): Unit =
    if (!cond) fail(kind, msg)

  def fail(kind: String, msg: String): Nothing = {
    assert(Kinds.contains(kind), s"unknown decode kind '$kind'")
    throw new DecodeException(kind, s"requirement failed: $msg")
  }
}
