package graft.ops

/** Pure-JVM WAV (RIFF/PCM) codec — 16-bit signed little-endian PCM,
  * the baseline every audio tool reads and writes. Extends the
  * multimodal family's REAL-decode coverage from images ([[Bmp]]) to
  * audio: RIFF chunk walking (unknown chunks skipped by their declared
  * size), `fmt ` validation, interleaved multi-channel samples. Loud
  * refusal of compressed or non-16-bit payloads — an audio pipeline
  * must never misinterpret bytes silently.
  *
  * Layout (little-endian): "RIFF" + riffSize + "WAVE", then chunks of
  * (4-byte id, u32 size, payload, pad byte if size is odd):
  *  - "fmt ": audioFormat u16 (1 = PCM), channels u16, sampleRate u32,
  *    byteRate u32, blockAlign u16, bitsPerSample u16;
  *  - "data": interleaved frames (ch0, ch1, …), each sample i16.
  */
object Wav {

  /** Decoded clip: `samples(frame * channels + channel)`, exactly as
    * interleaved in the file. */
  final case class Clip(channels: Int, sampleRate: Int, samples: Array[Short]) {
    def frames: Int = if (channels == 0) 0 else samples.length / channels
  }

  import LittleEndian.{i32, put16, put32, u16}

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")
  private def putTag(b: Array[Byte], off: Int, t: String): Unit =
    t.getBytes("US-ASCII").copyToArray(b, off)

  /** Encode interleaved 16-bit PCM frames. `sample(frame, channel)` is
    * asked in interleave order. */
  def encode(channels: Int, sampleRate: Int, frames: Int,
             sample: (Int, Int) => Short): Array[Byte] = {
    require(channels > 0 && frames >= 0 && sampleRate > 0,
      s"bad clip shape: $channels ch, $frames frames, $sampleRate Hz")
    require(2L * frames * channels <= Int.MaxValue - 44,
      s"clip of $frames×$channels frames exceeds the single-array encoder")
    val dataSize = frames * channels * 2
    val out = new Array[Byte](44 + dataSize)
    putTag(out, 0, "RIFF"); put32(out, 4, 36 + dataSize); putTag(out, 8, "WAVE")
    putTag(out, 12, "fmt "); put32(out, 16, 16)
    put16(out, 20, 1) // PCM
    put16(out, 22, channels)
    put32(out, 24, sampleRate)
    put32(out, 28, sampleRate * channels * 2) // byte rate
    put16(out, 32, channels * 2) // block align
    put16(out, 34, 16) // bits per sample
    putTag(out, 36, "data"); put32(out, 40, dataSize)
    var f = 0
    while (f < frames) {
      var c = 0
      while (c < channels) {
        put16(out, 44 + (f * channels + c) * 2, sample(f, c) & 0xffff)
        c += 1
      }
      f += 1
    }
    out
  }

  /** Decode a RIFF/WAVE container holding 16-bit PCM. Chunks other
    * than `fmt `/`data` (LIST, cue, bext, …) are skipped by size. */
  def decode(bytes: Array[Byte]): Clip = {
    Decode.req(bytes != null && bytes.length >= 44, "truncated",
      "truncated WAV header")
    Decode.req(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE", "bad_magic",
      "not a WAV (no RIFF/WAVE magic)")
    var off = 12
    var channels = -1; var sampleRate = -1
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val size = i32(bytes, off + 4)
      // LONG arithmetic: a hostile size near Int.MaxValue would wrap
      // `off + 8 + size` negative and sail past an Int comparison,
      // then OOM on the sample-array allocation instead of failing here
      Decode.req(size >= 0 && off + 8L + size <= bytes.length, "truncated",
        s"chunk '$id' overruns the file")
      id match {
        case "fmt " =>
          Decode.req(size >= 16, "malformed", s"fmt chunk too small: $size")
          val fmt = u16(bytes, off + 8)
          Decode.req(fmt == 1, "malformed",
            s"unsupported audio format $fmt (only PCM)")
          channels = u16(bytes, off + 10)
          sampleRate = i32(bytes, off + 12)
          // loud refusal extends to the fmt fields themselves: a corrupt
          // chunk must not propagate channels=0 or a negative rate into
          // downstream stats
          Decode.req(channels > 0, "malformed", s"bad channel count $channels")
          Decode.req(sampleRate > 0, "malformed", s"bad sample rate $sampleRate")
          val bits = u16(bytes, off + 22)
          Decode.req(bits == 16, "malformed",
            s"unsupported bits/sample $bits (only 16)")
        case "data" =>
          Decode.req(channels > 0, "malformed", "data chunk before fmt chunk")
          Decode.req(size % 2 == 0, "malformed", s"odd PCM16 data size $size")
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = u16(bytes, off + 8 + 2 * i).toShort
            i += 1
          }
        case _ => () // skip unknown chunk
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    Decode.req(samples != null, "malformed", "no data chunk")
    Clip(channels, sampleRate, samples)
  }
}
