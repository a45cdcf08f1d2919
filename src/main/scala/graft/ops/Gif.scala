package graft.ops

import scala.collection.mutable

/** Pure-JVM GIF89a codec — single-frame, non-interlaced, global
  * 2^n-entry palette, table-based LZW image data. The multimodal
  * family's SECOND compressed format, chosen because GIF's LZW is a
  * fundamentally different compression algorithm from PNG's DEFLATE
  * (`ops/Png.scala`): a growing-dictionary code stream with variable
  * code width (3..12 bits, LSB-first bit packing) instead of
  * Huffman+LZ77 — so "compressed decode works" is evidenced on two
  * independent algorithm families. No AWT/ImageIO — works headless on
  * executors and keeps the byte layout under this code's control.
  *
  * Layout: "GIF89a"; logical screen descriptor (width u16le, height
  * u16le, packed flags, bg index, aspect); global color table
  * (3·2^(n+1) bytes); optional extension blocks (0x21, skipped by
  * sub-block length); image descriptor (0x2C, left/top/size, packed);
  * LZW minimum code size byte; data sub-blocks (len, bytes…, 0);
  * trailer 0x3B.
  *
  * LZW per the GIF spec: clear = 2^mcs, EOI = clear+1, first dynamic
  * code = clear+2. The DECODER adds one dictionary entry per data code
  * after the first and widens the code size when its next free index
  * reaches 2^size (cap 12); the encoder's width bookkeeping MIRRORS the
  * decoder's (which runs one add behind the encoder's own dictionary) —
  * the classic off-by-one that breaks naive implementations exactly at
  * the 2^size boundary, pinned here by a golden-bytes test. A full
  * dictionary is flushed with an explicit CLEAR; the KwKwK
  * self-referential case (`code == next`) is handled; codes beyond the
  * dictionary frontier are refused loudly.
  */
object Gif {

  /** Decoded image: palette indices row-major top-down, plus the
    * palette packed `0xRRGGBB`. */
  final case class Image(width: Int, height: Int, pixels: Array[Int],
                         palette: Array[Int]) {
    def rgb(x: Int, y: Int): Int = palette(pixels(y * width + x))
  }

  /** Hard cap on the decoded raster (same zip-bomb posture as
    * [[Png.decode]]): a 13-byte header can declare 2^32 pixels. */
  val MaxPixels: Int = 1 << 24

  // ----------------------------------------------------------------- encode

  /** Encode a single-frame GIF89a. `palette` is up to 256 packed
    * `0xRRGGBB` entries (padded up to the next power of two ≥ 2);
    * `idx(x, y)` returns the palette index of each pixel. */
  def encode(width: Int, height: Int, palette: Array[Int],
             idx: (Int, Int) => Int): Array[Byte] =
    encodeAnimated(width, height, palette, 1, (_, x, y) => idx(x, y))

  /** Encode an ANIMATED GIF89a: `frames` full-size frames, each behind
    * a Graphic Control Extension; `idx(frame, x, y)` returns the
    * palette index. Frame 1 of 1 degrades to the plain single-image
    * layout minus the control extension. */
  def encodeAnimated(width: Int, height: Int, palette: Array[Int],
                     frames: Int, idx: (Int, Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xFFFF && height <= 0xFFFF,
      s"bad dimensions ${width}x$height")
    require(frames >= 1 && frames <= 1024, s"bad frame count $frames")
    require(palette.nonEmpty && palette.length <= 256,
      s"palette must have 1..256 entries, got ${palette.length}")
    require(1L * width * height * frames <= MaxPixels,
      s"${frames}x${width}x$height exceeds the encoder raster cap")
    // palette size must be a power of two >= 2 on the wire
    var bits = 1
    while ((1 << bits) < palette.length) bits += 1
    val palSize = 1 << bits
    val mcs = math.max(2, bits) // LZW minimum code size (spec floor 2)

    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    u16(width); u16(height)
    out.write(0x80 | ((bits - 1) & 7)) // global table, 2^bits entries
    out.write(0) // background index
    out.write(0) // aspect
    for (i <- 0 until palSize) {
      val c = if (i < palette.length) palette(i) else 0
      out.write((c >> 16) & 0xFF); out.write((c >> 8) & 0xFF); out.write(c & 0xFF)
    }
    for (f <- 0 until frames) {
      if (frames > 1) { // graphic control extension: 10 cs delay
        out.write(0x21); out.write(0xF9); out.write(4)
        out.write(0); out.write(10); out.write(0); out.write(0); out.write(0)
      }
      out.write(0x2C) // image descriptor
      u16(0); u16(0); u16(width); u16(height)
      out.write(0) // no local table, not interlaced
      out.write(mcs)
      writeLzw(out, mcs, palSize, width, height, (x, y) => idx(f, x, y))
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** One frame's LZW code stream + data sub-blocks + terminator.
    *
    * The encoder's own dictionary (`dict`/`encNext`) runs one add
    * AHEAD of the decoder's; code WIDTH must follow the decoder's
    * bookkeeping (`decNext`), which increments once per emitted data
    * code after the first — widening on the encoder's schedule would
    * emit exactly one code per 2^size boundary at the wrong width. */
  private def writeLzw(out: java.io.ByteArrayOutputStream, mcs: Int,
                       palSize: Int, width: Int, height: Int,
                       idx: (Int, Int) => Int): Unit = {
    val bw = new BitWriter
    val clear = 1 << mcs
    val eoi = clear + 1
    var dict = mutable.HashMap.empty[List[Int], Int]
    var encNext = clear + 2
    var decNext = clear + 2
    var codeSize = mcs + 1
    var firstSinceClear = true
    def reset(): Unit = {
      dict = mutable.HashMap.empty
      encNext = clear + 2; decNext = clear + 2
      codeSize = mcs + 1; firstSinceClear = true
    }
    def emitData(code: Int): Unit = {
      bw.put(code, codeSize)
      if (firstSinceClear) firstSinceClear = false
      else if (decNext < 4096) {
        decNext += 1
        if (decNext == (1 << codeSize) && codeSize < 12) codeSize += 1
      }
    }
    bw.put(clear, codeSize)
    // sequences keyed REVERSED (prepend is O(1)); w holds the current
    // run, reversed
    var w = List.empty[Int]
    def codeOf(seq: List[Int]): Int =
      if (seq.tail.isEmpty) seq.head else dict(seq)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val k = idx(x, y)
        require(k >= 0 && k < palSize, s"pixel index $k outside palette at ($x,$y)")
        if (w.isEmpty) w = List(k)
        else {
          val wk = k :: w
          if (dict.contains(wk)) w = wk
          else {
            emitData(codeOf(w))
            dict(wk) = encNext
            encNext += 1
            if (encNext == 4096) { bw.put(clear, codeSize); reset() }
            w = List(k)
          }
        }
        x += 1
      }
      y += 1
    }
    if (w.nonEmpty) emitData(codeOf(w))
    emitData(eoi)
    val data = bw.result()
    var off = 0
    while (off < data.length) { // 255-byte sub-blocks
      val n = math.min(255, data.length - off)
      out.write(n); out.write(data, off, n); off += n
    }
    out.write(0) // block terminator
  }

  // ----------------------------------------------------------------- decode

  /** Decode the FIRST frame (the common single-image case): later
    * frames are neither decoded nor validated — a file whose first
    * frame is intact yields its image even if trailing frames are
    * truncated or use unsupported features, exactly like the
    * pre-animation decoder. */
  def decode(bytes: Array[Byte], maxPixels: Int = MaxPixels): Image =
    walkFrames(bytes, maxPixels, keep = _ == 0, limit = 1).head._2

  /** Decode EVERY frame of a (possibly animated) GIF. */
  def decodeFrames(bytes: Array[Byte],
                   maxPixels: Int = MaxPixels): Seq[Image] =
    walkFrames(bytes, maxPixels, keep = _ => true, limit = Int.MaxValue)
      .map(_._2)

  /** Decode only the frames whose INDEX passes `keep` — skipped frames
    * are walked by sub-block length (no LZW work), the frame-sampling
    * fast path. Returns (frameIdx, image) pairs. */
  def decodeFramesBy(bytes: Array[Byte], keep: Int => Boolean,
                     maxPixels: Int = MaxPixels): Seq[(Int, Image)] =
    walkFrames(bytes, maxPixels, keep, limit = Int.MaxValue)

  /** The block walker: extensions skipped, each image descriptor's
    * raster LZW-decoded independently iff its index passes `keep`;
    * stops early once `limit` kept frames are decoded. Kept frames
    * must be full-canvas at (0,0) — partial-region frame composition
    * (disposal semantics) is refused loudly, not silently
    * mis-rendered. `maxPixels` caps the total DECODED raster (skipped
    * frames allocate nothing). */
  private def walkFrames(bytes: Array[Byte], maxPixels: Int,
                         keep: Int => Boolean,
                         limit: Int): Seq[(Int, Image)] = {
    def fail(kind: String, msg: String): Nothing =
      Decode.fail(kind, s"GIF decode: $msg")
    def u8(i: Int): Int = {
      if (i < 0 || i >= bytes.length) fail("truncated", s"truncated at byte $i")
      bytes(i) & 0xFF
    }
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (bytes.length < 13) fail("malformed", "shorter than the 13-byte header")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF89a" && sig != "GIF87a") fail("bad_magic", s"bad signature '$sig'")
    val packed = u8(10)
    if ((packed & 0x80) == 0) fail("malformed", "no global color table")
    val palBits = (packed & 7) + 1
    val palSize = 1 << palBits
    var pos = 13
    val palette = new Array[Int](palSize)
    for (i <- 0 until palSize) {
      palette(i) = (u8(pos) << 16) | (u8(pos + 1) << 8) | u8(pos + 2)
      pos += 3
    }
    val frames = Seq.newBuilder[(Int, Image)]
    var frameIdx = 0
    var kept = 0
    var totalPixels = 0L
    var done = false
    while (!done) {
      u8(pos) match {
        case 0x21 => // extension: skip by sub-block lengths
          pos += 2 // introducer + label
          var n = u8(pos)
          while (n != 0) { pos += 1 + n; n = u8(pos) }
          pos += 1
        case 0x3B => done = true
        case 0x2C =>
          val wanted = keep(frameIdx)
          if (wanted && (u16(pos + 1) != 0 || u16(pos + 3) != 0))
            fail("malformed", "partial-region frames not supported")
          val width = u16(pos + 5)
          val height = u16(pos + 7)
          val iPacked = u8(pos + 9)
          if (wanted) {
            if (width <= 0 || height <= 0)
              fail("malformed", s"bad dimensions ${width}x$height")
            totalPixels += 1L * width * height
            if (totalPixels > maxPixels)
              fail("bomb", s"total decoded raster exceeds the $maxPixels-pixel cap")
            if ((iPacked & 0x80) != 0) fail("malformed", "local color tables not supported")
            if ((iPacked & 0x40) != 0) fail("malformed", "interlaced images not supported")
          }
          pos += 10
          val mcs = u8(pos)
          if (wanted && (mcs < 2 || mcs > 11))
            fail("malformed", s"bad LZW minimum code size $mcs")
          pos += 1
          // concatenate this frame's data sub-blocks (skipped frames
          // only hop the lengths — no LZW work, no allocation)
          val data = if (wanted) new java.io.ByteArrayOutputStream() else null
          var n = u8(pos)
          while (n != 0) {
            if (pos + 1 + n > bytes.length) fail("truncated", "truncated data sub-block")
            if (wanted) data.write(bytes, pos + 1, n)
            pos += 1 + n
            n = u8(pos)
          }
          pos += 1 // past the 0 terminator
          if (wanted) {
            frames += frameIdx -> decodeRaster(data.toByteArray, mcs, width,
              height, palSize, palette, fail)
            kept += 1
            if (kept >= limit) done = true
          }
          frameIdx += 1
        case b => fail("malformed", f"unexpected block 0x$b%02x")
      }
    }
    val out = frames.result()
    if (out.isEmpty) fail("malformed",
      if (frameIdx == 0) "no image descriptor" else "no frame passed the keep filter")
    out
  }

  /** LZW-decompress one frame's concatenated sub-block data:
    * dictionary as (prefix code, appended index); roots are single
    * palette indices. */
  private def decodeRaster(data: Array[Byte], mcs: Int, width: Int,
                           height: Int, palSize: Int, palette: Array[Int],
                           fail: (String, String) => Nothing): Image = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val pixels = new Array[Int](width * height)
    var out = 0
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var next = clear + 2
    var codeSize = mcs + 1
    val br = new BitReader(data)
    def firstOf(code: Int): Int = {
      var c = code
      while (c >= clear + 2) c = prefix(c)
      c
    }
    def emit(code: Int): Unit = {
      var stack = List.empty[Int]
      var c = code
      while (c >= clear + 2) { stack = suffix(c) :: stack; c = prefix(c) }
      stack = c :: stack
      stack.foreach { v =>
        if (v >= palSize) fail("malformed", s"pixel index $v outside the $palSize-entry palette")
        if (out >= pixels.length) fail("malformed", "LZW stream longer than the declared raster")
        pixels(out) = v; out += 1
      }
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = br.take(codeSize).getOrElse(fail("truncated", "LZW stream truncated"))
      if (code == clear) { next = clear + 2; codeSize = mcs + 1; prev = -1 }
      else if (code == eoi) done = true
      else if (prev < 0) {
        if (code >= palSize) fail("malformed", s"first code $code after clear is not a root")
        emit(code); prev = code
      } else {
        if (code >= palSize && code < clear + 2) fail("malformed", s"reserved code $code")
        if (code > next) fail("malformed", s"code $code beyond dictionary frontier $next")
        val head = if (code < next) firstOf(code) else firstOf(prev) // KwKwK
        if (next < 4096) {
          // add BEFORE emitting so the KwKwK code references a real entry
          prefix(next) = prev; suffix(next) = head
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        } else if (code == next) fail("malformed", "KwKwK reference into a full dictionary")
        emit(code)
        prev = code
      }
    }
    if (out != pixels.length)
      fail("malformed", s"decoded $out of ${pixels.length} pixels")
    Image(width, height, pixels, palette)
  }

  /** LSB-first bit writer (GIF packs code streams little-endian within
    * each byte). */
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nbits = 0
    def put(code: Int, width: Int): Unit = {
      acc |= (code.toLong & ((1L << width) - 1)) << nbits
      nbits += width
      while (nbits >= 8) {
        out.write((acc & 0xFF).toInt); acc >>>= 8; nbits -= 8
      }
    }
    def result(): Array[Byte] = {
      if (nbits > 0) out.write((acc & 0xFF).toInt)
      out.toByteArray
    }
  }

  private final class BitReader(data: Array[Byte]) {
    private var acc = 0L
    private var nbits = 0
    private var pos = 0
    def take(width: Int): Option[Int] = {
      while (nbits < width) {
        if (pos >= data.length) return None
        acc |= (data(pos) & 0xFFL) << nbits
        pos += 1; nbits += 8
      }
      val v = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; nbits -= width
      Some(v)
    }
  }
}
