package graft.ops

/** Pure-JVM BMP (Windows bitmap) codec — 24bpp uncompressed `BI_RGB`,
  * the format every tool emits by default. Replaces the multimodal
  * stub decoder (VERDICT r4 #4) so `multimodal_decode` gates on REAL
  * pixel decoding: file header, `BITMAPINFOHEADER`, bottom-up (and
  * top-down, negative-height) row order, BGR byte order, 4-byte row
  * padding. No AWT/ImageIO — works headless on executors and keeps the
  * byte layout under this code's control.
  *
  * Layout (little-endian):
  *  - BITMAPFILEHEADER, 14 bytes: "BM", file size u32, 4 reserved, data
  *    offset u32;
  *  - BITMAPINFOHEADER, 40 bytes: header size u32=40, width i32,
  *    height i32 (>0 = bottom-up), planes u16=1, bpp u16=24,
  *    compression u32=0 (BI_RGB), image size u32, resolutions,
  *    palette counts;
  *  - pixel array: rows padded to 4 bytes, each pixel B,G,R.
  */
object Bmp {

  /** Decoded image: pixels packed `0xRRGGBB`, row-major, TOP-DOWN
    * regardless of the file's row order. */
  final case class Image(width: Int, height: Int, pixels: Array[Int])

  import LittleEndian.{i32, put16, put32, u16}

  private def rowSize(width: Int): Int = (3 * width + 3) & ~3
  /** Stride in LONG arithmetic — `3 * width + 3` overflows Int for
    * widths a hostile header can declare. */
  private def rowSizeL(width: Int): Long = (3L * width + 3) & ~3L

  /** Encode a 24bpp bottom-up BMP; `rgb(x, y)` is asked for each pixel
    * in top-down coordinates and must return channel values in 0-255. */
  def encode(width: Int, height: Int,
             rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    // BigInt like the decode path: rowSizeL * height can overflow even
    // Long for dimensions near 2^31, wrapping negative past the guard
    require(BigInt(rowSizeL(width)) * height <= Int.MaxValue - 54,
      s"image ${width}x$height exceeds the single-array BMP encoder")
    val stride = rowSize(width)
    val dataSize = stride * height
    val out = new Array[Byte](54 + dataSize) // padding bytes stay 0
    out(0) = 'B'; out(1) = 'M'
    put32(out, 2, out.length)
    put32(out, 10, 54) // pixel data offset
    put32(out, 14, 40) // BITMAPINFOHEADER
    put32(out, 18, width)
    put32(out, 22, height) // positive: bottom-up
    put16(out, 26, 1) // planes
    put16(out, 28, 24) // bpp
    put32(out, 30, 0) // BI_RGB
    put32(out, 34, dataSize)
    var y = 0
    while (y < height) {
      // file row 0 is the BOTTOM image row
      val base = 54 + (height - 1 - y) * stride
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        out(base + 3 * x) = b.toByte
        out(base + 3 * x + 1) = g.toByte
        out(base + 3 * x + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a 24bpp uncompressed BMP (bottom-up or top-down). Loud
    * failures on anything else — a media pipeline must never
    * misinterpret bytes silently. */
  def decode(bytes: Array[Byte]): Image = {
    Decode.req(bytes != null && bytes.length >= 54, "truncated",
      "truncated BMP header")
    Decode.req(bytes(0) == 'B' && bytes(1) == 'M', "bad_magic",
      "not a BMP (no BM magic)")
    val dataOffset = i32(bytes, 10)
    val headerSize = i32(bytes, 14)
    Decode.req(headerSize >= 40, "malformed",
      s"unsupported DIB header size $headerSize")
    val width = i32(bytes, 18)
    val rawHeight = i32(bytes, 22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    Decode.req(width > 0 && height > 0, "malformed",
      s"bad dimensions ${width}x$rawHeight")
    Decode.req(u16(bytes, 28) == 24, "malformed",
      s"unsupported bpp ${u16(bytes, 28)} (only 24)")
    Decode.req(i32(bytes, 30) == 0, "malformed",
      s"unsupported compression ${i32(bytes, 30)}")
    // bounds math in LONG: a hostile header's dataOffset (negative i32)
    // or stride*height (Int overflow for huge declared dimensions) must
    // hit THIS loud guard, not a NegativeArraySize/ArrayIndexOOB crash
    // deep in the pixel loop
    Decode.req(dataOffset >= 54 && dataOffset <= bytes.length, "malformed",
      s"bad pixel-data offset $dataOffset")
    // BigInt: stride(width) * height itself can exceed Long for hostile
    // 2^31-scale dimensions — the check must not be the thing that wraps
    Decode.req(BigInt(bytes.length) >=
        BigInt(dataOffset) + BigInt(rowSizeL(width)) * height,
      "truncated", "truncated pixel array")
    // the long-checked bound caps 3*w*h at bytes.length, so w*h and the
    // Int stride below are safely inside Int range
    val stride = rowSize(width)
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val fileRow = if (topDown) y else height - 1 - y
      val base = dataOffset + fileRow * stride
      var x = 0
      while (x < width) {
        val b = bytes(base + 3 * x) & 0xff
        val g = bytes(base + 3 * x + 1) & 0xff
        val r = bytes(base + 3 * x + 2) & 0xff
        px(y * width + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    Image(width, height, px)
  }
}
