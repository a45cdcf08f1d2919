package graft.ops

import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater}

/** Pure-JVM PNG codec — 8-bit-per-channel truecolor RGB (color type 2),
  * non-interlaced: the subset every PNG writer emits for photographic
  * RGB. Extends the multimodal family from uncompressed BMP to a
  * COMPRESSED container (VERDICT r5 #5): the pixel stream is a zlib
  * deflate of per-row filtered scanlines, decoded here with
  * `java.util.zip.Inflater` and all five PNG filter types (None, Sub,
  * Up, Average, Paeth). No AWT/ImageIO — works headless on executors.
  *
  * Layout: 8-byte signature; then chunks of
  * `length u32-BE | type (4 ASCII) | data | CRC32(type+data) u32-BE`:
  * IHDR (width u32, height u32, bit depth 8, color type 2,
  * compression 0, filter 0, interlace 0), one or more IDAT holding the
  * zlib stream of `height` scanlines (`filter byte + 3·width bytes`
  * each), IEND.
  *
  * Hostile-header posture mirrors [[Bmp]]: loud `require`s on magic,
  * CRC, declared dimensions, chunk bounds — plus a decoder-side
  * `maxPixels` cap, because a COMPRESSED container can declare a raster
  * vastly larger than its own byte size (the zip-bomb class the
  * uncompressed BMP bounds-check structurally cannot hit). */
object Png {

  /** Decoded image: pixels packed `0xRRGGBB`, row-major, top-down. */
  final case class Image(width: Int, height: Int, pixels: Array[Int])

  private val Sig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Decoder raster-size cap (pixels): the IHDR is attacker-controlled
    * and the raster allocation happens before any inflate — a 2^31-pixel
    * declaration must hit a loud require, not an OOM. */
  val MaxPixels: Int = 1 << 26

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def putBe32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
    out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Predictor for byte `i` of a row given the RAW (unfiltered) current
    * and previous rows — shared by the encode (subtract) and decode
    * (add) directions so the two cannot drift. */
  private def predictor(filter: Int, cur: Array[Byte], prev: Array[Byte],
                        i: Int): Int = {
    val left = if (i >= 3) cur(i - 3) & 0xff else 0
    val up = prev(i) & 0xff
    val upLeft = if (i >= 3) prev(i - 3) & 0xff else 0
    filter match {
      case 0 => 0
      case 1 => left
      case 2 => up
      case 3 => (left + up) >> 1
      case 4 => paeth(left, up, upLeft)
    }
  }

  /** Encode an 8-bit RGB PNG; `rgb(x, y)` is asked for each pixel
    * top-down, channels 0-255. `filterFor(y)` picks the row's filter
    * type (0-4) — fixtures rotate it so a decode gate exercises every
    * filter path, not just None. */
  def encode(width: Int, height: Int, rgb: (Int, Int) => (Int, Int, Int),
             filterFor: Int => Int = _ => 0): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(BigInt(width) * height <= MaxPixels,
      s"image ${width}x$height exceeds the encoder's $MaxPixels-pixel cap")
    val stride = 3 * width
    val raw = new Array[Byte]((stride + 1) * height)
    val cur = new Array[Byte](stride)
    val prev = new Array[Byte](stride)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        cur(3 * x) = r.toByte; cur(3 * x + 1) = g.toByte; cur(3 * x + 2) = b.toByte
        x += 1
      }
      val f = filterFor(y)
      require(f >= 0 && f <= 4, s"bad filter type $f for row $y")
      val base = y * (stride + 1)
      raw(base) = f.toByte
      var i = 0
      while (i < stride) {
        raw(base + 1 + i) = ((cur(i) & 0xff) - predictor(f, cur, prev, i)).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }

    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig, 0, Sig.length)
    def chunk(kind: String, data: Array[Byte]): Unit = {
      putBe32(out, data.length.toLong)
      val t = kind.getBytes("US-ASCII")
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = new CRC32()
      crc.update(t); crc.update(data)
      putBe32(out, crc.getValue)
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    putBe32(ihdr, width.toLong); putBe32(ihdr, height.toLong)
    ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    val defl = new Deflater()
    defl.setInput(raw); defl.finish()
    val zbuf = new Array[Byte](raw.length + 64)
    val zout = new java.io.ByteArrayOutputStream()
    while (!defl.finished()) {
      val n = defl.deflate(zbuf)
      zout.write(zbuf, 0, n)
    }
    defl.end()
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** Decode an 8-bit RGB non-interlaced PNG. Loud failures on anything
    * else — a media pipeline must never misinterpret bytes silently. */
  def decode(bytes: Array[Byte], maxPixels: Int = MaxPixels): Image = {
    Decode.req(bytes != null && bytes.length >= Sig.length + 25 + 12,
      "truncated", "truncated PNG (shorter than signature + IHDR + IEND)")
    Decode.req(Sig.indices.forall(i => bytes(i) == Sig(i)), "bad_magic",
      "not a PNG (bad signature)")

    var pos = Sig.length
    var width = -1; var height = -1
    var ihdrSeen = false; var iendSeen = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!iendSeen) {
      Decode.req(pos + 12 <= bytes.length, "truncated",
        "truncated PNG (chunk header past EOF)")
      val len = be32(bytes, pos)
      // u32 length in LONG math: a hostile 0xffffffff length must hit
      // this require, not wrap negative into the slice arithmetic
      Decode.req(len >= 0 && pos + 12 + len <= bytes.length, "truncated",
        s"chunk length $len overruns the file")
      val kind = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + len.toInt)
      Decode.req(crc.getValue == be32(bytes, pos + 8 + len.toInt), "bad_crc",
        s"CRC mismatch on $kind chunk")
      kind match {
        case "IHDR" =>
          Decode.req(!ihdrSeen, "malformed", "duplicate IHDR")
          Decode.req(len == 13, "malformed", s"IHDR length $len (want 13)")
          val w = be32(bytes, pos + 8); val h = be32(bytes, pos + 12)
          Decode.req(w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue,
            "malformed", s"bad dimensions ${w}x$h")
          Decode.req(BigInt(w) * h <= maxPixels, "bomb",
            s"declared raster ${w}x$h exceeds the $maxPixels-pixel decoder cap")
          val depth = bytes(pos + 16) & 0xff; val color = bytes(pos + 17) & 0xff
          Decode.req(depth == 8, "malformed",
            s"unsupported bit depth $depth (only 8)")
          Decode.req(color == 2, "malformed",
            s"unsupported color type $color (only 2 = RGB)")
          Decode.req((bytes(pos + 18) & 0xff) == 0, "malformed",
            "unsupported compression method")
          Decode.req((bytes(pos + 19) & 0xff) == 0, "malformed",
            "unsupported filter method")
          Decode.req((bytes(pos + 20) & 0xff) == 0, "malformed",
            s"unsupported interlace ${bytes(pos + 20) & 0xff} (only 0)")
          width = w.toInt; height = h.toInt; ihdrSeen = true
        case "IDAT" =>
          Decode.req(ihdrSeen, "malformed", "IDAT before IHDR")
          idat.write(bytes, pos + 8, len.toInt)
        case "IEND" => iendSeen = true
        case _ =>
          Decode.req(ihdrSeen, "malformed", s"$kind chunk before IHDR")
          () // ancillary chunk: skip
      }
      pos += 12 + len.toInt
    }
    Decode.req(ihdrSeen, "malformed", "no IHDR chunk")
    Decode.req(idat.size() > 0, "malformed", "no IDAT data")

    val stride = 3 * width
    val expected = (stride + 1) * height
    val inflated = new Array[Byte](expected)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    try {
      var n = 1
      while (off < expected && n != 0) {
        n = inf.inflate(inflated, off, expected - off)
        off += n
      }
      Decode.req(off == expected, "truncated",
        s"IDAT inflated to $off bytes, want $expected (truncated stream)")
      val extra = new Array[Byte](1)
      Decode.req(inf.finished() || inf.inflate(extra, 0, 1) == 0, "malformed",
        "IDAT stream holds more data than the declared raster")
    } catch {
      case e: DataFormatException =>
        Decode.fail("malformed", s"corrupt IDAT zlib stream: ${e.getMessage}")
    } finally inf.end()

    val px = new Array[Int](width * height)
    val cur = new Array[Byte](stride)
    val prev = new Array[Byte](stride)
    var y = 0
    while (y < height) {
      val base = y * (stride + 1)
      val f = inflated(base) & 0xff
      Decode.req(f <= 4, "malformed", s"unknown PNG filter type $f on row $y")
      var i = 0
      while (i < stride) {
        cur(i) = ((inflated(base + 1 + i) & 0xff) + predictor(f, cur, prev, i)).toByte
        i += 1
      }
      var x = 0
      while (x < width) {
        px(y * width + x) = ((cur(3 * x) & 0xff) << 16) |
          ((cur(3 * x + 1) & 0xff) << 8) | (cur(3 * x + 2) & 0xff)
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    Image(width, height, px)
  }
}
