package graft.ops

/** Pure-JVM baseline JPEG codec (ITU-T T.81 baseline sequential DCT,
  * Huffman entropy coding) — the third compressed image family beside
  * PNG's DEFLATE ([[Png]]) and GIF's LZW ([[Gif]]), and the first LOSSY
  * transform-coding one (VERDICT r6 #5): real corpora are
  * JPEG-dominated. No AWT/ImageIO — works headless on executors.
  *
  * Decoder scope (loud `require` on anything else): baseline sequential
  * (SOF0), 8-bit precision, 1 or 3 components, no chroma subsampling
  * (all sampling factors 1×1 — 4:4:4), Huffman coding, optional restart
  * markers (DRI/RSTn). Progressive (SOF2), arithmetic coding and
  * hierarchical modes fail loudly — a media pipeline must never
  * misinterpret bytes silently. YCbCr→RGB uses the classic fixed-point
  * integer formula (×65536 constants, `>> 16` floor shift), so decoded
  * channels are EXACT integers the DuckDB oracle replays with floor
  * division — no float-rounding drift between engines.
  *
  * Hostile-header posture mirrors [[Png]]: the SOF dimensions are
  * attacker-controlled and the raster allocation happens before any
  * entropy decode, so a `maxPixels` cap guards the zip-bomb class;
  * segment lengths are bounds-checked; Huffman tables are validated
  * (code counts per length must fit the canonical tree); a truncated
  * entropy stream hits a loud require, not an infinite loop.
  *
  * The encoder exists to build gate fixtures: per-8×8-block CONSTANT
  * YCbCr values, quantization tables of all ones. A constant block's
  * FDCT is DC-only (DC = 8·(value−128), every AC exactly zero), so the
  * lossy pipeline is exact on these inputs and the oracle can replay
  * the block formula in closed form — while the decoder still runs the
  * full marker walk, Huffman decode, dequantize, IDCT and color
  * conversion on real JPEG bytes. */
object Jpeg {

  /** Decoded image: pixels packed `0xRRGGBB`, row-major, top-down. */
  final case class Image(width: Int, height: Int, pixels: Array[Int])

  /** Decoder raster-size cap (pixels) — see [[Png.MaxPixels]]. */
  val MaxPixels: Int = 1 << 26

  /** Zig-zag scan order: zigzag(k) = raster index of the k-th coefficient. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Separable-IDCT basis: t(u)(x) = ½·C(u)·cos((2x+1)uπ/16). */
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Annex-K luminance DC Huffman spec (BITS per code length 1..16,
    * then the 12 category symbols) — public ITU-T T.81 table K.3. */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array.tabulate(12)(identity)

  // ---------------------------------------------------------------- encode

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (spec padding). */
    def flush(): Unit = if (nBits > 0) {
      acc = (acc << (8 - nBits)) | ((1 << (8 - nBits)) - 1)
      out.write(acc & 0xff)
      if ((acc & 0xff) == 0xff) out.write(0x00)
      acc = 0; nBits = 0
    }
  }

  /** Canonical code assignment per T.81 C.2: (code, length) per symbol. */
  private def canonicalCodes(bits: Array[Int],
                             vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val m = scala.collection.mutable.Map[Int, (Int, Int)]()
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        m(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    m.toMap
  }

  /** Encode a baseline JPEG of `wb`×`hb` blocks (8·wb × 8·hb pixels)
    * where block (bx, by) holds the CONSTANT YCbCr triple `ycc(bx, by)`
    * (channels 0-255). Quant tables are all ones; `restartInterval > 0`
    * writes DRI and RSTn markers every that many MCUs (exercising the
    * decoder's restart path). */
  def encode(wb: Int, hb: Int, ycc: (Int, Int) => (Int, Int, Int),
             restartInterval: Int = 0): Array[Byte] = {
    require(wb > 0 && hb > 0, s"bad block dimensions ${wb}x$hb")
    require(BigInt(8 * wb) * (8 * hb) <= MaxPixels,
      s"image ${8 * wb}x${8 * hb} exceeds the encoder's $MaxPixels-pixel cap")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def segment(m: Int, data: Array[Int]): Unit = {
      marker(m)
      val len = data.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      data.foreach(b => out.write(b & 0xff))
    }
    marker(0xd8) // SOI
    // DQT: table 0, 8-bit, all ones
    segment(0xdb, Array(0x00) ++ Array.fill(64)(1))
    // SOF0: 8-bit, 3 components, all 1x1 sampling, quant table 0
    val w = 8 * wb; val h = 8 * hb
    segment(0xc0, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff,
      w & 0xff, 3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0))
    // DHT: DC table 0 (Annex-K categories) + AC table 0 (EOB only)
    segment(0xc4, Array(0x00) ++ DcBits ++ DcVals)
    val acBits = Array(1) ++ Array.fill(15)(0)
    segment(0xc4, Array(0x10) ++ acBits ++ Array(0x00))
    if (restartInterval > 0)
      segment(0xdd, Array((restartInterval >> 8) & 0xff, restartInterval & 0xff))
    // SOS: 3 components, DC/AC table 0 each
    segment(0xda, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))

    val dcCodes = canonicalCodes(DcBits, DcVals)
    val acCodes = canonicalCodes(acBits, Array(0x00))
    val (eobCode, eobLen) = acCodes(0x00)
    val bw = new BitWriter(out)
    val pred = new Array[Int](3)
    var mcu = 0
    var rst = 0
    var by = 0
    while (by < hb) {
      var bx = 0
      while (bx < wb) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          marker(0xd0 + rst) // RSTn
          rst = (rst + 1) % 8
          java.util.Arrays.fill(pred, 0)
        }
        val (yv, cb, cr) = ycc(bx, by)
        val comps = Array(yv, cb, cr)
        var c = 0
        while (c < 3) {
          val v = comps(c)
          require(v >= 0 && v <= 255, s"bad component value $v")
          val dc = 8 * (v - 128)
          val diff = dc - pred(c)
          pred(c) = dc
          val t = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
          val (code, len) = dcCodes(t)
          bw.write(code, len)
          if (t > 0) {
            val payload = if (diff >= 0) diff else diff + (1 << t) - 1
            bw.write(payload, t)
          }
          bw.write(eobCode, eobLen) // all 63 ACs zero
          c += 1
        }
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  /** Canonical Huffman decode table: per code length, the first code
    * value and the index of its first symbol (T.81 F.2.2.3 DECODE). */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        } else maxCode(l) = -1
        Decode.req(code <= (1 << l), "malformed",
          s"invalid Huffman table: ${bits(l - 1)} codes of length $l overflow the tree")
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int =
      vals(valPtr(len) + code - minCode(len))
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    /** Next entropy-coded byte; FF00 unstuffs to FF; a bare marker in
      * the stream is a loud error (handled at restart boundaries only). */
    private def nextByte(): Int = {
      Decode.req(pos < bytes.length, "truncated", "truncated entropy-coded stream")
      val b = bytes(pos) & 0xff
      pos += 1
      if (b == 0xff) {
        Decode.req(pos < bytes.length, "truncated",
          "truncated entropy-coded stream after FF")
        val b2 = bytes(pos) & 0xff
        if (b2 == 0x00) { pos += 1; 0xff }
        else Decode.fail("malformed",
          s"unexpected marker FF${"%02x".format(b2)} inside entropy data")
      } else b
    }
    def bit(): Int = {
      if (nBits == 0) { acc = nextByte(); nBits = 8 }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(t: HuffTable): Int = {
      var code = bit()
      var len = 1
      while (t.maxCode(len) < 0 || code > t.maxCode(len)) {
        len += 1
        Decode.req(len <= 16, "malformed",
          "corrupt Huffman code (no match within 16 bits)")
        code = (code << 1) | bit()
      }
      t.value(len, code)
    }
    /** Align to a byte boundary and consume an expected RSTn marker. */
    def restart(expected: Int): Unit = {
      nBits = 0
      Decode.req(pos + 2 <= bytes.length, "truncated",
        "truncated stream at restart marker")
      Decode.req((bytes(pos) & 0xff) == 0xff &&
        (bytes(pos + 1) & 0xff) == 0xd0 + expected, "malformed",
        s"expected RST$expected marker, got " +
          f"${bytes(pos) & 0xff}%02x${bytes(pos + 1) & 0xff}%02x")
      pos += 2
    }
  }

  /** T.81 F.2.2.1 EXTEND: map the `t`-bit payload to a signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def clamp(v: Long): Int =
    if (v < 0) 0 else if (v > 255) 255 else v.toInt

  /** Decode a baseline sequential JPEG (see object doc for the exact
    * supported subset and the loud-failure contract). */
  def decode(bytes: Array[Byte], maxPixels: Int = MaxPixels): Image = {
    Decode.req(bytes != null && bytes.length >= 4, "truncated", "truncated JPEG")
    Decode.req((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "malformed", "not a JPEG (bad SOI)")
    var pos = 2
    val qtables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var width = -1; var height = -1
    var nComp = 0
    var compQ: Array[Int] = null
    var restartInterval = 0
    var sofSeen = false
    var result: Image = null

    def u16(p: Int): Int = {
      Decode.req(p + 2 <= bytes.length, "truncated",
        "truncated JPEG (length past EOF)")
      ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    }

    while (result == null) {
      Decode.req(pos + 2 <= bytes.length, "truncated", "truncated JPEG (no EOI)")
      Decode.req((bytes(pos) & 0xff) == 0xff, "malformed",
        f"expected marker, got ${bytes(pos) & 0xff}%02x at $pos")
      val m = bytes(pos + 1) & 0xff
      pos += 2
      m match {
        case 0xd9 => // EOI before SOS+decode completed
          Decode.fail("malformed", "EOI before image data")
        case x if x == 0x01 || (x >= 0xd0 && x <= 0xd7) => // TEM/RSTn: no params
          ()
        case _ =>
          val len = u16(pos)
          Decode.req(len >= 2 && pos + len <= bytes.length, "truncated",
            s"segment length $len overruns the file")
          val body = pos + 2
          val bodyLen = len - 2
          m match {
            case 0xdb => // DQT
              var p = body
              while (p < body + bodyLen) {
                val pq = (bytes(p) >> 4) & 0x0f
                val tq = bytes(p) & 0x0f
                Decode.req(pq == 0, "malformed",
                  s"unsupported 16-bit quant table (Pq=$pq)")
                Decode.req(tq <= 3, "malformed", s"bad quant table id $tq")
                Decode.req(p + 65 <= body + bodyLen, "truncated", "truncated DQT")
                qtables(tq) = Array.tabulate(64)(i => bytes(p + 1 + i) & 0xff)
                p += 65
              }
            case 0xc4 => // DHT
              var p = body
              while (p < body + bodyLen) {
                val tc = (bytes(p) >> 4) & 0x0f
                val th = bytes(p) & 0x0f
                Decode.req(tc <= 1, "malformed", s"bad Huffman table class $tc")
                Decode.req(th <= 3, "malformed", s"bad Huffman table id $th")
                Decode.req(p + 17 <= body + bodyLen, "truncated", "truncated DHT")
                val tbits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
                val n = tbits.sum
                Decode.req(p + 17 + n <= body + bodyLen, "truncated",
                  "truncated DHT values")
                val tvals = Array.tabulate(n)(i => bytes(p + 17 + i) & 0xff)
                val t = new HuffTable(tbits, tvals)
                if (tc == 0) dcTables(th) = t else acTables(th) = t
                p += 17 + n
              }
            case 0xc0 => // SOF0 baseline
              Decode.req(!sofSeen, "malformed", "duplicate SOF")
              Decode.req((bytes(body) & 0xff) == 8, "malformed",
                s"unsupported precision ${bytes(body) & 0xff} (only 8)")
              height = u16(body + 1); width = u16(body + 3)
              Decode.req(width > 0 && height > 0, "malformed",
                s"bad dimensions ${width}x$height")
              Decode.req(BigInt(width) * height <= maxPixels, "bomb",
                s"declared raster ${width}x$height exceeds the $maxPixels-pixel decoder cap")
              nComp = bytes(body + 5) & 0xff
              Decode.req(nComp == 1 || nComp == 3, "malformed",
                s"unsupported component count $nComp (only 1 or 3)")
              Decode.req(bodyLen >= 6 + 3 * nComp, "truncated", "truncated SOF0")
              compQ = new Array[Int](nComp)
              var c = 0
              while (c < nComp) {
                val hv = bytes(body + 7 + 3 * c) & 0xff
                Decode.req(hv == 0x11, "malformed",
                  f"unsupported sampling factors $hv%02x (only 1x1 / 4:4:4)")
                compQ(c) = bytes(body + 8 + 3 * c) & 0xff
                Decode.req(compQ(c) <= 3, "malformed",
                  s"bad quant table selector ${compQ(c)}")
                c += 1
              }
              sofSeen = true
            case 0xc2 =>
              Decode.fail("malformed", "progressive JPEG (SOF2) is not supported")
            case x if x >= 0xc1 && x <= 0xcf && x != 0xc4 && x != 0xc8 =>
              Decode.fail("malformed",
                f"unsupported SOF marker ff$x%02x (baseline only)")
            case 0xc8 =>
              Decode.fail("malformed", "arithmetic coding is not supported")
            case 0xdd => // DRI
              Decode.req(bodyLen == 2, "malformed", s"bad DRI length $len")
              restartInterval = u16(body)
            case 0xda => // SOS
              Decode.req(sofSeen, "malformed", "SOS before SOF0")
              val ns = bytes(body) & 0xff
              Decode.req(ns == nComp, "malformed",
                s"SOS component count $ns != SOF $nComp")
              Decode.req(bodyLen >= 1 + 2 * ns + 3, "truncated",
                "truncated SOS header")
              val dcSel = new Array[Int](nComp)
              val acSel = new Array[Int](nComp)
              var c = 0
              while (c < nComp) {
                dcSel(c) = (bytes(body + 2 + 2 * c) >> 4) & 0x0f
                acSel(c) = bytes(body + 2 + 2 * c) & 0x0f
                Decode.req(dcSel(c) <= 3 && acSel(c) <= 3, "malformed",
                  s"bad Huffman table selector ${dcSel(c)}/${acSel(c)}")
                c += 1
              }
              result = decodeScan(bytes, pos + len, width, height, nComp,
                compQ, qtables, dcSel.map(dcTables), acSel.map(acTables),
                restartInterval)
            case _ => () // APPn / COM / other: skip
          }
          pos += len
      }
    }
    result
  }

  /** Entropy-coded scan → raster (the full MCU walk + IDCT + color). */
  private def decodeScan(bytes: Array[Byte], start: Int, width: Int,
                         height: Int, nComp: Int, compQ: Array[Int],
                         qtables: Array[Array[Int]],
                         dcT: Array[HuffTable], acT: Array[HuffTable],
                         restartInterval: Int): Image = {
    (0 until nComp).foreach { c =>
      Decode.req(qtables(compQ(c)) != null, "malformed",
        s"component $c references missing quant table ${compQ(c)}")
      Decode.req(dcT(c) != null && acT(c) != null, "malformed",
        s"component $c references a missing Huffman table")
    }
    val wb = (width + 7) / 8; val hb = (height + 7) / 8
    val br = new BitReader(bytes, start)
    val pred = new Array[Int](nComp)
    // per-component full-resolution planes (4:4:4 — one block per comp/MCU)
    val planes = Array.fill(nComp)(new Array[Int](wb * 8 * hb * 8))
    val coef = new Array[Int](64)
    val tmp = Array.ofDim[Double](8, 8)
    var mcu = 0
    var rst = 0
    var by = 0
    while (by < hb) {
      var bx = 0
      while (bx < wb) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart(rst)
          rst = (rst + 1) % 8
          java.util.Arrays.fill(pred, 0)
        }
        var c = 0
        while (c < nComp) {
          java.util.Arrays.fill(coef, 0)
          val q = qtables(compQ(c))
          // DC
          val t = br.decode(dcT(c))
          Decode.req(t <= 15, "malformed", s"bad DC category $t")
          pred(c) += extend(br.receive(t), t)
          coef(0) = pred(c) * q(0)
          // AC run-length
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val rs = br.decode(acT(c))
            val r = (rs >> 4) & 0x0f; val s = rs & 0x0f
            if (s == 0) {
              if (r == 15) k += 16 // ZRL
              else eob = true
            } else {
              k += r
              Decode.req(k < 64, "malformed",
                s"AC coefficient index $k past block end")
              coef(ZigZag(k)) = extend(br.receive(s), s) * q(k)
              k += 1
            }
          }
          // separable IDCT: tmp(u, y) = Σv basis(v)(y)·F(u,v)
          var u = 0
          while (u < 8) {
            var y = 0
            while (y < 8) {
              var acc = 0.0
              var v = 0
              while (v < 8) { acc += Basis(v)(y) * coef(8 * v + u); v += 1 }
              tmp(u)(y) = acc
              y += 1
            }
            u += 1
          }
          val plane = planes(c)
          var y2 = 0
          while (y2 < 8) {
            var x = 0
            while (x < 8) {
              var acc = 0.0
              var u2 = 0
              while (u2 < 8) { acc += Basis(u2)(x) * tmp(u2)(y2); u2 += 1 }
              plane((by * 8 + y2) * (wb * 8) + bx * 8 + x) =
                clamp(math.round(acc) + 128)
              x += 1
            }
            y2 += 1
          }
          c += 1
        }
        mcu += 1
        bx += 1
      }
      by += 1
    }

    // crop to declared dims; YCbCr→RGB in exact fixed-point integers
    val px = new Array[Int](width * height)
    val stride = wb * 8
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val i = y * stride + x
        val rgb =
          if (nComp == 1) {
            val g = planes(0)(i); (g << 16) | (g << 8) | g
          } else {
            val yy = planes(0)(i)
            val cb = planes(1)(i) - 128
            val cr = planes(2)(i) - 128
            val r = clamp(yy + ((91881L * cr + 32768) >> 16))
            val g = clamp(yy + ((-22554L * cb - 46802L * cr + 32768) >> 16))
            val b = clamp(yy + ((116130L * cb + 32768) >> 16))
            (r << 16) | (g << 8) | b
          }
        px(y * width + x) = rgb
        x += 1
      }
      y += 1
    }
    Image(width, height, px)
  }
}
