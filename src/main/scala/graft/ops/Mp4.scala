package graft.ops

/** Minimal ISO-BMFF (MP4) container codec — the VIDEO leg of the
  * multimodal family. Like the BMP/WAV/PNG/GIF/JPEG siblings this is a
  * pure-JVM implementation of the PUBLIC format (ISO/IEC 14496-12 box
  * structure), built for the per-row `mapPartitions` decode shape:
  * embarrassingly parallel, no shuffle, caps before any allocation.
  *
  * What is REAL here: the box-tree walk (size+fourcc big-endian,
  * container recursion), the sample tables — `stts` (decode timestamps),
  * `stsz` (sizes), `stsc`+`stco` (chunk → file offsets), `stss`
  * (keyframes) — the `mdat` payload extraction those tables address,
  * and keyframe-stride sampling. What is NOT attempted: bitstream
  * decode of a real video codec (out of scope per the round contract —
  * fixtures carry closed-form payload bytes so the oracle can verify
  * the extracted samples exactly).
  *
  * Hostile-input posture (same as `Png.decode`): every box length is
  * bounds-checked against the file, box count and sample count are
  * capped, and stco/stsz addressing is validated against the actual
  * `mdat` extent before any payload read — a forged table cannot read
  * outside the buffer or balloon memory.
  */
object Mp4 {

  val MaxBoxes = 1024
  val MaxSamples = 65536

  final case class Sample(index: Int, offset: Long, size: Int, dts: Long,
                          keyframe: Boolean)
  /** `editMediaTime`/`editDuration`: the first non-dwell `elst` entry
    * (ISO/IEC 14496-12 §8.6.6) — presentation time 0 maps to MEDIA time
    * `editMediaTime`, and the presented extent is `editDuration` ticks
    * (0/0 when the file has no edit list). Re-muxers use this to skip
    * priming samples or to carry codec delay; a time-aligned consumer
    * that reads `stts` only silently misaligns on such files. */
  final case class Movie(timescale: Long, duration: Long, samples: Vector[Sample],
                         mdatOffset: Long, mdatSize: Long,
                         editMediaTime: Long = 0L, editDuration: Long = 0L) {
    def sampleBytes(bytes: Array[Byte], s: Sample): Array[Byte] =
      java.util.Arrays.copyOfRange(bytes, s.offset.toInt, s.offset.toInt + s.size)
  }

  // ---- encoder (fixture writer) ----------------------------------------

  /** Writes a minimal but structurally-honest MP4: `ftyp`, `mdat` with
    * the given frame payloads, and a `moov` whose sample tables address
    * them (one sample per chunk; `stss` marks every `keyStride`-th
    * sample as a sync sample; `stts` one run of `delta`-tick samples). */
  def encode(frames: Seq[Array[Byte]], timescale: Int = 1000, delta: Int = 40,
             keyStride: Int = 2): Array[Byte] =
    encodeWithEdit(frames, timescale, delta, keyStride, primeFrames = Nil)

  /** [[encode]] plus the re-mux pattern the edit list exists for:
    * `primeFrames` are prepended to the media (shifting every content
    * frame's dts by their total duration) and an `edts`/`elst` box maps
    * presentation time 0 to media time `|primeFrames|·delta` with the
    * presented extent covering only the content frames — a player (or
    * an elst-aware sampler) sees EXACTLY the un-edited clip's timeline;
    * an `stts`-only consumer sees the priming samples and misaligns. */
  def encodeWithEdit(frames: Seq[Array[Byte]], timescale: Int = 1000,
                     delta: Int = 40, keyStride: Int = 2,
                     primeFrames: Seq[Array[Byte]] = Nil): Array[Byte] =
    encodeImpl(primeFrames ++ frames, timescale, delta, keyStride,
      if (primeFrames.isEmpty) None
      else Some((frames.length.toLong * delta, primeFrames.length.toLong * delta)))

  private def encodeImpl(frames: Seq[Array[Byte]], timescale: Int, delta: Int,
                         keyStride: Int,
                         edit: Option[(Long, Long)]): Array[Byte] = {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      be32(8L + body.length) ++ tpe.getBytes("US-ASCII") ++ body
    }
    val ftyp = box("ftyp", "isom".getBytes, be32(0), "isom".getBytes)
    val mdatBody = frames.flatten.toArray
    val mdat = box("mdat", mdatBody)
    // absolute payload offsets: ftyp + mdat header precede the body
    val base = ftyp.length + 8
    val offsets = frames.scanLeft(base.toLong)((acc, f) => acc + f.length).init
    val n = frames.length
    val fullHead = be32(0) // version 0 + flags 0
    val mvhd = box("mvhd", fullHead, be32(0), be32(0), be32(timescale.toLong),
      be32(n.toLong * delta), be32(0x00010000L), be32(0x01000000L), // rate, volume+reserved
      new Array[Byte](8), be32(0x00010000L), be32(0), be32(0), be32(0),
      be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x40000000L),
      new Array[Byte](24), be32(2)) // pre_defined, next_track_id
    val mdhd = box("mdhd", fullHead, be32(0), be32(0), be32(timescale.toLong),
      be32(n.toLong * delta), be32(0x55C40000L >> 16), Array[Byte]()) // und lang + pre_defined
    val hdlr = box("hdlr", fullHead, be32(0), "vide".getBytes,
      new Array[Byte](12), "graft\u0000".getBytes)
    val stsd = box("stsd", fullHead, be32(1),
      box("mp4v", new Array[Byte](8))) // dummy sample entry, skipped by the parser
    val stts = box("stts", fullHead, be32(1), be32(n.toLong), be32(delta.toLong))
    val stsz = box("stsz", fullHead, be32(0),
      be32(n.toLong), frames.toArray.flatMap(f => be32(f.length.toLong)))
    val stsc = box("stsc", fullHead, be32(1), be32(1), be32(1), be32(1))
    val stco = box("stco", fullHead, be32(n.toLong),
      offsets.toArray.flatMap(be32))
    val keys = (0 until n).filter(_ % keyStride == 0)
    val stss = box("stss", fullHead, be32(keys.length.toLong),
      keys.toArray.flatMap(k => be32(k + 1L))) // 1-based sample numbers
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco, stss)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = edit match {
      case Some((segDur, mediaTime)) =>
        val elst = box("elst", fullHead, be32(1), be32(segDur),
          be32(mediaTime), be32(0x00010000L)) // rate 1.0
        box("trak", box("edts", elst), mdia)
      case None => box("trak", mdia)
    }
    val moov = box("moov", mvhd, trak)
    ftyp ++ mdat ++ moov
  }

  // ---- parser ----------------------------------------------------------

  /** Parses the box tree and sample tables into a [[Movie]]. Throws
    * IllegalArgumentException with a reason on any structural violation
    * (truncated box, table addressing outside mdat, cap breach). */
  def parse(bytes: Array[Byte], maxSamples: Int = MaxSamples): Movie = {
    def fail(kind: String, msg: String): Nothing =
      Decode.fail(kind, s"mp4: $msg")
    def u32(i: Long): Long = {
      if (i < 0 || i + 4 > bytes.length) fail("truncated", s"read past end at $i")
      val j = i.toInt
      ((bytes(j) & 0xFFL) << 24) | ((bytes(j + 1) & 0xFFL) << 16) |
        ((bytes(j + 2) & 0xFFL) << 8) | (bytes(j + 3) & 0xFFL)
    }
    def fourcc(i: Long): String =
      new String(bytes, i.toInt, 4, "US-ASCII")

    val containers = Set("moov", "trak", "mdia", "minf", "stbl", "edts")
    var boxCount = 0
    var timescale = 0L; var duration = 0L
    var mdatOffset = -1L; var mdatSize = -1L
    var sttsRuns = Vector.empty[(Long, Long)]
    var sizes = Vector.empty[Long]
    var chunkOffsets = Vector.empty[Long]
    var stscEntries = Vector.empty[(Long, Long)] // (first_chunk, samples_per_chunk)
    var syncSamples = Set.empty[Long]
    var editMediaTime = 0L; var editDuration = 0L

    def walk(start: Long, end: Long, depth: Int): Unit = {
      if (depth > 8) fail("malformed", "box nesting too deep")
      var p = start
      while (p < end) {
        boxCount += 1
        if (boxCount > MaxBoxes) fail("malformed", s"more than $MaxBoxes boxes")
        if (p + 8 > end) fail("truncated", s"truncated box header at $p")
        val size = u32(p)
        val tpe = fourcc(p + 4)
        if (size < 8) fail("malformed", s"box '$tpe' size $size < 8 (64-bit sizes unsupported)")
        if (p + size > end) fail("truncated", s"box '$tpe' overruns parent ($size at $p)")
        val body = p + 8
        val bodyEnd = p + size
        tpe match {
          case t if containers(t) => walk(body, bodyEnd, depth + 1)
          case "mdat" => mdatOffset = body; mdatSize = size - 8
          case "mvhd" =>
            timescale = u32(body + 12); duration = u32(body + 16)
          case "stts" =>
            val n = u32(body + 4)
            if (n > maxSamples) fail("bomb", s"stts runs $n over cap")
            sttsRuns = (0L until n).map(i =>
              (u32(body + 8 + i * 8), u32(body + 12 + i * 8))).toVector
          case "stsz" =>
            val fixed = u32(body + 4); val n = u32(body + 8)
            if (n > maxSamples) fail("bomb", s"stsz count $n over cap $maxSamples")
            sizes =
              if (fixed != 0) Vector.fill(n.toInt)(fixed)
              else (0L until n).map(i => u32(body + 12 + i * 4)).toVector
          case "stco" =>
            val n = u32(body + 4)
            if (n > maxSamples) fail("bomb", s"stco count $n over cap")
            chunkOffsets = (0L until n).map(i => u32(body + 8 + i * 4)).toVector
          case "stsc" =>
            val n = u32(body + 4)
            if (n > maxSamples) fail("bomb", s"stsc count $n over cap")
            stscEntries = (0L until n).map(i =>
              (u32(body + 8 + i * 12), u32(body + 12 + i * 12))).toVector
          case "stss" =>
            val n = u32(body + 4)
            if (n > maxSamples) fail("bomb", s"stss count $n over cap")
            syncSamples = (0L until n).map(i => u32(body + 8 + i * 4)).toSet
          case "elst" =>
            // version-0 entries: (segment_duration u32, media_time i32,
            // rate u16.16). The FIRST non-dwell entry (media_time ≠ −1)
            // defines where presentation time 0 lands in media time;
            // later entries (rare in practice) are ignored, like most
            // players do for the priming/delay pattern this models.
            val n = u32(body + 4)
            if (n > maxSamples) fail("bomb", s"elst count $n over cap")
            (0L until n).iterator
              .map(i => (u32(body + 8 + i * 12),
                u32(body + 12 + i * 12).toInt.toLong)) // sign-extend i32
              .find(_._2 != -1L)
              .foreach { case (segDur, mt) =>
                if (mt < 0) fail("malformed", s"elst media_time $mt negative")
                if (editDuration == 0L) { editDuration = segDur; editMediaTime = mt }
              }
          case _ => () // ftyp, hdlr, stsd, free, ... skipped
        }
        p = bodyEnd
      }
      if (p != end) fail("truncated", "box sequence overruns container")
    }
    walk(0L, bytes.length.toLong, 0)

    if (mdatOffset < 0) fail("malformed", "no mdat box")
    if (timescale <= 0) fail("malformed", "no mvhd timescale")
    if (sizes.isEmpty || chunkOffsets.isEmpty || stscEntries.isEmpty)
      fail("malformed", "incomplete sample tables (stsz/stco/stsc)")

    // expand stsc: chunk i (1-based) holds entry.samplesPerChunk samples
    // for the run starting at entry.firstChunk
    val nSamples = sizes.length
    val perChunk = {
      val runs = stscEntries :+ ((chunkOffsets.length + 1L, 0L))
      chunkOffsets.indices.map { ci =>
        val chunk1 = ci + 1L
        val run = runs.sliding(2).collectFirst {
          case Vector((fc, spc), (nfc, _)) if chunk1 >= fc && chunk1 < nfc => spc
        }
        run.getOrElse(fail("malformed", s"chunk $chunk1 not covered by stsc")).toInt
      }
    }
    if (perChunk.map(_.toLong).sum != nSamples)
      fail("malformed", s"stsc maps ${perChunk.sum} samples, stsz declares $nSamples")

    // decode timestamps from stts runs — cap the EXPANDED count before
    // materializing (a forged single run could declare 2^32 samples)
    if (sttsRuns.map(_._1).sum > maxSamples)
      fail("bomb", s"stts expands past cap $maxSamples")
    val dts = sttsRuns.flatMap { case (cnt, delta) =>
      Vector.fill(cnt.toInt)(delta)
    }.scanLeft(0L)(_ + _).init
    if (dts.length != nSamples) fail("malformed", s"stts covers ${dts.length} of $nSamples samples")

    // lay samples into chunks; validate every byte range against mdat
    val mdatEnd = mdatOffset + mdatSize
    var si = 0
    val samples = Vector.newBuilder[Sample]
    chunkOffsets.zipWithIndex.foreach { case (co, ci) =>
      var off = co
      (0 until perChunk(ci)).foreach { _ =>
        val sz = sizes(si)
        if (sz > Int.MaxValue) fail("malformed", s"sample $si size $sz overflows")
        if (off < mdatOffset || off + sz > mdatEnd)
          fail("malformed", s"sample $si [$off, ${off + sz}) outside mdat [$mdatOffset, $mdatEnd)")
        samples += Sample(si, off, sz.toInt, dts(si), syncSamples(si + 1L))
        off += sz
        si += 1
      }
    }
    Movie(timescale, duration, samples.result(), mdatOffset, mdatSize,
      editMediaTime, editDuration)
  }
}
