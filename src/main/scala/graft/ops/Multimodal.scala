package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride through the engine as
  * opaque `binary` columns with typed metadata alongside (SURVEY §1.3:
  * Cassandra `blob` → `BinaryType`). Decode/feature-extract runs
  * per-partition with a pluggable batch decoder. IMAGE and AUDIO decode
  * are REAL — the pure-JVM [[Bmp]] and [[Wav]] codecs parse actual
  * bitmap/PCM bytes ([[bmpImageStats]], [[wavAudioStats]], both
  * oracle-gated on exact pixel/sample statistics). The generic
  * [[stubDecoder]] remains only for formats whose codecs are not in
  * this container (video) — a clearly-marked deterministic fake with
  * the Spark-side plumbing (schema, binary casts, partition batching,
  * typed output) real and tested.
  */
object Multimodal {

  /** Feature record produced by a decoder. */
  final case class MediaFeature(id: Long, byteLen: Int, width: Int,
                                height: Int, feat: Array[Float])

  /** Batch decoder signature: a whole partition's payloads at once, so a
    * real implementation can amortize codec/model setup per partition
    * (the `mapInPandas` batch shape, in Scala). */
  type Decoder = Iterator[(Long, Array[Byte])] => Iterator[MediaFeature]

  /** STUB: deterministic fake decode — derives pseudo width/height and a
    * 4-dim feature from the bytes. Replace with a real codec in
    * deployment; everything around it stays unchanged. */
  val stubDecoder: Decoder = it => it.map { case (id, bytes) =>
    val len = if (bytes == null) 0 else bytes.length
    val sum = if (bytes == null) 0L else bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
    MediaFeature(id, len, 1 + (sum % 64).toInt, 1 + (len % 64),
      Array(len.toFloat, sum.toFloat, (sum % 7).toFloat, (len % 5).toFloat))
  }

  /** The plumbing: select (id, binary payload) → per-partition batch
    * decode → typed feature Dataset. Binary stays columnar up to the
    * decode boundary; no driver collection anywhere. */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String,
                      decoder: Decoder = stubDecoder): Dataset[MediaFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(decoder)
  }

  /** Per-image pixel statistics from a REAL decode ([[Bmp]]): channel
    * sums plus global min/max — the quantities an oracle can recompute
    * in closed form from a deterministic fixture. All `Long` so both
    * sides compare as BIGINT. */
  final case class ImageStats(id: Long, width: Long, height: Long,
                              sum_r: Long, sum_g: Long, sum_b: Long,
                              px_min: Long, px_max: Long)

  /** Channel sums + global min/max over a packed `0xRRGGBB` raster —
    * shared by every image codec's stats path. */
  private def pixelStats(id: Long, width: Int, height: Int,
                         pixels: Array[Int]): ImageStats = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var mn = 255L; var mx = 0L
    var i = 0
    while (i < pixels.length) {
      val p = pixels(i)
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
      sr += r; sg += g; sb += b
      mn = math.min(mn, math.min(r, math.min(g, b)).toLong)
      mx = math.max(mx, math.max(r, math.max(g, b)).toLong)
      i += 1
    }
    ImageStats(id, width.toLong, height.toLong, sr, sg, sb, mn, mx)
  }

  /** REAL image decode (pure-JVM BMP codec, not the stub): batch shape
    * identical to [[Decoder]] so swapping in a heavier codec changes
    * nothing around it. */
  val bmpImageStats: Iterator[(Long, Array[Byte])] => Iterator[ImageStats] =
    it => it.map { case (id, bytes) =>
      val img = Bmp.decode(bytes)
      pixelStats(id, img.width, img.height, img.pixels)
    }

  /** REAL compressed-image decode (pure-JVM PNG codec, VERDICT r5 #5):
    * zlib-inflated, per-row-filtered scanlines — same batch shape. */
  val pngImageStats: Iterator[(Long, Array[Byte])] => Iterator[ImageStats] =
    it => it.map { case (id, bytes) =>
      val img = Png.decode(bytes)
      pixelStats(id, img.width, img.height, img.pixels)
    }

  /** (id, BMP payload) → per-image pixel statistics, decoded
    * per-partition (same distributed shape as [[extractFeatures]]). */
  def imageStats(df: DataFrame, idCol: String, binCol: String): Dataset[ImageStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(bmpImageStats)
  }

  final case class ImageHash(id: Long, width: Long, height: Long, ahash: Long)

  /** Perceptual average-hash (aHash) from a REAL decode — the image
    * modality's member of the near-dup family: bit `y·w + x` is set
    * iff that pixel's brightness strictly exceeds the image mean, in
    * PURE INTEGER arithmetic (`gray·(w·h) > Σgray` — no division), so
    * the oracle replays the fixtures' closed-form pixels in SQL while
    * the engine path round-trips real encoded bytes through
    * [[Bmp.decode]]. A global brightness shift moves every pixel and
    * the mean together, preserving the bit pattern — the invariance
    * that makes aHash a NEAR-duplicate key rather than a content
    * hash; the fixtures' mod-256 wraparound perturbs a few bits
    * between neighboring ids, giving the pairs gate real Hamming
    * structure. w·h ≤ 48 here, so the hash sits in the low bits of
    * one BIGINT (production 8×8 = 64 bits splits into two words, same
    * plan shape). */
  def imageAHash(df: DataFrame, idCol: String, binCol: String): Dataset[ImageHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img = Bmp.decode(bytes)
        ImageHash(id, img.width.toLong, img.height.toLong, aHashBits(img.pixels))
      })
  }

  final case class PixelFingerprint(id: Long, width: Long, height: Long,
                                    fp: String)

  /** EXACT decoded-pixel fingerprint — the image modality's
    * container-invariant content identity, the still-image analog of
    * [[videoFingerprint]]: md5 over `"w:h:"` + the `r,g,b` triples in
    * raster order (codec sniffed via magic bytes, so a BMP and a PNG
    * of the same raster fingerprint identically — a "re-mux" in image
    * terms). Where [[imageAHash]] answers "looks the same", this
    * answers "IS the same pixels": equality groups are exact-duplicate
    * cliques needing no pair graph or closure — `groupBy(fp)` with a
    * min-id keeper is the whole dedup (the media admission book's
    * exact stage). One shuffle on the 16-byte key at any scale. */
  def imagePixelFingerprint(df: DataFrame, idCol: String,
                            binCol: String): Dataset[PixelFingerprint] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) => pixelFpOne(md, id, bytes) }
      }
  }

  /** Per-asset body of [[imagePixelFingerprint]] (factored so the
    * quarantine tier wraps the identical computation in `Try`). */
  private[graft] def pixelFpOne(md: java.security.MessageDigest, id: Long,
                                bytes: Array[Byte]): PixelFingerprint = {
    val (w, h, px) = decodeImagePayload(bytes)
    PixelFingerprint(id, w, h, pixelMd5(md, w, h, px))
  }

  /** The md5-over-raster computation shared by [[pixelFpOne]] and the
    * fused [[imageSignatures]] pass — one fingerprint definition, so
    * fused ≡ separate holds by construction, not by parallel code. */
  private[graft] def pixelMd5(md: java.security.MessageDigest,
                              w: Long, h: Long, px: Array[Int]): String = {
    val sb = new java.lang.StringBuilder
    sb.append(w).append(':').append(h).append(':')
    var i = 0
    while (i < px.length) {
      if (i > 0) sb.append(':')
      val p = px(i)
      sb.append((p >> 16) & 0xff).append(',')
        .append((p >> 8) & 0xff).append(',').append(p & 0xff)
      i += 1
    }
    md.reset()
    val d = md.digest(sb.toString.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  final case class ImageSignatures(id: Long, width: Long, height: Long,
                                   ahash: Long, fp: String)

  /** BOTH image tiers' signatures from ONE decode pass — the fused
    * form of [[imageAHash]] + [[imagePixelFingerprint]]. The admission
    * book and the signature-index build consume both tiers over the
    * same corpus; decoded separately, the bytes are parsed once per
    * tier (and the exact tier's groupBy+join-back consumes its frame
    * twice → up to three decodes per asset). Fused, the corpus is
    * decoded exactly once and the (id, width, height, ahash, fp) frame
    * projects into the two tier shapes. One deliberate widening vs the
    * strict [[imageAHash]]: the payload is codec-SNIFFED
    * ([[decodeImagePayload]], BMP or PNG) — on a BMP corpus the sniff
    * IS [[Bmp.decode]], so both projections are byte-identical to the
    * separate passes (spec-pinned), and it matches the safe tier's
    * already-documented sniffed behavior. */
  def imageSignatures(df: DataFrame, idCol: String,
                      binCol: String): Dataset[ImageSignatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) => imageSigOne(md, id, bytes) }
      }
  }

  /** Per-asset body of [[imageSignatures]] (factored for the
    * quarantine tier's fused pass). */
  private[graft] def imageSigOne(md: java.security.MessageDigest, id: Long,
                                 bytes: Array[Byte]): ImageSignatures = {
    val (w, h, px) = decodeImagePayload(bytes)
    ImageSignatures(id, w, h, aHashBits(px), pixelMd5(md, w, h, px))
  }

  /** The ONE aHash bit computation (bit `i` set iff pixel i's gray sum
    * strictly exceeds the raster mean, pure integer `gray·n > Σgray`)
    * shared by the still-image path ([[imageAHash]]) and the video
    * keyframe path ([[videoPerceptualHash]]) — one thresholding rule,
    * one invariance argument. */
  private[graft] def aHashBits(pixels: Array[Int]): Long = {
    val n = pixels.length.toLong
    val gray = new Array[Long](pixels.length)
    var total = 0L
    var i = 0
    while (i < gray.length) {
      val p = pixels(i)
      gray(i) = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
      total += gray(i)
      i += 1
    }
    var hash = 0L
    i = 0
    while (i < gray.length) {
      if (gray(i) * n > total) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** Near-duplicate image pairs from [[imageAHash]] fingerprints —
    * `Dedup.simhashPairs`'s banded scheme on the image hash: the
    * 48-bit hash splits into 4×12-bit bands, candidates share
    * (width, height, band) — an equi-join on the band key, never a
    * cartesian — buckets keep their `bucketCap` smallest ids with an
    * observable drop count, and survivors confirm by exact Hamming
    * distance (`bit_count(xor)`) ≤ `maxHamming`. Because a low-bit
    * hash forms LARGE equivalence cliques (every brightness-shifted
    * copy of a popular template shares one hash — C(n,2) pairs at
    * Hamming 0), the output is additionally capped at `candCap`
    * best-Hamming partners PER IMAGE (`Curation.ngramJaccardPairs`'s
    * rule): uncapped, the sf0.01 fixtures alone emit 543k pair rows,
    * and a production corpus would be quadratic in its most-copied
    * template. Drops are observable; dedup semantics survive capping
    * (an image keeps its nearest partners, which is all a
    * keep/drop/cluster decision consumes). `bucketCap` defaults LOWER
    * than the text LSH ops' 256: image bands collide in dense cliques
    * (every brightness variant shares the band), so a 256-wide bucket
    * expands C(256,2) ≈ 33k candidate structs per bucket only for the
    * candCap winnow to discard nearly all of them — measured 4.5×
    * wall-time savings at 64 on the sf0.1 fixtures. The recall trade
    * is the standard bucketCap lever (images beyond a bucket's 64
    * smallest ids lose those candidates), acceptable because clique
    * members are interchangeable for keep/drop decisions. */
  def imageAHashPairs(hashes: DataFrame, maxHamming: Int = 4,
                      bucketCap: Int = 64, candCap: Int = 4): DataFrame =
    bandedHammingPairs(hashes, hashCol = "ahash",
      group = concat(col("width").cast("string"), lit("x"),
        col("height").cast("string")),
      bandBits = 12, numBands = 4, maxHamming = maxHamming,
      bucketCap = bucketCap, candCap = candCap, metric = "image_ahash")

  /** The (group, band index, band value) key columns shared by the
    * all-pairs and incremental banded-Hamming consumers. */
  private def bandKeyCols(hashCol: String, group: Column, bandBits: Int,
                          numBands: Int): Seq[Column] = {
    val mask = (1L << bandBits) - 1
    (0 until numBands).map(k => concat(
      group, lit(s":$k:"),
      shiftright(col(hashCol), bandBits * k).bitwiseAND(mask).cast("string")))
  }

  /** The ONE banded-Hamming pair implementation every fixed-width
    * perceptual fingerprint shares (images via [[imageAHashPairs]],
    * audio via [[audioFingerprintPairs]], video clip signatures via
    * [[videoPerceptualPairs]]): the hash splits into
    * `numBands`×`bandBits`-bit bands; candidates share (`group`, band
    * index, band value) — an equi-join on that key through the shared
    * capped-bucket machinery (`Dedup.cappedBucketsFromIndex`: each
    * bucket keeps its `bucketCap` smallest ids, drops observable);
    * survivors confirm by exact Hamming distance (`bit_count(xor)`)
    * ≤ `maxHamming`, and each id_a keeps its `candCap` best-Hamming
    * partners (observable drop count — perceptual hashes form LARGE
    * equivalence cliques, so uncapped output is quadratic in the most
    * copied asset). `group` carries the dimensions a Hamming compare
    * requires to be meaningful (image width×height, audio
    * channels:n_windows). Banding guarantee: two hashes within
    * Hamming ≤ numBands−1 share at least one exact band; beyond that
    * the screen is probabilistic — the standard LSH trade. */
  private[graft] def bandedHammingPairs(hashes: DataFrame, hashCol: String,
                                        group: Column, bandBits: Int,
                                        numBands: Int, maxHamming: Int,
                                        bucketCap: Int, candCap: Int,
                                        metric: String): DataFrame = {
    val bandKeys = bandKeyCols(hashCol, group, bandBits, numBands)
    // CARRY shape (VERDICT r10 #6): the hash rides through the bucket
    // explode as the payload of a (doc_id, h) struct, so the hash
    // frame — at 100 TB a full decode of the corpus — is scanned ONCE
    // and pairs exit the buckets with both hashes in hand; the old
    // join-back re-read it twice. Same capped-bucket implementation
    // (struct arrays sort by their leading doc_id field, so the
    // "smallest bucketCap ids" contract is untouched); pairs are
    // deduped before scoring, so each candidate is scored exactly once.
    val index = hashes.select(
      explode(array(bandKeys: _*)).as("bk"),
      struct(col("id").as("doc_id"), col(hashCol).as("h")).as("doc_id_h"))
    val cand = Dedup.cappedBucketsFromIndex(index, bucketCap,
        observed = true, metricPrefix = s"${metric}_buckets_",
        idExpr = col("doc_id_h"))
      .select(explode(expr(
        "filter(flatten(transform(ids, a -> transform(ids, b -> " +
          "struct(a AS a, b AS b)))), p -> p.a.doc_id < p.b.doc_id)")).as("p"))
      .select(col("p.a.doc_id").as("id_a"), col("p.b.doc_id").as("id_b"),
        col("p.a.h").as("ha"), col("p.b.h").as("hb"))
      .distinct()
    cand
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("bigint").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id_a"))
          .orderBy(col("hamming"), col("id_b"))))
      .observe(s"${metric}_cands_" +
          java.util.UUID.randomUUID().toString.replace("-", ""),
        sum(when(col("rnk") > candCap, 1L).otherwise(0L)).as("pairs_over_cap"))
      .where(col("rnk") <= candCap)
      .select("id_a", "id_b", "hamming")
  }

  /** The confirm core, STREAM-SAFE by construction: the batch hash is
    * CARRIED through the band join instead of joined back (a join-back
    * would be a stream-stream join needing watermarks when `batch` is
    * a streaming frame — the same carry trick the text path's
    * `incrementalDedupStream` uses), so the only joins are
    * stream-static against the corpus buckets and corpus hashes.
    * Emits duplicate (batch_id, corpus_id) rows when a pair shares
    * several bands — batch callers `.distinct()`, streaming callers
    * `.dropDuplicates(...)` (stateful streaming dedup). `observed` is
    * false for streaming use (per-batch observe metrics are not
    * reportable there — same posture as `cappedBuckets`). */
  private[graft] def incrementalScreen(corpus: DataFrame, batch: DataFrame,
                                       hashCol: String, group: Column,
                                       bandBits: Int, numBands: Int,
                                       maxHamming: Int, bucketCap: Int,
                                       metric: String,
                                       observed: Boolean,
                                       noBroadcast: Boolean = false): DataFrame = {
    val keys = bandKeyCols(hashCol, group, bandBits, numBands)
    val corpusIndex = corpus.select(col("id").as("doc_id"),
      explode(array(keys: _*)).as("bk"))
    val cBuckets0 = Dedup.cappedBucketsFromIndex(corpusIndex, bucketCap,
      observed = observed, metricPrefix = s"${metric}_buckets_")
    val hc0 = corpus.select(col("id").as("corpus_id"), col(hashCol).as("ch"))
    // noBroadcast: the STREAMING callers force shuffle joins on the
    // static sides. Streaming plans have no AQE to re-plan a bad
    // estimate, and the planner's post-aggregation size guess elected
    // a broadcast of the corpus-scale bucket table — which at 10× data
    // dies building the broadcast (measured). Batch callers keep the
    // estimate-driven choice: AQE corrects it with runtime sizes.
    val (cBuckets, hc) =
      if (noBroadcast) (cBuckets0.hint("shuffle_hash"), hc0.hint("shuffle_hash"))
      else (cBuckets0, hc0)
    batch.select(col("id").as("batch_id"), col(hashCol).as("bh"),
        explode(array(keys: _*)).as("bk"))
      .join(cBuckets, "bk")
      .select(col("batch_id"), col("bh"), explode(col("ids")).as("corpus_id"))
      .join(hc, "corpus_id")
      .select(col("batch_id"), col("corpus_id"),
        bit_count(col("bh").bitwiseXOR(col("ch"))).cast("bigint").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Incremental media near-dup screening — a NEW batch of assets
    * against a STANDING corpus, the steady-state production shape
    * (`Dedup.incrementalNearDups` for perceptual fingerprints): the
    * corpus side of the band join is bucketed and capped exactly like
    * the all-pairs path (shared `cappedBucketsFromIndex` — smallest
    * `bucketCap` ids kept, drops observable; unlike the all-pairs
    * path, size-1 buckets stay — one corpus asset can still match a
    * batch asset), candidates equi-join on the band key via
    * [[incrementalScreen]], exact Hamming confirms, and each batch
    * asset keeps its `candCap` best corpus partners. Only
    * batch↔corpus pairs are produced (directed
    * `(batch_id, corpus_id)`), batch-internal duplicates are a
    * [[bandedHammingPairs]] pass over the small batch, corpus-internal
    * ones were settled at admission — the same contract as the text
    * path. At scale the corpus band index `(doc_id, bk)` is the
    * persistable artifact (write once, read per batch), so batch cost
    * is proportional to the BATCH, not the corpus. */
  private[graft] def incrementalBandedHamming(corpus: DataFrame,
                                              batch: DataFrame,
                                              hashCol: String, group: Column,
                                              bandBits: Int, numBands: Int,
                                              maxHamming: Int, bucketCap: Int,
                                              candCap: Int,
                                              metric: String): DataFrame =
    incrementalScreen(corpus, batch, hashCol, group, bandBits, numBands,
        maxHamming, bucketCap, metric, observed = true)
      .distinct()
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("batch_id"))
          .orderBy(col("hamming"), col("corpus_id"))))
      .observe(s"${metric}_cands_" +
          java.util.UUID.randomUUID().toString.replace("-", ""),
        sum(when(col("rnk") > candCap, 1L).otherwise(0L)).as("pairs_over_cap"))
      .where(col("rnk") <= candCap)
      .select("batch_id", "corpus_id", "hamming")

  /** [[incrementalBandedHamming]] for image aHashes — same band/cap
    * constants as [[imageAHashPairs]]. */
  def incrementalImageNearDups(corpusHashes: DataFrame,
                               batchHashes: DataFrame,
                               maxHamming: Int = 4, bucketCap: Int = 64,
                               candCap: Int = 4): DataFrame =
    incrementalBandedHamming(corpusHashes, batchHashes, hashCol = "ahash",
      group = concat(col("width").cast("string"), lit("x"),
        col("height").cast("string")),
      bandBits = 12, numBands = 4, maxHamming = maxHamming,
      bucketCap = bucketCap, candCap = candCap, metric = "image_ahash_incr")

  /** [[incrementalBandedHamming]] for audio fingerprints — same
    * band/cap constants as [[audioFingerprintPairs]]. */
  def incrementalAudioNearDups(corpusFps: DataFrame, batchFps: DataFrame,
                               maxHamming: Int = 3, bucketCap: Int = 64,
                               candCap: Int = 4): DataFrame =
    incrementalBandedHamming(corpusFps, batchFps, hashCol = "fp",
      group = concat(col("channels").cast("string"), lit(":"),
        col("n_windows").cast("string")),
      bandBits = 4, numBands = 4, maxHamming = maxHamming,
      bucketCap = bucketCap, candCap = candCap, metric = "audio_fp_incr")

  /** Deterministic BMP fixture for row `id`: dimensions and every pixel
    * are closed-form functions of (id, x, y), so the DuckDB oracle can
    * recompute the decoded statistics WITHOUT a codec (the container
    * ships none) — while the Spark side still round-trips real encoded
    * bytes through [[Bmp.decode]]. Formula (all mod 256):
    * r = id + 7x + 13y, g = 2id + 3x + 5y, b = 5id + 11x + 17y;
    * width = 4 + id%5, height = 3 + id%4. */
  def syntheticBmp(id: Long): Array[Byte] = {
    val w = 4 + (id % 5).toInt
    val h = 3 + (id % 4).toInt
    Bmp.encode(w, h, (x, y) => (
      ((id + 7L * x + 13L * y) % 256).toInt,
      ((2L * id + 3L * x + 5L * y) % 256).toInt,
      ((5L * id + 11L * x + 17L * y) % 256).toInt))
  }

  /** (id, PNG payload) → per-image pixel statistics, decoded
    * per-partition (same distributed shape as [[imageStats]]). */
  def pngStats(df: DataFrame, idCol: String, binCol: String): Dataset[ImageStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(pngImageStats)
  }

  /** Deterministic PNG fixture for row `id` — closed-form pixels like
    * [[syntheticBmp]], so the oracle recomputes the decoded statistics
    * without a codec. The row FILTER TYPE rotates through all five PNG
    * filters (`(id + y) mod 5`), so decoding the fixture corpus
    * exercises None/Sub/Up/Average/Paeth — not just the trivial path.
    * Formula (mod 256): r = 3id + 5x + 11y, g = 7id + 2x + 3y,
    * b = id + 13x + 9y; width = 4 + id%6, height = 2 + id%5. */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 4 + (id % 6).toInt
    val h = 2 + (id % 5).toInt
    Png.encode(w, h, (x, y) => (
      ((3L * id + 5L * x + 11L * y) % 256).toInt,
      ((7L * id + 2L * x + 3L * y) % 256).toInt,
      ((id + 13L * x + 9L * y) % 256).toInt),
      filterFor = y => ((id + y) % 5).toInt)
  }

  /** REAL lossy transform-coding decode (pure-JVM baseline JPEG codec,
    * VERDICT r6 #5): Huffman + dequant + IDCT + fixed-point YCbCr→RGB —
    * same batch shape. */
  val jpegImageStats: Iterator[(Long, Array[Byte])] => Iterator[ImageStats] =
    it => it.map { case (id, bytes) =>
      val img = Jpeg.decode(bytes)
      pixelStats(id, img.width, img.height, img.pixels)
    }

  /** (id, JPEG payload) → per-image pixel statistics, decoded
    * per-partition (same distributed shape as [[imageStats]]). */
  def jpegStats(df: DataFrame, idCol: String, binCol: String): Dataset[ImageStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(jpegImageStats)
  }

  /** Deterministic baseline-JPEG fixture for row `id`: per-8×8-block
    * CONSTANT YCbCr (closed-form per (id, bx, by)), unit quant tables —
    * the lossy pipeline is EXACT on these inputs (a constant block's
    * FDCT is DC-only), so the oracle replays block formula + the
    * fixed-point color conversion without a codec while the Spark side
    * runs the full Huffman/IDCT decode on real JPEG bytes. Even ids
    * write restart markers every 2 MCUs (exercising the DRI/RSTn path).
    * Formula (mod 256): Y = 3id+5bx+11by, Cb = 7id+2bx+3by,
    * Cr = id+13bx+9by; width = 8·(1+id%3), height = 8·(1+id%2). */
  def syntheticJpeg(id: Long): Array[Byte] = {
    val wb = 1 + (id % 3).toInt
    val hb = 1 + (id % 2).toInt
    Jpeg.encode(wb, hb, (bx, by) => (
      ((3L * id + 5L * bx + 11L * by) % 256).toInt,
      ((7L * id + 2L * bx + 3L * by) % 256).toInt,
      ((id + 13L * bx + 9L * by) % 256).toInt),
      restartInterval = if (id % 2 == 0) 2 else 0)
  }

  /** REAL LZW-compressed decode (pure-JVM GIF codec): variable-width
    * code stream + palette lookup — same batch shape. */
  val gifImageStats: Iterator[(Long, Array[Byte])] => Iterator[ImageStats] =
    it => it.map { case (id, bytes) =>
      val img = Gif.decode(bytes)
      val packed = new Array[Int](img.pixels.length)
      var i = 0
      while (i < packed.length) { packed(i) = img.palette(img.pixels(i)); i += 1 }
      pixelStats(id, img.width, img.height, packed)
    }

  /** (id, GIF payload) → per-image pixel statistics, decoded
    * per-partition (same distributed shape as [[imageStats]]). */
  def gifStats(df: DataFrame, idCol: String, binCol: String): Dataset[ImageStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(gifImageStats)
  }

  /** Deterministic GIF fixture for row `id` — closed-form pixels like
    * [[syntheticPng]], but through a 256-entry PALETTE: the pixel's
    * palette index and the palette's channel values are both
    * closed-form, so the oracle composes the two formulas without a
    * codec. idx = (5id + 7x + 3y) mod 256; palette[i] =
    * ((3i+7)%256, (5i+11)%256, (7i+13)%256);
    * width = 4 + id%6, height = 2 + id%5. */
  def syntheticGif(id: Long): Array[Byte] = {
    val w = 4 + (id % 6).toInt
    val h = 2 + (id % 5).toInt
    val palette = Array.tabulate(256)(i =>
      (((3 * i + 7) % 256) << 16) | (((5 * i + 11) % 256) << 8) | ((7 * i + 13) % 256))
    Gif.encode(w, h, palette,
      (x, y) => ((5L * id + 7L * x + 3L * y) % 256).toInt)
  }

  /** One sampled frame of an ANIMATED GIF: per-frame channel sums over
    * the palette-mapped raster. */
  final case class GifFrame(id: Long, frame_idx: Long, sum_r: Long,
                            sum_g: Long, sum_b: Long)

  /** Frame sampling over a REAL multi-frame container: decode every
    * frame of an animated GIF, keep every `stride`-th (the video
    * keyframe-sampling shape), emit per-frame channel sums. The whole
    * decode+sample runs inside one `mapPartitions` pass. */
  def gifFrameSample(df: DataFrame, idCol: String, binCol: String,
                     stride: Int = 2): Dataset[GifFrame] = {
    require(stride > 0, s"stride must be positive, got $stride")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        // skipped frames are length-hopped, never LZW-decoded
        Gif.decodeFramesBy(bytes, keep = _ % stride == 0)
          .map { case (f, img) =>
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < img.pixels.length) {
              val p = img.palette(img.pixels(i))
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              i += 1
            }
            GifFrame(id, f.toLong, sr, sg, sb)
          }
      })
  }

  /** Deterministic ANIMATED GIF fixture: 2-5 full-canvas frames, the
    * [[syntheticGif]] palette, per-frame pixel index
    * `(5id + 7x + 3y + 11f) mod 256` — frame count, index, and palette
    * all closed-form for the oracle. */
  def syntheticGifAnim(id: Long): Array[Byte] = {
    val w = 3 + (id % 5).toInt
    val h = 2 + (id % 4).toInt
    val nf = 2 + (id % 4).toInt
    val palette = Array.tabulate(256)(i =>
      (((3 * i + 7) % 256) << 16) | (((5 * i + 11) % 256) << 8) | ((7 * i + 13) % 256))
    Gif.encodeAnimated(w, h, palette, nf,
      (f, x, y) => ((5L * id + 7L * x + 3L * y + 11L * f) % 256).toInt)
  }

  /** Per-video container statistics from a REAL ISO-BMFF parse
    * ([[Mp4]]): sample count, duration ticks, keyframe count, exact
    * byte sums of all samples and of the keyframe subset (extracted
    * from `mdat` via the stsc/stco/stsz addressing), and the largest
    * sample — closed-form recomputable by the oracle. */
  final case class Mp4Stats(id: Long, n_samples: Long, duration_ticks: Long,
                            n_key: Long, all_bytes: Long, key_bytes: Long,
                            max_sample: Long)

  /** Deterministic MP4 fixture for row `id`: `nf = 2 + id%5` samples,
    * sample `f` is `10 + ((id + 3f) mod 7)` bytes with byte `j` =
    * `(5id + 7f + 11j) mod 256`; timescale 1000, 40-tick deltas,
    * every 2nd sample a keyframe — every quantity closed-form. */
  def syntheticMp4(id: Long): Array[Byte] = {
    val nf = 2 + (id % 5).toInt
    val frames = (0 until nf).map { f =>
      val len = 10 + ((id + 3 * f) % 7).toInt
      Array.tabulate(len)(j => ((5 * id + 7 * f + 11 * j) % 256).toByte)
    }
    Mp4.encode(frames, timescale = 1000, delta = 40, keyStride = 2)
  }

  /** REAL container parse + sample extraction over a binary column —
    * the video-sampling batch shape: per-row CPU work in
    * `mapPartitions`, no shuffle, caps before allocation. */
  def mp4Stats(df: DataFrame, idCol: String, binCol: String): Dataset[Mp4Stats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val m = Mp4.parse(bytes)
        // primitive while-loop, not foldLeft: a foldLeft over Array[Byte]
        // boxes every byte through a Function2 on the per-payload hot path
        def byteSum(s: Mp4.Sample): Long = {
          val payload = m.sampleBytes(bytes, s)
          var sum = 0L
          var j = 0
          while (j < payload.length) { sum += payload(j) & 0xFF; j += 1 }
          sum
        }
        val keys = m.samples.filter(_.keyframe)
        Mp4Stats(id, m.samples.length.toLong, m.duration,
          keys.length.toLong,
          m.samples.map(byteSum).sum, keys.map(byteSum).sum,
          m.samples.map(_.size.toLong).max)
      })
  }

  final case class VideoFingerprint(id: Long, n_samples: Long, fp: String)

  /** Container-invariant VIDEO near-dup fingerprint from a REAL
    * ISO-BMFF parse — the last modality without a near-dup key: fp is
    * the md5 of the per-frame PAYLOAD byte-sum sequence (frame order,
    * ':'-joined), so it depends only on the media samples themselves.
    * A re-muxed copy — new timescale, different keyframe stride,
    * rewritten box metadata, same frames — fingerprints identically
    * (spec-proven), while changing a single payload byte flips it.
    * Exact-match (not banded): transcoding changes every byte, so
    * Hamming bands buy nothing here; re-mux dedup is an equality
    * grouping, the cheapest possible pair machinery. */
  def videoFingerprint(df: DataFrame, idCol: String,
                       binCol: String): Dataset[VideoFingerprint] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) => videoFpOne(md, id, bytes) }
      }
  }

  /** Per-asset body of [[videoFingerprint]] (factored for the
    * quarantine tier). */
  private[graft] def videoFpOne(md: java.security.MessageDigest, id: Long,
                                bytes: Array[Byte]): VideoFingerprint = {
    val m = Mp4.parse(bytes)
    // primitive while-loop sum (VERDICT r15 #2): the foldLeft boxed every
    // payload byte through a Function2 — the same sum sampleKeyframes
    // already does primitively, now consistent on the hottest gate
    val sums = m.samples.map { s =>
      val payload = m.sampleBytes(bytes, s)
      var sum = 0L
      var j = 0
      while (j < payload.length) { sum += payload(j) & 0xFF; j += 1 }
      sum
    }
    md.reset()
    val fp = md.digest(sums.mkString(":").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    VideoFingerprint(id, m.samples.length.toLong, fp)
  }

  /** Re-mux duplicate pairs: exact-equality buckets on the
    * [[videoFingerprint]], through the ONE shared capped-bucket
    * implementation (`Dedup.cappedBucketsFromIndex` with the
    * fingerprint itself as the bucket key — smallest `bucketCap` ids
    * kept, drops observable). No confirm stage: the bucket key IS the
    * full-precision fingerprint. */
  def videoNearDupPairs(fps: DataFrame, bucketCap: Int = 64): DataFrame = {
    val index = fps.select(col("id").as("doc_id"), col("fp").as("bk"))
    Dedup.cappedBucketsFromIndex(index, bucketCap,
        observed = true, metricPrefix = "video_fp_buckets_")
      .select(col("bk").as("fp"), explode(expr(
        "filter(flatten(transform(ids, a -> transform(ids, b -> " +
          "struct(a AS a, b AS b)))), p -> p.a < p.b)")).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"), col("fp"))
  }

  /** Equality-clique STAR edges for the closure (round 11): each
    * capped fp bucket contributes `(min_id, member)` instead of the
    * full `C(|bucket|, 2)` in-bucket expansion — the transitive
    * closure over a star equals the closure over the clique (every
    * member reaches the bucket minimum directly), and edge volume
    * drops from O(cap²) to O(cap) per bucket. Found by measuring: the
    * 10× sf0.1 fixture packs 1M clips into ~9k exact-duplicate
    * classes of ~112, whose capped all-pairs graph is 18M edges — the
    * closure over it died building a broadcast at the sweep's 8g heap
    * (and at 1000-executor scale would shuffle 36M adjacency rows per
    * round for nothing); the star graph is 0.57M edges for IDENTICAL
    * labels. The PAIRS gate keeps the full expansion — surfacing
    * every re-mux pair IS its contract — the closure never needed it.
    * Only valid for EQUALITY buckets (banded-Hamming pairs are not
    * cliques; their closures keep the real pair graph). */
  def videoNearDupStarEdges(fps: DataFrame, bucketCap: Int = 64): DataFrame =
    Dedup.cappedBucketsFromIndex(
        fps.select(col("id").as("doc_id"), col("fp").as("bk")),
        bucketCap, observed = true, metricPrefix = "video_fp_star_")
      .select(explode(expr(
        // ids is sort_array-ascending, so element_at(ids, 1) is the
        // bucket minimum; slice is 1-based, [2, n-1] = the rest
        "transform(slice(ids, 2, size(ids) - 1), " +
          "x -> struct(element_at(ids, 1) AS a, x AS b))")).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))

  /** Incremental (steady-state) video screen on the EXACT container
    * fingerprint: a new batch of clips against the standing corpus,
    * through the same shared capped-bucket core as every other
    * incremental screen — the corpus fingerprint index is bucketed on
    * the fingerprint itself (`bucketCap` smallest ids kept, drops
    * observable, size-1 buckets stay: one standing copy can still match
    * an incoming one), the batch equi-joins on it, and each batch clip
    * keeps its `candCap` smallest-id corpus partners. No confirm stage
    * and no Hamming ordering: the bucket key IS the full-precision
    * fingerprint, so every bucket member is an exact re-mux duplicate
    * and partners rank by corpus_id. At scale the corpus index is the
    * persistable artifact; batch cost is proportional to the BATCH. */
  def incrementalVideoNearDups(corpusFps: DataFrame, batchFps: DataFrame,
                               bucketCap: Int = 64, candCap: Int = 4): DataFrame = {
    val corpusIndex = corpusFps.select(col("id").as("doc_id"),
      col("fp").as("bk"))
    val cBuckets = Dedup.cappedBucketsFromIndex(corpusIndex, bucketCap,
      observed = true, metricPrefix = "video_fp_incr_buckets_")
    batchFps.select(col("id").as("batch_id"), col("fp").as("bk"))
      .join(cBuckets, "bk")
      .select(col("batch_id"), col("bk").as("fp"),
        explode(col("ids")).as("corpus_id"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("batch_id"))
          .orderBy(col("corpus_id"))))
      .observe("video_fp_incr_cands_" +
          java.util.UUID.randomUUID().toString.replace("-", ""),
        sum(when(col("rnk") > candCap, 1L).otherwise(0L)).as("pairs_over_cap"))
      .where(col("rnk") <= candCap)
      .select("batch_id", "corpus_id", "fp")
  }

  final case class VideoPerceptualHash(id: Long, width: Long, height: Long,
                                       n_key: Long, sig: Long)

  /** Transcode-robust perceptual VIDEO signature — what the exact
    * [[videoFingerprint]] cannot see: a transcoded copy re-encodes
    * every payload byte, so content identity must come from the DECODED
    * keyframes, not the container bytes. The pipeline: real ISO-BMFF
    * parse ([[Mp4]]) → `stss`-marked keyframes (first `maxKeyframes`
    * in decode order) → REAL image decode of each keyframe payload
    * (codec sniffed from magic bytes — BMP or PNG here; a deployment
    * adds sniffers, nothing else changes) → the shared 48-bit
    * [[aHashBits]] per frame (brightness-invariant integer
    * thresholding, the image modality's exact rule) → each frame hash
    * XOR-folds to 16 bits and packs into one BIGINT clip signature
    * (frame k at bits [16k, 16k+16)). A re-encoded copy — different
    * codec, shifted brightness, rewritten container — signatures
    * identically as long as its keyframes survive thresholding
    * unchanged; small content edits flip few bits (each flipped aHash
    * bit flips exactly one fold bit), so pairs run through the ONE
    * shared [[bandedHammingPairs]] core with bands = the per-frame
    * 16-bit words. Keyframe SAMPLING is stride-aligned here (fixtures
    * share `keyStride`); production transcoders that re-place
    * keyframes want time-aligned sampling via the `stts` timestamps —
    * same tables, same shape, noted not built. */
  /** Per-asset decode+signature for ONE clip. Returns None for a clip
    * with no `stss` keyframes (ADVICE r10 #4: a zero-stss clip would
    * emit (0, 0, 0, 0) — every such clip shares band group "0x0:0"
    * with an identical signature, so the pair paths would report
    * unrelated keyframe-less videos as Hamming-0 near-duplicates; a
    * clip with no keyframes has no perceptual identity HERE — the
    * time-aligned sampler handles them). Throws on every structural
    * violation (corrupt container, mixed-dimension keyframes). */
  private[graft] def videoPHashOne(id: Long, bytes: Array[Byte],
                                   maxKeyframes: Int): Option[VideoPerceptualHash] = {
    val m = Mp4.parse(bytes)
    val keys = m.samples.filter(_.keyframe).take(maxKeyframes)
    if (keys.isEmpty) None
    else {
      var w = 0L; var h = 0L; var sig = 0L
      keys.zipWithIndex.foreach { case (s, k) =>
        val (fw, fh, px) = decodeImagePayload(m.sampleBytes(bytes, s))
        Decode.req(k == 0 || (fw == w && fh == h), "malformed",
          s"video $id: keyframe $k is ${fw}x$fh, expected ${w}x$h " +
            "(mixed-dimension frames have no comparable signature)")
        w = fw; h = fh
        val hash = aHashBits(px)
        val fold = (hash ^ (hash >>> 16) ^ (hash >>> 32)) & 0xFFFFL
        sig |= fold << (16 * k)
      }
      Some(VideoPerceptualHash(id, w, h, keys.length.toLong, sig))
    }
  }

  def videoPerceptualHash(df: DataFrame, idCol: String, binCol: String,
                          maxKeyframes: Int = 4): Dataset[VideoPerceptualHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    // Batch-path posture for keyframe-less clips (ADVICE r11 #4): DROP
    // with an observable counter instead of killing the task — at
    // ingest scale one degenerate asset must degrade to a counted drop,
    // not a job failure after retries. [[videoPerceptualHashStrict]]
    // keeps the loud require for validating contexts; corrupt
    // CONTAINERS still throw here (the quarantine tier isolates those).
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, videoPHashOne(id, bytes, maxKeyframes))
      })
      .toDF("id", "v")
      .observe("video_phash_drops_" +
          java.util.UUID.randomUUID().toString.replace("-", ""),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("keyframeless_dropped"))
      .where(col("v").isNotNull)
      .select(col("v.id").as("id"), col("v.width").as("width"),
        col("v.height").as("height"), col("v.n_key").as("n_key"),
        col("v.sig").as("sig"))
      .as[VideoPerceptualHash]
  }

  /** Validating sibling of [[videoPerceptualHash]]: a keyframe-less
    * clip is a loud `require` failure instead of a counted drop — for
    * fixture/spec contexts where silence would hide a bug. */
  def videoPerceptualHashStrict(df: DataFrame, idCol: String, binCol: String,
                                maxKeyframes: Int = 4): Dataset[VideoPerceptualHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        videoPHashOne(id, bytes, maxKeyframes).getOrElse(
          Decode.fail("no_keyframes",
            s"video $id has no stss keyframes — no perceptual " +
              "signature (use videoPerceptualHashTimeAligned for " +
              "keyframe-less clips)"))
      })
  }

  /** Magic-byte codec sniff for keyframe payloads: 'BM' → [[Bmp]],
    * \x89PNG → [[Png]]. Returns (width, height, packed 0xRRGGBB). */
  private def decodeImagePayload(bytes: Array[Byte]): (Long, Long, Array[Int]) = {
    Decode.req(bytes.length >= 2, "malformed",
      "keyframe payload too short to sniff")
    if (bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte) {
      val i = Bmp.decode(bytes); (i.width.toLong, i.height.toLong, i.pixels)
    } else if ((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P'.toByte) {
      val i = Png.decode(bytes); (i.width.toLong, i.height.toLong, i.pixels)
    } else Decode.fail("bad_magic",
      "unrecognized keyframe codec (expected BMP or PNG magic)")
  }

  /** Near-duplicate video pairs from [[videoPerceptualHash]] clip
    * signatures — the TRANSCODE-robust companion to the exact-equality
    * [[videoNearDupPairs]], through the SAME [[bandedHammingPairs]]
    * machinery as images and audio: bands are the four per-keyframe
    * 16-bit folded hashes (sharing a band = one keyframe agrees
    * perceptually), the group key carries (width×height : n_key) so
    * only aligned clips compare, buckets cap at `bucketCap` smallest
    * ids and each clip keeps `candCap` best partners (transcode
    * families of a popular clip are exactly the clique hazard the caps
    * exist for). `maxHamming` 6 > numBands−1: pairs within 3 bits are
    * caught exhaustively, 4-6 probabilistically — the image family's
    * posture. */
  def videoPerceptualPairs(sigs: DataFrame, maxHamming: Int = 6,
                           bucketCap: Int = 64, candCap: Int = 4): DataFrame =
    bandedHammingPairs(sigs, hashCol = "sig",
      group = concat(col("width").cast("string"), lit("x"),
        col("height").cast("string"), lit(":"), col("n_key").cast("string")),
      bandBits = 16, numBands = 4, maxHamming = maxHamming,
      bucketCap = bucketCap, candCap = candCap, metric = "video_phash")

  /** [[incrementalBandedHamming]] for perceptual video clip
    * signatures — the steady-state screen for the TRANSCODE-robust
    * key (the exact-fp [[incrementalVideoNearDups]] only catches
    * re-muxes): same band/cap constants as [[videoPerceptualPairs]].
    * With this, every modality has BOTH the all-pairs and the
    * incremental perceptual screen through the one shared core. */
  def incrementalVideoPerceptualNearDups(corpusSigs: DataFrame,
                                         batchSigs: DataFrame,
                                         maxHamming: Int = 6,
                                         bucketCap: Int = 64,
                                         candCap: Int = 4): DataFrame =
    incrementalBandedHamming(corpusSigs, batchSigs, hashCol = "sig",
      group = concat(col("width").cast("string"), lit("x"),
        col("height").cast("string"), lit(":"), col("n_key").cast("string")),
      bandBits = 16, numBands = 4, maxHamming = maxHamming,
      bucketCap = bucketCap, candCap = candCap, metric = "video_phash_incr")

  /** TIME-ALIGNED perceptual video signature — the sampler for
    * transcoders that RE-PLACE keyframes (a different `keyStride`
    * moves the `stss` set, so [[videoPerceptualHash]]'s stride-aligned
    * sampling hashes different frames and the signatures diverge even
    * for identical content; spec-proven). Slots are fractions of the
    * CONTENT TIMELINE via the real `stts` decode timestamps: slot k of
    * `nSamples` hashes the last frame whose dts ≤ k/nSamples of the
    * clip duration — invariant to timescale, frame-duration, AND
    * keyframe placement, because decode order and timestamps are
    * container facts the transcoder must preserve to be a transcode.
    * Frames are decoded per slot (fixtures are intra-only; a
    * production decoder seeks the preceding keyframe and rolls
    * forward — same tables, noted not built). Output shape identical
    * to [[videoPerceptualHash]] with `n_key = nSamples` always, so the
    * SAME pairs/clusters/incremental machinery consumes either
    * signature.
    *
    * EDIT LISTS (round 12, VERDICT r11 #8): a re-muxed file can carry
    * an `elst` that maps presentation time 0 to media time M (the
    * priming-samples / codec-delay pattern) — reading `stts` only
    * would sample the skipped priming frames and misalign every slot.
    * Slot targets therefore live on the PRESENTATION timeline: slot k
    * targets media time `M + k·presDur/nSamples`, where presDur is
    * the elst segment duration (falling back to the mvhd duration for
    * un-edited files, where M = 0 and behavior is bit-identical to
    * before). Spec'd both directions: an elst-edited re-mux signatures
    * identically to its plain original, and ignoring the offset
    * provably picks different frames on the same fixture. (Fixtures
    * share one timescale for movie and media, as [[Mp4.encode]]
    * writes; a deployment with split timescales rescales segDur.) */
  def videoPerceptualHashTimeAligned(df: DataFrame, idCol: String,
                                     binCol: String, nSamples: Int = 4)
      : Dataset[VideoPerceptualHash] = {
    require(nSamples >= 1 && nSamples <= 4,
      s"nSamples must be in [1, 4] (16-bit folds in one BIGINT), got $nSamples")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val m = Mp4.parse(bytes)
        Decode.req(m.samples.nonEmpty, "malformed", s"video $id has no samples")
        var w = 0L; var h = 0L; var sig = 0L
        val presDur = if (m.editDuration > 0) m.editDuration else m.duration
        // cache per distinct frame: slots often repeat a frame on
        // short clips, and decode is the expensive step
        val foldCache = scala.collection.mutable.Map.empty[Int, Long]
        (0 until nSamples).foreach { k =>
          val target = m.editMediaTime + k.toLong * presDur / nSamples
          // last frame with dts <= target; dts is non-decreasing
          val s = m.samples.takeWhile(_.dts <= target).lastOption
            .getOrElse(m.samples.head)
          val fold = foldCache.getOrElseUpdate(s.index, {
            val (fw, fh, px) = decodeImagePayload(m.sampleBytes(bytes, s))
            Decode.req(w == 0L || (fw == w && fh == h), "malformed",
              s"video $id: frame ${s.index} is ${fw}x$fh, expected ${w}x$h")
            w = fw; h = fh
            val hash = aHashBits(px)
            (hash ^ (hash >>> 16) ^ (hash >>> 32)) & 0xFFFFL
          })
          sig |= fold << (16 * k)
        }
        VideoPerceptualHash(id, w, h, nSamples.toLong, sig)
      })
  }

  /** Deterministic MP4 fixture family for TRANSCODE dedup: ids group
    * into CONTENTS of four VARIANTS (`c = id/4`, `v = id%4`) that
    * re-encode the same closed-form frames — v's transcode axes are
    * the frame codec (even v → BMP, odd v → PNG: every payload byte
    * differs, pixels identical), a global brightness shift (`+16v` per
    * channel — moves every byte, aHash-invariant by the threshold
    * argument), a container re-mux (timescale/delta vary with v), and
    * for v ≥ 2 a one-pixel content edit (+30/channel at (c mod w, 0))
    * that flips a few threshold bits — so v0↔v1 and v2↔v3 signature
    * identically while v0↔v2 sit a small Hamming distance apart, and
    * the corpus carries real near-dup structure, not just exact
    * cliques. Channel formulas use coprime moduli (149/151/150) so
    * content patterns do not repeat across the corpus; all values stay
    * < 256 (max 20+150+48+30 = 248), so the brightness shift never
    * wraps — wrap would break the invariance the fixture proves. The
    * oracle replays every formula in closed form. */
  def syntheticVideoMp4(id: Long): Array[Byte] = {
    val c = id / 4
    val v = (id % 4).toInt
    val w = 4 + (c % 5).toInt
    val h = 3 + (c % 4).toInt
    val nf = 3 + (c % 3).toInt
    def px(f: Int)(x: Int, y: Int): (Int, Int, Int) = {
      val pert = if (v >= 2 && x == (c % w).toInt && y == 0) 30 else 0
      ((20 + (c + 7L * x + 13L * y + 19L * f) % 149 + 16 * v + pert).toInt,
       (20 + (2L * c + 3L * x + 5L * y + 23L * f) % 151 + 16 * v + pert).toInt,
       (20 + (5L * c + 11L * x + 17L * y + 29L * f) % 150 + 16 * v + pert).toInt)
    }
    val frames = (0 until nf).map { f =>
      if (v % 2 == 0) Bmp.encode(w, h, px(f))
      else Png.encode(w, h, px(f), filterFor = y => (f + y) % 5)
    }
    Mp4.encode(frames, timescale = 1000 + 200 * v, delta = 40 + 10 * v,
      keyStride = 2)
  }

  /** [[syntheticVideoMp4]]'s harder sibling: variants additionally
    * RE-PLACE KEYFRAMES (`keyStride = 1 + v`) — the transcode axis the
    * stride-aligned sampler provably cannot absorb (different stss
    * sets → different sampled frames) and the time-aligned sampler
    * must. Pixel content per (c, v, f) uses the same formulas as
    * [[syntheticVideoMp4]], so the oracle's pixel CTEs are shared;
    * only the sampling index set differs. */
  def syntheticVideoMp4T(id: Long): Array[Byte] = {
    val c = id / 4
    val v = (id % 4).toInt
    val w = 4 + (c % 5).toInt
    val h = 3 + (c % 4).toInt
    val nf = 3 + (c % 3).toInt
    def px(f: Int)(x: Int, y: Int): (Int, Int, Int) = {
      val pert = if (v >= 2 && x == (c % w).toInt && y == 0) 30 else 0
      ((20 + (c + 7L * x + 13L * y + 19L * f) % 149 + 16 * v + pert).toInt,
       (20 + (2L * c + 3L * x + 5L * y + 23L * f) % 151 + 16 * v + pert).toInt,
       (20 + (5L * c + 11L * x + 17L * y + 29L * f) % 150 + 16 * v + pert).toInt)
    }
    val frames = (0 until nf).map { f =>
      if (v % 2 == 0) Bmp.encode(w, h, px(f))
      else Png.encode(w, h, px(f), filterFor = y => (f + y) % 5)
    }
    Mp4.encode(frames, timescale = 600 + 300 * v, delta = 30 + 7 * v,
      keyStride = 1 + v)
  }

  /** Per-clip audio statistics from a REAL decode ([[Wav]]): sample
    * sum plus min/max across all channels — closed-form recomputable
    * by the oracle, like [[ImageStats]]. */
  final case class AudioStats(id: Long, channels: Long, sample_rate: Long,
                              n_frames: Long, sum_s: Long,
                              s_min: Long, s_max: Long)

  /** REAL audio decode (pure-JVM RIFF/PCM WAV codec): same batch shape
    * as [[Decoder]]. */
  val wavAudioStats: Iterator[(Long, Array[Byte])] => Iterator[AudioStats] =
    it => it.map { case (id, bytes) =>
      val clip = Wav.decode(bytes)
      var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
      var i = 0
      while (i < clip.samples.length) {
        val v = clip.samples(i).toLong
        sum += v; mn = math.min(mn, v); mx = math.max(mx, v)
        i += 1
      }
      if (clip.samples.isEmpty) { mn = 0L; mx = 0L }
      AudioStats(id, clip.channels.toLong, clip.sampleRate.toLong,
        clip.frames.toLong, sum, mn, mx)
    }

  /** (id, WAV payload) → per-clip statistics, decoded per partition. */
  def audioStats(df: DataFrame, idCol: String, binCol: String): Dataset[AudioStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(wavAudioStats)
  }

  /** Deterministic WAV fixture for row `id` — closed-form samples so
    * the oracle recomputes the decoded statistics without a codec
    * (sibling of [[syntheticBmp]]): channels = 1 + id%2, sample rate =
    * 8000 + (id%3)·4000, frames = 32 + id%33,
    * sample(f, c) = (31·id + 17·f + 29·c) mod 65536 − 32768. */
  def syntheticWav(id: Long): Array[Byte] = {
    val ch = 1 + (id % 2).toInt
    val sr = 8000 + (id % 3).toInt * 4000
    val nf = 32 + (id % 33).toInt
    Wav.encode(ch, sr, nf, (f, c) =>
      (((31L * id + 17L * f + 29L * c) % 65536) - 32768).toShort)
  }

  /** Deterministic HIGH-ENTROPY WAV fixture for row `id` — the
    * rate-invariant gates' generator (same header plan as
    * [[syntheticWav]]): sample(f, c) =
    * ((31·id + 17·f + 29·c) mod 181) · ((7·id + 13·f + 11·c) mod 179)
    * − 16000, a product of two co-prime sawtooths. Why a second
    * formula: [[syntheticWav]]'s samples are LINEAR in f, so frame
    * energies form one parabola per clip and a delta-sign key over
    * them collapses to ~64 `0^a 1^b` patterns — at gate scale the
    * capped band buckets then evict every true cross-rate partner
    * (measured: 0 of 143 surviving at sf0.001). The sawtooth product
    * has no such ramp (measured: 9991/10000 distinct keys at sf0.01,
    * every ZOH copy confirmed), while staying closed-form replayable
    * in the oracle — the audio analog of [[syntheticBmp]]'s
    * three-multiplier gray. */
  def syntheticWavMixed(id: Long): Array[Byte] = {
    val ch = 1 + (id % 2).toInt
    val sr = 8000 + (id % 3).toInt * 4000
    val nf = 32 + (id % 33).toInt
    Wav.encode(ch, sr, nf, (f, c) =>
      (((31L * id + 17L * f + 29L * c) % 181) *
        ((7L * id + 13L * f + 11L * c) % 179) - 16000).toShort)
  }

  /** One fixed window of decoded audio: `energy` is the exact integer
    * sum of squared samples across all channels in the window — the
    * standard framed-feature shape (VAD, loudness normalization, clip
    * detection) with a closed-form oracle. */
  final case class AudioWindow(id: Long, win: Long, n_samples: Long,
                               energy: Long)

  /** REAL decode → framed features: each clip splits into
    * `windowFrames`-frame windows (tail partial); per window the exact
    * integer energy Σ v² over all channels. The per-clip fold stays on
    * the executor — only (id, win, stats) rows leave the decoder. */
  def audioEnergyWindows(df: DataFrame, idCol: String, binCol: String,
                         windowFrames: Int = 16): Dataset[AudioWindow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val clip = Wav.decode(bytes)
        val ch = clip.channels
        val perWin = windowFrames * ch
        clip.samples.grouped(perWin).zipWithIndex.map { case (w, i) =>
          var e = 0L
          var j = 0
          while (j < w.length) { val v = w(j).toLong; e += v * v; j += 1 }
          AudioWindow(id, i.toLong, w.length.toLong, e)
        }
      })
  }

  final case class AudioFingerprint(id: Long, channels: Long,
                                    n_windows: Long, fp: Long)

  /** Volume-invariant audio fingerprint from a REAL decode — the audio
    * modality's near-dup signature, the analog of [[imageAHash]]'s
    * brightness invariance: bit `w` is set iff window w+1's exact
    * integer energy strictly exceeds window w's (the sign-of-delta
    * idea of audio fingerprinting collapsed to the time axis,
    * integer-only so the oracle replays the fixtures' closed-form
    * samples). Uniform gain scales every window energy by g² and
    * flips no comparison, so louder/quieter (or phase-inverted)
    * re-encodes of the same material fingerprint identically —
    * spec-proven. The ≤64-frame fixtures at 4-frame windows yield
    * ≤16 windows → ≤15 bits in one BIGINT; production raises the
    * window count, same shape, and pairs reuse the banded-Hamming
    * machinery of [[imageAHashPairs]]. */
  def audioFingerprint(df: DataFrame, idCol: String, binCol: String,
                       windowFrames: Int = 4): Dataset[AudioFingerprint] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        audioFpOne(id, bytes, windowFrames)
      })
  }

  /** Per-asset body of [[audioFingerprint]] (factored for the
    * quarantine tier). */
  private[graft] def audioFpOne(id: Long, bytes: Array[Byte],
                                windowFrames: Int): AudioFingerprint = {
    val clip = Wav.decode(bytes)
    val (nWin, fp) = windowFpOf(clip, windowFrames)
    AudioFingerprint(id, clip.channels.toLong, nWin, fp)
  }

  /** The window-energy delta-sign computation shared by [[audioFpOne]]
    * and the fused [[audioSignatures]] pass — one fingerprint
    * definition. Returns (n_windows, fp bits). */
  private[graft] def windowFpOf(clip: Wav.Clip,
                                windowFrames: Int): (Long, Long) = {
    val perWin = windowFrames * clip.channels
    val energies = clip.samples.grouped(perWin).map { w =>
      var e = 0L
      var j = 0
      while (j < w.length) { val v = w(j).toLong; e += v * v; j += 1 }
      e
    }.toArray
    var fp = 0L
    var w = 0
    while (w + 1 < energies.length) {
      if (energies(w + 1) > energies(w)) fp |= 1L << w
      w += 1
    }
    (energies.length.toLong, fp)
  }

  final case class SampleFingerprint(id: Long, channels: Long,
                                     n_samples: Long, fp: String)

  /** EXACT decoded-sample fingerprint — the audio modality's content
    * identity, the audio analog of [[imagePixelFingerprint]]: md5 over
    * `"channels:"` + the interleaved PCM sample values in decode
    * order. Deliberately EXCLUDES the sample-rate header (the audio
    * "container" fact): a stream re-tagged with a different rate is a
    * re-mux of the same samples, exactly as [[videoFingerprint]]
    * ignores MP4 timing boxes. Equality groups are exact-duplicate
    * cliques — `groupBy(fp)` + min-id keeper, no pair graph (the media
    * admission book's exact stage). Note the synthetic WAV fixtures
    * have no cross-id exact duplicates below id 65536 (the sample
    * formula's period), so at gate scale this stage admits everything
    * and the perceptual stage does the work — the spec proves the
    * stage fires on byte-identical clips. */
  def audioSampleFingerprint(df: DataFrame, idCol: String,
                             binCol: String): Dataset[SampleFingerprint] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) => sampleFpOne(md, id, bytes) }
      }
  }

  /** Per-asset body of [[audioSampleFingerprint]] (factored for the
    * quarantine tier). */
  private[graft] def sampleFpOne(md: java.security.MessageDigest, id: Long,
                                 bytes: Array[Byte]): SampleFingerprint = {
    val clip = Wav.decode(bytes)
    SampleFingerprint(id, clip.channels.toLong,
      clip.samples.length.toLong, sampleMd5(md, clip))
  }

  /** The md5-over-samples computation shared by [[sampleFpOne]] and
    * the fused [[audioSignatures]] pass — one fingerprint definition. */
  private[graft] def sampleMd5(md: java.security.MessageDigest,
                               clip: Wav.Clip): String = {
    val sb = new java.lang.StringBuilder
    sb.append(clip.channels).append(':')
    var i = 0
    while (i < clip.samples.length) {
      if (i > 0) sb.append(':')
      sb.append(clip.samples(i).toInt)
      i += 1
    }
    md.reset()
    val d = md.digest(sb.toString.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  final case class AudioSignatures(id: Long, channels: Long, n_windows: Long,
                                   wfp: Long, n_samples: Long, sfp: String)

  /** BOTH audio tiers' signatures from ONE decode pass — the fused
    * form of [[audioFingerprint]] + [[audioSampleFingerprint]], the
    * audio sibling of [[imageSignatures]]: the WAV stream is parsed
    * once and the frame projects into the perceptual
    * (channels, n_windows, wfp→fp) and exact (channels, n_samples,
    * sfp→fp) tier shapes, each byte-identical to its separate pass
    * (shared per-asset bodies; spec-pinned). */
  def audioSignatures(df: DataFrame, idCol: String, binCol: String,
                      windowFrames: Int = 4): Dataset[AudioSignatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) => audioSigOne(md, id, bytes, windowFrames) }
      }
  }

  /** Per-asset body of [[audioSignatures]] (factored for the
    * quarantine tier's fused pass). */
  private[graft] def audioSigOne(md: java.security.MessageDigest, id: Long,
                                 bytes: Array[Byte],
                                 windowFrames: Int): AudioSignatures = {
    val clip = Wav.decode(bytes)
    val (nWin, wfp) = windowFpOf(clip, windowFrames)
    AudioSignatures(id, clip.channels.toLong, nWin, wfp,
      clip.samples.length.toLong, sampleMd5(md, clip))
  }

  /** Near-duplicate audio pairs from [[audioFingerprint]] signatures —
    * the audio modality through the SAME [[bandedHammingPairs]]
    * machinery as [[imageAHashPairs]] (previously only asserted; this
    * makes it code). Candidates must share (channels, n_windows) —
    * comparing delta-sign bits across different framings is
    * meaningless — plus one exact 4-bit band of the fingerprint.
    * `maxHamming` defaults to 3 = numBands−1, the bound under which
    * banding is exhaustive (every qualifying pair shares a band).
    * Bands are 4 bits because the fixture fingerprints carry ≤15
    * delta bits; production clips with more windows widen `bandBits`,
    * same shape. Same clique hazard and caps as images: a popular
    * jingle's re-encodes all share one fingerprint (gain invariance is
    * the POINT), so buckets cap at `bucketCap` smallest ids and each
    * clip keeps `candCap` best partners, drops observable. */
  def audioFingerprintPairs(fps: DataFrame, maxHamming: Int = 3,
                            bucketCap: Int = 64, candCap: Int = 4): DataFrame =
    bandedHammingPairs(fps, hashCol = "fp",
      group = concat(col("channels").cast("string"), lit(":"),
        col("n_windows").cast("string")),
      bandBits = 4, numBands = 4, maxHamming = maxHamming,
      bucketCap = bucketCap, candCap = candCap, metric = "audio_fp")

  /** Pair lists → a per-asset KEEP/DROP decision — what a curation
    * pipeline actually consumes (the text path's `nearDupClusters`
    * extended to media assets): min-label propagation
    * (`Dedup.propagateMinLabels`, the ONE transitive-closure
    * implementation) over the near-dup pair graph assigns every asset
    * the smallest id in its connected component; `keep` is true
    * exactly for that representative. Assets with no near-dup edges
    * are their own singleton cluster (kept). Both inputs are id
    * frames: `ids` the full asset universe (one column `id`), `pairs`
    * any [[bandedHammingPairs]] output (`id_a`, `id_b`). Scale shape:
    * inherited from the propagation core — per round one shuffle-on-key
    * join + one min-agg, rounds bounded by component diameter (tiny
    * for near-dup cliques), convergence probed by a one-scalar
    * DECIMAL sum, never collected rows.
    *
    * Both inputs are localCheckpointed first: the propagation loop
    * re-embeds its inputs' plans once per round, and a decode-pipeline
    * plan (mapPartitions codec → banded join → window) re-embedded ~6×
    * per iteration grows the logical plan past what the driver can
    * even render — measured: the UNtruncated sf0.001 image graph OOMed
    * an 8 GB driver in `explainString`, pure plan bloat, zero data.
    * The checkpoint inputs are small by construction (ids: one long
    * per asset; pairs: capped at candCap per asset).
    *
    * The closure core is `Dedup.starContractLabels` (alternating
    * large-star/small-star contraction — O(log² n) rounds on ANY
    * topology), NOT the text path's min-label propagation: candCap
    * prunes perceptual-hash cliques into long chain-like subgraphs
    * whose eccentricity grows with corpus size — the r10
    * perceptual-video graph exceeded eccentricity 30 at sf0.1, where
    * propagation (rounds ~ eccentricity, pointer jump or not) hit its
    * round cap while contraction converges in a handful of phase
    * pairs. `maxIters` 25 bounds log²-many contraction rounds with a
    * wide margin; non-convergence warns loudly. */
  def mediaNearDupClusters(ids: DataFrame, pairs: DataFrame,
                           maxIters: Int = 25): DataFrame = {
    val p = pairs
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      .localCheckpoint(true)
    // Contract over PARTICIPANTS only — assets appearing in at least
    // one pair. Assets with no near-dup edge (the overwhelming bulk of
    // a real corpus) are singleton clusters by definition and never
    // enter the iterative loop; they rejoin at the end with
    // cluster = own id. This keeps every per-round shuffle
    // proportional to the near-dup SUBGRAPH, not the corpus — at
    // sf0.1, 35k participants of 100k images; at 100 TB the ratio is
    // far more lopsided.
    val participants = p.select(col("doc_a").as("doc_id"))
      .union(p.select(col("doc_b").as("doc_id")))
      .distinct()
    val lab = Dedup.starContractLabels(participants, p, maxIters)
      .withColumnRenamed("doc_id", "id")
    val out = ids.select(col("id"))
      .join(lab, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("cluster"), col("id")).as("cluster"))
      .withColumn("keep", col("id") === col("cluster"))
    Dedup.releaseLocalCheckpoint(p)
    out
  }

  /** ONE transitive closure over SEVERAL modalities' pair graphs — the
    * admission book's composition shape. The per-modality graphs are
    * disjoint by construction (an image never pairs with an audio
    * clip), so running [[mediaNearDupClusters]] once per modality pays
    * the iterative contraction's fixed per-round cost (3 actions ×
    * O(log² n) phases — measured ~37 s of the sf0.1 book's ~52 s,
    * dominated by per-round job overhead, not data) THREE times over.
    * This variant makes the union id space collision-free by encoding
    * `id·k + code` (k = number of modalities, code = position in
    * `parts`; ANSI arithmetic makes a never-expected Long overflow
    * loud), contracts the UNION graph once — rounds become the MAX
    * over modalities instead of the sum, per-round shuffle volume is
    * the sum of the (tiny) subgraphs — and decodes back.
    * Component minima stay within one modality (disjointness), so the
    * decoded (id, cluster, keep) rows are exactly the per-modality
    * results — spec-pinned, and the book's oracle replays the
    * per-modality recursion unchanged. At 100 TB the same argument
    * holds: one iterative job over all modalities' near-dup subgraphs
    * instead of one scheduler round-trip storm per modality.
    *
    * `parts`: (modality label, ids(id), pairs(id_a, id_b, …)) per
    * modality; any Long ids (the pmod decode is sign-safe). Returns
    * (modality, id, cluster, keep). */
  def mediaNearDupClustersMulti(parts: Seq[(String, DataFrame, DataFrame)],
                                maxIters: Int = 25): DataFrame = {
    require(parts.nonEmpty, "mediaNearDupClustersMulti needs >= 1 modality")
    val k = parts.size.toLong
    def enc(c: Column, code: Int): Column =
      c.cast("long") * lit(k) + lit(code.toLong)
    val encIds = parts.zipWithIndex.map { case ((m, ids, _), code) =>
      ids.select(lit(m).as("modality"), enc(col("id"), code).as("id"))
    }.reduce(_ unionByName _)
    val encPairs = parts.zipWithIndex.map { case ((_, _, pairs), code) =>
      pairs.select(enc(col("id_a"), code).as("id_a"),
        enc(col("id_b"), code).as("id_b"))
    }.reduce(_ unionByName _)
    val clustered = mediaNearDupClusters(encIds.select("id"), encPairs, maxIters)
    // Sign-safe decode: pmod(id·k + code, k) == code for ANY Long id
    // (pmod is non-negative by definition), and (enc − code) is an
    // exact multiple of k, which `div` divides exactly regardless of
    // sign — a bare `enc div k` would mis-decode negative ids
    // (truncating division). The component-min cluster label carries
    // the same modality code (min over one modality's ids, and
    // id ↦ id·k+code is order-preserving), so it decodes identically.
    def dec(c: String): Column = expr(s"($c - pmod($c, $k)) div $k")
    encIds.join(clustered, "id")
      .select(col("modality"), dec("id").as("id"),
        dec("cluster").as("cluster"), col("keep"))
  }

  /** Per-asset admission verdict for ONE modality — the media
    * admission book's row shape (VERDICT r10 #3): exact survivorship
    * (min-id keeper per exact-fingerprint group — equality cliques
    * need no pair graph or closure, one shuffle on the 16-byte key) ∧
    * perceptual survivorship (the closure keeper from
    * [[mediaNearDupClusters]] over the modality's banded-Hamming pair
    * graph). `admit` is the conjunction: an asset enters the training
    * mix only if it is BOTH the canonical copy of its byte/pixel/
    * sample-identical clique AND the keeper of its perceptual
    * near-dup cluster. `exactFps` must carry `(id, fpCol)`;
    * `perceptual` must carry `(id, keep)` (the clusters shape). */
  def mediaAdmissionVerdicts(exactFps: DataFrame, fpCol: String,
                             perceptual: DataFrame,
                             modality: String): DataFrame = {
    // groupBy+join, NOT a window over fpCol: window partitions get no
    // map-side partial aggregation, so a corpus-wide hot exact-dup
    // group (a viral asset copied millions of times — exactly what
    // exact dedup targets) would land its whole group on one task.
    // The aggregate's partial combine keeps per-task input bounded
    // regardless of group skew; results are identical (min-id keeper).
    val keepers = exactFps.groupBy(col(fpCol))
      .agg(min(col("id")).as("keep_id"))
    exactFps.select(col("id"), col(fpCol))
      .join(keepers, fpCol)
      .select(col("id"), (col("id") === col("keep_id")).as("keep_exact"))
      .join(perceptual.select(col("id"), col("keep").as("keep_perceptual")),
        "id")
      .select(lit(modality).as("modality"), col("id"), col("keep_exact"),
        col("keep_perceptual"),
        (col("keep_exact") && col("keep_perceptual")).as("admit"))
  }

  /** One sampled frame of a media payload. */
  final case class KeyframeSample(id: Long, frameIdx: Int, dts: Long,
                                  frameLen: Int, byteSum: Long)

  /** REAL keyframe sampling from the ISO-BMFF container ([[Mp4]]):
    * parse the box tree, walk the sample tables, and emit one typed row
    * per `stss` SYNC sample — index, decode timestamp (`stts`), payload
    * length (`stsz`), and the exact payload byte sum extracted from
    * `mdat` via the `stsc`/`stco` addressing. This is the frame-sample
    * stage of a video pipeline (thumbnailing, per-keyframe featurizers):
    * keyframes decode independently of inter-frame state, so they are
    * the only samples a distributed featurizer can take without a full
    * bitstream decode. Row-multiplying `mapPartitions` (like
    * `mapInPandas` with an exploding batch function); frames of one
    * payload stay in one partition, no shuffle, caps before allocation.
    * (Replaced the r1-era fixed-size byte-chunking STUB in r15 — the
    * container machinery `multimodal_mp4`/`multimodal_video_phash`
    * already gate made it obsolete; VERDICT r14 #3.) */
  def sampleKeyframes(df: DataFrame, idCol: String,
                      binCol: String): Dataset[KeyframeSample] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val m = Mp4.parse(bytes)
        m.samples.iterator.filter(_.keyframe).map { s =>
          val payload = m.sampleBytes(bytes, s)
          var sum = 0L
          var j = 0
          while (j < payload.length) { sum += payload(j) & 0xFF; j += 1 }
          KeyframeSample(id, s.index, s.dts, s.size, sum)
        }
      })
  }

  final case class ScaleInvariantHash(id: Long, ahash: Long)

  /** The invariant-key family's ONE fixed-grid thumb rule (factored
    * per ADVICE r16 #3 — previously duplicated across the image, video
    * and time-aligned keys, where a drift would silently desynchronize
    * the keys from each other and from the shared oracle CTEs):
    * nearest-neighbor-sample the `bw`×`bh` region of `px` anchored at
    * (`bx`, `by`) onto the fixed `thumbW`×`thumbH` grid, then the ONE
    * shared [[aHashBits]] rule. The NN index map `bx + x·bw/thumbW`
    * composes exactly under integer rescaling (double-floor identity)
    * AND under border offsets (the crop-invariant keys pass the
    * content box; the scale keys pass the full frame: bx=by=0,
    * bw=w0, bh=h0). */
  private[graft] def nnThumbAHash(w0: Long, px: Array[Int],
                                  bx: Long, by: Long, bw: Long, bh: Long,
                                  thumbW: Int, thumbH: Int): Long = {
    val out = new Array[Int](thumbW * thumbH)
    var y = 0
    while (y < thumbH) {
      val sy = (by + y * bh / thumbH).toInt
      var x = 0
      while (x < thumbW) {
        out(y * thumbW + x) = px(sy * w0.toInt + (bx + x * bw / thumbW).toInt)
        x += 1
      }
      y += 1
    }
    aHashBits(out)
  }

  /** The video family's ONE 64→16-bit XOR fold (r18: factored from
    * [[thumbFold]] so the orbit-canonical video keys can fold a
    * min-over-orientations hash through the SAME rule). */
  private[graft] def fold16(hash: Long): Long =
    (hash ^ (hash >>> 16) ^ (hash >>> 32) ^ (hash >>> 48)) & 0xFFFFL

  /** [[nnThumbAHash]] XOR-folded to the video family's 16-bit per-frame
    * signature field — the second half of the shared rule (ADVICE
    * r16 #3). */
  private[graft] def thumbFold(w0: Long, px: Array[Int],
                               bx: Long, by: Long, bw: Long, bh: Long,
                               thumbW: Int, thumbH: Int): Long =
    fold16(nnThumbAHash(w0, px, bx, by, bw, bh, thumbW, thumbH))

  /** SCALE-INVARIANT image signature (r14): nearest-neighbor thumb to
    * a FIXED `thumbW`×`thumbH` grid (classic 8×8 aHash domain; aspect
    * deliberately ignored — the thumb is a signature space, not a
    * display artifact), then the ONE shared [[aHashBits]] rule.
    *
    * Why it exists: [[imageAHashPairs]] groups candidates by exact
    * dimensions, so a re-SCALED copy of an image — the most common
    * image near-duplicate on the web after re-encoding — can never
    * pair with its original. The fixed-grid thumb removes dimensions
    * from the key entirely. And nearest-neighbor sampling composes
    * EXACTLY under integer rescaling: for any integer factor k,
    * `floor(floor(x·k·w0/t)/k) = floor(x·w0/t)`, so an NN k×-rescaled
    * copy produces the bit-IDENTICAL thumb and collides at Hamming 0 —
    * spec-proven, and the gate's oracle replays the double-floor from
    * closed form. Brightness invariance is inherited from aHash. */
  def imageScaleInvariantHash(df: DataFrame, idCol: String, binCol: String,
                              thumbW: Int = 8, thumbH: Int = 8): Dataset[ScaleInvariantHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(thumbW * thumbH <= 64, "thumb must fit one 64-bit hash")
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (w0, h0, px) = decodeImagePayload(bytes)
        ScaleInvariantHash(id, nnThumbAHash(w0, px, 0, 0, w0, h0, thumbW, thumbH))
      })
  }

  /** Near-dup pairs over the scale-invariant signatures — the shared
    * [[bandedHammingPairs]] machinery with ONE corpus-wide group (the
    * fixed thumb domain replaces the dimensions key) and the video
    * path's 16-bit × 4 banding over the 64-bit hash. `maxHamming` 6:
    * ≤3 exhaustive, 4-6 probabilistic — the family posture. */
  def imageScaleInvariantPairs(sigs: DataFrame, maxHamming: Int = 6,
                               bucketCap: Int = 64, candCap: Int = 4): DataFrame =
    bandedHammingPairs(sigs, hashCol = "ahash", group = lit("thumb"),
      bandBits = 16, numBands = 4, maxHamming = maxHamming,
      bucketCap = bucketCap, candCap = candCap, metric = "img_si")

  /** [[incrementalBandedHamming]] over the scale-invariant
    * signatures — the steady-state screen for the CROSS-RESOLUTION
    * key: a new batch's fixed-grid thumbs against the standing
    * corpus's persisted thumb index (the artifact), same fixed group
    * and 16-bit banding as [[imageScaleInvariantPairs]]. A rescaled
    * re-upload of standing content hits at Hamming 0, which the
    * dimension-grouped [[incrementalImageNearDups]] can never see. */
  def incrementalScaleInvariantNearDups(corpusSigs: DataFrame,
                                        batchSigs: DataFrame,
                                        maxHamming: Int = 6,
                                        bucketCap: Int = 64,
                                        candCap: Int = 4): DataFrame =
    incrementalBandedHamming(corpusSigs, batchSigs, hashCol = "ahash",
      group = lit("thumb"), bandBits = 16, numBands = 4,
      maxHamming = maxHamming, bucketCap = bucketCap, candCap = candCap,
      metric = "img_si_incr")

  /** Nearest-neighbor 2× upscale (decode → re-encode at doubled dims,
    * target (x, y) reads source (x/2, y/2)) — the cross-resolution
    * duplicate generator the scale-invariant gate and its spec share. */
  def nnUpscale2x(bytes: Array[Byte]): Array[Byte] = {
    val (w0, h0, px) = decodeImagePayload(bytes)
    val w = w0.toInt; val h = h0.toInt
    Bmp.encode(2 * w, 2 * h, (x, y) => {
      val p = px((y / 2) * w + (x / 2))
      ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
    })
  }

  /** Content box of a decoded frame — the integer-exact
    * letterbox/pillarbox detector (r17, VERDICT r16 #3): trim rows,
    * then columns, that are UNIFORMLY equal to the corner pixel
    * px(0, 0) (the border reference). Returns (bx, by, bw, bh); a
    * fully-uniform frame keeps the whole frame (a flat image's content
    * IS its border color — trimming it to nothing would leave no
    * signature domain). Integer-exact and oracle-replayable: on the
    * gate fixtures the trim provably recovers the EXACT original pixel
    * rectangle (no content row or column of the coprime-moduli
    * formulas can be uniform — spec-proven), so the oracle replays the
    * key with no border arithmetic at all. */
  private[graft] def contentBox(w: Int, h: Int, px: Array[Int]): (Int, Int, Int, Int) = {
    val border = px(0)
    def rowAllBorder(y: Int): Boolean = {
      var x = 0
      while (x < w && px(y * w + x) == border) x += 1
      x == w
    }
    def colAllBorder(x: Int, y0: Int, y1: Int): Boolean = {
      var y = y0
      while (y < y1 && px(y * w + x) == border) y += 1
      y == y1
    }
    var top = 0
    while (top < h && rowAllBorder(top)) top += 1
    if (top == h) (0, 0, w, h)
    else {
      var bot = h
      while (bot > top && rowAllBorder(bot - 1)) bot -= 1
      var left = 0
      while (left < w && colAllBorder(left, top, bot)) left += 1
      var right = w
      while (right > left && colAllBorder(right - 1, top, bot)) right -= 1
      (left, top, right - left, bot - top)
    }
  }

  /** CROP/LETTERBOX-INVARIANT image signature (r17, VERDICT r16 #3):
    * [[contentBox]] trim, then the family's fixed-grid NN thumb +
    * shared aHash rule over the BOX ([[nnThumbAHash]] with box
    * anchors). Why it exists: a letterboxed or pillarboxed re-upload —
    * the most common layout transcode after rescaling — changes EVERY
    * fixed-grid thumb cell, so [[imageScaleInvariantHash]] provably
    * misses it (border pixels enter the thumb), and the
    * dimension-grouped [[imageAHashPairs]] cannot even compare the
    * pair (the canvas dims differ). The trim removes the border BEFORE
    * the thumb, so a letterboxed copy's signature is bit-IDENTICAL to
    * its original's (the box recovers the exact source rectangle —
    * content rows of the fixtures are never uniform, so the trim stops
    * exactly at the border). And the NN box thumb composes under
    * integer rescaling exactly like the full-frame thumb (floor
    * identity with box offsets: an NN k×-upscale maps the box to
    * (k·bx, k·by, k·bw, k·bh) and ⌊(k·bx + ⌊x·k·bw/t⌋)/k⌋ =
    * bx + ⌊x·bw/t⌋), so the key absorbs letterbox AND rescale
    * COMPOSED — the gate fixtures are NN-2×-upscaled letterboxes, and
    * both invariances are spec-proven both directions.
    *
    * LIMITATION (ADVICE r17 #3): [[contentBox]] trims rows/columns
    * EXACTLY equal to the corner pixel px(0,0), so the Hamming-0
    * letterbox invariance holds for clean (bit-uniform) borders — the
    * fixture class and the common hard-matte transcode. On lossy
    * real-world corpora a corner watermark, JPEG-noisy borders, or
    * content edge rows that happen to match the corner color can trim
    * the original and the copy ASYMMETRICALLY, degrading this key to a
    * miss (never a false merge — a wrong box only moves the thumb
    * domain). Point this key at such corpora with a majority-border or
    * tolerance-based trim in front; the signature/banding machinery is
    * unchanged by the box rule. */
  def imageCropInvariantHash(df: DataFrame, idCol: String, binCol: String,
                             thumbW: Int = 8, thumbH: Int = 8): Dataset[ScaleInvariantHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(thumbW * thumbH <= 64, "thumb must fit one 64-bit hash")
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (w0, h0, px) = decodeImagePayload(bytes)
        val (bx, by, bw, bh) = contentBox(w0.toInt, h0.toInt, px)
        ScaleInvariantHash(id, nnThumbAHash(w0, px, bx, by, bw, bh, thumbW, thumbH))
      })
  }

  /** Near-dup pairs over the crop-invariant signatures — the shared
    * [[bandedHammingPairs]] machinery with ONE corpus-wide group (the
    * content-box thumb domain carries no dimensions) and the family's
    * 16-bit × 4 banding. `maxHamming` 6: ≤3 exhaustive, 4-6
    * probabilistic — the family posture. */
  def imageCropInvariantPairs(sigs: DataFrame, maxHamming: Int = 6,
                              bucketCap: Int = 64, candCap: Int = 4): DataFrame =
    bandedHammingPairs(sigs, hashCol = "ahash", group = lit("cbox"),
      bandBits = 16, numBands = 4, maxHamming = maxHamming,
      bucketCap = bucketCap, candCap = candCap, metric = "img_ci")

  /** [[incrementalBandedHamming]] over the crop-invariant signatures —
    * the steady-state screen for the CROSS-LAYOUT key: a new batch's
    * content-box thumbs against the standing corpus's persisted index,
    * same fixed group and banding as [[imageCropInvariantPairs]]. A
    * letterboxed (even letterboxed-and-rescaled) re-upload of standing
    * content hits at Hamming 0, which neither the dimension-grouped
    * NOR the full-frame scale-invariant screen can see. */
  def incrementalCropInvariantNearDups(corpusSigs: DataFrame,
                                       batchSigs: DataFrame,
                                       maxHamming: Int = 6,
                                       bucketCap: Int = 64,
                                       candCap: Int = 4): DataFrame =
    incrementalBandedHamming(corpusSigs, batchSigs, hashCol = "ahash",
      group = lit("cbox"), bandBits = 16, numBands = 4,
      maxHamming = maxHamming, bucketCap = bucketCap, candCap = candCap,
      metric = "img_ci_incr")

  /** Horizontal mirror of a decoded pixel array — the orbit element
    * the mirror-invariant key canonicalizes over. */
  private[graft] def mirrorH(w: Int, h: Int, px: Array[Int]): Array[Int] = {
    val out = new Array[Int](px.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = px(y * w + (w - 1 - x)); x += 1 }
      y += 1
    }
    out
  }

  /** MIRROR-INVARIANT image signature (r17): the minimum of the
    * fixed-grid thumb hash over BOTH horizontal orientations of the
    * decoded array — orbit canonicalization, the only exact route. Why
    * not "thumb then flip the cells": NN sampling does NOT commute
    * with reflection (w−1−⌊x·w/t⌋ ≠ ⌊(t−1−x)·w/t⌋ in general), so a
    * cell-permuted hash would drift by a bit or two and the invariance
    * claim would be approximate. Hashing each PHYSICAL orientation and
    * taking the signed min is exact by set equality: mirror is an
    * involution, so the copy's orientation set {H(m(px)), H(m(m(px)))}
    * IS the original's {H(px), H(m(px))} — identical min, Hamming 0.
    * And it composes with the scale key's axis: NN 2× upscale commutes
    * with mirror EXACTLY (⌊(2w−1−x)/2⌋ = w−1−⌊x/2⌋ for both parities),
    * so a mirrored-AND-rescaled re-upload (the gate fixture) still
    * collides — spec-proven both directions. Why it exists: a mirrored
    * re-upload preserves dimensions AND brightness statistics, so the
    * dimension-grouped key compares it but at a large Hamming
    * distance, and the scale/crop keys hash different bits — every
    * current key provably misses it. */
  def imageMirrorInvariantHash(df: DataFrame, idCol: String, binCol: String,
                               thumbW: Int = 8, thumbH: Int = 8): Dataset[ScaleInvariantHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(thumbW * thumbH <= 64, "thumb must fit one 64-bit hash")
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (w0, h0, px) = decodeImagePayload(bytes)
        val plain = nnThumbAHash(w0, px, 0, 0, w0, h0, thumbW, thumbH)
        val flipped = nnThumbAHash(w0, mirrorH(w0.toInt, h0.toInt, px),
          0, 0, w0, h0, thumbW, thumbH)
        ScaleInvariantHash(id, math.min(plain, flipped))
      })
  }

  /** Near-dup pairs over the mirror-invariant signatures — the shared
    * [[bandedHammingPairs]] machinery with ONE corpus-wide group (the
    * canonical orientation carries no dimensions) and the family's
    * 16-bit × 4 banding. */
  def imageMirrorInvariantPairs(sigs: DataFrame, maxHamming: Int = 6,
                                bucketCap: Int = 64, candCap: Int = 4): DataFrame =
    bandedHammingPairs(sigs, hashCol = "ahash", group = lit("mthumb"),
      bandBits = 16, numBands = 4, maxHamming = maxHamming,
      bucketCap = bucketCap, candCap = candCap, metric = "img_mi")

  /** [[incrementalBandedHamming]] over the mirror-invariant
    * signatures — the steady-state screen for the CROSS-ORIENTATION
    * key: a new batch's canonical thumbs against the standing corpus's
    * persisted index, same fixed group and banding as
    * [[imageMirrorInvariantPairs]]. A mirrored (even
    * mirrored-and-rescaled) re-upload of standing content hits at
    * Hamming 0, which no other image screen can see. */
  def incrementalMirrorInvariantNearDups(corpusSigs: DataFrame,
                                         batchSigs: DataFrame,
                                         maxHamming: Int = 6,
                                         bucketCap: Int = 64,
                                         candCap: Int = 4): DataFrame =
    incrementalBandedHamming(corpusSigs, batchSigs, hashCol = "ahash",
      group = lit("mthumb"), bandBits = 16, numBands = 4,
      maxHamming = maxHamming, bucketCap = bucketCap, candCap = candCap,
      metric = "img_mi_incr")

  /** Horizontal-mirror generator (decode → flip each row → re-encode) —
    * the cross-orientation duplicate generator the mirror-invariant
    * gates and spec share. */
  def mirrorBmp(bytes: Array[Byte]): Array[Byte] = {
    val (w0, h0, px) = decodeImagePayload(bytes)
    val w = w0.toInt; val h = h0.toInt
    Bmp.encode(w, h, (x, y) => {
      val p = px(y * w + (w - 1 - x))
      ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
    })
  }

  /** 90°-clockwise rotation of a decoded pixel array — the second
    * generator of the dihedral orbit (r18, VERDICT r17 #4). Output
    * dims are (h, w); out(x, y) = in(y, h−1−x). */
  private[graft] def rot90(w: Int, h: Int, px: Array[Int]): Array[Int] = {
    val out = new Array[Int](px.length)
    var y = 0
    while (y < w) {
      var x = 0
      while (x < h) { out(y * h + x) = px((h - 1 - x) * w + y); x += 1 }
      y += 1
    }
    out
  }

  /** ROTATION-INVARIANT image signature (r18, VERDICT r17 #4 — the D4
    * completion of [[imageMirrorInvariantHash]]): the signed minimum of
    * the fixed-grid thumb hash over ALL EIGHT orientations of the
    * decoded array — the four rotations and their mirrors, the full
    * dihedral orbit. Why it exists: a 90°-rotated re-upload SWAPS the
    * dimensions, so every prior key misses it — the dimension-grouped
    * key can't even compare the pair, the scale/crop keys hash the
    * uploaded orientation's bits, and the mirror key canonicalizes
    * only over {identity, mirror}, which doesn't contain any rotation
    * (spec-asserted per key). Exactness is the mirror key's orbit
    * argument lifted to the whole group: D4 is a group, so a copy
    * rotated/mirrored by any element has the SAME orientation SET as
    * its original — identical min, Hamming 0. Each orientation is
    * hashed as a PHYSICAL array (iterated [[rot90]] + [[mirrorH]]),
    * never by permuting thumb cells: NN sampling commutes with neither
    * reflection NOR transpose, so a cell-permuted shortcut would be
    * approximate (the mirror key's lesson, squared). And the orbit
    * composes with the scale axis: NN 2× upscale commutes EXACTLY with
    * mirror (r17) and with rot90 (⌊(2h−1−x)/2⌋ = h−1−⌊x/2⌋ — the same
    * parity identity on the swapped coordinate), so a
    * rotated-AND-rescaled re-upload still collides — the gate fixtures
    * compose both, spec-proven both directions. Requires a SQUARE
    * thumb (odd rotations swap dims; an 8×6 thumb would compare
    * incomparable grids). */
  def imageRotationInvariantHash(df: DataFrame, idCol: String, binCol: String,
                                 thumbW: Int = 8, thumbH: Int = 8): Dataset[ScaleInvariantHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(thumbW == thumbH, "rotation orbit needs a square thumb grid")
    require(thumbW * thumbH <= 64, "thumb must fit one 64-bit hash")
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (w0, h0, px) = decodeImagePayload(bytes)
        var arr = px
        var w = w0.toInt
        var h = h0.toInt
        var best = Long.MaxValue
        var r = 0
        while (r < 4) {
          val plain = nnThumbAHash(w, arr, 0, 0, w, h, thumbW, thumbH)
          val mirrored = nnThumbAHash(w, mirrorH(w, h, arr), 0, 0, w, h,
            thumbW, thumbH)
          if (plain < best) best = plain
          if (mirrored < best) best = mirrored
          arr = rot90(w, h, arr)
          val t = w; w = h; h = t
          r += 1
        }
        ScaleInvariantHash(id, best)
      })
  }

  /** Near-dup pairs over the rotation-invariant signatures — the
    * shared [[bandedHammingPairs]] machinery with ONE corpus-wide
    * group (the canonical orientation carries no dimensions) and the
    * family's 16-bit × 4 banding. */
  def imageRotationInvariantPairs(sigs: DataFrame, maxHamming: Int = 6,
                                  bucketCap: Int = 64, candCap: Int = 4): DataFrame =
    bandedHammingPairs(sigs, hashCol = "ahash", group = lit("rthumb"),
      bandBits = 16, numBands = 4, maxHamming = maxHamming,
      bucketCap = bucketCap, candCap = candCap, metric = "img_ri")

  /** [[incrementalBandedHamming]] over the rotation-invariant
    * signatures — the steady-state screen for the CROSS-ORIENTATION
    * key's full dihedral orbit: a new batch's canonical thumbs against
    * the standing corpus's persisted index, same fixed group and
    * banding as [[imageRotationInvariantPairs]]. A rotated (even
    * rotated-and-rescaled, or rotated-and-mirrored) re-upload of
    * standing content hits at Hamming 0, which no other image screen —
    * including the mirror screen — can see. */
  def incrementalRotationInvariantNearDups(corpusSigs: DataFrame,
                                           batchSigs: DataFrame,
                                           maxHamming: Int = 6,
                                           bucketCap: Int = 64,
                                           candCap: Int = 4): DataFrame =
    incrementalBandedHamming(corpusSigs, batchSigs, hashCol = "ahash",
      group = lit("rthumb"), bandBits = 16, numBands = 4,
      maxHamming = maxHamming, bucketCap = bucketCap, candCap = candCap,
      metric = "img_ri_incr")

  /** 90°-clockwise-rotation generator over encoded bytes (decode →
    * [[rot90]] → re-encode, applied `turns` times mod 4) — the
    * cross-rotation duplicate generator the rotation-invariant gates
    * and spec share. */
  def rotateBmp(bytes: Array[Byte], turns: Int): Array[Byte] = {
    val (w0, h0, px) = decodeImagePayload(bytes)
    var arr = px
    var w = w0.toInt
    var h = h0.toInt
    var r = ((turns % 4) + 4) % 4
    while (r > 0) {
      arr = rot90(w, h, arr)
      val t = w; w = h; h = t
      r -= 1
    }
    val out = arr
    val ow = w
    Bmp.encode(w, h, (x, y) => {
      val p = out(y * ow + x)
      ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
    })
  }

  /** Letterbox generator: place the decoded frame at offset
    * (padL, padT) inside a larger canvas filled with a uniform border
    * color — the cross-layout duplicate generator the crop-invariant
    * gates and spec share (the layout sibling of [[nnUpscale2x]]).
    * Comes back as BMP (a frame-codec transcode axis, pixels exact). */
  def letterbox(bytes: Array[Byte], padL: Int, padT: Int, padR: Int,
                padB: Int, borderR: Int = 0, borderG: Int = 0,
                borderB: Int = 0): Array[Byte] = {
    require(padL >= 0 && padT >= 0 && padR >= 0 && padB >= 0,
      "letterbox pads must be non-negative")
    val (w0, h0, px) = decodeImagePayload(bytes)
    val w = w0.toInt; val h = h0.toInt
    Bmp.encode(w + padL + padR, h + padT + padB, (x, y) =>
      if (x < padL || x >= padL + w || y < padT || y >= padT + h)
        (borderR, borderG, borderB)
      else {
        val p = px((y - padT) * w + (x - padL))
        ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
      })
  }

  final case class VideoScaleInvariantHash(id: Long, n_key: Long, sig: Long)

  /** SCALE-INVARIANT video signature (r16) — closes the last gap in the
    * invariant-key family (VERDICT r15 #1): [[videoPerceptualPairs]]
    * groups candidates by exact `width×height:n_key`, so a re-SCALED
    * video transcode — the most common video re-encode on the web — is
    * structurally invisible to every video key the engine had. The fix
    * is the image family's ([[imageScaleInvariantHash]], r14): each
    * `stss` keyframe decodes and routes through the FIXED
    * `thumbW`×`thumbH` nearest-neighbor thumb BEFORE [[aHashBits]], so
    * dimensions drop out of the signature entirely; the per-frame
    * 64-bit thumb hash XOR-folds to 16 bits and packs into one BIGINT
    * clip signature (frame k at bits [16k, 16k+16)), the
    * [[videoPerceptualHash]] shape. NN thumb sampling composes EXACTLY
    * under integer rescaling (`floor(floor(x·k·w0/t)/k) = floor(x·w0/t)`),
    * so an NN k×-rescaled transcode produces the bit-IDENTICAL
    * signature and collides at Hamming 0 — spec-proven both directions
    * (the dimension-grouped key provably cannot see the same pair).
    * Brightness invariance is inherited from aHash; keyframe-less
    * clips DROP with an observable counter (the [[videoPerceptualHash]]
    * batch posture); mixed-dimension keyframes are legal HERE (each
    * frame thumbs to the fixed grid independently — dimension equality
    * was only ever a comparability requirement of the un-thumbed key). */
  def videoScaleInvariantHash(df: DataFrame, idCol: String, binCol: String,
                              maxKeyframes: Int = 4, thumbW: Int = 8,
                              thumbH: Int = 8): Dataset[VideoScaleInvariantHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(thumbW * thumbH <= 64, "thumb must fit one 64-bit hash")
    require(maxKeyframes >= 1 && maxKeyframes <= 4,
      s"maxKeyframes must be in [1, 4] (16-bit folds in one BIGINT), got $maxKeyframes")
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, videoSiOne(id, bytes, maxKeyframes, thumbW, thumbH))
      })
      .toDF("id", "v")
      .observe("video_si_drops_" +
          java.util.UUID.randomUUID().toString.replace("-", ""),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("keyframeless_dropped"))
      .where(col("v").isNotNull)
      .select(col("v.id").as("id"), col("v.n_key").as("n_key"),
        col("v.sig").as("sig"))
      .as[VideoScaleInvariantHash]
  }

  /** Per-clip body of [[videoScaleInvariantHash]] (factored for the
    * spec's invariance proofs): real container parse, per-keyframe
    * decode → fixed-grid NN thumb → shared aHash rule → 16-bit fold.
    * None for a clip with no `stss` keyframes (no perceptual identity
    * here — same contract as [[videoPHashOne]]). */
  private[graft] def videoSiOne(id: Long, bytes: Array[Byte], maxKeyframes: Int,
                                thumbW: Int, thumbH: Int): Option[VideoScaleInvariantHash] = {
    val m = Mp4.parse(bytes)
    val keys = m.samples.filter(_.keyframe).take(maxKeyframes)
    if (keys.isEmpty) None
    else {
      var sig = 0L
      var k = 0
      while (k < keys.length) {
        val (w0, h0, px) = decodeImagePayload(m.sampleBytes(bytes, keys(k)))
        sig |= thumbFold(w0, px, 0, 0, w0, h0, thumbW, thumbH) << (16 * k)
        k += 1
      }
      Some(VideoScaleInvariantHash(id, keys.length.toLong, sig))
    }
  }

  /** Near-dup pairs over the scale-invariant video signatures — the
    * shared [[bandedHammingPairs]] machinery with the dimensions
    * DROPPED from the group (the fixed thumb domain replaces them;
    * `n_key` stays — signatures with different keyframe counts occupy
    * different bit ranges and a Hamming compare between them is
    * meaningless) and the video path's 16-bit × 4 banding. `maxHamming`
    * 6: ≤3 exhaustive, 4-6 probabilistic — the family posture. */
  def videoScaleInvariantPairs(sigs: DataFrame, maxHamming: Int = 6,
                               bucketCap: Int = 64, candCap: Int = 4): DataFrame =
    bandedHammingPairs(sigs, hashCol = "sig",
      group = concat(lit("vthumb:"), col("n_key").cast("string")),
      bandBits = 16, numBands = 4, maxHamming = maxHamming,
      bucketCap = bucketCap, candCap = candCap, metric = "vid_si")

  /** [[incrementalBandedHamming]] over the scale-invariant video
    * signatures — the steady-state screen for the CROSS-RESOLUTION
    * video key: a new batch's fixed-grid clip signatures against the
    * standing corpus's persisted index, same group and banding as
    * [[videoScaleInvariantPairs]]. An NN-rescaled transcode of
    * standing content hits at Hamming 0, which the dimension-grouped
    * [[incrementalVideoPerceptualNearDups]] can never see. */
  def incrementalVideoScaleInvariantNearDups(corpusSigs: DataFrame,
                                             batchSigs: DataFrame,
                                             maxHamming: Int = 6,
                                             bucketCap: Int = 64,
                                             candCap: Int = 4): DataFrame =
    incrementalBandedHamming(corpusSigs, batchSigs, hashCol = "sig",
      group = concat(lit("vthumb:"), col("n_key").cast("string")),
      bandBits = 16, numBands = 4, maxHamming = maxHamming,
      bucketCap = bucketCap, candCap = candCap, metric = "vid_si_incr")

  /** SCALE- AND STRIDE-INVARIANT video signature (r16) — the
    * composition of [[videoScaleInvariantHash]]'s fixed-grid thumb with
    * [[videoPerceptualHashTimeAligned]]'s content-timeline sampling: a
    * transcode that RESCALES and RE-PLACES KEYFRAMES evades both
    * parents (the thumb key samples the `stss` set, which a different
    * keyStride moves; the time-aligned key groups by dimensions, which
    * a rescale changes) — this key samples slot k of `nSamples` at the
    * last frame whose dts ≤ k/nSamples of the presentation extent
    * (elst-aware, the aligned sampler's exact rule) and routes each
    * sampled frame through the fixed `thumbW`×`thumbH` NN thumb before
    * [[aHashBits]]. Invariant to container timing, keyframe placement,
    * AND spatial resolution at once; 16-bit folds pack by slot (slot 3
    * wraps into the sign bit — the aligned key's oracle precedent).
    * `n_key` is always `nSamples`, so the one corpus-wide group needs
    * no dimension key at all. Sample-less clips DROP with an
    * observable counter (ADVICE r16 #2 — the [[videoScaleInvariantHash]]
    * posture; the old throw would poison-retry a micro-batch forever
    * in [[graft.streaming.StreamingIngest.videoScaleTimeInvariantDedupStream]],
    * the exact hazard the r12 quarantine tier was built for). */
  def videoScaleInvariantHashTimeAligned(df: DataFrame, idCol: String,
                                         binCol: String, nSamples: Int = 4,
                                         thumbW: Int = 8, thumbH: Int = 8)
      : Dataset[VideoScaleInvariantHash] = {
    require(nSamples >= 1 && nSamples <= 4,
      s"nSamples must be in [1, 4] (16-bit folds in one BIGINT), got $nSamples")
    require(thumbW * thumbH <= 64, "thumb must fit one 64-bit hash")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, videoStiOne(id, bytes, nSamples, thumbW, thumbH))
      })
      .toDF("id", "v")
      .observe("video_sti_drops_" +
          java.util.UUID.randomUUID().toString.replace("-", ""),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("sampleless_dropped"))
      .where(col("v").isNotNull)
      .select(col("v.id").as("id"), col("v.n_key").as("n_key"),
        col("v.sig").as("sig"))
      .as[VideoScaleInvariantHash]
  }

  /** Per-clip body of [[videoScaleInvariantHashTimeAligned]] (factored
    * for the spec's invariance proofs — the [[videoSiOne]] shape): real
    * container parse, elst-aware slot targets, per-sampled-frame
    * decode → fixed-grid NN thumb → shared fold. None for a clip with
    * no samples (no perceptual identity here — same contract as
    * [[videoSiOne]], ADVICE r16 #2). */
  private[graft] def videoStiOne(id: Long, bytes: Array[Byte], nSamples: Int,
                                 thumbW: Int, thumbH: Int): Option[VideoScaleInvariantHash] = {
    val m = Mp4.parse(bytes)
    if (m.samples.isEmpty) None
    else {
      val presDur = if (m.editDuration > 0) m.editDuration else m.duration
      var sig = 0L
      // decode+thumb once per distinct frame: slots repeat frames on
      // short clips and decode is the expensive step (the aligned
      // sampler's cache shape)
      val foldCache = scala.collection.mutable.Map.empty[Int, Long]
      var k = 0
      while (k < nSamples) {
        val target = m.editMediaTime + k.toLong * presDur / nSamples
        val s = m.samples.takeWhile(_.dts <= target).lastOption
          .getOrElse(m.samples.head)
        val fold = foldCache.getOrElseUpdate(s.index, {
          val (w0, h0, px) = decodeImagePayload(m.sampleBytes(bytes, s))
          thumbFold(w0, px, 0, 0, w0, h0, thumbW, thumbH)
        })
        sig |= fold << (16 * k)
        k += 1
      }
      Some(VideoScaleInvariantHash(id, nSamples.toLong, sig))
    }
  }

  /** Near-dup pairs over the scale+stride-invariant signatures — the
    * shared [[bandedHammingPairs]] machinery with ONE corpus-wide
    * group (`n_key` is the constant slot count and dimensions are
    * thumbed away, so nothing distinguishes comparable clips) and the
    * family's 16-bit × 4 banding. */
  def videoScaleTimeInvariantPairs(sigs: DataFrame, maxHamming: Int = 6,
                                   bucketCap: Int = 64,
                                   candCap: Int = 4): DataFrame =
    bandedHammingPairs(sigs, hashCol = "sig", group = lit("vthumb_t"),
      bandBits = 16, numBands = 4, maxHamming = maxHamming,
      bucketCap = bucketCap, candCap = candCap, metric = "vid_sti")

  /** [[incrementalBandedHamming]] over the scale+stride-invariant
    * signatures — the steady-state screen for the composition key: a
    * new batch's slot-sampled thumb signatures against the standing
    * corpus's persisted index, same corpus-wide group and banding as
    * [[videoScaleTimeInvariantPairs]]. A rescaled AND
    * keyframe-re-placed transcode of standing content hits at
    * Hamming 0, which neither parent's screen can see. */
  def incrementalVideoScaleTimeInvariantNearDups(corpusSigs: DataFrame,
                                                 batchSigs: DataFrame,
                                                 maxHamming: Int = 6,
                                                 bucketCap: Int = 64,
                                                 candCap: Int = 4): DataFrame =
    incrementalBandedHamming(corpusSigs, batchSigs, hashCol = "sig",
      group = lit("vthumb_t"), bandBits = 16, numBands = 4,
      maxHamming = maxHamming, bucketCap = bucketCap, candCap = candCap,
      metric = "vid_sti_incr")

  /** Nearest-neighbor 2× video upscale: parse the container, decode
    * every sample payload, NN 2× upscale each frame ([[nnUpscale2x]]'s
    * pixel rule — target (x, y) reads source (x/2, y/2)), and
    * re-encode — the cross-resolution duplicate generator the video
    * scale-invariant gates and spec share. Keyframe PLACEMENT is
    * preserved (the invariance claim samples the same frame indices on
    * both sides): the encoder writes uniform-stride `stss`, so the
    * source's sync set must BE a uniform stride pattern (true of every
    * fixture; loud refusal otherwise). Container timing is normalized
    * in the re-encode — an additional re-mux axis this key never
    * reads — and PNG frames come back as BMP (a frame-codec transcode
    * axis, pixels identical). */
  def nnUpscaleVideo2x(bytes: Array[Byte]): Array[Byte] = {
    val m = Mp4.parse(bytes)
    Decode.req(m.samples.nonEmpty, "malformed",
      "nnUpscaleVideo2x: clip has no samples")
    val keyIdx = m.samples.filter(_.keyframe).map(_.index)
    Decode.req(keyIdx.headOption.contains(0), "malformed",
      "nnUpscaleVideo2x: first sample is not a sync sample — the " +
        "uniform-stride re-encoder cannot preserve keyframe placement")
    val stride = if (keyIdx.length > 1) keyIdx(1) - keyIdx(0)
                 else m.samples.length
    Decode.req(keyIdx == (0 until m.samples.length by stride).toVector,
      "malformed",
      "nnUpscaleVideo2x: source stss is not a uniform stride pattern — " +
        "the re-encoder cannot preserve keyframe placement")
    val frames = m.samples.map(s => nnUpscale2x(m.sampleBytes(bytes, s)))
    Mp4.encode(frames, timescale = 1000, delta = 40, keyStride = stride)
  }

  /** CROP/LETTERBOX-INVARIANT video signature (r17, VERDICT r16 #3 —
    * the video leg): per `stss` keyframe, [[contentBox]] trim THEN the
    * fixed-grid NN thumb before [[aHashBits]], 16-bit folds packed by
    * keyframe order (the [[videoScaleInvariantHash]] shape with the
    * box anchors). A letterboxed re-encode changes every cell of the
    * full-frame thumb, so the scale-invariant key provably misses it,
    * and the dimension-grouped perceptual key cannot even compare the
    * pair; the per-frame trim recovers the exact source rectangle, so
    * a letterboxed AND NN-rescaled transcode (the gate fixtures
    * compose both) collides with its original at Hamming 0 —
    * spec-proven both directions. Keyframe-less clips DROP with an
    * observable counter (the family posture). Shares
    * [[imageCropInvariantHash]]'s LIMITATION (ADVICE r17 #3): the
    * corner-pixel-equality border rule is exact for clean mattes, and
    * asymmetric trims on noisy real-world borders degrade the key to a
    * miss, never a false merge. */
  def videoCropInvariantHash(df: DataFrame, idCol: String, binCol: String,
                             maxKeyframes: Int = 4, thumbW: Int = 8,
                             thumbH: Int = 8): Dataset[VideoScaleInvariantHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(thumbW * thumbH <= 64, "thumb must fit one 64-bit hash")
    require(maxKeyframes >= 1 && maxKeyframes <= 4,
      s"maxKeyframes must be in [1, 4] (16-bit folds in one BIGINT), got $maxKeyframes")
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, videoCiOne(id, bytes, maxKeyframes, thumbW, thumbH))
      })
      .toDF("id", "v")
      .observe("video_ci_drops_" +
          java.util.UUID.randomUUID().toString.replace("-", ""),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("keyframeless_dropped"))
      .where(col("v").isNotNull)
      .select(col("v.id").as("id"), col("v.n_key").as("n_key"),
        col("v.sig").as("sig"))
      .as[VideoScaleInvariantHash]
  }

  /** Per-clip body of [[videoCropInvariantHash]] (factored for the
    * spec's invariance proofs): real container parse, per-keyframe
    * decode → [[contentBox]] trim → fixed-grid NN box thumb → shared
    * fold. None for a clip with no `stss` keyframes (same contract as
    * [[videoSiOne]]). */
  private[graft] def videoCiOne(id: Long, bytes: Array[Byte], maxKeyframes: Int,
                                thumbW: Int, thumbH: Int): Option[VideoScaleInvariantHash] = {
    val m = Mp4.parse(bytes)
    val keys = m.samples.filter(_.keyframe).take(maxKeyframes)
    if (keys.isEmpty) None
    else {
      var sig = 0L
      var k = 0
      while (k < keys.length) {
        val (w0, h0, px) = decodeImagePayload(m.sampleBytes(bytes, keys(k)))
        val (bx, by, bw, bh) = contentBox(w0.toInt, h0.toInt, px)
        sig |= thumbFold(w0, px, bx, by, bw, bh, thumbW, thumbH) << (16 * k)
        k += 1
      }
      Some(VideoScaleInvariantHash(id, keys.length.toLong, sig))
    }
  }

  /** Near-dup pairs over the crop-invariant video signatures — the
    * shared [[bandedHammingPairs]] machinery with dimensions dropped
    * from the group (the content-box thumb domain replaces them;
    * `n_key` stays — different keyframe counts occupy different bit
    * ranges) and the family's 16-bit × 4 banding. */
  def videoCropInvariantPairs(sigs: DataFrame, maxHamming: Int = 6,
                              bucketCap: Int = 64, candCap: Int = 4): DataFrame =
    bandedHammingPairs(sigs, hashCol = "sig",
      group = concat(lit("vcbox:"), col("n_key").cast("string")),
      bandBits = 16, numBands = 4, maxHamming = maxHamming,
      bucketCap = bucketCap, candCap = candCap, metric = "vid_ci")

  /** [[incrementalBandedHamming]] over the crop-invariant video
    * signatures — the steady-state screen for the CROSS-LAYOUT video
    * key: a new batch's content-box clip signatures against the
    * standing corpus's persisted index, same group and banding as
    * [[videoCropInvariantPairs]]. A letterboxed-and-rescaled transcode
    * of standing content hits at Hamming 0, which neither the
    * dimension-grouped NOR the full-frame scale-invariant screen can
    * see. */
  def incrementalVideoCropInvariantNearDups(corpusSigs: DataFrame,
                                            batchSigs: DataFrame,
                                            maxHamming: Int = 6,
                                            bucketCap: Int = 64,
                                            candCap: Int = 4): DataFrame =
    incrementalBandedHamming(corpusSigs, batchSigs, hashCol = "sig",
      group = concat(lit("vcbox:"), col("n_key").cast("string")),
      bandBits = 16, numBands = 4, maxHamming = maxHamming,
      bucketCap = bucketCap, candCap = candCap, metric = "vid_ci_incr")

  /** Letterbox every frame and re-encode — the cross-layout duplicate
    * generator the video crop-invariant gates and spec share (the
    * video sibling of [[letterbox]]). Keyframe PLACEMENT is preserved
    * under the same uniform-stride requirement as [[nnUpscaleVideo2x]]
    * (the invariance claim samples the same frame indices on both
    * sides); container timing is normalized in the re-encode and PNG
    * frames come back as BMP — both additional transcode axes the
    * crop key never reads. */
  def letterboxVideo(bytes: Array[Byte], padL: Int, padT: Int, padR: Int,
                     padB: Int): Array[Byte] = {
    val m = Mp4.parse(bytes)
    Decode.req(m.samples.nonEmpty, "malformed",
      "letterboxVideo: clip has no samples")
    val keyIdx = m.samples.filter(_.keyframe).map(_.index)
    Decode.req(keyIdx.headOption.contains(0), "malformed",
      "letterboxVideo: first sample is not a sync sample — the " +
        "uniform-stride re-encoder cannot preserve keyframe placement")
    val stride = if (keyIdx.length > 1) keyIdx(1) - keyIdx(0)
                 else m.samples.length
    Decode.req(keyIdx == (0 until m.samples.length by stride).toVector,
      "malformed",
      "letterboxVideo: source stss is not a uniform stride pattern — " +
        "the re-encoder cannot preserve keyframe placement")
    val frames = m.samples.map(s =>
      letterbox(m.sampleBytes(bytes, s), padL, padT, padR, padB))
    Mp4.encode(frames, timescale = 1000, delta = 40, keyStride = stride)
  }

  /** MIRROR-INVARIANT video signature (r18, VERDICT r17 #3 — the video
    * orientation leg): per `stss` keyframe, hash BOTH horizontal
    * orientations of the decoded frame through the fixed-grid NN thumb
    * ([[nnThumbAHash]] on the physical array and on its [[mirrorH]]),
    * keep the signed min, THEN [[fold16]] — 16-bit folds packed by
    * keyframe order (the [[videoScaleInvariantHash]] shape with the
    * orbit-min inserted before the fold). A frame-mirrored re-upload
    * preserves dimensions, brightness statistics, frame count and
    * keyframe placement, so EVERY existing video key provably misses
    * it: the dimension-grouped perceptual key compares the pair only
    * at a large Hamming distance, and the scale/crop/time-aligned keys
    * hash the uploaded orientation's bits (spec-asserted per key).
    * Mirroring a video mirrors every frame and moves nothing in time,
    * so per-frame orbit canonicalization is exact by the image key's
    * orbit-set argument applied frame-wise — and it composes with the
    * scale axis (mirror∘NN-2× = NN-2×∘mirror, the r17 parity
    * identity), so a mirrored-AND-rescaled transcode (the gate
    * fixtures compose both) collides at Hamming 0, spec-proven both
    * directions. The min is taken over the 64-bit hashes BEFORE the
    * fold (folding first would canonicalize 16-bit projections of
    * DIFFERENT orientations into one value only by accident).
    * Keyframe-less clips DROP with an observable counter (the family
    * posture). */
  def videoMirrorInvariantHash(df: DataFrame, idCol: String, binCol: String,
                               maxKeyframes: Int = 4, thumbW: Int = 8,
                               thumbH: Int = 8): Dataset[VideoScaleInvariantHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(thumbW * thumbH <= 64, "thumb must fit one 64-bit hash")
    require(maxKeyframes >= 1 && maxKeyframes <= 4,
      s"maxKeyframes must be in [1, 4] (16-bit folds in one BIGINT), got $maxKeyframes")
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, videoMiOne(id, bytes, maxKeyframes, thumbW, thumbH))
      })
      .toDF("id", "v")
      .observe("video_mi_drops_" +
          java.util.UUID.randomUUID().toString.replace("-", ""),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("keyframeless_dropped"))
      .where(col("v").isNotNull)
      .select(col("v.id").as("id"), col("v.n_key").as("n_key"),
        col("v.sig").as("sig"))
      .as[VideoScaleInvariantHash]
  }

  /** Per-clip body of [[videoMirrorInvariantHash]] (factored for the
    * spec's invariance proofs): real container parse, per-keyframe
    * decode → orbit-min of the two orientations' fixed-grid thumbs →
    * shared fold. None for a clip with no `stss` keyframes (same
    * contract as [[videoSiOne]]). */
  private[graft] def videoMiOne(id: Long, bytes: Array[Byte], maxKeyframes: Int,
                                thumbW: Int, thumbH: Int): Option[VideoScaleInvariantHash] = {
    val m = Mp4.parse(bytes)
    val keys = m.samples.filter(_.keyframe).take(maxKeyframes)
    if (keys.isEmpty) None
    else {
      var sig = 0L
      var k = 0
      while (k < keys.length) {
        val (w0, h0, px) = decodeImagePayload(m.sampleBytes(bytes, keys(k)))
        val plain = nnThumbAHash(w0, px, 0, 0, w0, h0, thumbW, thumbH)
        val mirrored = nnThumbAHash(w0, mirrorH(w0.toInt, h0.toInt, px),
          0, 0, w0, h0, thumbW, thumbH)
        sig |= fold16(math.min(plain, mirrored)) << (16 * k)
        k += 1
      }
      Some(VideoScaleInvariantHash(id, keys.length.toLong, sig))
    }
  }

  /** Near-dup pairs over the mirror-invariant video signatures — the
    * shared [[bandedHammingPairs]] machinery with dimensions dropped
    * from the group (the canonical-orientation thumb domain carries
    * none; `n_key` stays — different keyframe counts occupy different
    * bit ranges) and the family's 16-bit × 4 banding. */
  def videoMirrorInvariantPairs(sigs: DataFrame, maxHamming: Int = 6,
                                bucketCap: Int = 64, candCap: Int = 4): DataFrame =
    bandedHammingPairs(sigs, hashCol = "sig",
      group = concat(lit("vmthumb:"), col("n_key").cast("string")),
      bandBits = 16, numBands = 4, maxHamming = maxHamming,
      bucketCap = bucketCap, candCap = candCap, metric = "vid_mi")

  /** [[incrementalBandedHamming]] over the mirror-invariant video
    * signatures — the steady-state screen for the CROSS-ORIENTATION
    * video key: a new batch's canonical clip signatures against the
    * standing corpus's persisted index, same group and banding as
    * [[videoMirrorInvariantPairs]]. A frame-mirrored (even
    * mirrored-and-rescaled) transcode of standing content hits at
    * Hamming 0, which no other video screen can see. */
  def incrementalVideoMirrorInvariantNearDups(corpusSigs: DataFrame,
                                              batchSigs: DataFrame,
                                              maxHamming: Int = 6,
                                              bucketCap: Int = 64,
                                              candCap: Int = 4): DataFrame =
    incrementalBandedHamming(corpusSigs, batchSigs, hashCol = "sig",
      group = concat(lit("vmthumb:"), col("n_key").cast("string")),
      bandBits = 16, numBands = 4, maxHamming = maxHamming,
      bucketCap = bucketCap, candCap = candCap, metric = "vid_mi_incr")

  /** ROTATION-INVARIANT video signature (r18 — the D4 completion for
    * clips, pairing [[imageRotationInvariantHash]] with
    * [[videoMirrorInvariantHash]]): per `stss` keyframe, hash ALL
    * EIGHT physical orientations of the decoded frame (iterated
    * [[rot90]] + [[mirrorH]] — the full dihedral orbit) through the
    * fixed-grid NN thumb, keep the signed min, THEN [[fold16]]; 16-bit
    * folds packed by keyframe order. Why it exists: a 90°-rotated
    * re-upload — the portrait/landscape phone transcode — swaps the
    * frame dimensions, so every other video key misses it: the
    * dimension-grouped key can't compare, the scale/crop keys hash the
    * uploaded orientation, and the mirror key's {id, mirror} orbit
    * contains no rotation. Rotating a clip rotates every frame and
    * moves nothing in time, so per-frame orbit canonicalization is
    * exact by the image key's group-orbit argument applied frame-wise,
    * and composes with NN 2× rescaling (rot90 and mirror both commute
    * with the upscale — the parity identities, spec-proven). Requires
    * a SQUARE thumb; keyframe-less clips DROP with an observable
    * counter (the family posture). */
  def videoRotationInvariantHash(df: DataFrame, idCol: String, binCol: String,
                                 maxKeyframes: Int = 4, thumbW: Int = 8,
                                 thumbH: Int = 8): Dataset[VideoScaleInvariantHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(thumbW == thumbH, "rotation orbit needs a square thumb grid")
    require(thumbW * thumbH <= 64, "thumb must fit one 64-bit hash")
    require(maxKeyframes >= 1 && maxKeyframes <= 4,
      s"maxKeyframes must be in [1, 4] (16-bit folds in one BIGINT), got $maxKeyframes")
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, videoRoOne(id, bytes, maxKeyframes, thumbW, thumbH))
      })
      .toDF("id", "v")
      .observe("video_roti_drops_" +
          java.util.UUID.randomUUID().toString.replace("-", ""),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("keyframeless_dropped"))
      .where(col("v").isNotNull)
      .select(col("v.id").as("id"), col("v.n_key").as("n_key"),
        col("v.sig").as("sig"))
      .as[VideoScaleInvariantHash]
  }

  /** Per-clip body of [[videoRotationInvariantHash]] (factored for the
    * spec's invariance proofs): real container parse, per-keyframe
    * decode → signed min over the eight orientations' fixed-grid
    * thumbs → shared fold. None for a clip with no `stss` keyframes
    * (same contract as [[videoSiOne]]). */
  private[graft] def videoRoOne(id: Long, bytes: Array[Byte], maxKeyframes: Int,
                                thumbW: Int, thumbH: Int): Option[VideoScaleInvariantHash] = {
    val m = Mp4.parse(bytes)
    val keys = m.samples.filter(_.keyframe).take(maxKeyframes)
    if (keys.isEmpty) None
    else {
      var sig = 0L
      var k = 0
      while (k < keys.length) {
        val (w0, h0, px) = decodeImagePayload(m.sampleBytes(bytes, keys(k)))
        var arr = px
        var w = w0.toInt
        var h = h0.toInt
        var best = Long.MaxValue
        var r = 0
        while (r < 4) {
          val plain = nnThumbAHash(w, arr, 0, 0, w, h, thumbW, thumbH)
          val mirrored = nnThumbAHash(w, mirrorH(w, h, arr), 0, 0, w, h,
            thumbW, thumbH)
          if (plain < best) best = plain
          if (mirrored < best) best = mirrored
          arr = rot90(w, h, arr)
          val t = w; w = h; h = t
          r += 1
        }
        sig |= fold16(best) << (16 * k)
        k += 1
      }
      Some(VideoScaleInvariantHash(id, keys.length.toLong, sig))
    }
  }

  /** Near-dup pairs over the rotation-invariant video signatures — the
    * shared [[bandedHammingPairs]] machinery with dimensions dropped
    * from the group (the orbit-canonical thumb domain carries none;
    * `n_key` stays) and the family's 16-bit × 4 banding. */
  def videoRotationInvariantPairs(sigs: DataFrame, maxHamming: Int = 6,
                                  bucketCap: Int = 64, candCap: Int = 4): DataFrame =
    bandedHammingPairs(sigs, hashCol = "sig",
      group = concat(lit("vrthumb:"), col("n_key").cast("string")),
      bandBits = 16, numBands = 4, maxHamming = maxHamming,
      bucketCap = bucketCap, candCap = candCap, metric = "vid_roti")

  /** [[incrementalBandedHamming]] over the rotation-invariant video
    * signatures — the steady-state screen for the full dihedral video
    * orbit: a rotated (even rotated-and-rescaled, or rotated-and-
    * mirrored) transcode of standing content hits at Hamming 0, which
    * no other video screen — including the mirror screen — can see. */
  def incrementalVideoRotationInvariantNearDups(corpusSigs: DataFrame,
                                                batchSigs: DataFrame,
                                                maxHamming: Int = 6,
                                                bucketCap: Int = 64,
                                                candCap: Int = 4): DataFrame =
    incrementalBandedHamming(corpusSigs, batchSigs, hashCol = "sig",
      group = concat(lit("vrthumb:"), col("n_key").cast("string")),
      bandBits = 16, numBands = 4, maxHamming = maxHamming,
      bucketCap = bucketCap, candCap = candCap, metric = "vid_roti_incr")

  /** Rotate every frame by `turns`×90° clockwise and re-encode — the
    * cross-rotation duplicate generator the video rotation-invariant
    * gates and spec share (the video sibling of [[rotateBmp]]).
    * Keyframe PLACEMENT is preserved under the same uniform-stride
    * requirement as [[nnUpscaleVideo2x]]; container timing is
    * normalized and PNG frames come back as BMP — both additional
    * transcode axes the rotation key never reads. */
  def rotateVideoMp4(bytes: Array[Byte], turns: Int): Array[Byte] = {
    val m = Mp4.parse(bytes)
    Decode.req(m.samples.nonEmpty, "malformed",
      "rotateVideoMp4: clip has no samples")
    val keyIdx = m.samples.filter(_.keyframe).map(_.index)
    Decode.req(keyIdx.headOption.contains(0), "malformed",
      "rotateVideoMp4: first sample is not a sync sample — the " +
        "uniform-stride re-encoder cannot preserve keyframe placement")
    val stride = if (keyIdx.length > 1) keyIdx(1) - keyIdx(0)
                 else m.samples.length
    Decode.req(keyIdx == (0 until m.samples.length by stride).toVector,
      "malformed",
      "rotateVideoMp4: source stss is not a uniform stride pattern — " +
        "the re-encoder cannot preserve keyframe placement")
    val frames = m.samples.map(s => rotateBmp(m.sampleBytes(bytes, s), turns))
    Mp4.encode(frames, timescale = 1000, delta = 40, keyStride = stride)
  }

  /** Mirror every frame and re-encode — the cross-orientation
    * duplicate generator the video mirror-invariant gates and spec
    * share (the video sibling of [[mirrorBmp]]). Keyframe PLACEMENT is
    * preserved under the same uniform-stride requirement as
    * [[nnUpscaleVideo2x]] (the invariance claim samples the same frame
    * indices on both sides); container timing is normalized in the
    * re-encode and PNG frames come back as BMP — both additional
    * transcode axes the mirror key never reads. */
  def mirrorVideoMp4(bytes: Array[Byte]): Array[Byte] = {
    val m = Mp4.parse(bytes)
    Decode.req(m.samples.nonEmpty, "malformed",
      "mirrorVideoMp4: clip has no samples")
    val keyIdx = m.samples.filter(_.keyframe).map(_.index)
    Decode.req(keyIdx.headOption.contains(0), "malformed",
      "mirrorVideoMp4: first sample is not a sync sample — the " +
        "uniform-stride re-encoder cannot preserve keyframe placement")
    val stride = if (keyIdx.length > 1) keyIdx(1) - keyIdx(0)
                 else m.samples.length
    Decode.req(keyIdx == (0 until m.samples.length by stride).toVector,
      "malformed",
      "mirrorVideoMp4: source stss is not a uniform stride pattern — " +
        "the re-encoder cannot preserve keyframe placement")
    val frames = m.samples.map(s => mirrorBmp(m.sampleBytes(bytes, s)))
    Mp4.encode(frames, timescale = 1000, delta = 40, keyStride = stride)
  }

  final case class RateInvariantHash(id: Long, rfp: Long)

  /** RATE-INVARIANT audio signature (r15) — the audio leg of the
    * scale-invariant family, completing it across modalities (image:
    * [[imageScaleInvariantHash]], r14; video's timescale invariance is
    * the time-aligned sampler, `multimodal_video_phash_aligned`):
    * nearest-neighbor-sample the per-frame exact integer energy
    * sequence (Σ_c v², channel-folded) onto a FIXED `slots`-slot grid,
    * then delta-sign bits across the grid — slot w sets bit w iff
    * slot w+1's energy strictly exceeds slot w's (≤63 bits, sign-safe).
    *
    * Why it exists: [[audioFingerprintPairs]] groups candidates by
    * exact (channels, n_windows), so a RESAMPLED copy of a clip — the
    * most common audio near-duplicate after re-encoding — can never
    * pair with its original. The fixed grid removes the frame count
    * (and with it the sample rate) from the key entirely, and NN frame
    * sampling composes EXACTLY under integer zero-order-hold
    * upsampling: `floor(floor(w·k·nf/slots)/k) = floor(w·nf/slots)`,
    * so a ZOH k×-upsampled copy produces the bit-IDENTICAL signature
    * and collides at Hamming 0 — spec-proven, oracle-replayed via the
    * double-floor. Invariances inherited from the energy delta-sign
    * rule: uniform gain (energies scale by g², no comparison flips)
    * and channel duplication (mono→L=R stereo doubles every frame
    * energy) — both spec-proven. */
  def audioRateInvariantHash(df: DataFrame, idCol: String, binCol: String,
                             slots: Int = 64): Dataset[RateInvariantHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(slots <= 64, "delta bits must fit one 64-bit hash")
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        RateInvariantHash(id, rateInvariantBits(Wav.decode(bytes), slots))
      })
  }

  /** Per-clip body of [[audioRateInvariantHash]] (factored for the
    * spec's invariance proofs): per-original-frame exact energy, NN
    * slot map `floor(w·nf/slots)`, strict-greater delta-sign bits. */
  private[graft] def rateInvariantBits(clip: Wav.Clip, slots: Int): Long = {
    val ch = math.max(clip.channels, 1)
    val nf = clip.samples.length / ch
    if (nf == 0) return 0L // headers-only clip: empty signature
    val e = new Array[Long](nf)
    var f = 0
    while (f < nf) {
      var s = 0L; var c = 0
      while (c < ch) { val v = clip.samples(f * ch + c).toLong; s += v * v; c += 1 }
      e(f) = s; f += 1
    }
    var fp = 0L
    var w = 0
    while (w + 1 < slots) {
      if (e(((w + 1).toLong * nf / slots).toInt) > e((w.toLong * nf / slots).toInt))
        fp |= 1L << w
      w += 1
    }
    fp
  }

  /** Near-dup pairs over the rate-invariant signatures — the shared
    * [[bandedHammingPairs]] machinery with ONE corpus-wide group (the
    * fixed slot grid replaces the (channels, n_windows) key) and the
    * scale-invariant image path's 16-bit × 4 banding. `maxHamming` 6:
    * ≤3 exhaustive, 4-6 probabilistic — the family posture. */
  def audioRateInvariantPairs(sigs: DataFrame, maxHamming: Int = 6,
                              bucketCap: Int = 64, candCap: Int = 4): DataFrame =
    bandedHammingPairs(sigs, hashCol = "rfp", group = lit("rate"),
      bandBits = 16, numBands = 4, maxHamming = maxHamming,
      bucketCap = bucketCap, candCap = candCap, metric = "aud_ri")

  /** [[incrementalBandedHamming]] over the rate-invariant signatures —
    * the steady-state screen for the CROSS-RATE key: a new batch's
    * fixed-grid signatures against the standing corpus's persisted
    * index, same fixed group and banding as
    * [[audioRateInvariantPairs]]. A ZOH-resampled re-upload of
    * standing content hits at Hamming 0, which the rate-grouped
    * [[incrementalAudioNearDups]] can never see. */
  def incrementalRateInvariantNearDups(corpusSigs: DataFrame,
                                       batchSigs: DataFrame,
                                       maxHamming: Int = 6,
                                       bucketCap: Int = 64,
                                       candCap: Int = 4): DataFrame =
    incrementalBandedHamming(corpusSigs, batchSigs, hashCol = "rfp",
      group = lit("rate"), bandBits = 16, numBands = 4,
      maxHamming = maxHamming, bucketCap = bucketCap, candCap = candCap,
      metric = "aud_ri_incr")

  /** Zero-order-hold 2× upsample (decode → re-encode at doubled rate,
    * frame f reads source frame f/2 — the cheap sample-and-hold
    * resample) — the cross-rate duplicate generator the rate-invariant
    * gates and spec share, the audio sibling of [[nnUpscale2x]]. */
  def zohUpsample2x(bytes: Array[Byte]): Array[Byte] = {
    val clip = Wav.decode(bytes)
    // loud resample-specific refusal (ADVICE r15 #2): Wav.decode only
    // requires sampleRate > 0, so a hostile rate > 2^30 would overflow
    // the doubling negative and die inside Wav.encode with a generic
    // 'bad clip shape' — name the upsample in the failure instead
    Decode.req(clip.sampleRate <= Int.MaxValue / 2, "malformed",
      s"zohUpsample2x: sample rate ${clip.sampleRate} would overflow when doubled")
    val ch = math.max(clip.channels, 1)
    val nf = clip.samples.length / ch
    Wav.encode(clip.channels, clip.sampleRate * 2, nf * 2,
      (f, c) => clip.samples((f / 2) * ch + c))
  }

  /** TRIM-INVARIANT audio signature (r17, VERDICT r16 #4 — the audio
    * analog of the crop key): anchor the fixed slot grid at the ENERGY
    * ONSET instead of frame 0. Per-frame exact integer energies
    * (Σ_c v², channel-folded — the [[audioRateInvariantHash]] rule),
    * then f0 = first frame with energy > 0, f1 = last, span
    * n = f1−f0+1; slot w samples frame `f0 + ⌊w·n/slots⌋` and bit w is
    * the strict delta-sign to slot w+1. Why it exists: leading or
    * trailing silence — the most common audio re-upload edit after
    * rate change — shifts every fixed 64-slot window, so
    * [[audioRateInvariantHash]] provably misses the padded copy, and
    * the (channels, n_windows)-grouped [[audioFingerprintPairs]]
    * cannot even compare it (the frame count changes). The onset
    * anchor removes the padding from the key entirely; silence frames
    * have EXACTLY zero energy (an integer rule, no threshold tuning),
    * and the NN slot map composes under ZOH upsampling exactly as the
    * rate key's (a ZOH-k× copy has onset k·f0 + lead and span k·n, and
    * ⌊⌊w·k·n/slots⌋/k⌋ = ⌊w·n/slots⌋), so a SILENCE-PADDED ZOH-k×
    * re-upload — the gate fixtures compose both — produces the
    * bit-IDENTICAL signature, spec-proven both directions. Gain and
    * channel-duplication invariance inherited from the energy
    * delta-sign rule. A silence-only (or empty) clip gets the empty
    * signature 0. */
  def audioTrimInvariantHash(df: DataFrame, idCol: String, binCol: String,
                             slots: Int = 64): Dataset[RateInvariantHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(slots <= 64, "delta bits must fit one 64-bit hash")
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        RateInvariantHash(id, trimInvariantBits(Wav.decode(bytes), slots))
      })
  }

  /** Per-clip body of [[audioTrimInvariantHash]] (factored for the
    * spec's invariance proofs): exact frame energies, onset/tail scan,
    * span-anchored NN slot map, strict-greater delta-sign bits. */
  private[graft] def trimInvariantBits(clip: Wav.Clip, slots: Int): Long = {
    val ch = math.max(clip.channels, 1)
    val nf = clip.samples.length / ch
    if (nf == 0) return 0L // headers-only clip: empty signature
    val e = new Array[Long](nf)
    var f = 0
    while (f < nf) {
      var s = 0L; var c = 0
      while (c < ch) { val v = clip.samples(f * ch + c).toLong; s += v * v; c += 1 }
      e(f) = s; f += 1
    }
    var f0 = 0
    while (f0 < nf && e(f0) == 0L) f0 += 1
    if (f0 == nf) return 0L // silence-only clip: empty signature
    var f1 = nf - 1
    while (e(f1) == 0L) f1 -= 1
    val n = (f1 - f0 + 1).toLong
    var fp = 0L
    var w = 0
    while (w + 1 < slots) {
      if (e(f0 + ((w + 1).toLong * n / slots).toInt) >
          e(f0 + (w.toLong * n / slots).toInt))
        fp |= 1L << w
      w += 1
    }
    fp
  }

  /** Near-dup pairs over the trim-invariant signatures — the shared
    * [[bandedHammingPairs]] machinery with ONE corpus-wide group (the
    * onset-anchored fixed grid carries neither frame count nor rate)
    * and the family's 16-bit × 4 banding. Signature-0 clips are
    * EXCLUDED from pairing (ADVICE r17 #2): 0 is both the degenerate
    * sentinel (silence-only / headers-only clips, which have no onset
    * and hence no trim key) and the contentless all-flat profile —
    * either way the signature carries no discriminative bits, and in
    * the single corpus-wide 'trim' group every such clip would pair
    * with every other at Hamming 0 and the keep closure would collapse
    * all degenerate clips into one cluster. */
  def audioTrimInvariantPairs(sigs: DataFrame, maxHamming: Int = 6,
                              bucketCap: Int = 64, candCap: Int = 4): DataFrame =
    bandedHammingPairs(sigs.filter(col("rfp") =!= 0L), hashCol = "rfp",
      group = lit("trim"),
      bandBits = 16, numBands = 4, maxHamming = maxHamming,
      bucketCap = bucketCap, candCap = candCap, metric = "aud_ti")

  /** [[incrementalBandedHamming]] over the trim-invariant signatures —
    * the steady-state screen for the CROSS-TRIM key: a new batch's
    * onset-anchored signatures against the standing corpus's persisted
    * index, same fixed group and banding as
    * [[audioTrimInvariantPairs]]. A silence-padded (even
    * padded-and-resampled) re-upload of standing content hits at
    * Hamming 0, which neither the frame-count-grouped NOR the
    * fixed-grid rate-invariant screen can see. */
  def incrementalTrimInvariantNearDups(corpusSigs: DataFrame,
                                       batchSigs: DataFrame,
                                       maxHamming: Int = 6,
                                       bucketCap: Int = 64,
                                       candCap: Int = 4): DataFrame =
    // signature-0 clips (degenerate: no energy onset) never screen —
    // same exclusion as audioTrimInvariantPairs (ADVICE r17 #2)
    incrementalBandedHamming(corpusSigs.filter(col("rfp") =!= 0L),
      batchSigs.filter(col("rfp") =!= 0L), hashCol = "rfp",
      group = lit("trim"), bandBits = 16, numBands = 4,
      maxHamming = maxHamming, bucketCap = bucketCap, candCap = candCap,
      metric = "aud_ti_incr")

  /** Silence-pad generator: re-encode with `leadFrames` zero frames
    * before and `trailFrames` after the decoded content, same rate and
    * channel plan — the cross-trim duplicate generator the
    * trim-invariant gates and spec share (the audio sibling of
    * [[letterbox]]). */
  def padSilence(bytes: Array[Byte], leadFrames: Int,
                 trailFrames: Int): Array[Byte] = {
    require(leadFrames >= 0 && trailFrames >= 0,
      "padSilence pads must be non-negative")
    val clip = Wav.decode(bytes)
    val ch = math.max(clip.channels, 1)
    val nf = clip.samples.length / ch
    Wav.encode(clip.channels, clip.sampleRate, nf + leadFrames + trailFrames,
      (f, c) =>
        if (f < leadFrames || f >= leadFrames + nf) 0.toShort
        else clip.samples((f - leadFrames) * ch + c))
  }

  /** Channel-swap generator (r18, VERDICT r17 #3 — the audio
    * orientation axis): re-encode with the channel assignment
    * REVERSED (frame f, channel c reads source channel ch−1−c) —
    * a stereo L/R swap, the audio analog of [[mirrorBmp]]. The
    * per-frame energy Σ_c v² sums over ALL channels, so EVERY
    * energy-derived key ([[rateInvariantBits]], [[trimInvariantBits]],
    * [[windowFpOf]]) absorbs this edit by construction (spec-proven) —
    * which is exactly why the gates compose it with a ZOH resample:
    * the composed copy defeats the (channels, n_windows)-grouped exact
    * window key (frame count changes) AND the byte-exact sample
    * fingerprint (interleaved order changes, spec-asserted), leaving
    * the fixed-grid energy keys as the only catchers. Swap commutes
    * with ZOH upsampling exactly (both act per-frame on disjoint
    * axes). */
  def swapChannels(bytes: Array[Byte]): Array[Byte] = {
    val clip = Wav.decode(bytes)
    val ch = math.max(clip.channels, 1)
    val nf = clip.samples.length / ch
    Wav.encode(clip.channels, clip.sampleRate, nf,
      (f, c) => clip.samples(f * ch + (ch - 1 - c)))
  }

  final case class ResampledAudio(id: Long, channels: Long, sr0: Long,
                                  nf0: Long, nf1: Long, sum_s: Long,
                                  rfp: String)

  /** REAL audio resample (r15 — the audio sibling of [[imageResample]]):
    * decode the WAV payload and NEAREST-NEIGHBOR resample the frame
    * sequence to `targetRate` — new frame count
    * `nf1 = max(1, nf0·targetRate div sr0)`, target frame f reads
    * source frame `f·nf0 div nf1`, pure integer arithmetic, so the
    * DuckDB oracle replays the whole thing from the fixtures'
    * closed-form samples with no codec. Output per clip: the rate
    * plan, the exact integer sum of the resampled samples, and the
    * resampled stream's content fingerprint through the ONE
    * [[sampleMd5]] definition — a normalized-rate content identity a
    * media pipeline can dedup on (rate normalization is the standard
    * first stage of any audio featurizer). Shape: one mapPartitions
    * decode pass, embarrassingly parallel, constant-width rows. */
  def audioResample(df: DataFrame, idCol: String, binCol: String,
                    targetRate: Int = 16000): Dataset[ResampledAudio] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(targetRate > 0, "targetRate must be positive")
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val clip = Wav.decode(bytes)
          val ch = math.max(clip.channels, 1)
          val nf0 = clip.samples.length / ch
          // headers-only clip resamples to the empty clip (nf1 = 0);
          // any real content lands at least one frame
          val nf1 = if (nf0 == 0) 0
            else math.max(1L, nf0.toLong * targetRate / clip.sampleRate).toInt
          val out = new Array[Short](nf1 * ch)
          var f = 0
          while (f < nf1) {
            val sf = (f.toLong * nf0 / nf1).toInt
            var c = 0
            while (c < ch) { out(f * ch + c) = clip.samples(sf * ch + c); c += 1 }
            f += 1
          }
          var sum = 0L; var i = 0
          while (i < out.length) { sum += out(i); i += 1 }
          ResampledAudio(id, clip.channels.toLong, clip.sampleRate.toLong,
            nf0.toLong, nf1.toLong, sum,
            sampleMd5(md, Wav.Clip(clip.channels, targetRate, out)))
        }
      }
  }

  final case class ResampledImage(id: Long, w0: Long, h0: Long,
                                  w1: Long, h1: Long,
                                  rsum: Long, gsum: Long, bsum: Long,
                                  rfp: String)

  /** REAL pixel resample (r14 — upgrades [[resizePlan]]'s stubbed
    * resample stage): decode the payload (codec-sniffed, BMP or PNG),
    * fit the dimensions inside `maxDim` with [[resizePlan]]'s integer
    * contract (aspect preserved, `floor(side·maxDim / maxSide)`, min 1),
    * and NEAREST-NEIGHBOR sample the raster — target pixel (x, y) reads
    * source `(x·w0 div w1, y·h0 div h1)`, pure integer arithmetic, so
    * the DuckDB oracle replays the whole thing from the fixtures'
    * closed-form pixels with no codec. Output per image: new dims,
    * per-channel integer sums of the resampled raster, and the
    * resampled raster's content fingerprint through the ONE
    * [[pixelMd5]] definition — a thumbnail content-identity a media
    * pipeline can dedup on. Shape: one mapPartitions decode pass,
    * embarrassingly parallel, output rows constant-width. */
  def imageResample(df: DataFrame, idCol: String, binCol: String,
                    maxDim: Int = 4): Dataset[ResampledImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val (w0, h0, px) = decodeImagePayload(bytes)
          val m = math.max(w0, h0)
          val w1 = if (m <= maxDim) w0 else math.max(1L, w0 * maxDim / m)
          val h1 = if (m <= maxDim) h0 else math.max(1L, h0 * maxDim / m)
          val out = new Array[Int]((w1 * h1).toInt)
          var rs = 0L; var gs = 0L; var bs = 0L
          var y = 0
          while (y < h1) {
            val sy = (y * h0 / h1).toInt
            var x = 0
            while (x < w1) {
              val sx = (x * w0 / w1).toInt
              val p = px(sy * w0.toInt + sx)
              out(y * w1.toInt + x) = p
              rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
              x += 1
            }
            y += 1
          }
          ResampledImage(id, w0, h0, w1, h1, rs, gs, bs,
            pixelMd5(md, w1, h1, out))
        }
      }
  }

  /** Resize planning on stub-decoded dimensions: fit (width, height)
    * inside `maxDim` preserving aspect ratio, integer arithmetic only —
    * composes the decode stage with the resize stage of a media
    * pipeline (the actual pixel resample lives in the codec, which is
    * stubbed here; the dimension math IS the contract a resampler gets,
    * and being integer-exact it is oracle-gated, not rows-only). */
  def resizePlan(events: DataFrame, idCol: String = "event_id",
                 binCol: String = "props", maxDim: Int = 32): DataFrame = {
    val f = extractFeatures(events, idCol, binCol).toDF()
    val m = greatest(col("width"), col("height"))
    def fit(side: Column): Column =
      when(m <= maxDim, side)
        .otherwise(greatest(lit(1), floor(side * maxDim / m).cast("int")))
    f.select(col("id"), col("width").as("w0"), col("height").as("h0"),
      fit(col("width")).as("w1"), fit(col("height")).as("h1"))
  }

  /** Oracle-checkable binary plumbing: treat a string column as a binary
    * payload and compute byte-level features (length + digest) — proves
    * the binary cast path end-to-end against DuckDB's blob functions. */
  def binaryFeatures(events: DataFrame): DataFrame =
    events.select(col("event_id"),
      length(col("props").cast("binary")).cast("bigint").as("blob_len"),
      md5(col("props").cast("binary")).as("blob_md5"))

  /** Nested/semi-structured column: parse `events.props` JSON with an
    * explicit schema and query an extracted field (the Mongo `bson.M` /
    * Cassandra UDT analog, SURVEY §1.3). */
  def jsonExtract(events: DataFrame): DataFrame =
    events.select(col("event_id"),
      from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
        .getField("k").as("k_val"))

  /** Schema INFERENCE over a ragged JSON column — the Mongo deep/ragged
    * document case (`mongodb.go:327-335` moves whole `bson.M` docs;
    * SURVEY §7.4.5 flags ragged props): one sampled inference pass
    * yields the UNION schema across documents, then `from_json` parses
    * with per-row NULLs for absent fields — no document is dropped for
    * missing keys. At 100 TB, lower `samplingRatio` bounds the inference
    * scan; parsing itself stays row-local and codegen'd. */
  def inferJsonSchema(df: DataFrame, jsonCol: String,
                      samplingRatio: Double = 1.0): org.apache.spark.sql.types.StructType = {
    val spark = df.sparkSession
    import spark.implicits._
    spark.read.option("samplingRatio", samplingRatio.toString)
      .json(df.select(col(jsonCol)).as[String]).schema
  }

  /** Parse a ragged JSON column with its inferred union schema into a
    * nested struct column `<jsonCol>_doc`. */
  def parseInferred(df: DataFrame, jsonCol: String,
                    samplingRatio: Double = 1.0): DataFrame =
    df.withColumn(s"${jsonCol}_doc",
      from_json(col(jsonCol), inferJsonSchema(df, jsonCol, samplingRatio)))

  // =====================================================================
  // Decode fault isolation — the QUARANTINE tier (VERDICT r11 #1).
  //
  // Every codec in this repo fails hostile input via a loud, DETERMINISTIC
  // `require`/`fail` message (the hostile-header posture: bounds before
  // allocation, caps before expansion). That is the right posture for a
  // validating context — and the wrong one for the public ingest API at
  // 100 TB, where one corrupt asset among 10⁹ would kill its task, its
  // retries, and then the whole job. The safe variants below wrap the
  // IDENTICAL per-asset computations in a per-asset try, routing each
  // malformed payload to a quarantine verdict (`ok=false`,
  // `reason="decode:<kind>"`) instead of a task kill: one poisoned asset
  // degrades to one counted, attributable row. The reference's analogous
  // posture is per-batch retry-then-continue on write errors
  // (`mysql.go:448-498`); per-ASSET isolation is the decode-side analog.
  // =====================================================================

  /** Stable failure-kind classification, by exception TYPE first
    * (VERDICT r13 #3): the codecs throw [[DecodeException]] with an
    * explicit kind at every decode guard, so classification reads
    * `e.kind` and rewording a guard message cannot reclassify an
    * asset (negative-tested in QuarantineSpec). The substring table
    * below remains only as a FALLBACK for foreign exceptions (codecs
    * this repo does not own, or a raw runtime error escaping one).
    * Kinds: `bad_crc` (checksum mismatch), `bomb` (declared size over
    * a decode cap — the zip-bomb header), `truncated` (bytes end
    * before the declared structure), `bad_magic` (wrong
    * container/codec signature), `no_keyframes` (structurally valid
    * but no perceptual identity), `malformed` (everything else). */
  private[graft] def classifyDecodeError(e: Throwable): String = e match {
    case d: DecodeException => d.kind
    case _ =>
      val m = Option(e.getMessage).getOrElse("").toLowerCase
      if (m.contains("crc")) "bad_crc"
      else if (m.contains("over cap") || m.contains("exceeds") ||
        m.contains("past cap")) "bomb"
      else if (m.contains("truncated") || m.contains("past end") ||
        m.contains("past eof") || m.contains("overruns")) "truncated"
      else if (m.contains("magic") || m.contains("signature")) "bad_magic"
      else if (m.contains("keyframes")) "no_keyframes"
      else "malformed"
  }

  final case class SafeImageHash(id: Long, ok: Boolean, reason: String,
                                 width: Long, height: Long, ahash: Long)
  final case class SafePixelFingerprint(id: Long, ok: Boolean, reason: String,
                                        width: Long, height: Long, fp: String)
  final case class SafeAudioFingerprint(id: Long, ok: Boolean, reason: String,
                                        channels: Long, n_windows: Long, fp: Long)
  final case class SafeSampleFingerprint(id: Long, ok: Boolean, reason: String,
                                         channels: Long, n_samples: Long, fp: String)
  final case class SafeVideoFingerprint(id: Long, ok: Boolean, reason: String,
                                        n_samples: Long, fp: String)
  final case class SafeVideoPerceptualHash(id: Long, ok: Boolean, reason: String,
                                           width: Long, height: Long,
                                           n_key: Long, sig: Long)

  private def reasonOf(e: Throwable): String = "decode:" + classifyDecodeError(e)

  /** Fault-isolated [[imageAHash]]. One deliberate widening vs the
    * strict variant: the payload is codec-SNIFFED ([[decodeImagePayload]],
    * BMP or PNG) rather than BMP-only, so the safe tier accepts any
    * raster the exact tier accepts — on a BMP corpus the signatures are
    * identical (spec-pinned). */
  def imageAHashSafe(df: DataFrame, idCol: String,
                     binCol: String): Dataset[SafeImageHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        try {
          val (w, h, px) = decodeImagePayload(bytes)
          SafeImageHash(id, ok = true, "", w, h, aHashBits(px))
        } catch { case scala.util.control.NonFatal(e) =>
          SafeImageHash(id, ok = false, reasonOf(e), 0L, 0L, 0L)
        }
      })
  }

  /** Fault-isolated [[imagePixelFingerprint]]. */
  def imagePixelFingerprintSafe(df: DataFrame, idCol: String,
                                binCol: String): Dataset[SafePixelFingerprint] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          try {
            val r = pixelFpOne(md, id, bytes)
            SafePixelFingerprint(id, ok = true, "", r.width, r.height, r.fp)
          } catch { case scala.util.control.NonFatal(e) =>
            SafePixelFingerprint(id, ok = false, reasonOf(e), 0L, 0L, "")
          }
        }
      }
  }

  /** Fault-isolated [[audioFingerprint]]. */
  def audioFingerprintSafe(df: DataFrame, idCol: String, binCol: String,
                           windowFrames: Int = 4): Dataset[SafeAudioFingerprint] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        try {
          val r = audioFpOne(id, bytes, windowFrames)
          SafeAudioFingerprint(id, ok = true, "", r.channels, r.n_windows, r.fp)
        } catch { case scala.util.control.NonFatal(e) =>
          SafeAudioFingerprint(id, ok = false, reasonOf(e), 0L, 0L, 0L)
        }
      })
  }

  /** Fault-isolated [[audioSampleFingerprint]]. */
  def audioSampleFingerprintSafe(df: DataFrame, idCol: String,
                                 binCol: String): Dataset[SafeSampleFingerprint] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          try {
            val r = sampleFpOne(md, id, bytes)
            SafeSampleFingerprint(id, ok = true, "", r.channels, r.n_samples, r.fp)
          } catch { case scala.util.control.NonFatal(e) =>
            SafeSampleFingerprint(id, ok = false, reasonOf(e), 0L, 0L, "")
          }
        }
      }
  }

  final case class SafeImageSignatures(id: Long, ok: Boolean, reason: String,
                                       width: Long, height: Long,
                                       ahash: Long, fp: String)

  /** Fault-isolated [[imageSignatures]] — BOTH image tiers from ONE
    * decode of the (possibly poisoned) corpus. A failed decode yields
    * one quarantine row whose reason serves both tiers; this is
    * exactly what the separate safe passes produce ([[imageAHashSafe]]
    * and [[imagePixelFingerprintSafe]] parse the same bytes through
    * the same sniffed decode, so they fail on the same first guard
    * with the same kind — the reason-precedence rule's "exact wins"
    * case is degenerate here; spec-pinned on the poisoned fixture). */
  def imageSignaturesSafe(df: DataFrame, idCol: String,
                          binCol: String): Dataset[SafeImageSignatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          try {
            val r = imageSigOne(md, id, bytes)
            SafeImageSignatures(id, ok = true, "", r.width, r.height,
              r.ahash, r.fp)
          } catch { case scala.util.control.NonFatal(e) =>
            SafeImageSignatures(id, ok = false, reasonOf(e), 0L, 0L, 0L, "")
          }
        }
      }
  }

  final case class SafeAudioSignatures(id: Long, ok: Boolean, reason: String,
                                       channels: Long, n_windows: Long,
                                       wfp: Long, n_samples: Long, sfp: String)

  /** Fault-isolated [[audioSignatures]] — the audio sibling of
    * [[imageSignaturesSafe]]. */
  def audioSignaturesSafe(df: DataFrame, idCol: String, binCol: String,
                          windowFrames: Int = 4): Dataset[SafeAudioSignatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          try {
            val r = audioSigOne(md, id, bytes, windowFrames)
            SafeAudioSignatures(id, ok = true, "", r.channels, r.n_windows,
              r.wfp, r.n_samples, r.sfp)
          } catch { case scala.util.control.NonFatal(e) =>
            SafeAudioSignatures(id, ok = false, reasonOf(e), 0L, 0L, 0L, 0L, "")
          }
        }
      }
  }

  /** Fault-isolated [[videoFingerprint]]. */
  def videoFingerprintSafe(df: DataFrame, idCol: String,
                           binCol: String): Dataset[SafeVideoFingerprint] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          try {
            val r = videoFpOne(md, id, bytes)
            SafeVideoFingerprint(id, ok = true, "", r.n_samples, r.fp)
          } catch { case scala.util.control.NonFatal(e) =>
            SafeVideoFingerprint(id, ok = false, reasonOf(e), 0L, "")
          }
        }
      }
  }

  /** Fault-isolated [[videoPerceptualHash]]. A keyframe-less (but
    * structurally valid) clip quarantines as `decode:no_keyframes` —
    * the same class the batch path counts as a drop. */
  def videoPerceptualHashSafe(df: DataFrame, idCol: String, binCol: String,
                              maxKeyframes: Int = 4): Dataset[SafeVideoPerceptualHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        try {
          videoPHashOne(id, bytes, maxKeyframes) match {
            case Some(r) =>
              SafeVideoPerceptualHash(id, ok = true, "", r.width, r.height,
                r.n_key, r.sig)
            case None =>
              SafeVideoPerceptualHash(id, ok = false, "decode:no_keyframes",
                0L, 0L, 0L, 0L)
          }
        } catch { case scala.util.control.NonFatal(e) =>
          SafeVideoPerceptualHash(id, ok = false, reasonOf(e), 0L, 0L, 0L, 0L)
        }
      })
  }

  // ---- deterministic CORRUPT fixtures (each verified-by-spec to fail
  //      decode with the pinned reason kind) -----------------------------

  /** Truncated stream: cut the payload mid-structure. */
  def poisonTruncated(bytes: Array[Byte], keep: Int = 20): Array[Byte] =
    bytes.take(keep)

  /** Zip-bomb header: a CRC-valid PNG whose IHDR declares a 65536×65536
    * raster — 2³² pixels against the decoder's 2²⁶ cap. The decode must
    * die on the loud cap require BEFORE any allocation. */
  def poisonPngBomb(): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    val body = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    body.write("IHDR".getBytes("US-ASCII"))
    body.write(be32(65536L)) // width
    body.write(be32(65536L)) // height
    body.write(Array[Byte](8, 2, 0, 0, 0)) // depth 8, RGB, default methods
    val b = body.toByteArray
    val crc = new java.util.zip.CRC32()
    crc.update(b)
    out.write(be32(13L)); out.write(b); out.write(be32(crc.getValue))
    // a trailing IEND keeps the payload past the decoder's minimum-length
    // guard, so the CAP require (not the truncation one) is what fires
    val iend = "IEND".getBytes("US-ASCII")
    val crc2 = new java.util.zip.CRC32()
    crc2.update(iend)
    out.write(be32(0L)); out.write(iend); out.write(be32(crc2.getValue))
    out.toByteArray
  }

  /** Bad checksum: a valid [[syntheticPng]] with its final CRC byte
    * flipped — the chunk-CRC require must catch it. */
  def poisonPngBadCrc(id: Long): Array[Byte] = {
    val b = syntheticPng(id).clone()
    b(b.length - 1) = (b(b.length - 1) ^ 0x55).toByte
    b
  }

  /** Wrong container signature: a valid [[syntheticWav]] with the WAVE
    * tag reversed. */
  def poisonWavBadMagic(id: Long): Array[Byte] = {
    val b = syntheticWav(id).clone()
    val t = "EVAW".getBytes("US-ASCII")
    System.arraycopy(t, 0, b, 8, 4)
    b
  }

  /** Zip-bomb sample table: a valid MP4 with its `stsz` sample count
    * patched to 2²⁴−1 — the parser's expansion cap must refuse before
    * materializing the table. Locates the LAST "stsz" fourcc (the
    * `moov` trails `mdat`, and no table entry encodes that 4-byte
    * pattern). */
  def poisonMp4Bomb(bytes: Array[Byte]): Array[Byte] = {
    val b = bytes.clone()
    val pat = "stsz".getBytes("US-ASCII")
    var at = -1
    var i = b.length - 4
    while (at < 0 && i >= 0) {
      if (b(i) == pat(0) && b(i + 1) == pat(1) && b(i + 2) == pat(2) &&
        b(i + 3) == pat(3)) at = i
      i -= 1
    }
    require(at >= 0, "no stsz fourcc in fixture")
    // box layout: [fourcc][fullHead 4][sample_size 4][count 4] — count
    // sits at fourcc + 12
    b(at + 12) = 0x00; b(at + 13) = 0xFF.toByte
    b(at + 14) = 0xFF.toByte; b(at + 15) = 0xFF.toByte
    b
  }

  /** Zip-bomb SOF0: a valid [[syntheticJpeg]] with its frame header's
    * dimensions patched to 65535×65535 (JPEG carries no checksums, so
    * the patch is otherwise a legal stream) — the decoder's raster cap
    * must refuse before any allocation. A raw FFC0 byte pair exists
    * only as the real SOF0 marker (entropy data byte-stuffs FF as
    * FF00), so the scan is unambiguous. */
  def poisonJpegBomb(bytes: Array[Byte]): Array[Byte] = {
    val b = bytes.clone()
    var at = -1
    var i = 0
    while (at < 0 && i + 1 < b.length) {
      if ((b(i) & 0xFF) == 0xFF && (b(i + 1) & 0xFF) == 0xC0) at = i
      i += 1
    }
    require(at >= 0, "no SOF0 marker in fixture")
    // segment: FFC0 len(2) precision(1) height(2) width(2)
    b(at + 5) = 0xFF.toByte; b(at + 6) = 0xFF.toByte
    b(at + 7) = 0xFF.toByte; b(at + 8) = 0xFF.toByte
    b
  }

  /** Truncated ENTROPY stream: a valid JPEG cut before its final
    * entropy bytes + EOI — the Huffman reader (or the EOI scan) must
    * hit its loud truncation require, never an infinite loop. */
  def poisonJpegTruncatedEntropy(bytes: Array[Byte]): Array[Byte] =
    bytes.take(math.max(4, bytes.length - 6))

  /** Wrong container signature: a valid [[syntheticGif]] with the GIF
    * magic defaced. */
  def poisonGifBadMagic(id: Long): Array[Byte] = {
    val b = syntheticGif(id).clone()
    b(0) = 'X'.toByte
    b
  }

  /** Zip-bomb GIF: structurally valid header + image descriptor both
    * declaring a 65535×65535 raster (4.3·10⁹ pixels against the
    * decoder cap) — the cap require must fire in the descriptor
    * handler, before any LZW read or allocation. */
  def poisonGifBomb(): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    le16(0xFFFF); le16(0xFFFF) // logical screen 65535x65535
    out.write(0x80); out.write(0); out.write(0) // GCT present, 2 entries
    out.write(Array[Byte](0, 0, 0, -1, -1, -1)) // the 2-entry GCT
    out.write(0x2C) // image descriptor
    le16(0); le16(0); le16(0xFFFF); le16(0xFFFF)
    out.write(0) // no local table, not interlaced
    out.write(2) // LZW min code size (never reached)
    out.toByteArray
  }

  final case class SafeImageStats(id: Long, ok: Boolean, reason: String,
                                  width: Long, height: Long,
                                  sum_r: Long, sum_g: Long, sum_b: Long,
                                  px_min: Long, px_max: Long)

  /** Fault-isolated [[jpegStats]]. */
  def jpegStatsSafe(df: DataFrame, idCol: String,
                    binCol: String): Dataset[SafeImageStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        try {
          val img = Jpeg.decode(bytes)
          val st = pixelStats(id, img.width, img.height, img.pixels)
          SafeImageStats(id, ok = true, "", st.width, st.height,
            st.sum_r, st.sum_g, st.sum_b, st.px_min, st.px_max)
        } catch { case scala.util.control.NonFatal(e) =>
          SafeImageStats(id, ok = false, reasonOf(e), 0L, 0L, 0L, 0L, 0L, 0L, 0L)
        }
      })
  }

  /** Fault-isolated [[gifStats]]. */
  def gifStatsSafe(df: DataFrame, idCol: String,
                   binCol: String): Dataset[SafeImageStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        try {
          val img = Gif.decode(bytes)
          val packed = new Array[Int](img.pixels.length)
          var i = 0
          while (i < packed.length) { packed(i) = img.palette(img.pixels(i)); i += 1 }
          val st = pixelStats(id, img.width, img.height, packed)
          SafeImageStats(id, ok = true, "", st.width, st.height,
            st.sum_r, st.sum_g, st.sum_b, st.px_min, st.px_max)
        } catch { case scala.util.control.NonFatal(e) =>
          SafeImageStats(id, ok = false, reasonOf(e), 0L, 0L, 0L, 0L, 0L, 0L, 0L)
        }
      })
  }

  /** Corrupt FIRST-keyframe payload inside a structurally valid MP4:
    * the container parses, the exact fingerprint still computes, but
    * the perceptual tier's keyframe image decode hits an unrecognized
    * codec signature — exercising the "either tier fails → quarantine"
    * rule. */
  def poisonMp4Keyframe(bytes: Array[Byte]): Array[Byte] = {
    val b = bytes.clone()
    val first = Mp4.parse(bytes).samples.head
    b(first.offset.toInt) = 0x00
    b(first.offset.toInt + 1) = 0x00
    b
  }

  /** The media admission book with the quarantine tier threaded through
    * (VERDICT r11 #1): per-asset verdicts across all three modalities
    * where an asset that fails decode in EITHER tier (exact content
    * fingerprint or perceptual signature — a perceptual-only failure
    * still means "cannot establish near-dup identity", so it cannot be
    * admitted) is routed to a quarantine row
    * `(keep_exact=false, keep_perceptual=false, admit=false,
    * reason=decode:<kind>)` and contributes NOTHING to the surviving
    * corpus's fingerprint groups or pair graphs — good assets' verdicts
    * are byte-identical to the strict book's (spec-pinned). Reason
    * precedence: the exact tier's failure wins when both tiers fail
    * (same bytes, same first guard for image/audio; for video the two
    * tiers read different corpora). Plan shape = the strict book's (one
    * union-graph contraction, groupBy-min exact keepers, per-tier
    * decode-once via pinned signature frames) plus three id-equi-joins
    * against the tiny ok-id frames. */
  def mediaAdmissionBookSafe(imgBin: DataFrame, audBin: DataFrame,
                             vidPerceptBin: DataFrame, vidExactBin: DataFrame,
                             maxIters: Int = 25): DataFrame = {
    // image and audio decode ONCE via the fused safe passes (r14): the
    // pinned fused frame projects into the two tier shapes — identical
    // rows to the separate safe passes (shared per-asset bodies,
    // spec-pinned), one fewer corpus parse per modality. The video
    // tiers read DIFFERENT corpora, so no fusion exists there.
    // the four safe decode passes are independent (disjoint corpora /
    // tiers) — materialize them as CONCURRENT jobs (guide §2.6) so each
    // pass's straggler tail back-fills instead of serializing 4 actions
    val Seq(imgSig, audSig, vidPH, vidFp) = graft.util.Par.map(Seq(
      () => imageSignaturesSafe(imgBin, "id", "img").toDF()
        .localCheckpoint(true),
      () => audioSignaturesSafe(audBin, "id", "clip").toDF()
        .localCheckpoint(true),
      () => videoPerceptualHashSafe(vidPerceptBin, "id", "vid").toDF()
        .localCheckpoint(true),
      () => videoFingerprintSafe(vidExactBin, "id", "vid").toDF()
        .localCheckpoint(true)))
    val imgAH = imgSig.select("id", "ok", "reason", "width", "height", "ahash")
    val imgFp = imgSig.select("id", "ok", "reason", "width", "height", "fp")
    val audAH = audSig.select(col("id"), col("ok"), col("reason"),
      col("channels"), col("n_windows"), col("wfp").as("fp"))
    val audFp = audSig.select(col("id"), col("ok"), col("reason"),
      col("channels"), col("n_samples"), col("sfp").as("fp"))
    val out = composeSafeMediaBook(imgAH, imgFp, audAH, audFp, vidPH, vidFp,
      maxIters)
    Seq(imgSig, audSig, vidPH, vidFp)
      .foreach(Dedup.releaseOwnCheckpoint)
    out
  }

  /** Compose the quarantine-threaded admission book from the six SAFE
    * signature frames (ok/reason + signature columns per tier) — the
    * decode-free tail of [[mediaAdmissionBookSafe]], split out (VERDICT
    * r13 #2) so the frames can come from a PERSISTED index: the safe
    * variants' outputs are the per-asset artifact the same way the
    * strict book's signature frames are, and the from-index gate
    * composes verdicts without touching media bytes. */
  def composeSafeMediaBook(imgAH: DataFrame, imgFp: DataFrame,
                           audAH: DataFrame, audFp: DataFrame,
                           vidPH: DataFrame, vidFp: DataFrame,
                           maxIters: Int = 25): DataFrame = {
    // an asset participates only if BOTH tiers decoded — a partial
    // decode must not seed exact groups or pair buckets
    def goods(per: DataFrame, ex: DataFrame,
              perCols: Seq[String], exCols: Seq[String]): (DataFrame, DataFrame) = {
      val ids = per.where(col("ok")).select("id")
        .join(ex.where(col("ok")).select("id"), "id")
      (per.join(ids, "id").select(perCols.map(col): _*),
        ex.join(ids, "id").select(exCols.map(col): _*))
    }
    val (imgSig, imgEx) = goods(imgAH, imgFp,
      Seq("id", "width", "height", "ahash"), Seq("id", "fp"))
    val (audSig, audEx) = goods(audAH, audFp,
      Seq("id", "channels", "n_windows", "fp"), Seq("id", "fp"))
    val (vidSig, vidEx) = goods(vidPH, vidFp,
      Seq("id", "width", "height", "n_key", "sig"), Seq("id", "fp"))
    val perceptual = mediaNearDupClustersMulti(Seq(
      ("image", imgSig.select("id"), imageAHashPairs(imgSig)),
      ("audio", audSig.select("id"), audioFingerprintPairs(audSig)),
      ("video", vidSig.select("id"), videoPerceptualPairs(vidSig))), maxIters)
      .localCheckpoint(true)
    def perc(m: String) = perceptual.where(col("modality") === m)
    val good = mediaAdmissionVerdicts(imgEx, "fp", perc("image"), "image")
      .unionByName(mediaAdmissionVerdicts(audEx, "fp", perc("audio"), "audio"))
      .unionByName(mediaAdmissionVerdicts(vidEx, "fp", perc("video"), "video"))
      .withColumn("reason", lit(""))
    // FULL-outer on id (ADVICE r12): the two tiers can legitimately see
    // different id sets (the video tiers read different corpora). An id
    // present in only one tier has no verdict from the other — that is
    // itself a quarantine condition (`missing:<tier>`), never a silent
    // drop: with an inner join such an asset would neither be admitted
    // (goods() requires both tiers ok) nor appear in the book at all.
    def quarantine(per: DataFrame, ex: DataFrame, m: String): DataFrame =
      ex.select(col("id"), col("ok").as("ok_e"), col("reason").as("r_e"))
        .join(per.select(col("id"), col("ok").as("ok_p"), col("reason").as("r_p")),
          Seq("id"), "full_outer")
        .where(!coalesce(col("ok_e"), lit(false)) ||
          !coalesce(col("ok_p"), lit(false)))
        .select(lit(m).as("modality"), col("id"),
          lit(false).as("keep_exact"), lit(false).as("keep_perceptual"),
          lit(false).as("admit"),
          when(!coalesce(col("ok_e"), lit(false)),
            coalesce(col("r_e"), lit("missing:exact")))
            .otherwise(coalesce(col("r_p"), lit("missing:perceptual")))
            .as("reason"))
    val out = good
      .unionByName(quarantine(imgAH, imgFp, "image"))
      .unionByName(quarantine(audAH, audFp, "audio"))
      .unionByName(quarantine(vidPH, vidFp, "video"))
      // the LOUD counter: quarantine volume is an observable metric on
      // the book itself (fires when the verdict frame materializes), so
      // a poisoned-ingest spike surfaces in ops telemetry, not just in
      // the verdict rows
      .observe("media_book_quarantine_" +
          java.util.UUID.randomUUID().toString.replace("-", ""),
        sum(when(col("reason") =!= "", 1L).otherwise(0L)).as("quarantined"),
        count(lit(1)).as("assets"))
      .localCheckpoint(true) // tiny (one row per asset); frees the inputs
    Dedup.releaseOwnCheckpoint(perceptual)
    out
  }
}
