package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns plus typed
  * metadata, with per-partition batched decode/feature-extraction.
  *
  * The codec is a REAL decoder for binary PPM (P6) — a dependency-free
  * image format parseable with plain JVM byte walking: `P6`, whitespace-
  * separated width/height/maxval header (with `#` comments), then
  * width×height×3 raw RGB bytes. The fixture table packs each document's
  * UTF-8 bytes into a valid P6 blob (near-square frame, zero-padded), so
  * decode failures are real failures, and every decoded feature (header
  * dimensions + pixel statistics) is independently recomputable from the
  * source text by the SQL oracle.
  *
  * Swapping PPM for JPEG/PNG/audio changes [[decodePpm]]/[[buildPpm]] only;
  * the Spark-side shape — binary column, metadata struct, per-partition
  * streaming batch decode (`mapPartitions` ≈ `mapInPandas` batches) — is
  * codec-agnostic.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** The media-table shape every producer here emits. */
  val mediaTableSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media", BinaryType),
    StructField("media_meta", mediaMetaSchema)))

  /** Near-square frame dimensions for a payload of `nBytes`: enough pixels
    * to carry every byte in RGB triples. MUST stay in sync with the SQL
    * oracle twin (ceil semantics on both sides).
    */
  private[graft] def frameOf(nBytes: Int): (Int, Int) = {
    if (nBytes == 0) return (0, 0)
    val npix = (nBytes + 2) / 3
    val w = math.ceil(math.sqrt(npix.toDouble)).toInt
    val h = math.ceil(npix.toDouble / w).toInt
    (w, h)
  }

  /** A valid binary-PPM (P6) blob carrying `payload` as pixel data, zero-
    * padded to the full frame.
    */
  private[graft] def buildPpm(payload: Array[Byte]): Array[Byte] = {
    val (w, h) = frameOf(payload.length)
    val header = s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(payload, 0, out, header.length, payload.length)
    out
  }

  /** P6 header parse: magic, whitespace/comment-tolerant ints, raster
    * length validation. Returns (width, height, rasterOffset).
    */
  private[graft] def parsePpmHeader(bytes: Array[Byte]): (Int, Int, Int) = {
    val (w, h, off) = parsePpmHeaderAt(bytes, 0)
    val n = w * h * 3
    if (bytes.length - off != n)
      throw new IllegalArgumentException(
        s"not a P6 PPM: raster is ${bytes.length - off} bytes, expected $n")
    (w, h, off)
  }

  /** Header parse at an offset without the trailing exact-length check —
    * the walker primitive for multi-frame containers (concatenated P6
    * streams, [[Video]]); the single-image [[parsePpmHeader]] adds the
    * whole-blob length validation on top.
    */
  private[graft] def parsePpmHeaderAt(bytes: Array[Byte], start: Int): (Int, Int, Int) = {
    var i = start
    def fail(msg: String) = throw new IllegalArgumentException(s"not a P6 PPM: $msg")
    if (bytes.length < i + 2 || bytes(i) != 'P' || bytes(i + 1) != '6') fail("bad magic")
    i += 2
    def skipSpace(): Unit = {
      var in = true
      while (in && i < bytes.length) {
        val b = bytes(i)
        if (b == '#') while (i < bytes.length && bytes(i) != '\n') i += 1
        else if (b == ' ' || b == '\n' || b == '\r' || b == '\t') i += 1
        else in = false
      }
    }
    def readInt(): Int = {
      skipSpace()
      if (i >= bytes.length || bytes(i) < '0' || bytes(i) > '9') fail("expected integer")
      var v = 0
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1
      }
      v
    }
    val w = readInt()
    val h = readInt()
    val maxval = readInt()
    if (maxval != 255) fail(s"unsupported maxval $maxval")
    // exactly ONE whitespace byte separates header and raster (PPM spec)
    if (i >= bytes.length || !(bytes(i) == '\n' || bytes(i) == ' ' ||
        bytes(i) == '\r' || bytes(i) == '\t')) fail("missing raster separator")
    i += 1
    if (bytes.length - i < w * h * 3)
      fail(s"raster is ${bytes.length - i} bytes, expected at least ${w * h * 3}")
    (w, h, i)
  }

  /** Real P6 parse returning (width, height, pixelSum, pixelMax). */
  private[graft] def decodePpm(bytes: Array[Byte]): (Int, Int, Long, Int) = {
    val (w, h, off) = parsePpmHeader(bytes)
    var s = 0L
    var mx = 0
    var j = off
    while (j < bytes.length) {
      val v = bytes(j) & 0xff
      s += v
      if (v > mx) mx = v
      j += 1
    }
    (w, h, s, mx)
  }

  /** Nearest-neighbor downscale by an integer factor: output pixel (x', y')
    * copies input pixel (x'·f, y'·f); output frame is ceil(w/f) × ceil(h/f).
    * Returns a valid P6 blob.
    */
  private[graft] def resizePpm(bytes: Array[Byte], factor: Int): Array[Byte] =
    resizePpmWithDims(bytes, factor)._1

  /** Resize plus the output dimensions, so table-level callers need no
    * second header parse of the blob they just built.
    */
  private def resizePpmWithDims(bytes: Array[Byte], factor: Int): (Array[Byte], Int, Int) = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    val (w, h, off) = parsePpmHeader(bytes)
    val w2 = if (w == 0) 0 else (w + factor - 1) / factor
    val h2 = if (h == 0) 0 else (h + factor - 1) / factor
    val header = s"P6\n$w2 $h2\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + w2 * h2 * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val src = off + 3 * ((y * factor) * w + x * factor)
        val dst = header.length + 3 * (y * w2 + x)
        out(dst) = bytes(src); out(dst + 1) = bytes(src + 1); out(dst + 2) = bytes(src + 2)
        x += 1
      }
      y += 1
    }
    (out, w2, h2)
  }

  /** Wrap a text corpus as a media table: `(doc_id, media binary, media_meta
    * struct)` where `media` is a REAL P6 image whose pixels carry the
    * document bytes. Stands in for reading image blobs off storage; rows
    * stream through the partition iterator, nothing collects.
    */
  def synthMediaTable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaTableSchema)
    val projected = docs.select(col(idCol).cast("long"), col(textCol))
    val out: Dataset[Row] = projected.mapPartitions { it =>
      it.map { row =>
        val payload = row.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val blob = buildPpm(payload)
        val (w, h) = frameOf(payload.length)
        Row(row.getLong(0), blob,
          Row("image/x-portable-pixmap", w, h, blob.length.toLong))
      }
    }(enc)
    out
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_pixel_bytes", LongType),
    StructField("pixel_sum", LongType),
    StructField("pixel_max", IntegerType)))

  /** Downscale every blob by `factor` (nearest-neighbor), emitting the same
    * media-table shape with refreshed metadata. Same streaming
    * `mapPartitions` batch contract as [[extractFeatures]].
    */
  def resizeMedia(media: DataFrame, factor: Int, idCol: String = "doc_id",
      blobCol: String = "media"): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaTableSchema)
    val projected = media.select(col(idCol).cast("long"), col(blobCol))
    val out: Dataset[Row] = projected.mapPartitions { it =>
      it.map { row =>
        val (blob, w, h) = resizePpmWithDims(row.getAs[Array[Byte]](1), factor)
        Row(row.getLong(0), blob, Row("image/x-portable-pixmap", w, h, blob.length.toLong))
      }
    }(enc)
    out
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame_sum", LongType),
    StructField("frame_max", IntegerType)))

  /** Frame sampling: treat each raster ROW as a frame of the media stream
    * and keep every `stride`-th one, emitting per-frame pixel stats — the
    * video-keyframe-sampling shape over the fixture format. One output row
    * per sampled frame, streamed per partition.
    */
  def sampleFrames(media: DataFrame, stride: Int, idCol: String = "doc_id",
      blobCol: String = "media"): DataFrame = {
    require(stride >= 1, s"frame stride must be >= 1, got $stride")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(frameSchema)
    val projected = media.select(col(idCol).cast("long"), col(blobCol))
    val out: Dataset[Row] = projected.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](1)
        val (w, h, off) = parsePpmHeader(bytes)
        (0 until h by stride).iterator.map { y =>
          var s = 0L
          var mx = 0
          var j = off + 3 * y * w
          val end = j + 3 * w
          while (j < end) {
            val v = bytes(j) & 0xff
            s += v
            if (v > mx) mx = v
            j += 1
          }
          Row(row.getLong(0), y, s, mx)
        }
      }
    }(enc)
    out
  }

  val phashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("phash", LongType)))

  /** 64-bit perceptual difference hash (dHash) per blob: sample a 9×8 grid
    * of gray values (channel sum — integer-only, no luma weights, so every
    * engine agrees exactly) by nearest neighbor across the frame, and set
    * bit `y·8 + x` iff `gray(y, x) > gray(y, x+1)` — the classic cheap
    * image fingerprint whose Hamming distance survives re-encoding and
    * mild resizing. An empty frame hashes to 0. Same streaming
    * `mapPartitions` decode contract as [[extractFeatures]].
    */
  def perceptualHash(media: DataFrame, idCol: String = "doc_id",
      blobCol: String = "media"): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(phashSchema)
    val projected = media.select(col(idCol).cast("long"), col(blobCol))
    val out: Dataset[Row] = projected.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](1)
        val (w, h, off) = parsePpmHeader(bytes)
        var hash = 0L
        if (w > 0 && h > 0) {
          def gray(y: Int, x: Int): Int = {
            val j = off + 3 * ((y * h / 8) * w + x * w / 9)
            (bytes(j) & 0xff) + (bytes(j + 1) & 0xff) + (bytes(j + 2) & 0xff)
          }
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              if (gray(y, x) > gray(y, x + 1)) hash |= 1L << (y * 8 + x)
              x += 1
            }
            y += 1
          }
        }
        Row(row.getLong(0), w, h, hash)
      }
    }(enc)
    out
  }

  val widePhashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("phw", ArrayType(LongType, containsNull = false))))

  /** 256-bit wide perceptual hash: a 13×5 nearest-neighbor gray grid (65
    * cells in raster order, channel-sum gray like [[perceptualHash]])
    * compared at lags 1/2/4/8 ([[Audio.WideLags]]) into four 64-bit words —
    * the image face of the shared wide-contour machinery
    * ([[Audio.audioFingerprintWide]], [[Video.videoFingerprintWide]]).
    * Lag 1 compares raster-adjacent cells (the dHash idea); lags 2/4/8 add
    * longer-range spatial comparisons, turning the same grid into 256
    * reasonably independent bits. The width is what keeps a SMALL absolute
    * near-dup radius scale-safe: at radius 24 the pigeonhole splits into
    * 25 chunks of ≥10 bits, where the 64-bit dHash at the same selectivity
    * forced 9-bit chunks below the candidate-budget floor. An empty frame
    * hashes to all-zero words.
    */
  def perceptualHashWide(media: DataFrame, idCol: String = "doc_id",
      blobCol: String = "media"): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(widePhashSchema)
    val projected = media.select(col(idCol).cast("long"), col(blobCol))
    val out: Dataset[Row] = projected.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](1)
        val (w, h, off) = parsePpmHeader(bytes)
        val g = new Array[Long](65)
        if (w > 0 && h > 0) {
          var i = 0
          while (i < 65) {
            // grid cell (i/13, i%13) → nearest pixel; same ⌊·⌋ sampling
            // arithmetic as perceptualHash's 9×8 grid
            val p = ((i / 13) * h / 5) * w + (i % 13) * w / 13
            val j = off + 3 * p
            g(i) = (bytes(j) & 0xff) + (bytes(j + 1) & 0xff) + (bytes(j + 2) & 0xff)
            i += 1
          }
        }
        Row(row.getLong(0), w, h, Audio.wideContourWords(g).toSeq)
      }
    }(enc)
    out
  }

  /** Image near-dup pairs: Hamming ≤ maxDist over [[perceptualHashWide]]
    * via [[Dedup.hammingNearDupsWide]]'s exact pigeonhole equi-join — the
    * image-level dedup a multimodal corpus runs next to the text-level
    * MinHash pass (catches re-encoded/padded copies whose bytes differ).
    * Default radius 24 over 256 bits keeps every pigeonhole chunk at the
    * [[Dedup.MinChunkBits]] floor with no narrow-chunk opt-in.
    */
  def phashNearDups(media: DataFrame, maxDist: Int = 24, idCol: String = "doc_id",
      blobCol: String = "media"): DataFrame =
    Dedup.hammingNearDupsWide(
      perceptualHashWide(media, idCol, blobCol).select(col(idCol), col("phw")),
      idCol, "phw", totalBits = Audio.WideFingerprintBits, maxDist = maxDist)

  /** Batched per-partition decode over the binary column: a real P6 parse
    * per blob. Rows stream through the partition iterator — nothing is
    * collected; at scale partition sizing is controlled upstream via
    * `spark.sql.files.maxPartitionBytes` so each batch of blobs fits memory.
    */
  def extractFeatures(media: DataFrame, idCol: String = "doc_id",
      blobCol: String = "media"): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    val projected = media.select(col(idCol).cast("long"), col(blobCol))
    val out: Dataset[Row] = projected.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val (w, h, s, mx) = decodePpm(row.getAs[Array[Byte]](1))
        Row(id, w, h, w.toLong * h * 3, s, mx)
      }
    }(enc)
    out
  }
}
