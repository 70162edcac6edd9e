package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Video-modality plumbing: clips as opaque `binary` columns holding a
  * REAL multi-frame container — a concatenated binary-P6 stream, the
  * format `ffmpeg -f image2pipe -vcodec ppm` pipes (each frame is a
  * complete P6 image, headers included, back to back). The walker parses
  * every frame header in sequence ([[Multimodal.parsePpmHeaderAt]]), so a
  * corrupt or truncated mid-stream frame is a real decode failure, not a
  * silent skip.
  *
  * The fixture packs each document into fixed-width byte slices, one P6
  * frame per slice (last slice ragged), which keeps every per-frame
  * statistic independently recomputable from the source text by the SQL
  * oracle — same ASCII-only fixture assumption as the image/audio twins.
  * Frames are sequential WITHIN a blob, so every operator here is a
  * per-partition streamed walk (no shuffle); parallelism comes from the
  * corpus dimension, the right decomposition for clip-sized videos at
  * 100 TB (a single giant video would instead be split upstream into
  * clip-sized blobs, the standard practice).
  */
object Video {

  /** Fixture slice width: bytes of document text per frame. */
  val FrameBytes = 192

  val videoMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_frames", IntegerType),
    StructField("n_bytes", LongType)))

  /** The video-table shape every producer here emits. */
  val videoTableSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("video", BinaryType),
    StructField("video_meta", videoMetaSchema)))

  /** A concatenated-P6 stream carrying `payload` as [[FrameBytes]]-wide
    * slices, one frame per slice. Zero-length payload → zero frames
    * (empty blob) — a legal, empty stream.
    */
  private[graft] def buildPpmStream(payload: Array[Byte],
      frameBytes: Int = FrameBytes): Array[Byte] = {
    require(frameBytes >= 1, s"frame width must be >= 1, got $frameBytes")
    val nFrames = (payload.length + frameBytes - 1) / frameBytes
    val frames = (0 until nFrames).map { f =>
      val start = f * frameBytes
      val end = math.min(start + frameBytes, payload.length)
      Multimodal.buildPpm(java.util.Arrays.copyOfRange(payload, start, end))
    }
    val out = new Array[Byte](frames.map(_.length).sum)
    var off = 0
    frames.foreach { fr =>
      System.arraycopy(fr, 0, out, off, fr.length)
      off += fr.length
    }
    out
  }

  /** Walk a concatenated-P6 stream, invoking `onFrame(frameIdx, w, h,
    * rasterOff)` per frame. Every header is really parsed; trailing
    * garbage or a truncated frame raises.
    */
  private[graft] def walkFrames(bytes: Array[Byte])
      (onFrame: (Int, Int, Int, Int) => Unit): Int = {
    var off = 0
    var idx = 0
    while (off < bytes.length) {
      val (w, h, rasterOff) = Multimodal.parsePpmHeaderAt(bytes, off)
      onFrame(idx, w, h, rasterOff)
      off = rasterOff + 3 * w * h
      idx += 1
    }
    idx
  }

  /** Wrap a text corpus as a video table: `(doc_id, video binary,
    * video_meta struct)` where `video` is a REAL concatenated-P6 stream of
    * the document's byte slices. Rows stream through the partition
    * iterator, nothing collects.
    */
  def synthVideoTable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(videoTableSchema)
    val projected = docs.select(col(idCol).cast("long"), col(textCol))
    val out: Dataset[Row] = projected.mapPartitions { it =>
      it.map { row =>
        val payload = row.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val blob = buildPpmStream(payload)
        val nFrames = (payload.length + FrameBytes - 1) / FrameBytes
        Row(row.getLong(0), blob, Row("video/x-ppm-stream", nFrames, blob.length.toLong))
      }
    }(enc)
    out
  }

  val frameStatSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("pixel_sum", LongType),
    StructField("pixel_max", IntegerType)))

  /** Per-frame decode statistics from a real container walk: one output
    * row per frame with its own parsed geometry (frames need not share
    * dimensions — the last fixture frame is ragged). Streamed per
    * partition; an empty stream emits no rows.
    */
  def frameStats(video: DataFrame, idCol: String = "doc_id",
      blobCol: String = "video"): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(frameStatSchema)
    val projected = video.select(col(idCol).cast("long"), col(blobCol))
    val out: Dataset[Row] = projected.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](1)
        val acc = scala.collection.mutable.ArrayBuffer.empty[Row]
        walkFrames(bytes) { (idx, w, h, off) =>
          var s = 0L
          var mx = 0
          var j = off
          val end = off + 3 * w * h
          while (j < end) {
            val v = bytes(j) & 0xff
            s += v
            if (v > mx) mx = v
            j += 1
          }
          acc += Row(row.getLong(0), idx, w, h, s, mx)
        }
        acc.iterator
      }
    }(enc)
    out
  }

  val fingerprintSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_px", LongType),
    StructField("vfp", LongType)))

  /** 64-bit video fingerprint (temporal-luma contour): concatenate the
    * decoded frame rasters (padding bytes included — they are part of the
    * decoded signal), split the stream into 65 equal windows
    * `[⌊i·N/65⌋, ⌊(i+1)·N/65⌋)` and set bit `i` iff
    * `energy(i) > energy(i+1)` where energy is the window Σ byte² — the
    * video analog of the audio energy contour ([[Audio.audioFingerprint]])
    * and the image dHash ([[Multimodal.perceptualHash]]). Integer-only so
    * every engine agrees exactly; windows fit Long (255² per byte). A
    * stream shorter than 65 bytes leaves empty tail windows (energy 0);
    * an empty stream hashes to 0. One linear pass per clip, window index
    * advancing monotonically with the byte cursor — no per-byte division.
    */
  def videoFingerprint(video: DataFrame, idCol: String = "doc_id",
      blobCol: String = "video"): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(fingerprintSchema)
    val projected = video.select(col(idCol).cast("long"), col(blobCol))
    val out: Dataset[Row] = projected.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](1)
        val (total, e) = lumaContour(bytes)
        var hash = 0L
        var b = 0
        while (b < 64) {
          if (e(b) > e(b + 1)) hash |= 1L << b
          b += 1
        }
        Row(row.getLong(0), total, hash)
      }
    }(enc)
    out
  }

  /** The shared 65-window Σ byte² luma contour of one decoded stream:
    * returns (total decoded bytes, window energies). One linear pass, the
    * window index advancing monotonically with the byte cursor.
    */
  private def lumaContour(bytes: Array[Byte]): (Long, Array[Long]) = {
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var total = 0L
    walkFrames(bytes) { (_, w, h, off) =>
      val n = 3 * w * h
      frames += ((off, n))
      total += n
    }
    val e = new Array[Long](65)
    var g = 0L
    var wi = 0
    frames.foreach { case (off, n) =>
      var j = 0
      while (j < n) {
        while (wi < 64 && g >= (wi + 1).toLong * total / 65) wi += 1
        val v = bytes(off + j) & 0xff
        e(wi) += v.toLong * v
        g += 1
        j += 1
      }
    }
    (total, e)
  }

  val wideFingerprintSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_px", LongType),
    StructField("vfp", ArrayType(LongType, containsNull = false))))

  /** 256-bit wide video fingerprint: the same 65-window luma contour as
    * [[videoFingerprint]], compared at lags 1/2/4/8 ([[Audio.WideLags]])
    * into four 64-bit words (`vfp(0)` is the lag-1 word, identical to the
    * 64-bit `vfp`) — the video face of [[Audio.audioFingerprintWide]], with
    * the same purpose: enough signature width that a SMALL absolute
    * near-dup radius keeps the pigeonhole join-key alphabet ≥ 2^10.
    */
  def videoFingerprintWide(video: DataFrame, idCol: String = "doc_id",
      blobCol: String = "video"): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(wideFingerprintSchema)
    val projected = video.select(col(idCol).cast("long"), col(blobCol))
    val out: Dataset[Row] = projected.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](1)
        val (total, e) = lumaContour(bytes)
        Row(row.getLong(0), total, Audio.wideContourWords(e).toSeq)
      }
    }(enc)
    out
  }

  /** Video near-dup pairs: Hamming ≤ maxDist over [[videoFingerprintWide]]
    * via [[Dedup.hammingNearDupsWide]]'s exact pigeonhole equi-join — the
    * fourth face of the per-modality dedup family (text MinHash, image
    * pHash, audio energy contour, video luma contour). Default radius 24
    * over 256 bits, same calibration as audio: in-place edited copies land
    * at ≤ 19 on the fixture corpus while unrelated pairs bottom out at
    * ~71 — and 25 chunks × ~10 bits keeps the join-key alphabet healthy
    * (the former 64-bit/radius-14 config forced 4-bit chunks).
    */
  def videoNearDups(video: DataFrame, maxDist: Int = 24, idCol: String = "doc_id",
      blobCol: String = "video"): DataFrame =
    Dedup.hammingNearDupsWide(
      videoFingerprintWide(video, idCol, blobCol).select(col(idCol), col("vfp")),
      idCol, "vfp", totalBits = Audio.WideFingerprintBits, maxDist = maxDist)

  val sampleSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("pixel_sum", LongType)))

  /** Uniform-k frame sampling: keep the frames at indices
    * `{⌊i·nf/k⌋ : i ∈ [0, k)}` — exactly k evenly-spaced frames when the
    * clip has ≥ k, every frame (deduplicated) when shorter, none when
    * empty. The representative-frame selection a vision-training pipeline
    * runs before the expensive per-frame model; deterministic, so the
    * sample is reproducible across runs and engines. Emits the sampled
    * frame's decode statistic (pixel sum) alongside its index. Per-clip
    * streamed walk, no shuffle.
    */
  def sampleFrames(video: DataFrame, k: Int, idCol: String = "doc_id",
      blobCol: String = "video"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(sampleSchema)
    val projected = video.select(col(idCol).cast("long"), col(blobCol))
    val out: Dataset[Row] = projected.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](1)
        val sums = scala.collection.mutable.ArrayBuffer.empty[Long]
        walkFrames(bytes) { (_, w, h, off) =>
          var s = 0L
          var j = off
          val end = off + 3 * w * h
          while (j < end) {
            s += bytes(j) & 0xff
            j += 1
          }
          sums += s
        }
        val nf = sums.length
        val keep = (0 until k).map(i => (i.toLong * nf / k).toInt).distinct
        keep.iterator.filter(_ < nf).map(f => Row(row.getLong(0), f, sums(f)))
      }
    }(enc)
    out
  }

  val keyframeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("pixel_sum", LongType),
    StructField("delta", LongType)))

  /** Scene-change keyframe detection: emit frame 0 plus every frame whose
    * absolute pixel-sum delta from its predecessor exceeds `threshold` —
    * the cheap luma-delta cut detector every video sampling pipeline runs
    * first. `delta` for frame 0 is its own sum (change from nothing).
    * Sequential within a clip by nature, so the walk stays inside the
    * partition iterator; no shuffle.
    */
  def keyframes(video: DataFrame, threshold: Long, idCol: String = "doc_id",
      blobCol: String = "video"): DataFrame = {
    require(threshold >= 0, s"threshold must be >= 0, got $threshold")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(keyframeSchema)
    val projected = video.select(col(idCol).cast("long"), col(blobCol))
    val out: Dataset[Row] = projected.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](1)
        val acc = scala.collection.mutable.ArrayBuffer.empty[Row]
        var prevSum = 0L
        walkFrames(bytes) { (idx, w, h, off) =>
          var s = 0L
          var j = off
          val end = off + 3 * w * h
          while (j < end) {
            s += bytes(j) & 0xff
            j += 1
          }
          val delta = math.abs(s - prevSum)
          if (idx == 0 || delta > threshold)
            acc += Row(row.getLong(0), idx, s, delta)
          prevSum = s
        }
        acc.iterator
      }
    }(enc)
    out
  }

  private val FrameHashMod = 1000000007L

  val frameHashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame_hash", LongType)))

  /** Per-frame content hash: the polynomial fold (a·31 + byte) mod 1e9+7
    * over each frame's DECODED raster (padding included — it is part of
    * the decoded signal, same contract as [[videoFingerprint]]). The
    * frame is the container's natural chunk unit, so this is the video
    * face of sub-file dedup: no rolling-boundary scan needed where the
    * format already defines alignment ([[Audio.cdcChunks]] earns its
    * boundaries because PCM has none).
    */
  def frameHashes(video: DataFrame, idCol: String = "doc_id",
      blobCol: String = "video"): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(frameHashSchema)
    val projected = video.select(col(idCol).cast("long"), col(blobCol))
    val out: Dataset[Row] = projected.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](1)
        val acc = scala.collection.mutable.ArrayBuffer.empty[Row]
        walkFrames(bytes) { (idx, w, h, off) =>
          var hsh = 0L
          var j = off
          val end = off + 3 * w * h
          while (j < end) {
            hsh = ((hsh * 31 + (bytes(j) & 0xff)) % FrameHashMod + FrameHashMod) % FrameHashMod
            j += 1
          }
          acc += Row(row.getLong(0), idx, hsh)
        }
        acc.iterator
      }
    }(enc)
    out
  }

  /** Sub-video near-duplicate pairs by shared frames — clip-reuse
    * detection: two videos sharing `minShared` identical frames pair up
    * regardless of WHERE the shared material sits (the whole-clip contour
    * fingerprint needs global similarity). Postings capped at `maxDf`
    * (a ubiquitous black/intro frame carries no pair signal), pairs
    * counted over the frame-hash inverted index — the same candidate-only
    * scale shape as every LSH family here.
    */
  def frameDups(video: DataFrame, minShared: Int = 2, maxDf: Int = 50,
      idCol: String = "doc_id", blobCol: String = "video"): DataFrame = {
    require(minShared >= 1 && maxDf >= 2,
      s"need minShared >= 1, maxDf >= 2; got minShared=$minShared maxDf=$maxDf")
    val fps = frameHashes(video, idCol, blobCol)
      .select(col("doc_id").as("id"), col("frame_hash")).distinct()
    val keep = fps.groupBy("frame_hash").agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxDf).select("frame_hash")
    val indexed = fps.join(keep, "frame_hash")
    indexed.select(col("frame_hash"), col("id").as("id_a"))
      .join(indexed.select(col("frame_hash"), col("id").as("id_b")), "frame_hash")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
