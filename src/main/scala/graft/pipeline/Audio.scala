package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Audio-modality plumbing: clips as opaque `binary` columns plus typed
  * metadata, with per-partition batched decode — the audio face of the
  * multimodal design in [[Multimodal]] (same schema/partitioning/batch
  * contract; only the codec differs).
  *
  * The codec is a REAL RIFF/WAVE PCM16 parser: `RIFF`/`WAVE` magic, then a
  * proper chunk walk (id + little-endian u32 size, odd sizes padded per the
  * RIFF spec) that extracts `fmt ` (must be PCM, mono, 16-bit) and `data`
  * and skips unknown chunks (`LIST`, `fact`, …) the way real encoders emit
  * them — so decode failures are real failures. The fixture table maps each
  * document's UTF-8 bytes to PCM16 samples via `(byte − 128) · 256`
  * (unsigned byte → centred 16-bit), which keeps every decoded statistic
  * independently recomputable from the source text by the SQL oracle.
  * ASCII-ONLY FIXTURE ASSUMPTION (same as the mm twins): the oracle
  * rebuilds samples from codepoints, which equals the byte-level samples
  * only while the corpus is pure ASCII.
  *
  * Reference analogy: the reference treats sensor payloads as opaque typed
  * blobs resolved by source adapters (`/root/reference/weather/data_sources/
  * netatmo/domain.py` measurement types); here the adapter is a binary
  * codec and the "measurement" is the PCM frame.
  */
object Audio {

  /** Fixture sample rate; divides cleanly by the decimation factors used in
    * the gate queries (16000/4 = 4000).
    */
  val SampleRate = 16000

  val audioMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", LongType),
    StructField("n_bytes", LongType)))

  /** The audio-table shape every producer here emits. */
  val audioTableSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("audio", BinaryType),
    StructField("audio_meta", audioMetaSchema)))

  private def le32(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte
    out(off + 1) = ((v >>> 8) & 0xff).toByte
    out(off + 2) = ((v >>> 16) & 0xff).toByte
    out(off + 3) = ((v >>> 24) & 0xff).toByte
  }

  private def le16(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte
    out(off + 1) = ((v >>> 8) & 0xff).toByte
  }

  private def rdLe32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def rdLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** A valid RIFF/WAVE blob (PCM16 mono, [[SampleRate]]) carrying
    * `samples`. Canonical 44-byte header: RIFF size + WAVE + fmt(16) + data.
    */
  private[graft] def buildWav(samples: Array[Short], sampleRate: Int = SampleRate): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    le32(out, 4, 36 + dataLen)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    le32(out, 16, 16)          // fmt chunk size
    le16(out, 20, 1)           // PCM
    le16(out, 22, 1)           // mono
    le32(out, 24, sampleRate)
    le32(out, 28, sampleRate * 2) // byte rate (mono · 16-bit)
    le16(out, 32, 2)           // block align
    le16(out, 34, 16)          // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    le32(out, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      le16(out, 44 + 2 * i, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Fixture sample mapping: unsigned byte → centred PCM16. Stays within
    * Short range at both ends ((0−128)·256 = −32768, (255−128)·256 = 32512)
    * and MUST stay in sync with the SQL oracle twin `(ord(c) − 128) * 256`.
    */
  private[graft] def payloadSamples(payload: Array[Byte]): Array[Short] = {
    val s = new Array[Short](payload.length)
    var i = 0
    while (i < payload.length) {
      s(i) = (((payload(i) & 0xff) - 128) * 256).toShort
      i += 1
    }
    s
  }

  /** Real RIFF chunk walk. Returns (sampleRate, dataOffset, nSamples).
    * Strict on what matters (magic, PCM/mono/16-bit fmt, even data size,
    * chunks in bounds), tolerant of what real files contain (unknown
    * chunks in any order before `data`, odd-size pad bytes).
    */
  private[graft] def parseWavHeader(bytes: Array[Byte]): (Int, Int, Int) = {
    def fail(msg: String) = throw new IllegalArgumentException(s"not a PCM16 WAV: $msg")
    if (bytes.length < 12 || bytes(0) != 'R' || bytes(1) != 'I' ||
        bytes(2) != 'F' || bytes(3) != 'F') fail("bad RIFF magic")
    if (bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E')
      fail("bad WAVE magic")
    val riffEnd = {
      val declared = 8L + rdLe32(bytes, 4)
      if (declared > bytes.length) fail(s"RIFF size $declared exceeds blob ${bytes.length}")
      declared.toInt
    }
    var i = 12
    var sampleRate = -1
    var dataOff = -1
    var dataLen = -1
    while (i + 8 <= riffEnd && dataOff < 0) {
      val id = new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = rdLe32(bytes, i + 4)
      if (i + 8 + size > riffEnd) fail(s"chunk '$id' of $size bytes overruns RIFF")
      if (id == "fmt ") {
        if (size < 16) fail(s"fmt chunk too short ($size)")
        val fmt = rdLe16(bytes, i + 8)
        val ch = rdLe16(bytes, i + 10)
        val bits = rdLe16(bytes, i + 22)
        if (fmt != 1) fail(s"unsupported audio format $fmt (want PCM=1)")
        if (ch != 1) fail(s"unsupported channel count $ch (want mono)")
        if (bits != 16) fail(s"unsupported bit depth $bits (want 16)")
        sampleRate = rdLe32(bytes, i + 12).toInt
        if (sampleRate <= 0) fail(s"bad sample rate $sampleRate")
      } else if (id == "data") {
        if (sampleRate < 0) fail("data chunk before fmt")
        if (size % 2 != 0) fail(s"odd PCM16 data size $size")
        dataOff = i + 8
        dataLen = size.toInt
      }
      // RIFF pads odd-size chunks to even boundaries
      i += 8 + size.toInt + (size % 2).toInt
    }
    if (dataOff < 0) fail("no data chunk")
    (sampleRate, dataOff, dataLen / 2)
  }

  /** Decoded PCM16LE sample at index `k` of a parsed blob. */
  @inline private def sampleAt(bytes: Array[Byte], dataOff: Int, k: Int): Int =
    (rdLe16(bytes, dataOff + 2 * k).toShort).toInt

  /** Wrap a text corpus as an audio table: `(doc_id, audio binary,
    * audio_meta struct)` where `audio` is a REAL PCM16 WAV whose samples
    * carry the document bytes. Stands in for reading clips off storage;
    * rows stream through the partition iterator, nothing collects.
    */
  def synthAudioTable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(audioTableSchema)
    val projected = docs.select(col(idCol).cast("long"), col(textCol))
    val out: Dataset[Row] = projected.mapPartitions { it =>
      it.map { row =>
        val payload = row.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val blob = buildWav(payloadSamples(payload))
        Row(row.getLong(0), blob,
          Row("audio/wav", SampleRate, payload.length.toLong, blob.length.toLong))
      }
    }(enc)
    out
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", LongType),
    StructField("duration_ms", LongType),
    StructField("sum_sq", LongType),
    StructField("peak", IntegerType),
    StructField("zero_crossings", LongType)))

  /** Per-clip audio statistics from a real decode: sample count, floor-ms
    * duration, energy (Σ s², exact in Long: ≤ 2³⁰ per sample), peak |s|,
    * and zero crossings (sign flips across consecutive samples; a zero
    * sample crosses nothing). Integer-only so every engine agrees exactly.
    * Same streaming `mapPartitions` batch contract as the image face.
    */
  def extractFeatures(audio: DataFrame, idCol: String = "doc_id",
      blobCol: String = "audio"): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    val projected = audio.select(col(idCol).cast("long"), col(blobCol))
    val out: Dataset[Row] = projected.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](1)
        val (rate, off, n) = parseWavHeader(bytes)
        var sumSq = 0L
        var peak = 0
        var zc = 0L
        var prev = 0
        var k = 0
        while (k < n) {
          val s = sampleAt(bytes, off, k)
          sumSq += s.toLong * s
          val a = math.abs(s)
          if (a > peak) peak = a
          if (k > 0 && prev * s < 0) zc += 1
          prev = s
          k += 1
        }
        Row(row.getLong(0), rate, n.toLong, n.toLong * 1000 / rate, sumSq, peak, zc)
      }
    }(enc)
    out
  }

  /** Decimate every clip by an integer factor (keep samples 0, f, 2f, …)
    * and re-encode at `rate/f` — the cheap integer resampler. Emits the
    * same audio-table shape with refreshed metadata; [[extractFeatures]]
    * over the result re-parses the rebuilt blobs, proving the encode →
    * decode round trip on every row.
    */
  def resampleAudio(audio: DataFrame, factor: Int, idCol: String = "doc_id",
      blobCol: String = "audio"): DataFrame = {
    require(factor >= 1, s"resample factor must be >= 1, got $factor")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(audioTableSchema)
    val projected = audio.select(col(idCol).cast("long"), col(blobCol))
    val out: Dataset[Row] = projected.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](1)
        val (rate, off, n) = parseWavHeader(bytes)
        require(rate % factor == 0,
          s"factor $factor does not divide sample rate $rate")
        val n2 = (n + factor - 1) / factor
        val dec = new Array[Short](n2)
        var j = 0
        while (j < n2) {
          dec(j) = sampleAt(bytes, off, j * factor).toShort
          j += 1
        }
        val blob = buildWav(dec, rate / factor)
        Row(row.getLong(0), blob,
          Row("audio/wav", rate / factor, n2.toLong, blob.length.toLong))
      }
    }(enc)
    out
  }

  val fingerprintSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_samples", LongType),
    StructField("afp", LongType)))

  /** 64-bit audio fingerprint (energy-contour dHash): split the clip into
    * 65 equal windows `[⌊i·n/65⌋, ⌊(i+1)·n/65⌋)` and set bit `i` iff
    * `energy(i) > energy(i+1)` — the contour-of-loudness fingerprint whose
    * Hamming distance survives decimation and small edits, the audio
    * analog of [[Multimodal.perceptualHash]]. Integer-only (window Σ s²
    * fits Long: ≤ 2³⁰ per sample), so every engine agrees exactly; a clip
    * shorter than 65 samples has empty tail windows (energy 0) and an
    * empty clip hashes to 0.
    */
  def audioFingerprint(audio: DataFrame, idCol: String = "doc_id",
      blobCol: String = "audio"): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(fingerprintSchema)
    val projected = audio.select(col(idCol).cast("long"), col(blobCol))
    val out: Dataset[Row] = projected.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](1)
        val (_, off, n) = parseWavHeader(bytes)
        val e = contourEnergies(bytes, off, n)
        var hash = 0L
        var b = 0
        while (b < 64) {
          if (e(b) > e(b + 1)) hash |= 1L << b
          b += 1
        }
        Row(row.getLong(0), n.toLong, hash)
      }
    }(enc)
    out
  }

  /** The shared 65-window Σ s² energy contour of one PCM16 payload. */
  private def contourEnergies(bytes: Array[Byte], off: Int, n: Int): Array[Long] = {
    val e = new Array[Long](65)
    var w = 0
    while (w < 65) {
      var k = (w.toLong * n / 65).toInt
      val end = ((w + 1).toLong * n / 65).toInt
      var s2 = 0L
      while (k < end) {
        val s = sampleAt(bytes, off, k)
        s2 += s.toLong * s
        k += 1
      }
      e(w) = s2
      w += 1
    }
    e
  }

  /** Comparator lags of the wide contour fingerprint: word L's bit b is set
    * iff `e(b) > e((b + lag_L) mod 65)` over the shared 65-window contour —
    * four comparison distances turn the same contour into 256 reasonably
    * independent bits. Shared by audio and video ([[Video.videoFingerprintWide]]).
    */
  private[pipeline] val WideLags: Array[Int] = Array(1, 2, 4, 8)

  /** Total signature width of the wide contour fingerprints. */
  val WideFingerprintBits: Int = 64 * WideLags.length

  private[pipeline] def wideContourWords(e: Array[Long]): Array[Long] = {
    val words = new Array[Long](WideLags.length)
    var l = 0
    while (l < WideLags.length) {
      val lag = WideLags(l)
      var h = 0L
      var b = 0
      while (b < 64) {
        if (e(b) > e((b + lag) % 65)) h |= 1L << b
        b += 1
      }
      words(l) = h
      l += 1
    }
    words
  }

  val wideFingerprintSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_samples", LongType),
    StructField("afp", ArrayType(LongType, containsNull = false))))

  /** 256-bit wide audio fingerprint: the same 65-window energy contour as
    * [[audioFingerprint]], compared at lags 1/2/4/8 ([[WideLags]]) into four
    * 64-bit words (little-endian: `afp(0)` is the lag-1 word, identical to
    * the 64-bit `afp`). The width is what makes a SMALL absolute near-dup
    * radius meaningful: at radius 24 the pigeonhole splits into 25 chunks of
    * ~10 bits (a ≥ 2^10 join-key alphabet), where the 64-bit hash at the
    * same selectivity forced 4-bit chunks — the n²/16 candidate degeneracy
    * flagged at scale. In-place edits (re-encodes, sample substitutions)
    * move few windows and land within the radius; unrelated noise-like
    * clips concentrate at ~128 of 256 bits.
    */
  def audioFingerprintWide(audio: DataFrame, idCol: String = "doc_id",
      blobCol: String = "audio"): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(wideFingerprintSchema)
    val projected = audio.select(col(idCol).cast("long"), col(blobCol))
    val out: Dataset[Row] = projected.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](1)
        val (_, off, n) = parseWavHeader(bytes)
        val words = wideContourWords(contourEnergies(bytes, off, n))
        Row(row.getLong(0), n.toLong, words.toSeq)
      }
    }(enc)
    out
  }

  /** Audio near-dup pairs: Hamming ≤ maxDist over [[audioFingerprintWide]]
    * via [[Dedup.hammingNearDupsWide]]'s exact pigeonhole equi-join —
    * completing the per-modality dedup triad (text MinHash, image pHash,
    * audio energy contour); catches re-encoded/lightly-edited copies whose
    * bytes differ.
    *
    * Default radius 24 over 256 bits: measured on the fixture corpus,
    * in-place edited copies (a 10-sample block substitution) land at
    * 0–32 with median 10, while unrelated pairs bottom out at ~71 and
    * concentrate at 128 ± 9 — the radius sits in the empty valley. At this
    * radius the pigeonhole splits into 25 chunks of ~10 bits, a healthy
    * ≥ 2^10 join-key alphabet (the former 64-bit/radius-14 config forced
    * 4-bit chunks — an n²/16 candidate degeneracy at corpus scale).
    */
  def audioNearDups(audio: DataFrame, maxDist: Int = 24, idCol: String = "doc_id",
      blobCol: String = "audio"): DataFrame =
    Dedup.hammingNearDupsWide(
      audioFingerprintWide(audio, idCol, blobCol).select(col(idCol), col("afp")),
      idCol, "afp", totalBits = WideFingerprintBits, maxDist = maxDist)

  val chunkSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("chunk_idx", IntegerType),
    StructField("n_samples", LongType),
    StructField("sum_sq", LongType),
    StructField("peak", IntegerType)))

  /** Fixed-width energy profile: split each clip into `chunkSamples`-sample
    * windows and emit per-window energy/peak — the segmentation pass a
    * voice-activity or silence-trimming pipeline runs, and the audio analog
    * of [[Multimodal.sampleFrames]]. One output row per (clip, window),
    * streamed per partition; a zero-length clip emits no rows.
    */
  def chunkEnergy(audio: DataFrame, chunkSamples: Int, idCol: String = "doc_id",
      blobCol: String = "audio"): DataFrame = {
    require(chunkSamples >= 1, s"chunk width must be >= 1, got $chunkSamples")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(chunkSchema)
    val projected = audio.select(col(idCol).cast("long"), col(blobCol))
    val out: Dataset[Row] = projected.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](1)
        val (_, off, n) = parseWavHeader(bytes)
        val nChunks = (n + chunkSamples - 1) / chunkSamples
        (0 until nChunks).iterator.map { c =>
          val start = c * chunkSamples
          val end = math.min(start + chunkSamples, n)
          var sumSq = 0L
          var peak = 0
          var k = start
          while (k < end) {
            val s = sampleAt(bytes, off, k)
            sumSq += s.toLong * s
            val a = math.abs(s)
            if (a > peak) peak = a
            k += 1
          }
          Row(row.getLong(0), c, (end - start).toLong, sumSq, peak)
        }
      }
    }(enc)
    out
  }

  val cdcSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("chunk_idx", IntegerType),
    StructField("start", LongType),
    StructField("n_chunk_samples", LongType),
    StructField("chunk_hash", LongType)))

  private val CdcMod = 1000000007L

  /** Content-defined chunking (the LBFS/FastCDC storage-dedup technique)
    * over the decoded sample stream: a chunk boundary falls AFTER sample k
    * wherever the rolling hash of the last `window` sample high bytes is ≡
    * 0 mod 2^maskBits — so boundaries are functions of LOCAL CONTENT, and
    * a clip with bytes inserted at the front re-synchronizes after one
    * chunk where fixed-width chunking misaligns every block (spec-pinned).
    * Expected chunk length is 2^maskBits samples.
    *
    * The hash rolls over the sample HIGH byte (s >> 8, floor semantics —
    * identical to SQL integer `//` on negatives) + 128: amplitude
    * quantized to 8 bits, insensitive to low-order noise. Chunk identity
    * is the same fold over the chunk's bytes. Everything is exact integer
    * arithmetic — bit-reproducible cross-engine.
    */
  def cdcChunks(audio: DataFrame, window: Int = 4, maskBits: Int = 6,
      idCol: String = "doc_id", blobCol: String = "audio"): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(maskBits >= 1 && maskBits <= 20, s"maskBits must be in [1,20], got $maskBits")
    val mask = (1L << maskBits) - 1
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(cdcSchema)
    val projected = audio.select(col(idCol).cast("long"), col(blobCol))
    val out: Dataset[Row] = projected.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](1)
        val (_, off, n) = parseWavHeader(bytes)
        if (n == 0) Iterator.empty
        else {
          @inline def vb(k: Int): Long = (sampleAt(bytes, off, k) >> 8) + 128L
          // window hash ending at 0-based sample k (defined for k >= w-1)
          @inline def winHash(k: Int): Long = {
            var a = 0L
            var j = k - window + 1
            while (j <= k) { a = ((a * 31 + vb(j)) % CdcMod + CdcMod) % CdcMod; j += 1 }
            a
          }
          val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
          var k = window - 1
          while (k < n) {
            if ((winHash(k) & mask) == 0L) ends += (k + 1) // boundary AFTER k
            k += 1
          }
          if (ends.isEmpty || ends.last != n) ends += n
          var prev = 0
          ends.iterator.zipWithIndex.map { case (end, ci) =>
            var h = 0L
            var j = prev
            while (j < end) { h = ((h * 31 + vb(j)) % CdcMod + CdcMod) % CdcMod; j += 1 }
            val r = Row(row.getLong(0), ci, prev.toLong, (end - prev).toLong, h)
            prev = end
            r
          }
        }
      }
    }(enc)
    out
  }

  /** Sub-file near-duplicate pairs by shared content-defined chunks — the
    * archive/storage dedup face of the audio family: two clips sharing a
    * long passage share its chunks regardless of WHERE the passage sits
    * ([[audioFingerprintWide]]'s global contour needs whole-clip
    * similarity). Postings capped at `maxDf` (ubiquitous chunks carry no
    * pair signal), pairs counted over the chunk-hash inverted index —
    * the same scale shape as every LSH family here.
    */
  def audioCdcDups(audio: DataFrame, window: Int = 4, maskBits: Int = 6,
      minShared: Int = 4, maxDf: Int = 50,
      idCol: String = "doc_id", blobCol: String = "audio"): DataFrame = {
    require(minShared >= 1 && maxDf >= 2,
      s"need minShared >= 1, maxDf >= 2; got minShared=$minShared maxDf=$maxDf")
    val fps = cdcChunks(audio, window, maskBits, idCol, blobCol)
      .select(col("doc_id").as("id"), col("chunk_hash")).distinct()
    val keep = fps.groupBy("chunk_hash").agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxDf).select("chunk_hash")
    val indexed = fps.join(keep, "chunk_hash")
    indexed.select(col("chunk_hash"), col("id").as("id_a"))
      .join(indexed.select(col("chunk_hash"), col("id").as("id_b")), "chunk_hash")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
