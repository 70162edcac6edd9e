package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Multimodal

/** The multimodal codec is REAL: blobs are valid binary PPM (P6) images,
  * the decoder is an actual header + raster parser (magic, comments,
  * dimension validation), and decoded features round-trip the source bytes.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("buildPpm produces a valid P6 that decodePpm round-trips") {
    val payload = "hello pixel world".getBytes("UTF-8")
    val blob = Multimodal.buildPpm(payload)
    assert(blob(0) == 'P' && blob(1) == '6')
    val (w, h, sum, mx) = Multimodal.decodePpm(blob)
    assert(w * h * 3 >= payload.length, "frame must carry every byte")
    assert(sum == payload.map(_ & 0xff).map(_.toLong).sum, "zero padding must not change the sum")
    assert(mx == payload.map(_ & 0xff).max)
  }

  test("decodePpm accepts comments and rejects malformed blobs") {
    val withComment = "P6\n# a comment\n2 1\n255\n".getBytes("US-ASCII") ++ Array.fill(6)(7.toByte)
    val (w, h, sum, _) = Multimodal.decodePpm(withComment)
    assert(w == 2 && h == 1 && sum == 42)

    def rejects(bytes: Array[Byte], hint: String): Unit = {
      val e = intercept[IllegalArgumentException](Multimodal.decodePpm(bytes))
      assert(e.getMessage.contains("P6"), s"$hint: ${e.getMessage}")
    }
    rejects("P5\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](1), "wrong magic")
    rejects("P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array.fill(5)(1.toByte), "short raster")
    rejects("P6\n1 1\n15\n".getBytes("US-ASCII") ++ Array.fill(3)(1.toByte), "wrong maxval")
  }

  test("empty documents become 0x0 frames that still decode") {
    val blob = Multimodal.buildPpm(Array.emptyByteArray)
    val (w, h, sum, mx) = Multimodal.decodePpm(blob)
    assert(w == 0 && h == 0 && sum == 0L && mx == 0)
  }

  test("resize is exact nearest-neighbor: factor 1 is identity, factor f samples strides") {
    val payload = (0 until 300).map(i => (i % 251).toByte).toArray
    val blob = Multimodal.buildPpm(payload)
    // factor 1: identical raster
    assert(Multimodal.resizePpm(blob, 1).toSeq == blob.toSeq)
    // factor 2: output (x', y') must equal input (2x', 2y') channel-exact
    val (w, h, off) = Multimodal.parsePpmHeader(blob)
    val small = Multimodal.resizePpm(blob, 2)
    val (w2, h2, off2) = Multimodal.parsePpmHeader(small)
    assert(w2 == (w + 1) / 2 && h2 == (h + 1) / 2)
    for (y <- 0 until h2; x <- 0 until w2; c <- 0 until 3) {
      val got = small(off2 + 3 * (y * w2 + x) + c)
      val want = blob(off + 3 * ((y * 2) * w + x * 2) + c)
      assert(got == want, s"pixel ($x,$y) channel $c")
    }
  }

  test("frame sampling emits every stride-th raster row with exact stats") {
    val docs = Seq((9L, "the quick brown fox jumps over the lazy dog " * 8))
      .toDF("doc_id", "text")
    val media = Multimodal.synthMediaTable(docs)
    val blob = media.collect()(0).getAs[Array[Byte]]("media")
    val (w, h, off) = Multimodal.parsePpmHeader(blob)
    val frames = Multimodal.sampleFrames(media, stride = 3).collect()
      .map(r => (r.getAs[Int]("frame_idx"), r.getAs[Long]("frame_sum"), r.getAs[Int]("frame_max")))
      .sortBy(_._1)
    assert(frames.map(_._1).toSeq == (0 until h by 3).toSeq)
    frames.foreach { case (y, s, mx) =>
      val row = (0 until 3 * w).map(i => blob(off + 3 * y * w + i) & 0xff)
      assert(s == row.map(_.toLong).sum && mx == row.max, s"row $y stats")
    }
  }

  test("table-level features equal a direct recomputation from the text") {
    val docs = Seq((1L, "alpha beta"), (2L, ""), (3L, "x" * 100))
      .toDF("doc_id", "text")
    val media = Multimodal.synthMediaTable(docs)
    // metadata matches the blob it describes
    media.collect().foreach { r =>
      val blob = r.getAs[Array[Byte]]("media")
      val meta = r.getStruct(2)
      val (w, h, _, _) = Multimodal.decodePpm(blob)
      assert(meta.getAs[String]("format") == "image/x-portable-pixmap")
      assert(meta.getAs[Int]("width") == w && meta.getAs[Int]("height") == h)
      assert(meta.getAs[Long]("n_bytes") == blob.length.toLong)
    }
    val feats = Multimodal.extractFeatures(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    Seq((1L, "alpha beta"), (2L, ""), (3L, "x" * 100)).foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val f = feats(id)
      assert(f.getAs[Long]("pixel_sum") == bytes.map(_ & 0xff).map(_.toLong).sum)
      val (w, h) = (f.getAs[Int]("width"), f.getAs[Int]("height"))
      assert(w.toLong * h * 3 >= bytes.length)
      assert(f.getAs[Long]("n_pixel_bytes") == w.toLong * h * 3)
    }
  }

  test("perceptualHash: identity under no-op resize, dup detection, empty frame") {
    val texts = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"), // dup of 1
      (3L, "a completely different document with other words inside it entirely"),
      (4L, "")) // empty -> 0x0 frame -> phash 0
    val media = Multimodal.synthMediaTable(texts.toDF("doc_id", "text"))
    val ph = Multimodal.perceptualHash(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phash")).toMap
    assert(ph(1L) == ph(2L), "identical payloads must hash identically")
    assert(ph(1L) != ph(3L), "different payloads must differ")
    assert(ph(4L) == 0L, "empty frame hashes to 0")
    // a factor-1 resize rebuilds the identical blob -> identical hash
    val ph1 = Multimodal.perceptualHash(Multimodal.resizeMedia(media, factor = 1))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phash")).toMap
    assert(ph1 == ph)
  }

  test("phashNearDups pigeonhole equals brute force over the wide grid hash") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val media = Multimodal.synthMediaTable(docs)
    val hashes = Multimodal.perceptualHashWide(media).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[scala.collection.Seq[Long]]("phw").toArray))
    // the word space must actually exercise bit 63, or the shift/mask edge
    // this test exists for goes uncovered
    assert(hashes.exists(_._2.exists(_ < 0)), "fixture must produce a bit-63 word")
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = ha.zip(hb).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      if d <= 24
    } yield (a, b, d)).toSet
    assert(brute.nonEmpty, "fixture corpus must contain image near-dups")
    val got = Multimodal.phashNearDups(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("hamming"))).toSet
    assert(got == brute, s"pigeonhole ${got.size} pairs vs brute ${brute.size}")
  }

  test("perceptualHashWide: dup texts share all words; empty frame is all-zero") {
    val texts = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "a completely different document with other words inside it entirely"),
      (4L, ""))
    val media = Multimodal.synthMediaTable(texts.toDF("doc_id", "text"))
    val ph = Multimodal.perceptualHashWide(media).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[Long]]("phw").toSeq).toMap
    assert(ph(1L) == ph(2L), "identical payloads must hash identically")
    assert(ph(1L) != ph(3L), "different payloads must differ")
    assert(ph(4L) == Seq(0L, 0L, 0L, 0L), "empty frame hashes to all-zero words")
    assert(ph(1L).size == 4)
  }
}
