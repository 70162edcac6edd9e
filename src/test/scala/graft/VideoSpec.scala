package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Multimodal, Video}

/** The video container is REAL: blobs are concatenated binary-P6 frames
  * (the ffmpeg image2pipe ppm-stream format), the walker parses every
  * frame header in sequence, and corrupt mid-stream frames are loud
  * failures.
  */
class VideoSpec extends SparkSpec {
  import spark.implicits._

  test("buildPpmStream concatenates complete P6 frames that walkFrames round-trips") {
    val payload = (0 until 500).map(i => ((i % 93) + 33).toByte).toArray // printable
    val blob = Video.buildPpmStream(payload, frameBytes = 192)
    var frames = List.empty[(Int, Int, Int)]
    val n = Video.walkFrames(blob) { (idx, w, h, _) => frames ::= ((idx, w, h)) }
    assert(n == 3, "500 bytes at 192/frame is 3 frames")
    frames = frames.reverse
    // frames 0-1 carry 192 bytes → 64 pixels → 8×8; frame 2 carries 116 → ceil
    assert(frames(0) == (0, 8, 8) && frames(1) == (1, 8, 8))
    val lastPix = (116 + 2) / 3
    val lw = math.ceil(math.sqrt(lastPix.toDouble)).toInt
    assert(frames(2) == (2, lw, math.ceil(lastPix.toDouble / lw).toInt))
  }

  test("empty payload is a legal zero-frame stream; corrupt frame raises") {
    assert(Video.buildPpmStream(Array.emptyByteArray).isEmpty)
    assert(Video.walkFrames(Array.emptyByteArray)((_, _, _, _) => ()) == 0)

    val good = Video.buildPpmStream((1 to 400).map(_.toByte).toArray)
    // corrupt the SECOND frame's magic: first frame is 192 bytes + header
    val secondFrameOff = {
      val (w, h, off) = Multimodal.parsePpmHeaderAt(good, 0)
      off + 3 * w * h
    }
    val bad = good.clone()
    bad(secondFrameOff) = 'X'.toByte
    val e = intercept[IllegalArgumentException](
      Video.walkFrames(bad)((_, _, _, _) => ()))
    assert(e.getMessage.contains("P6"))
    // truncated final frame raises too
    val trunc = good.dropRight(5)
    intercept[IllegalArgumentException](Video.walkFrames(trunc)((_, _, _, _) => ()))
  }

  test("frameStats decodes per-frame geometry and byte statistics exactly") {
    val payload = (0 until 300).map(i => (40 + (i % 50)).toByte).toArray
    val docs = Seq((9L, new String(payload.map(_.toChar)))).toDF("doc_id", "text")
    val rows = Video.frameStats(Video.synthVideoTable(docs)).collect()
      .map(r => (r.getInt(1), r.getLong(4), r.getInt(5))).sortBy(_._1)
    assert(rows.length == 2)
    val (s0, m0) = (payload.take(192).map(_ & 0xff).map(_.toLong).sum,
      payload.take(192).map(_ & 0xff).max)
    val (s1, m1) = (payload.drop(192).map(_ & 0xff).map(_.toLong).sum,
      payload.drop(192).map(_ & 0xff).max)
    assert(rows(0) == (0, s0, m0) && rows(1) == (1, s1, m1))
  }

  test("keyframes emits frame 0 plus frames whose sum delta exceeds the threshold") {
    // three constant frames with a spike in the middle: sums 192·50, 192·120, 192·50
    val payload = Array.fill(192)(50.toByte) ++ Array.fill(192)(120.toByte) ++
      Array.fill(192)(50.toByte)
    val docs = Seq((1L, new String(payload.map(_.toChar)))).toDF("doc_id", "text")
    val table = Video.synthVideoTable(docs)
    val rows = Video.keyframes(table, threshold = 5000L).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    // deltas: f0 = 9600 (own sum), f1 = |23040−9600| = 13440, f2 = 13440
    assert(rows.toSeq == Seq((0, 192L * 50, 192L * 50),
      (1, 192L * 120, 192L * 70), (2, 192L * 50, 192L * 70)))
    // a high threshold keeps only frame 0
    val only0 = Video.keyframes(table, threshold = 20000L).collect()
    assert(only0.map(_.getInt(1)).toSeq == Seq(0))
  }

  test("video queries run end-to-end on sf0.001; frame counts match metadata") {
    val dir = "/root/testdata/sf0.001"
    val table = Video.synthVideoTable(spark.read.parquet(s"$dir/documents.parquet"))
    val fromMeta = table.select(sum(col("video_meta.n_frames"))).as[Long].head()
    val walked = SparkEntry.queries("video_frames")(spark, dir).count()
    assert(walked == fromMeta && walked > 0)
    val kf = SparkEntry.queries("video_keyframes")(spark, dir)
    val n = kf.count()
    assert(n > 0 && n < walked, "keyframes must select a strict subset")
  }
}
