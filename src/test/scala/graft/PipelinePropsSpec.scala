package graft

import org.apache.spark.sql.functions._

import graft.ops.Sessionize
import graft.pipeline.{Similarity, TextOps}

/** Generated-input invariants for the round-5 operators (seeded, so
  * deterministic): chunk reconstruction, session partition laws, and
  * quantization round-trip bounds — checked against from-scratch
  * references, not against the implementation's own building blocks.
  */
class PipelinePropsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812)

  private def randText(maxLen: Int): String = {
    val n = rnd.nextInt(maxLen + 1)
    Seq.fill(n)(rnd.nextPrintableChar()).mkString
  }

  test("chunk reconstruction: first chunk + tails-minus-overlap rebuild every text") {
    for ((size, overlap) <- Seq((8, 0), (8, 3), (5, 4), (64, 16), (3, 1))) {
      val texts = (1L to 40L).map(i => (i, randText(200)))
      val chunks = TextOps.chunk(texts.toDF("doc_id", "text"), size, overlap)
        .as[(Long, Int, Int, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._4).toSeq).toMap
      texts.foreach { case (id, text) =>
        val got = chunks.getOrElse(id, Seq.empty)
        val rebuilt = got match {
          case Seq() => ""
          case head +: tail => head + tail.map(_.drop(overlap)).mkString
        }
        assert(rebuilt == text, s"size=$size overlap=$overlap doc=$id")
        // chunk i covers [i*stride, min(i*stride + size, len)) — when
        // stride < size the last SEVERAL chunks can be end-clipped
        val stride = size - overlap
        got.zipWithIndex.foreach { case (c, i) =>
          assert(c.length == math.min(size, text.length - i * stride),
            s"size=$size overlap=$overlap doc=$id chunk=$i") }
      }
    }
  }

  test("session partition laws: events covered once, gaps legal, boundaries maximal") {
    for (trial <- 0 until 4) {
      val gap = 50L
      val events = (1L to 400L).map { i =>
        (i, rnd.nextInt(4).toLong, rnd.nextInt(2000).toLong * 7L)
      }
      val got = Sessionize.sessions(events.toDF("event_id", "user_id", "ts"), gapNs = gap)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

      events.groupBy(_._2).foreach { case (user, evs) =>
        val ts = evs.map(_._3).sorted
        val sess = got(user)
        // cover every event exactly once
        assert(sess.map(_._6).sum == evs.size)
        // reference segmentation: walk the sorted times, split where diff > gap
        val splits = scala.collection.mutable.ListBuffer(scala.collection.mutable.ListBuffer(ts.head))
        ts.tail.foreach { t =>
          if (t - splits.last.last > gap) splits += scala.collection.mutable.ListBuffer(t)
          else splits.last += t
        }
        assert(sess.size == splits.size, s"user=$user trial=$trial")
        sess.zip(splits).zipWithIndex.foreach { case ((s, ref), i) =>
          assert(s._2 == i + 1)              // 1-based ordinal in time order
          assert(s._3 == ref.head)           // start
          assert(s._4 == ref.last)           // end
          assert(s._5 == ref.last - ref.head) // duration
          assert(s._6 == ref.size.toLong)    // count
        }
      }
    }
  }

  test("quantization round-trip: |x - q*scale| <= scale/2 for random signed vectors") {
    val vecs = (1L to 60L).map { i =>
      (i, Array.fill(rnd.nextInt(20) + 1)((rnd.nextFloat() - 0.5f) * 4.0f))
    }
    val got = Similarity.quantizeInt8(vecs.toDF("vec_id", "embedding"))
      .as[(Long, Double, Seq[Int])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    vecs.foreach { case (id, v) =>
      val (scale, q) = got(id)
      assert(q.length == v.length)
      assert(q.forall(x => x >= -127 && x <= 127), s"vec $id out of int8 range")
      val maxAbs = v.map(x => math.abs(x.toDouble)).max
      assert(math.abs(scale - maxAbs / 127.0) < 1e-15)
      if (scale > 0)
        v.zip(q).foreach { case (x, qi) =>
          assert(math.abs(x.toDouble - qi * scale) <= scale / 2 + 1e-12,
            s"vec $id: x=$x q=$qi scale=$scale") }
    }
  }

  test("packing laws on random corpora: coverage, contiguity, full interior chunks") {
    for (trial <- 0 until 3) {
      val cap = Seq(3L, 17L, 256L)(trial)
      // sparse, shuffled-insertion ids; ~15% empty docs; token runs of a-z0-9
      val docs = rnd.shuffle((1L to 120L).toList).take(80).map { i =>
        val n = if (rnd.nextInt(7) == 0) 0 else rnd.nextInt(40)
        (i * 13 + rnd.nextInt(5), Seq.fill(n)("w" + rnd.nextInt(999)).mkString(" "))
      }.distinctBy(_._1)
      val lens = docs.map { case (id, t) =>
        id -> t.split("[^a-z0-9]+").count(_.nonEmpty).toLong }.toMap
      val got = graft.pipeline.Packing
        .packSequences(docs.toDF("doc_id", "text"), cap, shardWidth = 37)
        .as[(Long, Long, Long, Long, Long)].collect()
      // per-doc: spans contiguous from 0 to n_toks over consecutive chunks
      got.groupBy(_._1).foreach { case (id, spans) =>
        val s = spans.sortBy(_._3)
        assert(s.head._4 == 0L && s.last._5 == lens(id), s"cap=$cap doc=$id")
        s.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._5 == b._4, s"cap=$cap doc=$id span break")
            assert(a._3 + 1 == b._3, s"cap=$cap doc=$id chunk skip")
          case _ =>
        }
      }
      // empty docs emit nothing; non-empty all present
      assert(got.map(_._1).toSet == lens.filter(_._2 > 0).keySet)
      // global: every chunk but the last holds exactly cap tokens
      val fill = got.groupBy(_._3).view.mapValues(_.map(s => s._5 - s._4).sum)
      if (fill.nonEmpty) {
        val last = fill.keys.max
        fill.foreach { case (c, n) =>
          if (c < last) assert(n == cap, s"cap=$cap chunk=$c fill=$n") }
      }
    }
  }

  test("ewma matches a from-scratch weighted reference on random duplicate-ts series") {
    import graft.ts.SeriesOps
    val alpha = 0.5
    for (window <- Seq(1, 2, 16)) {
      val pts = (1 to 300).map { _ =>
        ("s" + rnd.nextInt(5), rnd.nextInt(40).toLong * 7L,
          math.rint(rnd.nextDouble() * 100) / 4.0)
      }.distinct
      val got = SeriesOps.ewma(pts.toDF("series_id", "ts", "value"), alpha, window)
        .as[(String, Long, Double, Double)].collect()
        .map(r => (r._1, r._2, r._3) -> r._4).toMap
      pts.groupBy(_._1).foreach { case (sid, rows) =>
        val ordered = rows.map(r => (r._2, r._3)).sorted
        ordered.zipWithIndex.foreach { case ((ts, v), i) =>
          val frame = ordered.slice(math.max(0, i - window + 1), i + 1).map(_._2)
          val num = frame.reverse.zipWithIndex
            .map { case (x, j) => x * math.pow(alpha, j) }.sum
          val den = (0 until frame.length).map(j => math.pow(alpha, j)).sum
          assert(math.abs(got((sid, ts, v)) - num / den) < 1e-9,
            s"w=$window series=$sid ts=$ts")
        }
      }
    }
  }

  test("ohlc equals a from-scratch candle reference under duplicate timestamps") {
    import graft.ts.SeriesOps
    val dt = 70L
    val pts = (1 to 400).map { _ =>
      ("s" + rnd.nextInt(4), rnd.nextInt(60).toLong * 7L,
        math.rint(rnd.nextDouble() * 1000) / 8.0)
    }
    val got = SeriesOps.ohlc(pts.toDF("series_id", "ts", "value"), dt)
      .as[(String, Long, Double, Double, Double, Double, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    val ref = pts.groupBy(p => (p._1, p._2 - p._2 % dt)).map { case (k, rows) =>
      val ord = rows.map(r => (r._2, r._3)).sorted
      k -> ((ord.head._2, rows.map(_._3).max, rows.map(_._3).min,
        ord.last._2, rows.size.toLong))
    }
    assert(got == ref)
  }

  test("winsorize laws: interior identity, exact interpolated bounds, flags") {
    import graft.ts.SeriesOps
    val pts = (1 to 500).map { i =>
      ("s" + rnd.nextInt(3), i.toLong * 11L, math.rint(rnd.nextDouble() * 900) / 16.0)
    }
    def quantile(sorted: IndexedSeq[Double], p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = pos.toInt
      if (lo == sorted.length - 1) sorted(lo)
      else sorted(lo) + (pos - lo) * (sorted(lo + 1) - sorted(lo))
    }
    val got = SeriesOps.winsorize(pts.toDF("series_id", "ts", "value"), 0.1, 0.9)
      .as[(String, Long, Double, Double, Boolean)].collect()
    assert(got.length == pts.length)
    val bySeries = pts.groupBy(_._1).view
      .mapValues(r => r.map(_._3).sorted.toIndexedSeq).toMap
    got.foreach { case (sid, _, v, w, clipped) =>
      val (qlo, qhi) = (quantile(bySeries(sid), 0.1), quantile(bySeries(sid), 0.9))
      assert(w == math.min(math.max(v, qlo), qhi), s"$sid $v")
      assert(clipped == (v < qlo || v > qhi), s"$sid $v")
    }
  }

  test("hammingNearDups == brute force on random signatures across widths") {
    import graft.pipeline.Dedup
    for ((bits, maxDist) <- Seq((30, 3), (64, 6), (64, 0), (16, 1))) {
      val mask = if (bits == 64) -1L else (1L << bits) - 1
      // cluster signatures around a few centers so pairs actually exist
      val centers = Array.fill(6)(rnd.nextLong() & mask)
      val sigs = (1L to 120L).map { i =>
        val c = centers(rnd.nextInt(centers.length))
        val flipped = (0 until rnd.nextInt(5)).foldLeft(c)((s, _) =>
          s ^ (1L << rnd.nextInt(bits)))
        (i, flipped & mask)
      }
      val brute = (for {
        (a, sa) <- sigs; (b, sb) <- sigs if a < b
        d = java.lang.Long.bitCount(sa ^ sb) if d <= maxDist
      } yield (a, b, d)).toSet
      val got = Dedup.hammingNearDups(sigs.toDF("id", "sig"), "id", "sig",
        bits, maxDist, allowNarrowChunks = true).as[(Long, Long, Int)].collect().toSet
      assert(got == brute, s"bits=$bits maxDist=$maxDist: " +
        s"${got.size} vs brute ${brute.size}")
    }
  }

  test("hammingNearDupsWide == brute force on random multi-word signatures") {
    import graft.pipeline.Dedup
    // 256-bit (4-word) signatures clustered around centers; radius 24 keeps
    // chunks ≥ 10 bits, and flips cross word boundaries by construction
    val centers = Array.fill(5)(Array.fill(4)(rnd.nextLong()))
    val sigs = (1L to 100L).map { i =>
      val c = centers(rnd.nextInt(centers.length)).clone()
      (0 until rnd.nextInt(30)).foreach { _ =>
        val bit = rnd.nextInt(256)
        c(bit / 64) ^= 1L << (bit % 64)
      }
      (i, c.toSeq)
    }
    def dist(a: Seq[Long], b: Seq[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      d = dist(sa, sb) if d <= 24
    } yield (a, b, d)).toSet
    assert(brute.nonEmpty, "clustered corpus must contain wide near-dups")
    val got = Dedup.hammingNearDupsWide(sigs.toDF("id", "sig"), "id", "sig",
      totalBits = 256, maxDist = 24).as[(Long, Long, Int)].collect().toSet
    assert(got == brute, s"${got.size} vs brute ${brute.size}")
  }

  test("theilSen equals a from-scratch median-of-slopes reference on random series") {
    // 25 series, 2-12 points each, duplicate timestamps and NaNs included
    val rows = (0 until 25).flatMap { s =>
      val n = 2 + rnd.nextInt(11)
      (0 until n).map { i =>
        val t = (i + (if (rnd.nextBoolean()) 0 else rnd.nextInt(3))).toLong * 1000000000L
        val v = if (rnd.nextInt(12) == 0) Double.NaN
        else rnd.nextDouble() * 100 - 50 + (if (rnd.nextInt(8) == 0) 1e4 else 0)
        (s"s$s", t, v)
      }
    }
    val df = rows.toDF("series_id", "ts", "value")
    def refMedian(xs: Seq[Double]): Double = {
      val sorted = xs.sorted
      val n = sorted.length
      (sorted((n + 1) / 2 - 1) + sorted(n / 2)) / 2
    }
    val ref = rows.filter(r => !r._3.isNaN)
      .groupBy(_._1).flatMap { case (sid, pts) =>
        val p = pts.map(r => (r._2 / 1e9, r._3)).toSeq
        val slopes = for {
          (a, i) <- p.zipWithIndex; (b, j) <- p.zipWithIndex
          if a._1 < b._1
        } yield (b._2 - a._2) / (b._1 - a._1)
        if (slopes.isEmpty) None
        else {
          val m = refMedian(slopes.toSeq)
          Some(sid -> (m, refMedian(p.map { case (t, y) => y - m * t })))
        }
      }.toMap
    val got = graft.ts.SeriesOps.theilSen(df)
      .select("series_id", "slope", "intercept")
      .as[(String, Double, Double)].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(got.keySet == ref.keySet,
      s"series sets differ: ${got.keySet.diff(ref.keySet)} / ${ref.keySet.diff(got.keySet)}")
    ref.foreach { case (sid, (m, b)) =>
      val (gm, gb) = got(sid)
      assert(math.abs(gm - m) < 1e-9, s"$sid slope: $gm vs $m")
      assert(math.abs(gb - b) < 1e-9, s"$sid intercept: $gb vs $b")
    }
  }

  test("weighted sampling: inclusion probability increases with weight (rank law)") {
    // deterministic rank check across many salts: a row with 8x the weight
    // of another must win their pairwise contest in most salted draws
    val rows = (1L to 100L).map(i => (i, if (i % 2 == 0) 8.0 else 1.0))
    val df = rows.toDF("id", "w")
    val wins = (0 until 20).map { s =>
      val picked = graft.pipeline.Sampling
        .weightedSample(df, "id", "w", n = 30, salt = s"trial$s")
        .as[(Long, Double)].collect()
      picked.count(_._2 == 8.0)
    }
    // heavy rows are half the population but should take the large
    // majority of every 30-row draw; sum over 20 salts pins the law
    assert(wins.sum > 20 * 20, s"heavy wins per draw: $wins")
    assert(wins.forall(_ >= 15), s"a draw under-sampled heavy rows: $wins")
  }
}
