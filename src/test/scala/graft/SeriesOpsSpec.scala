package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.ts.SeriesOps
import graft.ts.model.{AverageValue, InstantValue, Period}

/** Per-series operator semantics: dt-mode tie-break, axis extension,
  * interpretation-aware step expansion, chunk concat, tail limit.
  */
class SeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private val S = Period.Second

  private def pts(rows: (Long, Double)*): DataFrame =
    rows.map { case (t, v) => ("s", t * S, v) }.toDF("series_id", "ts", "value")

  test("dtMode: most frequent delta wins; ties break to the SMALLEST delta") {
    // deltas: 1,1,2,2 — tie between 1 and 2 → deterministic smallest = 1
    val df = pts(0L -> 0.0, 1L -> 1.0, 2L -> 2.0, 4L -> 3.0, 6L -> 4.0)
    val got = SeriesOps.dtMode(df).collect()(0)
    assert(got.getAs[Long]("dt_mode_ns") == 1 * S)
  }

  test("extendAxis: every point's valid_to is the next ts; last gets ts + dtMode") {
    val df = pts(0L -> 1.0, 1L -> 2.0, 2L -> 3.0, 4L -> 4.0)
    val got = SeriesOps.extendAxis(df).collect()
      .map(r => (r.getAs[Long]("ts") / S, r.getAs[Long]("valid_to") / S)).sortBy(_._1)
    // dt deltas 1,1,2 → mode 1 s; last point 4 closes at 5
    assert(got.toSeq == Seq(0L -> 1L, 1L -> 2L, 2L -> 4L, 4L -> 5L))
  }

  test("stepExpand: instant passes through; average duplicates values at both boundaries") {
    val df = pts(0L -> 1.0, 1L -> 2.0, 2L -> 3.0)
    assert(SeriesOps.stepExpand(df, InstantValue).count() == 3)
    val avg = SeriesOps.stepExpand(df, AverageValue).collect()
      .map(r => (r.getAs[Long]("ts") / S, r.getAs[Double]("value"))).sorted
    // staircase: v1 at [0,1], v2 at [1,2], v3 at 2 → 2n-1 rows
    assert(avg.toSeq == Seq(0L -> 1.0, 1L -> 1.0, 1L -> 2.0, 2L -> 2.0, 2L -> 3.0))
  }

  test("concatChunks: later chunk wins on timestamp collision") {
    val first = pts(0L -> 1.0, 1L -> 2.0)
    val second = pts(1L -> 20.0, 2L -> 30.0)
    val got = SeriesOps.concatChunks(first, second).collect()
      .map(r => (r.getAs[Long]("ts") / S, r.getAs[Double]("value"))).sortBy(_._1)
    assert(got.toSeq == Seq(0L -> 1.0, 1L -> 20.0, 2L -> 30.0))
  }

  test("lastValue ignores NaN and takes the newest point") {
    val df = pts(0L -> 5.0, 1L -> 7.0, 2L -> Double.NaN)
    val got = SeriesOps.lastValue(df).collect()(0)
    assert(got.getAs[Double]("last_value") == 7.0)
    assert(got.getAs[Long]("last_ts") == 1 * S)
  }

  test("minMaxCount + rangePad are NaN-safe") {
    val df = pts(0L -> 2.0, 1L -> Double.NaN, 2L -> 10.0)
    val mm = SeriesOps.minMaxCount(df).collect()(0)
    assert(mm.getAs[Double]("min_value") == 2.0)
    assert(mm.getAs[Double]("max_value") == 10.0)
    assert(mm.getAs[Long]("n_points") == 2L)
    val rp = SeriesOps.rangePad(df).collect()(0)
    // pad = 0.2 * 8 = 1.6 → floor(2-1.6)=0, ceil(10+1.6)=12
    assert(rp.getAs[Double]("range_lower") == 0.0)
    assert(rp.getAs[Double]("range_upper") == 12.0)
  }

  test("tailLimit keeps the newest n points per series") {
    val df = pts((0L to 9L).map(t => t -> t.toDouble): _*)
    val got = SeriesOps.tailLimit(df, 3).collect().map(_.getAs[Long]("ts") / S).sorted
    assert(got.toSeq == Seq(7L, 8L, 9L))
  }

  test("thresholdBands: first descending threshold exceeded wins; NaN -> default") {
    val df = Seq(1200.0, 700.0, 300.0, Double.NaN).zipWithIndex
      .map { case (v, i) => (s"s$i", 0L, v) }.toDF("series_id", "ts", "value")
    val got = SeriesOps.thresholdBands(df, "value",
      Seq(600.0 -> "yellow", 1000.0 -> "red"), "green") // order-insensitive input
      .collect().map(r => r.getString(0) -> r.getAs[String]("band")).toMap
    assert(got == Map("s0" -> "red", "s1" -> "yellow", "s2" -> "green", "s3" -> "green"))
  }

  test("periodFilter is half-open [start, end)") {
    val df = pts(0L -> 0.0, 1L -> 1.0, 2L -> 2.0, 3L -> 3.0)
    val got = SeriesOps.periodFilter(df, Period.ofSeconds(1, 3))
      .collect().map(_.getAs[Long]("ts") / S).sorted
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("resample: NaN-safe per-bucket mean/min/max/count on the dt grid") {
    // dt = 10 s; buckets 0 (ts 0,3,7), 10 (ts 12 NaN only), 20 (ts 25)
    val df = pts(0L -> 2.0, 3L -> 4.0, 7L -> 6.0, 12L -> Double.NaN, 25L -> 9.0)
    val got = SeriesOps.resample(df, 10 * S).collect()
      .map(r => (r.getAs[Long]("bucket_ts") / S,
        Option(r.getAs[Any]("mean_value")), r.getAs[Long]("n_points")))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, Some(4.0), 3L), (10L, None, 0L), (20L, Some(9.0), 1L)))
    val b0 = SeriesOps.resample(df, 10 * S).where($"bucket_ts" === 0L).collect()(0)
    assert(b0.getAs[Double]("min_value") == 2.0)
    assert(b0.getAs[Double]("max_value") == 6.0)
  }

  test("interpolate: exact on samples, linear between, no extrapolation") {
    // samples at 5 s -> 10.0, 20 s -> 40.0, 30 s -> 0.0; grid dt = 10 s
    // span [5, 30] ⊃ grid {10, 20, 30}
    val df = pts(5L -> 10.0, 20L -> 40.0, 30L -> 0.0)
    val got = SeriesOps.interpolate(df, 10 * S).collect()
      .map(r => (r.getAs[Long]("ts") / S, r.getAs[Double]("value"))).sortBy(_._1)
    // g=10: 10 + (40-10)*(10-5)/(20-5) = 20; g=20 on-sample; g=30 on-sample
    assert(got.toSeq == Seq(10L -> 20.0, 20L -> 40.0, 30L -> 0.0))
  }

  test("rolling: trailing time window is inclusive and NaN-safe") {
    // window 10 s; point at 15 sees ts in [5, 15] → values at 5 (NaN
    // excluded from stats), 10, 15
    val df = pts(0L -> 1.0, 5L -> Double.NaN, 10L -> 3.0, 15L -> 5.0)
    val got = SeriesOps.rolling(df, 10 * S).collect()
      .map(r => (r.getAs[Long]("ts") / S,
        Option(r.getAs[Any]("roll_mean")), r.getAs[Long]("roll_n")))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, Some(1.0), 1L),   // [−10, 0]: just itself
      (5L, Some(1.0), 1L),   // [−5, 5]: 1.0 and the NaN (excluded)
      (10L, Some(2.0), 2L),  // [0, 10]: 1.0, NaN, 3.0 → mean 2
      (15L, Some(4.0), 2L))) // [5, 15]: NaN, 3.0, 5.0 → mean 4
  }

  test("anomaly: z-scores against own-series moments; degenerate series never divide by zero") {
    // series s: values 0,0,0,0,10 → mean 2, sample std sqrt((4·4+64)/4)=sqrt(20)
    val df = pts(0L -> 0.0, 1L -> 0.0, 2L -> 0.0, 3L -> 0.0, 4L -> 10.0)
    val got = SeriesOps.anomaly(df, z = 1.5).collect()
      .map(r => (r.getAs[Long]("ts") / S, r.getAs[Double]("z_score"),
        r.getAs[Boolean]("is_anomaly"))).sortBy(_._1)
    val sd = math.sqrt(20.0)
    got.foreach { case (t, zv, flag) =>
      val expected = if (t == 4L) 8.0 / sd else -2.0 / sd
      assert(math.abs(zv - expected) < 1e-12, s"t=$t")
      assert(flag == (t == 4L), s"t=$t")
    }
    // constant series: std 0 → null z, flag false (not a crash, not true)
    val const = SeriesOps.anomaly(pts(0L -> 5.0, 1L -> 5.0)).collect()
    assert(const.forall(r => r.isNullAt(r.fieldIndex("z_score"))
      && !r.getAs[Boolean]("is_anomaly")))
    // NaN samples are dropped entirely, not scored
    assert(SeriesOps.anomaly(pts(0L -> 1.0, 1L -> Double.NaN, 2L -> 3.0)).count() == 2)
  }

  test("pairCorrelation: exact ±1 on linear pairs, null on zero variance, canonical order") {
    val rows = Seq.tabulate(4) { i =>
      Seq(("a", i.toLong * 10 * S, i.toDouble),       // x
        ("b", i.toLong * 10 * S, 2.0 * i + 7),        // perfectly +corr with a
        ("c", i.toLong * 10 * S, -3.0 * i),           // perfectly −corr with a
        ("d", i.toLong * 10 * S, 42.0))               // constant → null corr
    }.flatten.toDF("series_id", "ts", "value")
    val got = SeriesOps.pairCorrelation(rows, 10 * S).collect()
      .map(r => ((r.getAs[String]("series_a"), r.getAs[String]("series_b")),
        (r.getAs[Long]("n_buckets"), Option(r.getAs[Any]("corr"))))).toMap
    assert(got.keySet == Set(("a","b"), ("a","c"), ("a","d"), ("b","c"), ("b","d"), ("c","d")))
    assert(got(("a","b"))._1 == 4L)
    assert(math.abs(got(("a","b"))._2.get.asInstanceOf[Double] - 1.0) < 1e-12)
    assert(math.abs(got(("a","c"))._2.get.asInstanceOf[Double] + 1.0) < 1e-12)
    assert(math.abs(got(("b","c"))._2.get.asInstanceOf[Double] + 1.0) < 1e-12)
    assert(got(("a","d"))._2.isEmpty && got(("b","d"))._2.isEmpty && got(("c","d"))._2.isEmpty)
  }

  test("crossCorrelation: lag-0 slice equals pairCorrelation; a shifted copy peaks at its lag") {
    // b_t = a_{t-2 buckets}: corr(a_t, b_{t+lag}) is exactly 1 at lag = 2
    val vals = Seq(1.0, 4.0, 2.0, 8.0, 5.0, 9.0, 3.0, 7.0, 6.0, 0.0)
    val rows = (vals.zipWithIndex.map { case (v, i) => ("a", i.toLong * 10 * S, v) }
      ++ vals.zipWithIndex.map { case (v, i) => ("b", (i + 2).toLong * 10 * S, v) })
      .toDF("series_id", "ts", "value")
    val got = SeriesOps.crossCorrelation(rows, 10 * S, maxLag = 3).collect()
      .map(r => r.getAs[Int]("lag") ->
        ((r.getAs[Long]("n_buckets"), Option(r.getAs[Any]("corr"))))).toMap
    assert(got.keySet == (-3 to 3).toSet, s"got ${got.keySet}")
    assert(math.abs(got(2)._2.get.asInstanceOf[Double] - 1.0) < 1e-12,
      "the planted shift must read corr 1 at lag 2")
    assert(got(2)._1 == 10L, "all 10 shifted buckets align at lag 2")
    assert((-3 to 3).filter(_ != 2).forall(l =>
      got(l)._2.forall(c => math.abs(c.asInstanceOf[Double]) < 0.999)),
      "no other lag may read a perfect correlation")
    // lag-0 slice == pairCorrelation on the same frame
    val lag0 = got(0)
    val pc = SeriesOps.pairCorrelation(rows, 10 * S).collect().head
    assert(pc.getAs[Long]("n_buckets") == lag0._1)
    assert(pc.getAs[Double]("corr") == lag0._2.get.asInstanceOf[Double])
  }

  test("dtw: driver DP parity; a time-shifted copy warps to ~0 where Pearson-style alignment can't; maxPoints refuses") {
    def bruteDtw(a: Seq[Double], b: Seq[Double]): Double = {
      val big = 1e150
      var prev = 0.0 +: Seq.fill(b.size)(big)
      for (x <- a) {
        var nr = Vector(big)
        for (j <- b.indices)
          nr = nr :+ (math.abs(x - b(j)) +
            math.min(prev(j + 1), math.min(nr(j), prev(j))))
        prev = nr
      }
      prev(b.size)
    }
    // b is a 2-bucket-shifted copy of a (same values, different axis):
    // DTW warps the overlap and only pays the truncated edges
    val vals = Seq(1.0, 4.0, 2.0, 8.0, 5.0, 9.0, 3.0, 7.0, 6.0, 0.0)
    val rows = (vals.zipWithIndex.map { case (v, i) => ("a", i.toLong * 10 * S, v) }
      ++ vals.zipWithIndex.map { case (v, i) => ("b", (i + 2).toLong * 10 * S, v) }
      ++ Seq(("c", 0L, 100.0), ("c", 10 * S, 200.0)))
      .toDF("series_id", "ts", "value")
    val got = SeriesOps.dtw(rows, 10 * S).collect()
      .map(r => ((r.getAs[String]("series_a"), r.getAs[String]("series_b"))) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Double]("dtw_dist"), r.getAs[Double]("dtw_per_step")))).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    val ab = got(("a", "b"))
    assert(ab._1 == 10L && ab._2 == 10L)
    // exact driver parity on every pair (same fold order -> same doubles)
    assert(ab._3 == bruteDtw(vals, vals), s"ab ${ab._3}")
    assert(got(("a", "c"))._3 ==
      bruteDtw(vals, Seq(100.0, 200.0)), s"ac ${got(("a", "c"))._3}")
    // the shifted copy's warped distance collapses to the repeated-edge
    // cost only — far below the unwarped lag-0 disagreement
    val lag0 = vals.zip(vals.drop(2) ++ Seq(0.0, 0.0))
      .map { case (x, y) => math.abs(x - y) }.sum
    assert(ab._3 < lag0 / 2, s"warped ${ab._3} vs unwarped-ish $lag0")
    assert(ab._4 == ab._3 / 20.0)
    intercept[Exception] {
      SeriesOps.dtw(rows, 10 * S, maxPoints = 5).collect()
    }
    // the OTHER quadratic axis: series count above maxSeries fails fast…
    val ex = intercept[Exception] {
      SeriesOps.dtw(rows, 10 * S, maxSeries = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => String.valueOf(e.getMessage) +: msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("maxSeries")), s"got: ${msgs(ex)}")
    // …and exactly at the bound it still runs
    assert(SeriesOps.dtw(rows, 10 * S, maxSeries = 3).count() == 3L)
  }

  test("periodogram: planted sinusoid spikes at its harmonic; driver DFT parity") {
    // 60 daily buckets of sin(2π·4t/60): ALL spectral power sits at j=4
    val n = 60
    val rows = (0 until n).map { t =>
      ("wave", t.toLong * 10 * S, math.sin(2 * math.Pi * 4 * t / n) * 3 + 5)
    }.toDF("series_id", "ts", "value")
    val got = SeriesOps.periodogram(rows, 10 * S, maxFreq = 5).collect()
      .map(r => r.getAs[Int]("freq") ->
        ((r.getAs[Long]("n_points"), r.getAs[Double]("power")))).toMap
    assert(got.keySet == (1 to 5).toSet)
    assert(got.values.forall(_._1 == n.toLong))
    // exact driver replay of the fold (same order, same arithmetic)
    val vs = rows.collect().sortBy(_.getLong(1)).map(_.getDouble(2))
    val mu = vs.foldLeft(0.0)(_ + _) / n
    def power(j: Int): Double = {
      def f(trig: Double => Double) = vs.zipWithIndex.foldLeft(0.0) {
        case (a, (x, i)) => a + (x - mu) * trig(2 * math.Pi * j * i / n)
      }
      val (sc, ss) = (f(math.cos), f(math.sin))
      sc * sc + ss * ss
    }
    (1 to 5).foreach { j =>
      assert(math.abs(got(j)._2 - power(j)) < 1e-6, s"freq $j") }
    // the planted harmonic dominates every other bin by orders of magnitude
    assert((1 to 5).filter(_ != 4).forall(j => got(4)._2 > 1000 * got(j)._2),
      s"spectrum ${got.view.mapValues(_._2).toMap}")
  }

  test("mannKendall: brute S/var/z parity, monotone and constant edges, tie correction") {
    def brute(vals: Seq[Double]): (Long, Double, Double) = {
      val n = vals.length
      var s = 0L
      for (i <- 0 until n; j <- i + 1 until n)
        s += math.signum(vals(j) - vals(i)).toLong
      val tie = vals.groupBy(identity).values.map(_.length.toLong)
        .filter(_ > 1).map(t => t * (t - 1) * (t * 2 + 5)).sum
      val v = (n.toLong * (n - 1) * (n.toLong * 2 + 5) - tie).toDouble / 18.0
      val z = if (s > 0) (s - 1).toDouble / math.sqrt(v)
        else if (s < 0) (s + 1).toDouble / math.sqrt(v) else 0.0
      (s, v, z)
    }
    val rnd = new scala.util.Random(5)
    val series = Map(
      "up" -> (0 until 30).map(_.toDouble * 2 + 1),
      "down" -> (0 until 30).map(i => 100.0 - 3 * i),
      "const" -> Seq.fill(20)(7.0),
      "tied" -> (0 until 40).map(_ => rnd.nextInt(4).toDouble),
      "noise" -> (0 until 40).map(_ => rnd.nextDouble() * 10))
    val rows = series.toSeq.flatMap { case (id, vs) =>
      vs.zipWithIndex.map { case (v, i) => (id, i.toLong * S, v) }
    }.toDF("series_id", "ts", "value")
    val got = SeriesOps.mannKendall(rows).collect()
      .map(r => r.getAs[String]("series_id") ->
        ((r.getAs[Long]("n_points"), r.getAs[Long]("s_stat"),
          r.getAs[Double]("var_s"), r.getAs[Double]("z"),
          r.getAs[String]("trend")))).toMap
    series.foreach { case (id, vs) =>
      val (s, v, z) = brute(vs)
      val g = got(id)
      assert(g._1 == vs.length.toLong && g._2 == s, s"$id S")
      assert(g._3 == v, s"$id var")
      assert(math.abs(g._4 - z) < 1e-12, s"$id z")
    }
    assert(got("up")._2 == 30L * 29 / 2 && got("up")._5 == "increasing")
    assert(got("down")._5 == "decreasing")
    // all-tied series: S = 0 AND the tie correction zeroes the variance
    assert(got("const")._2 == 0L && got("const")._3 == 0.0
      && got("const")._4 == 0.0 && got("const")._5 == "none")
  }

  test("pairCorrelation: only shared resample buckets enter the sums") {
    // a has buckets {0,10,20,30}, b only {10,20}: n_buckets must be 2 and
    // the correlation computed over the shared buckets alone
    val rows = (Seq.tabulate(4)(i => ("a", i.toLong * 10 * S, i.toDouble))
      ++ Seq(("b", 10 * S, 5.0), ("b", 20 * S, 9.0))).toDF("series_id", "ts", "value")
    val got = SeriesOps.pairCorrelation(rows, 10 * S).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("n_buckets") == 2L)
    assert(math.abs(got(0).getAs[Double]("corr") - 1.0) < 1e-12)
  }

  test("outliersMad: catches the spike a corrupted sigma hides; zero MAD falls back") {
    // spread base values 8..12 plus a spike at 1000 (n=6): the spike
    // inflates sample σ to ~404, so its own z = (1000-175)/404 ≈ 2.04 and
    // anomaly(z=3) misses it — while median 10.5, MAD 1.5 give a modified
    // z of 0.6745·989.5/1.5 ≈ 445
    val spread = Seq(8.0, 9.0, 10.0, 11.0, 12.0, 1000.0).zipWithIndex
      .map { case (v, i) => ("t", i.toLong * S, v) }
      .toDF("series_id", "ts", "value")
    assert(SeriesOps.anomaly(spread, 3.0).where(col("is_anomaly")).count() == 0)
    val got = SeriesOps.outliersMad(spread, 3.5).collect()
    val spike = got.find(_.getAs[Double]("value") == 1000.0).get
    assert(math.abs(spike.getAs[Double]("mad_score")
      - 0.6745 * (1000.0 - 10.5) / 1.5) < 1e-9)
    assert(got.filter(_.getAs[Boolean]("is_outlier"))
      .map(_.getAs[Double]("value")).toSeq == Seq(1000.0))
    // over half the values identical -> MAD 0: the stuck-sensor case MAD
    // exists FOR — the meanAD fallback must still flag the spike
    // (median 10, meanAD = (0+0+0+0+1+990)/6 ≈ 165.2, spike score ≈ 4.8)
    val degenerate = Seq(10.0, 10.0, 10.0, 10.0, 9.0, 1000.0).zipWithIndex
      .map { case (v, i) => ("d", i.toLong * S, v) }
      .toDF("series_id", "ts", "value")
    val d = SeriesOps.outliersMad(degenerate, 3.5)
    assert(d.where(col("is_outlier")).collect()
      .map(_.getAs[Double]("value")).toSeq == Seq(1000.0))
    // only a fully constant series yields null scores / nothing flagged
    val const = Seq(5.0, 5.0, 5.0).zipWithIndex
      .map { case (v, i) => ("c", i.toLong * S, v) }
      .toDF("series_id", "ts", "value")
    val c = SeriesOps.outliersMad(const, 3.5)
    assert(c.where(col("is_outlier")).count() == 0)
    assert(c.where(col("mad_score").isNotNull).count() == 0)
  }

  test("ewma: exact adjusted weights, window truncation, NaN drop") {
    // α = 0.5, window 2: y0 = x0; y1 = (0.5·x0 + x1)/1.5; y2 uses only
    // x1, x2 (window truncates x0): (0.5·x1 + x2)/1.5
    val got = SeriesOps.ewma(pts(0L -> 1.0, 1L -> 2.0, 2L -> 3.0), 0.5, 2)
      .orderBy("ts").collect().map(_.getAs[Double]("ewma"))
    assert(got(0) == 1.0)
    assert(math.abs(got(1) - 2.5 / 1.5) < 1e-15)
    assert(math.abs(got(2) - 4.0 / 1.5) < 1e-15)
    // a NaN sample is dropped entirely — successors see the clean history
    val withNan = SeriesOps.ewma(
      pts(0L -> 4.0, 1L -> Double.NaN, 2L -> 8.0), 0.5, 2)
      .orderBy("ts").collect()
    assert(withNan.length == 2)
    assert(math.abs(withNan(1).getAs[Double]("ewma") - (0.5 * 4.0 + 8.0) / 1.5) < 1e-15)
    intercept[IllegalArgumentException] { SeriesOps.ewma(pts(), 1.0, 2) }
    intercept[IllegalArgumentException] { SeriesOps.ewma(pts(), 0.5, 0) }
  }

  test("peaks: interior extrema beyond delta; endpoints and NaN neighbors excluded") {
    val df = pts(0L -> 1.0, 1L -> 9.0, 2L -> 2.0, 3L -> 8.0, 4L -> 3.0)
    val got = SeriesOps.peaks(df, delta = 5.0).orderBy("ts").collect()
      .map(r => (r.getAs[Long]("ts") / S, r.getAs[Double]("value")))
    assert(got.toSeq == Seq(1L -> 9.0, 3L -> 8.0)) // endpoints never qualify
    assert(SeriesOps.peaks(df, delta = 8.5).count() == 0)
    // the NaN sample drops first, so its neighbors still bracket the peak
    val withNan = pts(0L -> 1.0, 1L -> Double.NaN, 2L -> 9.0, 3L -> 2.0)
    val p2 = SeriesOps.peaks(withNan, 5.0).collect()
    assert(p2.length == 1 && p2(0).getAs[Double]("value") == 9.0)
    assert(p2(0).getAs[Double]("prev_value") == 1.0)
    // strictness at delta = 0: a flat series has NO peaks, and a plateau
    // member tied with a neighbor never qualifies
    assert(SeriesOps.peaks(pts(0L -> 5.0, 1L -> 5.0, 2L -> 5.0), 0.0).count() == 0)
    val plateau = SeriesOps.peaks(
      pts(0L -> 1.0, 1L -> 9.0, 2L -> 9.0, 3L -> 1.0), 0.0).count()
    assert(plateau == 0, "two-sample plateau tops are ties, not peaks")
  }

  test("monthly: calendar buckets vary in width; the display shift crosses boundaries") {
    def ns(iso: String) = java.time.Instant.parse(iso).getEpochSecond * S
    // 23:30Z on Dec 31 lands in JANUARY after the +1h display shift; the
    // Jan 31 23:30Z point likewise rolls into February — fixed-dt buckets
    // cannot reproduce either boundary
    val df = Seq(
      ("s", ns("2023-12-31T23:30:00Z"), 1.0),
      ("s", ns("2024-01-15T12:00:00Z"), 3.0),
      ("s", ns("2024-01-31T23:30:00Z"), 5.0)).toDF("series_id", "ts", "value")
    val got = SeriesOps.monthly(df).orderBy("month_start_us").collect()
    assert(got.length == 2)
    val janUs = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond * 1000000L
    val febUs = java.time.Instant.parse("2024-02-01T00:00:00Z").getEpochSecond * 1000000L
    assert(got(0).getAs[Long]("month_start_us") == janUs)
    assert(got(0).getAs[Long]("n_points") == 2L)
    assert(got(0).getAs[Double]("mean_value") == 2.0)
    assert(got(1).getAs[Long]("month_start_us") == febUs)
    assert(got(1).getAs[Double]("min_value") == 5.0)
  }

  test("monthlyTz: DST-aware buckets diverge from the fixed-offset shift at the boundary") {
    def ns(iso: String) = java.time.Instant.parse(iso).getEpochSecond * S
    // Europe/Oslo is +02:00 (CEST) on March 31 2024 evening: 22:30Z is
    // already April 1st 00:30 local, while the fixed +1h convention reads
    // 23:30 March 31 and keeps it in March. The winter point (Jan 15)
    // stays unambiguous.
    val df = Seq(
      ("s", ns("2024-01-15T12:00:00Z"), 1.0),
      ("s", ns("2024-03-31T22:30:00Z"), 5.0)).toDF("series_id", "ts", "value")
    val got = SeriesOps.monthlyTz(df).orderBy("month_start_us").collect()
    assert(got.length == 2)
    // local month starts re-anchored to UTC: Jan starts at +01:00 (CET),
    // April at +02:00 (CEST) — the offset difference IS the DST awareness
    val janUs = java.time.Instant.parse("2023-12-31T23:00:00Z").getEpochSecond * 1000000L
    val aprUs = java.time.Instant.parse("2024-03-31T22:00:00Z").getEpochSecond * 1000000L
    assert(got(0).getAs[Long]("month_start_us") == janUs)
    assert(got(1).getAs[Long]("month_start_us") == aprUs)
    assert(got(1).getAs[Double]("min_value") == 5.0)
    // the fixed-offset rollup puts the same late-March point in MARCH
    val fixed = SeriesOps.monthly(df).orderBy("month_start_us").collect()
    val marFixedUs = java.time.Instant.parse("2024-03-01T00:00:00Z").getEpochSecond * 1000000L
    assert(fixed(1).getAs[Long]("month_start_us") == marFixedUs)
  }

  test("ohlc: open/close follow time order with (ts,value) tie-break") {
    // bucket width 10s: bucket 0 holds ts 1,1,3,5 — open is the SMALLER
    // value of the duplicate ts=1 pair, close is ts=5; bucket 10 is a
    // single point where all four stats coincide
    val df = pts(1L -> 9.0, 1L -> 1.0, 3L -> 4.0, 5L -> 2.0, 12L -> 7.0)
    val got = SeriesOps.ohlc(df, 10 * S).orderBy("bucket_ts").collect()
    assert(got.length == 2)
    val b0 = got(0)
    assert(b0.getAs[Long]("bucket_ts") == 0L)
    assert(b0.getAs[Double]("open") == 1.0)
    assert(b0.getAs[Double]("high") == 9.0)
    assert(b0.getAs[Double]("low") == 1.0)
    assert(b0.getAs[Double]("close") == 2.0)
    assert(b0.getAs[Long]("n_points") == 4L)
    val b1 = got(1)
    assert(Seq("open", "high", "low", "close").forall(c => b1.getAs[Double](c) == 7.0))
  }

  test("winsorize: exact quantile clamp and flags") {
    // values 1..5: quantile_cont positions p·(n−1) → q05 = 1.2, q95 = 4.8
    val df = pts(0L -> 1.0, 1L -> 2.0, 2L -> 3.0, 3L -> 4.0, 4L -> 5.0)
    val got = SeriesOps.winsorize(df, 0.05, 0.95).orderBy("ts").collect()
      .map(r => (r.getAs[Double]("value_winsorized"), r.getAs[Boolean]("is_clipped")))
    assert(math.abs(got(0)._1 - 1.2) < 1e-12 && got(0)._2)
    assert(got(1) == ((2.0, false)) && got(2) == ((3.0, false)) && got(3) == ((4.0, false)))
    assert(math.abs(got(4)._1 - 4.8) < 1e-12 && got(4)._2)
    intercept[IllegalArgumentException] { SeriesOps.winsorize(df, 0.9, 0.1) }
  }

  test("autocorr: alternating series is exactly ±1 by lag parity; constant is null") {
    // 1,-1,1,-1,1: lag1 pairs anti-correlate (-1), lag2 correlate (+1),
    // lag3 anti-correlate (-1); pair counts 4/3/2
    val alt = pts(0L -> 1.0, 1L -> -1.0, 2L -> 1.0, 3L -> -1.0, 4L -> 1.0)
    val got = SeriesOps.autocorr(alt, maxLag = 3).orderBy("lag").collect()
    assert(got.map(_.getAs[Long]("n_pairs")).toSeq == Seq(4L, 3L, 2L))
    assert(math.abs(got(0).getAs[Double]("acf") - (-1.0)) < 1e-12)
    assert(math.abs(got(1).getAs[Double]("acf") - 1.0) < 1e-12)
    assert(math.abs(got(2).getAs[Double]("acf") - (-1.0)) < 1e-12)
    // zero variance on either side -> null, never a division by zero
    val const = SeriesOps.autocorr(pts(0L -> 2.0, 1L -> 2.0, 2L -> 2.0), 1).collect()
    assert(const.length == 1 && const(0).isNullAt(const(0).fieldIndex("acf")))
  }

  test("changepoint: CUSUM peaks at the level shift; ties break earliest") {
    // step 0,0,0 -> 10,10,10: mean 5, cusum -5,-10,-15,-10,-5,0 — the
    // peak |S| = 15 sits on the LAST pre-shift point
    val step = pts(0L -> 0.0, 1L -> 0.0, 2L -> 0.0, 3L -> 10.0, 4L -> 10.0, 5L -> 10.0)
    val got = SeriesOps.changepoint(step).collect()(0)
    assert(got.getAs[Long]("cp_ts") == 2 * S)
    assert(math.abs(got.getAs[Double]("cp_cusum") - (-15.0)) < 1e-12)
    assert(got.getAs[Double]("mean_value") == 5.0)
    assert(got.getAs[Long]("n_points") == 6L)
    // constant series: every cusum is 0 (all tied) -> earliest point wins
    val const = SeriesOps.changepoint(pts(0L -> 1.0, 1L -> 1.0, 2L -> 1.0)).collect()(0)
    assert(const.getAs[Long]("cp_ts") == 0L)
    assert(const.getAs[Double]("cp_cusum") == 0.0)
  }

  test("trend: exact fit on a line, degenerate series yield nulls") {
    // y = 2·t + 5 with t in seconds
    val line = pts(0L -> 5.0, 1L -> 7.0, 2L -> 9.0, 3L -> 11.0)
    val got = SeriesOps.trend(line).collect()(0)
    assert(got.getAs[Long]("n_points") == 4L)
    assert(math.abs(got.getAs[Double]("slope") - 2.0) < 1e-9)
    assert(math.abs(got.getAs[Double]("intercept") - 5.0) < 1e-9)
    assert(math.abs(got.getAs[Double]("r2") - 1.0) < 1e-12)
    // constant value: slope 0, intercept = the value, r2 null (zero y-var)
    val const = SeriesOps.trend(pts(0L -> 3.0, 1L -> 3.0, 2L -> 3.0)).collect()(0)
    assert(math.abs(const.getAs[Double]("slope")) < 1e-12)
    assert(math.abs(const.getAs[Double]("intercept") - 3.0) < 1e-9)
    assert(const.isNullAt(const.fieldIndex("r2")))
    // all points at one instant: zero time variance, everything null
    val vert = Seq(("s", 5L, 1.0), ("s", 5L, 9.0)).toDF("series_id", "ts", "value")
    val v = SeriesOps.trend(vert).collect()(0)
    assert(v.isNullAt(v.fieldIndex("slope")) && v.isNullAt(v.fieldIndex("intercept")))
  }

  test("theilSen: median slope shrugs off a spike that drags least squares") {
    // y = 2·t + 5 with one wild outlier at t=4
    val spiked = pts(0L -> 5.0, 1L -> 7.0, 2L -> 9.0, 3L -> 11.0, 4L -> 1000.0)
    val ts = SeriesOps.theilSen(spiked).collect()(0)
    val ls = SeriesOps.trend(spiked).collect()(0)
    // 10 pair slopes; the 6 spike-free ones are all exactly 2.0, so the
    // median is 2.0 — while least squares is dragged far above
    assert(ts.getAs[Long]("n_points") == 5L && ts.getAs[Long]("n_pairs") == 10L)
    assert(math.abs(ts.getAs[Double]("slope") - 2.0) < 1e-12, ts.toString)
    assert(ls.getAs[Double]("slope") > 100.0)
    // intercept = median of y - 2t = median(5,5,5,5,992) = 5
    assert(math.abs(ts.getAs[Double]("intercept") - 5.0) < 1e-12)
  }

  test("theilSen: even-count medians average the middle pair; guard trips") {
    // 3 points -> 3 slopes: (1,2)=1, (2,3)=3, (1,3)=2 -> median 2
    val df = pts(0L -> 0.0, 1L -> 1.0, 2L -> 4.0)
    val got = SeriesOps.theilSen(df).collect()(0)
    assert(math.abs(got.getAs[Double]("slope") - 2.0) < 1e-12)
    // 4 points on y = t² -> 6 slopes {1,2,3,3,4,5}(t in s): median = (3+3)/2
    val sq = pts(0L -> 0.0, 1L -> 1.0, 2L -> 4.0, 3L -> 9.0)
    assert(math.abs(SeriesOps.theilSen(sq).collect()(0)
      .getAs[Double]("slope") - 3.0) < 1e-12)
    // single-point and all-NaN series drop out entirely
    val sparse = Seq(("a", 0L, 1.0), ("b", 0L, Double.NaN))
      .toDF("series_id", "ts", "value")
    assert(SeriesOps.theilSen(sparse).count() == 0L)
    // the quadratic guard fails fast above maxPoints
    val big = pts((0L to 20L).map(t => t -> t.toDouble): _*)
    val e = intercept[Exception] {
      SeriesOps.theilSen(big, maxPoints = 10).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("theilSen"),
      String.valueOf(e.getMessage))
  }

  test("percentiles: linear interpolation at exact fractional ranks, NaN-safe") {
    // values 10,20,30,40 (NaN dropped): p50 = 25, p90 = 37, p99 = 39.7
    val df = pts(0L -> 10.0, 1L -> 20.0, 2L -> Double.NaN, 3L -> 30.0, 4L -> 40.0)
    val got = SeriesOps.percentiles(df).collect()(0)
    assert(got.getAs[Long]("n_points") == 4L)
    assert(math.abs(got.getAs[Double]("p50") - 25.0) < 1e-12)
    assert(math.abs(got.getAs[Double]("p90") - 37.0) < 1e-12)
    assert(math.abs(got.getAs[Double]("p99") - 39.7) < 1e-12)
  }

  test("seasonalProfile: slots wrap the cycle; pre-epoch points land in the right slot") {
    // period 10 s, bucket 5 s → 2 slots; points at 1, 6, 11, 16 alternate
    val df = pts(1L -> 1.0, 6L -> 2.0, 11L -> 3.0, 16L -> 4.0)
    val got = SeriesOps.seasonalProfile(df, 10 * S, 5 * S).collect()
      .map(r => r.getAs[Long]("slot") ->
        ((r.getAs[Double]("mean_value"), r.getAs[Long]("n_points")))).toMap
    assert(got == Map(0L -> ((2.0, 2L)), 1L -> ((3.0, 2L))))
    // ts = -1 s: pmod(-1e9, 10e9) = 9e9 → slot 1, not a negative slot
    val pre = Seq(("s", -1L * S, 7.0)).toDF("series_id", "ts", "value")
    assert(SeriesOps.seasonalProfile(pre, 10 * S, 5 * S)
      .collect()(0).getAs[Long]("slot") == 1L)
    intercept[IllegalArgumentException] {
      SeriesOps.seasonalProfile(df, 10 * S, 3 * S) // bucket must divide period
    }
  }

  test("gaps: only deltas beyond factor×cadence emit, with exact brackets") {
    // cadence 1 s (deltas 1,1,3,1): the 3 s delta is the only gap at 2×
    val df = pts(0L -> 0.0, 1L -> 1.0, 2L -> 2.0, 5L -> 3.0, 6L -> 4.0)
    val got = SeriesOps.gaps(df, factor = 2.0).collect()
    assert(got.length == 1)
    val g = got(0)
    assert(g.getAs[Long]("gap_start") == 2 * S && g.getAs[Long]("gap_end") == 5 * S)
    assert(g.getAs[Long]("gap_ns") == 3 * S)
    assert(math.abs(g.getAs[Double]("gap_ratio") - 3.0) < 1e-12)
    // a delta exactly AT factor×cadence is not a gap (strict >)
    assert(SeriesOps.gaps(pts(0L -> 0.0, 1L -> 1.0, 3L -> 2.0), factor = 2.0)
      .count() == 0)
  }

  test("interpolate: NaN samples are not brackets; short spans yield no grid") {
    val df = pts(5L -> 10.0, 10L -> Double.NaN, 15L -> 20.0)
    val got = SeriesOps.interpolate(df, 10 * S).collect()
      .map(r => (r.getAs[Long]("ts") / S, r.getAs[Double]("value")))
    // grid {10}: NaN at 10 dropped → lerp between 5 and 15 = 15.0
    assert(got.toSeq == Seq(10L -> 15.0))
    // span [1, 7] contains no multiple of 10 → empty output, no sequence error
    assert(SeriesOps.interpolate(pts(1L -> 1.0, 7L -> 2.0), 10 * S).count() == 0)
  }

  test("forecastNaive: horizon grid after last ts, slot means, unseen slots null") {
    val H = 3600L * Period.Second
    // series observed only at hours 0..5 over two days; forecast resumes
    // from the last point and wraps the day: slots 6..23 never observed
    val rows = for (d <- 0 until 2; h <- 0 until 6)
      yield ("s", (d * 24 + h) * H, (h * 10).toDouble)
    val df = rows.toDF("series_id", "ts", "value")
    val got = SeriesOps.forecastNaive(df, 24 * H, H, horizon = 24)
      .collect().map(r => r.getAs[Long]("ts") ->
        Option(r.getAs[Any]("yhat")).map(_.asInstanceOf[Double])).toMap
    assert(got.size == 24)
    val last = 29L * H // day 1, hour 5
    for (i <- 1 to 24) {
      val ts = last + i * H
      val slot = (ts / H) % 24
      val exp = if (slot < 6) Some(slot.toDouble * 10) else None
      assert(got(ts) == exp, s"step $i (slot $slot)")
    }
  }

  test("stlAnomaly: flags a seasonal deviation the raw MAD score misses") {
    val H = 3600L * Period.Second
    val D = 24L * H
    // five days of a strong daily pattern (slot·10); one point on day 3,
    // slot 2 is shifted +200 — its RAW value (220) sits inside the raw
    // range (0..230), but its residual dwarfs both the edge-window bias
    // of the sawtooth and every other residual
    val anomalyTs = 3 * D + 2 * H
    val df = (0 until 120).map { h =>
      val ts = h * H
      val base = (h % 24) * 10.0
      ("s", ts, if (ts == anomalyTs) base + 200.0 else base)
    }.toDF("series_id", "ts", "value")
    val flagged = SeriesOps.stlAnomaly(df, 24 * 3600L * Period.Second,
        3600L * Period.Second).where($"is_outlier")
      .select("ts").collect().map(_.getLong(0)).toSet
    assert(flagged.contains(anomalyTs), s"seasonal anomaly missed: $flagged")
    val rawFlagged = SeriesOps.outliersMad(df).where($"is_outlier")
      .select("ts").collect().map(_.getLong(0)).toSet
    assert(!rawFlagged.contains(anomalyTs),
      "raw MAD already sees it — fixture fails to demonstrate the point")
  }

  test("stl: decomposition matches the hand walk; NaN rows keep null residual") {
    val H = 3600L * Period.Second
    // two days of hourly points with a NaN hole: slot = hour of day
    val vals = (0 until 48).map(h => if (h == 5) Double.NaN else (h % 24) + h * 0.5)
    val df = vals.zipWithIndex.map { case (v, h) => ("s", h * H, v) }
      .toDF("series_id", "ts", "value")
    val got = SeriesOps.stl(df, periodNs = 24 * H, bucketNs = H, halfWindow = 2)
      .collect().map(r => (r.getAs[Long]("ts") / H).toInt ->
        (r.getAs[Any]("trend"), r.getAs[Any]("seasonal"), r.getAs[Any]("residual")))
      .toMap
    // hand walk: trend = mean of non-NaN in ±2 rows, seasonal = per-slot
    // mean of detrended, residual = value − trend − seasonal. Compared at
    // 1e-9: the slot mean sums in partition order, so the hand walk can
    // differ by ulps (the same noise the compare gate's significant-digit
    // normalization absorbs for the oracle).
    def close(a: Any, b: Double): Boolean =
      math.abs(a.asInstanceOf[Double] - b) <= 1e-9
    val trend = vals.indices.map { i =>
      val w = (math.max(0, i - 2) to math.min(47, i + 2)).map(vals).filterNot(_.isNaN)
      w.sum / w.size
    }
    val detr = vals.indices.map(i => if (vals(i).isNaN) None else Some(vals(i) - trend(i)))
    val seas = vals.indices.groupBy(_ % 24).map { case (slot, is) =>
      val ds = is.flatMap(detr); slot -> ds.sum / ds.size
    }
    for (i <- vals.indices) {
      val (t, s, r) = got(i)
      assert(close(t, trend(i)), s"trend at $i")
      assert(close(s, seas(i % 24)), s"seasonal at $i")
      if (vals(i).isNaN) assert(r == null, s"NaN row $i must keep null residual")
      else assert(close(r, vals(i) - trend(i) - seas(i % 24)), s"residual at $i")
    }
  }
  test("holt matches a driver replay and extrapolates an exact line") {
    // noisy-ish series: replay the recursion on the driver bit-for-bit
    val vals = Seq(3.0, 5.0, 4.0, 8.0, 6.0, 9.0, 7.5, 10.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("s", i.toLong * 100, v) }
      .toDF("series_id", "ts", "value")
    val got = graft.ts.SeriesOps.holt(df, horizon = 2).collect()
      .map(r => (r.getAs[Long]("h"),
        (r.getAs[Double]("level"), r.getAs[Double]("trend"),
          r.getAs[Double]("forecast"), r.getAs[Long]("n_points"))))
      .toMap
    var l = vals.head; var b = 0.0
    vals.tail.foreach { x =>
      val l1 = 0.5 * x + 0.5 * (l + b)
      b = 0.5 * (l1 - l) + 0.5 * b
      l = l1
    }
    assert(got(1L) == ((l, b, l + 1 * b, vals.length.toLong)))
    assert(got(2L) == ((l, b, l + 2 * b, vals.length.toLong)))

    // an exact line is a fixed point: level tracks it, forecasts continue it
    val line = (0 until 20).map(i => ("ln", i.toLong * 10, 2.0 * i + 1))
      .toDF("series_id", "ts", "value")
    val fc = graft.ts.SeriesOps.holt(line, horizon = 3).collect()
      .map(r => r.getAs[Long]("h") -> r.getAs[Double]("forecast")).toMap
    // last value is 2*19+1 = 39, slope 2 per step (level/trend converge
    // geometrically; after 20 points the error is < 1e-2)
    (1 to 3).foreach { h =>
      assert(math.abs(fc(h.toLong) - (39.0 + 2.0 * h)) < 0.05,
        s"h=$h got ${fc(h.toLong)}")
    }
  }
  test("degreeDays: hand-computed HDD/CDD, NaN-only days drop") {
    val day = 86400L * 1000 * 1000 * 1000
    // Jan 1970: day 0 mean 10 (readings 8, 12), day 1 mean 20,
    // day 2 all-NaN (drops); one Feb day mean 17 (exactly base: both 0)
    val pts = Seq(
      ("s", 0L, 8.0), ("s", 1000L, 12.0),
      ("s", day, 20.0),
      ("s", 2 * day, Double.NaN),
      ("s", 31L * day, 17.0))
      .toDF("series_id", "ts", "value")
    val got = graft.ts.SeriesOps.degreeDays(pts)
      .collect().map(r => r.getAs[Long]("month_start_us") ->
        ((r.getAs[Long]("n_days"), r.getAs[Double]("hdd"), r.getAs[Double]("cdd"))))
      .toMap
    val jan = 0L
    val feb = 31L * 86400L * 1000000L
    assert(got(jan) == ((2L, 7.0, 3.0)), s"jan: ${got(jan)}")   // (17-10) + (20-17)
    assert(got(feb) == ((1L, 0.0, 0.0)))
  }

  test("stlStrength: pure seasonal scores high F_s, pure trend high F_t") {
    val seas = Seq(3.0, -1.0, 4.0, -6.0)
    val a = (0 until 48).map(i => ("seasonal", i.toLong, 10.0 + seas(i % 4)))
    val b = (0 until 48).map(i => ("trend", i.toLong, 0.5 * i))
    val df = (a ++ b).toDF("series_id", "ts", "value")
    val got = graft.ts.SeriesOps.stlStrength(df, 4L, 1L).collect()
      .map(r => r.getAs[String]("series_id") ->
        ((r.getAs[Long]("n_points"),
          Option(r.getAs[Any]("seasonal_strength")).map(_.asInstanceOf[Double]),
          Option(r.getAs[Any]("trend_strength")).map(_.asInstanceOf[Double])))).toMap
    assert(got("seasonal")._1 == 48L)
    val fsA = got("seasonal")._2.get
    val ftB = got("trend")._3.get
    assert(fsA > 0.9, s"pure seasonal must score F_s near 1: $fsA")
    assert(ftB > 0.9, s"pure ramp must score F_t near 1: $ftB")
    assert(got("seasonal")._3.get < fsA, "seasonal series: F_t below F_s")
    assert(got("trend")._2.get < ftB, "trend series: F_s below F_t")
  }

  test("backtestNaive: hand-computed MAE/bias; unseen slots unscored") {
    // period 4, bucket 1, holdout 4: cutoff = 9 - 4 = 5; train slots
    // 0..3 mean to (2, 3, 2, 3); test ts 6..9 give |diff| 4,4,6,6
    val s = (0L to 9L).map(i => ("s", i, i.toDouble))
    // "u": train at slot 0 only; test lands on unseen slot 1 -> unscored
    val u = Seq(("u", 0L, 1.0), ("u", 9L, 5.0))
    val df = (s ++ u).toDF("series_id", "ts", "value")
    val got = graft.ts.SeriesOps.backtestNaive(df, 4L, 1L, 4L).collect()
      .map(r => r.getAs[String]("series_id") ->
        ((r.getAs[Long]("n_test"), r.getAs[Long]("n_scored"),
          Option(r.getAs[Any]("mae")).map(_.asInstanceOf[Double]),
          Option(r.getAs[Any]("bias")).map(_.asInstanceOf[Double])))).toMap
    assert(got("s") == ((4L, 4L, Some(5.0), Some(5.0))), s"s: ${got("s")}")
    assert(got("u") == ((1L, 0L, None, None)), s"u: ${got("u")}")
    intercept[IllegalArgumentException](
      graft.ts.SeriesOps.backtestNaive(df, 4L, 3L, 4L))
  }

  test("sax: planted shapes map to the expected words; flat series mid-symbol; short series drop") {
    val day = 86400L * 1000000000L
    def series(id: String, vals: Seq[Double]) =
      vals.zipWithIndex.map { case (v, i) => (id, i * day, v) }
    // step: 8 low then 8 high -> aaaadddd; flat -> cccccccc; short drops
    val rows = series("step", Seq.fill(8)(-1.0) ++ Seq.fill(8)(1.0)) ++
      series("flat", Seq.fill(16)(5.0)) ++
      series("short", Seq.fill(7)(1.0))
    val df = rows.toDF("series_id", "ts", "value")
    val got = graft.ts.SeriesOps.sax(df, day).collect()
      .map(r => r.getAs[String]("series_id") ->
        ((r.getAs[Long]("n_points"), r.getAs[String]("sax_word")))).toMap
    assert(got.keySet == Set("step", "flat"))
    assert(got("step") == ((16L, "aaaadddd")), s"step: ${got("step")}")
    assert(got("flat") == ((16L, "cccccccc")))
    // a linear ramp symbolizes monotonically (word is non-decreasing)
    val ramp = series("r", (0 until 16).map(_.toDouble)).toDF("series_id", "ts", "value")
    val w = graft.ts.SeriesOps.sax(ramp, day).collect()(0).getAs[String]("sax_word")
    assert(w.length == 8 && w.zip(w.tail).forall { case (a, b) => a <= b }, w)
    assert(w.head == 'a' && w.last == 'd', w)
    intercept[IllegalArgumentException](graft.ts.SeriesOps.sax(df, day, w = 1))
  }

  test("holtWinters matches a driver replay and learns a planted period-4 pattern") {
    // two full cycles of a pure period-4 seasonal around a flat level
    val seas = Seq(2.0, -1.0, 3.0, -4.0)
    val vals = (0 until 16).map(i => 10.0 + seas(i % 4))
    val df = vals.zipWithIndex.map { case (v, i) => ("s", i.toLong * 100, v) }
      .toDF("series_id", "ts", "value")
    val got = graft.ts.SeriesOps.holtWinters(df, m = 4).collect()
      .map(r => (r.getAs[Long]("h"),
        (r.getAs[Double]("level"), r.getAs[Double]("trend"),
          r.getAs[Double]("forecast"), r.getAs[Long]("n_points"))))
      .toMap
    // driver replay of the rotated-state recursion, bit-for-bit
    var l = vals.head; var b = 0.0
    var s = Vector(0.0, 0.0, 0.0, 0.0)
    vals.tail.foreach { x =>
      val l1 = 0.5 * (x - s(0)) + 0.5 * (l + b)
      val b1 = 0.5 * (l1 - l) + 0.5 * b
      val sN = 0.5 * (x - l1) + 0.5 * s(0)
      l = l1; b = b1; s = s.tail :+ sN
    }
    (1 to 4).foreach { h =>
      assert(got(h.toLong) == ((l, b, l + h * b + s(h - 1), 16L)),
        s"h=$h got ${got(h.toLong)}")
    }
    // after two cycles the forecasts track the planted seasonal shape:
    // h-step forecast sits measurably closer to 10 + seas than flat 10
    (1 to 4).foreach { h =>
      val expSeas = seas((16 + h - 1) % 4)
      assert(math.abs(got(h.toLong)._3 - (10.0 + expSeas)) < math.abs(expSeas) * 0.7 + 0.3,
        s"h=$h forecast ${got(h.toLong)._3} vs ${10.0 + expSeas}")
    }
    // degenerate single point: level = x, trend 0, seasonals 0
    val one = Seq(("p", 0L, 7.0)).toDF("series_id", "ts", "value")
    val g1 = graft.ts.SeriesOps.holtWinters(one, m = 4).collect()
      .map(r => r.getAs[Long]("h") -> r.getAs[Double]("forecast")).toMap
    (1 to 4).foreach(h => assert(g1(h.toLong) == 7.0))
    intercept[IllegalArgumentException](graft.ts.SeriesOps.holtWinters(one, m = 1))
  }

  test("saxMotifs: recurring shapes counted across series, flat windows read cccc, short series emit nothing") {
    import spark.implicits._
    val hour = 3600L * 1000000000L
    def series(id: String, vs: Seq[Double]) =
      vs.zipWithIndex.map { case (v, i) => (id, i.toLong * hour, v) }
    // square wave period 4 over 16 obs: window starts 0/4/8 read "adad"
    // (segment means 0,10,0,10 -> z = -1,1,-1,1), starts 2/6 read "dada",
    // odd starts have all segment means == mu -> "cccc" (z = 0 branch)
    val sq = series("s1", Seq.tabulate(16)(i => if (i % 4 < 2) 0.0 else 10.0))
    val flat = series("s2", Seq.fill(10)(7.0)) // sd = 0 path -> "cccc" x3
    val short = series("s3", Seq(1.0, 5.0, 2.0, 8.0, 3.0)) // < 8 obs
    val pts = (sq ++ flat ++ short).toDF("series_id", "ts", "value")
    val got = graft.ts.SeriesOps.saxMotifs(pts, hour).collect()
      .map(r => r.getAs[String]("motif") ->
        ((r.getAs[Long]("n_windows"), r.getAs[Long]("n_series")))).toMap
    assert(got == Map(
      "adad" -> ((3L, 1L)),
      "dada" -> ((2L, 1L)),
      "cccc" -> ((7L, 2L))), s"got $got")
  }

  test("spearmanCorrelation: monotone nonlinear reads exactly 1, reversed -1, tie ranks replay, constants null") {
    import spark.implicits._
    val day = 86400L * 1000000000L
    def series(id: String, vs: Seq[Double]) =
      vs.zipWithIndex.map { case (v, i) => (id, i.toLong * day, v) }
    val xs = (1 to 10).map(_.toDouble)
    val pts = (series("a", xs) ++ series("b", xs.map(math.exp)) ++
      series("c", xs.map(-_)) ++ series("d", Seq.fill(10)(7.0)) ++
      series("t1", Seq(1.0, 1.0, 2.0, 3.0)) ++
      series("t2", Seq(2.0, 2.0, 1.0, 5.0)))
      .toDF("series_id", "ts", "value")
    val got = graft.ts.SeriesOps.spearmanCorrelation(pts, day).collect()
      .map(r => (r.getAs[String]("series_a"), r.getAs[String]("series_b")) ->
        ((r.getAs[Long]("n_buckets"),
          Option(r.getAs[java.lang.Double]("rho")).map(_.doubleValue))))
      .toMap
    // exp is monotone: rank sequences identical -> rho exactly 1
    assert(got(("a", "b"))._2.contains(1.0), s"a-b: ${got(("a", "b"))}")
    assert(got(("a", "c"))._2.contains(-1.0))
    assert(got(("b", "c"))._2.contains(-1.0))
    // constant side: zero rank variance -> null
    assert(got(("a", "d"))._2.isEmpty)
    // ties: average ranks replayed by hand on the 4 shared buckets
    def avgRanks(v: Seq[Double]): Seq[Double] =
      v.map(x => v.count(_ < x) + 1.0 + (v.count(_ == x) - 1.0) / 2.0)
    def pearson(x: Seq[Double], y: Seq[Double]): Double = {
      val n = x.length.toDouble
      val (sx, sy) = (x.sum, y.sum)
      val (sxx, syy) = (x.map(a => a * a).sum, y.map(a => a * a).sum)
      val sxy = x.zip(y).map { case (a, b) => a * b }.sum
      (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }
    val expT = pearson(avgRanks(Seq(1.0, 1.0, 2.0, 3.0)),
      avgRanks(Seq(2.0, 2.0, 1.0, 5.0)))
    assert(got(("t1", "t2"))._1 == 4L)
    assert(got(("t1", "t2"))._2.contains(expT),
      s"tie rho ${got(("t1", "t2"))._2} vs $expT")
  }

  test("pacf: Durbin-Levinson replay parity; AR(1) cuts off after lag 1; constants emit nothing") {
    import spark.implicits._
    def pacfLocal(xs: Seq[Double], maxLag: Int = 6): Seq[(Double, Double)] = {
      val n = xs.length
      val mean = xs.sum / n
      val denom = xs.map(x => (x - mean) * (x - mean)).sum
      val h = math.min(maxLag, n - 1)
      val rhos = (1 to h).map { k =>
        (k until n).map(t => (xs(t) - mean) * (xs(t - k) - mean)).sum / denom
      }
      var phi = Vector.empty[Double]
      (1 to h).map { k =>
        val num = rhos(k - 1) -
          phi.zipWithIndex.map { case (x, i) => x * rhos(k - i - 2) }.sum
        val den = 1.0 - phi.zipWithIndex.map { case (x, i) => x * rhos(i) }.sum
        val pkk = num / den
        phi = phi.zipWithIndex.map { case (x, i) =>
          x - pkk * phi(k - i - 2) }.toVector :+ pkk
        (rhos(k - 1), pkk)
      }
    }
    // AR(1)-ish: x_t = 0.7 x_{t-1} + bounded deterministic pseudo-noise
    def noise(i: Int): Double = {
      var z = i * 0x9E3779B9
      z ^= z >>> 16; z *= 0x85EBCA6B; z ^= z >>> 13
      z *= 0xC2B2AE35; z ^= z >>> 16
      (z & 0x3FF) / 1024.0 - 0.5
    }
    val ar1 = Iterator.iterate((0.0, 1)) { case (x, i) =>
      (0.7 * x + noise(i), i + 1)
    }.map(_._1).take(60).toSeq
    val const = Seq.fill(10)(5.0)
    val short = Seq(2.0, 9.0, 4.0, 7.0)
    val pts = (ar1.zipWithIndex.map { case (v, i) => ("ar", i.toLong, v) } ++
      const.zipWithIndex.map { case (v, i) => ("c", i.toLong, v) } ++
      short.zipWithIndex.map { case (v, i) => ("sh", i.toLong, v) })
      .toDF("series_id", "ts", "value")
    val got = graft.ts.SeriesOps.pacf(pts).collect()
      .map(r => (r.getAs[String]("series_id"), r.getAs[Int]("lag")) ->
        ((r.getAs[Double]("rho"), r.getAs[Double]("pacf")))).toMap
    assert(!got.keySet.exists(_._1 == "c"), "constant series emit nothing")
    assert(got.keySet.count(_._1 == "sh") == 3, "n=4 -> lags 1..3")
    val expAr = pacfLocal(ar1)
    (1 to 6).foreach { k =>
      val (er, ep) = expAr(k - 1)
      val (gr, gp) = got(("ar", k))
      assert(math.abs(gr - er) < 1e-9 * math.max(1.0, math.abs(er)), s"rho$k $gr vs $er")
      assert(math.abs(gp - ep) < 1e-9 * math.max(1.0, math.abs(ep)), s"pacf$k $gp vs $ep")
    }
    // the AR(1) signature: big spike at lag 1, cutoff after
    assert(math.abs(got(("ar", 1))._2) > 0.5, s"lag-1 ${got(("ar", 1))}")
    (2 to 6).foreach(k =>
      assert(math.abs(got(("ar", k))._2) < 0.3, s"lag-$k ${got(("ar", k))}"))
    val expSh = pacfLocal(short)
    (1 to 3).foreach { k =>
      assert(math.abs(got(("sh", k))._2 - expSh(k - 1)._2)
        < 1e-9 * math.max(1.0, math.abs(expSh(k - 1)._2)))
    }
  }

  test("ljungBox: driver-replay parity; AR series rejects, noise-like does not; constants null; df adapts") {
    import spark.implicits._
    def lbQ(xs: Seq[Double], maxLag: Int = 6): (Double, Int) = {
      val n = xs.length
      val mean = xs.sum / n
      val denom = xs.map(x => (x - mean) * (x - mean)).sum
      val h = math.min(maxLag, n - 1)
      val s = (1 to h).map { k =>
        val num = (k until n).map(t => (xs(t) - mean) * (xs(t - k) - mean)).sum
        val rho = num / denom
        rho * rho / (n - k)
      }.sum
      (n * (n + 2.0) * s, h)
    }
    // strongly autocorrelated: a slow ramp; noise-like: a quadratic-residue
    // scramble mod 97 (measured Q ~= 0.32 under the replay, far below the
    // df-6 critical 12.59)
    val ar = (0 until 40).map(i => ("ar", i.toLong, i.toDouble))
    val wn = (0 until 40).map(i => ("wn", i.toLong, ((i * i * 13 + i * 6) % 97).toDouble))
    val const = (0 until 10).map(i => ("c", i.toLong, 5.0))
    val short = (0 until 4).map(i => ("sh", i.toLong, Seq(1.0, 4.0, 2.0, 8.0)(i)))
    val single = Seq(("one", 0L, 3.0))
    val pts = (ar ++ wn ++ const ++ short ++ single).toDF("series_id", "ts", "value")
    val got = graft.ts.SeriesOps.ljungBox(pts).collect()
      .map(r => r.getAs[String]("series_id") ->
        ((r.getAs[Long]("n_points"), r.getAs[Long]("df"),
          Option(r.getAs[java.lang.Double]("q_stat")).map(_.doubleValue),
          Option(r.getAs[java.lang.Boolean]("reject_white_noise")).map(_.booleanValue))))
      .toMap
    assert(!got.contains("one"), "single point has no lag pair, no row")
    assert(got("c")._3.isEmpty && got("c")._4.isEmpty, s"constant: ${got("c")}")
    val (qa, ha) = lbQ(ar.map(_._3))
    assert(got("ar")._2 == ha.toLong)
    assert(math.abs(got("ar")._3.get - qa) < 1e-9 * math.abs(qa), s"ar q ${got("ar")._3} vs $qa")
    assert(got("ar")._4.contains(true), "ramp must reject white noise")
    val (qw, _) = lbQ(wn.map(_._3))
    assert(math.abs(got("wn")._3.get - qw) < 1e-9 * math.max(1.0, math.abs(qw)))
    assert(qw < graft.ts.SeriesOps.ChiSq95(5), s"fixture check: qw=$qw")
    assert(got("wn")._4.contains(false), "scrambled series must not reject")
    // n=4 -> lags 1..3 only, critical value at df=3
    assert(got("sh")._1 == 4L && got("sh")._2 == 3L)
    val (qs, hs) = lbQ(short.map(_._3))
    assert(hs == 3)
    assert(math.abs(got("sh")._3.get - qs) < 1e-9 * math.max(1.0, math.abs(qs)))
    assert(got("sh")._4.contains(qs > graft.ts.SeriesOps.ChiSq95(2)))
  }
}
