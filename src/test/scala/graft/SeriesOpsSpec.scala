package graft

import org.apache.spark.sql.DataFrame

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

  test("interpolate: NaN samples are not brackets; short spans yield no grid") {
    val df = pts(5L -> 10.0, 10L -> Double.NaN, 15L -> 20.0)
    val got = SeriesOps.interpolate(df, 10 * S).collect()
      .map(r => (r.getAs[Long]("ts") / S, r.getAs[Double]("value")))
    // grid {10}: NaN at 10 dropped → lerp between 5 and 15 = 15.0
    assert(got.toSeq == Seq(10L -> 15.0))
    // span [1, 7] contains no multiple of 10 → empty output, no sequence error
    assert(SeriesOps.interpolate(pts(1L -> 1.0, 7L -> 2.0), 10 * S).count() == 0)
  }
}
