package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

/** Z-order layout semantics: the Morton interleave must match a
  * driver-side reference bit-for-bit, reject out-of-range coordinates, and
  * — the actual point of the operator — produce partitions whose (x, y)
  * bounding boxes are small in BOTH dimensions, where a single-key sort
  * leaves the other dimension's span at full width.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def refZ(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { b =>
      (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
    }.reduce(_ | _)

  test("zValue matches the reference interleave over the full grid") {
    val df = spark.range(64).toDF("x")
      .crossJoin(spark.range(64).toDF("y"))
    val got = df.withColumn("z", Layout.zValue(col("x"), col("y"), 6))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == refZ(x, y, 6), s"($x,$y): got $z want ${refZ(x, y, 6)}") }
    // the curve is a bijection on the grid
    assert(got.map(_._3).distinct.length == 64 * 64)
  }

  test("zValue fails fast outside [0, 2^bits) instead of truncating") {
    val bad = Seq((-1L, 0L), (0L, 64L)).toDF("x", "y")
    val e = intercept[Exception] {
      bad.withColumn("z", Layout.zValue(col("x"), col("y"), 6)).collect()
    }
    assert(String.valueOf(e.getMessage).contains("zValue"), e.getMessage)
  }

  test("clusterByZ bounds BOTH spans per partition; x-sort leaves y at full width") {
    val grid = spark.range(64).toDF("x").crossJoin(spark.range(64).toDF("y"))
    def spans(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = df
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .select("sx", "sy").as[(Long, Long)].collect().toSeq
    val z = spans(Layout.clusterByZ(grid, "x", "y", bits = 6, numPartitions = 16))
    // 4096 cells over 16 partitions ≈ 256 cells each; contiguous z ranges
    // cover small rectangles — both spans far below the 63 global width
    // (bound loose enough for range-sampler wobble)
    assert(z.forall { case (sx, sy) => sx <= 40 && sy <= 40 },
      s"z-cluster spans too wide: $z")
    // single-key sort: x tightly bounded, y spans the whole grid
    val xs = spans(grid.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    assert(xs.exists { case (_, sy) => sy == 63L }, s"x-sort spans: $xs")
  }

  /** Driver reference: the classic xy→d Hilbert walk (reflect+swap). */
  private def refH(x0: Long, y0: Long, bits: Int): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbertValue matches the reference walk and is a bijection") {
    val df = spark.range(32).toDF("x").crossJoin(spark.range(32).toDF("y"))
    val got = df.withColumn("h", Layout.hilbertValue(col("x"), col("y"), 5))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, h) =>
      assert(h == refH(x, y, 5), s"($x,$y): got $h want ${refH(x, y, 5)}") }
    assert(got.map(_._3).distinct.length == 32 * 32)
  }

  test("hilbert curve is continuous: consecutive indices are grid neighbors") {
    // THE property Morton lacks (z-order jumps diagonally at power-of-two
    // boundaries) and the reason Hilbert files have tighter bounding boxes
    val df = spark.range(16).toDF("x").crossJoin(spark.range(16).toDF("y"))
    val byH = df.withColumn("h", Layout.hilbertValue(col("x"), col("y"), 4))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    byH.sliding(2).foreach {
      case Array((x1, y1, h1), (x2, y2, h2)) =>
        assert(h2 == h1 + 1 && math.abs(x2 - x1) + math.abs(y2 - y1) == 1,
          s"jump between h=$h1 ($x1,$y1) and h=$h2 ($x2,$y2)")
      case _ =>
    }
    val zByZ = df.withColumn("z", Layout.zValue(col("x"), col("y"), 4))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    val zJumps = zByZ.sliding(2).count {
      case Array((x1, y1, _), (x2, y2, _)) =>
        math.abs(x2 - x1) + math.abs(y2 - y1) > 1
      case _ => false
    }
    assert(zJumps > 0, "Morton should take non-adjacent steps — sanity check")
  }

  test("hilbertValue fails fast outside [0, 2^bits)") {
    val bad = Seq((32L, 0L)).toDF("x", "y")
    val e = intercept[Exception] {
      bad.withColumn("h", Layout.hilbertValue(col("x"), col("y"), 5)).collect()
    }
    assert(String.valueOf(e.getMessage).contains("hilbertValue"), e.getMessage)
  }

  test("clusterByHilbert bounds both spans at least as tightly as required of z") {
    val grid = spark.range(64).toDF("x").crossJoin(spark.range(64).toDF("y"))
    val spans = Layout.clusterByHilbert(grid, "x", "y", bits = 6, numPartitions = 16)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .select("sx", "sy").as[(Long, Long)].collect().toSeq
    assert(spans.forall { case (sx, sy) => sx <= 40 && sy <= 40 },
      s"hilbert-cluster spans too wide: $spans")
  }
  test("skippingStats: one z layout prunes files on BOTH dimensions") {
    import graft.ops.Layout
    val rows = for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)
    val got = Layout.skippingStats(rows.toDF("x", "y"), "x", "y", bits = 6,
      rowsPerFile = 256, xRange = (0L, 7L), yRange = (0L, 7L))
      .collect().map(r => (r.getAs[Long]("file_id"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("min_x"), r.getAs[Long]("max_x"),
        r.getAs[Long]("min_y"), r.getAs[Long]("max_y"),
        r.getAs[Boolean]("skip_x_range"), r.getAs[Boolean]("skip_y_range")))
    assert(got.map(_._2).sum == 64L * 64, "files tile the whole grid")
    assert(got.length == 16, s"4096 rows at 256/file: ${got.length}")
    // flags are exactly the min/max verdicts
    got.foreach { case (_, _, x0, x1, y0, y1, sx, sy) =>
      assert(sx == (x1 < 0 || x0 > 7) && sy == (y1 < 0 || y0 > 7))
    }
    // the z-order claim: BOTH 8/64-wide range predicates prune most files
    // from the SAME layout (an x-sort would leave every file's y at full
    // width — zero y pruning)
    assert(got.count(_._7) >= 8, s"x pruned ${got.count(_._7)}")
    assert(got.count(_._8) >= 8, s"y pruned ${got.count(_._8)}")
  }
}
