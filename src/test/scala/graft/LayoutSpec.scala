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
}
