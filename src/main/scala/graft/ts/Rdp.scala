package graft.ts

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** W4: Ramer–Douglas–Peucker polyline downsampling for sparkline display
  * (reference: visual/dtss_serve_test.py:236-243 — `rdp(points, epsilon=(n/30)*2)`).
  *
  * Inherently sequential per series, embarrassingly parallel across series:
  * implemented as `groupByKey(series).mapGroups` with an iterative
  * stack-based RDP (no recursion-depth hazard on long runs). A display-side
  * operator — per-series windows are thousands of points, far below executor
  * memory (SURVEY.md §7.4); the epsilon default reproduces the reference's
  * `(len/30)*2` and NaN points are dropped first (rdp on NaN is undefined).
  */
object Rdp {

  final case class P(series_id: String, ts: Long, value: Double)

  /** Iterative RDP over (x=ts, y=value) with perpendicular euclidean
    * distance; keeps endpoints. `eps <= 0` → reference's auto epsilon.
    */
  def simplify(pts: Array[P], eps: Double): Array[P] = {
    val n = pts.length
    if (n <= 2) return pts
    val epsilon = if (eps > 0) eps else (n / 30.0) * 2.0
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    var stack = List((0, n - 1))
    while (stack.nonEmpty) {
      val (lo, hi) = stack.head
      stack = stack.tail
      if (hi > lo + 1) {
        val x1 = pts(lo).ts.toDouble; val y1 = pts(lo).value
        val x2 = pts(hi).ts.toDouble; val y2 = pts(hi).value
        val dx = x2 - x1; val dy = y2 - y1
        val norm = math.sqrt(dx * dx + dy * dy)
        var best = -1.0; var bestI = -1
        var i = lo + 1
        while (i < hi) {
          val d =
            if (norm == 0.0) {
              val ex = pts(i).ts.toDouble - x1; val ey = pts(i).value - y1
              math.sqrt(ex * ex + ey * ey)
            } else
              math.abs(dy * pts(i).ts.toDouble - dx * pts(i).value + x2 * y1 - y2 * x1) / norm
          if (d > best) { best = d; bestI = i }
          i += 1
        }
        if (best > epsilon) {
          keep(bestI) = true
          stack = (lo, bestI) :: (bestI, hi) :: stack
        }
      }
    }
    val out = Array.newBuilder[P]
    var i = 0
    while (i < n) { if (keep(i)) out += pts(i); i += 1 }
    out.result()
  }

  /** Downsample every series in a long point DataFrame. */
  def downsample(points: DataFrame, eps: Double = -1.0): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val ds: Dataset[P] = points
      .select(col("series_id"), col("ts").cast("long"), col("value").cast("double"))
      .where(col("value").isNotNull && !org.apache.spark.sql.functions.isnan(col("value")))
      .as[P]
    ds.groupByKey(_.series_id)
      .flatMapGroups { (_, it) =>
        val arr = it.toArray.sortBy(_.ts)
        simplify(arr, eps).iterator
      }
      .toDF("series_id", "ts", "value")
  }
}
