package graft

import graft.ts.Rdp
import graft.ts.Rdp.P

/** RDP downsampling invariants (reference: visual/dtss_serve_test.py:236-243):
  * endpoints always kept, collinear interiors dropped, spikes above epsilon
  * retained, short series pass through.
  */
class RdpSpec extends SparkSpec {

  private def line(n: Int): Array[P] =
    (0 until n).map(i => P("s", i.toLong, i.toDouble)).toArray

  test("endpoints are always preserved") {
    val pts = line(100)
    val out = Rdp.simplify(pts, eps = 5.0)
    assert(out.head == pts.head && out.last == pts.last)
  }

  test("collinear points collapse to the two endpoints") {
    val out = Rdp.simplify(line(1000), eps = 0.5)
    assert(out.length == 2)
  }

  test("a spike above epsilon is retained") {
    val pts = line(101)
    pts(50) = P("s", 50L, 500.0) // big perpendicular deviation
    val out = Rdp.simplify(pts, eps = 5.0)
    assert(out.exists(p => p.ts == 50L && p.value == 500.0))
    assert(out.length >= 3 && out.length < pts.length)
  }

  test("series of <= 2 points pass through untouched") {
    assert(Rdp.simplify(line(2), 1.0).toSeq == line(2).toSeq)
    assert(Rdp.simplify(line(1), 1.0).toSeq == line(1).toSeq)
  }

  test("auto epsilon reproduces the reference's (n/30)*2 display target") {
    // noisy sine over 3000 points: auto-eps must reduce hard but keep shape
    val pts = (0 until 3000)
      .map(i => P("s", i.toLong, 100.0 * math.sin(i / 300.0))).toArray
    val out = Rdp.simplify(pts, eps = -1.0)
    assert(out.length < pts.length / 10)
    assert(out.length >= 2)
  }

  test("downsample runs per-series on a DataFrame and drops NaN points") {
    import spark.implicits._
    val df = (Seq(("a", 0L, 0.0), ("a", 1L, Double.NaN), ("a", 2L, 2.0), ("a", 3L, 4.0)) ++
      (0 until 500).map(i => ("b", i.toLong, 1.0)))
      .toDF("series_id", "ts", "value")
    val out = Rdp.downsample(df, eps = 0.5).collect()
    val a = out.filter(_.getString(0) == "a").map(_.getLong(1)).sorted
    assert(a.head == 0L && a.last == 3L)        // endpoints of the NaN-filtered run
    assert(!out.exists(r => r.getDouble(2).isNaN))
    val b = out.filter(_.getString(0) == "b")
    assert(b.length == 2)                        // constant series → endpoints only
  }
}
