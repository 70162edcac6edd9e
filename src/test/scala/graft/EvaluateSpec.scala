package graft

import graft.ts.{Evaluate, SeriesStore}
import graft.ts.model.Period

/** Routing + order preservation, mirroring the reference's
  * weather/test/test_dtss_host.py:54-61: ids [mock1, mock2, mock1] come back
  * in request order with values [1, 2, 3]; unknown schemes raise
  * (dtss_host.py:238-245).
  */
class EvaluateSpec extends SparkSpec {

  private def ev = Evaluate.default(new SeriesStore(spark, tmpDir("graft-ev")))

  test("grouped fan-out restores request order by ordinal") {
    val ids = Seq("mock1://a/1", "mock2://b/2", "mock1://c/3")
    val got = ev.evaluate(spark, ids, Period.ofSeconds(0, 10))
    // one row per (ordinal, series) × 10 axis points
    assert(got.count() == 30)
    val byOrd = got.select("ordinal", "series_id", "value").distinct()
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    assert(byOrd.toSeq == Seq(
      (0, "mock1://a/1", 1.0), (1, "mock2://b/2", 2.0), (2, "mock1://c/3", 3.0)))
  }

  test("heartbeat ids produce constant 1.0 at 1 s steps covering the period") {
    val got = ev.evaluate(spark, Seq("heartbeat://callback/ping"), Period.ofSeconds(100, 160))
    val rows = got.collect()
    assert(rows.length == 60)
    assert(rows.forall(_.getAs[Double]("value") == 1.0))
    val ts = rows.map(_.getAs[Long]("ts")).sorted
    assert(ts.head == 100 * Period.Second && ts.last == 159 * Period.Second)
  }

  test("duplicate ids keep one row set per ordinal (TsVector contract)") {
    val got = ev.evaluate(spark, Seq("mock1://a/1", "mock1://a/1"), Period.ofSeconds(0, 5))
    assert(got.count() == 10) // 5 points × 2 ordinals
    val ords = got.select("ordinal").distinct().collect().map(_.getInt(0)).sorted
    assert(ords.toSeq == Seq(0, 1))
  }

  test("unknown scheme raises with the registered-schemes message") {
    val e = intercept[IllegalArgumentException] {
      ev.evaluate(spark, Seq("nosuch://x/1"), Period.ofSeconds(0, 1))
    }
    assert(e.getMessage.contains("no source registered for scheme 'nosuch'"))
  }

  test("find routes by scheme") {
    val infos = ev.find(spark, "heartbeat://callback/are-you-alive")
    assert(infos.map(_.name) == Seq("heartbeat: are-you-alive"))
    assert(infos.head.deltaTNs == Period.Second)
  }
}
