package graft

import org.apache.spark.sql.functions._

import graft.core.{GraftTableFunctions, Tables}

/** The pure-SQL drivability contract: every graft_* table-valued function
  * must return EXACTLY what the Scala API call returns — same rows, same
  * columns — because the builder splices the same analyzed plan. Anything
  * less means a SQL-only caller gets a different engine.
  */
class SqlSurfaceSpec extends SparkSpec {

  private def pts = {
    val t = Tables(spark, sfDir)
    t.eventsUs.select(
      concat(lit("shyft://events/u"), col("user_id"), lit("/"),
        col("event_type")).as("series_id"),
      col("ts"), col("value"))
  }

  test("graft_sessionize(view, gap) == Sessionize.sessions") {
    GraftTableFunctions.registerAll(spark)
    val e = Tables(spark, sfDir).eventsUs
    e.createOrReplaceTempView("sqlspec_events")
    val viaSql = spark.sql(
      "SELECT * FROM graft_sessionize('sqlspec_events', 1800000000000)")
    val direct = graft.ops.Sessionize.sessions(e, gapNs = 1800000000000L)
    assert(viaSql.columns.toSeq == direct.columns.toSeq)
    assert(rowsOf(viaSql) == rowsOf(direct))
  }

  test("graft_bm25(view, query, k) == TextOps.bm25") {
    GraftTableFunctions.registerAll(spark)
    val d = Tables(spark, sfDir).documents
    d.createOrReplaceTempView("sqlspec_docs")
    val viaSql = spark.sql(
      "SELECT * FROM graft_bm25('sqlspec_docs', 'table scan sort key', 5)")
    val direct = graft.pipeline.TextOps.bm25(d, "table scan sort key", k = 5)
    assert(rowsOf(viaSql) == rowsOf(direct))
  }

  test("graft_resample(view, width) == SeriesOps.resample") {
    GraftTableFunctions.registerAll(spark)
    pts.createOrReplaceTempView("sqlspec_points")
    val viaSql = spark.sql(
      "SELECT * FROM graft_resample('sqlspec_points', 86400000000000)")
    val direct = graft.ts.SeriesOps.resample(pts, 86400L * 1000000000L)
    assert(rowsOf(viaSql) == rowsOf(direct))
  }

  test("graft_dedup_clusters(view) == Components.dedupClusters") {
    GraftTableFunctions.registerAll(spark)
    val d = Tables(spark, sfDir).documents
    d.createOrReplaceTempView("sqlspec_docs")
    val viaSql = spark.sql("SELECT * FROM graft_dedup_clusters('sqlspec_docs')")
    val direct = graft.pipeline.Components.dedupClusters(d)
    assert(rowsOf(viaSql) == rowsOf(direct))
  }

  test("SQL surface composes: TVF result is a normal relation (filter + agg)") {
    GraftTableFunctions.registerAll(spark)
    Tables(spark, sfDir).eventsUs.createOrReplaceTempView("sqlspec_events")
    val n = spark.sql(
      """SELECT user_id, count(*) AS n_sessions
        |FROM graft_sessionize('sqlspec_events', 1800000000000)
        |GROUP BY user_id""".stripMargin).count()
    assert(n > 0)
  }

  test("non-literal table argument fails loudly, not silently") {
    GraftTableFunctions.registerAll(spark)
    Tables(spark, sfDir).eventsUs.createOrReplaceTempView("sqlspec_events")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_sessionize(upper('x'), 1)").collect()
    }
    assert(e.getMessage != null)
  }
}
