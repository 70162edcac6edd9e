package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sources.{Netatmo, NetatmoSource}
import graft.ts.{Evaluate, Identifiers}
import graft.ts.model.Period

/** Netatmo catalog + fixture-backed paginated API source: station-as-module
  * split (reference: weather/data_sources/netatmo/domain.py:200-216), the
  * 10-row measurement dimension (domain.py:110-123), catalog lookup (P4),
  * and multi-block pagination assembly (repository.py:150-200).
  */
class NetatmoSpec extends SparkSpec {

  private lazy val t = Tables(spark, sfDir)
  // µs-grid events so catalog module lifetimes share eventsPoints' ts grid
  private lazy val cat = Netatmo.catalog(Netatmo.rawConfig(t.eventsUs))
  private lazy val eventsPoints = t.eventsUs.select("user_id", "event_type", "ts", "value")
  private lazy val eventsPath = s"$sfDir/events.parquet"

  test("measurement dimension: fixed 10 rows, all POINT_INSTANT_VALUE") {
    val dim = Netatmo.measurementDimension(spark).collect()
    assert(dim.length == 10)
    assert(dim.forall(_.getAs[String]("point_fx") == "instant"))
    assert(dim.map(_.getAs[String]("data_type")).contains("Temperature"))
  }

  test("station-as-module split: 'Main' rows reuse the station id as module id") {
    val main = cat.where(col("module_name") === "Main")
      .select("station_id", "module_id").distinct().collect()
    assert(main.nonEmpty)
    assert(main.forall(r => r.getString(0) == r.getString(1)))
    val outdoor = cat.where(col("module_name") === "Outdoor")
      .select("station_id", "module_id").distinct().collect()
    assert(outdoor.forall(r => r.getString(0) != r.getString(1)))
  }

  test("catalog ids follow the grammar and round-trip through the parser") {
    val row = cat.limit(1).collect()(0)
    val parsed = Identifiers.parseNetatmoIdStr(row.getAs[String]("source_id"))
    assert(parsed("station_name") == row.getAs[String]("station_name"))
    assert(parsed("module_name") == row.getAs[String]("module_name"))
    assert(parsed("data_type") == row.getAs[String]("data_type"))
    assert(row.getAs[String]("store_id").startsWith("shyft://netatmo/"))
  }

  test("lookup is a point query on (station, module, data_type)") {
    val any = cat.limit(1).collect()(0)
    val got = Netatmo.lookup(cat,
      any.getAs[String]("station_name"), any.getAs[String]("module_name"),
      any.getAs[String]("data_type")).collect()
    assert(got.length == 1)
    assert(got(0).getAs[String]("source_id") == any.getAs[String]("source_id"))
  }

  test("pagination: small blocks assemble to the same rows as one big block") {
    val row = cat.limit(1).collect()(0)
    val uid = row.getAs[Long]("user_id")
    val types = cat.where(col("user_id") === uid && col("module_name") === row.getAs[String]("module_name"))
      .select("data_type").collect().map(_.getString(0)).toSeq
    val all = Period(Long.MinValue / 2, Long.MaxValue / 2)
    val paged = new NetatmoSource(cat, eventsPoints, eventsPath, blockSize = 16)
      .getMeasurements(uid, types, all)
    val single = new NetatmoSource(cat, eventsPoints, eventsPath, blockSize = 1 << 20)
      .getMeasurements(uid, types, all)
    assert(paged.count() > 0)
    assert(rowsOf(paged) == rowsOf(single))
    // multi-block actually exercised: axis longer than one small block
    assert(single.select("ts").distinct().count() > 16)
  }

  test("read binds ids via the catalog and re-keys to the verbatim id") {
    val rows = cat.where(col("user_id") === 0).limit(2).collect()
    val ids = rows.map(_.getAs[String]("source_id")).toSeq
    val src = new NetatmoSource(cat, eventsPoints, eventsPath)
    val got = new Evaluate(Map("netatmo" -> src))
      .evaluate(spark, ids, Period(Long.MinValue / 2, Long.MaxValue / 2))
    val seen = got.select("series_id").distinct().collect().map(_.getString(0)).toSet
    assert(seen == ids.toSet)
    val e = intercept[IllegalArgumentException] {
      src.read(spark, Seq(Identifiers.netatmoIdStr("No Such Station", "Main", "click")), Period.ofSeconds(0, 1))
    }
    assert(e.getMessage.contains("not in catalog"))
  }

  test("find resolves catalog metadata with tz, module lifetime, and dt") {
    val row = cat.limit(1).collect()(0)
    val infos = new NetatmoSource(cat, eventsPoints, eventsPath)
      .find(spark, row.getAs[String]("source_id"))
    assert(infos.length == 1)
    val i = infos.head
    assert(i.olsonTzId == "Europe/Oslo")

    // data period is the MODULE's lifetime: the min/max event ts across all
    // measurement types carried by the module (repository.py:292-301)
    val uid = row.getAs[Long]("user_id")
    val types = cat.where(col("user_id") === uid &&
        col("module_name") === row.getAs[String]("module_name"))
      .select("data_type").collect().map(_.getString(0)).toSeq
    val life = eventsPoints
      .where(col("user_id") === uid && col("event_type").isin(types: _*))
      .agg(org.apache.spark.sql.functions.min("ts"),
        org.apache.spark.sql.functions.max("ts")).collect()(0)
    assert(i.dataPeriodStartNs == life.getLong(0) && i.createdNs == life.getLong(0))
    assert(i.dataPeriodEndNs == life.getLong(1) && i.modifiedNs == life.getLong(1))
    assert(i.deltaTNs > 0L, "dt should be inferred from the measurement's deltas")
  }
}
