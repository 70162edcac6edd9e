package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ts.{Identifiers, SeriesSource}
import graft.ts.model.{Period, TsInfo}

/** The station-API domain catalog and its fixture-backed paginated source —
  * the Spark-native re-expression of the reference's Netatmo layer
  * (reference: weather/data_sources/netatmo/domain.py:129-289,
  * repository.py:93-265).
  *
  * The raw "station config" payload is derived deterministically from the
  * `events` table (no network): one station per `user_id`, and the user's
  * event types alternate (by alphabetical rank) between measurements carried
  * by the station's own base unit and a single "Outdoor" module — so the
  * station-as-module split (domain.py:200-216), the nested→flat catalog
  * explode (start_collection_netatmo.py:59), the id↔catalog bind (J1), and
  * the paginated block fetch (S1/S2) are all exercised against real data and
  * are all expressible as an independent SQL oracle.
  */
object Netatmo {

  /** The fixed 10-row measurement-type dimension
    * (reference: weather/data_sources/netatmo/domain.py:110-123; all types
    * are POINT_INSTANT_VALUE).
    */
  val measurementTypes: Seq[(String, String)] = Seq(
    "Temperature" -> "°C", "CO2" -> "ppm", "Humidity" -> "%",
    "Pressure" -> "mbar", "Noise" -> "db", "Rain" -> "mm",
    "WindStrength" -> "km/h", "WindAngle" -> "angles",
    "Guststrength" -> "km/h", "GustAngle" -> "angles")

  def measurementDimension(spark: SparkSession): DataFrame = {
    import spark.implicits._
    measurementTypes.toDF("data_type", "unit")
      .withColumn("point_fx", lit("instant"))
  }

  /** Nested raw station config — the fixture stand-in for the station-data
    * API payload. Schema mirrors the reference's 3-level nesting: station
    * fields + place struct + `modules: array<struct>`; the station's OWN
    * `data_type` list holds the measurements of the base unit
    * (domain.py:184-239).
    */
  def rawConfig(events: DataFrame): DataFrame = {
    // Per-measurement lifetime, rolled up per module below: the fixture
    // analog of the payload's module `last_setup`/`last_seen` timestamps
    // (domain.py:200-216 carries them per module; repository.py:292-301
    // surfaces them as the TsInfo data period).
    val et = events.groupBy(col("user_id"), col("event_type"))
      .agg(min("ts").as("t0"), max("ts").as("t1"))
    val ranked = et.withColumn("rnk",
      row_number().over(Window.partitionBy("user_id").orderBy("event_type")))
    ranked
      .withColumn("on_station", col("rnk") % 2 === 1)
      .groupBy("user_id")
      .agg(
        sort_array(collect_list(when(col("on_station"), col("event_type"))))
          .as("station_types"),
        sort_array(collect_list(when(!col("on_station"), col("event_type"))))
          .as("module_types"),
        min(when(col("on_station"), col("t0"))).as("station_setup"),
        max(when(col("on_station"), col("t1"))).as("station_seen"),
        min(when(!col("on_station"), col("t0"))).as("module_setup"),
        max(when(!col("on_station"), col("t1"))).as("module_seen"))
      .select(
        col("user_id"),
        concat(lit("station:"), col("user_id")).as("_id"),
        concat(lit("Station "), col("user_id")).as("station_name"),
        lit("Main").as("module_name"),
        col("station_types").as("data_type"),
        col("station_setup").as("last_setup"),
        col("station_seen").as("last_seen"),
        struct(
          lit(10.0).as("altitude"), lit("Oslo").as("city"), lit("NO").as("country"),
          lit("Europe/Oslo").as("timezone"),
          array(lit(10.75), lit(59.91)).as("location")).as("place"),
        when(size(col("module_types")) > 0,
          array(struct(
            concat(lit("module:"), col("user_id")).as("_id"),
            lit("Outdoor").as("module_name"),
            col("module_types").as("data_type"),
            col("module_setup").as("last_setup"),
            col("module_seen").as("last_seen"))))
          .otherwise(array().cast(
            "array<struct<_id:string,module_name:string,data_type:array<string>," +
              "last_setup:bigint,last_seen:bigint>>"))
          .as("modules"))
  }

  /** Station-as-module split + nested→flat catalog: the station's own
    * measurement fields become a synthetic FIRST module that reuses the
    * station id (domain.py:200-216), then modules and their data_type lists
    * are exploded into one row per measurement — the triple
    * list-comprehension of start_collection_netatmo.py:59 — with source and
    * store identifiers built per the id grammar (identifiers.py:32-43).
    */
  def catalog(raw: DataFrame): DataFrame = {
    val mods = raw.select(
      col("user_id"),
      col("_id").as("station_id"), col("station_name"), col("place"),
      explode(concat(
        array(struct(
          col("_id").as("module_id"),
          col("module_name").as("module_name"),
          col("data_type").as("data_type"),
          col("last_setup").as("last_setup"),
          col("last_seen").as("last_seen"))),
        transform(col("modules"), m => struct(
          m.getField("_id").as("module_id"),
          m.getField("module_name").as("module_name"),
          m.getField("data_type").as("data_type"),
          m.getField("last_setup").as("last_setup"),
          m.getField("last_seen").as("last_seen"))))).as("m"))
    mods
      .select(col("user_id"), col("station_id"), col("station_name"),
        col("place"), col("m.module_id").as("module_id"),
        col("m.module_name").as("module_name"),
        col("m.last_setup").as("last_setup"),
        col("m.last_seen").as("last_seen"),
        explode(col("m.data_type")).as("data_type"))
      .withColumn("source_id",
        Identifiers.netatmoId(col("station_name"), col("module_name"), col("data_type")))
      .withColumn("store_id",
        Identifiers.storeId("netatmo", col("station_name"), col("module_name"), col("data_type")))
      .withColumn("tz", col("place.timezone"))
  }

  /** P4 catalog lookup: (station_name, module_name, data_type) → measurement
    * row, the chained point query of domain.py:277-289/:218-224/:159-166.
    */
  def lookup(cat: DataFrame, station: String, module: String, dataType: String): DataFrame =
    cat.where(col("station_name") === station)
      .where(col("module_name") === module)
      .where(col("data_type") === dataType)
}

/** netatmo:// source: catalog bind (J1) + per-module paginated fetch (S1-S3)
  * against the events-parquet-backed fixture "device API".
  *
  * `eventsPoints` must have columns (user_id, event_type, ts:LongNs, value)
  * — used for metadata (find's dt inference); the paginated DATA path reads
  * the fixture file through the [[NetatmoV2]] DataSource V2 scan, whose
  * `planInputPartitions` turns the reference's sequential block-cursor loop
  * (repository.py:150-200) into per-block input partitions. No driver-side
  * probe action remains on the read path.
  */
final class NetatmoSource(catalogDf: DataFrame, eventsPoints: DataFrame,
    eventsPath: String, blockSize: Int = 1024) extends SeriesSource {

  val name = "netatmo"

  /** Paginated fetch (S1+S2): the V2 scan emits every block of the module's
    * axis in long format; the engine-side column algebra reconstructs the
    * API's row-major surface — the shared per-module time axis × requested
    * measurements grid (pivot transpose P6, repository.py:142-143) with
    * missing cells as NaN (P5, repository.py:88-91).
    */
  def getMeasurements(userId: Long, types: Seq[String], period: Period): DataFrame = {
    val spark = eventsPoints.sparkSession
    val raw = spark.read.format("graft-netatmo")
      .option("path", eventsPath)
      .option("userId", userId)
      .option("types", types.mkString(","))
      .option("startNs", period.startNs)
      .option("endNs", period.endNs)
      .option("blockSize", blockSize)
      .load()
    // The API surface is one CELL per (axis point, measurement): should two
    // raw readings ever land on the same grid cell (e.g. distinct ns
    // timestamps truncating to one µs tick), the pivot semantics keep the
    // max — same collapse the row-major pivot applied (P6).
    val vals = raw.groupBy("ts", "data_type").agg(max("value").as("value"))
    val axis = vals.select("ts").distinct()
    val typesDf = spark.createDataset(types)(
      org.apache.spark.sql.Encoders.STRING).toDF("data_type")
    axis.crossJoin(broadcast(typesDf))
      .join(vals, Seq("ts", "data_type"), "left")
      .withColumn("value", coalesce(col("value"), lit(Double.NaN)))
      .select(col("ts"), col("data_type"), col("value"))
  }

  /** Read callback (S3, repository.py:220-265): parse ids (P2), bind to the
    * catalog (J1 — the catalog is metadata-scale, so the bind for the
    * requested handful of ids is a driver-side lookup against a collected
    * broadcast copy), group by (station, module) so N series on one module
    * cost ONE paginated fetch with only the requested measurement columns
    * (request coalescing + projection pushdown, repository.py:242-255), and
    * re-key rows to the verbatim requested ids.
    */
  def read(spark: SparkSession, ids: Seq[String], period: Period): DataFrame = {
    val parsed: Seq[(String, Map[String, String])] =
      ids.map(id => id -> Identifiers.parseNetatmoIdStr(id))
    val cat = catalogDf
      .select("station_name", "module_name", "data_type", "user_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    val bound = parsed.map { case (id, p) =>
      val key = (p("station_name"), p("module_name"), p("data_type"))
      val uid = cat.getOrElse(key,
        throw new IllegalArgumentException(s"id not in catalog: $id"))
      (id, uid, p("module_name"), p("data_type"))
    }
    // One lazy V2 scan per module — no driver actions here at all (the old
    // per-block probe loop is gone); Spark schedules every module's block
    // partitions together when the unioned plan executes.
    val groups = bound.groupBy { case (_, uid, module, _) => (uid, module) }.toSeq
    val parts = groups.map { case ((uid, _), group) =>
      val types = group.map(_._4).distinct
      val fetched = getMeasurements(uid, types, period)
      val keyMap = group.map { case (id, _, _, dt) => (dt, id) }
      fetched
        .join(
          broadcast(spark.createDataFrame(keyMap).toDF("data_type", "series_id")),
          Seq("data_type"))
        .select(col("series_id"), col("ts"), col("value"))
    }
    parts.reduce(_ unionByName _)
  }

  /** Metadata find (repository.py:279-306): parse the query id, bind the
    * catalog measurement, emit one TsInfo with the station's Olson tz, the
    * module's lifetime as data period / created / modified
    * (`data_period=[module.last_setup, module.last_seen]`,
    * repository.py:292-301), and the measurement's modal delta as delta_t
    * (the reference emits NaN there because the real API carries no dt;
    * the fixture API can infer it, matching the store-side find and A3).
    * Metadata-scale result: the collects are deliberate.
    */
  def find(spark: SparkSession, query: String): Seq[TsInfo] = {
    val p = Identifiers.parseNetatmoIdStr(query)
    val hits = Netatmo.lookup(catalogDf, p("station_name"), p("module_name"), p("data_type"))
      .select("source_id", "tz", "user_id", "data_type", "last_setup", "last_seen")
    // ONE job: semi-join the point table down to the matched measurements,
    // infer each one's modal delta, and join it back onto the hits — instead
    // of a lookup collect plus one dtMode job per hit.
    val dt = graft.ts.SeriesOps.dtMode(
      eventsPoints
        .join(broadcast(hits.select(
          col("user_id"), col("data_type").as("event_type"))), Seq("user_id", "event_type"), "left_semi")
        .select(concat(col("user_id"), lit("/"), col("event_type")).as("series_id"),
          col("ts"), col("value")))
    hits
      .join(broadcast(dt), concat(col("user_id"), lit("/"), col("data_type")) === col("series_id"), "left")
      .collect().toSeq.map { r =>
        TsInfo(
          name = r.getAs[String]("source_id"),
          pointFx = "instant",
          deltaTNs = Option(r.getAs[java.lang.Long]("dt_mode_ns")).map(_.toLong).getOrElse(0L),
          olsonTzId = r.getAs[String]("tz"),
          dataPeriodStartNs = r.getAs[Long]("last_setup"),
          dataPeriodEndNs = r.getAs[Long]("last_seen"),
          createdNs = r.getAs[Long]("last_setup"),
          modifiedNs = r.getAs[Long]("last_seen"))
      }
  }
}
