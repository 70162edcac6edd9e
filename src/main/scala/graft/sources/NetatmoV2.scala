package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 form of the paginated station-API block fetch (S2,
  * reference: weather/data_sources/netatmo/repository.py:150-200).
  *
  * The reference advances a `start` cursor one past each block's last
  * returned point, one sequential API round trip at a time. Spark-first,
  * pagination is PLANNING metadata, not a driver loop: ONE metadata pass in
  * `planInputPartitions` resolves the module's shared time axis into block
  * boundary offsets (`ceil(n_axis / blockSize)` blocks), and each
  * `InputPartition` then fetches its own block independently on an
  * executor — the blocks of one module run in parallel, and no driver
  * `.collect()` probe ever executes.
  *
  * {{{
  *   spark.read.format("graft-netatmo")
  *     .option("path", eventsParquet).option("userId", 7)
  *     .option("types", "click,view").option("blockSize", 1024)
  *     .option("startNs", t0).option("endNs", t1)
  *     .load()   // => (ts, data_type, value), long format
  * }}}
  *
  * [[FixtureDeviceApi]] is the device-API stand-in: it streams the module's
  * rows straight from the fixture parquet file WITHOUT Spark (plain
  * parquet-hadoop reads), because that is exactly the shape of a production
  * connector — the driver's metadata call and each executor's page fetch
  * talk to an external service, not to the cluster. Swapping the fixture
  * for an HTTP client changes only this object.
  */
class NetatmoV2 extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-netatmo"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = NetatmoV2.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new NetatmoPagedTable(new CaseInsensitiveStringMap(properties))
}

object NetatmoV2 {
  /** One module block in long format: the engine-side transpose (P6) and
    * NaN fill (P5) happen on top of this, in the engine's column algebra.
    */
  val schema: StructType = StructType(Seq(
    StructField("ts", LongType, nullable = false),
    StructField("data_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))
}

/** Fixture device API: filtered streaming reads of the events parquet via
  * parquet-hadoop (no SparkSession — callable from query planning on the
  * driver and from page readers on executors alike). The read is a real
  * pushdown read: only the four needed columns are materialized
  * (`parquet.read.schema` projection) and the `user_id` equality is a
  * parquet FilterPredicate, so row groups whose stats exclude the user are
  * skipped entirely. Timestamps are truncated to the µs grid the engine's
  * `eventsUs` view uses.
  */
private[sources] object FixtureDeviceApi {

  private def files(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted.toSeq
    else Seq(path)
  }

  private val Projection =
    """message graft_projection {
      |  optional int64 ts;
      |  optional int64 user_id;
      |  optional binary event_type (UTF8);
      |  optional double value;
      |}""".stripMargin

  /** ns-per-tick of the file's `ts` column, from the parquet footer's logical
    * type annotation: TIMESTAMP(NANOS) → 1, MICROS → 1e3, MILLIS → 1e6; a
    * plain INT64 column is epoch-ns by the engine's convention. Absorbing the
    * unit here keeps the connector correct across testdata regenerations that
    * change the writer's physical type (µs vs ns), exactly like the Spark-side
    * `Tables.events` normalization.
    */
  /** Memoized per file path: the unit cannot change for a written file, and
    * the per-block-partition scan path calls [[moduleEvents]] once per
    * block — without the cache every block would re-open and re-parse the
    * same footer just to learn the unit. Unbounded growth is not a concern
    * at fixture scale (one entry per distinct parquet file); executors each
    * warm their own map.
    */
  private val tsUnitCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private def tsUnitScaleNs(file: String, conf: Configuration): Long =
    tsUnitCache.computeIfAbsent(file, _ => {
      import org.apache.parquet.schema.LogicalTypeAnnotation
      val in = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(file), conf))
      try {
        val schema = in.getFileMetaData.getSchema
        schema.getType(schema.getFieldIndex("ts"))
          .asPrimitiveType().getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation => t.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.NANOS  => 1L
            case LogicalTypeAnnotation.TimeUnit.MICROS => 1000L
            case LogicalTypeAnnotation.TimeUnit.MILLIS => 1000000L
          }
          case _ => 1L
        }
      } finally in.close()
    })

  /** One shared Configuration for every fixture read: `new Configuration()`
    * re-parses the Hadoop default XML resources on each construction
    * (visible in driver stack samples as wstx/BasicStreamReader frames under
    * planInputPartitions), and every call sets the SAME projection — the
    * per-call state (the filter predicate) never lives in the conf. Readers
    * only read from it, so sharing is safe.
    *
    * READ-ONLY INVARIANT: this conf is shared across driver planning and all
    * executor task threads. It is safe exactly as long as no reader builder
    * call site SETS per-read keys on it — today the filter goes via
    * `withFilter` and the projection is the one constant key set here. If a
    * parquet upgrade or a new call site ever needs a per-read conf key, hand
    * that reader `new Configuration(readConf)` (the copy constructor skips
    * the XML re-parse that motivated the sharing) instead of mutating this.
    */
  private lazy val readConf: Configuration = {
    val c = new Configuration()
    c.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA, Projection)
    c
  }

  /** Stream one module's (ts, event_type, value) rows within [startNs, endNs). */
  def moduleEvents(path: String, userId: Long, types: Set[String],
      startNs: Long, endNs: Long)(f: (Long, String, Double) => Unit): Unit =
    files(path).foreach { file =>
      import org.apache.parquet.filter2.predicate.FilterApi
      val conf = readConf
      val scale = tsUnitScaleNs(file, conf)
      val tsCol = FilterApi.longColumn("ts")
      // Raw-tick superset of the µs-grid ns window: raw ticks satisfy
      // raw*scale ∈ (startNs - 1000, endNs + 1000) (the ±1000 absorbs the
      // µs-grid truncation, which moves a value by < 1000 ns whatever the
      // sign — JVM division truncates toward zero). In file units that is
      // raw > floor((startNs-1000)/scale) - 1 and raw < floor((endNs+1000)/
      // scale) + 1 — a block partition's parquet scan then skips row groups
      // whose ts stats lie outside ITS block, instead of re-reading the
      // module's whole history per block (exact µs-grid filtering still
      // happens below).
      var pred: org.apache.parquet.filter2.predicate.FilterPredicate =
        FilterApi.eq(FilterApi.longColumn("user_id"), java.lang.Long.valueOf(userId))
      if (startNs >= Long.MinValue + 1000L)
        pred = FilterApi.and(pred, FilterApi.gt(tsCol,
          java.lang.Long.valueOf(Math.floorDiv(startNs - 1000L, scale) - 1L)))
      if (endNs <= Long.MaxValue - 1000L)
        pred = FilterApi.and(pred, FilterApi.lt(tsCol,
          java.lang.Long.valueOf(Math.floorDiv(endNs + 1000L, scale) + 1L)))
      val reader = ParquetReader.builder(new GroupReadSupport(), new Path(file))
        .withConf(conf)
        .withFilter(org.apache.parquet.filter2.compat.FilterCompat.get(pred))
        .build()
      try {
        var g = reader.read()
        while (g != null) {
          if (g.getFieldRepetitionCount("event_type") > 0 &&
              types.contains(g.getString("event_type", 0)) &&
              g.getFieldRepetitionCount("ts") > 0 &&
              g.getFieldRepetitionCount("value") > 0) {
            // µs grid (eventsUs twin), after widening file ticks to epoch-ns
            val ts = (g.getLong("ts", 0) * scale / 1000L) * 1000L
            if (ts >= startNs && ts < endNs)
              f(ts, g.getString("event_type", 0), g.getDouble("value", 0))
          }
          g = reader.read()
        }
      } finally reader.close()
    }
}

private[sources] class NetatmoPagedTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_netatmo"
  override def schema(): StructType = NetatmoV2.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new java.util.HashMap[String, String]()
    merged.putAll(options)
    merged.putAll(o)
    new NetatmoScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

private[sources] class NetatmoScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private val path = Option(options.get("path")).getOrElse(
    throw new IllegalArgumentException("graft-netatmo requires option 'path'"))
  // fail fast like 'path': a silently-defaulted user id reads as "module
  // has no data" instead of surfacing the misconfiguration
  private val userId = Option(options.get("userId")).map(_.toLong).getOrElse(
    throw new IllegalArgumentException("graft-netatmo requires option 'userId'"))
  private val types: Seq[String] =
    Option(options.get("types")).map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq.empty)
  private val startNs = options.getLong("startNs", Long.MinValue / 2)
  private val endNs = options.getLong("endNs", Long.MaxValue / 2)
  private val blockSize = options.getInt("blockSize", 1024)
  private var required: StructType = NetatmoV2.schema

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-netatmo user=$userId types=[${types.mkString(",")}] blockSize=$blockSize"

    /** The S2 cursor loop as offsets: one metadata pass resolves the
      * module's shared axis into per-block [lo, hi] ts bounds. Driver
      * state after the pass is O(n_axis / blockSize) boundary pairs.
      */
    override def planInputPartitions(): Array[InputPartition] = {
      val axis = new java.util.TreeSet[java.lang.Long]()
      FixtureDeviceApi.moduleEvents(path, userId, types.toSet, startNs, endNs) {
        (ts, _, _) => axis.add(ts); ()
      }
      if (axis.isEmpty) return Array.empty
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var lo = 0L
      var last = 0L
      var i = 0
      val it = axis.iterator()
      while (it.hasNext) {
        val t = it.next().longValue()
        if (i % blockSize == 0) {
          if (i > 0) bounds += ((lo, last))
          lo = t
        }
        last = t
        i += 1
      }
      bounds += ((lo, last))
      bounds.map { case (l, h) =>
        NetatmoPage(path, userId, types, l, h, required.fieldNames.toSeq): InputPartition
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      (partition: InputPartition) => {
        val pg = partition.asInstanceOf[NetatmoPage]
        new PartitionReader[InternalRow] {
          // One buffered page fetch per partition — the API-response analog;
          // bounded by blockSize axis points × requested measurement types.
          private val rows = {
            val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Double)]
            FixtureDeviceApi.moduleEvents(pg.path, pg.userId, pg.types.toSet,
              pg.loTs, if (pg.hiTs == Long.MaxValue) Long.MaxValue else pg.hiTs + 1) {
              (ts, et, v) => buf += ((ts, et, v)); ()
            }
            buf.iterator
          }
          private var cur: (Long, String, Double) = _
          override def next(): Boolean =
            if (rows.hasNext) { cur = rows.next(); true } else false
          override def get(): InternalRow =
            InternalRow.fromSeq(pg.columns.map {
              case "ts"        => cur._1
              case "data_type" => UTF8String.fromString(cur._2)
              case "value"     => cur._3
            })
          override def close(): Unit = ()
        }
      }
  }
}

private[sources] final case class NetatmoPage(path: String, userId: Long,
    types: Seq[String], loTs: Long, hiTs: Long, columns: Seq[String]) extends InputPartition
