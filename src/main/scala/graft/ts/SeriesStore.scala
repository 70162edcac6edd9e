package graft.ts

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ts.model.Period

/** Parquet warehouse of series points: one directory per container, the
  * Spark-native analog of the reference's DtsServer file containers
  * (reference: weather/service/dtss_host.py:141-151).
  *
  * Layout: `<warehouse>/<container>/` holds one partitioned parquet table
  * with the long point schema. We deliberately do NOT partition by
  * `series_id` on disk — at 100 TB with millions of series that would mean
  * millions of tiny directories/files. Instead the table is hash-distributed
  * by `series_id` into a bounded number of files and sorted by
  * `(series_id, ts)` *within* each file, so (a) per-series reads touch one
  * file's row groups, (b) parquet min/max stats on both columns let scans
  * skip row groups (predicate pushdown shows up as PushedFilters), and
  * (c) the merge shuffle partitioning is aligned with the file layout.
  */
final class SeriesStore(spark: SparkSession, warehouse: String, numBuckets: Int = 32) {

  def containerPath(container: String): String = s"$warehouse/$container"

  private def fs = new Path(warehouse).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(container: String): Boolean = fs.exists(new Path(containerPath(container)))

  /** Container auto-create (reference: weather/service/dtss_host.py:141-151). */
  def ensureContainer(container: String): Unit =
    fs.mkdirs(new Path(containerPath(container)))

  /** Full container scan; callers filter by id/period (filters push down). */
  def read(container: String): DataFrame =
    spark.read.schema(model.pointSchema).parquet(containerPath(container))

  /** Period-covering read of specific series
    * (reference: weather/service/dtss_host.py:197-208).
    */
  def read(container: String, ids: Seq[String], period: Period): DataFrame =
    read(container)
      .where(col("series_id").isin(ids: _*))
      .where(col("ts") >= period.startNs && col("ts") < period.endNs)

  /** Merge-store (K1): upsert points; `overwrite=false` is the reference's
    * `overwrite_on_write=False` point-level union — new points extend the
    * axis, colliding timestamps take the NEW value (last-writer-wins), and
    * untouched series/points survive
    * (reference: weather/service/data_collection_task.py:121-126, semantics
    * proven in weather/test/test_dtss_host.py:102-134).
    *
    * Scale: one shuffle on (series_id, ts) via the row_number window, which
    * AQE sizes at runtime; the rewrite is bounded per container, and at
    * cluster scale a container maps to a table where this becomes a
    * MERGE INTO on the same key. Idempotent: re-merging the same batch is a
    * no-op (T4 late/duplicate handling).
    */
  def merge(container: String, incoming: DataFrame, overwrite: Boolean = false): Unit = {
    val target = new Path(containerPath(container))
    val newData = incoming.select(
      col("series_id").cast("string"),
      col("ts").cast("long"),
      col("value").cast("double"))

    if (overwrite || !exists(container) || fs.listStatus(target).isEmpty) {
      write(newData, target)
      return
    }

    val merged = {
      val old = read(container).withColumn("__gen", lit(0))
      val nw = newData.withColumn("__gen", lit(1))
      // value.desc as secondary key: if one batch carries duplicate
      // (series_id, ts) rows the survivor is still deterministic.
      val w = Window.partitionBy("series_id", "ts")
        .orderBy(col("__gen").desc, col("value").desc)
      old.unionByName(nw)
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .drop("__rn", "__gen")
    }

    // Parquet can't be rewritten in place while being read: stage to a tmp
    // sibling, then swap directories. Both renames are checked — if the
    // second fails the backup is restored, so a crash mid-swap never leaves
    // the container without its data.
    val tmp = new Path(containerPath(container) + ".__tmp")
    write(merged, tmp)
    val bak = new Path(containerPath(container) + ".__old")
    if (fs.exists(bak)) fs.delete(bak, true)
    if (!fs.rename(target, bak))
      throw new java.io.IOException(s"merge: failed to move $target aside to $bak")
    if (!fs.rename(tmp, target)) {
      val restored = fs.rename(bak, target)
      throw new java.io.IOException(
        s"merge: failed to move $tmp into place" +
          (if (restored) s"; previous data restored at $target"
           else s"; RESTORE FAILED — previous data is at $bak"))
    }
    fs.delete(bak, true)
  }

  private def write(df: DataFrame, path: Path): Unit =
    df.repartition(numBuckets, col("series_id"))
      .sortWithinPartitions("series_id", "ts")
      .write.mode(SaveMode.Overwrite)
      .parquet(path.toString)
}
