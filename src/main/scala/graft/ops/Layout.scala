package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering keys.
  *
  * At 100 TB the scan you avoid is worth more than the one you optimize: a
  * table sorted on one key prunes row groups only for predicates on THAT
  * key. Interleaving the bits of two keys (Morton order) makes rows close
  * in EITHER dimension land close on disk, so parquet min/max stats prune
  * scans for per-user time ranges AND per-day user sets from the same
  * physical layout — the technique behind Delta/Iceberg `ZORDER BY`
  * (public: Morton 1966; Databricks/Iceberg docs describe the same
  * application). The curve math is pure bit algebra, deterministic, and
  * twin-SQL verifiable; the clustering itself is one range repartition.
  */
object Layout {

  /** The Morton/Z-value of two non-negative integer columns, `bits` bits
    * each: bit b of x lands at position 2b, bit b of y at 2b+1 — the
    * classic bit interleave, as a codegen-friendly fixed OR chain (no UDF,
    * no loop at runtime). Inputs outside [0, 2^bits) fail fast rather than
    * silently truncating into a wrong curve position.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zValue needs bits in [1,31], got $bits")
    val lim = 1L << bits
    def checked(c: Column): Column =
      when(c.isNull || c < 0 || c >= lim, raise_error(format_string(
        s"zValue: coordinate %s outside [0, $lim) — raise bits or rescale",
        c))).otherwise(c)
    val cx = checked(x.cast("long"))
    val cy = checked(y.cast("long"))
    (0 until bits).map { b =>
      shiftleft(shiftright(cx, b).bitwiseAND(lit(1L)), 2 * b)
        .bitwiseOR(shiftleft(shiftright(cy, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Cluster a DataFrame along the Z-curve of two columns: range-partition
    * on the z-value, sort within partitions, keep the key as `zCol`. Each
    * output partition (→ parquet file) then spans a small rectangle of
    * (x, y) space, so BOTH columns' min/max file stats become selective —
    * the property the LayoutSpec measures on real written files. One
    * shuffle (the range exchange samples z bounds), one local sort; at any
    * scale this is the same cost as sorting by a single key.
    */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String, bits: Int,
      numPartitions: Int, zCol: String = "z"): DataFrame = {
    require(numPartitions >= 1, s"numPartitions must be >= 1, got $numPartitions")
    df.withColumn(zCol, zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(zCol)
  }

  /** Small-file compaction planner: walk the table in `idCol` order and
    * roll to a new output file every time the running byte total crosses a
    * multiple of `targetBytes` — i.e. `file_id = exclusive_prefix div
    * target`, the rolling-writer policy behind every lakehouse OPTIMIZE /
    * compaction job (Delta/Iceberg bin-packing docs describe the same
    * greedy fill). Each planned file covers one target-sized cell of the
    * packed byte stream: no file exceeds target + one document, a document
    * larger than the target lands alone, and ids never interleave across
    * files (a file following an overshoot is smaller — the grid absorbs
    * overshoot instead of drifting). Returns the file manifest — one row per
    * planned file with its doc range and exact size — which is what a
    * compaction executor actually consumes (the per-doc assignment is
    * `file_id` on the prefix frame; the manifest is its groupBy).
    *
    * Scale: the order walk is [[graft.pipeline.Prefix.runningSum]] — the
    * sharded scan, no single-task window — and the manifest aggregation
    * keys on `file_id`, which the prefix construction makes contiguous.
    */
  def compactionPlan(df: DataFrame, targetBytes: Long,
      idCol: String = "doc_id", sizeCol: String = "n_chars",
      shardWidth: Long = 1L << 20): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val sized = df.select(col(idCol), col(sizeCol).cast("long").as("__bytes"))
      .where(col("__bytes") > 0)
    graft.pipeline.Prefix.runningSum(sized, idCol, "__bytes", shardWidth = shardWidth)
      .withColumn("file_id", expr(s"(__end - __bytes) div $targetBytes"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_docs"), sum("__bytes").as("total_bytes"),
        min(col(idCol)).as("min_doc"), max(col(idCol)).as("max_doc"))
  }
}
