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

  /** The Hilbert index of two non-negative integer columns, `bits` bits
    * each — the space-filling curve with strictly better locality than
    * [[zValue]]'s Morton order (consecutive Hilbert indices are always
    * grid NEIGHBORS; Morton takes long diagonal jumps at power-of-two
    * boundaries), which is why Hilbert clustering gives tighter
    * per-file bounding boxes and better min/max pruning at the same
    * sort cost. Classic per-level transform (Hilbert 1891; the xy→d
    * walk with conditional reflect+swap is public-domain textbook
    * material), evaluated as ONE `aggregate()` fold over the bit
    * levels: the lambda is a constant-size expression applied `bits`
    * times per row at runtime — NOT an unrolled tree, which would grow
    * ~3^bits through the conditional rotations (and be re-inlined by
    * CollapseProject even if staged through projections).
    *
    * Level step, most-significant bit first (s = 2^level): rx/ry = the
    * coordinates' level bits; d += s²·((3·rx) xor ry); then if ry = 0,
    * reflect both coordinates within the s-cell when rx = 1 and swap
    * x↔y. Inputs outside [0, 2^bits) fail fast like [[zValue]].
    */
  def hilbertValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"hilbertValue needs bits in [1,31], got $bits")
    val lim = 1L << bits
    def checked(c: Column): Column =
      when(c.isNull || c < 0 || c >= lim, raise_error(format_string(
        s"hilbertValue: coordinate %s outside [0, $lim) — raise bits or rescale",
        c))).otherwise(c)
    val init = struct(checked(x.cast("long")).as("x"),
      checked(y.cast("long")).as("y"), lit(0L).as("d"))
    val folded = aggregate(
      array((bits - 1 to 0 by -1).map(l => lit(1L << l)): _*),
      init,
      (acc, s) => {
        val ax = acc.getField("x")
        val ay = acc.getField("y")
        val rx = when(ax.bitwiseAND(s) =!= 0, lit(1L)).otherwise(lit(0L))
        val ry = when(ay.bitwiseAND(s) =!= 0, lit(1L)).otherwise(lit(0L))
        val d2 = acc.getField("d") + s * s * (rx * lit(3L)).bitwiseXOR(ry)
        val fx = when(rx === 1, s - 1 - ax).otherwise(ax)
        val fy = when(rx === 1, s - 1 - ay).otherwise(ay)
        struct(
          when(ry === 0, fy).otherwise(ax).as("x"),
          when(ry === 0, fx).otherwise(ay).as("y"),
          d2.as("d"))
      })
    folded.getField("d")
  }

  /** [[clusterByZ]] on the Hilbert key: same one-shuffle range layout,
    * tighter per-partition rectangles (measured in LayoutSpec).
    */
  def clusterByHilbert(df: DataFrame, xCol: String, yCol: String, bits: Int,
      numPartitions: Int, hCol: String = "h"): DataFrame = {
    require(numPartitions >= 1, s"numPartitions must be >= 1, got $numPartitions")
    df.withColumn(hCol, hilbertValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numPartitions, col(hCol))
      .sortWithinPartitions(hCol)
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
  /** The measurable claim behind Z-ordering: the per-file min/max manifest
    * a lakehouse keeps for scan pruning, over a deterministic z-ordered
    * file assignment (rank z-value blocks with the sharded prefix scan —
    * `repartitionByRange` itself samples and is not replay-stable), plus
    * the skip verdicts for one x-range and one y-range predicate. Under a
    * z-sort BOTH dimensions' per-file bounding boxes stay tight, so both
    * predicates prune files from the SAME physical layout — the number
    * `skip_x_range`/`skip_y_range` quantify per file.
    *
    * Scale shape: one aggregate on the z key, the two-level prefix scan
    * (never a single-partition ordered pass over rows), one final
    * file-keyed rollup.
    */
  def skippingStats(df: DataFrame, xCol: String, yCol: String, bits: Int,
      rowsPerFile: Long, xRange: (Long, Long), yRange: (Long, Long),
      shardWidth: Long = 1L << 20): DataFrame = {
    require(rowsPerFile > 0, s"rowsPerFile must be positive, got $rowsPerFile")
    val z = df
      .select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("z", zValue(col("x"), col("y"), bits))
    val zstats = z.groupBy("z").agg(count(lit(1)).as("__cnt"),
      min("x").as("zx0"), max("x").as("zx1"),
      min("y").as("zy0"), max("y").as("zy1"))
    graft.pipeline.Prefix.runningSum(zstats, "z", "__cnt", shardWidth = shardWidth)
      .withColumn("file_id", expr(s"(__end - __cnt) div $rowsPerFile"))
      .groupBy("file_id")
      .agg(sum("__cnt").as("n_rows"),
        min("zx0").as("min_x"), max("zx1").as("max_x"),
        min("zy0").as("min_y"), max("zy1").as("max_y"))
      .withColumn("skip_x_range",
        col("max_x") < xRange._1 || col("min_x") > xRange._2)
      .withColumn("skip_y_range",
        col("max_y") < yRange._1 || col("min_y") > yRange._2)
  }

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
