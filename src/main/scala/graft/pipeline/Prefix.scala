package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exclusive/inclusive prefix sums over an id-ordered stream —
  * the primitive under sequence packing, compaction planning, and
  * token-budget sampling. A naive `sum(x) OVER (ORDER BY id)` is a
  * single-partition sort: one task owns every row of the corpus. The
  * textbook fix (Blelloch's scan, here in three Spark stages):
  *
  *  1. shard by `id div shardWidth` — shards are contiguous id ranges, so
  *     shard order == id order — and cumsum WITHIN each shard (parallel,
  *     one shuffle on the shard key);
  *  2. aggregate one total per shard (metadata scale: #shards rows) and
  *     prefix-scan THOSE on a single partition — trivially cheap;
  *  3. broadcast the shard prefixes back and add.
  *
  * Optional `groupCols` scope the scan (shard key becomes (group, shard)
  * and the metadata scan partitions by group), so per-source budgets don't
  * serialize on one task either.
  */
object Prefix {

  /** Append `endCol` = inclusive running sum of `valCol` in `idCol` order
    * (within `groupCols` if given). The exclusive prefix is
    * `endCol - valCol`. Values must be non-negative longs at the caller's
    * contract; ids need not be dense — only monotone with shard order.
    */
  def runningSum(df: DataFrame, idCol: String, valCol: String,
      groupCols: Seq[String] = Nil, shardWidth: Long = 1L << 20,
      endCol: String = "__end"): DataFrame = {
    require(shardWidth > 0, s"shardWidth must be positive, got $shardWidth")
    val grp = groupCols.map(col)
    val sharded = df.withColumn("__shard", expr(s"`$idCol` div $shardWidth"))
    val localW = Window.partitionBy((grp :+ col("__shard")): _*).orderBy(col(idCol))
    val local = sharded.withColumn("__local_end", sum(col(valCol)).over(localW))
    val prefW = Window.partitionBy(grp: _*).orderBy("__shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = sharded.groupBy((grp :+ col("__shard")): _*)
      .agg(sum(col(valCol)).as("__total"))
      .withColumn("__prefix", coalesce(sum("__total").over(prefW), lit(0L)))
      .drop("__total")
    local.join(broadcast(prefixes), groupCols :+ "__shard")
      .withColumn(endCol, col("__prefix") + col("__local_end"))
      .drop("__shard", "__local_end", "__prefix")
  }
}
