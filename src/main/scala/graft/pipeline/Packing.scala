package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay the corpus tokens end-to-end in deterministic
  * `idCol` order and cut the stream into fixed `capacity`-token training
  * windows — the concat-and-chunk packing LLM pretraining uses to turn
  * variable-length documents into full context windows with zero padding.
  * A document whose span crosses a window boundary is SPLIT: it emits one
  * row per overlapped window with the half-open token range
  * `[tok_start, tok_end)` of its own tokens that lands there.
  *
  * The interesting part at 100 TB is the global prefix sum: a naive
  * `sum(len) OVER (ORDER BY id)` is a single-partition sort — one task
  * owns every row. Here the scan is the textbook distributed prefix sum:
  *
  *  1. shard by `id div shardWidth` (shards are contiguous id ranges, so
  *     shard order == id order) and cumsum WITHIN each shard — parallel,
  *     one shuffle on the shard key;
  *  2. aggregate one total per shard (metadata-scale: #shards rows) and
  *     prefix-scan THOSE on a single partition — trivially cheap;
  *  3. broadcast the shard prefixes back and add.
  *
  * Empty documents (zero tokens) occupy no span and are dropped. Token
  * offsets are exact longs throughout (`div`, not floating division).
  */
object Packing {

  def packSequences(df: DataFrame, capacity: Long, shardWidth: Long = 1L << 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(shardWidth > 0, s"shardWidth must be positive, got $shardWidth")
    val lens = df
      .select(col(idCol), TextOps.tokenCount(col(textCol)).cast("long").as("n_toks"))
      .where(col("n_toks") > 0)
      .withColumn("__shard", expr(s"`$idCol` div $shardWidth"))
    val localW = Window.partitionBy("__shard").orderBy(col(idCol))
    val local = lens.withColumn("__local_end", sum("n_toks").over(localW))
    // one row per shard; the only cross-shard sequential step runs over
    // THIS frame (thousands of rows for trillions of documents)
    val prefW = Window.orderBy("__shard").rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = local.groupBy("__shard").agg(sum("n_toks").as("__total"))
      .withColumn("__prefix", coalesce(sum("__total").over(prefW), lit(0L)))
      .drop("__total")
    val placed = local.join(broadcast(prefixes), Seq("__shard"))
      .withColumn("__end", col("__prefix") + col("__local_end"))
      .withColumn("__start", col("__end") - col("n_toks"))
    placed
      .withColumn("chunk_id", explode(sequence(
        expr(s"__start div $capacity"), expr(s"(__end - 1) div $capacity"))))
      .select(col(idCol), col("n_toks"), col("chunk_id"),
        (greatest(col("chunk_id") * capacity, col("__start")) - col("__start"))
          .as("tok_start"),
        (least((col("chunk_id") + lit(1L)) * capacity, col("__end")) - col("__start"))
          .as("tok_end"))
  }
}
