package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: lay the corpus tokens end-to-end in deterministic
  * `idCol` order and cut the stream into fixed `capacity`-token training
  * windows — the concat-and-chunk packing LLM pretraining uses to turn
  * variable-length documents into full context windows with zero padding.
  * A document whose span crosses a window boundary is SPLIT: it emits one
  * row per overlapped window with the half-open token range
  * `[tok_start, tok_end)` of its own tokens that lands there.
  *
  * The interesting part at 100 TB is the global prefix sum, delegated to
  * [[Prefix.runningSum]] (the sharded scan: per-shard cumsum, metadata-
  * scale shard-prefix pass, broadcast add — never a single-partition sort
  * over the corpus).
  *
  * Empty documents (zero tokens) occupy no span and are dropped. Token
  * offsets are exact longs throughout (`div`, not floating division).
  */
object Packing {

  def packSequences(df: DataFrame, capacity: Long, shardWidth: Long = 1L << 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val lens = df
      .select(col(idCol), TextOps.tokenCount(col(textCol)).cast("long").as("n_toks"))
      .where(col("n_toks") > 0)
    val placed = Prefix.runningSum(lens, idCol, "n_toks", shardWidth = shardWidth)
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
