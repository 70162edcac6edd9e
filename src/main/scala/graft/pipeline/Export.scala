package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data export sinks: sharded JSONL (the lingua franca format
  * downstream tokenizer/training jobs consume) with deterministic
  * id-hash sharding, and the symmetric reader.
  *
  * Scale shape: the shard count controls file sizes independently of the
  * upstream partitioning (one hash shuffle), shards are written in
  * parallel, and the reader hands Spark an EXPLICIT schema so no
  * inference scan touches the data. JSON string escaping is symmetric in
  * the writer/reader pair, so a write→read round trip is lossless for any
  * UTF-8 payload (oracle-verified end-to-end by `sink_jsonl_roundtrip`,
  * which hash-compares the re-read export against the source table).
  */
object Export {

  /** Write `df` as up to `shards` JSONL part files under `path`
    * (overwrite; a shard that hashes empty writes no file).
    */
  def writeJsonl(df: DataFrame, path: String, shards: Int,
      idCol: String = "doc_id"): Unit = {
    require(shards > 0, s"shards must be positive, got $shards")
    df.repartition(shards, col(idCol))
      .write.mode("overwrite").json(path)
  }

  /** Read a JSONL export with an explicit DDL schema (no inference pass);
    * malformed lines fail loudly (FAILFAST) — an export we just wrote has
    * no excuse for undecodable rows.
    */
  def readJsonl(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.schema(schemaDdl).option("mode", "FAILFAST").json(path)

  /** Deterministic per-epoch global shuffle for training export: each row
    * gets a `shard_id` and an in-shard `shard_pos` from a Carter–Wegman
    * hash of (id, epoch) — the epoch enters as a salt through the same
    * universal-hash map as [[Sampling.bucketOf]] (multiplicative, NOT
    * concatenative: PolyHash is linear in its input, so suffixing the
    * epoch would shift every key by a constant and epochs would replay
    * the same order). Training loaders need a DIFFERENT but REPRODUCIBLE
    * order every epoch; `df.orderBy(rand())` is neither (layout-dependent
    * and unseedable across retries).
    *
    * Scale shape: the key is narrow column algebra in the scan; the only
    * shuffle is the shard partitioning, and the in-shard ranking windows
    * per shard — at 100 TB the shard count scales with the corpus (shards
    * ARE the output files, sized to fit a task), so no window exceeds one
    * file's rows. Hash ties break by id: the order is total and
    * engine-independent.
    */
  def epochShuffle(df: DataFrame, epoch: Int, nShards: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val salt = s"epoch_$epoch"
    val key = ((graft.functions.PolyHash(col(idCol).cast("string"), 0L)
      * Sampling.saltMult(salt) + Sampling.saltAdd(salt))
      % graft.functions.PolyHash.Mod)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard_id").orderBy(col("__key"), col(idCol))
    df.withColumn("__key", key)
      .withColumn("shard_id", (col("__key") % nShards).cast("int"))
      .withColumn("shard_pos", row_number().over(w))
      .drop("__key")
  }
}
