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
}
