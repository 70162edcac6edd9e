package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns plus typed
  * metadata, with per-partition batched decode/feature-extraction.
  *
  * The Spark-side contract is real and tested — schema, partition sizing,
  * batch iteration, output shape. The actual codec is a clearly marked
  * STUB (`decodeStub`): the image/audio libraries are not in this
  * container, so it derives deterministic fake features from the bytes.
  * Swapping in a real decoder is a one-function change with the same
  * `Iterator[Row] => Iterator[Row]` shape (mapPartitions ≈ mapInPandas
  * batches in the PySpark world).
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Wrap a text corpus as a fake media table: `(doc_id, media binary,
    * media_meta struct)`. Stands in for reading real image/audio blobs.
    */
  def synthMediaTable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      encode(col(textCol), "utf-8").as("media"),
      struct(
        lit("fake/raw").as("format"),
        (length(col(textCol)) % 640).cast("int").as("width"),
        (length(col(textCol)) % 480).cast("int").as("height"),
        length(encode(col(textCol), "utf-8")).cast("long").as("n_bytes")
      ).as("media_meta"))

  /** STUB decoder: a real implementation would decode the blob; this derives
    * deterministic pseudo-features (byte-sum, first/last byte) so the
    * pipeline shape is testable end-to-end.
    */
  private def decodeStub(bytes: Array[Byte]): (Long, Int, Int) = {
    // ??? <- real codec goes here (e.g., JPEG decode); deterministic fake:
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
    (s, if (bytes.nonEmpty) bytes(0) & 0xff else -1,
      if (bytes.nonEmpty) bytes(bytes.length - 1) & 0xff else -1)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("byte_sum", LongType),
    StructField("first_byte", IntegerType),
    StructField("last_byte", IntegerType)))

  /** Batched per-partition feature extraction over the binary column. Rows
    * stream through the partition iterator — nothing is collected; at scale
    * partition sizing is controlled upstream via
    * `spark.sql.files.maxPartitionBytes` so each batch of blobs fits memory.
    */
  def extractFeatures(media: DataFrame, idCol: String = "doc_id",
      blobCol: String = "media"): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    val projected = media.select(col(idCol).cast("long"), col(blobCol))
    val out: Dataset[Row] = projected.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        val (s, f, l) = decodeStub(bytes)
        Row(id, bytes.length.toLong, s, f, l)
      }
    }(enc)
    out
  }
}
