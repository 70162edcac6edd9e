package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking over document TEXT — the sub-document dedup
  * face of the text family (the LBFS/FastCDC storage-dedup technique the
  * audio modality already has in [[Audio.cdcChunks]]).
  *
  * A chunk boundary falls AFTER character k wherever the rolling hash of
  * the last `window` codepoints is ≡ 0 mod 2^maskBits, so boundaries are
  * functions of LOCAL CONTENT: a doc with a sentence inserted at the front
  * re-synchronizes after one chunk, where fixed-width chunking (and the
  * whole-doc MinHash signature) misaligns every block. Two docs sharing a
  * long passage share its chunks regardless of WHERE the passage sits —
  * the signal behind boilerplate/quotation dedup at sub-document
  * granularity (suffix-array dedup à la Lee et al. 2022 approximated at
  * chunk resolution).
  *
  * Unlike the audio codec twin this is PURE COLUMN ALGEBRA — the codepoint
  * stream, the boundary scan, and the chunk folds are all Catalyst
  * `transform`/`filter`/`aggregate` over the string, so the whole chunker
  * runs map-only inside whole-stage codegen; the first exchange is the
  * dedup face's chunk-hash groupBy. Work is O(n·window) per doc.
  *
  * Everything is exact non-negative integer arithmetic mod 1e9+7 —
  * bit-reproducible cross-engine (the DuckDB twin folds the same
  * `(a·31 + c) mod p` over `ord` of the same char slices).
  */
object TextCdc {

  private val CdcMod = 1000000007L

  /** Per-doc content-defined chunks: (doc_id, chunk_idx, start,
    * n_chunk_chars, chunk_hash), chunks tiling [0, n) contiguously.
    * `start` is the 0-based char offset; chunk identity is the polynomial
    * fold of the chunk's codepoints. Expected chunk length 2^maskBits.
    */
  def cdcChunks(docs: DataFrame, window: Int = 4, maskBits: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(maskBits >= 1 && maskBits <= 20, s"maskBits must be in [1,20], got $maskBits")
    val modulus = 1L << maskBits
    val fold = s"(a, c) -> pmod(a * 31 + c, ${CdcMod}L)"
    val base = docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t"))
      .where(col("__t").isNotNull && length(col("__t")) > 0)
      .withColumn("__n", length(col("__t")).cast("long"))
      .withColumn("__cs",
        expr("transform(sequence(1L, __n), j -> CAST(ascii(substring(__t, CAST(j AS INT), 1)) AS BIGINT))"))
      // boundary ends: k in [window, n] where the window hash masks to 0,
      // plus the doc end; distinct+sort mirrors the oracle twin exactly
      .withColumn("__ends", expr(
        s"""array_sort(array_distinct(concat(
           |  filter(transform(sequence(${window}L, __n), k ->
           |    CASE WHEN aggregate(slice(__cs, CAST(k AS INT) - ${window - 1}, $window),
           |                        0L, $fold) % ${modulus}L = 0
           |         THEN k END), x -> x IS NOT NULL),
           |  array(__n))))""".stripMargin))
    base
      .select(col("doc_id"), col("__cs"), col("__ends"),
        posexplode(col("__ends")).as(Seq("__ci", "__end")))
      .withColumn("__start",
        expr("CASE WHEN __ci = 0 THEN 0L ELSE element_at(__ends, __ci) END"))
      .select(col("doc_id"), col("__ci").cast("int").as("chunk_idx"),
        col("__start").as("start"),
        (col("__end") - col("__start")).as("n_chunk_chars"),
        expr(s"""aggregate(slice(__cs, CAST(__start AS INT) + 1,
                 CAST(__end - __start AS INT)), 0L, $fold)""").as("chunk_hash"))
  }

  /** Sub-document near-duplicate pairs by shared content-defined chunks:
    * postings capped at `maxDf` (boilerplate chunks present everywhere
    * carry no pair signal and would quadratically blow the index), pairs
    * counted over the chunk-hash inverted index — the same candidate-only
    * scale shape as every LSH family here. Output (id_a, id_b, n_shared).
    */
  def cdcDups(docs: DataFrame, window: Int = 4, maskBits: Int = 5,
      minShared: Int = 3, maxDf: Int = 50,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minShared >= 1 && maxDf >= 2,
      s"need minShared >= 1, maxDf >= 2; got minShared=$minShared maxDf=$maxDf")
    val fps = cdcChunks(docs, window, maskBits, idCol, textCol)
      .select(col("doc_id").as("id"), col("chunk_hash")).distinct()
    val keep = fps.groupBy("chunk_hash").agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxDf).select("chunk_hash")
    val indexed = fps.join(keep, "chunk_hash")
    indexed.select(col("chunk_hash"), col("id").as("id_a"))
      .join(indexed.select(col("chunk_hash"), col("id").as("id_b")), "chunk_hash")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
