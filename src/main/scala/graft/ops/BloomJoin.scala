package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PolyHash

/** Bloom-prefiltered semi-join — the manual form of the runtime bloom
  * pushdown that decides 100 TB join cost: build an `mBits` bloom filter
  * over the SMALL side's join keys, embed it in the big side's scan as a
  * literal-array predicate (pure codegen, no join, no shuffle), and let
  * the exact semi-join afterwards remove the bloom's false positives.
  * The bloom is invisible in the result (no false negatives by
  * construction) — its entire effect is that the big side's shuffle
  * carries only rows that can possibly match.
  *
  * Use this where Catalyst's own `spark.sql.optimizer.runtime.bloomFilter`
  * injection won't fire (a pre-aggregated or derived key, a small side
  * built mid-pipeline, a non-equi residual) — the plan shape is the same
  * one the optimizer would build.
  *
  * Scale: the filter is mBits/32 ints (2^18 bits = 32 KiB default) —
  * driver-built from the aggregated word map (metadata scale: ≤ mBits/32
  * rows collected, never the keys themselves) and shipped inside the
  * serialized plan like any literal.
  */
object BloomJoin {

  private def seeds(kHashes: Int): Seq[Long] = (0 until kHashes).map(j => 101L + j)

  /** Big-side rows passing the bloom — a SUPERSET of the exact semi-join
    * (false positives possible, false negatives impossible). Exposed so
    * tests and plan audits can measure the pre-filter's selectivity.
    */
  def bloomCandidates(big: DataFrame, small: DataFrame, keyCol: String,
      mBits: Int = 1 << 18, kHashes: Int = 3): DataFrame = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 64, got $mBits")
    require(kHashes >= 1 && kHashes <= 16, s"kHashes must be in [1,16], got $kHashes")
    val nWords = mBits / 32
    def positions(key: Column): Seq[Column] =
      seeds(kHashes).map(s => PolyHash(key.cast("string"), s) % mBits)
    val sparse = small
      .select(col(keyCol).as("__k")).where(col("__k").isNotNull).distinct()
      .select(explode(array(positions(col("__k")): _*)).as("p"))
      .select((col("p") / 32).cast("int").as("word_idx"),
        expr("shiftleft(1, CAST(p % 32 AS INT))").as("m"))
      .groupBy("word_idx").agg(expr("bit_or(m)").as("mask"))
      .collect().map(r => r.getInt(0) -> r.getAs[Int]("mask")).toMap
    val words = Array.tabulate(nWords)(i => sparse.getOrElse(i, 0))
    val wordsLit = lit(words)
    // shiftleft needs a literal count — a 32-entry power-of-two lookup
    // keeps the variable-bit test inside codegen
    val pow2 = lit(Array.tabulate(32)(i => 1 << i))
    val pass = positions(col(keyCol)).map { p =>
      (element_at(wordsLit, (p / 32).cast("int") + 1)
        .bitwiseAND(element_at(pow2, (p % 32).cast("int") + 1)) =!= 0)
    }.reduce(_ && _)
    big.where(col(keyCol).isNotNull && pass)
  }

  /** The exact semi-join with the bloom pre-filter in front: equals a
    * plain `left_semi` join bit for bit, shuffling only bloom survivors.
    */
  def semiJoin(big: DataFrame, small: DataFrame, keyCol: String,
      mBits: Int = 1 << 18, kHashes: Int = 3): DataFrame =
    bloomCandidates(big, small, keyCol, mBits, kHashes)
      .join(small.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
}
