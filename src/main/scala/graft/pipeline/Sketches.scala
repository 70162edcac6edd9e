package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PolyHash

/** Deterministic cardinality sketches for corpus-scale profiling.
  *
  * At 100 TB an exact `count(DISTINCT user_id)` per group shuffles every
  * distinct value to its group's reducer; a KMV (k-minimum-values) sketch
  * answers the same question to within ~1/sqrt(k-2) relative error while
  * shuffling at most k values per group per map partition. Unlike
  * HyperLogLog (Spark's `approx_count_distinct`), KMV over a fixed hash is
  * fully deterministic given the data — the same estimate on every engine
  * and every layout — which is what makes it twin-SQL verifiable and safe
  * to diff across pipeline runs ("did distinct users really drop 10%?").
  */
object Sketches {

  /** K-minimum-values distinct-count estimate per group.
    *
    * Hashes `valueCol` (as its canonical string form) through a two-stage
    * mixer: [[PolyHash]], then the Carter–Wegman affine map `(a·h + b)
    * mod p` (salt "kmv", same family as [[Sampling.bucketOf]]), then a
    * second PolyHash over the affine value's ZERO-PADDED 10-digit decimal
    * form. Both extra stages are REQUIRED, not decoration — this is an
    * order-statistics use of the hash, far more uniformity-sensitive than
    * sampling buckets: the raw polynomial hash of a short string never
    * wraps the modulus (a 5-char id stays below 31⁴·255 ≈ 2.4e8), so raw
    * mins sit in a narrow band and the estimate lands orders of magnitude
    * off (measured: 547k for 3000 true); one affine map scatters the band
    * but keeps consecutive-integer ids on a coarse lattice whose minima
    * still bias the estimate ~2× (measured: 268 for 150 true). The
    * base-31 re-hash of the fixed-width base-10 digits shares no
    * structure with the affine lattice and mixes it away (measured:
    * 142/150, 2904/3000, 1475/1500 — all within one sampling σ); the
    * fixed width matters because variable-length decimal strings would
    * re-introduce the short-string band for small affine values. Keeps
    * the k smallest DISTINCT mixed hashes per group and estimates
    * `distinct ≈ (k-1) · M / h_(k)` (M = the hash modulus) — the classic
    * KMV/bottom-k estimator (Bar-Yossef et al. 2002; Beyer et al. 2007,
    * "On Synopses for Distinct-Value Estimation Under Multiset
    * Operations"). Groups with fewer than k distinct hashes report the
    * EXACT count (`n_kept < k` ⇒ `est_distinct = n_kept`).
    *
    * Output: groupCols ++ (n_kept, kth_min, est_distinct) — n_kept and
    * kth_min ARE the sketch (mergeable: union-k-smallest of two sketches
    * is the sketch of the union), est_distinct the estimate.
    *
    * Shape: one partial-aggregated distinct on (group, hash), then a
    * rank-k window that Spark 4 prunes map-side via WindowGroupLimit —
    * each map partition forwards at most k rows per group into the window
    * shuffle, so the second exchange is bounded by k·partitions·groups
    * regardless of data volume. Hash collisions under-count by ~d/2M for
    * d true distinct values — at d = 1e7 that is 0.5%, well inside the
    * k=64 sampling error (~12.7%); for larger-d regimes raise k or move
    * to a 64-bit hash, which changes the estimator's M only.
    */
  def kmvDistinct(df: DataFrame, k: Int, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    require(groupCols.nonEmpty, "kmvDistinct needs at least one group column")
    val g = groupCols.map(col)
    val affine = (PolyHash(col(valueCol).cast("string"), 0L) * Sampling.saltMult("kmv")
      + Sampling.saltAdd("kmv")) % PolyHash.Mod
    val h = PolyHash(lpad(affine.cast("string"), 10, "0"), 0L)
    val dist = df.select(g :+ h.as("__h"): _*).distinct()
    val w = Window.partitionBy(g: _*).orderBy(col("__h").asc)
    dist.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_kept"), max("__h").as("kth_min"))
      .select(g ++ Seq(col("n_kept"), col("kth_min"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble * PolyHash.Mod) /
            greatest(col("kth_min"), lit(1L)))
          .as("est_distinct")): _*)
  }
}
