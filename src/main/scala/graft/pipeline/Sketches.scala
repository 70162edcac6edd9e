package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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
    val dist = df.select(g :+ kmvHash(valueCol).as("__h"): _*).distinct()
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

  /** The mixed hash shared by every KMV face (including the streaming one,
    * [[graft.streaming.StreamOps.kmvStream]]) — see [[kmvDistinct]] for
    * why the two extra stages exist.
    */
  def kmvHash(valueCol: String): org.apache.spark.sql.Column = {
    val affine = (PolyHash(col(valueCol).cast("string"), 0L) * Sampling.saltMult("kmv")
      + Sampling.saltAdd("kmv")) % PolyHash.Mod
    PolyHash(lpad(affine.cast("string"), 10, "0"), 0L)
  }

  /** The materialized KMV sketch per group: the (at most) k smallest
    * distinct mixed hashes, ascending — `groupCols ++ (hs array<long>)`.
    * This IS the mergeable synopsis: the k smallest of a union of sketches
    * is the sketch of the union, which is what [[kmvPairJaccard]]
    * exploits. Same bounded-shuffle plan as [[kmvDistinct]].
    */
  def kmvSketch(df: DataFrame, k: Int, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    require(groupCols.nonEmpty, "kmvSketch needs at least one group column")
    val g = groupCols.map(col)
    val dist = df.select(g :+ kmvHash(valueCol).as("__h"): _*).distinct()
    val w = Window.partitionBy(g: _*).orderBy(col("__h").asc)
    dist.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .groupBy(g: _*)
      .agg(sort_array(collect_list(col("__h"))).as("hs"))
  }

  /** Pairwise distinct-set overlap estimates between groups, from KMV
    * sketches alone (Beyer et al. 2007's multiset-operation synopses):
    * for each group pair (grp_a < grp_b), the union sketch U = k smallest
    * of the merged hash sets, `union_est` the KMV estimate on U,
    * `jaccard_est = |{h ∈ U : h ∈ A ∧ h ∈ B}| / |U|` (exact when the
    * union has fewer than k distinct hashes — then U is the whole union),
    * and `inter_est = jaccard_est · union_est`. THE "how much does corpus
    * A overlap corpus B" diagnostic (cross-source contamination, shard
    * drift) at sketch cost: after the per-group sketch reduction the pair
    * join touches G·k longs for G groups — group-level metadata, so the
    * pair comparison is a broadcast nested-loop over G² sketch pairs,
    * never over rows.
    */
  /** HyperLogLog distinct-count estimate per group (Flajolet et al. 2007,
    * dense registers) as pure column algebra — the constant-size companion
    * to [[kmvDistinct]]: 2^p registers per group regardless of
    * cardinality, mergeable by register-wise max, and insensitive to
    * duplicates by construction (registers take a max, so re-ingesting a
    * value is a no-op — no DISTINCT pass needed, unlike KMV).
    *
    * Derivation, identical in the SQL twin: the [[kmvHash]] mixed hash
    * h ∈ [0, 2^30); register index = low p bits, the remaining W = 30 − p
    * bits form the window whose leading-zero count drives
    * ρ = W + 1 − bitlen(w) (ρ = W + 1 at w = 0). bitlen is a generated
    * integer CASE chain — exact in every engine, no float log2 at the
    * power-of-two boundaries. Estimate = α_m · m² / Σ 2^−ρ_j (absent
    * registers contribute 2^0), with the standard small-range linear
    * count m·ln(m/V) when E ≤ 2.5m and V > 0. Every 2^−ρ term is a
    * dyadic rational spanning < 2^52, so the register sum is EXACT in
    * doubles whatever the aggregation order — the estimate is
    * deterministic across partitionings and engines.
    *
    * Scale shape: two partial-combined aggregations — (group, register)
    * max, then a per-group reduction over ≤ 2^p register rows. State is
    * bounded by m per group at every stage; no windows, no sort.
    */
  def hllDistinct(df: DataFrame, p: Int = 10, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    require(p >= 7 && p <= 16, s"hllDistinct needs p in [7, 16], got $p")
    require(groupCols.nonEmpty, "hllDistinct needs at least one group column")
    val m = 1 << p
    val g = groupCols.map(col)
    val regs = df
      .select(g :+ hllIdx(valueCol, p).as("__idx") :+ hllRho(valueCol, p).as("__rho"): _*)
      .groupBy(g :+ col("__idx"): _*)
      .agg(max(col("__rho")).as("__r"))
    val alpha = hllAlpha(m)
    val zs = col("__zsum") + (lit(m) - col("n_registers_hit")) // absent regs: 2^0
    val v = lit(m) - col("n_registers_hit")
    val raw = lit(alpha) * lit(m.toDouble) * lit(m.toDouble) / zs
    regs.groupBy(g: _*)
      .agg(count(lit(1)).as("n_registers_hit"),
        sum(pow(lit(2.0), -col("__r"))).as("__zsum"))
      .withColumn("est_distinct",
        when(raw <= lit(2.5 * m) && v > 0, lit(m.toDouble) * log(lit(m.toDouble) / v))
          .otherwise(raw))
      .drop("__zsum")
  }

  /** Pairwise distinct-set overlap between groups from HLL registers alone
    * — the constant-size companion to [[kmvPairJaccard]], and the register
    * algebra HLL is mergeable FOR: the union sketch of two groups is the
    * register-wise max, so `union_est` falls out of the same estimate
    * formula as [[hllDistinct]], and `inter_est` by inclusion–exclusion
    * (`est_a + est_b − union_est`, clamped at 0 where sketch error drives
    * it negative). Where KMV's k-min lists cap at k hashes, the HLL pair
    * costs a fixed 2^p registers per group whatever the cardinalities.
    *
    * Scale shape: one (group, register) max aggregation over the data,
    * then everything is register-table algebra — the pair expansion joins
    * each pair against its two groups' ≤ m register rows (G²·m rows
    * total), which is why the same fail-fast `maxGroups` guard as the KMV
    * pair operator sits in front of it: pair overlap is a between-SLICES
    * diagnostic (languages, sources, shards), not a per-key operator.
    *
    * Output per (grp_a < grp_b): est_a, est_b, union_est, inter_est,
    * jaccard_est = inter/union. All terms go through the identical
    * dyadic-exact register sum and ln as [[hllDistinct]], so the result is
    * deterministic cross-engine.
    */
  def hllPairOverlap(df: DataFrame, p: Int = 10, groupCol: String,
      valueCol: String, maxGroups: Int = 256): DataFrame = {
    require(p >= 7 && p <= 16, s"hllPairOverlap needs p in [7, 16], got $p")
    require(maxGroups >= 2, s"hllPairOverlap needs maxGroups >= 2, got $maxGroups")
    val m = 1 << p
    val regs = df.select(col(groupCol).cast("string").as("grp"),
      hllIdx(valueCol, p).as("idx"), hllRho(valueCol, p).as("rho"))
      .groupBy("grp", "idx").agg(max("rho").as("r"))
    def estimate(grouped: DataFrame, keys: Seq[String]): DataFrame = {
      val zs = col("__zsum") + (lit(m) - col("__hit"))
      val v = lit(m) - col("__hit")
      val raw = lit(hllAlpha(m)) * lit(m.toDouble) * lit(m.toDouble) / zs
      grouped.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__hit"),
          sum(pow(lit(2.0), -col("r"))).as("__zsum"))
        .withColumn("__est",
          when(raw <= lit(2.5 * m) && v > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / v))
            .otherwise(raw))
        .drop("__hit", "__zsum")
    }
    // guard on the group count, enforced lazily on the pair source (same
    // pattern as kmvPairJaccard): a window count over the DISTINCT group
    // list — metadata-scale — so a high-cardinality group key fails fast
    // with a routing hint instead of expanding G²·m register rows
    val grps = regs.select("grp").distinct()
      .withColumn("__g", count(lit(1)).over(Window.partitionBy()))
      .withColumn("grp",
        when(col("__g") > maxGroups,
          raise_error(format_string(
            "hllPairOverlap: %s groups exceed the G² pair bound %s — " +
              "aggregate to a coarser group key or raise maxGroups",
            col("__g"), lit(maxGroups))))
          .otherwise(col("grp")))
      .drop("__g")
    val pairs = grps.select(col("grp").as("grp_a"))
      .join(broadcast(grps.select(col("grp").as("grp_b"))),
        col("grp_a") < col("grp_b"))
    val pairRegs = pairs.join(regs.withColumnRenamed("grp", "grp_a"), Seq("grp_a"))
      .select(col("grp_a"), col("grp_b"), col("idx"), col("r"))
      .unionByName(
        pairs.join(regs.withColumnRenamed("grp", "grp_b"), Seq("grp_b"))
          .select(col("grp_a"), col("grp_b"), col("idx"), col("r")))
      .groupBy("grp_a", "grp_b", "idx").agg(max("r").as("r"))
    val uni = estimate(pairRegs, Seq("grp_a", "grp_b"))
      .withColumnRenamed("__est", "union_est")
    val per = estimate(regs, Seq("grp"))
    uni
      .join(per.select(col("grp").as("grp_a"), col("__est").as("est_a")), "grp_a")
      .join(per.select(col("grp").as("grp_b"), col("__est").as("est_b")), "grp_b")
      .withColumn("inter_est",
        greatest(col("est_a") + col("est_b") - col("union_est"), lit(0.0)))
      .withColumn("jaccard_est", col("inter_est") / col("union_est"))
      .select("grp_a", "grp_b", "est_a", "est_b", "union_est",
        "inter_est", "jaccard_est")
  }

  /** The register index / rank derivation shared by the batch and the
    * streaming face — one definition, so the two cannot drift.
    */
  private[graft] def hllIdx(valueCol: String, p: Int): Column =
    kmvHash(valueCol).bitwiseAND(lit(((1 << p) - 1).toLong))

  private[graft] def hllRho(valueCol: String, p: Int): Column = {
    val bigW = 30 - p
    val w = shiftrightunsigned(kmvHash(valueCol), p)
    // bitlen(w) as an exact integer CASE chain, highest threshold first
    val bitLen = (bigW to 1 by -1).foldLeft(when(lit(false), 0)) {
      (acc, b) => acc.when(w >= (1L << (b - 1)), b)
    }.otherwise(0)
    lit(bigW + 1) - bitLen
  }

  private[graft] def hllAlpha(m: Int): Double = 0.7213 / (1.0 + 1.079 / m)

  /** The estimate formula on materialized registers, identical term order
    * to the column algebra in [[hllDistinct]] (the 2^−ρ sum is exact in
    * doubles, ln is the same IEEE libm call) — the streaming face computes
    * per-group state driver-side through THIS function, so its batch face
    * hash-matches [[hllDistinct]] by construction.
    */
  private[graft] def hllEstimate(p: Int, rhos: Iterable[Int]): (Long, Double) = {
    val m = 1 << p
    val hit = rhos.size.toLong
    val zs = rhos.map(r => math.pow(2.0, -r)).sum + (m - hit)
    val v = m - hit
    val raw = hllAlpha(m) * m.toDouble * m.toDouble / zs
    val est =
      if (raw <= 2.5 * m && v > 0) m.toDouble * math.log(m.toDouble / v)
      else raw
    (hit, est)
  }

  /** Mergeable quantile estimates per group from a deterministic bottom-k
    * ROW sample — the rank-query companion that completes the sketch
    * family (KMV: distinct, HLL: distinct-constant-space, CMS: frequency,
    * this: quantiles). An exact distributed quantile needs a full sort or
    * a per-group collect; at 100 TB the answer is a bounded synopsis. The
    * synopsis here is the k rows whose mixed hash over the ROW KEY is
    * smallest — a uniform random sample under the hash's uniformity
    * (the same [[kmvHash]] mixer, salted per-face), and mergeable exactly
    * like KMV: the bottom-k of a union of samples is the sample of the
    * union, so shard synopses combine losslessly. Sample quantiles
    * converge at the usual O(1/√k) Dvoretzky–Kiefer–Wolfowitz rate; rank
    * error ε needs k ≈ 1/ε² rows per group, independent of group size.
    *
    * Unlike KMV the hash is over `keyCol` (the row identity), NOT the
    * value: quantiles are over the VALUE MULTISET, so duplicate values
    * must stay at their multiplicity and the inclusion draw must be
    * independent of the value being measured.
    *
    * The readout is the type-7 (R/NumPy "linear") sample quantile, fully
    * pinned: sorted sample v[1..n] (ties in value broken nowhere — equal
    * values are interchangeable), pos = q·(n−1), est = v[⌊pos⌋+1] +
    * frac·(v[⌊pos⌋+2] − v[⌊pos⌋+1]) with every step in the same double
    * arithmetic in both engines; output rounded to 6 decimals to absorb
    * the last-ulp of the interpolation product.
    *
    * Scale shape: identical to [[kmvDistinct]] — one rank-k window that
    * Spark 4 prunes map-side via WindowGroupLimit (each map partition
    * forwards ≤ k rows per group), then a per-group bounded collect of ≤ k
    * sampled VALUES (the only collect_list, explicitly bounded) and a
    * metadata-scale quantile explode.
    *
    * Output: groupCols ++ (q, n_sample, est_q) — one row per requested
    * quantile per group.
    */
  def quantileSketch(df: DataFrame, k: Int, groupCols: Seq[String],
      keyCol: String, valueCol: String,
      qs: Seq[Double] = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)): DataFrame = {
    require(k >= 2, s"quantileSketch needs k >= 2, got $k")
    require(groupCols.nonEmpty, "quantileSketch needs at least one group column")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must lie in [0,1], got $qs")
    val g = groupCols.map(col)
    // per-face salt: re-mix the shared kmv hash so the row draw shares no
    // structure with any other face's bottom-k over the same key column
    val h = (kmvHash(keyCol) * Sampling.saltMult("quantile")
      + Sampling.saltAdd("quantile")) % PolyHash.Mod
    val w = Window.partitionBy(g: _*).orderBy(col("__h").asc, col(keyCol).asc)
    // quantiles are over the non-null values; the draw must exclude null
    // rows too, or groups with many nulls would waste sample slots
    val sample = df
      .where(col(valueCol).isNotNull)
      .select(g ++ Seq(h.as("__h"), col(keyCol),
        col(valueCol).cast("double").as("__x")): _*)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .groupBy(g: _*)
      .agg(sort_array(collect_list(col("__x"))).as("__vs"))
    val qCol = explode(array(qs.map(lit): _*)).as("q")
    val n = size(col("__vs"))
    val pos = col("q") * (n - lit(1)).cast("double")
    val lo = floor(pos).cast("int")
    val frac = pos - lo.cast("double")
    val vLo = element_at(col("__vs"), lo + lit(1))
    val vHi = element_at(col("__vs"), least(lo + lit(2), n))
    sample.select(g :+ col("__vs") :+ qCol: _*)
      .select(g ++ Seq(col("q"), n.cast("long").as("n_sample"),
        round(vLo + frac * (vHi - vLo), 6).as("est_q")): _*)
  }

  /** Count-min sketch over a value stream (Cormode & Muthukrishnan 2005):
    * `d` hash rows × `w` buckets of counters, built with one
    * partial-combined groupBy over at most d·w reducer keys — the
    * frequency table whose size is INDEPENDENT of the value cardinality.
    * At 100 TB an exact per-term count shuffles the full Zipfian vocabulary;
    * the CMS shuffles d·w bounded keys and still answers point-frequency
    * queries with one-sided error: est ≥ true always, est ≤ true + ε·N
    * with probability 1−δ at w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
    *
    * Bucket of value v in row j is `PolyHash(v, 201+j) mod w` — the seeded
    * kernel with a byte-exact DuckDB twin, so the whole sketch (and its
    * deliberate collisions) is deterministic cross-engine. Output:
    * `(j, bucket, cnt)`, d·w rows at most.
    */
  def cmsSketch(df: DataFrame, valueCol: String, d: Int = 3,
      w: Int = 1024): DataFrame = {
    require(d >= 1 && d <= 16, s"cmsSketch needs d in [1,16], got $d")
    require(w >= 2, s"cmsSketch needs w >= 2, got $w")
    val rows = df.select(col(valueCol).cast("string").as("__v"))
      .select(posexplode(array((0 until d).map(j =>
        PolyHash(col("__v"), 201L + j) % w): _*)).as(Seq("j", "bucket")))
    rows.groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for the exact top-`k` values, answered from
    * the [[cmsSketch]] alone: `est = min_j cnt[j][h_j(v)]` — the classic
    * count-min readout, joined against the exact counts so the one-sided
    * error (`est_count >= true_count` always) is visible and verifiable in
    * the output. Ranking ties break on the value string ascending.
    *
    * Scale shape: the exact top-k here is the AUDIT side (a full groupBy,
    * same cost as [[graft.pipeline.TextOps.topTerms]]); production reads
    * probe the d·w sketch with metadata-scale candidate sets. The probe
    * join broadcasts the sketch (≤ d·w rows) against k candidates.
    */
  def cmsTopK(df: DataFrame, valueCol: String, k: Int, d: Int = 3,
      w: Int = 1024): DataFrame = {
    require(k >= 1, s"cmsTopK needs k >= 1, got $k")
    val sketch = cmsSketch(df, valueCol, d, w)
    val top = df.select(col(valueCol).cast("string").as("value"))
      .groupBy("value").agg(count(lit(1)).as("true_count"))
      .orderBy(col("true_count").desc, col("value").asc)
      .limit(k)
    val probes = top.select(col("value"), col("true_count"),
      posexplode(array((0 until d).map(j =>
        PolyHash(col("value"), 201L + j) % w): _*)).as(Seq("j", "bucket")))
    probes.join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy("value", "true_count")
      .agg(min("cnt").as("est_count"))
  }

  /** Default bound on the pair-comparison group count: G groups mean a
    * broadcast of G·k longs to every task and G²/2 sketch comparisons —
    * "group-level metadata" stops being metadata somewhere around 10⁴
    * groups (10⁸ pairs, ~100 MB·k broadcast). Above the bound the operator
    * FAILS FAST with a routing hint instead of silently melting down on a
    * high-cardinality group key.
    */
  val KmvMaxPairGroups: Int = 10000

  def kmvPairJaccard(df: DataFrame, k: Int, groupCol: String,
      valueCol: String, maxGroups: Int = KmvMaxPairGroups): DataFrame = {
    val sk0 = kmvSketch(df, k, Seq(groupCol), valueCol)
    // Scale guard, enforced lazily (the plan stays declarative): the group
    // count is a global count window OVER THE SKETCH — one extra exchange
    // of G metadata-scale rows, NOT a third execution of the underlying
    // scan+window subplan (measured: a separate groupBy().count() re-ran
    // the whole sketch and cost ~1.7 s at sf0.1). The check sits on the
    // sketch column the pair join consumes, so pruning cannot elide it.
    val sk = sk0
      .withColumn("__g", count(lit(1)).over(Window.partitionBy()))
      .withColumn("hs",
        when(col("__g") > maxGroups,
          raise_error(format_string(
            "kmvPairJaccard: %s groups exceed the G² pair-comparison bound %s " +
              "— aggregate to a coarser group key or raise maxGroups",
            col("__g"), lit(maxGroups))))
          .otherwise(col("hs")))
      .drop("__g")
    // The pair join references the sketch twice (a × b); measured at sf0.1,
    // persist buys nothing here — Spark's exchange reuse already shares the
    // heavy shuffle between the two sides — so the plan stays declarative.
    val a = sk.select(col(groupCol).as("grp_a"), col("hs").as("__ha"))
    val b = sk.select(col(groupCol).as("grp_b"), col("hs").as("__hb"))
    val paired = a.join(broadcast(b), col("grp_a") < col("grp_b"))
      .withColumn("__u", slice(array_sort(array_union(col("__ha"), col("__hb"))), 1, k))
      .withColumn("n_union_kept", size(col("__u")).cast("long"))
      .withColumn("n_common",
        size(filter(col("__u"), x =>
          array_contains(col("__ha"), x) && array_contains(col("__hb"), x)))
          .cast("long"))
      .withColumn("union_est",
        when(col("n_union_kept") < k, col("n_union_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble * PolyHash.Mod) /
            greatest(element_at(col("__u"), size(col("__u"))), lit(1L))))
      .withColumn("jaccard_est",
        col("n_common").cast("double") / col("n_union_kept"))
    paired.select(col("grp_a"), col("grp_b"), col("n_union_kept"),
      col("n_common"), col("union_est"), col("jaccard_est"),
      (col("jaccard_est") * col("union_est")).as("inter_est"))
  }
}
