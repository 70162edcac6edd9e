package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PolyHash

/** Deterministic sampling and dataset splitting for training pipelines.
  *
  * Everything keys off a content-independent hash of (id, salt) — the
  * [[graft.functions.PolyHash]] kernel, which has a byte-exact DuckDB twin —
  * so assignments are (a) reproducible across runs, engines and cluster
  * sizes, (b) stable under repartitioning (unlike `df.sample`, whose output
  * depends on partition layout), and (c) pure narrow column algebra: no
  * shuffle, no state, evaluated inside the scan's whole-stage codegen at
  * any scale.
  */
object Sampling {

  /** Number of hash buckets the unit interval is quantized into; weights
    * resolve to integer bucket boundaries (1e-4 resolution).
    */
  val Buckets = 10000

  /** Salt-derived coefficients of the universal-hash map (computed once,
    * driver-side; interpolated as literals into the SQL twins).
    */
  // % (Mod-1) + 1 keeps the multiplier in [1, p-1]: hash+1 alone could hit
  // a ≡ 0 (mod p), which would collapse every id into one bucket
  def saltMult(salt: String): Long = PolyHash.hash(salt, 1L) % (PolyHash.Mod - 1) + 1L
  def saltAdd(salt: String): Long = PolyHash.hash(salt, 2L)

  /** Uniform bucket in [0, Buckets) from (id, salt). The id is hashed as its
    * decimal-string form so any id type works and the DuckDB twin is a plain
    * CAST.
    *
    * The salt enters through a universal-hash map `(a·h + b) mod p`, NOT by
    * concatenation: PolyHash is linear in its input (`poly(s || c) =
    * poly(s)·31 + c mod p`), so salting by suffix shifts every bucket by a
    * constant — salts "s1"/"s2" would shift by exactly 1 and `bucket < t`
    * draws under the two salts would be ~100% correlated (caught by
    * SamplingSpec's overlap test; a decimal-string re-hash fails the same
    * way because +1 usually only changes the last digit). Multiplication by
    * a salt-derived `a mod p` scrambles intervals — the classic
    * Carter–Wegman family — so draws under different salts overlap at the
    * independent t² rate. All arithmetic stays below 2^61 (h, a < p ≈ 2^30),
    * exact in any engine's 64-bit integers.
    */
  def bucketOf(id: Column, salt: String): Column =
    ((PolyHash(id.cast("string"), 0L) * saltMult(salt) + saltAdd(salt))
      % PolyHash.Mod) % Buckets

  /** Add a `split` label column ("train"/"val"/"test"-style) with the given
    * weights (normalized; must be positive). Deterministic in (id, salt).
    */
  def assignSplit(df: DataFrame, idCol: String, weights: Seq[(String, Double)],
      salt: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive, got $weights")
    val total = weights.map(_._2).sum
    // integer boundaries: cumulative weight * Buckets, last boundary pinned
    // to Buckets so rounding can never orphan the top bucket
    val cums = weights.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.round(c / total * Buckets).toInt)
      .dropRight(1) :+ Buckets
    val b = bucketOf(col(idCol), salt)
    val labeled = weights.map(_._1).zip(cums).foldRight(lit(null).cast("string")) {
      case ((name, hi), rest) => when(b < hi, name).otherwise(rest)
    }
    df.withColumn("split", labeled)
  }

  /** Leakage-safe train/val/test splitting: documents that are near-dups of
    * each other MUST land in the same split, or the held-out sets silently
    * contain paraphrases of training rows and eval numbers inflate (the
    * canonical train/test contamination path arXiv:2107.06499 §6 measures).
    * The split key is therefore the near-dup CLUSTER id, not the doc id:
    * every member of a cluster hashes identically, so the whole cluster
    * moves as one unit; singleton documents (no near-dup edge) fall back to
    * their own id, which is distribution-preserving because cluster ids ARE
    * doc ids (the component's minimum).
    *
    * `clusters` is any `(idCol, cluster_id)` relation — compose with
    * [[Components.dedupClusters]] (MinHash), a SimHash pair closure, or
    * embedding near-dup clusters; docs absent from it are treated as
    * singletons. Split proportions then hold over CLUSTERS rather than
    * docs exactly — the unavoidable price of leakage-safety (a 3-doc
    * cluster is indivisible); with dup rates in the few-percent range the
    * doc-level proportions track within noise.
    *
    * Scale shape: one left join on the id key (the cluster relation is
    * corpus-sized at worst, near-dup-subset-sized typically) plus the
    * narrow [[bucketOf]] algebra — no new shuffle beyond the join, and the
    * join itself broadcasts when the cluster side is small enough under
    * AQE.
    */
  def leakageSafeSplit(df: DataFrame, clusters: DataFrame, idCol: String,
      weights: Seq[(String, Double)], salt: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive, got $weights")
    val cl = clusters.select(col(idCol), col("cluster_id"))
    val keyed = df.join(cl, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col(idCol)))
      .drop("cluster_id")
    assignSplit(keyed, "split_key", weights, salt)
  }

  /** Exact per-stratum quota sampling: the `perStratum` rows of each stratum
    * with the smallest salt-keyed hash (ties broken by id). Where
    * [[deterministicSample]] hits a fraction only in expectation, quotas
    * here are EXACT — the standard way to cut balanced eval slices from a
    * skewed corpus (a 90%-English crawl still yields `perStratum` docs per
    * language). Deterministic in (id, salt): independent of partition
    * layout, cluster size, and row order, and different salts draw
    * independently (same Carter–Wegman argument as [[bucketOf]]).
    *
    * Scale shape: one shuffle on the stratum key; the rank filter is the
    * only window over that key, so Spark 4's WindowGroupLimit prunes every
    * map partition to its local top-`perStratum` BEFORE the shuffle
    * (asserted in PlanSpec) — a Zipfian stratum ships O(partitions·n) rows,
    * not its full population.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      perStratum: Int, salt: String = "strat"): DataFrame = {
    require(perStratum > 0, s"perStratum must be positive, got $perStratum")
    import org.apache.spark.sql.expressions.Window
    val key = (PolyHash(col(idCol).cast("string"), 0L) * saltMult(salt)
      + saltAdd(salt)) % PolyHash.Mod
    val w = Window.partitionBy(stratumCol).orderBy(key.asc, col(idCol).asc)
    df.withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= perStratum)
      .drop("__rank")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis, via the
    * exponential-key formulation): each row draws a deterministic uniform
    * `u ∈ (0, 1)` from its (id, salt) hash and the `n` rows with the
    * smallest `-ln(u) / w` win — exactly the distribution of sequential
    * weighted draws without replacement, but embarrassingly parallel and
    * reproducible across engines, partition layouts, and cluster sizes.
    * Rows with non-positive or null weight are excluded by contract.
    *
    * Scale shape: no global window — the key filter is an `ORDER BY key
    * LIMIT n`, which Spark executes as TakeOrderedAndProject: each
    * partition keeps its local top-n in a bounded heap and only n·p rows
    * ever leave the executors. Ties (possible only through float
    * coincidence) break on the id.
    *
    * NaN weights are excluded explicitly: Spark orders NaN ABOVE every
    * number, so `w > 0` alone would admit them and their NaN keys would
    * sort last yet still be drawn whenever fewer than `n` finite-weight
    * rows exist.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, n: Int,
      salt: String = "wsample"): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val h = (PolyHash(col(idCol).cast("string"), 0L) * saltMult(salt)
      + saltAdd(salt)) % PolyHash.Mod
    val u = (h.cast("double") + 0.5) / PolyHash.Mod
    df.where(col(weightCol).isNotNull && col(weightCol) > 0
        && !isnan(col(weightCol).cast("double")))
      .withColumn("__key", -log(u) / col(weightCol).cast("double"))
      .orderBy(col("__key").asc, col(idCol).asc)
      .limit(n)
      .drop("__key")
  }

  /** Temperature-weighted source mixing (the multilingual-pretraining
    * rebalance: sampling probability per source ∝ n_s^α with α = 1/2, i.e.
    * temperature 2 — up-weights tail sources, damps the head): draw an
    * EXACT per-source quota `round(targetN · √n_s / Σ_t √n_t)` (capped at
    * n_s), filled by the rows with the smallest salt-keyed hash — the same
    * deterministic rank draw as [[stratifiedSample]], so the result is
    * reproducible across engines, partition layouts, and cluster sizes.
    *
    * Only the PER-SOURCE quotas are exact; the TOTAL is approximately
    * targetN, not exactly: the sum of half-up-rounded quotas can drift
    * from targetN by up to ±(sources/2) rows, and further (only downward)
    * when the n_s caps bind. Callers needing an exact total should trim or
    * top up by the same hash rank after the fact.
    *
    * Cross-engine exactness of the quota arithmetic: the weights use
    * `sqrt` (correctly rounded per IEEE-754 in every engine, unlike `pow`),
    * the weight total is folded LEFT-TO-RIGHT over sources sorted by name
    * (float addition is order-sensitive; pinning the order makes the sum
    * bit-identical), and `round` is half-up on positives in both engines.
    *
    * Scale shape: the source census is one partial-combined aggregate
    * (rows = distinct sources — metadata-scale); quotas broadcast back;
    * the rank fill is one shuffle on the source key.
    */
  def temperatureSample(df: DataFrame, idCol: String, sourceCol: String,
      targetN: Int, salt: String = "mix"): DataFrame = {
    require(targetN > 0, s"targetN must be positive, got $targetN")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(sourceCol).as("__src"))
      .agg(count(lit(1)).as("__n"))
    // Σ √n in source-name order: collect the (tiny) census into one sorted
    // array and fold — a groupBy sum would add in partition order, which is
    // not reproducible bit-for-bit
    val total = counts
      .agg(sort_array(collect_list(struct(col("__src"), col("__n")))).as("__arr"))
      .select(aggregate(col("__arr"), lit(0.0),
        (acc, x) => acc + sqrt(x.getField("__n").cast("double"))).as("__tot"))
    val quotas = counts.crossJoin(broadcast(total))
      .select(col("__src"),
        least(col("__n"),
          round(lit(targetN.toDouble) * sqrt(col("__n").cast("double"))
            / col("__tot")).cast("long")).as("__quota"))
    val key = (PolyHash(col(idCol).cast("string"), 0L) * saltMult(salt)
      + saltAdd(salt)) % PolyHash.Mod
    val w = Window.partitionBy(sourceCol).orderBy(key.asc, col(idCol).asc)
    df.withColumn("__rank", row_number().over(w))
      .join(broadcast(quotas), col(sourceCol) === col("__src"))
      .where(col("__rank") <= col("__quota"))
      .drop("__rank", "__src", "__quota")
  }

  /** Keep a deterministic `fraction` of rows, keyed on (id, salt). Because
    * the hash is uniform and independent of any other column, the sample is
    * automatically stratified in expectation over every stratum; exactness
    * is not needed for pipeline subsampling. Unlike `df.sample`, re-running
    * on a repartitioned/different-sized cluster keeps the SAME rows.
    */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
      salt: String = "sample"): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], got $fraction")
    df.where(bucketOf(col(idCol), salt) < math.round(fraction * Buckets).toInt)
  }

  /** Token-budgeted per-source sampling: walk each source's documents in
    * `idCol` order and keep them until the source's token budget is filled —
    * the mixture primitive when quotas are expressed in TOKENS (how
    * pretraining mixes are actually specified), not document counts. The
    * first document that crosses the budget is still kept ("fill to
    * budget": every budget > 0 yields at least one document and the kept
    * set always covers ≥ the budget unless the source runs dry). Sources
    * absent from `budgets` are dropped. Returns the kept documents with
    * their token count and the running total within their source.
    *
    * Scale: the per-source order walk is [[Prefix.runningSum]] grouped by
    * source — the sharded scan, so one giant source never serializes on a
    * single window task.
    */
  def tokenBudgetSample(df: DataFrame, budgets: Map[String, Long],
      idCol: String = "doc_id", sourceCol: String = "source",
      textCol: String = "text", shardWidth: Long = 1L << 20): DataFrame = {
    require(budgets.nonEmpty, "tokenBudgetSample needs at least one source budget")
    require(budgets.values.forall(_ > 0),
      s"budgets must be positive, got $budgets")
    val spark = df.sparkSession
    import spark.implicits._
    val quota = broadcast(
      budgets.toSeq.sortBy(_._1).toDF(sourceCol, "__budget"))
    val lens = df.select(col(idCol), col(sourceCol),
      TextOps.tokenCount(col(textCol)).cast("long").as("n_toks"))
    Prefix.runningSum(lens, idCol, "n_toks", groupCols = Seq(sourceCol),
        shardWidth = shardWidth, endCol = "cum_toks")
      .join(quota, Seq(sourceCol))
      .where(col("cum_toks") - col("n_toks") < col("__budget"))
      .select(col(idCol), col(sourceCol), col("n_toks"), col("cum_toks"))
  }

  /** Per-row Bernoulli thinning by an acceptance-probability column —
    * quality-weighted (importance) downsampling: each row is kept iff its
    * deterministic uniform draw `u(id) ∈ (0, 1)` falls below
    * `clamp(prob, 0, 1)`, so acceptance probability IS the column value
    * (soft quality filtering à la the CCNet perplexity buckets — keep
    * good documents surely, bad ones rarely — where a hard threshold
    * would cliff). The draw is the salt-keyed CW hash of the row id: the
    * decision is a pure row function, reproducible across engines,
    * layouts, and reruns, and INDEPENDENT of the probability column by
    * construction (the hash never sees it).
    *
    * Emits every row with its draw and decision (`u`, `accept_prob`,
    * `is_kept`) rather than filtering — callers audit the rejected tail
    * or chain `.where($"is_kept")`. Null/NaN probabilities keep nothing.
    *
    * Scale shape: map-only — no shuffle, no state; at 100 TB this is a
    * scan-side decision exactly like [[bucketOf]] splits.
    */
  def bernoulliByProb(df: DataFrame, idCol: String, probCol: Column,
      salt: String = "importance"): DataFrame = {
    val h = (PolyHash(col(idCol).cast("string"), 0L) * saltMult(salt)
      + saltAdd(salt)) % PolyHash.Mod
    val u = (h.cast("double") + 0.5) / PolyHash.Mod
    // NaN must not survive the clamp: both engines order NaN above every
    // number, so least(greatest(NaN, 0), 1) would silently become 1.0 and
    // KEEP the row — null it out explicitly instead
    val pc = probCol.cast("double")
    val p = when(pc.isNull || isnan(pc), lit(null).cast("double"))
      .otherwise(least(greatest(pc, lit(0.0)), lit(1.0)))
    df.withColumn("u", u)
      .withColumn("accept_prob", p)
      .withColumn("is_kept", coalesce(col("u") < p, lit(false)))
  }

  /** DSIR-style importance resampling (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): select the `k` raw
    * documents whose hashed-n-gram distribution looks most like a TARGET
    * slice. Two bag-of-hashed-grams models are fit — unigrams plus
    * adjacent-bigram strings, [[graft.functions.PolyHash]]-bucketed into
    * `dims` bins, add-1 smoothed — one on the `target` rows (p) and one on
    * the whole corpus (q); each document's log importance weight is
    * `Σ c_b · (ln p_b − ln q_b)` over its bucket counts, and selection is
    * Gumbel top-k (score = logw − ln(−ln u) with u the deterministic
    * Carter–Wegman uniform draw per id), i.e. sampling WITHOUT replacement
    * proportional to the importance weights — reproducible across runs,
    * engines, and partitionings.
    *
    * Numeric discipline: bucket counts are exact integers; each bucket's
    * ln-ratio is a fixed four-term expression over those integers
    * (identical doubles in any engine); the per-document sum folds over
    * the bucket-SORTED count list so the accumulation order is pinned
    * (the ts_spectral lesson — a partial-aggregated float sum wobbles
    * with partition layout). Ranks therefore cannot straddle engines.
    *
    * Scale shape: gram hashing is map-side column algebra inside the scan;
    * the only corpus-scale shuffle is the (doc, bucket) partial-combined
    * count; both model tables are ≤ `dims` rows (broadcast), and top-k is
    * ORDER BY + LIMIT → per-partition heaps (TakeOrderedAndProject). No
    * vocabulary is ever built — the hashing trick caps state at `dims`
    * regardless of corpus size.
    */
  def dsirResample(df: DataFrame, target: Column, k: Int, dims: Int = 2048,
      idCol: String = "doc_id", textCol: String = "text",
      salt: String = "dsir"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val h = (PolyHash(col(idCol).cast("string"), 0L) * saltMult(salt)
      + saltAdd(salt)) % PolyHash.Mod
    val u = (h.cast("double") + 0.5) / PolyHash.Mod
    dsirWeights(df, target, dims, idCol, textCol)
      .withColumn("score", col("logw") + -log(-log(u)))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("n_grams"), col("logw"), col("score"))
  }

  /** The weight face of [[dsirResample]]: EVERY document's gram count and
    * log importance weight, no selection — for consumers that resample
    * softly (e.g. [[bernoulliByProb]] on a transformed weight), diagnose
    * the weight distribution, or mix the weight into a composite quality
    * score. Same models, same pinned-fold arithmetic.
    */
  def dsirWeights(df: DataFrame, target: Column, dims: Int = 2048,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(dims > 0, s"dims must be positive, got $dims")
    // hashed unigram+bigram buckets in ONE kernel pass per document
    // (bit-identical to the tokens ++ bigram-transform ++ PolyHash % dims
    // chain it replaces — see TokenGramBuckets): the interpreted per-token
    // `transform` lambda and the materialized bigram strings were the
    // row's hot path
    val occ = df.select(col(idCol), target.cast("boolean").as("__tgt"),
      explode(graft.functions.Signatures.tokenGramBuckets(
        col(textCol), dims)).as("__b"))
    val dc = occ.groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__c"), max(col("__tgt")).as("__tgt"))
    val qb = dc.groupBy("__b").agg(sum("__c").as("__qc"))
    val tb = dc.where(col("__tgt")).groupBy("__b").agg(sum("__c").as("__tc"))
    val tot = dc.agg(sum("__c").as("__qn"),
      sum(when(col("__tgt"), col("__c")).otherwise(0L)).as("__tn"))
    // both model tables are <= dims rows; broadcast-hint them so the
    // planner can never pick a shuffle join for metadata-scale relations
    val lnr = qb.join(broadcast(tb), Seq("__b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("__b"),
        (log((coalesce(col("__tc"), lit(0L)) + 1).cast("double"))
          - log((col("__tn") + dims).cast("double"))
          - log((col("__qc") + 1).cast("double"))
          + log((col("__qn") + dims).cast("double"))).as("__lnr"))
    dc.join(broadcast(lnr), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_grams"),
        array_sort(collect_list(struct(col("__b"),
          (col("__c").cast("double") * col("__lnr")).as("__t")))).as("__lst"))
      .select(col(idCol), col("n_grams"),
        aggregate(col("__lst"), lit(0.0),
          (a, x) => a + x.getField("__t")).as("logw"))
  }
}
