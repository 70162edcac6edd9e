package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling: per-column summary statistics — the schema-audit pass
  * a training pipeline runs before trusting a new data drop (row counts,
  * null rates, cardinality, range, central tendency).
  *
  * Scale shape: ONE scan of the input no matter how many columns are
  * profiled — all statistics land in a single wide `agg` row that is then
  * unpivoted driver-free (explode over an array of structs). Two costs are
  * worth naming at 100 TB:
  *
  *  - multiple exact `count(DISTINCT)`s rewrite to a Catalyst Expand (input
  *    replicated once per distinct column before partial aggregation);
  *    `exact = false` swaps in `approx_count_distinct` (HyperLogLog++,
  *    partial-merged, no Expand) — the right default at cluster scale, kept
  *    exact here so the DuckDB oracle can hash-match;
  *  - the exact median is a TypedImperativeAggregate (per-partition value
  *    buffers merged on one reducer per column); `exact = false` swaps in
  *    `approx_percentile` with a bounded t-digest-style sketch.
  */
object Profile {

  def numeric(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      val x = col(c)
      Seq(
        count(x).as(s"${c}__n"),
        count(when(x.isNull, lit(1))).as(s"${c}__n_null"),
        (if (exact) count_distinct(x)
         else approx_count_distinct(x)).as(s"${c}__n_distinct"),
        min(x).cast("double").as(s"${c}__min"),
        max(x).cast("double").as(s"${c}__max"),
        avg(x).as(s"${c}__mean"),
        (if (exact) percentile(x, lit(0.5))
         else percentile_approx(x, lit(0.5), lit(10000)).cast("double"))
          .as(s"${c}__median"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val structs = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"${c}__n").as("n"),
        col(s"${c}__n_null").as("n_null"),
        col(s"${c}__n_distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"),
        col(s"${c}__mean").as("mean_value"),
        col(s"${c}__median").as("median"))
    }
    row.select(explode(array(structs: _*)).as("s")).select("s.*")
  }

  /** Fixed-width histogram of a numeric column over `[lo, hi]`: rows land
    * in bin `floor((x − lo)/width)` with the top edge folded into the last
    * bin, and each occupied bin reports count, min/max/mean — the
    * distribution check that follows [[numeric]]'s range audit. Rows
    * outside `[lo, hi]` (and null/NaN) are excluded by contract; bound the
    * range from a prior profile pass.
    *
    * Scale shape: one scan, one partial-combined aggregation on at most
    * `nBins` keys — output size is independent of input size. The bin
    * arithmetic is plain IEEE double math mirrored verbatim in the SQL
    * twin, so bin assignment is bit-identical across engines.
    */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      nBins: Int): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val width = (hi - lo) / nBins
    val x = col(valueCol).cast("double")
    df.where(x.isNotNull && !isnan(x) && x >= lo && x <= hi)
      .groupBy(least(floor((x - lo) / width).cast("long"), lit(nBins - 1L))
        .as("bin_id"))
      .agg(count(lit(1)).as("n"),
        min(x).as("min_value"), max(x).as("max_value"), avg(x).as("mean_value"))
      .withColumn("lo_edge", lit(lo) + col("bin_id") * width)
      .withColumn("hi_edge", lit(lo) + (col("bin_id") + 1) * width)
  }

  /** Calendar profile: per (type, UTC day-of-week, UTC hour) event count
    * and value stats — the dow×hour activity matrix behind load planning
    * and "is Tuesday 3 a.m. supposed to look like this" triage
    * ([[graft.ts.SeriesOps.seasonalProfile]] covers the hour axis per
    * series; this is the two-axis corpus view). Day-of-week is pure
    * integer arithmetic off the epoch (1970-01-01 was a Thursday; 0 =
    * Sunday), so both engines agree exactly with no calendar/locale
    * functions. One partial-combined aggregate on a ≤ types·168 key
    * space.
    */
  /** Contingency matrix: one row per `rowCol` value, one column (named by
    * the value itself) per entry of `values`, cells = exact co-occurrence
    * counts with absent cells as 0 — the corpus-composition crosstab
    * (source × language) every curation run reads first. `values` is
    * explicit BY DESIGN: Spark's pivot otherwise runs a blocking distinct
    * job to discover columns and the output schema becomes data-dependent
    * (non-deterministic column order breaks any downstream contract).
    *
    * Scale shape: ONE partial-combined aggregate on `rowCol` — pivot with
    * explicit values compiles to |values| conditional counts inside a
    * single hash aggregate, map-side combined; no Expand, no second pass.
    */
  def crosstab(df: DataFrame, rowCol: String, colCol: String,
      values: Seq[String]): DataFrame = {
    require(values.nonEmpty, "pivot values must be explicit and non-empty")
    require(values.distinct == values, s"duplicate pivot values: $values")
    df.groupBy(col(rowCol)).pivot(colCol, values).agg(count(lit(1)))
      .na.fill(0L, values)
  }

  def calendarProfile(events: DataFrame, typeCol: String = "event_type",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val day = 86400L * 1000000000L
    val hour = 3600L * 1000000000L
    events.where(col(valueCol).isNotNull && !isnan(col(valueCol)))
      .groupBy(col(typeCol),
        expr(s"pmod($tsCol div $day + 4, 7)").as("dow"),
        expr(s"pmod($tsCol, $day) div $hour").as("hour"))
      .agg(count(lit(1)).as("n_events"),
        avg(col(valueCol)).as("mean_value"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"))
  }

  /** Key-skew audit before a join or aggregation: per-key row counts for
    * the `topN` heaviest keys plus whole-column concentration measures —
    * the share of all rows held by the single heaviest key
    * (`top1_share`) and by the top-N together (`topn_share`), and the
    * number of distinct keys. This is the diagnostic that decides between
    * a plain shuffle join and [[graft.ops.SkewJoin.saltedJoin]] / AQE skew
    * handling: a top1_share of a few percent on a billion-row table means
    * one reducer owns that share of the shuffle.
    *
    * Scale shape: one partial-combined count per key, then a bounded
    * TakeOrdered for the top-N and a metadata-scale total; shares are
    * single integer quotients (bit-stable). Null keys count as a key of
    * their own (they hash to one reducer too — the classic skew source).
    * Output: one row per top-N key — (key_rank, key_value as string,
    * n_rows, share) — each carrying the column-level (n_total,
    * n_distinct, top1_share, topn_share) for context.
    */
  def keySkew(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val counts = df.groupBy(col(keyCol).cast("string").as("key_value"))
      .agg(count(lit(1)).as("n_rows"))
    val top = counts
      .orderBy(col("n_rows").desc, col("key_value").asc_nulls_last)
      .limit(topN)
      .withColumn("key_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n_rows").desc, col("key_value").asc_nulls_last)))
    val tot = counts.agg(sum("n_rows").as("n_total"),
      count(lit(1)).as("n_distinct"),
      max("n_rows").as("__max"))
    val topSum = top.agg(sum("n_rows").as("__topn")).
      crossJoin(tot)
    top.crossJoin(broadcast(topSum))
      .select(col("key_rank"), col("key_value"), col("n_rows"),
        (col("n_rows") / col("n_total")).as("share"),
        col("n_total"), col("n_distinct"),
        (col("__max") / col("n_total")).as("top1_share"),
        (col("__topn") / col("n_total")).as("topn_share"))
  }

  /** Population stability index per group — the binned drift companion to
    * [[ksDrift]] that production scorecards actually alert on:
    * `PSI = Σ_bins (p_A − p_B)·ln(p_A / p_B)` over `nBins` fixed-width
    * bins of `[lo, hi]` (edges clamp into the outer bins so mass never
    * silently drops), with add-one smoothing on the bin COUNTS so an
    * empty bin contributes a finite term instead of ±∞. Conventional
    * reading: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 major shift
    * — emitted as `psi_flag`. KS answers "is there any distribution
    * change"; PSI weights WHERE the mass moved, which is what a
    * threshold-driven filter cares about.
    *
    * Scale shape: one partial-combined count per (group, bin) — at most
    * groups·nBins reducer keys regardless of rows; the PSI fold is a
    * ≤ nBins-term float sum per group (far inside cross-engine
    * tolerance), every proportion an integer-plus-one quotient. Groups
    * observed in only one slice are omitted like [[ksDrift]].
    */
  def psiDrift(df: DataFrame, groupCol: String, valueCol: String,
      sliceCol: org.apache.spark.sql.Column, lo: Double, hi: Double,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val width = (hi - lo) / nBins
    val v = df.select(col(groupCol).as("grp"),
        col(valueCol).cast("double").as("v"), sliceCol.as("__in_a"))
      .where(col("v").isNotNull && !isnan(col("v")) && col("__in_a").isNotNull)
    val binned = v.withColumn("bin_id", least(greatest(
      floor((col("v") - lo) / width).cast("long"), lit(0L)), lit(nBins - 1L)))
    val counts = binned.groupBy("grp", "bin_id").agg(
      count(when(col("__in_a"), lit(1))).as("__ca"),
      count(when(!col("__in_a"), lit(1))).as("__cb"))
    val tot = counts.groupBy("grp")
      .agg(sum("__ca").as("__na"), sum("__cb").as("__nb"))
      .where(col("__na") > 0 && col("__nb") > 0)
    // add-one smoothing over the FULL bin range (denominators n + nBins):
    // an empty bin's term is NOT zero when the slice sizes differ, so the
    // grid is enumerated densely — groups·nBins rows, metadata-scale
    val grid = tot.select(col("grp"), col("__na"), col("__nb"),
      explode(sequence(lit(0L), lit(nBins - 1L))).as("bin_id"))
    val pA = (col("__ca") + lit(1L)) / (col("__na") + lit(nBins.toLong))
    val pB = (col("__cb") + lit(1L)) / (col("__nb") + lit(nBins.toLong))
    val full = grid.join(counts, Seq("grp", "bin_id"), "left")
      .select(col("grp"), col("__na"), col("__nb"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
      .select(col("grp"), col("__na"), col("__nb"),
        ((pA - pB) * log(pA / pB)).as("__term"),
        when(col("__ca") + col("__cb") > 0, 1L).otherwise(0L).as("__present"))
    full.groupBy(col("grp"), col("__na").as("n_a"), col("__nb").as("n_b"))
      .agg(sum("__term").as("psi"), sum("__present").as("n_bins_hit"))
      .withColumn("psi_flag",
        when(col("psi") > 0.25, "major")
          .when(col("psi") > 0.1, "moderate")
          .otherwise("stable"))
      .select("grp", "n_a", "n_b", "n_bins_hit", "psi", "psi_flag")
  }

  /** Exact two-sample Kolmogorov–Smirnov drift test per group: the
    * distribution-shift check a training pipeline runs between corpus
    * snapshots (old drop vs new drop, window A vs window B) before mixing
    * them — summary moments miss shape changes that KS catches. For each
    * group: D = max over observed values of |F_A(x) − F_B(x)| on the
    * empirical CDFs of the rows where `sliceCol` is true (slice A) vs
    * false (slice B), plus the classic 5% critical value
    * `1.358·sqrt((n_a+n_b)/(n_a·n_b))` and the resulting drift verdict.
    * Null values and null slice flags are excluded by contract.
    *
    * Scale shape: NEVER a single-partition ordered scan. The per-(group,
    * value) counts aggregate partial-combined; the cumulative counts that
    * form the CDFs use the same two-level sharded prefix sum as
    * [[Prefix.runningSum]], range-sharding the VALUE axis at
    * `shardWidth` (local window inside each (group, shard), metadata-scale
    * shard totals broadcast back) — so the ordered walk parallelizes
    * across the value range. Every per-value CDF step is a single
    * integer-quotient subtraction (no float accumulation), and max is
    * order-insensitive, so the statistic is bit-stable under any
    * partitioning and engine.
    */
  def ksDrift(df: DataFrame, groupCol: String, valueCol: String,
      sliceCol: org.apache.spark.sql.Column,
      shardWidth: Double = 1.0): DataFrame = {
    require(shardWidth > 0, s"shardWidth must be positive, got $shardWidth")
    val v = df.select(col(groupCol).as("grp"),
        col(valueCol).cast("double").as("v"), sliceCol.as("__in_a"))
      .where(col("v").isNotNull && col("__in_a").isNotNull)
    val counts = v.groupBy("grp", "v").agg(
      count(when(col("__in_a"), lit(1))).as("__ca"),
      count(when(!col("__in_a"), lit(1))).as("__cb"))
    val sharded = counts.withColumn("__shard",
      floor(col("v") / shardWidth).cast("long"))
    val localW = org.apache.spark.sql.expressions.Window
      .partitionBy("grp", "__shard").orderBy("v")
    val local = sharded
      .withColumn("__la", sum(col("__ca")).over(localW))
      .withColumn("__lb", sum(col("__cb")).over(localW))
    val prefW = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("__shard")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val prefixes = sharded.groupBy("grp", "__shard")
      .agg(sum("__ca").as("__ta"), sum("__cb").as("__tb"))
      .select(col("grp"), col("__shard"),
        coalesce(sum("__ta").over(prefW), lit(0L)).as("__pa"),
        coalesce(sum("__tb").over(prefW), lit(0L)).as("__pb"))
    // KS is undefined for a one-sided group (and ANSI division would
    // error): only groups observed in BOTH slices are emitted
    val tot = counts.groupBy("grp")
      .agg(sum("__ca").as("n_a"), sum("__cb").as("n_b"))
      .where(col("n_a") > 0 && col("n_b") > 0)
    local.join(broadcast(prefixes), Seq("grp", "__shard"))
      .join(broadcast(tot), "grp")
      .groupBy(col("grp"), col("n_a"), col("n_b"))
      .agg(max(abs((col("__pa") + col("__la")) / col("n_a") -
        (col("__pb") + col("__lb")) / col("n_b"))).as("ks_d"))
      .withColumn("ks_crit",
        lit(1.358) * sqrt((col("n_a").cast("double") + col("n_b").cast("double")) /
          (col("n_a").cast("double") * col("n_b").cast("double"))))
      .withColumn("drifted", col("ks_d") > col("ks_crit"))
      .select("grp", "n_a", "n_b", "ks_d", "ks_crit", "drifted")
  }

  /** Exact equi-depth histogram per group: bucket k's upper boundary is
    * the value at rank ⌊n·k/nBuckets⌋ under the (value, tiebreak) order —
    * the distribution summary optimizers keep for selectivity estimation
    * (equal ROW counts per bucket, where [[histogram]] fixes the WIDTH).
    * Discrete selection (an actual data value, no interpolation) keeps the
    * boundary arithmetic engine-exact.
    *
    * Scale: this is the exact face — one per-group sort window; at corpus
    * scale serve rank queries from [[Sketches.quantileSketch]] instead and
    * keep this for the slices that fit a sort.
    */
  def equiDepth(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String, nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("grp").orderBy(col("v"), col("__tie"))
    val ranked = df
      .select(col(groupCol).as("grp"), col(valueCol).as("v"),
        col(tieCol).as("__tie"))
      .where(col("v").isNotNull && !isnan(col("v")))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
    val targets = ranked.select("grp", "n").distinct()
      .select(col("grp"), col("n"),
        explode(sequence(lit(1), lit(nBuckets))).as("bucket"))
      .select(col("grp"), col("bucket"),
        greatest(expr("(n * bucket) div " + nBuckets), lit(1L)).as("rn"))
    targets.join(ranked, Seq("grp", "rn"))
      .groupBy("grp", "bucket")
      // n < nBuckets duplicates target ranks: several buckets share one
      // row — min(v) is that row's value either way, and the distinct
      // keeps one row per bucket
      .agg(min("v").as("upper_value"), min("n").as("n_rows"))
      .select(col("grp"), col("bucket").cast("long").as("bucket"),
        col("upper_value"), col("n_rows"))
  }

  /** Per-group daily volume anomaly: event COUNTS per (group, day), each
    * day's count z-scored against its group's across-day distribution —
    * the ops-monitoring "did ingest spike/drop today" check, over volumes
    * rather than values (where [[ksDrift]]/[[psiDrift]] look).
    *
    * Each group's (min day, max day) span is densified with zero-filled
    * counts before the moments: a COMPLETE outage day (zero events) is
    * the headline "did ingest drop" case, and a sparse-only grid could
    * neither flag it nor keep it out of the mean the spikes are judged
    * against. Days before a group's first event are unknowable (the group
    * may simply not have existed) and stay absent.
    *
    * The moments are EXACT integer arithmetic (counts, Σc, Σc² as longs)
    * until the final divisions, so the statistic is bit-reproducible
    * cross-engine. Sample variance via the co-moment form
    * (n·Σc² − (Σc)²)/(n·(n−1)); groups with < 2 days or zero spread emit
    * null z and never flag. Scale shape: two partial-combined aggregates
    * (day counts, then per-group moments) + a broadcast-sized rejoin on
    * the group key; the day grid is (groups × span-days) rows — metadata
    * scale, generated from a per-group min/max aggregate.
    */
  def volumeAnomaly(events: DataFrame, groupCol: String = "event_type",
      tsCol: String = "ts", dayNs: Long = 86400L * 1000 * 1000 * 1000,
      threshold: Double = 2.0): DataFrame = {
    require(dayNs > 0, s"dayNs must be positive, got $dayNs")
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val sparse = events
      .select(col(groupCol).as("grp"),
        expr(s"(`$tsCol` - pmod(`$tsCol`, $dayNs)) div $dayNs").as("day"))
      .groupBy("grp", "day").agg(count(lit(1)).as("n_events"))
    val grid = sparse.groupBy("grp")
      .agg(min("day").as("__lo"), max("day").as("__hi"))
      .select(col("grp"), explode(sequence(col("__lo"), col("__hi"))).as("day"))
    val daily = grid.join(sparse, Seq("grp", "day"), "left")
      .select(col("grp"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
    val mom = daily.groupBy("grp").agg(
      count(lit(1)).as("__n"), sum("n_events").as("__s"),
      sum(col("n_events") * col("n_events")).as("__ss"))
    daily.join(mom, "grp")
      .withColumn("mean_events", col("__s").cast("double") / col("__n"))
      .withColumn("__var",
        when(col("__n") >= 2,
          (col("__n") * col("__ss") - col("__s") * col("__s")).cast("double")
            / (col("__n") * (col("__n") - 1)).cast("double")))
      .withColumn("z",
        when(col("__var") > 0.0,
          (col("n_events").cast("double") - col("mean_events")) / sqrt(col("__var"))))
      .withColumn("is_anomaly", coalesce(abs(col("z")) > threshold, lit(false)))
      .select("grp", "day", "n_events", "mean_events", "z", "is_anomaly")
  }

  /** Snapshot diff between two corpus versions: each id is classified as
    * `added` (only in the new snapshot), `removed` (only in the old), or
    * `changed` (present in both with different payload); unchanged rows
    * are dropped — the incremental-ingest audit that decides what a
    * downstream pipeline actually has to reprocess.
    *
    * Scale shape: ONE full-outer shuffle join on the id key; the payload
    * comparison is a null-safe equality over the named columns evaluated
    * inside the join projection (at 100 TB you would pre-hash the payload
    * into a content digest column at write time and diff digests — the
    * join shape is identical, so this operator IS that plan with the
    * digest inlined). No collects, no windows.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "snapshotDiff needs at least one payload column")
    def digest(df: DataFrame, tag: String): DataFrame =
      df.select(col(idCol),
        // null-safe: a null payload cell must compare equal to null, not
        // poison the whole digest — coalesce each cell into the digest
        concat_ws("",
          payloadCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
          .as(s"__d_$tag"))
    digest(oldDf, "old")
      .join(digest(newDf, "new"), Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__d_old").isNull, lit("added"))
          .when(col("__d_new").isNull, lit("removed"))
          .when(col("__d_old") =!= col("__d_new"), lit("changed")))
      .where(col("status").isNotNull)
      .select(col(idCol), col("status"))
  }

  /** Per-column completeness audit — the first data-quality report run on
    * any new corpus drop: for EVERY top-level column, how many rows are
    * null, NaN (float/double), or empty ('' strings, zero-length arrays),
    * and the resulting usable-fraction `complete_rate`. A column whose
    * completeness moved between snapshots is the earliest signal of an
    * upstream extraction break — before any distribution test
    * ([[ksDrift]]/[[psiDrift]]) has enough signal to fire.
    *
    * The three miss-kinds are disjoint by construction (NaN and empty are
    * only counted on non-null rows), so `complete_rate = (n_total − n_null
    * − n_nan − n_empty) / n_total` is an exact integer quotient.
    *
    * Scale shape: ONE scan — every per-column counter is a conditional
    * count in a single partial-combined aggregation; the per-column rows
    * come from exploding the one aggregated struct array (k rows for k
    * columns, driver-free).
    */
  def completeness(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val structs = df.schema.fields.toSeq.map { f =>
      val c = col(f.name)
      val nNan: Column = f.dataType match {
        case DoubleType | FloatType =>
          count(when(c.isNotNull && isnan(c), lit(1)))
        case _ => lit(0L)
      }
      val nEmpty: Column = f.dataType match {
        case StringType => count(when(c.isNotNull && length(c) === 0, lit(1)))
        case _: ArrayType => count(when(c.isNotNull && size(c) === 0, lit(1)))
        case _ => lit(0L)
      }
      struct(lit(f.name).as("col_name"),
        lit(f.dataType.simpleString).as("dtype"),
        count(lit(1)).as("n_total"),
        count(when(c.isNull, lit(1))).as("n_null"),
        nNan.cast("long").as("n_nan"), nEmpty.cast("long").as("n_empty"))
    }
    val named = structs.zipWithIndex.map { case (s, i) => s.as(s"__s$i") }
    df.agg(named.head, named.tail: _*)
      .select(explode(array(structs.indices.map(i =>
        col(s"__s$i")): _*)).as("c"))
      .select(col("c.*"))
      .withColumn("complete_rate",
        (col("n_total") - col("n_null") - col("n_nan") - col("n_empty"))
          .cast("double") / col("n_total").cast("double"))
  }

  /** χ² 5% upper-tail critical value at df = 8 (9 digit cells − 1) — the
    * Benford verdict boundary, a literal decimal string that parses to the
    * same IEEE double in any engine.
    */
  val BenfordChiSq95Df8 = 15.50731305586545

  /** Benford's-law first-digit audit of a money-like column, per group —
    * the classic "does this numeric column look organically generated"
    * data-quality screen (fabricated or templated values flunk it; so do
    * range-clipped synthetics, which is worth knowing about a corpus
    * before training on its numbers). Emits the DENSE 9-digit grid per
    * group (a digit with zero observations still contributes its
    * (0 − n·p)²/(n·p) term, like [[psiDrift]]'s empty bins) with observed
    * vs expected shares, plus the group-level χ² and its 5% verdict
    * against [[BenfordChiSq95Df8]].
    *
    * Cross-engine exactness: the value is resolved to integer CENTS
    * (`round(v·100)` as a long) and the leading digit is the first
    * character of the integer's decimal rendering — integer→string is
    * engine-stable where float formatting is not. Expected shares are
    * log10(1 + 1/d) evaluated as ln-ratios in both engines. Zero cents
    * (no leading digit) and null values are excluded.
    *
    * Scale shape: one partial-combined groupBy on (group, digit), a
    * broadcast of the per-group totals (one row per group), and the dense
    * grid is groups × 9 — metadata scale throughout.
    */
  def benford(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val cents = round(col(valueCol) * 100).cast("long")
    val obs = df
      .where(col(valueCol).isNotNull && cents =!= 0)
      .select(col(groupCol).as("grp"),
        substring(abs(cents).cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("grp", "digit").agg(count(lit(1)).as("n_obs"))
    val digits = obs.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val grid = obs.select("grp").distinct().crossJoin(broadcast(digits))
    val totals = obs.groupBy("grp").agg(sum("n_obs").as("n_total"))
    val dense = grid
      .join(obs, Seq("grp", "digit"), "left_outer")
      .join(broadcast(totals), Seq("grp"))
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .withColumn("exp_share",
        log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0)))
    val nD = col("n_total").cast("double")
    val term = {
      val e = nD * col("exp_share")
      (col("n_obs").cast("double") - e) * (col("n_obs").cast("double") - e) / e
    }
    val chi = dense.groupBy("grp").agg(sum(term).as("chi2"))
    dense
      .join(broadcast(chi), Seq("grp"))
      .select(col("grp"), col("digit"), col("n_total"), col("n_obs"),
        (col("n_obs").cast("double") / nD).as("obs_share"), col("exp_share"),
        col("chi2"), (col("chi2") > BenfordChiSq95Df8).as("reject_benford"))
  }

  /** Per-column distinct-cardinality audit: for each listed column, the
    * non-null count, the EXACT distinct count, and the HLL estimate from
    * the same register derivation as [[Sketches.hllDistinct]], with the
    * relative error between them — the report that (a) sizes join keys,
    * dictionary encodings, and partition counts on a new corpus drop, and
    * (b) measures on YOUR data whether the sketch path is trustworthy
    * before swapping it in at the scale where exact counting stops being
    * affordable (the [[graft.pipeline.Dedup.minhashEval]] pattern: the
    * exact column is the audit baseline, the estimate is the scale path).
    *
    * Values are canonicalized by string cast — pass integer/string
    * columns, or pre-canonicalize floats to an integer form yourself
    * (engine-portable float rendering is not a thing; the audit refuses
    * to pretend otherwise). One scan: columns stack through a single
    * explode fan-out (#cols rows per input row), then two
    * partial-combined aggregates per column. The exact distinct is the
    * one corpus-cardinality shuffle; drop it from the output query at
    * 100 TB and the HLL side alone is register-bounded.
    */
  def distinctProfile(df: DataFrame, cols: Seq[String], p: Int = 10): DataFrame = {
    require(cols.nonEmpty, "distinctProfile needs at least one column")
    val stacked = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("column_name"), col(c).cast("string").as("__v"))): _*))
        .as("__s"))
      .select(col("__s.column_name").as("column_name"), col("__s.__v").as("__v"))
      .where(col("__v").isNotNull)
    val exact = stacked.groupBy("column_name")
      .agg(count(lit(1)).as("n_nonnull"),
        count_distinct(col("__v")).as("exact_distinct"))
    exact
      .join(Sketches.hllDistinct(stacked, p, Seq("column_name"), "__v"),
        Seq("column_name"))
      .select(col("column_name"), col("n_nonnull"), col("exact_distinct"),
        col("n_registers_hit"), col("est_distinct"),
        ((col("est_distinct") - col("exact_distinct").cast("double"))
          / col("exact_distinct").cast("double")).as("rel_error"))
  }
}
