package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.pipeline.Sampling

/** Online-experiment analysis over an event log: deterministic 50/50 arm
  * assignment by the salt-keyed Carter–Wegman user hash (the SAME family
  * every sampling/split operator uses — assignment is reproducible across
  * engines, reruns, and cluster layouts, and uncorrelated with any other
  * salt's draw), then the classic two-proportion z-test on a per-user
  * conversion flag.
  *
  * This is the measurement half of a data platform's experimentation loop:
  * ship a change to arm B, define "converted" as any boolean over the
  * user's events, read one row with the pooled z and the 5% two-sided
  * verdict. The statistic follows the standard pooled form
  * z = (p_a − p_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)); every float enters
  * through the same pinned expression tree in the SQL twin, and every
  * input to it is an exact integer aggregate, so the single output row is
  * reproducible to the last ulp.
  *
  * Scale shape: one partial-combined per-user aggregate (the only shuffle,
  * on the well-spread user key), then a single-row conditional-sum
  * aggregate — at 100 TB of events this is a scan plus two reductions; the
  * z arithmetic happens once on a one-row frame.
  */
object Experiment {

  def abTest(events: DataFrame, userCol: String, converted: Column,
      salt: String = "abtest"): DataFrame = {
    val users = events.groupBy(col(userCol).as("__user"))
      .agg(max(converted.cast("int")).as("__conv"))
    val armed = users.withColumn("__arm",
      when(Sampling.bucketOf(col("__user"), salt) < Sampling.Buckets / 2, "A")
        .otherwise("B"))
    val r = armed.agg(
      sum(when(col("__arm") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__arm") === "A", col("__conv").cast("long")).otherwise(0L))
        .as("conv_a"),
      sum(when(col("__arm") === "B", 1L).otherwise(0L)).as("n_b"),
      sum(when(col("__arm") === "B", col("__conv").cast("long")).otherwise(0L))
        .as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a")
    val pb = col("conv_b").cast("double") / col("n_b")
    val pooled = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val se = sqrt(pooled * (lit(1.0) - pooled) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    // degenerate designs (everyone converts, nobody converts, an empty
    // arm) have se = 0 or undefined proportions: the test is inapplicable
    // — report null z / not-significant instead of dividing by zero
    // (ANSI mode makes the raw division a hard error)
    r.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        pa.as("p_a"), pb.as("p_b"),
        when(col("n_a") > 0 && col("n_b") > 0 && se > 0.0,
          (pa - pb) / se).as("z"))
      .withColumn("significant", coalesce(abs(col("z")) > 1.96, lit(false)))
  }

  /** Reliability diagram + expected calibration error for a probabilistic
    * classifier: scores bucket into `nBins` equal-width bins; each bin
    * reports its count, mean confidence (avg score), empirical positive
    * rate, and the gap — the evaluation that tells whether a quality
    * filter's "0.8" actually means 80% (a miscalibrated filter silently
    * shifts the kept-data distribution when thresholded). `ece` is the
    * count-weighted mean |gap| (Naeini et al. 2015's ECE), attached to
    * every row as the scalar summary.
    *
    * Scores outside [0, 1] clamp into the edge bins; null/NaN scores and
    * null labels are excluded by contract. The positive rate is an exact
    * integer quotient (bit-stable); mean confidence is a per-bin float
    * mean and the ECE a ≤ nBins-term sum — both far inside cross-engine
    * tolerance. Scale shape: one partial-combined aggregate on ≤ nBins
    * keys, then two metadata-scale scalars broadcast back.
    */
  /** (z_{0.025} + z_{0.20})² — the 5% two-sided / 80% power constant of the
    * classic two-proportion sample-size formula, computed ONCE here so the
    * Spark plan and the SQL twin interpolate the identical double.
    */
  val PowerKappa: Double = {
    val s = 1.959963984540054 + 0.8416212335729143
    s * s
  }

  /** A/B sample-size planner — the design-time face of [[abTest]] (what
    * [[graft.pipeline.Dedup.lshPlan]] is to the dedup family): BEFORE
    * running an experiment, how many users per arm does each detectable
    * effect size need, and can this corpus power it? For each absolute
    * lift δ in `effects`, the classic two-proportion formula at α = 5%
    * two-sided and 80% power: `n = κ · (p₁(1−p₁) + p₂(1−p₂)) / δ²` with
    * p₁ the MEASURED baseline conversion of the corpus (not an assumed
    * one) and p₂ = p₁ + δ. `n_available` is half the distinct user count
    * (a 50/50 split); `powered` says whether the corpus can detect that
    * effect at all. Rows whose target p₂ ≥ 1 report null n/powered — the
    * design is meaningless there.
    *
    * Exactness: the baseline is an integer quotient; κ and every δ are
    * literals shared with the twin; the formula is one pinned expression.
    * Scale shape: one partial-combined user rollup, then a ≤|effects|-row
    * grid — metadata scale after the scan.
    */
  def powerPlan(events: DataFrame, userCol: String, converted: Column,
      effects: Seq[Double] = (1 to 10).map(_ / 100.0)): DataFrame = {
    require(effects.nonEmpty && effects.forall(e => e > 0 && e < 1),
      s"effects must be in (0, 1), got $effects")
    val users = events.groupBy(col(userCol).as("__user"))
      .agg(max(converted.cast("int")).as("__conv"))
    val base = users.agg(count(lit(1)).as("n_users"),
      sum(col("__conv").cast("long")).as("n_conv"))
    val p1 = col("n_conv").cast("double") / col("n_users").cast("double")
    val grid = base
      .select(col("n_users"), col("n_conv"), p1.as("p_base"),
        explode(array(effects.map(lit): _*)).as("effect"))
      .withColumn("p_target", col("p_base") + col("effect"))
    val nReq = ceil(lit(PowerKappa)
      * (col("p_base") * (lit(1.0) - col("p_base"))
        + col("p_target") * (lit(1.0) - col("p_target")))
      / (col("effect") * col("effect"))).cast("long")
    grid.select(col("effect"), col("n_users"), col("p_base"),
        col("p_target"),
        when(col("p_target") < 1.0, nReq).as("n_required"),
        expr("n_users DIV 2").as("n_available"))
      .withColumn("powered",
        when(col("p_target") < 1.0, col("n_available") >= col("n_required")))
  }

  /** CUPED variance-reduced experiment readout (Deng, Xu, Kohavi & Walker
    * 2013) — the standard trick that makes small lifts detectable without
    * more users: regress the post-period metric y on the PRE-period
    * covariate x (the same metric before the split point; pre-period data
    * cannot be affected by the treatment), and analyze the adjusted metric
    * ŷ = y − θ·(x − x̄) whose variance shrinks by the squared correlation.
    * θ = cov(x, y)/var(x) is pooled over both arms, the unbiased choice.
    *
    * The split point is the integer midpoint of the corpus's time range;
    * arms come from the same salt-keyed Carter–Wegman user hash as
    * [[abTest]] (salt "abtest" → the SAME arms, so this is the
    * variance-reduced readout of the same experiment). `metric` is a
    * per-event INTEGER contribution (e.g. floored purchase value) — the
    * integer contract is what makes every moment exact.
    *
    * Exactness: per-user x/y are long sums, cast to decimal(20,0) (exact
    * for any long); their pairwise products land in decimal(38,0) (a
    * long² is < 8.6e37, so a single product can never overflow) and the
    * cross-user moments Σx, Σy, Σx², Σxy, Σy² accumulate in decimal(38,0)
    * (exact, order-free — a float sum here would wobble at the compare's
    * 9th digit); the co-moment identities n·Σxy − Σx·Σy etc. stay
    * integer-exact until the final pinned double expressions. The 38-digit
    * ceiling IS reachable by the sums (n·(1e19)² style corpora): under
    * non-ANSI mode Spark nulls an overflowed decimal aggregate, so every
    * moment and co-moment is guarded — null with n > 0 raises instead of
    * silently reading as a degenerate design. Adjusted means need no per-user
    * adjusted values: mean(ŷ)_arm = ȳ_arm − θ(x̄_arm − x̄), and
    * var(ŷ) = var(y) − 2θcov + θ²var(x), all from the same moments.
    * Degenerate designs (no x variance, no y variance, an empty arm)
    * yield null θ / ratio / z rather than dividing by zero.
    *
    * Scale shape: one partial-combined per-user aggregate on the
    * well-spread user key (the only corpus-scale shuffle), then a
    * single-row moment reduction — a scan plus two reductions at 100 TB.
    */
  def cuped(events: DataFrame, userCol: String, metric: Column,
      tsCol: String = "ts", salt: String = "abtest"): DataFrame = {
    val bounds = events.agg(min(col(tsCol)).as("__lo"), max(col(tsCol)).as("__hi"))
    val m = coalesce(metric.cast("long"), lit(0L))
    val mid = expr("(__lo + __hi) div 2")
    val users = events
      .where(col(userCol).isNotNull)
      .crossJoin(broadcast(bounds))
      .select(col(userCol).as("__user"),
        when(col(tsCol) < mid, m).otherwise(0L).as("__mx"),
        when(col(tsCol) >= mid, m).otherwise(0L).as("__my"))
      .groupBy("__user")
      .agg(sum("__mx").as("__x"), sum("__my").as("__y"))
      .withColumn("__arm",
        when(Sampling.bucketOf(col("__user"), salt) < Sampling.Buckets / 2, "A")
          .otherwise("B"))
    val dec = (c: Column) => c.cast("decimal(20,0)")
    // linear terms sum as decimal(28,0) so Spark's sum-widening rule
    // (p+10, capped at 38) really yields decimal(38,0) accumulators —
    // summed straight from decimal(20,0) they would only get
    // decimal(30,0) and null out ~10^8 below the documented ceiling.
    // The quadratic terms are decimal(38,0) products already.
    val dec28 = (c: Column) => c.cast("decimal(28,0)")
    val g = users.agg(
      count(lit(1)).as("n"),
      sum(dec28(col("__x"))).as("sx"), sum(dec28(col("__y"))).as("sy"),
      sum(dec(col("__x")) * dec(col("__x"))).as("sxx"),
      sum(dec(col("__x")) * dec(col("__y"))).as("sxy"),
      sum(dec(col("__y")) * dec(col("__y"))).as("syy"),
      sum(when(col("__arm") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__arm") === "A", dec28(col("__x"))).otherwise(dec28(lit(0L))))
        .as("sx_a"),
      sum(when(col("__arm") === "A", dec28(col("__y"))).otherwise(dec28(lit(0L))))
        .as("sy_a"),
      sum(when(col("__arm") === "B", 1L).otherwise(0L)).as("n_b"),
      sum(when(col("__arm") === "B", dec28(col("__x"))).otherwise(dec28(lit(0L))))
        .as("sx_b"),
      sum(when(col("__arm") === "B", dec28(col("__y"))).otherwise(dec28(lit(0L))))
        .as("sy_b"))
    // overflow guard: a decimal(38,0) aggregate that overflows nulls out
    // under non-ANSI mode; a null moment with users present can only be
    // that, and silently feeding it forward would read as "no variance"
    val guard = (c: Column, nm: String) => when(col("n") > 0 && c.isNull,
      raise_error(lit(s"cuped: moment $nm overflowed decimal(38,0) — " +
        "per-user metric sums near the long range exceed the exact-moment " +
        "contract; rescale the per-event metric"))).otherwise(c)
    val gg = g.select(col("n"), col("n_a"), col("n_b"),
      guard(col("sx"), "sum(x)").as("sx"),
      guard(col("sy"), "sum(y)").as("sy"),
      guard(col("sxx"), "sum(x*x)").as("sxx"),
      guard(col("sxy"), "sum(x*y)").as("sxy"),
      guard(col("syy"), "sum(y*y)").as("syy"),
      guard(col("sx_a"), "sum_a(x)").as("sx_a"),
      guard(col("sy_a"), "sum_a(y)").as("sy_a"),
      guard(col("sx_b"), "sum_b(x)").as("sx_b"),
      guard(col("sy_b"), "sum_b(y)").as("sy_b"))
    val nD = col("n").cast("decimal(20,0)")
    val v = gg.select(col("*"),
      guard(nD * col("sxx") - col("sx") * col("sx"), "n*sxx-sx*sx").as("__vxx"),
      guard(nD * col("sxy") - col("sx") * col("sy"), "n*sxy-sx*sy").as("__vxy"),
      guard(nD * col("syy") - col("sy") * col("sy"), "n*syy-sy*sy").as("__vyy"))
    val D = (c: Column) => c.cast("double")
    val theta = when(col("__vxx") > 0, D(col("__vxy")) / D(col("__vxx")))
    val meanX = D(col("sx")) / D(col("n"))
    val meanA = when(col("n_a") > 0, D(col("sy_a")) / D(col("n_a")))
    val meanB = when(col("n_b") > 0, D(col("sy_b")) / D(col("n_b")))
    val meanXA = when(col("n_a") > 0, D(col("sx_a")) / D(col("n_a")))
    val meanXB = when(col("n_b") > 0, D(col("sx_b")) / D(col("n_b")))
    val adjA = meanA - theta * (meanXA - meanX)
    val adjB = meanB - theta * (meanXB - meanX)
    val varAdjNum =
      D(col("__vyy")) - lit(2.0) * theta * D(col("__vxy")) +
        theta * theta * D(col("__vxx"))
    val varAdjPop = varAdjNum / (D(col("n")) * D(col("n")))
    val se = sqrt(varAdjPop * (lit(1.0) / D(col("n_a")) + lit(1.0) / D(col("n_b"))))
    v.select(col("n"), col("n_a"), col("n_b"), theta.as("theta"),
        meanA.as("mean_a"), meanB.as("mean_b"),
        (meanB - meanA).as("diff_raw"),
        adjA.as("adj_mean_a"), adjB.as("adj_mean_b"),
        (adjB - adjA).as("diff_adj"),
        when(col("__vyy") > 0, varAdjNum / D(col("__vyy"))).as("var_reduction"),
        when(col("n_a") > 0 && col("n_b") > 0 && se > 0.0,
          (adjB - adjA) / se).as("z_adj"))
      .withColumn("significant", coalesce(abs(col("z_adj")) > 1.96, lit(false)))
  }

  def calibrationBins(df: DataFrame, probCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val p = df.select(col(probCol).cast("double").as("__p"),
        col(labelCol).cast("boolean").as("__y"))
      .where(col("__p").isNotNull && !isnan(col("__p")) && col("__y").isNotNull)
    val bins = p
      .withColumn("bin_id", least(greatest(
        floor(col("__p") * nBins).cast("long"), lit(0L)), lit(nBins - 1L)))
      .groupBy("bin_id")
      .agg(count(lit(1)).as("n"),
        avg(col("__p")).as("mean_conf"),
        (count(when(col("__y"), lit(1))) / count(lit(1))).as("pos_rate"))
    val tot = bins.agg(sum("n").as("__tot"))
    val ece = bins.crossJoin(broadcast(tot))
      .agg(sum((col("n") / col("__tot")) *
        abs(col("pos_rate") - col("mean_conf"))).as("ece"))
    bins.crossJoin(broadcast(ece))
      .select(col("bin_id"), col("n"), col("mean_conf"), col("pos_rate"),
        (col("pos_rate") - col("mean_conf")).as("gap"), col("ece"))
  }
}
