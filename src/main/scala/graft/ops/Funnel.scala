package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream: for each user, the
  * earliest step-1 event, the earliest step-2 event STRICTLY after it, and
  * so on — the classic product-analytics sequence operator (signup → click
  * → purchase). Strict ordering means a step-2 event at the exact same
  * instant as step 1 does NOT advance the funnel, and an earlier step-2
  * event never counts.
  *
  * Scale shape: step k is a type filter + groupBy(user) min, joined back to
  * step k-1 — every exchange in the chain is on the SAME user key, so the
  * planner reuses one partitioning across all k stages instead of windowing
  * the full event set or building a k-way self-join; the per-step inputs
  * shrink monotonically (only users who reached k-1 survive). Type filters
  * push down to the scan.
  */
object Funnel {

  /** One row per user who reached step 1: `t_1 .. t_k` (nulls once the user
    * drops out) and `stage_reached` in [1, k].
    */
  def funnel(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = events.select(col(userCol), col(typeCol), col(tsCol))
    val first = base.where(col(typeCol) === steps.head)
      .groupBy(userCol).agg(min(tsCol).as("t_1"))
    val staged = steps.zipWithIndex.tail.foldLeft(first) { case (prev, (step, i)) =>
      val next = base.where(col(typeCol) === step)
        .join(prev.select(col(userCol), col(s"t_$i")), Seq(userCol))
        .where(col(tsCol) > col(s"t_$i"))
        .groupBy(userCol).agg(min(tsCol).as(s"t_${i + 1}"))
      prev.join(next, Seq(userCol), "left")
    }
    val stage = steps.indices.tail.foldLeft(lit(1)) { (acc, i) =>
      acc + when(col(s"t_${i + 1}").isNotNull, 1).otherwise(0)
    }
    staged.withColumn("stage_reached", stage)
  }

  /** Step-to-step conversion timing over the [[funnel]] result: for each
    * adjacent step pair, how many users arrived, how many converted, the
    * conversion rate, and the median / p90 time-to-convert — the numbers a
    * product review actually reads off a funnel (WHERE users stall and HOW
    * LONG the converting ones take). Rates are integer quotients
    * (bit-stable); the percentiles use the exact linear-interpolated
    * definition both engines share. A pair with no arrivals reports a
    * null rate instead of dividing by zero.
    *
    * Scale shape: the funnel frame is user-scale and materialized once;
    * each pair is then one bounded aggregation over it — k−1 passes over
    * users, never over events.
    */
  def stepTiming(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.size >= 2, "stepTiming needs at least two steps")
    val f = graft.core.Lineage.truncate(
      funnel(events, steps, userCol, typeCol, tsCol))
    steps.indices.tail.map { i =>
      val dt = col(s"t_${i + 1}") - col(s"t_$i")
      f.where(col(s"t_$i").isNotNull).agg(
          count(lit(1)).as("n_from"),
          count(col(s"t_${i + 1}")).as("n_to"),
          percentile(dt, lit(0.5)).as("median_dt_ns"),
          percentile(dt, lit(0.9)).as("p90_dt_ns"))
        .select(lit(i).as("step_from"), lit(i + 1).as("step_to"),
          col("n_from"), col("n_to"),
          when(col("n_from") > 0, col("n_to") / col("n_from")).as("conv_rate"),
          col("median_dt_ns"), col("p90_dt_ns"))
    }.reduce(_ unionByName _)
  }

  /** Linear multi-touch attribution: each conversion's value is split
    * EVENLY across the touch events in its preceding `windowNs` (the
    * marketing counterpart of the as-of join's winner-takes-all
    * last-touch), rolled up to credited revenue per touch DAY; conversions
    * with no touch in window land in the `day = -1` organic bucket. The
    * pair space is the bounded-range interval join (state/pairs capped by
    * window·rate per user, never the stream square).
    */
  def linearAttribution(events: DataFrame, windowNs: Long,
      touchType: String = "click", convType: String = "purchase",
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", idCol: String = "event_id",
      valueCol: String = "value",
      dayNs: Long = 86400L * 1000 * 1000 * 1000): DataFrame = {
    require(windowNs >= 0 && dayNs > 0,
      s"need windowNs >= 0, dayNs > 0; got windowNs=$windowNs dayNs=$dayNs")
    val touches = events.where(col(typeCol) === touchType)
      .select(col(userCol), col(idCol).as("touch_id"), col(tsCol).as("touch_ts"))
    // a NaN conversion value still counts as a conversion (touch counts
    // keep it) but contributes no revenue — nulled so sum() skips it
    // rather than poisoning the day's credited_revenue
    val convs = events.where(col(typeCol) === convType)
      .select(col(userCol), col(idCol).as("conv_id"), col(tsCol).as("conv_ts"),
        when(!isnan(col(valueCol)), col(valueCol)).as("__v"))
    val pairs = graft.ops.IntervalJoin.intervalJoin(
      touches, convs, userCol, "touch_ts", "conv_ts", windowNs)
    val k = pairs.groupBy("conv_id").agg(count(lit(1)).as("__k"))
    val credited = pairs.join(k, "conv_id")
      .select(expr(s"(touch_ts - pmod(touch_ts, $dayNs)) div $dayNs").as("day"),
        (col("__v") / col("__k")).as("__credit"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_touches"), sum("__credit").as("credited_revenue"))
    val organic = convs
      .join(pairs.select("conv_id").distinct(), Seq("conv_id"), "left_anti")
      .agg(count(lit(1)).as("n_touches"), sum("__v").as("credited_revenue"))
      .select(lit(-1L).as("day"), col("n_touches"), col("credited_revenue"))
      .where(col("n_touches") > 0)
    credited.unionByName(organic)
  }
}
