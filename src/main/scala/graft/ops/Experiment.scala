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
}
