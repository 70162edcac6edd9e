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
}
