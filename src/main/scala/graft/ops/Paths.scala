package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Session path mining: the most common ordered event-type sequences per
  * gap-session ("signup > click > purchase"), truncated to the first
  * `maxSteps` events — the product-analytics view of how users actually
  * move through a flow, where [[Funnel]] measures one prescribed order.
  *
  * Scale shape: session labeling, step numbering and the step cap all ride
  * ONE (user)-keyed shuffle+sort — the step index is `rn − last-start-rn`
  * computed with running frames in the same sort, so no second window over
  * the (user, session) key exists and the per-session `collect_list` is
  * bounded by `maxSteps` BEFORE it materializes (a runaway session cannot
  * blow executor memory). The path count is a partial-combined aggregate on
  * the path string; top-k is ORDER BY + LIMIT → TakeOrderedAndProject.
  */
object Paths {

  def topPaths(events: DataFrame, gapNs: Long, k: Int, maxSteps: Int = 5,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", typeCol: String = "event_type"): DataFrame = {
    require(gapNs > 0, s"gap must be positive, got $gapNs")
    require(k > 0, s"k must be positive, got $k")
    require(maxSteps > 0, s"maxSteps must be positive, got $maxSteps")
    Sessionize.labelSessions(events, gapNs, userCol, tsCol, idCol)
      .where(col("__rn") - col("__start_rn") < maxSteps)
      .groupBy(col(userCol), col("session_idx"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col(tsCol), col(idCol),
            col(typeCol).as("t")))),
          s => s.getField("t")),
        " > ").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(k)
  }
}
