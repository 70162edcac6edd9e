package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream: events of the same user
  * separated by more than `gapNs` start a new session — the classic
  * analytics operator (and the batch twin of a session-window streaming
  * aggregation).
  *
  * Shape: one shuffle on the user key, then two window passes over the
  * same (user, time) ordering — Catalyst evaluates both in a single sort:
  * lag() marks session starts, a running sum numbers them. The final
  * per-session rollup re-uses the same partitioning (no extra shuffle:
  * groupBy(user, session) is a sub-key of the window partitioning). Skewed
  * power users are the known hazard at 100 TB; the per-user session index
  * is inherently sequential, so the mitigation is range-partitioning the
  * sort (Spark does) — the rollup itself still combines map-side.
  */
object Sessionize {

  /** One row per (user, session): ordinal session index (1-based, in time
    * order), span, and event count. Ordering ties on ts break by event id,
    * so the result is deterministic under duplicate timestamps.
    */
  def sessions(events: DataFrame, gapNs: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val byTime = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val prevTs = lag(col(tsCol), 1).over(byTime)
    val isStart = when(prevTs.isNull || col(tsCol) - prevTs > gapNs, 1L)
      .otherwise(0L)
    events
      .withColumn("session_idx",
        sum(isStart).over(byTime.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("session_idx"))
      .agg(min(col(tsCol)).as("start_ns"), max(col(tsCol)).as("end_ns"),
        count(lit(1)).as("n_events"))
      .select(col(userCol), col("session_idx"), col("start_ns"),
        col("end_ns"), (col("end_ns") - col("start_ns")).as("duration_ns"),
        col("n_events"))
  }
}
