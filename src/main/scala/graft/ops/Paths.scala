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

  /** First-order Markov transition estimates over session steps: for every
    * ordered pair of event types adjacent WITHIN a gap-session,
    * `p_transition = count(a→b) / count(a→ any)` — the empirical
    * transition matrix behind "where do users go after a signup".
    * Session boundaries are [[Sessionize.labelSessions]]'s (shared
    * contract), so a gap never fabricates a transition.
    *
    * Scale shape: the successor type comes from `lead` in the SAME
    * user-key sort that labels sessions (no second shuffle); the pair
    * count is one partial-combined aggregation on (from, to), and the
    * denominator joins back on the `from` key — a table as small as the
    * type vocabulary squared.
    */
  def transitions(events: DataFrame, gapNs: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", typeCol: String = "event_type"): DataFrame = {
    require(gapNs > 0, s"gap must be positive, got $gapNs")
    // the SAME ordering labelSessions sorted by — shared contract, so the
    // lead() alignment cannot drift from the session labels
    val byTime = Sessionize.eventOrder(userCol, tsCol, idCol)
    val pairs = Sessionize.labelSessions(events, gapNs, userCol, tsCol, idCol)
      .withColumn("__next_type", lead(col(typeCol), 1).over(byTime))
      .withColumn("__next_sess", lead(col("session_idx"), 1).over(byTime))
      .where(col("__next_type").isNotNull
        && col("__next_sess") === col("session_idx"))
      .groupBy(col(typeCol).as("from_type"), col("__next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val outDeg = pairs.groupBy("from_type")
      .agg(sum("n_transitions").as("__total"))
    pairs.join(outDeg, "from_type")
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        (col("n_transitions").cast("double") / col("__total"))
          .as("p_transition"))
  }

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
