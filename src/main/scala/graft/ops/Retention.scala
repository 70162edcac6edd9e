package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention over an event stream: users are grouped into cohorts by
  * the UTC day of their FIRST event, and each (cohort, day-offset) cell
  * counts the distinct users of that cohort seen again `offset` days later
  * — the classic retention triangle (offset 0 row == cohort size).
  *
  * Scale shape: the first-seen timestamp comes from an unordered
  * whole-partition window on the user key (one shuffle, no groupBy+join
  * back), then one distinct-aggregate on the (cohort, offset) key.
  * `count(DISTINCT user)` is exact — partial-deduplicated per partition
  * before the final merge — because retention cells must tie out to cohort
  * sizes; swap in `approx_count_distinct` when a ±2% HLL estimate is
  * acceptable at cluster scale.
  */
object Retention {

  /** `tsCol` is epoch nanoseconds (UTC); `dayNs` parameterizes the bucket
    * so tests can use synthetic day lengths. Day bucketing is FLOOR
    * division (`(ts - pmod(ts, d)) div d`, exact long arithmetic), so
    * pre-epoch timestamps land on the correct UTC day — a plain `div`
    * truncates toward zero and would cohort a 1969 event one day late.
    */
  def retention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", dayNs: Long = 86400L * 1000 * 1000 * 1000): DataFrame = {
    require(dayNs > 0, s"dayNs must be positive, got $dayNs")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol)
    events
      .select(col(userCol),
        expr(s"(`$tsCol` - pmod(`$tsCol`, $dayNs)) div $dayNs").as("__day"))
      .withColumn("cohort_day", min("__day").over(w))
      .groupBy(col("cohort_day"), (col("__day") - col("cohort_day")).as("day_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }
}
