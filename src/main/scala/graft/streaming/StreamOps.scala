package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.ts.SeriesStore
import graft.ts.model.Period

/** Structured-Streaming analogs of the reference's hand-built micro-batch
  * loop (SURVEY.md §2.8 T1-T5): the collection cadence becomes a
  * `Trigger.ProcessingTime`, the read→store pipeline becomes `foreachBatch`
  * into the same last-wins SeriesStore merge, and late/duplicate points are
  * reconciled by the merge key — identical semantics to the batch path
  * (batch/stream unification).
  */
object StreamOps {

  /** T5: continuous collection — every micro-batch of points is merged into
    * the container with K1 last-wins semantics. At-least-once + idempotent
    * merge ⇒ effectively-once.
    */
  def collectStream(points: DataFrame, store: SeriesStore, container: String,
      triggerMs: Long = 1000): StreamingQuery =
    points.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        store.merge(container, batch.toDF(), overwrite = false)
      }
      .start()

  /** Watermarked tumbling-window aggregation over a point stream (the
    * streaming twin of SeriesOps.minMaxCount). `tsNs` points are converted
    * to event-time timestamps only for the watermark clock.
    */
  def windowedStats(points: DataFrame, windowDur: String, watermark: String): DataFrame =
    points
      .withColumn("event_time", timestamp_micros(expr("ts div 1000"))) // exact ns→us (no double rounding)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowDur), col("series_id"))
      .agg(min("value").as("min_value"), max("value").as("max_value"),
        count(lit(1)).as("n_points"))

  final case class SeriesState(lastTs: Long, lastValue: Double,
      minValue: Double, maxValue: Double, n: Long)
  final case class PointIn(series_id: String, ts: Long, value: Double)
  final case class SeriesUpdate(series_id: String, lastTs: Long, lastValue: Double,
      minValue: Double, maxValue: Double, n: Long)

  /** Custom per-series running state (last/min/max/count) via
    * mapGroupsWithState — the streaming "current dashboard value" of the
    * reference (A1/A2 continuously maintained).
    */
  def runningStats(points: Dataset[PointIn]): Dataset[SeriesUpdate] = {
    val spark = points.sparkSession
    import spark.implicits._
    points.groupByKey(_.series_id)
      .mapGroupsWithState[SeriesState, SeriesUpdate](GroupStateTimeout.NoTimeout) {
        (key, batch, state: GroupState[SeriesState]) =>
          val prev = state.getOption.getOrElse(
            SeriesState(Long.MinValue, Double.NaN, Double.PositiveInfinity,
              Double.NegativeInfinity, 0L))
          val next = batch.foldLeft(prev) { (s, p) =>
            SeriesState(
              lastTs = math.max(s.lastTs, p.ts),
              lastValue = if (p.ts >= s.lastTs) p.value else s.lastValue,
              minValue = math.min(s.minValue, p.value),
              maxValue = math.max(s.maxValue, p.value),
              n = s.n + 1)
          }
          state.update(next)
          SeriesUpdate(key, next.lastTs, next.lastValue, next.minValue,
            next.maxValue, next.n)
      }
  }
}
