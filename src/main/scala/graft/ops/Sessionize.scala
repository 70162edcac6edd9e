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

  /** Native-operator variant: Spark's `session_window` (the built-in
    * session aggregation, streaming-capable with a watermark) instead of
    * the hand-built lag/sum numbering. Prefer THIS form when its semantics
    * fit: it needs no total order per user (no sort, pure hash agg with
    * session merge), and the same expression runs unchanged under
    * `readStream` + `withWatermark`, emitting finalized sessions as the
    * watermark passes them.
    *
    * Boundary semantics MATCH [[sessions]] (verified empirically and pinned
    * by test): a successor exactly `gap` away still merges — Spark extends
    * the session window inclusively, equivalent to the lag formulation's
    * strict `diff > gap` split. The two operators are therefore two
    * physical implementations of one contract, and share one oracle
    * formulation. The ordinal index is restored afterwards with a window
    * over the session starts (tiny: one row per session, and it reuses the
    * user partitioning).
    */
  def sessionWindows(events: DataFrame, gap: String,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val agged = sessionWindowStats(events, gap, userCol, tsCol)
    val byStart = Window.partitionBy(userCol).orderBy(col("start_ns"))
    agged
      .withColumn("session_idx", row_number().over(byStart).cast("long"))
      .select(col(userCol), col("session_idx"), col("start_ns"), col("end_ns"),
        col("duration_ns"), col("n_events"))
  }

  /** The streaming-safe core of [[sessionWindows]]: no ordinal (window
    * functions cannot run on a streaming Dataset). With `watermark` set and
    * a streaming input, append-mode output emits each session once it is
    * finalized — i.e. the watermark has passed its close.
    */
  def sessionWindowStats(events: DataFrame, gap: String,
      userCol: String = "user_id", tsCol: String = "ts",
      watermark: Option[String] = None): DataFrame = {
    val et = events
      // exact ns→µs: the event grid is µs-aligned (Tables.eventsUs)
      .withColumn("event_time", timestamp_micros(expr(s"$tsCol div 1000")))
    val src = watermark.fold(et)(w => et.withWatermark("event_time", w))
    src
      .groupBy(col(userCol), session_window(col("event_time"), gap))
      .agg(min(col(tsCol)).as("start_ns"), max(col(tsCol)).as("end_ns"),
        count(lit(1)).as("n_events"))
      .select(col(userCol), col("start_ns"), col("end_ns"),
        (col("end_ns") - col("start_ns")).as("duration_ns"), col("n_events"))
  }

  /** THE per-user event ordering every session operator sorts by: (ts,
    * event_id) within the user key — ties on ts break by id, so it is
    * deterministic under duplicate timestamps. Operators that window over
    * [[labelSessions]]'s output (e.g. [[Paths.transitions]]'s `lead`) MUST
    * take this spec rather than re-declare it, so their row alignment
    * cannot drift from the session labels.
    */
  def eventOrder(userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id") =
    Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))

  /** THE session-boundary contract, shared by every gap-session operator
    * ([[sessions]], [[graft.ops.Paths.topPaths]]): per-event rows with
    * `session_idx` (1-based per user), `__rn` (1-based event rank in the
    * user's time order) and `__start_rn` (the rank of the session's first
    * event, so `__rn - __start_rn` is the 0-based step index). One window
    * sort carries all three — and one definition of the boundary predicate
    * (`ts − prev > gap` splits, `==` merges) keeps the operators built on
    * it from drifting apart.
    */
  def labelSessions(events: DataFrame, gapNs: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val byTime = eventOrder(userCol, tsCol, idCol)
    val running = byTime.rowsBetween(Window.unboundedPreceding, 0)
    val prevTs = lag(col(tsCol), 1).over(byTime)
    val isStart = when(prevTs.isNull || col(tsCol) - prevTs > gapNs, 1L)
      .otherwise(0L)
    events
      .withColumn("__rn", row_number().over(byTime))
      .withColumn("__start", isStart)
      .withColumn("session_idx", sum(col("__start")).over(running))
      .withColumn("__start_rn",
        max(when(col("__start") === 1, col("__rn"))).over(running))
      .drop("__start")
  }

  /** One row per (user, session): ordinal session index (1-based, in time
    * order), span, and event count. Ordering ties on ts break by event id,
    * so the result is deterministic under duplicate timestamps.
    */
  def sessions(events: DataFrame, gapNs: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    labelSessions(events, gapNs, userCol, tsCol, idCol)
      .groupBy(col(userCol), col("session_idx"))
      .agg(min(col(tsCol)).as("start_ns"), max(col(tsCol)).as("end_ns"),
        count(lit(1)).as("n_events"))
      .select(col(userCol), col("session_idx"), col("start_ns"),
        col("end_ns"), (col("end_ns") - col("start_ns")).as("duration_ns"),
        col("n_events"))
  }

  /** Window-keyed repeat suppression: keep only the FIRST event of each
    * (user, type, tumbling window) cell — the telemetry dedup that turns
    * a retry storm or double-fire into one logical event per window
    * (distinct from exact-row dedup: repeats here have different ids and
    * timestamps). First = (ts, id) min, so the survivor is deterministic
    * under duplicate timestamps. One partial-combined struct-min per
    * cell — a single shuffle on the (user, type, window) key, no window
    * function, no per-row rank.
    */
  def firstPerWindow(events: DataFrame, windowNs: Long,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(windowNs > 0, s"windowNs must be positive, got $windowNs")
    events
      .withColumn("window_start", col(tsCol) - pmod(col(tsCol), lit(windowNs)))
      .groupBy(col(userCol), col(typeCol), col("window_start"))
      .agg(count(lit(1)).as("n_suppressed"),
        min(struct(col(tsCol), col(idCol))).as("__first"))
      .select(col(userCol), col(typeCol), col("window_start"),
        col("__first").getField(tsCol).as("first_ts"),
        col("__first").getField(idCol).as("first_event_id"),
        (col("n_suppressed") - 1).as("n_suppressed"))
  }
}
