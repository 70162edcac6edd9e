package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ts.{Evaluate, SeriesStore}
import graft.ts.model.Period

/** Collection windows (reference: weather/service/data_collection_task.py:29-70).
  *  - Relative: sliding lookback `[now - startOffset, now - endOffset)` —
  *    e.g., last 30 min every 5 min. Overlapping windows + last-wins merge
  *    give late-data reconciliation for free (T2/T4).
  *  - Absolute: one-shot bounded backfill (T3) — the same pipeline run as a
  *    plain batch job (batch/stream unification).
  */
sealed trait CollectionPeriod {
  def periodAt(nowNs: Long): Period
}
final case class RelativePeriod(startOffsetNs: Long, endOffsetNs: Long = 0L)
    extends CollectionPeriod {
  def periodAt(nowNs: Long): Period = Period(nowNs - startOffsetNs, nowNs - endOffsetNs)
}
final case class AbsolutePeriod(startNs: Long, endNs: Long) extends CollectionPeriod {
  def periodAt(nowNs: Long): Period = Period(startNs, endNs)
}

/** The read→store ETL task (reference: weather/service/data_collection_task.py:73-150):
  * evaluate the source ids over the collection window, re-key onto the
  * paired store ids (positional zip in the reference → an explicit ordinal
  * map here, SURVEY.md §2.3 J2), and merge-store (K1, last-wins).
  *
  * `collectOnce` is one micro-batch; the scheduler (ServiceManager or
  * Structured Streaming foreachBatch) decides cadence. Errors are logged
  * and swallowed — at-least-once, skip-on-failure (T5).
  */
final class CollectionTask(
    val name: String,
    evaluate: Evaluate,
    store: SeriesStore,
    container: String,
    readIds: Seq[String],
    storeIds: Seq[String],
    period: CollectionPeriod) {

  require(readIds.length == storeIds.length, "read/store id vectors must zip")

  @volatile var lastError: Option[Throwable] = None
  @volatile var batchesOk: Long = 0L

  def collectOnce(spark: SparkSession, nowNs: Long): Unit =
    try {
      val p = period.periodAt(nowNs)
      // Persist the batch: the non-empty probe and the merge below would
      // otherwise each evaluate the full read pipeline (an API-backed read
      // would hit the source twice per collection).
      val data = evaluate.evaluate(spark, readIds, p)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        if (!data.isEmpty) {
          val mapping = spark.createDataFrame(readIds.zip(storeIds))
            .toDF("series_id", "__store_id")
          val rekeyed = data.join(broadcast(mapping), Seq("series_id"))
            .select(col("__store_id").as("series_id"), col("ts"), col("value"))
          store.merge(container, rekeyed, overwrite = false)
        }
      } finally data.unpersist()
      batchesOk += 1
      lastError = None
    } catch {
      case e: Throwable =>
        // log-and-swallow (data_collection_task.py:136-150)
        org.apache.log4j.Logger.getLogger(getClass).warn(s"collect $name failed", e)
        lastError = Some(e)
    }

  def healthy: Boolean = lastError.isEmpty
}

/** Periodic task supervision (reference: weather/service/service_manager.py:21-98):
  * run each task every `waitTime`, health-check every `healthCheckInterval`,
  * restart (re-arm) unhealthy tasks. Trigger logic is manual-tick so tests
  * drive virtual time (T1/T6); `runForever` wires it to a real clock.
  */
final class ServiceManager(spark: SparkSession,
    tasks: Seq[(CollectionTask, Long /*waitNs*/ )]) {

  private val nextRun =
    scala.collection.mutable.HashMap.from(tasks.map { case (t, _) => t.name -> 0L })

  /** Fire every task whose schedule has elapsed at virtual time `nowNs`. */
  def tick(nowNs: Long): Seq[String] =
    tasks.flatMap { case (task, waitNs) =>
      if (nowNs >= nextRun(task.name)) {
        nextRun(task.name) = nowNs + waitNs
        task.collectOnce(spark, nowNs)
        Some(task.name)
      } else None
    }

  /** Health probe: restart = clear error and run immediately (T6). */
  def healthCheck(nowNs: Long): Seq[String] =
    tasks.flatMap { case (task, _) =>
      if (!task.healthy) {
        task.lastError = None
        task.collectOnce(spark, nowNs)
        Some(task.name)
      } else None
    }

  @volatile private var stopped = false
  def stop(): Unit = stopped = true

  /** Real-clock loop (reference: weather/service/service_manager.py:39-50):
    * tick every `pollNs`, health-check every `healthCheckEveryNs`. Blocks
    * the calling thread until [[stop]].
    */
  def runForever(pollNs: Long, healthCheckEveryNs: Long,
      clock: () => Long = () => System.currentTimeMillis() * 1000000L): Unit = {
    var nextHealth = clock() + healthCheckEveryNs
    while (!stopped) {
      val now = clock()
      tick(now)
      if (now >= nextHealth) {
        healthCheck(now)
        nextHealth = now + healthCheckEveryNs
      }
      val sleepMs = math.max(1L, pollNs / 1000000L)
      try Thread.sleep(sleepMs)
      catch { case _: InterruptedException => stopped = true }
    }
  }
}
