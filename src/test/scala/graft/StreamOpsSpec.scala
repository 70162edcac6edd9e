package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamOps
import graft.streaming.StreamOps.PointIn
import graft.ts.SeriesStore
import graft.ts.model.Period

/** Structured-Streaming analogs of the reference's micro-batch loop:
  * foreachBatch collection merges each batch with last-wins semantics, and
  * mapGroupsWithState maintains the running dashboard stats across batches.
  */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private val S = Period.Second

  test("collectStream: micro-batches merge into the store with last-wins reconciliation") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[PointIn]
    val store = new SeriesStore(spark, tmpDir("graft-stream"), numBuckets = 2)
    val q = StreamOps.collectStream(in.toDF(), store, "c", triggerMs = 50)
    try {
      in.addData(PointIn("s", 0 * S, 1.0), PointIn("s", 1 * S, 2.0))
      q.processAllAvailable()
      assert(store.read("c").count() == 2)
      // second batch overlaps t=1 (late duplicate) and extends t=2
      in.addData(PointIn("s", 1 * S, 20.0), PointIn("s", 2 * S, 30.0))
      q.processAllAvailable()
      val got = store.read("c").orderBy("ts").collect()
        .map(r => (r.getLong(1) / S, r.getDouble(2)))
      assert(got.toSeq == Seq(0L -> 1.0, 1L -> 20.0, 2L -> 30.0))
    } finally q.stop()
  }

  test("dedupStream drops duplicates within and across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[PointIn]
    val q = StreamOps.dedupStream(in.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      in.addData(PointIn("s", 1 * S, 1.0), PointIn("s", 1 * S, 1.0), PointIn("s", 2 * S, 2.0))
      q.processAllAvailable()
      // cross-batch duplicate at t=2 plus a fresh point; a CONFLICTING
      // value at t=3 is not a duplicate and must survive (the store's
      // last-wins merge resolves it downstream)
      in.addData(PointIn("s", 2 * S, 2.0), PointIn("s", 3 * S, 3.0), PointIn("s", 3 * S, 30.0))
      q.processAllAvailable()
      val got = spark.table("dedup_out").orderBy("ts", "value").collect()
        .map(r => (r.getAs[Long]("ts") / S, r.getAs[Double]("value")))
      assert(got.toSeq == Seq(1L -> 1.0, 2L -> 2.0, 3L -> 3.0, 3L -> 30.0))
    } finally q.stop()
  }

  test("watchdog restarts a crashed query; the retried batch lands") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[PointIn]
    val failFirst = new java.util.concurrent.atomic.AtomicBoolean(true)
    val merged = new java.util.concurrent.atomic.AtomicInteger(0)
    val wd = new StreamOps.StreamWatchdog(spark, () =>
      in.toDF().writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          if (failFirst.getAndSet(false)) throw new RuntimeException("boom")
          merged.addAndGet(batch.count().toInt); ()
        }
        .start(), maxRestarts = 3)
    val q = wd.startWatched()
    try {
      in.addData(PointIn("s", 0, 1.0))
      intercept[Exception] { q.processAllAvailable() } // first run crashes
      val deadline = System.currentTimeMillis() + 30000
      while ((wd.restarts < 1 || (wd.query eq q) || !wd.query.isActive) &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(wd.restarts == 1, "exactly one restart after the crash")
      val q2 = wd.query
      assert((q2 ne q) && q2.isActive, "a fresh query must be running")
      q2.processAllAvailable()
      assert(merged.get() >= 1, "the failed batch must be reprocessed after restart")
      // clean stop: no further restart
      q2.stop()
      q2.awaitTermination(30000)
      Thread.sleep(200) // give the listener bus a beat
      assert(wd.restarts == 1, "a clean stop must not restart")
    } finally {
      wd.close()
      if (wd.query != null && wd.query.isActive) wd.query.stop()
    }
  }

  test("runningStats: per-series state persists across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[PointIn]
    val out = StreamOps.runningStats(in.toDS())
    val q = out.writeStream.format("memory").queryName("running_stats")
      .outputMode("update").trigger(Trigger.ProcessingTime(50)).start()
    try {
      in.addData(PointIn("a", 1 * S, 5.0), PointIn("a", 2 * S, 3.0))
      q.processAllAvailable()
      in.addData(PointIn("a", 3 * S, 9.0)) // state must carry min=3 forward
      q.processAllAvailable()
      val rows = spark.table("running_stats").where($"series_id" === "a")
        .orderBy($"n").collect()
      val last = rows.last
      assert(last.getAs[Long]("n") == 3L)
      assert(last.getAs[Double]("lastValue") == 9.0)
      assert(last.getAs[Double]("minValue") == 3.0)
      assert(last.getAs[Double]("maxValue") == 9.0)
      assert(last.getAs[Long]("lastTs") == 3 * S)
    } finally q.stop()
  }

  test("windowedStats groups into tumbling event-time windows") {
    import org.apache.spark.sql.functions._
    val pts = Seq(("s", 10 * S, 1.0), ("s", 20 * S, 5.0), ("s", 70 * S, 3.0))
      .toDF("series_id", "ts", "value")
    val got = StreamOps.windowedStats(pts, "1 minute", "1 minute")
      .select(col("series_id"), unix_micros(col("window.start")).as("w"),
        col("min_value"), col("max_value"), col("n_points"))
      .orderBy("w").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("n_points") == 2L && got(0).getAs[Double]("max_value") == 5.0)
    assert(got(1).getAs[Long]("n_points") == 1L && got(1).getAs[Double]("min_value") == 3.0)
  }
}
