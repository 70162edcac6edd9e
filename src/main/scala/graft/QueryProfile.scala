package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev tool: decompose a query's wall time into scheduling overhead vs
  * executor task time. Runs each named query `reps` times against the
  * given SF dir and reports wall seconds, Spark job count, stage count,
  * task count and summed executor task time — when task time is a small
  * fraction of wall time, the query is stage-barrier / driver-bound, not
  * compute-bound, and the optimization lever is fewer passes (guide §1.2,
  * §2.4), not faster kernels.
  *
  * Usage: runMain graft.QueryProfile <name1,name2,...> [sfDir] [reps] [cores]
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cores = if (args.length > 3) args(3).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    val stageAcc = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
          stageAcc.merge(t.stageId, ("", t.taskMetrics.executorRunTime, 1L),
            (a, b) => (a._1, a._2 + b._2, a._3 + b._3))
        }
      }
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stageAcc.merge(s.stageInfo.stageId,
          (s.stageInfo.name.take(90), 0L, 0L),
          (a, b) => (b._1, a._2, a._3))
    })
    val byName = SparkEntry.queries
    names.foreach { name =>
      val fn = byName.getOrElse(name, sys.error(s"unknown query $name"))
      for (r <- 1 to reps) {
        jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0L)
        stageAcc.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener bus is async; give it a moment to drain
        Thread.sleep(300)
        println(f"[qprof] $name%-24s rep$r wall=$wall%7.2f s jobs=${jobs.get()}%3d " +
          f"stages=${stages.get()}%4d tasks=${tasks.get()}%5d " +
          f"taskTime=${taskMs.get() / 1e3}%8.2f s " +
          f"par=${taskMs.get() / 1e3 / math.max(wall, 1e-9)}%5.2f")
        if (r == reps) {
          import scala.jdk.CollectionConverters._
          stageAcc.asScala.toSeq.sortBy(-_._2._2).take(12).foreach {
            case (sid, (nm, ms, nt)) =>
              println(f"[qprof]    stage $sid%4d ${ms / 1e3}%8.2f s tasks=$nt%4d  $nm")
          }
        }
      }
    }
    spark.stop()
  }
}
