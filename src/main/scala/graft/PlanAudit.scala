package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: prints per-query Exchange/Broadcast counts over the sf0.01
  * plans — a quick structural smell test (a projection suddenly shuffling,
  * a broadcast silently becoming a shuffle join). Codegen spans are NOT
  * visible here: AQE prints `isFinalPlan=false` plans before stage
  * compilation, so use PlanSpec's codegen assert for that.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("plan-audit", cores = 8)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val ex = plan.linesIterator.count(_.contains("Exchange"))
        val bc = plan.linesIterator.count(_.contains("BroadcastExchange"))
        println(f"[audit] $name%-24s shuffles=${ex - bc}%2d broadcasts=$bc%2d")
      } catch { case e: Throwable => println(s"[audit] $name ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
