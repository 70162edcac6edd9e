package graft
import java.nio.file.{Files, Paths}
/** Dev tool: write `.explain("formatted")` for named queries to files.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <name1,name2,...> [sfDir]
  *
  * Writes <outDir>/<name>_<suffix>.txt per query (e.g. suffix "before" /
  * "after" for optimization-round plan evidence). Uses the initial plan
  * (AQE isFinalPlan=false) — shape, join strategy, PushedFilters and
  * exchange placement are all visible there.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSet
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val spark = graft.core.Sessions.local("plan-dump", cores = 8)
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.filter { case (n, _) => names(n) }.foreach {
      case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
          println(s"[plandump] wrote $name ($suffix): " +
            s"${txt.linesIterator.count(_.contains("Exchange"))} Exchange lines")
        } catch { case e: Throwable =>
          println(s"[plandump] $name ERROR ${e.getMessage}")
        }
    }
    spark.stop()
  }
}
