package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Sessions

/** Shared local SparkSession for all suites (one JVM, one session). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  def sfDir: String = "/root/testdata/sf0.001"

  /** Collect to a sorted Seq of stringified rows for order-free compare
    * (stringified so NaN == NaN holds, unlike Double equality).
    */
  def rowsOf(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))

  /** [[rowsOf]] with doubles normalized to 9 significant digits (the
    * driver compare's tolerance). Needed when a pipeline contains a
    * partial-aggregated FLOAT reduction (kmeans centroid means): the
    * reduce side merges map partials in fetch-completion order, so two
    * evaluations of the SAME plan in one JVM can differ in the last ulp —
    * a string-exact compare of such outputs flakes run to run.
    */
  def rowsOf9(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(_.toSeq.map {
      case d: Double => f"$d%.8e"
      case x => String.valueOf(x)
    }).sortBy(_.mkString("|"))

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Run `body` with a temp RELIABLE checkpoint directory configured on the
    * shared SparkContext (so [[graft.core.Lineage.truncate]] takes the
    * cluster-durable `checkpoint()` path), then restore the no-dir state.
    * SparkContext has no public unset, so the restore goes through the
    * generated `checkpointDir_$eq` setter (private[spark] compiles to a
    * public method in bytecode).
    */
  def withCheckpointDir[T](body: String => T): T = {
    val sc = spark.sparkContext
    require(sc.getCheckpointDir.isEmpty,
      "nested withCheckpointDir or leaked checkpoint dir")
    val dir = tmpDir("graft-ckpt")
    sc.setCheckpointDir(dir)
    try body(dir)
    finally sc.getClass.getMethod("checkpointDir_$eq", classOf[Option[_]])
      .invoke(sc, None)
  }
}

object SparkSpec {
  lazy val session: SparkSession = Sessions.local("graft-test", cores = 4)
}
