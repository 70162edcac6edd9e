package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, attach the most recent right
  * row with `right.ts <= left.ts` for the same key — the canonical
  * point-in-time join the reference's store-merge alignment implies
  * (SURVEY.md §2.3 J3) and a first-class operator for event pipelines.
  *
  * Implementation: the single-shuffle union trick rather than a per-key
  * collect or a range crossjoin. Both sides are tagged and unioned, one
  * window partitioned by key and ordered by (ts, side) carries the latest
  * right payload forward (`last(ignoreNulls)`), and left rows are re-emitted
  * with that payload. Cost: ONE shuffle on the join key — same as a regular
  * sort-merge join — with no expansion of the pair space; at 100 TB this is
  * the plan you want (skew on hot keys is handled by AQE skew splitting).
  * An optional `toleranceNs` drops matches older than the tolerance.
  */
object AsofJoin {

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String = "ts", toleranceNs: Long = Long.MaxValue): DataFrame = {
    val leftCols = left.columns.toSeq.filterNot(c => keys.contains(c))
    val rightCols = right.columns.toSeq.filterNot(c => keys.contains(c))
    require(leftCols.intersect(rightCols).forall(_ == tsCol) || leftCols.intersect(rightCols).isEmpty,
      s"overlapping non-key columns: ${leftCols.intersect(rightCols).mkString(",")}")

    val l = left.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(1).as("__side"),
        struct(leftCols.map(col): _*).as("__l"), lit(null).cast(
          right.select(struct(rightCols.map(col): _*)).schema.head.dataType).as("__r")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(0).as("__side"),
        lit(null).cast(left.select(struct(leftCols.map(col): _*)).schema.head.dataType).as("__l"),
        struct(rightCols.map(col): _*).as("__r")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .withColumn("__match_ts", last(when(col("__side") === 0, col("__ts")),
        ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .withColumn("__match", when(col("__ts") - col("__match_ts") <= toleranceNs, col("__match")))

    val leftOut = leftCols.map(c => col("__l").getField(c).as(c))
    val rightOut = rightCols.map(c => col("__match").getField(c).as(s"right_$c"))
    joined.select(keys.map(col) ++ leftOut ++ rightOut: _*)
  }
}
