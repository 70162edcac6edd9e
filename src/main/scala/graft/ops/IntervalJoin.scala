package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (time-bounded) equi-join: pair each right-side event with every
  * left-side event of the same key whose timestamp falls within
  * `[rightTs − windowNs, rightTs]` — "purchases joined to the clicks of the
  * preceding hour". The batch face of Spark's stream-stream join: the SAME
  * key + time-range condition, applied to two watermarked streaming
  * DataFrames, runs as a Structured Streaming join whose state is bounded
  * by the window (verified in StreamOpsSpec against this batch semantics).
  *
  * Scale shape: an equi-join on the key with the range as a join-level
  * residual — Catalyst plans a shuffled sort-merge join on the key alone,
  * so partitioning is by the well-spread key and the time predicate never
  * degenerates into a broadcast-nested-loop. Output is bounded by
  * key-cardinality × events-per-window, not |L|×|R|.
  */
object IntervalJoin {

  /** `left` rows paired with `right` rows of the same `keyCol` where
    * `0 ≤ right.tsCol − left.tsCol ≤ windowNs`. Column names other than
    * `keyCol` must be disjoint between the two sides (enforced).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String, windowNs: Long): DataFrame = {
    require(windowNs >= 0, s"window must be non-negative, got $windowNs")
    checkDisjoint(left, right, keyCol)
    left.join(right,
      left(keyCol) === right(keyCol)
        && right(rightTsCol) >= left(leftTsCol)
        && right(rightTsCol) <= left(leftTsCol) + windowNs)
      .drop(right(keyCol))
  }

  /** The streaming face of [[intervalJoin]]: both sides are watermarked
    * event-time streams (TimestampType columns), and the same key +
    * bounded-range condition becomes a Structured Streaming stream-stream
    * inner join — the range bound plus the watermarks is exactly what lets
    * Spark expire buffered state, so memory is bounded by
    * `watermark + window` of events per key, not the stream length.
    * `window`/`watermark` are interval strings (e.g. "1 hour"). Semantics
    * match the batch form row for row (pinned in StreamOpsSpec).
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String, window: String,
      watermark: String): DataFrame = {
    checkDisjoint(left, right, keyCol)
    val l = left.withWatermark(leftTimeCol, watermark)
    val r = right.withWatermark(rightTimeCol, watermark)
    l.join(r,
      l(keyCol) === r(keyCol)
        && r(rightTimeCol) >= l(leftTimeCol)
        && r(rightTimeCol) <= l(leftTimeCol) + expr(s"interval $window"))
      .drop(r(keyCol))
  }

  private def checkDisjoint(left: DataFrame, right: DataFrame, keyCol: String): Unit = {
    val overlap = (left.columns.toSet - keyCol)
      .intersect(right.columns.toSet - keyCol)
    require(overlap.isEmpty,
      s"non-key columns must be disjoint, both sides have: ${overlap.mkString(", ")}")
  }
}
