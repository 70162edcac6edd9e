package graft

import graft.ops.AsofJoin

/** As-of backward join semantics against a hand-computed oracle: most
  * recent right row with ts <= left ts per key, null when none or when
  * outside the tolerance, and left rows preserved exactly once.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    ("u1", 10L, 1.0), ("u1", 20L, 2.0), ("u1", 5L, 0.5),
    ("u2", 10L, 3.0)
  ).toDF("user_id", "ts", "value")

  private val right = Seq(
    ("u1", 8L, 100.0), ("u1", 15L, 200.0), ("u1", 25L, 300.0),
    ("u3", 1L, 999.0)
  ).toDF("user_id", "ts", "r_value")

  test("backward join picks the most recent right row at or before each left ts") {
    val got = AsofJoin.backward(left, right, Seq("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.getAs[java.lang.Long]("right_ts")).map(_.toLong),
        Option(r.getAs[java.lang.Double]("right_r_value")).map(_.toDouble)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      ("u1", 5L, None, None),            // nothing at or before 5
      ("u1", 10L, Some(8L), Some(100.0)),
      ("u1", 20L, Some(15L), Some(200.0)),
      ("u2", 10L, None, None)            // key has no right rows
    ))
  }

  test("exact timestamp ties match (right.ts == left.ts)") {
    val r2 = Seq(("u1", 10L, 50.0)).toDF("user_id", "ts", "r_value")
    val got = AsofJoin.backward(left.where($"ts" === 10 && $"user_id" === "u1"), r2, Seq("user_id"))
      .collect()(0)
    assert(got.getAs[Long]("right_ts") == 10L)
    assert(got.getAs[Double]("right_r_value") == 50.0)
  }

  test("tolerance nulls out matches older than the window") {
    val got = AsofJoin.backward(left, right, Seq("user_id"), toleranceNs = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.getAs[java.lang.Double]("right_r_value")).map(_.toDouble)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      ("u1", 5L, None),
      ("u1", 10L, Some(100.0)),  // 10 - 8 = 2 <= 3
      ("u1", 20L, None),         // 20 - 15 = 5 > 3
      ("u2", 10L, None)
    ))
  }

  test("every left row appears exactly once") {
    assert(AsofJoin.backward(left, right, Seq("user_id")).count() == left.count())
  }
}
