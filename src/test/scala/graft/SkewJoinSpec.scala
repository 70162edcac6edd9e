package graft

import org.apache.spark.sql.functions._

import graft.ops.SkewJoin

/** Salting must be invisible in the join RESULT (it only re-partitions the
  * work), including under a heavy-hitter key distribution, and the build
  * side must replicate exactly `salts` times.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join == plain join under a 90% heavy-hitter key") {
    val rnd = new scala.util.Random(99)
    // 90% of probe rows share key 0 — the distribution that pins a reducer
    val probe = (1L to 2000L).map { i =>
      (i, if (rnd.nextInt(10) < 9) 0L else rnd.nextInt(20).toLong)
    }.toDF("row_id", "k")
    val build = (0L until 20L).map(k => (k, s"dim$k")).toDF("k", "payload")
    val salted = SkewJoin.saltedJoin(probe, build, "k", salts = 8, tieBreak = "row_id")
    val plain = probe.join(build, "k")
    assert(rowsOf(salted) == rowsOf(plain))
    assert(salted.count() == 2000L)
  }

  test("salts = 1 degenerates to the plain join; build keys missing from probe drop out") {
    val probe = Seq((1L, 10L), (2L, 11L)).toDF("row_id", "k")
    val build = Seq((10L, "a"), (12L, "c")).toDF("k", "payload")
    val got = SkewJoin.saltedJoin(probe, build, "k", salts = 1, tieBreak = "row_id")
    assert(rowsOf(got) == rowsOf(probe.join(build, "k")))
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(probe, build, "k", salts = 0, tieBreak = "row_id")
    }
  }

  test("probe rows scatter across salt replicas (the point of the exercise)") {
    val probe = (1L to 1000L).map(i => (i, 0L)).toDF("row_id", "k")
    val salts = probe.withColumn("__salt",
      pmod(xxhash64(col("row_id")), lit(8L)).cast("int"))
      .groupBy("__salt").count().as[(Int, Long)].collect().toMap
    // all 8 replicas used, none holding more than a third of the rows
    assert(salts.size == 8)
    assert(salts.values.max < 340, salts.toString)
  }
  test("bloom semi-join == plain semi-join; candidates are a selective superset") {
    import graft.ops.BloomJoin
    val rnd = new scala.util.Random(41)
    val big = (1L to 4000L).map(i => (i, rnd.nextInt(1000).toLong))
      .toDF("row_id", "k")
    val small = Seq(3L, 17L, 912L, 555L).toDF("k")
    val exact = big.join(small.distinct(), Seq("k"), "left_semi")
      .collect().map(_.getAs[Long]("row_id")).toSet
    val got = BloomJoin.semiJoin(big, small, "k")
      .collect().map(_.getAs[Long]("row_id")).toSet
    assert(got == exact, "the bloom must be invisible in the result")
    // the pre-filter is a superset of the exact matches...
    val cand = BloomJoin.bloomCandidates(big, small, "k")
      .collect().map(_.getAs[Long]("row_id")).toSet
    assert(exact.subsetOf(cand), "no false negatives")
    // ...and actually selective: 4 keys of 1000 → the bloom should kill
    // the vast majority of the big side before any shuffle
    assert(cand.size < big.count() / 10,
      s"bloom passed ${cand.size} of 4000 rows — not selective")
    // null keys never match (semi-join semantics)
    val withNull = big.unionByName(
      Seq((9999L, null.asInstanceOf[java.lang.Long])).toDF("row_id", "k"))
    assert(!BloomJoin.semiJoin(withNull, small, "k")
      .collect().map(_.getAs[Long]("row_id")).contains(9999L))
  }
}
