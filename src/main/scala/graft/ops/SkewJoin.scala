package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual key-salting for joins whose PROBE side carries heavy-hitter keys —
  * the classic remedy when a handful of keys (one viral user, one dominant
  * language) would otherwise pin a single reducer.
  *
  * Mechanics: the probe side scatters each row across `salts` sub-keys by a
  * deterministic hash of a per-row tie-breaker column; the build side is
  * replicated once per salt. A key holding 10% of 100 TB then lands on
  * `salts` reducers instead of one, at the cost of a `salts`× blow-up of
  * the (small) build side — the standard trade.
  *
  * AQE's skew-join splitting (on by default in [[graft.core.Sessions]])
  * handles most of this automatically for sort-merge joins; the manual form
  * remains for aggregation-feeding joins AQE cannot split, for fixed-shape
  * pipelines (streaming joins have no AQE), and as the building block of
  * two-phase salted aggregations.
  */
object SkewJoin {

  /** Inner equi-join on `key`, salted. Result is EXACTLY the plain inner
    * join (proven in SkewJoinSpec incl. a heavy-hitter key): salting only
    * re-partitions the work. `tieBreak` must be non-null; rows with equal
    * (key, tieBreak) values land on the same replica, which is correct —
    * just less spread — so any roughly-unique column (event id, offset)
    * serves.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salts: Int, tieBreak: String): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(col(tieBreak)), lit(salts.toLong)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
