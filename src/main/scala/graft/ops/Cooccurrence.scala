package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence over the event stream: for every unordered
  * pair of event types, how many users did BOTH, and the lift
  * `P(a,b) / (P(a)·P(b))` — the association-mining view behind "users who
  * error also churn". Lift > 1 means the types co-occur more than
  * independent behavior predicts.
  *
  * Scale shape: the per-user distinct type set is one partial-combined
  * distinct; the pair space is user-keyed (self-join on the user key, type
  * pairs bounded by the type vocabulary squared per user); counts combine
  * map-side and the lift arithmetic is integer-exact until one final
  * double division, so the twin agrees bit for bit.
  */
object Cooccurrence {

  def typeLift(events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    // NULL users are excluded EXPLICITLY: the pair join would drop them
    // anyway (null-unsafe equality), but distinct().count() would still
    // admit one into the lift denominator — where SQL's count(DISTINCT)
    // ignores NULLs — skewing every lift value
    val types = events.select(col(userCol), col(typeCol))
      .where(col(userCol).isNotNull && col(typeCol).isNotNull)
      .distinct()
    val nUsers = types.select(userCol).distinct()
      .agg(count(lit(1)).as("__n_users"))
    val singles = types.groupBy(col(typeCol).as("__t"))
      .agg(count(lit(1)).as("__n"))
    val pairs = types.select(col(userCol), col(typeCol).as("type_a"))
      .join(types.select(col(userCol), col(typeCol).as("type_b")), userCol)
      .where(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_users_both"))
    pairs
      .join(broadcast(singles.select(col("__t").as("type_a"), col("__n").as("__n_a"))), "type_a")
      .join(broadcast(singles.select(col("__t").as("type_b"), col("__n").as("__n_b"))), "type_b")
      .crossJoin(broadcast(nUsers))
      .select(col("type_a"), col("type_b"), col("n_users_both"),
        // both denominator counts cast to double BEFORE the multiply: with
        // per-type user counts above ~3e9 the long×long product silently
        // wraps under non-ANSI Spark (the DuckDB twin would error on its
        // HUGEINT overflow check instead — a divergence, not a safety net)
        (col("n_users_both").cast("double") * col("__n_users")
          / (col("__n_a").cast("double") * col("__n_b").cast("double"))).as("lift"))
  }

  /** Directional association rules over the same user×type baskets —
    * antecedent → consequent with the three classic measures: support
    * `P(a,b)`, confidence `P(b|a)` (the directional one [[typeLift]]'s
    * symmetric lift can't express), and lift. Both orientations of every
    * co-occurring pair are emitted; `minBoth` prunes the tail below a
    * user-count floor BEFORE the metadata joins.
    *
    * Scale shape identical to [[typeLift]]: user-keyed pair join over the
    * distinct per-user type sets, partial-combined counts, broadcast
    * singles; each measure is integer-exact until one pinned double
    * division so the twin agrees bit for bit.
    */
  def assocRules(events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type", minBoth: Long = 1L): DataFrame = {
    require(minBoth >= 1, s"minBoth must be >= 1, got $minBoth")
    val types = events.select(col(userCol), col(typeCol))
      .where(col(userCol).isNotNull && col(typeCol).isNotNull)
      .distinct()
    val nUsers = types.select(userCol).distinct()
      .agg(count(lit(1)).as("__n_users"))
    val singles = types.groupBy(col(typeCol).as("__t"))
      .agg(count(lit(1)).as("__n"))
    val pairs = types.select(col(userCol), col(typeCol).as("antecedent"))
      .join(types.select(col(userCol), col(typeCol).as("consequent")), userCol)
      .where(col("antecedent") =!= col("consequent"))
      .groupBy("antecedent", "consequent")
      .agg(count(lit(1)).as("n_users_both"))
      .where(col("n_users_both") >= minBoth)
    pairs
      .join(broadcast(singles.select(col("__t").as("antecedent"), col("__n").as("__n_a"))),
        "antecedent")
      .join(broadcast(singles.select(col("__t").as("consequent"), col("__n").as("__n_b"))),
        "consequent")
      .crossJoin(broadcast(nUsers))
      .select(col("antecedent"), col("consequent"), col("n_users_both"),
        (col("n_users_both").cast("double") / col("__n_users").cast("double"))
          .as("support"),
        (col("n_users_both").cast("double") / col("__n_a").cast("double"))
          .as("confidence"),
        (col("n_users_both").cast("double") * col("__n_users")
          / (col("__n_a").cast("double") * col("__n_b").cast("double"))).as("lift"))
  }
}
