package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-linkage join: match a dirty feed against a master table on a
  * name/key column when the keys differ by typos — the entity-resolution
  * step before any id-based pipeline can ingest third-party records.
  *
  * Blocking is the SymSpell deletion neighborhood (the same exact-for-ED≤1
  * scheme [[graft.pipeline.TextOps.typoPairs]] uses for its vocabulary
  * SELF-join, generalized to two relations): every key expands to itself
  * plus its deletion variants, candidates are the variant equi-join, and
  * every candidate is verified with exact `levenshtein`. The neighborhood
  * is exact at ANY radius d (the SymSpell property): take an optimal
  * alignment of an ED ≤ d pair with i insertions, e deletions, s
  * substitutions (i+e+s ≤ d); deleting the e+s unmatched characters from
  * one side and the i+s from the other leaves the identical matched
  * subsequence, and both deletion counts are ≤ d — so blocking introduces
  * NO false negatives, unlike phonetic or prefix blocking. Radius 1 and 2
  * are supported; the fan-out grows ~len^d, which is why d stops at 2.
  *
  * Scale shape: the explode is a ~(len+1)× (d=1) or ~(len²/2)× (d=2)
  * fan-out of (id, key) pairs only, the join is a hash equi-join on the
  * variant string, and the quadratic levenshtein runs on candidates alone
  * — never all pairs.
  */
object FuzzyJoin {

  /** All ED ≤ `maxDist` pairs between `left` and `right` keys.
    * Output: id_a, id_b, name_a, name_b, dist (ascending ids are NOT
    * imposed — the two sides are distinct relations).
    */
  def editJoin(left: DataFrame, right: DataFrame,
      leftId: String, leftKey: String, rightId: String, rightKey: String,
      maxDist: Int = 1): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"deletion-neighborhood blocking supports maxDist 1 or 2, got $maxDist")
    // one deletion level: __v = key minus the char at position __i (or the
    // key itself at __i = 0), applied to whatever column `src` names
    def delLevel(df: DataFrame, keep: Seq[String], src: String): DataFrame =
      df.withColumn("__i", explode(sequence(lit(0), length(col(src)))))
        .select(keep.map(col) :+
          when(col("__i") === 0, col(src))
            .otherwise(concat(expr(s"substring($src, 1, __i - 1)"),
              expr(s"substring($src, __i + 1, length($src))"))).as("__v"): _*)
    def variants(df: DataFrame, id: String, key: String,
        idOut: String, keyOut: String): DataFrame = {
      val base = df.select(col(id).as(idOut), col(key).as(keyOut))
        .where(col(keyOut).isNotNull)
      val l1 = delLevel(base, Seq(idOut, keyOut), keyOut)
      if (maxDist == 1) l1
      else delLevel(l1.withColumnRenamed("__v", "__v1"),
        Seq(idOut, keyOut), "__v1").distinct()
    }
    variants(left, leftId, leftKey, "id_a", "name_a")
      .join(variants(right, rightId, rightKey, "id_b", "name_b"), "__v")
      .select("id_a", "id_b", "name_a", "name_b").distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= maxDist)
  }

  /** Entity canonicalization: connected components over the [[editJoin]]
    * match graph assign every record (both relations, singletons included)
    * a canonical `entity_id` — the min record id reachable through fuzzy
    * matches. This is the resolution step after blocking+verify: a dirty
    * record ambiguous between several masters MERGES them into one entity
    * (transitivity is the honest semantics of "these records may be the
    * same thing"; a one-to-one assignment would have to pick arbitrarily).
    * Emits `entity_size` so downstream consumers can route big ambiguous
    * entities to manual review.
    *
    * Scale shape: the match graph runs through the O(log n)-round
    * large-star/small-star [[graft.pipeline.Components.connectedComponents]]
    * (checkpointed, convergence-probed); singletons never enter the
    * iteration — they join back as their own entity at the end.
    */
  def entities(left: DataFrame, right: DataFrame,
      leftId: String, leftKey: String, rightId: String, rightKey: String,
      maxDist: Int = 1): DataFrame = {
    val pairs = editJoin(left, right, leftId, leftKey, rightId, rightKey,
      maxDist).select("id_a", "id_b")
    val nodes = left.select(col(leftId).cast("long").as("record_id"))
      .unionByName(right.select(col(rightId).cast("long").as("record_id")))
      .distinct()
    val cc = graft.pipeline.Components.connectedComponents(pairs, "id_a", "id_b")
      .select(col("id").as("record_id"), col("component"))
    val labeled = nodes.join(cc, Seq("record_id"), "left_outer")
      .select(col("record_id"),
        coalesce(col("component"), col("record_id")).as("entity_id"))
    val sizes = labeled.groupBy("entity_id")
      .agg(count(lit(1)).as("entity_size"))
    labeled.join(sizes, "entity_id")
      .select("record_id", "entity_id", "entity_size")
  }
}
