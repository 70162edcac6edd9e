package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record-linkage join: match a dirty feed against a master table on a
  * name/key column when the keys differ by typos — the entity-resolution
  * step before any id-based pipeline can ingest third-party records.
  *
  * Blocking is the SymSpell deletion neighborhood (the same exact-for-ED≤1
  * scheme [[graft.pipeline.TextOps.typoPairs]] uses for its vocabulary
  * SELF-join, generalized to two relations): every key expands to itself
  * plus its single-character deletions, candidates are the variant
  * equi-join, and every candidate is verified with exact `levenshtein`.
  * An ED ≤ 1 pair always shares a variant (equal keys share the original;
  * a substitution shares the both-sides deletion at that position; an
  * insertion/deletion shares the longer side's deletion), so blocking
  * introduces NO false negatives — unlike phonetic or prefix blocking.
  *
  * Scale shape: the explode is a ~(len+1)× fan-out of (id, key) pairs
  * only, the join is a hash equi-join on the variant string, and the
  * quadratic levenshtein runs on candidates alone — never all pairs.
  */
object FuzzyJoin {

  /** All ED ≤ `maxDist` pairs between `left` and `right` keys.
    * Output: id_a, id_b, name_a, name_b, dist (ascending ids are NOT
    * imposed — the two sides are distinct relations).
    */
  def editJoin(left: DataFrame, right: DataFrame,
      leftId: String, leftKey: String, rightId: String, rightKey: String,
      maxDist: Int = 1): DataFrame = {
    require(maxDist == 1,
      s"deletion-neighborhood blocking is exact only for maxDist = 1, got $maxDist")
    def variants(df: DataFrame, id: String, key: String,
        idOut: String, keyOut: String): DataFrame =
      df.select(col(id).as(idOut), col(key).as(keyOut))
        .where(col(keyOut).isNotNull)
        .select(col(idOut), col(keyOut),
          explode(sequence(lit(0), length(col(keyOut)))).as("__i"))
        .select(col(idOut), col(keyOut),
          when(col("__i") === 0, col(keyOut))
            .otherwise(concat(expr(s"substring($keyOut, 1, __i - 1)"),
              expr(s"substring($keyOut, __i + 1, length($keyOut))"))).as("__v"))
    variants(left, leftId, leftKey, "id_a", "name_a")
      .join(variants(right, rightId, rightKey, "id_b", "name_b"), "__v")
      .select("id_a", "id_b", "name_a", "name_b").distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= maxDist)
  }
}
