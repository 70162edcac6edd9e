package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end pretraining curation pipeline, composed from the
  * library's verified stage operators — the "run the whole cleaning recipe
  * as one query" face a data-curation user actually calls, rather than
  * wiring the stages by hand:
  *
  *   1. quality gate   — [[TextOps.gopherRules]] (Rae et al. 2021 rules)
  *   2. exact dedup    — [[Dedup.exact]] keeper selection (md5 groups)
  *   3. near dedup     — [[Components.dedupKeepers]] quality-argmax keeper
  *                        per MinHash-LSH cluster
  *   4. decontamination — [[TextOps.decontaminate]] 5-gram overlap against
  *                        a benchmark corpus
  *
  * One row per input document with each stage's verdict and the conjunctive
  * `kept` — emitting flags rather than the filtered corpus keeps every
  * drop auditable (the per-stage funnel is one `groupBy` away) and lets a
  * caller loosen any single gate without re-running the others.
  *
  * Scale shape: each stage is the already-audited operator (gopher is
  * map-only; exact dedup one hash groupBy; near-dup keepers the banded
  * LSH join + log-round connected components; decontamination a broadcast
  * gram probe); the final assembly is four equi-joins on the well-spread
  * doc key. Documents outside any near-dup cluster are their own keeper
  * (LEFT join, `coalesce(true)`).
  */
object Curation {

  def curate(docs: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val flags = TextOps.gopherRules(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), col("pass_gopher"))
    val exact = Dedup.exact(docs, idCol, textCol)
      .select(col(idCol), (!col("is_dup")).as("is_exact_keeper"))
    val near = Components.dedupKeepers(docs, idCol, textCol)
      .select(col(idCol), col("is_keeper"))
    val clean = TextOps.decontaminate(docs, bench, n = 5, idCol, textCol)
      .select(col(idCol), (!col("contaminated")).as("is_clean"))
    docs.select(col(idCol))
      .join(flags, Seq(idCol))
      .join(exact, Seq(idCol))
      .join(near, Seq(idCol), "left")
      .withColumn("is_near_keeper", coalesce(col("is_keeper"), lit(true)))
      .drop("is_keeper")
      .join(clean, Seq(idCol))
      .withColumn("kept",
        col("pass_gopher") && col("is_exact_keeper")
          && col("is_near_keeper") && col("is_clean"))
  }
}
