package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Curation

/** End-to-end curation pipeline: each stage's verdict must match the
  * single-stage operators' semantics on a corpus engineered to trip each
  * gate exactly once, and `kept` must be their conjunction.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // 30 words, alphabetic, mean length in [3, 10], plenty of stopwords —
  // passes every gopher rule
  private val good =
    "the cat sat on the mat and then the dog ran over the hill while " +
      "we watched them play in the warm sun for hours and hours more"
  // near-dup of `good`: token-identical (punctuation only), so the MinHash
  // pair is guaranteed (jaccard 1 hits every band) while md5 differs; the
  // extra '.' nudges quality_score just below doc 1's
  private val nearDup = good + "."
  // shares the 5-gram "the exact phrase tokens appear" with the bench doc
  private val benched =
    "an unrelated report where the exact phrase tokens appear in order " +
      "and the rest of the words keep the document long enough to pass here too"

  private def docs = Seq(
    (1L, good),
    (2L, good),      // exact dup of 1 -> not exact keeper (and near-dup cluster)
    (3L, nearDup),   // near-dup of 1 -> clustered, loses the quality/id tie
    (4L, "too short"), // fails gopher
    (5L, benched)    // shares a 5-gram with the bench doc -> contaminated
  ).toDF("doc_id", "text")

  private def bench = Seq(
    (100L, "completely separate text but the exact phrase tokens appear in order here as well for the overlap")
  ).toDF("doc_id", "text")

  test("curate: per-stage verdicts and the conjunctive kept") {
    val got = Curation.curate(docs, bench)
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // (pass_gopher, is_exact_keeper, is_near_keeper, is_clean, kept)
    assert(got(1L) == ((true, true, true, true, true)), got(1L).toString)
    assert(got(2L)._2 == false, "doc 2 is an exact dup of doc 1")
    assert(got(2L)._5 == false)
    assert(got(3L)._2 == true, "doc 3 is not an exact dup")
    assert(got(3L)._3 == false, "doc 3 loses the near-dup keeper tie to doc 1")
    assert(got(3L)._5 == false)
    assert(got(4L)._1 == false, "doc 4 fails gopher")
    assert(got(4L)._3 == true, "doc 4 is unclustered -> its own keeper")
    assert(got(4L)._5 == false)
    assert(got(5L)._1 == true, got(5L).toString)
    assert(got(5L)._4 == false, "doc 5 shares a 5-gram with the bench")
    assert(got(5L)._5 == false)
    // conjunction holds everywhere
    got.values.foreach { case (g, e, n, c, k) => assert(k == (g && e && n && c)) }
  }

  test("curate: an empty bench contaminates nothing") {
    val got = Curation.curate(docs, bench.where(lit(false)))
    assert(got.where(!col("is_clean")).count() == 0)
  }
}
