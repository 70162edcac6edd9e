package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training over a document corpus — the actual
  * vocabulary-learning loop of a subword tokenizer (Sennrich et al. 2016,
  * public), not just tokenization with a fixed regex. Word-level BPE:
  *
  *  1. count distinct words once (the ONLY corpus-scale pass — everything
  *     after runs on the word-frequency table, which is how industrial
  *     trainers scale: 100 TB of text collapses to a vocabulary of
  *     frequency-weighted words before any merge round);
  *  2. start each word as its character sequence plus a `</w>` end marker;
  *  3. per round: count adjacent symbol pairs weighted by word frequency
  *     (every adjacent position counts, the reference formulation), pick
  *     the most frequent pair — ties break to the lexicographically
  *     smallest (left, right) so the result is a pure function of the
  *     corpus — and merge it greedily left-to-right in every word.
  *
  * Symbol sequences are carried as a delimited string `"|s1||s2||…||sN|"`
  * (tokens are [a-z0-9]+ and the marker is `</w>`, so `|` can't occur in a
  * symbol): applying a merge is then ONE literal `replace(sym,
  * '|a||b|', '|ab|')` — and literal replace's left-to-right,
  * non-overlapping scan IS greedy BPE application ("aaa" under (a,a) →
  * [aa, a]). Each symbol owns its pipes on both sides, so a match can
  * never start mid-symbol and consecutive merges of the same pair chain
  * correctly ([a,a,a,a] → [aa,aa]).
  *
  * Scale notes: each round is one partial-combined pair count over the
  * vocabulary table, a driver collect of exactly ONE row (the argmax), and
  * a map-only merge application; [[graft.core.Lineage.truncate]] caps the
  * plan per round. The driver holds `nMerges` pairs — metadata.
  */
object Bpe {

  final case class Trained(merges: DataFrame, vocab: DataFrame)

  private def symsCol: org.apache.spark.sql.Column =
    split(expr("substring(sym, 2, length(sym) - 2)"), "\\|\\|")

  /** Learn `nMerges` merges. Returns the merge table
    * (rank, lft, rgt, merged, pair_count) and the final word table
    * (word, freq, sym) with each word's post-merge symbol string.
    */
  def train(df: DataFrame, textCol: String = "text", nMerges: Int = 8): Trained = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = df.sparkSession
    var vocab = graft.core.Lineage.truncate(
      df.select(explode(TextOps.tokens(col(textCol))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
        .withColumn("sym", concat(lit("|"),
          array_join(split(col("word"), ""), "||"), lit("||</w>|"))))
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val best = vocab
        .withColumn("syms", symsCol)
        // a fully-merged word is ONE symbol: without the guard,
        // sequence(1, 0) descends and element_at(syms, 0) errors
        .where(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "k -> struct(element_at(syms, k) AS lft, element_at(syms, k + 1) AS rgt))"))
          .as("p"))
        .select(col("p.lft").as("lft"), col("p.rgt").as("rgt"), col("freq"))
        .groupBy("lft", "rgt").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("lft").asc, col("rgt").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((round, l, r, l + r, cnt))
        // symbols are [a-z0-9</>]+ — no quoting hazards in the literal
        vocab = graft.core.Lineage.truncate(vocab.withColumn("sym",
          expr(s"replace(sym, '|$l||$r|', '|$l$r|')")))
        round += 1
      }
    }
    import spark.implicits._
    val mergeDf = merges.result()
      .toDF("rank", "lft", "rgt", "merged", "pair_count")
    Trained(mergeDf, vocab)
  }

  /** Per-document segmentation stats under a trained vocabulary: join each
    * document's words to the word table and sum post-merge symbol counts —
    * the corpus-level fertility readout of the learned tokenizer. Documents
    * with no tokens are absent (inner join on the exploded words).
    */
  def segmentStats(df: DataFrame, vocab: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val words = df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("word"))
    val nSyms = vocab.select(col("word"), size(symsCol).cast("long").as("n_syms"))
    words.join(nSyms, Seq("word"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum("n_syms").as("n_bpe"))
  }
}
