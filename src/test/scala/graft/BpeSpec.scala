package graft

import graft.pipeline.Bpe

/** BPE merge training against a from-scratch driver reference. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference trainer: word-freq table, chars+"</w>" symbols, per-round
    * (count desc, pair asc) argmax, greedy left-to-right merge.
    */
  private def reference(texts: Seq[String], nMerges: Int)
      : (Seq[(Int, String, String, String, Long)], Map[String, Seq[String]]) = {
    val words = texts.flatMap(_.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
    val freq = words.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var syms: Map[String, Seq[String]] =
      freq.keys.map(w => w -> (w.map(_.toString) :+ "</w>")).toMap
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((w, ss) <- syms; k <- 0 until ss.size - 1)
        counts((ss(k), ss(k + 1))) = counts.getOrElse((ss(k), ss(k + 1)), 0L) + freq(w)
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((round, l, r, l + r, cnt))
        syms = syms.map { case (w, ss) =>
          val out = Seq.newBuilder[String]
          var i = 0
          while (i < ss.size) {
            if (i + 1 < ss.size && ss(i) == l && ss(i + 1) == r) {
              out += l + r; i += 2
            } else { out += ss(i); i += 1 }
          }
          w -> out.result()
        }
        round += 1
      }
    }
    (merges.result(), syms)
  }

  private val corpus = Seq(
    "the cat sat on the mat", "the cats eat fast", "a fast cat on a mat",
    "mats and cats and rats", "the rat sat fast", "aaaa aa a aaaa")

  test("train matches the reference merges exactly, in order") {
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.train(df, nMerges = 10).merges
      .orderBy("rank")
      .as[(Int, String, String, String, Long)].collect().toSeq
    val (exp, _) = reference(corpus, 10)
    assert(got == exp)
  }

  test("greedy application chains: aaaa under (a,a) becomes [aa, aa]") {
    // single-word corpus forces (a,a) as the first merge; after it the
    // word's symbol string must hold exactly [aa, aa, </w>]
    val df = Seq((1L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val t = Bpe.train(df, nMerges = 1)
    val m = t.merges.as[(Int, String, String, String, Long)].collect().head
    assert((m._2, m._3) == ("a", "a"))
    val sym = t.vocab.where($"word" === "aaaa").select("sym").as[String].collect().head
    assert(sym == "|aa||aa||</w>|")
  }

  test("training stops early when no pair remains") {
    // one single-char word: round 0 merges (a, </w>); after that every
    // word is one symbol and no pair exists
    val df = Seq((1L, "a a a")).toDF("doc_id", "text")
    val merges = Bpe.train(df, nMerges = 5).merges.collect()
    assert(merges.length == 1)
  }

  test("segmentStats sums post-merge symbol counts per document") {
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val t = Bpe.train(df, nMerges = 10)
    val got = Bpe.segmentStats(df, t.vocab)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val (_, syms) = reference(corpus, 10)
    for ((text, i) <- corpus.zipWithIndex) {
      val ws = text.split(" ").toSeq
      val exp = (ws.size.toLong, ws.map(w => syms(w).size.toLong).sum)
      assert(got(i.toLong) == exp, s"doc $i")
    }
  }
}
