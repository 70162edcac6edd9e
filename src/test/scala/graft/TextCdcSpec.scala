package graft

import graft.pipeline.TextCdc

/** Content-defined chunking over text: boundaries are pure functions of
  * local content, so the chunk stream re-synchronizes after edits where
  * fixed-width chunking misaligns everything downstream.
  */
class TextCdcSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: same rolling hash, same boundary rule. */
  private def refChunks(text: String, window: Int, maskBits: Int): Seq[(Int, Long, Long, Long)] = {
    val p = 1000000007L
    val cs = text.map(_.toInt.toLong)
    val n = cs.length
    def fold(lo: Int, hi: Int): Long = { // [lo, hi) 0-based
      var a = 0L
      var j = lo
      while (j < hi) { a = ((a * 31 + cs(j)) % p + p) % p; j += 1 }
      a
    }
    val mask = (1L << maskBits) - 1
    val ends = ((window to n).filter(k => (fold(k - window, k) & mask) == 0L) ++ Seq(n))
      .distinct.sorted
    ends.zipWithIndex.map { case (end, ci) =>
      val start = if (ci == 0) 0 else ends(ci - 1)
      (ci, start.toLong, (end - start).toLong, fold(start, end))
    }
  }

  test("cdcChunks tiles every doc, matches the driver reference, re-syncs after a prefix insert") {
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(400)(('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq((1L, base), (2L, "PREFIX-INSERTED SENTENCE. " + base))
      .toDF("doc_id", "text")
    val got = TextCdc.cdcChunks(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx"),
        r.getAs[Long]("start"), r.getAs[Long]("n_chunk_chars"),
        r.getAs[Long]("chunk_hash")))
    // exact driver parity on both docs
    Seq(1L -> base, 2L -> ("PREFIX-INSERTED SENTENCE. " + base)).foreach { case (id, t) =>
      val exp = refChunks(t, 4, 5).map { case (ci, st, len, h) => (id, ci, st, len, h) }
      assert(got.filter(_._1 == id).sortBy(_._2).toSeq == exp)
    }
    // chunks tile [0, n) contiguously
    Seq(1L, 2L).foreach { id =>
      val cs = got.filter(_._1 == id).sortBy(_._2)
      assert(cs.head._3 == 0L)
      cs.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 == b._3, s"gap at ${b._2}")
        case _ =>
      }
    }
    // prefix-insert re-synchronization: nearly every chunk hash survives
    val h1 = got.filter(_._1 == 1L).map(_._5).toSet
    val h2 = got.filter(_._1 == 2L).map(_._5).toSet
    assert(h1.size >= 4, s"corpus too short for the test: ${h1.size} chunks")
    val shared = (h1 intersect h2).size
    assert(shared >= h1.size - 2,
      s"only $shared of ${h1.size} chunks survive a prefix insert")
    // and the dedup face links exactly this pair
    val pairs = TextCdc.cdcDups(docs, minShared = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("cdcDups: unrelated docs share nothing; empty/null texts drop out") {
    val rnd = new scala.util.Random(11)
    def doc(): String = Seq.fill(300)(('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq((1L, doc()), (2L, doc()), (3L, ""), (4L, null))
      .toDF("doc_id", "text")
    assert(TextCdc.cdcDups(docs, minShared = 1).count() == 0)
    assert(TextCdc.cdcChunks(docs).select("doc_id").distinct().count() == 2)
  }

  test("parameter guards") {
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](TextCdc.cdcChunks(docs, window = 0))
    intercept[IllegalArgumentException](TextCdc.cdcChunks(docs, maskBits = 21))
    intercept[IllegalArgumentException](TextCdc.cdcDups(docs, maxDf = 1))
  }
}
