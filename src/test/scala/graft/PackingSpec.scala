package graft

import org.apache.spark.sql.DataFrame

import graft.pipeline.Packing

/** Sequence-packing semantics: exact agreement with a from-scratch
  * single-threaded packer, full token coverage, and — the property that
  * actually validates the distributed prefix sum — invariance to both the
  * shard width and the physical partition layout.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  /** Driver-side reference packer: concat in id order, cut every `cap`. */
  private def reference(rows: Seq[(Long, String)], cap: Long): Set[(Long, Long, Long, Long, Long)] = {
    var offset = 0L
    val out = Seq.newBuilder[(Long, Long, Long, Long, Long)]
    for ((id, text) <- rows.sortBy(_._1)) {
      val n = text.toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty).toLong
      if (n > 0) {
        val start = offset
        val end = offset + n
        var chunk = start / cap
        while (chunk * cap < end) {
          val lo = math.max(chunk * cap, start)
          val hi = math.min((chunk + 1) * cap, end)
          out += ((id, n, chunk, lo - start, hi - start))
          chunk += 1
        }
        offset = end
      }
    }
    out.result().toSet
  }

  private def collect(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_toks"),
      r.getAs[Long]("chunk_id"), r.getAs[Long]("tok_start"),
      r.getAs[Long]("tok_end"))).toSet

  private val corpus: Seq[(Long, String)] = Seq.tabulate(40) { i =>
    (i.toLong * 3, ("tok " * (i % 7 + 1)).trim) // lengths 1..7, sparse ids
  } :+ (200L, "") // empty doc must vanish

  test("matches the from-scratch packer exactly, boundary docs split correctly") {
    val got = collect(Packing.packSequences(docs(corpus: _*), capacity = 5, shardWidth = 16))
    assert(got == reference(corpus, 5))
    // at least one doc must actually straddle a chunk boundary for this
    // test to mean anything
    assert(got.groupBy(_._1).exists(_._2.size > 1))
  }

  test("invariant to shard width and partition layout") {
    val base = collect(Packing.packSequences(docs(corpus: _*), 5, shardWidth = 1L << 20))
    for (w <- Seq(1L, 7L, 16L, 1000L)) {
      assert(collect(Packing.packSequences(docs(corpus: _*), 5, shardWidth = w)) == base,
        s"shardWidth=$w")
    }
    val shuffled = docs(corpus: _*).repartition(13)
    assert(collect(Packing.packSequences(shuffled, 5, shardWidth = 16)) == base)
  }

  test("every chunk except the last is exactly full; spans cover each doc") {
    val got = collect(Packing.packSequences(docs(corpus: _*), capacity = 5, shardWidth = 16))
    val perDoc = got.groupBy(_._1)
    perDoc.foreach { case (_, spans) =>
      val n = spans.head._2
      assert(spans.toSeq.map(s => s._5 - s._4).sum == n) // full coverage
      spans.foreach(s => assert(s._4 >= 0 && s._4 < s._5 && s._5 <= n))
    }
    val perChunk = got.groupBy(_._3).view.mapValues(_.toSeq.map(s => s._5 - s._4).sum)
    val maxChunk = perChunk.keys.max
    perChunk.foreach { case (c, total) =>
      if (c < maxChunk) assert(total == 5L, s"chunk $c underfull: $total")
      else assert(total <= 5L)
    }
  }
}
