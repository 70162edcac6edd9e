package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{IncrementalSemDedup, Similarity}

/** The incremental semantic-dedup contract: after any sequence of addBatch
  * calls, the maintained verdicts equal semanticDedupFrozen recomputed on
  * the union corpus against the BOOTSTRAP centroids — row for row,
  * including interleaved-id batches that tighten existing verdicts.
  */
class IncrementalSemDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select("vec_id", "embedding")

  test("multi-batch ingest equals frozen-centroid recompute on the union") {
    val base = emb.where(col("vec_id") < 30)
    val b1 = emb.where(col("vec_id") >= 30 && col("vec_id") < 45)
    val b2 = emb.where(col("vec_id") >= 45)

    var st = IncrementalSemDedup.bootstrap(base, threshold = 0.4, k = 4, iters = 1)
    st = IncrementalSemDedup.addBatch(st, b1)
    st = IncrementalSemDedup.addBatch(st, b2)

    val full = Similarity.semanticDedupFrozen(emb, st.centroids, threshold = 0.4)
    assert(rowsOf(IncrementalSemDedup.result(st)) == rowsOf(full))
  }

  test("interleaved ids: a lower-id batch vector tightens existing verdicts") {
    val base = emb.where(col("vec_id") % 3 =!= 0)
    val batch = emb.where(col("vec_id") % 3 === 0)

    var st = IncrementalSemDedup.bootstrap(base, threshold = 0.4, k = 4, iters = 1)
    st = IncrementalSemDedup.addBatch(st, batch)

    val full = Similarity.semanticDedupFrozen(emb, st.centroids, threshold = 0.4)
    val got = rowsOf(IncrementalSemDedup.result(st))
    assert(got == rowsOf(full))
    // the scenario is real only if some bootstrap verdict actually changed:
    // an existing vector must be pruned by a LOWER batch id
    val boot = Similarity.semanticDedupFrozen(base, st.centroids, threshold = 0.4)
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    val tightened = IncrementalSemDedup.result(st).collect().exists { r =>
      val id = r.getLong(0)
      boot.contains(id) && Option(r.get(3)) != boot(id)
    }
    assert(tightened, "fixture produced no verdict tightened by a batch id — " +
      "the interleaved-id path was not exercised")
  }

  test("bootstrap alone matches semanticDedup on the same corpus") {
    val st = IncrementalSemDedup.bootstrap(emb, threshold = 0.4, k = 4, iters = 1)
    val full = Similarity.semanticDedup(emb, threshold = 0.4, k = 4, iters = 1)
    assert(rowsOf(IncrementalSemDedup.result(st)) == rowsOf(full))
  }

  test("new cell-mates below threshold leave verdicts untouched") {
    // two orthogonal base vectors, one batch vector orthogonal to both:
    // everything stays kept
    val base = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val batch = Seq((3L, Seq(0.0f, 0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    var st = IncrementalSemDedup.bootstrap(base, threshold = 0.9, k = 2, iters = 1)
    st = IncrementalSemDedup.addBatch(st, batch)
    val got = IncrementalSemDedup.result(st).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> true))
  }

  test("duplicate batch vector is pruned by its existing twin") {
    val v = Seq(0.5f, 0.5f, 0.1f, 0.0f)
    val base = Seq((1L, v), (5L, Seq(0.0f, 0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val batch = Seq((9L, v)).toDF("vec_id", "embedding")
    var st = IncrementalSemDedup.bootstrap(base, threshold = 0.95, k = 2, iters = 1)
    st = IncrementalSemDedup.addBatch(st, batch)
    val got = IncrementalSemDedup.result(st).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(2), Option(r.get(3)))).toMap
    assert(got(9L) == ((false, Some(1L))), s"9 pruned by 1: $got")
    assert(got(1L)._1 && got(5L)._1)
  }
}
