package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Components, IncrementalDedup}

/** The incremental-ingest contract: after any sequence of addBatch calls,
  * the maintained clusters equal a full dedupClusters recompute on the
  * union corpus — row for row, including canonical ids and sizes.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "text")

  test("multi-batch ingest equals full recompute on the union corpus") {
    val base = docs.where(col("doc_id") < 300)
    val b1 = docs.where(col("doc_id") >= 300 && col("doc_id") < 400)
    val b2 = docs.where(col("doc_id") >= 400)

    var st = IncrementalDedup.bootstrap(base)
    st = IncrementalDedup.addBatch(st, b1)
    st = IncrementalDedup.addBatch(st, b2)

    val incremental = IncrementalDedup.clusters(st)
    val full = Components.dedupClusters(docs)
    assert(rowsOf(incremental) == rowsOf(full))
  }

  test("adoption: a new near-dup joins the existing cluster without merging") {
    // identical texts → exact near-dups; cluster {1, 2} exists at bootstrap
    val ta = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tb = "one two three four five six seven eight nine ten eleven twelve"
    val base = Seq((1L, ta), (2L, ta), (10L, tb)).toDF("doc_id", "text")
    var st = IncrementalDedup.bootstrap(base)
    assert(IncrementalDedup.clusters(st).collect().map(_.getLong(0)).toSet == Set(1L, 2L))

    // doc 5 adopts cluster 1 (label unchanged: 5 > 1)
    st = IncrementalDedup.addBatch(st, Seq((5L, ta)).toDF("doc_id", "text"))
    val got = IncrementalDedup.clusters(st).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got.keySet == Set(1L, 2L, 5L))
    assert(got.values.forall(_._1 == 1L), s"all in cluster 1: $got")
    assert(got.values.forall(_._2 == 3L), "cluster size 3")
    assert(got(1L)._3 && !got(5L)._3, "canonical stays doc 1")

    // matches the full recompute exactly
    val full = Components.dedupClusters(
      base.unionByName(Seq((5L, ta)).toDF("doc_id", "text")))
    assert(rowsOf(IncrementalDedup.clusters(st)) == rowsOf(full))
  }

  test("adoption by a smaller id moves the canonical label") {
    val ta = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val base = Seq((10L, ta), (11L, ta)).toDF("doc_id", "text")
    var st = IncrementalDedup.bootstrap(base)
    // doc 3 (< label 10) adopts: the whole cluster relabels to 3
    st = IncrementalDedup.addBatch(st, Seq((3L, ta)).toDF("doc_id", "text"))
    val got = IncrementalDedup.clusters(st).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(got.keySet == Set(3L, 10L, 11L))
    assert(got.values.forall(_._1 == 3L), s"relabeled to 3: $got")
    assert(got(3L)._2, "doc 3 is the new canonical")

    val full = Components.dedupClusters(
      base.unionByName(Seq((3L, ta)).toDF("doc_id", "text")))
    assert(rowsOf(IncrementalDedup.clusters(st)) == rowsOf(full))
  }

  test("a previously-unclustered old doc is adopted as a pair partner") {
    val ta = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tb = "one two three four five six seven eight nine ten eleven twelve"
    // doc 7 is a singleton at bootstrap (nothing matches tb)
    val base = Seq((1L, ta), (2L, ta), (7L, tb)).toDF("doc_id", "text")
    var st = IncrementalDedup.bootstrap(base)
    assert(!IncrementalDedup.clusters(st).collect().map(_.getLong(0)).contains(7L))

    // a new exact dup of tb clusters WITH doc 7
    st = IncrementalDedup.addBatch(st, Seq((20L, tb)).toDF("doc_id", "text"))
    val got = IncrementalDedup.clusters(st).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(7L) == 7L && got(20L) == 7L, s"singleton adopted: $got")

    val full = Components.dedupClusters(
      base.unionByName(Seq((20L, tb)).toDF("doc_id", "text")))
    assert(rowsOf(IncrementalDedup.clusters(st)) == rowsOf(full))
  }

  test("collision: a bridging doc merges two existing clusters") {
    // two clusters whose texts share too little to pair (Jaccard < 0.5),
    // plus a bridge doc overlapping both enough to pair with each
    val common = (1 to 8).map(i => s"c$i").mkString(" ")
    val ta = common + " " + (1 to 14).map(i => s"a$i").mkString(" ")
    val tb = common + " " + (1 to 14).map(i => s"b$i").mkString(" ")
    val bridge = common + " " +
      (1 to 14).map(i => s"a$i").mkString(" ") + " " +
      (1 to 14).map(i => s"b$i").mkString(" ")
    val base = Seq((1L, ta), (2L, ta), (10L, tb), (11L, tb)).toDF("doc_id", "text")
    var st = IncrementalDedup.bootstrap(base)
    val before = IncrementalDedup.clusters(st).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L),
      s"bootstrap must give two separate clusters, got $before")

    st = IncrementalDedup.addBatch(st, Seq((50L, bridge)).toDF("doc_id", "text"))
    val after = IncrementalDedup.clusters(st).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Components.dedupClusters(
      base.unionByName(Seq((50L, bridge)).toDF("doc_id", "text")))
    assert(rowsOf(IncrementalDedup.clusters(st)) == rowsOf(full))
    // and the merge actually happened (the bridge links both clusters)
    assert(after.values.toSet.size == 1, s"clusters must merge: $after")
    assert(after.values.head == 1L, "merged label is the global min id")
  }

  test("state survives a save/load round trip mid-ingest") {
    val base = docs.where(col("doc_id") < 300)
    val b1 = docs.where(col("doc_id") >= 300 && col("doc_id") < 400)
    val b2 = docs.where(col("doc_id") >= 400)

    var st = IncrementalDedup.bootstrap(base)
    st = IncrementalDedup.addBatch(st, b1)
    // simulate an ingest-process restart between batches
    val dir = tmpDir("graft-incdedup-state")
    IncrementalDedup.saveState(st, dir)
    var st2 = IncrementalDedup.loadState(spark, dir)
    assert(st2.shingleK == st.shingleK && st2.threshold == st.threshold)
    st2 = IncrementalDedup.addBatch(st2, b2)

    val full = Components.dedupClusters(docs)
    assert(rowsOf(IncrementalDedup.clusters(st2)) == rowsOf(full))
  }

  test("randomized corpora: incremental == full recompute across seeds") {
    // deterministic PRNG corpora engineered for near-dup structure: docs
    // draw from a small set of template token runs with point mutations,
    // so duplicate cliques, bridges, and singletons all arise; the batch
    // split is random too. Any divergence between the incremental state
    // and the full recompute fails here long before a production corpus
    // would find it.
    for (seed <- Seq(11L, 42L, 97L)) {
      val rnd = new scala.util.Random(seed)
      val templates = (0 until 6).map { t =>
        (0 until 12).map(i => s"w${rnd.nextInt(30)}_$t$i")
      }
      val corpus = (0 until 90).map { id =>
        val base = templates(rnd.nextInt(templates.size))
        // 0-3 point mutations keep most pairs above, some below threshold
        val mutated = base.map(w =>
          if (rnd.nextInt(10) < 2) s"m${rnd.nextInt(50)}" else w)
        (id.toLong, mutated.mkString(" "))
      }
      val df = corpus.toDF("doc_id", "text")
      val cut1 = 30 + rnd.nextInt(20)
      val cut2 = cut1 + 10 + rnd.nextInt(20)
      var st = IncrementalDedup.bootstrap(df.where(col("doc_id") < cut1))
      st = IncrementalDedup.addBatch(st,
        df.where(col("doc_id") >= cut1 && col("doc_id") < cut2))
      st = IncrementalDedup.addBatch(st, df.where(col("doc_id") >= cut2))
      val full = Components.dedupClusters(df)
      assert(rowsOf(IncrementalDedup.clusters(st)) == rowsOf(full),
        s"seed $seed (cuts $cut1/$cut2) diverged from the full recompute")
    }
  }

  test("a batch with no near-dups leaves the state unchanged") {
    val ta = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val base = Seq((1L, ta), (2L, ta)).toDF("doc_id", "text")
    var st = IncrementalDedup.bootstrap(base)
    val before = rowsOf(IncrementalDedup.clusters(st))
    st = IncrementalDedup.addBatch(st,
      Seq((30L, "utterly unrelated content nothing shared here at all today"))
        .toDF("doc_id", "text"))
    assert(rowsOf(IncrementalDedup.clusters(st)) == before)
  }
}
