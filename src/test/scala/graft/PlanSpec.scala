package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ts.{Evaluate, SeriesStore}
import graft.ts.model.Period

/** Physical-plan shape assertions: the scale properties the operators claim
  * (filter/projection pushdown to the parquet scan, broadcast of small
  * sides, bucket partition pruning) must actually appear in the plan, not
  * just in scaladoc.
  */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filters push down to the parquet scan") {
    val df = SparkEntry.queries("q4_filter")(spark, sfDir)
    val plan = planOf(df)
    assert(plan.contains("PushedFilters: ["), plan.linesIterator.take(20).mkString("\n"))
    assert(plan.contains("GreaterThan(l_quantity,45.0)"))
    // the second filter may fall past the toString elision; DataFilters
    // lists it un-truncated
    assert(plan.contains("(l_discount#") && plan.contains("> 0.05)"),
      "discount filter not pushed into the scan")
  }

  test("projection prunes the scan to referenced columns only") {
    val df = Tables(spark, sfDir).lineitem.select("l_orderkey", "l_quantity")
    val scanLine = planOf(df).linesIterator.find(_.contains("ReadSchema")).get
    assert(scanLine.contains("l_orderkey") && scanLine.contains("l_quantity"))
    assert(!scanLine.contains("l_comment") && !scanLine.contains("l_extendedprice"),
      s"scan reads more columns than projected: $scanLine")
  }

  test("dimension joins broadcast the small side") {
    val plan = planOf(SparkEntry.queries("q3_broadcast_dims")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("evaluate's ordinal restore is a broadcast join, never a shuffle of points") {
    val store = new SeriesStore(spark, tmpDir("graft-plan"))
    val ev = Evaluate.default(store)
    val df = ev.evaluate(spark, Seq("mock1://a/1", "mock2://b/2"), Period.ofSeconds(0, 10))
    assert(planOf(df).contains("BroadcastHashJoin"))
  }

  test("store reads prune to the requested ids' bucket partitions") {
    val store = new SeriesStore(spark, tmpDir("graft-prune"), numBuckets = 8)
    val pts = (0 until 64).map(i => (s"shyft://c/s-$i", i.toLong, i.toDouble))
      .toDF("series_id", "ts", "value")
    store.merge("c", pts)
    val df = store.read("c", Seq("shyft://c/s-0"), Period(0L, Long.MaxValue / 2))
    val plan = planOf(df)
    val bucket = store.bucketOf("shyft://c/s-0")
    // partition filter on the bucket directory column must reach the scan
    assert(plan.contains("PartitionFilters"), plan.take(2000))
    assert(plan.contains(s"bucket#") && plan.contains(s"= $bucket") ||
      plan.contains(s"bucket = $bucket") || plan.contains(s"IN ($bucket)") ||
      plan.contains(s"isin($bucket)") || plan.contains(s"($bucket)"),
      s"no bucket pruning predicate found for bucket $bucket:\n" +
        plan.linesIterator.filter(_.contains("Partition")).mkString("\n"))
    // and the ts range predicate must be pushed to the row groups
    assert(plan.contains("GreaterThanOrEqual(ts,0)"))
  }

  test("netatmo pagination is a DataSource V2 scan with per-block partitions") {
    val t = Tables(spark, sfDir)
    val cat = graft.sources.Netatmo.catalog(graft.sources.Netatmo.rawConfig(t.eventsUs))
    val eventsPoints = t.eventsUs.select("user_id", "event_type", "ts", "value")
    val src = new graft.sources.NetatmoSource(cat, eventsPoints,
      s"$sfDir/events.parquet", blockSize = 16)
    val row = cat.limit(1).collect()(0)
    val types = cat.where(col("user_id") === row.getAs[Long]("user_id") &&
        col("module_name") === row.getAs[String]("module_name"))
      .select("data_type").collect().map(_.getString(0)).toSeq
    val df = src.getMeasurements(row.getAs[Long]("user_id"), types,
      Period(Long.MinValue / 2, Long.MaxValue / 2))
    // the paginated fetch is a V2 BatchScan, not a driver loop
    assert(planOf(df).contains("BatchScan graft_netatmo"), planOf(df).take(2000))
    // block offsets became input partitions: >1 block at blockSize=16
    val scanRdd = df.select("ts").distinct()
    assert(scanRdd.count() > 16, "fixture should span multiple blocks")
    val v2 = spark.read.format("graft-netatmo")
      .option("path", s"$sfDir/events.parquet")
      .option("userId", row.getAs[Long]("user_id"))
      .option("types", types.mkString(","))
      .option("blockSize", 16)
      .load()
    assert(v2.rdd.getNumPartitions > 1, "each block must be its own partition")
  }

  test("sessionize is a single shuffle: rollup reuses the window partitioning") {
    val plan = planOf(SparkEntry.queries("events_sessionize")(spark, sfDir))
    val shuffles = plan.linesIterator.count(_.contains("Exchange"))
    assert(shuffles == 1, s"expected 1 Exchange, got $shuffles:\n${plan.take(3000)}")
  }

  test("dup-span gram stream tokenizes once: the rejoin reuses the exchange") {
    // dupGramStarts repartitions the (id, pos, gh) gram stream on gh so the
    // duplicate-count aggregate and the rejoin probe hang off ONE exchange;
    // without the ReusedExchange the corpus is tokenized/shingled/hashed
    // twice (measured 2.3x wall time at sf0.1)
    for (q <- Seq("text_dup_spans", "text_dup_coverage")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      // AQE decides exchange reuse at runtime: the reuse node only appears
      // in the FINAL adaptive plan, so execute THIS QueryExecution before
      // inspecting (count() would build and run a different one)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // AQE prints the dedup either as ReusedExchange or ReusedQueryStage
      // depending on which consumer materializes first
      assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
        s"$q lost the shared gram exchange:\n${plan.take(3000)}")
    }
  }

  test("bloom probe broadcasts the word map; the gram stream never shuffles to it") {
    val plan = planOf(SparkEntry.queries("bloom_decontaminate")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("chunking is map-only: no shuffle anywhere in the plan") {
    val plan = planOf(SparkEntry.queries("text_chunks")(spark, sfDir))
    assert(!plan.contains("Exchange"), plan.take(3000))
  }

  test("audio decode family is map-only: encode→decode chains ride the scan") {
    for (q <- Seq("audio_features", "audio_resample", "audio_chunks", "audio_fingerprint")) {
      val plan = planOf(SparkEntry.queries(q)(spark, sfDir))
      assert(!plan.contains("Exchange"), s"$q:\n${plan.take(3000)}")
    }
  }

  test("video container walk is map-only: per-clip frame streams never shuffle") {
    for (q <- Seq("video_frames", "video_keyframes")) {
      val plan = planOf(SparkEntry.queries(q)(spark, sfDir))
      assert(!plan.contains("Exchange"), s"$q:\n${plan.take(3000)}")
    }
  }

  test("deterministic sampling pushes nothing but a scan filter: no shuffle") {
    val plan = planOf(SparkEntry.queries("sample_fraction")(spark, sfDir))
    assert(!plan.contains("Exchange"), plan.take(3000))
  }

  test("resample is one shuffle with map-side partial aggregation") {
    val plan = planOf(SparkEntry.queries("ts_resample")(spark, sfDir))
    val shuffles = plan.linesIterator.count(_.contains("Exchange"))
    assert(shuffles == 1, s"expected 1 Exchange, got $shuffles:\n${plan.take(3000)}")
    // partial_avg before the exchange = map-side combine
    assert(plan.contains("partial_avg") || plan.contains("HashAggregate"),
      plan.take(3000))
  }

  test("interpolate has no join: grid and samples meet in one sorted union window") {
    val plan = planOf(SparkEntry.queries("ts_interpolate")(spark, sfDir))
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("stratified sampling gets WindowGroupLimit pushdown: map-side quota prune") {
    val plan = planOf(SparkEntry.queries("sample_stratified")(spark, sfDir))
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
  }

  test("KMV sketch gets WindowGroupLimit pushdown: <= k hashes per group per map partition") {
    // the bounded-shuffle property that justifies the sketch at scale: the
    // rank-k filter must prune each map partition's candidate hashes BEFORE
    // the window shuffle, so the exchange carries O(k·partitions) per group
    val plan = planOf(SparkEntry.queries("sketch_kmv")(spark, sfDir))
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
  }

  test("inverted index gets WindowGroupLimit pushdown on its rank window") {
    // the posting-list cap must prune map-side BEFORE the term shuffle; a
    // second (unordered) window over the term key would block this
    val plan = planOf(SparkEntry.queries("text_inverted_index")(spark, sfDir))
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
  }

  test("weighted sampling is a bounded top-n, not a global sort") {
    val plan = planOf(SparkEntry.queries("sample_weighted")(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(!plan.contains("Exchange"), plan.take(3000))
  }

  test("anomaly scoring is one shuffle: moments from an unordered window frame") {
    val plan = planOf(SparkEntry.queries("ts_anomaly")(spark, sfDir))
    val shuffles = plan.linesIterator.count(_.contains("Exchange"))
    assert(shuffles == 1, s"expected 1 Exchange, got $shuffles:\n${plan.take(3000)}")
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("ewma is one shuffle: the bounded frame rides the series sort") {
    val plan = planOf(SparkEntry.queries("ts_ewma")(spark, sfDir))
    val shuffles = plan.linesIterator.count(_.contains("Exchange"))
    assert(shuffles == 1, s"expected 1 Exchange, got $shuffles:\n${plan.take(3000)}")
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("changepoint is one shuffle: all three window passes share the series key") {
    val plan = planOf(SparkEntry.queries("ts_changepoint")(spark, sfDir))
    val shuffles = plan.linesIterator.count(_.contains("Exchange"))
    assert(shuffles == 1, s"expected 1 Exchange, got $shuffles:\n${plan.take(3000)}")
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("interval join is a key-partitioned join, never a nested-loop pair scan") {
    val plan = planOf(SparkEntry.queries("events_interval_join")(spark, sfDir))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(3000))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("gopher rules are map-only: every feature rides the scan") {
    val plan = planOf(SparkEntry.queries("text_gopher_rules")(spark, sfDir))
    assert(!plan.contains("Exchange"), plan.take(3000))
  }

  test("temperature mixing broadcasts metadata-scale quotas to the rank fill") {
    val plan = planOf(SparkEntry.queries("sample_mixture")(spark, sfDir))
    assert(plan.contains("BroadcastExchange"), plan.take(3000))
    // no single-partition exchange of the DOCUMENT stream: the only
    // SinglePartition subplans are the census fold (rows = #sources)
    val single = plan.linesIterator.filter(_.contains("SinglePartition")).toSeq
    assert(single.size <= 2, s"unexpected global collapse:\n${single.mkString("\n")}")
  }

  test("autocorr is one shuffle: the (series, lag) groupBy reuses the series sort") {
    val plan = planOf(SparkEntry.queries("ts_autocorr")(spark, sfDir))
    val shuffles = plan.linesIterator.count(_.contains("Exchange"))
    assert(shuffles == 1, s"expected 1 Exchange, got $shuffles:\n${plan.take(3000)}")
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("dimension stats aggregate partial: the shuffle carries per-dim rows only") {
    val plan = planOf(SparkEntry.queries("vec_dim_stats")(spark, sfDir))
    val shuffles = plan.linesIterator.count(_.contains("Exchange"))
    assert(shuffles == 1, s"expected 1 Exchange, got $shuffles:\n${plan.take(3000)}")
    assert(plan.contains("HashAggregate"), plan.take(3000))
  }

  test("ohlc is one shuffle: min_by/max_by combine map-side like any min/max") {
    val plan = planOf(SparkEntry.queries("ts_ohlc")(spark, sfDir))
    val shuffles = plan.linesIterator.count(_.contains("Exchange"))
    assert(shuffles == 1, s"expected 1 Exchange, got $shuffles:\n${plan.take(3000)}")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      plan.take(3000))
  }

  test("top terms get WindowGroupLimit pushdown on the slice rank") {
    val plan = planOf(SparkEntry.queries("text_top_terms")(spark, sfDir))
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
  }

  test("sequence packing broadcasts the shard prefixes; no corpus-wide window") {
    val plan = planOf(SparkEntry.queries("pack_sequences")(spark, sfDir))
    assert(plan.contains("BroadcastExchange"), plan.take(3000))
    // the only single-partition exchange feeds the #shards-row prefix scan,
    // never the document stream: that subplan must sit below an aggregate
    // of the shard key, which the full corpus window variant would not have
    assert(plan.contains("SinglePartition"), plan.take(3000))
  }

  test("k-means assignment is a zero-shuffle narrow map (literal-centroid argmin kernel)") {
    val plan = planOf(SparkEntry.queries("vec_kmeans")(spark, sfDir))
    // centroids enter the single-pass ArgminSqDist kernel as literals
    // (metadata-scale by contract — they were broadcast before, i.e.
    // driver-collected anyway), so the assignment is one projection: no
    // candidate-row explosion, no join, no aggregate, no Window
    assert(plan.toLowerCase.contains("argminsqdist"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("partial_min(struct(dist"), plan.take(3000))
  }

  test("pre-bucketed tables join with NO shuffle (co-located join)") {
    // the bucketing story for repeated joins on one key at 100 TB: pay the
    // shuffle once at write time, join shuffle-free forever after
    val docs = Tables(spark, sfDir).documents.select("doc_id", "lang", "n_chars")
    spark.sql("DROP TABLE IF EXISTS g_buck_a")
    spark.sql("DROP TABLE IF EXISTS g_buck_b")
    docs.write.bucketBy(4, "doc_id").sortBy("doc_id").saveAsTable("g_buck_a")
    docs.select("doc_id", "n_chars").write.bucketBy(4, "doc_id").sortBy("doc_id")
      .saveAsTable("g_buck_b")
    // hint the LEFT SIDE before joining so the planner picks sort-merge
    // (a post-join hint is ignored and a broadcast join would legitimately
    // skip the bucketed read entirely)
    val joined = spark.table("g_buck_a").hint("merge")
      .join(spark.table("g_buck_b"), "doc_id")
    val plan = planOf(joined)
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    assert(!plan.contains("Exchange"),
      s"bucketed join should not shuffle:\n${plan.take(3000)}")
  }

  test("global plan lint: no query ever plans a CartesianProduct") {
    // every registered query, planned (not executed) against the smallest
    // fixture: an accidental unkeyed join anywhere in the surface would
    // materialize |L|x|R| rows at scale. (Metadata-scale crossJoin(
    // broadcast(agg)) plans as BroadcastNestedLoopJoin, which is fine and
    // bounded; CartesianProduct is the shuffle-side pair explosion.)
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan = planOf(SparkEntry.queries(name)(spark, sfDir))
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"CartesianProduct in: ${offenders.mkString(", ")}")
  }

  test("signature kernels evaluate once per row: never in scan filters or generators") {
    // regression pin for the round-9 find: a .where(sig.isNotNull) above a
    // signature projection gets pushed into the FileScan, where the kernel
    // re-evaluates per row just for the null check; and CollapseProject
    // could inline a single-reference kernel into an explode lambda, where
    // HOF semantics re-evaluate it once per emitted element. Both shapes
    // double (or band-multiply) the hottest per-row cost in the repo.
    val kernels = Seq("minhashsig", "simhashsigwide")
    var kernelSeen = false
    for (name <- Seq("dedup_minhash", "dedup_simhash", "dedup_clusters")) {
      val plan = planOf(SparkEntry.queries(name)(spark, sfDir))
      for (line <- plan.linesIterator; k <- kernels if line.contains(k)) {
        kernelSeen = true
        assert(!line.contains("FileScan"),
          s"$name: kernel $k inside a scan's pushed filters:\n${line.trim}")
        assert(!line.contains(s"isnotnull($k"),
          s"$name: kernel $k re-evaluated in a null-check filter:\n${line.trim}")
        assert(!line.contains("Generate"),
          s"$name: kernel $k inlined into a generator lambda:\n${line.trim}")
      }
    }
    assert(kernelSeen, "lint never saw a kernel line — pattern names are stale")
  }

  test("prefix-sum operators never run a corpus-scale single-partition window") {
    // the sharded scan's contract: the only unpartitioned window is the
    // metadata-scale shard-prefix pass (one row per shard), so every
    // per-row Window node must carry a partition spec. We assert the
    // row-scale sort before a window is keyed (no global `Sort [.. ASC]`
    // feeding a Window without hash partitioning of the corpus frame):
    // each plan has exactly ONE single-partition exchange, and it sits on
    // the shard-aggregate side (grouped budget plans have one per group
    // scope too — bounded by groups, not rows).
    for (name <- Seq("pack_sequences", "layout_compaction", "sample_token_budget")) {
      val plan = planOf(SparkEntry.queries(name)(spark, sfDir))
      val single = plan.linesIterator.count(_.contains("Exchange SinglePartition"))
      assert(single <= 1, s"$name: $single single-partition exchanges:\n${plan.take(3000)}")
      assert(plan.contains("Window ["), s"$name: expected a window pass")
    }
  }

  test("KS drift walks the CDF sharded: no single-partition exchange at all") {
    // both window passes key on (grp[, shard]); the shard-prefix pass is
    // partitioned by grp — nothing in the plan may collapse the value
    // walk to one task regardless of value cardinality
    val plan = planOf(SparkEntry.queries("profile_ks_drift")(spark, sfDir))
    val single = plan.linesIterator.count(_.contains("Exchange SinglePartition"))
    assert(single == 0, s"profile_ks_drift: $single single-partition exchanges:\n${plan.take(3000)}")
    assert(plan.contains("Window ["), "expected the sharded CDF windows")
  }

  test("epoch shuffle ranks within shards: no single-partition exchange") {
    val plan = planOf(SparkEntry.queries("export_epoch_shuffle")(spark, sfDir))
    val single = plan.linesIterator.count(_.contains("Exchange SinglePartition"))
    assert(single == 0, s"export_epoch_shuffle: $single single-partition exchanges:\n${plan.take(3000)}")
  }

  test("key skew's only unpartitioned window sits on the bounded top-N rows") {
    // ranking happens AFTER the limit — the single-partition exchange is
    // bounded by topN, never by the key cardinality
    val plan = planOf(SparkEntry.queries("profile_key_skew")(spark, sfDir))
    val single = plan.linesIterator.count(_.contains("Exchange SinglePartition"))
    assert(single <= 2, s"profile_key_skew: $single single-partition exchanges:\n${plan.take(3000)}")
    assert(plan.contains("TakeOrdered") || plan.contains("GlobalLimit"),
      "the top-N prune must precede the rank window")
  }

  test("quantile sketch gets WindowGroupLimit pushdown: <= k rows per group per map partition") {
    // the bounded-synopsis property: the rank-k sample filter must prune
    // each map partition BEFORE the window shuffle, exactly like KMV
    val plan = planOf(SparkEntry.queries("sketch_quantile")(spark, sfDir))
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
  }

  test("PQ scoring broadcasts the metadata sides; the code table is never the build input of a shuffle join") {
    // the ADC scale claim: per-query distance tables (|q|·kc rows) and
    // centroid tables broadcast; corpus-scale frames only ever stream
    // through BroadcastHashJoins on the scoring path
    val plan = planOf(SparkEntry.queries("sim_pq_topk")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("bernoulli thinning is map-only: no shuffle, no join") {
    val plan = planOf(SparkEntry.queries("sample_importance")(spark, sfDir))
    assert(!plan.contains("Exchange"), plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("whole-stage codegen covers the relational anchors") {
    val df = SparkEntry.queries("q1_agg")(spark, sfDir)
    df.collect() // AQE finalizes the plan on execution
    val plan = planOf(df)
    // "*(n)" stage markers = operators fused into whole-stage codegen
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"), plan.take(2000))
  }
  test("bloom semi-join: the pre-filter is a scan-side predicate, no early shuffle") {
    val t = Tables(spark, sfDir)
    val big = t.lineitem.select("l_orderkey", "l_linenumber", "l_partkey")
    val small = t.part.where(col("p_size") === 1)
      .select(col("p_partkey").as("l_partkey"))
    val cand = graft.ops.BloomJoin.bloomCandidates(big, small, "l_partkey")
    // the candidate side is pure scan + filter: zero exchanges
    assert(!planOf(cand).contains("Exchange"), planOf(cand).take(3000))
  }

  test("cdc latestState: one shuffle for the per-id window (join broadcasts or reuses)") {
    val base = Tables(spark, sfDir).documents.select("doc_id", "text")
    val log = base.where(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"), lit(1L).as("seq"), lit("U").as("op"))
    val df = graft.ops.Cdc.latestState(base, log)
    df.collect() // let AQE finalize (it may broadcast the latest side)
    val plan = planOf(df)
    // the window must partial-sort inside its own exchange; the full-outer
    // join adds at most its two side exchanges — never a resort of the
    // window output
    val windows = plan.linesIterator.count(_.trim.startsWith("Window"))
    assert(windows <= 1, s"expected a single window pass: ${plan.take(3000)}")
  }

  test("skipgrams partial-aggregates before the pair shuffle") {
    val df = graft.pipeline.TextOps.skipgrams(
      Tables(spark, sfDir).documents, window = 2)
    val plan = planOf(df)
    // partial_count before the exchange, final after: map-side combine
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      plan.take(3000))
    val shuffles = plan.linesIterator.count(_.contains("Exchange"))
    assert(shuffles == 1, s"expected 1 Exchange (pair key), got $shuffles")
  }

  test("winnow fingerprints: one spread exchange, then the scan kernel — no sort, no window") {
    val df = graft.pipeline.TextOps.winnowFingerprints(
      Tables(spark, sfDir).documents)
    val plan = planOf(df)
    // the only exchange is the deliberate id-spread before the kernel;
    // the old gram-explode + rolling-window-MIN shape is gone entirely
    val shuffles = plan.linesIterator.count(_.contains("Exchange"))
    assert(shuffles == 1, s"expected only the spread exchange, got $shuffles: ${plan.take(3000)}")
    assert(!plan.contains("Sort ") && !plan.contains("Window"),
      s"no sort/window belongs in the kernelized winnow: ${plan.take(3000)}")
  }

  test("text CDC chunker: one spread exchange, then the scan kernel — no join, no sort") {
    val df = graft.pipeline.TextCdc.cdcChunks(Tables(spark, sfDir).documents)
    val plan = planOf(df)
    // the only exchange is the deliberate id-spread (small parquet would
    // otherwise serialize the per-char kernel on one core)
    val shuffles = plan.linesIterator.count(_.contains("Exchange"))
    assert(shuffles == 1, s"expected only the spread exchange, got $shuffles: ${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("Sort "), "no sort belongs in the chunker")
  }

  test("k-center round is one scan: map-side distance + TakeOrdered(1), no shuffle join") {
    // reproduce what one kCenters round plans: literal centers, min-dist,
    // argmax via orderBy(...).limit(1)
    val emb = Tables(spark, sfDir).embeddings
    val c = Array.fill(64)(0.1)
    val round = emb
      .select(col("vec_id").cast("long").as("id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("d", lit(1.0) - graft.pipeline.Similarity.cosine(
        col("v"), array(c.map(lit).toSeq: _*)))
      .orderBy(col("d").desc, col("id").asc).limit(1)
    val plan = planOf(round)
    assert(plan.contains("TakeOrderedAndProject"),
      s"argmax must be a TakeOrdered, not a global sort: ${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "the round must not join")
  }

  test("fuzzy join: variant fan-out stays map-side; one hash join on the variant key") {
    val master = Tables(spark, sfDir).customer
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val df = graft.ops.FuzzyJoin.editJoin(master, master, "id", "name", "id", "name")
    df.collect() // finalize AQE
    val plan = planOf(df)
    // explode(sequence) never shuffles; every join is a hash equi-join on
    // the variant key (AQE may plan it broadcast at this SF) — the
    // quadratic shapes must never appear
    val equiJoins = plan.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
        l.contains("ShuffledHashJoin"))
    assert(equiJoins >= 1, s"expected the variant equi-join: ${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join must never go quadratic: ${plan.take(3000)}")
  }

  test("ljungBox is one shuffle: every window and both aggregations share the series key") {
    val plan = planOf(SparkEntry.queries("ts_ljungbox")(spark, sfDir))
    val shuffles = plan.linesIterator.count(_.contains("Exchange"))
    assert(shuffles == 1, s"expected 1 Exchange, got $shuffles:\n${plan.take(3000)}")
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("saxMotifs is three shuffles: resample key, series re-key for the lead window, word census") {
    // (series, bucket) partitioning does not co-locate a series, so the
    // window re-key after the resample is inherent, and the census key is
    // the word — each stage partial-aggregates map-side first
    val plan = planOf(SparkEntry.queries("ts_motifs")(spark, sfDir))
    val shuffles = plan.linesIterator.count(_.contains("Exchange"))
    assert(shuffles == 3, s"expected 3 Exchanges, got $shuffles:\n${plan.take(3000)}")
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("random projection is map-only: the unrolled chain rides the scan in codegen") {
    val plan = planOf(SparkEntry.queries("vec_rp")(spark, sfDir))
    assert(!plan.contains("Exchange"), s"map-only, got:\n${plan.take(3000)}")
    // the "*(n)" stage marker is how executedPlan.toString shows a
    // WholeStageCodegen span
    assert(plan.contains("*(1)"), plan.take(3000))
  }

  test("rpTopK broadcasts the query side everywhere: no cartesian pair scan") {
    val plan = planOf(SparkEntry.queries("sim_rp_topk")(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"query side must broadcast: ${plan.take(3000)}")
  }

  test("sqTopK broadcasts the query side: no cartesian pair scan") {
    val plan = planOf(SparkEntry.queries("sim_sq_topk")(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"query side must broadcast: ${plan.take(3000)}")
  }

  test("survival is one corpus-scale shuffle: the user rollup; the curve is metadata algebra") {
    val events = Tables(spark, sfDir).events
    val plan = planOf(graft.ops.Retention.survival(events))
    // user rollup + lifetime rollup + the single-row pack + the broadcast
    // of max-day: everything after the first exchange is metadata-scale.
    // The load-bearing claim: NO window/sort over the event stream.
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    val winLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.isEmpty, s"no window over events expected:\n$winLines")
  }

  test("cuped is a scan plus reductions: no window, no join back to events") {
    val plan = planOf(SparkEntry.queries("events_cuped")(spark, sfDir))
    assert(!plan.contains("Window"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // the bounds row rides a broadcast, never a shuffle of events to it
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("minhashJoin: band-keyed equi-join only — no cartesian pair scan anywhere") {
    val plan = planOf(SparkEntry.queries("dedup_cross")(spark, sfDir))
    assert(!plan.contains("CartesianProduct"),
      "cross-corpus near-dup join degenerated into an all-pairs scan")
    // the two shingle-set attachments probe with the tiny candidate-id
    // relation first (left_semi), never shuffling full text for non-candidates
    assert(plan.contains("LeftSemi"), plan.take(3000))
  }

  test("silhouette: the k-row codebook broadcasts; vectors shuffle once for the collect") {
    val plan = planOf(SparkEntry.queries("vec_silhouette")(spark, sfDir))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      plan.take(3000))
    assert(!plan.contains("CartesianProduct"),
      "centroid scoring planned as a cartesian instead of a broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "a corpus-scale shuffle join appeared in a broadcast-only pipeline")
  }

  test("dsirResample: model tables broadcast, top-k is a bounded heap, no shuffle join") {
    val plan = planOf(SparkEntry.queries("sample_dsir")(spark, sfDir))
    // ORDER BY + LIMIT plans as per-partition heaps, never a global sort
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    // the bucket-model join and the totals row enter as broadcasts
    assert(plan.contains("BroadcastHashJoin"))
    // no corpus-scale shuffle join anywhere in the weight path
    assert(!plan.contains("SortMergeJoin"),
      "dsir planned a shuffle join for a metadata-scale model table")
  }

  test("pqFreeze shards the corpus-scale codes write; codebooks stay single-file") {
    import graft.pipeline.Similarity
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val (cb, cd) = Similarity.pqTrain(e, m = 2, kc = 2, iters = 1)
    val dir = tmpDir("graft-pq-freeze")
    val n = e.count()
    val (cbF, cdF) = Similarity.pqFreeze(cb, cd, s"planspec-$n", dir)
    def parts(sub: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/$sub"))
        .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    }
    // the codes relation GROWS WITH THE CORPUS (n·m rows): the freeze
    // shard width is DATA-DERIVED (freezeShards: ~2M rows per file,
    // clamped to [1, shuffle.partitions]) so a large corpus keeps the full
    // AQE-proof parallel width while a small freeze stops scattering its
    // rows across near-empty files (each written file costs a local-FS
    // permission fork on the committer path — file count dominated the
    // freeze at fixture scale). Pin the policy: the file count matches the
    // derived width here, and the clamp endpoints hold.
    assert(parts("codes") == Similarity.freezeShards(spark, n * 2),
      s"codes wrote ${parts("codes")} part file(s) — expected the " +
        s"freezeShards(${n * 2}) width")
    assert(Similarity.freezeShards(spark, 10L) == 1)
    assert(Similarity.freezeShards(spark, 1L << 40) ==
      spark.conf.get("spark.sql.shuffle.partitions").toInt,
      "a corpus-scale freeze must keep the full pinned parallel width")
    assert(parts("codebooks") == 1,
      s"codebooks wrote ${parts("codebooks")} part files — model-scale relation should be one file")
    // read-back completeness: the frozen frames cover the whole model
    assert(cdF.count() == n * 2, "frozen codes must hold n*m rows")
    assert(cbF.count() == 2 * 2, "frozen codebooks must hold m*kc rows")
    assert(cdF.columns.sorted.toSeq == Seq("cluster", "subspace", "vec_id"))
  }

  test("ivfPqFreeze cell-partitions the codes; serving prunes to probed " +
    "cell directories") {
    import graft.pipeline.Similarity
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val (cells, cb, cd) = Similarity.ivfPqTrain(e, m = 2, kc = 2, iters = 1)
    val dir = tmpDir("graft-ivfpq-freeze")
    val n = e.count()
    val (ceF, cdbF, cdsF) = Similarity.ivfPqFreeze(cells, cb, cd,
      s"planspec-$n", dir)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    def parts(sub: String): Seq[java.io.File] =
      walk(new java.io.File(s"$dir/$sub"))
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    // corpus-scale codes: partitioned by (model_id, cell) — one directory
    // per cell so the serving probe prunes at the directory level — and
    // sharded (no single-task funnel) across the whole relation
    val nCells = e.select("label").distinct().count()
    val codeCellDirs = parts("codes").map(_.getParentFile.getName)
      .filter(_.startsWith("cell=")).distinct
    assert(codeCellDirs.size == nCells,
      s"codes must lay out one cell= directory per corpus cell, got $codeCellDirs")
    assert(parts("codes").size > 1,
      s"codes wrote ${parts("codes").size} part file(s) — corpus-scale write funneled through one task")
    assert(parts("codebooks").size == 1, "codebooks should be one file")
    assert(parts("cells").size == 1, "cells are model-scale — one file")
    assert(cdsF.count() == n * 2, "frozen codes must hold n*m rows")
    assert(ceF.count() == nCells,
      "frozen cells must hold one centroid per corpus cell")
    assert(cdbF.count() == 2 * 2, "frozen codebooks must hold m*kc rows")
    // SERVE-TIME PARTITION PRUNING: one query at nprobe=2 must read only
    // its 2 probed cells' code directories — the static probed-cell IN
    // filter lands in the scan's PartitionFilters, so unprobed cells are
    // never read (the 100 TB nprobe/#cells saving as directory pruning,
    // not a post-scan filter)
    assert(nCells > 2, s"fixture needs >2 cells for a pruning test, got $nCells")
    val serve = Similarity.ivfPqAdcTopKFrozen(
      e.where(col("vec_id") === 0), ceF, cdbF, cdsF, topK = 3, nprobe = 2)
    // the codes scan's SELECTED partition listing (post partition-filter
    // pruning, the thing the executor actually reads) must hold exactly
    // the nprobe probed cell directories — .inputFiles is pre-pushdown
    // and would show all of them
    val codesScans = serve.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("codes")) => s
    }
    assert(codesScans.nonEmpty, "serve plan must scan the frozen codes files")
    val scan = codesScans.head
    assert(scan.selectedPartitions.partitionCount == 2,
      s"codes scan selected ${scan.selectedPartitions.partitionCount} cell " +
        "partitions — expected exactly nprobe=2 (directory pruning)")
    val scanStr = scan.toString
    assert(scanStr.contains("PartitionFilters") && scanStr.contains("cell"),
      "probed-cell restriction must reach the codes scan as a partition filter")
  }
}
