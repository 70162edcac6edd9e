package graft

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.pipeline.{Dedup, TextOps}

/** Dev smoke driver: exercises the hash/dedup/text operators end-to-end
  * on the sf0.001 testdata through a real local SparkSession.
  * Run: `sbt "runMain graft.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-smoke", cores = 4)
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val t = Tables(spark, sf)
    val docs = t.documents

    val fp = docs.select(col("doc_id"),
      TextOps.fingerprint(col("text")).as("fp"))
    println(s"fingerprint rows=${fp.count()}")
    fp.show(3, truncate = false)

    val exact = Dedup.exact(docs)
    println(s"exact-dup groups>1: ${exact.where(col("group_size") > 1).count()}")

    val near = Dedup.minhashNearDups(docs)
    println(s"minhash near-dup pairs: ${near.count()}")
    near.show(5, truncate = false)

    val quality = TextOps.qualityScore(docs)
    quality.select("doc_id", "n_tokens", "quality_score").show(3)

    val lang = TextOps.languageId(docs)
    lang.groupBy("lang_pred").count().show()

    val sims = Dedup.simhashNearDups(docs)
    println(s"simhash near-dup pairs: ${sims.count()}")

    val emb = t.embeddings
    val knn = graft.pipeline.Similarity.bruteForceTopK(emb.limit(3), emb, k = 2)
    knn.show(6, truncate = false)

    // round-5 surface: clusters, splits, tf-idf, sessions, salted join
    val clusters = graft.pipeline.Components.dedupClusters(docs)
    println(s"dedup clusters: docs=${clusters.count()} " +
      s"canonical=${clusters.where(col("is_canonical")).count()}")
    graft.pipeline.Sampling.assignSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().show()
    TextOps.tfIdfTopK(docs, k = 3).show(6, truncate = false)
    val sess = graft.ops.Sessionize.sessions(t.eventsUs, gapNs = 1800000000000L)
    println(s"sessions: ${sess.count()}")
    val dim = t.eventsUs.groupBy("user_id").agg(count(lit(1)).as("n"))
    println("salted join rows: " + graft.ops.SkewJoin.saltedJoin(
      t.eventsUs.select("event_id", "user_id"), dim, "user_id",
      salts = 4, tieBreak = "event_id").count())

    // SQL surface: custom kernels callable from spark.sql
    graft.core.GraftFunctions.registerAll(spark)
    docs.limit(5).createOrReplaceTempView("smoke_docs")
    spark.sql(
      """SELECT doc_id, poly_hash(text, 0) AS ph, simhash_sig(text, 3, 30) AS sh
        |FROM smoke_docs""".stripMargin).show(truncate = false)

    // DataSource V2 generator with ts pushdown
    val synth = spark.read.format("graft-synthetic")
      .option("ids", "heartbeat://cb/ping,mock1://a/2.5")
      .option("startNs", 0L).option("endNs", 3600L * 1000000000L)
      .load()
      .where(col("ts") >= 60L * 1000000000L && col("ts") < 120L * 1000000000L)
    println(s"synthetic v2 rows in pushed window: ${synth.count()}")

    // dashboard current values with threshold color bands
    val bands = graft.ts.SeriesOps.thresholdBands(
      graft.ts.SeriesOps.lastValue(t.points.select("series_id", "ts", "value")),
      "last_value", Seq(100.0 -> "red", 50.0 -> "yellow"), "green")
    bands.groupBy("band").count().show()

    // real multimodal codec: build P6 blobs, decode, aggregate pixel stats
    val feats = graft.pipeline.Multimodal.extractFeatures(
      graft.pipeline.Multimodal.synthMediaTable(docs.limit(50)))
    feats.agg(sum("pixel_sum").as("pixels"), max("width").as("max_w")).show()

    // recursive streaming EWMA (flatMapGroupsWithState also runs on a
    // static Dataset — same code path, batch-evaluated)
    {
      import spark.implicits._
      val sPts = t.points.select("series_id", "ts", "value")
        .as[graft.streaming.StreamOps.PointIn]
      println(s"streaming-ewma rows (static run): " +
        graft.streaming.StreamOps.ewmaStream(sPts).count())
    }

    // perceptual image hash + image-level near-dups over the same codec
    val phd = graft.pipeline.Multimodal.phashNearDups(
      graft.pipeline.Multimodal.synthMediaTable(docs))
    println(s"phash near-dup image pairs: ${phd.count()}")

    // V2 paginated station fetch + metadata find with real module lifetime
    val cat = graft.sources.Netatmo.catalog(graft.sources.Netatmo.rawConfig(t.eventsUs))
    val src = new graft.sources.NetatmoSource(cat,
      t.eventsUs.select("user_id", "event_type", "ts", "value"),
      s"$sf/events.parquet", blockSize = 64)
    val anyId = cat.limit(1).collect()(0).getAs[String]("source_id")
    println(s"netatmo read rows: ${src.read(spark, Seq(anyId),
      graft.ts.model.Period(Long.MinValue / 2, Long.MaxValue / 2)).count()}")
    src.find(spark, anyId).foreach(i =>
      println(s"find: ${i.name} dt=${i.deltaTNs} period=[${i.dataPeriodStartNs},${i.dataPeriodEndNs}]"))

    // late round-5 surface: packing, clustering, weighted draw, retention,
    // divergence, JSON extraction, anomaly screen
    val packed = graft.pipeline.Packing.packSequences(docs, 512, shardWidth = 100)
    println(s"packed spans: ${packed.count()} chunks: " +
      packed.agg(coalesce(max("chunk_id") + 1, lit(0L))).collect()(0).getLong(0))
    val km = graft.pipeline.Similarity.kmeans(t.embeddings, k = 4, iters = 2)
    km.groupBy("cluster").count().orderBy("cluster").show()
    println(s"weighted sample: ${graft.pipeline.Sampling.weightedSample(
      docs.select(col("doc_id"), col("n_chars")), "doc_id", "n_chars", 20).count()} rows")
    println(s"retention cells: ${graft.ops.Retention.retention(t.eventsUs).count()}")
    graft.pipeline.TextOps.unigramDivergence(docs, col("lang") === "en").show()
    graft.pipeline.SemiStructured.extractJson(
      t.events.select("event_type", "props"), "props", "k INT")
      .groupBy("event_type").agg(avg("k").as("avg_k")).show()
    println(s"anomalies: ${graft.ts.SeriesOps.anomaly(
      t.points.select("series_id", "ts", "value")).where(col("is_anomaly")).count()}")

    // continuation batch: gopher screen, temperature mix, containment,
    // ewma/changepoint, interval join
    TextOps.gopherRules(docs).groupBy("pass_gopher").count().show()
    graft.pipeline.Sampling.temperatureSample(docs, "doc_id", "lang", targetN = 50)
      .groupBy("lang").count().orderBy("lang").show()
    println(s"containment pairs: ${Dedup.containmentDups(docs).count()}")
    val p3 = t.points.select("series_id", "ts", "value")
    println(s"ewma rows: ${graft.ts.SeriesOps.ewma(p3).count()} " +
      s"changepoints: ${graft.ts.SeriesOps.changepoint(p3).count()}")
    graft.ts.SeriesOps.autocorr(p3, maxLag = 2).groupBy("lag")
      .agg(avg("acf").as("mean_acf")).orderBy("lag").show()
    println(s"keepers: ${graft.pipeline.Components.dedupKeepers(docs)
      .where(col("is_keeper")).count()}")
    TextOps.fertility(docs).orderBy("lang").show()
    graft.pipeline.Similarity.dimStats(t.embeddings)
      .agg(min("std").as("min_std"), max("std").as("max_std")).show()
    println(s"ohlc candles: ${graft.ts.SeriesOps.ohlc(p3, 86400L * 1000000000L).count()} " +
      s"winsorized clips: ${graft.ts.SeriesOps.winsorize(p3)
        .where(col("is_clipped")).count()}")
    graft.pipeline.TextOps.unigramLogprob(docs)
      .agg(min("cross_entropy").as("min_ce"), max("cross_entropy").as("max_ce")).show()
    graft.pipeline.TextOps.topTerms(docs, k = 3).orderBy("lang", "rank").show(9)
    println("interval joins: " + graft.ops.IntervalJoin.intervalJoin(
      t.eventsUs.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts")),
      t.eventsUs.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts")),
      "user_id", "click_ts", "purchase_ts", 3600L * 1000000000L).count())

    // round-9 surface: HLL sketch (batch + streaming batch face),
    // DST-aware monthly rollup, wide image hash
    graft.pipeline.Sketches.hllDistinct(t.events, p = 10,
      Seq("event_type"), "user_id").orderBy("event_type").show()
    println(s"stream-hll rows (static run): ${graft.streaming.StreamOps
      .hllStream(t.events, 10, "event_type", "user_id").count()}")
    println(s"monthlyTz buckets: ${graft.ts.SeriesOps.monthlyTz(p3).count()}")
    println(s"wide phash rows: ${graft.pipeline.Multimodal.perceptualHashWide(
      graft.pipeline.Multimodal.synthMediaTable(docs.limit(50))).count()}")

    // late round-9 surface: leakage-safe split, bloom decontamination,
    // count-min heavy hitters
    graft.pipeline.Sampling.leakageSafeSplit(docs,
      clusters.select("doc_id", "cluster_id"), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().show()
    val benchSlice = graft.pipeline.Sampling.assignSplit(docs, "doc_id",
      Seq("train" -> 0.9, "test" -> 0.1)).where(col("split") === "test")
    println(s"bloom-contaminated docs: ${TextOps.bloomDecontaminate(docs,
      benchSlice, n = 5).where(col("contaminated")).count()}")
    graft.pipeline.Sketches.cmsTopK(
      docs.select(explode(TextOps.tokens(col("text"))).as("term")), "term", 5)
      .orderBy(col("true_count").desc, col("value")).show()
    // hybrid retrieval + robust trend
    locally {
      import org.apache.spark.sql.expressions.Window
      val lex = TextOps.bm25(docs, "table scan sort key", k = 10)
        .withColumn("rank", org.apache.spark.sql.functions.row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc)))
      val vec = graft.pipeline.Similarity.bruteForceTopK(
        emb.where(col("vec_id") === 0), emb, k = 10)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      graft.pipeline.Similarity.rrfFuse(lex, vec, "doc_id").show(5)
    }
    println(s"theil-sen series: ${graft.ts.SeriesOps.theilSen(p3).count()}")
    println(s"z-order cells: ${graft.ops.Layout.clusterByZ(
      t.eventsUs.select(col("event_id"), col("user_id"),
        expr("ts DIV 86400000000000").as("day")),
      "user_id", "day", bits = 16, numPartitions = 4).count()}")
    println(s"stream-cms cells (static run): ${graft.streaming.StreamOps
      .cmsStream(docs.select(explode(TextOps.tokens(col("text"))).as("term")),
        "term").count()}")
    graft.pipeline.Sketches.hllPairOverlap(t.events, 10, "event_type", "user_id")
      .orderBy("grp_a", "grp_b").show(3)
    println(s"label outliers: ${graft.pipeline.Similarity.labelOutliers(emb)
      .where(col("is_outlier")).count()}")

    // round-13 surface: web curation over a synthesized URL column
    val webDocs = docs.withColumn("url",
      concat(lit("HTTPS://WWW."), col("source"), lit("-"),
        (col("doc_id") % 17).cast("string"), lit(".com:443/a/"),
        col("doc_id").cast("string"), lit("/?utm_source=rss&x=1")))
    webDocs.select(col("doc_id"),
      graft.pipeline.WebOps.canonicalizeUrl(col("url")).as("canonical_url"),
      graft.pipeline.WebOps.urlDomain(col("url")).as("domain"))
      .show(3, truncate = false)
    println(s"domain stats rows: ${graft.pipeline.WebOps
      .domainStats(webDocs).count()}")
    println(s"domain budget kept: ${graft.pipeline.WebOps
      .domainBudgetCap(webDocs, 60).count()}")

    // round-14 surface: post-training data prep over synthesized turns
    val turns = docs.select(col("doc_id").as("conv_id"),
        posexplode(split(col("text"), " ")).as(Seq("turn_no", "content")))
      .where(col("turn_no") < 4)
      .withColumn("role", when(col("turn_no") % 2 === 0, lit("user"))
        .otherwise(lit("assistant")))
    println(s"sft valid conversations: ${graft.pipeline.ChatOps
      .turnStats(turns).where(col("valid")).count()}")
    println(s"sft rendered: ${graft.pipeline.ChatOps
      .renderChat(turns).count()}")

    spark.stop()
  }
}
