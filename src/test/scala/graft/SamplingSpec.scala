package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Sampling, TextOps}

/** Deterministic sampling/splitting semantics: total coverage, approximate
  * proportions, invariance to physical layout (the property df.sample does
  * NOT have), and salt namespacing. Plus a from-scratch TF-IDF check.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = spark.range(10000).toDF("id")

  test("split covers every row with exactly one known label") {
    val s = Sampling.assignSplit(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 10000L)
    // PolyHash buckets are uniform: 10k draws keep each stratum within ~15%
    // of its expectation (deterministic, so no flake — this pins the values)
    assert(math.abs(counts("train") - 8000L) < 300, counts.toString)
    assert(math.abs(counts("val") - 1000L) < 150, counts.toString)
    assert(math.abs(counts("test") - 1000L) < 150, counts.toString)
  }

  test("weights are normalized and degenerate weights are rejected") {
    val s = Sampling.assignSplit(ids, "id", Seq("a" -> 3.0, "b" -> 1.0))
    val counts = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("a") - 7500L) < 300, counts.toString)
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(ids, "id", Seq("a" -> 0.0, "b" -> 1.0))
    }
  }

  test("sample is invariant to partition layout and sized correctly") {
    val a = Sampling.deterministicSample(ids, "id", 0.2).as[Long].collect().toSet
    val b = Sampling.deterministicSample(ids.repartition(7), "id", 0.2)
      .as[Long].collect().toSet
    assert(a == b)
    assert(math.abs(a.size - 2000) < 200, a.size.toString)
  }

  test("different salts draw different subsets; same salt is stable") {
    val a = Sampling.deterministicSample(ids, "id", 0.5, "s1").as[Long].collect().toSet
    val b = Sampling.deterministicSample(ids, "id", 0.5, "s2").as[Long].collect().toSet
    val a2 = Sampling.deterministicSample(ids, "id", 0.5, "s1").as[Long].collect().toSet
    assert(a == a2)
    assert(a != b)
    // independent draws overlap on ~25% of the universe, not ~50%
    assert(math.abs((a intersect b).size - 2500) < 400)
  }

  test("fraction bounds: 0 keeps nothing, 1 keeps everything") {
    assert(Sampling.deterministicSample(ids, "id", 0.0).count() == 0L)
    assert(Sampling.deterministicSample(ids, "id", 1.0).count() == 10000L)
  }

  test("leakageSafeSplit: cluster members share a split, singletons fall back") {
    // docs 1..6; clusters: {1,2,3} under cluster_id 1, {5,6} under 5;
    // doc 4 is a singleton (absent from the cluster relation)
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster_id")
    val s = Sampling.leakageSafeSplit(docs, clusters, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split_key", "split").as[(Long, Long, String)]
      .collect().toSeq.sortBy(_._1)
    val byDoc = s.map(r => r._1 -> r._3).toMap
    assert(byDoc(1L) == byDoc(2L) && byDoc(2L) == byDoc(3L),
      s"cluster {1,2,3} split apart: $s")
    assert(byDoc(5L) == byDoc(6L), s"cluster {5,6} split apart: $s")
    // the split label is a pure function of the split KEY through the same
    // bucket map assignSplit uses — pin it against assignSplit on the keys
    val keyed = s.map(r => r._2 -> r._3).distinct.toDF("id", "want")
    val direct = Sampling.assignSplit(keyed, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(direct.where(col("split") =!= col("want")).count() == 0L)
    // singleton fallback: doc 4's key is its own id
    assert(s.find(_._1 == 4L).get._2 == 4L)
  }

  test("leakageSafeSplit holds proportions on a large corpus with few dups") {
    val docs = spark.range(10000).toDF("doc_id")
    // 200 clusters of 3 consecutive docs each (600 docs clustered, 6%)
    val clusters = spark.range(200).selectExpr("id * 50 AS base")
      .selectExpr("explode(array(base, base + 1, base + 2)) AS doc_id",
        "base AS cluster_id")
    val counts = Sampling.leakageSafeSplit(docs, clusters, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000L)
    assert(math.abs(counts("train") - 8000L) < 350, counts.toString)
  }

  test("stratifiedSample: exact quotas even from wildly skewed strata") {
    // 9000 'en', 90 'de', 3 'fr' — quotas must be exact (or the whole
    // stratum when it is smaller than the quota)
    val df = spark.range(9093).toDF("id").withColumn("g",
      when(col("id") < 9000, "en").when(col("id") < 9090, "de").otherwise("fr"))
    val counts = Sampling.stratifiedSample(df, "id", "g", 50)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts == Map("en" -> 50L, "de" -> 50L, "fr" -> 3L), counts.toString)
  }

  test("stratifiedSample is layout-invariant and salt-keyed") {
    val df = spark.range(1000).toDF("id")
      .withColumn("g", (col("id") % 4).cast("string"))
    def draw(d: org.apache.spark.sql.DataFrame, salt: String) =
      Sampling.stratifiedSample(d, "id", "g", 25, salt)
        .select("id").as[Long].collect().toSet
    val a = draw(df, "strat")
    assert(a == draw(df.repartition(13), "strat"), "repartition changed the draw")
    val b = draw(df, "other-salt")
    assert(a != b, "different salts must draw different rows")
    assert(a.size == 100 && b.size == 100)
  }

  test("tfIdfTopK matches a from-scratch reference on a handmade corpus") {
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana cherry cherry date"),
      (3L, "apple date egg egg egg"),
      (4L, "")).toDF("doc_id", "text")
    val got = TextOps.tfIdfTopK(docs, k = 2)
      .as[(Long, String, Long, Int, Double)].collect().sortBy(r => (r._1, r._4))

    // reference: raw tf, idf = ln((N+1)/(df+1)) + 1, rank (tfidf desc, term asc)
    val toks = Map(
      1L -> Seq("apple", "banana", "apple", "cherry"),
      2L -> Seq("banana", "cherry", "cherry", "date"),
      3L -> Seq("apple", "date", "egg", "egg", "egg"))
    val n = 4.0 // the empty doc still counts toward N
    val dfreq = toks.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size).toMap
    val expect = toks.toSeq.flatMap { case (id, ts) =>
      val tf = ts.groupBy(identity).view.mapValues(_.size.toLong).toMap
      tf.toSeq.map { case (t, f) =>
        (id, t, f, f * (math.log((n + 1) / (dfreq(t) + 1)) + 1)) }
        .sortBy { case (_, t, _, s) => (-s, t) }
        .take(2).zipWithIndex
        .map { case ((i, t, f, s), r) => (i, t, f, r + 1, s) }
    }.sortBy(r => (r._1, r._4))

    assert(got.map(r => (r._1, r._2, r._3, r._4)).toSeq ==
      expect.map(r => (r._1, r._2, r._3, r._4)))
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._5 - e._5) < 1e-12, s"$g vs $e") }
  }

  test("weightedSample: exact-n, layout-invariant, matches driver-side ES keys") {
    import graft.functions.PolyHash
    val rows = (1L to 500L).map(i => (i, i % 7 + 1)) // weights 1..7
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", n = 40)
      .as[(Long, Long)].collect().toSet
    assert(got.size == 40)
    // from-scratch Efraimidis–Spirakis with the same salt-keyed uniforms
    val mult = Sampling.saltMult("wsample")
    val add = Sampling.saltAdd("wsample")
    val expect = rows.map { case (id, w) =>
      val h = (PolyHash.hash(id.toString, 0L) * mult + add) % PolyHash.Mod
      val u = (h.toDouble + 0.5) / PolyHash.Mod
      (id, w, -math.log(u) / w)
    }.sortBy { case (id, _, k) => (k, id) }.take(40)
      .map { case (id, w, _) => (id, w) }.toSet
    assert(got == expect)
    assert(Sampling.weightedSample(df.repartition(11), "id", "w", n = 40)
      .as[(Long, Long)].collect().toSet == got)
  }

  test("temperatureSample: exact sqrt-proportional quotas rebalance a skewed corpus") {
    // 900 vs 100 rows, targetN 100: weights sqrt(900)=30 / sqrt(100)=10,
    // quotas round(100·30/40)=75 and round(100·10/40)=25 — the tail source
    // gets 2.5x its proportional share (10), exactly
    val df = ((1L to 900L).map(i => (i, "big")) ++ (1001L to 1100L).map(i => (i, "small")))
      .toDF("id", "src")
    val got = Sampling.temperatureSample(df, "id", "src", targetN = 100)
    val counts = got.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(counts == Map("big" -> 75L, "small" -> 25L), counts.toString)
    // deterministic + layout-invariant
    val a = got.select("id").as[Long].collect().toSet
    val b = Sampling.temperatureSample(df.repartition(13), "id", "src", targetN = 100)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    // a quota above a source's population caps at the population
    val tiny = ((1L to 400L).map(i => (i, "big")) ++ Seq((9001L, "rare"), (9002L, "rare")))
      .toDF("id", "src")
    val capped = Sampling.temperatureSample(tiny, "id", "src", targetN = 300)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(capped("rare") == 2L, capped.toString)
    // sqrt(400)=20, sqrt(2)≈1.414: round(300·20/21.414…)=280, capped at... 280 < 400
    assert(capped("big") == math.round(300.0 * 20.0 / (20.0 + math.sqrt(2.0))), capped.toString)
    intercept[IllegalArgumentException] {
      Sampling.temperatureSample(df, "id", "src", targetN = 0)
    }
  }

  test("weightedSample: weight actually biases inclusion; bad weights excluded") {
    // two weight classes 1 vs 10 — heavy rows must dominate the sample
    val rows = (1L to 400L).map(i => (i, if (i <= 200) 1L else 10L))
    val got = Sampling.weightedSample(rows.toDF("id", "w"), "id", "w", n = 100)
      .as[(Long, Long)].collect()
    val heavy = got.count(_._2 == 10L)
    assert(heavy > 70, s"heavy-weight rows under-sampled: $heavy/100")
    // null / zero / negative / NaN weights can never be drawn — NaN would
    // pass a bare `w > 0` because Spark orders NaN above every number
    val bad = Seq((1L, Some(5.0)), (2L, None), (3L, Some(0.0)),
      (4L, Some(-2.0)), (5L, Some(Double.NaN))).toDF("id", "w")
    assert(Sampling.weightedSample(bad, "id", "w", n = 10)
      .as[(Long, Option[Double])].collect().toSeq == Seq((1L, Some(5.0))))
  }

  test("bernoulliByProb: keep rate tracks the probability; clamps and NaN/null drop") {
    val rows = (1L to 4000L).map(i => (i, if (i % 2 == 0) 0.8 else 0.2))
    val got = Sampling.bernoulliByProb(rows.toDF("id", "p"), "id", col("p"))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("u"),
        r.getAs[Double]("accept_prob"), r.getAs[Boolean]("is_kept")))
    assert(got.length == 4000, "every row emitted, kept or not")
    // the draw is independent of p: keep rate per class ~ its probability
    // (±4σ, σ = √(p(1−p)/2000) ≈ 0.009)
    val hi = got.filter(_._1 % 2 == 0)
    val lo = got.filter(_._1 % 2 != 0)
    assert(math.abs(hi.count(_._4).toDouble / 2000 - 0.8) < 0.04)
    assert(math.abs(lo.count(_._4).toDouble / 2000 - 0.2) < 0.04)
    // decision consistency + draw in (0,1)
    got.foreach { case (_, u, p, kept) =>
      assert(u > 0 && u < 1 && kept == (u < p)) }
    // layout invariance: same decisions from a shuffled frame
    val shuffled = Sampling.bernoulliByProb(
      rows.reverse.toDF("id", "p").repartition(13), "id", col("p"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("is_kept")).toMap
    got.foreach { case (id, _, _, kept) => assert(shuffled(id) == kept) }
    // clamp above 1 keeps surely, below 0 never; NaN and null keep nothing
    val edge = Seq((1L, Some(7.0)), (2L, Some(-3.0)), (3L, Some(Double.NaN)),
      (4L, Option.empty[Double])).toDF("id", "p")
    val e = Sampling.bernoulliByProb(edge, "id", col("p")).collect()
      .map(r => r.getAs[Long]("id") ->
        ((Option(r.getAs[java.lang.Double]("accept_prob")),
          r.getAs[Boolean]("is_kept")))).toMap
    assert(e(1L) == ((Some(1.0), true)))
    assert(e(2L) == ((Some(0.0), false)))
    assert(e(3L)._1.isEmpty && !e(3L)._2, "NaN must not clamp to 1 and keep")
    assert(e(4L)._1.isEmpty && !e(4L)._2)
  }

  test("soft dedup composition: p = 1 keeps every row (u is strictly below 1)") {
    import spark.implicits._
    // the sample_soft_dedup gate gives singletons accept_prob 1; the CW
    // draw u = (h + 0.5)/Mod is strictly < 1, so every singleton survives
    val d = (1L to 200L).map(i => (i, 1L)).toDF("doc_id", "cluster_size")
    val got = graft.pipeline.Sampling.bernoulliByProb(d, "doc_id",
      org.apache.spark.sql.functions.lit(1.0) /
        org.apache.spark.sql.functions.col("cluster_size").cast("double"),
      salt = "softdedup")
    assert(got.where(!org.apache.spark.sql.functions.col("is_kept")).count() == 0)
    assert(got.where(org.apache.spark.sql.functions.col("u") >= 1.0).count() == 0)
  }

  // ---- DSIR importance resampling ----

  private def dsirCorpus = {
    val tgtText = "alpha beta gamma delta alpha beta gamma epsilon alpha beta"
    val offText = "omega sigma tau upsilon omega sigma tau phi omega sigma"
    val target = (1L to 20L).map(i => (i, tgtText, true))
    // candidates: even ids speak the target vocabulary, odd ids don't
    val cand = (100L to 139L).map { i =>
      (i, if (i % 2 == 0) tgtText else offText, false)
    }
    (target ++ cand).toDF("doc_id", "text", "is_tgt")
  }

  test("dsirResample: target-vocabulary docs outscore off-vocabulary docs") {
    val sel = Sampling.dsirResample(dsirCorpus, col("is_tgt"), k = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val tgtLike = (100L to 139L).filter(_ % 2 == 0).map(sel)
    val offLike = (100L to 139L).filter(_ % 2 == 1).map(sel)
    assert(tgtLike.min > offLike.max,
      s"target-like logw ${tgtLike.min} should beat off-vocab ${offLike.max}")
  }

  test("dsirResample: layout-invariant, exact-k, empty docs absent") {
    val base = dsirCorpus
    val a = Sampling.dsirResample(base, col("is_tgt"), k = 10)
      .collect().map(_.toSeq).toSet
    val b = Sampling.dsirResample(base.repartition(13), col("is_tgt"), k = 10)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.size == 10)
    val withEmpty = base.union(Seq((999L, "", false)).toDF("doc_id", "text", "is_tgt"))
    val all = Sampling.dsirResample(withEmpty, col("is_tgt"), k = 1000)
    assert(all.count() == 60)
    assert(all.where(col("doc_id") === 999L).count() == 0)
  }

  test("dsirResample: logw matches an exact driver-side replay") {
    import graft.functions.PolyHash
    val df = Seq(
      (1L, "alpha beta alpha", true),
      (2L, "alpha beta gamma", false),
      (3L, "omega sigma omega sigma", false)).toDF("doc_id", "text", "is_tgt")
    val got = Sampling.dsirResample(df, col("is_tgt"), k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val dims = 2048
    def grams(text: String): Seq[String] = {
      val tk = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      tk ++ tk.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    val docs = Seq((1L, "alpha beta alpha", true),
      (2L, "alpha beta gamma", false), (3L, "omega sigma omega sigma", false))
    val dc: Map[(Long, Long), Long] = docs.flatMap { case (id, t, _) =>
      grams(t).map(g => (id, PolyHash.hash(g, 0L) % dims))
    }.groupBy(identity).map { case (k2, v) => k2 -> v.size.toLong }
    val tgtIds = docs.filter(_._3).map(_._1).toSet
    val tb = dc.collect { case ((id, b), c) if tgtIds(id) => (b, c) }
      .groupBy(_._1).map { case (b, v) => b -> v.map(_._2).sum }
    val qb = dc.groupBy(_._1._2).map { case (b, v) => b -> v.values.sum }
    val tn = tb.values.sum; val qn = qb.values.sum
    def lnr(b: Long): Double =
      StrictMath.log((tb.getOrElse(b, 0L) + 1).toDouble) -
        StrictMath.log((tn + dims).toDouble) -
        StrictMath.log((qb(b) + 1).toDouble) + StrictMath.log((qn + dims).toDouble)
    docs.foreach { case (id, _, _) =>
      val mine = dc.collect { case ((d, b), c) if d == id => (b, c) }.toSeq.sortBy(_._1)
      val logw = mine.foldLeft(0.0) { case (a, (b, c)) => a + c.toDouble * lnr(b) }
      val n = mine.map(_._2).sum
      assert(got(id)._1 == n)
      assert(got(id)._2 == logw, s"doc $id: got ${got(id)._2}, replay $logw")
    }
  }
}
