package graft

import org.apache.spark.sql.functions._

import graft.ops.Sessionize
import graft.pipeline.{Export, Profile, Similarity, TextOps}

/** Semantics of the round-5 pipeline operators: sessionization boundaries,
  * chunk geometry, posting-list capping, repetition features, PII
  * scrubbing, and int8 quantization round-trip error.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("JSONL export round-trips hostile strings; malformed reads fail loudly") {
    import graft.pipeline.Export
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-spec").toString
    val hostile = Seq(
      (1L, "plain words", "en"),
      (2L, "quotes \" and \\ backslash and {\"json\": [1,2]}", "en"),
      (3L, "newline\nand\ttab and unicode é中😀", "zh"),
      (4L, "", "de"))
    Export.writeJsonl(hostile.toDF("doc_id", "text", "lang"), dir, shards = 3)
    val back = Export.readJsonl(spark, dir, "doc_id BIGINT, text STRING, lang STRING")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(back.toSeq == hostile, "round trip must be byte-lossless")
    // empty shards write no file: at most `shards` parts, at least one
    val parts = new java.io.File(dir).listFiles().count(_.getName.endsWith(".json"))
    assert(parts >= 1 && parts <= 3, s"got $parts part files")
    // FAILFAST: a corrupt line is an error, not a silent null row
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir, "part-corrupt.json"), "{not valid json\n")
    intercept[org.apache.spark.SparkException] {
      Export.readJsonl(spark, dir, "doc_id BIGINT, text STRING, lang STRING").collect()
    }
  }

  test("hashedFeatures: buckets match driver-side PolyHash; sparse order ascending") {
    import graft.functions.PolyHash
    import graft.pipeline.TextOps
    val df = Seq((1L, "alpha beta alpha"), (2L, "")).toDF("doc_id", "text")
    val got = TextOps.hashedFeatures(df, dims = 16).collect()
    assert(got.length == 1, "the token-less doc has nothing to hash")
    val r = got(0)
    val expect = Seq("alpha", "beta", "alpha")
      .groupBy(t => PolyHash.hash(t, 0L) % 16).view.mapValues(_.size)
      .toSeq.sortBy(_._1)
    assert(r.getAs[String]("indices") == expect.map(_._1).mkString(","))
    assert(r.getAs[String]("counts") == expect.map(_._2).mkString(","))
  }

  test("typeLift: exact counts and independence-normalized lift") {
    // u1{A,B}, u2{A,B}, u3{A}, u4{C}: lift(A,B) = 2·4/(3·2); C pairs absent
    val events = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (2L, "B"),
      (3L, "A"), (4L, "C")).toDF("user_id", "event_type")
    val got = graft.ops.Cooccurrence.typeLift(events).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[String]("type_a") == "A" && r.getAs[String]("type_b") == "B")
    assert(r.getAs[Long]("n_users_both") == 2L)
    assert(r.getAs[Double]("lift") == 2.0 * 4 / (3 * 2))
  }

  test("churn: absent-next-window users counted; final window excluded; full-retention zero") {
    val w = 1000L
    // w0: users 1,2,3; w1: users 2,3,4; w2: user 4 (last window excluded)
    val events = Seq((1L, 10L), (2L, 20L), (3L, 30L),
      (2L, w + 1L), (3L, w + 2L), (4L, w + 3L), (4L, 2 * w + 1L))
      .toDF("user_id", "ts")
    val got = graft.ops.Retention.churn(events, w).collect()
      .map(r => r.getAs[Long]("window_start") ->
        ((r.getAs[Long]("n_active"), r.getAs[Long]("n_churned"),
          r.getAs[Double]("churn_rate")))).toMap
    assert(got.keySet == Set(0L, w), s"final window must be excluded: $got")
    assert(got(0L) == ((3L, 1L, 1.0 / 3.0)), s"${got(0L)}")      // user 1 left
    assert(got(w) == ((3L, 2L, 2.0 / 3.0)), s"${got(w)}")        // 2 and 3 left
    // full retention: every user recurs -> zero churn
    val keep = Seq((1L, 5L), (1L, w + 5L)).toDF("user_id", "ts")
    val g2 = graft.ops.Retention.churn(keep, w).collect()
    assert(g2.length == 1 && g2(0).getAs[Long]("n_churned") == 0L
      && g2(0).getAs[Double]("churn_rate") == 0.0)
  }

  test("survival: Kaplan-Meier matches the hand product; censoring holds the curve") {
    val day = 100L
    // corpus ends at day 9; censorDays = 2 -> last activity on day >= 8 is
    // censored. Lifetimes (last - first):
    //   u1: d0..d1 -> t=1 observed      u2: d0..d1 -> t=1 observed
    //   u3: d0..d3 -> t=3 observed      u4: d2..d5 -> t=3 observed
    //   u5: d0..d8 -> t=8 censored      u6: d4..d9 -> t=5 censored
    val events = Seq(
      (1L, 0L), (1L, day + 1),
      (2L, 2L), (2L, day + 5),
      (3L, 3L), (3L, 3 * day + 1),
      (4L, 2 * day + 1), (4L, 5 * day + 2),
      (5L, 4L), (5L, 8 * day + 3),
      (6L, 4 * day + 1), (6L, 9 * day + 7)).toDF("user_id", "ts")
    val got = graft.ops.Retention.survival(events, censorDays = 2, dayNs = day)
      .collect().map(r => r.getAs[Long]("t") ->
        ((r.getAs[Long]("n_risk"), r.getAs[Long]("n_events"),
          r.getAs[Long]("n_censored"), r.getAs[Double]("survival")))).toMap
    assert(got.keySet == Set(1L, 3L, 5L, 8L), s"$got")
    // t=1: risk 6, 2 deaths -> S = 1 - 2/6 = 2/3
    assert(got(1L) == ((6L, 2L, 0L, 1.0 - 2.0 / 6.0)), s"${got(1L)}")
    // t=3: risk 4, 2 deaths -> S = (2/3)(1 - 2/4)
    assert(got(3L) == ((4L, 2L, 0L, (1.0 - 2.0 / 6.0) * (1.0 - 2.0 / 4.0))),
      s"${got(3L)}")
    // t=5: risk 2, censored only -> curve unchanged
    assert(got(5L)._1 == 2L && got(5L)._3 == 1L
      && got(5L)._4 == got(3L)._4, s"${got(5L)}")
    // t=8: risk 1, censored -> curve still unchanged, risk set exact
    assert(got(8L) == ((1L, 0L, 1L, got(3L)._4)), s"${got(8L)}")
    // risk sets tie out: total users enter, every exit leaves exactly once
    val rows = graft.ops.Retention.survival(events, censorDays = 2, dayNs = day)
      .collect().sortBy(_.getAs[Long]("t"))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_risk") == a.getAs[Long]("n_risk")
        - a.getAs[Long]("n_events") - a.getAs[Long]("n_censored"))
    }
  }

  test("cuped: exact driver replay; correlated covariate shrinks variance; flat covariate degenerates") {
    import graft.functions.PolyHash
    import graft.pipeline.{Sampling => S}
    import graft.ops.Experiment
    // per-user persistent spend: pre = base(u), post = 2*base(u) + u%3 —
    // strongly correlated, so CUPED should remove most of the variance
    val users = (1L to 40L)
    val base = users.map(u => u -> (10L + (u % 7) * 5L)).toMap
    val rows = users.flatMap { u =>
      Seq((u, 1L, base(u)), (u, 8L, 2L * base(u) + u % 3)) // lo=1 hi=8 mid=4
    }.toSeq
    val got = Experiment.cuped(rows.toDF("user_id", "ts", "v"),
      "user_id", col("v"), "ts").collect()(0)
    // driver replay of the exact arithmetic
    def arm(u: Long): String = {
      val b = ((PolyHash.hash(u.toString, 0L) * S.saltMult("abtest")
        + S.saltAdd("abtest")) % PolyHash.Mod) % S.Buckets
      if (b < S.Buckets / 2) "A" else "B"
    }
    val xs = users.map(u => u -> base(u)).toMap
    val ys = users.map(u => u -> (2L * base(u) + u % 3)).toMap
    val n = users.size.toLong
    def bsum(f: Long => Long, who: Long => Boolean = _ => true): BigInt =
      users.filter(who).map(u => BigInt(f(u))).sum
    val (sx, sy) = (bsum(xs), bsum(ys))
    val (sxx, sxy, syy) =
      (bsum(u => xs(u) * xs(u)), bsum(u => xs(u) * ys(u)), bsum(u => ys(u) * ys(u)))
    val aSet = (u: Long) => arm(u) == "A"
    val bSet = (u: Long) => arm(u) == "B"
    val (na, nb) = (users.count(aSet).toLong, users.count(bSet).toLong)
    assert(na > 0 && nb > 0)
    val (vxx, vxy, vyy) =
      (BigInt(n) * sxx - sx * sx, BigInt(n) * sxy - sx * sy, BigInt(n) * syy - sy * sy)
    val theta = vxy.toDouble / vxx.toDouble
    val meanX = sx.toDouble / n.toDouble
    val meanA = bsum(ys, aSet).toDouble / na.toDouble
    val meanB = bsum(ys, bSet).toDouble / nb.toDouble
    val meanXA = bsum(xs, aSet).toDouble / na.toDouble
    val meanXB = bsum(xs, bSet).toDouble / nb.toDouble
    val adjA = meanA - theta * (meanXA - meanX)
    val adjB = meanB - theta * (meanXB - meanX)
    val vnum = vyy.toDouble - 2.0 * theta * vxy.toDouble + theta * theta * vxx.toDouble
    val se = math.sqrt(vnum / (n.toDouble * n.toDouble)
      * (1.0 / na.toDouble + 1.0 / nb.toDouble))
    assert(got.getAs[Long]("n") == n && got.getAs[Long]("n_a") == na
      && got.getAs[Long]("n_b") == nb)
    assert(got.getAs[Double]("theta") == theta, s"theta ${got.getAs[Double]("theta")} vs $theta")
    assert(got.getAs[Double]("adj_mean_a") == adjA)
    assert(got.getAs[Double]("adj_mean_b") == adjB)
    assert(got.getAs[Double]("diff_adj") == adjB - adjA)
    assert(got.getAs[Double]("var_reduction") == vnum / vyy.toDouble)
    assert(got.getAs[Double]("z_adj") == (adjB - adjA) / se)
    // y tracks 2x closely -> the adjustment removes almost all variance
    assert(got.getAs[Double]("var_reduction") < 0.05,
      s"expected a strong shrink, got ${got.getAs[Double]("var_reduction")}")
    // flat covariate: vxx = 0 -> null theta, null adjusted outputs
    val flat = users.flatMap(u => Seq((u, 1L, 7L), (u, 8L, u % 5))).toSeq
    val g2 = Experiment.cuped(flat.toDF("user_id", "ts", "v"),
      "user_id", col("v"), "ts").collect()(0)
    assert(g2.isNullAt(g2.fieldIndex("theta"))
      && g2.isNullAt(g2.fieldIndex("diff_adj")))
  }

  test("rakePhrases: hand-computed deg/freq scores; stopword split; maxLen cap; topN order") {
    // stopwords in the default list include: the, a, of, and, to, in, is
    val docs = Seq(
      (1L, "the deep learning model and deep learning"),
      (2L, "a deep model"),
      (3L, "one two three four five")  // 5-token run > maxLen=4 -> dropped
    ).toDF("doc_id", "text")
    val got = TextOps.rakePhrases(docs, topN = 10, maxLen = 4)
      .collect().map(r => r.getAs[String]("phrase") ->
        ((r.getAs[Long]("n_occurrences"), r.getAs[Double]("score")))).toMap
    // occurrences: [deep learning model], [deep learning], [deep model]
    // freq: deep 3, learning 2, model 2; deg: deep 3+2+2=7, learning 5, model 5
    // wscore: deep 7/3, learning 5/2, model 5/2
    assert(got.keySet == Set("deep learning model", "deep learning", "deep model"),
      s"$got")
    assert(got("deep learning model") == ((1L, 7.0 / 3 + 5.0 / 2 + 5.0 / 2)))
    assert(got("deep learning") == ((1L, 7.0 / 3 + 5.0 / 2)))
    assert(got("deep model") == ((1L, 7.0 / 3 + 5.0 / 2)))
    // topN order: (score desc, phrase asc) — the two equal-score phrases
    // tie-break alphabetically
    val ordered = TextOps.rakePhrases(docs, topN = 10, maxLen = 4)
      .collect().map(_.getAs[String]("phrase")).toSeq
    assert(ordered == Seq("deep learning model", "deep learning", "deep model"))
    // a phrase repeated across docs counts occurrences, scores once
    val rep = Seq((1L, "quantum computing is great"),
      (2L, "quantum computing"), (3L, "nothing here")).toDF("doc_id", "text")
    val g2 = TextOps.rakePhrases(rep, topN = 10, maxLen = 4)
      .collect().map(r => r.getAs[String]("phrase") ->
        r.getAs[Long]("n_occurrences")).toMap
    assert(g2("quantum computing") == 2L, s"$g2")
  }

  test("ngramNovelty: an exact copy scores 0; fresh material 1; partial overlap exact") {
    import graft.pipeline.TextOps
    val docs = Seq(
      (1L, "the quick brown fox jumps"),       // 3 shingles, all first-seen
      (2L, "the quick brown fox jumps"),       // exact copy -> novelty 0
      (3L, "totally fresh new words here"),    // disjoint -> novelty 1
      (4L, "the quick brown cat sleeps now"),  // shares shingle 1 of 4
      (5L, "ab")                               // < 3 tokens -> dropped
    ).toDF("doc_id", "text")
    val got = TextOps.ngramNovelty(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty_frac")))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L) == ((3L, 3L, 1.0)))
    assert(got(2L) == ((3L, 0L, 0.0)), "the exact copy owns nothing")
    assert(got(3L) == ((3L, 3L, 1.0)))
    assert(got(4L) == ((4L, 3L, 0.75)), s"${got(4L)}")
  }

  test("calendarProfile: epoch dow arithmetic lands 2024-01-01 on Monday; NaN excluded") {
    // 2024-01-01T15:00Z was a Monday (dow 1 with 0 = Sunday)
    val monday15 = 1704067200L * 1000000000L + 15L * 3600L * 1000000000L
    val sunday03 = monday15 - 36L * 3600L * 1000000000L  // 2023-12-31T03:00Z
    val events = Seq(
      ("click", monday15, 2.0), ("click", monday15 + 60L * 1000000000L, 4.0),
      ("click", sunday03, 7.0), ("click", sunday03, Double.NaN)
    ).toDF("event_type", "ts", "value")
    val got = graft.pipeline.Profile.calendarProfile(events).collect()
      .map(r => ((r.getAs[Long]("dow"), r.getAs[Long]("hour"))) ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("mean_value")))).toMap
    assert(got.keySet == Set((1L, 15L), (0L, 3L)), s"$got")
    assert(got((1L, 15L)) == ((2L, 3.0)))
    assert(got((0L, 3L)) == ((1L, 7.0)), "NaN row must not count")
  }

  test("firstPerWindow: first (ts, id) per hour cell survives; repeats counted; windows split") {
    val h = 3600L * 1000000000L
    val events = Seq(
      (1L, "click", 100L, 10L), (2L, "click", 100L, 10L),    // ts tie -> min id
      (3L, "click", 500L, 10L),                              // same-window repeat
      (4L, "click", h + 5L, 10L),                            // next window
      (5L, "view", 200L, 10L)                                // other type
    ).toDF("event_id", "event_type", "ts", "user_id")
    val got = graft.ops.Sessionize.firstPerWindow(events, h).collect()
      .map(r => ((r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("window_start"))) ->
        ((r.getAs[Long]("first_ts"), r.getAs[Long]("first_event_id"),
          r.getAs[Long]("n_suppressed")))).toMap
    assert(got.size == 3)
    assert(got((10L, "click", 0L)) == ((100L, 1L, 2L)), s"${got((10L, "click", 0L))}")
    assert(got((10L, "click", h)) == ((h + 5L, 4L, 0L)))
    assert(got((10L, "view", 0L)) == ((200L, 5L, 0L)))
    intercept[IllegalArgumentException](
      graft.ops.Sessionize.firstPerWindow(events, 0L))
  }

  test("assocRules: directional confidence, hand-computed measures, minBoth floor") {
    // u1{A,B}, u2{A,B}, u3{A}, u4{C}: A->B conf 2/3, B->A conf 2/2
    val events = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (2L, "B"),
      (3L, "A"), (4L, "C")).toDF("user_id", "event_type")
    val got = graft.ops.Cooccurrence.assocRules(events).collect()
      .map(r => (r.getAs[String]("antecedent"), r.getAs[String]("consequent")) ->
        ((r.getAs[Long]("n_users_both"), r.getAs[Double]("support"),
          r.getAs[Double]("confidence"), r.getAs[Double]("lift")))).toMap
    assert(got.keySet == Set(("A", "B"), ("B", "A")))
    assert(got(("A", "B")) == ((2L, 2.0 / 4, 2.0 / 3, 2.0 * 4 / (3 * 2))))
    assert(got(("B", "A")) == ((2L, 2.0 / 4, 2.0 / 2, 2.0 * 4 / (3 * 2))))
    assert(graft.ops.Cooccurrence.assocRules(events, minBoth = 3L).count() == 0)
    intercept[IllegalArgumentException](
      graft.ops.Cooccurrence.assocRules(events, minBoth = 0L))
  }

  test("unigramLogprob: hand-computed add-1 cross-entropy; rare words score higher") {
    import graft.pipeline.TextOps
    // corpus: "a a b" + "c" -> counts a:2 b:1 c:1, N=4, V=3
    val df = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val got = TextOps.unigramLogprob(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("cross_entropy"))).toMap
    val e1 = -(2 * math.log(3.0 / 7) + math.log(2.0 / 7)) / 3
    val e2 = -math.log(2.0 / 7)
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2 - e1) < 1e-12)
    assert(got(2L)._1 == 1L && math.abs(got(2L)._2 - e2) < 1e-12)
    assert(got(2L)._2 > got(1L)._2, "the rare-word doc must score higher")
    // an empty doc has no occurrences to score and is absent
    assert(TextOps.unigramLogprob(
      Seq((1L, "a"), (2L, "%%%")).toDF("doc_id", "text")).count() == 1)
  }

  test("bm25 matches a from-scratch reference; multi-term docs outrank stuffing") {
    import graft.pipeline.TextOps
    val docs = Seq((1L, "cat dog"), (2L, "cat cat cat fish"), (3L, "bird"),
      (4L, "dog and a cat in a house with a dog"))
    val got = TextOps.bm25(docs.toDF("doc_id", "text"), "cat dog", k = 10)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_matched_terms"), r.getAs[Double]("score")))
    // from-scratch Okapi BM25 (k1 = 1.2, b = 0.75)
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = docs.size
    val avg = toks.values.map(_.size).sum.toDouble / n
    def dfOf(t: String) = toks.values.count(_.contains(t))
    def score(id: Long) = Seq("cat", "dog").flatMap { t =>
      val tf = toks(id).count(_ == t)
      if (tf == 0) None else {
        val df = dfOf(t)
        val idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
        Some(idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * toks(id).size / avg)))
      }
    }.sum
    val expect = Seq(1L, 2L, 4L).map(id => id -> score(id))
      .sortBy { case (id, s) => (-s, id) }
    assert(got.map(_._1).toSeq == expect.map(_._1))
    got.foreach { case (id, nm, s) =>
      assert(math.abs(s - score(id)) < 1e-12, s"doc $id")
      assert(nm == Seq("cat", "dog").count(toks(id).contains(_)))
    }
    // the doc matching BOTH query terms outranks the single-term stuffer
    assert(got.head._1 == 1L || got.head._1 == 4L)
    assert(got.map(_._1).indexOf(2L) > 0, "cat-stuffing must not win on tf alone")
  }

  test("topTerms: count-ranked with term tie-break, cut at k") {
    import graft.pipeline.TextOps
    val df = Seq(("en", "x x y y z"), ("en", "x"), ("de", "q")).toDF("lang", "text")
    val got = TextOps.topTerms(df, k = 2).orderBy("lang", "rank").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("term"),
        r.getAs[Long]("n"), r.getAs[Int]("rank")))
    // en: x=3, y=2, z=1 -> top-2 is x,y; de: q only
    assert(got.toSeq == Seq(("de", "q", 1L, 1), ("en", "x", 3L, 1), ("en", "y", 2L, 2)))
    // tie on count breaks alphabetically
    val tie = TextOps.topTerms(Seq(("en", "b a")).toDF("lang", "text"), k = 1).collect()(0)
    assert(tie.getAs[String]("term") == "a")
  }

  test("fertility: exact integer sums; zero-word slice yields null ratio") {
    import graft.pipeline.TextOps
    // "ab cd": 2 words, 2 bpe segments; "x1y2": 1 token but 4 bpe segments
    // (letter/digit runs split); "%%%": 0 tokens, 1 bpe segment
    val df = Seq(("a", "ab cd"), ("a", "x1y2"), ("b", "%%%"))
      .toDF("lang", "text")
    val got = TextOps.fertility(df).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("n_docs") == 2L)
    assert(a.getAs[Long]("n_words") == 3L)
    assert(a.getAs[Long]("n_bpe_tokens") == 6L)
    assert(a.getAs[Double]("fertility") == 2.0)
    val b = got("b")
    assert(b.getAs[Long]("n_words") == 0L)
    assert(b.isNullAt(b.fieldIndex("fertility")))
  }

  test("gopherRules: feature math exact; each rule trips independently") {
    import graft.pipeline.TextOps
    import org.apache.spark.sql.functions.col
    val good = ("the and " + Seq.fill(23)("word").mkString(" "), "good")
    val short = ("the and cat", "short")
    val symbols = ("the and " + Seq.fill(23)("word").mkString(" ")
      + " " + Seq.fill(5)("#").mkString(" "), "symbols")
    val noStops = (Seq.tabulate(25)(i => s"unique$i").mkString(" "), "nostop")
    val empty = ("", "empty")
    val df = Seq(good, short, symbols, noStops, empty).toDF("text", "name")
    val got = TextOps.gopherRules(df).collect()
      .map(r => r.getAs[String]("name") -> r).toMap
    // hand-checked features for the good doc: 25 words, mean (3+3+23·4)/25
    val g = got("good")
    assert(g.getAs[Long]("n_words") == 25L)
    assert(math.abs(g.getAs[Double]("mean_word_len") - 98.0 / 25) < 1e-15)
    assert(g.getAs[Double]("symbol_ratio") == 0.0)
    assert(g.getAs[Double]("alpha_word_ratio") == 1.0)
    assert(g.getAs[Long]("n_stopword_hits") == 2L)
    assert(g.getAs[Boolean]("pass_gopher"))
    // each failure mode trips its own rule
    assert(!got("short").getAs[Boolean]("pass_gopher")) // word count
    val s = got("symbols") // 30 words, 5 '#': ratio 1/6 > 0.1
    assert(math.abs(s.getAs[Double]("symbol_ratio") - 5.0 / 30) < 1e-15)
    assert(!s.getAs[Boolean]("pass_gopher"))
    assert(got("nostop").getAs[Long]("n_stopword_hits") == 0L)
    assert(!got("nostop").getAs[Boolean]("pass_gopher"))
    val e = got("empty")
    assert(e.getAs[Long]("n_words") == 0L)
    assert(e.isNullAt(e.fieldIndex("mean_word_len")))
    assert(!e.getAs[Boolean]("pass_gopher"))
    // '...' counts as a symbol but stays part of its word
    val ell = TextOps.gopherRules(Seq(("well... maybe... no", "x")).toDF("text", "name"))
      .collect()(0)
    assert(math.abs(ell.getAs[Double]("symbol_ratio") - 2.0 / 3) < 1e-15)
    assert(ell.getAs[Double]("alpha_word_ratio") == 1.0)
  }

  test("sessionWindows boundary == lag variant: exact-gap successor merges in both") {
    val g = 60_000_000_000L // 60 s in ns -> "1 minute"
    val events = Seq(
      (1L, 1L, 0L), (2L, 1L, g), (3L, 1L, 2 * g + 1_000_000L))
      .toDF("event_id", "user_id", "ts")
    // diff == gap merges (inclusive close); diff > gap splits — in BOTH
    // implementations, which is what lets them share one oracle
    val expect = Seq(
      (1L, 1L, 0L, g, g, 2L),
      (1L, 2L, 2 * g + 1_000_000L, 2 * g + 1_000_000L, 0L, 1L))
    val native = Sessionize.sessionWindows(events, "1 minute")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(native.toSeq == expect)
    val lagVariant = Sessionize.sessions(events, gapNs = g)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(lagVariant.toSeq == expect)
  }

  test("sessionWindows matches the lag variant away from exact-gap boundaries") {
    val rnd = new scala.util.Random(7)
    val events = (1L to 300L).map { i =>
      (i, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong * 2_000_000_000L + 1_000_000L)
    }.toDF("event_id", "user_id", "ts")
    // gap 30 s; ts on an odd 2s+1ms grid, so diff == gap never occurs
    val a = Sessionize.sessionWindows(events, "30 seconds")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val b = Sessionize.sessions(events.dropDuplicates("user_id", "ts"), 30_000_000_000L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    // native variant collapses same-ts duplicates into the same session
    // either way; compare on the deduplicated feed
    val a2 = Sessionize.sessionWindows(events.dropDuplicates("user_id", "ts"), "30 seconds")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(a2 == b)
    assert(a.map(r => (r._1, r._2, r._3)) == a2.map(r => (r._1, r._2, r._3)))
  }

  test("sessionWindowStats finalizes sessions under a streaming watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, Long, Long)]
    val q = Sessionize.sessionWindowStats(
        in.toDF().toDF("event_id", "user_id", "ts"),
        gap = "1 minute", watermark = Some("0 seconds"))
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      val m = 60_000_000_000L
      in.addData((1L, 1L, 0L), (2L, 1L, m / 2))
      q.processAllAvailable()
      // advance the watermark far past the first session's close
      in.addData((3L, 1L, 10 * m))
      q.processAllAvailable()
      val got = spark.table("sess_out")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._2)
      assert(got.toSeq == Seq((1L, 0L, m / 2, m / 2, 2L)))
    } finally q.stop()
  }

  test("sessionize: gap strictly greater than the bound starts a new session") {
    val g = 100L
    val events = Seq(
      // user 1: gaps 100 (same session), 101 (new session)
      (1L, 1L, 1000L), (2L, 1L, 1100L), (3L, 1L, 1201L),
      // user 2: single event
      (4L, 2L, 5000L)).toDF("event_id", "user_id", "ts")
    val got = Sessionize.sessions(events, gapNs = g)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (1L, 1L, 1000L, 1100L, 100L, 2L),
      (1L, 2L, 1201L, 1201L, 0L, 1L),
      (2L, 1L, 5000L, 5000L, 0L, 1L)))
  }

  test("sessionize: duplicate timestamps order by event id deterministically") {
    val events = Seq(
      (10L, 1L, 1000L), (11L, 1L, 1000L), (12L, 1L, 1000L))
      .toDF("event_id", "user_id", "ts")
    val got = Sessionize.sessions(events, gapNs = 1L)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 1L, 1000L, 1000L, 0L, 3L)))
  }

  test("chunk: exact window geometry, short tail, empty text") {
    val docs = Seq((1L, "abcdefghij"), (2L, "")).toDF("doc_id", "text")
    val got = TextOps.chunk(docs, size = 4, overlap = 1)
      .as[(Long, Int, Int, String)].collect().sortBy(r => (r._1, r._2))
    // stride 3: starts 0,3,6,9 -> abcd, defg, ghij, j
    assert(got.toSeq == Seq(
      (1L, 0, 0, "abcd"), (1L, 1, 3, "defg"), (1L, 2, 6, "ghij"), (1L, 3, 9, "j")))
    intercept[IllegalArgumentException] { TextOps.chunk(docs, size = 4, overlap = 4) }
  }

  test("invertedIndex: df counts all docs while postings cap at the smallest ids") {
    val docs = (1L to 30L).map(i => (i, "common word" + (i % 3)))
      .toDF("doc_id", "text")
    val got = TextOps.invertedIndex(docs, maxPostings = 5)
      .withColumn("postings", col("postings").cast("array<long>"))
      .as[(String, Long, Seq[Long])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("common") == ((30L, Seq(1L, 2L, 3L, 4L, 5L))))
    assert(got("word0")._1 == 10L)
    assert(got("word0")._2 == Seq(3L, 6L, 9L, 12L, 15L))
  }

  test("repetitionStats: known ratios and empty-doc fallbacks") {
    val docs = Seq(
      (1L, "a b a b a b"),     // 6 tokens, 2 distinct; trigrams: aba x2, bab x2
      (2L, "x y"),             // no trigrams
      (3L, "")).toDF("doc_id", "text")
    val got = TextOps.repetitionStats(docs)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 6L, 4.0 / 6.0, 2.0 / 4.0)))
    assert(got(1) == ((2L, 2L, 0.0, 0.0)))
    assert(got(2) == ((3L, 0L, 0.0, 0.0)))
  }

  test("scrubPii: emails and long digit runs redact with counts") {
    val docs = Seq(
      (1L, "mail bob.smith+x@examp-le.org now 12345678 ok 123"),
      (2L, "clean text"),
      // the digit run INSIDE the email must not double-count: one email
      // redaction, zero number redactions
      (3L, "ping 12345678@corp.com")).toDF("doc_id", "text")
    val got = TextOps.scrubPii(docs).as[(Long, Long, String)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 2L, "mail <EMAIL> now <NUM> ok 123")))
    assert(got(1) == ((2L, 0L, "clean text")))
    assert(got(2) == ((3L, 1L, "ping <EMAIL>")))
  }

  test("decontaminate: counts distinct shared n-grams against the benchmark") {
    val docs = Seq(
      // shares exactly the 5-gram "the quick brown fox jumps" with bench
      (1L, "note the quick brown fox jumps away"),
      // no 5-token window overlaps the bench text
      (2L, "a completely different sentence with no overlap at all"),
      // shares two distinct 5-grams (two windows of the 6-token bench run)
      (3L, "the quick brown fox jumps over something"),
      // shorter than 5 tokens: never contaminated
      (4L, "too short here")
    ).toDF("doc_id", "text")
    val bench = Seq((99L, "the quick brown fox jumps over")).toDF("doc_id", "text")
    val got = TextOps.decontaminate(docs, bench, n = 5)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 1L, true), (2L, 0L, false), (3L, 2L, true), (4L, 0L, false)))
  }

  test("bloomDecontaminate: never misses a shared gram, superset of exact") {
    val docs = Seq(
      (1L, "note the quick brown fox jumps away"),
      (2L, "a completely different sentence with no overlap at all"),
      (3L, "the quick brown fox jumps over something"),
      (4L, "too short here")
    ).toDF("doc_id", "text")
    val bench = Seq((99L, "the quick brown fox jumps over")).toDF("doc_id", "text")
    val exact = TextOps.decontaminate(docs, bench, n = 5)
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    val bloom = TextOps.bloomDecontaminate(docs, bench, n = 5)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    // no false negatives: every exactly-contaminated doc is bloom-flagged,
    // and the hit count is at least the exact shared-gram count
    bloom.foreach { case (id, _, flagged) =>
      if (exact(id)) assert(flagged, s"doc $id: exact hit missed by bloom") }
    // at the default 2^18 bits / 6 bench grams, FPs are ~1e-6 — on this
    // 4-doc corpus the two operators agree exactly (deterministic, pinned)
    assert(bloom.toSeq == Seq(
      (1L, 1L, true), (2L, 0L, false), (3L, 2L, true), (4L, 0L, false)))
  }

  test("bloomDecontaminate: tiny filter saturates into false positives, never negatives") {
    val docs = Seq((1L, "one two three four five"),
      (2L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val bench = Seq((9L, "one two three four five")).toDF("doc_id", "text")
    // m = 64 bits with k = 3: a single bench gram sets 3 of 64 bits; doc 1
    // (the true dup) must flag regardless
    val got = TextOps.bloomDecontaminate(docs, bench, n = 5, mBits = 64)
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(got(1L), "true duplicate escaped the bloom filter")
    intercept[IllegalArgumentException] {
      TextOps.bloomDecontaminate(docs, bench, n = 5, mBits = 100)
    }
    intercept[IllegalArgumentException] {
      TextOps.bloomDecontaminate(docs, bench, n = 5, kHashes = 0)
    }
  }

  test("stepTiming: hand-checked rates and interpolated percentiles per step pair") {
    // three signups; two click (dt 10 and 30); one purchases (dt 5)
    val events = Seq(
      (1L, "signup", 10L), (1L, "click", 20L), (1L, "purchase", 25L),
      (2L, "signup", 100L), (2L, "click", 130L),
      (3L, "signup", 50L)
    ).toDF("user_id", "event_type", "ts")
    val got = graft.ops.Funnel.stepTiming(events, Seq("signup", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    // 1→2: 3 arrivals, 2 convert; dts {10, 30}: median 20, p90 = 10+0.9*20=28
    assert(got(1) == ((3L, 2L, 2.0 / 3.0, 20.0, 28.0)), s"${got(1)}")
    // 2→3: 2 arrivals, 1 converts; single dt 5
    assert(got(2) == ((2L, 1L, 0.5, 5.0, 5.0)), s"${got(2)}")
  }

  test("funnel: strictly-ordered stages; out-of-order and same-instant don't advance") {
    val events = Seq(
      // u1 completes in order
      (1L, "signup", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // u2: click BEFORE signup (doesn't count), another click after, no purchase
      (2L, "click", 5L), (2L, "signup", 10L), (2L, "click", 15L),
      // u3: click at the same instant as signup — strict > rejects it
      (3L, "signup", 10L), (3L, "click", 10L),
      // u4: never signs up -> absent from the funnel
      (4L, "click", 1L), (4L, "purchase", 2L)
    ).toDF("user_id", "event_type", "ts")
    val got = graft.ops.Funnel.funnel(events, Seq("signup", "click", "purchase"))
      .collect().map(r => (r.getAs[Long]("user_id"),
        (Option(r.getAs[Any]("t_1")), Option(r.getAs[Any]("t_2")),
          Option(r.getAs[Any]("t_3"))), r.getAs[Int]("stage_reached")))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, (Some(10L), Some(20L), Some(30L)), 3),
      (2L, (Some(10L), Some(15L), None), 2),
      (3L, (Some(10L), None, None), 1)))
  }

  test("profile: one-pass stats with nulls and an interpolated exact median") {
    val df = Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0), None).toDF("x")
      .withColumn("y", lit(10.0))
    val got = Profile.numeric(df, Seq("x", "y")).collect()
      .map(r => r.getString(0) -> r).toMap
    val x = got("x")
    assert(x.getAs[Long]("n") == 4 && x.getAs[Long]("n_null") == 1)
    assert(x.getAs[Long]("n_distinct") == 4)
    assert(x.getAs[Double]("min_value") == 1.0 && x.getAs[Double]("max_value") == 4.0)
    assert(x.getAs[Double]("mean_value") == 2.5)
    // sorted [1,2,3,4]: index 0.5·3 = 1.5 → linear between 2 and 3
    assert(x.getAs[Double]("median") == 2.5)
    val y = got("y")
    assert(y.getAs[Long]("n") == 5 && y.getAs[Long]("n_distinct") == 1)
    assert(y.getAs[Double]("median") == 10.0)
    // the approximate variant stays close on this tiny input
    val ax = Profile.numeric(df, Seq("x"), exact = false).collect()(0)
    assert(math.abs(ax.getAs[Long]("n_distinct") - 4L) <= 1)
  }

  test("quantizeInt8: reconstruction within half a step, zero vector to zeros") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(vecs)
      .as[(Long, Double, Seq[Int])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val (s1, q1) = (got(1L)._1, got(1L)._2)
    assert(s1 == 1.0 / 127.0)
    assert(q1 == Seq(64, -127, 32, 0))
    Seq(0.5, -1.0, 0.25, 0.0).zip(q1).foreach { case (x, q) =>
      assert(math.abs(x - q * s1) <= s1 / 2 + 1e-12) }
    assert(got(2L) == ((0.0, Seq(0, 0))))
  }

  test("histogram: edge folding, out-of-range exclusion, exact per-bin stats") {
    val df = Seq(-0.1, 0.0, 0.5, 0.99, 1.0, 5.0, 9.99, 10.0, 10.1)
      .toDF("x")
    // [0, 10] in 10 bins of width 1; -0.1 and 10.1 excluded; 10.0 folds
    // into bin 9; 1.0 lands in bin 1
    val got = Profile.histogram(df, "x", 0.0, 10.0, 10).collect()
      .map(r => r.getAs[Long]("bin_id") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("min_value"),
          r.getAs[Double]("max_value"), r.getAs[Double]("lo_edge"),
          r.getAs[Double]("hi_edge")))).toMap
    assert(got.keySet == Set(0L, 1L, 5L, 9L))
    assert(got(0L) == ((3L, 0.0, 0.99, 0.0, 1.0)))
    assert(got(1L) == ((1L, 1.0, 1.0, 1.0, 2.0)))
    assert(got(5L) == ((1L, 5.0, 5.0, 5.0, 6.0)))
    assert(got(9L) == ((2L, 9.99, 10.0, 9.0, 10.0)))
    // NaN and null never land in a bin
    val withBad = Seq(Some(1.0), Some(Double.NaN), None).toDF("x")
    assert(Profile.histogram(withBad, "x", 0.0, 10.0, 10)
      .agg(sum("n")).collect()(0).getLong(0) == 1L)
  }

  test("calibrationBins: exact rates, edge clamping, hand-checked ECE") {
    // bin 9: conf ~0.95, all positive (gap 0.05); bin 0: conf 0.05, none
    // positive (gap -0.05); out-of-range scores clamp into edge bins
    val rows = Seq(
      (0.95, true), (0.95, true), (1.2, true), // 1.2 clamps to bin 9
      (0.05, false), (-0.3, false)) // -0.3 clamps to bin 0
    val got = graft.ops.Experiment.calibrationBins(
        rows.toDF("p", "y"), "p", "y", nBins = 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(5)))).toMap
    assert(got.keySet == Set(0L, 9L))
    val (n9, conf9, rate9, ece) = got(9L)
    assert(n9 == 3L && rate9 == 1.0)
    assert(math.abs(conf9 - (0.95 + 0.95 + 1.2) / 3) < 1e-12)
    val (n0, conf0, rate0, _) = got(0L)
    assert(n0 == 2L && rate0 == 0.0)
    assert(math.abs(conf0 - (0.05 - 0.3) / 2) < 1e-12)
    // ECE = 3/5*|1-conf9| + 2/5*|0-conf0|
    val want = 3.0 / 5 * math.abs(1.0 - conf9) + 2.0 / 5 * math.abs(conf0)
    assert(math.abs(ece - want) < 1e-12, s"ece $ece want $want")
    // null/NaN scores and null labels are excluded
    val bad = Seq((Some(Double.NaN), Some(true)), (None, Some(true)),
      (Some(0.5), None), (Some(0.5), Some(true)))
      .toDF("p", "y")
    val clean = graft.ops.Experiment.calibrationBins(bad, "p", "y", 10).collect()
    assert(clean.map(_.getLong(1)).sum == 1L)
  }

  test("keySkew: heavy hitter ranked first with exact shares, nulls counted") {
    // key "hot" holds 60/100 rows; null holds 10 — both must surface
    val rows = Seq.fill(60)("hot") ++ (0 until 30).map(i => s"k$i") ++
      Seq.fill(10)(null: String)
    val got = Profile.keySkew(rows.toDF("k"), "k", topN = 3).collect()
      .sortBy(_.getAs[Int]("key_rank"))
    assert(got.length == 3)
    val first = got(0)
    assert(first.getAs[String]("key_value") == "hot")
    assert(first.getAs[Long]("n_rows") == 60L)
    assert(first.getAs[Double]("share") == 0.6)
    assert(first.getAs[Double]("top1_share") == 0.6)
    assert(first.getAs[Long]("n_total") == 100L)
    assert(first.getAs[Long]("n_distinct") == 32L)
    assert(got(1).getAs[String]("key_value") == null)
    assert(got(1).getAs[Long]("n_rows") == 10L)
    // top-3 = 60 + 10 + 1
    assert(first.getAs[Double]("topn_share") == 0.71)
  }

  test("epochShuffle: total order, epoch-decorrelated, layout-invariant") {
    val df = (0L until 200L).toDF("doc_id")
    val e1 = Export.epochShuffle(df, epoch = 1, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // every row lands exactly once; in-shard positions are 1..n_shard
    assert(e1.map(_._1).toSet == (0L until 200L).toSet)
    e1.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.size)) }
    // determinism + layout invariance
    val again = Export.epochShuffle(df.repartition(7), 1, 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(e1.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // a different epoch produces a genuinely different assignment: the
    // fraction of ids keeping BOTH shard and position must be tiny
    val e2 = Export.epochShuffle(df, epoch = 2, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val same = e1.sortBy(_._1).zip(e2.sortBy(_._1))
      .count { case (a, b) => a._2 == b._2 && a._3 == b._3 }
    assert(same <= 10, s"epochs 1 and 2 agree on $same/200 placements")
  }

  test("psiDrift: hand-computed PSI, empty-bin smoothing, identical slices stable") {
    // group g: A mass in bin 0 (v=1), B mass in bin 1 (v=6) → major shift;
    // group h: identical slices → psi exactly 0 (every term has pA == pB)
    val rows = Seq.fill(10)(("g", 1.0, true)) ++ Seq.fill(10)(("g", 6.0, false)) ++
      Seq.fill(5)(("h", 2.0, true)) ++ Seq.fill(5)(("h", 2.0, false))
    val got = graft.pipeline.Profile.psiDrift(rows.toDF("grp", "v", "in_a"),
        "grp", "v", col("in_a"), lo = 0.0, hi = 10.0, nBins = 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5)))).toMap
    // hand PSI for g (nBins=2, add-one): bin0 pA=11/12, pB=1/12;
    // bin1 pA=1/12, pB=11/12 → psi = 2 * (10/12)*ln(11)
    val want = 2.0 * (10.0 / 12.0) * math.log(11.0)
    assert(math.abs(got("g")._4 - want) < 1e-12, s"psi ${got("g")._4} want $want")
    assert(got("g")._5 == "major" && got("g")._1 == 10L && got("g")._2 == 10L)
    assert(got("h")._4 == 0.0 && got("h")._5 == "stable")
    assert(got("h")._3 == 1L, "h hits one bin")
    // one-sided groups are omitted
    val oneSided = Seq(("x", 1.0, true)).toDF("grp", "v", "in_a")
    assert(graft.pipeline.Profile.psiDrift(oneSided, "grp", "v", col("in_a"),
      0.0, 10.0, 2).isEmpty)
  }

  test("ksDrift: matches brute-force KS, detects a shift, shard-invariant") {
    // slice A: 0..49; slice B: shifted by +10 — a pure location shift the
    // means would also see, but KS must report the exact sup-distance
    // +20 on a 0..49 support gives D = 0.4 > crit(50,50) ≈ 0.27 — a
    // smaller shift (e.g. +10, D = 0.2) is correctly NOT significant
    val rows = (0 until 50).map(i => ("g", i.toDouble, true)) ++
      (0 until 50).map(i => ("g", i.toDouble + 20.0, false)) ++
      // group h: identical slices → D = 0 at every evaluation point of
      // the COMBINED support
      (0 until 30).map(i => ("h", (i % 7).toDouble, true)) ++
      (0 until 30).map(i => ("h", (i % 7).toDouble, false))
    val df = rows.toDF("grp", "v", "in_a")
    def brute(vsA: Seq[Double], vsB: Seq[Double]): Double = {
      val support = (vsA ++ vsB).distinct.sorted
      support.map(x => math.abs(
        vsA.count(_ <= x).toDouble / vsA.size -
          vsB.count(_ <= x).toDouble / vsB.size)).max
    }
    val got = Profile.ksDrift(df, "grp", "v", col("in_a"), shardWidth = 7.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(5)))).toMap
    val byGrp = rows.groupBy(_._1)
    Seq("g", "h").foreach { g =>
      val a = byGrp(g).filter(_._3).map(_._2)
      val b = byGrp(g).filterNot(_._3).map(_._2)
      assert(got(g)._3 == brute(a, b), s"group $g")
    }
    assert(got("g")._4, "the shifted group must drift")
    assert(got("h")._3 == 0.0 && !got("h")._4)
    assert(got("g")._1 == 50L && got("g")._2 == 50L)
    // one-sided groups are omitted (KS undefined)
    val oneSided = Seq(("x", 1.0, true), ("x", 2.0, true)).toDF("grp", "v", "in_a")
    assert(Profile.ksDrift(oneSided, "grp", "v", col("in_a")).isEmpty)
    // the sharded prefix sum is layout- and width-invariant
    val wide = Profile.ksDrift(df.repartition(7), "grp", "v", col("in_a"),
      shardWidth = 1000.0).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    Seq("g", "h").foreach(g => assert(wide(g) == got(g)._3))
  }

  test("unigramDivergence: zero for identical slices, matches from-scratch JS") {
    // identical text in both slices → p == q → js exactly 0
    val same = Seq((true, "alpha beta gamma"), (false, "alpha beta gamma"))
      .toDF("a", "text")
    val z = TextOps.unigramDivergence(same, col("a")).collect()(0)
    assert(math.abs(z.getAs[Double]("js_divergence")) < 1e-15)
    assert(z.getAs[Long]("n_vocab") == 3L)
    assert(z.getAs[Long]("n_tokens_a") == 3L && z.getAs[Long]("n_tokens_b") == 3L)

    // disjoint slices vs a from-scratch smoothed-JS computation
    val df = Seq((true, "aa aa bb"), (false, "cc")).toDF("a", "text")
    val got = TextOps.unigramDivergence(df, col("a")).collect()(0)
    val counts = Map("aa" -> (2L, 0L), "bb" -> (1L, 0L), "cc" -> (0L, 1L))
    val (ta, tb, v) = (3.0, 1.0, 3.0)
    val js = counts.values.map { case (ca, cb) =>
      val p = (ca + 1.0) / (ta + v); val q = (cb + 1.0) / (tb + v)
      val m = (p + q) / 2
      0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
    }.sum
    assert(math.abs(got.getAs[Double]("js_divergence") - js) < 1e-12)
    assert(got.getAs[Long]("n_vocab") == 3L)
  }

  test("extractJson: typed fields, malformed rows become nulls, raw column dropped") {
    val df = Seq(
      (1L, """{"k": 7, "tag": "a"}"""),
      (2L, """{"k": "not-an-int"}"""),
      (3L, "not json at all"),
      (4L, """{"tag": "b"}""")).toDF("id", "props")
    val got = graft.pipeline.SemiStructured.extractJson(df, "props", "k INT, tag STRING")
    assert(got.columns.toSeq == Seq("id", "k", "tag"))
    val rows = got.collect().map(r => r.getAs[Long]("id") ->
      ((Option(r.getAs[Any]("k")), Option(r.getAs[String]("tag"))))).toMap
    assert(rows(1L) == ((Some(7), Some("a"))))
    assert(rows(2L)._1.isEmpty)          // type mismatch -> typed null
    assert(rows(3L) == ((None, None)))   // malformed -> all-null struct
    assert(rows(4L) == ((None, Some("b"))))
  }

  test("retention: offset-0 cells equal cohort sizes; revisits count distinct users") {
    val day = 10L
    // users 1,2 start day 0; user 1 returns day 1 twice (counted once),
    // user 3 starts day 1 and returns day 3
    val events = Seq(
      (1L, 0L), (2L, 5L), (1L, 12L), (1L, 13L), (3L, 15L), (3L, 31L))
      .toDF("user_id", "ts")
    val got = graft.ops.Retention.retention(events, dayNs = day).collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset")) ->
        r.getAs[Long]("n_users")).toMap
    assert(got == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (1L, 0L) -> 1L, (1L, 2L) -> 1L))
    // pre-epoch timestamps floor to the correct day (truncation would put
    // ts = -1 on day 0 and cohort the user a day late)
    val preEpoch = Seq((9L, -1L), (9L, 5L)).toDF("user_id", "ts")
    val cells = graft.ops.Retention.retention(preEpoch, dayNs = day).collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset"))).toSet
    assert(cells == Set((-1L, 0L), (-1L, 1L)))
  }

  test("unigramDivergence: null-slice rows are excluded from vocabulary and totals") {
    val withNull = Seq((Some(true), "alpha beta"), (Some(false), "alpha beta"),
      (None, "zzz qqq xxx")).toDF("a", "text")
    val got = TextOps.unigramDivergence(withNull, col("a")).collect()(0)
    // the null-slice doc's tokens must not inflate the joint vocabulary
    assert(got.getAs[Long]("n_vocab") == 2L)
    assert(math.abs(got.getAs[Double]("js_divergence")) < 1e-15)
  }

  test("collocations: PMI matches a from-scratch computation; minCount prunes") {
    // "of the" appears 3×, "the cat" 2×, "big dog" 1× (pruned at minCount 2)
    val docs = Seq("of the cat", "of the cat", "of the big dog")
      .toDF("text")
    val got = TextOps.collocations(docs, k = 10, minCount = 2).collect()
      .map(r => r.getAs[String]("bigram") ->
        ((r.getAs[Long]("c_xy"), r.getAs[Long]("c_x"), r.getAs[Long]("c_y"),
          r.getAs[Double]("pmi")))).toMap
    assert(got.keySet == Set("of the", "the cat"))
    val nTok = 10.0; val nBig = 7.0
    def pmi(cxy: Long, cx: Long, cy: Long) =
      math.log((cxy / nBig) / ((cx / nTok) * (cy / nTok)))
    assert(got("of the")._1 == 3L && got("of the")._2 == 3L && got("of the")._3 == 3L)
    assert(math.abs(got("of the")._4 - pmi(3, 3, 3)) < 1e-12)
    assert(got("the cat")._1 == 2L)
    assert(math.abs(got("the cat")._4 - pmi(2, 3, 2)) < 1e-12)
  }

  test("topPaths: gap-bounded ordered sequences, step cap, deterministic ranking") {
    val g = 100L
    // user 1: two sessions [a b c] and [a b]; user 2: one session [a b c]
    // plus a 6-event session that must truncate to its first 3 steps
    val events = Seq(
      (1L, 1L, 0L, "a"), (2L, 1L, 10L, "b"), (3L, 1L, 20L, "c"),
      (4L, 1L, 500L, "a"), (5L, 1L, 510L, "b"),
      (6L, 2L, 0L, "a"), (7L, 2L, 10L, "b"), (8L, 2L, 20L, "c"),
      (9L, 3L, 0L, "x"), (10L, 3L, 1L, "y"), (11L, 3L, 2L, "z"),
      (12L, 3L, 3L, "x"), (13L, 3L, 4L, "y"), (14L, 3L, 5L, "z"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = graft.ops.Paths.topPaths(events, gapNs = g, k = 10, maxSteps = 3)
      .as[(String, Long)].collect().toSeq
    assert(got.toMap == Map("a > b > c" -> 2L, "a > b" -> 1L, "x > y > z" -> 1L))
    // ranking: count desc, then path asc
    assert(got.head == ("a > b > c", 2L))
    assert(got.tail.map(_._1) == Seq("a > b", "x > y > z"))
    // same-instant events order by event_id (deterministic tie-break)
    val ties = Seq((2L, 9L, 0L, "b"), (1L, 9L, 0L, "a"))
      .toDF("event_id", "user_id", "ts", "event_type")
    assert(graft.ops.Paths.topPaths(ties, g, k = 5).as[(String, Long)]
      .collect().toSeq == Seq(("a > b", 1L)))
  }

  test("transitions: adjacency within sessions only, probabilities sum to 1 per source") {
    val g = 100L
    // user 1: [a b a b] then, after a gap, [c] — the a→b/b→a chain must not
    // leak a b→c transition across the session boundary
    val events = Seq(
      (1L, 1L, 0L, "a"), (2L, 1L, 10L, "b"), (3L, 1L, 20L, "a"),
      (4L, 1L, 30L, "b"), (5L, 1L, 500L, "c"),
      (6L, 2L, 0L, "a"), (7L, 2L, 10L, "c"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = graft.ops.Paths.transitions(events, gapNs = g)
      .collect().map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        ((r.getAs[Long]("n_transitions"), r.getAs[Double]("p_transition")))).toMap
    assert(got.keySet == Set(("a","b"), ("b","a"), ("a","c")))
    assert(got(("a","b"))._1 == 2L && got(("b","a"))._1 == 1L && got(("a","c"))._1 == 1L)
    assert(math.abs(got(("a","b"))._2 - 2.0 / 3) < 1e-12)
    assert(math.abs(got(("a","c"))._2 - 1.0 / 3) < 1e-12)
    assert(math.abs(got(("b","a"))._2 - 1.0) < 1e-12)
    // per-source probabilities always sum to 1
    got.groupBy(_._1._1).foreach { case (f, m) =>
      assert(math.abs(m.values.map(_._2).sum - 1.0) < 1e-12, s"from $f") }
  }

  test("extractJson rejects field/column collisions up front") {
    val df = Seq((1L, """{"id": 2}""")).toDF("id", "props")
    intercept[IllegalArgumentException] {
      graft.pipeline.SemiStructured.extractJson(df, "props", "id BIGINT")
    }
  }

  test("bigramLogprob: hand-computed add-1 bigram cross-entropy; short docs absent") {
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "b c"), (4L, "x"))
      .toDF("doc_id", "text")
    // bigrams: doc1 (a,b),(b,a),(a,b); doc2 (a,b); doc3 (b,c); doc4 none
    // cb(a,b)=3 cb(b,a)=1 cb(b,c)=1; cu(a)=3 cu(b)=2; V={a,b,c,x}=4
    val pab = 4.0 / 7.0  // (3+1)/(3+4)
    val pba = 2.0 / 6.0
    val pbc = 2.0 / 6.0
    val got = graft.pipeline.TextOps.bigramLogprob(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    def ce(ps: Double*): Double = -ps.map(math.log).sum / ps.size
    assert(math.abs(got(1L)._2 - ce(pab, pba, pab)) < 1e-12 && got(1L)._1 == 3)
    assert(math.abs(got(2L)._2 - ce(pab)) < 1e-12 && got(2L)._1 == 1)
    assert(math.abs(got(3L)._2 - ce(pbc)) < 1e-12 && got(3L)._1 == 1)
  }

  test("bigramLogprobHoldout: held-out doc pays the unseen floor; all-train equals base op") {
    // train: docs 1-2 over {a,b}; held-out doc 3 uses an unseen bigram
    val docs = Seq((1L, "a b a b", true), (2L, "a b", true), (3L, "c d", false))
      .toDF("doc_id", "text", "tr")
    val got = graft.pipeline.TextOps.bigramLogprobHoldout(docs, col("tr"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getDouble(3)))).toMap
    // train model: cb(a,b)=3 cb(b,a)=1; cu(a)=3 cu(b)=1; V={a,b}=2
    val pab = 4.0 / 5.0; val pba = 2.0 / 3.0
    def ce(ps: Double*): Double = -ps.map(math.log).sum / ps.size
    assert(math.abs(got(1L)._3 - ce(pab, pba, pab)) < 1e-12)
    assert(got(1L)._1 && got(1L)._2 == 3)
    // held-out (c,d): unseen bigram AND unseen context → (0+1)/(0+2)
    assert(math.abs(got(3L)._3 - ce(1.0 / 2.0)) < 1e-12)
    assert(!got(3L)._1)
    // held-out surprisal exceeds the in-model docs' — the gap the split exists to expose
    assert(got(3L)._3 > got(1L)._3 && got(3L)._3 > got(2L)._3)
    // trainCol ≡ true degenerates to bigramLogprob exactly
    val all = Seq((1L, "a b a b"), (2L, "a b"), (3L, "b c"))
      .toDF("doc_id", "text")
    val base = rowsOf(graft.pipeline.TextOps.bigramLogprob(all))
    val hold = rowsOf(graft.pipeline.TextOps
      .bigramLogprobHoldout(all, lit(true)).drop("is_train"))
    assert(hold == base)
  }

  test("sliceOverlap: exact trigram intersections, inclusion-exclusion union") {
    val docs = Seq(
      (1L, "a", "abc def"), (2L, "a", "abc xyz"),
      (3L, "b", "abc def"), (4L, "c", "zzzzz"))
      .toDF("doc_id", "src", "text")
    def tris(texts: String*): Set[String] = texts.flatMap(t =>
      t.sliding(3).toSeq).toSet
    val A = tris("abc def", "abc xyz")
    val B = tris("abc def")
    val C = tris("zzzzz")
    val got = graft.pipeline.TextOps.sliceOverlap(docs, "src")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6))).toMap
    assert(got(("a", "b")) == ((A.size.toLong, B.size.toLong,
      (A & B).size.toLong, (A | B).size.toLong,
      BigDecimal((A & B).size.toDouble / (A | B).size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // c shares no trigram with a or b: absent from the inner gram join
    assert(!got.contains(("a", "c")) && !got.contains(("b", "c")))
    assert((A & C).isEmpty && (B & C).isEmpty)
  }

  test("sliceOverlap fails fast above maxSlices with a routing hint") {
    val docs = (1L to 5L).map(i => (i, s"s$i", "abc def"))
      .toDF("doc_id", "src", "text")
    val e = intercept[Exception] {
      graft.pipeline.TextOps.sliceOverlap(docs, "src", maxSlices = 3).collect()
    }
    assert(e.getMessage.contains("maxSlices")
      || String.valueOf(e.getCause).contains("maxSlices"))
  }

  test("abTest: hash-replayed arms, exact counts, and the pooled z formula") {
    import graft.functions.PolyHash
    import graft.pipeline.Sampling
    // 400 users; conversion iff user id divisible by 3 — arm assignment is
    // the CW hash, replayed on the driver for the expected cell counts
    val events = (1L to 400L).flatMap { u =>
      Seq((u, "view", 0L)) ++
        (if (u % 3 == 0) Seq((u, "purchase", 1L)) else Nil)
    }.toDF("user_id", "event_type", "ts")
    val got = graft.ops.Experiment.abTest(events, "user_id",
      col("event_type") === "purchase").collect().head
    def arm(u: Long): String = {
      val b = ((PolyHash.hash(u.toString, 0L) * Sampling.saltMult("abtest")
        + Sampling.saltAdd("abtest")) % PolyHash.Mod) % Sampling.Buckets
      if (b < Sampling.Buckets / 2) "A" else "B"
    }
    val users = (1L to 400L).map(u => (arm(u), u % 3 == 0))
    val nA = users.count(_._1 == "A"); val cA = users.count(u => u._1 == "A" && u._2)
    val nB = users.count(_._1 == "B"); val cB = users.count(u => u._1 == "B" && u._2)
    assert(got.getAs[Long]("n_a") == nA && got.getAs[Long]("conv_a") == cA)
    assert(got.getAs[Long]("n_b") == nB && got.getAs[Long]("conv_b") == cB)
    assert(nA + nB == 400 && math.min(nA, nB) > 150, "the hash must split ~50/50")
    val pa = cA.toDouble / nA; val pb = cB.toDouble / nB
    val pooled = (cA + cB).toDouble / (nA + nB)
    val z = (pa - pb) / math.sqrt(pooled * (1.0 - pooled) * (1.0 / nA + 1.0 / nB))
    assert(math.abs(got.getAs[Double]("z") - z) < 1e-12)
    assert(got.getAs[Boolean]("significant") == (math.abs(z) > 1.96))
    // identical conversion behavior in both arms -> |z| small (sanity
    // against an assignment correlated with the outcome)
    assert(math.abs(z) < 1.96, "divisible-by-3 outcome must be independent of the hash arm")
    // degenerate design (everyone converts): the test is inapplicable —
    // null z, not significant, not a division-by-zero crash
    val allConv = (1L to 50L).map(u => (u, "purchase", 0L))
      .toDF("user_id", "event_type", "ts")
    val d = graft.ops.Experiment.abTest(allConv, "user_id",
      col("event_type") === "purchase").collect().head
    assert(d.isNullAt(d.fieldIndex("z")) && !d.getAs[Boolean]("significant"))
  }

  test("activeUsers: brute DAU/WAU parity, window dedup, partial early windows") {
    val day = 1000L
    // user 1 active days 0..9; user 2 days {0, 3}; user 3 day 7 twice
    val events = ((0 until 10).map(d => (1L, d.toLong * day + 17)) ++
      Seq((2L, 0L * day), (2L, 3L * day + 5), (3L, 7L * day), (3L, 7L * day + 999)))
      .toDF("user_id", "ts")
    val got = graft.ops.Retention.activeUsers(events, window = 7, dayNs = day)
      .collect().map(r => r.getAs[Long]("day") ->
        ((r.getAs[Long]("dau"), r.getAs[Long]("wau"),
          r.getAs[Double]("stickiness")))).toMap
    val active = Map(1L -> (0L to 9L).toSet, 2L -> Set(0L, 3L), 3L -> Set(7L))
    val days = active.values.flatten.toSet
    assert(got.keySet == days, "only days with activity are emitted")
    days.foreach { d =>
      val dau = active.count(_._2.contains(d)).toLong
      val wau = active.count { case (_, ds) =>
        ds.exists(a => a <= d && a >= d - 6) }.toLong
      assert(got(d)._1 == dau, s"day $d dau")
      assert(got(d)._2 == wau, s"day $d wau — a user active twice in the window counts once")
      assert(got(d)._3 == dau.toDouble / wau, s"day $d stickiness")
    }
    // spot the semantics: day 7 sees users 1 and 3 (dau 2) and user 2's
    // day-3 activity inside the trailing window (wau 3)
    assert(got(7L) == ((2L, 3L, 2.0 / 3)))
  }

  test("logregClassifier learns a separable label and matches a driver GD replay") {
    import graft.functions.PolyHash
    val aWords = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
    val bWords = Seq("uno", "dos", "tres", "cuatro", "cinco", "seis", "siete")
    val docs = (0 until 24).map { i =>
      val a = i % 2 == 0
      val ws = if (a) aWords else bWords
      (i.toLong, if (a) "ya" else "nb",
        (0 until 8).map(j => ws((i + j) % ws.length)).mkString(" "))
    }
    val df = docs.toDF("doc_id", "grp", "text")
    val got = TextOps.logregClassifier(df, col("grp") === "ya", dims = 64,
      iters = 8, lr = 0.5).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("y"), r.getAs[Double]("p"), r.getAs[Boolean]("pred")))).toMap
    // disjoint vocabularies are linearly separable: 8 standardized GD
    // rounds must classify every doc
    assert(got.size == 24)
    got.foreach { case (id, (y, _, pred)) =>
      assert(pred == (y == 1), s"doc $id misclassified") }
    // driver replay of the exact recursion: counts -> dense standardized
    // features (mu = S/n, var = SS/n - mu^2, sd = 1 when var <= 0) -> GD
    val dims = 64
    val sparse = docs.map { case (id, grp, text) =>
      val bs = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        .map(t => (PolyHash.hash(t, 0L) % dims).toInt)
      (id, if (grp == "ya") 1 else 0,
        bs.groupBy(identity).view.mapValues(_.length.toDouble).toMap)
    }
    val n = sparse.length.toDouble
    val mu = Array.tabulate(dims)(b => sparse.map(_._3.getOrElse(b, 0.0)).sum / n)
    val sd = Array.tabulate(dims) { b =>
      val s = sparse.map(_._3.getOrElse(b, 0.0)).sum
      val ss = sparse.map(d => { val c = d._3.getOrElse(b, 0.0); c * c }).sum
      val v = ss / n - (s / n) * (s / n)
      if (v > 0) math.sqrt(v) else 1.0
    }
    val fx = sparse.map { case (id, y, d) =>
      (id, y, Array.tabulate(dims)(b => (d.getOrElse(b, 0.0) - mu(b)) / sd(b)))
    }
    val w = Array.fill(dims)(0.0); var bias = 0.0
    def p(x: Array[Double]) = {
      var z = bias; var i = 0
      while (i < dims) { z += x(i) * w(i); i += 1 }
      1.0 / (1.0 + math.exp(-z))
    }
    for (_ <- 1 to 8) {
      val es = fx.map { case (_, y, x) => (x, p(x) - y) }
      bias -= 0.5 * (es.map(_._2).sum / n)
      for (b <- 0 until dims)
        w(b) -= 0.5 * (es.map { case (x, e) => e * x(b) }.sum / n)
    }
    fx.foreach { case (id, y, x) =>
      assert(math.abs(got(id)._2 - p(x)) < 1e-9, s"doc $id probability")
      assert(got(id)._1 == y)
    }
  }

  test("logregScoreFrozen over the persisted model equals train-inline scoring") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val label = TextOps.qualityScoreCol(col("text")) >= 0.6
    // train-once: the model relation round-trips through parquet (exact
    // doubles), then serve-many scores the SAME corpus from the frozen
    // file — must equal the train-inline scorer. 9-digit compare: the two
    // trainings collect float gradient aggregates independently, so the
    // final weights can differ in the last ulp (partial-merge order).
    val model = TextOps.logregTrain(docs, label)
    assert(model.count() == 65, "dims weights + the bias sentinel row")
    val dir = tmpDir("graft-clf-frozen")
    model.write.parquet(s"$dir/model")
    val frozen = TextOps.logregScoreFrozen(docs,
      spark.read.parquet(s"$dir/model"))
    val inline = TextOps.logregClassifier(docs, label)
      .select("doc_id", "p", "pred")
    assert(rowsOf9(frozen) == rowsOf9(inline))
    // a model with no bias sentinel must be rejected, not mis-scored
    intercept[IllegalArgumentException] {
      TextOps.logregScoreFrozen(docs,
        spark.read.parquet(s"$dir/model").where(col("b") >= 0))
    }
  }

  test("logregScoreFrozen kernel: bit-exact driver replay, exclusions, zero shuffles") {
    import graft.functions.PolyHash
    val docs = Seq((1L, "the quick brown fox"), (2L, "!!! ??? ---"),
      (3L, "alpha beta alpha"), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val dims = 8
    val w = Seq.tabulate(dims)(b => 0.1 * (b + 1) * (if (b % 2 == 0) 1 else -1))
    val mu = Seq.tabulate(dims)(b => 0.3 * b)
    val sd = Seq.tabulate(dims)(b => 0.5 + 0.25 * b)
    val bias = -0.375
    val model = ((-1, bias, 0.0, 1.0) +:
      (0 until dims).map(b => (b, w(b), mu(b), sd(b)))).toDF("b", "w", "mu", "sd")
    val scored = TextOps.logregScoreFrozen(docs, model)
    val got = scored.collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    // no-token (2) and null-text (4) docs are excluded, like training
    assert(got.keySet == Set(1L, 3L))
    // driver replay of the kernel's exact float-op sequence: counts →
    // (c−μ)/σ·w accumulated in bucket order → bias + dot → sigmoid
    // (StrictMath.exp — Catalyst's exp). Must match BIT-exactly.
    def replay(text: String): Double = {
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val c = new Array[Double](dims)
      toks.foreach(t => c((PolyHash.hash(t, 0L) % dims).toInt) += 1.0)
      var acc = 0.0
      for (b <- 0 until dims) acc += (c(b) - mu(b)) / sd(b) * w(b)
      1.0 / (1.0 + StrictMath.exp(-(bias + acc)))
    }
    assert(got(1L)._1 == replay("the quick brown fox"), "doc 1 bit-exact")
    assert(got(3L)._1 == replay("alpha beta alpha"), "doc 3 bit-exact")
    assert(got(1L)._2 == (got(1L)._1 >= 0.5))
    // the serve-many path is a NARROW map: no Exchange anywhere
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("cumulativeUsers: first-seen days, new-user counts, running total") {
    val day = 1000L
    // user 1 first day 0; user 2 first day 0 (later events ignored);
    // user 3 first day 3; user 4 first day 7
    val events = Seq((1L, 10L), (1L, 5L * day), (2L, 900L), (2L, 3L * day),
      (3L, 3L * day + 1), (4L, 7L * day + 500))
      .toDF("user_id", "ts")
    val got = graft.ops.Retention.cumulativeUsers(events, dayNs = day)
      .collect().map(r => (r.getAs[Long]("day"),
        r.getAs[Long]("new_users"), r.getAs[Long]("cumulative_users")))
      .sortBy(_._1)
    assert(got.toSeq == Seq((0L, 2L, 2L), (3L, 1L, 3L), (7L, 1L, 4L)),
      "only first-seen days appear; cumulative is the running distinct count")
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val old = Seq((1L, "a", "en"), (2L, "b", "en"), (3L, "c", "de"),
      (4L, null.asInstanceOf[String], "fr")).toDF("doc_id", "text", "lang")
    val nw = Seq((2L, "b", "en"), (3L, "c-edited", "de"),
      (4L, null.asInstanceOf[String], "fr"), (5L, "new", "en"))
      .toDF("doc_id", "text", "lang")
    val got = Profile.snapshotDiff(old, nw, "doc_id", Seq("text", "lang"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status"))
      .toMap
    // 2 unchanged (dropped), 4 has a null payload cell that must compare
    // equal to itself rather than flag as changed
    assert(got == Map(1L -> "removed", 3L -> "changed", 5L -> "added"))
  }
  test("winnowFingerprints equals brute robust winnowing (rightmost-min)") {
    import graft.functions.PolyHash
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (0L until 12L).map { id =>
      val n = 3 + rnd.nextInt(30) // includes docs shorter than k and < window grams
      (id, Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val (k, w) = (5, 4)
    val got = TextOps.winnowFingerprints(docs.toDF("doc_id", "text"), k, w)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("fp_pos"),
        r.getAs[Long]("fp"))).toSet
    val expect = docs.flatMap { case (id, text) =>
      val toks = text.split(" ").toVector
      val hs = (0 to toks.length - k)
        .map(i => PolyHash.hash(toks.slice(i, i + k).mkString(" "), 0L))
      if (hs.isEmpty) Seq.empty
      else {
        // brute: every window of w gram hashes (or the whole stream if
        // shorter) picks its min, rightmost position on ties
        val starts = if (hs.length <= w) Seq(0) else 0 to hs.length - w
        starts.map { st =>
          val win = hs.slice(st, st + w)
          val m = win.min
          val rp = st + win.lastIndexOf(m)
          (id, rp.toLong, m)
        }.distinct
      }
    }.toSet
    assert(got == expect, s"got ${got.size} expect ${expect.size}")
    // degenerate inputs contribute no rows (null text nulls the kernel,
    // empty/short text yields an empty fingerprint array)
    val edge = Seq((1L, null: String), (2L, ""), (3L, "one two")).toDF("doc_id", "text")
    assert(TextOps.winnowFingerprints(edge, k, w).count() == 0)
  }

  test("shingle kernel matches the HOF chain it replaces, including null text") {
    val df = Seq(
      (1L, "the cat sat on the mat the cat sat"),
      (2L, "a b a b a b"),
      (3L, null: String),
      (4L, ""),
      (5L, "only two")
    ).toDF("doc_id", "text")
    val k = 3
    val hofRaw = TextOps.shingles(TextOps.tokens(col("text")), k)
    val rows = df.select(col("doc_id"),
        TextOps.textShingles(col("text"), k).as("kr"), hofRaw.as("hr"),
        TextOps.textShingleSet(col("text"), k).as("kd"),
        array_distinct(hofRaw).as("hd"),
        TextOps.textShingleSortedSet(col("text"), k).as("ks"),
        array_sort(array_distinct(hofRaw)).as("hs"))
      .collect()
    rows.foreach { r =>
      for ((a, b) <- Seq((1, 2), (3, 4), (5, 6))) {
        assert(r.getSeq[String](a) == r.getSeq[String](b),
          s"doc ${r.getLong(0)} col $a: ${r.getSeq[String](a)} != ${r.getSeq[String](b)}")
      }
    }
  }

  test("winnowNearDups: shared-run guarantee and posting-list cap") {
    // base doc of 40 distinct-ish tokens; copy shares a long middle run
    val toks = (0 until 40).map(i => s"w$i")
    val a = toks.mkString(" ")
    val b = (Seq("x1", "x2", "x3") ++ toks.slice(10, 30) ++ Seq("y1", "y2", "y3")).mkString(" ")
    val c = (0 until 40).map(i => s"z$i").mkString(" ") // unrelated
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val pairs = TextOps.winnowNearDups(df, minShared = 1)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // shared run of 20 tokens >= k + window - 1 = 8 → guaranteed shared fp
    assert(pairs == Set((1L, 2L)))
    // cap: a fingerprint shared by everything carries no pair signal —
    // with maxDf = 2 identical triplets produce no pairs
    val same = Seq((1L, a), (2L, a), (3L, a)).toDF("doc_id", "text")
    assert(TextOps.winnowNearDups(same, minShared = 1, maxDf = 2).count() == 0)
    assert(TextOps.winnowNearDups(same, minShared = 1, maxDf = 3).count() == 3)
  }

  test("typoPairs: deletion blocking is exact for edit distance 1") {
    val vocab = Seq(
      ("walrus", 5L), ("walrusx", 2L),  // insertion at end
      ("wxlrus", 1L),                   // substitution at pos 2
      ("awlrus", 1L),                   // transposition: ED 2, candidate but rejected
      ("melon", 9L), ("lemon", 4L),     // anagram, ED 2 (transposition-ish collision)
      ("orange", 3L))                   // unrelated
      .toDF("word", "cnt")
    val got = TextOps.typoPairs(vocab, minLen = 5)
      .collect().map(r => (r.getAs[String]("word_a"), r.getAs[String]("word_b")))
      .toSet
    assert(got == Set(("walrus", "walrusx"), ("walrus", "wxlrus")),
      s"got $got — ED-2 transpositions/anagrams must be verified away")
  }
  test("skipgrams counts directed window pairs") {
    val df = Seq((1L, "a b c a b"), (2L, "x")).toDF("doc_id", "text")
    val got = TextOps.skipgrams(df, window = 2)
      .collect().map(r => (r.getAs[String]("word"), r.getAs[String]("context"))
        -> r.getAs[Long]("n")).toMap
    // d=1: (a,b) (b,c) (c,a) (a,b); d=2: (a,c) (b,a) (c,b); "x" too short
    assert(got == Map(("a", "b") -> 2L, ("b", "c") -> 1L, ("c", "a") -> 1L,
      ("a", "c") -> 1L, ("b", "a") -> 1L, ("c", "b") -> 1L), s"got $got")
  }
  test("Cdc.latestState applies upserts, deletes, inserts last-writer-wins") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val log = Seq(
      (1L, "a2", 1L, "U"), (1L, "a3", 2L, "U"), // two versions: seq 2 wins
      (2L, null.asInstanceOf[String], 1L, "D"), // delete
      (4L, "d", 1L, "I"))                       // insert of a new id
      .toDF("doc_id", "text", "seq", "op")
    val got = graft.ops.Cdc.latestState(base, log)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    assert(got == Map(1L -> "a3", 3L -> "c", 4L -> "d"), s"got $got")
  }

  test("Cdc.scd2 emits version intervals; deletes close the predecessor") {
    val log = Seq(
      (1L, "a1", 10L, "I"), (1L, "a2", 20L, "U"),
      (1L, null.asInstanceOf[String], 30L, "D"),
      (2L, "b1", 5L, "I"))
      .toDF("doc_id", "text", "seq", "op")
    val got = graft.ops.Cdc.scd2(log)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Long]("valid_from"), r.getAs[Long]("valid_to"),
        r.getAs[Boolean]("is_current"))).toSet
    assert(got == Set(
      (1L, "a1", 10L, 20L, false),
      (1L, "a2", 20L, 30L, false),   // closed by the delete, no current row
      (2L, "b1", 5L, Long.MaxValue, true)), s"got $got")
  }
  test("volumeAnomaly flags a planted volume spike; degenerate groups stay null") {
    val day = 1000L
    // type "a": 5 events/day for 9 days, 50 on day 9 (the spike);
    // type "b": one day only (no variance -> null z, never flags);
    // type "c": 5 events/day for days 0..8 EXCEPT day 4 — a complete
    // outage day, which must materialize as a zero-count row and flag
    val rows = (0 until 9).flatMap(d => (0 until 5).map(i =>
        ("a", d.toLong * day + i))) ++
      (0 until 50).map(i => ("a", 9L * day + i)) ++
      (0 until 3).map(i => ("b", i.toLong)) ++
      (0 until 9).filter(_ != 4).flatMap(d => (0 until 5).map(i =>
        ("c", d.toLong * day + i)))
    val got = Profile.volumeAnomaly(rows.toDF("event_type", "ts"),
        groupCol = "event_type", dayNs = day)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("day")) ->
        ((r.getAs[Long]("n_events"), Option(r.getAs[java.lang.Double]("z")),
          r.getAs[Boolean]("is_anomaly")))).toMap
    assert(got(("a", 9L))._1 == 50L)
    assert(got(("a", 9L))._3, "the spike day must flag")
    (0 until 9).foreach(d => assert(!got(("a", d.toLong))._3, s"day $d"))
    assert(got(("b", 0L))._2.isEmpty && !got(("b", 0L))._3,
      "single-day group has no variance: null z, no flag")
    // the outage: densified to n_events = 0; z = (0 - 40/9)/sqrt(200/72)
    assert(got(("c", 4L))._1 == 0L, "zero-event day must exist in the grid")
    assert(got(("c", 4L))._3, "a complete outage day must flag")
    (0 until 9).filter(_ != 4).foreach(d =>
      assert(!got(("c", d.toLong))._3, s"steady c day $d must not flag"))
    assert(!got.contains(("c", 9L)),
      "days outside a group's [min, max] span stay absent")
  }
  test("zipfFit recovers a planted power law and replays on the driver") {
    // term k (1-based) appears exactly 840/k times (840 divisible by 1..8) -> slope −1
    val words = (1 to 8).flatMap(k => Seq.fill(840 / k)(s"w$k"))
    val df = Seq((1L, words.mkString(" "), "s1")).toDF("doc_id", "text", "source")
    val row = TextOps.zipfFit(df, topN = 100).collect().head
    assert(row.getAs[Long]("n_terms") == 8L)
    val slope = row.getAs[Double]("zipf_slope")
    // counts 840/k are exact integers for k = 1..8
    assert(math.abs(slope - (-1.0)) < 1e-9, s"slope $slope")

    // driver replay of the exact regression arithmetic on a messier corpus
    val words2 = (1 to 7).flatMap(k => Seq.fill(100 / k)(s"v$k"))
    val df2 = Seq((1L, words2.mkString(" "), "s2")).toDF("doc_id", "text", "source")
    val got2 = TextOps.zipfFit(df2, topN = 100).collect().head.getAs[Double]("zipf_slope")
    val cnts = (1 to 7).map(k => 100 / k)
    val pts = cnts.sorted(Ordering[Int].reverse).zipWithIndex
      .map { case (c, i) => (math.log((i + 1).toDouble), math.log(c.toDouble)) }
    val init = (pts.head._1, pts.head._2, pts.head._1 * pts.head._2, pts.head._1 * pts.head._1)
    val (sx, sy, sxy, sxx) = pts.tail.foldLeft(init) { case ((a, b, c2, d), (x, y)) =>
      (a + x, b + y, c2 + x * y, d + x * x)
    }
    val n = pts.length
    assert(got2 == (n * sxy - sx * sy) / (n * sxx - sx * sx), s"got $got2")
  }
  test("equiDepth: discrete decile boundaries, tiny groups share rows") {
    // group "a": values 1..20 -> decile k boundary = value at rank 2k
    val a = (1 to 20).map(v => ("a", v.toDouble, v.toLong))
    // group "b": 3 rows < 10 buckets -> several buckets share target ranks
    val b = Seq(("b", 5.0, 1L), ("b", 1.0, 2L), ("b", 9.0, 3L))
    val df = (a ++ b).toDF("grp", "v", "id")
    val got = Profile.equiDepth(df, "grp", "v", "id")
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("bucket")) ->
        ((r.getAs[Double]("upper_value"), r.getAs[Long]("n_rows")))).toMap
    (1 to 10).foreach { k =>
      assert(got(("a", k.toLong)) == ((2.0 * k, 20L)), s"bucket $k")
    }
    // n=3: target ranks max(3k/10, 1) = 1,1,1,1,1,1,2,2,2,3
    assert(got(("b", 1L))._1 == 1.0 && got(("b", 6L))._1 == 1.0)
    assert(got(("b", 7L))._1 == 5.0 && got(("b", 9L))._1 == 5.0)
    assert(got(("b", 10L))._1 == 9.0)
    assert(got.keys.count(_._1 == "b") == 10)
  }
  test("rfm: rank quintiles with 5 best; anchor is the stream max ts") {
    val day = 1000L
    // 5 users, one purchase column each designed to give distinct ranks
    val ev = Seq(
      (1L, 9L * day, "purchase", 500.0),  // most recent, low value
      (2L, 7L * day, "purchase", 100.0),
      (2L, 8L * day, "purchase", 100.0),  // 2 purchases
      (3L, 5L * day, "purchase", 900.0),  // top monetary
      (4L, 2L * day, "purchase", 50.0),
      (5L, 0L * day, "purchase", 10.0),   // oldest, poorest
      (5L, 1L * day, "click", 99999.0))   // non-conversions are ignored
      .toDF("user_id", "ts", "event_type", "value")
    val got = graft.ops.Retention.rfm(ev, col("event_type") === "purchase",
        dayNs = day)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("recency_days"), r.getAs[Long]("frequency"),
          r.getAs[Double]("monetary"), r.getAs[Int]("r_score"),
          r.getAs[Int]("f_score") * 10 + r.getAs[Int]("m_score"),
          r.getAs[Int]("rfm")))).toMap
    // anchor = day 9 (user 1's purchase); clicks don't move it
    assert(got(1L)._1 == 0L && got(5L)._1 == 9L)
    assert(got(2L)._2 == 2L, "frequency counts conversions only")
    // rank quintiles over n=5: score = 5 - (rank-1)
    assert(got(1L)._4 == 5 && got(5L)._4 == 1, "recency quintiles")
    assert(got(3L)._5 % 10 == 5, "top monetary scores 5")
    assert(got(1L)._6 == got(1L)._4 * 100 + got(1L)._5,
      s"rfm code composes: ${got(1L)}")
  }
  test("rfm: a NaN purchase value cannot claim the best monetary rank") {
    val ev = Seq(
      (1L, 0L, "purchase", Double.NaN),   // NaN excluded from monetary
      (1L, 10L, "purchase", 5.0),
      (2L, 20L, "purchase", 100.0),       // the true top spender
      (3L, 30L, "purchase", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
    val got = graft.ops.Retention.rfm(ev, col("event_type") === "purchase")
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Double]("monetary"), r.getAs[Long]("frequency"),
          r.getAs[Int]("m_score")))).toMap
    assert(got(1L)._1 == 5.0, "NaN value must not enter the monetary sum")
    assert(got(1L)._2 == 2L, "the NaN conversion still counts as frequency")
    assert(got(2L)._3 == 5, "the real top spender keeps the best m_score")
    assert(got(2L)._3 > got(1L)._3)
  }
  test("rfm: an all-NaN user reads null monetary and the WORST m rank") {
    val ev = Seq(
      (1L, 0L, "purchase", Double.NaN),   // every value NaN -> monetary null
      (2L, 10L, "purchase", 100.0),
      (3L, 20L, "purchase", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
    val rows = graft.ops.Retention.rfm(ev, col("event_type") === "purchase")
      .collect()
    val m = rows.map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("m_score")).toMap
    val u1 = rows.find(_.getAs[Long]("user_id") == 1L).get
    assert(u1.isNullAt(u1.fieldIndex("monetary")),
      "all-NaN monetary must be null, not NaN (the sentinel pin)")
    assert(m(1L) == rows.map(_.getAs[Int]("m_score")).min,
      s"null monetary must take the worst m rank: $m")
    assert(m(2L) == 5, "the real top spender keeps the best m_score")
  }
  test("ltv: a NaN purchase contributes no revenue and cannot poison the curve") {
    val day = 1000L
    val ev = Seq(
      (1L, 0L, "purchase", 10.0),
      (1L, day, "purchase", Double.NaN),  // excluded — revenue 0.0 that day
      (1L, 2 * day, "purchase", 20.0))
      .toDF("user_id", "ts", "event_type", "value")
    val got = graft.ops.Retention.ltv(ev, col("event_type") === "purchase",
        dayNs = day)
      .collect().map(r => r.getAs[Long]("day_offset") ->
        ((r.getAs[Double]("revenue"), r.getAs[Double]("cum_revenue")))).toMap
    assert(got(1L) == ((0.0, 10.0)), s"NaN day reads 0 revenue: $got")
    assert(got(2L) == ((20.0, 30.0)), "later offsets stay finite")
  }
  test("linearAttribution: a NaN conversion keeps its touches but credits no revenue") {
    val h = 3600L
    val ev = Seq(
      (1L, 100L, "click", 0.0), (1L, 300L, "purchase", Double.NaN),
      (2L, 150L, "click", 0.0), (2L, 400L, "purchase", 40.0),
      (3L, 900L, "purchase", Double.NaN)) // organic NaN conversion
      .toDF("user_id", "ts", "event_type", "value")
      .withColumn("event_id", col("ts") + col("user_id"))
    val got = graft.ops.Funnel.linearAttribution(ev, windowNs = h,
        dayNs = 1000L)
      .collect().map { r =>
        val cr = if (r.isNullAt(r.fieldIndex("credited_revenue"))) None
          else Some(r.getAs[Double]("credited_revenue"))
        r.getAs[Long]("day") -> ((r.getAs[Long]("n_touches"), cr))
      }.toMap
    assert(got(0L) == ((2L, Some(40.0))),
      s"NaN credit drops out of the day sum, real credit stays: $got")
    assert(got(-1L) == ((1L, None)),
      "an organic all-NaN bucket counts the conversion, revenue null")
  }
  test("linearAttribution splits credit evenly; untouched conversions go organic") {
    val h = 3600L
    val ev = Seq(
      // user 1: two clicks (day 0) then a 90.0 purchase inside the window
      (1L, 100L, "click", 0.0), (1L, 200L, "click", 0.0),
      (1L, 300L, "purchase", 90.0),
      // user 2: click too OLD (outside window) -> organic purchase 50.0
      (2L, 0L, "click", 0.0), (2L, 5000L, "purchase", 50.0),
      // user 3: purchase with no click at all -> organic 10.0
      (3L, 700L, "purchase", 10.0))
      .toDF("user_id", "ts", "event_type", "value")
      .withColumn("event_id", col("ts") + col("user_id"))
    val got = graft.ops.Funnel.linearAttribution(ev, windowNs = h,
        dayNs = 1000L)
      .collect().map(r => r.getAs[Long]("day") ->
        ((r.getAs[Long]("n_touches"), r.getAs[Double]("credited_revenue"))))
      .toMap
    assert(got(0L) == ((2L, 90.0)), s"both day-0 touches split the 90: $got")
    assert(got(-1L) == ((2L, 60.0)), "stale-click and no-click purchases are organic")
  }

  test("degreeDistribution counts both endpoints") {
    // path 1-2-3 plus isolated edge 4-5: degrees 1,2,1,1,1
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val got = graft.pipeline.Components.degreeDistribution(edges)
      .collect().map(r => r.getAs[Long]("degree") -> r.getAs[Long]("n_nodes"))
      .toMap
    assert(got == Map(1L -> 4L, 2L -> 1L))
  }
  test("ltv: revenue accumulates along offsets, normalized per cohort member") {
    val day = 1000L
    val ev = Seq(
      // cohort day 0: users 1, 2 — u1 buys 10 on day 0 and 20 on day 2;
      // u2 clicks only (revenue 0 but creates the day-1 offset cell)
      (1L, 10L, "purchase", 10.0), (1L, 2 * day, "purchase", 20.0),
      (2L, 500L, "click", 0.0), (2L, day + 1, "click", 0.0),
      // cohort day 5: user 3 buys 8 immediately
      (3L, 5 * day, "purchase", 8.0))
      .toDF("user_id", "ts", "event_type", "value")
    val got = graft.ops.Retention.ltv(ev, col("event_type") === "purchase",
        dayNs = day)
      .collect().map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset")) ->
        ((r.getAs[Double]("revenue"), r.getAs[Double]("cum_revenue"),
          r.getAs[Long]("cohort_size"), r.getAs[Double]("ltv")))).toMap
    assert(got((0L, 0L)) == ((10.0, 10.0, 2L, 5.0)))
    assert(got((0L, 1L)) == ((0.0, 10.0, 2L, 5.0)), "no-revenue offset carries the total")
    assert(got((0L, 2L)) == ((20.0, 30.0, 2L, 15.0)))
    assert(got((5L, 0L)) == ((8.0, 8.0, 1L, 8.0)))
  }

  test("readability: hand-computed Flesch on planted docs; vowel-less tokens floor at 1 syllable") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat. It ran fast!"),  // 6 words, 2 sentences, 6 syllables
      (2L, "7 dogs."),                    // "7" has no vowels -> floors at 1
      (3L, ""),                           // no words -> dropped
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = graft.pipeline.TextOps.readability(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_sentences"),
          r.getAs[Long]("n_syllables"), r.getAs[Double]("flesch_ease"),
          r.getAs[Double]("fk_grade")))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L)._1 == 6L && got(1L)._2 == 2L && got(1L)._3 == 6L)
    assert(math.abs(got(1L)._4 - (206.835 - 1.015 * 3.0 - 84.6 * 1.0)) < 1e-12)
    assert(math.abs(got(1L)._5 - (0.39 * 3.0 + 11.8 * 1.0 - 15.59)) < 1e-12)
    assert(got(2L)._1 == 2L && got(2L)._2 == 1L && got(2L)._3 == 2L,
      s"digit-run token must contribute exactly 1 syllable: ${got(2L)}")
  }

  test("powerPlan: exact formula replay, powered boundary honest, impossible targets null") {
    import spark.implicits._
    // 100 users, 20 convert (p1 = 0.2 exactly); one extra event per user
    // must not double-count conversion (max per user)
    val ev = (1L to 100L).flatMap(u =>
      Seq((u, "view", 0.0), (u, if (u <= 20) "buy" else "view", 200.0)))
      .toDF("user_id", "event_type", "value")
    val got = graft.ops.Experiment.powerPlan(ev, "user_id",
      col("event_type") === "buy" && col("value") > 150,
      effects = Seq(0.05, 0.10, 0.85)).collect()
      .map(r => r.getAs[Double]("effect") ->
        ((r.getAs[Long]("n_users"), r.getAs[Double]("p_base"),
          Option(r.getAs[java.lang.Long]("n_required")).map(_.longValue),
          r.getAs[Long]("n_available"),
          Option(r.getAs[java.lang.Boolean]("powered")).map(_.booleanValue))))
      .toMap
    def nReq(p1: Double, d: Double): Long = {
      val p2 = p1 + d
      math.ceil(graft.ops.Experiment.PowerKappa
        * (p1 * (1.0 - p1) + p2 * (1.0 - p2)) / (d * d)).toLong
    }
    assert(got(0.05)._1 == 100L && got(0.05)._2 == 0.2)
    assert(got(0.05)._3.contains(nReq(0.2, 0.05)), s"${got(0.05)}")
    assert(got(0.05)._4 == 50L)
    // ~2600 users/arm needed for a 5-point lift at p=0.2 — 50 cannot power it
    assert(got(0.05)._5.contains(false))
    assert(got(0.10)._3.contains(nReq(0.2, 0.10)))
    assert(got(0.10)._5.contains(50L >= nReq(0.2, 0.10)))
    // p_target = 1.05: meaningless design reports nulls
    assert(got(0.85)._3.isEmpty && got(0.85)._5.isEmpty)
    intercept[IllegalArgumentException](
      graft.ops.Experiment.powerPlan(ev, "user_id", lit(true),
        effects = Seq(1.5)))
  }

  test("completeness: disjoint null/nan/empty counters per column; arrays, strings, doubles covered") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("x"), Some(1.5), Some(Seq(1, 2))),
      (None, Some(""), Some(Double.NaN), Some(Seq.empty[Int])),
      (Some(3L), None, None, None),
      (Some(4L), Some("y"), Some(2.5), Some(Seq(3)))
    ).toDF("id", "s", "d", "arr")
    val got = Profile.completeness(df).collect()
      .map(r => r.getAs[String]("col_name") ->
        ((r.getAs[String]("dtype"), r.getAs[Long]("n_total"),
          r.getAs[Long]("n_null"), r.getAs[Long]("n_nan"),
          r.getAs[Long]("n_empty"), r.getAs[Double]("complete_rate")))).toMap
    assert(got("id") == (("bigint", 4L, 1L, 0L, 0L, 0.75)))
    assert(got("s") == (("string", 4L, 1L, 0L, 1L, 0.5)))
    assert(got("d") == (("double", 4L, 1L, 1L, 0L, 0.5)))
    assert(got("arr") == (("array<int>", 4L, 1L, 0L, 1L, 0.5)))
    assert(got.size == 4)
  }

  test("minhashEval: identical twins all recalled, disjoint pairs ignored, fp zero, guard raises") {
    import spark.implicits._
    // 3 exact-duplicate pairs (jaccard 1.0 -> always banded together),
    // plus unrelated docs sharing nothing above threshold
    val dup = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight nine"),
      (4L, "one two three four five six seven eight nine"),
      (5L, "red orange yellow green blue indigo violet pink"),
      (6L, "red orange yellow green blue indigo violet pink"))
    val noise = (7L to 12L).map(i =>
      (i, s"unique${i}a unique${i}b unique${i}c unique${i}d unique${i}e"))
    val docs = (dup ++ noise).toDF("doc_id", "text")
    val r = graft.pipeline.Dedup.minhashEval(docs).collect().head
    assert(r.getAs[Long]("n_true") == 3L, s"truth pairs: $r")
    assert(r.getAs[Long]("fp") == 0L, "candidates verify with the same exact jaccard")
    assert(r.getAs[Long]("tp") == 3L && r.getAs[Long]("fn") == 0L,
      "identical signatures always share every band")
    assert(r.getAs[Double]("precision") == 1.0)
    assert(r.getAs[Double]("recall") == 1.0)
    val ex = intercept[Exception](
      graft.pipeline.Dedup.minhashEval(docs, maxDocs = 5).collect())
    assert(ex.getMessage.contains("minhashEval") ||
      Option(ex.getCause).exists(_.getMessage.contains("minhashEval")))
  }

  test("lshPlan: exact S-curve replay, divisor grid, sharpest qualifying banding chosen") {
    val got = graft.pipeline.Dedup.lshPlan(spark, nHashes = 32, targetJaccard = 0.8).collect()
      .map(r => r.getAs[Int]("bands") ->
        ((r.getAs[Int]("rows_per_band"), r.getAs[Double]("p_target"),
          r.getAs[Double]("p_noise"), r.getAs[Boolean]("qualifies"),
          r.getAs[Boolean]("chosen")))).toMap
    assert(got.keySet == Set(1, 2, 4, 8, 16, 32), "divisor grid of 32")
    def pow(b: Double, e: Int): Double = (1 to e).foldLeft(1.0)((a, _) => a * b)
    def p(s: Double, b: Int, r: Int): Double = 1.0 - pow(1.0 - pow(s, r), b)
    got.foreach { case (b, (r, pt, pn, q, _)) =>
      assert(b * r == 32)
      assert(pt == p(0.8, b, r), s"b=$b p_target $pt vs ${p(0.8, b, r)}")
      assert(pn == p(0.3, b, r), s"b=$b p_noise $pn vs ${p(0.3, b, r)}")
      assert(q == (pt >= 0.9))
    }
    // sharpest qualifying: the largest r with p_target >= 0.9
    val bestR = got.values.filter(_._4).map(_._1).max
    got.foreach { case (_, (r, _, _, q, chosen)) =>
      assert(chosen == (q && r == bestR))
    }
    assert(got.values.count(_._5) == 1, "exactly one chosen banding")
    // the repo's own 8x4 default must catch target pairs reliably
    assert(got(8)._2 > 0.95, s"8x4 p_target ${got(8)._2}")
    intercept[IllegalArgumentException](
      graft.pipeline.Dedup.lshPlan(spark, nHashes = 0, targetJaccard = 0.8))
    intercept[IllegalArgumentException](
      graft.pipeline.Dedup.lshPlan(spark, nHashes = 32, targetJaccard = 1.0))
  }

  test("benford: all-ones corpus rejects with exact chi2; dense grid; zero and null excluded") {
    import spark.implicits._
    // group "ones": 20 values all leading with digit 1 across magnitudes
    // (n = 5 would sit below the df-8 critical: chi2 = 8.11 + 3.50 ~= 11.6);
    // group "mix": one value per digit 1..9 (flat), n = 9
    val ones = (Seq(0.19, 1999.99) ++ (1 to 18).map(i => 100.0 + i))
      .map(("ones", _))
    val mix = (1 to 9).map(d => ("mix", d * 10.0))
    val df = (ones ++ mix).toDF("g", "v")
      .unionByName(Seq(("ones", 0.0)).toDF("g", "v"))
      .unionByName(Seq("ones").toDF("g").select(col("g"),
        lit(null).cast("double").as("v")))
    val got = Profile.benford(df, "g", "v").collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Int]("digit")) ->
        ((r.getAs[Long]("n_total"), r.getAs[Long]("n_obs"),
          r.getAs[Double]("obs_share"), r.getAs[Double]("exp_share"),
          r.getAs[Double]("chi2"), r.getAs[Boolean]("reject_benford")))).toMap
    assert(got.size == 18, "dense 9-digit grid per group")
    // zero cents and null excluded: n_total for "ones" is 20, not 22
    assert(got(("ones", 1))._1 == 20L && got(("ones", 1))._2 == 20L)
    assert(got(("ones", 1))._3 == 1.0)
    assert(got(("ones", 7))._2 == 0L, "missing digit still on the grid")
    // exact chi2 replay for "ones": obs = (20,0,...,0)
    val ps = (1 to 9).map(d => math.log(1.0 + 1.0 / d) / math.log(10.0))
    assert(math.abs(ps.sum - 1.0) < 1e-12)
    val chiOnes = (1 to 9).map { d =>
      val e = 20.0 * ps(d - 1)
      val o = if (d == 1) 20.0 else 0.0
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(got(("ones", 1))._5 - chiOnes) < 1e-9)
    assert(got(("ones", 1))._6, "all-ones must reject")
    assert(math.abs(got(("ones", 3))._4 - ps(2)) < 1e-15)
    // mix: n=9, each digit observed once, shares 1/9
    assert(got(("mix", 5))._1 == 9L && got(("mix", 5))._2 == 1L)
    assert(math.abs(got(("mix", 5))._3 - 1.0 / 9.0) < 1e-15)
    val chiMix = (1 to 9).map { d =>
      val e = 9.0 * ps(d - 1); (1.0 - e) * (1.0 - e) / e
    }.sum
    assert(math.abs(got(("mix", 2))._5 - chiMix) < 1e-9)
    assert(got(("mix", 2))._6 == (chiMix > Profile.BenfordChiSq95Df8))
  }

  test("crosstab: exact counts, zero-filled cells, explicit column order; dup values rejected") {
    import graft.pipeline.Profile
    val d = Seq(("s1", "en"), ("s1", "en"), ("s1", "de"), ("s2", "en"))
      .toDF("source", "lang")
    val got = Profile.crosstab(d, "source", "lang", Seq("de", "en", "fr"))
    assert(got.columns.toSeq == Seq("source", "de", "en", "fr"))
    val m = got.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m == Map("s1" -> ((1L, 2L, 0L)), "s2" -> ((0L, 1L, 0L))), m.toString)
    intercept[IllegalArgumentException] {
      Profile.crosstab(d, "source", "lang", Seq("en", "en"))
    }
  }
}
