package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Sketches, TextOps}

/** Semantics of the KMV distinct sketch and the duplicated-n-gram span
  * operators: estimator accuracy vs exact distinct, exact-below-k,
  * determinism under layout, span geometry and overlap-safe coverage.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("kmvDistinct is exact below k and within sampling error above") {
    // groups sized well below and well above k=64
    val rows = (0 until 40).map(i => ("small", s"u$i")) ++
      (0 until 5000).map(i => ("large", s"v${i % 3000}"))
    val df = rows.toDF("grp", "user")
    val out = Sketches.kmvDistinct(df, k = 64, Seq("grp"), "user")
      .collect().map(r => r.getString(0) -> r).toMap
    val small = out("small")
    assert(small.getAs[Long]("n_kept") == 40L)
    assert(small.getAs[Double]("est_distinct") == 40.0,
      "below k the sketch must report the exact distinct count")
    val large = out("large")
    assert(large.getAs[Long]("n_kept") == 64L)
    val est = large.getAs[Double]("est_distinct")
    // k=64 ⇒ relative σ ≈ 1/√62 ≈ 12.7%; allow 4σ
    assert(math.abs(est - 3000.0) / 3000.0 < 0.51,
      s"est $est too far from true 3000")
  }

  test("kmvDistinct is layout-invariant and duplicate-insensitive") {
    val base = (0 until 1000).map(i => ("g", s"u${i % 400}"))
    val a = Sketches.kmvDistinct(base.toDF("grp", "user"), 32, Seq("grp"), "user")
      .collect().head
    // shuffled layout + extra duplicates: identical sketch
    val b = Sketches.kmvDistinct(
      (base.reverse ++ base.take(200)).toDF("grp", "user").repartition(7),
      32, Seq("grp"), "user").collect().head
    assert(a.getAs[Long]("kth_min") == b.getAs[Long]("kth_min"))
    assert(a.getAs[Double]("est_distinct") == b.getAs[Double]("est_distinct"))
  }

  test("kmvPairJaccard is exact below k and tracks true overlap above") {
    // exact regime: |A|=30, |B|=40, |A∩B|=20 -> union 50 < k=128, so the
    // union sketch IS the union and every figure is exact
    val exact = (0 until 30).map(i => ("A", s"s$i")) ++
      (10 until 50).map(i => ("B", s"s$i"))
    val e = Sketches.kmvPairJaccard(exact.toDF("grp", "v"), 128, "grp", "v")
      .collect().head
    assert(e.getAs[String]("grp_a") == "A" && e.getAs[String]("grp_b") == "B")
    assert(e.getAs[Long]("n_union_kept") == 50L)
    assert(e.getAs[Long]("n_common") == 20L)
    assert(e.getAs[Double]("union_est") == 50.0)
    assert(e.getAs[Double]("jaccard_est") == 0.4)
    assert(math.abs(e.getAs[Double]("inter_est") - 20.0) < 1e-9)
    // estimator regime: 2000 vs 2000 with 1000 shared -> union 3000,
    // true jaccard 1/3; σ(J) ≈ √(J(1−J)/k) ≈ 0.042, allow ~4σ
    val big = (0 until 2000).map(i => ("A", s"x$i")) ++
      (1000 until 3000).map(i => ("B", s"x$i"))
    val g = Sketches.kmvPairJaccard(big.toDF("grp", "v"), 128, "grp", "v")
      .collect().head
    assert(math.abs(g.getAs[Double]("jaccard_est") - 1.0 / 3) < 0.17,
      s"jaccard ${g.getAs[Double]("jaccard_est")}")
    assert(math.abs(g.getAs[Double]("union_est") - 3000.0) / 3000.0 < 0.5,
      s"union ${g.getAs[Double]("union_est")}")
    assert(math.abs(g.getAs[Double]("inter_est") - 1000.0) / 1000.0 < 0.6,
      s"inter ${g.getAs[Double]("inter_est")}")
  }

  test("hllDistinct: estimate tracks exact distinct; duplicate-insensitive") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketches.hllDistinct(events, p = 10, Seq("event_type"), "user_id")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("est_distinct")).toMap
    assert(est.keySet == exact.keySet)
    // m = 1024 → σ ≈ 1.04/√m ≈ 3.25%; allow ~4σ
    exact.foreach { case (k, n) =>
      val rel = math.abs(est(k) - n) / n.toDouble
      assert(rel < 0.13, s"$k: est ${est(k)} vs exact $n (rel $rel)")
    }
    // duplicates are a register-max no-op: the doubled stream sketches
    // identically, bit for bit
    val doubled = Sketches.hllDistinct(events.unionAll(events), p = 10,
      Seq("event_type"), "user_id")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("est_distinct")).toMap
    assert(doubled == est)
  }

  test("distinctProfile: exact columns exact, estimate tracks, nulls excluded, est == hllDistinct") {
    import graft.pipeline.Profile
    val df = (1L to 900L).map(i =>
      (i, s"u${i % 30}", if (i % 10 == 0) null else s"t${i % 7}"))
      .toDF("id", "usr", "typ")
    val got = Profile.distinctProfile(df, Seq("id", "usr", "typ"))
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    assert(got.keySet == Set("id", "usr", "typ"))
    assert(got("id").getAs[Long]("n_nonnull") == 900L
      && got("id").getAs[Long]("exact_distinct") == 900L)
    assert(got("usr").getAs[Long]("exact_distinct") == 30L)
    // nulls excluded from both counts
    assert(got("typ").getAs[Long]("n_nonnull") == 810L
      && got("typ").getAs[Long]("exact_distinct") == 7L)
    // estimate tracks exact within ~4σ at p=10
    Seq("id", "usr", "typ").foreach { c =>
      val (e, x) = (got(c).getAs[Double]("est_distinct"),
        got(c).getAs[Long]("exact_distinct"))
      assert(math.abs(e - x) / x.toDouble < 0.13, s"$c: est $e vs exact $x")
      assert(got(c).getAs[Double]("rel_error") == (e - x.toDouble) / x.toDouble)
    }
    // the estimate IS hllDistinct's — same derivation, bit for bit
    val direct = Sketches.hllDistinct(
      df.select(lit("id").as("g"), col("id").cast("string").as("v")),
      p = 10, Seq("g"), "v").collect().head.getAs[Double]("est_distinct")
    assert(got("id").getAs[Double]("est_distinct") == direct)
  }

  test("hllDistinct small-range linear counting is near-exact at low cardinality") {
    val tiny = (0 until 50).map(i => ("g", s"user$i")) ++
      (0 until 50).map(i => ("g", s"user$i")) // duplicated on purpose
    val got = Sketches.hllDistinct(tiny.toDF("grp", "v"), p = 10, Seq("grp"), "v")
      .collect().head
    val est = got.getAs[Double]("est_distinct")
    assert(math.abs(est - 50.0) / 50.0 < 0.1, s"est $est vs 50")
    assert(got.getAs[Long]("n_registers_hit") <= 50L)
    intercept[IllegalArgumentException] {
      Sketches.hllDistinct(tiny.toDF("grp", "v"), p = 3, Seq("grp"), "v")
    }
  }

  test("hllPairOverlap: union by register max equals the sketch of the union") {
    val a = (0 until 300).map(i => ("a", s"u$i"))
    val b = (150 until 450).map(i => ("b", s"u$i")) // true overlap 150
    val df = (a ++ b).toDF("grp", "v")
    val got = Sketches.hllPairOverlap(df, p = 10, "grp", "v").collect()(0)
    // union_est must equal hllDistinct run on the merged slice EXACTLY —
    // register max-merge IS the union sketch, no estimator slack involved
    val uni = Sketches.hllDistinct(
      df.withColumn("grp", lit("all")), 10, Seq("grp"), "v")
      .collect()(0).getAs[Double]("est_distinct")
    assert(got.getAs[Double]("union_est") == uni,
      s"union_est ${got.getAs[Double]("union_est")} != merged $uni")
    // inclusion-exclusion lands near the true 150 overlap (HLL error
    // ~3.2% at p=10; bound generous and deterministic)
    assert(math.abs(got.getAs[Double]("inter_est") - 150.0) < 40.0, got.toString)
    assert(got.getAs[Double]("jaccard_est") > 0.15
      && got.getAs[Double]("jaccard_est") < 0.55, got.toString)
    // disjoint slices: intersection clamps to >= 0 and stays small
    val dj = ((0 until 200).map(i => ("a", s"x$i"))
      ++ (0 until 200).map(i => ("b", s"y$i"))).toDF("grp", "v")
    val d = Sketches.hllPairOverlap(dj, p = 10, "grp", "v").collect()(0)
    assert(d.getAs[Double]("inter_est") >= 0.0)
    assert(d.getAs[Double]("inter_est") < 30.0, d.toString)
  }

  test("hllPairOverlap refuses group counts above the pair bound") {
    val df = (0 until 30).map(i => (s"g$i", s"v$i")).toDF("grp", "v")
    val e = intercept[Exception] {
      Sketches.hllPairOverlap(df, p = 10, "grp", "v", maxGroups = 10).collect()
    }
    assert(String.valueOf(e.getMessage).contains("hllPairOverlap"),
      String.valueOf(e.getMessage))
    // under the bound it runs: 3 groups -> 3 pairs
    val ok = Sketches.hllPairOverlap(
      (0 until 30).map(i => (s"g${i % 3}", s"v$i")).toDF("grp", "v"),
      p = 10, "grp", "v", maxGroups = 10)
    assert(ok.count() == 3L)
  }

  test("cmsTopK: one-sided error — est >= true always, exact when w is roomy") {
    // Zipf-ish stream: value i repeated (50 - i) times, i in 0..49
    val vals = (0 until 50).flatMap(i => Seq.fill(50 - i)(s"v$i"))
    val df = vals.toDF("v")
    // w = 4096 for 50 distinct values: collisions possible but the
    // estimate may only ever OVERcount
    val got = Sketches.cmsTopK(df, "v", k = 10, d = 3, w = 4096)
      .as[(String, Long, Long)].collect()
    assert(got.length == 10)
    got.foreach { case (v, t, e) =>
      assert(e >= t, s"$v: est $e under true $t — CMS can never undercount") }
    // top-10 by construction: v0..v9 with counts 50..41
    assert(got.map(_._1).toSet == (0 until 10).map(i => s"v$i").toSet)
    assert(got.find(_._1 == "v0").get._2 == 50L)
  }

  test("cmsTopK: a saturated sketch overcounts through collisions, never under") {
    val vals = (0 until 200).flatMap(i => Seq.fill(1 + i % 5)(s"t$i"))
    val df = vals.toDF("v")
    // w = 16 buckets for 200 values: heavy collisions guaranteed
    val got = Sketches.cmsTopK(df, "v", k = 20, d = 2, w = 16)
      .as[(String, Long, Long)].collect()
    got.foreach { case (v, t, e) => assert(e >= t, s"$v: $e < $t") }
    assert(got.exists { case (_, t, e) => e > t },
      "16 buckets over 200 values must collide somewhere")
    // layout invariance: the sketch is a pure function of the multiset
    val re = Sketches.cmsTopK(df.repartition(7), "v", k = 20, d = 2, w = 16)
      .as[(String, Long, Long)].collect()
    assert(got.sortBy(_._1).toSeq == re.sortBy(_._1).toSeq)
    intercept[IllegalArgumentException] { Sketches.cmsTopK(df, "v", 0) }
    intercept[IllegalArgumentException] { Sketches.cmsSketch(df, "v", d = 0) }
    intercept[IllegalArgumentException] { Sketches.cmsSketch(df, "v", w = 1) }
  }

  test("kmvPairJaccard refuses group counts above the G² pair bound") {
    val many = (0 until 40).flatMap(g => (0 until 3).map(i => (s"g$g", s"v$i")))
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    val e = intercept[Exception] {
      Sketches.kmvPairJaccard(many.toDF("grp", "v"), 16, "grp", "v", maxGroups = 10)
        .collect()
    }
    assert(messages(e).contains("pair-comparison bound"), messages(e).take(500))
    // under the bound the same input runs: 40 groups → 780 pairs
    assert(Sketches.kmvPairJaccard(many.toDF("grp", "v"), 16, "grp", "v")
      .count() == 40L * 39 / 2)
  }

  test("dupNgramSpans finds the shared run and merges consecutive starts") {
    // docs 1 and 2 share a 10-token run -> 3 consecutive duplicated
    // 8-gram starts (positions 0..2 in doc 1) that must merge into ONE span
    val shared = (0 until 10).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared tail1 tail2 tail3"),
      (2L, s"head1 head2 $shared"),
      (3L, "totally different words only here once repeated never again ok"))
      .toDF("doc_id", "text")
    val spans = TextOps.dupNgramSpans(docs, n = 8, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(spans.toSeq == Seq(
      (1L, 0L, 9L, 3L),   // starts 0,1,2 cover tokens 0..9
      (2L, 2L, 11L, 3L)), // starts 2,3,4 cover tokens 2..11
      s"got ${spans.toSeq}")
  }

  test("lineDedup: first occurrence wins, boilerplate df screens, empties drop") {
    val docs = Seq(
      (1L, "Unique alpha line\nCopyright Footer\nshared body line"),
      (2L, "shared BODY line\ncopyright footer\n\n   \nanother unique"),
      (3L, "copyright footer\nthird unique line"))
      .toDF("doc_id", "text")
    val got = graft.pipeline.TextOps.lineDedup(docs, boilerplateDf = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("line_no")) ->
        ((r.getAs[String]("line"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_occurrences"), r.getAs[Boolean]("is_kept")))).toMap
    // empty/whitespace-only lines are not emitted
    assert(!got.contains((2L, 2)) && !got.contains((2L, 3)), got.keys.toString)
    // the footer hits all 3 docs -> boilerplate: dropped EVERYWHERE,
    // including its first occurrence
    Seq((1L, 1), (2L, 1), (3L, 0)).foreach { k =>
      assert(got(k)._2 == 3L && !got(k)._4, s"$k ${got(k)}")
    }
    // case-normalized dup: doc 1's casing wins (first by (doc, line_no)),
    // doc 2's recurrence is dropped but REPORTED with the raw line
    assert(got((1L, 2)) == (("shared body line", 2L, 2L, true)))
    assert(got((2L, 0)) == (("shared BODY line", 2L, 2L, false)))
    // unique lines below the df screen are kept
    assert(got((1L, 0))._4 && got((2L, 4))._4 && got((3L, 1))._4)
  }

  test("lineClean rebuilds docs from kept lines; all-removed docs stay, empty") {
    val docs = Seq(
      (1L, "keep one\nCopyright Footer\nkeep two"),
      (2L, "copyright footer\nkeep three"),
      (3L, "copyright footer"),           // only boilerplate -> empty clean_text
      (4L, "\n \n"))                       // no non-empty lines at all
      .toDF("doc_id", "text")
    val got = graft.pipeline.TextOps.lineClean(docs, boilerplateDf = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_lines"),
          r.getAs[Long]("n_kept"), r.getAs[Double]("removed_ratio")))).toMap
    assert(got(1L) == (("keep one\nkeep two", 3L, 2L, 1.0 / 3)))
    assert(got(2L) == (("keep three", 2L, 1L, 0.5)))
    assert(got(3L) == (("", 1L, 0L, 1.0)), "all-boilerplate doc survives, empty")
    assert(got(4L) == (("", 0L, 0L, 0.0)), "no-line doc survives, zeroed")
  }

  test("dupNgramCoverage counts overlapping spans' tokens once") {
    // doc 1 vs 2 share tokens 0..9; doc 1 vs 3 share tokens 4..13 of doc 1:
    // doc 1's covered set is the UNION 0..13 (14 tokens), not 10+10
    val runA = (0 until 10).map(i => s"a$i").mkString(" ")   // doc1 tokens 0..9
    val runB = (4 until 14).map(i => if (i < 10) s"a$i" else s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$runA b10 b11 b12 b13 x1 x2"),
      (2L, s"$runA y1 y2 y3 y4 y5 y6 y7"),
      (3L, s"z1 z2 $runB z3 z4"))
      .toDF("doc_id", "text")
    val cov = TextOps.dupNgramCoverage(docs, n = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(cov(1L)._2 == 14L, s"doc 1 union coverage must be 14, got ${cov(1L)}")
    assert(cov(1L)._1 == 16L)
    assert(math.abs(cov(1L)._3 - 14.0 / 16.0) < 1e-12)
    // doc with no duplicated grams reports 0 coverage, not a missing row
    val alone = Seq((9L, "unique words nothing shared with anyone at all")).toDF("doc_id", "text")
    val solo = TextOps.dupNgramCoverage(docs.union(alone), n = 8, minDocs = 2)
      .where(col("doc_id") === 9L).collect().head
    assert(solo.getAs[Long]("dup_tokens") == 0L && solo.getAs[Double]("dup_frac") == 0.0)
  }

  /** Driver-side type-7 (linear interpolation) quantile over the FULL data —
    * what quantileSketch must equal whenever the group fits inside k.
    */
  private def type7(vs: Seq[Double], q: Double): Double = {
    val s = vs.sorted
    val pos = q * (s.length - 1)
    val lo = math.floor(pos).toInt
    val frac = pos - lo
    val hi = math.min(lo + 1, s.length - 1)
    // same HALF_UP-at-6-decimals as Spark's round()
    BigDecimal(s(lo) + frac * (s(hi) - s(lo)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("quantileSketch is exact type-7 below k and within DKW error above") {
    val small = (0 until 40).map(i => ("small", i.toLong, i * 3.0 + 0.25))
    val large = (0 until 20000).map(i => ("large", 1000L + i, (i % 10000) / 10.0))
    val df = (small ++ large).toDF("grp", "rid", "x")
    val out = Sketches.quantileSketch(df, k = 256, Seq("grp"), "rid", "x")
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getAs[Long]("n_sample"), r.getAs[Double]("est_q")))).toMap
    for (q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      // below k: the sample IS the group — exact type-7 quantile
      val (nS, est) = out(("small", q))
      assert(nS == 40L)
      assert(est == type7(small.map(_._3), q), s"small q=$q")
      // above k: 256 uniform draws from U-ish values 0..999.9; DKW rank
      // error at 4σ ≈ 4·√(q(1-q)/256) — generous but real bound
      val (nL, estL) = out(("large", q))
      assert(nL == 256L)
      val tol = 4 * math.sqrt(q * (1 - q) / 256) * 1000.0 + 1.0
      assert(math.abs(estL - q * 999.9) < tol, s"large q=$q est $estL")
    }
  }

  test("quantileSketch is layout-invariant, null-excluding, and row-multiplicity-true") {
    val base = (0 until 3000).map(i => ("g", i.toLong, (i % 100).toDouble))
    val a = Sketches.quantileSketch(base.toDF("grp", "rid", "x"), 64,
      Seq("grp"), "rid", "x").collect()
      .map(r => r.getDouble(1) -> r.getDouble(3)).toMap
    val b = Sketches.quantileSketch(
      base.reverse.toDF("grp", "rid", "x").repartition(11), 64,
      Seq("grp"), "rid", "x").collect()
      .map(r => r.getDouble(1) -> r.getDouble(3)).toMap
    assert(a == b, "sample is keyed by row hash — layout must not matter")
    // nulls neither sampled nor counted: padding the data with null rows
    // under FRESH row ids must leave every estimate unchanged
    val withNulls = base.map { case (g, i, x) => (g, i, Some(x)) } ++
      (0 until 500).map(i => ("g", 90000L + i, Option.empty[Double]))
    val c = Sketches.quantileSketch(withNulls.toDF("grp", "rid", "x"), 64,
      Seq("grp"), "rid", "x").collect()
      .map(r => r.getDouble(1) -> r.getDouble(3)).toMap
    assert(c == a, "null rows must not displace sample slots")
    // VALUE duplicates keep their multiplicity (quantiles over the
    // multiset): a group of one repeated value reports it at every q
    val const = (0 until 200).map(i => ("c", i.toLong, 7.5))
    val d = Sketches.quantileSketch(const.toDF("grp", "rid", "x"), 64,
      Seq("grp"), "rid", "x").collect()
    assert(d.forall(_.getAs[Double]("est_q") == 7.5))
  }
}
