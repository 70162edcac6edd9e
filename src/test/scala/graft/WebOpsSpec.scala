package graft

import org.apache.spark.sql.functions._

import graft.pipeline.WebOps

class WebOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("url")
      .select(WebOps.canonicalizeUrl(col("url")).as("c"))
      .head().getString(0)

  private def domain(url: String): String =
    Seq(url).toDF("url")
      .select(WebOps.urlDomain(col("url")).as("d"))
      .head().getString(0)

  test("canonicalizeUrl folds fetch variants to one identity") {
    // scheme/host case + default port + trailing slash + fragment
    assert(canon("HTTPS://WWW.Ex.COM:443/a/1/#sec") == "https://www.ex.com/a/1")
    assert(canon("http://ex.com:80/a/2") == "http://ex.com/a/2")
    // non-default port is identity-bearing — kept
    assert(canon("http://ex.com:8080/a/3") == "http://ex.com:8080/a/3")
    // https on http's default port is NOT default — kept
    assert(canon("https://ex.com:80/a") == "https://ex.com:80/a")
    // tracking params dropped, real params kept SORTED, ? dropped if none left
    assert(canon("http://ex.com/p?utm_source=rss&b=2&a=1&fbclid=xyz")
      == "http://ex.com/p?a=1&b=2")
    assert(canon("http://ex.com/p?utm_campaign=x&gclid=1&msclkid=2&ref=h")
      == "http://ex.com/p")
    // bare authority: no path at all
    assert(canon("http://Ex.com") == "http://ex.com")
    // root path collapses with the trailing-slash rule
    assert(canon("http://ex.com/?utm_source=a") == "http://ex.com")
    // utm prefix match must not eat a legit param that merely contains utm
    assert(canon("http://ex.com/p?autm=1") == "http://ex.com/p?autm=1")
  }

  test("canonicalizeUrl is idempotent; urlDomain is the PSL registered " +
    "domain") {
    val urls = Seq(
      "HTTPS://WWW.Ex.COM:443/a/1/?utm_source=r&x=1#s",
      "http://ex.com:8080/a?b=2&a=1",
      "http://WWW.site-3.com/a/4/")
    val once = urls.map(canon)
    assert(once.map(canon) == once, "canonicalization must be idempotent")
    // any subdomain label (www or otherwise) sits above the registrable
    // point under the * default rule
    assert(domain("HTTPS://WWW.Ex.COM:443/a") == "ex.com")
    assert(domain("http://sub.ex.com/a") == "ex.com")
    assert(domain("http://wwwx.ex.com/a") == "ex.com")
    // two-label public suffixes: registration happens one level down
    assert(domain("http://a.b.co.uk/x") == "b.co.uk")
    assert(domain("http://b.co.uk/x") == "b.co.uk")
    assert(domain("http://co.uk/x") == "co.uk",
      "a host that IS a public suffix returns itself")
    // private-domain PSL entries: platform subdomains are registrable
    assert(domain("http://alice.github.io/p") == "alice.github.io")
    assert(domain("http://deep.alice.github.io/p") == "alice.github.io")
    // three-label suffix
    assert(domain("http://bkt.s3.amazonaws.com/k") == "bkt.s3.amazonaws.com")
    assert(domain("http://x.bkt.s3.amazonaws.com/k") == "bkt.s3.amazonaws.com")
    // wildcard *.ck: every child of ck is itself a public suffix...
    assert(domain("http://x.y.ck/") == "x.y.ck")
    // ...except the !www.ck exception, which is registrable
    assert(domain("http://www.ck/") == "www.ck")
    assert(domain("http://a.www.ck/") == "www.ck")
  }

  test("registeredDomain column algebra == a plain Scala PSL walk over " +
    "generated hosts") {
    import spark.implicits._
    // straightforward reference implementation of the same PSL algorithm
    // — catches Spark-expression bugs (negative slice bounds, InSet vs
    // guard interplay) that a hand-picked example set can miss
    def ref(host: String): String = {
      val ls = host.split('.')
      val n = ls.length
      def sfx(k: Int) = ls.takeRight(k).mkString(".")
      val m =
        if (n >= 3 && WebOps.PslThreeLabelSuffixes.contains(sfx(3))) 3
        else if (n >= 2 && WebOps.PslExceptions.contains(sfx(2))) 1
        else if (n >= 3 && WebOps.PslWildcardParents.contains(sfx(1))) 2
        else if (n >= 3 && WebOps.PslTwoLabelSuffixes.contains(sfx(2))) 2
        else 1
      if (n > m) sfx(m + 1) else host
    }
    // hosts assembled from labels that collide with every rule shape:
    // suffix parts (co/uk/ck/www/github/io/s3/amazonaws/com), plain
    // labels, and single-label hosts
    val pool = Seq("com", "co", "uk", "ck", "www", "github", "io", "s3",
      "amazonaws", "a", "b", "ex", "blogspot", "jp", "ac")
    val rnd = new scala.util.Random(421)
    val hosts = (1 to 500).map { _ =>
      val n = 1 + rnd.nextInt(5)
      Seq.fill(n)(pool(rnd.nextInt(pool.length))).mkString(".")
    }.distinct
    val got = hosts.toDF("host")
      .select(col("host"), WebOps.registeredDomain(col("host")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    hosts.foreach { h =>
      assert(got(h) == ref(h), s"host $h: column ${got(h)} != ref ${ref(h)}")
    }
  }

  test("urlDedup collapses fetch variants onto one canonical identity") {
    import spark.implicits._
    // four fetches of ONE page through canonicalization-removable
    // variance, plus one genuinely different page
    val docs = Seq(
      (10L, "https://www.ex.com/p?id=3&utm_source=a"),
      (11L, "HTTPS://WWW.Ex.COM:443/p?id=3"),
      (12L, "https://www.ex.com/p/?fbclid=z&id=3"),
      (13L, "https://www.ex.com/p?id=3#frag"),
      (20L, "https://www.ex.com/p?id=4")
    ).toDF("doc_id", "url")
    val got = graft.pipeline.WebOps.urlDedup(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size == 2, s"expected 2 canonical pages, got ${got.keySet}")
    assert(got("https://www.ex.com/p?id=3") == ((10L, 4L)),
      "variants must collapse; keeper is the earliest fetch")
    assert(got("https://www.ex.com/p?id=4") == ((20L, 1L)))
  }

  test("domainStats stays O(1) per group on a Zipfian hot domain and its " +
    "mean is exact") {
    // 90% of docs land in ONE domain (the boilerplate-farm shape that
    // blew the old per-group collect_list fold); stats must come out
    // exact with no per-group materialization in the plan
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("url", concat(lit("http://"),
        when(col("doc_id") % 10 === 0,
          concat(lit("cold"), (col("doc_id") % 97).cast("string")))
          .otherwise(lit("hot")),
        lit(".com/p/"), col("doc_id")))
    val stats = WebOps.domainStats(docs)
    val plan = stats.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list") && !plan.contains("ObjectHashAggregate"),
      "the quality mean must be a plain partial-combined sum, not a " +
        "per-group collected list")
    // independent expectation: per-doc fixed-point quality summed in Scala
    val perDoc = docs.select(
        graft.pipeline.WebOps.urlDomain(col("url")).as("domain"),
        floor(graft.pipeline.TextOps.qualityScoreCol(col("text")) *
          lit(WebOps.QualityFixedPoint)).cast("long").as("qf"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val expected = perDoc.groupBy(_._1).map { case (d, rows) =>
      d -> rows.map(_._2).sum.toDouble / rows.length / WebOps.QualityFixedPoint
    }
    val got = stats.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(4)))).toMap
    assert(got("hot.com")._1 > docs.count() * 8 / 10, "fixture must be Zipfian")
    expected.foreach { case (d, avg) =>
      assert(got(d)._2 == avg, s"avg_quality for $d: got ${got(d)._2}, want $avg")
    }
  }

  test("canonicalization is a narrow map; domainBudgetCap keeps per-domain " +
    "id-order prefixes under the budget") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("url", concat(lit("http://d"), col("doc_id") % 7,
        lit(".com/a/"), col("doc_id")))
    // no exchange anywhere in the canonicalize plan: it must ride the scan
    val plan = docs.select(WebOps.canonicalizeUrl(col("url")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "canonicalizeUrl must be a narrow map — no shuffle")
    val budget = 60L
    val capped = WebOps.domainBudgetCap(docs, budget).collect()
    val byDomain = capped.groupBy(_.getString(1))
    assert(byDomain.nonEmpty)
    byDomain.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(0))
      // every kept row's EXCLUSIVE prefix is under budget; the first doc
      // of a domain is always kept (cum - n == 0 < budget)
      sorted.foreach { r =>
        assert(r.getLong(3) - r.getLong(2) < budget)
      }
      // cum_tokens is the running sum in id order
      assert(sorted.scanLeft(0L)(_ + _.getLong(2)).tail.toSeq
        == sorted.map(_.getLong(3)).toSeq)
    }
    // the cap actually bites on this fixture (otherwise the test is vacuous)
    assert(capped.length < docs.count(),
      "budget must drop at least one doc at this fixture size")
  }

  test("blocklistFilter drops by registered domain and canonical prefix " +
    "via broadcast anti-joins") {
    import spark.implicits._
    val docs = Seq(
      (1L, "http://ok.com/a"),
      (2L, "http://www.bad.co.uk/a"),          // domain rule (www folds in)
      (3L, "http://sub.bad.co.uk/a"),          // same registered domain
      (4L, "http://ok.com/private/x?utm_source=r"), // prefix rule on CANON
      (5L, "http://ok.com/privateer"),         // prefix match is literal
      (6L, "http://other.com/private/x")       // prefix is host-anchored
    ).toDF("doc_id", "url")
    val bl = Seq(
      ("domain", "bad.co.uk"),
      ("prefix", "http://ok.com/private/")).toDF("kind", "pattern")
    val kept = WebOps.blocklistFilter(docs, bl)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 5L, 6L))
    // both probes must be broadcast antis — the corpus never shuffles
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      "blocklist probes must broadcast, not sort-merge")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the prefix rule is a broadcast nested-loop anti-join")
  }

  test("domainBudgetCap shards the per-domain prefix walk (skew-safe on a " +
    "mega-domain)") {
    // 90% of docs in ONE domain — the Zipfian shape where a plain
    // per-domain window hands one task the whole hot domain's doc list
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("url", concat(lit("http://"),
        when(col("doc_id") % 10 === 0,
          concat(lit("cold"), (col("doc_id") % 97).cast("string")))
          .otherwise(lit("hot")),
        lit(".com/p/"), col("doc_id")))
    val budget = 500L
    // shardWidth 64 splits the hot domain's id range across many shards
    val capped = WebOps.domainBudgetCap(docs, budget, shardWidth = 64L)
    // the prefix walk must be the SHARDED scan: every window in the plan
    // partitions by (domain, shard), never by the domain alone
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("__shard"),
      "domainBudgetCap must run the sharded Prefix.runningSum")
    // exactness under sharding: equal to the single-window reference
    val rows = capped.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val perDoc = docs.select(col("doc_id"),
        graft.pipeline.WebOps.urlDomain(col("url")).as("domain"),
        size(graft.pipeline.TextOps.tokens(col("text"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = perDoc.groupBy(_._2).toSeq.flatMap { case (d, ds) =>
      var cum = 0L
      ds.sortBy(_._1).flatMap { case (id, _, n) =>
        val keep = cum < budget
        cum += n
        if (keep) Some((id, d, n, cum)) else None
      }
    }.toSet
    assert(rows.toSet == expected,
      "sharded prefix cap must equal the sequential per-domain walk")
    assert(rows.count(_._2 == "hot.com") > 0)
  }

  test("robotsEval: longest match wins, allow beats disallow on a tie, " +
    "default allow, empty path is the root") {
    import spark.implicits._
    val rules = Seq(
      ("ex.com", "disallow", "/a/1"),
      ("ex.com", "allow", "/a/13"),
      ("site.com", "disallow", "/"),
      ("site.com", "allow", "/a/13"),
      ("tie.com", "disallow", "/t/1"),
      ("tie.com", "allow", "/t/1")).toDF("domain", "directive", "path_prefix")
    val docs = Seq(
      (1L, "http://ex.com/a/1"),        // disallow /a/1
      (2L, "http://ex.com/a/13"),       // allow /a/13 outranks /a/1
      (3L, "http://ex.com/b"),          // no matching rule -> allowed
      (4L, "http://www.ex.com/a/10"),   // www folds into the domain key
      (5L, "http://site.com"),          // empty path = "/" -> site-wide
      (6L, "http://site.com/a/13x"),    // longer allow beats "/"
      (7L, "http://tie.com/t/1z"),      // same length: allow wins the tie
      (8L, "http://norules.org/x")      // domain with no rules -> allowed
    ).toDF("doc_id", "url")
    val got = WebOps.robotsEval(docs, rules)
      .select("doc_id", "allowed", "matched_prefix").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(got == Map(
      1L -> ((false, "/a/1")),
      2L -> ((true, "/a/13")),
      3L -> ((true, "")),
      4L -> ((false, "/a/1")),
      5L -> ((false, "/")),
      6L -> ((true, "/a/13")),
      7L -> ((true, "/t/1")),
      8L -> ((true, ""))))
    // the rules ride a broadcast — the corpus must never sort-merge
    val plan = WebOps.robotsEval(docs, rules)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      "robots rules must broadcast, not sort-merge")
    assert(plan.contains("BroadcastHashJoin"),
      "the domain probe is a broadcast equi-join")
  }

  test("outlinks extracts http(s) mentions with canonical identity; " +
    "linkGraph aggregates domain edges") {
    import spark.implicits._
    val docs = Seq(
      (1L, "http://src.com/page",
        "words https://a.co.uk/x words HTTP://WWW.B.com:80/y?utm_source=r&z=1"),
      (2L, "http://www.src.com/other",
        "see https://sub.a.co.uk/x2 only"),
      (3L, "http://src.com/none", "no links here")
    ).toDF("doc_id", "url", "text")
    val links = WebOps.outlinks(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4)))
    assert(links.toSet == Set(
      (1L, "src.com", "https://a.co.uk/x", "https://a.co.uk/x", "a.co.uk"),
      // scheme/host case + default port + tracking param fold away
      (1L, "src.com", "HTTP://WWW.B.com:80/y?utm_source=r&z=1",
        "http://www.b.com/y?z=1", "b.com"),
      // subdomain of a two-label suffix registers one level down
      (2L, "src.com", "https://sub.a.co.uk/x2", "https://sub.a.co.uk/x2",
        "a.co.uk")))
    val graph = WebOps.linkGraph(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(graph.toSet == Set(
      ("src.com", "a.co.uk", 2L, 2L),
      ("src.com", "b.com", 1L, 1L)))
  }

  test("frontier keeps only outlinks whose canonical identity is not a " +
    "corpus page, with mention rollups") {
    import spark.implicits._
    val docs = Seq(
      // cites a KNOWN page (doc 2's canonical identity through a fetch
      // variant) and an unknown one
      (1L, "http://a.com/1",
        "see HTTPS://B.com:443/p?utm_source=r and http://new.com/x"),
      (2L, "https://b.com/p", "see http://new.com/x only"),
      (3L, "http://c.com/3", "no links")
    ).toDF("doc_id", "url", "text")
    val got = WebOps.frontier(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // https://b.com/p is doc 2 itself — dropped; new.com/x is cited twice
    // from two distinct domains, first seen by doc 1
    assert(got.toSeq == Seq(("http://new.com/x", "new.com", 2L, 2L, 1L)))
  }

  test("domainBoilerplate flags lines repeating across most pages of their " +
    "own domain only") {
    import spark.implicits._
    val docs = Seq(
      // d1: 3 pages sharing nav+footer; one content line repeats on 2/3
      // pages (0.67 >= 0.6 -> flagged), another is unique (not flagged)
      (1L, "http://a.com/1", "NAV | HOME\nunique one\nsale today\nfooter a"),
      (2L, "http://www.a.com/2", "nav | home\nsale today\nfooter a"),
      (3L, "http://a.com/3", "nav | home\nunique three\nfooter a"),
      // d2: the SAME nav text on its single page — minDocs=2 screens the
      // small-domain false positive; cross-domain repeats don't leak
      (4L, "http://b.com/1", "nav | home\nb content")
    ).toDF("doc_id", "url", "text")
    val got = WebOps.domainBoilerplate(docs, minRatio = 0.6, minDocs = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2)) ->
        ((r.getString(1), r.getLong(4), r.getLong(5), r.getBoolean(6))))
      .toMap
    // normalization: case-insensitive key, domain folds www
    assert(got((1L, 0)) == (("a.com", 3L, 3L, true)))   // nav on 3/3
    assert(got((1L, 1)) == (("a.com", 1L, 3L, false)))  // unique
    assert(got((1L, 2)) == (("a.com", 2L, 3L, true)))   // 2/3 >= 0.6
    assert(got((3L, 2)) == (("a.com", 3L, 3L, true)))   // footer on 3/3
    assert(got((4L, 0)) == (("b.com", 1L, 1L, false)),
      "a single-page domain cannot certify boilerplate (minDocs)")
    assert(got((4L, 1)) == (("b.com", 1L, 1L, false)))
  }

  test("fetchSchedule == the sequential politeness recurrence, through the " +
    "sharded prefix scans") {
    import spark.implicits._
    val delay = 100L
    // bursts, an in-gap arrival, a late arrival after idle, and an
    // out-of-(time)-order id — plus a second domain interleaved
    val fetches = Seq(
      (1L, "http://a.com/1", 1000L),
      (2L, "http://a.com/2", 1010L),   // burst: pushed to 1100
      (3L, "http://a.com/3", 1500L),   // idle gap: scheduled at arrival
      (4L, "http://a.com/4", 1400L),   // queued later but arrived earlier
      (5L, "http://b.com/1", 1000L),
      (6L, "http://b.com/2", 2000L)
    ).map { case (id, u, ms) => (id, u, ms * 1000000L) }
      .toDF("event_id", "url", "ts")
    val got = WebOps.fetchSchedule(fetches, delayMs = delay,
        shardWidth = 2L)
      .select("event_id", "fetch_rank", "scheduled_ms", "wait_ms")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // sequential reference: sched_i = max(arrival_i, sched_{i-1} + delay)
    assert(got == Map(
      1L -> ((0L, 1000L, 0L)),
      2L -> ((1L, 1100L, 90L)),
      3L -> ((2L, 1500L, 0L)),
      4L -> ((3L, 1600L, 200L)),
      5L -> ((0L, 1000L, 0L)),
      6L -> ((1L, 2000L, 0L))))
    // the walk must ride the sharded scans, never a bare per-domain window
    val plan = WebOps.fetchSchedule(fetches, delayMs = delay, shardWidth = 2L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__shard"),
      "fetchSchedule must run the sharded Prefix scans")
  }
}
