package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-curation operators over a URL column — the CCNet/RefinedWeb half of
  * an LLM data pipeline that keys on WHERE a document came from rather than
  * what it says: URL canonicalization (so the same page fetched through
  * tracking-param / default-port / case variants dedups to ONE identity),
  * registered-domain extraction, domain-level quality aggregation, and
  * per-domain token-budget caps (the "no single domain dominates the
  * training mix" rule).
  *
  * Everything here is pure column algebra over the URL string — narrow
  * maps with no shuffle until an explicit per-domain aggregation, which
  * shuffles once on the domain key. At 100 TB that is the right shape:
  * canonicalization riding the corpus scan for free, domain stats one
  * partial-combined aggregate (#domains ≪ #docs), the budget cap one
  * window over the domain partitioning.
  *
  * Reference scope note: the reference engine (tobiasli/my_weather) has no
  * web surface — this family extends the engine for LLM-corpus curation,
  * like pipeline/Dedup.scala and TextOps.scala.
  */
object WebOps {

  /** Query-string parameter keys stripped by canonicalization: tracking
    * and click-id params that vary per fetch without changing the page.
    * utm_* is a prefix match; the rest are exact keys.
    */
  val TrackingParamRe: String = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)="

  private def authority(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)

  /** URL scheme, lowercased (RFC 3986 §6.2.2.1: scheme is
    * case-insensitive).
    */
  def urlScheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Hostname, lowercased, port stripped (RFC 3986: host is
    * case-insensitive; the port is not part of the host).
    */
  def urlHost(url: Column): Column =
    lower(regexp_extract(authority(url), "^([^:]*)", 1))

  /** Explicit port, or '' when none given. */
  def urlPort(url: Column): Column =
    regexp_extract(authority(url), ":([0-9]+)$", 1)

  /** Path component ('' when the URL ends at the authority). */
  def urlPath(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  /** Raw query string (no '?'), '' when absent. */
  def urlQuery(url: Column): Column =
    regexp_extract(url, "\\?([^#]*)", 1)

  /** Curated subset of the published Public Suffix List
    * (publicsuffix.org — public data): the multi-label suffixes under
    * which registration happens one level down (`a.b.co.uk`'s
    * registered domain is `b.co.uk`, not `co.uk`). Single-label TLDs
    * need no entries — the PSL's implicit `*` default rule (any unknown
    * TLD is a public suffix) already yields last-two-labels for them.
    * A production deployment swaps in the full published list (same
    * shape, ~10k entries; at that size a broadcast join against a PSL
    * table replaces the literal IN-sets) — the ALGORITHM here is the
    * PSL's: longest matching rule wins, exception rules beat wildcard
    * rules, unmatched hosts fall to the `*` default.
    */
  val PslTwoLabelSuffixes: Seq[String] = Seq(
    // ccTLD second-level registries
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "co.za", "net.za", "org.za", "web.za", "gov.za", "ac.za",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
    "co.th", "ac.th", "go.th", "in.th", "or.th", "net.th",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "com.pl", "net.pl", "org.pl", "edu.pl",
    "co.at", "or.at", "ac.at", "gv.at",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.pt", "edu.pt", "gov.pt", "org.pt", "net.pt",
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    // private-domain PSL entries (hosting platforms whose subdomains
    // are independently registered — the boilerplate-farm boundary a
    // web pipeline actually needs)
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "netlify.app", "vercel.app", "pages.dev", "web.app",
    "firebaseapp.com", "appspot.com", "azurewebsites.net",
    "cloudfront.net", "wordpress.com")

  /** Three-label PSL suffixes (subset). */
  val PslThreeLabelSuffixes: Seq[String] = Seq("s3.amazonaws.com")

  /** Wildcard rule parents: `*.<parent>` — every direct child of the
    * parent is itself a public suffix (PSL's `*.ck`).
    */
  val PslWildcardParents: Seq[String] = Seq("ck")

  /** Exception rules (PSL `!www.ck`): hosts that are REGISTRABLE despite
    * a covering wildcard — the exception itself is the registered
    * domain, i.e. the public suffix backs off one label.
    */
  val PslExceptions: Seq[String] = Seq("www.ck")

  /** PSL registered domain of a (lowercased) host — pure column algebra
    * over the label array, zero shuffle: the public-suffix label count
    * `m` is the longest matching rule (3-label exact ≻ exception ≻
    * wildcard ≻ 2-label exact ≻ the implicit `*` default of 1), and the
    * registered domain is the suffix one label longer. A host that IS a
    * public suffix (or a single label) returns itself. The rule sets are
    * driver metadata compiled to codegen'd InSet probes — at full-PSL
    * scale the same algorithm runs as a broadcast join instead.
    */
  def registeredDomain(host: Column): Column = {
    // Let-binding through single-element transform lambdas: a lambda
    // variable is evaluated ONCE, so the label array (and below it the
    // suffix label count m) bind once per row. Without the binding,
    // Column composition INLINES — m's CASE appears three times in the
    // final slice and every suffix(k) re-expands the whole upstream
    // host derivation, ~40 regexp evaluations per row and an expression
    // tree that blew the JVM's 64 KB codegen method limit when composed
    // into multi-pass operators (fetchSchedule). The rejoin in the
    // fallback arm equals the host exactly (split/join round-trips on a
    // literal delimiter), so the lambda never needs the host twice.
    element_at(transform(array(split(host, "\\.")), ls => {
      val n = size(ls)
      def suffix(k: Int): Column = array_join(slice(ls, -k, k), ".")
      val mExpr = when(
          n >= 3 && suffix(3).isInCollection(PslThreeLabelSuffixes), lit(3))
        .when(n >= 2 && suffix(2).isInCollection(PslExceptions), lit(1))
        .when(n >= 3 && suffix(1).isInCollection(PslWildcardParents), lit(2))
        .when(n >= 3 && suffix(2).isInCollection(PslTwoLabelSuffixes), lit(2))
        .otherwise(lit(1))
      element_at(transform(array(mExpr), m =>
        when(n > m,
          array_join(slice(ls, (-m - lit(1)).cast("int"), m + lit(1)), "."))
          .otherwise(array_join(ls, "."))), 1)
    }), 1)
  }

  /** Registered domain for grouping: the PSL [[registeredDomain]] of the
    * lowercased, port-stripped host — `www.ex.com → ex.com` (www is just
    * a subdomain label below the registrable point), `a.b.co.uk →
    * b.co.uk`, `x.github.io → x.github.io`.
    */
  def urlDomain(url: Column): Column =
    registeredDomain(urlHost(url))

  /** Canonical URL — ONE identity for every fetch variant of a page:
    * scheme and host lowercased, `www.` kept (host identity is not
    * changed — only [[urlDomain]] strips it), default ports removed
    * (http:80 / https:443; any other explicit port kept), the path's
    * trailing slash dropped (a bare-authority URL canonicalizes with no
    * path), fragment dropped, and the query reduced to its
    * non-tracking params sorted lexicographically ('' query → no '?').
    * Deterministic column algebra — mirrored term-for-term by the DuckDB
    * twin so both engines produce identical strings.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = urlScheme(url)
    val host = lower(regexp_extract(authority(url), "^([^:]*)", 1))
    val port = urlPort(url)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val path = regexp_replace(urlPath(url), "/+$", "")
    val params = filter(split(urlQuery(url), "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe))
    val query = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(query =!= "", concat(lit("?"), query)).otherwise(lit("")))
  }

  /** Fixed-point scale for the domain quality mean: quality scores are
    * quantized to `floor(q · 1e9)` longs so the per-domain sum is EXACT
    * and order-independent (long addition commutes; double addition does
    * not) — no accumulation-order pinning needed in either engine.
    */
  val QualityFixedPoint: Double = 1e9

  /** Per-domain curation profile: document count, total (whitespace)
    * tokens, distinct languages, and the mean [[TextOps.qualityScoreCol]]
    * — the table a web pipeline ranks/filters source domains by (drop
    * spam domains, cap boilerplate farms). One shuffle on the domain key,
    * fully partial-combined: the quality mean sums FIXED-POINT longs
    * (`floor(q · 1e9)`, exact and order-independent — the per-doc double
    * `q` is deterministic column algebra, so its quantization is too)
    * and divides once by the count, so per-group state is O(1) and a
    * Zipfian hot domain (a boilerplate farm holding millions of docs)
    * costs nothing more than a cold one — no per-group materialization
    * anywhere (the previous order-pinned `collect_list` fold buffered a
    * whole domain per group, which is exactly the heap profile that dies
    * on real web data).
    */
  def domainStats(docs: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id", textCol: String = "text",
      langCol: String = "lang"): DataFrame =
    docs.select(urlDomain(col(urlCol)).as("domain"),
        col(langCol).as("__lang"),
        size(TextOps.tokens(col(textCol))).cast("long").as("__tok"),
        floor(TextOps.qualityScoreCol(col(textCol)) * lit(QualityFixedPoint))
          .cast("long").as("__qf"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("n_tokens"),
        countDistinct(col("__lang")).as("n_langs"),
        sum(col("__qf")).as("__sqf"))
      .select(col("domain"), col("n_docs"), col("n_tokens"), col("n_langs"),
        (col("__sqf").cast("double") / col("n_docs").cast("double") /
          lit(QualityFixedPoint)).as("avg_quality"))

  /** URL-identity dedup — [[canonicalizeUrl]] used for its production
    * purpose, as a JOIN KEY: refetches of the same page through fetch
    * variants (tracking params, default ports, case, trailing slashes,
    * fragments) collapse to one canonical identity, the keeper is the
    * lowest doc id (deterministic: the earliest fetch), and the variant
    * count is the refetch-rate signal a crawl-dedup stage reports. One
    * partial-combined aggregate on the canonical key (no pair
    * enumeration — URL dedup is exact, unlike content near-dup).
    * Output: (canonical_url, keeper_doc_id, n_variants).
    */
  def urlDedup(docs: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id"): DataFrame =
    docs.select(canonicalizeUrl(col(urlCol)).as("canonical_url"),
        col(idCol).as("__id"))
      .groupBy("canonical_url")
      .agg(min(col("__id")).as("keeper_doc_id"),
        count(lit(1)).as("n_variants"))

  /** Per-domain crawl-rate profile over tumbling event-time windows:
    * fetch counts per (registered domain, window) plus the over-limit
    * verdict — the politeness/rate-cap monitor of a crawl pipeline (the
    * aggregate face of robots crawl-delay; [[graft.streaming.StreamOps]]
    * `crawlRateStream` is the at-ingest face over the same arithmetic).
    * One partial-combined aggregate on the (domain, window) key; the
    * window component SPLITS a hot domain across time, so the Zipfian
    * domain key is not a single-reducer hazard here. `tsCol` is the
    * engine's epoch-ns grid; windows are `windowMs` tumbling, keyed by
    * their epoch-ms start.
    */
  def crawlRate(fetches: DataFrame, windowMs: Long, maxFetches: Long,
      urlCol: String = "url", tsCol: String = "ts"): DataFrame = {
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    require(maxFetches > 0, s"maxFetches must be positive, got $maxFetches")
    fetches.select(urlDomain(col(urlCol)).as("domain"),
        expr(s"((`$tsCol` div 1000000) div $windowMs) * $windowMs")
          .as("window_start"))
      .groupBy("domain", "window_start")
      .agg(count(lit(1)).as("n_fetches"))
      .withColumn("over_limit", col("n_fetches") > maxFetches)
  }

  /** Robots/blocklist filtering — the crawl-curation gate that drops
    * documents from disallowed origins BEFORE any content processing: a
    * doc is dropped when its registered domain matches a `domain` rule
    * exactly, or when its canonical URL starts with a `prefix` rule (the
    * robots.txt-Disallow shape over the canonicalized identity, so
    * tracking-param/case/port variants of a blocked page cannot slip
    * through). `blocklist` is `(kind, pattern)` rows with kind ∈
    * {domain, prefix}.
    *
    * Scale shape: the blocklist is curation metadata (10³–10⁵ rows
    * against 10⁹+ docs), so both probes are BROADCAST anti-joins — the
    * domain rules an equi anti-join, the prefix rules a broadcast
    * nested-loop anti (rules side broadcast; the corpus never shuffles)
    * — one narrow pass over the scan, the bloomDecontaminate shape over
    * the web key. Output: the SURVIVING docs with `canonical_url` and
    * `domain` appended.
    */
  def blocklistFilter(docs: DataFrame, blocklist: DataFrame,
      urlCol: String = "url"): DataFrame = {
    val withKeys = docs
      .withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
      .withColumn("domain", urlDomain(col(urlCol)))
    val domRules = blocklist.where(col("kind") === "domain")
      .select(col("pattern").as("domain"))
    val preRules = blocklist.where(col("kind") === "prefix")
      .select(col("pattern").as("__prefix"))
    withKeys
      .join(broadcast(domRules), Seq("domain"), "left_anti")
      .join(broadcast(preRules),
        col("canonical_url").startsWith(col("__prefix")), "left_anti")
  }

  /** Regex matching one outlink mention in page text: an `http(s)` URL up
    * to the next whitespace, scheme case-insensitive. Identical in Java
    * regex (Spark) and RE2 (DuckDB) — the twin uses the same string.
    */
  val LinkRe: String = "(?i)https?://\\S+"

  /** Outlink extraction: every `http(s)://…` mention in the page text,
    * exploded to one row per link, with the link's canonical identity and
    * target registered domain alongside the source page's domain — the
    * crawl-frontier feed (newly discovered URLs) and the edge list a web
    * graph is built from.
    *
    * Scale shape: extraction is a NARROW map riding the corpus scan
    * (regexp_extract_all + explode — no shuffle, output ∝ #links), and
    * both derived identities are the same zero-shuffle column algebra as
    * [[canonicalizeUrl]]/[[urlDomain]]. Output: (idCol, src_domain, link,
    * canonical_link, dst_domain).
    */
  def outlinks(docs: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), urlDomain(col(urlCol)).as("src_domain"),
        explode(regexp_extract_all(col(textCol), lit(LinkRe), lit(0)))
          .as("link"))
      .withColumn("canonical_link", canonicalizeUrl(col("link")))
      .withColumn("dst_domain", urlDomain(col("link")))

  /** Domain-level link graph: [[outlinks]] aggregated to (source
    * registered domain → target registered domain) edges with link and
    * distinct-page counts — the host graph behind centrality/spam
    * analyses of a crawl. One partial-combined aggregate on the domain
    * pair (#domain pairs ≪ #links); the extraction side never shuffles.
    */
  def linkGraph(docs: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    outlinks(docs, urlCol, idCol, textCol)
      .groupBy("src_domain", "dst_domain")
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col(idCol)).as("n_docs"))

  /** Crawl-frontier extraction: the outlink mentions whose canonical
    * identity is NOT already in the corpus — the discovered-but-unfetched
    * URL set a crawler's scheduler feeds from. Per frontier URL:
    * mention count, distinct citing domains (the in-degree signal
    * frontier prioritization ranks by), and the earliest citing page.
    *
    * Scale shape: [[outlinks]] extraction is narrow; the mention rollup
    * is one partial-combined aggregate on the canonical-link key; and the
    * known-page check is a shuffled equi ANTI-join on that same key —
    * both sides are corpus-scale, so no broadcast is assumed, and the
    * join reuses the aggregate's hash partitioning (same key, no extra
    * exchange on the aggregated side).
    */
  def frontier(docs: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val known = docs.select(canonicalizeUrl(col(urlCol)).as("canonical_url"))
    outlinks(docs, urlCol, idCol, textCol)
      .groupBy(col("canonical_link"), col("dst_domain"))
      .agg(count(lit(1)).as("n_mentions"),
        countDistinct(col("src_domain")).as("n_src_domains"),
        min(col(idCol)).as("first_seen_doc"))
      .join(known, col("canonical_link") === col("canonical_url"),
        "left_anti")
  }

  /** Robots-rules evaluation — the standard robots.txt decision procedure
    * (REP, RFC 9309) over prefix rules: for each URL, among the rules of
    * its registered domain whose `path_prefix` prefixes the URL path, the
    * LONGEST match wins; on a length tie `allow` beats `disallow`; a URL
    * with no matching rule (or a domain with no rules) is allowed. The
    * empty path evaluates as "/" (a bare-authority URL is the root).
    * `rules` is (domain, directive ∈ {allow, disallow}, path_prefix).
    *
    * Unlike [[blocklistFilter]] (which DROPS), this ANNOTATES: output is
    * the input plus (domain, path, allowed, matched_prefix) — the verdict
    * table a recrawl scheduler or compliance audit reads.
    *
    * Scale shape: rules are curation metadata (per-domain rule counts are
    * small — real robots files cap out in the hundreds), so they are
    * pre-grouped into per-domain rule ARRAYS on the metadata side and
    * BROADCAST; the corpus takes one narrow pass (broadcast equi-join on
    * the domain plus a per-row fold over that domain's few rules) — zero
    * corpus shuffle, the [[blocklistFilter]] shape with argmax semantics.
    * The winner is order-independent: the max key (length, allow) is
    * unique up to identical rules, so the unordered collect is safe.
    */
  def robotsEval(docs: DataFrame, rules: DataFrame,
      urlCol: String = "url"): DataFrame = {
    val ruleArr = rules.groupBy(col("domain"))
      .agg(collect_list(struct(col("path_prefix").as("p"),
        (col("directive") === "allow").as("a"))).as("__rules"))
    val emptyRules = array().cast("array<struct<p:string,a:boolean>>")
    val init = struct(lit(-1).as("l"), lit(true).as("a"), lit("").as("p"))
    docs
      .withColumn("domain", urlDomain(col(urlCol)))
      .withColumn("path",
        when(urlPath(col(urlCol)) === "", lit("/"))
          .otherwise(urlPath(col(urlCol))))
      .join(broadcast(ruleArr), Seq("domain"), "left")
      .withColumn("__win", aggregate(
        filter(coalesce(col("__rules"), emptyRules),
          r => col("path").startsWith(r.getField("p"))),
        init,
        (acc, r) => {
          val l = length(r.getField("p"))
          when(l > acc.getField("l") ||
              (l === acc.getField("l") && r.getField("a")),
            struct(l.as("l"), r.getField("a").as("a"),
              r.getField("p").as("p")))
            .otherwise(acc)
        }))
      .withColumn("allowed", col("__win.l") < 0 || col("__win.a"))
      .withColumn("matched_prefix", col("__win.p"))
      .drop("__rules", "__win")
  }

  /** Domain-scoped boilerplate detection — the web-native companion of
    * [[TextOps.lineDedup]]'s global boilerplate screen: a line is site
    * chrome (navigation, cookie banner, footer) when it repeats across
    * MOST PAGES OF ITS OWN REGISTERED DOMAIN, regardless of how rare it
    * is corpus-wide — the jusText/Trafilatura-style signal a crawl
    * pipeline strips before any content processing. A normalized line
    * (`lower(trim)`) is flagged iff it appears in ≥ `minDocs` of its
    * domain's docs AND in ≥ `minRatio` of them. Output, one row per
    * non-empty line slot: (doc_id, domain, line_no, line, n_docs,
    * domain_docs, is_boilerplate) — the audit face; rebuilding cleaned
    * docs is the [[TextOps.lineClean]] groupBy over the kept slots.
    *
    * Scale shape: one partial-combined aggregate on the (domain, line
    * key) pair — the pair key spreads a hot domain across its distinct
    * lines, so no single reducer owns a mega-domain — one metadata-side
    * aggregate of per-domain doc counts, an equi-join of the two
    * aggregates on the domain (AQE-splittable: no ordering is consumed),
    * and one equi-join of the line stream back on (domain, key). No
    * broadcast is assumed anywhere: at 100 TB the domain universe itself
    * is beyond broadcast size.
    */
  def domainBoilerplate(docs: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id", textCol: String = "text",
      minRatio: Double = 0.6, minDocs: Long = 2): DataFrame = {
    require(minRatio > 0 && minRatio <= 1,
      s"minRatio must be in (0, 1], got $minRatio")
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    val lines = docs
      .select(col(idCol).as("doc_id"), urlDomain(col(urlCol)).as("domain"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("line_no", "line")))
      .withColumn("__key", lower(trim(col("line"))))
      .where(col("__key") =!= "")
    val stats = lines.groupBy("domain", "__key")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    val domainDocs = docs
      .select(urlDomain(col(urlCol)).as("domain"), col(idCol).as("doc_id"))
      .groupBy("domain").agg(countDistinct(col("doc_id")).as("domain_docs"))
    lines
      .join(stats.join(domainDocs, Seq("domain")), Seq("domain", "__key"))
      .select(col("doc_id"), col("domain"), col("line_no"), col("line"),
        col("n_docs"), col("domain_docs"),
        (col("n_docs") >= lit(minDocs) &&
          col("n_docs").cast("double") >=
            lit(minRatio) * col("domain_docs").cast("double"))
          .as("is_boilerplate"))
  }

  /** Politeness fetch scheduler: assign each queued fetch the EARLIEST
    * feasible time under a per-domain minimum gap — the classic crawl
    * recurrence `sched_i = max(arrival_i, sched_{i−1} + delayMs)` walked
    * per registered domain in `idCol` order (the queue order; pass an
    * arrival-ordered id for strict FIFO politeness). Output appends
    * (domain, arrival_ms, fetch_rank, scheduled_ms, wait_ms).
    *
    * Scale shape: the recurrence looks sequential but unrolls to
    * `sched_i = delay·i + max_{j≤i}(arrival_j − delay·j)` — a per-domain
    * prefix COUNT (the rank) plus a per-domain prefix MAX, both of which
    * run as the sharded Blelloch scans ([[Prefix.runningSum]] /
    * [[Prefix.runningMax]] grouped by domain): per-task work is bounded
    * by `shardWidth` ids, so the canonically Zipfian domain key cannot
    * hand one task a mega-domain's whole queue — the same skew shape as
    * [[domainBudgetCap]].
    */
  def fetchSchedule(fetches: DataFrame, delayMs: Long,
      urlCol: String = "url", idCol: String = "event_id",
      tsCol: String = "ts", shardWidth: Long = 1L << 20): DataFrame = {
    require(delayMs > 0, s"delayMs must be positive, got $delayMs")
    // ONE corpus exchange serves the whole chain: each Prefix scan now
    // hangs both its branches off its own window exchange (input executed
    // once — the URL→PSL-domain projection runs exactly once, below that
    // exchange), and the SECOND scan reuses the FIRST's (domain, __shard)
    // partitioning via the retained __shard column (same idCol, same
    // shardWidth — the chained-scan contract), so it adds no exchange at
    // all. The barrier repartitions this replaced existed only to stop the
    // two-branch double execution the new scan shape no longer has.
    val base = fetches.select(col(idCol),
      urlDomain(col(urlCol)).as("domain"),
      expr(s"`$tsCol` div 1000000").cast("long").as("arrival_ms"))
    val ranked = Prefix.runningSum(base.withColumn("__one", lit(1L)),
        idCol, "__one", groupCols = Seq("domain"),
        shardWidth = shardWidth, endCol = "__cum", keepShard = true)
      .withColumn("fetch_rank", col("__cum") - lit(1L))
      .drop("__one", "__cum")
      .withColumn("__v", col("arrival_ms") - lit(delayMs) * col("fetch_rank"))
    Prefix.runningMax(ranked, idCol, "__v", groupCols = Seq("domain"),
        shardWidth = shardWidth, endCol = "__m")
      .withColumn("scheduled_ms", lit(delayMs) * col("fetch_rank") + col("__m"))
      .withColumn("wait_ms", col("scheduled_ms") - col("arrival_ms"))
      .drop("__v", "__m")
  }

  /** Per-domain token-budget cap: walk each domain's docs in ascending id
    * order and keep a doc while the domain's running token total (NOT
    * counting the current doc) is under `budgetTokens` — so every domain
    * contributes until its budget fills, and one mega-domain cannot
    * dominate the mix (the RefinedWeb per-domain cap, the per-SOURCE
    * [[Sampling.tokenBudgetSample]] composed with the derived domain
    * key). Deterministic: the id order is the tie-break.
    *
    * Skew shape: the domain key is THE canonically Zipfian web key — a
    * plain per-domain window hands one task a mega-domain's entire doc
    * list. The running sum therefore goes through the sharded
    * [[Prefix.runningSum]] grouped by domain (per-(domain, id-shard)
    * local cumsum in parallel, a metadata-scale shard-prefix scan,
    * broadcast add): per-task work is bounded by `shardWidth` ids, not
    * by the hottest domain. Size `shardWidth` so a shard's rows fit one
    * task comfortably (default 2²⁰ ids).
    */
  def domainBudgetCap(docs: DataFrame, budgetTokens: Long,
      urlCol: String = "url", idCol: String = "doc_id",
      textCol: String = "text", shardWidth: Long = 1L << 20): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val lens = docs.select(col(idCol), urlDomain(col(urlCol)).as("domain"),
      size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"))
    Prefix.runningSum(lens, idCol, "n_tokens", groupCols = Seq("domain"),
        shardWidth = shardWidth, endCol = "cum_tokens")
      .where(col("cum_tokens") - col("n_tokens") < budgetTokens)
      .select(col(idCol), col("domain"), col("n_tokens"), col("cum_tokens"))
  }
}
