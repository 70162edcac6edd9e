package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.pipeline.{Components, Dedup, Packing, Similarity}
import graft.ts.{SeriesOps, SeriesStore}
import graft.ts.model.Period

/** Scale-rehearsal harness: wall time of the heavy operator family at three
  * corpus scales (1× / 3× / 9×), the evidence behind SCALING.md. The sf
  * testdata does not ladder the documents/embeddings tables cleanly, so
  * the ladder is synthesized by deterministic replication of sf0.1: each
  * replica gets fresh ids and a lightly mutated payload (a suffix token
  * for text, a per-dimension perturbation for embeddings), which keeps the
  * dedup/similarity structure realistic — replicas ARE near-duplicates of
  * their original, so cluster sizes grow with the factor, the worst
  * realistic case for the pair-producing operators. Each scale is written
  * to parquet first and each op timed from a cold scan, so the measurement
  * includes the read path, not a cached in-memory frame.
  *
  * Output: one JSON line per (op, scale): {"op","n_rows","sec"}.
  */
object ScalingAudit {

  private def timed[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def scaleDocs(base: DataFrame, factor: Int): DataFrame =
    if (factor == 1) base
    else base
      .withColumn("__rep", explode(sequence(lit(0), lit(factor - 1))))
      .select(
        (col("doc_id") * 1000 + col("__rep")).as("doc_id"),
        // replicas stay NEAR-duplicates of the original (suffix token):
        // realistic for dedup and the worst case for pair enumeration
        when(col("__rep") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" qz"), col("__rep"))).as("text"),
        col("lang"), col("source"),
        (length(col("text")) + when(col("__rep") === 0, 0)
          .otherwise(lit(3) + length(col("__rep").cast("string")))).as("n_chars"))

  def scaleVecs(base: DataFrame, factor: Int): DataFrame =
    if (factor == 1) base
    else base
      .withColumn("__rep", explode(sequence(lit(0), lit(factor - 1))))
      .select(
        (col("vec_id") * 1000 + col("__rep")).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x + (pmod(col("__rep") * 31 + i, lit(7)) - 3).cast("float") * 0.01f))
          .as("embedding"),
        col("label"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = new StringBuilder
    def report(op: String, n: Long, sec: Double): Unit = {
      val line = f"""{"op":"$op","n_rows":$n,"sec":$sec%.2f}"""
      println(line); System.err.println(line); out.append(line).append('\n')
    }

    val work = java.nio.file.Files.createTempDirectory("graft-scaling").toString
    val baseDocs = Tables(spark, "/root/testdata/sf0.1").documents
    val baseVecs = Tables(spark, "/root/testdata/sf0.1").embeddings

    val factors = Seq(1, 3, 9)
    // materialize each scale to parquet; ops then time cold from disk
    val docPaths = factors.map { f =>
      val p = s"$work/docs_x$f"
      scaleDocs(baseDocs, f).write.parquet(p)
      f -> p
    }
    val vecPaths = factors.map { f =>
      val p = s"$work/vecs_x$f"
      scaleVecs(baseVecs, f).write.parquet(p)
      f -> p
    }

    // warm-up at the smallest scale so JIT/codegen cost doesn't land on x1
    locally {
      val d = spark.read.parquet(docPaths.head._2)
      val v = spark.read.parquet(vecPaths.head._2)
      Dedup.exact(d).count(); Dedup.minhashNearDups(d).count()
      Similarity.kmeans(v, k = 8, iters = 2).count()
      graft.pipeline.TextOps.dupNgramSpans(d).count()
      graft.pipeline.Sketches.cmsTopK(d.select(
        explode(graft.pipeline.TextOps.tokens(col("text"))).as("term")),
        "term", 20).count()
    }

    // ---- session-7 operators (SPARK_GRAFT_SCALE_ONLY=session7 runs just
    // these and writes SCALING_raw_extra.jsonl, so a new session can append
    // ladder rows without re-timing the whole audit) ----
    val scaleOnly = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
    val onlySession7 = scaleOnly.contains("session7")
    val onlySession8 = scaleOnly.contains("session8")
    val onlySession9 = scaleOnly.contains("session9")
    val onlySession11 = scaleOnly.contains("session11")
    val onlySession12 = scaleOnly.contains("session12")
    val onlySession13 = scaleOnly.contains("session13")
    val onlySession14 = scaleOnly.contains("session14")
    val onlySession15 = scaleOnly.contains("session15")

    // ---- session-15 operators (SPARK_GRAFT_SCALE_ONLY=session15; same
    // append-to-SCALING_raw_extra.jsonl contract): the web-curation family
    // — canonicalization must scale as a pure scan (narrow map), domain
    // stats as one partial-combined agg on the domain key, the budget cap
    // as one window over the domain partitioning ----
    if (onlySession15) {
      docPaths.foreach { case (f, p) =>
        val d = spark.read.parquet(p)
        val n = d.count()
        val withUrl = d.withColumn("url",
          concat(lit("HTTPS://WWW."), col("source"), lit("-"),
            (col("doc_id") % 97).cast("string"),
            lit(".com:443/a/"), col("doc_id").cast("string"),
            lit("/?utm_source=rss&x="), (col("doc_id") % 7).cast("string")))
        report(s"web_canonical_x$f", n,
          timed(withUrl.select(
            graft.pipeline.WebOps.canonicalizeUrl(col("url"))).count()))
        report(s"web_domain_stats_x$f", n,
          timed(graft.pipeline.WebOps.domainStats(withUrl).count()))
        report(s"web_domain_budget_x$f", n,
          timed(graft.pipeline.WebOps.domainBudgetCap(withUrl, 600).count()))
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("SCALING_raw_extra.jsonl"), out.toString,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      spark.stop()
      return
    }

    // ---- session-14 operators (SPARK_GRAFT_SCALE_ONLY=session14; same
    // append-to-SCALING_raw_extra.jsonl contract) ----
    if (onlySession14) {
      vecPaths.foreach { case (f, p) =>
        val v = spark.read.parquet(p)
        val n = v.count()
        // frozen IVF-PQ serving (the complete production read path —
        // probe + cell-pruned ADC + exact rerank) vs frozen PQ full-scan
        // serving at the SAME geometry (m=8, kc=64, candidates=50):
        // train+freeze stay OUTSIDE both timers. Both serve-many passes
        // must read ~linear in the corpus; the IVF row's constant must be
        // visibly smaller — the nprobe/#cells fraction of the code table
        // is all the cell restriction lets into the scoring dataflow.
        val (cells, cb, cd) = Similarity.ivfPqTrain(v, m = 8, kc = 64,
          iters = 1)
        val (ceF, cbF, cdF) = Similarity.ivfPqFreeze(cells, cb, cd,
          s"scaling-ivfpq-$n", s"$work/ivfpq_x$f")
        val q = v.orderBy("vec_id").limit(5)
        report(s"ivfpq_serve_frozen_x$f", n,
          timed(Similarity.ivfPqRerankFrozen(q, v, ceF, cbF, cdF,
            topK = 3, candidates = 50, nprobe = 3).count()))
        report(s"pq64_serve_frozen_x$f", n,
          timed(Similarity.pqRerankFrozen(q, v, cbF, cdF.drop("cell"),
            topK = 3, candidates = 50).count()))
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("SCALING_raw_extra.jsonl"), out.toString,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      spark.stop()
      return
    }

    // ---- session-13 operators (SPARK_GRAFT_SCALE_ONLY=session13; same
    // append-to-SCALING_raw_extra.jsonl contract) ----
    if (onlySession13) {
      // frozen logreg model: trained ONCE on the base corpus (the model is
      // corpus-independent — dims+1 rows); serving is the laddered half
      val clfBase = spark.read.parquet(docPaths.head._2)
      graft.pipeline.TextOps.logregTrain(clfBase,
          graft.pipeline.TextOps.qualityScoreCol(col("text")) >= 0.6)
        .write.mode("overwrite").parquet(s"$work/clf_model")
      val clfF = spark.read.parquet(s"$work/clf_model")
      docPaths.foreach { case (f, p) =>
        val d = spark.read.parquet(p)
        val n = d.count()
        // PPJoin-prefix containment join with BOTH sides growing (the r11
        // rework removed the broadcast bound; the pre-rework ladder row
        // only grew the left side): right = every 17th doc's token window,
        // the sql_containment_join shape — exponent must read ≲1.2
        val right = d
          .where(col("doc_id") % 17 === 0 &&
            size(graft.pipeline.TextOps.tokens(col("text"))) >= 46)
          .select((col("doc_id") + lit(1L << 41)).as("doc_id"),
            array_join(slice(graft.pipeline.TextOps.tokens(col("text")), 5, 40), " ")
              .as("text"))
        report(s"containment_join_x$f", n,
          timed(Dedup.containmentJoin(d, right, threshold = 0.8).count()))
        // CCNet line dedup over synthesized line structure (a newline
        // every 12 words — the text_line_dedup fixture shape): one
        // line-key shuffle + one equi-join, must read ~linear
        val lines = d.select(col("doc_id"), split(col("text"), " ").as("__w"))
          .select(col("doc_id"), concat_ws("\n", transform(
            sequence(lit(0), ceil(size(col("__w")) / lit(12.0)).cast("int") - 1),
            i => array_join(slice(col("__w"), i * 12 + 1, lit(12)), " ")))
            .as("text"))
        report(s"line_dedup_x$f", n,
          timed(graft.pipeline.TextOps.lineDedup(lines).count()))
        // frozen-classifier serving: one corpus scan against
        // driver-literal weights — linear by plan shape, measured here
        report(s"clf_serve_frozen_x$f", n,
          timed(graft.pipeline.TextOps.logregScoreFrozen(d, clfF).count()))
      }
      vecPaths.foreach { case (f, p) =>
        val v = spark.read.parquet(p)
        val n = v.count()
        // frozen-PQ serving at production code size (m=8, kc=256):
        // train+freeze stay OUTSIDE the timer; the timed half is the ADC
        // shortlist + exact rerank over the frozen code table (n·m rows)
        // — the serve-many path must read ~linear in the corpus
        val (cb, cd) = Similarity.pqTrain(v, m = 8, kc = 256, iters = 1)
        val (cbF, cdF) = Similarity.pqFreeze(cb, cd, s"scaling-pq-$n",
          s"$work/pq_x$f")
        val q = v.orderBy("vec_id").limit(5)
        report(s"pq_serve_frozen_x$f", n,
          timed(Similarity.pqRerankFrozen(q, v, cbF, cdF,
            topK = 3, candidates = 100).count()))
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("SCALING_raw_extra.jsonl"), out.toString,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      spark.stop()
      return
    }

    // ---- session-12 operators (SPARK_GRAFT_SCALE_ONLY=session12; same
    // append-to-SCALING_raw_extra.jsonl contract) ----
    if (onlySession12) {
      docPaths.foreach { case (f, p) =>
        val d = spark.read.parquet(p)
        val n = d.count()
        // kernelized winnowing: one WinnowEncoded pass per doc behind a
        // spread exchange — no gram explode, no sort-window — so the
        // ladder must read ~linear with the new (much smaller) constant;
        // compare the session-5 dedup_winnow_x rows for the old shape
        report(s"text_winnow_x$f", n,
          timed(graft.pipeline.TextOps.winnowFingerprints(d).count()))
        // pair verify via binaryCompare sorted-jaccard over kernel-built
        // shingle sets (the post-fix minhash verify shape)
        report(s"dedup_minhash_x$f", n,
          timed(Dedup.minhashNearDups(d).count()))
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("SCALING_raw_extra.jsonl"), out.toString,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      spark.stop()
      return
    }

    // ---- session-11 operators (SPARK_GRAFT_SCALE_ONLY=session11; same
    // append-to-SCALING_raw_extra.jsonl contract) ----
    if (onlySession11) {
      vecPaths.foreach { case (f, p) =>
        val v = spark.read.parquet(p)
        val n = v.count()
        // cell-blocked knn graph under the corpus-scaled cellsFor (√n)
        // DEFAULT: both the Lloyd assignment (n·√n) and the within-cell
        // candidate space (nprobe·n·n/√n) grow as n^1.5, so the recorded
        // exponent must read ≈1.5 — sub-quadratic with NO caller tuning,
        // against Θ(n²/kCells) at any fixed cell count
        report(s"vec_knn_graph_auto_x$f", n,
          timed(Similarity.knnGraph(v, k = 3).count()))
      }
      docPaths.foreach { case (f, p) =>
        val d = spark.read.parquet(p)
        val n = d.count()
        // distributed exact global rank (rfm's primitive): deterministic
        // boundary sample + pid-partitioned windows + a ≤parts-row offset
        // broadcast — the ladder must read ~linear (the single-partition
        // window it replaced is the shape that does NOT)
        report(s"prefix_global_rank_x$f", n, timed(
          graft.pipeline.Prefix.globalRowNumber(
            d.select(col("doc_id"), length(col("text")).as("len")),
            col("len"), col("doc_id"), "rn", n).count()))
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("SCALING_raw_extra.jsonl"), out.toString,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      spark.stop()
      return
    }

    // ---- session-9 operators (SPARK_GRAFT_SCALE_ONLY=session9; same
    // append-to-SCALING_raw_extra.jsonl contract) ----
    if (onlySession9) {
      docPaths.foreach { case (f, p) =>
        val d = spark.read.parquet(p)
        val n = d.count()
        // DSIR: gram hashing is linear, the model tables are fixed (dims
        // rows) regardless of corpus size — the ladder must read ~linear
        report(s"sample_dsir_x$f", n, timed(
          graft.pipeline.Sampling.dsirResample(d, col("lang") === "en",
            k = 100).count()))
        // end-to-end curation: replication grows the near-dup cliques
        // (every replica pairs with its original), so the minhash stage
        // dominates — the composite must track ITS ladder, not worse
        val bench = graft.pipeline.Sampling.assignSplit(d, "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .where(col("split") === "test")
        report(s"pipeline_curate_x$f", n, timed(
          graft.pipeline.Curation.curate(d, bench).count()))
        // cross-corpus contamination probe against a FIXED bench side:
        // the claimed scale shape is "a small right makes this a probe of
        // the left's band index" — cost must track the LEFT linearly
        val fixedBench = Tables(spark, "/root/testdata/sf0.1").documents
          .where(col("doc_id") % 10 === 0).select("doc_id", "text")
        report(s"dedup_cross_x$f", n, timed(
          Dedup.minhashJoin(d, fixedBench).count()))
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("SCALING_raw_extra.jsonl"), out.toString,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      spark.stop()
      return
    }

    // ---- session-8 operators (SPARK_GRAFT_SCALE_ONLY=session8 runs just
    // these; same append-to-SCALING_raw_extra.jsonl contract) ----
    if (onlySession8) {
      // k-core + Adamic-Adar over the near-dup graph: doc replication
      // multiplies duplicate-family cliques, so edges grow superlinearly —
      // the peel must stay round-bounded and the wedge volume capped
      docPaths.foreach { case (f, p) =>
        val d = spark.read.parquet(p)
        val n = d.count()
        val edges = Dedup.minhashNearDups(d)
        report(s"graph_kcore_x$f", n, timed(Components.kCore(edges, 2).count()))
        report(s"graph_adamic_adar_x$f", n,
          timed(Components.adamicAdar(edges).count()))
      }
      // int8 shortlist search: fixed 5-query set, linear corpus scan
      vecPaths.foreach { case (f, p) =>
        val c = spark.read.parquet(p)
        val q = c.where(col("vec_id") % 1000 === 0).limit(5)
        val n = c.count()
        report(s"sim_sq_topk_x$f", n, timed(
          Similarity.sqTopK(q, c, k = 3, shortlist = 50).count()))
      }
      // DTW: points densified f x on the SAME series/axis — the daily
      // resample bounds the DP, so cost must stay ~flat past the rollup
      factors.foreach { f =>
        val p0 = Tables(spark, "/root/testdata/sf0.1").eventsUs
          .where(col("user_id") < 10)
          .select(concat(lit("shyft://events/u"), col("user_id"), lit("/"),
            col("event_type")).as("series_id"), col("ts"), col("value"))
        val pts = if (f == 1) p0 else p0
          .withColumn("__rep", explode(sequence(lit(0), lit(f - 1))))
          .select(col("series_id"), (col("ts") + col("__rep")).as("ts"),
            col("value"))
        val n = pts.count()
        report(s"ts_dtw_x$f", n, timed(
          SeriesOps.dtw(pts, 86400L * 1000000000L).count()))
      }
      // survival / CUPED / RAKE / distinct profile: plain linear scans
      // under event/doc replication with fresh users (survival's risk sets
      // and CUPED's moments are per-user rollups)
      factors.foreach { f =>
        val e0 = Tables(spark, "/root/testdata/sf0.1").events
        val ev = if (f == 1) e0 else e0
          .withColumn("__rep", explode(sequence(lit(0), lit(f - 1))))
          .select(col("event_id"),
            (col("user_id") + col("__rep") * lit(10000000L)).as("user_id"),
            col("event_type"), col("ts"), col("value"), col("props"))
        val n = ev.count()
        report(s"events_survival_x$f", n, timed(
          graft.ops.Retention.survival(ev, censorDays = 48,
            dayNs = 3600L * 1000000000L).count()))
        report(s"events_cuped_x$f", n, timed(
          graft.ops.Experiment.cuped(ev, "user_id",
            when(col("event_type") === "purchase" && col("value").isNotNull
              && !isnan(col("value")), floor(col("value")).cast("long"))
              .otherwise(0L)).count()))
        val em = ev.withColumn("value_m",
          when(!isnan(col("value")), floor(col("value") * 1000).cast("long")))
        report(s"profile_distinct_x$f", n, timed(
          graft.pipeline.Profile.distinctProfile(em,
            Seq("event_id", "user_id", "event_type", "value_m", "props"))
            .count()))
      }
      docPaths.foreach { case (f, p) =>
        val d = spark.read.parquet(p)
        val n = d.count()
        report(s"text_rake_x$f", n, timed(
          graft.pipeline.TextOps.rakePhrases(d).count()))
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("SCALING_raw_extra.jsonl"), out.toString,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      spark.stop()
      return
    }

    // radius-2 fuzzy join: the ~(len²/2)× variant fan-out is the cost
    // driver; candidate volume must stay near-linear in the master size
    factors.foreach { f =>
      val master = Tables(spark, "/root/testdata/sf0.1").customer
        .select("c_custkey")
        .withColumn("__rep", explode(sequence(lit(0), lit(f - 1))))
        .select((col("c_custkey") * 10 + col("__rep")).as("c_custkey"),
          concat(lit("Customer#"),
            lpad((col("c_custkey") * 10 + col("__rep")).cast("string"), 9, "0"))
            .as("c_name"))
      val dirty = master.where(col("c_custkey") % (3 * f) === 0)
        .select((col("c_custkey") + lit(1L << 40)).as("d_id"),
          expr("concat(substring(c_name, 1, CAST(9 + c_custkey % 5 AS INT)), " +
            "substring(c_name, CAST(11 + c_custkey % 5 AS INT), length(c_name)))")
            .as("d_name"))
      val n = master.count()
      report(s"er_ed2_join_x$f", n, timed(
        graft.ops.FuzzyJoin.editJoin(dirty, master,
          "d_id", "d_name", "c_custkey", "c_name", maxDist = 2).count()))
    }

    // SAX motif census: the event stream replicated f x under fresh series
    // ids — the lead window stays per-series, the census key space is
    // bounded (4^4 words), so the whole op must scale ~linearly
    factors.foreach { f =>
      val p0 = Tables(spark, "/root/testdata/sf0.1").points
        .select("series_id", "ts", "value")
      val pts = if (f == 1) p0 else p0
        .withColumn("__rep", explode(sequence(lit(0), lit(f - 1))))
        .select(concat(col("series_id"), lit("/r"), col("__rep")).as("series_id"),
          col("ts"), col("value"))
      val n = pts.count()
      report(s"ts_motifs_x$f", n, timed(
        SeriesOps.saxMotifs(pts, 3600L * 1000000000L).count()))
    }

    // RP-shortlisted top-k: fixed 5-query set against the laddered corpus —
    // the projected brute pass is the linear corpus scan the shortlist
    // design intends; the exact re-rank stays shortlist-bounded
    vecPaths.foreach { case (f, p) =>
      val c = spark.read.parquet(p)
      val q = c.where(col("vec_id") % 1000 === 0).limit(5)
      val n = c.count()
      report(s"sim_rp_topk_x$f", n, timed(
        Similarity.rpTopK(q, c, k = 3, shortlist = 50).count()))
    }

    if (onlySession7) {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("SCALING_raw_extra.jsonl"), out.toString,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      spark.stop()
      return
    }

    docPaths.foreach { case (f, p) =>
      def d = spark.read.parquet(p)
      val n = d.count()
      report(s"dedup_exact_x$f", n, timed(Dedup.exact(d).count()))
      report(s"dedup_minhash_x$f", n, timed(Dedup.minhashNearDups(d).count()))
      report(s"dedup_simhash_x$f", n, timed(Dedup.simhashNearDups(d).count()))
      report(s"dedup_containment_x$f", n,
        timed(Dedup.containmentDups(d, threshold = 0.8).count()))
      report(s"dedup_clusters_x$f", n, timed(Components.dedupClusters(d).count()))
      report(s"dedup_keepers_x$f", n, timed(Components.dedupKeepers(d).count()))
      report(s"graph_pagerank_x$f", n,
        timed(Components.pageRank(Dedup.minhashNearDups(d), iters = 3).count()))
      report(s"graph_triangles_x$f", n,
        timed(Components.triangleCounts(Dedup.minhashNearDups(d)).count()))
      report(s"pack_sequences_x$f", n,
        timed(Packing.packSequences(d, 512, shardWidth = 100).count()))
      // round-9 late additions: shared-exchange dup spans, bloom probe,
      // bounded-counter CMS — the scale claims these operators make
      report(s"text_dup_spans_x$f", n,
        timed(graft.pipeline.TextOps.dupNgramSpans(d).count()))
      report(s"bloom_decontaminate_x$f", n, timed {
        val bench = graft.pipeline.Sampling.assignSplit(d, "doc_id",
          Seq("train" -> 0.9, "test" -> 0.1)).where(col("split") === "test")
        graft.pipeline.TextOps.bloomDecontaminate(d, bench, n = 5).count()
      })
      report(s"sketch_cms_x$f", n, timed(
        graft.pipeline.Sketches.cmsTopK(d.select(
          explode(graft.pipeline.TextOps.tokens(col("text"))).as("term")),
          "term", 20).count()))
      // round-9 session-2 additions: BPE rounds run on the word-frequency
      // table (sub-linear in corpus once counted), the overlap matrix on
      // the gram vocabulary, the compaction plan on the prefix scan
      report(s"bpe_train_x$f", n,
        timed(graft.pipeline.Bpe.train(d, nMerges = 4).merges.count()))
      report(s"source_overlap_x$f", n,
        timed(graft.pipeline.TextOps.sliceOverlap(d, "source").count()))
      report(s"layout_compaction_x$f", n,
        timed(graft.ops.Layout.compactionPlan(d, 4096).count()))
      // round-9 session-4: per-epoch shuffle is one hash shuffle +
      // in-shard ranking — alpha ~ 1 with shard count fixed
      report(s"export_epoch_shuffle_x$f", n, timed(
        graft.pipeline.Export.epochShuffle(d.select("doc_id"),
          epoch = 1, nShards = 8).count()))
      // round-9 session-5: winnow postings are df-capped so the pair join
      // is bounded per fingerprint; the typo join fans out len+1 per
      // VOCAB entry (sub-linear in corpus); CDC folds in one shuffle
      report(s"dedup_winnow_x$f", n,
        timed(graft.pipeline.TextOps.winnowNearDups(d).count()))
      report(s"text_typo_pairs_x$f", n, timed {
        val vocab = d.select(explode(
          graft.pipeline.TextOps.tokens(col("text"))).as("word"))
          .groupBy("word").agg(count(lit(1)).as("cnt"))
          .where(length(col("word")) >= 5)
        graft.pipeline.TextOps.typoPairs(vocab).count()
      })
      report(s"text_skipgrams_x$f", n,
        timed(graft.pipeline.TextOps.skipgrams(d).count()))
      report(s"cdc_apply_x$f", n, timed {
        val log = d.where(col("doc_id") % 7 === 0)
          .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"),
            lit(1L).as("seq"), lit("U").as("op"))
        graft.ops.Cdc.latestState(d.select("doc_id", "text"), log).count()
      })
      // round-9 session-6: the text CDC chunker is map-only + one df-capped
      // inverted index (replicas are near-identical docs, so chunk cliques
      // grow like the minhash pair space); label propagation's per-round
      // cost is one join per EDGE over the same laddered near-dup graph
      report(s"text_cdc_dups_x$f", n,
        timed(graft.pipeline.TextCdc.cdcDups(d).count()))
      report(s"graph_labelprop_x$f", n, timed(
        graft.pipeline.Components.labelPropagation(Dedup.minhashNearDups(d),
          d.where(col("doc_id") % 5 === 0).select("doc_id", "lang"),
          rounds = 3, labelCol = "lang").count()))
    }

    vecPaths.foreach { case (f, p) =>
      def v = spark.read.parquet(p)
      val n = v.count()
      report(s"sim_near_dups_x$f", n,
        timed(Similarity.embeddingNearDups(v, threshold = 0.4).count()))
      report(s"sim_srp_near_dups_x$f", n, timed {
        val e = v.withColumn("srp_cell",
          graft.functions.Signatures.srpBucket(col("embedding"), 6))
        Similarity.embeddingNearDups(e, threshold = 0.4, cellCol = "srp_cell").count()
      })
      report(s"vec_kmeans_x$f", n, timed(Similarity.kmeans(v, k = 8, iters = 2).count()))
      report(s"sim_topk_x$f", n,
        timed(Similarity.bruteForceTopK(v.where(col("vec_id") < 5), v, k = 3).count()))
      // SemDeDup's production policy scales the CLUSTER COUNT with the
      // corpus (the paper uses 50k cells on LAION) so cell sizes — and the
      // within-cell pair space — stay bounded; the ladder rehearses that
      // policy (k = 8·factor), not the fixed-k worst case
      report(s"dedup_semantic_x$f", n,
        timed(Similarity.semanticDedup(v, threshold = 0.4, k = 8 * f,
          iters = 2).count()))
      report(s"vec_pq_x$f", n,
        timed(Similarity.pqEncode(v, m = 2, k = 4, iters = 1).count()))
      report(s"sim_pq_topk_x$f", n,
        timed(Similarity.pqTopK(v.where(col("vec_id") < 5), v, topK = 3).count()))
      // round-9 session-4: one-pass linear family (whitening, broadcast
      // anchor mining) — the exponent claim is alpha ~ 1
      report(s"vec_standardize_x$f", n,
        timed(Similarity.standardize(v).count()))
      report(s"vec_hard_negatives_x$f", n,
        timed(Similarity.hardNegatives(
          v.where(col("vec_id") < 5 * 1000).limit(5), v, k = 5).count()))
      // round-9 session-5: bloom pre-filter cost is one scan + a 32 KiB
      // literal probe — alpha ~ 1; the exact brute knn graph is the
      // oracle-checkable core (quadratic by construction — at scale the
      // cell-blocked candidate path replaces the brute pass), so it runs
      // at x1 only
      if (f == 1)
        report(s"vec_knn_graph_x$f", n,
          timed(Similarity.knnGraph(v, k = 3, kCells = 8).count()))
      // round-9 session-6: k-center is k corpus scans with literal-reentry
      // centers — alpha ~ 1 with k fixed, and k never multiplies the
      // shuffle count (each round is map + TakeOrdered(1))
      report(s"vec_kcenter_x$f", n,
        timed(Similarity.kCenters(v, k = 8).count()))
    }

    // record-linkage fuzzy join at laddered master scale: dirty feed fixed
    // at the x1 injection rate, master replicated f× with fresh ids/names
    // — the variant fan-out is (len+1)× per row, the join stays hash-equi
    factors.foreach { f =>
      val c0 = Tables(spark, "/root/testdata/sf0.1").customer
        .select(col("c_custkey"), col("c_name"))
      val master = if (f == 1) c0 else c0
        .withColumn("__rep", explode(sequence(lit(0), lit(f - 1))))
        .select((col("c_custkey") * 10 + col("__rep")).as("c_custkey"),
          concat(lit("Customer#"),
            lpad((col("c_custkey") * 10 + col("__rep")).cast("string"), 9, "0"))
            .as("c_name"))
      val dirty = master.where(col("c_custkey") % (3 * f) === 0)
        .select((col("c_custkey") + lit(1L << 40)).as("d_id"),
          expr("concat(substring(c_name, 1, CAST(9 + c_custkey % 9 AS INT)), " +
            "substring(c_name, CAST(11 + c_custkey % 9 AS INT), length(c_name)))")
            .as("d_name"))
      val n = master.count()
      report(s"er_fuzzy_join_x$f", n, timed(
        graft.ops.FuzzyJoin.editJoin(dirty, master,
          "d_id", "d_name", "c_custkey", "c_name").count()))
    }

    // bloom-prefiltered semi-join at laddered probe scale: lineitem
    // replicated f times against a fixed small key set
    factors.foreach { f =>
      val li0 = Tables(spark, "/root/testdata/sf0.1").lineitem
        .select("l_orderkey", "l_linenumber", "l_partkey")
      val li = if (f == 1) li0 else li0
        .withColumn("__rep", explode(sequence(lit(0), lit(f - 1)))).drop("__rep")
      val small = Tables(spark, "/root/testdata/sf0.1").part
        .where(col("p_size") === 1).select(col("p_partkey").as("l_partkey"))
      val n = li.count()
      report(s"join_bloom_semi_x$f", n,
        timed(graft.ops.BloomJoin.semiJoin(li, small, "l_partkey").count()))
    }

    // incremental SEMANTIC dedup: a FIXED vector batch against a corpus
    // growing 9x, with the SemDeDup cell-count policy (k = 8·factor) so
    // per-cell populations stay bounded — per-batch cost must stay ~flat
    // (the batch touches its own cells only; the codebook is frozen)
    vecPaths.foreach { case (f, p) =>
      val all = spark.read.parquet(p)
      val batch = all.where(col("vec_id") % 89 === 0).limit(200)
      val baseCorpus = all.join(batch.select("vec_id"), Seq("vec_id"), "left_anti")
      val n = baseCorpus.count()
      val st = graft.pipeline.IncrementalSemDedup.bootstrap(
        baseCorpus, threshold = 0.4, k = 8 * f, iters = 2)
      st.labels.count(); st.vectors.count()
      report(s"incr_sem_addbatch_x$f", n, timed {
        graft.pipeline.IncrementalSemDedup.addBatch(st, batch).labels.count()
      })
    }

    // incrementality proof: the cost of ingesting a FIXED batch must stay
    // ~flat while the existing corpus grows 9× — the batch only touches
    // the bucket-index join and the by-id shingle fetch, never the corpus
    docPaths.foreach { case (f, p) =>
      val all = spark.read.parquet(p)
      val batch = all.where(col("doc_id") % 89 === 0).limit(500)
      val baseCorpus = all.join(batch.select("doc_id"), Seq("doc_id"), "left_anti")
      val n = baseCorpus.count()
      val st = graft.pipeline.IncrementalDedup.bootstrap(baseCorpus)
      // force the bootstrap work out of the timed window
      st.labels.count(); st.buckets.count()
      report(s"incr_addbatch_x$f", n, timed {
        val st2 = graft.pipeline.IncrementalDedup.addBatch(st, batch)
        st2.labels.count()
      })
    }

    // store_merge ladder: the events tables DO scale 1k/10k/100k across sf
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .foreach { dir =>
        // bounded-synopsis claim: the quantile sample is k rows per group
        // whatever the group size, so the ladder should read ~flat past
        // the scan cost
        val ev = Tables(spark, dir).events
        report(s"sketch_quantile_${dir.split('/').last}", ev.count(), timed(
          graft.pipeline.Sketches.quantileSketch(ev, 64, Seq("event_type"),
            "event_id", "value").count()))
        // KS drift: sharded-prefix CDF walk — linear in rows, no
        // single-partition window whatever the value cardinality
        report(s"profile_ks_drift_${dir.split('/').last}", ev.count(), timed(
          graft.pipeline.Profile.ksDrift(ev, "event_type", "value",
            col("ts") < 1705276800L * 1000000000L, shardWidth = 50.0).count()))
        val e = Tables(spark, dir).eventsUs
        val p = e.select(
          concat(lit("shyft://events/u"), col("user_id"), lit("/"),
            col("event_type")).as("series_id"),
          col("ts"), col("value"))
        val n = p.count()
        report(s"store_merge_${dir.split('/').last}", n, timed {
          val warehouse = java.nio.file.Files.createTempDirectory("graft-scale-merge").toString
          val store = new SeriesStore(spark, warehouse, numBuckets = 8)
          store.merge("events", p)
          store.merge("events", p) // idempotent re-merge, the heavier path
          store.read("events").count()
        })
      }

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("SCALING_raw.jsonl"), out.toString)
    spark.stop()
  }
}
