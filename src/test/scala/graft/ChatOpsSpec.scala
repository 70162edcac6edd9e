package graft

import org.apache.spark.sql.functions._

import graft.pipeline.ChatOps

/** Pins for the post-training (SFT / preference) data-prep family:
  * turn-structure validation semantics on hand-built defect cases, span
  * offsets consistent with the rendered string by substring extraction,
  * rendered-identity dedup, and the length-bias arithmetic.
  */
class ChatOpsSpec extends SparkSpec {
  import spark.implicits._

  /** (conv_id, turn_no, role, content) rows. */
  private def turns(rows: (Long, Int, String, String)*) =
    rows.toDF("conv_id", "turn_no", "role", "content")

  test("turnStats: clean conversation validates; counts and token sums") {
    val t = turns(
      (1L, 0, "system", "be brief"),
      (1L, 1, "user", "what is two plus two"),
      (1L, 2, "assistant", "four"),
      (1L, 3, "user", "thanks"),
      (1L, 4, "assistant", "welcome"))
    val r = ChatOps.turnStats(t).collect().head
    assert(r.getAs[Long]("n_turns") == 5L)
    assert(r.getAs[Long]("n_user") == 2L)
    assert(r.getAs[Long]("n_assistant") == 2L)
    assert(r.getAs[Boolean]("has_system"))
    assert(r.getAs[Long]("n_empty") == 0L)
    assert(r.getAs[Long]("user_tokens") == 6L) // 5 + 1
    assert(r.getAs[Long]("assistant_tokens") == 2L)
    assert(r.getAs[Boolean]("alternation_ok"))
    assert(r.getAs[Boolean]("starts_with_user"))
    assert(r.getAs[Boolean]("valid"))
  }

  test("turnStats flags each defect independently") {
    val t = turns(
      // conv 1: consecutive user turns
      (1L, 0, "user", "a"), (1L, 1, "user", "b"), (1L, 2, "assistant", "c"),
      // conv 2: opens with assistant
      (2L, 0, "assistant", "a"), (2L, 1, "user", "b"),
      (2L, 2, "assistant", "c"),
      // conv 3: empty turn (whitespace-only counts as empty)
      (3L, 0, "user", "a"), (3L, 1, "assistant", "  "),
      // conv 4: no assistant turn at all
      (4L, 0, "user", "a"),
      // conv 5: system turn breaks adjacency, does not flag alternation
      (5L, 0, "system", "s"), (5L, 1, "user", "a"), (5L, 2, "assistant", "b"))
    val m = ChatOps.turnStats(t).collect()
      .map(r => r.getAs[Long]("conv_id") -> r).toMap
    assert(!m(1L).getAs[Boolean]("alternation_ok") &&
      !m(1L).getAs[Boolean]("valid"))
    assert(!m(2L).getAs[Boolean]("starts_with_user") &&
      !m(2L).getAs[Boolean]("valid"))
    assert(m(3L).getAs[Long]("n_empty") == 1L && !m(3L).getAs[Boolean]("valid"))
    assert(m(4L).getAs[Long]("n_assistant") == 0L &&
      !m(4L).getAs[Boolean]("valid"))
    assert(m(5L).getAs[Boolean]("alternation_ok") &&
      m(5L).getAs[Boolean]("valid"))
  }

  test("renderChat: segments in turn order, separator accounting") {
    val t = turns(
      (7L, 2, "assistant", "fine"), // out-of-order input rows
      (7L, 0, "system", "be brief"),
      (7L, 1, "user", "how are you"))
    val r = ChatOps.renderChat(t).collect().head
    assert(r.getAs[String]("text") ==
      "<|system|>be brief\n<|user|>how are you\n<|assistant|>fine")
    assert(r.getAs[Long]("n_chars") == r.getAs[String]("text").length.toLong)
  }

  test("lossSpans: substring(rendered, start, len) is exactly the segment; " +
    "only assistant turns take loss") {
    val t = turns(
      (9L, 0, "system", "sys prompt"),
      (9L, 1, "user", "question one"),
      (9L, 2, "assistant", "answer one"),
      (9L, 3, "user", ""),
      (9L, 4, "assistant", "answer two"))
    val rendered = ChatOps.renderChat(t).collect().head.getAs[String]("text")
    val spans = ChatOps.lossSpans(t).collect().sortBy(_.getAs[Int]("turn_no"))
    assert(spans.length == 5)
    spans.foreach { s =>
      val start = s.getAs[Long]("start_char").toInt
      val end = s.getAs[Long]("end_char").toInt
      val seg = rendered.substring(start, end)
      assert(seg == s"<|${s.getAs[String]("role")}|>" +
        t.collect().find(r => r.getAs[Int]("turn_no") ==
          s.getAs[Int]("turn_no")).get.getAs[String]("content"))
      assert(s.getAs[Boolean]("loss_masked") ==
        (s.getAs[String]("role") != "assistant"))
    }
    // spans tile the rendered string with single-char separators between
    assert(spans.head.getAs[Long]("start_char") == 0L)
    assert(spans.last.getAs[Long]("end_char") == rendered.length.toLong)
    spans.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("start_char") == a.getAs[Long]("end_char") + 1)
    }
  }

  test("conversationDedup: identical conversations collapse, lowest keeper; " +
    "role order distinguishes") {
    val t = turns(
      (10L, 0, "user", "hi"), (10L, 1, "assistant", "hello"),
      (12L, 0, "user", "hi"), (12L, 1, "assistant", "hello"),
      (11L, 0, "user", "hi"), (11L, 1, "assistant", "hello there"),
      // same contents as conv 10 but roles swapped -> distinct identity
      (13L, 0, "assistant", "hi"), (13L, 1, "user", "hello"))
    val r = ChatOps.conversationDedup(t).collect()
    assert(r.length == 3)
    val dup = r.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keeper_conv_id") == 10L)
    assert(r.count(_.getAs[Long]("n_copies") == 1L) == 2)
  }

  test("fitContext: keeps system + the longest recent-turn suffix under " +
    "the budget; oversized system is itself dropped") {
    val t = turns(
      (1L, 0, "system", "one two"),        // 2 tokens
      (1L, 1, "user", "a b c d"),          // 4
      (1L, 2, "assistant", "e f g"),       // 3
      (1L, 3, "user", "h i"),              // 2
      (1L, 4, "assistant", "j k l m"))     // 4
    // budget 10: sys(2) + suffix sums incl: t4=4, t3=6, t2=9, t1=13
    // -> kept: system, t2, t3, t4 (9+2<=10 fails? 9+2=11>10 -> t2 out)
    val kept = ChatOps.fitContext(t, budgetTokens = 10).collect()
      .map(r => r.getAs[Int]("turn_no") -> r.getAs[Boolean]("kept")).toMap
    assert(kept == Map(0 -> true, 1 -> false, 2 -> false, 3 -> true,
      4 -> true))
    // kept non-system turns form a SUFFIX at any budget
    for (b <- 1L to 16L) {
      val ks = ChatOps.fitContext(t, b).collect()
        .filter(_.getAs[String]("role") != "system")
        .sortBy(_.getAs[Int]("turn_no")).map(_.getAs[Boolean]("kept"))
      assert(!ks.sliding(2).exists { case Array(a, b2) => a && !b2 },
        s"kept set not a suffix at budget $b")
    }
    // a system turn that alone exceeds the budget is dropped
    val big = turns((2L, 0, "system", "s1 s2 s3 s4 s5"), (2L, 1, "user", "q"))
    val k2 = ChatOps.fitContext(big, budgetTokens = 3).collect()
      .map(r => r.getAs[Int]("turn_no") -> r.getAs[Boolean]("kept")).toMap
    assert(k2 == Map(0 -> false, 1 -> false))
  }

  test("bestOfN: argmax/argmin per prompt, sample-id tie-breaks, " +
    "degenerate single-sample prompts") {
    val samples = Seq(
      // prompt 1: clear best (s=3) and worst (s=1)
      (1L, 10L, "r10", 2.0), (1L, 11L, "r11", 3.0), (1L, 12L, "r12", 1.0),
      // prompt 2: all scores tie -> lowest sample_id wins BOTH sides
      (2L, 20L, "r20", 5.0), (2L, 21L, "r21", 5.0),
      // prompt 3: single sample -> degenerate
      (3L, 30L, "r30", 4.0))
      .toDF("prompt_id", "sample_id", "response", "score")
    val m = ChatOps.bestOfN(samples).collect()
      .map(r => r.getAs[Long]("prompt_id") -> r).toMap
    assert(m(1L).getAs[Long]("chosen_sample_id") == 11L)
    assert(m(1L).getAs[Long]("rejected_sample_id") == 12L)
    assert(m(1L).getAs[Double]("score_margin") == 2.0)
    assert(!m(1L).getAs[Boolean]("degenerate"))
    assert(m(2L).getAs[Long]("chosen_sample_id") == 20L)
    assert(m(2L).getAs[Long]("rejected_sample_id") == 20L)
    assert(m(2L).getAs[Boolean]("degenerate"))
    assert(m(3L).getAs[Boolean]("degenerate"))
    assert(m(3L).getAs[Long]("n_samples") == 1L)
  }

  test("prefLengthBias: ratios and deltas on a hand-checked mix") {
    val pairs = Seq(
      ("a", "one two three", "one"),       // chosen longer (+2)
      ("a", "one", "one two"),             // rejected longer (-1)
      ("a", "one two", "three four"),      // tie (not longer)   (0)
      ("b", "w x y z", "w")                // chosen longer (+3)
    ).toDF("source", "chosen", "rejected")
    val m = ChatOps.prefLengthBias(pairs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(m("a").getAs[Long]("n_pairs") == 3L)
    assert(m("a").getAs[Double]("longer_chosen_ratio") == 1.0 / 3)
    assert(m("a").getAs[Double]("chosen_tokens_mean") == 2.0)
    assert(m("a").getAs[Double]("mean_token_delta") == (2 - 1 + 0) / 3.0)
    assert(m("b").getAs[Double]("longer_chosen_ratio") == 1.0)
    assert(m("b").getAs[Double]("mean_token_delta") == 3.0)
  }

  test("packedLossSpans: chunk spans tile [0, chunk tokens) and agree with " +
    "packSequences(renderChat) chunk occupancy") {
    import graft.pipeline.Packing
    // 30 conversations with varying turn counts -> multiple 16-token
    // chunks with conversations straddling boundaries
    val t = turns((1L to 30L).flatMap { c =>
      (0 until (1 + (c % 4)).toInt).map { i =>
        (c, i, if (i % 2 == 0) "user" else "assistant",
          (1 to ((c + i) % 5 + 1).toInt).map(j => s"w$j").mkString(" "))
      }
    }: _*)
    val spans = ChatOps.packedLossSpans(t, capacity = 16, shardWidth = 7)
      .collect()
    // per chunk: spans are disjoint, ordered, and tile an exact prefix
    // range [0, occupancy)
    spans.groupBy(_.getAs[Long]("chunk_id")).foreach { case (cid, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("tok_start"))
      assert(sorted.head.getAs[Long]("tok_start") == 0L, s"chunk $cid")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("tok_start") == a.getAs[Long]("tok_end"),
            s"gap/overlap in chunk $cid")
        case _ =>
      }
      assert(sorted.forall(r =>
        r.getAs[Long]("tok_end") <= 16L && r.getAs[Long]("tok_start") >= 0L))
    }
    // occupancy per chunk == packSequences over the rendered conversations
    val packed = Packing.packSequences(ChatOps.renderChat(t), capacity = 16,
        shardWidth = 7, idCol = "conv_id").collect()
      .groupBy(_.getAs[Long]("chunk_id"))
      .map { case (cid, rs) =>
        cid -> rs.map(r => r.getAs[Long]("tok_end") -
          r.getAs[Long]("tok_start")).sum
      }
    val spanOcc = spans.groupBy(_.getAs[Long]("chunk_id"))
      .map { case (cid, rs) =>
        cid -> rs.map(r => r.getAs[Long]("tok_end") -
          r.getAs[Long]("tok_start")).sum
      }
    assert(spanOcc == packed,
      "packed loss spans must occupy exactly the packed chunk tokens")
    // only assistant spans take loss
    assert(spans.forall(r => r.getAs[Boolean]("loss_masked") ==
      (r.getAs[String]("role") != "assistant")))
  }

  test("turnStats/renderChat per-group state is bounded by the turn count, " +
    "not the corpus: one conversation holding most turns stays exact") {
    // 90%-one-conversation skew fixture (the Zipfian-shape pin): the hot
    // conversation is still SHORT-by-contract scale (200 turns), and the
    // aggregates remain exact over it
    val hot = (0 until 200).map(i => (1L, i,
      if (i % 2 == 0) "user" else "assistant", s"turn $i"))
    val cold = (2 to 21).map(c => (c.toLong, 0, "user", "hi"))
    val t = turns((hot ++ cold): _*)
    val stats = ChatOps.turnStats(t).collect()
      .map(r => r.getAs[Long]("conv_id") -> r).toMap
    assert(stats(1L).getAs[Long]("n_turns") == 200L)
    assert(stats(1L).getAs[Boolean]("alternation_ok"))
    val rendered = ChatOps.renderChat(t)
      .where(col("conv_id") === 1L).collect().head
    assert(rendered.getAs[String]("text").startsWith("<|user|>turn 0\n"))
    assert(rendered.getAs[String]("text").endsWith("<|assistant|>turn 199"))
  }
}
