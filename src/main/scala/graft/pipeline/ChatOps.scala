package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-training (SFT / preference) data-prep operators over a TURNS table
  * — the instruction-tuning half of an LLM data pipeline, downstream of the
  * web/pretraining curation in [[WebOps]]/[[TextOps]]: conversations arrive
  * as one row per turn `(conv_id, turn_no, role, content)` and must be
  * structurally validated (role alternation, empty turns, system placement),
  * rendered to the single training string a trainer consumes, annotated
  * with the character spans whose tokens take loss (assistant turns only),
  * deduplicated on the rendered identity, and — for preference data —
  * audited for the length bias reward models notoriously inherit.
  *
  * Reference scope note: the reference engine (tobiasli/my_weather) has no
  * chat surface — this family extends the engine for LLM post-training
  * curation, like [[WebOps]] and [[TextOps]].
  *
  * Scale shape: every operator here keys on `conv_id`, and a conversation
  * is SHORT BY CONTRACT (turn counts in the tens — the bounded-group
  * argument of [[WebOps.robotsEval]]'s per-domain rule arrays, but
  * stronger: the bound is the data model, not an observed distribution, so
  * per-conversation windows and ordered collects are O(turns) state, never
  * Zipfian). The corpus-scale dimension is #conversations, and on that key
  * everything is one partial-combined aggregate or a bounded window — no
  * pair enumeration, no driver collection, no broadcast of corpus-scale
  * relations.
  */
object ChatOps {

  /** Per-turn rendered segment: `<|role|>content` — the chat-template
    * wire format shared by [[renderChat]] and [[lossSpans]], so span
    * offsets are consistent with the rendered string by construction.
    */
  private def segment(role: Column, content: Column): Column =
    concat(lit("<|"), role, lit("|>"), content)

  /** Structural validation profile, one row per conversation — the gate an
    * SFT pipeline drops malformed conversations on: turn/role counts,
    * system-turn presence, empty-content counts, role-alternation and
    * first-speaker checks, and per-role token totals (the user/assistant
    * balance signal).
    *
    * `alternation_ok`: no non-system turn repeats the role of the
    * immediately preceding turn in `turn_no` order (a system row breaks
    * adjacency — the preceding comparison value is null there, never a
    * violation). `starts_with_user`: the first non-system turn is a
    * `user` turn. `valid` folds the gate: alternation
    * holds, the conversation opens with a user turn, has at least one
    * assistant turn, and no turn is empty.
    *
    * One window pass (the alternation lag, partitioned by conversation —
    * bounded by the turn-count contract) and one partial-combined aggregate
    * on `conv_id`.
    */
  def turnStats(turns: DataFrame, convCol: String = "conv_id",
      turnCol: String = "turn_no", roleCol: String = "role",
      contentCol: String = "content"): DataFrame = {
    val conv = col(convCol)
    val role = col(roleCol)
    val text = col(contentCol)
    val w = Window.partitionBy(conv).orderBy(col(turnCol))
    turns
      .withColumn("__prev",
        lag(when(role =!= "system", role), 1).over(w))
      .withColumn("__samerole",
        role =!= "system" && col("__prev").isNotNull && role === col("__prev"))
      .groupBy(conv.as("conv_id"))
      .agg(count(lit(1)).as("n_turns"),
        sum(when(role === "user", 1L).otherwise(0L)).as("n_user"),
        sum(when(role === "assistant", 1L).otherwise(0L)).as("n_assistant"),
        max(role === "system").as("has_system"),
        sum(when(trim(text) === "", 1L).otherwise(0L)).as("n_empty"),
        sum(when(role === "user", TextOps.tokenCount(text).cast("long"))
          .otherwise(0L)).as("user_tokens"),
        sum(when(role === "assistant", TextOps.tokenCount(text).cast("long"))
          .otherwise(0L)).as("assistant_tokens"),
        (!max(col("__samerole"))).as("alternation_ok"),
        (min_by(role, when(role =!= "system", col(turnCol))) === "user")
          .as("starts_with_user"))
      .withColumn("valid", col("alternation_ok") && col("starts_with_user") &&
        col("n_assistant") >= 1 && col("n_empty") === 0)
  }

  /** Chat-template rendering: each conversation's turns in `turn_no` order
    * concatenated as `<|role|>content` segments joined by newlines — the
    * single training string (plus char/whitespace-token counts) an SFT
    * trainer tokenizes. Deterministic string assembly, mirrored
    * term-for-term by the DuckDB twin.
    *
    * One partial-combined aggregate on `conv_id`; the ordered collect is
    * O(turns) per group — bounded by the conversation contract, the same
    * class as [[WebOps.robotsEval]]'s rule arrays (NOT the Zipfian
    * unbounded-group collect the old domainStats was flagged for).
    * `array_sort` on the `(turn_no, …)` structs pins the segment order
    * without a per-group sort shuffle.
    */
  def renderChat(turns: DataFrame, convCol: String = "conv_id",
      turnCol: String = "turn_no", roleCol: String = "role",
      contentCol: String = "content"): DataFrame =
    turns
      .groupBy(col(convCol).as("conv_id"))
      .agg(array_sort(collect_list(struct(col(turnCol).as("t"),
        col(roleCol).as("r"), col(contentCol).as("c")))).as("__turns"))
      .select(col("conv_id"),
        array_join(transform(col("__turns"),
          t => segment(t.getField("r"), t.getField("c"))), "\n").as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_tokens", TextOps.tokenCount(col("text")).cast("long"))

  /** Loss-span annotation: for each turn, the half-open character span
    * `[start_char, end_char)` its `<|role|>content` segment occupies in
    * the [[renderChat]] string, plus the `loss_masked` verdict (non-
    * assistant spans take no loss — the supervised-fine-tuning masking
    * rule). Offsets account for the single `\n` separator between
    * segments, so `substring(rendered, start_char + 1, end_char −
    * start_char)` is exactly the segment (pinned by ChatOpsSpec).
    *
    * Two windows per conversation (rank + running length sum), both
    * bounded by the turn-count contract; no join back to the rendered
    * string is needed — the offsets are derived from the same arithmetic.
    */
  def lossSpans(turns: DataFrame, convCol: String = "conv_id",
      turnCol: String = "turn_no", roleCol: String = "role",
      contentCol: String = "content"): DataFrame = {
    val w = Window.partitionBy(col(convCol)).orderBy(col(turnCol))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    turns
      .withColumn("__len",
        length(segment(col(roleCol), col(contentCol))).cast("long"))
      .withColumn("__rank", row_number().over(w) - 1)
      .withColumn("start_char",
        (coalesce(sum(col("__len")).over(wPrev), lit(0L)) +
          col("__rank")).cast("long"))
      .select(col(convCol).as("conv_id"), col(turnCol).as("turn_no"),
        col(roleCol).as("role"), col("start_char"),
        (col("start_char") + col("__len")).as("end_char"),
        (col(roleCol) =!= "assistant").as("loss_masked"))
  }

  /** Exact conversation dedup on the RENDERED identity: two conversations
    * are duplicates iff their [[renderChat]] strings are byte-identical
    * (same turns, same order, same roles — the SFT analogue of
    * [[Dedup.exact]]'s full-text hash). Keeper = lowest `conv_id`;
    * `n_copies` is the group size. One narrow render (bounded per-group
    * collect) + one partial-combined aggregate on the md5 key — no pair
    * enumeration.
    */
  def conversationDedup(turns: DataFrame, convCol: String = "conv_id",
      turnCol: String = "turn_no", roleCol: String = "role",
      contentCol: String = "content"): DataFrame =
    renderChat(turns, convCol, turnCol, roleCol, contentCol)
      .select(md5(col("text")).as("conv_hash"), col("conv_id"))
      .groupBy("conv_hash")
      .agg(min(col("conv_id")).as("keeper_conv_id"),
        count(lit(1)).as("n_copies"))

  /** Packed loss spans — the loss mask AFTER packing: when
    * [[renderChat]]'d conversations are laid end-to-end into fixed
    * `capacity`-token windows ([[Packing.packSequences]]), the trainer
    * needs each window's assistant token ranges, not per-conversation
    * character offsets. For every (turn, overlapped chunk) this emits the
    * half-open WITHIN-CHUNK token range the turn's rendered segment
    * occupies, plus the `loss_masked` verdict (non-assistant tokens take
    * no loss) — the spans of one chunk tile `[0, chunk tokens)` exactly
    * (pinned in ChatOpsSpec against [[Packing.packSequences]] on the same
    * corpus).
    *
    * Token accounting: segment token counts are additive under rendering
    * (the `\n` separator and the `<|` segment opener both break the
    * `[a-z0-9]+` token scan, so tokenizing the rendered string
    * concatenates the per-segment token lists), which is what makes
    * per-turn spans derivable WITHOUT re-tokenizing whole windows.
    *
    * Scale shape: one bounded per-conversation running sum (turn order),
    * one partial-combined per-conversation total, the GLOBAL placement via
    * the sharded [[Prefix.runningSum]] (never a single-partition sort),
    * and a narrow chunk-range explode — output ∝ (turns + boundary
    * crossings).
    */
  def packedLossSpans(turns: DataFrame, capacity: Long,
      shardWidth: Long = 1L << 20, convCol: String = "conv_id",
      turnCol: String = "turn_no", roleCol: String = "role",
      contentCol: String = "content"): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val conv = col(convCol)
    val wTurn = Window.partitionBy(conv).orderBy(col(turnCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seg = turns.select(conv, col(turnCol), col(roleCol),
        TextOps.tokenCount(segment(col(roleCol), col(contentCol)))
          .cast("long").as("__t"))
      .withColumn("__te", sum(col("__t")).over(wTurn))
    val perConv = seg.groupBy(conv).agg(sum(col("__t")).as("n_toks"))
      .where(col("n_toks") > 0)
    val placed = Prefix.runningSum(perConv, convCol, "n_toks",
        shardWidth = shardWidth)
      .select(conv, (col("__end") - col("n_toks")).as("__cst"))
    seg.join(placed, Seq(convCol))
      .withColumn("__gs", col("__cst") + col("__te") - col("__t"))
      .withColumn("__ge", col("__cst") + col("__te"))
      .where(col("__t") > 0)
      .withColumn("chunk_id", explode(sequence(
        expr(s"__gs div $capacity"), expr(s"(__ge - 1) div $capacity"))))
      .select(conv.as("conv_id"), col(turnCol).as("turn_no"),
        col(roleCol).as("role"), col("chunk_id"),
        (greatest(col("chunk_id") * capacity, col("__gs")) -
          col("chunk_id") * capacity).as("tok_start"),
        (least((col("chunk_id") + lit(1L)) * capacity, col("__ge")) -
          col("chunk_id") * capacity).as("tok_end"),
        (col(roleCol) =!= "assistant").as("loss_masked"))
  }

  /** Context-window truncation — the "fit the conversation into the
    * model's context" prep step: keep the system turn plus the LONGEST
    * SUFFIX of non-system turns (the most recent exchange) whose token
    * total, together with the system tokens, fits `budgetTokens`. Output
    * annotates every turn with its token count and the `kept` verdict
    * (the audit face — materializing the truncated corpus is a `kept`
    * filter). The kept set is a suffix by construction: the reverse
    * running sum is monotone in `turn_no`, so a turn is kept iff its
    * inclusive suffix sum plus the system tokens fits.
    *
    * Two windows per conversation (a whole-partition system-token sum and
    * the reverse running sum), both bounded by the turn-count contract.
    */
  def fitContext(turns: DataFrame, budgetTokens: Long,
      convCol: String = "conv_id", turnCol: String = "turn_no",
      roleCol: String = "role", contentCol: String = "content"): DataFrame = {
    require(budgetTokens > 0,
      s"budgetTokens must be positive, got $budgetTokens")
    val conv = col(convCol)
    val role = col(roleCol)
    val wAll = Window.partitionBy(conv)
    val wSfx = Window.partitionBy(conv).orderBy(col(turnCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    turns
      .withColumn("n_tokens", TextOps.tokenCount(col(contentCol)).cast("long"))
      .withColumn("__sys",
        sum(when(role === "system", col("n_tokens")).otherwise(0L)).over(wAll))
      .withColumn("__sfx",
        sum(when(role =!= "system", col("n_tokens")).otherwise(0L)).over(wSfx))
      .withColumn("kept",
        when(role === "system", col("__sys") <= budgetTokens)
          .otherwise(col("__sfx") + col("__sys") <= budgetTokens))
      .select(conv.as("conv_id"), col(turnCol).as("turn_no"),
        role.as("role"), col("n_tokens"), col("kept"))
  }

  /** User-prompt extraction: the concatenated user-turn text per
    * conversation, in turn order — the surface SFT decontamination
    * screens against a held-out benchmark (leaked benchmark QUESTIONS are
    * the contamination vector; answers vary). One bounded-group ordered
    * collect per conversation; compose with
    * [[TextOps.decontaminate]]`(prompts, bench, n, idCol = "conv_id")`
    * for the n-gram overlap verdict.
    */
  def userPrompts(turns: DataFrame, convCol: String = "conv_id",
      turnCol: String = "turn_no", roleCol: String = "role",
      contentCol: String = "content"): DataFrame =
    turns.where(col(roleCol) === "user")
      .groupBy(col(convCol).as("conv_id"))
      .agg(array_sort(collect_list(struct(col(turnCol).as("t"),
        col(contentCol).as("c")))).as("__turns"))
      .select(col("conv_id"),
        array_join(transform(col("__turns"), t => t.getField("c")), " ")
          .as("text"))

  /** Best-of-n selection — the RLHF sampling→pair-construction step: from
    * scored samples `(prompt_id, sample_id, response, score)` (n responses
    * drawn per prompt, scored by a reward model or heuristic), emit one
    * row per prompt with the argmax response as `chosen`, the argmin as
    * `rejected`, deterministic tie-breaks (equal scores → lower
    * `sample_id` wins on both sides), and the score margin — the
    * preference pair a DPO/RLHF pipeline trains on. Prompts where best
    * and worst coincide (n = 1, or all scores equal) carry a zero margin
    * and `degenerate = true` so the trainer can drop them.
    *
    * Scale shape: two rank windows per prompt (ascending/descending
    * score), both bounded by the samples-per-prompt contract (n is the
    * BEST-OF-N constant, not a data-driven group size), then a narrow
    * filter-join-free pivot via conditional aggregation — one
    * partial-combined aggregate on `prompt_id`.
    */
  def bestOfN(samples: DataFrame, promptCol: String = "prompt_id",
      sampleCol: String = "sample_id", responseCol: String = "response",
      scoreCol: String = "score"): DataFrame = {
    val byBest = Window.partitionBy(col(promptCol))
      .orderBy(col(scoreCol).desc, col(sampleCol).asc)
    val byWorst = Window.partitionBy(col(promptCol))
      .orderBy(col(scoreCol).asc, col(sampleCol).asc)
    samples
      .withColumn("__rb", row_number().over(byBest))
      .withColumn("__rw", row_number().over(byWorst))
      .groupBy(col(promptCol).as("prompt_id"))
      .agg(count(lit(1)).as("n_samples"),
        max(when(col("__rb") === 1, col(sampleCol)))
          .as("chosen_sample_id"),
        max(when(col("__rb") === 1, col(responseCol))).as("chosen"),
        max(when(col("__rb") === 1, col(scoreCol))).as("chosen_score"),
        max(when(col("__rw") === 1, col(sampleCol)))
          .as("rejected_sample_id"),
        max(when(col("__rw") === 1, col(responseCol))).as("rejected"),
        max(when(col("__rw") === 1, col(scoreCol))).as("rejected_score"))
      .withColumn("score_margin",
        col("chosen_score") - col("rejected_score"))
      .withColumn("degenerate",
        col("chosen_sample_id") === col("rejected_sample_id"))
  }

  /** Preference-pair length-bias audit, one row per source: reward models
    * trained on (chosen, rejected) pairs inherit any systematic length
    * difference, so the audit a preference pipeline runs first is "how
    * often is the longer response the chosen one, and by how much". Per
    * source: pair count, mean whitespace-token lengths of both sides, the
    * longer-chosen ratio (ties count as not-longer), and the mean token
    * delta. One partial-combined aggregate on the source key — per-group
    * state is O(1).
    */
  def prefLengthBias(pairs: DataFrame, srcCol: String = "source",
      chosenCol: String = "chosen", rejectedCol: String = "rejected")
      : DataFrame = {
    val cTok = TextOps.tokenCount(col(chosenCol)).cast("long")
    val rTok = TextOps.tokenCount(col(rejectedCol)).cast("long")
    pairs
      .select(col(srcCol).as("source"), cTok.as("__c"), rTok.as("__r"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_pairs"),
        (sum(col("__c")).cast("double") / count(lit(1)))
          .as("chosen_tokens_mean"),
        (sum(col("__r")).cast("double") / count(lit(1)))
          .as("rejected_tokens_mean"),
        (sum(when(col("__c") > col("__r"), 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("longer_chosen_ratio"),
        ((sum(col("__c")) - sum(col("__r"))).cast("double") / count(lit(1)))
          .as("mean_token_delta"))
  }
}
