package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for context-window batching (north-star extension —
  * the step between curation and training: documents are concatenated into
  * fixed token-budget bins so no context window trains half-empty).
  *
  * Exact greedy packing (close the bin when the next doc overflows) is
  * inherently sequential — a 100 TB corpus cannot thread one running total
  * through every document. The distributed form is BLOCKED packing:
  *  - shard the corpus deterministically (`shardCol`, e.g. `id % n`);
  *  - within a shard, order docs deterministically and take the EXCLUSIVE
  *    running token total (one window per shard, shards independent — the
  *    parallelism is the shard count, no global sort anywhere);
  *  - bin = floor(running-total / budget).
  * A bin may overflow by at most one document (the standard trade in
  * streaming packers); docs longer than the budget occupy their own bin.
  * Deterministic given (shard, order) — and expressible in ANSI SQL, so
  * the DuckDB oracle re-derives it exactly.
  */
object Packing {

  /** Per-document bin assignment: (input columns) + `bin` (long, unique
    * within shard) + `cum_before` (tokens before this doc in its bin run).
    *
    * @param shardCol deterministic shard key (keep cardinality ≥ cluster
    *                 parallelism; each shard is one window partition)
    * @param orderCol total order within the shard (ties break the pack)
    * @param tokenCol per-document token count
    * @param budget   bin capacity in tokens
    */
  def packBlocked(
      df: DataFrame,
      shardCol: Column,
      orderCol: String,
      tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col("__shard")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__shard", shardCol)
      .withColumn("cum_before", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("cum_before") / budget))
      .drop("__shard")
  }

  /** Fixed-length training-sequence assembly — the GPT-style pretraining
    * step AFTER packing decides co-location: every document's token ids
    * (plus one EOS separator) are concatenated in deterministic shard
    * order and the stream is chunked into exact `seqLen`-token context
    * windows, documents straddling window boundaries (no padding waste).
    *
    * Distributed form (same blocked contract as [[packBlocked]] — exact
    * sequential semantics PER SHARD, shards independent):
    *  1. one window per shard computes each doc's exclusive token offset
    *     (a doc-grain prefix sum — the only per-shard serial state, O(1)
    *     per row);
    *  2. each doc EXPLODES to the windows it overlaps —
    *     `floor(off/L) .. floor((off+n-1)/L)` — carrying the `slice` of
    *     its ids that lands there (map-only; a doc touches
    *     `⌈n/L⌉+1` windows at most);
    *  3. one aggregation per (shard, window) reassembles the pieces in
    *     offset order (`array_sort` on (offset, piece) structs +
    *     `flatten` — order-preserving without a sort exchange, state
    *     bounded by `seqLen` tokens).
    * Two exchanges total (shard window + window aggregate), no driver
    * loop, no UDF; per-group state is ≤ `seqLen` tokens and ≤ `seqLen`
    * pieces, so executor memory is flat at any corpus size.
    *
    * Offsets use integer `div` (not double `floor(/)`) so the math stays
    * exact past 2^53 tokens per shard. Null/absent id arrays contribute
    * only their EOS separator (the document boundary survives even for
    * empty docs — standard separator semantics).
    *
    * Returns one row per complete window: (`shard`, `seq_idx`,
    * `ids` array, `n_docs` contributing, `doc_starts` — the sorted
    * window-relative offsets where a new document begins, i.e. the
    * attention-mask reset points (empty prefix when the window opens
    * mid-document), `n_tokens` = seqLen). With
    * `dropRemainder = false` the final short window of each shard is kept
    * (`n_tokens` < seqLen — callers pad it themselves).
    *
    * No reference analogue (north-star extension); the semantics are the
    * standard concat-and-chunk of public LM data pipelines (GPT-2/3 data
    * prep, HuggingFace `group_texts`).
    *
    * @param idsCol   array column of per-document token ids (any integral
    *                 element type; emitted as long)
    * @param shardCol deterministic shard key (cardinality ≥ cluster
    *                 parallelism at scale; each shard is one window
    *                 partition)
    * @param orderCol total order within the shard
    * @param seqLen   context window length in tokens
    * @param eosId    separator token appended after every document
    */
  def packSequences(
      df: DataFrame,
      idsCol: String,
      shardCol: Column,
      orderCol: String,
      seqLen: Int,
      eosId: Long,
      dropRemainder: Boolean = true): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val reserved = Set("__shard", "__ord", "__ids", "__n", "__off",
      "__start", "__end", "__piece", "shard", "seq_idx", "ids",
      "n_docs", "n_tokens")
    Seq(idsCol, orderCol).foreach(c => require(!reserved(c),
      s"column name '$c' collides with packSequences internals " +
        s"(${reserved.toSeq.sorted.mkString(", ")}) — rename it first"))
    val L = lit(seqLen.toLong)
    val withEos = df
      .withColumn("__shard", shardCol)
      .select(col("__shard"), col(orderCol).as("__ord"),
        concat(coalesce(col(idsCol).cast("array<long>"),
          array().cast("array<long>")), array(lit(eosId))).as("__ids"))
      .withColumn("__n", size(col("__ids")).cast("long"))
    val w = Window.partitionBy(col("__shard")).orderBy(col("__ord"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = withEos
      .withColumn("__off", coalesce(sum(col("__n")).over(w), lit(0L)))
    val pieces = off
      .select(col("__shard"), col("__off"), col("__ids"), col("__n"),
        explode(sequence(expr(s"__off div $seqLen"),
          expr(s"(__off + __n - 1) div $seqLen"))).as("seq_idx"))
      .withColumn("__start",
        greatest(col("seq_idx") * L - col("__off"), lit(0L)))
      .withColumn("__end",
        least((col("seq_idx") + 1L) * L - col("__off"), col("__n")))
      .withColumn("__piece", slice(col("__ids"),
        (col("__start") + 1L).cast("int"),
        (col("__end") - col("__start")).cast("int")))
    val out = pieces
      .groupBy(col("__shard").as("shard"), col("seq_idx"))
      .agg(
        flatten(transform(
          array_sort(collect_list(struct(col("__off").as("o"),
            col("__piece").as("p")))),
          x => x.getField("p"))).as("ids"),
        count(lit(1)).as("n_docs"),
        // window-relative offsets where a NEW document begins (its piece
        // starts at the doc's token 0) — the attention-mask reset points
        // a trainer needs to stop cross-document attention in a packed
        // window. A window that opens mid-document has no 0 entry.
        sort_array(collect_list(when(col("__start") === 0L,
          col("__off") - col("seq_idx") * L))).as("doc_starts"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
    if (dropRemainder) out.filter(col("n_tokens") === seqLen.toLong) else out
  }

  /** Bin-level summary (shard, bin, n_docs, sum_tokens) — the packing
    * manifest a batch loader consumes. */
  def packSummary(
      df: DataFrame,
      shardCol: Column,
      orderCol: String,
      tokenCol: String,
      budget: Long): DataFrame =
    packBlocked(df, shardCol, orderCol, tokenCol, budget)
      .withColumn("shard", shardCol)
      .groupBy(col("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("sum_tokens"))
}
