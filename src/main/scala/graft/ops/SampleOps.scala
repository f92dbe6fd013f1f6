package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/** Corpus sampling / ordering operators for training-data preparation: the
  * steps between a curated corpus and the token stream a trainer actually
  * reads. Per-source contribution caps (the RefinedWeb-style anti-dominance
  * guard), temperature-scaled mixture weights (the multilingual /
  * multi-source sampling schedule), and deterministic shard assignment (the
  * data-parallel training order). Engine-side statistical analogs of the
  * reference's corpus-prep surface (`ingestion_pipeline_langgraph.py`
  * source handling); everything here is hash-deterministic so the driver's
  * DuckDB oracle verifies each decision bit-for-bit — a `rand()`-based
  * sampler never could be.
  */
object SampleOps {

  /** Deterministic per-doc ordering key: md5 over the doc id plus a
    * purpose tag, so independent sampling decisions are independent
    * (the cap draw does not correlate with the split draw in
    * [[CorpusOps.splitAssign]], which salts with its own tag). */
  private def ordKey(tag: String): Column =
    md5(concat(col("doc_id").cast("string"), lit(tag)))

  /** X30: per-source contribution cap — keep at most `cap` documents per
    * source, chosen by a deterministic hash order (RefinedWeb / Gopher cap
    * per-domain contributions so no single domain dominates the mixture).
    *
    * Scale shape: a single `row_number` window per source shuffles every
    * row of a source into ONE task — a 100 TB crawl with a mega-domain
    * dies there. So selection runs two-level, like the cross-collection
    * TopK: (1) rows salt into `salts` sub-partitions per source and each
    * keeps its own hash-ordered top-`cap` (windows over (source, salt) —
    * bounded skew), (2) the final top-`cap` window runs over the ≤
    * salts·cap survivors per source. Both levels keep the SAME total
    * order (ord, doc_id), so the composition equals the single-window
    * formulation exactly (SampleOpsSpec proves it; the oracle re-derives
    * it with one plain window). */
  def sourceCap(docs: DataFrame, cap: Int, salts: Int = 16): DataFrame = {
    val ord = ordKey(":cap")
    // salt from a disjoint slice of the same md5 (chars 30..32) — decorrelated
    // from the ordering prefix, deterministic, no extra hash pass
    val salt = substring(ord, 30, 3)
    val base = docs.select(col("doc_id"), col("source"),
      col("n_chars").cast("long").as("n_chars"), ord.as("ord"), salt.as("salt"))
    val local = Window.partitionBy("source", "salt")
      .orderBy(col("ord"), col("doc_id"))
    val global = Window.partitionBy("source").orderBy(col("ord"), col("doc_id"))
    base
      .withColumn("rn_local", row_number().over(local))
      .filter(col("rn_local") <= cap)
      .withColumn("rn", row_number().over(global))
      .filter(col("rn") <= cap)
      .drop("rn_local", "salt")
  }

  /** Per-source cap report: raw vs kept doc/char volume. One row per
    * source; the kept side re-aggregates [[sourceCap]]'s survivors. */
  def qSourceCap(s: SparkSession, sf: String): DataFrame = {
    val docs = t(s, sf, "documents")
    val raw = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars").cast("long")).as("chars_total"))
    val kept = sourceCap(docs, cap = 15).groupBy("source").agg(
      count(lit(1)).as("n_kept"),
      sum(col("n_chars")).as("chars_kept"),
      min(col("doc_id")).as("first_kept"))
    raw.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_docs") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        col("chars_total"), coalesce(col("chars_kept"), lit(0L)).as("chars_kept"),
        col("first_kept"))
      .orderBy("source")
  }

  /** X31: temperature-scaled mixture weights — the multi-source sampling
    * schedule (p_s ∝ n_s^α with α = 1/2, the standard temperature
    * flattening used for multilingual / multi-source pretraining mixes):
    * per source, its token count, unnormalized weight, sampling
    * probability, expected token draw for a 10M-token budget, and implied
    * epochs over the source (how many times the source is re-read —
    * the up-sampling factor for small sources).
    *
    * Determinism discipline: the only cross-row float reduction (the
    * normalizer Σ n_s^α) is collapsed per source to a micro-int
    * (`floor(sqrt(n)·1e6)`) BEFORE summing, so the denominator is an
    * order-free integer sum; every downstream number is a fixed
    * single-association chain of IEEE double ops over exact integers —
    * bit-identical in Spark and DuckDB. Two aggs (per-source, then a
    * 1-row total broadcast) — O(sources) result, linear scan cost. */
  def qMixtureWeights(s: SparkSession, sf: String): DataFrame = {
    val budget = 10000000L
    val per = t(s, sf, "documents")
      .select(col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .withColumn("w_e6",
        floor(sqrt(col("n_tokens").cast("double")) * 1000000).cast("long"))
    val tot = per.agg(sum(col("w_e6")).as("wsum_e6"))
    per.crossJoin(broadcast(tot))
      .withColumn("ratio", col("w_e6").cast("double") / col("wsum_e6").cast("double"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("w_e6"),
        round(col("ratio") * 1000000, 0).cast("long").as("p_e6"),
        round(col("ratio") * budget, 0).cast("long").as("expected_tokens"),
        round(col("ratio") * budget / col("n_tokens").cast("double") * 1000000, 0)
          .cast("long").as("epochs_e6"))
      .orderBy("source")
  }

  /** X31b: materialize the temperature mixture as an actual corpus draw.
    * [[qMixtureWeights]] computes the sampling schedule; this executes it
    * as a single-epoch downsample: each doc keeps with probability
    * min(1, budget·p_s / n_tokens_s) — the source's token-budget share
    * divided by its token count (sources the schedule would up-sample
    * keep everything; up-sampling is a reader-side repeat, not a filter).
    *
    * The draw must be a pure function of the data for the oracle to
    * replay it, and the keep decision must be EXACT — a float rate
    * compared against a float uniform differs by an ulp between engines
    * and flips boundary docs. So neither side ever divides: doc keeps iff
    *   u32 · wsum_e6 · n_tokens_s  <  budget · w_e6_s · 2^32
    * over exact wide integers (Spark DECIMAL(38,0), DuckDB HUGEINT),
    * where u32 is the first 8 md5 hex chars of the doc's ':draw'-salted
    * order key — a deterministic 32-bit uniform both engines derive
    * identically. Cost: two linear scans (one agg for the per-source
    * schedule — a broadcast — one projection+agg for the draw report). */
  def qMixtureDraw(s: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // deliberately smaller than the corpus at every SF so each source is
    // actually downsampled (the X31 report's 10M budget exceeds the small
    // fixtures' token counts and would keep everything)
    val budget = 5000L
    val docs = t(s, sf, "documents").select(col("doc_id"), col("source"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
    val per = docs.groupBy("source")
      .agg(sum(col("n_tok")).as("n_tokens"))
      .withColumn("w_e6",
        floor(sqrt(col("n_tokens").cast("double")) * 1000000).cast("long"))
    val tot = per.agg(sum(col("w_e6")).as("wsum_e6"))
    val sched = per.crossJoin(broadcast(tot))
    val d38 = (c: Column) => c.cast(DecimalType(38, 0))
    val u32 = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":draw"))), 1, 8), 16, 10).cast("long")
    docs.withColumn("u32", u32)
      .join(broadcast(sched), Seq("source"))
      .withColumn("kept",
        when(d38(col("u32")) * d38(col("wsum_e6")) * d38(col("n_tokens")) <
             d38(lit(budget)) * d38(col("w_e6")) * d38(lit(4294967296L)), 1L)
          .otherwise(0L))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("kept")).as("n_kept"),
        max(col("n_tokens")).as("n_tokens"),
        sum(when(col("kept") === 1L, col("n_tok")).otherwise(0L)).as("tokens_kept"))
      .orderBy("source")
  }

  /** X34: deterministic shard assignment — the final "global shuffle +
    * shard for N data-parallel readers" step of training-data prep.
    * Each doc hashes to a shard (first hex digit of its order key mod 8)
    * and takes a position within the shard by (hash, doc_id) order. NO
    * global sort anywhere: sharding is embarrassingly parallel and the
    * only ordered reduction is per shard — at 100 TB each shard's order
    * is produced by that shard's writer task(s) alone. The per-shard
    * md5-of-id-chain proves the order is a pure function of the data
    * (the oracle reproduces it from scratch in DuckDB via an
    * independent hex-digit decode: strpos vs conv). */
  def qShardAssign(s: SparkSession, sf: String): DataFrame = {
    val nShards = 8
    val ord = ordKey(":ord")
    val docs = t(s, sf, "documents")
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"),
        ord.as("ord"))
      .withColumn("shard",
        pmod(conv(substring(col("ord"), 1, 1), 16, 10).cast("long"), lit(nShards.toLong)))
    docs.groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tokens"),
        md5(array_join(
          transform(
            array_sort(collect_list(struct(col("ord"), col("doc_id")))),
            x => x.getField("doc_id").cast("string")),
          ",")).as("order_md5"))
      .orderBy("shard")
  }

  /** X53: class-balanced downsampling — every label contributes exactly the
    * minority class's count, chosen by a deterministic hash order (the
    * standard rebalancing step before contrastive / classifier training;
    * same role as the reference's per-collection result capping in
    * `chroma_retrieval_util.py:361-383`, applied to training labels).
    *
    * Scale shape: the same two-level salted selection as [[sourceCap]] —
    * a one-window-per-label formulation would funnel a 100 TB majority
    * class through one task. Salting bounds the FIRST level's window
    * partitions; the second level is a plain per-label window over the
    * first level's survivors, so one task can still see up to salts×cap
    * rows per label (the [[sourceCap]] limitation, shared by design) —
    * bounded by the cap, not by the raw class size, which is the part that
    * matters when one class holds most of the corpus. Both levels share
    * the (ord, vec_id) total order so the composition equals the
    * single-window selection exactly. The per-label floor is a 1-row
    * broadcast. Output keeps the audit compact and content-checking:
    * per label, the raw count, kept count (== global min), and the exact
    * sum of kept vec_ids (order-free integer checksum of WHICH rows were
    * kept, not just how many). */
  def qClassBalance(s: SparkSession, sf: String): DataFrame = {
    val e = t(s, sf, "embeddings")
    val ord = md5(concat(col("vec_id").cast("string"), lit(":bal")))
    val salt = substring(ord, 30, 3)
    val base = e.select(col("vec_id"), col("label"), ord.as("ord"), salt.as("salt"))
    val counts = e.groupBy("label").agg(count(lit(1)).as("n_total"))
    val cap = counts.agg(min(col("n_total")).as("cap"))
    val local = Window.partitionBy("label", "salt").orderBy(col("ord"), col("vec_id"))
    val global = Window.partitionBy("label").orderBy(col("ord"), col("vec_id"))
    base
      .crossJoin(broadcast(cap))
      .withColumn("rn_local", row_number().over(local))
      .filter(col("rn_local") <= col("cap"))
      .withColumn("rn", row_number().over(global))
      .filter(col("rn") <= col("cap"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_kept"), sum(col("vec_id")).as("kept_id_sum"))
      .join(counts, Seq("label"))
      .select(col("label").cast("long").as("label"), col("n_total"),
        col("n_kept"), col("kept_id_sum"))
      .orderBy("label")
  }

  /** X73: leakage-safe GROUP split — train/dev/test assignment keyed on the
    * GROUP (source), not the row, so every document of a source lands in
    * ONE split. Row-level splits (X17's doc_id assignment) leak: near-dup
    * documents within a source straddle train and test, and the eval set
    * quietly contains training data — the GroupShuffleSplit discipline is
    * the standard fix. Assignment is [[CorpusOps.splitAssign]]'s salted-md5
    * draw over `source` (stable across runs/engines/partitionings; adding
    * docs to a source never moves the source). The report carries per-split
    * doc/source/char volumes plus an in-plan `leak_free` verdict: Σ
    * per-split distinct sources must equal the corpus' distinct-source
    * count — any source counted in two splits breaks the equality. Scale:
    * one (split)-keyed agg + two 1-row broadcasts; the verdict costs a
    * 3-row aggregate, never a row-level pass. */
  def qGroupSplit(s: SparkSession, sf: String): DataFrame = {
    val d = t(s, sf, "documents")
      .withColumn("split", CorpusOps.splitAssign(col("source")))
    val perSplit = d.groupBy("split").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("source")).as("n_sources"),
      sum(col("n_chars").cast("long")).as("sum_chars"))
    val tot = d.agg(countDistinct(col("source")).as("n_total_sources"))
    val sums = perSplit.agg(sum(col("n_sources")).as("sum_sources"))
    perSplit.crossJoin(broadcast(tot)).crossJoin(broadcast(sums))
      .select(col("split"), col("n_docs"), col("n_sources"), col("sum_chars"),
        (col("sum_sources") === col("n_total_sources")).as("leak_free"))
      .orderBy("split")
  }

  /** X74: TOKEN-budget source cap — pretraining mixtures are budgeted in
    * TOKENS, not documents (X30 caps doc counts; a source of long docs
    * would still dominate a token-weighted mix). Per source, documents are
    * taken in deterministic priority order (doc_id) while the running
    * whitespace-token total stays within the budget — strict prefix
    * semantics (the first doc that would cross the budget is dropped and
    * nothing later back-fills), so the kept set is a pure function of the
    * data that a window cumsum expresses exactly in both engines. The
    * report: per source, docs/tokens before and after the cap.
    *
    * Scale shape: ONE (source)-keyed window cumsum (partition bounded by
    * per-source doc count) + the same keyed aggregation. A pathological
    * mega-source needs the two-level block decomposition `qPackSequences`
    * already implements for its sequential budget machine; for the
    * contribution-cap use the per-source partition IS the unit of work.
    * Token counting matches `q_token_bpe`'s whitespace convention (len of
    * \\s+ split of trimmed text) so the two reports compose. */
  def qTokenBudgetCap(s: SparkSession, sf: String): DataFrame = {
    val budget = 500L
    val docs = t(s, sf, "documents").select(col("doc_id"), col("source"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val w = Window.partitionBy("source").orderBy("doc_id")
    docs.withColumn("cum", sum(col("n_tokens")).over(w))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens_total"),
        sum(when(col("cum") <= budget, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("cum") <= budget, col("n_tokens")).otherwise(0L))
          .as("tokens_kept"))
      .withColumn("budget", lit(budget))
      .orderBy("source")
  }
}
