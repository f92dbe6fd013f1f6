package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Snapshot-maintenance operators for an incrementally-loaded lakehouse:
  * CDC upsert (latest version per key wins) and dedup of an incoming batch
  * against the existing corpus. Both are single-shuffle shapes — the upsert
  * is one `max_by` aggregation on the key (no window sort needed), the
  * incremental dedup is one anti-join on the content fingerprint.
  */
object MergeOps {

  /** Merge `updates` into `base`: for each key the highest `versionCol` row
    * wins (ties impossible when versions are write-monotonic; breaking them
    * here would mask a writer bug, so they surface as nondeterminism in
    * tests instead). One shuffle on the key via `max_by` over the packed
    * row struct — beats the window-rank formulation, which sorts every
    * partition to keep only rank 1. */
  def upsertLatest(base: DataFrame, updates: DataFrame, keys: Seq[String],
      versionCol: String): DataFrame = {
    val all = base.unionByName(updates)
    val dataCols = all.columns.filterNot(keys.contains).toSeq
    all.groupBy(keys.map(col): _*)
      .agg(max_by(struct(dataCols.map(col): _*), col(versionCol)).as("__row"))
      .select(keys.map(col) ++ dataCols.map(c => col(s"__row.$c")): _*)
  }

  /** CDC upsert over orders: version-0 snapshot + a deterministic change
    * batch (every 7th key updated with a new status and bumped price, every
    * 97th key re-inserted under key `-(k+1)` as a genuinely new row — real
    * orderkeys are non-negative at every SF, so the strictly-negative
    * synthetic keys can never collide with an existing order, unlike a
    * fixed additive offset that TPC-H keys outgrow past SF~1.7; the +1
    * matters because this testdata contains orderkey 0, whose bare negation
    * would collide with itself). Output samples the merged table so both
    * updated and untouched rows are hash-checked. */
  def qUpsertMerge(s: SparkSession, sf: String): DataFrame = {
    val base = t(s, sf, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .withColumn("version", lit(0L))
    val updates = base.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
        (col("o_totalprice") + 1000.0).as("o_totalprice"), lit(1L).as("version"))
    val inserts = base.filter(col("o_orderkey") % 97 === 0)
      .select((-(col("o_orderkey") + 1)).as("o_orderkey"),
        lit("N").as("o_orderstatus"), col("o_totalprice"), lit(1L).as("version"))
    upsertLatest(base, updates.unionByName(inserts), Seq("o_orderkey"), "version")
      .filter(col("o_orderkey") % 13 === 0)
      .orderBy("o_orderkey")
  }

  /** X7b: SCD2 dimension history — the effective-dated face of CDC: each
    * key's change events become validity intervals `[valid_from, valid_to)`
    * with an open-ended current row (the slowly-changing-dimension type-2
    * table a lakehouse derives from the same change feed `upsertLatest`
    * compacts). ONE window keyed on the entity (lead over (ts, event_id) —
    * the same deterministic tie-break as the sessionizer), zero joins;
    * linear in change events and shuffled on the entity key only.
    * Timestamps are exact integer micros so the interval bounds
    * hash-match a ns-native oracle. */
  def qScd2History(s: SparkSession, sf: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from_us", "event_id")
    t(s, sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("valid_from_us"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
      .orderBy("user_id", "valid_from_us", "event_id")
  }

  /** Drop incoming documents whose exact content fingerprint already exists
    * in the corpus — a left-anti join on md5(text): the standard admission
    * filter in front of a training corpus (near-dup admission composes the
    * same way over minhash band keys, `DedupOps`). */
  def dedupAgainstCorpus(incoming: DataFrame, corpus: DataFrame,
      textCol: String): DataFrame = {
    val fps = corpus.select(md5(col(textCol)).as("__fp")).distinct()
    incoming.join(fps, md5(incoming(textCol)) === fps("__fp"), "left_anti")
  }

  /** Bloom-pruned corpus admission — the 100 TB shape of
    * `dedupAgainstCorpus`. The exact anti-join shuffles EVERY incoming row
    * against the corpus fingerprints; at scale the overwhelming majority of
    * a crawl batch is NOT a duplicate, so that shuffle is mostly wasted
    * motion. Here a Bloom filter of the corpus fingerprints (built
    * distributed via `stat.bloomFilter`'s aggregate, ~1.2 bytes/item at 1%
    * fpp, broadcast once) rejects definite non-duplicates inside the scan;
    * only the tiny might-contain fraction reaches the exact semi-join that
    * clears false positives. No false negatives exist, so the result is
    * IDENTICAL to the exact operator (MergeOpsSpec asserts equality) — the
    * same two-phase shape Spark's runtime row-level filtering applies to
    * joins internally. The membership probe is a Scala UDF because Spark
    * exposes `bloom_filter_agg`/`might_contain` only internally; it sits
    * behind the pushed-down scan, not in a hot aggregation loop. */
  def dedupAgainstCorpusBloom(incoming: DataFrame, corpus: DataFrame,
      textCol: String, expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val fps = corpus.select(md5(col(textCol)).as("__fp"))
    // empty corpus: nothing can be a duplicate — admit everything. The
    // aggregate-built bloom has a null bit buffer on zero rows and would
    // NPE at probe time; the check is a limit-1 scan, not a count.
    if (fps.isEmpty) return incoming
    val bloom = fps.stat.bloomFilter("__fp", expectedItems, fpp)
    val bc = incoming.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((s: String) => s != null && bc.value.mightContainString(s))
    val withFp = incoming.withColumn("__fp", md5(col(textCol)))
    // suspects = rows the bloom cannot rule out; exact semi-join confirms
    val confirmed = withFp.filter(mightContain(col("__fp")))
      .join(fps.distinct(), Seq("__fp"), "left_semi")
      .select(col("__fp").as("__dup_fp")).distinct()
    withFp.join(confirmed, col("__fp") === col("__dup_fp"), "left_anti")
      .drop("__fp")
  }

  /** Incremental-dedup audit: docs with doc_id % 5 == 4 are the "incoming
    * crawl", the rest the standing corpus; report per-source admission
    * counts (batch size, admitted, dropped-as-duplicate). */
  def qDedupIncremental(s: SparkSession, sf: String): DataFrame =
    admissionAudit(s, sf, dedupAgainstCorpus(_, _, "text"))

  /** The same audit through the Bloom-pruned admission path. Shares
    * `q_dedup_incremental`'s oracle SQL: the bloom cascade must be
    * EXACTLY equal to the exact anti-join, so the DuckDB hash match
    * verifies the pruning end-to-end, not just in a spec. */
  def qDedupIncrementalBloom(s: SparkSession, sf: String): DataFrame =
    admissionAudit(s, sf,
      dedupAgainstCorpusBloom(_, _, "text", expectedItems = 100000L))

  private def admissionAudit(s: SparkSession, sf: String,
      admit: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val docs = t(s, sf, "documents")
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    val incoming = docs.filter(col("doc_id") % 5 === 4)
    val admitted = admit(incoming, corpus)
      .groupBy("source").agg(count(lit(1)).as("n_admitted"))
    incoming.groupBy("source").agg(count(lit(1)).as("n_incoming"))
      .join(admitted, Seq("source"), "left")
      .select(col("source"), col("n_incoming"),
        coalesce(col("n_admitted"), lit(0L)).as("n_admitted"),
        (col("n_incoming") - coalesce(col("n_admitted"), lit(0L))).as("n_dropped"))
      .orderBy("source")
  }

  /** X40: incremental aggregate maintenance — keep a per-key state table of
    * MERGEABLE partials (count / decimal sum / min / max) and fold a delta
    * batch in by algebraic merge (sum the counts and sums, min the mins,
    * max the maxes) instead of re-scanning history. Here the "state" is the
    * aggregate of the first 80% of events and the "delta" the remaining
    * 20%; the merged result must equal a from-scratch aggregate over
    * everything — which is exactly what the oracle computes. Decimal sums
    * make the merge order-independent, so state ⊕ delta is bit-identical
    * to full recompute. At 100 TB this is the difference between touching
    * the day's partition and touching the corpus. */
  /** Per-type MERGEABLE partials of an event frame — count / decimal sum /
    * min / max, the algebra [[qIncrAggMerge]] and the streaming face
    * (`streaming.AggStream`) both fold with. Decimal sums make the merge
    * order-independent, so any micro-batching of the input merges to the
    * identical state. */
  def aggPartial(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    events.select(col("event_type"),
        col("value").cast(DecimalType(18, 6)).as("v"))
      .groupBy("event_type").agg(count(lit(1)).as("n"),
        sum(col("v")).as("sv"), min(col("v")).as("mn"), max(col("v")).as("mx"))
  }

  /** Algebraic merge of stacked partials: sum the counts and sums, min the
    * mins, max the maxes — associative and commutative, so state ⊕ delta
    * in any grouping equals one partial over everything. */
  def mergePartials(parts: DataFrame): DataFrame =
    parts.groupBy("event_type")
      .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))

  /** Final report shape over a partials table (doubles for readability —
    * derived from the exact decimal state, never accumulated as floats). */
  def finishPartials(parts: DataFrame): DataFrame =
    parts.select(col("event_type"), col("n"),
      col("sv").cast("double").as("sum_value"),
      col("mn").cast("double").as("min_value"),
      col("mx").cast("double").as("max_value"))
      .orderBy("event_type")

  def qIncrAggMerge(s: SparkSession, sf: String): DataFrame = {
    val e = t(s, sf, "events")
    val state = aggPartial(e.filter(col("event_id") % 10 < 8))
    val delta = aggPartial(e.filter(col("event_id") % 10 >= 8))
    finishPartials(mergePartials(state.unionByName(delta)))
  }

  /** X55: snapshot diff — classify every key across two table versions as
    * added / removed / changed / unchanged by comparing content hashes
    * under a full outer join on the key (the anti-entropy audit between a
    * replica pair, or a CDC feed derived from two snapshots when the
    * source system emits none). One keyed shuffle; content equality is a
    * per-row md5 compare, so nothing wider than (key, hash) moves. The
    * "new" version is derived deterministically from the same corpus —
    * deletes (id % 11 = 0), edits (id % 7 = 3), inserts (id % 13 = 5
    * cloned above the id space) — so the oracle reproduces both sides. */
  def qSnapshotDiff(s: SparkSession, sf: String): DataFrame = {
    val docs = t(s, sf, "documents").select(col("doc_id"), col("text"))
    val oldV = docs.select(col("doc_id"), md5(col("text")).as("h_old"))
    val base = docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 3, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
    val inserts = docs.filter(col("doc_id") % 13 === 5)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val newV = base.unionByName(inserts)
      .select(col("doc_id"), md5(col("text")).as("h_new"))
    oldV.join(newV, Seq("doc_id"), "full_outer")
      .select(
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("status").agg(count(lit(1)).as("n"))
      .orderBy("status")
  }
}
