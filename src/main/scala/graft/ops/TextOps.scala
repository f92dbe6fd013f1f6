package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Text operators over the `documents` table: the row-chunker (reference
  * `chunk_dataframe_dynamic`, `chroma_ingestion_util.py:97-143`), token/length
  * statistics, quality scoring, fingerprinting, language-ID heuristic — the
  * text-analysis layer a training-data pipeline needs at scale.
  */
object TextOps {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Serialize one documents-row exactly like the reference chunker does:
    * `[index i] col:val | col:val | …` (`chroma_ingestion_util.py:106-113`;
    * NULL → "NULL"). */
  private def rowText: Column = {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val body = cols.map(c =>
      concat(lit(s"$c:"), coalesce(col(c).cast("string"), lit("NULL"))))
    concat(lit("[index "), col("doc_id"), lit("] "), concat_ws(" | ", body: _*))
  }

  /** V1 (scalable formulation): deterministic char-budget chunking. Rows are
    * serialized, then bucketed by `floor(running_chars_before / budget)`
    * within each source partition — a window running sum, fully distributed
    * (PARTITION BY source), unlike the reference's sequential greedy loop
    * which cannot parallelize. Greedy parity lives in `chunkGreedy` (tested
    * against reference semantics in ChunkerSpec); this is the 100-TB path.
    */
  def qChunkRows(s: SparkSession, sf: String): DataFrame = {
    val budget = 1000 // chars — reference `max_tokens_per_chunk` (chroma_ingestion_util.py:225)
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tWide(s, sf, "documents")
      .select(col("source"), col("doc_id"), rowText.as("row_text"))
      .withColumn("len", length(col("row_text")).cast("long"))
      .withColumn("chunk_id",
        floor((sum(col("len")).over(w) - col("len")) / lit(budget.toDouble)).cast("long"))
      .groupBy("source", "chunk_id")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("len")).as("chunk_chars"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("doc_id"), col("row_text")))),
            x => x.getField("row_text")), "\n")).as("chunk_md5"))
      .orderBy("source", "chunk_id")
  }

  /** V1 (reference-parity formulation): greedy sequential packing with the
    * exact `chunk_dataframe_dynamic` semantics (`chroma_ingestion_util.py:
    * 97-143`): flush when current_size + row_size would exceed the budget and
    * the chunk is non-empty; sizes exclude separators. Sequential by nature —
    * used per-partition (e.g. per source) at scale. */
  def chunkGreedy(rows: Seq[(Long, String)], budget: Int): Seq[(Seq[Long], String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Seq[Long], String)]
    var curIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    var curTexts = scala.collection.mutable.ArrayBuffer.empty[String]
    var curSize = 0
    rows.foreach { case (id, text) =>
      if (curSize + text.length > budget && curTexts.nonEmpty) {
        out += ((curIds.toSeq, curTexts.mkString("\n")))
        curIds = scala.collection.mutable.ArrayBuffer.empty
        curTexts = scala.collection.mutable.ArrayBuffer.empty
        curSize = 0
      }
      curIds += id; curTexts += text; curSize += text.length
    }
    if (curTexts.nonEmpty) out += ((curIds.toSeq, curTexts.mkString("\n")))
    out.toSeq
  }

  /** V12: per-language token/length statistics (BASELINE north star;
    * `documents.parquet`). */
  def qTextTokens(s: SparkSession, sf: String): DataFrame =
    tWide(s, sf, "documents")
      .withColumn("n_tok", size(split(trim(col("text")), "\\s+")).cast("long"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        (sum(length(col("text")).cast("long")).cast("double") / count(lit(1)))
          .as("avg_chars"))
      .orderBy("lang")

  /** Token counting, BPE-ish: alongside whitespace tokens, count subword-ish
    * units via the regex `[a-z]+|[0-9]+|[^a-z0-9\s]` (letter runs, digit
    * runs, single punctuation — the shape BPE pre-tokenizers use). */
  def qTokenBpe(s: SparkSession, sf: String): DataFrame =
    tWide(s, sf, "documents")
      .withColumn("ws_tok", size(split(trim(col("text")), "\\s+")).cast("long"))
      .withColumn("bpe_tok",
        size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)"))
          .cast("long"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws_tok")).as("ws_tokens"),
        sum(col("bpe_tok")).as("bpe_tokens"))
      .orderBy("lang")

  /** Quality scoring: token count, stopword ratio, average word length, and a
    * bounded linear quality score (length/stopword heuristics — the
    * deterministic analog of the reference's LLM quality_score field,
    * `ingestion_pipeline_langgraph.py:462-466`). */
  /** Per-doc quality frame (doc_id, n_tokens, stop_ratio_e6,
    * avg_word_len_e6, quality_e6) — shared by the score query and the
    * quantile-threshold filter (`CorpusOps.qQualityFilter`). */
  def qualityPerDoc(docs: DataFrame): DataFrame = {
    // Ratios and score are emitted as micro-ints: rounding a double at the
    // 6th decimal is tie-unstable across engines (x.xxxxxx5 is not exactly
    // representable), while integer-scale ties ARE exact doubles and round
    // identically — observed as a 1-ulp quality mismatch at sf0.1.
    val toks = split(trim(col("text")), "\\s+")
    val nTok = size(toks).cast("long")
    val stopCnt = size(filter(toks, x => x.isInCollection(stopwords))).cast("long")
    val alnumChars = length(regexp_replace(col("text"), "\\s+", "")).cast("double")
    docs
      .select(
        col("doc_id"),
        nTok.as("n_tokens"),
        round(stopCnt.cast("double") / nTok.cast("double") * 1000000, 0)
          .cast("long").as("stop_ratio_e6"),
        round(alnumChars / nTok.cast("double") * 1000000, 0)
          .cast("long").as("avg_word_len_e6"))
      .withColumn("quality_e6",
        round(least(lit(1.0), greatest(lit(0.0),
          lit(0.5) + lit(0.05) * (col("avg_word_len_e6").cast("double") / 1000000.0)
            - lit(0.8) * (col("stop_ratio_e6").cast("double") / 1000000.0))) * 1000000, 0)
          .cast("long"))
  }

  def qQualityScore(s: SparkSession, sf: String): DataFrame =
    qualityPerDoc(tWide(s, sf, "documents")).orderBy("doc_id")

  /** Document fingerprinting: md5 of whitespace-normalized lowercase text,
    * plus a 64-char-prefix fingerprint (near-dup blocking key). */
  def qDocFingerprint(s: SparkSession, sf: String): DataFrame = {
    val norm = lower(regexp_replace(col("text"), "\\s+", " "))
    tWide(s, sf, "documents")
      .select(
        col("doc_id"),
        md5(norm).as("fp"),
        md5(substring(norm, 1, 64)).as("prefix_fp"),
        length(norm).cast("long").as("norm_len"))
      .orderBy("doc_id")
  }

  /** V13 (exact): duplicate-text detection per source via hash-groupBy —
    * `has_duplicates` profiling (`ingestion_pipeline_langgraph.py:466`). */
  def qExactDedup(s: SparkSession, sf: String): DataFrame =
    tWide(s, sf, "documents")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(md5(col("text"))).as("n_unique"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dups"))
      .orderBy("source")

  /** The marker-token table the heuristic language-ID scores against. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "is", "of"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "de", "y"),
    "fr" -> Seq("le", "la", "et", "les"),
    "zh" -> Seq("de", "le", "shi", "he"))

  /** Language-ID heuristic: score each candidate language by its
    * marker-token hit count and take the argmax (ties broken by language
    * code — a total order). The score is the hit RATE, but every language
    * shares the doc's token count as denominator, so the argmax — and the
    * emitted evidence — is pure integer arithmetic: (hit count, token
    * count) instead of a float confidence. That makes the whole output
    * oracle-checkable (DuckDB reproduces tokenization, marker counts, and
    * the (hits, lang) argmax exactly), where the previous float-confidence
    * shape was rows-only. */
  def qLangId(s: SparkSession, sf: String): DataFrame = {
    val toks = split(lower(trim(col("text"))), "\\s+")
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lg, ws) =>
      struct(
        size(filter(toks, x => x.isInCollection(ws))).cast("long").as("hits"),
        lit(lg).as("lang"))
    }
    val best = array_max(array(scores: _*))
    tWide(s, sf, "documents")
      .select(col("doc_id"), col("lang").as("label_lang"),
        best.getField("lang").as("pred_lang"),
        best.getField("hits").as("n_marker_hits"),
        size(toks).cast("long").as("n_tokens"))
      .orderBy("doc_id")
  }

  /** Trained language-ID: multinomial naive Bayes over tokens, fully
    * distributed — profiles are a groupBy((lang, token)) count with add-1
    * smoothing, scoring is a broadcast join of the (tiny) vocabulary
    * weights + per-(doc, lang) log-prob sum + argmax. The honest
    * statistical upgrade of the marker heuristic; on the synthetic corpus
    * (near-uniform token distributions) accuracy is near chance, which the
    * spec demonstrates is a data property: on separable vocabularies the
    * same model is exact. */
  def trainLangProfiles(train: DataFrame): DataFrame = {
    val toks = train.select(col("lang"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
    val counts = toks.groupBy("lang", "tok").agg(count(lit(1)).as("n"))
    val totals = toks.groupBy("lang").agg(count(lit(1)).as("total"))
    // vocabulary size joins in as a 1-row frame — no eager driver action.
    // Log-probs are quantized to e6 micro-ints AT THE PROFILE, so every
    // downstream score is an INTEGER sum — deterministic under Spark's
    // nondeterministic partial-merge order (a raw double sum is not) and
    // reproducible by the DuckDB oracle (the q_bigram_lm micro-int
    // pattern; ln parity across engines is already proven by that query).
    counts.join(totals, Seq("lang")).crossJoin(broadcast(vocab(toks)))
      .select(col("lang"), col("tok"),
        round(log((col("n") + 1).cast("double") /
          (col("total") + col("v") + 1).cast("double")) * 1000000, 0)
          .cast("long").as("logp_e6"),
        round(log(lit(1.0) / (col("total") + col("v") + 1).cast("double")) * 1000000, 0)
          .cast("long").as("unseen_logp_e6"))
  }

  private def vocab(toks: DataFrame): DataFrame =
    toks.agg(countDistinct(col("tok")).as("v"))

  def classifyLang(docs: DataFrame, profiles: DataFrame): DataFrame = {
    val docToks = docs.select(col("doc_id"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
    val docLen = docToks.groupBy("doc_id").agg(count(lit(1)).as("len"))
    // tokens unknown to a language contribute that language's smoothed
    // unseen log-prob: score = Σ hit logp + (len − hits) · unseen_logp.
    // The scoring join carries NO broadcast hint on purpose: the profile
    // table is (lang × token)-sized — tiny for a curated vocabulary,
    // unbounded for open web vocab — so the broadcast-vs-shuffle choice is
    // left to Spark's size threshold (AQE measures the built profile's
    // actual bytes at runtime and broadcasts only under the bound; above
    // it the join stays token-keyed). A forced hint here would OOM the
    // driver at an unbounded vocab; OpsSpec proves both physical
    // strategies produce identical output.
    val scored = docToks
      .join(profiles, Seq("tok"))
      .groupBy("doc_id", "lang")
      .agg(sum(col("logp_e6")).as("hit_score"), count(lit(1)).as("n_hit"),
        first(col("unseen_logp_e6")).as("unseen"))
      .join(docLen, Seq("doc_id"))
      .select(col("doc_id"), col("lang"),
        (col("hit_score") + (col("len") - col("n_hit")) * col("unseen"))
          .as("score_e6"))
    val best = max_by(
      struct(col("lang"), col("score_e6")),
      struct(col("score_e6"), col("lang")))
    scored.groupBy("doc_id")
      .agg(best.as("best"))
      .select(col("doc_id"), col("best.lang").as("pred_lang"),
        col("best.score_e6").as("score_e6"))
  }

  /** CHECKED since r11: the whole NB pipeline is integer arithmetic once
    * profiles carry e6-quantized log-probs, so the DuckDB oracle reproduces
    * training, scoring, and the (score, lang) argmax exactly — this moved
    * from rows-only to hash-verified with no change to the model. */
  def qLangIdNb(s: SparkSession, sf: String): DataFrame = {
    val docs = tWide(s, sf, "documents")
    val train = docs.filter(col("doc_id") % 10 < 8)
    val test = docs.filter(col("doc_id") % 10 >= 8)
    classifyLang(test, trainLangProfiles(train))
      .join(docs.select(col("doc_id"), col("lang").as("label_lang")), Seq("doc_id"))
      .select(col("doc_id"), col("pred_lang"), col("label_lang"), col("score_e6"),
        when(col("pred_lang") === col("label_lang"), 1L).otherwise(0L).as("correct"))
      .orderBy("doc_id")
  }

  /** Vocabulary building: corpus-wide token frequencies with dense ranked
    * ids — the table a tokenizer-training step starts from. One
    * explode→groupBy (map-side combinable; key cardinality = vocabulary,
    * not corpus size) + a top-N. The window that assigns ids runs over the
    * N-row result, not the corpus. Ties break lexicographically so ids are
    * deterministic across engines and partitionings. */
  def buildVocab(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    val freq = docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(topN)
    freq.select(col("token"), col("n"),
      (row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("token").asc)) - 1).cast("long").as("token_id"))
  }

  def qVocabTop(s: SparkSession, sf: String): DataFrame =
    buildVocab(tWide(s, sf, "documents"), "text", topN = 100)
      .orderBy("token_id")

  /** SimHash (64-bit) per document: xxhash64 per token, bitwise
    * majority-vote over token hashes — near-dup docs land within small
    * Hamming distance. Pure DataFrame ops; no oracle (engine-specific hash). */
  def simhash(df: DataFrame, textCol: String): DataFrame = {
    val toks = array_distinct(split(trim(lower(col(textCol))), "\\s+"))
    val withTok = df.withColumn("tok", explode(toks))
      .withColumn("h", xxhash64(col("tok")))
    val bitVotes = (0 until 64).map { i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0L, 1L).otherwise(-1L)).as(s"b$i")
    }
    val votes = withTok.groupBy("doc_id").agg(bitVotes.head, bitVotes.tail: _*)
    val sig = (0 until 64).map(i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    votes.select(col("doc_id"), sig.as("simhash"))
  }

  /** Per-row simhash as ONE nested HOF expression (hash each distinct
    * token once, fold a 64-slot vote array, assemble the sign bits) — an
    * INDEPENDENT formulation of [[simhash]]'s explode + groupBy votes,
    * used as its cross-check. Kept in SQL text because Scala `functions`
    * has no column-indexed `shiftleft`. */
  private def simhashRowSql(textExpr: String): String =
    s"""aggregate(
       |  zip_with(
       |    aggregate(
       |      transform(array_distinct(split(trim(lower($textExpr)), '\\\\s+')),
       |        t -> xxhash64(t)),
       |      array_repeat(0, 64),
       |      (acc, h) -> zip_with(acc,
       |        transform(sequence(0, 63),
       |          i -> CASE WHEN shiftright(h, i) & 1 = 1 THEN 1 ELSE -1 END),
       |        (a, b) -> a + b)),
       |    sequence(0, 63),
       |    (v, i) -> CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), i)
       |      ELSE CAST(0 AS BIGINT) END),
       |  CAST(0 AS BIGINT), (acc, x) -> acc | x)""".stripMargin

  /** X27 face, CHECKED CONTRACT (the signature itself is engine-specific —
    * xxhash64 has no DuckDB twin — so the signature VALUE cannot be the
    * oracle): per doc, the exact distinct-token count (DuckDB recomputes
    * it) plus a verdict that two independent Spark formulations of the
    * signature agree — the distributed explode + groupBy bit-votes
    * ([[simhash]]) vs the per-row nested-HOF fold ([[simhashRowSql]]).
    * Integer vote sums are order-free, so agreement is deterministic; the
    * oracle asserts the verdict is literally TRUE per row, certifying the
    * distributed formulation against a per-row reference the same way
    * q_ntile/q_ntile_scalable share one oracle. */
  def qSimhash(s: SparkSession, sf: String): DataFrame = {
    val docs = tWide(s, sf, "documents")
    val dist = simhash(docs, "text")
    docs.select(col("doc_id"),
        size(array_distinct(split(trim(lower(col("text"))), "\\s+")))
          .cast("long").as("n_distinct_tok"),
        expr(simhashRowSql("text")).as("row_sig"))
      .join(dist, Seq("doc_id"))
      .select(col("doc_id"), col("n_distinct_tok"),
        (col("row_sig") === col("simhash")).as("formulations_agree"))
      .orderBy("doc_id")
  }

  /** SimHash near-dup pairs: candidates share one of 4 16-bit signature
    * bands (docs within Hamming distance 3 of a 64-bit signature must agree
    * on ≥1 band — pigeonhole), then exact Hamming verify via bit_count(xor).
    * Join key is (band, 16-bit chunk): bounded shuffle, no all-pairs. */
  def simhashNeardupPairs(sigs: DataFrame, maxHamming: Int): DataFrame = {
    val banded = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xffffL)).as("key"))): _*))
        .as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val l = banded.select(col("band"), col("key"),
      col("doc_id").as("id_a"), col("simhash").as("ha"))
    val r = banded.select(col("band"), col("key"),
      col("doc_id").as("id_b"), col("simhash").as("hb"))
    l.join(r, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** CHECKED CONTRACT for the simhash near-dup pipeline — a DETERMINISTIC
    * recall floor, not a probabilistic one: any two docs with the SAME
    * distinct-token set have identical signatures (the votes are a pure
    * function of that set), identical signatures agree on every band, and
    * the verify step computes hamming 0 ≤ 3 — so every token-set-duplicate
    * pair MUST appear in [[simhashNeardupPairs]]' output, by theorem. The
    * token-set-duplicate pair list IS DuckDB-computable (a self-join on
    * the sorted distinct-token list), so the query emits exactly those
    * pairs INNER-joined against the pipeline's found pairs: a pipeline
    * regression (missed pair / wrong hamming) drops or corrupts rows and
    * the hash gate fails. Unlike a measured-recall claim over
    * probabilistic banding, this can never flake on corpus regeneration.
    * The full hamming ≤ 3 pair face (engine-specific signature values)
    * stays available via [[simhashNeardupPairs]], spec-covered in OpsSpec. */
  def qSimhashNeardup(s: SparkSession, sf: String): DataFrame = {
    val docs = tWide(s, sf, "documents")
    val found = simhashNeardupPairs(simhash(docs, "text"), maxHamming = 3)
    val keyed = docs.select(col("doc_id"),
      array_sort(array_distinct(split(trim(lower(col("text"))), "\\s+"))).as("ts"))
    val dup = keyed.as("a").join(keyed.as("b"),
        col("a.ts") === col("b.ts") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    dup.join(found, Seq("id_a", "id_b"))
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy("id_a", "id_b")
  }

  /** Winnowing fingerprints (rolling k-gram hash + window minima — the
    * MOSS/SIGMOD'03 algorithm, compiled kernel in `graft.functions.Winnow`):
    * any shared run of ≥ w+k-1 chars between two docs shares a fingerprint,
    * so explode+groupBy on the fingerprint value gives local-similarity
    * candidates at scale. */
  def winnowFingerprints(df: DataFrame, textCol: String, k: Int = 12, w: Int = 8): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    df.select(col("doc_id"),
      GraftColumnBridge.column(graft.functions.Winnow(
        GraftColumnBridge.expression(col(textCol)), k, w)).as("fingerprints"))
  }

  /** CHECKED CONTRACT for winnowing (fingerprint VALUES are
    * engine-specific Rabin-Karp hashes, so they cannot be the oracle):
    *  - `n_distinct_kgrams` — the kernel run at w = 1 selects EVERY
    *    window minimum of a 1-hash window, i.e. every k-gram hash, and
    *    its dedup makes the array the distinct k-gram hash set; its size
    *    equals the count of distinct k-length substrings of the
    *    normalized text, which DuckDB recomputes character-for-character.
    *    (Equality is exact unless two distinct k-grams collide in a
    *    64-bit hash — probability ~1e-15 per doc, and deterministic for a
    *    pinned corpus: not a flake source.)
    *  - `subset_ok` — the winnowed fingerprint set (w = 8) is contained
    *    in the all-k-grams set: the SIGMOD'03 selection invariant (every
    *    fingerprint is some window's minimum, hence a k-gram hash),
    *    asserted in-plan as a literally-TRUE verdict.
    *  - `nonempty` — winnowing always selects ≥ 1 fingerprint (short
    *    texts degrade to one whole-text hash), so explode+groupBy
    *    candidate generation never silently drops a doc. */
  def qWinnowFingerprint(s: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    def fp(w: Int) = GraftColumnBridge.column(graft.functions.Winnow(
      GraftColumnBridge.expression(col("text")), 12, w))
    tWide(s, sf, "documents")
      .select(col("doc_id"), fp(8).as("sel"), fp(1).as("all_kg"))
      .select(col("doc_id"),
        size(col("all_kg")).cast("long").as("n_distinct_kgrams"),
        (size(array_except(col("sel"), col("all_kg"))) === 0).as("subset_ok"),
        (size(col("sel")) >= 1).as("nonempty"))
      .orderBy("doc_id")
  }
}
