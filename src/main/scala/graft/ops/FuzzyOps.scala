package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Approximate STRING joins — the entity-resolution face a curation
  * pipeline needs (near-identical names/titles/urls differing by a typo):
  * edit-distance joins expressed with lossless neighborhood blocking
  * instead of the quadratic all-pairs scan the semantics naively imply.
  *
  * POSITION-REFINED FastSS (Bocek et al., 2007, "Fast Similarity Search
  * in Large Dictionaries", §3.2 — the variant that keeps the deletion
  * POSITION with each key): every string emits its single-deletion
  * variants tagged with the deleted position, plus identity entries
  * replicated across positions 0..|s|+1. Two entries in the same
  * (variant, position) bucket are within Levenshtein distance 1 BY
  * CONSTRUCTION:
  *   - deletion × deletion, same key, same position i: the two strings
  *     agree everywhere except position i → distance 0 or 1;
  *   - identity × deletion at position j: the shorter string IS the
  *     longer minus its j-th char → distance exactly 1;
  *   - identity × identity (position 0): equal strings → distance 0 —
  * and conversely every distance-≤1 pair shares such a bucket
  * (substitution at i ⇒ both delete i; insertion/deletion ⇒ the longer's
  * deletion at the edit position meets the shorter's replica at that
  * position; equality ⇒ the identity key), so the blocking is LOSSLESS
  * in both directions: candidates ≡ results. The exact-verify stage of
  * the position-free formulation disappears along with its wasted work —
  * a position-free bucket of b entries implies b(b−1)/2 Levenshtein DPs
  * of which most fail (measured at sf0.1: 1.6M candidates for ~0.3M true
  * pairs); here candidates ≈ results, and ONE exact-levenshtein pass over
  * the DEDUPED pairs (output-sized) both supplies the distance column and
  * clears the rare 64-bit key-hash collision.
  *
  * Work is keyed on (variant hash, position): Σ(2|s|+2) entries per
  * string, bucket-local pair generation, never row×row. The oracle runs
  * the quadratic levenshtein formulation outright, so the hash match
  * proves the blocking lossless AND the analytic distance exact.
  */
object FuzzyOps {

  /** (id, name, pos, key): the |s| single-deletion variants tagged with
    * their deleted position (1-based), plus identity entries replicated
    * at pos 0..|s|+1 (pos 0 pairs equal strings; pos j ≥ 1 meets a
    * one-char-LONGER string that deletes its j-th char).
    *
    * Written as explode(sequence) + plain CASE/substr/concat — NOT a
    * higher-order `transform` lambda: HOFs evaluate interpreted
    * per-element (measured ~3× the cost of the codegen'd string ops on
    * this hot path), while Generate + scalar string functions stay inside
    * whole-stage codegen. k ∈ [0, L+1] maps to the identity replicas,
    * k ∈ [L+2, 2L+1] to deletion position k−L−1. */
  def deletionKeys(df: DataFrame): DataFrame =
    df.select(col("id"), col("name"),
        explode(sequence(lit(0), length(col("name")) * 2 + 1)).as("k"))
      .select(col("id"), col("name"),
        expr("CASE WHEN k <= length(name) + 1 THEN k " +
          "ELSE k - length(name) - 1 END").as("pos"),
        expr("CASE WHEN k <= length(name) + 1 THEN name " +
          "ELSE concat(substr(name, 1, k - length(name) - 2), " +
          "substr(name, k - length(name))) END").as("key"))

  /** All pairs with levenshtein(name_a, name_b) ≤ 1, id_a < id_b: lossless
    * position-refined blocking + bucket-local pair generation. Distance 0
    * (exact duplicates) is included by the semantics.
    *
    * Plan shape (3 exchanges): one (key, pos)-keyed self-join (the
    * exchange computed once and reused), one OUTPUT-sized pair dedup (a
    * substitution pair meets in exactly one bucket; only equal strings
    * and repeated-char deletions meet in more), and the caller's sort.
    * Keys travel as 64-bit hashes through the bucket shuffle (8-byte
    * longs, not |s|-char strings — the dedup family's r12 trick). A 64-bit collision between two DIFFERENT
    * variant strings can only ADD a candidate pair, and every deduped
    * pair passes the exact levenshtein verify — so hashing is lossless
    * for the result by construction, while the blocking guarantee
    * (distance-≤1 ⇒ shared (key, pos) ⇒ shared bucket) is preserved
    * exactly. */
  def fuzzyPairs(df: DataFrame): DataFrame = {
    // bucket-local pair generation AS A SELF-JOIN on (key hash, pos): the
    // two sides are the identical subtree, so the exchange is computed
    // once (ReusedExchange), and the shuffled-hash hint keeps the join
    // sort-free (the SMJ default would sort both 2(|s|+1)-per-row entry
    // streams; measured ~0.6 s of the query at sf0.1). An aggregate-
    // into-arrays formulation (collect_set + in-bucket transform) was
    // ~2× slower here: ObjectHashAggregate + interpreted HOF lambdas vs
    // a codegen'd join.
    val e = deletionKeys(df).withColumn("kh", xxhash64(col("key")))
      .select(col("kh"), col("pos"), col("id"), col("name"))
    val a = e.select(col("kh"), col("pos"),
      col("id").as("id_a"), col("name").as("name_a"))
    val b = e.select(col("kh"), col("pos"),
      col("id").as("id_b"), col("name").as("name_b"))
    a.join(b.hint("shuffle_hash"), Seq("kh", "pos"))
      .filter(col("id_a") < col("id_b"))
      // dedup pairs that met in several buckets (equal strings; repeated-
      // char deletions) — values per group are identical by construction
      // (same ids carry the same names), and min() keeps the projection
      // deterministic even if an input ever violated that id→name
      // invariant (first() would silently pick a partition-order row)
      .groupBy("id_a", "id_b")
      .agg(min(col("name_a")).as("name_a"), min(col("name_b")).as("name_b"))
      // ONE exact DP per unique pair, AFTER the dedup: candidates ≈
      // results under position refinement, so this is output-sized work
      // (the position-free formulation ran it per candidate occurrence —
      // ~5× more DPs at sf0.1), and it restores the exact guarantee the
      // 64-bit key hashing alone cannot give (a colliding bucket could
      // otherwise emit a far pair)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 1)
      .select("id_a", "name_a", "id_b", "name_b", "dist")
  }

  /** X64 face: typo-tolerant self-join over customer names. At sf scale the
    * names are synthetic id-stamped strings, so single-digit substitutions
    * produce a rich distance-1 pair graph — the entity-resolution shape. */
  def qFuzzyJoin(s: SparkSession, sf: String): DataFrame =
    // tWide: variant generation emits ~2(|s|+1) rows per name — the
    // kernel-parallelism floor keeps that explode off a single scan task
    fuzzyPairs(tWide(s, sf, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name")))
      .orderBy("id_a", "id_b")
}
