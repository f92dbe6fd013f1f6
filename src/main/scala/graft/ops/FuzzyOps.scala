package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Approximate STRING joins — the entity-resolution face a curation
  * pipeline needs (near-identical names/titles/urls differing by a typo):
  * edit-distance joins expressed with lossless neighborhood blocking
  * instead of the quadratic all-pairs scan the semantics naively imply.
  *
  * FastSS deletion neighborhoods (Bocek et al., 2007, "Fast Similarity
  * Search in Large Dictionaries"): every string emits itself plus its |s|
  * single-deletion variants as join keys. Two strings within Levenshtein
  * distance 1 MUST share a key —
  *   - substitution at position i: deleting position i from both sides
  *     yields the same string;
  *   - insertion/deletion: the longer side's deletion at the edit position
  *     IS the shorter string (which emits itself);
  *   - equality: the identity key —
  * so the blocking is LOSSLESS and the exact `levenshtein` verify runs on
  * candidates only. Work is keyed on variant strings: Σ|s| keys total,
  * bucket-local pair generation (the dedup family's shape), never
  * row×row. The oracle runs the quadratic formulation outright, so the
  * hash match proves no pair dropped — same epistemics as the n-gram
  * prefix filter.
  */
object FuzzyOps {

  /** (id, name, key) — the identity key plus every single-deletion
    * variant, built with codegen HOFs (no UDF). */
  def deletionKeys(df: DataFrame): DataFrame =
    df.select(col("id"), col("name"),
      explode(concat(array(col("name")), expr(
        "transform(sequence(1, length(name)), " +
          "i -> concat(substr(name, 1, i - 1), substr(name, i + 1, length(name))))")))
        .as("key"))

  /** All pairs with levenshtein(name_a, name_b) ≤ 1, id_a < id_b: lossless
    * deletion-neighborhood blocking + bucket-local pair generation + exact
    * verify. Distance 0 (exact duplicates) is included by the semantics.
    *
    * r14 shape (the previous pipeline was the most expensive headline
    * query at sf0.1 yet FLAT to x16 — pure stage overhead): buckets carry
    * (id, name) structs, pairs are generated AND levenshtein-verified
    * inside the bucket projection, and only verified pairs reach the
    * dedup aggregate — so the candidate `distinct` (which shuffled every
    * candidate pair) shrinks to an OUTPUT-sized groupBy, and the two
    * id-keyed name-lookup joins disappear entirely. Three exchanges
    * total: bucket agg, pair dedup, final sort. The name payload widens
    * the bucket shuffle ~3×, but it deletes two join exchanges plus a
    * candidate-cardinality distinct — a net win at x1 and at scale. A
    * pair that meets in several buckets (a substitution pair shares one
    * deletion key, equal names also share the identity key) re-verifies
    * per bucket: ≤ a small constant × output size, all map-side. */
  def fuzzyPairs(df: DataFrame): DataFrame = {
    // keys travel as 64-bit hashes through the bucket shuffle (8-byte
    // longs, not |s|-char strings — the dedup family's r12 trick). A
    // 64-bit collision between two DIFFERENT variant strings can only ADD
    // a candidate pair, and every candidate passes the exact levenshtein
    // verify — so hashing is lossless for the result by construction (not
    // merely with high probability), while the blocking guarantee
    // (distance-≤1 ⇒ shared key ⇒ shared hash) is preserved exactly.
    deletionKeys(df)
      .withColumn("key", xxhash64(col("key")))
      .groupBy("key")
      .agg(sort_array(collect_set(struct(col("id"), col("name")))).as("es"))
      .filter(size(col("es")) >= 2)
      // in-bucket combinations: sort_array ordered the structs by id, so
      // emitting (es[i], es[j]) for j > i yields id_a < id_b directly
      .select(explode(expr(
        """flatten(transform(es, (a, i) ->
          |  transform(slice(es, i + 2, size(es) - i - 1),
          |    b -> struct(a.id AS id_a, a.name AS name_a,
          |                b.id AS id_b, b.name AS name_b))))""".stripMargin))
        .as("p"))
      .select(col("p.id_a").as("id_a"), col("p.name_a").as("name_a"),
        col("p.id_b").as("id_b"), col("p.name_b").as("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 1)
      // dedup pairs that met in several buckets — values per group are
      // identical by construction (same ids carry the same names), so
      // first() is deterministic here
      .groupBy("id_a", "id_b")
      .agg(first(col("name_a")).as("name_a"), first(col("name_b")).as("name_b"),
        first(col("dist")).as("dist"))
      .select("id_a", "name_a", "id_b", "name_b", "dist")
  }

  /** X64 face: typo-tolerant self-join over customer names. At sf scale the
    * names are synthetic id-stamped strings, so single-digit substitutions
    * produce a rich distance-1 pair graph — the entity-resolution shape. */
  def qFuzzyJoin(s: SparkSession, sf: String): DataFrame =
    fuzzyPairs(t(s, sf, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name")))
      .orderBy("id_a", "id_b")
}
