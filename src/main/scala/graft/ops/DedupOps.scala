package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Near-duplicate detection over documents — the MinHash+LSH pipeline a
  * training-data dedup stage needs at 100 TB: shingle → minhash signature →
  * band buckets → bucket-join candidates → exact Jaccard verify. Every stage
  * is a shuffle on a bounded key (band, bucket); there is no all-pairs stage.
  * N-gram Jaccard (exact, blocked) is also provided as the oracle-checkable
  * small-scale baseline.
  */
object DedupOps {

  /** Word 3-shingles of the normalized text. */
  private def shingles = {
    val toks = split(trim(lower(col("text"))), "\\s+")
    val n = size(toks)
    // slide a window of 3: shingle i = toks[i] ++ toks[i+1] ++ toks[i+2]
    array_distinct(
      transform(sequence(lit(0), greatest(n - 3, lit(0))), i =>
        concat_ws(" ",
          element_at(col("toks"), i + 1),
          element_at(col("toks"), i + 2),
          element_at(col("toks"), i + 3))))
  }

  /** MinHash signatures: k independent permutations approximated by
    * xxhash64(seed_i, shingle); the signature entry i is the min hash under
    * seed i. Computed with one explode + one groupBy (map-side combinable). */
  def minhashSignatures(docs: DataFrame, k: Int): DataFrame = {
    val exploded = docs
      .withColumn("toks", split(trim(lower(col("text"))), "\\s+"))
      .withColumn("shingle", explode(shingles))
      .select("doc_id", "shingle")
    val mins = (0 until k).map(i => min(xxhash64(lit(i), col("shingle"))).as(s"mh$i"))
    exploded.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** LSH candidate pairs: band the k-row signature into `bands` groups of
    * k/bands rows; docs sharing any band bucket are candidates. */
  def minhashCandidates(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    val rowsPerBand = k / bands
    val bandKeys = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => col(s"mh$i")): _*).as("bucket"))
    }
    val exploded = sigs.select(col("doc_id"), explode(array(bandKeys: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    exploded.as("l").join(exploded.as("r"), Seq("band", "bucket"))
      .select(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
  }

  /** Exact Jaccard over word-3-shingle sets for given pairs (explode +
    * count intersection / union — still join-shaped, never all-pairs). */
  def jaccardForPairs(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val sh = docs
      .withColumn("toks", split(trim(lower(col("text"))), "\\s+"))
      .select(col("doc_id"), explode(shingles).as("shingle"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(sh.select(col("doc_id").as("id_a"), col("shingle")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    pairs
      .join(inter, Seq("id_a", "id_b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(col("n_inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_inter")).cast("double"), 6).as("jaccard"))
  }

  /** V13 scale path: MinHash+LSH near-dup pairs with exact Jaccard verify.
    * No oracle (hash-dependent candidate set); invariants in DedupSpec. */
  def qMinhashNeardup(s: SparkSession, sf: String): DataFrame = {
    val docs = t(s, sf, "documents")
    val sigs = minhashSignatures(docs, k = 32)
    val cands = minhashCandidates(sigs, k = 32, bands = 8)
    jaccardForPairs(docs, cands)
      .filter(col("jaccard") >= 0.4)
      .orderBy("id_a", "id_b")
  }
}
