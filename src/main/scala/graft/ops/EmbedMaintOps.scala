package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** X77: delta embedding refresh — re-embed ONLY the chunks whose content
  * changed since the last collection build, reuse persisted vectors for
  * everything else, and drop vectors whose source rows disappeared.
  *
  * The reference rebuilds a whole Chroma collection per ingest
  * (`chroma_ingestion_util.py:267-327` deletes and recreates); at 100 TB
  * the embedding call is the single most expensive step of the pipeline
  * (network round-trips per batch, priced per token), so the scale design
  * is incremental: ONE keyed full-outer join of the old collection against
  * the fresh snapshot on the chunk key decides reused/embedded/dropped per
  * row by content fingerprint, and the (expensive) embed path runs only
  * over the changed partition of rows. The fingerprint is md5 of the text
  * — chosen over xxhash64 because the decision is then bit-replayable by
  * the DuckDB oracle (`q_embed_delta_refresh`).
  *
  * 100-TB shape: the join shuffles on the chunk key (co-partitionable with
  * the collection's storage layout); the embed branch is a narrow
  * mapPartitions over ONLY changed rows (`Embedder.embedColumn` seam);
  * nothing is collected; reused vectors never leave their partition
  * except through the join's own exchange.
  */
object EmbedMaintOps {

  /** The content fingerprint both engines can compute (Spark md5 over the
    * UTF-8 bytes ≡ DuckDB md5 of the VARCHAR). */
  def fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** Refresh an embedded collection against a fresh snapshot.
    *
    * @param old   prior collection: (key, fp, embedding) — fp as produced
    *              by [[fingerprint]] at the previous build
    * @param fresh new snapshot: (key, text)
    * @param embed applied to the changed/new rows only — must append an
    *              `embedding` column (e.g. `Embedder.embedColumn(_, "text",
    *              e)` for the HTTP path, or a stubEmbed withColumn)
    * @return one row per key in either side: key, fp, text, embedding,
    *         action ('reused' | 'embedded' | 'dropped'); dropped rows keep
    *         a null embedding and exist for lineage/reporting — filter
    *         `action <> 'dropped'` for the servable collection
    */
  def deltaRefresh(old: DataFrame, fresh: DataFrame,
      embed: DataFrame => DataFrame): DataFrame = {
    val o = old.select(col("key").as("o_key"), col("fp").as("o_fp"),
      col("embedding").as("o_embedding"))
    val n = fresh.select(col("key").as("n_key"), col("text"))
      .withColumn("n_fp", fingerprint(col("text")))
    val j = n.join(o, col("n_key") === col("o_key"), "full_outer")
    val changed = j.filter(col("n_key").isNotNull &&
        (col("o_key").isNull || col("o_fp") =!= col("n_fp")))
      .select(col("n_key").as("key"), col("n_fp").as("fp"), col("text"))
    val reused = j.filter(col("n_key").isNotNull && col("o_key").isNotNull &&
        col("o_fp") === col("n_fp"))
      .select(col("n_key").as("key"), col("n_fp").as("fp"), col("text"),
        col("o_embedding").as("embedding"), lit("reused").as("action"))
    val dropped = j.filter(col("n_key").isNull)
      .select(col("o_key").as("key"), col("o_fp").as("fp"),
        lit(null: String).as("text"),
        lit(null).cast(reused.schema("embedding").dataType).as("embedding"),
        lit("dropped").as("action"))
    embed(changed).withColumn("action", lit("embedded"))
      .select("key", "fp", "text", "embedding", "action")
      .unionByName(reused)
      .unionByName(dropped)
  }

  /** Driver face: the documents table plays both snapshots — the "old"
    * collection is every doc embedded as-is (stub vectors, md5
    * fingerprints); the "fresh" snapshot drops every 11th doc and edits
    * every 7th-mod-3 one — so all three actions occur. Output is the
    * per-action provenance the refresh decided (counts + id checksum);
    * the DuckDB oracle replays the fingerprint comparison with its own
    * md5 and must reach the identical partition of the key space. */
  def qEmbedDeltaRefresh(s: SparkSession, sf: String): DataFrame = {
    val docs = t(s, sf, "documents")
    val old = docs.select(col("doc_id").as("key"),
        fingerprint(col("text")).as("fp"), col("text"))
      .withColumn("embedding",
        graft.pipeline.IngestionPipeline.stubEmbed(16)(col("text")))
      .drop("text")
    val fresh = docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id").as("key"),
        when(col("doc_id") % 7 === 3, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
    deltaRefresh(old, fresh, changed => changed.withColumn("embedding",
        graft.pipeline.IngestionPipeline.stubEmbed(16)(col("text"))))
      .groupBy("action")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("key")).as("id_sum"))
      .orderBy("action")
  }
}
