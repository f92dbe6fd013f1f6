package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, StringType, StructType}
import Tables._

/** X77: delta embedding refresh — re-embed ONLY the chunks whose content
  * changed since the last collection build, reuse persisted vectors for
  * everything else, and drop vectors whose source rows disappeared.
  *
  * The reference rebuilds a whole Chroma collection per ingest
  * (`chroma_ingestion_util.py:267-327` deletes and recreates); at 100 TB
  * the embedding call is the single most expensive step of the pipeline
  * (network round-trips per batch, priced per token), so the scale design
  * is incremental and SINGLE-PASS: ONE keyed full-outer join of the old
  * collection against the fresh snapshot decides reused/embedded/dropped
  * per row by content fingerprint, and one narrow mapPartitions over the
  * joined rows batches ONLY the changed texts through the embedder —
  * reused/dropped rows pass through untouched. (A union-of-filtered-
  * branches formulation was measured to re-execute the join once per
  * branch — three shuffles of both sides; the CASE-then-mapPartitions
  * shape keeps it at one.) The fingerprint is md5 of the text — chosen
  * over xxhash64 because the decision is then bit-replayable by the
  * DuckDB oracle (`q_embed_delta_refresh`).
  */
object EmbedMaintOps {

  /** The content fingerprint both engines can compute (Spark md5 over the
    * UTF-8 bytes ≡ DuckDB md5 of the VARCHAR). */
  def fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** Refresh an embedded collection against a fresh snapshot.
    *
    * @param old      prior collection: (key, fp, embedding) — fp as
    *                 produced by [[fingerprint]] at the previous build
    * @param fresh    new snapshot: (key, text)
    * @param embedder applied to changed/new texts only, in ≤ batchSize
    *                 requests (the V2 seam — HTTP or a deterministic stub)
    * @return one row per key in either side: key, fp, text, embedding,
    *         action ('reused' | 'embedded' | 'dropped'); dropped rows keep
    *         a null embedding and exist for lineage/reporting — filter
    *         `action <> 'dropped'` for the servable collection
    */
  def deltaRefresh(old: DataFrame, fresh: DataFrame,
      embedder: graft.pipeline.Embedder, batchSize: Int = 64): DataFrame = {
    val o = old.select(col("key").as("o_key"), col("fp").as("o_fp"),
      col("embedding").as("o_embedding"))
    val n = fresh.select(col("key").as("n_key"), col("text"))
      .withColumn("n_fp", fingerprint(col("text")))
    val joined = n.join(o, col("n_key") === col("o_key"), "full_outer")
      .select(
        coalesce(col("n_key"), col("o_key")).as("key"),
        coalesce(col("n_fp"), col("o_fp")).as("fp"),
        col("text"),
        col("o_embedding"),
        // null-safe <=>: a row whose content changed TO null must re-embed,
        // not fall through to 'reused' via a NULL =!= comparison
        when(col("n_key").isNull, "dropped")
          .when(col("o_key").isNull || !(col("o_fp") <=> col("n_fp")),
            "embedded")
          .otherwise("reused").as("action"))
    val outSchema = new StructType()
      .add("key", fresh.schema("key").dataType)
      .add("fp", StringType)
      .add("text", StringType)
      .add("embedding", ArrayType(FloatType))
      .add("action", StringType)
    joined.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val changedTexts = rows.collect {
          case r if r.getString(4) == "embedded" => r.getString(2)
        }
        val vecs = embedder.embedBatch(changedTexts).iterator
        rows.map { r =>
          r.getString(4) match {
            case "embedded" =>
              Row(r.get(0), r.getString(1), r.getString(2), vecs.next().toSeq,
                "embedded")
            case "reused" =>
              Row(r.get(0), r.getString(1), r.getString(2), r.getSeq[Float](3),
                "reused")
            case _ =>
              Row(r.get(0), r.getString(1), null, null, "dropped")
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** The face's hermetic embedder: a deterministic formula of the text —
    * the vectors themselves are not oracle-compared (the ACTION partition
    * is), so any cheap deterministic kernel serves. */
  private object FaceEmbedder extends graft.pipeline.Embedder {
    override val dim = 16
    override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
      texts.map(t => Array.tabulate(dim)(i => ((t.length * 31 + i) % 97).toFloat))
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
    deltaRefresh(old, fresh, FaceEmbedder)
      .groupBy("action")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("key")).as("id_sum"))
      .orderBy("action")
  }
}
