package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Table catalog: the deterministic analog of the reference's metadata
  * catalog (`duckdb_util.py:372-406` `build_global_catalog` and the rich
  * per-file entries of `ingestion_pipeline_langgraph.py:529-604`, JSON shape
  * at `:1011-1080`). LLM-generated text fields (descriptions, tags, topics)
  * are out of the engine's correctness surface; everything computable is
  * computed natively: schema, row counts, per-column null/distinct stats.
  */
object CatalogOps {

  case class ColumnMeta(name: String, dataType: String, nNulls: Long,
      nDistinct: Long, minValue: Option[String] = None, maxValue: Option[String] = None)
  case class TableEntry(
      logicalName: String,
      parquetPath: String,
      rowCount: Long,
      columns: Seq[ColumnMeta]) {

    /** Catalog string rendered for planner prompts/hooks — the analog of the
      * reference's human-readable catalog text (`duckdb_util.py:396-404`). */
    def describe: String =
      s"$logicalName (${rowCount} rows): " +
        columns.map(c => s"${c.name} ${c.dataType}").mkString(", ")

    def toJson: String = {
      val cols = columns.map { c =>
        val mm = (c.minValue, c.maxValue) match {
          case (Some(a), Some(b)) => s""","min":${q(a)},"max":${q(b)}"""
          case _ => ""
        }
        s"""{"name":${q(c.name)},"type":${q(c.dataType)},"n_nulls":${c.nNulls},"n_distinct":${c.nDistinct}$mm}"""
      }.mkString("[", ",", "]")
      s"""{"table":${q(logicalName)},"path":${q(parquetPath)},"row_count":$rowCount,"columns":$cols}"""
    }

    /** The reference's FULL per-file catalog entry shape
      * (`ingestion_pipeline_langgraph.py:1011-1080`), so a drop-in consumer
      * of its catalog JSON can read ours. Every deterministic field is
      * mirrored exactly — the file-type/mime map (`:940-949`), per-column
      * entries with ordinal (`:954-968`), the arithmetic-derived
      * graph_metadata (`:832-867` synthesizes node/edge/chunk/token counts
      * from the file index; `:996-1009` falls back to row*cols arithmetic),
      * content_analysis with the first-5-columns entity list and the
      * "Structured data with N rows and M columns" summary (`:977-983`,
      * `:1064-1069`), the access/visibility flags, custom_fields defaults,
      * and the `structured_data` tag fallback. LLM-written text fields
      * (descriptions, topics beyond the filename stem) stay "" — exactly
      * what the reference emits when its LLM pass is skipped. */
    def toCatalogEntryJson(idx: Int, sessionId: String,
        userTags: Seq[String] = Nil, timestamp: String = ""): String = {
      val filename = s"$logicalName.parquet"
      val colCount = columns.size
      val cols = columns.zipWithIndex.map { case (c, order) =>
        s"""{"name":${q(c.name)},"type":${q(c.dataType)},"nullable":"",""" +
          s""""is_primary_key":"","order":$order,"description":""}"""
      }.mkString("[", ",", "]")
      val entities = Seq("person", "organization", "location", "product", "event")
        .take(3 + idx % 3)
      val relationships = Seq("WORKS_AT", "LOCATED_IN", "PURCHASED", "BELONGS_TO",
        "RELATED_TO").take(2 + idx % 3)
      val totalChunks = 20 + idx * 5
      val totalTokens = 4000 + idx * 1000
      val tags = (if (userTags.nonEmpty) userTags.distinct else Seq("structured_data"))
        .map(q).mkString("[", ",", "]")
      val rowCountFmt = String.format(java.util.Locale.US, "%,d",
        java.lang.Long.valueOf(rowCount))
      s"""{"id":${q(s"file_$idx")},"partition_key":${q(sessionId)},""" +
        s""""file_id":${q(s"file_$idx")},"filename":${q(filename)},""" +
        s""""file_type":"parquet","file_category":"structured",""" +
        s""""file_size_bytes":"","mime_type":"application/parquet",""" +
        s""""file_extension":".parquet","session_id":${q(sessionId)},""" +
        s""""user_id":"system","organization_id":"default_org",""" +
        s""""upload_timestamp":${q(timestamp)},"processing_started":${q(timestamp)},""" +
        s""""processing_completed":${q(timestamp)},"processing_status":"completed",""" +
        s""""blob_url":"","blob_container":"","blob_path":${q(parquetPath)},""" +
        s""""parquet_url":${q(parquetPath)},""" +
        s""""structured_metadata":{"table_name":${q(logicalName)},""" +
        s""""row_count":$rowCount,"column_count":$colCount,"columns":$cols,""" +
        s""""primary_key":"","foreign_keys":[],"data_quality_score":"",""" +
        s""""has_duplicates":"","null_percentage":""},""" +
        // `filename.take(10)` — the reference truncates the parquet BASENAME
        // including its extension (ingestion_pipeline_langgraph.py:842
        // `filename[:10]` after os.path.basename), not the logical name
        s""""graph_metadata":{"graph_id":${q(s"graph_${sessionId.take(8)}_${filename.take(10)}")},""" +
        s""""node_count":${120 + idx * 30},"edge_count":${200 + idx * 50},""" +
        s""""total_chunks":$totalChunks,"total_tokens":$totalTokens,""" +
        s""""total_characters":${totalTokens * 4},"total_pages":${totalChunks / 2},""" +
        s""""neo4j_status":"indexed","created_at":${q(timestamp)},""" +
        s""""detected_entities":${entities.map(q).mkString("[", ",", "]")},""" +
        s""""detected_relationships":${relationships.map(q).mkString("[", ",", "]")}},""" +
        s""""content_analysis":{"language":"en",""" +
        s""""detected_entities":${columns.take(5).map(c => q(c.name)).mkString("[", ",", "]")},""" +
        s""""main_topics":[${q(logicalName)}],""" +
        s""""summary":${q(s"Structured data with $rowCountFmt rows and $colCount columns")}},""" +
        s""""access_count":0,"last_accessed":"","accessed_by":[],""" +
        s""""is_deleted":false,"is_public":false,"is_archived":false,""" +
        s""""custom_fields":{"data_source":"unknown","update_frequency":"once",""" +
        s""""retention_period":"indefinite"},"tags":$tags}"""
    }
  }

  private def q(s: String) =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** Parse a `TableEntry.toJson` document back. The ingestion-resume marker
    * (IngestionPipeline) stores per-table entries so a resumed run re-emits
    * the catalog without re-profiling the data — at backfill scale the
    * profile pass per table is exactly the work resume exists to skip. */
  def entryFromJson(json: String): TableEntry = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val n = mapper.readTree(json)
    val colsNode = n.get("columns")
    val cols = (0 until colsNode.size).map { i =>
      val c = colsNode.get(i)
      ColumnMeta(c.get("name").asText, c.get("type").asText,
        c.get("n_nulls").asLong, c.get("n_distinct").asLong,
        Option(c.get("min")).map(_.asText), Option(c.get("max")).map(_.asText))
    }
    TableEntry(n.get("table").asText, n.get("path").asText,
      n.get("row_count").asLong, cols)
  }

  /** Profile one table in a single aggregation pass (never per-column scans).
    *
    * Distinct counts are HLL++ sketches (`approx_count_distinct`), not exact:
    * N exact `countDistinct`s in one agg plan through an `Expand` that
    * multiplies every row N-fold before a huge shuffle — at 100 TB that is
    * the difference between one streaming pass with constant-size mergeable
    * state per column and an N× data explosion. Catalog cardinalities are
    * planner metadata, exactly what sketches are for; HLL++ is deterministic
    * (hash-based, no RNG), and at rsd=0.01 (2^14 registers, ~16 KB/column)
    * the measured error is 0 at cardinality 25 and ~0.5% at 1500, so
    * small-table profiles stay precise. The ORACLE-facing profiler
    * (`ProfileOps.profile`, V10) keeps exact `countDistinct` — that one is a
    * correctness contract, not metadata. */
  def profileTable(spark: SparkSession, sfDir: String, name: String): TableEntry = {
    val path = s"$sfDir/$name.parquet"
    val df = t(spark, sfDir, name)
    val cols = df.schema.fields.toSeq
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { f =>
      Seq(
        // coalesce: sum over ZERO rows is NULL, and an empty table must
        // profile as 0 nulls, not throw at getLong (a freshly-created
        // collection is empty on day one)
        coalesce(sum(when(col(f.name).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"${f.name}__nnull"),
        // distinct over array columns isn't hashable; sketch via string.
        // min/max compare on the NATIVE type (string min of "9"/"24" would
        // order lexicographically) and only render the result as string.
        // rsd 0.05, NOT 0.01: HLL precision 0.01 means p=14 → ~2.7k
        // buffer words PER COLUMN, and on a wide table the aggregate's
        // buffer schema reaches ~10⁵ fields where Catalyst planning goes
        // quadratic — measured 20-27 s of pure planning per profiled
        // table (BenchIngest found it; 0.47 s at rsd 0.05). A catalog
        // cardinality sketch tolerates ±5% by definition.
        approx_count_distinct(col(f.name).cast("string"), 0.05).as(s"${f.name}__ndist"),
        min(col(f.name)).cast("string").as(s"${f.name}__min"),
        max(col(f.name)).cast("string").as(s"${f.name}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val metas = cols.zipWithIndex.map { case (f, i) =>
      ColumnMeta(f.name, ProfileOps.duckTypeName(f.dataType),
        row.getLong(1 + 4 * i), row.getLong(2 + 4 * i),
        Option(row.getString(3 + 4 * i)), Option(row.getString(4 + 4 * i)))
    }
    TableEntry(name, path, row.getLong(0), metas)
  }

  /** S11: the global catalog over every testdata table, rendered as one JSON
    * array (the reference's final catalog JSON, generate_output
    * `ingestion_pipeline_langgraph.py:913-1144`). */
  def buildGlobalCatalog(spark: SparkSession, sfDir: String,
      tables: Seq[String]): String =
    tables.map(profileTable(spark, sfDir, _).toJson).mkString("[", ",", "]")

  /** The reference's outer output envelope, shared by the healthy and the
    * degraded/error paths (`generate_output_node`,
    * `ingestion_pipeline_langgraph.py:1088-1101`; `error_handler_node`,
    * `:1147-1186`). One renderer so `successful_files`/`failed_files` are
    * always the REAL counts threaded from the pipeline, never literals.
    * `failedFiles` carries the input file paths, exactly like the
    * reference's `failed_files` list (`process_and_convert_file_wrapper`
    * returns the failing `file_path`, `:640-685`); `error` is present only
    * on the reference's error branches. `success` follows the reference
    * rule: true iff at least one catalog entry was produced. */
  def envelope(entries: Seq[String], failedFiles: Seq[String],
      totalFilesProcessed: Int, vectorStatus: String,
      sessionId: String, timestamp: String,
      error: Option[String] = None): String = {
    val failedJson = failedFiles.map(q).mkString("[", ",", "]")
    val errField = error.map(e => s""","error":${q(e)}""").getOrElse("")
    s"""{"success":${entries.nonEmpty},"session_id":${q(sessionId)},""" +
      s""""processing_summary":{"total_files_processed":$totalFilesProcessed,""" +
      s""""successful_files":${entries.size},"failed_files":${failedFiles.size},""" +
      s""""vector_ingestion_status":${q(vectorStatus)},""" +
      s""""processing_completed_at":${q(timestamp)}},""" +
      s""""failed_files":$failedJson,"catalog":${entries.mkString("[", ",", "]")}$errField}"""
  }

  /** The reference's complete output document — outer envelope
    * (`ingestion_pipeline_langgraph.py:1088-1101`: success flag,
    * processing_summary, failed_files, catalog) wrapping one full
    * `toCatalogEntryJson` entry per table. A consumer that parses the
    * reference pipeline's output JSON can parse this verbatim. */
  def buildFullCatalog(spark: SparkSession, sfDir: String, tables: Seq[String],
      sessionId: String = "graft", timestamp: String = "",
      failedFiles: Seq[String] = Nil): String = {
    val entries = tables.zipWithIndex.map { case (name, idx) =>
      profileTable(spark, sfDir, name).toCatalogEntryJson(idx, sessionId,
        timestamp = timestamp)
    }
    envelope(entries, failedFiles, tables.size, "completed", sessionId, timestamp)
  }

  val allTables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
}
