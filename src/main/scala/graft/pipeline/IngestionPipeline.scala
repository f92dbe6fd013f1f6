package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{CatalogOps, CleanColumns, IngestOps, ProfileOps}
import graft.sources.ExcelSource

import java.nio.file.{Files, Paths, StandardCopyOption}

/** The end-to-end ingestion pipeline — the deterministic Spark rebuild of the
  * reference's `run_ingestion_pipeline` (`ingestion_pipeline_langgraph.py:
  * 1231-1306`): fetch → format dispatch → column cleaning → zstd parquet →
  * catalog profiling → row chunking → vector-store sink. The reference
  * orchestrates this through a LangGraph state machine with thread pools;
  * here each per-file stage is a Spark job and the "graph" is function
  * composition (SURVEY §3.2: the graph is orchestration sugar, not
  * semantics).
  */
object IngestionPipeline {

  case class FileResult(input: String, table: String, parquetPath: String, rows: Long)
  /** One failed input (the reference records the failing `file_path`,
    * `process_and_convert_file_wrapper` `ingestion_pipeline_langgraph.py:
    * 640-685`; the error detail is ours — the envelope renders paths only,
    * matching the reference's `failed_files` list shape). */
  case class FailedFile(input: String, error: String)
  case class PipelineResult(files: Seq[FileResult], failed: Seq[FailedFile],
      catalogJson: String, envelopeJson: String)

  /** S6: URL fetch — streams `http(s)://` or `file://` sources to a local
    * temp file (`download_file_from_url`,
    * `ingestion_pipeline_langgraph.py:138-155`); plain paths pass through. */
  def fetch(url: String, workDir: String): String =
    if (url.startsWith("http://") || url.startsWith("https://"))
      // S6: the real HTTP path — streamed GET, redirects, raise-for-status,
      // transient retry (sources/UrlSource; NetIngestSpec)
      graft.sources.UrlSource.download(url, workDir)
    else if (url.contains("://")) {
      val name = url.split("/").last
      val dest = Paths.get(workDir, name)
      Files.createDirectories(dest.getParent)
      val in = new java.net.URI(url).toURL.openStream()
      try Files.copy(in, dest, StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
      dest.toString
    } else url

  /** One input file → one or more cleaned tables (xlsx: one per non-empty
    * sheet, named `<base>_<sheet>`; the reference's naming scheme,
    * `duckdb_util.py:302-306`). */
  def readTables(spark: SparkSession, path: String): Seq[(String, DataFrame)] = {
    val base = path.split("/").last.replaceAll("\\.[^.]+$", "")
    val lower = path.toLowerCase
    if (lower.endsWith(".xlsx") || lower.endsWith(".xls"))
      // workbook order preserved (readXlsx returns an ordered Seq)
      ExcelSource.readXlsx(spark, path).map { case (sheet, df) =>
        (CleanColumns.cleanName(s"${base}_$sheet"), df)
      }
    else Seq((CleanColumns.cleanName(base), IngestOps.readAny(spark, path)))
  }

  /** Serialize every row like the reference chunker
    * (`chroma_ingestion_util.py:106-113`) and pack into char-budget chunks
    * (running-sum bucketing over the given order column — the scalable
    * formulation; see `graft.ops.TextOps.qChunkRows`).
    *
    * Two-level chunking, so NO window ever sees the whole table in one task:
    *   1. rows are range-split into order-contiguous blocks of at most
    *      `rowsPerBlock` rows (`repartitionByRange`, so block i holds strictly
    *      smaller order keys than block i+1);
    *   2. the char-budget running sum runs per block
    *      (`Window.partitionBy(block)`) — bounded task size by construction;
    *   3. per-block chunk counts (one row per block — a tiny frame) are
    *      prefix-summed into block offsets, and `chunk_id = offset +
    *      chunk_in_block` keeps ids dense and globally ordered.
    * A block boundary forces a chunk break; with the default block size that
    * only differs from a single global running sum on tables of 65k+ rows,
    * where chunk layout is an artifact anyway (coverage and row order are
    * invariant — PipelineSpec asserts both). Inputs that fit one block are
    * bit-identical to the single-window formulation. */
  def chunkTable(df: DataFrame, orderCol: String, budget: Int,
      rowsPerBlock: Int = 65536, rowHint: Option[Long] = None): DataFrame = {
    val cols = df.columns.toSeq
    val body = cols.map(c =>
      concat(lit(s"$c:"), coalesce(col(c).cast("string"), lit("NULL"))))
    val rowText = concat(lit("[index "), col(orderCol), lit("] "),
      concat_ws(" | ", body: _*))
    // rowHint: callers that already counted the table (the pipeline profiles
    // it in the same breath) pass the count in, so block sizing doesn't cost
    // an extra full pass per ingested table
    val total = rowHint.getOrElse(df.count())
    val nBlocks = math.max(1L, (total + rowsPerBlock - 1L) / rowsPerBlock).toInt
    val rows = df.select(col(orderCol).as("__idx"), rowText.as("row_text"))
      .withColumn("len", length(col("row_text")).cast("long"))
    // works for any orderable key (including string ids): blocks are range
    // partitions of the order column, not arithmetic on its value
    val blocked =
      if (nBlocks == 1) rows.withColumn("block", lit(0L))
      else rows.repartitionByRange(nBlocks, col("__idx"))
        .withColumn("block", spark_partition_id().cast("long"))
    val wRun = Window.partitionBy("block").orderBy("__idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withChunk = blocked.withColumn("chunk_in_block",
      floor((sum(col("len")).over(wRun) - col("len")) / lit(budget.toDouble))
        .cast("long"))
    // block → first global chunk id; one row per block, so the unpartitioned
    // prefix-sum window is over ≤ nBlocks rows, never the data
    val offsets = withChunk.groupBy("block")
      .agg((max(col("chunk_in_block")) + 1L).as("n_chunks"))
      .withColumn("offset",
        coalesce(sum(col("n_chunks")).over(Window.orderBy("block")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("block", "offset")
    withChunk.join(broadcast(offsets), Seq("block"))
      .withColumn("chunk_id", col("offset") + col("chunk_in_block"))
      .groupBy("chunk_id")
      .agg(array_sort(collect_list(struct(col("__idx"), col("row_text"))))
        .as("sorted_rows"),
        count(lit(1)).as("n_rows"))
      // text lines and row_indices are derived from the SAME sorted array so
      // line i always corresponds to row_indices[i] (collect_list alone is
      // partition-order nondeterministic)
      .select(col("chunk_id"),
        array_join(transform(col("sorted_rows"), x => x.getField("row_text")), "\n")
          .as("text"),
        transform(col("sorted_rows"), x => x.getField("__idx")).as("row_indices"),
        col("n_rows"))
  }

  /** V2 seam: the embedding kernel is pluggable; the default is a STUB — a
    * deterministic hash-derived vector (the real service call is a network
    * dependency the reference satisfies with Azure ada-002,
    * `chroma_ingestion_util.py:147-160`; this environment has no network).
    * Plumbing (batching, schema `array<float>`) is real. */
  def stubEmbed(dim: Int)(textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(textCol, i), lit(1000L)).cast("double") / 500.0 - 1.0)
        .cast("float"))

  /** S12: vector-store sink — one "collection" per table
    * (`data_source_<base>`, `chroma_ingestion_util.py:190-205`), written as
    * a parquet table of chunks + embeddings + metadata, overwrite =
    * delete-then-recreate freshness (`:267-327`). */
  def writeCollection(chunks: DataFrame, table: String, outDir: String, dim: Int = 64,
      embedder: Option[Embedder] = None): String = {
    val path = s"$outDir/collections/data_source_$table.parquet"
    // V2 seam: a bound embedder routes every chunk batch through the real
    // executor-side HTTP path (Embedder.embedColumn); the default stays the
    // deterministic stub so collections are hermetic and oracle-replayable
    val embedded = embedder match {
      case Some(e) => Embedder.embedColumn(chunks, "text", e)
      case None => chunks.withColumn("embedding", stubEmbed(dim)(col("text")))
    }
    embedded
      .withColumn("source_table", lit(table))
      .write.mode(SaveMode.Overwrite).option("compression", "zstd").parquet(path)
    path
  }

  /** One aggregation pass over a freshly-written table: row count + per-
    * column null/distinct stats (HLL++ sketches, not exact countDistinct —
    * see CatalogOps.profileTable for the 100-TB argument). The count this
    * returns also sizes chunkTable's blocks, so profiling and chunk layout
    * share the single pass. */
  private def profileEntry(df: DataFrame, table: String,
      parquetPath: String): CatalogOps.TableEntry = {
    val cols = df.schema.fields.toSeq
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { fld =>
      Seq(sum(when(col(fld.name).isNull, 1L).otherwise(0L)).as(s"${fld.name}__nnull"),
        // rsd 0.05 — see CatalogOps.profileTable: precision 0.01 costs
        // 20-50 s of quadratic Catalyst planning per wide table
        approx_count_distinct(col(fld.name).cast("string"), 0.05).as(s"${fld.name}__ndist"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    CatalogOps.TableEntry(table, parquetPath, row.getLong(0),
      cols.zipWithIndex.map { case (fld, i) =>
        CatalogOps.ColumnMeta(fld.name, ProfileOps.duckTypeName(fld.dataType),
          row.getLong(1 + 2 * i), row.getLong(2 + 2 * i))
      })
  }

  // ---- resume markers ------------------------------------------------
  // The reference checkpoints pipeline state (`MemorySaver`,
  // `ingestion_pipeline_langgraph.py:1222-1223`) so a resumed graph skips
  // completed nodes. The Spark analog: after ALL outputs of one input file
  // (parquet tables + collections) are fully written, an atomic per-input
  // marker records the input's content fingerprint plus every produced
  // table (path, rows, catalog entry). A re-run skips inputs whose marker
  // fingerprint still matches and whose outputs exist — a killed 100-TB
  // backfill resumes from the last completed file instead of from zero,
  // and completed inputs are never re-read (the marker even replays the
  // catalog entry, so no re-profiling pass either). A kill mid-file leaves
  // partial outputs WITHOUT a marker; the re-run overwrites them.

  private def markerFile(outDir: String, url: String): java.io.File = {
    val stem = CleanColumns.cleanName(url.split("/").last.takeRight(64))
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(url.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString
    new java.io.File(s"$outDir/markers", s"${stem}_$h.json")
  }

  private def writeMarker(marker: java.io.File, url: String, fp: String,
      done: Seq[(FileResult, CatalogOps.TableEntry)]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val root = mapper.createObjectNode()
    root.put("input", url)
    root.put("fp", fp)
    val arr = root.putArray("files")
    done.foreach { case (fr, te) =>
      val n = arr.addObject()
      n.put("table", fr.table)
      n.put("parquet", fr.parquetPath)
      n.put("rows", fr.rows)
      // explicit type param: set's generic return would otherwise be
      // inferred from an ascription and CCE at runtime
      n.set[com.fasterxml.jackson.databind.node.ObjectNode](
        "entry", mapper.readTree(te.toJson))
    }
    marker.getParentFile.mkdirs()
    val tmp = new java.io.File(marker.getParentFile, marker.getName + ".tmp")
    Files.writeString(tmp.toPath, mapper.writeValueAsString(root))
    Files.move(tmp.toPath, marker.toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING): Unit
  }

  /** A marker is honored only if its fingerprint matches the CURRENT input
    * content and every recorded output still exists — a changed input or a
    * vanished output falls through to reprocessing. */
  private def readMarker(marker: java.io.File, url: String, fp: String,
      outDir: String): Option[Seq[(FileResult, CatalogOps.TableEntry)]] =
    if (!marker.exists()) None
    else scala.util.Try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper
      val root = mapper.readTree(Files.readString(marker.toPath))
      require(root.get("fp").asText == fp, "input content changed")
      val arr = root.get("files")
      (0 until arr.size).map { i =>
        val n = arr.get(i)
        val table = n.get("table").asText
        val pq = n.get("parquet").asText
        require(new java.io.File(pq).exists(), s"missing parquet $pq")
        require(new java.io.File(
          s"$outDir/collections/data_source_$table.parquet").exists(),
          s"missing collection for $table")
        (FileResult(url, table, pq, n.get("rows").asLong),
          CatalogOps.entryFromJson(mapper.writeValueAsString(n.get("entry"))))
      }
    }.toOption

  /** Process ONE input file end-to-end (fetch → tables → parquet →
    * chunk collections → catalog entries), honoring a matching resume
    * marker. Throws on any failure — `run` owns the per-file degrade. */
  private def processOne(spark: SparkSession, url: String, outDir: String,
      chunkBudget: Int, resume: Boolean,
      stageSink: (String, Double) => Unit = (_, _) => ())
      : Seq[(FileResult, CatalogOps.TableEntry)] = {
    // stage boundaries follow the pipeline's ACTIONS, because Spark fuses
    // the lazy read→clean chain into the parquet write job: fetch and
    // read_schema (CSV/xlsx schema work) are eager, read_clean_write is
    // one job, profile and chunk_collection are jobs on the persisted
    // parquet. BenchIngest aggregates these per mult level.
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      stageSink(name, (System.nanoTime() - t0) / 1e9)
      r
    }
    val local = timed("fetch")(fetch(url, s"$outDir/downloads"))
    val localFile = new java.io.File(local)
    if (!localFile.exists())
      throw new java.io.FileNotFoundException(s"Local file not found: $local")
    val fp = graft.ops.ArtifactStore.fingerprint(localFile, s"ingest:v1:$chunkBudget")
    val marker = markerFile(outDir, url)
    val resumed = if (resume) readMarker(marker, url, fp, outDir) else None
    resumed.getOrElse {
      val done = timed("read_schema")(readTables(spark, local)).map { case (table, df) =>
        val pq = s"$outDir/parquet_files/$table.parquet"
        timed("read_clean_write")(IngestOps.writeParquetZstd(df, pq))
        val persisted = spark.read.parquet(pq)
        val entry = timed("profile")(profileEntry(persisted, table, pq))
        val chunks = chunkTable(persisted, persisted.columns.head, chunkBudget,
          rowHint = Some(entry.rowCount))
        timed("chunk_collection")(writeCollection(chunks, table, outDir))
        (FileResult(url, table, pq, entry.rowCount), entry)
      }
      if (resume) writeMarker(marker, url, fp, done)
      done
    }
  }

  /** Full run: inputs → parquet tables + catalog envelope + chunk
    * collections, with the reference's per-file degrade contract: a corrupt
    * or unreadable input is recorded in `failed` and the batch CONTINUES
    * (`process_and_convert_file_wrapper` catches per-file exceptions and
    * returns the failing path, `ingestion_pipeline_langgraph.py:640-685`).
    * The output document is the reference envelope with REAL
    * successful/failed counts; when no input survives, it is the
    * `error_handler_node` envelope (`:1147-1186`) — success=false, zero
    * counts, `vector_ingestion_status:"not_started"`, the canonical error
    * string. `resume=true` (default) also makes the run idempotent via
    * per-input markers (see above). */
  def run(spark: SparkSession, inputs: Seq[String], outDir: String,
      chunkBudget: Int = 1000, sessionId: String = "graft",
      timestamp: String = "", resume: Boolean = true,
      stageSink: (String, Double) => Unit = (_, _) => ()): PipelineResult = {
    require(inputs.nonEmpty, "No input files provided") // validate_inputs_node
    Files.createDirectories(Paths.get(s"$outDir/parquet_files"))
    val outcomes = inputs.map { url =>
      try Right(processOne(spark, url, outDir, chunkBudget, resume, stageSink))
      catch {
        case scala.util.control.NonFatal(e) =>
          Left(FailedFile(url, s"${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("")))
      }
    }
    val done = outcomes.collect { case Right(d) => d }.flatten
    val failed = outcomes.collect { case Left(f) => f }
    val files = done.map(_._1)
    val catalogJson = done.map(_._2.toJson).mkString("[", ",", "]")
    val env =
      if (files.isEmpty)
        CatalogOps.envelope(Nil, failed.map(_.input), 0, "not_started",
          sessionId, timestamp,
          Some("No Parquet files were successfully created."))
      else {
        val entriesFull = done.map(_._2).zipWithIndex.map { case (te, i) =>
          te.toCatalogEntryJson(i, sessionId, timestamp = timestamp)
        }
        CatalogOps.envelope(entriesFull, failed.map(_.input), files.size,
          "completed", sessionId, timestamp)
      }
    Files.writeString(Paths.get(s"$outDir/catalog.json"), env)
    PipelineResult(files, failed, catalogJson, env)
  }
}
