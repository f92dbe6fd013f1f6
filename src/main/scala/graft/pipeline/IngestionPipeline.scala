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
  case class PipelineResult(files: Seq[FileResult], catalogJson: String)

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
      rowsPerBlock: Int = 65536): DataFrame = {
    val cols = df.columns.toSeq
    val body = cols.map(c =>
      concat(lit(s"$c:"), coalesce(col(c).cast("string"), lit("NULL"))))
    val rowText = concat(lit("[index "), col(orderCol), lit("] "),
      concat_ws(" | ", body: _*))
    val nBlocks = math.max(1L, (df.count() + rowsPerBlock - 1L) / rowsPerBlock).toInt
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

  /** Full run: inputs → parquet tables + catalog JSON + chunk collections. */
  def run(spark: SparkSession, inputs: Seq[String], outDir: String,
      chunkBudget: Int = 1000): PipelineResult = {
    Files.createDirectories(Paths.get(s"$outDir/parquet_files"))
    val files = inputs.flatMap { url =>
      val local = fetch(url, s"$outDir/downloads")
      readTables(spark, local).map { case (table, df) =>
        val pq = s"$outDir/parquet_files/$table.parquet"
        IngestOps.writeParquetZstd(df, pq)
        val persisted = spark.read.parquet(pq)
        val orderCol = persisted.columns.head
        val chunks = chunkTable(persisted, orderCol, chunkBudget)
        writeCollection(chunks, table, outDir)
        FileResult(url, table, pq, persisted.count())
      }
    }
    val catalogEntries = files.map { f =>
      val df = spark.read.parquet(f.parquetPath)
      val cols = df.schema.fields.toSeq
      // HLL++ sketches, not exact countDistinct — see CatalogOps.profileTable
      val aggs = count(lit(1)).as("__n") +: cols.flatMap { fld =>
        Seq(sum(when(col(fld.name).isNull, 1L).otherwise(0L)).as(s"${fld.name}__nnull"),
          approx_count_distinct(col(fld.name).cast("string"), 0.01).as(s"${fld.name}__ndist"))
      }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      CatalogOps.TableEntry(f.table, f.parquetPath, row.getLong(0),
        cols.zipWithIndex.map { case (fld, i) =>
          CatalogOps.ColumnMeta(fld.name, ProfileOps.duckTypeName(fld.dataType),
            row.getLong(1 + 2 * i), row.getLong(2 + 2 * i))
        })
    }
    val json = catalogEntries.map(_.toJson).mkString("[", ",", "]")
    Files.writeString(Paths.get(s"$outDir/catalog.json"), json)
    PipelineResult(files, json)
  }
}
