package graft

import org.apache.spark.sql.functions._
import graft.pipeline.IngestionPipeline

/** End-to-end ingestion pipeline spec: xlsx + csv inputs (one via file://
  * URL) → cleaned zstd parquet tables + catalog JSON + chunk collections
  * with stub embeddings. */
class PipelineSpec extends SparkTestBase {

  test("full run over loan.xlsx and a csv produces tables, catalog, collections") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "pipeline_spec").toString
    // csv input staged from testdata, addressed via file:// URL (S6 path)
    Seq((1, "BUILDING", 10.5), (2, "AUTO", 20.25), (3, "BUILDING", 30.0))
      .toDF("Cust Key", "Segment", "Acct-Bal($)")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(s"$out/in")
    val csvFile = new java.io.File(s"$out/in").listFiles()
      .find(_.getName.endsWith(".csv")).get.getAbsolutePath

    val res = IngestionPipeline.run(spark,
      Seq("/root/reference/loan.xlsx", s"file://$csvFile"), out)

    assert(res.failed.isEmpty, s"unexpected failures: ${res.failed}")
    assert(res.files.size == 2)
    val loan = res.files.find(_.table == "loan_data").get
    assert(loan.rows == 1000)
    val csv = res.files.find(_.table != "loan_data").get
    assert(csv.rows == 3)

    // parquet tables are readable with cleaned names
    val csvBack = spark.read.parquet(csv.parquetPath)
    assert(csvBack.columns.toSeq == Seq("cust_key", "segment", "acct_bal"))

    // catalog JSON references both tables with row counts
    assert(res.catalogJson.contains("\"table\":\"loan_data\""))
    assert(res.catalogJson.contains("\"row_count\":1000"))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/catalog.json")))

    // collections: chunk coverage + embeddings of the right shape
    val coll = spark.read.parquet(s"$out/collections/data_source_loan_data.parquet")
    assert(coll.agg(sum(size(col("row_indices")))).head.getLong(0) == 1000)
    assert(coll.select(size(col("embedding"))).distinct().head.getInt(0) == 64)
    assert(coll.filter(col("source_table") =!= "loan_data").count() == 0)
    // deterministic embeddings: re-running overwrites with identical bytes
    val sig1 = coll.agg(sum(abs(element_at(col("embedding"), 1)))).head.getDouble(0)
    IngestionPipeline.run(spark, Seq("/root/reference/loan.xlsx"), out)
    val sig2 = spark.read.parquet(s"$out/collections/data_source_loan_data.parquet")
      .agg(sum(abs(element_at(col("embedding"), 1)))).head.getDouble(0)
    assert(math.abs(sig1 - sig2) < 1e-6)
  }

  test("chunkTable never runs an unpartitioned window over the data") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val docs = graft.ops.Tables.t(spark, sf, "documents")
    val chunks = IngestionPipeline.chunkTable(docs, "doc_id", 500, rowsPerBlock = 64)

    // plan shape: the running-sum window over the rows is partitioned (by
    // block); any unpartitioned window may only sit over the per-block
    // summary aggregate (one row per block), never the raw rows
    val wins = chunks.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.child.collect { case a: Aggregate => a }.nonEmpty,
        s"unpartitioned window over non-aggregated input:\n$w")
    }

    // content: chunk ids are globally ordered and cover every row exactly
    // once, in row order
    val ids = chunks.orderBy("chunk_id").select("row_indices")
      .collect().flatMap(_.getSeq[Long](0)).toSeq
    val want = docs.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == want)

    // serialized text is identical to the single-block (global-window-
    // equivalent) formulation — blocks only add chunk breaks, never reorder
    // or rewrite rows
    val single = IngestionPipeline.chunkTable(docs, "doc_id", 500)
    def fullText(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("chunk_id").select("text").collect().map(_.getString(0)).mkString("\n")
    assert(fullText(chunks) == fullText(single))

    // single-block inputs take the lit(0) block path -> chunk ids dense from 0
    val firstId = single.orderBy("chunk_id").select("chunk_id").head.getLong(0)
    assert(firstId == 0L)
  }

  test("two-level chunking invariants hold for randomized inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { trial =>
      val n = rnd.nextInt(400) + 50
      val budget = rnd.nextInt(300) + 60
      val block = rnd.nextInt(60) + 8
      val rows = (0 until n).map(i => (i.toLong, "x" * (rnd.nextInt(80) + 1)))
        .toDF("id", "payload")
      val chunks = IngestionPipeline.chunkTable(rows, "id", budget,
        rowsPerBlock = block).orderBy("chunk_id").collect()
      // coverage in order, chunk ids strictly increasing
      val ids = chunks.flatMap(_.getSeq[Long](2))
      assert(ids.toSeq == (0L until n).toSeq,
        s"trial $trial (n=$n budget=$budget block=$block): bad coverage")
      val cids = chunks.map(_.getLong(0)).toSeq
      assert(cids == cids.sorted && cids.distinct == cids)
      // row_indices and text lines stay aligned
      chunks.foreach { r =>
        assert(r.getString(1).split("\n", -1).length == r.getSeq[Long](2).size)
      }
    }
  }

  private def stageCsv(dir: String, name: String, rows: Seq[String]): String = {
    val d = new java.io.File(dir); d.mkdirs()
    val f = new java.io.File(d, name)
    java.nio.file.Files.writeString(f.toPath, rows.mkString("\n"))
    f.getPath
  }

  test("per-file failure isolation: a poisoned workbook degrades, the batch continues") {
    val out = "target/pipeline_degrade_mix"
    graft.ops.VectorOps.deleteRecursively(new java.io.File(out))
    // a structurally-broken xlsx (not a zip at all) between two good inputs
    val poison = stageCsv(s"$out/in", "poison.xlsx", Seq("this is not a zip"))
    val good = stageCsv(s"$out/in", "good_rows.csv",
      Seq("id,seg,bal", "1,BUILDING,10.5", "2,AUTO,20.25", "3,BUILDING,30.0"))

    val res = IngestionPipeline.run(spark,
      Seq("/root/reference/loan.xlsx", poison, good), out,
      sessionId = "mixsess", resume = false)

    // the reference contract: two tables produced, one failure RECORDED
    assert(res.files.map(_.table).sorted == Seq("good_rows", "loan_data"))
    assert(res.failed.map(_.input) == Seq(poison))
    assert(res.failed.head.error.nonEmpty)

    // envelope: real counts, failed path listed, success stays true
    val env = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(res.envelopeJson)
    assert(env.get("success").asBoolean)
    val summary = env.get("processing_summary")
    assert(summary.get("total_files_processed").asInt == 2)
    assert(summary.get("successful_files").asInt == 2)
    assert(summary.get("failed_files").asInt == 1)
    assert(summary.get("vector_ingestion_status").asText == "completed")
    assert(env.get("failed_files").size == 1 &&
      env.get("failed_files").get(0).asText == poison)
    assert(env.get("catalog").size == 2)
    // catalog.json on disk carries the SAME envelope (the reference writes
    // its final_json to output_json_path)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/catalog.json")) == res.envelopeJson)
  }

  test("all inputs failing yields the reference error envelope byte-for-byte") {
    val out = "target/pipeline_degrade"
    graft.ops.VectorOps.deleteRecursively(new java.io.File(out))
    val poison = stageCsv(out, "poison.xlsx", Seq("still not a zip"))
    assert(poison == "target/pipeline_degrade/poison.xlsx")

    val res = IngestionPipeline.run(spark, Seq(poison), out,
      sessionId = "degradesess", resume = false)
    assert(res.files.isEmpty && res.failed.size == 1)
    val golden = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "src/test/resources/error_envelope.golden.json")).trim
    assert(res.envelopeJson == golden,
      s"error envelope drifted.\nACTUAL:\n${res.envelopeJson}\nGOLDEN:\n$golden")
  }

  test("resume: completed inputs are skipped without re-reading them") {
    val out = "target/pipeline_resume"
    graft.ops.VectorOps.deleteRecursively(new java.io.File(out))
    val in = new java.io.File(s"$out/in"); in.mkdirs()
    val f1 = new java.io.File(in, "wb.xlsx")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/reference/loan.xlsx"), f1.toPath)

    val r1 = IngestionPipeline.run(spark, Seq(f1.getPath), out)
    assert(r1.files.map(_.table) == Seq("wb_data") && r1.failed.isEmpty)
    val pqDir = new java.io.File(r1.files.head.parquetPath)
    def mtimes(d: java.io.File) = d.listFiles().map(f => f.getName -> f.lastModified).toMap
    val before = mtimes(pqDir)

    // overwrite the INPUT with same-size garbage at the same mtime: the
    // content fingerprint is unchanged, so resume must skip it — and if the
    // pipeline re-read the file, the garbage would fail the xlsx parser.
    val size = f1.length(); val mt = f1.lastModified()
    java.nio.file.Files.write(f1.toPath, Array.fill(size.toInt)('x'.toByte))
    assert(f1.setLastModified(mt))

    val f2 = stageCsv(s"$out/in", "extra.csv", Seq("k,v", "1,a", "2,b"))
    val r2 = IngestionPipeline.run(spark, Seq(f1.getPath, f2), out)
    assert(r2.failed.isEmpty, s"resume re-read a completed input: ${r2.failed}")
    assert(r2.files.map(_.table).sorted == Seq("extra", "wb_data"))
    assert(r2.files.find(_.table == "wb_data").get.rows == 1000)
    // outputs of the completed input were not rewritten
    assert(mtimes(pqDir) == before)
    // catalog entries replay from the marker — same stats as the clean run
    assert(r2.catalogJson.contains("\"table\":\"wb_data\"") &&
      r2.catalogJson.contains("\"row_count\":1000"))

    // without its marker the same input IS re-read — and the garbage fails,
    // which proves the marker (not luck) was doing the skipping
    val markers = new java.io.File(s"$out/markers").listFiles()
      .filter(_.getName.startsWith("wb_xlsx"))
    assert(markers.nonEmpty)
    markers.foreach(m => assert(m.delete()))
    val r3 = IngestionPipeline.run(spark, Seq(f1.getPath, f2), out)
    assert(r3.failed.map(_.input) == Seq(f1.getPath))
    assert(r3.files.map(_.table) == Seq("extra"))
  }
}
