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
}
