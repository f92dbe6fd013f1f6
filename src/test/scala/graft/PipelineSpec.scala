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
}
