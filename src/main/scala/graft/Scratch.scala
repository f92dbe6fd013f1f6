package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc driver for manual end-to-end checks (not part of the contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.headOption.getOrElse("xlsx") match {
      case "xlsx" =>
        val sheets = graft.sources.ExcelSource.readXlsx(spark, "/root/reference/loan.xlsx")
        sheets.foreach { case (name, df) =>
          println(s"[scratch] sheet=$name rows=${df.count()}")
          df.printSchema()
          df.show(3, truncate = false)
        }
      case "pipeline" =>
        val res = graft.pipeline.IngestionPipeline.run(spark,
          Seq("/root/reference/loan.xlsx"), "target/scratch_pipeline")
        res.files.foreach(f => println(s"[scratch] ${f.input} -> ${f.parquetPath} (${f.rows} rows)"))
        println(s"[scratch] catalog: ${res.catalogJson.take(200)}...")
        val coll = spark.read.parquet(
          "target/scratch_pipeline/collections/data_source_loan_data.parquet")
        println(s"[scratch] collection chunks=${coll.count()}")
        coll.select("chunk_id", "n_rows", "row_indices").show(3, truncate = 60)
      case "entry" =>
        val df = SparkEntry.entry(spark)
        println(s"[scratch] entry rows=${df.count()}")
        df.show(10, truncate = false)
    }
    spark.stop()
  }
}
