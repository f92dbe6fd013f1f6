package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-storage co-location: pre-shuffling both sides of a repeated
  * join into the same bucket layout makes the join itself shuffle-free —
  * the storage-level answer to "this join runs every hour over 100 TB"
  * (SCALE.md, Joins). `bucketBy` requires the session catalog
  * (`saveAsTable`), which works against the local warehouse dir the same
  * way it does against a metastore.
  */
object BucketOps {

  /** Write a table bucketed by `key` into the session catalog. Drops any
    * previous registration AND its location first: a table created by an
    * earlier session dies with that catalog but leaves its warehouse
    * directory behind, which blocks re-creation (LOCATION_ALREADY_EXISTS). */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, tableName.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("compression", "zstd")
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** Join two identically-bucketed tables on the bucket key — planned
    * without any Exchange when bucket layouts match. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
