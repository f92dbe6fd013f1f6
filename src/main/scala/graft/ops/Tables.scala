package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table access + numeric-determinism helpers shared by every operator.
  *
  * The engine reads the same parquet layout the reference serves from blob
  * storage (one file per logical table — see reference `duckdb_util.py:340-344`
  * for the naming scheme; here a table is simply `<sfDir>/<name>.parquet`).
  */
object Tables {

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table carries nanosecond timestamps, which Spark's parquet
    * reader rejects (PARQUET_TYPE_ILLEGAL). Read them as raw nanos and
    * truncate to microseconds with exact integer division (`div`, not `/` —
    * ns-since-epoch exceeds double's 2^53 exact-integer range).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Order-independent sum over a double column: cast each value to an exact
    * DECIMAL first, sum exactly, return DOUBLE. Double summation is
    * reduction-order dependent (Spark merges partition partials in
    * nondeterministic order), which would make hash-comparison against a
    * single-threaded oracle flaky; decimal summation is associative and
    * exact, so both engines produce bit-identical results.
    */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Deterministic average built from the exact decimal sum. */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(c)

  /** Cosine similarity between two array<float> columns, computed in double
    * precision via codegen-friendly higher-order functions (no UDF).
    * Mirrors the reference's cosine space (`chroma_ingestion_util.py:278-282`,
    * score = 1 - distance at `chroma_retrieval_util.py:128-129` — here we
    * return the similarity directly).
    */
  def cosine(a: Column, b: Column): Column = {
    val ad  = transform(a, x => x.cast("double"))
    val bd  = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (s, x) => s + x)
    val na  = aggregate(ad, lit(0.0), (s, x) => s + x * x)
    val nb  = aggregate(bd, lit(0.0), (s, x) => s + x * x)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Codegen'd fused cosine — bit-identical results to `cosine` (same
    * sequential double accumulation), ~10× faster in the hot path. */
  def cosineFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.CosineSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
