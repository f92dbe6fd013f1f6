package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Multi-dimensional data-skipping layout: Z-order (Morton-curve)
  * clustering. A single-column sort gives perfect file-level min/max
  * pruning on that column and none on any other; interleaving the bits of
  * two rank-scaled columns into one z-value and range-partitioning on it
  * gives useful pruning on BOTH — each output file covers a small rectangle
  * of the (a, b) space, so a 2-D box predicate skips most files on parquet
  * footer stats alone. At 100 TB this is a storage-layout decision (like
  * bucketing) made once at write time; no query-side code changes.
  */
object LayoutOps {

  /** Interleave the low 16 bits of two 0..65535-scaled longs (a gets the
    * odd bit positions, b the even) — a closed-form column expression,
    * fully codegen-friendly. */
  def zValue(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Min/max-scale a numeric column to the 0..65535 rank grid. Degenerate
    * (constant) columns scale to 0. */
  private def scale16(c: Column, lo: Double, hi: Double): Column =
    if (hi <= lo) lit(0L)
    else least(lit(65535L), greatest(lit(0L),
      floor((c.cast("double") - lo) / (hi - lo) * 65535.0).cast("long")))

  /** X38b: the Morton-curve kernel as an ORACLE-CHECKED query face — the
    * distinct (l_partkey, l_suppkey) grid points ranked by their
    * interleaved z-value. `zValue` is a closed-form integer bit shuffle,
    * so DuckDB replays it term for term (16 shift/mask/or triples); the
    * hash match certifies the exact curve `writeZOrdered` clusters files
    * along, which LayoutOpsSpec separately proves yields two-column
    * file-rectangle pruning. Keys pass through `pmod 65536` (the curve's
    * grid width) rather than min/max rank-scaling so the mapping is a
    * pure function of the row — replayable without a stats pass. */
  def qZorderValues(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .withColumn("zval", zValue(pmod(col("l_partkey"), lit(65536L)),
        pmod(col("l_suppkey"), lit(65536L))))
      .orderBy(col("zval").desc, col("l_partkey").asc, col("l_suppkey").asc)
      .limit(100)

  /** Write `df` z-ordered on (colA, colB) into `nFiles` range partitions.
    * The min/max bounds are one aggregation returning FOUR doubles to the
    * driver — layout metadata, same class as the catalog profiler, not a
    * data materialization. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      nFiles: Int): Unit = {
    val b = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    val z = zValue(scale16(col(colA), b.getDouble(0), b.getDouble(1)),
      scale16(col(colB), b.getDouble(2), b.getDouble(3)))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).option("compression", "zstd").parquet(path)
  }
}
