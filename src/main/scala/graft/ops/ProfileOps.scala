package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Catalog/profiling operators: schema introspection rendered as rows
  * (reference `DESCRIBE` — `duckdb_util.py:174-206`) and the deterministic
  * per-column profile that replaces the LLM profiler
  * (`ingestion_pipeline_langgraph.py:428-526`: nullability, distinctness,
  * duplicate detection — computed natively in one aggregation pass).
  */
object ProfileOps {

  /** Spark type → the type name DuckDB's DESCRIBE prints, so schema
    * introspection is oracle-comparable. */
  def duckTypeName(dt: DataType): String = dt match {
    case LongType             => "BIGINT"
    case IntegerType          => "INTEGER"
    case ShortType            => "SMALLINT"
    case DoubleType           => "DOUBLE"
    case FloatType            => "FLOAT"
    case StringType           => "VARCHAR"
    case BooleanType          => "BOOLEAN"
    case DateType             => "DATE"
    case _: TimestampType     => "TIMESTAMP"
    case TimestampNTZType     => "TIMESTAMP"
    case ArrayType(e, _)      => duckTypeName(e) + "[]"
    case d: DecimalType       => s"DECIMAL(${d.precision},${d.scale})"
    case other                => other.sql
  }

  /** R3: schema introspection — `DESCRIBE (SELECT * FROM read_parquet(...))`
    * (`duckdb_util.py:174-180`, `ingestion_pipeline_langgraph.py:536-541`). */
  def qDescribe(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    t(s, sf, "lineitem").schema.fields.toSeq
      .map(f => (f.name, duckTypeName(f.dataType)))
      .toDF("column_name", "column_type")
      .orderBy("column_name")
  }

  /** V10: deterministic per-column profile (null count + distinct count per
    * column, one aggregation pass, unpivoted via stack). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nnull"),
        countDistinct(col(c)).as(s"${c}__ndist"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', `${c}__nnull`, `${c}__ndist`").mkString(", ")
    one.selectExpr(
      s"stack(${cols.length}, $stackArgs) as (column_name, n_nulls, n_distinct)")
      .orderBy("column_name")
  }

  def qProfileStats(s: SparkSession, sf: String): DataFrame =
    profile(t(s, sf, "orders"),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))

  /** X42: content checksum — an order-independent per-source fingerprint
    * for replication / anti-entropy audits ("did the copy land intact?").
    * Each row hashes to a 60-bit integer (first 15 hex chars of the md5 of
    * a \u0001-joined canonical string — md5 is engine-identical, and 15
    * hex chars fit a signed 64-bit lane under ANSI overflow checking);
    * per-source the rows fold with XOR and a modular sum — both
    * commutative+associative, so partial aggregation works map-side and
    * the merge order Spark picks cannot change the answer. One scan, one
    * tiny keyed shuffle of (source → 4 numbers); two corpus replicas
    * compare by exchanging a handful of rows, never data. */
  def qTableChecksum(s: SparkSession, sf: String): DataFrame = {
    val h = conv(substring(md5(concat_ws("\u0001",
        col("doc_id").cast("string"), col("source"), col("text"))), 1, 15),
      16, 10).cast("long")
    t(s, sf, "documents")
      .select(col("source"), h.as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("h") % 1000000007L).as("checksum_sum"),
        expr("bit_xor(h)").as("checksum_xor"),
        max(col("h")).as("h_max"))
      .orderBy("source")
  }

  /** X56: declarative data-quality expectations — the constraint-validation
    * gate a pipeline runs before publishing a table (not-null, uniqueness,
    * enum membership, numeric/date ranges, referential integrity), each
    * reported as (constraint, n_violations, n_checked). Scale shape: every
    * scalar constraint on a table folds into ONE conditional-aggregate
    * pass over that table (`stack` unpivots the single agg row into
    * per-constraint rows — no per-constraint rescan), uniqueness rides the
    * same agg as count(*)−count(distinct), and referential integrity is
    * one LEFT ANTI join keyed on the foreign key. A 100 TB validation run
    * is two scans and one keyed join, independent of how many scalar
    * constraints are declared. */
  def qExpectations(s: SparkSession, sf: String): DataFrame = {
    val o = t(s, sf, "orders")
    val li = t(s, sf, "lineitem")
    val oRows = o.agg(
        count(lit(1)).as("n"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("v_null"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_uniq"),
        sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L))
          .as("v_enum"))
      .select(expr(
        """stack(3,
          |'o_custkey_not_null', v_null, n,
          |'o_orderkey_unique', v_uniq, n,
          |'o_orderstatus_enum', v_enum, n)
          |AS (rule, n_violations, n_checked)""".stripMargin))
    val liRows = li.agg(
        count(lit(1)).as("n"),
        sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
          .otherwise(0L)).as("v_qty"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L)
          .otherwise(0L)).as("v_disc"),
        sum(when(col("l_shipdate") < to_timestamp(lit("1996-01-01")), 1L)
          .otherwise(0L)).as("v_date"))
      .select(expr(
        """stack(3,
          |'l_quantity_range', v_qty, n,
          |'l_discount_range', v_disc, n,
          |'l_shipdate_recent', v_date, n)
          |AS (rule, n_violations, n_checked)""".stripMargin))
    // SHJ hint: the anti join's default SortMergeJoin sorts the fact side
    // (n log n in corpus size on fixed cores); hashing the key-only orders
    // projection is linear and the build shrinks as reducers scale out
    // (measured r16 octave: x64 8.9 -> 5.2 s, x64/x16 4.8x -> 3.6x)
    val fk = li.join(o.select(col("o_orderkey")).hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("nv"))
      .crossJoin(broadcast(li.agg(count(lit(1)).as("n"))))
      .select(lit("lineitem_orders_fk").as("rule"),
        col("nv").as("n_violations"), col("n").as("n_checked"))
    oRows.unionByName(liRows).unionByName(fk).orderBy("rule")
  }
}
