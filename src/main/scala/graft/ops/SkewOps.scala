package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient aggregation: the two-phase salted groupBy pattern for hot
  * keys at cluster scale. Phase 1 aggregates on (key, salt) — spreading a
  * hot key over `salts` reducers — phase 2 merges the partials on the bare
  * key. Correct for any algebraic aggregate expressed as (partial, merge)
  * column pairs; AQE's skew-join handling covers joins, this covers
  * aggregations whose key histogram is pathological.
  */
object SkewOps {

  /** Salted count+sum aggregation: equivalent to
    * `df.groupBy(keys).agg(count(1), sum(valueCol))` but never concentrates
    * a hot key on one reducer. The salt is derived from a stable hash of the
    * whole row's value column so the plan stays deterministic. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(col(valueCol)), lit(salts.toLong)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__pn"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("__psum"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__pn")).as("n"),
        sum(col("__psum")).cast("double").as("sum_value"))
  }

  /** Oracle-checked wiring: salted aggregation over lineitem must equal the
    * plain GROUP BY the oracle runs — the salt must never change results. */
  def qSaltedAgg(s: org.apache.spark.sql.SparkSession, sf: String): DataFrame =
    saltedCountSum(Tables.t(s, sf, "lineitem"),
      Seq("l_returnflag", "l_linestatus"), "l_extendedprice", salts = 16)
      .orderBy("l_returnflag", "l_linestatus")

  /** Salted large-to-large equi-join for a pathological key histogram: the
    * probe side salts each row into one of `salts` sub-keys (deterministic
    * hash of a row-unique column, so the plan replays identically), the
    * build side replicates each row to ALL `salts` sub-keys, and the join
    * runs on (key, salt) — a hot key's probe rows spread over `salts`
    * reducers instead of serializing one. Replication multiplies the
    * build side by `salts`, so this is for build sides too big to
    * broadcast but far smaller than the probe side (the dimension-ish
    * middle ground). AQE's skew-join split covers the same ground
    * reactively when partition stats reveal the skew; the salted plan is
    * the proactive form that never materializes the skewed partition at
    * all. Result rows are identical to the plain join by construction —
    * each (probe row, build row) pair meets in exactly one salt bucket. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltOn: String, salts: Int = 8): DataFrame = {
    val probeS = probe.withColumn("__salt",
      pmod(xxhash64(col(saltOn)), lit(salts.toLong)))
    val buildS = build.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    probeS.join(buildS, Seq(key, "__salt")).drop("__salt")
  }

  /** X71: key-skew diagnostics — the one-row report that tells an operator
    * (or a planner) WHETHER the salted/AQE machinery above is needed for a
    * given key BEFORE the job runs hot: per-key cardinality distribution
    * (count, total, max, exact p50/p99 of per-key counts) plus the
    * hot-key-to-mean ratio in integer percent (max·100·keys div rows).
    * One keyed count (map-side combinable — the shuffle carries one row
    * per distinct key) and one key-cardinality-sized aggregate; at 100 TB
    * the report costs a group-count pass, which is exactly what it prices.
    * The percentile is Spark's exact interpolating `percentile` ≡ DuckDB
    * `quantile_cont` (parity proven by q_percentiles), e6-quantized. */
  def qSkewProfile(s: org.apache.spark.sql.SparkSession, sf: String): DataFrame =
    Tables.t(s, sf, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("n")).as("n_rows"),
        max(col("n")).as("max_n"),
        round(expr("percentile(n, 0.5)") * 1000000, 0).cast("long").as("p50_e6"),
        round(expr("percentile(n, 0.99)") * 1000000, 0).cast("long").as("p99_e6"),
        expr("(max(n) * 100 * count(1)) div sum(n)").as("hot_pct_of_mean"))

  /** Oracle-checked wiring: revenue per customer market segment through the
    * salted join must equal the plain equi-join the oracle runs. */
  def qSaltedJoin(s: org.apache.spark.sql.SparkSession, sf: String): DataFrame = {
    val orders = Tables.t(s, sf, "orders")
      .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
    val customer = Tables.t(s, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    saltedJoin(orders, customer, "c_custkey", saltOn = "o_totalprice")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        Tables.dsum(col("o_totalprice"), 2).as("revenue"))
      .orderBy("c_mktsegment")
  }
}
