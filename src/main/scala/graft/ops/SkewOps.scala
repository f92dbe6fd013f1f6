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
}
