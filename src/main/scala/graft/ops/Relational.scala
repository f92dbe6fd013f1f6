package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** The relational surface the reference guarantees through its SQL-generation
  * prompts (router rules `langgraph_pipeline.py:306-315`, SQL instructions
  * `:461-492`) plus the natively-implemented scan/union/join/limit paths
  * (`duckdb_util.py:166-225`). Each method is a `(SparkSession, sfDir) =>
  * DataFrame` wired into `SparkEntry.queries` with a DuckDB oracle.
  *
  * Scale notes: every query is fully declarative (Catalyst pushes filters and
  * prunes columns into the parquet scan); top-k lowers to
  * TakeOrderedAndProject (no global sort); the orders×customer join
  * broadcasts the small dimension side explicitly.
  */
object Relational {

  /** R1: bare scan — `SELECT * FROM read_parquet(...)` (`duckdb_util.py:194`). */
  def qScan(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "nation").orderBy("n_nationkey")

  /** R2: multi-file scan — `read_parquet([p1,p2], union_by_name=true)`
    * (`duckdb_util.py:166-172`). Same file listed twice ⇒ every key seen 2×. */
  def qMultifileScan(s: SparkSession, sf: String): DataFrame = {
    val p = s"$sf/customer.parquet"
    s.read.parquet(p, p)
      .groupBy("c_custkey").agg(count(lit(1)).as("n_copies"))
      .orderBy("c_custkey")
  }

  /** R4: row-count profile (`ingestion_pipeline_langgraph.py:544-546`). */
  def qCount(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "lineitem").agg(count(lit(1)).as("n_rows"))

  /** R5: LIMIT-sample with injected provenance column
    * (`duckdb_util.py:212-225`, provenance col at `:222`). */
  def qLimitProvenance(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "orders").orderBy("o_orderkey").limit(10)
      .withColumn("__table__", lit("orders"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("__table__"))

  /** R6: schema-merging union; missing columns null-filled
    * (`duckdb_util.py:166-182`, decision `langgraph_pipeline.py:228`). */
  def qUnionByName(s: SparkSession, sf: String): DataFrame = {
    val a = t(s, sf, "customer").select(
      col("c_custkey").as("id"), col("c_name").as("name"),
      col("c_acctbal").cast("double").as("acctbal"))
    val b = t(s, sf, "supplier").select(
      col("s_suppkey").as("id"), col("s_name").as("name"),
      col("s_nationkey").cast("long").as("nationkey"))
    a.unionByName(b, allowMissingColumns = true)
      .select("id", "name", "acctbal", "nationkey")
      .orderBy("name")
  }

  /** R7: equi-join on the inferred key (`duckdb_util.py:184-225`,
    * `multi_file_util.py:8-31`), aggregated per segment. Customer is the
    * small dimension, but the broadcast is a MEASURED decision, not a
    * forced hint: Spark's size threshold / AQE picks BroadcastHashJoin
    * while customer fits (PlanSpec pins that it does at sf0.1) and falls
    * back to a shuffle join when a 100 TB customer wouldn't — a forced
    * `broadcast()` has no fallback and OOMs the driver at scale. */
  def qJoinOrdersCustomer(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "orders")
      .join(t(s, sf, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("revenue"))
      .orderBy("c_mktsegment")

  /** R8a: precise numeric filter (`langgraph_pipeline.py:306-315`). */
  def qFilterNumeric(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "lineitem")
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** R8b: date-range filter (`langgraph_pipeline.py:310`). */
  def qFilterDaterange(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1997-01-01")))
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("o_date"),
        col("o_totalprice"))
      .orderBy("o_orderkey")

  /** R8c: exact (case-sensitive) string equality (`langgraph_pipeline.py:429-437`). */
  def qFilterStringEq(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
      .orderBy("c_custkey")

  /** R10a: global (ungrouped) aggregate suite. */
  def qAggGlobal(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty"),
      dsum(col("l_extendedprice"), 2).as("sum_price"),
      davg(col("l_discount"), 6).as("avg_disc"))

  /** R10b: grouped aggregation — the TPC-H-Q1-shaped flagship
    * (`langgraph_pipeline.py:306-309`, `:483-485`). */
  def qAggGroupby(s: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // The stored doubles are exact 2-dp decimals; recover them as DECIMAL and
    // do the whole product in decimal arithmetic. Casting a *derived* double
    // (price*(1-disc)) to decimal instead would round differently across
    // engines on near-tie values.
    val priceD = col("l_extendedprice").cast(DecimalType(12, 2))
    val discD  = col("l_discount").cast(DecimalType(4, 2))
    val taxD   = col("l_tax").cast(DecimalType(4, 2))
    val oneD   = lit(1).cast(DecimalType(3, 2))
    // tWide: a single-row-group parquet file scans as ONE split, and the
    // partial aggregate (8 decimal sums per row — the query's whole cost)
    // rides the scan stage, so it runs single-core no matter the executor
    // size (profiled at sf0.1: one 1.2 s task, cores-1 idle). The widening
    // exchange moves the (small by gate construction) table once and the
    // partial agg then runs cores-wide; at scale the gate is the identity.
    val li = tWide(s, sf, "lineitem")
    li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        sum(priceD * (oneD - discD)).cast("double").as("sum_disc_price"),
        sum(priceD * (oneD - discD) * (oneD + taxD)).cast("double").as("sum_charge"),
        davg(col("l_quantity"), 2).as("avg_qty"),
        davg(col("l_extendedprice"), 2).as("avg_price"),
        davg(col("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** R11: multi-column sort with direction (`langgraph_pipeline.py:483`). */
  def qSort(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "supplier")
      .select("s_suppkey", "s_name", "s_acctbal")
      .orderBy(col("s_acctbal").desc, col("s_suppkey").asc)

  /** R12: top-k — must lower to TakeOrderedAndProject, not a global sort
    * (`langgraph_pipeline.py:920-924`). */
  def qTopk(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** R13: NULL handling (`langgraph_pipeline.py:484`) — nulls injected via
    * nullif since the synthetic tables are null-free. */
  def qNullHandling(s: SparkSession, sf: String): DataFrame = {
    val o = t(s, sf, "orders")
      .withColumn("status_or_null", nullif(col("o_orderstatus"), lit("O")))
    o.groupBy("o_orderpriority").agg(
      count(lit(1)).as("n"),
      sum(when(col("status_or_null").isNull, 1L).otherwise(0L)).as("n_null"),
      count(col("status_or_null")).as("n_nonnull"),
      countDistinct(coalesce(col("status_or_null"), lit("OPEN"))).as("n_distinct_coalesced"))
      .orderBy("o_orderpriority")
  }

  /** R14a: DISTINCT (`ingestion_pipeline_langgraph.py:466`). */
  def qDistinct(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "lineitem")
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** R14b: exact distinct counts. */
  def qCountDistinct(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "lineitem").agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      countDistinct(col("l_orderkey")).as("n_orders"))

  /** R14c: approximate distinct (HLL) as a CHECKED CONTRACT: the estimate
    * itself is engine-specific (no DuckDB equivalent), so the query emits
    * the exact count plus an in-plan verdict that the estimate landed
    * within 3·rsd of it (rsd = 0.05, Spark's default) — the oracle computes
    * the exact count and asserts the verdict column is literally TRUE, so
    * the hash match certifies the approximation bound, not just row shape.
    * Deterministic: HLL register merge is order-independent, so the
    * estimate (and the verdict) is a pure function of the data. */
  def qApproxCountDistinct(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "lineitem").agg(
      approx_count_distinct(col("l_partkey")).as("approx_parts"),
      countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")).cast("double") <=
          lit(3 * 0.05) * col("exact_parts")).as("within_3rsd"))

  /** R15: month bucketing (`langgraph_pipeline.py:923`). */
  def qMonthGroupby(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "orders")
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mon"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("total"))
      .orderBy("yr", "mon")

  /** R15b: month pivot — grouped time-series matrix (`README.md:266-269`). */
  def qPivotMonth(s: SparkSession, sf: String): DataFrame = {
    val piv = t(s, sf, "orders")
      .groupBy("o_orderpriority")
      .pivot(month(col("o_orderdate")), 1 to 12)
      .agg(dsum(col("o_totalprice"), 2))
    val renamed = (1 to 12).map(m => coalesce(col(s"$m"), lit(0.0)).as(f"m$m%02d"))
    piv.select(col("o_orderpriority") +: renamed: _*).orderBy("o_orderpriority")
  }

  /** R16: anti-join (set difference) — customers with no 1996 order. */
  def qExceptSemi(s: SparkSession, sf: String): DataFrame = {
    val o96 = t(s, sf, "orders").filter(year(col("o_orderdate")) === 1996)
    t(s, sf, "customer")
      .join(o96, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** R10d: exact interpolated percentiles (median / p25 / p90) — micro-int
    * outputs since the interpolation arithmetic may differ in the last ulp
    * across engines. Exact percentile buffers per-group values; at 100 TB
    * swap in `approx_percentile` (t-digest, fixed-size sketch) — same query
    * shape, no oracle parity. */
  def qPercentiles(s: SparkSession, sf: String): DataFrame =
    tWide(s, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)") * 1000000, 0)
          .cast("long").as("med_qty_e6"),
        round(expr("percentile(l_extendedprice, 0.25)") * 1000000, 0)
          .cast("long").as("p25_price_e6"),
        round(expr("percentile(l_extendedprice, 0.9)") * 1000000, 0)
          .cast("long").as("p90_price_e6"))
      .orderBy("l_returnflag")

  /** R10e: statistical moments (variance / stddev / covariance /
    * correlation) from decimal-exact power sums. The builtin stddev/corr
    * aggregates merge double partials in nondeterministic order (no oracle
    * hash parity); the closed forms over exact Σx, Σx², Σxy are
    * reduction-order independent and bit-identical across engines. */
  def qStatsMoments(s: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val q  = col("l_quantity").cast(DecimalType(12, 2))
    val p  = col("l_extendedprice").cast(DecimalType(12, 2))
    val n  = count(lit(1)).cast("double")
    val sq  = sum(q).cast("double");  val sp  = sum(p).cast("double")
    val sqq = sum(q * q).cast("double"); val spp = sum(p * p).cast("double")
    val sqp = sum(q * p).cast("double")
    val varQ = (sqq - sq * sq / n) / (n - 1)
    val varP = (spp - sp * sp / n) / (n - 1)
    val covQP = (sqp - sq * sp / n) / (n - 1)
    t(s, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        round((sq / n) * 1000000, 0).cast("long").as("mean_qty_e6"),
        round(varQ * 1000, 0).cast("long").as("var_qty_e3"),
        round(sqrt(varQ) * 1000000, 0).cast("long").as("sd_qty_e6"),
        round(sqrt(varP) * 100, 0).cast("long").as("sd_price_e2"),
        round((covQP / (sqrt(varQ) * sqrt(varP))) * 1000000, 0).cast("long").as("corr_e6"))
      .orderBy("l_returnflag")
  }

  /** R10c: ROLLUP subtotals — hierarchical aggregates with grouping flags
    * (the Del surface's GROUP BY extended to subtotal queries). */
  def qRollup(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 2).as("sum_qty"),
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** R10f: CUBE — all 2^n grouping combinations (the remaining member of
    * the grouped-subtotal family next to ROLLUP / GROUPING SETS). Catalyst
    * lowers it to one Expand(4 projections) + hash aggregate over a single
    * scan, so the input is read once no matter how many subtotal levels
    * the cube adds — the property that matters at 100 TB. */
  def qCube(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 2).as("sum_qty"),
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** R7b: FULL OUTER join — year-over-year customer activity where either
    * side may be absent. Joining on the using-column list makes Spark
    * coalesce the key (one `o_custkey` out, never a null/null pair), and
    * both inputs are pre-aggregated per key BEFORE the join, so the full
    * outer join is a key-to-key merge of two already-small frames rather
    * than an event-level shuffle — at scale the partial aggregates are the
    * only thing that moves. */
  def qFullOuter(s: SparkSession, sf: String): DataFrame = {
    val o = t(s, sf, "orders")
    def yr(y: Int, out: String) =
      o.filter(year(col("o_orderdate")) === y)
        .groupBy("o_custkey").agg(count(lit(1)).as(out))
    yr(1995, "n_1995").join(yr(1996, "n_1996"), Seq("o_custkey"), "full_outer")
      .select(col("o_custkey").as("custkey"),
        coalesce(col("n_1995"), lit(0L)).as("n_1995"),
        coalesce(col("n_1996"), lit(0L)).as("n_1996"),
        (col("n_1995").isNotNull && col("n_1996").isNotNull)
          .cast("long").as("in_both"))
      .orderBy("custkey")
  }

  /** R15b: UNPIVOT/melt — the inverse of the pivot: wide measure columns
    * to long (metric, value) rows. Catalyst lowers `unpivot` to one Expand
    * over a single scan (k output rows per input row, no join, no
    * shuffle) — the same read-once property as the grouped-subtotal
    * family. Values are MOVED doubles, so parity is exact. */
  def qUnpivot(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "lineitem").filter(col("l_orderkey") <= 1500)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax")),
        "metric", "value")
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so
      // value joins the sort key to make the output order total (identical
      // full-duplicate rows are interchangeable either way)
      .orderBy("l_orderkey", "l_linenumber", "metric", "value")

  /** C6: regex scalar suite — extract / global replace / match / capture
    * group over document text. Patterns stay in the Java∩RE2 common subset
    * (character classes, bounded quantifiers, one capture group) so Spark's
    * java.util.regex and DuckDB's RE2 agree byte-for-byte; both engines
    * return "" for a no-match extract. Pure projection — codegen'd, no
    * shuffle beyond the output sort. */
  def qRegexFuncs(s: SparkSession, sf: String): DataFrame =
    tWide(s, sf, "documents").select(col("doc_id"),
      regexp_extract(col("text"), "[0-9]+", 0).as("first_num"),
      length(regexp_replace(col("text"), "[0-9]", "#")).cast("long")
        .as("len_masked"),
      col("text").rlike("[aeiou]{3}").cast("long").as("has_tri_vowel"),
      regexp_extract(col("text"), "([a-z]+)ing", 1).as("ing_stem"))
      .orderBy("doc_id")

  /** C7: higher-order array suite — size / distinct / slice+sort /
    * lambda filter / transform+aggregate over the tokenized text, the
    * codegen HOF toolkit (`functions.filter/transform/aggregate`) that
    * replaces per-row UDFs. Outputs are scalars (counts, a joined string,
    * an integer fold) so cross-engine comparison is exact; tokenization
    * matches the BM25 family's split for established parity. */
  def qArrayFuncs(s: SparkSession, sf: String): DataFrame = {
    val toks = split(trim(lower(col("text"))), "\\s+")
    tWide(s, sf, "documents").select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        concat_ws(",", sort_array(slice(col("toks"), 1, 5))).as("head_sorted"),
        size(filter(col("toks"), x => length(x) > 4)).cast("long").as("n_long"),
        aggregate(transform(col("toks"), x => length(x).cast("long")),
          lit(0L), (a, b) => a + b).as("sum_len"))
      .orderBy("doc_id")
  }

  /** R17e: distribution ranks — percent_rank and cume_dist per segment.
    * The ordering is TOTAL (balance desc, custkey asc), so rank has no
    * peer groups and both statistics reduce to single integer divisions
    * ((rank-1)/(n-1), rank/n) — one IEEE division each, bit-identical
    * across engines with no micro-int detour. Per-segment windows keep
    * evaluation partition-local. */
  def qPercentRank(s: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    t(s, sf, "customer")
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** R10d: GROUPING SETS — the general grouped-subtotal form. The set
    * selection here ((l_returnflag), (l_linestatus)) — two independent
    * one-column aggregates, WITHOUT the pair — is expressible by neither
    * ROLLUP nor CUBE, and Catalyst lowers it to ONE Expand + hash
    * aggregate over a single scan (not two scans unioned), the shape that
    * matters when the input is 100 TB read once. */
  def qGroupingSets(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "lineitem")
      .groupingSets(Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 2).as("sum_qty"),
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** R10e / V10: fixed-width numeric histogram — the value-distribution
    * profile a catalog publishes per numeric column (the deterministic
    * analog of the reference's LLM column descriptions,
    * `ingestion_pipeline_langgraph.py:428-526`). Bucket id is pure
    * projection arithmetic (codegen, no shuffle); the agg is keyed on the
    * bounded bucket id, so map-side partial aggregation collapses each
    * partition to ≤ n_buckets rows before the exchange. */
  def qHistogram(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "lineitem")
      .withColumn("bucket", floor(col("l_extendedprice") / lit(5000.0)).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice"), 2).as("sum_price"))
      .orderBy("bucket")

  /** R16b: INTERSECT — customers active in both 1995 and 2000. */
  def qIntersect(s: SparkSession, sf: String): DataFrame = {
    val o = t(s, sf, "orders")
    o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
      .intersect(o.filter(year(col("o_orderdate")) === 2000).select("o_custkey"))
      .orderBy("o_custkey")
  }

  /** R17a: ranking windows — top-3 customers per segment by balance. */
  def qWindowRank(s: SparkSession, sf: String): DataFrame = {
    val byBal = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    val byBalOnly = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc)
    t(s, sf, "customer")
      .withColumn("rn", row_number().over(byBal).cast("long"))
      .withColumn("rnk", rank().over(byBalOnly).cast("long"))
      .withColumn("drnk", dense_rank().over(byBalOnly).cast("long"))
      .filter(col("rn") <= 3)
      .select("c_mktsegment", "rn", "rnk", "drnk", "c_custkey", "c_acctbal")
      .orderBy("c_mktsegment", "rn")
  }

  /** R7b: the classic 3-way fact/dimension plan (TPC-H Q3 shape): broadcast
    * the filtered dimension, shuffle-join the two facts, aggregate, top-k. */
  def qJoin3Revenue(s: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cust = t(s, sf, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(s, sf, "orders")
      .filter(col("o_orderdate") < to_timestamp(lit("1997-01-01")))
    val li = t(s, sf, "lineitem")
    val revenue = sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
      (lit(1).cast(DecimalType(3, 2)) - col("l_discount").cast(DecimalType(4, 2))))
      .cast("double")
    // SHJ hint: the default SortMergeJoin sorts the fact side — tens of
    // millions of lineitem rows at the x64 octave, n log n in corpus size
    // on fixed cores. Hashing the (filtered, much smaller) orders side is
    // linear and its per-partition build shrinks as reducers scale with a
    // real cluster; measured r16: x64 8.9 -> 3.9 s, x64/x16 4.5x -> 2.4x.
    // Sizing assumption the hint encodes (unlike broadcast, SHJ has no
    // size-based fallback): the build side's per-partition slice —
    // |filtered orders| / spark.sql.shuffle.partitions rows — must fit in
    // executor memory. Partitions here track cores
    // (SPARK_GRAFT_SHUFFLE_PARTITIONS overrides); a cluster run sizes
    // partitions to the date-filtered orders volume, or drops the hint
    // and lets SortMergeJoin spill.
    // The dimension side is NOT hinted: AQE turns the filtered customer
    // join into a broadcast when it measures small (PlanSpec pins this at
    // sf0.1) and keeps a shuffle join when it doesn't — a forced
    // broadcast() of a table-derived frame has no such fallback.
    li.join(ord.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate").cast("date").as("o_date"))
      .agg(revenue.as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** R9b: explode / table-generating projection — one row per token with
    * its position (the Generate operator, oracle-checked via
    * unnest WITH ORDINALITY). */
  def qExplodeTokens(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "documents")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
      .orderBy("doc_id", "pos")

  /** R13b: null-safe equality (`<=>` ≡ IS NOT DISTINCT FROM). */
  def qNullSafeEq(s: SparkSession, sf: String): DataFrame = {
    val o = t(s, sf, "orders")
      .withColumn("maybe_status", nullif(col("o_orderstatus"), lit("O")))
    o.groupBy("o_orderpriority").agg(
      sum(when(col("maybe_status") <=> lit("F"), 1L).otherwise(0L)).as("n_f"),
      sum(when(col("maybe_status") <=> lit(null), 1L).otherwise(0L)).as("n_null_eq"),
      sum(when(col("maybe_status") === lit("F"), 1L).otherwise(0L)).as("n_f_plain"))
      .orderBy("o_orderpriority")
  }

  /** C1: string scalar suite (`langgraph_pipeline.py:481`; cleaning analog
    * `duckdb_util.py:42-48`). */
  def qStringFuncs(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "customer").select(
      col("c_custkey"),
      upper(col("c_name")).as("up_name"),
      lower(col("c_mktsegment")).as("lo_seg"),
      substring(col("c_name"), 1, 8).as("name_prefix"),
      length(col("c_name")).cast("long").as("name_len"),
      concat_ws("-", col("c_mktsegment"), col("c_name")).as("seg_name"),
      regexp_replace(col("c_name"), "Customer", "Cust").as("short_name"),
      when(col("c_name").like("%001%"), 1L).otherwise(0L).as("has_001"))
      .orderBy("c_custkey")

  /** C2: date/time scalar suite (`langgraph_pipeline.py:310`). */
  def qDateFuncs(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "orders").select(
      col("o_orderkey"),
      col("o_orderdate").cast("date").as("d"),
      year(col("o_orderdate")).cast("long").as("yr"),
      month(col("o_orderdate")).cast("long").as("mon"),
      dayofmonth(col("o_orderdate")).cast("long").as("dom"),
      quarter(col("o_orderdate")).cast("long").as("qtr"),
      date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
      datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
        .cast("long").as("days_since_epoch0"),
      date_add(col("o_orderdate").cast("date"), 30).as("d_plus_30"),
      last_day(col("o_orderdate").cast("date")).as("month_end"))
      .orderBy("o_orderkey")

  /** C3: math scalar suite (`langgraph_pipeline.py:922`). */
  def qMathFuncs(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "lineitem")
      .filter(col("l_orderkey") <= 1500)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("disc_price"),
        abs(col("l_discount") - 0.05).as("abs_dev"),
        pow(col("l_quantity"), 2).as("qty_sq"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
        (col("l_orderkey") % 7).as("key_mod7"))
      .orderBy("l_orderkey", "l_linenumber")
}
