package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops._

/** Round-9 window/event/outer-join family: CUBE, FULL OUTER, lag/lead,
  * time-range rolling frame, hopping window, bounded-heap per-group top-k,
  * and incremental aggregate merge. Each test is a structural property or an
  * in-Spark parity check; the DuckDB oracle provides the cross-engine hash
  * gate.
  */
class WindowOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("cube emits all four grouping levels and the grand total matches count(*)") {
    val c = Relational.qCube(spark, sf).cache()
    val levels = c.select("g_flag", "g_status").distinct().count()
    assert(levels == 4, s"expected 4 cube levels, got $levels")
    val grand = c.filter(col("g_flag") === 1 && col("g_status") === 1)
    assert(grand.count() == 1)
    val total = Tables.t(spark, sf, "lineitem").count()
    assert(grand.head.getAs[Long]("n") == total)
    // detail rows match the plain groupBy
    val detail = c.filter(col("g_flag") === 0 && col("g_status") === 0).count()
    val plain = Tables.t(spark, sf, "lineitem")
      .select("l_returnflag", "l_linestatus").distinct().count()
    assert(detail == plain)
    c.unpersist()
  }

  test("full outer covers both years' custkeys; in_both marks the intersection") {
    val f = Relational.qFullOuter(spark, sf).cache()
    val o = Tables.t(spark, sf, "orders")
    def keys(y: Int) =
      o.filter(year(col("o_orderdate")) === y).select("o_custkey").distinct()
    val either = keys(1995).union(keys(1996)).distinct().count()
    assert(f.count() == either)
    val both = keys(1995).intersect(keys(1996)).count()
    assert(f.filter(col("in_both") === 1).count() == both)
    // coalesced zero-fill: no nulls anywhere
    assert(f.filter(col("n_1995").isNull || col("n_1996").isNull).count() == 0)
    f.unpersist()
  }

  test("lag/lead: nulls exactly at partition edges; delta is value - prev") {
    val d = EventOps.qWindowLagLead(spark, sf).cache()
    val users = d.select("user_id").distinct().count()
    assert(d.filter(col("prev_value").isNull).count() == users)
    assert(d.filter(col("next_value").isNull).count() == users)
    assert(d.filter(col("delta_prev").isNotNull &&
      col("delta_prev") =!= col("value") - col("prev_value")).count() == 0)
    d.unpersist()
  }

  test("rolling 1h frame matches a brute-force interval self-count") {
    val r = EventOps.qRollingWindow(spark, sf).cache()
    // brute force: for each row, count events of the same user within
    // (tus - 1h, tus] — RANGE frame includes peers, so <= on both ends
    val e = Tables.events(spark, sf).filter(col("user_id") < 50)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
    val brute = e.as("a").join(e.as("b"), $"a.user_id" === $"b.user_id" &&
        $"b.tus" <= $"a.tus" && $"b.tus" >= $"a.tus" - 3600000000L)
      .groupBy($"a.user_id".as("user_id"), $"a.event_id".as("event_id"))
      .agg(count(lit(1)).as("n_brute"))
    val bad = r.join(brute, Seq("user_id", "event_id"))
      .filter(col("n_1h") =!= col("n_brute")).count()
    assert(bad == 0)
    r.unpersist()
  }

  test("hopping 10m/5m windows count every event exactly twice") {
    val h = EventOps.qHoppingWindow(spark, sf)
    val total = Tables.events(spark, sf).count()
    val windowed = h.agg(sum("n")).head.getLong(0)
    assert(windowed == 2 * total, s"expected ${2 * total}, got $windowed")
  }

  test("bounded-heap per-type top-k equals the window-sort formulation") {
    val heap = EventOps.qTopkPerType(spark, sf)
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").desc, col("event_id").asc)
    val win = Tables.events(spark, sf)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select("event_type", "rnk", "event_id", "value")
      .orderBy("event_type", "rnk")
    assert(heap.collect().toSeq == win.collect().toSeq)
  }

  test("resample grid is dense per user; fill matches a brute-force as-of lookup") {
    val r = EventOps.qResampleFfill(spark, sf).cache()
    val step = 900000000L
    // dense grid: per user, rows == (ge - gs)/step + 1
    val counts = r.groupBy("user_id")
      .agg(count(lit(1)).as("n"), min("grid_us").as("gs"), max("grid_us").as("ge"))
      .filter(col("n") =!= (col("ge") - col("gs")) / step + 1)
    assert(counts.count() == 0)
    // brute force: ffill_event must be the max event_id among events at or
    // before the grid instant with the max tus among those
    val e = Tables.events(spark, sf).filter(col("user_id") < 20)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_id"), col("value"))
    val brute = r.select("user_id", "grid_us").as("g")
      .join(e.as("e"), $"g.user_id" === $"e.user_id" && $"e.tus" <= $"g.grid_us")
      .groupBy($"g.user_id".as("user_id"), $"g.grid_us".as("grid_us"))
      .agg(max(struct(col("tus"), col("event_id"))).as("m"))
      .select(col("user_id"), col("grid_us"), col("m.event_id").as("want_event"))
    val bad = r.join(brute, Seq("user_id", "grid_us"), "left")
      .filter(coalesce(col("ffill_event"), lit(-1L)) =!=
        coalesce(col("want_event"), lit(-1L))).count()
    assert(bad == 0)
    r.unpersist()
  }

  test("table checksum is partition/order independent and change-sensitive") {
    val base = ProfileOps.qTableChecksum(spark, sf).collect().toSeq
    // same data through a different physical layout: identical checksums
    val docs = Tables.t(spark, sf, "documents")
    val shuffledDir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "cksum").toString
    docs.orderBy(rand(7)).repartition(7).write.mode("overwrite")
      .parquet(s"$shuffledDir/documents.parquet")
    val reord = ProfileOps.qTableChecksum(spark, shuffledDir).collect().toSeq
    assert(base == reord)
    // one flipped byte must change that source's xor
    val mutatedDir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "cksum_mut").toString
    docs.withColumn("text",
        when(col("doc_id") === 0, concat(col("text"), lit("!")))
          .otherwise(col("text")))
      .write.mode("overwrite").parquet(s"$mutatedDir/documents.parquet")
    val mut = ProfileOps.qTableChecksum(spark, mutatedDir).collect().toSeq
    assert(base != mut)
    assert(base.size == mut.size) // same sources, different fingerprints
  }

  test("percent_rank/cume_dist: bounds, monotonicity, and exact rank ratios") {
    val d = Relational.qPercentRank(spark, sf).cache()
    assert(d.filter(col("pct_rank") < 0 || col("pct_rank") > 1 ||
      col("cume") <= 0 || col("cume") > 1).count() == 0)
    // with a total order, pct_rank = (rn-1)/(n-1) and cume = rn/n exactly
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    val check = Tables.t(spark, sf, "customer")
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("c_mktsegment")))
      .select(col("c_custkey"),
        ((col("rn") - 1).cast("double") / (col("n") - 1).cast("double")).as("want_pr"),
        (col("rn").cast("double") / col("n").cast("double")).as("want_cd"))
    val bad = d.join(check, Seq("c_custkey"))
      .filter(col("pct_rank") =!= col("want_pr") || col("cume") =!= col("want_cd"))
    assert(bad.count() == 0)
    d.unpersist()
  }

  test("session_window sessions match the lag/gap-flag construction; boundary event starts a new session") {
    import spark.implicits._
    // semantics probe: gap = 30 min; an event exactly 30 min after the
    // previous one must open a NEW session (intervals don't overlap)
    val probe = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:29:59"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:59:59"), 1.0), // merges (gap-1s)
      (1L, java.sql.Timestamp.valueOf("2024-01-01 01:29:59"), 1.0), // merges
      (1L, java.sql.Timestamp.valueOf("2024-01-01 01:59:59"), 1.0), // merges
      (1L, java.sql.Timestamp.valueOf("2024-01-01 02:30:00"), 1.0)  // exactly gap -> new
    ).toDF("user_id", "ts", "value")
    val sessions = probe
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("n")).orderBy(col("n").desc).as[Long].collect().toSeq
    assert(sessions == Seq(5L, 1L), s"got $sessions")
    // full-table parity: operator vs the lag/flag/cumsum formulation
    val got = EventOps.qSessionWindow(spark, sf)
    val e = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("value"))
    val pw = Window.partitionBy("user_id").orderBy("tus")
    val flagged = e.withColumn("new_s",
      when(lag(col("tus"), 1).over(pw).isNull ||
        col("tus") - lag(col("tus"), 1).over(pw) >= 1800000000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        pw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val want = flagged.groupBy("user_id", "sid")
      .agg(min("tus").as("session_start_us"),
        (max(col("tus")) + 1800000000L).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("sum_value"))
      .select("user_id", "session_start_us", "session_end_us", "n_events", "sum_value")
      .orderBy("user_id", "session_start_us")
    assert(got.collect().toSeq == want.collect().toSeq)
  }

  test("event transitions: per-user bigram counts conserve events") {
    val tr = EventOps.qEventTransitions(spark, sf)
    val e = Tables.events(spark, sf)
    val totalEvents = e.count()
    val users = e.select("user_id").distinct().count()
    // each user with k events contributes exactly k-1 transitions
    assert(tr.agg(sum("n")).head.getLong(0) == totalEvents - users)
    assert(tr.filter(col("n_users") > col("n")).count() == 0)
  }

  test("retention cohorts: offset-0 row counts the full cohort") {
    val r = EventOps.qRetentionCohorts(spark, sf).cache()
    assert(r.filter(col("day_offset") < 0).count() == 0)
    // every user is active on their first day, so offset-0 per cohort must
    // equal the number of users whose first day is that cohort day
    val day = 86400000000L
    val e = Tables.events(spark, sf).select(col("user_id"),
      (unix_micros(col("ts")) - pmod(unix_micros(col("ts")), lit(day)))
        .divide(lit(day)).cast("long").as("d"))
    val cohortSizes = e.groupBy("user_id").agg(min("d").as("cohort_d"))
      .groupBy("cohort_d").agg(countDistinct("user_id").as("want"))
    val bad = r.filter(col("day_offset") === 0)
      .join(cohortSizes, Seq("cohort_d"), "full_outer")
      .filter(coalesce(col("n_users"), lit(-1L)) =!= coalesce(col("want"), lit(-2L)))
    assert(bad.count() == 0)
    r.unpersist()
  }

  test("unpivot emits 4 metric rows per input row and round-trips the values") {
    val up = Relational.qUnpivot(spark, sf).cache()
    val base = Tables.t(spark, sf, "lineitem").filter(col("l_orderkey") <= 1500)
    assert(up.count() == 4 * base.count())
    // melt must preserve the exact (key, value) multiset — (l_orderkey,
    // l_linenumber) is NOT unique, so compare with multiset except, not a
    // key join
    val qty = up.filter(col("metric") === "l_quantity")
      .select(col("l_orderkey"), col("l_linenumber"), col("value"))
    val want = base.select(col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").as("value"))
    assert(qty.exceptAll(want).count() == 0)
    assert(want.exceptAll(qty).count() == 0)
    up.unpersist()
  }

  test("regex suite: masked length preserves non-digit count; extracts are prefixes of text") {
    val r = Relational.qRegexFuncs(spark, sf)
    val joined = r.join(
      Tables.t(spark, sf, "documents").select("doc_id", "text"), Seq("doc_id"))
    // global digit masking never changes the string length
    assert(joined.filter(col("len_masked") =!= length(col("text"))).count() == 0)
    // any extracted number must literally occur in the text
    assert(joined.filter(col("first_num") =!= "" &&
      !col("text").contains(col("first_num"))).count() == 0)
  }

  test("array HOF suite: distinct <= size, filter <= size, fold equals token lengths") {
    val a = Relational.qArrayFuncs(spark, sf)
    assert(a.filter(col("n_distinct") > col("n_toks") ||
      col("n_long") > col("n_toks")).count() == 0)
    // fold check against an independent formulation: sum of token lengths
    // == total non-space chars of the normalized text
    val docs = Tables.t(spark, sf, "documents").select(col("doc_id"),
      length(regexp_replace(trim(lower(col("text"))), "\\s+", ""))
        .cast("long").as("want"))
    assert(a.join(docs, Seq("doc_id"))
      .filter(col("sum_len") =!= col("want")).count() == 0)
  }

  test("incremental state+delta merge equals from-scratch aggregation") {
    import org.apache.spark.sql.types.DecimalType
    val merged = MergeOps.qIncrAggMerge(spark, sf)
    val full = Tables.events(spark, sf)
      .select(col("event_type"), col("value").cast(DecimalType(18, 6)).as("v"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("v")).cast("double").as("sum_value"),
        min(col("v")).cast("double").as("min_value"),
        max(col("v")).cast("double").as("max_value"))
      .orderBy("event_type")
    assert(merged.collect().toSeq == full.collect().toSeq)
  }
}
