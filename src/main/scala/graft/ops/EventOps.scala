package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Event-table operators: JSON extraction over the `props` column, tumbling
  * time windows, gap-based sessionization, running sums. The reference has no
  * streaming (SURVEY §2e); these are the batch-equivalent formulations, with
  * Structured Streaming variants in `graft.streaming`.
  */
object EventOps {

  /** C4: JSON extraction (`props` is a JSON string; the reference serializes
    * result frames to JSON — `langgraph_pipeline.py:31-37`). */
  def qJsonExtract(s: SparkSession, sf: String): DataFrame =
    // tWide: the JSON parse is per-row scan-stage work over a one-row-group
    // file — widen so it parses cores-wide (see Tables.tWide)
    tWide(s, sf, "events").select(
      col("event_id"),
      col("event_type"),
      get_json_object(col("props"), "$.k").as("k_str"),
      get_json_object(col("props"), "$.k").cast("long").as("k_val"))
      .orderBy("event_id")

  /** E1: tumbling 1-hour window aggregate via Spark's `window()` —
    * batch-equivalent of a streaming windowed agg (SURVEY §2e). */
  def qTumblingWindow(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour_start", "event_type")

  /** E2: gap sessionization — a >30-min silence starts a new session
    * (lag window; SURVEY §2e `q_session_like_gap`). */
  def qSessionLikeGap(s: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    t(s, sf, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          (col("ts").cast("double") - col("prev_ts").cast("double")) > 1800.0, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum(col("new_sess")).as("n_sessions"))
      .orderBy("user_id")
  }

  /** R17b: running sum per user (frame-ordered; decimal-exact so the
    * window-aggregation order can't perturb the result). */
  def qWindowRunningSum(s: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, sf, "events")
      .filter(col("user_id") < 50)
      .select(col("user_id"), col("event_id"), col("value"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .over(w).cast("double").as("run_sum"))
      .orderBy("user_id", "event_id")
  }

  /** R17c: lag/lead navigation — previous/next value per user in event
    * order, plus the step delta. The values are MOVED, not combined (a
    * single IEEE double subtraction for the delta), so raw doubles
    * hash-match the oracle bit-for-bit with no decimal detour. Windows are
    * user-partitioned: every partition evaluates independently, no global
    * sort. */
  def qWindowLagLead(s: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    t(s, sf, "events").filter(col("user_id") < 30)
      .select(col("user_id"), col("event_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta_prev"))
      .orderBy("user_id", "event_id")
  }

  /** R17d: time-range rolling aggregate — trailing 1-hour event count and
    * decimal-exact sum per user (`RANGE BETWEEN` on integer micros, so
    * frame membership is exact integer comparison in both engines and tied
    * timestamps are peers in both). Partitioned by user: each user's
    * timeline sorts and frames locally; nothing global. The streaming
    * sibling is the watermarked sliding window in
    * `graft.streaming.EventStream`. */
  def qRollingWindow(s: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tus")
      .rangeBetween(-3600000000L, 0L)
    t(s, sf, "events").filter(col("user_id") < 50)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tus"), col("value"))
      .select(col("user_id"), col("event_id"), col("tus"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .over(w).cast("double").as("sum_1h"))
      .orderBy("user_id", "event_id")
  }

  /** E1b: hopping (sliding) window — 10-minute windows every 5 minutes via
    * Spark's `window(ts, size, slide)`. Each event lands in exactly
    * size/slide = 2 windows; Catalyst expands the row 2× then hash-
    * aggregates on (window, type) — one scan, one bounded-key shuffle.
    * Window starts are epoch-aligned multiples of the slide, which the
    * oracle reproduces with pure integer µs arithmetic. */
  def qHoppingWindow(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "events")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")

  /** R12b: per-group top-k WITHOUT a window sort — top-3 events per type by
    * (value DESC, event_id ASC) through the bounded-heap `TopKByScore`
    * Aggregator: partial buffers of ≤ k rows, O(n log k) per task, and the
    * shuffle carries k rows per (type × map task) instead of every event —
    * the shape that survives a 100 TB scan where
    * `row_number().over(Window)` would sort whole partitions. The tiny
    * type dimension gets dense integer labels (broadcast both ways); the
    * oracle is the window formulation, which TopKSpec proves identical. */
  def qTopkPerType(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    val e = t(s, sf, "events")
    val dim = e.select("event_type").distinct()
      .withColumn("label",
        row_number().over(Window.orderBy("event_type")).cast("int"))
    val scored = e.join(broadcast(dim), Seq("event_type"))
      .select(col("label"), col("event_id").as("id"), col("value").as("score"))
      .as[graft.functions.LabeledScore]
    scored.groupByKey(_.label)
      .agg(new graft.functions.TopKByScore(3).toColumn.name("hits"))
      .toDF("label", "hits")
      .join(broadcast(dim), "label")
      .select(col("event_type"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("event_type"), (col("pos") + 1).cast("long").as("rnk"),
        col("hit.id").as("event_id"), col("hit.score").as("value"))
      .orderBy("event_type", "rnk")
  }

  /** E2b: native gap sessionization via `session_window(ts, gap)` — the
    * operator form of `qSessionLikeGap`'s lag/flag/sum construction, and
    * the one that runs unchanged on a stream (session state merges under
    * the watermark). Semantics: each event opens [ts, ts+gap); overlapping
    * windows merge, so an event at exactly prev+gap starts a NEW session —
    * the oracle reproduces that with a `>= gap` flag over integer micros.
    * Session boundaries are decided inside each user's partition; the only
    * shuffle is the (user, merged-window) agg. */
  def qSessionWindow(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 6).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start_us")

  /** E4: event-transition matrix — per-user consecutive (prev_type → type)
    * bigram counts, the edge list behind funnels/Sankey flow views. One
    * user-partitioned lag window (partition-local), then an aggregation
    * keyed on the BOUNDED (from, to) type pairs — map-side partials
    * collapse each task to ≤ |types|² rows before the exchange, so the
    * shuffle is O(types²·tasks) regardless of event volume. */
  def qEventTransitions(s: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    t(s, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy("from_type", "to_type")
  }

  /** E5: retention cohorts — users grouped by their first-activity day,
    * counted on each subsequent day offset they return (the standard
    * triangular retention matrix). Day arithmetic is integer µs → epoch
    * days (engine-exact); the plan is two user-keyed aggs (first day, then
    * distinct active days) and a final bounded (cohort × offset) agg —
    * shuffles carry users and day pairs, never raw events. */
  def qRetentionCohorts(s: SparkSession, sf: String): DataFrame = {
    val day = 86400000000L
    val e = t(s, sf, "events")
      .select(col("user_id"),
        (unix_micros(col("ts")) - pmod(unix_micros(col("ts")), lit(day)))
          .divide(lit(day)).cast("long").as("d"))
    val firstDay = e.groupBy("user_id").agg(min("d").as("cohort_d"))
    e.distinct()
      .join(firstDay, Seq("user_id"))
      .groupBy(col("cohort_d"), (col("d") - col("cohort_d")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_d", "day_offset")
  }

  /** X41: time-series resample + forward fill (last observation carried
    * forward) — regularize each user's irregular event stream onto a
    * 15-minute grid, carrying the latest (value, event_id) at or before
    * each grid instant. The grid is generated per user from integer-µs
    * bounds (`sequence` of longs — no timestamp arithmetic to diverge),
    * and the fill is the union+tag+running-`last` formulation shared with
    * the as-of join (ops/TemporalJoinOps.scala): ONE user-keyed shuffle
    * sorts grid and observation rows together, so filling is linear per
    * partition — never a grid×events join. Grid rows order AFTER
    * observations at the same instant (is_grid tiebreak), so an event
    * exactly on a boundary is visible to that grid point in both engines. */
  def qResampleFfill(s: SparkSession, sf: String): DataFrame = {
    val step = 900000000L // 15 min in µs
    val e = t(s, sf, "events").filter(col("user_id") < 20)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_id"), col("value"))
    val grid = e.groupBy("user_id")
      .agg(min("tus").as("mn"), max("tus").as("mx"))
      .select(col("user_id"), explode(sequence(
        col("mn") - pmod(col("mn"), lit(step)),
        col("mx") - pmod(col("mx"), lit(step)),
        lit(step))).as("tus"))
      .select(col("user_id"), col("tus"), lit(1).as("is_grid"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("double").as("value"))
    val obs = e.select(col("user_id"), col("tus"), lit(0).as("is_grid"),
      col("event_id"), col("value"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("tus"), col("is_grid"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.unionByName(obs)
      .withColumn("ffill_value", last(col("value"), ignoreNulls = true).over(w))
      .withColumn("ffill_event", last(col("event_id"), ignoreNulls = true).over(w))
      .filter(col("is_grid") === 1)
      .select(col("user_id"), col("tus").as("grid_us"),
        col("ffill_event"), col("ffill_value"))
      .orderBy("user_id", "grid_us")
  }

  /** E3: ordered funnel — view → click → purchase per user, each stage
    * timestamped by the EARLIEST qualifying event STRICTLY AFTER the prior
    * stage (min-ts chaining, the standard product-analytics funnel).
    * Three aggregations keyed on user_id plus two equi-joins on the same
    * key — work is linear in events and shuffles only on user_id, never
    * event×event. Timestamps compare as exact integer micros
    * (`unix_micros`) so the µs-truncating events reader (Tables.events)
    * and a ns-native oracle agree bit-for-bit. */
  def qFunnelSteps(s: SparkSession, sf: String): DataFrame = {
    val e = t(s, sf, "events").select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("tus"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("tus")).as("t_view_us"))
    val c = e.filter(col("event_type") === "click").join(v, Seq("user_id"))
      .filter(col("tus") > col("t_view_us"))
      .groupBy("user_id").agg(min(col("tus")).as("t_click_us"))
    val p = e.filter(col("event_type") === "purchase").join(c, Seq("user_id"))
      .filter(col("tus") > col("t_click_us"))
      .groupBy("user_id").agg(min(col("tus")).as("t_purchase_us"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view_us"), col("t_click_us"),
        col("t_purchase_us"),
        (lit(1L) + when(col("t_click_us").isNotNull, 1L).otherwise(0L)
          + when(col("t_purchase_us").isNotNull, 1L).otherwise(0L)).as("stage"))
      .orderBy("user_id")
  }
}
