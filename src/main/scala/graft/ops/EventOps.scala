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
    t(s, sf, "events").select(
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
