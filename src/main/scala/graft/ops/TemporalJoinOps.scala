package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/** Temporal joins Spark lacks as builtins, in their scalable shapes:
  *
  *  - As-of join: the union+tag+window formulation — ONE shuffle on the key,
  *    linear per partition, no per-key subquery and no inequality-join
  *    fallback to BroadcastNestedLoop. This is the standard distributed
  *    as-of shape (Flink temporal joins and kdb aj resolve the same way).
  *  - Range join: bucketed equi-join — explode each interval into the
  *    fixed-width buckets it covers, join events on (key, bucket), then
  *    apply the residual range predicate. Naive `ts BETWEEN lo AND hi`
  *    joins have no equi-key, so Spark plans a BroadcastNestedLoopJoin —
  *    O(|events| × |intervals|) comparisons; bucketing restores a shuffled
  *    hash join whose cost is O(|events| + matches).
  *
  * Both are oracle-checked: the as-of query against DuckDB's native ASOF
  * JOIN (an independent implementation, not a mirror of this formulation —
  * deterministic here because the events table has no (user, ts) ties at
  * any SF), the range join against a plain inequality join.
  */
object TemporalJoinOps {

  /** As-of join `left` to the most recent `right` row with the same `keys`
    * and `right.tsCol <= left.tsCol`. Right columns surface as
    * `right_<payload>` (null when no prior right row exists — left-join
    * semantics). `orderCol` breaks right-side timestamp ties
    * deterministically (highest wins, matching "latest row" intent). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, orderCol: String, payload: Seq[String]): DataFrame =
    unpack(asofJoinStruct(left, right, keys, tsCol, orderCol, payload),
      "__r", payload).drop("__r")

  /** Explodes struct column `src`'s `fields` as `right_<field>` columns. */
  private def unpack(df: DataFrame, src: String, fields: Seq[String]): DataFrame =
    fields.foldLeft(df) { (d, c) => d.withColumn(s"right_$c", col(s"$src.$c")) }

  /** The as-of core. The matched right row rides as ONE struct column
    * `__r` carried by a single `last(ignoreNulls)` window — per-payload
    * windows would back-fill a legitimately-NULL payload field from an
    * OLDER right row, silently mixing columns of different right rows. The
    * struct is null exactly when no prior right row exists (a right row's
    * struct is never null even if every field is), so null-ness doubles as
    * the row-present flag the blocked variant's carry logic needs. */
  private def asofJoinStruct(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, orderCol: String, payload: Seq[String]): DataFrame = {
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c).copy(name = c)))
    val lu = left.withColumn("__tag", lit(1))
      .withColumn("__r", lit(null).cast(payloadType))
      .withColumn("__ord", lit(null).cast(right.schema(orderCol).dataType))
    val ru = right
      .select((keys ++ Seq(tsCol, orderCol) ++ payload).distinct.map(col): _*)
      .withColumn("__tag", lit(0))
      .withColumn("__ord", col(orderCol))
      .select((keys.map(col) ++ Seq(col(tsCol), col("__tag"), col("__ord"),
        struct(payload.map(col): _*).as("__r"))): _*)
    val unioned = lu.unionByName(ru, allowMissingColumns = true)
    // right rows sort before left rows at equal ts (__tag 0 < 1), so a right
    // row AT the left timestamp is visible — the ASOF `<=` contract; among
    // right ts-ties the highest orderCol sorts last and wins the `last()`
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc, col("__ord").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned.withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1).drop("__tag", "__ord")
  }

  /** Hot-key-safe as-of join: `asofJoin` windows over the whole key
    * partition, so one key with 10⁸ rows serializes into one task. This
    * variant blocks time into `blockSpanUs` ranges and runs two levels —
    * the same decomposition as the ingestion pipeline's two-level chunker:
    *
    *  1. in-block: the union+tag+window pass, partitioned by (key, block) —
    *     parallelism = key × block, bounded by the span choice;
    *  2. cross-block carry: per (key, block) the latest right row is a
    *     one-row summary; a window over the TINY (key, block) spine
    *     prefix-carries the latest summary from all earlier blocks, and
    *     left rows with no in-block match take the carry.
    *
    * An in-block match always beats the carry (it is later than anything in
    * an earlier block), and ts-equal rows share a block, so tie-break
    * semantics are identical to `asofJoin` — TemporalJoinSpec asserts
    * equivalence on randomized multi-block input. */
  def asofJoinBlocked(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, orderCol: String, payload: Seq[String],
      blockSpanUs: Long): DataFrame = {
    val blk = (df: DataFrame) =>
      df.withColumn("__blk", floor(unix_micros(col(tsCol)) / blockSpanUs))
    val keyCols = keys.map(col)
    // level 1: struct-carry asof within (key, block) — __blk rides as a key;
    // __r stays packed so "matched in block" is one null check, not N
    val inBlock = asofJoinStruct(blk(left), blk(right), keys :+ "__blk",
      tsCol, orderCol, payload)
    // level 2: one summary row per (key, block) that HAS right rows — the
    // same struct shape as __r, so the carry can substitute it wholesale
    val summary = blk(right).groupBy((keyCols :+ col("__blk")): _*)
      .agg(max_by(struct(payload.map(col): _*),
        struct(col(tsCol), col(orderCol))).as("__last"))
    // …stitched onto the spine of every (key, block) either side touches
    val spine = blk(left).select((keyCols :+ col("__blk")): _*)
      .union(blk(right).select((keyCols :+ col("__blk")): _*)).distinct()
    val carryW = Window.partitionBy(keyCols: _*).orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = spine.join(summary, keys :+ "__blk", "left")
      .withColumn("__carry", last(col("__last"), ignoreNulls = true).over(carryW))
      .select((keyCols :+ col("__blk") :+ col("__carry")): _*)
    // whole-ROW coalesce: the carry applies only when NO in-block right row
    // matched (__r null) — a matched row with NULL payload fields keeps them
    val stitched = inBlock.join(carry, keys :+ "__blk", "left")
      .withColumn("__m", coalesce(col("__r"), col("__carry")))
    // same column contract as asofJoin: left columns in their original
    // order, then right_<payload> (the key join above moved keys first)
    unpack(stitched, "__m", payload)
      .select((left.columns.map(col) ++ payload.map(c => col(s"right_$c"))): _*)
  }

  /** Click→purchase attribution: each purchase joined to the user's most
    * recent click at-or-before it. Timestamps surface as unix micros
    * (BIGINT — exact in both engines; see Tables.events for the ns story). */
  def qAsofJoin(s: SparkSession, sf: String): DataFrame = {
    val ev = t(s, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    asofJoin(purchases, clicks, Seq("user_id"), "ts", "event_id", Seq("event_id", "ts"))
      .select(
        col("event_id").as("purchase_id"),
        col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("right_event_id").as("click_id"),
        unix_micros(col("right_ts")).as("click_ts_us"),
        (unix_micros(col("ts")) - unix_micros(col("right_ts"))).as("gap_us"))
      .orderBy("purchase_id")
  }

  /** The same attribution query through the hot-key-safe BLOCKED as-of
    * join — semantically identical to `qAsofJoin` (TemporalJoinSpec
    * asserts path equivalence on randomized input), so it shares the
    * DuckDB ASOF JOIN oracle and the driver hash-verifies the blocked
    * decomposition end-to-end, not just property-wise. Day-sized blocks
    * put many blocks in the events range, exercising the cross-block
    * carry, while keeping ts-ties (same microsecond) within one block. */
  def qAsofJoinBlocked(s: SparkSession, sf: String): DataFrame = {
    val ev = t(s, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    asofJoinBlocked(purchases, clicks, Seq("user_id"), "ts", "event_id",
      Seq("event_id", "ts"), blockSpanUs = dayUs)
      .select(
        col("event_id").as("purchase_id"),
        col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("right_event_id").as("click_id"),
        unix_micros(col("right_ts")).as("click_ts_us"),
        (unix_micros(col("ts")) - unix_micros(col("right_ts"))).as("gap_us"))
      .orderBy("purchase_id")
  }

  /** Bucketed range join: `intervals` must carry (keyCol, ivId, startUs,
    * endUs); events join on (keyCol, bucket) where bucket spans
    * `bucketUs` micros, then the exact [startUs, endUs) predicate filters
    * residuals. Intervals explode into ~(len/bucketUs) rows — choose
    * bucketUs near the typical interval length so the blowup is a small
    * constant. */
  def bucketedRangeJoin(events: DataFrame, intervals: DataFrame, keyCol: String,
      tsUsCol: String, bucketUs: Long): DataFrame = {
    val iv = intervals.withColumn("__bucket",
      explode(sequence(floor(col("startUs") / bucketUs),
        floor((col("endUs") - 1) / bucketUs))))
    val evb = events.withColumn("__bucket", floor(col(tsUsCol) / bucketUs))
    evb.join(iv, Seq(keyCol, "__bucket"))
      .filter(col(tsUsCol) >= col("startUs") && col(tsUsCol) < col("endUs"))
      .drop("__bucket")
  }

  private val jan1Us = 1704067200L * 1000000L // 2024-01-01T00:00:00Z
  private val dayUs = 86400L * 1000000L
  private val windowLenUs = 36L * 3600L * 1000000L

  /** Per-type maintenance windows (36 h from Jan 1/8/15/22) × events range
    * join, aggregated per window. Left-join semantics: an empty window
    * still reports n_events = 0. */
  def qRangeJoinWindows(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    val ev = t(s, sf, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("ts_us"), col("value"))
    val days = Seq(1L, 8L, 15L, 22L).toDF("win_day")
    val intervals = ev.select("event_type").distinct()
      .crossJoin(broadcast(days))
      .withColumn("startUs", lit(jan1Us) + (col("win_day") - 1) * dayUs)
      .withColumn("endUs", col("startUs") + windowLenUs)
    val joined = bucketedRangeJoin(ev, intervals, "event_type", "ts_us",
        bucketUs = 6L * 3600L * 1000000L)
      .groupBy("event_type", "win_day")
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 6).as("sum_value"))
    intervals.select("event_type", "win_day")
      .join(joined, Seq("event_type", "win_day"), "left")
      .select(col("event_type"), col("win_day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"), col("sum_value"))
      .orderBy("event_type", "win_day")
  }
}
