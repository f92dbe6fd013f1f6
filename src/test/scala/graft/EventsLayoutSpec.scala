package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Guards `Tables.events` against testdata layout drift: the driver has
  * shipped `events.ts` both as int64 TIMESTAMP(NANOS) and as plain
  * TIMESTAMP_MICROS, and a refresh that flips the layout must not zero the
  * events family again. Writes one fixture per layout from the same logical
  * rows and asserts the reader produces identical results for all of them.
  */
class EventsLayoutSpec extends SparkTestBase {

  private def tmp(): String = {
    val d = Files.createTempDirectory("graft-events-layout").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  /** Canonical logical rows: micros-since-epoch instants. */
  private def base() = {
    import spark.implicits._
    Seq(
      (1L, 1704067200123456L, 10L, "click", 1.5, """{"k": 1}"""),
      (2L, 1704067260654321L, 11L, "view", 2.5, """{"k": 2}"""),
      (3L, 1704067320000789L, 10L, "purchase", 9.0, """{"k": 3}"""))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
  }

  test("Tables.events reads ns-long, timestamp, and timestamp_ntz layouts identically") {
    val root = tmp()
    val b = base()

    // layout A: raw int64 ts (what the nanosAsLong read of TIMESTAMP(NANOS)
    // data yields — the reader's LongType branch treats the value as nanos)
    val nsDir = s"$root/ns"
    b.withColumn("ts", col("ts_us") * 1000L).drop("ts_us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$nsDir/events.parquet")

    // layout B: TIMESTAMP_MICROS with isAdjustedToUTC=false (NTZ) — the
    // refreshed driver testdata layout
    val ntzDir = s"$root/ntz"
    b.withColumn("ts", timestamp_micros(col("ts_us")).cast(TimestampNTZType)).drop("ts_us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$ntzDir/events.parquet")

    // layout C: session-zone TimestampType (isAdjustedToUTC=true)
    val tzDir = s"$root/tz"
    b.withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tzDir/events.parquet")

    val reads = Seq(nsDir, ntzDir, tzDir).map { d =>
      val ev = graft.ops.Tables.events(spark, d)
      assert(ev.schema("ts").dataType == TimestampType, s"layout at $d")
      assert(ev.columns.toSeq ==
        Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
      ev.withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
        .orderBy("event_id").collect().toSeq
    }
    assert(reads(0) == reads(1), "ns vs ntz layouts diverge")
    assert(reads(0) == reads(2), "ns vs tz layouts diverge")
    assert(reads(0).map(_.getLong(reads(0).head.fieldIndex("ts_us"))) ==
      Seq(1704067200123456L, 1704067260654321L, 1704067320000789L))
  }

  test("streaming reader matches the batch reader on both layouts") {
    val root = tmp()
    val b = base()
    val nsDir = s"$root/ns"
    b.withColumn("ts", col("ts_us") * 1000L).drop("ts_us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$nsDir/events.parquet")
    val ntzDir = s"$root/ntz"
    b.withColumn("ts", timestamp_micros(col("ts_us")).cast(TimestampNTZType)).drop("ts_us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$ntzDir/events.parquet")

    Seq(nsDir, ntzDir).foreach { d =>
      val stream = graft.streaming.EventStream
        .readEventsStream(spark, s"$d/events.parquet")
      assert(stream.isStreaming)
      assert(stream.schema("ts").dataType == TimestampType)
      val got = stream.writeStream.format("memory")
        .queryName(s"events_layout_${d.split('/').last}")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      val q = got.start()
      q.awaitTermination()
      val rows = spark.table(s"events_layout_${d.split('/').last}")
        .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
        .orderBy("event_id").collect().toSeq
      val batch = graft.ops.Tables.events(spark, d)
        .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
        .orderBy("event_id").collect().toSeq
      assert(rows == batch, s"stream vs batch diverge on layout $d")
    }
  }
}
