package graft

import org.apache.spark.sql.functions._
import graft.ops.TemporalJoinOps

class TemporalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("asofJoin picks the latest right row at-or-before each left row") {
    val left = Seq((10L, 1L, ts(100)), (11L, 1L, ts(200)), (12L, 2L, ts(50)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((1L, 1L, ts(90)), (2L, 1L, ts(150)), (3L, 1L, ts(201)), (4L, 2L, ts(60)))
      .toDF("event_id", "user_id", "ts")
    val out = TemporalJoinOps.asofJoin(left, right, Seq("user_id"), "ts", "event_id", Seq("event_id"))
      .select("event_id", "right_event_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(out(10L) == Some(1L))  // ts 100 → click at 90, not 150
    assert(out(11L) == Some(2L))  // ts 200 → click at 150, not 201
    assert(out(12L) == None)      // user 2's only click is AFTER → unmatched
  }

  test("asofJoin includes a right row at exactly the left timestamp") {
    val left = Seq((10L, 1L, ts(100))).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, 1L, ts(100))).toDF("event_id", "user_id", "ts")
    val out = TemporalJoinOps.asofJoin(left, right, Seq("user_id"), "ts", "event_id", Seq("event_id"))
    assert(out.select("right_event_id").head.getLong(0) == 1L)
  }

  test("asofJoin breaks right-side timestamp ties by highest orderCol") {
    val left = Seq((10L, 1L, ts(100))).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, 1L, ts(90)), (5L, 1L, ts(90))).toDF("event_id", "user_id", "ts")
    val out = TemporalJoinOps.asofJoin(left, right, Seq("user_id"), "ts", "event_id", Seq("event_id"))
    assert(out.select("right_event_id").head.getLong(0) == 5L)
  }

  test("asofJoin carries multiple payload columns including the right ts") {
    val left = Seq((10L, 1L, ts(100))).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, 1L, ts(90))).toDF("event_id", "user_id", "ts")
    val out = TemporalJoinOps.asofJoin(left, right, Seq("user_id"), "ts", "event_id",
      Seq("event_id", "ts")).head
    assert(out.getAs[Long]("right_event_id") == 1L)
    assert(out.getAs[java.sql.Timestamp]("right_ts") == ts(90))
    assert(out.getAs[java.sql.Timestamp]("ts") == ts(100)) // left ts untouched
  }

  test("asofJoin keeps a matched row's NULL payload fields (no cross-row mixing)") {
    // right row at 150 has v = NULL; a per-column carry would back-fill it
    // from the older row at 90, mixing fields of two different right rows
    val left = Seq((10L, 1L, ts(200))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, 1L, ts(90), Option("old")),
      (2L, 1L, ts(150), None: Option[String]))
      .toDF("event_id", "user_id", "ts", "v")
    val out = TemporalJoinOps.asofJoin(left, right, Seq("user_id"), "ts",
      "event_id", Seq("event_id", "v")).head
    assert(out.getAs[Long]("right_event_id") == 2L)
    assert(out.isNullAt(out.fieldIndex("right_v")),
      "NULL payload of the matched row was back-filled from an older row")
    // blocked variant: same contract when the match and the NULL are in-block
    // and a non-null candidate sits in an EARLIER block (the carry)
    val outB = TemporalJoinOps.asofJoinBlocked(left, right, Seq("user_id"), "ts",
      "event_id", Seq("event_id", "v"), blockSpanUs = 100L * 1000000L).head
    assert(outB.getAs[Long]("right_event_id") == 2L)
    assert(outB.isNullAt(outB.fieldIndex("right_v")),
      "blocked variant substituted the cross-block carry for an in-block NULL")
  }

  test("bucketedRangeJoin matches an inequality join and plans no nested loop") {
    val ev = Seq(
      ("a", 100L * 1000000L, 1.0), ("a", 500L * 1000000L, 2.0),
      ("b", 100L * 1000000L, 3.0), ("a", 1000L * 1000000L, 4.0))
      .toDF("event_type", "ts_us", "value")
    val iv = Seq(("a", 1L, 0L, 600L * 1000000L), ("b", 2L, 200L * 1000000L, 900L * 1000000L))
      .toDF("event_type", "ivId", "startUs", "endUs")
    val joined = TemporalJoinOps.bucketedRangeJoin(ev, iv, "event_type", "ts_us",
      bucketUs = 300L * 1000000L)
    val got = joined.select("event_type", "ivId", "ts_us").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // interval a covers ts 100 and 500 (not 1000); interval b covers nothing (b@100 < 200)
    assert(got == Set(("a", 1L, 100L * 1000000L), ("a", 1L, 500L * 1000000L)))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
  }

  test("qRangeJoinWindows reports empty windows as zero, not missing") {
    // all 20 (event_type × win_day) combinations must be present at sf0.001
    val out = TemporalJoinOps.qRangeJoinWindows(spark, sf)
    val rows = out.collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getAs[Long]("n_events") >= 0L))
  }

  test("asofJoin matches a brute-force reference on randomized ties-heavy input") {
    val rnd = new scala.util.Random(42)
    // narrow ts range forces key+ts collisions → exercises the tie-break path
    val left = Seq.tabulate(300)(i => (i.toLong, rnd.nextInt(8).toLong, ts(rnd.nextInt(60).toLong)))
    val right = Seq.tabulate(300)(i => (1000L + i, rnd.nextInt(8).toLong, ts(rnd.nextInt(60).toLong)))
    val out = TemporalJoinOps.asofJoin(
      left.toDF("event_id", "user_id", "ts"), right.toDF("event_id", "user_id", "ts"),
      Seq("user_id"), "ts", "event_id", Seq("event_id")).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    for ((lid, key, lts) <- left) {
      val expect = right.filter(r => r._2 == key && !r._3.after(lts))
        .sortBy(r => (r._3.getTime, r._1)).lastOption.map(_._1)
      assert(out(lid) == expect, s"left $lid key=$key ts=$lts: got ${out(lid)}, want $expect")
    }
  }

  test("randomized nullable payloads: both variants match brute force row-wise") {
    val rnd = new scala.util.Random(7)
    val left = Seq.tabulate(200)(i => (i.toLong, rnd.nextInt(6).toLong, ts(rnd.nextInt(60).toLong)))
    val right = Seq.tabulate(200)(i => (1000L + i, rnd.nextInt(6).toLong,
      ts(rnd.nextInt(60).toLong),
      if (rnd.nextInt(10) < 3) None else Some(s"v$i"))) // ~30% NULL payloads
    val ldf = left.toDF("event_id", "user_id", "ts")
    val rdf = right.toDF("event_id", "user_id", "ts", "v")
    def check(out: Array[org.apache.spark.sql.Row]): Unit = {
      val got = out.map(r => r.getAs[Long]("event_id") ->
        (Option(r.get(r.fieldIndex("right_event_id"))).map(_.asInstanceOf[Long]),
          Option(r.getString(r.fieldIndex("right_v"))))).toMap
      for ((lid, key, lts) <- left) {
        val m = right.filter(r => r._2 == key && !r._3.after(lts))
          .sortBy(r => (r._3.getTime, r._1)).lastOption
        // right_event_id AND right_v must come from the SAME matched row —
        // a NULL v stays NULL even when an older row had a value
        assert(got(lid) == ((m.map(_._1), m.flatMap(_._4))),
          s"left $lid: got ${got(lid)}, want $m")
      }
    }
    check(TemporalJoinOps.asofJoin(ldf, rdf, Seq("user_id"), "ts", "event_id",
      Seq("event_id", "v")).collect())
    check(TemporalJoinOps.asofJoinBlocked(ldf, rdf, Seq("user_id"), "ts", "event_id",
      Seq("event_id", "v"), blockSpanUs = 10L * 1000000L).collect())
  }

  test("asofJoinBlocked is equivalent to asofJoin on randomized multi-block input") {
    val rnd = new scala.util.Random(99)
    // span 10 s → ts range 0..60 s crosses ~6 blocks; carries must fire
    val left = Seq.tabulate(300)(i => (i.toLong, rnd.nextInt(6).toLong, ts(rnd.nextInt(60).toLong)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq.tabulate(200)(i => (1000L + i, rnd.nextInt(6).toLong, ts(rnd.nextInt(60).toLong)))
      .toDF("event_id", "user_id", "ts")
    val plain = TemporalJoinOps.asofJoin(left, right,
      Seq("user_id"), "ts", "event_id", Seq("event_id", "ts"))
      .select("event_id", "right_event_id", "right_ts")
    val blocked = TemporalJoinOps.asofJoinBlocked(left, right,
      Seq("user_id"), "ts", "event_id", Seq("event_id", "ts"),
      blockSpanUs = 10L * 1000000L)
      .select("event_id", "right_event_id", "right_ts")
    assert(blocked.except(plain).count() == 0 && plain.except(blocked).count() == 0)
    // the expensive window really is per (key, block): partition spec mentions __blk
    val winSpecs = blocked.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winSpecs.exists(_.contains("__blk")),
      "in-block window should partition by (key, __blk)")
  }

  test("qAsofJoin output is sorted, typed, and attribution gaps are non-negative") {
    val out = TemporalJoinOps.qAsofJoin(spark, sf).collect()
    assert(out.nonEmpty)
    val matched = out.filter(!_.isNullAt(5))
    assert(matched.nonEmpty)
    assert(matched.forall(_.getAs[Long]("gap_us") >= 0L))
    val ids = out.map(_.getAs[Long]("purchase_id"))
    assert(ids.sameElements(ids.sorted))
  }
}
