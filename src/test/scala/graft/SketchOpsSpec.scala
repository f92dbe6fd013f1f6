package graft

import org.apache.spark.sql.functions._
import graft.ops.SketchOps

/** Heavy-hitter invariants: the Misra–Gries two-pass formulation must be
  * indistinguishable from the exact shuffle, and the candidate stage must
  * honor the frequency guarantee that makes the composition exact.
  */
class SketchOpsSpec extends SparkTestBase {

  test("heavy hitters: Misra-Gries two-pass equals the exact formulation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val exact = SketchOps.heavyHittersExact(docs, "text")
    val mg = SketchOps.heavyHittersMG(docs, "text")
    assert(exact.count() > 0, "threshold selects nothing at spec scale")
    assert(exact.exceptAll(mg).isEmpty && mg.exceptAll(exact).isEmpty)
  }

  test("MG candidates contain every token with global frequency > N/k") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val toks = docs.select(
      explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
    val k = 64 // deliberately tight so the guarantee is actually exercised
    val cand = SketchOps.mgCandidates(toks.as[String], k)
      .toDF("token").distinct()
    val n = toks.count()
    val mustSurvive = toks.groupBy("token").count()
      .filter(col("count") > lit(n / k))
    assert(mustSurvive.count() > 0, "no token above N/k — pick a smaller k")
    val missed = mustSurvive.join(cand, Seq("token"), "left_anti")
    assert(missed.isEmpty,
      s"guaranteed-frequent tokens missing from candidates: ${missed.count()}")
  }

  test("hll union: shard-merge equals single-pass; estimate within 5% of exact") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val merged = SketchOps.qHllUnion(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // single-pass sketch over the whole group — identical register state,
    // so the estimate must match the shard-merged one EXACTLY
    val single = li.groupBy("l_returnflag")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 12))")
        .cast("long").as("approx_parts")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == single,
      s"shard-merged HLL diverges from single-pass: $merged vs $single")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, est) <- merged) {
      val err = math.abs(est.toDouble - exact(k)) / exact(k).max(1L)
      assert(err < 0.05, s"HLL estimate for $k off by ${err * 100}%")
    }
  }

  test("q_heavy_hitters: threshold column is consistent with the counts") {
    val r = SketchOps.qHeavyHitters(spark, sf).collect()
    assert(r.nonEmpty)
    val thresh = r.head.getAs[Long]("thresh")
    assert(r.forall(_.getAs[Long]("thresh") == thresh))
    assert(r.forall(row => row.getAs[Long]("n") >= thresh))
  }
}
