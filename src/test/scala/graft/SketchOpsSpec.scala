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

  test("hll union contract: verdicts TRUE, exact counts right, split-independent merge") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val out = SketchOps.qHllUnion(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(2), s"merge_consistent false for ${r.getString(0)}")
      assert(r.getBoolean(3), s"within_3rsd false for ${r.getString(0)}")
    }
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.map(r => r.getString(0) -> r.getLong(1)).toMap == exact)
    // split-independence beyond the query's own two shardings: a THIRD
    // sharding (random-ish key, 31 shards) must merge to the same estimate
    // — the union's register state is a pure function of the value set.
    // (Deliberately NOT compared to the single-pass sketch: one-pass
    // DataSketches HLL carries a HIP estimator that union discards, so
    // single-pass equality only holds in sparse mode.)
    def mergedEst(key: org.apache.spark.sql.Column, n: Int) =
      li.withColumn("shard", pmod(key, lit(n)))
        .groupBy("l_returnflag", "shard")
        .agg(expr("hll_sketch_agg(l_partkey, 12)").as("sk"))
        .groupBy("l_returnflag")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))")
          .cast("long").as("est")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mergedEst(col("l_partkey") + col("l_linenumber"), 31) ==
      mergedEst(col("l_orderkey"), 16),
      "HLL merge is not split-independent")
  }

  test("approx-percentile contract: verdicts TRUE; bound actually binds on the data") {
    val out = SketchOps.qApproxPercentiles(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3),
      s"rank-error verdict false: $r")
    // independent recheck: the raw estimates' exact ranks sit within n/100
    // of the target ranks (recomputed here without the query's arithmetic)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_extendedprice").as("v"))
    val n = li.count()
    val ests = li.agg(expr("approx_percentile(v, array(0.25, 0.5, 0.75), 100)"))
      .head.getSeq[Double](0)
    Seq(0.25, 0.5, 0.75).zip(ests).foreach { case (p, est) =>
      val rLo = li.filter(col("v") < est).count()
      val rHi = li.filter(col("v") <= est).count()
      val lo = p * n - n / 100.0
      val hi = p * n + n / 100.0
      assert(rLo + 1 <= hi + 1e-9 && rHi >= lo - 1e-9,
        s"p=$p est=$est ranks=[${rLo + 1},$rHi] target=[$lo,$hi]")
    }
  }

  test("q_heavy_hitters: threshold column is consistent with the counts") {
    val r = SketchOps.qHeavyHitters(spark, sf).collect()
    assert(r.nonEmpty)
    val thresh = r.head.getAs[Long]("thresh")
    assert(r.forall(_.getAs[Long]("thresh") == thresh))
    assert(r.forall(row => row.getAs[Long]("n") >= thresh))
  }

  test("cm sketch: bounded size, never underestimates ANY token, eps bound") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val toks = docs.select(
      explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
    val sketch = SketchOps.cmSketch(toks)
    // the defining property: the counter table cannot outgrow d·w
    assert(sketch.count() <= 4 * 2048,
      "CM sketch grew beyond its fixed d*w bound")
    // one-sided error on EVERY distinct token, not just the heavy probes
    val exact = toks.groupBy("token").agg(count(lit(1)).as("exact_n"))
    val est = SketchOps.cmEstimate(exact, sketch)
    assert(est.filter(col("est_n") < col("exact_n")).isEmpty,
      "CM must never underestimate")
    // standard Markov bound: overshoot ≤ 2N/w for the vast majority of
    // tokens (prob ≥ 1−(1/2)^d per token; allow a small absolute tail)
    val n = toks.count()
    val eps = 2.0 * n / 2048.0
    val over = est.filter(col("est_n") - col("exact_n") > lit(eps)).count()
    assert(over <= math.max(1L, exact.count() / 20),
      s"too many tokens past the 2N/w bound: $over")
  }

  test("cm join-size estimate: never undershoots, exact side matches a real join") {
    val row = SketchOps.qCmJoinEst(spark, sf).head()
    val exact = row.getAs[Long]("exact_n")
    val est = row.getAs[Long]("est_n")
    assert(row.getAs[Boolean]("overestimate_ok") && est >= exact)
    // the group-count-product formulation must equal the materialized join
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
    val joined = li.join(ord,
      li("l_orderkey") === ord("o_orderkey")).count()
    assert(exact == joined, s"exact side $exact != materialized join $joined")
    // 4 rows of 2048 cells on this key cardinality: overshoot stays tame
    assert(est <= exact * 2, s"estimate $est implausibly loose vs $exact")
    assert(row.getAs[Long]("ratio_pct") >= 100L)
  }

  test("q_cm_sketch: probes are the exact heavy hitters, verdicts all TRUE") {
    val r = SketchOps.qCmSketch(spark, sf).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Boolean]("overestimate_ok")))
    val hh = SketchOps.qHeavyHitters(spark, sf).count()
    assert(r.length.toLong == hh, "probe set must be the heavy-hitter list")
  }
}
