package graft

import org.apache.spark.sql.functions._
import graft.ops.MergeOps

class MergeOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("upsertLatest keeps the highest version per key and admits new keys") {
    val base = Seq((1L, "a", 0L), (2L, "b", 0L)).toDF("k", "v", "version")
    val updates = Seq((2L, "b2", 1L), (3L, "c", 1L)).toDF("k", "v", "version")
    val out = MergeOps.upsertLatest(base, updates, Seq("k"), "version")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out == Map(1L -> ("a", 0L), 2L -> ("b2", 1L), 3L -> ("c", 1L)))
  }

  test("upsertLatest applies the newest of several stacked updates") {
    val base = Seq((1L, "a", 0L)).toDF("k", "v", "version")
    val updates = Seq((1L, "a1", 1L), (1L, "a2", 2L)).toDF("k", "v", "version")
    val out = MergeOps.upsertLatest(base, updates, Seq("k"), "version").head
    assert(out.getString(1) == "a2" && out.getLong(2) == 2L)
  }

  test("dedupAgainstCorpus drops exact-content duplicates only") {
    val corpus = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val incoming = Seq((10L, "alpha"), (11L, "gamma"), (12L, "beta"), (13L, "delta"))
      .toDF("doc_id", "text")
    val kept = MergeOps.dedupAgainstCorpus(incoming, corpus, "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(11L, 13L))
  }

  test("upsertLatest matches a brute-force reference on randomized update stacks") {
    val rnd = new scala.util.Random(7)
    val base = Seq.tabulate(100)(k => (k.toLong, s"base$k", 0L))
    // unique (key, version) pairs — versions are write-monotonic in practice
    val updates = rnd.shuffle(
      (for (k <- 0 until 100; v <- 1 to 4) yield (k.toLong, s"u$k-$v", v.toLong)).toList)
      .filter(_ => rnd.nextBoolean())
    val out = MergeOps.upsertLatest(
      base.toDF("k", "v", "version"), updates.toDF("k", "v", "version"),
      Seq("k"), "version").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val all = base ++ updates
    for (k <- 0 until 100) {
      val expect = all.filter(_._1 == k).maxBy(_._3)
      assert(out(k.toLong) == ((expect._2, expect._3)))
    }
  }

  test("qUpsertMerge: updated keys show version 1, untouched keys version 0") {
    val rows = MergeOps.qUpsertMerge(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val k = r.getAs[Long]("o_orderkey")
      val v = r.getAs[Long]("version")
      val st = r.getAs[String]("o_orderstatus")
      if (k < 0L) assert(v == 1L && st == "N")
      else if (k % 7 == 0) assert(v == 1L && st == "X")
      else assert(v == 0L && st != "X" && st != "N")
    }
  }

  test("bloom-pruned admission equals the exact anti-join on real documents") {
    val docs = graft.ops.Tables.t(spark, sf, "documents")
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    val incoming = docs.filter(col("doc_id") % 5 === 4)
    val exact = MergeOps.dedupAgainstCorpus(incoming, corpus, "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val bloomed = MergeOps.dedupAgainstCorpusBloom(incoming, corpus, "text",
      expectedItems = 10000L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // bloom false positives are cleared by the exact semi-join; false
    // negatives are impossible — results must be identical, not just close
    assert(bloomed == exact && exact.nonEmpty)
  }

  test("connectedComponents resolves chains, cliques, and separate pairs") {
    // chain 1-2-3-4-5 (forces multi-round propagation), triangle 10-11-12,
    // isolated pair 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)).toDF("src", "dst")
    val labels = graft.ops.DedupOps.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the small-graph driver fast path and the distributed fixpoint must
    // agree label for label
    val distributed = graft.ops.DedupOps.connectedComponents(
        edges, driverFastPathMax = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == distributed,
      s"fast path diverges from fixpoint: $labels vs $distributed")
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(labels(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(labels(_) == 10L))
    assert(Seq(20L, 21L).forall(labels(_) == 20L))
  }

  test("connectedComponents converges on a long chain via pointer jumping") {
    // diameter 119 — linear propagation alone would need 119 rounds, far
    // past maxIter=40; pointer jumping from round 8 must close it in
    // ~8 + log2(119) rounds (regression for the 16x-replica bench chain)
    val n = 120
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    val labels = graft.ops.DedupOps.connectedComponents(
        edges, driverFastPathMax = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == n)
    assert((1 to n).forall(i => labels(i.toLong) == 1L))
  }

  test("incrementalComponents equals from-scratch CC on adversarial merge shapes") {
    // old graph: components {1,2,3} (chain), {10,11}, {20,21} (untouched)
    val oldEdges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("src", "dst")
    val prev = graft.ops.DedupOps.connectedComponents(oldEdges)
    // delta: merges the first two old components (3-10), attaches a brand-new
    // node to an old component (11-30), and adds a fully new pair (40-41)
    val delta = Seq((3L, 10L), (11L, 30L), (40L, 41L)).toDF("src", "dst")
    val got = graft.ops.DedupOps.incrementalComponents(prev, delta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = graft.ops.DedupOps.connectedComponents(
        oldEdges.unionByName(delta))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"incremental diverged: got=$got want=$want")
    // and the merged component's label is the true global minimum
    assert(got(30L) == 1L && got(11L) == 1L && got(20L) == 20L && got(41L) == 40L)
  }

  test("incrementalComponents distributed fold equals the driver fast path") {
    // same adversarial shapes, both routes forced: the r15 small-delta
    // driver fast path must be result-identical to the distributed
    // contraction → delta-fixpoint → re-expansion fold
    val oldEdges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("src", "dst")
    val delta = Seq((3L, 10L), (11L, 30L), (40L, 41L)).toDF("src", "dst")
    val prevDist = graft.ops.DedupOps.connectedComponents(
      oldEdges, driverFastPathMax = 0L)
    val gotDist = graft.ops.DedupOps.incrementalComponents(
        prevDist, delta, driverFastPathMax = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prevLocal = graft.ops.DedupOps.connectedComponents(oldEdges)
    val gotFast = graft.ops.DedupOps.incrementalComponents(prevLocal, delta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDist == gotFast, s"routes diverged: dist=$gotDist fast=$gotFast")
    assert(gotFast(30L) == 1L && gotFast(41L) == 40L && gotFast(20L) == 20L)
  }

  test("connectedComponents throws instead of returning truncated labels") {
    // chain 1-2-3-4-5 needs 4 propagation rounds + 1 confirming round;
    // maxIter=3 must fail loudly, not hand back wrong clusters
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      graft.ops.DedupOps.connectedComponents(edges, maxIter = 3,
        driverFastPathMax = 0L)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("connectedComponents frees its persisted blocks when it fails") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    intercept[IllegalStateException] {
      graft.ops.DedupOps.connectedComponents(edges, maxIter = 3,
        driverFastPathMax = 0L)
    }
    // unpersist is async (blocking = false) — poll briefly before failing
    val deadline = System.nanoTime() + 10_000_000_000L
    var leaked = sc.getPersistentRDDs.keySet -- before
    while (leaked.nonEmpty && System.nanoTime() < deadline) {
      Thread.sleep(100)
      leaked = sc.getPersistentRDDs.keySet -- before
    }
    assert(leaked.isEmpty,
      s"non-convergence throw leaked persisted RDDs: $leaked")
  }

  test("qDedupClusters reps are minimal members and clusters are non-trivial") {
    val rows = graft.ops.DedupOps.qDedupClusters(spark, sf).collect()
    // sf0.001 may legitimately have no near-dup pairs; invariants only
    for (r <- rows) {
      assert(r.getAs[Long]("n_members") >= 2L)
      assert(r.getAs[Long]("cluster_rep") < r.getAs[Long]("max_member"))
    }
  }

  test("qDedupIncremental: admitted + dropped = incoming per source") {
    val rows = MergeOps.qDedupIncremental(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getAs[Long]("n_admitted") + r.getAs[Long]("n_dropped") == r.getAs[Long]("n_incoming")))
  }

  test("qSnapshotDiff: statuses match the derivation's modular arithmetic") {
    import org.apache.spark.sql.functions._
    val m = MergeOps.qSnapshotDiff(spark, sf).collect()
      .map(r => r.getAs[String]("status") -> r.getAs[Long]("n")).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def cnt(cond: org.apache.spark.sql.Column): Long = docs.filter(cond).count()
    assert(m("removed") == cnt(col("doc_id") % 11 === 0))
    assert(m("added") == cnt(col("doc_id") % 13 === 5))
    assert(m("changed") == cnt(col("doc_id") % 11 =!= 0 && col("doc_id") % 7 === 3))
    assert(m.getOrElse("unchanged", 0L) ==
      cnt(col("doc_id") % 11 =!= 0 && col("doc_id") % 7 =!= 3))
    assert(m.values.sum == docs.count() + m("added"))
  }

  test("qExpectations: clean source data passes every gate except freshness") {
    val rows = graft.ops.ProfileOps.qExpectations(spark, sf).collect()
      .map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("n_violations"), r.getAs[Long]("n_checked"))).toMap
    assert(rows.keySet == Set("o_custkey_not_null", "o_orderkey_unique",
      "o_orderstatus_enum", "l_quantity_range", "l_discount_range",
      "l_shipdate_recent", "lineitem_orders_fk"))
    val nOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    val nLi = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(rows("o_custkey_not_null") == ((0L, nOrders)))
    assert(rows("o_orderkey_unique") == ((0L, nOrders)))
    assert(rows("lineitem_orders_fk") == ((0L, nLi)))
    assert(rows("l_quantity_range")._1 == 0L && rows("l_discount_range")._1 == 0L)
    // the freshness gate MUST fire on this corpus (ship dates start 1995) —
    // proves the detection path, not just the all-clear path
    assert(rows("l_shipdate_recent")._1 > 0L)
    assert(rows("l_shipdate_recent")._2 == nLi)
  }
}
