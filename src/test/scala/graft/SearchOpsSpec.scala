package graft

import org.apache.spark.sql.functions._
import graft.ops.SearchOps

/** Lexical retrieval + statistical text models (X19-X22). Oracle parity is
  * the driver's job; these specs lock the ranking/model invariants that an
  * oracle hash can't articulate. */
class SearchOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("search_docs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("bm25: higher tf on a query term ranks the doc higher, all else equal") {
    val filler = "pad pad pad pad pad"
    val dir = writeDocs(Seq(
      (1L, s"vector vector vector $filler", "en", "s0", 1L),
      (2L, s"vector pad pad $filler", "en", "s0", 1L),
      (3L, s"$filler pad pad pad", "en", "s0", 1L))) // no query term at all
    val out = SearchOps.qBm25Topk(spark, dir).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L),
      "doc with tf=3 outranks tf=1; doc without query terms absent")
    assert(out.forall(_.getAs[Long]("bm25_e6") > 0L))
  }

  test("bm25: longer documents are penalized at equal tf (length normalization)") {
    val dir = writeDocs(Seq(
      (1L, "vector pad", "en", "s0", 1L),
      (2L, "vector " + Seq.fill(40)("pad").mkString(" "), "en", "s0", 1L)))
    val scores = SearchOps.qBm25Topk(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bm25_e6")).toMap
    assert(scores(1L) > scores(2L))
  }

  test("bm25: rarer term carries a larger idf contribution than a ubiquitous one") {
    // "vector" appears in 1 of 6 docs; "join" in all 6 — same tf, same dl
    val docs = (1L to 5L).map(i => (i, "join pad pad pad", "en", "s0", 1L)) :+
      ((6L, "join pad pad pad", "en", "s0", 1L))
    val dir = writeDocs(docs :+ ((7L, "vector pad pad pad", "en", "s0", 1L))
      :+ ((8L, "join pad pad pad", "en", "s0", 1L)))
    val perTerm = SearchOps.bm25Scores(spark, dir, Seq("vector"))
      .collect().head.getAs[Long]("bm25_e6")
    val common = SearchOps.bm25Scores(spark, dir, Seq("join"))
      .collect().map(_.getAs[Long]("bm25_e6")).max
    assert(perTerm > common, s"rare-term score $perTerm should beat common-term $common")
  }

  test("hybrid rrf: fused score is bounded by 2/(K+1) and ids are unique") {
    val out = SearchOps.qHybridRrf(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 15)
    val ids = out.map(_.getAs[Long]("id"))
    assert(ids.distinct.length == ids.length)
    val maxRrf = math.round(1e6 * 2.0 / 61.0)
    assert(out.forall(_.getAs[Long]("rrf_e6") <= maxRrf))
    // a doc present in both lists must outrank one present in neither's top
    val both = out.filter(r => r.get(2) != null && r.get(3) != null)
    assert(both.nonEmpty, "testdata ids align, so some doc appears in both lists")
  }

  test("tfidf keywords: 3 per doc max, no stopwords, ranks contiguous from 1") {
    val out = SearchOps.qTfidfKeywords(spark, sf).collect()
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "it")
    assert(out.forall(r => !stop.contains(r.getAs[String]("term"))))
    out.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rows) =>
      val rks = rows.map(_.getAs[Long]("rk")).sorted.toSeq
      assert(rks == (1L to rks.length).toSeq && rks.length <= 3)
    }
  }

  test("bigram lm: n_bigrams = n_tokens - 1; repetitive text scores higher than novel") {
    val dir = writeDocs(Seq(
      (1L, "a b a b a b a b", "en", "s0", 1L),   // one dominant bigram
      (2L, "c d e f g h i j", "en", "s0", 1L)))  // all singleton bigrams
    val out = SearchOps.qBigramLm(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_lp_e6"))).toMap
    assert(out(1L)._1 == 7L && out(2L)._1 == 7L)
    assert(out(1L)._2 > out(2L)._2,
      "the LM assigns higher average log-likelihood to corpus-typical (repeated) bigrams")
  }

  test("bigram lm: single-token docs are excluded, no crash") {
    val dir = writeDocs(Seq(
      (1L, "solo", "en", "s0", 1L),
      (2L, "two tokens", "en", "s0", 1L)))
    val out = SearchOps.qBigramLm(spark, dir).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L))
    assert(out.head.getAs[Long]("n_bigrams") == 1L)
  }

  test("bm25 batch: query 0 of the batch reproduces the single-query top-5 exactly") {
    val single = SearchOps.qBm25Topk(spark, sf).limit(5)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bm25_e6"))).toSeq
    val batch = SearchOps.qBm25Batch(spark, sf)
      .filter(col("query_id") === 0L).orderBy("rk")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bm25_e6"))).toSeq
    assert(batch == single,
      "batch fan-out must not change any per-(doc,term) micro-score")
  }

  test("bm25 batch: every query gets exactly 5 ranked hits with contiguous ranks") {
    val out = SearchOps.qBm25Batch(spark, sf).collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to 5L))
    }
  }

  test("bm25 index: probe reproduces the direct-path top-15 exactly") {
    val direct = SearchOps.qBm25Topk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val indexed = SearchOps.qBm25IndexTopk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(indexed == direct,
      "index build must preserve every tf/df/dl/avgdl count bit-for-bit")
  }

  test("bm25 index: second ensure call reuses the committed artifact") {
    val d1 = SearchOps.ensureLexIndex(spark, sf)
    val marker = new java.io.File(d1, "_GRAFT_OK")
    assert(marker.exists())
    val stamp = marker.lastModified()
    val d2 = SearchOps.ensureLexIndex(spark, sf)
    assert(d2 == d1 && marker.lastModified() == stamp, "no rebuild on reuse")
  }

  test("bm25 index plan: the term predicate pushes into the postings scan") {
    val dir = SearchOps.ensureLexIndex(spark, sf)
    val probe = spark.read.parquet(s"$dir/postings")
      .filter(col("term").isin(SearchOps.queryTerms: _*))
    val scan = probe.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [In(term"),
      s"postings probe must push the IN(term) filter, got:\n$scan")
  }

  test("phrase match: adjacency required, order respected, repeats not double-counted") {
    val dir = writeDocs(Seq(
      (1L, "a hash join b", "en", "s0", 1L),          // match
      (2L, "a join hash b", "en", "s0", 1L),          // reversed — no
      (3L, "hash x join", "en", "s0", 1L),            // gap — no
      (4L, "hash join hash join", "en", "s1", 1L),    // twice — count once
      (5L, "hash", "en", "s1", 1L)))                  // prefix only — no
    val out = SearchOps.qPhraseMatch(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n_docs")).toMap
    assert(out == Map("s0" -> 1L, "s1" -> 1L))
  }

  test("phrase match: index probe reproduces the direct path exactly") {
    val direct = SearchOps.qPhraseMatch(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val indexed = SearchOps.qPhraseMatchIndex(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(direct.nonEmpty, "testdata must contain the demo phrase")
    assert(indexed == direct)
  }

  test("bm25 plan: per-term df and corpus stats broadcast; no corpus-sized shuffle on the probe side") {
    val plan = SearchOps.qBm25Topk(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), "df/stats tables must broadcast")
    assert(plan.contains("TakeOrderedAndProject"), "top-k must not globally sort")
  }
}
