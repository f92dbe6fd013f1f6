package graft

import org.apache.spark.sql.functions._
import graft.ops.{CorpusOps, IngestOps}

class CorpusOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("repetition signals match hand-computed values on a crafted doc") {
    // "a a a b c" → top token 3/5; distinct 3/5; bigrams: "a a"×2, "a b", "b c" → 2/4
    val df = Seq((1L, "a a a b c", "en", "src0", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    df.createOrReplaceTempView("corpus_rep_docs")
    val base = df.select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("toks"))
    assert(base.select(size(col("toks"))).head.getInt(0) == 5)
    val out = {
      // run the real query against a temp dir holding just this doc
      val dir = java.nio.file.Files.createTempDirectory("corpus_rep").toString
      df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      CorpusOps.qRepetition(spark, dir).head
    }
    assert(out.getAs[Long]("n_tok") == 5L)
    assert(out.getAs[Long]("top_tok_e6") == 600000L)      // 3/5
    assert(out.getAs[Long]("distinct_ratio_e6") == 600000L) // 3/5
    assert(out.getAs[Long]("top_bigram_e6") == 500000L)   // 2/4
  }

  test("single-token doc yields zero bigram fraction, no crash") {
    val dir = java.nio.file.Files.createTempDirectory("corpus_rep1").toString
    Seq((7L, "solo", "en", "src0", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusOps.qRepetition(spark, dir).head
    assert(out.getAs[Long]("n_tok") == 1L)
    assert(out.getAs[Long]("top_tok_e6") == 1000000L)
    assert(out.getAs[Long]("top_bigram_e6") == 0L)
  }

  test("PII redaction replaces every email, phone, and IP occurrence") {
    val dir = java.nio.file.Files.createTempDirectory("corpus_pii").toString
    // doc 2 (even) gets the extra cc address → 2 emails; doc 3 gets 1
    Seq((2L, "reach me", "en", "srcA", 8L), (3L, "or here", "en", "srcB", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = CorpusOps.qPiiRedact(spark, dir).collect()
    val d2 = rows.find(_.getAs[Long]("doc_id") == 2L).get
    val d3 = rows.find(_.getAs[Long]("doc_id") == 3L).get
    assert(d2.getAs[Long]("n_email") == 2L && d3.getAs[Long]("n_email") == 1L)
    assert(d2.getAs[Long]("n_phone") == 1L && d3.getAs[Long]("n_phone") == 1L)
    assert(d2.getAs[Long]("n_ip") == 1L && d3.getAs[Long]("n_ip") == 1L)
  }

  test("redacted text contains placeholders and no residual addresses") {
    val aug = concat(col("text"),
      lit(" contact user1@mail-x.example.com call +1-555-42 from 10.1.2.4"))
    val red = Seq(("body")).toDF("text").select(
      regexp_replace(regexp_replace(regexp_replace(aug,
        "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
        "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{1,6}", "<PHONE>"),
        "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>").as("r"))
      .head.getString(0)
    assert(red == "body contact <EMAIL> call <PHONE> from <IP>")
  }

  test("split assignment is deterministic, stable, and roughly 12/2/2") {
    val ids = spark.range(0, 4000).toDF("k")
    val assigned = ids.select(col("k"), CorpusOps.splitAssign(col("k")).as("split"))
    val counts = assigned.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "dev", "test"))
    // 12/16 = 0.75, 2/16 = 0.125 each; allow generous tolerance
    assert(math.abs(counts("train") / 4000.0 - 0.75) < 0.05)
    assert(math.abs(counts("dev") / 4000.0 - 0.125) < 0.04)
    assert(math.abs(counts("test") / 4000.0 - 0.125) < 0.04)
    // stability: same input → same assignment (no rand())
    val again = ids.select(CorpusOps.splitAssign(col("k")).as("split"))
    assert(assigned.select("split").except(again).count() == 0)
  }

  test("quality filter keeps roughly half of each stratum (median threshold)") {
    val rows = graft.ops.CorpusOps.qQualityFilter(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val n = r.getAs[Long]("n_docs")
      val kept = r.getAs[Long]("n_kept")
      // at-or-above an exact median keeps >= half, and never everything
      // unless all scores tie
      assert(kept * 2 >= n, s"median threshold must keep >= half: $r")
      assert(kept <= n)
    }
  }

  test("partitioned write prunes directories and bounds file sizes") {
    val dir = java.nio.file.Files.createTempDirectory("corpus_part").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    IngestOps.writePartitioned(docs, s"$dir/docs", Seq("lang"), maxRecordsPerFile = 10)
    val langs = docs.select("lang").distinct().as[String].collect().sorted
    val subdirs = new java.io.File(s"$dir/docs").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(subdirs.toSeq == langs.map(l => s"lang=$l").toSeq)
    // maxRecordsPerFile honored: no parquet file in any partition holds > 10 rows
    for (sub <- subdirs) {
      val parts = new java.io.File(s"$dir/docs/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(parts.nonEmpty)
      for (p <- parts)
        assert(spark.read.parquet(p.getAbsolutePath).count() <= 10)
    }
    // partition pruning: a lang filter reads only that directory
    val plan = spark.read.parquet(s"$dir/docs").filter(col("lang") === langs.head)
      .queryExecution.executedPlan.toString
    assert(!plan.contains(s"lang=${langs.last}"))
    // roundtrip equality (partition col values survive directory encoding)
    val back = spark.read.parquet(s"$dir/docs")
      .select(docs.columns.map(col).toSeq: _*)
    assert(back.except(docs).count() == 0 && docs.except(back).count() == 0)
  }

  test("schema-evolution read merges appended columns as nullable union") {
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    Seq((1L, "a")).toDF("id", "v1")
      .write.mode("overwrite").parquet(s"$dir/t")
    Seq((2L, "b", 9L)).toDF("id", "v1", "v2")
      .write.mode("append").parquet(s"$dir/t")
    val merged = IngestOps.readEvolved(spark, s"$dir/t")
    assert(merged.columns.sorted.toSeq == Seq("id", "v1", "v2"))
    val byId = merged.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(2), "old file must surface NULL for the new column")
    assert(byId(2L).getLong(2) == 9L)
  }

  test("source mixing keeps at most everything, respects rank-weighted rates") {
    val rows = CorpusOps.qMixSources(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("thr") >= 0L)
    }
    // the sampler must actually sample: with a 40% budget, not every source
    // can keep everything
    assert(rows.exists(r => r.getAs[Long]("n_kept") < r.getAs[Long]("n_docs")))
    // determinism: a second run produces the identical decision set
    val again = CorpusOps.qMixSources(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("contamination audit bounds: flagged docs never exceed the source total") {
    val rows = CorpusOps.qContamination(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getAs[Long]("n_contaminated") <= r.getAs[Long]("n_docs"))
    // the synthetic corpus shares templates across docs, so the benchmark
    // subset must contaminate SOMETHING — an all-zero audit would mean the
    // shingle join silently matched nothing
    assert(rows.map(_.getAs[Long]("n_contaminated")).sum > 0L)
  }

  test("compaction rewrites many small files into the computed count") {
    val dir = java.nio.file.Files.createTempDirectory("corpus_compact").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.repartition(16).write.mode("overwrite").parquet(s"$dir/small")
    val smallFiles = new java.io.File(s"$dir/small").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(smallFiles == 16)
    val n = IngestOps.compactParquet(spark, s"$dir/small", s"$dir/big", targetFileBytes = 1L << 30)
    assert(n == 1)
    val bigFiles = new java.io.File(s"$dir/big").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(bigFiles == 1)
    val back = spark.read.parquet(s"$dir/big")
    assert(back.count() == docs.count())
    assert(back.except(docs).count() == 0)
  }

  test("sequence packing: budget cap, dense ordered ids, block equivalence") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 4).foreach { trial =>
      val n = rnd.nextInt(300) + 50
      val budget = rnd.nextInt(150) + 60L
      // token counts 5..120 with some docs alone over the budget
      val docs = (0 until n).map { i =>
        (i.toLong, Seq.fill(rnd.nextInt(116) + 5)("w").mkString(" "))
      }.toDF("doc_id", "text")
      def check(df: org.apache.spark.sql.DataFrame): Unit = {
        val rows = df.orderBy("doc_id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        // coverage: every doc packed exactly once, in doc order the pack
        // id never decreases and never skips (dense ids)
        assert(rows.map(_._1).toSeq == (0L until n).toSeq)
        val pids = rows.map(_._2)
        assert(pids.head == 0L)
        pids.sliding(2).foreach { w =>
          if (w.size == 2) assert(w(1) == w(0) || w(1) == w(0) + 1, s"trial $trial: gap")
        }
        // budget cap: a pack only exceeds the budget when it IS one doc
        rows.groupBy(_._2).foreach { case (p, ds) =>
          val tot = ds.map(_._3).sum
          assert(tot <= budget || ds.length == 1,
            s"trial $trial: pack $p holds ${ds.length} docs, $tot > $budget tokens")
        }
      }
      val single = CorpusOps.packSequences(docs, budget, rowsPerBlock = Int.MaxValue)
      val blocked = CorpusOps.packSequences(docs, budget,
        rowsPerBlock = rnd.nextInt(40) + 10)
      check(single); check(blocked)
      // a block at least as large as the input degenerates to single-block
      val wide = CorpusOps.packSequences(docs, budget, rowsPerBlock = n)
      assert(wide.orderBy("doc_id").collect().toSeq ==
        single.orderBy("doc_id").collect().toSeq)
    }
  }

  test("curation funnel: stage counts are monotone and every stage drops something") {
    val rows = CorpusOps.qCurationFunnel(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (raw, d, c, f) = (r.getAs[Long]("n_raw"), r.getAs[Long]("n_after_dedup"),
        r.getAs[Long]("n_after_decontam"), r.getAs[Long]("n_final"))
      assert(raw >= d && d >= c && c >= f, s"non-monotone funnel row: $r")
      assert(r.getAs[Long]("chars_final") >= 0L)
    }
    // on the synthetic corpus each stage must actually bite somewhere —
    // a stage that drops nothing anywhere means its join matched nothing
    val t = rows.map(r => (r.getAs[Long]("n_raw"), r.getAs[Long]("n_after_dedup"),
      r.getAs[Long]("n_after_decontam"), r.getAs[Long]("n_final")))
    // dedup bites only where exact duplicates exist (none at sf0.001, some
    // at sf0.01) — assert agreement with the standalone dedup report
    // rather than assuming the corpus has dups at this SF
    val expectedDups = graft.ops.TextOps.qExactDedup(spark, sf).collect()
      .map(r => r.getAs[Long]("n_dups")).sum
    assert(t.map(x => x._1 - x._2).sum <= expectedDups,
      "dedup stage dropped more than the corpus' exact-dup count")
    assert(t.map(x => x._2 - x._3).sum > 0L, "decontamination stage dropped nothing")
  }

  test("dedup spans: copied span removed from the later doc, keeper intact") {
    // doc 1 is w1..w9 alone; doc 2 embeds the identical 9-word span (= 7
    // consecutive duplicated 3-shingles >= minRun 5) between unique words;
    // doc 3 shares nothing and carries doubled whitespace
    val span = "alpha bravo charlie delta echo foxtrot golf hotel india"
    val df = Seq(
      (1L, span, "en", "s0", span.length.toLong),
      (2L, s"uno dos tres $span quatro cinco seis", "en", "s0", 1L),
      (3L, "nothing  shared   here at all", "en", "s0", 1L),
      // below the shingle floor (<3 words): must pass through untouched
      (4L, "tiny doc", "en", "s0", 1L),
      (5L, "alpha", "en", "s0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusOps.dedupSpans(df, minRun = 5)
      .orderBy("doc_id").collect()
    assert(out.length == 5)
    assert(out(3).getAs[String]("text_clean") == "tiny doc"
      && out(3).getAs[Long]("n_removed") == 0L)
    // a 1-word doc sharing its word with a keeper's span stays whole —
    // it emits no shingle, so it can never be flagged
    assert(out(4).getAs[String]("text_clean") == "alpha"
      && out(4).getAs[Long]("n_removed") == 0L)
    assert(out(0).getAs[String]("text_clean") == span, "keeper doc modified")
    assert(out(0).getAs[Long]("n_removed") == 0L)
    assert(out(1).getAs[String]("text_clean") == "uno dos tres quatro cinco seis")
    assert(out(1).getAs[Long]("n_removed") == 9L)
    assert(out(1).getAs[Long]("n_spans") == 1L)
    // untouched doc comes back whitespace-normalized (the documented contract)
    assert(out(2).getAs[String]("text_clean") == "nothing shared here at all")
    assert(out(2).getAs[Long]("n_removed") == 0L)
  }

  test("dedup spans: fixture output matches an independent driver replay") {
    // the whole chain (positions, keep rule, run merge, surgery)
    // re-implemented in plain Scala over the collected sf0.001 corpus —
    // independent of both the Spark formulation and the DuckDB oracle
    val minRun = 5
    // tokenization must mirror Spark SQL exactly: trim() strips SPACES
    // only (not tab/newline) and split keeps trailing empty tokens
    // (limit -1) — Java's String.trim / default split would silently
    // diverge on text ending in non-space whitespace
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).replaceAll("^ +| +$", "").split("\\s+", -1).toSeq)
      .sortBy(_._1)
    val occs = for {
      (id, toks) <- docs.toSeq
      if toks.size >= 3
      p <- 0 to toks.size - 3
    } yield (toks.slice(p, p + 3)
      .map(_.toLowerCase(java.util.Locale.ROOT)).mkString(" "), id, p)
    val stats = occs.groupBy(_._1).map { case (k, os) =>
      k -> ((os.map(_._2).min, os.map(_._2).distinct.size))
    }
    val flagged = occs.filter { case (k, id, _) =>
      val (keeper, df) = stats(k); df >= 2 && id > keeper
    }.groupBy(_._2).map { case (id, os) => id -> os.map(_._3).toSet }
    val expected = docs.map { case (id, toks) =>
      val fl = flagged.getOrElse(id, Set.empty[Int]).toSeq.sorted
      val runs = fl.foldLeft(List.empty[List[Int]]) {
        case (acc @ (h :: t), p) if h.head == p - 1 => (p :: h) :: t
        case (acc, p) => List(p) :: acc
      }.map(_.reverse).reverse
      val ivs = runs.filter(_.size >= minRun).map(r => (r.head, r.last + 2))
      val removed = ivs.flatMap { case (s, e) => s to e }.toSet
      val kept = toks.indices.filterNot(removed)
      (id, toks.size.toLong, (toks.size - kept.size).toLong,
        ivs.size.toLong, kept.map(toks).mkString(" "))
    }
    val got = CorpusOps.qDedupSpans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"doc ${e._1}") }
    // the corpus must actually exercise removal at this SF, and the
    // min-doc_id keeper must never lose a word
    assert(got.exists(_._3 > 0L), "no spans removed at sf0.001 — dead test")
    assert(got.head._3 == 0L, "corpus-min doc_id had words removed")
  }

  test("dedup spans: adjacent runs with overlapping word intervals merge") {
    // doc 3 is c0..c16; docs 1 and 2 each own one half's shingles
    // (c0..c8 and c8..c16), so doc 3's flagged positions are {0..6} and
    // {8..14} — position 7's shingle (c7 c8 c9) exists nowhere else. The
    // two runs extend to word intervals [0,8] and [8,16], which OVERLAP
    // at word 8: the surgery must take their union (the whole doc), not
    // double-count the shared word
    val words = (0 to 16).map(i => s"c$i")
    val df = Seq(
      (1L, words.take(9).mkString(" "), "en", "s0", 1L),
      (2L, words.drop(8).mkString(" "), "en", "s0", 1L),
      (3L, words.mkString(" "), "en", "s0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusOps.dedupSpans(df, minRun = 5).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_removed") == 0L, "keeper 1 modified")
    assert(out(1).getAs[Long]("n_removed") == 0L, "keeper 2 modified")
    assert(out(2).getAs[Long]("n_words") == 17L)
    assert(out(2).getAs[Long]("n_removed") == 17L,
      s"overlap union wrong: ${out(2)}")
    assert(out(2).getAs[Long]("n_spans") == 2L, "pre-merge run count lost")
    assert(out(2).getAs[String]("text_clean") == "")
  }

  test("dedup spans: 50k-word boilerplate-heavy doc stays linear") {
    // r16 verdict task 2: the old surgery was O(words × spans) per doc —
    // on a web-scale boilerplate page (thousands of duplicated spans in
    // one long doc) that's quadratic. This measures the bound: 4500
    // boilerplate repeats in a 54k-word doc must clean in seconds, and
    // exactly the boilerplate must go
    val boiler = (1 to 9).map(i => s"b$i").mkString(" ")
    val repeats = 4500
    val body = (1 to repeats)
      .map(i => s"u${i}a u${i}b u${i}c $boiler").mkString(" ")
    val df = Seq(
      (1L, boiler, "en", "s0", 1L),
      (2L, body, "en", "s0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val t0 = System.nanoTime()
    val out = CorpusOps.dedupSpans(df, minRun = 5).orderBy("doc_id").collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out(0).getAs[Long]("n_removed") == 0L, "keeper modified")
    assert(out(1).getAs[Long]("n_words") == repeats * 12L)
    assert(out(1).getAs[Long]("n_spans") == repeats.toLong)
    assert(out(1).getAs[Long]("n_removed") == repeats * 9L)
    val expectClean = (1 to repeats)
      .map(i => s"u${i}a u${i}b u${i}c").mkString(" ")
    assert(out(1).getAs[String]("text_clean") == expectClean)
    // generous wall bound — the quadratic formulation took minutes here,
    // the sorted sweep takes low single-digit seconds
    assert(secs < 90.0, f"long-doc surgery took $secs%.1f s — bound regressed")
  }
}
