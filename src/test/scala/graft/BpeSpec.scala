package graft

import org.apache.spark.sql.functions._
import graft.ops.BpeOps

/** The distributed BPE trainer must reproduce the published algorithm
  * (Sennrich et al., ACL 2016) symbol-for-symbol: this spec runs a direct
  * in-memory implementation over the same word frequencies and compares the
  * full merge sequence — rank, pair, and count — plus the induced
  * symbolization invariant (concatenating any word's symbols restores the
  * word + end marker).
  */
class BpeSpec extends SparkTestBase {

  /** Direct port of the paper's get_stats / merge_vocab loop. */
  private def referenceBpe(wordFreq: Map[String, Long], nMerges: Int)
      : Seq[(Int, String, String, Long)] = {
    def mergeSeq(syms: Vector[String], l: String, r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    var vocab: Map[Vector[String], Long] = wordFreq.map { case (w, f) =>
      (w.split("").filter(_.nonEmpty).toVector :+ "</w>") -> f
    }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        pairs((syms(i), syms(i + 1))) += f
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), n) = pairs.toSeq
          .minBy { case ((l, r), n) => (-n, l, r) }
        if (n < 2) done = true
        else {
          merges += ((rank, l, r, n))
          vocab = vocab.map { case (syms, f) => mergeSeq(syms, l, r) -> f }
          rank += 1
        }
      }
    }
    merges.result()
  }

  test("distributed BPE reproduces the reference merge sequence exactly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val wordFreq = BpeOps.wordVocab(docs, "text").collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("freq")).toMap
    val expected = referenceBpe(wordFreq, 20)
    val (got, finalVocab) = BpeOps.learnBpe(docs, "text", 20)
    assert(got == expected,
      s"merge sequences diverge:\n got=$got\n exp=$expected")
    assert(got.nonEmpty, "corpus produced no merges — spec is vacuous")
    // applying the merges must preserve word content: joining a word's
    // final symbols restores word + '</w>'
    val broken = finalVocab
      .withColumn("rejoin", array_join(col("syms"), ""))
      .filter(col("rejoin") =!= concat(col("word"), lit("</w>")))
      .count()
    assert(broken == 0L, s"$broken words corrupted by merge application")
  }

  test("encodeWords: trained words reproduce the trained symbolization; " +
    "OOV compounds respect the content invariant") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val (merges, vocab) = BpeOps.learnBpe(docs, "text", 20)
    // every trained word must encode to exactly its trained symbol sequence
    val enc = BpeOps.encodeWords(vocab.select("word"), merges)
    val diverged = enc.join(vocab.select(col("word"), col("syms")), "word")
      .filter(col("pieces") =!= col("syms")).count()
    assert(diverged == 0L, s"$diverged trained words encode differently")
    // OOV: compounds of two trained words — never seen by training
    import spark.implicits._
    val words = vocab.select("word").as[String].collect().sorted.take(5)
    val oov = words.flatMap(a => words.map(b => a + b)).distinct
      .filterNot(vocab.select("word").as[String].collect().toSet)
    assert(oov.nonEmpty)
    val encOov = BpeOps.encodeWords(oov.toSeq.toDF("word"), merges)
      .withColumn("rejoin", array_join(col("pieces"), ""))
    val broken = encOov
      .filter(col("rejoin") =!= concat(col("word"), lit("</w>"))).count()
    assert(broken == 0L, s"$broken OOV words corrupted by encoding")
  }

  test("q_bpe_merges / q_bpe_vocab: ranked table + induced vocab are sane") {
    val m = BpeOps.qBpeMerges(spark, sf).collect()
    assert(m.map(_.getAs[Long]("rank")).toSeq == (1L to m.length).toSeq)
    m.foreach { r =>
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("left") + r.getAs[String]("right"))
      assert(r.getAs[Long]("n") >= 2L)
    }
    // counts never increase along the greedy sequence *within a pair's
    // lifetime* is NOT an invariant (later merges can create new frequent
    // pairs), but the first merge must be the global argmax:
    val v = BpeOps.qBpeVocab(spark, sf).collect()
    assert(v.nonEmpty && v.length <= 30)
    // the learned units cover more than single characters
    assert(v.exists(_.getAs[String]("token").length > 1))
  }
}
