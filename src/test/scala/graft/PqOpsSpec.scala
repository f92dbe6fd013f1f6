package graft

import org.apache.spark.sql.functions._
import graft.ops.{PqOps, Tables, VectorOps}

/** X28 product quantization: code completeness/range, encode determinism,
  * pointwise-append equality, shortlist+re-rank recall vs the exact cosine
  * ranking, and IVF-PQ ≡ flat PQ when every list is probed. */
class PqOpsSpec extends SparkTestBase {

  private def books = {
    val dir = PqOps.ensurePq(spark, sf)
    spark.read.parquet(s"$dir/codebooks")
  }
  private def codes = {
    val dir = PqOps.ensurePq(spark, sf)
    spark.read.parquet(s"$dir/codes")
  }

  test("pq codes: every vector carries M codes, each within [0, KSUB)") {
    val e = Tables.t(spark, sf, "embeddings")
    assert(codes.count() == e.count())
    val bad = codes.select(col("vec_id"), explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= PqOps.KSUB)
    assert(bad.count() == 0)
    val short = codes.filter(size(col("codes")) =!= PqOps.M)
    assert(short.count() == 0)
  }

  test("pq encode is deterministic: two independent encodes are identical") {
    val e = Tables.t(spark, sf, "embeddings")
    val a = PqOps.encodePq(e, books).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    val b = PqOps.encodePq(e, books).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    assert(a == b)
  }

  test("pq encode is pointwise: encode(base ∪ delta) == encode(base) ∪ encode(delta)") {
    val e = Tables.t(spark, sf, "embeddings")
    val base = e.filter(col("vec_id") % 2 === 0)
    val delta = e.filter(col("vec_id") % 2 === 1)
    val whole = PqOps.encodePq(e, books).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    val split = (PqOps.encodePq(base, books).collect() ++
      PqOps.encodePq(delta, books).collect())
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    assert(whole == split)
  }

  test("shortlist + exact re-rank recalls the exact cosine top-10") {
    val e = Tables.t(spark, sf, "embeddings")
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val exact = e.crossJoin(broadcast(qv))
      .select(col("vec_id"),
        Tables.cosineFast(col("embedding"), col("qv")).as("cs"))
      .orderBy(col("cs").desc, col("vec_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSet
    val approx = PqOps.qPqTopk(spark, sf).collect().map(_.getLong(0)).toSet
    // near-uniform synthetic vectors are PQ's hardest case; the measured
    // shortlist-50 re-rank recall at the default geometry is ~1.0, bound
    // leaves slack for codebook re-trains
    assert((exact & approx).size >= 8,
      s"recall@10 too low: ${(exact & approx).size}/10")
  }

  test("ivf-pq with every list probed equals flat pq (same shortlist, same re-rank)") {
    val e = Tables.t(spark, sf, "embeddings")
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val allLists = PqOps.ivfPqShortlist(spark, sf, qv, nprobe = 16, c = PqOps.SHORTLIST)
    val viaIvf = PqOps.rerankExact(spark, sf, allLists, qv, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val flat = PqOps.qPqTopk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaIvf == flat)
  }

  test("ivf-pq probe results come only from the probed lists") {
    val ivfDir = VectorOps.ensureTrainedIvf(spark, sf)
    val e = Tables.t(spark, sf, "embeddings")
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val probed = spark.read.parquet(s"$ivfDir/centroids").crossJoin(broadcast(qv))
      .select(col("label"), Tables.cosineFast(col("centroid"), col("qv")).as("cs"))
      .orderBy(col("cs").desc, col("label").asc).limit(3)
      .collect().map(_.getInt(0)).toSet
    val assign = spark.read.parquet(s"$ivfDir/assign")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val hits = PqOps.qIvfPqTopk(spark, sf).collect().map(_.getLong(0))
    assert(hits.nonEmpty)
    hits.foreach(id => assert(probed.contains(assign(id)),
      s"vec $id from unprobed list ${assign(id)}"))
  }

  test("adc self-distance is the quantization error: below the corpus median") {
    val e = Tables.t(spark, sf, "embeddings")
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val scores = PqOps.adcScores(codes, PqOps.adcTable(books, qv))
    val self = scores.filter(col("vec_id") === 0).head.getLong(1)
    val med = scores.agg(expr("approx_percentile(adc_d2_e6, 0.5)")).head.getLong(0)
    assert(self < med, s"self ADC $self not below corpus median $med")
  }
}
