package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Invariants of the larger-scale bench copy (BenchScale): replication
  * must change SCALE, not semantics — dims stay 1×, fact keys stay
  * unique, the events file keeps its raw int64-nanos layout so
  * Tables.events reads the copy exactly like the original, and replica
  * documents/embeddings must NOT be near-dups of the originals (or the
  * dedup/ANN benches would measure a quadratic artifact, not scale). */
class BenchScaleSpec extends SparkTestBase {

  lazy val scaled: String = BenchScale.ensureScaled(spark, sf, 2)

  test("dims stay 1x, facts 2x, fact keys stay unique") {
    def n(dir: String, t: String) =
      spark.read.parquet(s"$dir/$t.parquet").count()
    for (d <- Seq("region", "nation", "customer", "supplier", "part"))
      assert(n(scaled, d) == n(sf, d), d)
    for (f <- Seq("orders", "lineitem", "documents", "embeddings"))
      assert(n(scaled, f) == 2 * n(sf, f), f)
    // offset keys stay unique (and o_orderkey↔l_orderkey stays referential:
    // both sides use one shared span)
    val o = spark.read.parquet(s"$scaled/orders.parquet")
    assert(o.select("o_orderkey").distinct().count() == o.count())
    val l = spark.read.parquet(s"$scaled/lineitem.parquet")
    assert(l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti").count() == 0)
    assert(spark.read.parquet(s"$scaled/documents.parquet")
      .select("doc_id").distinct().count() == 2 * n(sf, "documents"))
  }

  test("events copy keeps a raw layout Tables.events accepts") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$scaled/events.parquet")
    // the copy preserves whatever raw layout the source had (int64 nanos
    // or TIMESTAMP_MICROS) — both are layouts Tables.events' branch reads
    assert(Set[org.apache.spark.sql.types.DataType](LongType, TimestampType,
      org.apache.spark.sql.types.TimestampNTZType).contains(raw.schema("ts").dataType))
    val ev = graft.ops.Tables.events(spark, scaled)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.count() == 2 * graft.ops.Tables.events(spark, sf).count())
    assert(ev.select("event_id").distinct().count() == ev.count())
  }

  test("adaptive-geometry recall floors at replicated scale: banded, LSH, " +
    "and IVF faces all find planted near-dup twins (mult=4)") {
    twinRecallFloors(mult = 4, compressedFaces = false)
  }

  test("adaptive-geometry recall floors at mult=16: banded, LSH, IVF, " +
    "SQ8 and IVF-PQ faces (gated behind SPARK_GRAFT_BENCH_MULT=16)") {
    // the x16 wall-times are stamped every round but the adaptive layout
    // shifts AGAIN between 8k and 32k vectors (nlist ~94→~181, band/LSH
    // bits grow) — this runs the same planted-twin floors at that
    // geometry, plus the compressed probes (SQ8 int8 codes, IVF-PQ ADC)
    // whose artifacts re-train per corpus. Gated so `sbt test` stays
    // fast; the bench session runs it with SPARK_GRAFT_BENCH_MULT=16.
    assume(sys.env.get("SPARK_GRAFT_BENCH_MULT").contains("16"),
      "set SPARK_GRAFT_BENCH_MULT=16 to run the x16 recall floors")
    twinRecallFloors(mult = 16, compressedFaces = true)
  }

  /** The shared floor body: replicate sf0.1 by `mult`, plant deterministic
    * near-dup twins, and assert every ANN/dedup face still finds them at
    * the corpus-sized adaptive geometry.
    *
    * Rationale (r13): adaptiveBandBits/adaptiveLshBits/adaptiveNlist
    * change layout only ABOVE the testdata SFs, where no oracle runs — so
    * adaptivity could silently trade recall for the x16 speed it bought.
    * A mult-replica of sf0.1 plus planted near-dup twins (multiplicative
    * ±2% perturbation, cosine ≥ 0.9997, one per 10th vector) crosses the
    * thresholds where the adaptive sizing engages, and every family must
    * still recall ≥ 0.8 of the KNOWN true pairs. (Raw recall vs the
    * 0.3-cosine exact pair set is not the right floor — this corpus has
    * no organic pairs above 0.55, and banding is designed to pass weak
    * pairs probabilistically; planted twins are the ground truth whose
    * loss would mean adaptivity broke recall. Measured: every face at
    * 1.0 at mult=4 and mult=16.) */
  private def twinRecallFloors(mult: Int, compressedFaces: Boolean): Unit = {
    import graft.ops.VectorOps
    val scaledM = BenchScale.ensureScaled(spark, "/root/testdata/sf0.1", mult)
    val e = graft.ops.Tables.t(spark, scaledM, "embeddings")
    val planted = e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("label"),
        transform(col("embedding"), (x, i) =>
          (x * (lit(1.0f) + when(pmod(i, lit(2)) === lit(0), lit(0.02f))
            .otherwise(lit(-0.02f)))).cast("float")).as("embedding"))
    val corpus = e.unionByName(planted).localCheckpoint()
    val n = corpus.count()
    assert(VectorOps.adaptiveBandBits(n) > 8 && VectorOps.adaptiveLshBits(n) > 4,
      s"corpus must be large enough to ENGAGE the adaptive sizing (n=$n)")
    val twins = e.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("id_a"), (col("vec_id") + 1000000L).as("id_b"))
      .localCheckpoint()
    val nTwin = twins.count()
    // banded exact-cosine face at the corpus-sized geometry
    val banded = VectorOps.embedNeardupPairs(corpus, bands = 4,
      per = VectorOps.adaptiveBandBits(n)).select("id_a", "id_b")
    val bandRecall = banded.join(twins, Seq("id_a", "id_b"), "left_semi")
      .count().toDouble / nTwin
    assert(bandRecall >= 0.8, s"banded twin recall $bandRecall < 0.8 at n=$n")
    // hyperplane-LSH face at the corpus-sized geometry
    val lsh = VectorOps.lshCandidatePairs(corpus,
        bits = 4 * VectorOps.adaptiveLshBits(n), bands = 4)
      .select(col("id_a"), col("id_b"),
        round(graft.ops.Tables.cosineFast(col("va"), col("vb")) * 1000000, 0)
          .cast("long").as("sim_e6"))
      .filter(col("sim_e6") >= 300000)
    val lshRecall = lsh.join(twins, Seq("id_a", "id_b"), "left_semi")
      .count().toDouble / nTwin
    assert(lshRecall >= 0.8, s"LSH twin recall $lshRecall < 0.8 at n=$n")
    // trained-IVF batch face (adaptiveNlist = sqrt N): each query's twin
    // must surface in its top-5 — near-identical vectors must land in the
    // same probed list
    val tdir = "target/tmp_recall_floor/" +
      s"${java.lang.ProcessHandle.current.pid}_x$mult"
    corpus.write.mode("overwrite").parquet(s"$tdir/embeddings.parquet")
    val got = SparkEntry.queries("q_ivf_topk_batch")(spark, tdir)
      .select("query_id", "vec_id")
    val qTwins = twins.select(col("id_a").as("query_id"), col("id_b").as("vec_id"))
      .filter(col("query_id") % 100 === 0)
    val bothWays = qTwins.unionByName(
      qTwins.select(col("vec_id").as("query_id"), col("query_id").as("vec_id")))
    val annRecall = got.join(bothWays, Seq("query_id", "vec_id"), "left_semi")
      .count().toDouble / bothWays.count()
    assert(annRecall >= 0.8, s"IVF twin-in-top5 recall $annRecall < 0.8 at n=$n")
    if (compressedFaces) {
      // compressed probes retrain their artifacts on the twin corpus
      // (fingerprint-keyed ensure*); vec 0's planted twin (1000000,
      // cosine ≈ 0.9997 — far above any organic neighbor) must survive
      // both the SQ8 int8-code shortlist and the IVF-PQ ADC shortlist
      // into the exact-re-ranked top-10
      val sq8Top = SparkEntry.queries("q_sq8_topk")(spark, tdir)
        .select("vec_id").collect().map(_.getLong(0))
      assert(sq8Top.contains(1000000L),
        s"SQ8 probe lost the planted twin of vec 0 at n=$n: ${sq8Top.toSeq}")
      val pqTop = SparkEntry.queries("q_ivfpq_topk")(spark, tdir)
        .select("vec_id").collect().map(_.getLong(0))
      assert(pqTop.contains(1000000L),
        s"IVF-PQ probe lost the planted twin of vec 0 at n=$n: ${pqTop.toSeq}")
    }
  }

  test("replica docs and embeddings are not near-dups of the originals") {
    // disjoint shingle spaces: replica tokens are prefixed, so an exact
    // dedup over the scaled corpus finds no cross-replica duplicates
    val docs = spark.read.parquet(s"$scaled/documents.parquet")
    assert(docs.groupBy("text").count().filter(col("count") > 1).count() ==
      spark.read.parquet(s"$sf/documents.parquet")
        .groupBy("text").count().filter(col("count") > 1).count())
    // cyclic shift preserves the norm (cosine space intact) but replicas
    // are far from their originals in cosine — no artificial ANN dups
    val e = spark.read.parquet(s"$scaled/embeddings.parquet")
    val n0 = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val a = e.filter(col("vec_id") < n0)
      .select(col("vec_id"), col("embedding").as("ea"))
    val b = e.filter(col("vec_id") >= n0)
      .select((col("vec_id") - n0).as("vec_id"), col("embedding").as("eb"))
    val cos = a.join(b, "vec_id")
      .select(graft.ops.Tables.cosine(col("ea"), col("eb")).as("c"))
    assert(cos.agg(max(abs(col("c")))).head.getDouble(0) < 0.9,
      "a replica embedding is a near-dup of its original")
  }
}
