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
