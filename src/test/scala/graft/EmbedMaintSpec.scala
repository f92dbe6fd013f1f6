package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.ops.EmbedMaintOps
import graft.pipeline.Embedder

/** Counts every text that reaches the (expensive) embed path. The counter
  * is JVM-global: tasks deserialize their own embedder copy even in local
  * mode, so an instance field would count on the copies and read zero. */
private object CountingEmbedder {
  val calls = new AtomicInteger(0)
}
private class CountingEmbedder extends Embedder {
  override val dim = 2
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    CountingEmbedder.calls.addAndGet(texts.size)
    texts.map(t => Array(t.length.toFloat, 9f))
  }
}

/** X77 delta embedding refresh: fingerprint-decided reuse/embed/drop, and
  * the property the operator exists for — unchanged rows NEVER reach the
  * embedder. */
class EmbedMaintSpec extends SparkTestBase {
  import spark.implicits._

  private def oldCollection = {
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      .toDF("key", "text")
    docs.select(col("key"), EmbedMaintOps.fingerprint(col("text")).as("fp"))
      .withColumn("embedding", array(lit(0.5f), lit(0.25f)))
  }

  test("deltaRefresh partitions keys into reused/embedded/dropped by content") {
    // key 1 unchanged, key 2 edited, key 3 dropped, key 5 new
    val fresh = Seq((1L, "alpha"), (2L, "beta EDITED"), (4L, "delta"), (5L, "epsilon"))
      .toDF("key", "text")
    val out = EmbedMaintOps.deltaRefresh(oldCollection, fresh, new CountingEmbedder)
      .select("key", "action").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "reused", 2L -> "embedded", 3L -> "dropped",
      4L -> "reused", 5L -> "embedded"))
  }

  test("unchanged rows never reach the embedder; changed rows get fresh vectors") {
    val fresh = Seq((1L, "alpha"), (2L, "beta EDITED"), (4L, "delta"), (5L, "epsilon"))
      .toDF("key", "text")
    CountingEmbedder.calls.set(0)
    val rows = EmbedMaintOps.deltaRefresh(oldCollection, fresh, new CountingEmbedder)
      .select("key", "action", "embedding").collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.getSeq[Float](2))))
      .toMap
    // exactly the 2 changed/new texts were embedded — the cost property
    assert(CountingEmbedder.calls.get == 2,
      s"embedder saw ${CountingEmbedder.calls.get} texts, expected 2")
    // reused vectors are BIT-IDENTICAL to the persisted ones
    assert(rows(1L)._2.get == Seq(0.5f, 0.25f))
    assert(rows(4L)._2.get == Seq(0.5f, 0.25f))
    // changed rows carry the embedder's fresh output
    assert(rows(2L)._2.get == Seq("beta EDITED".length.toFloat, 9f))
    assert(rows(5L)._2.get == Seq("epsilon".length.toFloat, 9f))
    // dropped rows are reported with no vector (lineage, not servable)
    assert(rows(3L)._1 == "dropped" && rows(3L)._2.isEmpty)
  }

  test("the driver face yields all three actions with disjoint id sums") {
    val counts = EmbedMaintOps.qEmbedDeltaRefresh(spark, sf)
      .select("action", "n_docs").as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("reused", "embedded", "dropped"))
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    // dropped = multiples of 11; embedded/reused partition the rest
    assert(counts("dropped") == (0L until total).count(_ % 11 == 0))
    assert(counts("embedded") == (0L until total).count(i => i % 11 != 0 && i % 7 == 3))
    assert(counts.values.sum == total)
  }
}
