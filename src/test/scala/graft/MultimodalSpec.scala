package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{MultimodalOps, TextOps}

/** Multimodal plumbing + simhash near-dup specs. */
class MultimodalSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  private def binDf(rows: Seq[(Long, Array[Byte])]) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, schema)
  }

  test("frame sampling explodes every nth fixed-size frame in order") {
    val payload = Array.tabulate[Byte](1024)(i => (i % 251).toByte) // 4 frames of 256
    val out = MultimodalOps.sampleFrames(binDf(Seq((1L, payload))), everyNth = 2)
      .orderBy("frame_idx").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 2))
    assert(out.forall(_.getAs[Array[Byte]](2).length == 256))
    assert(out(0).getAs[Array[Byte]](2).toSeq == payload.slice(0, 256).toSeq)
    assert(out(1).getAs[Array[Byte]](2).toSeq == payload.slice(512, 768).toSeq)
    // payload smaller than one frame: no rows, no error
    assert(MultimodalOps.sampleFrames(binDf(Seq((2L, Array[Byte](1, 2)))), 1).count() == 0)
  }

  test("feature resize average-pools to the target dimension") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 3.0f, 5.0f, 7.0f, 9.0f, 11.0f, 13.0f, 15.0f)))
      .toDF("doc_id", "features")
    val out = MultimodalOps.resizeFeatures(df, outDim = 4)
      .select("features_resized").head.getSeq[Float](0)
    assert(out == Seq(2.0f, 6.0f, 10.0f, 14.0f)) // pairwise means
    val up = MultimodalOps.resizeFeatures(df, outDim = 8)
      .select("features_resized").head.getSeq[Float](0)
    assert(up.length == 8)
  }

  test("simhash near-dup pairs find hamming-close docs via banded join") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark table scan join filter agg window group sort merge"),
      (2L, "spark table scan join filter agg window group sort merge"), // exact dup
      (3L, "spark table scan join filter agg window group sort batch"), // 1-word change
      (4L, "zebra yak xylophone walrus vulture unau tapir seal rhea quokka"))
      .toDF("doc_id", "text")
    val pairs = TextOps.simhashNeardupPairs(TextOps.simhash(df, "text"), maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.get((1L, 2L)).contains(0L)) // identical simhash
    // doc 4 shares no tokens: never a near-dup of 1/2 at this threshold
    assert(!pairs.keySet.exists { case (a, b) => Set(a, b).contains(4L) })
  }
}
