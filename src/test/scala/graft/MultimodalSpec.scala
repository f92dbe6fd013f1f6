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

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    try in.readAllBytes() finally in.close()
  }

  test("WAV decoder reproduces checked-in fixture samples exactly") {
    val wav = MultimodalOps.decodeWav(fixture("fixture.wav"))
    assert(wav.sampleRate == 8000 && wav.channels == 1 && wav.bitsPerSample == 16)
    val expected = Seq(0, 16384, -16384, 32767, -32768, 8192, -8192, 1000)
      .map(_ / 32768.0f)
    assert(wav.samples.toSeq == expected)
    // sniffing resolves the RIFF form type; the real path feeds features
    assert(MultimodalOps.sniffFormat(fixture("fixture.wav")) == "wav")
  }

  test("BMP decoder reproduces checked-in fixture pixels exactly (bottom-up + padding)") {
    val img = MultimodalOps.decodeBmp(fixture("fixture.bmp"))
    assert(img.width == 3 && img.height == 2)
    // top-down row-major: row0 = red green blue, row1 = white black gray
    assert(img.pixels.toSeq == Seq(0xFF0000, 0x00FF00, 0x0000FF,
      0xFFFFFF, 0x000000, 0x808080))
    assert(MultimodalOps.sniffFormat(fixture("fixture.bmp")) == "bmp")
  }

  test("PPM decoder reproduces checked-in fixture pixels exactly (comment handling)") {
    val img = MultimodalOps.decodePpm(fixture("fixture.ppm"))
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq == Seq(0xFF0000, 0x00FF00, 0x0000FF, 0x0A141E))
    assert(MultimodalOps.sniffFormat(fixture("fixture.ppm")) == "ppm")
  }

  test("decodeFeatures routes wav/bmp through the REAL decoders") {
    val wavBytes = fixture("fixture.wav")
    val bmpBytes = fixture("fixture.bmp")
    val out = MultimodalOps.decodeFeatures(
        binDf(Seq((1L, wavBytes), (2L, bmpBytes))))
      .orderBy("doc_id").collect()
    assert(out(0).getString(2) == "wav" && out(1).getString(2) == "bmp")
    // 8 samples into 8 bins: features == |sample| exactly
    val expWav = Seq(0, 16384, 16384, 32767, 32768, 8192, 8192, 1000)
      .map(_ / 32768.0f)
    assert(out(0).getSeq[Float](3) == expWav)
    // 6 pixels into 8 bins (empty bins are 0): luminance profile
    val lums = Seq(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFFFF, 0x000000, 0x808080)
      .map { p => (0.299f * ((p >> 16) & 0xff) + 0.587f * ((p >> 8) & 0xff) +
        0.114f * (p & 0xff)) / 255.0f }
    val bmpFeat = out(1).getSeq[Float](3)
    assert(bmpFeat.length == MultimodalOps.featureDim)
    // bin contents for n=6, dim=8 under the floor arithmetic:
    // [], [p0], [p1], [p2], [], [p3], [p4], [p5] — empty bins are 0
    assert(bmpFeat.toSeq == Seq(0.0f, lums(0), lums(1), lums(2), 0.0f,
      lums(3), lums(4), lums(5)))
  }

  test("wavFromBytes synthesizes a container the real decoder round-trips") {
    import spark.implicits._
    val text = "hello spark multimodal"
    val payload = Seq(Tuple1(text)).toDF("text")
      .select(MultimodalOps.wavFromBytes(col("text").cast("binary")).as("p"))
      .head.getAs[Array[Byte]](0)
    assert(MultimodalOps.sniffFormat(payload) == "wav")
    val wav = MultimodalOps.decodeWav(payload)
    assert(wav.bitsPerSample == 8 && wav.sampleRate == 8000)
    val expected = text.getBytes("UTF-8").toSeq.map(b => ((b & 0xff) - 128) / 128.0f)
    assert(wav.samples.toSeq == expected)
  }

  test("qMediaDecode runs the real WAV path over every document") {
    val out = graft.ops.MultimodalOps.qMediaDecode(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getString(1) == "wav"))
    // n_bytes = text bytes + 44-byte header
    assert(out.forall(r => r.getLong(2) > 44))
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
