package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata. The decode/feature-extract kernel is
  * STUBBED (media libraries are not in this environment) behind a
  * deterministic fake, but the Spark-side plumbing — schema, batching,
  * partition-wise processing, output shape — is real and tested.
  */
object MultimodalOps {

  val featureDim = 8

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB decode kernel: a real deployment would decode image/audio bytes
    * here (e.g. JPEG → RGB tensor). The deterministic fake derives a feature
    * vector from the payload bytes so the pipeline shape is testable. */
  private def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](featureDim)
    var i = 0
    while (i < bytes.length) {
      out(i % featureDim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Partition-wise batch decode over a binary `payload` column — the Scala
    * analog of a `mapInPandas` batch UDF: one kernel invocation per batch,
    * never per row on the driver. */
  def decodeFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col("doc_id").cast("long"), col("payload")).rdd
      .mapPartitions { it =>
        it.grouped(256).flatMap { batch =>
          batch.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            Row(id, bytes.length.toLong, sniffFormat(bytes), fakeDecode(bytes))
          }
        }
      }
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** Magic-byte format sniffing (real logic — works on any binary column). */
  def sniffFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 3 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
    else if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
    else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F') "riff"
    else "unknown"

  /** STUB frame sampler: every-nth-frame extraction from a video payload.
    * The real kernel would demux/decode; the fake treats the payload as
    * fixed-size "frames" of `frameBytes` and emits one row per sampled
    * frame — the explode-shaped plumbing (one input row → N output rows,
    * schema, ordering) is the real part. */
  def sampleFrames(df: DataFrame, everyNth: Int, frameBytes: Int = 256): DataFrame = {
    val nFrames = floor(length(col("payload")) / frameBytes).cast("int")
    df.select(col("doc_id"), col("payload"), nFrames.as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("payload"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyNth))).as("frame_idx"))
      .select(
        col("doc_id"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame_bytes"))
  }

  /** STUB resize: average-pool a feature vector down to `outDim` (the array
    * math is real; a real image resize would pool pixels the same way). */
  def resizeFeatures(df: DataFrame, outDim: Int): DataFrame = {
    val inSize = size(col("features"))
    val pooled = transform(sequence(lit(0), lit(outDim - 1)), i => {
      val start = ((i * inSize) / lit(outDim)).cast("int")
      val end = (((i + lit(1)) * inSize) / lit(outDim)).cast("int")
      val window = slice(col("features"), start + 1, greatest(end - start, lit(1)))
      aggregate(window, lit(0.0d), (acc, x) => acc + x.cast("double"),
        acc => (acc / size(window)).cast("float"))
    })
    df.withColumn("features_resized", pooled)
  }

  /** Binary-column metadata over a synthesized payload (text bytes stand in
    * for media bytes): byte length + md5 digest — oracle-checkable since
    * both engines hash the same UTF-8 bytes. */
  def qBinaryMeta(s: SparkSession, sf: String): DataFrame =
    t(s, sf, "documents")
      .select(
        col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        md5(col("text").cast("binary")).as("digest"))
      .orderBy("doc_id")
}
