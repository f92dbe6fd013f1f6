package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** V2: the batch embedder. The reference embeds chunk batches through an
  * OpenAI-compatible HTTP endpoint (`chroma_ingestion_util.py:147-160`:
  * `client.embeddings.create(model=…, input=chunk_texts)`, one client per
  * worker thread, and a failed batch degrades to empty vectors instead of
  * failing the ingest). `HttpEmbedder` reproduces that contract over the
  * wire protocol itself — POST `{"model":…,"input":[…]}`, response
  * `{"data":[{"index":i,"embedding":[…]}…]}` reassembled by index — so any
  * OpenAI-compatible server works; the hermetic default for tests and the
  * collection sinks remains the deterministic stub
  * (`IngestionPipeline.stubEmbed`).
  */
trait Embedder extends Serializable {
  def dim: Int
  /** One batch of texts → one vector per text, order-aligned. A FAILED
    * batch returns empty vectors (the reference's degrade contract) —
    * callers see `array()` and can filter, never a thrown ingest. */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]
}

/** OpenAI-wire-compatible HTTP embedder. One instance is serialized to
  * each task; connections are opened per batch (HttpURLConnection pools
  * keep-alive per JVM underneath, so executor-side reuse is automatic). */
final case class HttpEmbedder(endpoint: String, model: String, dim: Int,
    timeoutMs: Int = 60000, maxAttempts: Int = 3) extends Embedder {

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    if (texts.isEmpty) return Nil
    var attempt = 0
    var backoffMs = 200L
    while (attempt < maxAttempts) {
      attempt += 1
      try return postOnce(texts)
      catch {
        // NonFatal, not just IOException: a malformed server response
        // (short data array, bad index, missing field) must retry and then
        // degrade exactly like a transport failure — the degrade contract
        // covers the whole wire exchange, not only the socket
        case scala.util.control.NonFatal(_) if attempt < maxAttempts =>
          Thread.sleep(backoffMs); backoffMs *= 2
        case scala.util.control.NonFatal(_) =>
          // degrade, don't throw: `return [[]] * len(chunk_texts)`
          return Seq.fill(texts.size)(Array.empty[Float])
      }
    }
    Seq.fill(texts.size)(Array.empty[Float])
  }

  private def postOnce(texts: Seq[String]): Seq[Array[Float]] = {
    val mapper = new ObjectMapper
    val req = mapper.createObjectNode()
    req.put("model", model)
    val arr = req.putArray("input")
    texts.foreach(arr.add)
    val body = mapper.writeValueAsBytes(req)

    val conn = new java.net.URI(endpoint).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    conn.setDoOutput(true)
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type", "application/json")
    conn.setFixedLengthStreamingMode(body.length)
    try {
      val out = conn.getOutputStream
      try out.write(body) finally out.close()
      val code = conn.getResponseCode
      if (code < 200 || code >= 300)
        throw new java.io.IOException(s"HTTP $code from $endpoint")
      val root = mapper.readTree(conn.getInputStream)
      val data = root.get("data")
      require(data != null && data.isArray && data.size == texts.size,
        s"embedding response carried ${if (data == null) 0 else data.size} " +
          s"vectors for ${texts.size} inputs")
      // reassemble by the response's own index field (the API may reorder)
      val byIndex = new Array[Array[Float]](texts.size)
      data.forEach { node =>
        val i = node.get("index").asInt
        val emb = node.get("embedding")
        val v = new Array[Float](emb.size)
        var j = 0
        while (j < emb.size) { v(j) = emb.get(j).floatValue; j += 1 }
        byIndex(i) = v
      }
      byIndex.toSeq
    } finally conn.disconnect()
  }
}

object Embedder {

  /** Distributed application: batch the text column inside each partition
    * and append `outCol: array<float>`. One embedder per task (the
    * reference's client-per-worker thread-safety rule), `batchSize` texts
    * per request (the reference batches chunk lists the same way). The
    * operator is a narrow mapPartitions — no shuffle, scales with the
    * corpus partitioning; at 100 TB the only knob that matters is
    * batchSize × partition count against the endpoint's rate limit. */
  def embedColumn(df: DataFrame, textCol: String, embedder: Embedder,
      batchSize: Int = 64, outCol: String = "embedding"): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(FloatType))
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val vecs = embedder.embedBatch(rows.map(_.getString(idx)))
        require(vecs.size == rows.size,
          s"embedder returned ${vecs.size} vectors for ${rows.size} texts; " +
            "a short batch would silently drop rows via zip truncation")
        rows.lazyZip(vecs).map((r, v) => Row.fromSeq(r.toSeq :+ v.toSeq))
      }
    }(Encoders.row(schema))
  }
}
