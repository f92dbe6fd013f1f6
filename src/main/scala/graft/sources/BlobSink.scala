package graft.sources

import java.io.{File, FileInputStream}
import java.net.{HttpURLConnection, URI}

/** S9: blob upload sink. The reference uploads the converted parquet file
  * to Azure Blob Storage via the SDK (`ingestion_pipeline_langgraph.py:
  * 106-135`: `upload_blob(name=…, data=f, overwrite=True)` → returns the
  * blob URI). The SDK-free public equivalent — identical on the wire for
  * S3/GCS/Azure presigned URLs — is a streamed HTTP PUT of the file body to
  * the destination URL; that is what ships here. Cloud-SDK auth flows stay
  * out of scope (no egress in this environment); for cluster-native bulk
  * writes the engine's parquet sinks already target any Hadoop-FS URI.
  *
  * Scale note: like the reference's, this is a per-file driver-side upload
  * (one converted artifact per ingest request), not a data-plane writer.
  */
object BlobSink {

  private val chunkBytes = 8192

  /** Stream `localPath` to `url` with an HTTP PUT (overwrite semantics —
    * the reference passes `overwrite=True`). Returns the destination URL,
    * mirroring the reference's returned blob URI. Throws on any non-2xx. */
  def uploadPut(localPath: String, url: String,
      contentType: String = "application/octet-stream",
      connectTimeoutMs: Int = 30000, readTimeoutMs: Int = 300000): String = {
    val f = new File(localPath)
    require(f.isFile, s"upload source is not a file: $localPath")
    val conn = new URI(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setDoOutput(true)
    conn.setRequestMethod("PUT")
    conn.setRequestProperty("Content-Type", contentType)
    // streaming mode: the body is never buffered in memory, so a multi-GB
    // parquet file uploads in constant space
    conn.setFixedLengthStreamingMode(f.length())
    try {
      val in = new FileInputStream(f)
      val out = conn.getOutputStream
      try {
        val buf = new Array[Byte](chunkBytes)
        var n = in.read(buf)
        while (n >= 0) {
          if (n > 0) out.write(buf, 0, n)
          n = in.read(buf)
        }
      } finally { out.close(); in.close() }
      val code = conn.getResponseCode
      if (code < 200 || code >= 300)
        throw new java.io.IOException(s"HTTP $code uploading to $url")
      url
    } finally conn.disconnect()
  }
}
