package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.ops.NetOps
import graft.pipeline.{Embedder, HttpEmbedder}
import graft.sources.{BlobSink, UrlSource}

/** The network family (S6/S9/V2) against a spec-local loopback server:
  * real streamed GET/PUT/POST wire code, with the failure semantics the
  * reference's `requests`/SDK stack provides — raise-for-status, redirect
  * following, transient-retry, and the embedder's degrade-to-empty. */
class NetIngestSpec extends SparkTestBase {
  import spark.implicits._

  /** Tiny spec server: each context handler is a plain function. */
  private def withServer(routes: (String, HttpExchange => (Int, Array[Byte]))*)(
      body: String => Unit): Unit = {
    val s = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) =>
      s.createContext(path, (ex: HttpExchange) => {
        val (code, out) = h(ex)
        // 3xx responses need Location set by the handler before this call
        ex.sendResponseHeaders(code, if (out.isEmpty) -1 else out.length)
        if (out.nonEmpty) ex.getResponseBody.write(out)
        ex.close()
      })
    }
    s.start()
    try body(s"http://127.0.0.1:${s.getAddress.getPort}")
    finally s.stop(0)
  }

  private def tmpDir(): String =
    Files.createTempDirectory("net_spec").toString

  test("UrlSource.download streams the body and names the file from the URL") {
    val payload = "k,v\n1,a\n2,b\n".getBytes(StandardCharsets.UTF_8)
    withServer("/data.csv" -> (_ => (200, payload))) { base =>
      val out = UrlSource.download(s"$base/data.csv?sig=abc", tmpDir())
      assert(new File(out).getName == "data.csv") // query string stripped
      assert(Files.readAllBytes(new File(out).toPath).sameElements(payload))
    }
  }

  test("UrlSource raises for terminal 4xx without retrying") {
    val hits = new AtomicInteger(0)
    withServer("/missing.csv" -> (_ => {
      hits.incrementAndGet(); (404, "nope".getBytes)
    })) { base =>
      val e = intercept[java.io.IOException] {
        UrlSource.download(s"$base/missing.csv", tmpDir())
      }
      assert(e.getMessage.contains("404"))
      assert(hits.get == 1, "a 404 is an answer, not a transient")
    }
  }

  test("UrlSource retries transient 5xx and succeeds on a later attempt") {
    val hits = new AtomicInteger(0)
    withServer("/flaky.csv" -> (_ =>
      if (hits.incrementAndGet() < 3) (503, Array.empty[Byte])
      else (200, "k\n7\n".getBytes))) { base =>
      val out = UrlSource.download(s"$base/flaky.csv", tmpDir())
      assert(hits.get == 3)
      assert(new String(Files.readAllBytes(new File(out).toPath)) == "k\n7\n")
    }
  }

  test("UrlSource gives up after maxAttempts transient failures") {
    val hits = new AtomicInteger(0)
    withServer("/down.csv" -> (_ => {
      hits.incrementAndGet(); (500, Array.empty[Byte])
    })) { base =>
      intercept[java.io.IOException] {
        UrlSource.download(s"$base/down.csv", tmpDir(), maxAttempts = 2)
      }
      assert(hits.get == 2)
    }
  }

  test("UrlSource follows redirects to the relocated resource") {
    val payload = "k\n42\n".getBytes
    withServer(
      "/old.csv" -> (ex => {
        ex.getResponseHeaders.set("Location", "/new.csv"); (302, Array.empty)
      }),
      "/new.csv" -> (_ => (200, payload))) { base =>
      val out = UrlSource.download(s"$base/old.csv", tmpDir())
      assert(new File(out).getName == "old.csv") // named from the REQUESTED url
      assert(Files.readAllBytes(new File(out).toPath).sameElements(payload))
    }
  }

  test("readUrl dispatches the downloaded file through the format readers") {
    val payload = "Loan ID,Amount\nL1,100\nL2,250\n".getBytes
    withServer("/loans.csv" -> (_ => (200, payload))) { base =>
      val df = UrlSource.readUrl(spark, s"$base/loans.csv", tmpDir())
      assert(df.columns.toSeq == Seq("loan_id", "amount")) // cleaned names
      assert(df.agg(sum("amount")).head.getLong(0) == 350L)
    }
  }

  test("BlobSink.uploadPut streams the exact bytes and honours status") {
    val stored = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]
    withServer(
      "/blob/" -> (ex => ex.getRequestMethod match {
        case "PUT" =>
          stored.put(ex.getRequestURI.getPath, ex.getRequestBody.readAllBytes())
          (201, Array.empty[Byte])
        case _ => (405, Array.empty[Byte])
      }),
      "/forbidden/" -> (ex => {
        ex.getRequestBody.readAllBytes(): Unit
        (403, Array.empty[Byte])
      })) { base =>
      val src = Files.createTempFile("blob", ".bin")
      val bytes = Array.tabulate[Byte](100000)(i => (i * 31).toByte)
      Files.write(src, bytes)
      val url = BlobSink.uploadPut(src.toString, s"$base/blob/out.bin")
      assert(url.endsWith("/blob/out.bin")) // the reference returns the URI
      assert(stored.get("/blob/out.bin").sameElements(bytes))
      // a rejected upload throws (raise-for-status)
      val e = intercept[java.io.IOException] {
        BlobSink.uploadPut(src.toString, s"$base/forbidden/out.bin")
      }
      assert(e.getMessage.contains("403"))
    }
  }

  test("HttpEmbedder posts OpenAI-wire batches and reassembles by index") {
    import com.fasterxml.jackson.databind.ObjectMapper
    val seenBatches = new AtomicInteger(0)
    withServer("/v1/embeddings" -> (ex => {
      val m = new ObjectMapper
      val req = m.readTree(ex.getRequestBody)
      seenBatches.incrementAndGet()
      val resp = m.createObjectNode
      val data = resp.putArray("data")
      val n = req.get("input").size
      // REVERSED index order: the client must reassemble by index
      for (i <- (n - 1) to 0 by -1) {
        val item = data.addObject()
        item.put("index", i)
        val emb = item.putArray("embedding")
        emb.add(req.get("input").get(i).asText.length.toDouble)
        emb.add(i.toDouble)
      }
      (200, m.writeValueAsBytes(resp))
    })) { base =>
      val embedder = HttpEmbedder(s"$base/v1/embeddings", "m", dim = 2)
      val texts = Seq("a", "bb", "ccc")
      val vecs = embedder.embedBatch(texts)
      assert(vecs.map(_.toSeq) ==
        Seq(Seq(1f, 0f), Seq(2f, 1f), Seq(3f, 2f)))
      // distributed face: every row gets its own vector, order-aligned
      val df = Seq((1L, "x"), (2L, "yy"), (3L, "zzz"), (4L, "wwww"))
        .toDF("id", "txt")
      val out = Embedder.embedColumn(df, "txt", embedder, batchSize = 2)
        .select(col("id"), col("embedding").getItem(0).as("len"))
        .as[(Long, Float)].collect().toMap
      assert(out == Map(1L -> 1f, 2L -> 2f, 3L -> 3f, 4L -> 4f))
    }
  }

  test("HttpEmbedder degrades a failing batch to empty vectors, not a throw") {
    withServer("/v1/embeddings" -> (_ => (500, Array.empty[Byte]))) { base =>
      val embedder = HttpEmbedder(s"$base/v1/embeddings", "m", dim = 2,
        maxAttempts = 2)
      val vecs = embedder.embedBatch(Seq("a", "b"))
      assert(vecs.size == 2 && vecs.forall(_.isEmpty))
    }
  }

  test("HttpEmbedder retries a transient failure before succeeding") {
    import com.fasterxml.jackson.databind.ObjectMapper
    val hits = new AtomicInteger(0)
    withServer("/v1/embeddings" -> (ex => {
      val m = new ObjectMapper
      val req = m.readTree(ex.getRequestBody)
      if (hits.incrementAndGet() == 1) (503, Array.empty[Byte])
      else {
        val resp = m.createObjectNode
        val data = resp.putArray("data")
        for (i <- 0 until req.get("input").size) {
          val item = data.addObject()
          item.put("index", i)
          item.putArray("embedding").add(9.0)
        }
        (200, m.writeValueAsBytes(resp))
      }
    })) { base =>
      val vecs = HttpEmbedder(s"$base/v1/embeddings", "m", dim = 1)
        .embedBatch(Seq("t"))
      assert(hits.get == 2)
      assert(vecs.head.toSeq == Seq(9f))
    }
  }

  test("driver faces roundtrip through the shared loopback fixture") {
    // S6: the orders parquet served over HTTP equals the local aggregate
    val urlAgg = NetOps.qUrlIngest(spark, sf).head
    val localAgg = graft.ops.Tables.t(spark, sf, "orders").agg(
      count(lit(1)), sum(col("o_orderkey").cast("long"))).head
    assert(urlAgg.getLong(0) == localAgg.getLong(0))
    assert(urlAgg.getLong(1) == localAgg.getLong(1))

    // S9: blob PUT + GET roundtrip preserves the aggregate
    val blob = NetOps.qBlobPutRoundtrip(spark, sf)
    val direct = graft.ops.Tables.t(spark, sf, "orders")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n_orders"))
    assert(blob.select("o_orderstatus", "n_orders").collect().map(r =>
      r.getString(0) -> r.getLong(1)).toMap ==
      direct.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)

    // V2: the embed face's checksum equals the formula, computed directly
    import NetOps.LoopbackHttp._
    val got = NetOps.qHttpEmbed(spark, sf)
      .select("doc_id", "n_dims", "vsum")
      .as[(Long, Int, Long)].collect()
    assert(got.nonEmpty && got.forall(_._2 == Dim))
    got.take(20).foreach { case (id, _, vsum) =>
      val expect = (0L until Dim).map(i =>
        math.floorMod(id * A + i * B, P) - OFF).sum
      assert(vsum == expect, s"doc $id")
    }
  }
}
