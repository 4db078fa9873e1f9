package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.operators.{HttpSummarizerClient, Llm}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue
import org.scalatest.funsuite.AnyFunSuite

/** HttpSummarizerClient against a localhost OpenAI-compatible stub server:
  * request shape (model, message, auth header), response parse, token-cost
  * accounting, and the full distributed path through Llm.summarize's
  * mapPartitions (client constructed per partition, executor-side). */
class HttpSummarizerSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  /** One-endpoint stub: echoes the prompt's last word into the summary and
    * reports fixed usage. Records request bodies + auth headers. */
  private def withServer(f: (String, ConcurrentLinkedQueue[(String, String)]) => Unit): Unit = {
    val seen = new ConcurrentLinkedQueue[(String, String)]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/chat/completions", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        seen.add((body, ex.getRequestHeaders.getFirst("Authorization")))
        val word = body.split(" ").last.takeWhile(_.isLetterOrDigit)
        val resp =
          s"""{"choices":[{"message":{"content":"{\\"summary\\": \\"about $word\\"}"}}],
             |"usage":{"prompt_tokens":100,"completion_tokens":7}}""".stripMargin
        val bytes = resp.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat/completions", seen)
    finally server.stop(0)
  }

  test("request shape, response parse, and token-cost accounting") {
    withServer { (url, seen) =>
      val client = new HttpSummarizerClient(url, "test-model", "sk-local",
        inPricePerToken = 1e-6, outPricePerToken = 2e-6)
      val (out, cost) = client.summarizeBatch(
        Seq("Summarize: alpha", "Summarize: beta"), Seq("alpha", "beta"))
      assert(out == Seq("{\"summary\": \"about alpha\"}",
        "{\"summary\": \"about beta\"}"))
      // 2 × (100 in × 1e-6 + 7 out × 2e-6)
      assert(math.abs(cost - 2 * (100e-6 + 14e-6)) < 1e-12)
      val reqs = seen.toArray(Array.empty[(String, String)])
      assert(reqs.length == 2)
      assert(reqs.forall(_._2 == "Bearer sk-local"))
      assert(reqs.forall(_._1.contains("\"model\":\"test-model\"")))
      assert(reqs.forall(_._1.contains("\"response_format\":{\"type\":\"json_object\"}")))
    }
  }

  /** Stub whose first responses follow `statuses`, then 200s. */
  private def withFlakyServer(statuses: Seq[Int])(f: (String, java.util.concurrent.atomic.AtomicInteger) => Unit): Unit = {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/chat/completions", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val i = hits.getAndIncrement()
        val status = if (i < statuses.length) statuses(i) else 200
        val resp = if (status == 200)
          """{"choices":[{"message":{"content":"ok"}}],
            |"usage":{"prompt_tokens":10,"completion_tokens":1}}""".stripMargin
        else """{"error":"nope"}"""
        val bytes = resp.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat/completions", hits)
    finally server.stop(0)
  }

  test("429/5xx retry with exponential backoff, then succeed") {
    withFlakyServer(Seq(429, 503)) { (url, hits) =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val client = new HttpSummarizerClient(url, "m", "k",
        inPricePerToken = 1e-6, backoffMillis = 250L, sleeper = sleeps += _)
      val (out, cost) = client.summarizeBatch(Seq("p"), Seq("d"))
      assert(out == Seq("ok"))
      assert(hits.get() == 3)
      assert(sleeps.toSeq == Seq(250L, 500L), "backoff schedule drifted")
      // only the successful attempt accrues cost
      assert(math.abs(cost - 10e-6) < 1e-12)
    }
  }

  test("non-transient 4xx fails fast without retry or sleep") {
    withFlakyServer(Seq(400)) { (url, hits) =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val client = new HttpSummarizerClient(url, "m", "k",
        sleeper = sleeps += _)
      val e = intercept[java.io.IOException](
        client.summarizeBatch(Seq("p"), Seq("d")))
      assert(e.getMessage.contains("400"))
      assert(hits.get() == 1 && sleeps.isEmpty)
    }
  }

  test("retry budget exhausts with a terminal failure") {
    withFlakyServer(Seq(500, 500, 500, 500)) { (url, hits) =>
      val client = new HttpSummarizerClient(url, "m", "k",
        maxRetries = 2, sleeper = _ => ())
      val e = intercept[java.io.IOException](
        client.summarizeBatch(Seq("p"), Seq("d")))
      assert(e.getMessage.contains("after 3 attempts"))
      assert(hits.get() == 3)
    }
  }

  test("drives Llm.summarize end-to-end (per-partition client, from_json parse)") {
    withServer { (url, _) =>
      import spark.implicits._
      val docs = Seq((1L, "SYM/1", "text one"), (2L, "SYM/2", "text two"))
        .toDF("id", "symbol", "text")
      val acc = spark.sparkContext.doubleAccumulator("http_llm_cost")
      // no orderBy here: range-partitioner sampling would evaluate the
      // mapPartitions twice and double-count the cost accumulator (the
      // documented best-effort caveat in Llm.summarize) — sort driver-side
      val out = Llm.summarize(docs,
          () => new HttpSummarizerClient(url, "test-model", "sk-local",
            inPricePerToken = 1e-6),
          batchSize = 8, cost = acc)
        .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
      assert(out == Seq((1L, "SYM/1", "about one"), (2L, "SYM/2", "about two")))
      assert(math.abs(acc.value - 2 * 100e-6) < 1e-12)
    }
  }
}
