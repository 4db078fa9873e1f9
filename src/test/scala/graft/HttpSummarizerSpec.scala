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
