package graft.operators

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Production-shaped [[Llm.SummarizerClient]]: an OpenAI-compatible
  * chat-completions HTTP client — the engine-side equivalent of the
  * reference's `ChatOpenAI(model="gpt-5-mini", temperature=0.0)` +
  * LangChain `.batch()` call
  * (`/root/reference/decisions-summaries/generate_conclusions_summaries.py:102-117`).
  *
  * Construction happens EXECUTOR-side via the factory passed to
  * [[Llm.summarize]] — one client (and one connection pool) per partition,
  * never a driver-serialized instance. Prompts within a batch are sent
  * sequentially; at scale, concurrency comes from partition parallelism
  * (1000 executors ⇒ 1000 concurrent streams), which also gives the
  * rate-limit governor a single obvious knob (partition count).
  *
  * Cost replicates the reference's `cb.total_cost` accounting: usage
  * tokens × caller-supplied per-token prices, accumulated per batch.
  *
  * The response `content` is expected to BE the structured `{"summary"}`
  * JSON (the reference binds a structured-output schema, `:99-100`);
  * it is returned verbatim for [[Llm.summarize]]'s `from_json` parse, so
  * a malformed model reply degrades to a NULL summary row, never a crash.
  *
  * Transient failures (HTTP 429 / 5xx, connect/IO errors) retry in place
  * with bounded exponential backoff — IMPORTANT at scale because the
  * alternative is a Spark task retry, which replays EVERY earlier prompt
  * in the partition against the paid endpoint and re-accrues their cost.
  * Non-transient 4xx fail fast (a bad request never heals). If all
  * `maxRetries` retries exhaust, the task DOES fail and the batch-replay
  * caveat applies; only successful responses accrue cost. `sleeper` is
  * injectable so specs can pin the backoff schedule without waiting.
  */
final class HttpSummarizerClient(
    endpoint: String,
    model: String,
    apiKey: String,
    inPricePerToken: Double = 0.0,
    outPricePerToken: Double = 0.0,
    timeout: Duration = Duration.ofSeconds(60),
    maxRetries: Int = 3,
    backoffMillis: Long = 250L,
    sleeper: Long => Unit = Thread.sleep) extends Llm.SummarizerClient {

  @transient private lazy val http: HttpClient =
    HttpClient.newBuilder().connectTimeout(timeout).build()
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  private def requestBody(prompt: String): String = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    root.put("temperature", 0.0)
    val msgs = root.putArray("messages")
    val m = msgs.addObject()
    m.put("role", "user")
    m.put("content", prompt)
    root.putObject("response_format").put("type", "json_object")
    mapper.writeValueAsString(root)
  }

  /** content of choices[0].message + (prompt_tokens, completion_tokens). */
  private def parse(body: String): (String, Long, Long) = {
    val root = mapper.readTree(body)
    val content = root.path("choices").path(0).path("message")
      .path("content").asText("")
    val usage = root.path("usage")
    (content,
      usage.path("prompt_tokens").asLong(0L),
      usage.path("completion_tokens").asLong(0L))
  }

  private def transient(status: Int): Boolean =
    status == 429 || status / 100 == 5

  /** One prompt with bounded-backoff retry on 429/5xx/IO errors; returns
    * the response body of the first 2xx. Throws after `maxRetries`
    * retries, or immediately on a non-transient 4xx. */
  private def sendWithRetry(p: String): String = {
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(timeout)
      .header("Content-Type", "application/json")
      .header("Authorization", s"Bearer $apiKey")
      .POST(HttpRequest.BodyPublishers.ofString(requestBody(p)))
      .build()
    var attempt = 0
    while (true) {
      val failure: Either[Throwable, Int] =
        try {
          val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
          if (resp.statusCode() / 100 == 2) return resp.body()
          if (!transient(resp.statusCode()))
            throw new java.io.IOException(
              s"summarizer endpoint returned HTTP ${resp.statusCode()} (not retryable)")
          Right(resp.statusCode())
        } catch {
          case e: java.io.IOException if e.getMessage != null &&
              e.getMessage.contains("not retryable") => throw e
          case e: java.io.IOException => Left(e)
          case e: InterruptedException => throw e
        }
      if (attempt >= maxRetries)
        throw new java.io.IOException(
          s"summarizer endpoint failed after ${attempt + 1} attempts: " +
            failure.fold(_.toString, s => s"HTTP $s"))
      sleeper(backoffMillis << attempt)
      attempt += 1
    }
    throw new IllegalStateException("unreachable")
  }

  override def summarizeBatch(prompts: Seq[String],
                              docs: Seq[String]): (Seq[String], Double) = {
    var cost = 0.0
    val out = prompts.map { p =>
      val (content, inToks, outToks) = parse(sendWithRetry(p))
      cost += inToks * inPricePerToken + outToks * outPricePerToken
      content
    }
    (out, cost)
  }
}
