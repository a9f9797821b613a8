package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Production-shaped [[BulkClient]] over `java.net.http`: the reference's
  * Elasticsearch bulk delivery (ElasticSearchConsumer.java:42-56) —
  * build one bulk request for the chunk, write it, and only return (letting
  * the caller commit offsets) after the store acknowledged every item.
  *
  * Request shape is the ES bulk NDJSON contract: an `index` action line
  * carrying `_index`/`_id` (the idempotent doc id, ElasticSearchConsumer
  * .java:45) followed by the document source, one pair per doc. Any
  * non-2xx response, or a 2xx envelope flagging per-item errors, throws —
  * failing the micro-batch BEFORE the checkpoint commits, so the replay
  * re-upserts the same ids (effectively-once).
  *
  * Instances are cheap and serializable (the JDK client is rebuilt lazily
  * per JVM), so `() => new HttpBulkClient(...)` works as the executor-side
  * factory for [[IdempotentBulkSink.writeBatchDistributed]].
  */
class HttpBulkClient(endpoint: String, index: String,
                     connectTimeoutMs: Long = 5000,
                     requestTimeoutMs: Long = 30000) extends BulkClient {

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(connectTimeoutMs))
    .build()

  override def bulkUpsert(docs: Seq[(String, String)]): Unit = {
    if (docs.isEmpty) return
    val body = docs.map { case (id, json) =>
      s"""{"index":{"_index":"$index","_id":"${escapeJson(id)}"}}""" + "\n" + json
    }.mkString("", "\n", "\n")
    val req = HttpRequest.newBuilder()
      .uri(URI.create(s"$endpoint/_bulk"))
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .header("Content-Type", "application/x-ndjson")
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      sys.error(s"bulk write failed: HTTP ${resp.statusCode()}: " +
        resp.body().take(500))
    // ES signals per-item failures inside a 200 envelope. Parse the
    // TOP-LEVEL `errors` field (anchored to the envelope prefix, any JSON
    // whitespace around the colon) rather than substring-matching the
    // whole body: an echoed document containing the text "errors":true
    // must not fail a healthy batch into a permanent replay loop.
    if (envelopeHasErrors(resp.body()))
      sys.error(s"bulk write had item errors: ${resp.body().take(500)}")
  }

  /** True iff the bulk response envelope's top-level `errors` field is
    * true. ES conventionally emits `{"took":N,"errors":BOOL,"items":[…]}`
    * but JSON key order is NOT contractual (OpenSearch, proxies), so this
    * walks the whole body tracking string/brace/bracket nesting and only
    * matches `"errors": true` at depth 1 — an echoed document containing
    * the text cannot false-positive (it sits at depth ≥ 2 or in a
    * string), and `errors` AFTER `items` is still seen. */
  private[graft] def envelopeHasErrors(body: String): Boolean = {
    var depth = 0
    var inStr = false
    var esc = false
    var i = 0
    val key = "\"errors\""
    while (i < body.length) {
      val c = body.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
        i += 1
      } else c match {
        case '{' | '[' => depth += 1; i += 1
        case '}' | ']' => depth -= 1; i += 1
        case '"' if depth == 1 && body.startsWith(key, i) =>
          var j = i + key.length
          while (j < body.length && body.charAt(j).isWhitespace) j += 1
          if (j < body.length && body.charAt(j) == ':') {
            j += 1
            while (j < body.length && body.charAt(j).isWhitespace) j += 1
            if (body.startsWith("true", j)) return true
          }
          i += key.length
        case '"' => inStr = true; i += 1
        case _ => i += 1
      }
    }
    false
  }

  /** JSON-string escaping for the action line. Control characters matter
    * as much as quotes: a raw newline in a doc id would split the NDJSON
    * action line and corrupt the bulk framing. */
  private def escapeJson(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"' => sb.append("\\\"")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }
}
