package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.MetricRow

/** Remote-diagnostics TRANSPORT — the POST/response loop of the
  * reference's `DiagnosticsRequester` (`diagnostics/requester.py:29-36`):
  * serialize the table list as JSON, POST it, fail on non-2xx, hand the
  * body to [[RemoteMetrics.parse]].
  *
  * SECURITY DIVERGENCE, deliberate: the reference's payload is
  * `{**session_info, "tables": [...]}` where session_info carries the
  * caller's AWS access key, secret key, and session token
  * (`manager.py:127-138`) — live credentials posted to a third-party
  * endpoint. This mirror posts ONLY `{"tables": [...]}`; no credential
  * is ever gathered, serialized, or sent, and there is no default URL.
  * RemoteMetricsSpec drives the full loop against a loopback fixture
  * server and asserts the outbound body contains no credential fields.
  *
  * A transport failure (connect error, timeout, non-2xx) lands EVERY
  * requested table on the error channel — the reference raises
  * `RequestHandlingError(data["tables"], e)`; this engine's house rule
  * (same as parse's malformed channel) is to report, not raise, so one
  * dead endpoint doesn't abort a multi-catalog diagnosis.
  */
object RemoteRequester {

  /** `{"tables": [...]}` with minimal JSON string escaping. */
  def jsonPayload(tables: Seq[String]): String = {
    val esc = tables.map(t =>
      "\"" + t.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
    s"""{"tables":[${esc.mkString(",")}]}"""
  }

  /** One POST; Right(body) on 2xx, Left(reason) otherwise. */
  def post(url: String, tables: Seq[String],
      timeoutMs: Long = 30000L): Either[String, String] =
    try {
      val client = HttpClient.newBuilder()
        .connectTimeout(Duration.ofMillis(timeoutMs)).build()
      val req = HttpRequest.newBuilder(URI.create(url))
        .header("Content-Type", "application/json")
        .timeout(Duration.ofMillis(timeoutMs))
        .POST(HttpRequest.BodyPublishers.ofString(jsonPayload(tables), UTF_8))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 == 2) Right(resp.body())
      else Left(s"HTTP ${resp.statusCode()}")
    } catch {
      case e: Exception => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  /** Full loop: POST the table list, parse the response document into
    * the 9-metric rows + error channel. */
  def requestMetrics(spark: SparkSession, url: String, tables: Seq[String],
      timeoutMs: Long = 30000L): (Dataset[MetricRow], Dataset[(String, String)]) = {
    import spark.implicits._
    post(url, tables, timeoutMs) match {
      case Right(body) => RemoteMetrics.parse(spark.createDataset(Seq(body)))
      case Left(err) =>
        (spark.emptyDataset[MetricRow],
          tables.map(t => (t, s"request failed: $err")).toDS())
    }
  }
}
