package graft.sources

import org.apache.spark.sql.DataFrame
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** REST tier of [[ActionSink]]: the reference's real output surface — the
  * CKAN action API, one JSON POST per entity
  * (`/root/reference/odgovlt.py:407` `_create_or_update_package`;
  * `odgovlt.py:281,287,318` group patch/create/delete; `odgovlt.py:379`
  * `organization_member_create`). Endpoint shape: POST
  * `{baseUrl}/{entity}_{create|update|delete}` with the row as the JSON
  * body, the key riding inside the body as `{idField}` — exactly the CKAN
  * convention.
  *
  * Execution shape (the part the reference, a per-row driver loop, does not
  * have): `foreachPartition` — every partition opens ONE keep-alive client
  * and streams its rows in [[batchSize]] chunks, so N executors × M
  * partitions POST concurrently while per-task buffering stays bounded.
  * Rows are serialized by the engine (`df.toJSON`) before the sink sees
  * them, so the HTTP loop never touches Spark rows.
  *
  * Idempotency by guid (what makes Spark task retries safe):
  *  - create → HTTP 409 (already exists) falls through to `{entity}_update`
  *    — a replayed create converges instead of failing, the reference's
  *    create-or-update;
  *  - update → HTTP 404 (vanished) falls through to `{entity}_create` —
  *    the reference's show→NotFound→create probe, direction reversed;
  *  - delete → HTTP 404 counts as success (already gone).
  *
  * Transient failures (I/O errors and 5xx) retry up to [[maxRetries]] with
  * exponential backoff; exhaustion throws, failing the task so Spark's own
  * retry ladder takes over — safe because every call is idempotent.
  */
final case class HttpSink(
    baseUrl: String,
    entity: String = "package",
    idField: String = "id",
    apiKey: Option[String] = None,
    batchSize: Int = 100,
    maxRetries: Int = 3,
    retryBaseMs: Long = 50L,
    timeoutMs: Long = 30000L) extends ActionSink {

  import HttpSink._

  override def create(df: DataFrame): Unit =
    post(df.toJSON, s"${entity}_create", fallbackOn = 409,
      fallback = Some(s"${entity}_update"))

  override def update(df: DataFrame): Unit =
    post(df.toJSON, s"${entity}_update", fallbackOn = 404,
      fallback = Some(s"${entity}_create"))

  override def delete(df: DataFrame): Unit = {
    // key column → {"<idField>": key} body; 404 = already gone = success
    val keyed = df.withColumnRenamed(df.schema.fieldNames.head, idField)
    post(keyed.toJSON, s"${entity}_delete", fallbackOn = 404, fallback = None)
  }

  /** POST every JSON row to `{baseUrl}/{action}`; on `fallbackOn` re-POST
    * the same body to the fallback action (or succeed if none).
    */
  private def post(rows: org.apache.spark.sql.Dataset[String], action: String,
      fallbackOn: Int, fallback: Option[String]): Unit = {
    val (base, key, batch, retries, backoff, timeout) =
      (baseUrl, apiKey, batchSize, maxRetries, retryBaseMs, timeoutMs)
    val fb = fallback
    rows.foreachPartition { it: Iterator[String] =>
      if (it.nonEmpty) {
        val client = HttpClient.newBuilder()
          .connectTimeout(Duration.ofMillis(timeout)).build()
        it.grouped(batch).foreach { chunk =>
          // chunk boundary = backpressure unit: a real deployment hooks
          // flow-control / progress reporting here without holding more
          // than `batch` bodies in flight
          chunk.foreach { body =>
            val status = send(client, base, action, body, key, retries,
              backoff, timeout)
            if (status == fallbackOn) {
              fb.foreach { fbAction =>
                val st2 = send(client, base, fbAction, body, key, retries,
                  backoff, timeout)
                if (st2 / 100 != 2) throw new java.io.IOException(
                  s"$fbAction fallback after $action=$fallbackOn returned $st2")
              }
            } else if (status / 100 != 2) throw new java.io.IOException(
              s"$action returned $status")
          }
        }
      }
    }
  }
}

object HttpSink {

  /** One POST with bounded retry. Returns the final HTTP status; transient
    * failures (connect/send errors, 5xx) retry with exponential backoff and
    * the last status (or a thrown I/O error) surfaces after `maxRetries`.
    * 4xx is NEVER retried — it is a semantic answer (exists / not found)
    * the caller routes on.
    */
  private[sources] def send(client: HttpClient, baseUrl: String,
      action: String, body: String, apiKey: Option[String], maxRetries: Int,
      retryBaseMs: Long, timeoutMs: Long): Int = {
    val b = HttpRequest.newBuilder(URI.create(s"$baseUrl/$action"))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
    apiKey.foreach(k => b.header("Authorization", k))
    val req = b.build()
    var attempt = 0
    var status = -1
    var lastErr: Throwable = null
    while (attempt <= maxRetries && (status < 0 || status / 100 == 5)) {
      if (attempt > 0) Thread.sleep(retryBaseMs << (attempt - 1))
      try {
        status = client.send(req, HttpResponse.BodyHandlers.discarding()).statusCode()
        lastErr = null
        if (status / 100 != 5) return status
      } catch {
        case e: java.io.IOException => lastErr = e; status = -1
        case e: InterruptedException => throw e
      }
      attempt += 1
    }
    if (lastErr != null)
      throw new java.io.IOException(s"$action failed after $maxRetries retries", lastErr)
    status
  }
}
