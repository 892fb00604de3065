package graft

import scala.util.control.NonFatal

/** Driver-side webhook notification — parity with the reference's
  * Slack-webhook step (`pipeline.py:123-139`,
  * `scrapers/team_scraper.py` `send_notification`): on pipeline
  * completion POST a `{"text": ...}` JSON message to a configured
  * webhook URL; on failure POST the error. Deliberately OUT of the
  * query engine: it is a driver-side side effect that runs after the
  * Spark actions, moves only the one-line stats summary, and a down
  * webhook must never fail the pipeline (send errors are swallowed —
  * the reference's posture).
  *
  * The URL arrives as an explicit `Pipeline.Config` parameter, not an
  * env read inside the engine (same determinism posture as `today`);
  * callers wire `sys.env.get("SLACK_WEBHOOK_URL")` through if they
  * want the reference's env contract.
  */
object Notify {

  /** Slack-style payload with full JSON string escaping. */
  def jsonPayload(message: String): String =
    "{\"text\":\"" + message.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\"}"

  /** Reference success message (`pipeline.py:126`). */
  def successMessage(stats: Pipeline.Stats): String =
    s"✅ Football ETL pipeline completed! Processed " +
      s"${stats.fixturesCount} fixtures and ${stats.teamsCount} teams."

  /** Reference failure message (`pipeline.py:136-139`). */
  def errorMessage(error: Throwable): String =
    s"❌ Football ETL pipeline failed: ${error.getMessage}"

  /** POST the message; returns the HTTP status, or None if the send
    * failed (never throws — a notification must not kill the run).
    */
  def send(message: String, webhookUrl: String,
           timeoutMs: Int = 5000): Option[Int] =
    try {
      val url = java.net.URI.create(webhookUrl).toURL
      val conn = url.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      val body = jsonPayload(message)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val out = conn.getOutputStream
      try out.write(body) finally out.close()
      val status = conn.getResponseCode
      conn.disconnect()
      Some(status)
    } catch {
      case NonFatal(_) => None
    }
}
