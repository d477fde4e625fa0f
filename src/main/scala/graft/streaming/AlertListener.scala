package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming-side alert channel (the send_error path of
  * transfer_manager.py:233-246, where any operational failure posts a
  * `{"text": ...}` payload to a Slack webhook): a [[StreamingQueryListener]]
  * that turns query terminations-with-exception into alert payloads of the
  * same shape. The queue stands in for the webhook POST — a deployment
  * drains it to Slack/pager; specs read it directly.
  *
  * Register with `spark.streams.addListener(new AlertListener)`.
  */
class AlertListener extends StreamingQueryListener {

  /** Collected alert payloads, Slack-webhook shaped. */
  val alerts = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  override def onQueryStarted(
    event: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
    event: StreamingQueryListener.QueryProgressEvent): Unit = ()

  override def onQueryTerminated(
    event: StreamingQueryListener.QueryTerminatedEvent): Unit =
    event.exception.foreach { err =>
      val text = s"Streaming query ${event.id} failed: $err"
        .replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", " ").replace("\r", " ")
      alerts.add(s"""{"text": "$text"}""")
    }
}
