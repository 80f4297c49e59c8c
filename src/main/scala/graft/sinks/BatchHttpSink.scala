package graft.sinks

import scala.collection.mutable.ListBuffer

/** Row-buffering HTTP sink: flush at `maxBatchSize` and on close; the
  * payload is `mkString(prefix, sep, suffix)` — newline-joined for Influx
  * line protocol, JSON array for OpenTSDB (reference:
  * src/main/scala/com/mozilla/telemetry/sinks/CrashesBatchHttpSink.scala:10-54).
  */
class BatchHttpSink(
    val url: String,
    val maxBatchSize: Int = 1,
    val prefix: String = "",
    val sep: String = "\n",
    val suffix: String = "",
    val config: HttpSink.Config = HttpSink.Config())
  extends HttpSink[String] {

  private[sinks] val buffer = new ListBuffer[String]()

  override def buildRequest(value: String): HttpRequestSpec =
    HttpRequestSpec(url, body = Some(value))

  override def process(value: String): Unit = {
    buffer += value
    if (buffer.length >= maxBatchSize) flush()
  }

  override def close(errorOrNull: Throwable): Unit = {
    if (errorOrNull == null && buffer.nonEmpty) flush()
  }

  def flush(): Unit = {
    val payload = buffer.mkString(prefix, sep, suffix)
    buffer.clear()
    attempt(payload, HttpRequestSpec(url, body = Some(payload)))
  }
}

/** TestTube enrollment sink: wraps each row as `{"enrollment":[row]}`
  * (reference: src/main/scala/com/mozilla/telemetry/sinks/TestTubeHttpSink.scala:8-19).
  */
class TestTubeHttpSink(val url: String, val config: HttpSink.Config = HttpSink.Config())
  extends HttpSink[String] {
  override def buildRequest(value: String): HttpRequestSpec =
    HttpRequestSpec(url, body = Some(s"""{"enrollment":[$value]}"""),
      headers = Map("Content-Type" -> "application/json"))
}
