package graft.sinks

import org.apache.spark.sql.ForeachWriter

import scala.annotation.tailrec
import scala.util.control.NonFatal
import scala.util.{Failure, Success, Try}

/** HTTP request/response model + pluggable transport. The transport trait
  * is the architecture delta from the reference (SURVEY.md §7.1 delta 6):
  * tests inject an in-memory transport and assert recorded requests, so no
  * HTTP-mocking library is needed; production uses [[JavaNetTransport]].
  */
final case class HttpRequestSpec(
    url: String,
    body: Option[String] = None,
    form: Seq[(String, String)] = Nil,
    headers: Map[String, String] = Map.empty)

final case class HttpResponseSpec(code: Int, body: String)

trait HttpTransport extends Serializable {
  /** May throw java.net.SocketTimeoutException (maps to the timeout
    * pseudo-code) or any other exception (maps to the error pseudo-code).
    */
  def send(request: HttpRequestSpec, connectTimeoutMillis: Int, readTimeoutMillis: Int): HttpResponseSpec
}

/** Stdlib HttpURLConnection transport (no external HTTP client resolves
  * in this environment).
  */
object JavaNetTransport extends HttpTransport {
  override def send(req: HttpRequestSpec, connectTimeoutMillis: Int, readTimeoutMillis: Int): HttpResponseSpec = {
    import java.net.{HttpURLConnection, URI}
    import java.nio.charset.StandardCharsets
    val conn = URI.create(req.url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setConnectTimeout(connectTimeoutMillis)
      conn.setReadTimeout(readTimeoutMillis)
      req.headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      val payload: Option[Array[Byte]] =
        if (req.form.nonEmpty) {
          conn.setRequestProperty("Content-Type", "application/x-www-form-urlencoded")
          val encoded = req.form.map { case (k, v) =>
            java.net.URLEncoder.encode(k, "UTF-8") + "=" + java.net.URLEncoder.encode(v, "UTF-8")
          }.mkString("&")
          Some(encoded.getBytes(StandardCharsets.UTF_8))
        } else req.body.map(_.getBytes(StandardCharsets.UTF_8))
      payload match {
        case Some(bytes) =>
          conn.setRequestMethod("POST")
          conn.setDoOutput(true)
          val os = conn.getOutputStream
          try os.write(bytes) finally os.close()
        case None =>
          conn.setRequestMethod("GET")
      }
      val code = conn.getResponseCode
      val stream = Option(if (code >= 400) conn.getErrorStream else conn.getInputStream)
      val body = stream.map { s =>
        try new String(s.readAllBytes(), StandardCharsets.UTF_8) finally s.close()
      }.getOrElse("")
      HttpResponseSpec(code, body)
    } finally conn.disconnect()
  }
}

object HttpSink {
  val TimeoutPseudoCode: Int = -1
  val ErrorPseudoCode: Int = -2
  val OK = 200
  val Conflict = 409
  val PayloadTooLarge = 413
  val TooManyRequests = 429

  /** Status codes that indicate a retryable condition
    * (reference: src/main/scala/com/mozilla/telemetry/sinks/HttpSink.scala:88-106).
    */
  val RetryCodes: Set[Int] = Set(TimeoutPseudoCode, Conflict, TooManyRequests, 500, 502, 503, 504)

  /** Retry/backoff policy (reference defaults: HttpSink.scala:23-31).
    * `sleeper` is injectable so retry tests don't wall-clock sleep.
    */
  case class Config(
      maxAttempts: Int = 5,
      defaultDelayMillis: Int = 500,
      maxDelayMillis: Int = 30000,
      connectionTimeoutMillis: Int = 2000,
      readTimeoutMillis: Int = 5000,
      successCodes: Set[Int] = Set(OK),
      retryCodes: Set[Int] = RetryCodes,
      transport: HttpTransport = JavaNetTransport,
      sleeper: Long => Unit = Thread.sleep,
      onOutcome: String => Unit = _ => ())
}

/** Retrying HTTP ForeachWriter: exponential backoff (2^t−1)·500ms capped
  * at 30s, max 5 attempts, success/retry code sets, timeout/error
  * pseudo-codes, 413 hook (reference:
  * src/main/scala/com/mozilla/telemetry/sinks/HttpSink.scala:114-196).
  * Runs on executors — one instance per partition per epoch.
  */
abstract class HttpSink[T] extends ForeachWriter[T] {
  import HttpSink._

  val url: String
  val config: HttpSink.Config

  /** Build the request for one value. */
  def buildRequest(value: T): HttpRequestSpec

  /** Dropped-by-default 413 handling; override to split-and-resend. */
  def handlePayloadTooLarge(value: T): Unit = ()

  override def open(partitionId: Long, epochId: Long): Boolean = true
  override def close(errorOrNull: Throwable): Unit = ()
  override def process(value: T): Unit = attempt(value, buildRequest(value))

  private def backoffMillis(tries: Int): Long =
    math.min(((math.pow(2, tries) - 1) * config.defaultDelayMillis).toLong, config.maxDelayMillis)

  @tailrec
  protected final def attempt(value: T, request: HttpRequestSpec, tries: Int = 0): Unit = {
    val nextTry = tries + 1
    if (tries > 0) config.sleeper(backoffMillis(tries))

    val code = Try(config.transport.send(request, config.connectionTimeoutMillis, config.readTimeoutMillis)) match {
      case Success(r) => r.code
      case Failure(_: java.net.SocketTimeoutException) => TimeoutPseudoCode
      case Failure(e) if NonFatal(e) => ErrorPseudoCode
      case Failure(fatal) => throw fatal // OOM etc. must not read as HTTP errors
    }

    code match {
      case ErrorPseudoCode =>
        config.onOutcome("error")
      case c if config.successCodes.contains(c) =>
        config.onOutcome("success")
      case PayloadTooLarge =>
        config.onOutcome("payload-too-large")
        handlePayloadTooLarge(value)
      case c if nextTry < config.maxAttempts && config.retryCodes.contains(c) =>
        config.onOutcome("retry")
        attempt(value, request, nextTry)
      case _ =>
        config.onOutcome("dropped")
    }
  }
}

/** Simple body-POST sink: each value becomes one request body. */
class StringHttpSink(val url: String, val config: HttpSink.Config = HttpSink.Config())
  extends HttpSink[String] {
  override def buildRequest(value: String): HttpRequestSpec =
    HttpRequestSpec(url, body = Some(value))
}
