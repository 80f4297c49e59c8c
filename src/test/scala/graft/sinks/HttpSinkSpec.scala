package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable.ListBuffer

/** Recording in-memory transport: scripted response codes per request
  * (replaces the reference's WireMock scenarios —
  * reference: src/test/scala/com/mozilla/telemetry/sinks/HttpSinkTest.scala:101-152).
  */
class RecordingTransport(script: Seq[Int]) extends HttpTransport {
  val requests = new ListBuffer[HttpRequestSpec]()
  private var i = -1
  override def send(request: HttpRequestSpec, connectTimeoutMillis: Int, readTimeoutMillis: Int): HttpResponseSpec = {
    requests += request
    i += 1
    script(math.min(i, script.length - 1)) match {
      case HttpSink.TimeoutPseudoCode => throw new java.net.SocketTimeoutException("scripted timeout")
      case HttpSink.ErrorPseudoCode   => throw new RuntimeException("scripted error")
      case code                       => HttpResponseSpec(code, s"body-$code")
    }
  }
}

/** Transport whose recordings survive task serialization (local-mode
  * executors share the JVM, so a static queue collects from all copies).
  */
class StaticRecordingTransport(script: Seq[Int]) extends HttpTransport {
  override def send(request: HttpRequestSpec, connectTimeoutMillis: Int, readTimeoutMillis: Int): HttpResponseSpec = {
    StaticRecordingTransport.requests.add(request)
    HttpResponseSpec(script.headOption.getOrElse(200), "ok")
  }
}
object StaticRecordingTransport {
  val requests = new java.util.concurrent.ConcurrentLinkedQueue[HttpRequestSpec]()
  def drain(): Seq[HttpRequestSpec] = {
    val out = scala.collection.mutable.ListBuffer.empty[HttpRequestSpec]
    while (!requests.isEmpty) out += requests.poll()
    out.toSeq
  }
}

class HttpSinkSpec extends AnyFunSuite {

  private def sink(script: Seq[Int], outcomes: ListBuffer[String] = new ListBuffer):
      (StringHttpSink, RecordingTransport, ListBuffer[String]) = {
    val transport = new RecordingTransport(script)
    val s = new StringHttpSink("http://example.test/api",
      HttpSink.Config(transport = transport, sleeper = _ => (), onOutcome = outcomes += _))
    (s, transport, outcomes)
  }

  test("success on first attempt sends once") {
    val (s, t, outcomes) = sink(Seq(200))
    s.process("hello")
    assert(t.requests.length == 1)
    assert(t.requests.head.body.contains("hello"))
    assert(outcomes.toList == List("success"))
  }

  test("retryable codes retry until success") {
    val (s, t, outcomes) = sink(Seq(503, 429, 200))
    s.process("x")
    assert(t.requests.length == 3)
    assert(outcomes.toList == List("retry", "retry", "success"))
  }

  test("retries exhaust after maxAttempts then drop") {
    val (s, t, outcomes) = sink(Seq(500, 500, 500, 500, 500))
    s.process("x")
    assert(t.requests.length == 5)
    assert(outcomes.toList == List("retry", "retry", "retry", "retry", "dropped"))
  }

  test("timeouts count as retryable pseudo-code") {
    val (s, t, outcomes) = sink(Seq(HttpSink.TimeoutPseudoCode, 200))
    s.process("x")
    assert(t.requests.length == 2)
    assert(outcomes.toList == List("retry", "success"))
  }

  test("non-retryable client error drops immediately") {
    val (s, t, outcomes) = sink(Seq(400))
    s.process("x")
    assert(t.requests.length == 1)
    assert(outcomes.toList == List("dropped"))
  }

  test("transport exception marks error without retry") {
    val (s, t, outcomes) = sink(Seq(HttpSink.ErrorPseudoCode))
    s.process("x")
    assert(t.requests.length == 1)
    assert(outcomes.toList == List("error"))
  }

  test("413 calls the payload-too-large hook") {
    val splits = new ListBuffer[String]()
    val transport = new RecordingTransport(Seq(413))
    val s = new StringHttpSink("http://example.test/api",
      HttpSink.Config(transport = transport, sleeper = _ => ())) {
      override def handlePayloadTooLarge(value: String): Unit = splits += value
    }
    s.process("big")
    assert(splits.toList == List("big"))
  }

  test("batch sink flushes at maxBatchSize and on close with separators") {
    val transport = new RecordingTransport(Seq(204))
    val s = new BatchHttpSink("http://example.test/api", maxBatchSize = 2,
      prefix = "[", sep = ",", suffix = "]",
      config = HttpSink.Config(successCodes = Set(204), transport = transport, sleeper = _ => ()))
    s.process("a"); assert(transport.requests.isEmpty)
    s.process("b")
    assert(transport.requests.map(_.body.get).toList == List("[a,b]"))
    s.process("c")
    s.close(null)
    assert(transport.requests.map(_.body.get).toList == List("[a,b]", "[c]"))
  }

  test("testtube sink wraps rows in enrollment envelope") {
    val transport = new RecordingTransport(Seq(200))
    val s = new TestTubeHttpSink("http://example.test/tt",
      HttpSink.Config(transport = transport, sleeper = _ => ()))
    s.process("""{"a":1}""")
    assert(transport.requests.head.body.contains("""{"enrollment":[{"a":1}]}"""))
  }
}
