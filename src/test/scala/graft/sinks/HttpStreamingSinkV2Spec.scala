package graft.sinks

import graft.SparkTest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** The DSv2 streaming HTTP sink end-to-end through a real
  * `writeStream.format("graft-http")` query: service-file discovery,
  * schema validation, executor-side posting, batching, and the shared
  * retry core.
  */
class HttpStreamingSinkV2Spec extends AnyFunSuite with SparkTest {

  private class RecordingTransport(failFirst: Int = 0) extends HttpTransport {
    val requests = new java.util.concurrent.CopyOnWriteArrayList[HttpRequestSpec]()
    private val failures = new java.util.concurrent.atomic.AtomicInteger(failFirst)
    override def send(req: HttpRequestSpec, ct: Int, rt: Int): HttpResponseSpec = {
      requests.add(req)
      if (failures.getAndDecrement() > 0) HttpResponseSpec(503, "unavailable")
      else HttpResponseSpec(200, "ok")
    }
  }

  private def runStream(transportKey: String, batchRows: Int, rows: Seq[String]): Unit = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-httpv2-ckpt").toString
    val q = input.toDF().toDF("value")
      .writeStream.format("graft-http")
      .option("url", "http://ingest.test/v1")
      .option("batchRows", batchRows.toString)
      .option("transport", transportKey)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
  }

  test("format(graft-http) resolves via service file and posts newline-joined batches") {
    val transport = new RecordingTransport
    HttpStreamingSinkV2.registerTransport("rec-ok", transport)
    runStream("rec-ok", batchRows = 2, rows = Seq("a", "b", "c", "d", "e"))
    val bodies = transport.requests.asScala.flatMap(_.body).toList
    // every row delivered exactly once, batches respect the cap
    assert(bodies.flatMap(_.split("\n")).sorted == List("a", "b", "c", "d", "e"))
    assert(bodies.forall(_.split("\n").length <= 2))
    assert(transport.requests.asScala.forall(_.url == "http://ingest.test/v1"))
  }

  test("transient 503 is retried by the shared retry core until delivered") {
    val transport = new RecordingTransport(failFirst = 1)
    HttpStreamingSinkV2.registerTransport("rec-retry", transport)
    runStream("rec-retry", batchRows = 100, rows = Seq("x", "y"))
    val bodies = transport.requests.asScala.flatMap(_.body).toList
    // one extra request for the 503, same payload redelivered
    assert(bodies.length == 2 && bodies.distinct.length == 1)
    assert(bodies.head.split("\n").sorted.toList == List("x", "y"))
  }

  test("schema contract: multi-column input is rejected with a clear message") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-httpv2-bad").toString
    val ex = intercept[Exception] {
      val q = input.toDF().toDF("value", "extra")
        .writeStream.format("graft-http")
        .option("url", "http://ingest.test/v1")
        .option("checkpointLocation", ckpt)
        .start()
      // the builder (and its schema check) runs with the first batch
      input.addData(("a", 1L))
      try q.processAllAvailable() finally q.stop()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("single STRING column")), s"got: $ex")
  }
}
