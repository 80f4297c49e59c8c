package graft.sinks

import scala.collection.AbstractIterator

/** Amplitude sink family: endpoint-dispatched factory (`/httpapi`
  * form-post vs `/batch` JSON body), greedy size/count batcher, recursive
  * split-half on 413, unlimited retries (reference:
  * src/main/scala/com/mozilla/telemetry/sinks/AmplitudeHttpSink.scala:10-160).
  */
object AmplitudeHttpSink {
  def defaultConfig: HttpSink.Config = HttpSink.Config(maxAttempts = Int.MaxValue)
  val MaxBytesHttp: Int = 512 * 1024        // half the documented /httpapi limit
  val MaxBytesBatch: Int = 10 * 1024 * 1024 // half the documented /batch limit

  def stringsAsJsonList(events: Seq[String]): String = s"""[${events.mkString(",")}]"""

  def apply(apiKey: String, url: String,
            config: HttpSink.Config = defaultConfig,
            batcher: Option[Batcher] = None): AmplitudeHttpSink =
    url match {
      case _ if url.endsWith("/httpapi") =>
        new AmplitudeHttpApiSink(apiKey, url, batcher.getOrElse(Batcher(MaxBytesHttp)), config)
      case _ if url.endsWith("/batch") =>
        new AmplitudeBatchApiSink(apiKey, url, batcher.getOrElse(Batcher(MaxBytesBatch)), config)
      case _ =>
        throw new IllegalArgumentException(s"Unknown Amplitude endpoint: $url")
    }

  /** Greedy batching under Amplitude's size/count limits; bytes estimated
    * as 2·chars (reference: AmplitudeHttpSink.scala:43-67).
    */
  case class Batcher(maxBytesPerBatch: Int, maxEventsPerBatch: Int = 2000) {
    def apply(input: Iterator[String]): Iterator[Seq[String]] =
      new AbstractIterator[Seq[String]] {
        private var it: Iterator[String] = input
        override def hasNext: Boolean = it.hasNext
        override def next(): Seq[String] = {
          var count = 0
          var bytes = 0
          // the first event is always taken: a single event larger than
          // the byte cap must ship alone (413 split-half handles it)
          // rather than producing an empty batch forever
          val fits = { s: String =>
            count += 1
            bytes += 2 * s.length
            count == 1 || (bytes <= maxBytesPerBatch && count <= maxEventsPerBatch)
          }
          val (batch, remainder) = it.span(fits)
          it = remainder
          batch.toSeq
        }
      }
  }
}

abstract class AmplitudeHttpSink extends HttpSink[Seq[String]] {
  val batcher: AmplitudeHttpSink.Batcher

  /** How an event-list iterator splits into HTTP requests. */
  def batch(eventsIterator: Iterator[Seq[String]]): Iterator[Seq[String]]

  /** Batch-mode entrypoint (foreachPartition), with optional rate delay
    * (reference: AmplitudeHttpSink.scala:126-131).
    */
  def batchAndProcess(eventsIterator: Iterator[Seq[String]], minDelayMillis: Int = 0): Unit =
    batch(eventsIterator).foreach { events =>
      superProcess(events)
      if (minDelayMillis > 0) config.sleeper(minDelayMillis)
    }

  private def superProcess(events: Seq[String]): Unit = super.process(events)

  /** Streaming entrypoint: oversized pings re-batch before sending
    * (reference: AmplitudeHttpSink.scala:136-143).
    */
  override def process(events: Seq[String]): Unit =
    if (events.length <= batcher.maxEventsPerBatch) super.process(events)
    else batch(Iterator(events)).foreach(super.process)

  /** 413 → split in half and resend both halves recursively
    * (reference: AmplitudeHttpSink.scala:153-158). A single event that
    * still draws 413 is dropped — splitAt(0) would otherwise recurse on
    * the same oversized payload forever.
    */
  override def handlePayloadTooLarge(events: Seq[String]): Unit =
    if (events.length > 1) {
      val (firstHalf, secondHalf) = events.splitAt(events.length / 2)
      process(firstHalf)
      process(secondHalf)
    }
}

/** /httpapi: events ride in a form field, one request per ping's events. */
class AmplitudeHttpApiSink(apiKey: String, val url: String,
                           val batcher: AmplitudeHttpSink.Batcher,
                           val config: HttpSink.Config) extends AmplitudeHttpSink {
  override def batch(eventsIterator: Iterator[Seq[String]]): Iterator[Seq[String]] =
    eventsIterator.flatMap(events => batcher(events.iterator))

  override def buildRequest(events: Seq[String]): HttpRequestSpec =
    HttpRequestSpec(url, form = Seq(
      "api_key" -> apiKey,
      "event" -> AmplitudeHttpSink.stringsAsJsonList(events)))
}

/** /batch: many pings per JSON-body request. */
class AmplitudeBatchApiSink(apiKey: String, val url: String,
                            val batcher: AmplitudeHttpSink.Batcher,
                            val config: HttpSink.Config) extends AmplitudeHttpSink {
  override def batch(eventsIterator: Iterator[Seq[String]]): Iterator[Seq[String]] =
    batcher(eventsIterator.flatten)

  override def buildRequest(events: Seq[String]): HttpRequestSpec =
    HttpRequestSpec(url,
      body = Some(s"""{"api_key":"$apiKey","events":[${events.mkString(",")}]}"""),
      headers = Map("Content-Type" -> "application/json", "Accept" -> "*/*"))
}
