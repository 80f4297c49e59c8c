package graft.sinks

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 streaming HTTP sink: `writeStream.format("graft-http")`.
  *
  * The modern-API sibling of the `foreachBatch`/`ForeachWriter` sinks
  * (SURVEY.md §4 "custom physical operators" row: the reference's V1
  * `StreamSinkProvider` sinks map to `foreachBatch` OR DSv2
  * `StreamingWrite` — this is the latter). Kafka-sink convention for the
  * input: exactly one string column named `value`, each row one payload
  * line; `batchRows` rows are newline-joined per POST. Delivery reuses
  * the [[HttpSink]] retry core (exponential backoff, success/retry code
  * sets, timeout/error pseudo-codes), so semantics are at-least-once
  * under task retries — same contract as the reference's HTTP sinks;
  * dedup belongs server-side or in an idempotent payload key.
  *
  * Scale shape: each partition's `DataWriter` runs ON the executor and
  * posts independently (no driver funnel, no collect); per-epoch
  * delivery counts flow back through `WriterCommitMessage`s and are
  * logged in `commit` on the driver — the only driver-side state is
  * that O(partitions) message array.
  *
  * Options: `url` (required), `batchRows` (default 100), `transport`
  * (registry key for tests — absent means the real
  * [[JavaNetTransport]]; registry hits require a shared JVM, i.e.
  * local mode or an executor-side static registration).
  */
class HttpStreamingSinkV2Provider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-http"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpStreamingSinkV2.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new HttpStreamingSinkV2.SinkTable
}

object HttpStreamingSinkV2 {
  val Schema: StructType = StructType(Nil).add("value", StringType)

  /** Test seam: writers resolve `transport` option keys here. */
  private val transports =
    new java.util.concurrent.ConcurrentHashMap[String, HttpTransport]()
  def registerTransport(key: String, t: HttpTransport): Unit =
    transports.put(key, t)
  private[sinks] def transportFor(key: String): HttpTransport =
    if (key.isEmpty) JavaNetTransport
    else Option(transports.get(key)).getOrElse(
      throw new IllegalArgumentException(s"no registered transport '$key'"))

  private[sinks] class SinkTable extends Table with SupportsWrite {
    override def name(): String = "graft-http"
    override def schema(): StructType = Schema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(
        TableCapability.STREAMING_WRITE, TableCapability.ACCEPT_ANY_SCHEMA)
    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
      val s = info.schema()
      require(s.length == 1 && s.head.dataType == StringType,
        s"graft-http expects a single STRING column (the payload line), got ${s.simpleString}")
      val url = Option(info.options.get("url")).getOrElse(
        throw new IllegalArgumentException("graft-http requires the 'url' option"))
      val batchRows = Option(info.options.get("batchRows")).map(_.toInt).getOrElse(100)
      val transportKey = Option(info.options.get("transport")).getOrElse("")
      new WriteBuilder {
        override def build(): Write = new Write {
          override def toStreaming: StreamingWrite =
            new HttpWrite(url, batchRows, transportKey)
        }
      }
    }
  }

  private[sinks] final case class EpochCommit(
      partitionId: Int, rows: Long, posts: Long, nullsSkipped: Long = 0L)
      extends WriterCommitMessage

  private[sinks] class HttpWrite(url: String, batchRows: Int, transportKey: String)
      extends StreamingWrite with org.apache.spark.internal.Logging {
    override def createStreamingWriterFactory(
        info: PhysicalWriteInfo): StreamingDataWriterFactory =
      WriterFactory(url, batchRows, transportKey)
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      val cs = messages.collect { case c: EpochCommit => c }
      val skipped = cs.map(_.nullsSkipped).sum
      logInfo(s"graft-http epoch $epochId: ${cs.map(_.rows).sum} rows in " +
        s"${cs.map(_.posts).sum} posts across ${cs.length} partitions" +
        (if (skipped > 0) s"; $skipped null payloads skipped" else ""))
    }
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  }

  private[sinks] final case class WriterFactory(
      url: String, batchRows: Int, transportKey: String)
      extends StreamingDataWriterFactory {
    override def createWriter(
        partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
      new RowWriter(url, batchRows, transportKey, partitionId)
  }

  /** Per-partition writer: buffers rows, posts newline-joined batches
    * through the shared retry core, reports counts via commit message.
    */
  private[sinks] class RowWriter(
      url: String, batchRows: Int, transportKey: String, partitionId: Int)
      extends DataWriter[InternalRow] {
    private val sink = new StringHttpSink(
      url, HttpSink.Config(transport = transportFor(transportKey)))
    private val buf = new scala.collection.mutable.ArrayBuffer[String]
    private var rows = 0L
    private var posts = 0L
    private var nullsSkipped = 0L

    override def write(row: InternalRow): Unit = {
      // null payloads (tombstones, to_json misses) are skipped and
      // counted rather than NPE-ing the task into retry loops
      val s = if (row.isNullAt(0)) null else row.getUTF8String(0)
      if (s == null) nullsSkipped += 1
      else {
        buf += s.toString
        rows += 1
        if (buf.size >= batchRows) flush()
      }
    }
    private def flush(): Unit = if (buf.nonEmpty) {
      sink.process(buf.mkString("\n"))
      posts += 1
      buf.clear()
    }
    override def commit(): WriterCommitMessage = {
      flush()
      EpochCommit(partitionId, rows, posts, nullsSkipped)
    }
    override def abort(): Unit = buf.clear()
    override def close(): Unit = ()
  }
}
