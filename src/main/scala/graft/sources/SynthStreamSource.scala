package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 micro-batch SOURCE: `readStream.format("graft-synth")` — a
  * deterministic, offset-tracked envelope generator.
  *
  * Purpose: restartable end-to-end streaming tests without a broker.
  * `MemoryStream` covers DAG semantics but its contents die with the
  * JVM, so checkpoint-recovery tests have had to fall back to file
  * sources; this source regenerates any offset range on demand (rows
  * are a pure function of the global row index), which makes
  * stop/restart-from-checkpoint exercisable against an unbounded
  * source with REAL offset bookkeeping — the part of the Kafka
  * integration (`Jobs.scala` readStream) that is testable without a
  * broker: initialOffset/latestOffset/deserializeOffset recovery,
  * planInputPartitions ranges, per-partition readers.
  *
  * Scale shape: generation is embarrassingly parallel — each batch's
  * [start, end) range splits into `numPartitions` contiguous
  * sub-ranges, one executor-side `PartitionReader` each, no driver
  * materialization, no state beyond one long offset.
  *
  * Options: `rowsPerBatch` (default 100, admitted per trigger),
  * `numPartitions` (default 4), `maxRows` (default unbounded; the
  * offset stops advancing once reached so `processAllAvailable`
  * terminates), `seed` (default 42), `startEpochSeconds` (event-time
  * base, default 2026-01-01T00:00:00Z; row i has ts = base + i
  * seconds — monotone event time, so watermarks advance predictably).
  *
  * Schema: offset BIGINT, partition INT, ts TIMESTAMP, value BINARY.
  */
class SynthStreamSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthStreamSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SynthStreamSource.SourceTable
}

object SynthStreamSource {
  val Schema: StructType = new StructType()
    .add("offset", LongType).add("partition", IntegerType)
    .add("ts", TimestampType).add("value", BinaryType)

  val DefaultStartEpochSeconds: Long = 1767225600L // 2026-01-01T00:00:00Z

  /** Deterministic payload for global row `i` (splitmix64 stream) —
    * public so specs recompute expected content independently.
    */
  def payload(seed: Long, i: Long): Array[Byte] = {
    def mix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    val a = mix(seed ^ i)
    val b = mix(a)
    java.nio.ByteBuffer.allocate(16).putLong(a).putLong(b).array()
  }

  private[sources] case class SynthOffset(pos: Long) extends Offset {
    override def json(): String = s"""{"pos":$pos}"""
  }

  private[sources] class SourceTable extends Table with SupportsRead {
    override def name(): String = "graft-synth"
    override def schema(): StructType = Schema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        override def build(): Scan = new Scan {
          override def readSchema(): StructType = Schema
          override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
            new SynthMicroBatchStream(
              rowsPerBatch = Option(options.get("rowsPerBatch")).map(_.toLong).getOrElse(100L),
              numPartitions = Option(options.get("numPartitions")).map(_.toInt).getOrElse(4),
              maxRows = Option(options.get("maxRows")).map(_.toLong).getOrElse(Long.MaxValue),
              seed = Option(options.get("seed")).map(_.toLong).getOrElse(42L),
              startEpochSeconds = Option(options.get("startEpochSeconds")).map(_.toLong)
                .getOrElse(DefaultStartEpochSeconds))
        }
      }
  }

  private[sources] class SynthMicroBatchStream(
      rowsPerBatch: Long,
      numPartitions: Int,
      maxRows: Long,
      seed: Long,
      startEpochSeconds: Long)
      extends MicroBatchStream with SupportsAdmissionControl {

    private def pos(o: Offset): Long = o match {
      case SynthOffset(p) => p
      case other => parsePos(other.json())
    }
    private def parsePos(json: String): Long =
      """"pos"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
        .map(_.group(1).toLong)
        .getOrElse(throw new IllegalArgumentException(s"bad offset json: $json"))

    override def initialOffset(): Offset = SynthOffset(0L)
    // Admission control is load-bearing for restart correctness: the
    // start-relative form receives the RESTORED offset on recovery. A
    // plain latestOffset() with an internal counter restarts at zero
    // and hands Spark an end offset BEHIND the checkpointed start — the
    // next batch then re-emits already-delivered rows (observed as
    // duplicated middle batches before this was switched).
    override def latestOffset(): Offset =
      throw new UnsupportedOperationException(
        "graft-synth uses latestOffset(start, limit) (SupportsAdmissionControl)")
    // A source advertising SupportsAdmissionControl must also honor the
    // hint Spark passes in: Trigger.AvailableNow wraps the default limit
    // and maxRowsPerTrigger-style callers pass ReadLimit.maxRows — take
    // the MIN of any maxRows limits found with this source's own
    // rowsPerBatch rather than silently overriding them. (allAvailable /
    // minRows hints leave rowsPerBatch in charge.)
    override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
      import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadMaxRows}
      def maxRowsOf(l: ReadLimit): Long = l match {
        case m: ReadMaxRows => m.maxRows()
        case c: CompositeReadLimit => c.getReadLimits.map(maxRowsOf).min
        case _ => Long.MaxValue
      }
      val admit = math.min(rowsPerBatch, maxRowsOf(limit))
      SynthOffset(math.min(maxRows, pos(start) + admit))
    }
    override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
    override def deserializeOffset(json: String): Offset = SynthOffset(parsePos(json))
    override def commit(end: Offset): Unit = ()
    override def stop(): Unit = ()

    override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
      val s = pos(start)
      val e = pos(end)
      if (e <= s) Array.empty
      else {
        val n = e - s
        val per = (n + numPartitions - 1) / numPartitions
        (0 until numPartitions).iterator
          .map(p => (s + p * per, math.min(s + (p + 1) * per, e), p))
          .filter { case (lo, hi, _) => lo < hi }
          .map { case (lo, hi, p) =>
            SynthInputPartition(lo, hi, p, seed, startEpochSeconds): InputPartition
          }
          .toArray
      }
    }

    override def createReaderFactory(): PartitionReaderFactory =
      SynthReaderFactory()
  }

  private[sources] final case class SynthInputPartition(
      lo: Long, hi: Long, partitionId: Int, seed: Long, startEpochSeconds: Long)
      extends InputPartition

  private[sources] final case class SynthReaderFactory() extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[SynthInputPartition]
      new PartitionReader[InternalRow] {
        private var i = p.lo - 1
        override def next(): Boolean = { i += 1; i < p.hi }
        override def get(): InternalRow =
          new GenericInternalRow(Array[Any](
            i, p.partitionId, (p.startEpochSeconds + i) * 1000000L,
            payload(p.seed, i)))
        override def close(): Unit = ()
      }
    }
  }
}
