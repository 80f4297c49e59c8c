package graft.sinks

import graft.monitoring.DogStatsDMetric
import org.apache.spark.sql.ForeachWriter

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets

/** One UDP datagram per metric (reference:
  * src/main/scala/com/mozilla/telemetry/sinks/DogStatsDMetricSink.scala:11-30).
  * Fire-and-forget: UDP loss is acceptable for operational counters.
  */
class DogStatsDMetricSink(host: String, port: Int, sampleRate: Option[Double] = None)
  extends ForeachWriter[DogStatsDMetric] {

  @transient private var socket: DatagramSocket = _
  @transient private var address: InetAddress = _

  override def open(partitionId: Long, epochId: Long): Boolean = {
    socket = new DatagramSocket()
    address = InetAddress.getByName(host)
    true
  }

  override def process(metric: DogStatsDMetric): Unit = {
    val payload = metric.format(sampleRate).getBytes(StandardCharsets.UTF_8)
    socket.send(new DatagramPacket(payload, payload.length, address, port))
  }

  override def close(errorOrNull: Throwable): Unit = {
    if (socket != null) socket.close()
  }
}
