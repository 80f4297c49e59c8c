package graft.streaming

import java.util.concurrent.TimeUnit
import scala.annotation.tailrec

/** Optional crash-signature enrichment by external command (the
  * reference shells out to `fx-crash-sig` with exponential timeouts ×3
  * retries — reference:
  * src/main/scala/com/mozilla/telemetry/streaming/CrashPingStreamingBase.scala:236-278).
  * Command injectable so tests use stdlib tools; runs inside the
  * executor-side parse closure.
  */
object CrashSignature {

  val MaxRetries = 3
  val BaseTimeoutSeconds = 30L

  /** Pipe `input` through `command`, retrying with doubled timeouts.
    * None after exhaustion or non-zero exit.
    */
  def fromExternalCommand(
      command: Seq[String],
      input: String,
      baseTimeoutSeconds: Long = BaseTimeoutSeconds,
      maxRetries: Int = MaxRetries): Option[String] = {

    @tailrec
    def attempt(tries: Int): Option[String] = {
      if (tries >= maxRetries) None
      else run(command, input, baseTimeoutSeconds * (1L << tries)) match {
        case some @ Some(_) => some
        case None           => attempt(tries + 1)
      }
    }
    attempt(0)
  }

  private def run(command: Seq[String], input: String, timeoutSeconds: Long): Option[String] =
    try {
      val process = new ProcessBuilder(command: _*)
        .redirectErrorStream(false)
        .start()
      val out = process.getOutputStream
      out.write(input.getBytes("UTF-8"))
      out.close()
      if (!process.waitFor(timeoutSeconds, TimeUnit.SECONDS)) {
        process.destroyForcibly()
        None
      } else if (process.exitValue() != 0) None
      else Some(new String(process.getInputStream.readAllBytes(), "UTF-8").trim)
    } catch {
      case _: Exception => None
    }
}
