package graft.monitoring

/** DogStatsD datagram: `name:value|type[|@rate][|#k:v,...]` with reserved
  * characters `[:|@]` normalized to `_` (reference:
  * src/main/scala/com/mozilla/telemetry/monitoring/DogStatsDMetric.scala:9-50).
  */
final case class DogStatsDMetric(
    metricName: String,
    metricValue: String,
    metricType: String,
    kvTags: Option[Map[String, String]] = None,
    bareTags: Option[Seq[String]] = None) {

  def format(sampleRate: Option[Double] = None): String =
    (Seq(Some(metric), Some(metricType), sampleRate.map("@" + _)) :+ tags)
      .flatten.mkString("|")

  private def normalize(input: String): String = input.replaceAll("[:|@]", "_")

  private lazy val metric: String = s"${normalize(metricName)}:$metricValue"

  private lazy val tags: Option[String] = {
    val kv = kvTags.map(_.map { case (k, v) => s"${normalize(k)}:${normalize(v)}" }.mkString(","))
    val bare = bareTags.map(_.map(normalize).mkString(","))
    Seq(kv, bare).flatten.mkString(",") match {
      case ""    => None
      case tagged => Some("#" + tagged)
    }
  }
}

object DogStatsDMetric {
  def makeCounter(metricName: String, metricValue: Int = 1,
                  kvTags: Option[Map[String, String]] = None,
                  bareTags: Option[Seq[String]] = None): DogStatsDMetric =
    DogStatsDMetric(metricName, metricValue.toString, "c", kvTags, bareTags)

  def makeTimer(metricName: String, metricValue: Int,
                kvTags: Option[Map[String, String]] = None,
                bareTags: Option[Seq[String]] = None): DogStatsDMetric =
    DogStatsDMetric(metricName, metricValue.toString, "ms", kvTags, bareTags)
}
