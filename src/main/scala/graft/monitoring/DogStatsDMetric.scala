package graft.monitoring

/** One StatsD-family metric sample, wire format
  * `name:value|type[|@rate][|#tag,...]` (the behavior re-implemented from
  * reference: src/main/scala/com/mozilla/telemetry/monitoring/DogStatsDMetric.scala:9-50).
  *
  * Kept as a flat case class (not a sealed type per metric kind) so a
  * `Dataset[DogStatsDMetric]` gets a Product encoder and metric kinds can
  * mix in one stream.
  */
final case class DogStatsDMetric(
    metricName: String,
    metricValue: String,
    metricType: String,
    kvTags: Option[Map[String, String]] = None,
    bareTags: Option[Seq[String]] = None) {

  import DogStatsDMetric.sanitize

  /** Renders the datagram. Reserved characters in the name and in tag
    * keys/values are replaced with '_'; the value and type fields are
    * emitted verbatim (they are engine-generated, never user text).
    */
  def format(sampleRate: Option[Double] = None): String = {
    val out = new java.lang.StringBuilder(64)
    out.append(sanitize(metricName)).append(':').append(metricValue)
    out.append('|').append(metricType)
    sampleRate.foreach(r => out.append("|@").append(r))
    val tagList =
      kvTags.toSeq.flatMap(_.map { case (k, v) => sanitize(k) + ":" + sanitize(v) }) ++
        bareTags.toSeq.flatten.map(sanitize)
    if (tagList.nonEmpty) out.append("|#").append(tagList.mkString(","))
    out.toString
  }
}

object DogStatsDMetric {

  /** ':' '|' '@' delimit the datagram and are disallowed in names/tags. */
  private def sanitize(raw: String): String =
    raw.map {
      case ':' | '|' | '@' => '_'
      case c               => c
    }

  def makeCounter(metricName: String, metricValue: Int = 1,
                  kvTags: Option[Map[String, String]] = None,
                  bareTags: Option[Seq[String]] = None): DogStatsDMetric =
    DogStatsDMetric(metricName, metricValue.toString, "c", kvTags, bareTags)

  def makeTimer(metricName: String, metricValue: Int,
                kvTags: Option[Map[String, String]] = None,
                bareTags: Option[Seq[String]] = None): DogStatsDMetric =
    DogStatsDMetric(metricName, metricValue.toString, "ms", kvTags, bareTags)
}
