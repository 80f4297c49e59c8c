package graft.pings

import graft.json._

/** Frecency-update ping for the federated-learning job (subset of fields
  * the pipeline consumes — reference:
  * src/main/scala/com/mozilla/telemetry/pings/FrecencyUpdatePing.scala:21-39).
  */
final case class FrecencyUpdatePing(
    meta: Meta,
    modelVersion: Long,
    loss: Double,
    update: Array[Double],
    bookmarkAndHistoryNumSuggestionsDisplayed: Long,
    studyVariation: String)

object FrecencyUpdatePing {
  def fromEnvelope(env: Envelope): FrecencyUpdatePing = {
    val p = env.payloadJson
    def req[T](name: String, v: Option[T]): T =
      v.getOrElse(throw new IllegalArgumentException(s"frecency ping missing $name"))
    FrecencyUpdatePing(
      meta = Meta.fromEnvelope(env),
      modelVersion = req("model_version", (p \ "model_version").asLong),
      loss = req("loss", (p \ "loss").asDouble),
      update = req("update", (p \ "update").asArray)
        .map(x => req("update element", x.asDouble)).toArray,
      bookmarkAndHistoryNumSuggestionsDisplayed =
        req("bookmark_and_history_num_suggestions_displayed",
          (p \ "bookmark_and_history_num_suggestions_displayed").asLong),
      studyVariation = req("study_variation", (p \ "study_variation").asString))
  }
}
