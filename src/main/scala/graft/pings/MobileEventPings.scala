package graft.pings

import graft.amplitude.{AmplitudeJson, SendsToAmplitude}
import graft.json._

/** Mobile event-ping family: the submission (in the `submission` field)
  * carries clientId/created/os/osversion/settings plus top-level
  * positional `events` (reference:
  * src/main/scala/com/mozilla/telemetry/pings/{FocusEvent,RocketEvent,MobileEvent,FireTvEventPing}.scala).
  */
sealed trait MobileLikeEventPing extends SendsToAmplitude {
  def clientId: String
  def created: Long
  def os: String
  def osversion: String

  override def getClientId: Option[String] = Some(clientId)
  override def sessionStart: Long = created
  def getSessionId: Option[String] = events.map(_.timestamp).maxOption.map(_.toString)
  override def getOsName: Option[String] = Some(os)
  override def getOsVersion: Option[String] = Some(osversion)
  override def getCreated: Option[Long] = Some(created)
}

private object MobileLikeEventPing {
  final case class Common(
      clientId: String, created: Long, os: String, osversion: String,
      events: Seq[TelemetryEvent], settings: Map[String, String],
      arch: Option[String], device: Option[String], locale: Option[String],
      meta: Meta)

  def common(env: Envelope): Common = {
    val sub = env.payloadJson
    Common(
      clientId = (sub \ "clientId").asString
        .getOrElse(throw new IllegalArgumentException("mobile ping missing clientId")),
      created = (sub \ "created").asLong
        .getOrElse(throw new IllegalArgumentException("mobile ping missing created")),
      os = (sub \ "os").asString.getOrElse(""),
      osversion = (sub \ "osversion").coerceString.getOrElse(""),
      events = TelemetryPing.extractEvents(sub, List(List("events"))),
      settings = (sub \ "settings").asStringMap.getOrElse(Map.empty),
      arch = (sub \ "arch").asString,
      device = (sub \ "device").asString,
      locale = (sub \ "locale").asString,
      meta = Meta.fromEnvelope(env))
  }
}

final case class FocusEventPing(
    clientId: String, created: Long, events: Seq[TelemetryEvent],
    os: String, osversion: String, settings: Map[String, String], meta: Meta)
  extends MobileLikeEventPing {
  import AmplitudeJson._

  /** reference: FocusEvent.scala:32-48 */
  override def pingAmplitudeProperties: JsonObject = jobj(
    ("device_id", so(getClientId)),
    ("user_properties", Some(jobj(
      ("pref_privacy_block_ads", boolPref(settings.get("pref_privacy_block_ads"))),
      ("pref_locale", so(settings.get("pref_locale"))),
      ("pref_privacy_block_social", boolPref(settings.get("pref_privacy_block_social"))),
      ("pref_secure", boolPref(settings.get("pref_secure"))),
      ("pref_privacy_block_analytics", boolPref(settings.get("pref_privacy_block_analytics"))),
      ("pref_search_engine", so(settings.get("pref_search_engine"))),
      ("pref_privacy_block_other", boolPref(settings.get("pref_privacy_block_other"))),
      ("pref_default_browser", boolPref(settings.get("pref_default_browser"))),
      ("pref_performance_block_webfonts", boolPref(settings.get("pref_performance_block_webfonts"))),
      ("pref_performance_block_images", boolPref(settings.get("pref_performance_block_images"))),
      ("pref_autocomplete_installed", boolPref(settings.get("pref_autocomplete_installed"))),
      ("pref_autocomplete_custom", boolPref(settings.get("pref_autocomplete_custom"))),
      ("pref_key_tips", boolPref(settings.get("pref_key_tips")))))))
}

object FocusEventPing {
  def fromEnvelope(env: Envelope): FocusEventPing = {
    val c = MobileLikeEventPing.common(env)
    FocusEventPing(c.clientId, c.created, c.events, c.os, c.osversion, c.settings, c.meta)
  }
}

final case class RocketEventPing(
    clientId: String, created: Long, events: Seq[TelemetryEvent],
    os: String, osversion: String, settings: Map[String, String], meta: Meta)
  extends MobileLikeEventPing {
  import AmplitudeJson._

  /** reference: RocketEvent.scala:32-46 */
  override def pingAmplitudeProperties: JsonObject = jobj(
    ("device_id", so(getClientId)),
    ("user_properties", Some(jobj(
      ("pref_search_engine", so(settings.get("pref_search_engine"))),
      ("pref_privacy_turbo_mode", boolPref(settings.get("pref_privacy_turbo_mode"))),
      ("pref_performance_block_images", boolPref(settings.get("pref_performance_block_images"))),
      ("pref_default_browser", boolPref(settings.get("pref_default_browser"))),
      ("pref_save_downloads_to", so(settings.get("pref_save_downloads_to"))),
      ("pref_webview_version", so(settings.get("pref_webview_version"))),
      ("install_referrer", so(settings.get("install_referrer"))),
      ("experiment_name", so(settings.get("experiment_name"))),
      ("experiment_bucket", so(settings.get("experiment_bucket"))),
      ("pref_locale", so(settings.get("pref_locale"))),
      ("pref_key_s_tracker_token", so(settings.get("pref_key_s_tracker_token")))))))
}

object RocketEventPing {
  def fromEnvelope(env: Envelope): RocketEventPing = {
    val c = MobileLikeEventPing.common(env)
    RocketEventPing(c.clientId, c.created, c.events, c.os, c.osversion, c.settings, c.meta)
  }
}

final case class MobileEventPing(
    arch: Option[String], clientId: String, created: Long, device: Option[String],
    events: Seq[TelemetryEvent], locale: Option[String],
    os: String, osversion: String, settings: Map[String, String], meta: Meta)
  extends MobileLikeEventPing {
  import AmplitudeJson._

  /** reference: MobileEvent.scala:36-60 */
  override def pingAmplitudeProperties: JsonObject = jobj(
    ("device_id", so(getClientId)),
    ("device_model", so(device)),
    ("arch", so(arch)),
    ("locale", so(locale)),
    ("user_properties", Some(jobj(
      ("pref_default_search_engine", so(settings.get("defaultSearchEngine"))),
      ("pref_automatic_slider_value", so(settings.get("prefKeyAutomaticSliderValue"))),
      ("pref_automatic_switch_on_off", so(settings.get("prefKeyAutomaticSwitchOnOff"))),
      ("pref_theme_name", so(settings.get("prefKeyThemeName"))),
      ("pref_activity_stream_bookmark_highlights_visible", boolPref(settings.get("profile.ASBookmarkHighlightsVisible"))),
      ("pref_activity_stream_pocket_stories_visible", boolPref(settings.get("profile.ASPocketStoriesVisible"))),
      ("pref_activity_stream_recent_highlights_visible", boolPref(settings.get("profile.ASRecentHighlightsVisible"))),
      ("pref_block_popups", boolPref(settings.get("profile.blockPopups"))),
      ("pref_tracking_protection_enabled", so(settings.get("profile.prefkey.trackingprotection.enabled"))),
      ("pref_tracking_protection_normal_browsing", so(settings.get("profile.prefkey.trackingprotection.normalbrowsing"))),
      ("pref_tracking_protection_private_browsing", so(settings.get("profile.prefkey.trackingprotection.privatebrowsing"))),
      ("pref_tracking_protection_strength", so(settings.get("profile.prefkey.trackingprotection.strength"))),
      ("pref_save_logins", boolPref(settings.get("profile.saveLogins"))),
      ("pref_settings_close_private_tabs", boolPref(settings.get("profile.settings.closePrivateTabs"))),
      ("pref_show_translation", boolPref(settings.get("profile.show-translation"))),
      ("pref_show_clipboard_bar", boolPref(settings.get("profile.showClipboardBar"))),
      ("pref_window_height", so(settings.get("windowHeight"))),
      ("pref_window_width", so(settings.get("windowWidth")))))))
}

object MobileEventPing {
  def fromEnvelope(env: Envelope): MobileEventPing = {
    val c = MobileLikeEventPing.common(env)
    MobileEventPing(c.arch, c.clientId, c.created, c.device, c.events, c.locale,
      c.os, c.osversion, c.settings, c.meta)
  }
}

final case class FireTvEventPing(
    arch: Option[String], clientId: String, created: Long, device: Option[String],
    events: Seq[TelemetryEvent], locale: Option[String],
    os: String, osversion: String, settings: Map[String, String], meta: Meta)
  extends MobileLikeEventPing {
  import AmplitudeJson._

  /** reference: FireTvEventPing.scala:36-46 */
  override def pingAmplitudeProperties: JsonObject = jobj(
    ("device_id", so(getClientId)),
    ("locale", so(locale)),
    ("os_version", so(getOsVersion)),
    ("user_properties", Some(jobj(
      ("tracking_protection_enabled", boolPref(settings.get("tracking_protection_enabled"))),
      ("total_home_tile_count", so(settings.get("total_home_tile_count"))),
      ("custom_home_tile_count", so(settings.get("custom_home_tile_count"))),
      ("remote_control_name", so(settings.get("remote_control_name"))),
      ("app_id", so(settings.get("app_id")))))))
}

object FireTvEventPing {
  def fromEnvelope(env: Envelope): FireTvEventPing = {
    val c = MobileLikeEventPing.common(env)
    FireTvEventPing(c.arch, c.clientId, c.created, c.device, c.events, c.locale,
      c.os, c.osversion, c.settings, c.meta)
  }
}
