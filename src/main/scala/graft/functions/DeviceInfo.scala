package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F18 user-agent parsing (frontend_transformer.py:235-309) — pure
  * contains-chains over the lowered UA string, exactly the reference's
  * disambiguation rules (chrome excludes edg, safari excludes chrome).
  */
object DeviceInfo {

  def deviceType(ua: Column): Column = {
    val u = lower(ua)
    when(ua.isNull || ua === "", "unknown")
      .when(u.contains("mobile") || u.contains("iphone") || u.contains("ipod") || u.contains("android"), "mobile")
      .when(u.contains("tablet") || u.contains("ipad"), "tablet")
      .otherwise("desktop")
  }

  def browser(ua: Column): Column = {
    val u = lower(ua)
    when(ua.isNull || ua === "", "unknown")
      .when(u.contains("chrome") && !u.contains("edg"), "chrome")
      .when(u.contains("firefox"), "firefox")
      .when(u.contains("safari") && !u.contains("chrome"), "safari")
      .when(u.contains("edg"), "edge")
      .when(u.contains("opera"), "opera")
      .otherwise("other")
  }

  def operatingSystem(ua: Column): Column = {
    val u = lower(ua)
    when(ua.isNull || ua === "", "unknown")
      .when(u.contains("windows"), "windows")
      .when(u.contains("mac os") || u.contains("macos"), "macos")
      .when(u.contains("linux"), "linux")
      .when(u.contains("android"), "android")
      .when(u.contains("ios") || u.contains("iphone") || u.contains("ipad"), "ios")
      .otherwise("other")
  }

  def isMobile(ua: Column): Column = {
    val u = lower(ua)
    when(ua.isNull || ua === "", lit(false))
      .otherwise(u.contains("mobile") || u.contains("iphone") || u.contains("ipod") ||
        u.contains("android") || u.contains("blackberry") || u.contains("windows phone"))
  }

  /** Assembled device_info struct (frontend_transformer.py:222-233). */
  def deviceInfo(ua: Column, screenRes: Column, viewport: Column): Column =
    struct(
      ua.as("user_agent"),
      deviceType(ua).as("device_type"),
      browser(ua).as("browser"),
      operatingSystem(ua).as("operating_system"),
      isMobile(ua).as("is_mobile"),
      screenRes.as("screen_resolution"),
      viewport.as("viewport_size"))
}
