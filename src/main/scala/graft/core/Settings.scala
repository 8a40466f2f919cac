package graft.core

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Ranking configuration (reference: `settings.py:6-13,46-53` +
  * `config.toml:12-23`). Defaults are the reference's defaults.
  *
  * `typeBoost` is an ORDERED prefix→boost list: the reference iterates
  * the TOML map in insertion order and the first matching prefix wins
  * (`ranking.py:34-38`), so order is semantic and a `Map` would be wrong.
  */
case class Settings(
    wSimilarity: Double = 0.60,
    wType: Double = 0.25,
    wImportance: Double = 0.15,
    wProximity: Double = 0.15,
    proximityKm: Double = 25.0,
    typeBoost: Seq[(String, Double)] =
      Seq("tourism:" -> 0.80, "amenity:" -> 0.70, "shop:" -> 0.60),
    typeBoostDefault: Double = 0.40) {

  /** F15 — first `typeBoost` prefix matching `kind` wins; else default. */
  def boostFor(kind: String): Double =
    typeBoost.collectFirst {
      case (prefix, v) if kind != null && kind.startsWith(prefix) => v
    }.getOrElse(typeBoostDefault)
}

object Settings {

  /** Minimal TOML subset loader for the reference's config shape
    * (`[ranking.weights]` / `[ranking.type_boost]` sections of
    * `key = value` lines). Unknown sections/keys are ignored; a missing
    * file yields pure defaults — mirroring `settings.py:24-54`.
    */
  def load(path: String): Settings = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return Settings()
    var section = ""
    var s = Settings()
    var boosts = Vector.empty[(String, Double)]
    var boostDefault = 0.40
    var sawBoosts = false
    Files.readAllLines(p).asScala.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.startsWith("[") && line.endsWith("]")) {
        section = line.substring(1, line.length - 1).trim
      } else if (line.contains("=")) {
        val Array(k0, v0) = line.split("=", 2)
        val k = k0.trim.stripPrefix("\"").stripSuffix("\"")
        val v = v0.trim.stripPrefix("\"").stripSuffix("\"")
        section match {
          case "ranking.weights" =>
            k match {
              case "similarity" => s = s.copy(wSimilarity = v.toDouble)
              case "type" => s = s.copy(wType = v.toDouble)
              case "importance" => s = s.copy(wImportance = v.toDouble)
              case "proximity" => s = s.copy(wProximity = v.toDouble)
              case "proximity_km" => s = s.copy(proximityKm = v.toDouble)
              case _ =>
            }
          case "ranking.type_boost" =>
            sawBoosts = true
            if (k == "default") boostDefault = v.toDouble
            else boosts :+= (k -> v.toDouble)
          case _ =>
        }
      }
    }
    if (sawBoosts) s.copy(typeBoost = boosts, typeBoostDefault = boostDefault)
    else s
  }
}
