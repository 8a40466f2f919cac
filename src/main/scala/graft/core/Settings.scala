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
    typeBoostDefault: Double = 0.40,
    // serving/build settings (settings.py:6-13): artifact location,
    // upstream source, idempotent-build override
    dbPath: String = "data/gazetteer",
    pbfUrl: String = "",
    buildOverwrite: Boolean = false) {

  /** F15 — first `typeBoost` prefix matching `kind` wins; else default. */
  def boostFor(kind: String): Double =
    typeBoost.collectFirst {
      case (prefix, v) if kind != null && kind.startsWith(prefix) => v
    }.getOrElse(typeBoostDefault)
}

object Settings {

  /** The reference's env-var boolean coercion (`settings.py:16-21`). */
  private[core] def coerceBool(s: Option[String], default: Boolean): Boolean =
    s.fold(default)(v => Set("1", "true", "yes", "y", "on")
      .contains(v.toLowerCase(java.util.Locale.ROOT)))

  /** Minimal TOML subset loader for the reference's config shape
    * (`[data]` / `[build]` / `[ranking.weights]` / `[ranking.type_boost]`
    * sections of `key = value` lines). Unknown sections/keys are
    * ignored; a missing file yields pure defaults; environment variables
    * `GAZETTEER_DB_PATH` / `PBF_URL` / `OVERWRITE` override the file,
    * with the reference's bool coercion — mirroring `settings.py:24-54`.
    * `env` is injectable for tests (defaults to the process env).
    */
  def load(path: String): Settings = load(path, sys.env)

  /** Env wins over file (`os.getenv(KEY, file_value)` in the reference). */
  private def withEnv(s: Settings, env: Map[String, String]): Settings =
    s.copy(
      dbPath = env.getOrElse("GAZETTEER_DB_PATH", s.dbPath),
      pbfUrl = env.getOrElse("PBF_URL", s.pbfUrl),
      buildOverwrite = coerceBool(env.get("OVERWRITE"), s.buildOverwrite))

  def load(path: String, env: Map[String, String]): Settings = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return withEnv(Settings(), env)
    var s = Settings()
    var section = ""
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
          case "data" =>
            k match {
              case "db_path" => s = s.copy(dbPath = v)
              case "pbf_url" => s = s.copy(pbfUrl = v)
              case _ =>
            }
          case "build" =>
            if (k == "overwrite")
              s = s.copy(buildOverwrite = coerceBool(Some(v), s.buildOverwrite))
          case _ =>
        }
      }
    }
    if (sawBoosts) s = s.copy(typeBoost = boosts, typeBoostDefault = boostDefault)
    withEnv(s, env)
  }
}
