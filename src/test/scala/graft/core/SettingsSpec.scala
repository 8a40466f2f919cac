package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SettingsSpec extends AnyFunSuite {

  test("defaults match the reference (settings.py:46-53, config.toml:12-23)") {
    val s = Settings()
    assert(s.wSimilarity == 0.60 && s.wType == 0.25 &&
      s.wImportance == 0.15 && s.wProximity == 0.15)
    assert(s.proximityKm == 25.0)
    assert(s.typeBoost == Seq("tourism:" -> 0.80, "amenity:" -> 0.70, "shop:" -> 0.60))
    assert(s.typeBoostDefault == 0.40)
  }

  test("boostFor: first matching prefix wins, insertion order is semantic") {
    val s = Settings(typeBoost = Seq("a:" -> 0.9, "ab" -> 0.1), typeBoostDefault = 0.3)
    assert(s.boostFor("a:bar") == 0.9)
    assert(s.boostFor("abx") == 0.1)
    assert(s.boostFor("zzz") == 0.3)
    assert(s.boostFor(null) == 0.3)
  }

  test("TOML subset loader: sections, quoted keys, comments, missing file") {
    val toml =
      """# comment
        |[ranking.weights]
        |similarity = 0.5
        |proximity_km = 10 # trailing comment
        |[ranking.type_boost]
        |"leisure:" = 0.9
        |"shop:" = 0.2
        |"default" = 0.1
        |[other]
        |ignored = true
        |""".stripMargin
    val f = Files.createTempFile("graft-settings", ".toml")
    Files.writeString(f, toml)
    // env injected empty: the 1-arg load reads the REAL process env
    // (reference parity), which would make these assertions depend on
    // whatever GAZETTEER_DB_PATH/PBF_URL/OVERWRITE the runner exports
    val s = Settings.load(f.toString, env = Map.empty)
    assert(s.wSimilarity == 0.5)
    assert(s.wType == 0.25) // untouched default
    assert(s.proximityKm == 10.0)
    assert(s.typeBoost == Seq("leisure:" -> 0.9, "shop:" -> 0.2))
    assert(s.typeBoostDefault == 0.1)
    assert(Settings.load("/nonexistent/config.toml", env = Map.empty) == Settings())
  }

  test("serving/build settings: [data]/[build] sections with env override (settings.py:6-21)") {
    val toml =
      """[data]
        |db_path = "artifacts/gaz"
        |pbf_url = "https://example.org/planet.pbf"
        |[build]
        |overwrite = true
        |""".stripMargin
    val f = Files.createTempFile("graft-settings", ".toml")
    Files.writeString(f, toml)
    val fromFile = Settings.load(f.toString, env = Map.empty)
    assert(fromFile.dbPath == "artifacts/gaz")
    assert(fromFile.pbfUrl == "https://example.org/planet.pbf")
    assert(fromFile.buildOverwrite)
    // env wins over file, reference bool coercion for OVERWRITE
    val over = Settings.load(f.toString, env = Map(
      "GAZETTEER_DB_PATH" -> "/mnt/gaz", "PBF_URL" -> "s3://b/x.pbf",
      "OVERWRITE" -> "off"))
    assert(over.dbPath == "/mnt/gaz" && over.pbfUrl == "s3://b/x.pbf")
    assert(!over.buildOverwrite)
    // missing file: env still applies; defaults otherwise
    val envOnly = Settings.load("/nonexistent/c.toml", env = Map("OVERWRITE" -> "Yes"))
    assert(envOnly.buildOverwrite && envOnly.dbPath == "data/gazetteer")
    assert(Settings.coerceBool(Some("1"), default = false))
    assert(!Settings.coerceBool(Some("nope"), default = true))
    assert(Settings.coerceBool(None, default = true))
  }
}
