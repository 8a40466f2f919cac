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
    val s = Settings.load(f.toString)
    assert(s.wSimilarity == 0.5)
    assert(s.wType == 0.25) // untouched default
    assert(s.proximityKm == 10.0)
    assert(s.typeBoost == Seq("leisure:" -> 0.9, "shop:" -> 0.2))
    assert(s.typeBoostDefault == 0.1)
    assert(Settings.load("/nonexistent/config.toml") == Settings())
  }
}
