package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class NormSpec extends SparkSpec {

  private def samples(n: Int): List[String] =
    Gen.listOfN(n, Gen.asciiPrintableStr).pureApply(Gen.Parameters.default, Seed(42L))

  test("canon: lowercases, strips punctuation to space, collapses, trims") {
    import spark.implicits._
    val rows = Seq(
      "  Monograph   Dining  ", "Jalan-Jalan Cafe!", "a__b..c", "", null,
      "UPPER lower 123", "tabs\tand\nnewlines")
      .toDF("s").select(Norm.canon(col("s"))).as[String].collect()
    assert(rows(0) == "monograph dining")
    assert(rows(1) == "jalan jalan cafe") // hyphen killed by canon
    assert(rows(2) == "a b c")
    assert(rows(3) == "")
    assert(rows(4) == "") // NULL -> ''
    assert(rows(5) == "upper lower 123")
    assert(rows(6) == "tabs and newlines")
  }

  test("norm keeps hyphens (F1/F2 asymmetry is observable and preserved)") {
    assert(Norm.norm("Jalan-Jalan Cafe!") == "jalan-jalan cafe")
    assert(Norm.canonStr("Jalan-Jalan Cafe!") == "jalan jalan cafe")
    assert(Norm.norm("a#b@c") == "a b c")
    assert(Norm.norm("it's fine") == "it s fine")
  }

  test("tokenize + ordered dedup (first occurrence wins)") {
    assert(Norm.tokenize("Monograph Dining, KL") == Seq("monograph", "dining", "kl"))
    assert(Norm.dedupTokens(Seq(Seq("a", "b"), Seq("b", "c", "a"), Seq("d"))) ==
      Seq("a", "b", "c", "d"))
  }

  test("canon driver-side twin matches column form") {
    import spark.implicits._
    val inputs = Seq("Abc-DEF gh1!", "  x  ", "ünïcode stripped", "#@!") ++ samples(50)
    val colForm = inputs.toDF("s").select(Norm.canon(col("s"))).as[String].collect()
    inputs.zip(colForm).foreach { case (in, c) =>
      assert(Norm.canonStr(in) == c, s"for input '$in'")
    }
  }

  test("property: canon and norm are idempotent; norm never double-spaces") {
    samples(300).foreach { s =>
      val c = Norm.canonStr(s)
      assert(Norm.canonStr(c) == c, s"canon not idempotent on '$s'")
      val n = Norm.norm(s)
      assert(Norm.norm(n) == n, s"norm not idempotent on '$s'")
      assert(!n.contains("  "))
    }
  }
}
