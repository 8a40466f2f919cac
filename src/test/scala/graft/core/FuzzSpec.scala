package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** WRatio golden + property tests. Goldens are hand-derived from the
  * published algorithm (Indel ratio = 2·LCS/(m+n); length-ratio-scaled
  * composite); the classic rapidfuzz doc example is included.
  */
class FuzzSpec extends AnyFunSuite {

  private def approx(a: Double, b: Double, eps: Double = 1e-9): Boolean =
    math.abs(a - b) <= eps

  test("ratio: normalized Indel similarity") {
    assert(Fuzz.ratio("abc", "abc") == 100.0)
    assert(Fuzz.ratio("", "") == 100.0)
    assert(Fuzz.ratio("abc", "") == 0.0)
    // lcs("abcd","bc")=2 -> 2*2/6*100
    assert(approx(Fuzz.ratio("abcd", "bc"), 200.0 * 2 / 6))
    // classic: 1 insertion over 29 chars -> 28/29*2/... = (14+15-1)/(14+15)
    assert(approx(Fuzz.ratio("this is a test", "this is a test!"), 2800.0 / 29))
  }

  test("partialRatio: best window alignment") {
    assert(Fuzz.partialRatio("bc", "abcd") == 100.0)
    assert(Fuzz.partialRatio("dining", "monograph dining") == 100.0)
    assert(Fuzz.partialRatio("", "") == 100.0)
    assert(Fuzz.partialRatio("", "abc") == 0.0)
  }

  test("token sort/set ratios") {
    assert(Fuzz.tokenSortRatio("b a", "a b") == 100.0)
    // shared token -> partial token set short-circuits to 100
    assert(Fuzz.partialTokenSetRatio("x common", "y common") == 100.0)
    assert(Fuzz.tokenSetRatio("a b c", "a b c") == 100.0)
  }

  test("wratio goldens") {
    assert(Fuzz.wratio("abc", "abc") == 100.0)
    assert(Fuzz.wratio("", "anything") == 0.0)
    assert(Fuzz.wratio(null, "x") == 0.0)
    // rapidfuzz doc example: WRatio("this is a test", "this is a test!") ~ 96.55
    assert(approx(Fuzz.wratio("this is a test", "this is a test!"), 2800.0 / 29))
    // len_ratio 2 >= 1.5: partial path, scale 0.9 -> 90
    assert(approx(Fuzz.wratio("bc", "abcd"), 90.0))
    // the Demo-verified case: query token inside a longer name
    assert(approx(Fuzz.wratio("dining", "monograph dining"), 90.0))
  }

  test("property: bit-parallel LCS equals the DP on random strings") {
    val gen = Gen.listOfN(400, Gen.zip(
      Gen.chooseNum(0, 64).flatMap(n => Gen.stringOfN(n, Gen.oneOf("abcdeé 123".toSeq))),
      Gen.chooseNum(0, 80).flatMap(n => Gen.stringOfN(n, Gen.oneOf("abcdeé 123".toSeq)))))
      .pureApply(Gen.Parameters.default, Seed(99L))
    gen.foreach { case (a, b) =>
      if (a.length <= 64)
        assert(Fuzz.lcsLenBitParallel(a, b) == Fuzz.lcsLenDP(a, b),
          s"mismatch on ('$a','$b')")
    }
    // exact 64-char boundary (sign-bit territory for the word arithmetic)
    val a64 = "ab" * 32
    val b64 = "ba" * 32
    assert(Fuzz.lcsLenBitParallel(a64, b64) == Fuzz.lcsLenDP(a64, b64))
    assert(Fuzz.lcsLenBitParallel(a64, a64) == 64)
  }

  test("property: bounds, symmetry, identity") {
    val gen = Gen.listOfN(200, Gen.zip(Gen.alphaNumStr, Gen.alphaNumStr))
      .pureApply(Gen.Parameters.default, Seed(7L))
    gen.foreach { case (a, b) =>
      val s = Fuzz.wratio(a, b)
      assert(s >= 0.0 && s <= 100.0, s"out of bounds for ('$a','$b')")
      assert(approx(s, Fuzz.wratio(b, a)), s"asymmetric for ('$a','$b')")
      if (a.nonEmpty) assert(Fuzz.wratio(a, a) == 100.0)
    }
  }
}
