package graft.functions

import java.text.Normalizer

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Generative properties for the Unicode normalization expressions,
  * evaluated directly (no Spark session). The generator mixes ASCII,
  * precomposed Latin accents, bare combining marks (so sequences like
  * `x` + U+0301 arise that NFC may or may not compose), a non-decomposable
  * letter, and a supplementary-plane char (surrogate-pair handling).
  */
object UnicodeNormProps extends Properties("UnicodeNorm") {

  private val genText: Gen[String] = for {
    n <- Gen.chooseNum(0, 30)
    cs <- Gen.listOfN(n, Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      // é ñ ø, bare combining acute/diaeresis, space, U+1F600 (surrogates)
      Gen.oneOf("\u00e9", "\u00f1", "\u00f8", "\u0301", "\u0308",
        " ", new String(Character.toChars(0x1F600)))))
  } yield cs.mkString

  private def nfc(s: String) =
    UnicodeNorm.nfc(UTF8String.fromString(s)).toString
  private def strip(s: String) =
    UnicodeNorm.stripAccents(UTF8String.fromString(s)).toString

  property("nfc is idempotent") = forAll(genText) { s =>
    nfc(nfc(s)) == nfc(s)
  }

  property("nfc matches java.text.Normalizer directly") = forAll(genText) {
    s => nfc(s) == Normalizer.normalize(s, Normalizer.Form.NFC)
  }

  property("strip output contains no non-spacing marks") = forAll(genText) {
    s =>
      strip(s).codePoints().toArray
        .forall(cp => Character.getType(cp) != Character.NON_SPACING_MARK)
  }

  property("strip is invariant under prior nfc") = forAll(genText) { s =>
    strip(s) == strip(nfc(s))
  }

  property("strip never lengthens (marks only removed)") = forAll(genText) {
    s => strip(s).codePointCount(0, strip(s).length) <=
      Normalizer.normalize(s, Normalizer.Form.NFD)
        .codePointCount(0, Normalizer.normalize(s, Normalizer.Form.NFD).length)
  }
}
