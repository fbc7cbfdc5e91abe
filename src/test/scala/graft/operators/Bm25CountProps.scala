package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Generative parity proof for the codegen BM25 counting core: the
  * regexp_count formulations (token-run counting, lookaround standalone-
  * term counting, any-term rlike) must equal the tokenize-then-filter
  * reference on arbitrary text. Spark's RegExpCount/RLike evaluate through
  * java.util.regex, so a plain-JVM property over the same patterns is
  * faithful to the expression semantics without paying a session per
  * sample. Alphabet mixes letters, digits, whitespace, punctuation and a
  * multibyte char; terms are chosen to collide with longer tokens
  * (prefix/suffix traps the lookarounds must reject). */
object Bm25CountProps extends Properties("Bm25Counts") {

  private val Terms = Seq("abc", "abcd", "cab")

  private def tokens(s: String): Seq[String] =
    "[a-z]+".r.findAllIn(s.toLowerCase(java.util.Locale.ROOT)).toSeq
      .filter(_.length >= 3)

  private def countPattern(s: String, pat: String): Int = {
    val m = java.util.regex.Pattern.compile(pat)
      .matcher(s.toLowerCase(java.util.Locale.ROOT))
    var n = 0
    while (m.find()) n += 1
    n
  }

  private val genText: Gen[String] = for {
    n <- Gen.choose(0, 60)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.oneOf('a', 'b', 'c', 'd'),
      2 -> Gen.oneOf('A', 'B', 'C'),
      2 -> Gen.oneOf('0', '7'),
      3 -> Gen.const(' '),
      1 -> Gen.oneOf('.', ',', '\n', 'é')))
  } yield cs.mkString

  property("dl: regexp_count('[a-z]{3,}') == #tokens of length >= 3") =
    forAll(genText) { s =>
      countPattern(s, "[a-z]{3,}") == tokens(s).length
    }

  property("tf: lookaround count == #tokens equal to the term") =
    forAll(genText) { s =>
      Terms.forall { t =>
        countPattern(s, s"(?<![a-z])$t(?![a-z])") == tokens(s).count(_ == t)
      }
    }

  property("matched filter: any-term alternation == exists token in terms") =
    forAll(genText) { s =>
      val pat = s"(?<![a-z])(${Terms.mkString("|")})(?![a-z])"
      (countPattern(s, pat) > 0) == tokens(s).exists(Terms.contains)
    }
}
