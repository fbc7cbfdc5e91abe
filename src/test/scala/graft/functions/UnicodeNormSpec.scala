package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.SparkTestSession

/** Unicode normalization expressions: eval semantics, the codegen path
  * (exercised through a DataFrame select), the ASCII identity fast path, and
  * the laws NFC/strip must satisfy. The cross-engine parity gate is the
  * `text_normalize` DuckDB oracle; these pin the JVM-side semantics.
  */
class UnicodeNormSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val eAcuteDecomp = "e\u0301"   // e + combining acute
  private val uDiaeresis = "u\u0308"     // u + combining diaeresis

  test("nfc composes decomposed sequences; strip removes marks (eval)") {
    val nfc = UnicodeNorm.nfc(UTF8String.fromString(eAcuteDecomp)).toString
    assert(nfc == "\u00e9")
    val plain = UnicodeNorm.stripAccents(UTF8String.fromString("\u00e9")).toString
    assert(plain == "e")
  }

  test("non-decomposable letters pass through strip unchanged") {
    // ø (U+00F8) has no canonical decomposition: not an accent, stays
    val s = UTF8String.fromString("\u00f8x\u00e5")   // o-slash x a-ring
    assert(UnicodeNorm.stripAccents(s).toString == "\u00f8xa")
  }

  test("ascii fast path returns the identical buffer") {
    val s = UTF8String.fromString("plain ascii text 123")
    assert(UnicodeNorm.nfc(s) eq s)
    assert(UnicodeNorm.stripAccents(s) eq s)
  }

  test("codegen path agrees with eval over mixed composed/decomposed input") {
    import spark.implicits._
    val rows = Seq(
      "caf" + eAcuteDecomp,            // cafe + combining acute
      "caf\u00e9",               // cafe precomposed
      "gr" + uDiaeresis + "n \u00f1",  // grün-ish + ñ
      "pure ascii",
      "")
    val df = rows.toDF("s").select(
      UnicodeExpressions.nfcNormalize(col("s")).as("nfc"),
      UnicodeExpressions.stripAccents(col("s")).as("plain"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1)))
    val expect = rows.map { s =>
      (UnicodeNorm.nfc(UTF8String.fromString(s)).toString,
        UnicodeNorm.stripAccents(UTF8String.fromString(s)).toString)
    }
    assert(got.toSeq == expect)
    // both spellings of café normalize to the same bytes and strip to "cafe"
    assert(got(0) == got(1))
    assert(got(0)._2 == "cafe")
  }

  test("graft_nfc / graft_strip_accents usable from plain Spark SQL") {
    graft.plans.SkylineExtensions.register(spark)
    val r = spark.sql(
      s"SELECT graft_nfc('caf$eAcuteDecomp') AS n, " +
        s"graft_strip_accents('caf$eAcuteDecomp') AS p").head()
    assert(r.getString(0) == "caf\u00e9")
    assert(r.getString(1) == "cafe")
  }

  test("nfc is idempotent and strip after nfc == strip") {
    val samples = Seq("a" + eAcuteDecomp + uDiaeresis, "\u00e1\u00e9\u00f6\u00f1",
      "x", "", "\u00f8")
    samples.foreach { s =>
      val u = UTF8String.fromString(s)
      val once = UnicodeNorm.nfc(u)
      assert(UnicodeNorm.nfc(once).toString == once.toString)
      assert(UnicodeNorm.stripAccents(u).toString ==
        UnicodeNorm.stripAccents(once).toString)
    }
  }
}
