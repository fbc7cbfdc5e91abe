package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Boilerplate removal: df-threshold delete + in-order reassembly. */
class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val banner = "please accept all cookies to continue reading this site now"
  private val bodies = Seq(
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "one two three four five six seven eight nine ten",
    "red orange yellow green blue indigo violet cyan magenta black")

  test("segments shared by more than maxDf docs are deleted in place") {
    import spark.implicits._
    // banner is a full 10-token segment PREFIX in every doc; bodies unique
    val df = bodies.zipWithIndex
      .map { case (b, i) => (i.toLong, s"$banner $b") }
      .toDF("doc_id", "text")
    val got = TextAnalysis.removeBoilerplate(df, "doc_id", "text", 10, 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == bodies.zipWithIndex.map { case (b, i) =>
      (i.toLong, b, 1L, 2L)
    })
  }

  test("docs below the df threshold pass through verbatim") {
    import spark.implicits._
    val df = Seq((1L, bodies(0)), (2L, bodies(1))).toDF("doc_id", "text")
    val got = TextAnalysis.removeBoilerplate(df, "doc_id", "text", 10, 2)
      .orderBy("doc_id").collect()
    assert(got.map(_.getString(1)).toSeq == Seq(bodies(0), bodies(1)))
    assert(got.map(r => (r.getLong(2), r.getLong(3))).forall(_ == (1L, 1L)))
  }

  test("a fully-boilerplate doc survives with empty clean_text") {
    import spark.implicits._
    val df = (Seq((10L, banner), (11L, banner), (12L, banner)) ++
      Seq((13L, bodies(0)))).toDF("doc_id", "text")
    val got = TextAnalysis.removeBoilerplate(df, "doc_id", "text", 10, 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.take(3).forall { case (_, t, k, n) => t == "" && k == 0 && n == 1 })
    assert(got(3) == ((13L, bodies(0), 1L, 1L)))
  }

  test("reassembly preserves original segment order across many segments") {
    import spark.implicits._
    val words = (1 to 95).map(i => s"w$i").mkString(" ") // 10 segments, last short
    val df = Seq((1L, words)).toDF("doc_id", "text")
    val got = TextAnalysis.removeBoilerplate(df, "doc_id", "text", 10, 2)
      .collect().head
    assert(got.getString(1) == words)
    assert((got.getLong(2), got.getLong(3)) == ((10L, 10L)))
  }

  test("null and blank texts are dropped (no segments to audit)") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "  "), (3L, "a b"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.removeBoilerplate(df, "doc_id", "text", 10, 2)
      .collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(3L))
  }
}
