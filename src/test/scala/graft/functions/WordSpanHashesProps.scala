package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** [[WordSpanHashesExpr]] must be bit-identical to the composable form it
  * replaced: `transform(sequence(0, n-k), p -> xxhash64(words[p+1..p+k]))`
  * guarded by `size >= k`. xxhash64 seed-chaining over UTF8 words is the
  * span identity the whole exact-substring pass keys on, so any
  * divergence silently changes ownership — pin it on random word arrays,
  * unicode, empty strings, and the n < k short-circuit. */
class WordSpanHashesProps extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def composable(k: Int) =
    when(size(col("words")) >= k,
        transform(sequence(lit(0), size(col("words")) - k),
          p => xxhash64((1 to k).map(i => element_at(col("words"), p + i)): _*)))
      .otherwise(array().cast("array<bigint>"))

  private def check(k: Int, rows: Seq[Seq[String]]): Unit = {
    import spark.implicits._
    val df = rows.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "words")
    val out = df.select(col("id"),
        TextExpressions.wordSpanHashesNative(col("words"), k).as("native"),
        composable(k).as("composable"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"id=${r.getLong(0)} k=$k native=${r.getSeq[Long](1)} " +
          s"composable=${r.getSeq[Long](2)}")
    }
  }

  test("native span hashes == composable xxhash64 chain") {
    val words = "the quick brown fox jumps over the lazy dog again".split(" ")
    check(k = 3, Seq(words.toSeq, words.take(5).toSeq, words.take(2).toSeq))
    check(k = 8, Seq(words.toSeq, words.take(8).toSeq, words.take(7).toSeq))
    check(k = 1, Seq(words.toSeq, Seq("solo"), Seq()))
  }

  test("unicode, empty strings, and repeated words hash identically") {
    check(k = 2, Seq(
      Seq("héllo", "wörld", "héllo", "wörld"),
      Seq("", "a", "", "a", ""),
      Seq("日本語", "テスト", "日本語"),
      Seq("same", "same", "same", "same")))
  }

  test("fewer than k words yields an empty array") {
    import spark.implicits._
    val df = Seq((0L, Seq("one", "two"))).toDF("id", "words")
    assert(df.select(TextExpressions.wordSpanHashesNative(col("words"), 3))
      .head().getSeq[Long](0).isEmpty)
  }
}
