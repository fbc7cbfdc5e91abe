package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** The estimation audit's exact verification ships per-doc shingle SETS as
  * sorted distinct xxhash64 longs and intersects them with a linear merge
  * ([[CharShingleHashesSortedExpr]] / [[SortedLongIntersectCountExpr]]).
  * Its correctness contract against the string-based DuckDB oracle is:
  *
  *   |hashes(A) ∩ hashes(B)| == |shingles(A) ∩ shingles(B)|   and
  *   |hashes(A)| == |distinct shingles(A)|
  *
  * exactly, whenever no two DISTINCT shingles in play collide under
  * xxhash64 (~2⁻⁶⁴ per pair, the repo-wide accepted trade). Pinned here on
  * random texts against the composable
  * `sort_array(array_distinct(transform(charShingles, xxhash64)))` +
  * `array_intersect` forms the expressions replaced, plus the short-text
  * and unicode windows [[CharShinglesExpr]] defines. */
class ShingleHashSetProps extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def composableHashes(c: org.apache.spark.sql.Column, k: Int) =
    sort_array(array_distinct(transform(charShingles(c, k), s => xxhash64(s))))

  private def check(k: Int, texts: Seq[String]): Unit = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    // normText on the native side: the composable side's charShingles
    // normalizes internally, and the audit applies the same normalization
    val rows = df.select(col("id"),
        TextExpressions.sortedShingleHashes(normText(col("text")), k)
          .as("native"),
        composableHashes(col("text"), k).as("composable"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"id=${r.getLong(0)} k=$k: sorted-distinct hash sets diverge")
    }
    // pairwise: merge-count == size(array_intersect) on the same sets
    val a = df.selectExpr("id AS id_a", "text AS ta")
    val b = df.selectExpr("id AS id_b", "text AS tb")
    val pairs = a.crossJoin(b).where(col("id_a") < col("id_b"))
      .select(
        TextExpressions.sortedIntersectCount(
          TextExpressions.sortedShingleHashes(normText(col("ta")), k),
          TextExpressions.sortedShingleHashes(normText(col("tb")), k))
          .as("merge_n"),
        size(array_intersect(
          array_distinct(charShingles(col("ta"), k)),
          array_distinct(charShingles(col("tb"), k))))
          .cast("long").as("exact_n"))
      .collect()
    pairs.foreach { r =>
      assert(r.getLong(0) == r.getLong(1),
        s"k=$k merge=${r.getLong(0)} exact=${r.getLong(1)}")
    }
  }

  test("hash-set form == string-set form on crafted overlap cases") {
    check(k = 5, Seq(
      "the quick brown fox jumps over the lazy dog",
      "a quick brown fox leaps over a sleepy dog",
      "completely unrelated text here",
      "the quick brown fox jumps over the lazy dog", // identical twin
      "abcd",          // shorter than k: whole-string shingle
      "aaaaaaaaaa",    // one distinct shingle
      ""))
    check(k = 2, Seq("héllo wörld", "wörld héllo", "日本語テスト", "日本"))
  }

  test("random texts: set sizes and intersections match the string forms") {
    // small alphabet so random texts genuinely share shingles — a
    // no-overlap corpus would test the zero branch only
    val alphabet = "abcde "
    var x = 0x9e3779b97f4a7c15L
    def nextInt(bound: Int): Int = {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (((x >>> 1) % bound).toInt)
    }
    for (round <- 0 until 12) {
      val texts = Seq.fill(6) {
        val n = nextInt(61)
        (0 until n).map(_ => alphabet(nextInt(alphabet.length))).mkString
      }
      check(k = 3, texts)
    }
  }
}
