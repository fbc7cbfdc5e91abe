package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The prefix-filtered jaccard join must return EXACTLY the plain
  * inverted-index join's pairs — the prefix is a candidate-pruning
  * optimization, never a semantics change, at ANY threshold. Random
  * corpus with planted mutated duplicates so pairs exist on both sides
  * of each cut. */
class JaccardPrefixSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def fixture = {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    def randText(n: Int): String =
      Seq.fill(n)(('a' + rng.nextInt(6)).toChar).mkString
    val base = Seq.tabulate(40)(i => (i.toLong, randText(60 + rng.nextInt(40))))
    // planted near-dups: copy with a small point mutation (high jaccard)
    // and a half-rewrite (low jaccard) — both sides of the thresholds
    val dups = base.take(10).map { case (id, t) =>
      (id + 100, t.updated(rng.nextInt(t.length), 'z')) }
    val fars = base.slice(10, 20).map { case (id, t) =>
      (id + 200, t.take(t.length / 2) + randText(t.length / 2)) }
    (base ++ dups ++ fars).toDF("doc_id", "text")
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSeq

  // 0.8 = the catalog default; 0.5/0.7/0.9 exercise the generalized
  // rational-ceil prefix math (0.7·10 and 0.8·5 are the classic double-
  // rounding traps — exact integer ceil must not shrink the prefix);
  // 2/3 and 0.66666666 have no 6-decimal representation, pinning the
  // floor-not-round snap (round would give t' > t and drop pairs)
  for (t <- Seq(0.5, 2.0 / 3.0, 0.66666666, 0.7, 0.8, 0.9))
    test(s"prefix-filtered join equals plain inverted-index join at t=$t") {
      val docs = fixture
      val plain = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 5,
        threshold = t, maxDocFreq = 100)
      val pref = Dedup.ngramJaccardPrefix(docs, "doc_id", "text", k = 5,
        threshold = t, maxDocFreq = 100)
      val want = canon(plain)
      assert(want.nonEmpty, "fixture must produce pairs above the threshold")
      assert(canon(pref) === want)
    }

  test("thresholds outside (0, 1] are rejected") {
    val docs = fixture
    intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPrefix(docs, "doc_id", "text", threshold = 0.0)
    }
    intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPrefix(docs, "doc_id", "text", threshold = 1.1)
    }
  }
}
