package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the struct-bucket-key candidates rewrite to the r11 string-key
  * formulation: for seeded random small-alphabet corpora (high shingle
  * collision density — the adversarial case for banding), the
  * (id_a, id_b, est_jaccard) set from [[Dedup.minhashCandidates]] must
  * equal a reference derivation that bands the SAME signatures with the
  * oracle's "_"-joined string keys and recovers the agreement count by
  * re-joining the signature frame — the shape the operator replaced. */
class MinhashCandidatesProps extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def referencePairs(sig: org.apache.spark.sql.DataFrame,
      numHashes: Int, bands: Int): Set[(Long, Long, Double)] = {
    val rows = sig.collect().map { r =>
      r.getLong(0) -> (0 until numHashes).map(i => r.getLong(i + 1))
    }
    val rowsPerBand = numHashes / bands
    val buckets = scala.collection.mutable.Map
      .empty[(Int, String), List[Long]]
    rows.foreach { case (id, hs) =>
      (0 until bands).foreach { b =>
        val key = (b, (0 until rowsPerBand)
          .map(r => hs(b * rowsPerBand + r)).mkString("_"))
        buckets(key) = id :: buckets.getOrElse(key, Nil)
      }
    }
    val sigMap = rows.toMap
    buckets.values.flatMap { ids =>
      val sorted = ids.distinct.sorted
      for (i <- sorted.indices; j <- (i + 1) until sorted.size)
        yield (sorted(i), sorted(j))
    }.toSet.map { p: (Long, Long) =>
      val (a, b) = p
      val agree = (0 until numHashes)
        .count(i => sigMap(a)(i) == sigMap(b)(i))
      (a, b, agree.toDouble / numHashes)
    }
  }

  test("struct-keyed candidates == string-keyed reference on hostile corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 4) {
      // 2-letter alphabet, short docs: near-maximal shingle and band-key
      // collision rates, plus null/empty rows
      val docs = (0L until 60L).map { id =>
        val len = 5 + rnd.nextInt(12)
        val txt =
          if (id % 17 == 16) null
          else (0 until len).map(_ => if (rnd.nextBoolean()) 'a' else 'b')
            .mkString
        (id, txt)
      }.toDF("doc_id", "text")
      for ((numHashes, bands) <- Seq((8, 4), (16, 4), (6, 3))) {
        val got = Dedup.minhashCandidates(docs, "doc_id", "text",
            k = 3, numHashes = numHashes, bands = bands)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val want = referencePairs(
          Dedup.minhashSignatures(docs, "doc_id", "text",
            k = 3, numHashes = numHashes), numHashes, bands)
        assert(got == want,
          s"trial $trial numHashes=$numHashes bands=$bands: " +
            s"extra=${got -- want} missing=${want -- got}")
      }
    }
  }
}
