package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Contract of the dedup scale-stress corpus ([[Generators.syntheticCorpus]]):
  * the planted 2% near-duplicates must be RECOVERED by the banded MinHash
  * path, and the non-planted bulk must not explode the candidate set — the
  * two properties that make dedup_minhash_600k a meaningful scale bench
  * (linear bucket fan-out, candidate work proportional to true duplicates).
  */
class SyntheticCorpusSpec extends AnyFunSuite {
  lazy val spark = graft.operators.SparkTestSession.spark

  test("planted near-duplicates dominate the banded candidate pairs") {
    val n = 5000L
    val docs = Generators.syntheticCorpus(spark, n)
    assert(docs.count() == n)
    val planted = (1L until n by 50L).map(i => (i - 1, i)).toSet
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .select(col("id_a"), col("id_b"), col("est_jaccard")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val found = pairs.map(_._1).toSet
    // banding (16 hashes / 4 bands) on 39-of-40-word overlap recovers the
    // overwhelming majority of planted pairs; random 40-word docs from a
    // 1000-word vocabulary almost never share a full band
    val recovered = planted.intersect(found)
    assert(recovered.size >= (planted.size * 9) / 10,
      s"recovered ${recovered.size}/${planted.size} planted pairs")
    // LSH admits some random band collisions (the 5-char shingles of a
    // compact "wNNN" vocabulary overlap more than natural text); the scale
    // property is that they stay the same order of magnitude as the true
    // pairs, not quadratic in the corpus
    val falseCand = found.diff(planted)
    assert(falseCand.size <= planted.size * 2,
      s"${falseCand.size} non-planted candidates vs ${planted.size} planted")
    // and the estimator SEPARATES them: planted pairs (39/40 words shared)
    // average far above the random collisions that slipped through a band
    val simOf = pairs.toMap
    val plantedSims = recovered.toSeq.map(simOf)
    val falseSims = falseCand.toSeq.map(simOf)
    val plantedAvg = plantedSims.sum / plantedSims.size
    assert(plantedAvg > 0.6, s"planted avg est_jaccard $plantedAvg")
    if (falseSims.nonEmpty)
      assert(plantedAvg > falseSims.sum / falseSims.size + 0.2)
  }

  test("corpus generation is deterministic across invocations") {
    val a = Generators.syntheticCorpus(spark, 200L).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val b = Generators.syntheticCorpus(spark, 200L)
      .repartition(7).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.sameElements(b))
    // planted rows share all but the trailing word with their source row
    val byId = a.toMap
    (1L until 200L by 50L).foreach { i =>
      val (dup, src) = (byId(i).split(" "), byId(i - 1).split(" "))
      assert(dup.init.sameElements(src.init) && dup.last != src.last)
    }
  }
}
