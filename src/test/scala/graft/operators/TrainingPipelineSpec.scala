package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The composed training-data chain over the documents fixture: stage
  * counts are monotone non-increasing, dedup keeps canonical members only,
  * the export round-trips, and the whole run is deterministic. */
class TrainingPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("prepare() chains quality, language, dedup, sample, export") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("pipe").toString
    val (result, c) = TrainingPipeline.prepare(docs, "doc_id", "text", "lang",
      keepLangs = Set("en", "de"), jaccardThreshold = 0.35,
      sampleMod = 2, outDir = out, nShards = 2)

    assert(c.raw == docs.count())
    assert(c.quality <= c.raw && c.repetition <= c.quality)
    assert(c.language <= c.repetition)
    assert(c.exactDedup <= c.language && c.nearDedup <= c.exactDedup)
    assert(c.sampled <= c.nearDedup && c.sampled > 0)
    assert(result.count() == c.sampled)

    // only allowed languages survive
    import spark.implicits._
    val langs = result.select("lang").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "de")))

    // export round-trips the surviving rows
    val back = spark.read.parquet(out)
    assert(back.count() == c.sampled)

    // deterministic: same inputs → same counts
    val (_, c2) = TrainingPipeline.prepare(docs, "doc_id", "text", "lang",
      keepLangs = Set("en", "de"), jaccardThreshold = 0.35, sampleMod = 2)
    assert(c == c2)
  }
}
