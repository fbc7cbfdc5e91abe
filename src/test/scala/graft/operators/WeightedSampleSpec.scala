package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** sample_weighted = sequential Poisson (priority) sampling with integer
  * priorities. The exact-value gate is the DuckDB oracle; these specs pin
  * the sampling laws: the result equals a local brute-force recompute, is
  * deterministic, and inclusion probability scales with the weight.
  */
class WeightedSampleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run() = graft.SparkEntry.queries("sample_weighted")(spark, dir)

  test("matches the brute-force local recompute at sf0.001") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(_._2 > 0)
    def hash60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val pri = docs.map { case (id, w) =>
      (hash60(s"wsmp#$id") / w, id, w)
    }.sortBy(t => (t._1, t._2)).take(60)
    val expect = pri.zipWithIndex
      .map { case ((p, id, w), i) => (i + 1L, id, w, p) }.toSeq
    val got = run().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expect)
  }

  test("deterministic across runs") {
    assert(run().collect().toSeq == run().collect().toSeq)
  }

  test("inclusion is weight-biased: sampled docs are longer on average") {
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .agg(avg("n_chars")).head().getDouble(0)
    val sampled = run().agg(avg("n_chars")).head().getDouble(0)
    // priority = h/w with h uniform: P(drawn) ∝ w, so the length-weighted
    // sample mean must exceed the corpus mean by a clear margin
    assert(sampled > all)
  }
}
