package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Structural laws of the Sampling operators (the value gate is the DuckDB
  * oracle; these pin the sampling-theory properties that must hold for ANY
  * data): bottom-k samples are prefix-nested in k, the weighted sample
  * excludes nonpositive weights, and the rate sample is a subset whose
  * membership does not depend on partitioning.
  */
class SamplingLawsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("bottom-k is prefix-nested: the k-sample is the first k of the 2k-sample") {
    val k = Sampling.bottomK(docs, "lang", "doc_id", 10)
      .orderBy("lang", "rk").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val k2 = Sampling.bottomK(docs, "lang", "doc_id", 20)
      .where(col("rk") <= 10)
      .orderBy("lang", "rk").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(k.toSeq == k2.toSeq)
  }

  test("weighted sample is prefix-nested and never admits nonpositive weights") {
    val w = docs.withColumn("w",
      when(col("doc_id") % 17 === 0, lit(0L)).otherwise(col("n_chars")))
    val k = Sampling.weightedBottomK(w, "doc_id", "w", 15)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val k2 = Sampling.weightedBottomK(w, "doc_id", "w", 30)
      .where(col("rk") <= 15)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(k.toSeq == k2.toSeq)
    val zeroIds = w.where(col("w") <= 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(k.map(_._2).forall(id => !zeroIds.contains(id)))
  }

  test("rate sample membership is partitioning-invariant") {
    val a = Sampling.rateSample(docs, "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.rateSample(docs.repartition(13), "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }
}
