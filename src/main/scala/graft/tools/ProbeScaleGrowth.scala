package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose the 10x certification's super-linear entries
  * (BENCH_SCALE.json: dedup_minhash_600k 5.1x over mult, dedup_simhash
  * 4.4x, and the est-audit hash-relation OOM). For each corpus size:
  * LSH bucket-size distribution (sum m·(m-1)/2 = pre-distinct join rows —
  * the quadratic term if buckets grow), candidate-pair count (the join
  * output), and the simhash pigeonhole band twin. Cheap aggregations
  * except the one candidate count per size. */
object ProbeScaleGrowth {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (n <- Seq(600000L, 2000000L, 6000000L)) {
      val corpus = graft.sources.Generators.syntheticCorpus(spark, n)
      // minhash LSH bucket stats (numHashes=16, bands=4 — the
      // minhashCandidates defaults)
      val bk = graft.operators.Dedup.minhashBandKeys(
        corpus, "doc_id", "text", k = 5, numHashes = 16, bands = 4)
      val buckets = bk.groupBy("band", "bkey").agg(count(lit(1)).as("m"))
      val stats = buckets.agg(
        count(lit(1)).as("n_buckets"),
        sum(when(col("m") > 1, 1).otherwise(0)).as("multi_buckets"),
        max(col("m")).as("max_m"),
        sum((col("m") * (col("m") - 1) / 2).cast("long")).as("join_rows"))
        .head()
      println(s"minhash n=$n buckets=${stats.getLong(0)} " +
        s"multi=${stats.getLong(1)} max_m=${stats.getLong(2)} " +
        s"pre_distinct_pairs=${stats.getLong(3)}")
      val t0 = System.nanoTime()
      val cand = graft.operators.Dedup.minhashCandidates(
        corpus, "doc_id", "text").count()
      println(f"minhash n=$n candidates=$cand " +
        f"count_sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
