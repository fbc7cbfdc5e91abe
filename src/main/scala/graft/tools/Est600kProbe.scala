package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level cost decomposition of `dedup_minhash_est_600k` (the
  * heaviest frozen-scale entry at r12 close: 16.8 s first / 10.8 s rep).
  * The bench closure is: localCheckpoint the 600k synthetic corpus, then
  * the 1/4-sampled estimation audit to a noop write. This main times each
  * cumulative prefix so the dominant term is a measurement:
  *
  *   checkpoint — corpus generation + localCheckpoint (timed in the bench)
  *   sig        — native minhash signatures, count()
  *   cand       — banded self-join pair enumeration + distinct + sig joins
  *   audit      — + 1/4 sample + hashed exact verification, noop write
  *
  * Three laps each; lap 1 fresh-codegen, laps 2-3 the warm cost. */
object Est600kProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit =
      for (lap <- 1 to 3) {
        System.gc()
        val t0 = System.nanoTime()
        val n = f
        println(f"$label lap$lap: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      }

    time("checkpoint") {
      val c = graft.sources.Generators.syntheticCorpus(spark, 600000L)
        .localCheckpoint(true)
      val n = c.count()
      c.unpersist(); n
    }
    val corpus = graft.sources.Generators.syntheticCorpus(spark, 600000L)
      .localCheckpoint(true)
    time("sig") {
      graft.operators.Dedup.minhashSignatures(corpus, "doc_id", "text")
        .count()
    }
    time("cand") {
      graft.operators.Dedup.minhashCandidates(corpus, "doc_id", "text")
        .count()
    }
    time("audit_mod4_noop") {
      graft.operators.Dedup.minhashEstimationAudit(
          corpus, "doc_id", "text", samplePairsMod = 4)
        .write.format("noop").mode("overwrite").save()
      0L
    }
    spark.stop()
  }
}
