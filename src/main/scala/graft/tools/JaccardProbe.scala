package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage split of the n-gram Jaccard kernel shared by dedup_ngram_jaccard,
  * dedup_jaccard_prefix (frozen set), dedup_clusters, dedup_keep_best,
  * split_leakage_safe, and pipeline_e2e's near-dup stage: shingle
  * explode+distinct vs the df cap vs the inverted-index self-join vs the
  * clustering rounds, on the real sf0.1 fixture. */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.sources.Fixtures.table(spark, dir, "documents")

    def time(label: String)(f: => Long): Unit =
      for (lap <- 1 to 3) {
        System.gc()
        val t0 = System.nanoTime()
        val n = f
        println(f"$label lap$lap: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      }

    time("distinct_shingles") {
      docs.where(col("text").isNotNull)
        .select(col("doc_id").as("id"),
          explode(graft.functions.charShingles(col("text"), 5)).as("shingle"))
        .distinct().count()
    }
    time("pairs_t035_cap100") {
      graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        k = 5, threshold = 0.35, maxDocFreq = 100).count()
    }
    time("clusters") {
      val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id",
          "text", k = 5, threshold = 0.35, maxDocFreq = 100)
        .select(col("id_a"), col("id_b"))
      graft.operators.Dedup.clusterNearDups(
        docs.select(col("doc_id").as("id")), pairs).count()
    }
    spark.stop()
  }
}
