package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level cost decomposition of the `dedup_minhash_est` catalog
  * entry (the r11 weak-mark family; 15.4 s min-of-pair at sf0.1 — the
  * single most expensive non-streaming catalog entry). The audit is four
  * chained phases; this main times each cumulative prefix on the REAL
  * fixture so the dominant term is a measurement, not a guess:
  *
  *   sig      — minhash signatures (native expr, projection only)
  *   cand     — banded self-join pair enumeration + distinct
  *   est      — signature re-join (agreement count) + localCheckpoint
  *   audit    — + 1/4 pair sample + exact shingle verification joins
  *
  * Three laps each; lap 1 is fresh-codegen, laps 2-3 are the warm cost
  * a sweep rep lap should approach. */
object EstProbe {
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

    time("sig") {
      graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text",
        k = 5, numHashes = 8).count()
    }
    time("cand") {
      graft.operators.Dedup.minhashCandidates(docs, "doc_id", "text",
        k = 5, numHashes = 8, bands = 4).count()
    }
    time("audit_mod4") {
      graft.operators.Dedup.minhashEstimationAudit(docs, "doc_id", "text",
        k = 5, numHashes = 8, bands = 4, samplePairsMod = 4).count()
    }
    // the CATALOG shape: count() above lets Catalyst prune the exact
    // intersection columns; the noop write evaluates every output column,
    // which is what the bench times
    time("audit_noop_write") {
      graft.operators.Dedup.minhashEstimationAudit(docs, "doc_id", "text",
          k = 5, numHashes = 8, bands = 4, samplePairsMod = 4)
        .orderBy("id_a", "id_b")
        .write.format("noop").mode("overwrite").save()
      0L
    }
    // LEGACY r11 verification (string arrays + array_intersect per pair) —
    // kept inline as the A-side of the record: the shipped operator now
    // uses sorted-distinct hash arrays + a merge-count (measured here:
    // legacy 7.4-8.7 s, hashed 2.8-3.6 s on the sf0.1 catalog entry)
    time("audit_legacy_strings") {
      val cand = graft.operators.Dedup.minhashCandidates(docs, "doc_id",
          "text", k = 5, numHashes = 8, bands = 4)
        .select(col("id_a"), col("id_b"),
          (col("est_jaccard") * 8).cast("long").as("agree_n"))
        .localCheckpoint(true)
        .where(pmod(graft.functions.hash60(
          concat(lit("estsamp#"), col("id_a").cast("string"), lit("_"),
            col("id_b").cast("string"))), lit(4L)) === 0)
      val docArr = docs.where(col("text").isNotNull)
        .select(col("doc_id").as("_did"),
          array_distinct(graft.functions.charShingles(col("text"), 5))
            .as("_shs"))
      cand
        .join(docArr.select(col("_did").as("id_a"), col("_shs").as("_sa")),
          Seq("id_a"))
        .join(docArr.select(col("_did").as("id_b"), col("_shs").as("_sb")),
          Seq("id_b"))
        .select(col("id_a"), col("id_b"), col("agree_n"),
          size(array_intersect(col("_sa"), col("_sb"))).cast("long")
            .as("common"),
          (size(col("_sa")) + size(col("_sb"))).cast("long").as("_szsum"))
        .select(col("id_a"), col("id_b"), col("agree_n"), col("common"),
          (col("_szsum") - col("common")).as("union_sz"))
        .orderBy("id_a", "id_b")
        .write.format("noop").mode("overwrite").save()
      0L
    }
    spark.stop()
  }
}
