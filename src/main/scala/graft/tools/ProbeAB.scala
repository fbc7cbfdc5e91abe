package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: the decontamination gates' probe joins 16-char shingle STRINGS
  * against a broadcast index; would hashing both sides to xxhash64 longs
  * (verdicts equal modulo a ~2^-64-per-pair collision — the trade
  * exactSubstr already makes) cut the probe cost enough to matter? Three
  * timed laps each on the 600k corpus batch gate. */
object ProbeAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.sources.Generators.syntheticCorpus(spark, 600000L)
      .localCheckpoint(true)
    val benchStr = d.where(col("doc_id") % 971 === 0)
      .select(explode(graft.functions.charShingles(col("text"), 16))
        .as("shingle")).distinct().localCheckpoint(true)
    val benchHash = benchStr.select(xxhash64(col("shingle")).as("h"))
      .distinct().localCheckpoint(true)
    def time(label: String)(f: => Long): Unit = {
      for (lap <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$label lap$lap: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      }
    }
    val cand = d.where(col("doc_id") % 971 =!= 0)
    time("string-probe") {
      cand.select(col("doc_id"),
          explode(graft.functions.charShingles(col("text"), 16)).as("shingle"))
        .join(broadcast(benchStr), Seq("shingle"), "left_semi")
        .select("doc_id").distinct().count()
    }
    time("hash-probe") {
      cand.select(col("doc_id"),
          explode(graft.functions.charShingles(col("text"), 16)).as("shingle"))
        .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
        .join(broadcast(benchHash), Seq("h"), "left_semi")
        .select("doc_id").distinct().count()
    }
    spark.stop()
  }
}
