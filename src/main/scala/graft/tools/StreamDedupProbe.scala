package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-batch cost split of stream_dedup_600k: the same 10-micro-batch
  * file-source pipeline timed (a) without the stateful stage — scan +
  * repartition + signature + band-key derivation only, (b) full, with
  * the flatMapGroupsWithState owner stage on RocksDB. The difference is
  * the state exchange + store cost a key-format change could attack. */
object StreamDedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sdDir = java.nio.file.Files.createTempDirectory("sdprobe").toString
    graft.sources.Generators.syntheticCorpus(spark, 600000L)
      .repartitionByRange(10, col("doc_id"))
      .write.mode("overwrite").parquet(sdDir)
    val parts = new java.io.File(sdDir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    val base = System.currentTimeMillis()
    parts.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(base + i * 2000L) }
    val sdSchema = spark.read.parquet(sdDir).schema

    def run(label: String)(build: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Unit = {
      val ckpt = java.nio.file.Files.createTempDirectory("sdpck")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val src = spark.readStream.schema(sdSchema)
        .option("maxFilesPerTrigger", 1).parquet(sdDir).repartition(32)
      val out = build(src)
      val t0 = System.nanoTime()
      val q = out.writeStream.format("noop")
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val batches = q.recentProgress.filter(_.numInputRows > 0)
          .map(_.durationMs.get("triggerExecution").toDouble / 1000.0)
        println(f"$label total=${(System.nanoTime() - t0) / 1e9}%.2f s " +
          s"batches=${batches.map(b => f"$b%.2f").mkString(",")}")
      } finally {
        q.stop()
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(ckpt).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }

    run("scan_only") { src => src.select(col("doc_id")) }
    run("scan_repart") { src => src.select(col("doc_id"), col("text")) }
    run("bandkeys_only") { src =>
      graft.operators.Dedup.minhashBandKeys(src, "doc_id", "text",
        k = 5, numHashes = 8, bands = 4)
    }
    run("full_owners") { src =>
      graft.operators.Dedup.streamingMinhashOwners(
        graft.operators.Dedup.minhashBandKeys(src, "doc_id", "text",
          k = 5, numHashes = 8, bands = 4))
    }
    run("full_owners_rep") { src =>
      graft.operators.Dedup.streamingMinhashOwners(
        graft.operators.Dedup.minhashBandKeys(src, "doc_id", "text",
          k = 5, numHashes = 8, bands = 4))
    }
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(sdDir)).iterator()
      .asScala.toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    spark.stop()
  }
}
