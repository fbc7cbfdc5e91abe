package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming floor experiment (judge r13 item 6): the 7-entry stream set
  * pays ~0.4-0.5 s/batch of trigger/offset-log mechanics — ~30% of the
  * per-batch total on the cheap decontamination faces. What is that floor
  * made of, and can either available lever cut it?
  *
  * Async progress tracking is NOT a lever here: Spark's
  * AsyncProgressTrackingMicroBatchExecution.checkNotStatefulStreamingQuery
  * rejects stateful queries, and all 7 entries are stateful
  * (transformWithState / dropDuplicates state). The levers that remain:
  *
  *  A. baseline — stream_dedup_600k's exact shape: 10 one-file
  *     micro-batches, checkpoint on /tmp (ext4 on this host), RocksDB +
  *     changelog checkpointing, 16 state stores. Decomposes each batch's
  *     durationMs (walCommit / commitOffsets / addBatch / getBatch /
  *     queryPlanning / triggerExecution) so the floor is measured, not
  *     inferred.
  *  B. checkpoint on tmpfs (/dev/shm) — isolates the offset/commit-log
  *     fsync share of the floor. Diagnostic only: a real cluster
  *     checkpoints to HDFS/S3, so this number is the floor's fsync share,
  *     not an adoptable config.
  *  C. maxFilesPerTrigger=2 (5 two-file micro-batches) — amortizes the
  *     per-trigger floor over 2x the rows. Semantics-safe for the
  *     unbounded dedup face (no event time); for the TTL faces it only
  *     coarsens the state-plateau granularity.
  *
  * Two laps per variant, fresh checkpoint per lap (a reused checkpoint
  * would replay nothing and measure an empty stream). */
object ProbeStreamFloor {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sdDir = java.nio.file.Files.createTempDirectory("floorfx").toString
    graft.sources.Generators.syntheticCorpus(spark, 600000L)
      .repartitionByRange(10, col("doc_id"))
      .write.mode("overwrite").parquet(sdDir)
    graft.Bench.restampPartsInNameOrder(sdDir)
    val sdSchema = spark.read.parquet(sdDir).schema

    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.rocksdb." +
      "changelogCheckpointing.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "16")

    val durKeys = Seq("triggerExecution", "walCommit", "commitOffsets",
      "latestOffset", "getBatch", "queryPlanning", "addBatch")

    def run(label: String, ckptBase: String, filesPerTrigger: Int): Unit = {
      for (lap <- 1 to 2) {
        val ckpt = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get(ckptBase), "floorck")
        val t0 = System.nanoTime()
        val src = spark.readStream.schema(sdSchema)
          .option("maxFilesPerTrigger", filesPerTrigger).parquet(sdDir)
          .repartition(32)
        val owners = graft.operators.Dedup.streamingMinhashOwners(
          graft.operators.Dedup.minhashBandKeys(src, "doc_id", "text",
            k = 5, numHashes = 8, bands = 4))
        val q = owners.writeStream.format("noop")
          .option("checkpointLocation", ckpt.toString)
          .outputMode("append").start()
        try {
          q.processAllAvailable()
          val wall = (System.nanoTime() - t0) / 1e9
          val progress = q.recentProgress.filter(_.numInputRows > 0)
          val n = progress.length
          val sums = durKeys.map { k =>
            k -> progress.map(p =>
              Option(p.durationMs.get(k)).map(_.toLong).getOrElse(0L))
              .sum / 1000.0
          }
          println(f"$label lap$lap: wall=$wall%.2f s, batches=$n, " +
            f"sec/batch=${wall / math.max(1, n)}%.2f")
          sums.foreach { case (k, s) =>
            println(f"  $k%-18s total=$s%6.2f s  per-batch=${
              s / math.max(1, n)}%5.3f s")
          }
        } finally {
          q.stop()
          graft.IoUtil.deleteRecursively(ckpt.toString)
        }
      }
    }

    run("A_baseline_ext4_mft1", "/tmp", 1)
    run("B_tmpfs_ckpt_mft1", "/dev/shm", 1)
    run("C_ext4_mft2", "/tmp", 2)

    graft.IoUtil.deleteRecursively(sdDir)
    spark.stop()
  }
}
