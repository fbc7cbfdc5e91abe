package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming addBatch interior A/B (judge r14 item 2): the two heaviest
  * stream faces hold 0.7-0.9 s/batch of RocksDB state-store load/commit
  * after the measured ~0.16 s/batch offset-log mechanics floor. Levers
  * probed, per face, two laps each (interleaved variants so a steal wave
  * cannot swallow one whole side):
  *
  *  - state-store instance count (spark.sql.shuffle.partitions at first
  *    start): 16 (current) vs 8 vs 32 for the 2.4M-row dedup owner state;
  *    16 vs 8 for the bloom gate's small verdict state
  *  - RocksDB write path: trackTotalNumberOfRows=false (skips the
  *    read-before-write that maintains numRowsTotal), writeBufferSizeMB,
  *    blockCacheSizeMB
  *  - noDataMicroBatches.enabled=false: processAllAvailable runs an extra
  *    no-data batch after data batches to advance the watermark — each
  *    pays a full store load/commit across every instance; eviction then
  *    happens lazily in the next data batch with IDENTICAL emitted rows
  *    (the watermark value per data batch is unchanged)
  *
  * Diagnostic only — adopted winners land in Bench entry bodies with the
  * measured numbers recorded in PLANS.md/OPTIMIZATION_r15.md. */
object ProbeStateTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def stealTicks(): Long =
      try {
        val src = scala.io.Source.fromFile("/proc/stat")
        val line = try src.getLines().next() finally src.close()
        line.trim.split("\\s+").drop(1).lift(7).map(_.toLong).getOrElse(0L)
      } catch { case _: Throwable => 0L }

    val RocksPrefix = "spark.sql.streaming.stateStore.rocksdb."
    val NoData = "spark.sql.streaming.noDataMicroBatches.enabled"

    // ---- fixtures (setup, untimed) ----
    val dedupDir = java.nio.file.Files.createTempDirectory("tunesd").toString
    graft.sources.Generators.syntheticCorpus(spark, 600000L)
      .withColumn("ts", col("doc_id"))
      .repartitionByRange(20, col("doc_id"))
      .write.mode("overwrite").parquet(dedupDir)
    graft.Bench.restampPartsInNameOrder(dedupDir)
    val dedupSchema = spark.read.parquet(dedupDir).schema

    val bloomDir = java.nio.file.Files.createTempDirectory("tunebl").toString
    graft.sources.Generators.syntheticCorpus(spark, 600000L)
      .withColumn("ts", col("doc_id"))
      .repartitionByRange(20, col("doc_id"))
      .write.mode("overwrite").parquet(bloomDir)
    graft.Bench.restampPartsInNameOrder(bloomDir)
    val benchSh = spark.read.parquet(bloomDir)
      .where(expr("doc_id % 971 = 0"))
      .select(explode(graft.functions.charShingles(col("text"), 16))
        .as("shingle"))
      .distinct().persist()
    benchSh.count()
    val bloomSchema = spark.read.parquet(bloomDir).schema

    val durKeys = Seq("triggerExecution", "addBatch", "walCommit",
      "commitOffsets", "latestOffset", "getBatch", "queryPlanning")

    def runOne(face: String, variant: String, stores: Int,
               extra: Map[String, String]): Unit = {
      val ckpt = java.nio.file.Files.createTempDirectory("tuneck")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      spark.conf.set(RocksPrefix + "changelogCheckpointing.enabled", "true")
      spark.conf.set("spark.sql.shuffle.partitions", stores.toString)
      extra.foreach { case (k, v) => spark.conf.set(k, v) }
      val s0 = stealTicks()
      val t0 = System.nanoTime()
      try {
        val verdicts = face match {
          case "dedup_unbounded" =>
            // the 10-batch unbounded owner face (frozenScale member):
            // 2.4M state rows — the one face whose per-store state is big
            // enough that fewer stores could plausibly LOSE
            val src = spark.readStream.schema(dedupSchema)
              .option("maxFilesPerTrigger", 2).parquet(dedupDir)
              .repartition(32)
            graft.operators.Dedup.streamingMinhashOwners(
              graft.operators.Dedup.minhashBandKeys(src, "doc_id", "text",
                k = 5, numHashes = 8, bands = 4))
          case "dedup_ttl" =>
            val src = spark.readStream.schema(dedupSchema)
              .option("maxFilesPerTrigger", 1).parquet(dedupDir)
              .repartition(32)
            graft.operators.Dedup.streamingMinhashOwnersTtl(
              src, "doc_id", "text", "ts", ttlMs = 60000L * 1000L,
              k = 5, numHashes = 8, bands = 4)
          case "bloom_ttl" =>
            val src = spark.readStream.schema(bloomSchema)
              .option("maxFilesPerTrigger", 1).parquet(bloomDir)
              .repartition(8)
            graft.operators.TextAnalysis.decontaminationGateBloomTtl(
              src, "doc_id", "text", "ts", "60000 seconds", benchSh,
              k = 16, m = 1 << 22, kHashes = 3)
        }
        val q = verdicts.writeStream.format("noop")
          .option("checkpointLocation", ckpt.toString)
          .outputMode("append").start()
        try {
          q.processAllAvailable()
          val wall = (System.nanoTime() - t0) / 1e9
          val steal = (stealTicks() - s0) / 100.0
          val all = q.recentProgress
          val data = all.filter(_.numInputRows > 0)
          val n = data.length
          val phases = durKeys.map { k =>
            k -> data.map(p =>
              Option(p.durationMs.get(k)).map(_.toLong).getOrElse(0L))
              .sum / 1000.0 / math.max(1, n)
          }
          val lastRows = data.lastOption
            .flatMap(_.stateOperators.headOption.map(_.numRowsTotal))
            .getOrElse(-1L)
          println(f"RESULT $face $variant: wall=$wall%.2f s steal=$steal%.1f" +
            f" dataBatches=$n allBatches=${all.length}" +
            f" secPerBatch=${wall / math.max(1, n)}%.3f lastStateRows=$lastRows")
          println("  " + phases.map { case (k, v) =>
            f"$k=$v%.3f" }.mkString(" "))
        } finally q.stop()
      } finally {
        extra.keys.foreach(spark.conf.unset)
        spark.conf.unset(RocksPrefix + "changelogCheckpointing.enabled")
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        Thread.sleep(300)
        try graft.IoUtil.deleteRecursively(ckpt.toString)
        catch { case _: Throwable => () }
      }
    }

    val dedupVariants: Seq[(String, Int, Map[String, String])] = Seq(
      ("base16", 16, Map.empty),
      ("s8", 8, Map.empty),
      ("s32", 32, Map.empty),
      ("ntrack", 16, Map(RocksPrefix + "trackTotalNumberOfRows" -> "false")),
      ("wbuf64", 16, Map(RocksPrefix + "writeBufferSizeMB" -> "64")),
      ("bcache64", 16, Map(RocksPrefix + "blockCacheSizeMB" -> "64")),
      ("nodata", 16, Map(NoData -> "false")))
    val bloomVariants: Seq[(String, Int, Map[String, String])] = Seq(
      ("base16", 16, Map.empty),
      ("s8", 8, Map.empty),
      ("ntrack", 16, Map(RocksPrefix + "trackTotalNumberOfRows" -> "false")),
      ("nodata", 16, Map(NoData -> "false")))

    val unboundedVariants: Seq[(String, Int, Map[String, String])] = Seq(
      ("base16", 16, Map.empty),
      ("s8", 8, Map.empty))
    val laps = args.headOption.map(_.toInt).getOrElse(2)
    val faces: Set[String] =
      if (args.length > 1) args.drop(1).toSet
      else Set("dedup_ttl", "bloom_ttl")
    for (lap <- 1 to laps) {
      println(s"===== lap $lap =====")
      if (faces("dedup_ttl")) dedupVariants
        .foreach { case (name, st, ex) => runOne("dedup_ttl", name, st, ex) }
      if (faces("bloom_ttl")) bloomVariants
        .foreach { case (name, st, ex) => runOne("bloom_ttl", name, st, ex) }
      if (faces("dedup_unbounded")) unboundedVariants
        .foreach { case (name, st, ex) =>
          runOne("dedup_unbounded", name, st, ex) }
    }

    benchSh.unpersist()
    graft.IoUtil.deleteRecursively(dedupDir)
    graft.IoUtil.deleteRecursively(bloomDir)
    spark.stop()
  }
}
