package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.SkylineOps

/** Continuous deployment mode — the reference's `FlinkSkyline.main`
  * (`java/org.main/FlinkSkyline.java:61-186`) as a Structured Streaming app.
  *
  * Usage:
  *   runMain graft.streaming.StreamMain \
  *     --mode file --data-dir /tmp/in --trigger-dir /tmp/q [--out /tmp/out]
  *   runMain graft.streaming.StreamMain \
  *     --mode kafka --bootstrap host:9092 \
  *     [--input-topic input-tuples --query-topic queries --output-topic output-skyline]
  *   common: --algo mr-dim|mr-grid|mr-angle (default mr-angle)
  *           --parallelism 4 (numPartitions = 2x, reference default)
  *           --domain 1000.0 --checkpoint /tmp/ckpt
  *
  * Kafka mode needs the spark-sql-kafka connector on the classpath (not
  * bundled here); file mode runs standalone.
  */
object StreamMain {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val algo = opts.getOrElse("algo", "mr-angle")
    val parallelism = opts.getOrElse("parallelism", "4").toInt
    val numPartitions = 2 * parallelism            // FlinkSkyline.java:76
    val domain = opts.getOrElse("domain", "1000.0").toDouble
    val checkpoint = opts.getOrElse("checkpoint",
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)

    val spark = SparkSession.builder()
      .appName("graft-skyline-stream")
      .master(opts.getOrElse("master", s"local[$parallelism]"))
      .config("spark.sql.shuffle.partitions", numPartitions.toString)
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val (dataLines, triggerLines) = opts.getOrElse("mode", "file") match {
      case "kafka" =>
        val bs = opts("bootstrap")
        (Sources.kafkaData(spark, bs, opts.getOrElse("input-topic", "input-tuples")),
          Sources.kafkaTriggers(spark, bs, opts.getOrElse("query-topic", "queries")))
      case _ =>
        (Sources.fileLines(spark, opts("data-dir")),
          Sources.fileLines(spark, opts("trigger-dir")))
    }

    val pidOf = SkylineOps.pidFunction(algo, domain, numPartitions)
    val env = dataLines.flatMap(l => SkylineStream.parseData(l, pidOf))
      .unionAll(triggerLines.flatMap(p => SkylineStream.broadcastTrigger(
        p, numPartitions, System.currentTimeMillis())))
    val local = SkylineStream.localPhase(env)

    // global phase: the reference's single keyed aggregator instance,
    // accumulating across micro-batches on the driver via foreachBatch
    val agg = new SkylineStream.GlobalAggregator(numPartitions)
    var emitted = 0
    val q = local.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("2 seconds"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[SkylineStream.LocalResult], _: Long) =>
        batch.collect().foreach(agg.offer)
        val results = agg.results
        results.drop(emitted).foreach { r =>
          val json = r.toJson
          opts.get("out") match {
            case Some(dir) =>
              val f = java.nio.file.Paths.get(dir, s"query_${r.queryId}.json")
              java.nio.file.Files.createDirectories(f.getParent)
              java.nio.file.Files.writeString(f, json + "\n")
            case None => println(json)
          }
        }
        emitted = results.size
      }
      .start()
    q.awaitTermination()
  }
}
