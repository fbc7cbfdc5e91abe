package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink plumbing for the streaming topology (reference S1/S2/S3,
  * `java/org.main/FlinkSkyline.java:84-97,177-183`).
  *
  * Kafka wrappers mirror the reference's topics and options; they compile
  * against stock Spark and require the spark-sql-kafka connector on the
  * cluster classpath at run time (not bundled in this build, so tests use
  * MemoryStream / file sources instead — same downstream code path).
  */
object Sources {

  /** S1: data topic, earliest offsets (reference reads the full history so the
    * record-id barrier is meaningful). */
  def kafkaData(spark: SparkSession, bootstrap: String,
                topic: String = "input-tuples"): Dataset[String] = {
    import spark.implicits._
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .selectExpr("CAST(value AS STRING)").as[String]
  }

  /** S2: query/control topic, latest offsets (only new triggers matter). */
  def kafkaTriggers(spark: SparkSession, bootstrap: String,
                    topic: String = "queries"): Dataset[String] = {
    import spark.implicits._
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "latest")
      .load()
      .selectExpr("CAST(value AS STRING)").as[String]
  }

  /** S3: result sink with the reference's 10 MB max request size
    * (`FlinkSkyline.java:179`). Returns the writer; caller starts it. */
  def kafkaSink(results: Dataset[String], bootstrap: String,
                topic: String = "output-skyline", checkpoint: String) =
    results.toDF("value")
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("kafka.max.request.size", "10485760")
      .option("checkpointLocation", checkpoint)

  /** File-based data source: CSV lines from a directory (streaming). */
  def fileLines(spark: SparkSession, dir: String): Dataset[String] = {
    import spark.implicits._
    spark.readStream.format("text").load(dir).select(col("value")).as[String]
  }
}
