package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** Event-time windowed aggregation with watermarks — the Structured
  * Streaming capability the reference explicitly lacks (noWatermarks(),
  * SURVEY §2.2) and the rebuild adds: tumbling windows finalize in append
  * mode once the watermark passes their end; late data beyond the watermark
  * is dropped. */
class WindowedStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(hour: Int, minute: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

  test("tumbling hourly counts finalize as the watermark advances") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val agg = in.toDS().toDF("ts", "event_type")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(0, 5), "click"), (ts(0, 20), "click"), (ts(0, 40), "view"))
      q.processAllAvailable()
      // nothing finalized yet: watermark is still inside hour 0
      assert(spark.table("win_out").count() == 0)
      // jump event time to hour 2 → watermark passes hour 0's end
      in.addData((ts(2, 30), "click"))
      q.processAllAvailable()
      val rows = spark.table("win_out").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(rows == Set((ts(0), "click", 2L), (ts(0), "view", 1L)))
      // late arrival for hour 0 (behind the watermark) is dropped
      in.addData((ts(0, 50), "click"), (ts(4, 0), "click"))
      q.processAllAvailable()
      val after = spark.table("win_out").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      // hour-0 counts unchanged; hour-2 window finalized without the late row
      assert(after.contains((ts(2), "click", 1L)))
      assert(after.count(_._1 == ts(0)) == 2)
    } finally q.stop()
  }

  test("session windows close after the inactivity gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val agg = in.toDS().toDF("ts", "user_id")
      .withWatermark("ts", "5 minutes")
      .groupBy(session_window(col("ts"), "15 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"))
    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two bursts separated by > 15 min → two sessions of 2 and 1
      in.addData((ts(0, 0), 1L), (ts(0, 10), 1L), (ts(0, 40), 1L))
      q.processAllAvailable()
      in.addData((ts(3, 0), 2L))     // advance watermark; close user-1 sessions
      q.processAllAvailable()
      val rows = spark.table("sess_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((1L, 2L), (1L, 1L)))
    } finally q.stop()
  }
}
