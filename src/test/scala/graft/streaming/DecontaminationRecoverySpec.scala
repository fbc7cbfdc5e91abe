package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** Fault-tolerance of the TTL-bounded decontamination gate: the
  * `dropDuplicatesWithinWatermark` verdict state must survive a query
  * restart from the checkpoint. A contaminated id quarantined BEFORE the
  * stop and re-arriving AFTER the restart (inside the TTL window) must
  * NOT produce a second verdict row — if the state were lost, the restart
  * would re-emit every recent verdict on re-arrival, breaking the
  * exactly-once shape consumers see inside the window. A fresh
  * contaminated id after the restart must still flag, and clean docs
  * never appear. */
class DecontaminationRecoverySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("verdict dedup state survives restart; fresh contamination still flags") {
    val dataDir = Files.createTempDirectory("deco-data").toString
    val ckpt = Files.createTempDirectory("deco-ckpt").toString
    val outDir = Files.createTempDirectory("deco-out").toString
    // >= 16 chars shared verbatim with the eval text → contaminated
    val evalText = "the forbidden benchmark answer string lives here"
    val cleanText = "ordinary crawl prose with no overlap at all today"

    import spark.implicits._
    val benchShingles = Seq(evalText).toDF("text")
      .select(explode(graft.functions.charShingles(col("text"), 16))
        .as("shingle")).distinct()

    def jline(id: Long, text: String, ts: String) =
      s"""{"doc_id": $id, "text": "$text", "ts": "$ts"}"""
    def startQuery() = {
      val src = spark.readStream
        .schema("doc_id LONG, text STRING, ts TIMESTAMP").json(dataDir)
      graft.operators.TextAnalysis.decontaminationGateTtl(
          src, "doc_id", "text", "ts", "10 minutes", benchShingles)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
    }

    // run 1: doc 0 contaminated, doc 1 clean
    Files.writeString(java.nio.file.Paths.get(dataDir, "b1.json"),
      jline(0, evalText, "2026-01-01 10:00:00") + "\n" +
        jline(1, cleanText, "2026-01-01 10:00:00") + "\n")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // run 2 (fresh query, same checkpoint): doc 0 RE-ARRIVES one minute
    // later — well inside the 10-minute TTL — and doc 2 is fresh
    // contamination
    Files.writeString(java.nio.file.Paths.get(dataDir, "b2.json"),
      jline(0, evalText, "2026-01-01 10:01:00") + "\n" +
        jline(2, evalText, "2026-01-01 10:01:00") + "\n")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val ids = spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    // exactly one verdict for doc 0 across BOTH runs: the second would
    // only appear if the restart lost the dedup state
    assert(ids.count(_ == 0L) == 1, s"verdicts: $ids")
    assert(ids.count(_ == 2L) == 1, s"verdicts: $ids")
    assert(!ids.contains(1L), s"clean doc quarantined: $ids")
  }
}
