package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** Fault-tolerance of the Bloom-screened TTL gate
  * ([[graft.operators.TextAnalysis.decontaminationGateBloomTtl]]): same
  * restart contract as the exact face — verdict dedup state survives a
  * checkpoint restart (a pre-stop verdict does not re-emit on re-arrival
  * inside the TTL), fresh contamination still flags, clean docs never
  * appear — PLUS the Bloom-specific hazard: the bit-position frame is
  * re-derived from the static side on every batch of every run, so a
  * restart must not change which shingles screen through (it cannot —
  * the positions are a pure function of the eval set — but a regression
  * that made them run-dependent would surface exactly here). The filter
  * is undersized (m = 256) so false positives flow through the confirm
  * join in BOTH runs. */
class BloomGateRecoverySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bloom gate verdict state survives restart; FPs still struck after") {
    val dataDir = Files.createTempDirectory("decob-data").toString
    val ckpt = Files.createTempDirectory("decob-ckpt").toString
    val outDir = Files.createTempDirectory("decob-out").toString
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
      graft.operators.TextAnalysis.decontaminationGateBloomTtl(
          src, "doc_id", "text", "ts", "10 minutes", benchShingles,
          k = 16, m = 256, kHashes = 3)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
    }

    // run 1: doc 0 contaminated, doc 1 clean (its shingles may pass the
    // tiny Bloom — the confirm join must strike them)
    Files.writeString(java.nio.file.Paths.get(dataDir, "b1.json"),
      jline(0, evalText, "2026-01-01 10:00:00") + "\n" +
        jline(1, cleanText, "2026-01-01 10:00:00") + "\n")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // run 2 (same checkpoint): doc 0 re-arrives inside the TTL, doc 2 is
    // fresh contamination, doc 3 fresh clean
    Files.writeString(java.nio.file.Paths.get(dataDir, "b2.json"),
      jline(0, evalText, "2026-01-01 10:01:00") + "\n" +
        jline(2, evalText, "2026-01-01 10:01:00") + "\n" +
        jline(3, cleanText, "2026-01-01 10:01:00") + "\n")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val ids = spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(ids.count(_ == 0L) == 1, s"verdicts: $ids")
    assert(ids.count(_ == 2L) == 1, s"verdicts: $ids")
    assert(!ids.contains(1L) && !ids.contains(3L),
      s"clean doc quarantined (Bloom FP not struck): $ids")
  }
}
