package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** The TTL-bounded decontamination gate (decontaminationGateTtl): within
  * the event-time TTL a contaminated id is quarantined ONCE, exactly like
  * the unbounded gate; past the TTL its state row is evicted and a
  * re-arrival is quarantined AGAIN — the documented safe-direction
  * degradation (a duplicate verdict, never a missed one). Eviction is
  * event-time driven (dropDuplicatesWithinWatermark: a key expires once
  * the watermark passes its event time + TTL), so the test is
  * deterministic. Null event times are dropped, not fatal. */
class DecontaminationTtlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val shingle = "0123456789abcdef" // the 16-char bench shingle
  private val dirty = s"prefix $shingle suffix"
  private val clean = "entirely unrelated text with no benchmark overlap at all"

  test("within-TTL dup suppressed; post-eviction dup re-quarantined; null ts dropped") {
    import spark.implicits._
    val dataDir = Files.createTempDirectory("decottl-data").toString
    val ckpt = Files.createTempDirectory("decottl-ckpt").toString
    val outDir = Files.createTempDirectory("decottl-out").toString
    val benchSh = Seq(shingle).toDF("shingle")

    def jline(id: Long, text: String, ts: String) =
      s"""{"doc_id": $id, "text": "$text", "ts": $ts}"""
    val src = spark.readStream.schema("doc_id LONG, text STRING, ts LONG")
      .option("maxFilesPerTrigger", 1).json(dataDir)
    // TTL = 10,000 s of event time; watermark = maxEventTime - TTL, and a
    // key's state expires once watermark >= its event time + TTL — i.e. a
    // key seen at t is evicted once max event time reaches t + 2*TTL
    val q = graft.operators.TextAnalysis.decontaminationGateTtl(
        src, "doc_id", "text", "ts", "10000 seconds", benchSh)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    def batch(name: String, lines: String*): Unit = {
      Files.writeString(java.nio.file.Paths.get(dataDir, name),
        lines.mkString("", "\n", "\n"))
      q.processAllAvailable()
    }
    try {
      // b1: doc 7 contaminated at ts 1000 → quarantined; doc 8 clean; a
      // null event time must be dropped by the gate, not NPE the stream
      batch("b1.json", jline(7, dirty, "1000"), jline(8, clean, "1000"),
        jline(99, dirty, "null"))
      // b2: doc 7 re-arrives at ts 2000 — within its TTL → suppressed;
      // filler advances max event time far past 1000 + 2*TTL
      batch("b2.json", jline(7, dirty, "2000"), jline(9, clean, "50000"))
      // b3: watermark is now 40,000 s > 1000 + 10,000 → doc 7's state row
      // is evicted during this batch
      batch("b3.json", jline(10, clean, "50001"))
      // b4: doc 7 re-arrives after eviction → quarantined AGAIN (the
      // documented duplicate-verdict degradation, never a miss)
      batch("b4.json", jline(7, dirty, "50002"))
      // the state story, read off the engine's own progress: the stateful
      // operator is the WATERMARK-BOUNDED dedup (not plain dropDuplicates),
      // and its row count EVICTS — [1, 1, 0, 1] across the four data
      // batches (doc 7 stored; dup suppressed without growth; evicted once
      // the watermark passed its lease; re-stored after re-arrival)
      val stateOps = q.recentProgress.filter(_.numInputRows > 0)
        .flatMap(_.stateOperators.headOption)
      assert(stateOps.nonEmpty &&
        stateOps.forall(_.operatorName.contains("dedupeWithinWatermark")),
        s"state operator: ${stateOps.map(_.operatorName).toSeq}")
      assert(stateOps.map(_.numRowsTotal).toSeq == Seq(1L, 1L, 0L, 1L),
        s"state rows per batch: ${stateOps.map(_.numRowsTotal).toSeq}")
    } finally q.stop()

    val out = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[java.sql.Timestamp]("_ts").getTime / 1000L))
    // only the contaminated doc is ever quarantined
    assert(out.map(_._1).toSet == Set(7L), s"verdicts: ${out.toSeq}")
    // exactly twice: once in b1 (ts 1000), once post-eviction (ts 50002);
    // the within-TTL b2 re-arrival (ts 2000) was suppressed
    assert(out.map(_._2).sorted.toSeq == Seq(1000L, 50002L),
      s"verdict times: ${out.toSeq}")
  }

  test("event-time gate drops a too-late contaminated row UNSCREENED (ADVICE r9)") {
    // The documented unsafe direction: the watermark that bounds state also
    // bounds lateness (tolerance == ttl), so a contaminated row arriving
    // more than ttl behind the max event time produces NO verdict. This
    // test pins the miss so the docstring's caveat stays true in code.
    val dataDir = Files.createTempDirectory("decolate-data").toString
    val ckpt = Files.createTempDirectory("decolate-ckpt").toString
    val outDir = Files.createTempDirectory("decolate-out").toString
    import spark.implicits._
    val benchSh = Seq(shingle).toDF("shingle")
    def jline(id: Long, text: String, ts: Long) =
      s"""{"doc_id": $id, "text": "$text", "ts": $ts}"""
    val src = spark.readStream.schema("doc_id LONG, text STRING, ts LONG")
      .option("maxFilesPerTrigger", 1).json(dataDir)
    val q = graft.operators.TextAnalysis.decontaminationGateTtl(
        src, "doc_id", "text", "ts", "100 seconds", benchSh)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    def batch(name: String, lines: String*): Unit = {
      Files.writeString(java.nio.file.Paths.get(dataDir, name),
        lines.mkString("", "\n", "\n"))
      q.processAllAvailable()
    }
    try {
      // b1: doc 1 contaminated at ts 100,000 → quarantined; watermark 99,900
      batch("b1.json", jline(1, dirty, 100000))
      // b2: doc 2 contaminated at ts 10 — 99,990 s late, way past the 100 s
      // tolerance → dropped before the gate, NO verdict (the miss)
      batch("b2.json", jline(2, dirty, 10))
    } finally q.stop()
    val ids = spark.read.parquet(outDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(ids == Set(1L), s"verdicts: $ids (doc 2's miss is the documented caveat)")
  }

  test("processing-time lease screens arbitrarily late rows and re-quarantines after expiry") {
    // decontaminationGateProcTtl: no watermark, so the same maximally-late
    // feed that the event-time gate misses is fully screened; state is
    // leased on wall-clock and a post-expiry re-arrival produces a
    // duplicate verdict (safe direction), never a miss.
    //
    // NO processAllAvailable anywhere: a ProcessingTimeTimeout
    // flatMapGroupsWithState stage tells the micro-batch engine "another
    // batch is always needed" (continuous timeout sweeps), so the
    // no-new-data latch never sets and processAllAvailable livelocks.
    // Every wait here polls an observable instead — the parquet sink for
    // verdicts, the progress metrics for state-row eviction — with a hard
    // deadline.
    val dataDir = Files.createTempDirectory("decoproc-data").toString
    val ckpt = Files.createTempDirectory("decoproc-ckpt").toString
    val outDir = Files.createTempDirectory("decoproc-out").toString
    import spark.implicits._
    val benchSh = Seq(shingle).toDF("shingle")
    def jline(id: Long, text: String) =
      s"""{"doc_id": $id, "text": "$text"}"""
    def verdicts(): Seq[Long] =
      try spark.read.schema("doc_id LONG").parquet(outDir).collect()
        .map(_.getAs[Long]("doc_id")).toSeq
      catch { case _: Exception => Nil } // sink not committed yet
    def pollUntil(what: String)(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 120000L * 1000000L
      while (!cond) {
        if (System.nanoTime() > deadline) fail(s"timed out waiting for $what")
        Thread.sleep(50)
      }
    }
    val src = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1).json(dataDir)
    val q = graft.operators.TextAnalysis.decontaminationGateProcTtl(
        src, "doc_id", "text", ttlMs = 1L, benchShingles = benchSh)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    try {
      // b1: doc 7 contaminated → quarantined; doc 8 clean; null text dropped
      Files.writeString(java.nio.file.Paths.get(dataDir, "b1.json"),
        Seq(jline(7, dirty), jline(8, clean),
          """{"doc_id": 99, "text": null}""").mkString("", "\n", "\n"))
      pollUntil("first verdict")(verdicts() == Seq(7L))
      // the 1 ms lease expires and the engine's continuous timeout sweeps
      // evict doc 7's state row — observable in the progress metrics. The
      // zero-rows progress must come from a batch LATER than the one that
      // admitted the state row (lastProgress can lag the sink commit).
      pollUntil("state admit visible")(q.recentProgress.exists(p =>
        p.stateOperators.nonEmpty && p.stateOperators.head.numRowsTotal > 0L))
      val admitBatch = q.recentProgress.filter(p =>
          p.stateOperators.nonEmpty && p.stateOperators.head.numRowsTotal > 0L)
        .map(_.batchId).max
      pollUntil("lease eviction")(q.recentProgress.exists(p =>
        p.batchId > admitBatch && p.stateOperators.nonEmpty &&
        p.stateOperators.head.numRowsTotal == 0L))
      // b2: doc 7 re-arrives post-expiry → quarantined AGAIN
      Files.writeString(java.nio.file.Paths.get(dataDir, "b2.json"),
        jline(7, dirty) + "\n")
      pollUntil("post-expiry duplicate verdict")(verdicts() == Seq(7L, 7L))
    } finally q.stop()
    assert(verdicts() == Seq(7L, 7L))
  }
}
