package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** The TTL-bounded streaming dedup state (streamingMinhashOwnersTtl):
  * within the event-time TTL the verdict must be bit-identical to the
  * unbounded operator; PAST the TTL the bucket is evicted and a late
  * duplicate owns itself — the documented recall-for-state degradation,
  * proven here as exactly that (not an accidental wrong answer). Eviction
  * is event-time driven, so the test is deterministic: the same batch
  * timestamps always evict the same keys. */
class MinhashOwnerTtlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // TTL = 10,000 s of EVENT time (ts values are epoch seconds cast inside
  // the operator)
  private val TtlMs = 10000L * 1000L

  test("within-TTL dup is flagged; post-eviction dup owns itself") {
    val dataDir = Files.createTempDirectory("mhttl-data").toString
    val ckpt = Files.createTempDirectory("mhttl-ckpt").toString
    val outDir = Files.createTempDirectory("mhttl-out").toString
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "completely different prose describing spark streaming stores"
    val textC = "a third unrelated document mentioning parquet and checkpoints"
    val textD = "yet another filler document to advance the watermark forward"

    def jline(id: Long, text: String, ts: Long) =
      s"""{"doc_id": $id, "text": "$text", "ts": $ts}"""
    val src = spark.readStream.schema("doc_id LONG, text STRING, ts LONG")
      .option("maxFilesPerTrigger", 1).json(dataDir)
    val q = graft.operators.Dedup.streamingMinhashOwnersTtl(
        src, "doc_id", "text", "ts", TtlMs, k = 5, numHashes = 8, bands = 4)
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
      // b1: docs 0 and 1 own their buckets; watermark → 1,000 s.
      // doc 99 arrives with a NULL event time (hostile crawl row) — it must
      // be dropped by the post-cast isNotNull filter, not NPE the query
      batch("b1.json", jline(0, textA, 1000), jline(1, textB, 1000),
        s"""{"doc_id": 99, "text": "$textD", "ts": null}""")
      // b2: event time leaps past 0/1's leases (timeout 11,000 s);
      // watermark only ADVANCES here (eviction needs the NEXT batch)
      batch("b2.json", jline(10, textC, 100000))
      // b3: watermark (100,000 s) > 11,000 s → buckets of docs 0/1 evicted
      // during this batch; doc 10's lease (110,000 s) survives
      batch("b3.json", jline(11, textD, 100001))
      // b4: doc 5 re-sends doc 0's exact text AFTER eviction — owns itself
      // (the documented miss); doc 6 duplicates doc 10 WITHIN its TTL —
      // still flagged with owner 10, bit-identical to the unbounded op
      batch("b4.json", jline(5, textA, 100002), jline(6, textC, 100002))
    } finally q.stop()

    val out = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band"),
        r.getAs[Long]("owner")))
    // one row per (doc, band), exactly once
    assert(out.groupBy(r => (r._1, r._2)).forall(_._2.length == 1))
    assert(out.count(_._1 == 5L) == 4 && out.count(_._1 == 6L) == 4)
    // the documented degradation: post-eviction duplicate owns itself
    assert(out.filter(_._1 == 5L).forall(_._3 == 5L),
      s"doc 5 owners: ${out.filter(_._1 == 5L).toSeq}")
    // within-TTL duplicate still flagged against the original owner
    assert(out.filter(_._1 == 6L).forall(_._3 == 10L),
      s"doc 6 owners: ${out.filter(_._1 == 6L).toSeq}")
    // originals own themselves everywhere
    for (id <- Seq(0L, 1L, 10L, 11L))
      assert(out.filter(_._1 == id).forall(_._3 == id),
        s"doc $id owners: ${out.filter(_._1 == id).toSeq}")
    // the null-event-time row was dropped, not processed and not fatal
    assert(!out.exists(_._1 == 99L))
  }

  test("within one TTL window the verdict matches the unbounded operator") {
    val dataDir = Files.createTempDirectory("mhttl2-data").toString
    val ckpt = Files.createTempDirectory("mhttl2-ckpt").toString
    val outDir = Files.createTempDirectory("mhttl2-out").toString
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "completely different prose describing spark streaming stores"
    // two batches, all activity inside one TTL window: dup flagged with
    // first-seen owner exactly like streamingMinhashOwners
    Files.writeString(java.nio.file.Paths.get(dataDir, "b1.json"),
      s"""{"doc_id": 0, "text": "$textA", "ts": 1000}""" + "\n" +
        s"""{"doc_id": 1, "text": "$textB", "ts": 1000}""" + "\n")
    val src = spark.readStream.schema("doc_id LONG, text STRING, ts LONG")
      .option("maxFilesPerTrigger", 1).json(dataDir)
    val q = graft.operators.Dedup.streamingMinhashOwnersTtl(
        src, "doc_id", "text", "ts", TtlMs, k = 5, numHashes = 8, bands = 4)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      Files.writeString(java.nio.file.Paths.get(dataDir, "b2.json"),
        s"""{"doc_id": 5, "text": "$textA", "ts": 2000}""" + "\n")
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("owner")))
    assert(out.filter(_._1 == 5L).forall(_._2 == 0L),
      s"doc 5 owners: ${out.filter(_._1 == 5L).toSeq}")
    assert(out.filter(_._1 == 0L).forall(_._2 == 0L))
    assert(out.filter(_._1 == 1L).forall(_._2 == 1L))
  }
}
