package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** Fault-tolerance of the streaming dedup path: the (band, bkey) →
  * first-owner state of streamingMinhashOwners must survive a query
  * restart from the checkpoint. A duplicate arriving AFTER the restart
  * must be flagged against a bucket owned BEFORE the stop — if the state
  * were lost, the late duplicate would own its (fresh-looking) buckets
  * and silently pass dedup. */
class MinhashOwnerRecoverySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucket owners survive restart; post-restart duplicate is flagged") {
    val dataDir = Files.createTempDirectory("mh-data").toString
    val ckpt = Files.createTempDirectory("mh-ckpt").toString
    val outDir = Files.createTempDirectory("mh-out").toString
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "completely different prose describing spark streaming stores"
    val textC = "a third unrelated document mentioning parquet and checkpoints"

    def startQuery() = {
      val src = spark.readStream.schema("doc_id LONG, text STRING")
        .json(dataDir)
      graft.operators.Dedup.streamingMinhashOwners(
          graft.operators.Dedup.minhashBandKeys(src, "doc_id", "text",
            k = 5, numHashes = 8, bands = 4))
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
    }
    def jline(id: Long, text: String) =
      s"""{"doc_id": $id, "text": "$text"}"""

    // run 1: two distinct docs — each owns all its buckets
    Files.writeString(java.nio.file.Paths.get(dataDir, "b1.json"),
      jline(0, textA) + "\n" + jline(1, textB) + "\n")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // run 2 (fresh query, same checkpoint): doc 5 duplicates doc 0
    // byte-for-byte, doc 6 is fresh
    Files.writeString(java.nio.file.Paths.get(dataDir, "b2.json"),
      jline(5, textA) + "\n" + jline(6, textC) + "\n")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val out = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band"),
        r.getAs[Long]("owner")))
    // every doc emitted one row per band, exactly once (no batch replay)
    assert(out.groupBy(r => (r._1, r._2)).forall(_._2.length == 1))
    assert(out.count(_._1 == 5L) == 4)
    // identical text → identical signature → all 4 bands hit doc 0's
    // buckets; owner 0 on every band proves the restored state, because a
    // lost store would have made doc 5 its own owner
    assert(out.filter(_._1 == 5L).forall(_._3 == 0L),
      s"doc 5 owners: ${out.filter(_._1 == 5L).toSeq}")
    // originals and the fresh doc own themselves everywhere
    for (id <- Seq(0L, 1L, 6L))
      assert(out.filter(_._1 == id).forall(_._3 == id),
        s"doc $id owners: ${out.filter(_._1 == id).toSeq}")
  }
}
