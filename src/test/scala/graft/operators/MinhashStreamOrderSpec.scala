package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Dedup.streamingMinhashOwners]]' keep-first-SEEN semantics under
  * OUT-OF-ORDER arrival — the precondition the stream_dedup_minhash catalog
  * entry documents (id-order feed ⇒ batch keep-first verdict) must degrade
  * to "exactly one keeper per near-dup group, the earliest arrival", never
  * to "two keepers". A running-min owner state would fail this: a LOW id
  * arriving after a HIGH near-dup becomes its own owner, both docs pass an
  * `owner == doc_id` test, and the duplicate silently survives. */
class MinhashStreamOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dupText = "The quick brown fox jumps over the lazy dog again and again."
  private val otherText = "Completely different content about database engines and queries."

  /** Feed batches through the band-key + owner stages; return per-doc
    * keeper verdicts (kept ⇔ doc owns every band it lands in). */
  private def verdicts(batches: Seq[Seq[(Long, String)]]): Map[Long, Boolean] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val owners = Dedup.streamingMinhashOwners(
      Dedup.minhashBandKeys(src.toDF().toDF("doc_id", "text"),
        "doc_id", "text", k = 5, numHashes = 8, bands = 4))
    val name = s"mso_out_${System.nanoTime()}"
    val q = owners.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("owner")))
        .groupBy(_._1)
        .map { case (id, rows) => id -> rows.forall { case (d, o) => o == d } }
    } finally q.stop()
  }

  test("id-order arrival reproduces the batch keep-first (lowest id) verdict") {
    val got = verdicts(Seq(
      Seq(3L -> dupText, 4L -> otherText),
      Seq(9L -> dupText)))
    assert(got == Map(3L -> true, 4L -> true, 9L -> false))
  }

  test("out-of-order arrival keeps exactly one doc per group: the first SEEN") {
    // HIGH id arrives first, LOW near-dup later — the late low id must be
    // flagged (its bands are owned by 9), not become a second keeper
    val got = verdicts(Seq(
      Seq(9L -> dupText, 4L -> otherText),
      Seq(3L -> dupText)))
    assert(got == Map(9L -> true, 4L -> true, 3L -> false))
  }

  test("corpus-seeded state flags a first-arriving fresh dup; fresh keepers unaffected") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = Dedup.minhashBandKeys(
      Seq(100L -> dupText).toDF("doc_id", "text"),
      "doc_id", "text", k = 5, numHashes = 8, bands = 4)
    val src = MemoryStream[(Long, String)]
    val owners = Dedup.streamingMinhashOwnersSeeded(
      Dedup.minhashBandKeys(src.toDF().toDF("doc_id", "text"),
        "doc_id", "text", k = 5, numHashes = 8, bands = 4), idx)
    val name = s"mso_seed_${System.nanoTime()}"
    val q = owners.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      // id 3 duplicates CORPUS content and arrives FIRST — without seeding
      // it would own its buckets and survive; id 4 is novel and must keep
      src.addData(Seq(3L -> dupText, 4L -> otherText))
      q.processAllAvailable()
      val got = spark.table(name).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("owner")))
        .groupBy(_._1)
        .map { case (id, rows) => id -> rows.forall { case (d, o) => o == d } }
      assert(got == Map(3L -> false, 4L -> true))
      // the corpus sentinel, not some real doc, owns id 3's buckets
      assert(spark.table(name)
        .where(org.apache.spark.sql.functions.col("doc_id") === 3L)
        .select("owner").as[Long].collect().forall(_ == Dedup.CorpusOwner))
    } finally q.stop()
  }

  test("within one batch the deterministic order is doc id, regardless of row order") {
    // both dups in the same batch, listed high-first: sort-within-batch
    // makes the LOWEST id the bucket owner deterministically
    val got = verdicts(Seq(Seq(9L -> dupText, 3L -> dupText)))
    assert(got == Map(3L -> true, 9L -> false))
  }
}
