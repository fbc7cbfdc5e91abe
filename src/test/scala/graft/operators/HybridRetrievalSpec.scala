package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Structural laws for the round-6 retrieval-fusion and streaming-gate
  * additions (hybrid_rrf, stream_decontaminate) over the sf0.001 fixture —
  * the exact-value gate is the DuckDB oracle; these assert invariants that
  * must hold regardless of data.
  */
class HybridRetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("hybrid_rrf: fused score is exactly 10^9 div (60+rank) summed over lists") {
    val rows = run("hybrid_rrf").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val lex = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val vec = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(lex.isDefined || vec.isDefined)
      val expect = lex.map(x => 1000000000L / (60L + x)).getOrElse(0L) +
        vec.map(x => 1000000000L / (60L + x)).getOrElse(0L)
      assert(r.getLong(1) == expect, s"row $r")
      lex.foreach(x => assert(x >= 1 && x <= 100))
      vec.foreach(x => assert(x >= 1 && x <= 100))
    }
    // result is ordered by fused score desc, doc_id asc
    val keys = rows.map(r => (-r.getLong(1), r.getLong(0))).toSeq
    assert(keys == keys.sorted)
  }

  test("hybrid_rrf: the dense query doc (vec 0 vs itself, cosine 1) tops its list") {
    val rows = run("hybrid_rrf").collect()
    val doc0 = rows.find(_.getLong(0) == 0L)
    assert(doc0.isDefined && !doc0.get.isNullAt(3) && doc0.get.getLong(3) == 1L)
  }

  test("hybrid_rrf plans its top-k lists as TakeOrderedAndProject, no corpus sort") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("hybrid_rrf").queryExecution.executedPlan
      val takeOrdered = plan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t }
      val sorts = plan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s }
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      // lex top-100, vec top-100, final top-20 — all bounded top-k merges
      assert(takeOrdered.length == 3, s"expected 3 TakeOrdered, got $plan")
      // the only sorts feed the rank windows over the 100-row lists (plus
      // the full-outer SortMergeJoin of the two 100-row lists); any sort
      // beyond those means a corpus-wide ordering crept in
      assert(windows.length == 2, s"expected 2 rank windows, got $plan")
      assert(sorts.length <= windows.length + 2,
        s"unexpected extra SortExec (corpus-wide sort?): $plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("stream_decontaminate verdicts == the batch contaminated set") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val benchSh = d.where(col("doc_id") % 97 === 0)
      .select(explode(graft.functions.charShingles(col("text"), 16))
        .as("shingle")).distinct()
    val expect = d.where(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"),
        explode(graft.functions.charShingles(col("text"), 16)).as("shingle"))
      .join(benchSh, Seq("shingle"), "left_semi")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val got = run("stream_decontaminate").collect().map(_.getLong(0))
    assert(got.toSet == expect)
    assert(got.length == expect.size) // one verdict per doc, no duplicates
  }
}
