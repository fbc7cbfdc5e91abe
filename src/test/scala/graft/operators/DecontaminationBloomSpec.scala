package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Bloom gate face ([[TextAnalysis.decontaminationGateBloom]]) exists
  * for eval sets too big to broadcast, and its whole contract is: verdicts
  * IDENTICAL to the exact broadcast gate, with only Bloom BITS broadcast
  * and the exact set confined to a shuffle-side confirm join. Pinned here
  * under a deliberately undersized filter (high FP rate), so the
  * confirm-join FP-strike path carries real traffic. */
class DecontaminationBloomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** 60 docs; ids % 5 == 0 are the "benchmark". Candidates 1,6,11,16 share
    * a >= 16-char verbatim phrase with a benchmark doc (contaminated);
    * everyone else is unique text. */
  private def corpus() = {
    import spark.implicits._
    val leak = "the quick brown fox jumps over the lazy dog"
    (0 until 60).map { i =>
      // per-doc random letters: no accidental >= 16-char run can repeat
      // across documents, so the ONLY contamination is the planted leak
      val r = new scala.util.Random(i * 7919 + 13)
      val base = (0 until 80).map(_ => ('a' + r.nextInt(26)).toChar).mkString
      val text =
        if (i % 5 == 0) s"$base $leak"
        else if (i % 5 == 1 && i < 20) s"$base $leak"
        else base
      (i.toLong, text)
    }.toDF("doc_id", "text")
  }

  test("verdict parity with the exact gate under a high-FP Bloom (m tiny)") {
    val d = corpus()
    val benchSh = d.where(col("doc_id") % 5 === 0)
      .select(explode(graft.functions.charShingles(col("text"), 16))
        .as("shingle")).distinct()
    val cand = d.where(col("doc_id") % 5 =!= 0)
    val exact = TextAnalysis.decontaminationGate(cand, "doc_id", "text",
        benchSh).collect().map(_.getLong(0)).toSet
    // m = 64 bits for ~2000 bench shingles x 3 hashes: essentially every
    // probe passes the Bloom — the confirm join must strike them ALL back
    for (m <- Seq(64, 1 << 12, 1 << 20)) {
      val bloom = TextAnalysis.decontaminationGateBloom(cand, "doc_id",
          "text", benchSh, k = 16, m = m, kHashes = 3)
        .collect().map(_.getLong(0)).toSet
      assert(bloom == exact, s"m=$m: bloom=$bloom exact=$exact")
    }
    assert(exact == Set(1L, 6L, 11L, 16L)) // the planted contamination
  }

  test("confirm join is a shuffle join; the screen is a sketch filter, not a join") {
    val d = corpus()
    val benchSh = d.where(col("doc_id") % 5 === 0)
      .select(explode(graft.functions.charShingles(col("text"), 16))
        .as("shingle")).distinct()
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = TextAnalysis.decontaminationGateBloom(
        d.where(col("doc_id") % 5 =!= 0), "doc_id", "text", benchSh,
        k = 16, m = 1 << 12, kHashes = 3)
      val plan = out.queryExecution.executedPlan
      // the exact shingle set would auto-broadcast at this size; the
      // shuffle_hash hint must defeat that — the face exists precisely for
      // the side that CANNOT broadcast
      val shuffledJoins = plan.collect {
        case j if j.nodeName.contains("ShuffledHashJoin") ||
          j.nodeName.contains("SortMergeJoin") => j
      }
      assert(shuffledJoins.nonEmpty,
        "exact-confirm must be a shuffle join, not a broadcast")
      // the screen is ONE codegen'd might_contain predicate over the
      // O(m/8) sketch literal — no join and no per-probe broadcast build
      // anywhere in the screen (r12; the r11 form was kHashes broadcast
      // semi-joins rebuilt per micro-batch)
      val broadcastJoins = plan.collect {
        case j if j.nodeName.contains("BroadcastHashJoin") ||
          j.nodeName.contains("BroadcastNestedLoop") => j
      }
      assert(broadcastJoins.isEmpty,
        s"screen must be a sketch filter, found joins: $broadcastJoins")
      assert(plan.toString.contains("might_contain"),
        "expected the might_contain sketch predicate in the plan")
      assert(plan.collect { case e: ShuffleExchangeExec => e }.nonEmpty)
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("empty eval set yields zero verdicts (null-sketch guard)") {
    val d = corpus()
    val emptyBench = d.where(col("doc_id") < 0)
      .select(explode(graft.functions.charShingles(col("text"), 16))
        .as("shingle"))
    assert(TextAnalysis.decontaminationGateBloom(d, "doc_id", "text",
      emptyBench, k = 16, m = 1 << 12, kHashes = 3).count() == 0L)
  }

  test("no false negatives straight from the Bloom screen (pre-confirm)") {
    // the screen alone (bits only) must pass every truly-contaminated
    // (doc, shingle) pair — Bloom soundness on the relational formulation
    val d = corpus()
    val benchSh = d.where(col("doc_id") % 5 === 0)
      .select(explode(graft.functions.charShingles(col("text"), 16))
        .as("shingle")).distinct()
    val probes = d.where(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"),
        explode(graft.functions.charShingles(col("text"), 16)).as("shingle"))
    val trueHits = probes.join(benchSh, Seq("shingle"), "left_semi")
    val m = 1 << 12
    val bits = RuntimeFilters.bloomBits(benchSh, "shingle", m, 3)
    val screened = RuntimeFilters.bloomProbe(probes, "shingle", bits, m, 3)
    assert(trueHits.join(screened,
      trueHits("doc_id") === screened("doc_id") &&
        trueHits("shingle") === screened("shingle"), "left_anti")
      .count() == 0L)
  }
}
