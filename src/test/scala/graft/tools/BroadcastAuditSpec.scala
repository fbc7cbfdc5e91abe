package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** In-suite regression gate for the r12 computed-array broadcast audit
  * (judge r12 item 4). The manual `tools/BroadcastAudit` sweep found four
  * operators whose static plans auto-broadcast corpus-sized frames under
  * DEFAULT config because Catalyst costs ArrayType columns at defaultSize
  * (a ~1.6 KB/row shingle-hash frame estimated near zero). Those are fixed
  * and pinned in PlanShapeSpec; THIS spec re-runs the whole static-plan
  * sweep on every `sbt test` so a new operator re-introducing a mis-costed
  * broadcast turns the suite red instead of waiting for the next manual
  * audit run.
  *
  * The assertion is EXACT-SET over the non-resizable hits (build side has
  * no exchange beneath it, so the static width-mis-costed estimate is
  * final). Resizable hits — a build side above a shuffle — are safe as a
  * CLASS: AQE re-costs them from real shuffle bytes at runtime, and
  * forcing shuffle_hash there pessimizes the common case (the r12 scope
  * rule, documented on BroadcastAudit). A new non-resizable hit = red; a
  * VANISHED allowlisted hit = red too (stale allowlist — re-adjudicate).
  */
class BroadcastAuditSpec extends AnyFunSuite {
  lazy val spark = graft.operators.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Adjudicated-safe non-resizable broadcast sites at sf0.001, by class:
    *  - ann_* / dedup_embedding* / sky_dominance_pairs / sql_functions
    *    "array": the QUERY-side frame — bounded by construction (a fixed
    *    handful of query vectors / an 80-row demo), broadcast on purpose.
    *  - "corpus" hits on the ann, dedup_embedding and sql_functions
    *    entries: the same
    *    bounded query frames — the scan-name heuristic fires because the
    *    query side is a filtered scan of embeddings.parquet.
    *  - events/orders "corpus" hits (funnel, zscore, fk_integrity,
    *    interval_join, TPC-H variants, set ops): honestly-estimated FILE
    *    scans — tiny at sf0.001 so the planner broadcasts them honestly;
    *    the same estimate grows with the data and stops broadcasting at
    *    scale. (Range/computed-Project estimates, by contrast, do NOT
    *    grow with data — that's the trap class this spec guards.) */
  private val allowlist: Set[(String, String)] = Set(
    ("ann_ivf", "array"), ("ann_ivf", "corpus"),
    ("ann_ivf_index", "array"),
    ("ann_ivf_pq", "array"), ("ann_ivf_pq", "corpus"),
    ("ann_lsh", "array"), ("ann_lsh", "corpus"),
    ("ann_lsh_mp", "array"), ("ann_lsh_mp", "corpus"),
    ("ann_pq", "array"), ("ann_pq", "corpus"),
    ("ann_recall", "array"), ("ann_recall", "corpus"),
    ("ann_topk", "array"), ("ann_topk", "corpus"),
    ("dedup_embedding", "array"), ("dedup_embedding", "corpus"),
    ("dedup_embedding_recall", "array"),
    ("dedup_embedding_recall", "corpus"),
    ("events_funnel", "corpus"),
    ("events_zscore", "corpus"),
    ("fk_integrity", "corpus"),
    ("funnel_latency", "corpus"),
    ("interval_join", "corpus"),
    ("nation_revenue_share", "corpus"),
    ("q3_top_orders", "corpus"),
    ("q5_nation_revenue", "corpus"),
    ("q_not_in_nulls", "corpus"),
    ("q_semi_anti", "corpus"),
    ("set_ops_building", "corpus"),
    ("sky_dominance_pairs", "array"),
    ("sql_functions", "array"), ("sql_functions", "corpus"))

  test("static-plan broadcast sweep matches the adjudicated allowlist") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    // AQE OFF or the executedPlan is an AdaptiveSparkPlanExec LEAF and the
    // sweep passes vacuously; broadcast threshold stays at its DEFAULT —
    // forcing it off is exactly what hid the four r12 defects
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // 150k keeps the corpus-range detector armed (>100k gate) at a
      // fraction of the 600k planning cost; Range-derived plan SHAPE is
      // size-independent, which is the trap this audit exists to catch
      val hits = BroadcastAudit.auditCatalog(spark, dir) ++
        BroadcastAudit.auditCorpusShapes(spark, n = 150000L)
      val skips = hits.filter(_.kind == "skip")
      assert(skips.isEmpty,
        s"entries whose plan could not be derived: " +
          skips.map(h => s"${h.entry}(${h.detail})").mkString(", "))
      val static = hits.filter(h => !h.resizable)
        .map(h => (h.entry, h.kind)).toSet
      val fresh = static -- allowlist
      val stale = allowlist -- static
      assert(fresh.isEmpty,
        s"NEW non-resizable broadcast sites (possible computed-array " +
          s"estimate trap — adjudicate before allowlisting): " +
          fresh.toSeq.sorted.mkString(", "))
      assert(stale.isEmpty,
        s"allowlisted sites no longer present (stale allowlist): " +
          stale.toSeq.sorted.mkString(", "))
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }
}
