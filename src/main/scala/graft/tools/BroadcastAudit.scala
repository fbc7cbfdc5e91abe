package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot sweep: print every catalog entry whose executed plan contains
  * a BroadcastExchange whose output carries an ArrayType column — the
  * computed-array size-estimate trap (a Project's size estimate scales by
  * output row width, and arrays are costed at defaultSize, so wide array
  * frames read as near-zero and auto-broadcast; see the
  * minhashEstimationAudit fix). Run at sf0.1 to match bench conditions.
  *
  * Adjudication rule (r12, de-vacuumed audit): a flagged broadcast is a
  * REAL defect only when the build-side subtree has NO exchange beneath
  * it — a pure projection over a Range/generator, localCheckpoint, or
  * scan, where the static width-mis-costed estimate is final (the
  * est-audit docArr, the simhash banded frame, the incremental index).
  * A frame sitting ABOVE a shuffle (an aggregate like exactSubstr's dps,
  * a joined frame) is re-sized by AQE from the REAL shuffle bytes at
  * runtime, so its broadcast decision is honest and data-dependent —
  * forcing shuffle_hash there pessimizes the common case. Bounded-by-
  * construction sides (ann query frames, decontamination eval sets,
  * vocab²-capped models) broadcast on purpose. */
object BroadcastAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // AQE OFF: AdaptiveSparkPlanExec is a LEAF node, so .collect over an
      // AQE-wrapped executedPlan traverses NOTHING — the audit would pass
      // vacuously. This is a STATIC-plan audit (what the planner commits
      // to before runtime stats); AQE can only narrow from there.
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val skip = Set[String]() // streaming entries start real queries — skip
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!name.startsWith("stream_") && !skip(name)) {
        try {
          val df = fn(spark, dir)
          val plan = df.queryExecution.executedPlan
          val hits = plan.collect {
            case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
              if e.output.exists(_.dataType.isInstanceOf[
                org.apache.spark.sql.types.ArrayType]) =>
              e.output.map(a => s"${a.name}:${a.dataType.simpleString}")
                .mkString(", ")
          }
          if (hits.nonEmpty)
            println(s"ARRAY-BROADCAST $name -> ${hits.mkString(" | ")}")
          // corpus-shaped broadcast: the build side's subtree scans a
          // big fixture table or a >100k Range — a corpus-sized frame
          // shipped through the driver no matter what the width-scaled
          // estimate claimed (the simhash banded self-join trap)
          val big = plan.collect {
            case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
              if e.child.collect {
                case r: org.apache.spark.sql.execution.RangeExec
                  if r.numElements.toLong > 100000L => r
                case s: org.apache.spark.sql.execution.FileSourceScanExec
                  if Seq("documents", "lineitem", "events", "embeddings",
                    "orders").exists(t => s.tableIdentifier.exists(
                      _.table == t) ||
                      s.relation.location.rootPaths.exists(
                        _.toString.contains(t))) => s
              }.nonEmpty =>
              e.child.output.map(_.name).mkString(",")
          }
          if (big.nonEmpty)
            println(s"CORPUS-BROADCAST $name -> ${big.mkString(" | ")}")
        } catch {
          case e: Throwable =>
            println(s"SKIP $name: ${e.getClass.getSimpleName}")
        }
      }
    }
    // the 600k bench shapes — the scale where the estimate traps actually
    // fired (Range-derived sources estimate tiny at any width). A
    // CORPUS-BROADCAST line here needs human adjudication: an AGGREGATED
    // frame over the corpus (e.g. the vocab²-bounded perplexity model) is
    // bounded by its key space and broadcasts on purpose.
    val corpus600k = graft.sources.Generators.syntheticCorpus(spark, 600000L)
    def audit600k(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      try {
        val plan = df.queryExecution.executedPlan
        val big = plan.collect {
          case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
            if e.child.collect {
              case r: org.apache.spark.sql.execution.RangeExec
                if r.numElements.toLong > 100000L => r
            }.nonEmpty =>
            e.child.output.map(_.name).mkString(",")
        }
        if (big.nonEmpty)
          println(s"CORPUS-BROADCAST $name -> ${big.mkString(" | ")}")
      } catch {
        case e: Throwable => println(s"SKIP $name: ${e.getClass.getSimpleName}")
      }
    audit600k("simhash_600k") {
      graft.operators.Dedup.simhashHammingPairs(corpus600k, "doc_id", "text") }
    audit600k("minhash_cand_600k") {
      graft.operators.Dedup.minhashCandidates(corpus600k, "doc_id", "text") }
    audit600k("minhash_est_600k") {
      graft.operators.Dedup.minhashEstimationAudit(corpus600k, "doc_id",
        "text", samplePairsMod = 4) }
    audit600k("substring_600k") {
      graft.operators.Dedup.exactSubstrStats(corpus600k, "doc_id", "text",
        clean = true) }
    audit600k("perplexity_600k") {
      import org.apache.spark.sql.functions.col
      val (c12, c1, vocab) = graft.TextQueries.bigramLm(
        corpus600k.where(col("doc_id") % 2 === 0))
      graft.TextQueries.scorePerplexity(
        graft.TextQueries.bigramRows(corpus600k.where(col("doc_id") % 2 === 1)),
        c12, c1, vocab.head().getLong(0)) }
    println("broadcast-audit done")
    spark.stop()
  }
}
