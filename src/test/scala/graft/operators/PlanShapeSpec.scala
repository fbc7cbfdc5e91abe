package graft.operators

import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape guards for operators whose 100 TB story is a claim
  * about WHERE the shuffles are — a code change that silently adds an
  * exchange on a new key (or a cartesian) would keep every value-level test
  * green while breaking the scale design. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("incrementalMinhashVerdict shuffles only on (band,bkey) and the final doc_id") {
    import spark.implicits._
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val priorBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // the tiny test index would broadcast, hiding its exchange key — force
    // the shuffled path so the partitioning claim is actually examined
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val corpus = Seq((0L, "corpus text about engines"),
        (2L, "more corpus text entirely")).toDF("doc_id", "text")
      val fresh = Seq((1L, "fresh text one"), (3L, "fresh text two"))
        .toDF("doc_id", "text")
      val idx = Dedup.minhashBandKeys(corpus, "doc_id", "text",
        k = 5, numHashes = 8, bands = 4)
      val verdict = Dedup.incrementalMinhashVerdict(idx, fresh, "doc_id",
        "text", k = 5, numHashes = 8, bands = 4)
      val exchanges = verdict.queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.nonEmpty)
      val keySets = exchanges.map(_.outputPartitioning).map {
        case h: HashPartitioning =>
          h.expressions.map(_.references.map(_.name).mkString).toSet
        case other => fail(s"unexpected partitioning $other")
      }
      // every exchange hashes on the band-bucket key or the final verdict
      // key — any third key set means an unplanned shuffle crept in
      assert(keySets.forall(ks =>
        ks == Set("band", "bkey") || ks == Set("doc_id")),
        s"unexpected exchange keys: $keySets")
      assert(keySets.count(_ == Set("doc_id")) == 1,
        s"exactly one verdict aggregation exchange expected: $keySets")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorBcast)
    }
  }

  test("exactSubstrStats shuffles only on the span hash and doc_id") {
    import spark.implicits._
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val priorBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = Seq((0L, "a b c d e f g h i j"), (1L, "a b c d e f g h x y"))
        .toDF("doc_id", "text")
      val out = Dedup.exactSubstrStats(docs, "doc_id", "text", clean = true)
      val plan = out.queryExecution.executedPlan
      assert(plan.collect {
        case e if e.nodeName.contains("Cartesian") ||
          e.nodeName.contains("BroadcastNestedLoop") => e
      }.isEmpty, "span dedup must never cross-product")
      val keySets = plan
        .collect { case e: ShuffleExchangeExec => e.outputPartitioning }
        .map {
          case h: HashPartitioning =>
            h.expressions.map(_.references.map(_.name).mkString).toSet
          case other => fail(s"unexpected partitioning $other")
        }
      // the first-owner window-min hashes on the span hash `h`; the
      // duplicated-position rollup and the final outer join hash on doc_id
      assert(keySets.nonEmpty && keySets.forall(ks =>
        ks == Set("h") || ks == Set("doc_id")),
        s"unexpected exchange keys: $keySets")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorBcast)
    }
  }

  test("exactSubstrStats generated methods stay under the HotSpot compile cap") {
    // the codegen'd sliding span-hash window compiles to ONE large method —
    // 7,673 bytecode bytes measured at r11 against HotSpot's 8,000-byte
    // DontCompileHugeMethods cap (judge r11 item 6). Past the cap the hot
    // loop never JITs and the whole pass silently runs interpreted (~10x).
    // Compile every codegen stage of the real plan and fail while there is
    // still margin, so a widened window or added span column is caught at
    // review time instead of as an unexplained bench cliff.
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // the BENCH plan exactly (dedup_substring_600k): the dominant stage
      // fuses the synthetic-corpus text derivation with the span-hash
      // explode, and THAT fusion is what sits near the cap — row count is
      // irrelevant to the generated source, so 100 rows compiles the same
      // methods the 600k run does
      val docs = graft.sources.Generators.syntheticCorpus(spark, 100L)
      val out = Dedup.exactSubstrStats(docs, "doc_id", "text", clean = true)
      val stages = out.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }
      assert(stages.nonEmpty, "expected whole-stage codegen stages")
      val sizes = stages.map { w =>
        val (_, code) = w.doCodeGen()
        val (_, stats) = org.apache.spark.sql.catalyst.expressions.codegen
          .CodeGenerator.compile(code)
        stats.maxMethodCodeSize
      }
      assert(sizes.max <= 7900,
        s"largest generated method ${sizes.max} bytecode bytes — within " +
          "100 bytes of the 8,000-byte HotSpot compile cap; split the " +
          "corpus-derivation/span-hash fusion before shipping")
      // measurement sanity: the fused stage IS big (7,673 bytes at r11) —
      // if this reads tiny, the compile above measured the wrong stages
      // and the guard is vacuous
      assert(sizes.max >= 2000,
        s"expected the fused span-hash stage among ${sizes.sorted}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("gramMatrix: one single-partition exchange of partial buffers, no explode before the agg") {
    import spark.implicits._
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    val df = (0 until 20).map(i => Tuple1(Seq.fill(4)(i * 0.01))).toDF("embedding")
    val plan = Embeddings.gramMatrix(df, "embedding", 4)
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: ShuffleExchangeExec => e.outputPartitioning
    }
    // the whole reduction is ONE exchange, and it carries 16 KB buffers —
    // SinglePartition, not a hash repartition of row data
    assert(exchanges.length == 1, s"expected 1 exchange, got $exchanges")
    assert(exchanges.head.numPartitions == 1,
      s"expected SinglePartition buffer reduction: ${exchanges.head}")
    // both aggregation halves exist (map-side partial + final merge), and
    // the Generate (posexplode of the 2080-cell result) sits ABOVE the
    // final aggregate — never below the exchange where it would explode
    // per-row data
    val aggs = plan.collect { case a if a.nodeName.contains("Aggregate") => a }
    assert(aggs.length >= 2, s"expected partial+final aggregates: $aggs")
    val generateSubtrees = plan.collect {
      case g if g.nodeName.contains("Generate") => g
    }
    assert(generateSubtrees.length == 1)
    assert(generateSubtrees.head.collect {
      case e: ShuffleExchangeExec => e }.length == 1,
      "the explode must consume the already-reduced buffer (exchange below it)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("bottom-k sample: TopKAgg partially aggregates below the stratum exchange") {
    import spark.implicits._
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = (0L until 100L).map(i => (i, if (i % 2 == 0) "en" else "de"))
        .toDF("doc_id", "lang")
      val topk = org.apache.spark.sql.functions.udaf(new TopKAgg(5),
        TopK.inputEncoder)
      import org.apache.spark.sql.functions._
      val out = docs.groupBy("lang")
        .agg(topk(-col("doc_id"), col("doc_id")).as("top"))
      val plan = out.queryExecution.executedPlan
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.length == 1)
      // a partial aggregate below the exchange = each map task ships <= k
      // entries per stratum, the whole point of the bounded aggregator
      val partialBelow = exchanges.head.collect {
        case a if a.nodeName.contains("Aggregate") => a
      }
      assert(partialBelow.nonEmpty,
        "expected a map-side partial TopKAgg below the stratum exchange")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("partitioned layout: a partition-key predicate prunes directories, not rows") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("prunespec").toString
    Seq((0L, 10L, "en"), (1L, 20L, "de"), (2L, 30L, "en"), (3L, 40L, "fr"))
      .toDF("doc_id", "n_chars", "lang")
      .write.mode("overwrite").partitionBy("lang").parquet(tmp)
    val q = spark.read.parquet(tmp).where($"lang" === "en")
      .select($"doc_id", $"n_chars")
    val scans = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 1)
    val scan = scans.head
    // the lang predicate must land in partitionFilters (directory pruning
    // before I/O), NOT dataFilters (row filtering after reading bytes)
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "lang")),
      s"lang predicate not in partitionFilters: ${scan.partitionFilters}")
    assert(!scan.dataFilters.exists(_.references.exists(_.name == "lang")),
      s"lang predicate leaked into dataFilters: ${scan.dataFilters}")
    // and only the lang=en directory's files survive pruning
    assert(scan.relation.location.inputFiles.length > 1)
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 2L))
  }

  test("cdc applyChangelog: partial max_by below ONE key exchange, one join, no extra shuffle") {
    import spark.implicits._
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val priorBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val base = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
      val changelog = Seq((1L, 1L, "U", 11.0), (3L, 1L, "U", 30.0))
        .toDF("k", "seq", "op", "v")
      val plan = Cdc.applyChangelog(base, changelog, "k", Seq("seq"), "op",
        Seq("v")).queryExecution.executedPlan
      // the collapse aggregates PARTIALLY before its exchange: changelog
      // volume crosses the wire at most once, as one row per key per task
      val planStr = plan.toString
      assert(planStr.contains("partial_max_by"),
        s"no map-side combine in:\n$planStr")
      // every exchange hashes on the merge key — a shuffle on any other key
      // means the MERGE stopped being a co-partitioned single join
      val keyed = plan.collect { case e: ShuffleExchangeExec =>
        e.outputPartitioning }.collect {
        case h: HashPartitioning =>
          h.expressions.map(_.references.map(_.name).mkString).toSet }
      assert(keyed.nonEmpty && keyed.forall(_ == Set("k")),
        s"unexpected exchange keys: $keyed")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorBcast)
    }
  }

  test("grouped skyline: partial antichain aggregation below the single group exchange") {
    import spark.implicits._
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Seq(("a", 1L, 1.0, 2.0), ("a", 2L, 2.0, 1.0), ("b", 3L, 5.0, 5.0))
        .toDF("grp", "id", "v1", "v2")
      val plan = SkylineOps.skylineGroupedDF(df, Seq("grp"), "id",
        Seq("v1", "v2")).queryExecution.executedPlan
      val planStr = plan.toString
      // partial ObjectHashAggregate = per-map-task local skyline per group;
      // only non-dominated points cross the one hash exchange on grp
      assert(planStr.contains("ObjectHashAggregate"), planStr)
      val keyed = plan.collect { case e: ShuffleExchangeExec =>
        e.outputPartitioning }.collect {
        case h: HashPartitioning =>
          h.expressions.map(_.references.map(_.name).mkString).toSet }
      assert(keyed.count(_ == Set("grp")) == 1,
        s"exactly one group exchange expected: $keyed")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
    }
  }

  test("checkRules: ONE aggregation pass — a single final-agg exchange, no join") {
    // spark.range, not a LocalRelation — the optimizer folds local input
    // and the plan would vacuously show zero exchanges. AQE off: the
    // adaptive wrapper hides the inner exchanges from collect().
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = spark.range(1000).select(
        org.apache.spark.sql.functions.col("id"),
        (org.apache.spark.sql.functions.col("id") % 7).cast("double").as("v"))
      val plan = Validate.checkRules(df, Seq(
          ("v_pos", org.apache.spark.sql.functions.col("v") > 0),
          ("id_pos", org.apache.spark.sql.functions.col("id") > 0)))
        .queryExecution.executedPlan
      val planStr = plan.toString
      // every rule folds into the same partial HashAggregate: exactly one
      // exchange (the 1-row final agg gather), no join
      val nEx = plan.collect { case e: ShuffleExchangeExec => e }.size
      assert(nEx == 1, s"expected the single final-agg exchange, got $nEx:\n$planStr")
      assert(!planStr.contains("Join"), planStr)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
    }
  }

  test("simhashHammingPairs: banded equi-join, never a cartesian") {
    import spark.implicits._
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val priorBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // force the shuffled join so the partitioning claim is examined
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta delta"))
        .toDF("doc_id", "text")
      val plan = Dedup.simhashHammingPairs(df, "doc_id", "text", 3)
        .queryExecution.executedPlan
      val planStr = plan.toString
      assert(!planStr.contains("CartesianProduct") &&
        !planStr.contains("BroadcastNestedLoopJoin"), planStr)
      // the candidate join must key on the (blk, bits) block columns
      val keyed = plan.collect { case e: ShuffleExchangeExec =>
        e.outputPartitioning }.collect {
        case h: HashPartitioning =>
          h.expressions.map(_.references.map(_.name).mkString).toSet }
      assert(keyed.exists(_ == Set("blk", "bits")),
        s"no (blk, bits) exchange found: $keyed")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorBcast)
    }
  }

  test("simhash + incremental probes never broadcast corpus-shaped frames under DEFAULT config") {
    import spark.implicits._
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // broadcast threshold left at DEFAULT on purpose: the trap under guard
    // is the planner auto-broadcasting a corpus-sized computed frame off a
    // width-mis-costed estimate (Range/generator sources never cross the
    // threshold at ANY size) — forcing the threshold off, as the sibling
    // shuffles-only tests do, would hide exactly the defect this pins.
    try {
      val docs = Seq((0L, "alpha beta gamma"), (1L, "alpha beta delta"),
        (2L, "epsilon zeta eta")).toDF("doc_id", "text")
      val simPlan = Dedup.simhashHammingPairs(docs, "doc_id", "text", 3)
        .queryExecution.executedPlan
      val simShj = simPlan.collect {
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
          if j.leftKeys.flatMap(_.references.toSeq.map(_.name))
            .contains("blk") => j }
      assert(simShj.size == 1, s"banded self-join must shuffle:\n$simPlan")

      val idx = Dedup.minhashBandKeys(docs, "doc_id", "text",
        k = 5, numHashes = 8, bands = 4)
      val incPlan = Dedup.incrementalMinhashVerdict(idx,
          Seq((7L, "alpha beta gamma")).toDF("doc_id", "text"),
          "doc_id", "text", k = 5, numHashes = 8, bands = 4)
        .queryExecution.executedPlan
      // only the CORPUS-shaped index side is under guard — the owners
      // join builds on the fresh micro-batch, bounded by contract, and
      // may broadcast freely
      val incBcast = incPlan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if (j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
            case _ => j.right
          }).output.exists(_.name == "in_corpus") => j }
      assert(incBcast.isEmpty,
        s"index membership probe must not broadcast:\n$incPlan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("minhashCandidates: explode -> ONE self-join -> distinct; no signature re-join") {
    import spark.implicits._
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val priorBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // force the shuffled path so every exchange key is examined
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = Seq((0L, "aa bb cc dd ee"), (1L, "aa bb cc dd ff"),
        (2L, "zz yy xx ww vv")).toDF("doc_id", "text")
      val plan = Dedup.minhashCandidates(docs, "doc_id", "text",
          k = 3, numHashes = 8, bands = 4)
        .queryExecution.executedPlan
      // exactly one join: the bucket self-join — the r11 shape carried two
      // MORE joins (pairs back onto the corpus-sized signature frame)
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
      assert(joins.size == 1, s"expected 1 join, got ${joins.size}:\n$plan")
      // and every exchange hashes on the bucket key or the pair-distinct
      // key — a third key set means a signature re-join crept back in
      val keySets = plan.collect { case e: ShuffleExchangeExec =>
        e.outputPartitioning }.collect {
        case h: HashPartitioning =>
          h.expressions.map(_.references.map(_.name).mkString).toSet }
      assert(keySets.nonEmpty && keySets.forall(ks =>
        ks == Set("bk") || ks == Set("id_a", "id_b", "_agree")),
        s"unexpected exchange keys: $keySets")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorBcast)
    }
  }

  test("minhashEstimationAudit: the hash-array frame streams — shuffled-hash verify joins, pairs build") {
    import spark.implicits._
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // NOTE: autoBroadcastJoinThreshold stays at its DEFAULT here on
    // purpose — the trap this guards is Catalyst auto-broadcasting the
    // computed ArrayType frame (a Project's size estimate scales by
    // output width, and arrays are costed at defaultSize, so the
    // ~1.6 KB/row hash-array frame reads as near-zero). The shuffle_hash
    // hint must win over that estimate, not over a disabled planner.
    try {
      val docs = Seq((0L, "aa bb cc dd ee"), (1L, "aa bb cc dd ff"),
        (2L, "zz yy xx ww vv")).toDF("doc_id", "text")
      val audit = Dedup.minhashEstimationAudit(docs, "doc_id", "text",
        k = 5, numHashes = 8, bands = 4)
      val plan = audit.queryExecution.executedPlan
      val verifyJoins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
          if j.leftKeys.flatMap(_.references.toSeq.map(_.name))
            .exists(n => n == "id_a" || n == "id_b") => j
      }
      assert(verifyJoins.size == 2,
        s"expected 2 shuffled-hash verification joins, plan:\n$plan")
      // the bounded pairs side (left) builds; the array frame only streams
      assert(verifyJoins.forall(_.buildSide ==
        org.apache.spark.sql.catalyst.optimizer.BuildLeft), plan.toString)
      // and no broadcast build ever carries the array column
      val bcastJoins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.leftKeys.flatMap(_.references.toSeq.map(_.name))
            .exists(n => n == "id_a" || n == "id_b") => j
      }
      assert(bcastJoins.isEmpty, plan.toString)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
    }
  }

  test("removeBoilerplate: shuffles only on seg (df count + anti-join) and id") {
    import spark.implicits._
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val priorBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Seq((1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"))
        .toDF("doc_id", "text")
      val plan = TextAnalysis.removeBoilerplate(df, "doc_id", "text", 10, 2)
        .queryExecution.executedPlan
      val keyed = plan.collect { case e: ShuffleExchangeExec =>
        e.outputPartitioning }.collect {
        case h: HashPartitioning =>
          h.expressions.map(_.references.map(_.name).mkString).toSet }
      // {seg}: df-count agg + both anti-join sides; {id}: the two per-doc
      // aggs; {seg, id}: countDistinct's expand-phase partial agg
      assert(keyed.nonEmpty &&
        keyed.forall(ks => ks == Set("seg") || ks == Set("id") ||
          ks == Set("seg", "id")),
        s"unexpected exchange keys: $keyed")
      assert(!plan.toString.contains("Window"), plan.toString)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorBcast)
    }
  }

  test("linearClassifierScoreU6 is a pure projection — zero shuffles") {
    import spark.implicits._
    val df = Seq((0L, "alpha beta gamma"), (1L, "delta epsilon"))
      .toDF("doc_id", "text")
    val plan = TextAnalysis.linearClassifierScoreU6(df, "doc_id", "text",
        graft.TextQueries.classifierWeightsU6)
      .queryExecution.executedPlan
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.isEmpty,
      s"classifier scoring must be scan-time (model rides as a literal); " +
        s"found exchanges: $exchanges")
  }

  test("lshMultiProbeTopK never shuffles or sorts the corpus side") {
    import spark.implicits._
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val rng = new scala.util.Random(5)
      val corpus = Seq.tabulate(50)(i =>
        (i.toLong, Array.fill(8)(rng.nextGaussian()))).toDF("vec_id", "embedding")
      val q = corpus.where(org.apache.spark.sql.functions.col("vec_id") === 0)
      val plan = Similarity.lshMultiProbeTopK(corpus, "vec_id", "embedding",
          q, "vec_id", "embedding", k = 5, nPlanes = 4, dims = 8)
        .queryExecution.executedPlan
      // the probe fan-out must ride the broadcast QUERY side: the only
      // hash exchange allowed is the final per-query rank window's
      // query_id — a corpus-keyed exchange means the bucket join
      // degenerated into a shuffle of the corpus
      val keyed = plan.collect { case e: ShuffleExchangeExec =>
        e.outputPartitioning }.collect {
        case h: HashPartitioning =>
          h.expressions.map(_.references.map(_.name).mkString).toSet }
      assert(keyed.forall(_ == Set("query_id")),
        s"corpus-side exchange crept in: $keyed")
      assert(plan.toString.contains("BroadcastHashJoin"), plan.toString)
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("rank windows in hybrid retrieval run over a bounded limit, never a global sort") {
    // The single-partition WindowExec in topKToQueryU6 (and the bm25→rank
    // composition hybrid_rrf uses) is safe ONLY because a top-k limit
    // precedes it — the window ranks k rows, not the corpus. This pins that
    // invariant in the physical plan so a refactor can't silently turn it
    // into a global corpus sort: every WindowExec must have a
    // TakeOrderedAndProject descendant, and every SortExec must sit above
    // one (i.e. sort only already-limited rows).
    import org.apache.spark.sql.execution.{SparkPlan, SortExec,
      TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def hasLimitBelow(p: SparkPlan): Boolean =
      p.children.exists(c => c.collectFirst {
        case t: TakeOrderedAndProjectExec => t }.nonEmpty)
    def assertBounded(plan: SparkPlan, what: String): Unit = {
      val windows = plan.collect { case w: WindowExec => w }
      assert(windows.nonEmpty, s"$what: expected a rank window\n$plan")
      windows.foreach(w => assert(hasLimitBelow(w),
        s"$what: WindowExec has no TakeOrderedAndProject below it — " +
          s"the rank window would sort the whole corpus\n$plan"))
      plan.collect { case s: SortExec => s }.foreach(s =>
        assert(s.collectFirst { case t: TakeOrderedAndProjectExec => t }
          .nonEmpty,
          s"$what: SortExec without a limit below it (global sort)\n$plan"))
    }
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // dense side: topKToQueryU6 over a 200-vector corpus, k = 10
      val rng = new scala.util.Random(11)
      val corpus = Seq.tabulate(200)(i =>
        (i.toLong, Array.fill(8)(rng.nextGaussian()))).toDF("vec_id", "embedding")
      val q = corpus.where(col("vec_id") === 0)
      assertBounded(
        Similarity.topKToQueryU6(corpus, "vec_id", "embedding",
          q, "embedding", 10).queryExecution.executedPlan,
        "topKToQueryU6")
      // lexical side: the bm25 → orderBy.limit → rank-window composition
      // the hybrid_rrf catalog entry builds
      val docs = Seq.tabulate(200)(i =>
        (i.toLong, s"alpha beta gamma doc$i term${i % 7}")).toDF("doc_id", "text")
      val lex = TextAnalysis.bm25(docs, "doc_id", "text", Seq("alpha", "gamma"))
        .orderBy(col("score_u6").desc, col("doc_id")).limit(10)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("score_u6").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("rank"))
      assertBounded(lex.queryExecution.executedPlan, "bm25 rank")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }
}
