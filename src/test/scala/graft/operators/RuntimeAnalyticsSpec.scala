package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Structural laws for the Bloom runtime filter, HLL distinct sketch,
  * Z-order layout, and bounded top-k aggregate (the exact-value gate is the
  * DuckDB oracle; these assert what must hold on ANY data).
  */
class RuntimeAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("bloom filter admits every member (no false negatives)") {
    import spark.implicits._
    val build = (1L to 40L).map(i => i * 7).toDF("k")
    val bits = RuntimeFilters.bloomBits(build, "k", m = 128, k = 3)
    val probe = (1L to 400L).toDF("k")
    val passed = RuntimeFilters.bloomProbe(probe, "k", bits, m = 128, k = 3)
      .as[Long].collect().toSet
    val members = (1L to 40L).map(_ * 7).filter(_ <= 400).toSet
    assert(members.subsetOf(passed), "a Bloom filter must never drop a member")
    // undersized filter ⇒ some false positives are expected, but the filter
    // must still prune: far fewer survivors than probes
    assert(passed.size < 400)
  }

  test("bloom_semi_join keeps all true members and only bloom-passing keys") {
    val rows = run("bloom_semi_join").collect()
    val members = rows.filter(_.getLong(1) == 1L)
    assert(members.nonEmpty)
    // every surviving row carries the probe-side aggregate intact
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("hll estimate lands within 25% of the exact distinct count") {
    // sf0.01: the per-group cardinality (~1300) sits well outside the HLL
    // small-range regime (2.5m = 160), where the raw estimator is unbiased
    val rows = graft.SparkEntry.queries("hll_distinct")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val est = r.getDouble(3)
      assert(exact > 160, s"fixture must be outside HLL small-range, got $exact")
      assert(math.abs(est - exact) / exact < 0.25,
        s"${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("zorder16 matches the bit-twiddling reference interleave") {
    import spark.implicits._
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((x & 65535) >> i & 1) << (2 * i)
        z |= ((y & 65535) >> i & 1) << (2 * i + 1)
      }
      z
    }
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (1499L, 11535L), (12345L, 54321L), (70000L, 3L))
    val got = samples.toDF("x", "y")
      .select(graft.functions.zorder16(col("x"), col("y")))
      .as[Long].collect()
    assert(got.toSeq == samples.map { case (x, y) => ref(x, y) })
  }

  test("z-sorted files bound both dimensions (the data-skipping law)") {
    val rows = run("zorder_layout").collect()
    assert(rows.length > 1)
    // every file's rectangle must be strictly smaller than the full domain
    // on the interleave-dominant dimension (whichever coordinate reaches the
    // bits above the file shift — at tiny SF custkey has too few bits, so
    // only the day axis is partitioned; at sf0.1 both are)
    val custSpan = rows.map(r => r.getLong(3) - r.getLong(2)).max
    val fullCust = rows.map(_.getLong(3)).max - rows.map(_.getLong(2)).min
    val daySpan = rows.map(r => r.getLong(5) - r.getLong(4)).max
    val fullDay = rows.map(_.getLong(5)).max - rows.map(_.getLong(4)).min
    assert(custSpan < fullCust || daySpan < fullDay,
      "files must partition at least the dominant coordinate's range")
  }

  test("bounded top-k aggregate equals the brute-force window top-k") {
    val got = run("events_topk_users").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val counts = graft.sources.EventsFixture.load(spark, dir)
      .groupBy("event_type", "user_id").count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = counts.groupBy(_._1).toSeq.flatMap { case (typ, rs) =>
      rs.sortBy(t => (-t._3, t._2)).take(5).zipWithIndex
        .map { case ((_, u, n), i) => (typ, (i + 1).toLong, u, n) }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == expect)
  }

  test("bloom probe plan: k broadcast LEFT SEMI joins, probe never widens") {
    val phys = run("bloom_semi_join").queryExecution.executedPlan.toString
    val semis = "BroadcastHashJoin .*LeftSemi".r.findAllIn(phys).size
    assert(semis == 2, s"expected 2 broadcast semi-joins, plan:\n$phys")
    // the bit set is broadcast — no shuffle of the probe side for the filter
    assert(!phys.contains("SortMergeJoin"))
  }

  test("topk plan: partial ObjectHashAggregate before the exchange") {
    val phys = run("events_topk_users").queryExecution.executedPlan.toString
    assert(phys.contains("ObjectHashAggregate"))
    // map-side partial aggregation must sit below the group exchange
    val firstAgg = phys.indexOf("ObjectHashAggregate")
    assert(firstAgg >= 0 && phys.indexOf("ObjectHashAggregate", firstAgg + 1) > 0,
      "expected partial+final aggregate pair")
  }

  test("hist_quantiles plan: partial+final histogram agg, no sort of raw rows") {
    val plan = run("hist_quantiles").queryExecution.executedPlan.toString
    // the (type, bin) histogram must be a partial+final HashAggregate pair
    val firstAgg = plan.indexOf("HashAggregate")
    assert(firstAgg >= 0 && plan.indexOf("HashAggregate", firstAgg + 1) > 0,
      s"expected partial+final aggregate pair, plan:\n$plan")
    // exact-quantile paths sort every raw row; the sketch must not — the
    // only sorts allowed are over the <=512-bins-per-group frames (window
    // + final ORDER BY), which sit ABOVE the histogram aggregate. The plan
    // string prints downstream operators first, so "no sort of raw rows"
    // means no Sort printed BELOW (= at a later index than) the deepest
    // (last-printed) HashAggregate.
    val histAgg = plan.lastIndexOf("HashAggregate")
    val sortBelow = plan.lastIndexOf("Sort ")
    assert(sortBelow < histAgg,
      s"a Sort sits below the histogram aggregate, plan:\n$plan")
  }

  test("semantic dedup assignment plan has no shuffle on the corpus side") {
    import spark.implicits._
    val df = Seq.tabulate(60)(i =>
      (i.toLong, Array.fill(8)((i % 7).toFloat + 1f))).toDF("vec_id", "embedding")
    val v = df.select(col("vec_id").cast("long").as("id"),
      transform(col("embedding"), x => x.cast("double")).as("vec"))
    val cents = Similarity.deterministicCentroids(v, "id", "vec", 4, "sem")
    val assigned = v.withColumn("nrm",
        sqrt(graft.functions.VectorExpressions.sqNormNative(col("vec"))))
      .withColumn("cluster_id", element_at(
        Similarity.nearestCentroids(col("vec"), col("nrm"), cents), 1)
        .getField("list_id"))
    val plan = assigned.queryExecution.executedPlan.toString
    // literal-centroid argmax = pure per-row projection: no Exchange,
    // Window, or join may appear below the assignment
    Seq("Exchange", "Window", "Join").foreach(op =>
      assert(!plan.contains(op), s"$op in assignment plan:\n$plan"))
  }

  test("TopKAgg merge respects the bound and the total order") {
    val agg = new TopKAgg(3)
    val a = Seq(Ranked(9, 2), Ranked(7, 1), Ranked(5, 5))
    val b = Seq(Ranked(9, 1), Ranked(8, 4), Ranked(1, 0))
    val merged = agg.merge(a, b)
    assert(merged == Seq(Ranked(9, 1), Ranked(9, 2), Ranked(8, 4)))
  }

  test("dataset_split partitions every document exactly once, ~90/5/5") {
    val rows = run("dataset_split").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = rows.values.sum
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(total == nDocs, "split must cover each doc exactly once")
    assert(rows("train").toDouble / total > 0.8)
    assert(rows.keySet == Set("train", "validation", "test"))
  }

  test("length buckets cover the corpus with non-overlapping token ranges") {
    val rows = run("text_length_buckets").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_._2).sum == nDocs)
    // q1.max <= q2.min ... (cutpoints are quantiles, so ranges cannot overlap)
    rows.sliding(2).foreach { w => assert(w(0)._4 <= w(1)._3) }
  }

  test("gap-filled series is dense: every (type, day) cell exists") {
    val rows = run("events_gapfill").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val types = rows.map(_._1).distinct
    val days = rows.map(_._2)
    val span = days.max - days.min + 1
    assert(rows.length == types.length * span, "grid must be complete")
    // zero-filling must not change the total
    val total = rows.map(_._3).sum
    val raw = spark.read.parquet(s"$dir/events.parquet").count()
    assert(total == raw)
  }
}
