package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.core.{Dominance, Point}

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

/** Distributed skyline operator: agrees with brute force, is invariant to
  * partitioning strategy and partition count (the cross-algorithm agreement
  * check the reference does visually — SURVEY §5.1), keeps duplicates. */
class SkylineOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def bruteForce(pts: Seq[Point]): Set[(Long, Seq[Double])] =
    pts.filter(t => !pts.exists(u => Dominance.dominates(u.values, t.values)))
      .map(p => (p.id, p.values.toSeq)).toSet

  private def asSet(pts: Seq[Point]): Set[(Long, Seq[Double])] =
    pts.map(p => (p.id, p.values.toSeq)).toSet

  private def mkPts(n: Int, dims: Int, seed: Int, card: Int = 1000): Seq[Point] = {
    val rng = new Random(seed)
    Seq.tabulate(n)(i => Point(i.toLong, Array.fill(dims)(rng.nextInt(card).toDouble)))
  }

  test("aggregator skyline equals brute force") {
    import spark.implicits._
    val pts = mkPts(2000, 2, seed = 1)
    val got = SkylineOps.skyline(pts.toDS()).collect().toSeq
    assert(asSet(got) == bruteForce(pts))
  }

  test("strategy and partition-count invariance") {
    import spark.implicits._
    val pts = mkPts(1500, 3, seed = 2, card = 100)
    val expect = bruteForce(pts)
    for (strategy <- Seq("mr-dim", "mr-grid", "mr-angle"); n <- Seq(1, 4, 8)) {
      val got = SkylineOps.skylineViaStrategy(pts.toDS(), strategy, 100.0, n)
        .collect().toSeq
      assert(asSet(got) == expect, s"strategy=$strategy n=$n")
    }
  }

  test("duplicates all survive through the distributed path") {
    import spark.implicits._
    val dups = Seq.tabulate(5)(i => Point(100L + i, Array(0.0, 0.0)))
    val pts = mkPts(500, 2, seed = 3, card = 900).map(p =>
      p.copy(values = p.values.map(_ + 1.0))) ++ dups
    val got = SkylineOps.skyline(pts.toDS()).collect().toSeq
    assert(got.count(_.values.toSeq == Seq(0.0, 0.0)) == 5)
  }

  test("partitioner ids stay in range and match driver-side function") {
    import spark.implicits._
    val pts = mkPts(800, 2, seed = 4)
    val df = pts.map(p => (p.id, p.values(0), p.values(1))).toDF("id", "v1", "v2")
    import org.apache.spark.sql.functions._
    for (strategy <- Seq("mr-dim", "mr-grid", "mr-angle")) {
      val pidCol = Partitioners.byName(strategy, array(col("v1"), col("v2")), 1000.0, 8)
      val got = df.select(col("id"), pidCol.as("pid")).as[(Long, Int)].collect().toMap
      val f = SkylineOps.pidFunction(strategy, 1000.0, 8)
      pts.foreach { p =>
        val expected = f(p.values)
        assert(got(p.id) == expected, s"$strategy id=${p.id}")
        assert(got(p.id) >= 0 && got(p.id) < 8)
      }
    }
  }

  test("sort-based 2D skyline equals BNL skyline incl duplicates") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    for (seed <- Seq(6, 7, 8)) {
      val pts = mkPts(3000, 2, seed, card = 50)   // small domain => duplicates
      val df = pts.map(p => (p.id, p.values(0), p.values(1))).toDF("id", "v1", "v2")
      val fast = SkylineOps.skyline2DDF(df, "id", "v1", "v2")
        .as[(Long, Double, Double)].collect().toSet
      val slow = SkylineOps.skyline(pts.toDS()).collect()
        .map(p => (p.id, p.values(0), p.values(1))).toSet
      assert(fast == slow, s"seed=$seed")
    }
  }

  test("scalable 2D sort path equals windowed 2D path") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    for (seed <- Seq(61, 62)) {
      val pts = mkPts(4000, 2, seed, card = 60)
      val df = pts.map(p => (p.id, p.values(0), p.values(1))).toDF("id", "v1", "v2")
      val a = SkylineOps.skyline2DDFWindowed(df, "id", "v1", "v2")
        .as[(Long, Double, Double)].collect().toSet
      val b = SkylineOps.skyline2DDFScalable(df, "id", "v1", "v2", numRanges = 7)
        .as[(Long, Double, Double)].collect().toSet
      assert(a == b, s"seed=$seed")
    }
    // high key cardinality + repeated invocation: the range sampler draws
    // different boundaries per run, so any dependence on a recomputed
    // partitioning (vs the one the offsets were computed from) shows up as
    // run-to-run flicker here
    val big = mkPts(60000, 2, seed = 63, card = 50000)
    val bigDf = big.map(p => (p.id, p.values(0), p.values(1))).toDF("id", "v1", "v2")
    val expect = SkylineOps.skyline2DDFWindowed(bigDf, "id", "v1", "v2")
      .as[(Long, Double, Double)].collect().toSet
    for (round <- 1 to 3) {
      val got = SkylineOps.skyline2DDFScalable(bigDf, "id", "v1", "v2", numRanges = 16)
        .as[(Long, Double, Double)].collect().toSet
      assert(got == expect, s"round=$round")
    }
  }

  test("grid-parallel skyline equals aggregator skyline across dims") {
    import spark.implicits._
    for ((dims, seed) <- Seq((2, 41), (3, 42), (4, 43))) {
      val pts = mkPts(3000, dims, seed, card = 40)
      val expect = asSet(SkylineOps.skyline(pts.toDS()).collect().toSeq)
      val got = asSet(SkylineOps.skylineGridParallel(pts.toDS(), dims).collect().toSeq)
      assert(got == expect, s"dims=$dims")
    }
    // duplicates preserved through the grid path
    val dups = Seq.tabulate(4)(i => graft.core.Point(500L + i, Array(0.0, 0.0))) ++
      mkPts(500, 2, 44, card = 40).map(p => p.copy(values = p.values.map(_ + 1.0)))
    val out = SkylineOps.skylineGridParallel(dups.toDS(), 2).collect()
    assert(out.count(_.values.toSeq == Seq(0.0, 0.0)) == 4)
  }

  test("broadcast-filter skyline equals aggregator skyline across dims") {
    import spark.implicits._
    for ((dims, seed) <- Seq((2, 51), (3, 52), (4, 53))) {
      val pts = mkPts(3000, dims, seed, card = 40)
      val expect = asSet(SkylineOps.skyline(pts.toDS()).collect().toSeq)
      val got = asSet(SkylineOps.skylineBroadcastFilter(
        pts.toDS().repartition(5)).collect().toSeq)
      assert(got == expect, s"dims=$dims")
    }
    // duplicates of a skyline point all survive (equal sums never dominate)
    val dups = Seq.tabulate(4)(i => graft.core.Point(500L + i, Array(0.0, 0.0))) ++
      mkPts(500, 2, 54, card = 40).map(p => p.copy(values = p.values.map(_ + 1.0)))
    val out = SkylineOps.skylineBroadcastFilter(dups.toDS().repartition(3)).collect()
    assert(out.count(_.values.toSeq == Seq(0.0, 0.0)) == 4)
    // oversized-union fallback path still exact
    val pts = mkPts(2000, 2, seed = 55, card = 1000)
    val viaFallback = asSet(SkylineOps.skylineBroadcastFilter(
      pts.toDS(), maxBroadcastPoints = 10).collect().toSeq)
    assert(viaFallback == bruteForce(pts))
  }

  test("metrics query emits reference JSON schema fields") {
    import spark.implicits._
    val pts = mkPts(1000, 2, seed = 5)
    val df = SkylineOps.skylineWithMetrics(pts.toDS(), "mr-angle", 1000.0, 8, "q1", 1000)
    val row = df.collect().head
    assert(df.columns.toSeq == Seq("query_id", "record_count", "skyline_size",
      "optimality", "ingestion_time_ms", "local_processing_time_ms",
      "global_processing_time_ms", "total_processing_time_ms"))
    val opt = row.getAs[Double]("optimality")
    assert(opt >= 0.0 && opt <= 1.0)
    assert(row.getAs[Long]("skyline_size") > 0)
  }

  test("grid-bounded dominator/dominated counts equal brute force") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // duplicates on purpose (card small); values deliberately exceed the
    // declared domain to exercise the clamped top/bottom cells
    for ((seed, domain, g) <- Seq((91, 100.0, 8), (92, 80.0, 5), (93, 100.0, 32))) {
      val rng = new scala.util.Random(seed)
      val rows = Seq.tabulate(1500)(i =>
        (i.toLong, rng.nextInt(120).toDouble - 5.0, rng.nextInt(120).toDouble - 5.0))
      val df = rows.toDF("id", "v1", "v2")
      val expDominators = rows.map { case (id, x, y) =>
        id -> rows.count { case (_, ux, uy) =>
          ux <= x && uy <= y && (ux < x || uy < y) }.toLong
      }.toMap
      val expDominated = rows.map { case (id, x, y) =>
        id -> rows.count { case (_, ux, uy) =>
          x <= ux && y <= uy && (x < ux || y < uy) }.toLong
      }.toMap
      val gotDominators = SkylineOps.dominatorCounts2D(df, "id", "v1", "v2", domain, g)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(gotDominators == expDominators, s"dominators seed=$seed g=$g")
      val gotDominated = SkylineOps.dominatedCounts2D(df, "id", "v1", "v2", domain, g)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotDominated == expDominated, s"dominated seed=$seed g=$g")
    }
  }

  test("grouped skyline equals per-group brute force incl in-group duplicates") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    // small value range forces duplicate points WITHIN groups (all must
    // survive together) and 3 groups of very different sizes
    val rows = Seq.tabulate(900)(i =>
      (s"g${i % 3}", i.toLong, rng.nextInt(12).toDouble, rng.nextInt(12).toDouble))
    val df = rows.toDF("grp", "id", "v1", "v2")
    val got = SkylineOps.skylineGroupedDF(df, Seq("grp"), "id", Seq("v1", "v2"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val exp = rows.filter { case (g, _, x, y) =>
      !rows.exists { case (ug, _, ux, uy) =>
        ug == g && ux <= x && uy <= y && (ux < x || uy < y) }
    }.map(t => (t._1, t._2)).toSet
    assert(got === exp)
    // and the grouped result restricted to one group equals the ungrouped
    // skyline of that group's rows (grouping = independent frontiers)
    val g0 = SkylineOps.skylineDF(df.where($"grp" === "g0"), "id", Seq("v1", "v2"))
      .collect().map(_.getLong(0)).toSet
    assert(got.collect { case ("g0", id) => id } === g0)
  }
}
