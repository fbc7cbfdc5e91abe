package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Bucketed interval join vs brute force: boundary |dt| == delta pairs must
  * be kept (inclusive), bucket-edge times must not be missed or duplicated —
  * each qualifying pair is emitted exactly once (unique hitting probe). */
class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("equals brute force incl. bucket boundaries; no duplicate pairs") {
    import spark.implicits._
    val delta = 100L
    val rng = new scala.util.Random(29)
    // times deliberately include exact bucket multiples and boundary gaps
    val lefts = Seq.tabulate(200)(i =>
      (rng.nextInt(4).toLong, (rng.nextInt(12) * 100L + rng.nextInt(3) - 1).max(0), i.toLong))
    val rights = Seq.tabulate(200)(i =>
      (rng.nextInt(4).toLong, (rng.nextInt(12) * 100L + rng.nextInt(3) - 1).max(0), i.toLong))

    val got = IntervalJoin.join(
        lefts.toDF("k", "t", "lid"), rights.toDF("k", "t", "rid"),
        keyCols = Seq("k"), leftTime = "t", rightTime = "t", delta = delta,
        payload = Seq("rid"))
      .select($"lid", $"rid_r").as[(Long, Long)].collect()

    val expect = (for {
      (lk, lt, lid) <- lefts
      (rk, rt, rid) <- rights
      if lk == rk && math.abs(lt - rt) <= delta
    } yield (lid, rid)).toSet

    assert(got.length == got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet == expect)
  }

  test("negative times straddling zero pair up (floor-division bucketing)") {
    import spark.implicits._
    val delta = 100L
    // every |dt| <= 100 pair here crosses or touches 0; truncate-toward-zero
    // bucketing would put e.g. -1 and +1 two buckets apart and drop the pair
    val lefts = Seq((-150L, 1L), (-100L, 2L), (-1L, 3L), (0L, 4L), (99L, 5L))
      .map { case (t, id) => (0L, t, id) }
    val rights = Seq((-199L, 10L), (-50L, 11L), (1L, 12L), (50L, 13L), (100L, 14L))
      .map { case (t, id) => (0L, t, id) }

    val got = IntervalJoin.join(
        lefts.toDF("k", "t", "lid"), rights.toDF("k", "t", "rid"),
        keyCols = Seq("k"), leftTime = "t", rightTime = "t", delta = delta,
        payload = Seq("rid"))
      .select($"lid", $"rid_r").as[(Long, Long)].collect()

    val expect = (for {
      (_, lt, lid) <- lefts
      (_, rt, rid) <- rights
      if math.abs(lt - rt) <= delta
    } yield (lid, rid)).toSet

    assert(got.length == got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet == expect)
  }
}
