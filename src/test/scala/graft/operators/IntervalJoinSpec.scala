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
}
