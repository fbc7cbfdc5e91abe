package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Top-level so Spark can derive its encoder (inner classes can't be
  * instantiated without the enclosing test's scope). */
case class AsOfRight(k: Long, t: Long, pid: Long, v: java.lang.Double)

/** As-of join vs an in-memory brute force, over inputs the oracle fixture
  * does not cover: NULL payload values (whole-row carry must not tear rows)
  * and duplicate (key, time) right rows (deterministic tiebreak). */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private type R = AsOfRight
  private def R(k: Long, t: Long, pid: Long, v: java.lang.Double) = AsOfRight(k, t, pid, v)

  test("backward as-of carries whole rows atomically and breaks ties deterministically") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    // right side: duplicate (k, t) pairs on purpose, ~20% NULL values
    val right = Seq.tabulate(300) { i =>
      R(rng.nextInt(5).toLong, rng.nextInt(40).toLong, i.toLong,
        if (rng.nextInt(5) == 0) null else java.lang.Double.valueOf(i * 1.0))
    }
    val left = Seq.tabulate(200)(i =>
      (rng.nextInt(5).toLong, rng.nextInt(45).toLong, i.toLong))

    val rightDf = right.toDF("k", "t", "pid", "v")
    val leftDf = left.toDF("k", "t", "lid")
    val got = AsOfJoin.backward(leftDf, rightDf, Seq("k"), "t", "t",
        Seq("pid", "v"))
      .select($"lid", $"pid_asof", $"v_asof")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1)),
        if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2))))
      .toSet

    // brute force: most recent right at-or-before; ties (equal k,t) pick the
    // row whose FIRST payload column (pid) is smallest — whole row wins
    val expect = left.map { case (k, lt, lid) =>
      val cands = right.filter(r => r.k == k && r.t <= lt)
      if (cands.isEmpty) (lid, null, null)
      else {
        val maxT = cands.map(_.t).max
        val win = cands.filter(_.t == maxT).minBy(_.pid)
        (lid, java.lang.Long.valueOf(win.pid), win.v)
      }
    }.toSet
    assert(got == expect)
  }

  test("forward as-of: earliest at-or-after, atomic rows, smallest-id ties") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val right = Seq.tabulate(300) { i =>
      R(rng.nextInt(5).toLong, rng.nextInt(40).toLong, i.toLong,
        if (rng.nextInt(5) == 0) null else java.lang.Double.valueOf(i * 1.0))
    }
    val left = Seq.tabulate(200)(i =>
      (rng.nextInt(5).toLong, rng.nextInt(45).toLong, i.toLong))
    val got = AsOfJoin.forward(left.toDF("k", "t", "lid"),
        right.toDF("k", "t", "pid", "v"), Seq("k"), "t", "t", Seq("pid", "v"))
      .select($"lid", $"pid_asof", $"v_asof")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1)),
        if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2))))
      .toSet
    val expect = left.map { case (k, lt, lid) =>
      val cands = right.filter(r => r.k == k && r.t >= lt)
      if (cands.isEmpty) (lid, null, null)
      else {
        val minT = cands.map(_.t).min
        val win = cands.filter(_.t == minT).minBy(_.pid)
        (lid, java.lang.Long.valueOf(win.pid), win.v)
      }
    }.toSet
    assert(got == expect)
  }
}
