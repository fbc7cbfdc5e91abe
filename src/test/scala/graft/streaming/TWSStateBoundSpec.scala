package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Dominance
import graft.operators.SparkTestSession

/** The TWS local stage's capped, append-only antichain state under a
  * PATHOLOGICAL 4-D anti-correlated stream (SURVEY §7.4's growth case: the
  * points sit on a constant-sum simplex, so the true skyline is nearly the
  * whole input and the local antichains never shrink). With `compactLimit`
  * forced far below the batch size, every batch crosses the spill threshold
  * — exercising append-only batches, mid-stream BNL re-compactions, and
  * fire-time compactions — and the emitted global skyline must still equal
  * brute force exactly (BNL confluence: deferred compaction is invisible). */
class TWSStateBoundSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val N = 4

  /** 4-D anti-correlated fixture: values normalized to sum ≈ 100 (mutually
    * non-dominated), plus every 5th point scaled up 1.5× (dominated). */
  private def antiPoints(from: Int, count: Int, seed: Int): Seq[(Long, Array[Double])] = {
    val rng = new scala.util.Random(seed)
    Seq.tabulate(count) { i =>
      val raw = Array.fill(4)(rng.nextDouble() + 0.05)
      val s = raw.sum
      val vs = raw.map(v => v / s * 100.0)
      val scaled = if (i % 5 == 0) vs.map(_ * 1.5) else vs
      ((from + i).toLong, scaled)
    }
  }

  private def mkLines(pts: Seq[(Long, Array[Double])]): Seq[String] =
    pts.map { case (id, vs) => s"$id,${vs.mkString(",")}" }

  private def bruteIds(pts: Seq[(Long, Array[Double])]): Set[Long] =
    pts.collect { case (id, vs)
      if !pts.exists(u => Dominance.dominates(u._2, vs)) => id }.toSet

  test("4-D anti-correlated stream with tiny compactLimit matches brute force") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("tws_bound").toString
    val dataIn = MemoryStream[String]
    val trigIn = MemoryStream[String]
    val n = N // local copy: closing over the field would capture the suite
    val pidOf = graft.operators.SkylineOps.pidFunction("mr-dim", 100.0, n)
    val env = dataIn.toDS().flatMap(l => SkylineStream.parseData(l, pidOf))
      .unionAll(trigIn.toDS().flatMap(p =>
        SkylineStream.broadcastTrigger(p, n, 1L)))
    // compactLimit 64 ≪ the 150-point batches: every data batch spills
    val out = SkylineStreamTWS.topologyPoints(env, n, compactLimit = 64)
    val q = out.writeStream.format("memory").queryName("tws_bound")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    try {
      val b1 = antiPoints(0, 150, seed = 41)
      val b2 = antiPoints(150, 150, seed = 42)
      val b3 = antiPoints(300, 150, seed = 43)
      // three data-only batches: appends + threshold compactions, no output
      Seq(b1, b2, b3).foreach { b =>
        dataIn.addData(mkLines(b)); q.processAllAvailable()
      }
      assert(spark.table("tws_bound").count() == 0)
      // fire: every partition compacts its capped state and answers
      trigIn.addData("1,0")
      q.processAllAvailable()
      val rows1 = spark.table("tws_bound").collect().map(_.getAs[Long]("id"))
      val got = rows1.toSet
      assert(rows1.length == got.size, "ids unique within one emission")
      val want = bruteIds(b1 ++ b2 ++ b3)
      assert(want.size > 300, s"fixture must be pathological, got ${want.size}")
      assert(got == want)
      // second query after MORE data through already-compacted state: the
      // appended tail joins the retained antichain seamlessly
      val b4 = antiPoints(450, 150, seed = 44)
      dataIn.addData(mkLines(b4))
      q.processAllAvailable()
      trigIn.addData("2,0")
      q.processAllAvailable()
      // the append sink accumulates emission 1 ⊎ emission 2; ids are unique
      // within an emission, so emission 2 = ids seen twice plus new ids
      val cnt = spark.table("tws_bound").collect().map(_.getAs[Long]("id"))
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(cnt.values.forall(_ <= 2))
      val s2 = cnt.collect {
        case (id, c) if c == 2 || !got(id) => id }.toSet
      assert(s2 == bruteIds(b1 ++ b2 ++ b3 ++ b4))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
