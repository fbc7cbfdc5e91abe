package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Dominance
import graft.operators.SparkTestSession

/** The chained two-stage transformWithState topology: local skyline +
  * barrier, then distributed global merge with countdown latch — the whole
  * reference dataflow in ONE streaming query (no driver-side aggregator). */
class SkylineTWSSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val N = 4

  private def mkLines(pts: Seq[(Long, Double, Double)]): Seq[String] =
    pts.map { case (id, a, b) => s"$id,$a,$b" }

  private def bruteSize(pts: Seq[(Long, Double, Double)]): Int = {
    val vs = pts.map { case (_, a, b) => Array(a, b) }
    vs.count(t => !vs.exists(u => Dominance.dominates(u, t)))
  }

  test("chained transformWithState: global skyline emitted once latch fills") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("tws_ckpt").toString
    val dataIn = MemoryStream[String]
    val trigIn = MemoryStream[String]
    val n = N
    val pidOf = graft.operators.SkylineOps.pidFunction("mr-dim", 100.0, n)
    val env = dataIn.toDS().flatMap(l => SkylineStream.parseData(l, pidOf))
      .unionAll(trigIn.toDS().flatMap(p =>
        SkylineStream.broadcastTrigger(p, n, 1L)))
    val out = SkylineStreamTWS.topology(env, n)
    val q = out.writeStream.format("memory").queryName("tws_out")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    try {
      val rng = new scala.util.Random(23)
      val pts = Seq.tabulate(300)(i =>
        (i.toLong, rng.nextInt(100).toDouble, rng.nextInt(100).toDouble))
      // batch 1: data only — nothing may be emitted yet
      dataIn.addData(mkLines(pts))
      q.processAllAvailable()
      assert(spark.table("tws_out").count() == 0)
      // batch 2: trigger with satisfied barrier → every partition answers,
      // the global stage's latch fills, ONE result row appears
      trigIn.addData("7,250")
      q.processAllAvailable()
      val rows = spark.table("tws_out").collect()
      assert(rows.length == 1)
      val r = rows.head
      assert(r.getAs[String]("queryId") == "7")
      assert(r.getAs[String]("recordCount") == "250")
      assert(r.getAs[Int]("skylineSize") == bruteSize(pts))
      val opt = r.getAs[Double]("optimality")
      assert(opt >= 0.0 && opt <= 1.0)
      // a second query through the same (cleared) per-query state
      trigIn.addData("8,250")
      q.processAllAvailable()
      assert(spark.table("tws_out").count() == 2)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("multi-query cadence: staged triggers and a parked barrier, each vs brute force") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("tws_multi").toString
    val dataIn = MemoryStream[String]
    val trigIn = MemoryStream[String]
    val n = N
    // mr-dim: partition = floor(v1 / (100/n)) - v1 placement controls routing
    val pidOf = graft.operators.SkylineOps.pidFunction("mr-dim", 100.0, n)
    val env = dataIn.toDS().flatMap(l => SkylineStream.parseData(l, pidOf))
      .unionAll(trigIn.toDS().flatMap(p =>
        SkylineStream.broadcastTrigger(p, n, 1L)))
    val out = SkylineStreamTWS.topology(env, n)
    val q = out.writeStream.format("memory").queryName("tws_multi")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    try {
      val rng = new scala.util.Random(31)
      val ranges = Seq.tabulate(3)(r => Seq.tabulate(200)(i =>
        ((r * 200 + i).toLong, rng.nextInt(100).toDouble, rng.nextInt(100).toDouble)))
      def sizeOf(name: String): Map[String, Int] =
        spark.table(name).collect()
          .map(r => r.getAs[String]("queryId") -> r.getAs[Int]("skylineSize")).toMap
      // the reference's G4 cadence: a trigger after every completed range,
      // each in its OWN micro-batch so the expected state is exactly the
      // union of the ranges sent so far
      for (k <- 1 to 3) {
        dataIn.addData(mkLines(ranges(k - 1)))
        q.processAllAvailable()
        trigIn.addData(s"$k,0")
        q.processAllAvailable()
        val sizes = sizeOf("tws_multi")
        assert(sizes.keySet == (1 to k).map(_.toString).toSet)
        assert(sizes(k.toString) == bruteSize(ranges.take(k).flatten), s"query $k")
      }
      // parked query: barrier 696 is beyond every partition's maxSeenId
      trigIn.addData("9,696")
      q.processAllAvailable()
      assert(!sizeOf("tws_multi").contains("9"))
      // release: one id >= 696 routed into EACH mr-dim band (v1 picks the
      // partition), so every partition's barrier clears and the latch fills
      val release = (0 until n).map(p =>
        ((696 + p).toLong, p * (100.0 / n) + 1.0, rng.nextInt(100).toDouble))
      dataIn.addData(mkLines(release))
      q.processAllAvailable()
      val sizes = sizeOf("tws_multi")
      assert(sizes.contains("9"), s"parked query should have fired: $sizes")
      assert(sizes("9") == bruteSize(ranges.flatten ++ release))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("duplicate trigger payload and empty-partition-first arrivals stay correct") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("tws_dup").toString
    val dataIn = MemoryStream[String]
    val trigIn = MemoryStream[String]
    val n = N
    val pidOf = graft.operators.SkylineOps.pidFunction("mr-dim", 100.0, n)
    val env = dataIn.toDS().flatMap(l => SkylineStream.parseData(l, pidOf))
      .unionAll(trigIn.toDS().flatMap(p =>
        SkylineStream.broadcastTrigger(p, n, 1L)))
    val out = SkylineStreamTWS.topology(env, n)
    val q = out.writeStream.format("memory").queryName("tws_dup")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    try {
      // data confined to mr-dim band 0 (v1 < 25): partitions 1..3 stay
      // empty. A barrier-100 trigger makes the EMPTY partitions answer
      // immediately (maxId == -1 rule) while partition 0 parks - the global
      // latch then holds only empty skylines across batches (the
      // ListState-empty-put crash scenario).
      val pts = Seq.tabulate(60)(i =>
        (i.toLong, (i % 25).toDouble, (i % 97).toDouble))
      dataIn.addData(mkLines(pts))
      q.processAllAvailable()
      trigIn.addData("5,100")
      q.processAllAvailable()
      assert(spark.table("tws_dup").count() == 0) // parked, no crash
      // duplicate payload: the same trigger again - the distinct-pid latch
      // must not double-count the empty partitions' second answers
      trigIn.addData("5,100")
      q.processAllAvailable()
      assert(spark.table("tws_dup").count() == 0)
      // release the barrier in partition 0; exactly ONE result appears and
      // its skyline matches brute force (no duplicated points)
      dataIn.addData(mkLines(Seq((100L, 10.0, 1.0))))
      q.processAllAvailable()
      val rows = spark.table("tws_dup").collect()
      assert(rows.length == 1, s"got ${rows.length}")
      val all = pts :+ ((100L, 10.0, 1.0))
      assert(rows.head.getAs[Int]("skylineSize") == bruteSize(all))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
