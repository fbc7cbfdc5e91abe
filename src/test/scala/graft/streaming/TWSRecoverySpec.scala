package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** Fault tolerance of the CHAINED transformWithState topology: both stages'
  * RocksDB state (local skyline + barrier, global merge + latch) must
  * survive a restart from the checkpoint, and a query parked before the
  * stop must complete after it. */
class TWSRecoverySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("chained TWS query completes a parked query after restart") {
    import spark.implicits._
    val n = 2
    val dataDir = Files.createTempDirectory("tws-data").toString
    val trigDir = Files.createTempDirectory("tws-trig").toString
    val ckpt = Files.createTempDirectory("tws-state").toString
    val outDir = Files.createTempDirectory("tws-out").toString
    val pidOf = graft.operators.SkylineOps.pidFunction("mr-dim", 100.0, n)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    def startQuery() = {
      val env = Sources.fileLines(spark, dataDir)
        .flatMap(l => SkylineStream.parseData(l, pidOf))
        .unionAll(Sources.fileLines(spark, trigDir)
          .flatMap(p => SkylineStream.broadcastTrigger(p, n, 1L)))
      SkylineStreamTWS.topology(env, n)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
    }

    try {
      // run 1: data in both slices, trigger needing id >= 5 parks locally
      Files.writeString(java.nio.file.Paths.get(dataDir, "d1.csv"),
        "0,10.0,10.0\n1,80.0,80.0\n")
      val q1 = startQuery()
      q1.processAllAvailable()
      Files.writeString(java.nio.file.Paths.get(trigDir, "t1.txt"), "7,5\n")
      q1.processAllAvailable()
      assert(spark.read.parquet(outDir).count() == 0)   // parked in stage 1
      q1.stop()

      // run 2 (fresh query, same checkpoint): barrier-crossing data releases
      // the parked trigger; stage 2's latch fills across both partitions
      val q2 = startQuery()
      Files.writeString(java.nio.file.Paths.get(dataDir, "d2.csv"),
        "5,5.0,5.0\n6,90.0,20.0\n")
      q2.processAllAvailable()
      val out = spark.read.parquet(outDir).collect()
      q2.stop()
      assert(out.length == 1)
      val r = out.head
      assert(r.getAs[String]("queryId") == "7")
      // recovered state interacts with run-2 data: (5,5) dominates run-1's
      // (10,10) locally and everything else at the global merge
      assert(r.getAs[Int]("skylineSize") == 1)
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
