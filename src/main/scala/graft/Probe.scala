package graft

import org.apache.spark.sql.SparkSession
import graft.operators.SkylineOps
import graft.sources.Generators

// temporary perf probe (not part of the driver contract)
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    }
    SkylineOps.skyline(Generators.generate(spark, "uniform", 10000, 2)).count()
    time("4d_1m_bcast") {
      SkylineOps.skylineBroadcastFilter(
        Generators.generate(spark, "anti-correlated", 1000000L, 4)).count()
    }
    // force the oversized path end-to-end at real volume
    time("4d_1m_bcast_prefilter") {
      SkylineOps.skylineBroadcastFilter(
        Generators.generate(spark, "anti-correlated", 1000000L, 4),
        maxBroadcastPoints = 100000).count()
    }
    spark.stop()
  }
}
