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
    // reference local-optimality figures (BASELINE.md): 2D@1M MR-Dim .7379,
    // MR-Grid .5415, MR-Angle .7453; 3D@1M .6742/.5906/.6652
    for (dims <- Seq(2, 3); strat <- Seq("mr-dim", "mr-grid", "mr-angle")) {
      val pts = Generators.generate(spark, "anti-correlated", 1000000L, dims)
      val t0 = System.nanoTime()
      val row = SkylineOps.skylineWithMetrics(pts, strat, 10000.0, 8, "q", 1000000L)
        .collect().head
      println(f"PROBE opt dims=$dims strat=$strat " +
        f"opt=${row.getAs[Double]("optimality")}%.4f sky=${row.getAs[Long]("skyline_size")} " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
