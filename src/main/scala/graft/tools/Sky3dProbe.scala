package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage decomposition of `sky_1m_3d_anti` (the heaviest frozen-set entry,
  * 5.1 s min-of-pair r12): generation vs the pid-keyed local-skyline
  * phase vs the broadcast cross-filter merge, plus the sizes that decide
  * where parallelism is lost (the 8-key mapGroups merge runs at most 8
  * tasks wide). */
object Sky3dProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.SkylineOps
    import graft.sources.Generators

    def time(label: String)(f: => Long): Unit =
      for (lap <- 1 to 3) {
        System.gc()
        val t0 = System.nanoTime()
        val n = f
        println(f"$label lap$lap: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      }

    time("gen_only") {
      Generators.generate(spark, "anti-correlated", 1000000L, 3).count()
    }
    time("local_skylines") {
      SkylineOps.localSkylines(
        Generators.generate(spark, "anti-correlated", 1000000L, 3),
        "mr-angle", 10000.0, 8).count()
    }
    time("local_union_size") {
      import org.apache.spark.sql.functions._
      SkylineOps.localSkylines(
        Generators.generate(spark, "anti-correlated", 1000000L, 3),
        "mr-angle", 10000.0, 8)
        .toDF("pid", "pts").select(explode(col("pts"))).count()
    }
    time("full") {
      SkylineOps.skylineViaStrategy(
        Generators.generate(spark, "anti-correlated", 1000000L, 3),
        "mr-angle", 10000.0, 8).count()
    }
    // manual decomposition of the merge: collect the local-skyline union
    // to the driver once, then time kd build and the broadcast filter
    // separately from the Spark plumbing around them
    // replicate skylineBroadcastFilter's body with per-step walls on the
    // exact composed input skylineViaStrategy feeds it
    for (lap <- 1 to 3) {
      val ds = SkylineOps.localSkylines(
          Generators.generate(spark, "anti-correlated", 1000000L, 3),
          "mr-angle", 10000.0, 8)
        .flatMap(_._2)(org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[graft.core.Point]())
      val t0 = System.nanoTime()
      val localRdd = ds.rdd.mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else Iterator.single(graft.core.SkylineBuffer.of(it).result.toArray)
      }.cache()
      val unionCount = localRdd.map(_.length.toLong).fold(0L)(_ + _)
      val t1 = System.nanoTime()
      val u = localRdd.collect().iterator.flatten.toArray
      val t2 = System.nanoTime()
      localRdd.unpersist(false)
      println(f"steps lap$lap: reduce+count ${(t1 - t0) / 1e9}%.2f s, " +
        f"collect ${(t2 - t1) / 1e9}%.2f s (union=$unionCount)")
    }
    locally {
      import spark.implicits._
      val union = SkylineOps.localSkylines(
          Generators.generate(spark, "anti-correlated", 1000000L, 3),
          "mr-angle", 10000.0, 8)
        .flatMap(_._2)(org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[graft.core.Point]())
        .collect()
      println(s"union collected: ${union.length}")
      for (lap <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = graft.core.SkylineBuffer.of(union.iterator).result.length
        println(f"driver_bnl_of_union lap$lap: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      }
      for (lap <- 1 to 3) {
        val t0 = System.nanoTime()
        val packed = graft.operators.KdProbeBridge.build(union)
        val t1 = System.nanoTime()
        val bp = spark.sparkContext.broadcast(packed)
        val survivors = spark.sparkContext
          .parallelize(union.toIndexedSeq, 32)
          .mapPartitions { it =>
            val pk = bp.value
            it.filter(p => !graft.operators.KdProbeBridge.dominated(pk, p))
          }.count()
        val t2 = System.nanoTime()
        println(f"kd_build lap$lap: ${(t1 - t0) / 1e9}%.2f s; " +
          f"filter: ${(t2 - t1) / 1e9}%.2f s (survivors=$survivors)")
        bp.destroy()
      }
    }
    spark.stop()
  }
}
