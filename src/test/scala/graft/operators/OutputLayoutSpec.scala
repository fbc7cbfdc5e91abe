package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Sharded training-data export: hive partition dirs, capped files,
  * deterministic layout, lossless round-trip. */
class OutputLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("writeSharded partitions by key, caps files, round-trips losslessly") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("layout").toString
    OutputLayout.writeSharded(docs, out, "doc_id", Seq("lang"),
      nShards = 2, maxRecordsPerFile = 50)

    // hive partition dirs exist per lang
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    val langs = docs.select("lang").distinct().as[String].collect().sorted
    assert(dirs.toSeq == langs.map(l => s"lang=$l").toSeq)

    // every parquet file respects the record cap
    val files = dirs.flatMap(d => new java.io.File(s"$out/$d").listFiles()
      .filter(_.getName.endsWith(".parquet")))
    assert(files.nonEmpty)
    files.foreach { f =>
      val n = spark.read.parquet(f.getAbsolutePath).count()
      assert(n <= 50, s"${f.getName} has $n rows")
    }

    // lossless round-trip (partition col comes back from the dir key)
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    val a = docs.select("doc_id", "lang", "n_chars").as[(Long, String, Long)]
      .collect().toSet
    val b = back.select("doc_id", "lang", "n_chars").as[(Long, String, Long)]
      .collect().toSet
    assert(a == b)

    // deterministic: a second write yields the same per-partition file counts
    val out2 = java.nio.file.Files.createTempDirectory("layout2").toString
    OutputLayout.writeSharded(docs, out2, "doc_id", Seq("lang"),
      nShards = 2, maxRecordsPerFile = 50)
    def layoutOf(root: String) =
      new java.io.File(root).listFiles().filter(_.isDirectory)
        .filter(_.getName.startsWith("lang=")).map { d =>
          d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))
        }.toMap
    assert(layoutOf(out) == layoutOf(out2))
  }

  test("co-bucketed tables join and aggregate without an Exchange") {
    import spark.implicits._
    val left = (0L until 5000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (0L until 5000L).map(i => (i, i * 2.0)).toDF("k", "rv")
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")
    OutputLayout.saveBucketed(left, "b_left", "k", 8)
    OutputLayout.saveBucketed(right, "b_right", "k", 8)
    // disable auto-broadcast so the planner exercises the co-located bucket
    // join (at real scale neither side is broadcastable - that is the point)
    val priorBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // bucket pruning info is only used when AQE doesn't coalesce it away
      val joined = spark.table("b_left").join(spark.table("b_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"join should be shuffle-free:\n$plan")
      assert(joined.count() == 5000)
      val agg = spark.table("b_left").groupBy("k").count()
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"bucketed groupBy should be shuffle-free:\n$aggPlan")
      assert(agg.count() == 5000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }
}
