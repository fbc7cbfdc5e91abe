package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** The fixture scan-widen contract: [[Fixtures.tableWide]] changes ONLY
  * the physical split count — never the rows — and degenerates to the
  * bare scan the moment the input is already core-wide (the guard that
  * keeps the widen fixture-scale-only: at production split counts no
  * shuffle is ever added). */
class FixturesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("tableWide returns exactly the bare scan's rows") {
    val bare = Fixtures.table(spark, dir, "documents")
      .collect().map(_.toSeq).sortBy(_.toString)
    val wide = Fixtures.tableWide(spark, dir, "documents")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(bare.length == wide.length && bare.sameElements(wide))
  }

  test("tableWide widens a single-split scan to core count") {
    val cores = spark.sparkContext.defaultParallelism
    // environment premise, not the contract: on a low-core host the
    // fixture may already be >= core-wide — skip rather than fail there
    assume(Fixtures.table(spark, dir, "documents")
      .rdd.getNumPartitions < cores, "fixture narrower than core count")
    assert(Fixtures.tableWide(spark, dir, "documents")
      .rdd.getNumPartitions == cores)
  }

  test("widen is a no-op on an already-core-wide frame") {
    val cores = spark.sparkContext.defaultParallelism
    val alreadyWide = Fixtures.table(spark, dir, "documents")
      .repartition(cores + 3)
    val out = Fixtures.widen(spark, alreadyWide, "doc_id")
    assert(out eq alreadyWide) // same object: no exchange appended
  }

  test("a table without a widen key reads bare through tableWide") {
    val bare = Fixtures.table(spark, dir, "region")
    val wide = Fixtures.tableWide(spark, dir, "region")
    assert(wide.rdd.getNumPartitions == bare.rdd.getNumPartitions)
  }
}
