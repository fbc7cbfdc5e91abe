package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Dynamic partition pruning plan guard: a join from a disk-partitioned fact
  * to a runtime-filtered dim must plan a dynamicpruning subquery on the
  * fact scan's PartitionFilters — whole directories skipped before I/O, the
  * central scan-elision mechanism for partitioned 100 TB tables. A config or
  * layout change that silently disables DPP keeps values green (the join
  * still filters) while the scan cost reverts to the full table; this spec
  * is what fails in that world. */
class DppSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("partition-key join plans a dynamicpruning subquery and values match") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("dppspec").toString
    try {
      Seq.tabulate(400)(i => (i.toLong, (i % 7).toLong, s"p${i % 8}"))
        .toDF("id", "v", "pk")
        .write.mode("overwrite").partitionBy("pk").parquet(tmp)
      val fact = spark.read.parquet(tmp)
      // runtime-only predicate: survivors decided by a hash of the value,
      // invisible to static partition pruning. The dim must be a real
      // (file-backed) source — a LocalRelation constant-folds the filter
      // away and leaves DPP no selective predicate to harvest.
      Seq.tabulate(8)(i => s"p$i").toDF("pk")
        .write.mode("overwrite").parquet(s"$tmp-dim")
      val dim = spark.read.parquet(s"$tmp-dim")
        .where(pmod(graft.functions.hash60(concat(lit("dpp#"), col("pk"))),
          lit(4L)) < 2)
      val joined = fact.join(dim, Seq("pk"))
        .groupBy("pk").agg(sum("v").as("sv"))
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.toLowerCase.contains("dynamicpruning"),
        s"no DPP subquery in plan:\n$planStr")

      val keptPks = dim.as[String].collect().toSet
      assert(keptPks.nonEmpty && keptPks.size < 8) // predicate is selective
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exp = Seq.tabulate(400)(i => (s"p${i % 8}", (i % 7).toLong))
        .filter(t => keptPks(t._1))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      assert(got === exp)
    } finally { IoUtilTest.delete(tmp); IoUtilTest.delete(s"$tmp-dim") }
  }
}

/** Minimal recursive delete for spec temp dirs. */
private[operators] object IoUtilTest {
  def delete(path: String): Unit = graft.IoUtil.deleteRecursively(path)
}
