package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-table co-located join: writing both sides bucketBy the join key
  * must remove EVERY Exchange (and per-query Sort) from the join plan while
  * leaving the result identical to the plain shuffled join. */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed equi-join plans with zero Exchange and zero Sort, same result") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_bkt_spec").toString
    // AQE wraps the plan in AdaptiveSparkPlanExec whose final physical tree
    // only exists after execution; disable it (scoped) so the assertion can
    // read the static plan
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val priorBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // without this the tiny dim side broadcasts and the no-Exchange
    // assertion passes vacuously (BroadcastHashJoin never shuffles anyway);
    // forcing the sort-merge path is what proves bucket co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // since Spark 3.0 a bucketed scan reports sorted output (making the
    // join-side SortExec elidable) only behind this flag, and only when
    // every bucket is a single file — which writeBucketed guarantees
    val priorOrd = spark.conf
      .get("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val facts = Seq.tabulate(5000)(i => (i.toLong % 701L, i.toLong, (i % 97).toDouble))
        .toDF("k", "row_id", "v")
      val dims = Seq.tabulate(701)(i => (i.toLong, s"dim_$i")).toDF("k", "name")
      Bucketing.writeBucketed(facts, "facts_bkt", s"$base/facts_bkt", "k", 4)
      Bucketing.writeBucketed(dims, "dims_bkt", s"$base/dims_bkt", "k", 4)

      val joined = spark.table("facts_bkt")
        .join(spark.table("dims_bkt"), "k")
      val plan = joined.queryExecution.executedPlan
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.collect { case s: SortExec => s }.isEmpty,
        s"sortBy buckets must make per-query sorts unnecessary:\n$plan")

      val expected = facts.join(dims, "k")
      assert(joined.count() === expected.count())
      assert(joined.agg(sum("v")).head.getDouble(0)
        === expected.agg(sum("v")).head.getDouble(0))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorBcast)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", priorOrd)
      spark.sql("DROP TABLE IF EXISTS facts_bkt")
      spark.sql("DROP TABLE IF EXISTS dims_bkt")
      graft.IoUtil.deleteRecursively(base)
    }
  }
}
