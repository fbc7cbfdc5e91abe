package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** CDC MERGE laws on planted changelogs — the edge shapes the orders-fixture
  * oracle cannot isolate: out-of-order arrival within a key, a delete that is
  * NOT the last op (must resurrect), an insert for a key the base never had,
  * and a key with zero churn (must pass through bit-identical as 'base'). */
class CdcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def base() = {
    import spark.implicits._
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
  }

  test("latest-wins collapse is arrival-order invariant and tombstones delete") {
    import spark.implicits._
    // key 1: update then LATE-arriving older update (must lose);
    // key 2: delete mid-stream then a newer upsert (must resurrect);
    // key 3: untouched; key 4: pure insert; key 5: ends on a tombstone
    val changelog = Seq(
      (1L, 2L, "U", 11.0), (1L, 1L, "U", 99.0),
      (2L, 1L, "U", 21.0), (2L, 2L, "D", 0.0), (2L, 3L, "U", 22.0),
      (4L, 1L, "U", 40.0),
      (5L, 1L, "U", 50.0), (5L, 2L, "D", 0.0)
    ).toDF("k", "seq", "op", "v")

    val got = Cdc.applyChangelog(base(), changelog, "k", Seq("seq"), "op",
        Seq("v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(got === Set(
      (1L, 11.0, "cdc"),   // late old update lost
      (2L, 22.0, "cdc"),   // resurrected after mid-stream delete
      (3L, 30.0, "base"),  // zero churn: base passthrough
      (4L, 40.0, "cdc")))  // insert; key 5 deleted

    // arrival-order invariance: any permutation of the changelog collapses
    // to the same snapshot (max_by over a total order per key)
    val shuffled = changelog.orderBy(rand(7))
    val got2 = Cdc.applyChangelog(base(), shuffled, "k", Seq("seq"), "op",
        Seq("v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(got2 === got)
  }

  test("idempotence: re-applying an already-applied changelog is a no-op") {
    import spark.implicits._
    val changelog = Seq((1L, 1L, "U", 11.0), (2L, 1L, "D", 0.0),
      (4L, 1L, "U", 40.0)).toDF("k", "seq", "op", "v")
    val once = Cdc.applyChangelog(base(), changelog, "k", Seq("seq"), "op",
      Seq("v"))
    val twice = Cdc.applyChangelog(once.drop("src"), changelog, "k",
      Seq("seq"), "op", Seq("v"))
    val a = once.select("k", "v").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val b = twice.select("k", "v").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(a === b)
  }

  test("merge plan is one aggregate + one join, no cartesian") {
    import spark.implicits._
    val changelog = Seq((1L, 1L, "U", 11.0)).toDF("k", "seq", "op", "v")
    val plan = Cdc.applyChangelog(base(), changelog, "k", Seq("seq"), "op",
      Seq("v")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
