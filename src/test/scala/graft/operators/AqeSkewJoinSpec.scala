package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** The OTHER half of the skew story: dedup_salted shows explicit key
  * salting; this pins the AQE runtime re-plan — a join with one pathological
  * hot key must come out of adaptive execution with the skew-join flag set
  * (the hot partition split into subpartitions at runtime), no code change
  * on the query side. This is the mechanism the 100 TB design notes lean on
  * for skew that is not known at authoring time.
  */
class AqeSkewJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("a hot-key join is re-planned as an AQE skew join at runtime") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // thresholds scaled to test size: the hot partition (~90% of rows)
      // must exceed factor x median and the byte threshold
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8192",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4096",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 400k fact rows, 90% on key 0; payload is hash-scrambled so shuffle
      // compression cannot hide the hot partition's bytes; 100-key dim
      val fact = spark.range(400000L)
        .selectExpr("CASE WHEN id % 10 < 9 THEN 0L ELSE id % 100 END AS k",
          "xxhash64(id) AS payload")
      val dim = spark.range(100L).selectExpr("id AS k", "id * 7 AS attr")
      val joined = fact.join(dim, "k")
      // drive THIS queryExecution (count() would execute a different one
      // and leave the inspected adaptive plan un-executed)
      val qe = joined.queryExecution
      assert(qe.toRdd.count() == 400000L)
      val finalPlan = qe.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      // the executed adaptive plan nests operators inside QueryStageExec
      // wrappers whose stage plan is NOT in `children` — recurse explicitly
      def ops(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val inner = p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            ops(q.plan)
          case _ => Nil
        }
        p +: (p.children.flatMap(ops) ++ inner)
      }
      val smjs = ops(finalPlan).collect { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, s"expected a sort-merge join in $finalPlan")
      assert(smjs.exists(_.isSkewJoin),
        "expected AQE to mark the hot-key join as a skew join " +
          s"(partitions split at runtime); got ${smjs.map(_.isSkewJoin)}")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
