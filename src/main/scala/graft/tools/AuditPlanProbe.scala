package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Physical-plan + timing probe of the estimation audit's verification
  * tail at 600k: which join strategy carries the wide sorted-hash-array
  * frame (docArr, ~1.6 KB/row) onto the sampled candidate pairs. A
  * SortMergeJoin there sorts gigabytes of arrays; the pairs side is 360k
  * narrow rows, so a shuffled hash join (build = pairs) is the shape that
  * never sorts the arrays. */
object AuditPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = graft.sources.Generators.syntheticCorpus(spark, 600000L)
      .localCheckpoint(true)
    val audit = graft.operators.Dedup.minhashEstimationAudit(
      corpus, "doc_id", "text", samplePairsMod = 4)
    val plan = audit.queryExecution.executedPlan.toString
    println("=== join nodes ===")
    plan.linesIterator.filter(l =>
      l.contains("Join") || l.contains("Sort ") || l.contains("Exchange"))
      .foreach(println)
    for (lap <- 1 to 3) {
      System.gc()
      val t0 = System.nanoTime()
      audit.write.format("noop").mode("overwrite").save()
      println(f"audit lap$lap: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
