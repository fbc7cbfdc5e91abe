package graft.tools

import org.apache.spark.sql.SparkSession

/** Does the simhash banded self-join reuse one exchange (generator +
  * simhash evaluated once), or does each join side re-derive the corpus?
  * Prints the executed plan's Exchange/ReusedExchange/Scan lines for the
  * dedup_simhash_600k shape. */
object SimhashPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pairs = graft.operators.Dedup.simhashHammingPairs(
      graft.sources.Generators.syntheticCorpus(spark, 600000L),
      "doc_id", "text")
    val plan = pairs.queryExecution.executedPlan.toString
    plan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Reused") || l.contains("Range") ||
        l.contains("Join")).foreach(println)
    spark.stop()
  }
}
