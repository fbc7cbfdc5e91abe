package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot sweep: print every catalog entry whose executed plan contains
  * a BroadcastExchange whose output carries an ArrayType column — the
  * computed-array size-estimate trap (a Project's size estimate scales by
  * output row width, and arrays are costed at defaultSize, so wide array
  * frames read as near-zero and auto-broadcast; see the
  * minhashEstimationAudit fix). Run at sf0.1 to match bench conditions. */
object BroadcastAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val skip = Set[String]() // streaming entries start real queries — skip
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!name.startsWith("stream_") && !skip(name)) {
        try {
          val df = fn(spark, dir)
          val plan = df.queryExecution.executedPlan
          val hits = plan.collect {
            case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
              if e.output.exists(_.dataType.isInstanceOf[
                org.apache.spark.sql.types.ArrayType]) =>
              e.output.map(a => s"${a.name}:${a.dataType.simpleString}")
                .mkString(", ")
          }
          if (hits.nonEmpty)
            println(s"ARRAY-BROADCAST $name -> ${hits.mkString(" | ")}")
        } catch {
          case e: Throwable =>
            println(s"SKIP $name: ${e.getClass.getSimpleName}")
        }
      }
    }
    println("broadcast-audit done")
    spark.stop()
  }
}
