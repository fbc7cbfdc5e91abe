package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SkylineOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (plus the training-data pipeline
  * extensions) is exposed as a named query over the driver's parquet fixtures,
  * paired (where SQL-expressible) with a DuckDB oracle in [[oracleSql]].
  * Column names, dtypes and row order match the oracle exactly (every query
  * ends in a deterministic ORDER BY). Query groups live in
  * [[SkylineQueries]], [[RelationalQueries]] and [[TextQueries]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the reference's one real query —
    * global skyline + metrics JSON fields (skyline_size, optimality, timing
    * decomposition) over the lineitem-derived 2-D point set, MR-Angle
    * partitioning (`FlinkSkyline.java` end-to-end path). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet").select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
      (col("l_extendedprice") / lit(110.0)).as("v1"),
      (col("l_quantity") * lit(20.0)).as("v2"))
    val pts = SkylineOps.pointsFrom(li, "id", Seq("v1", "v2"))
    val n = pts.count()
    SkylineOps.skylineWithMetrics(pts, "mr-angle", SkylineQueries.DOMAIN,
      SkylineQueries.N, queryId = "1", recordCount = n)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    SkylineQueries.queries ++ RelationalQueries.queries ++ TextQueries.queries ++
      PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    SkylineQueries.oracleSql ++ RelationalQueries.oracleSql ++ TextQueries.oracleSql ++
      PipelineQueries.oracleSql
}
